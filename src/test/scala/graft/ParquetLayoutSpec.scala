package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ParquetLayout

class ParquetLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write prunes directories and bounds files per partition") {
    val out = Files.createTempDirectory("graft-layout").toString + "/t"
    val df = (0 until 10000)
      .map(i => (f"2024-01-${i % 3 + 1}%02d", i.toLong, i * 1.5))
      .toDF("dt", "k", "v")
    ParquetLayout.writePartitioned(df, out, Seq("dt"), Seq("k"), filesPerPartition = 2)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"))
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 2, s"$d has $files files")
    }

    // Partition pruning: a dt filter reads one directory only — asserted on
    // the executed scan's numFiles METRIC, not a plan-string grep.
    val totalFiles = dirs.map(d =>
      new java.io.File(s"$out/$d").listFiles().count(_.getName.endsWith(".parquet"))).sum
    val prunedFiles = org.apache.spark.sql.graft.Shim.scannedFileCounts(
      spark.read.parquet(out).where(col("dt") === "2024-01-02")).sum
    assert(prunedFiles > 0 && prunedFiles <= totalFiles / 3,
      s"dt filter scanned $prunedFiles of $totalFiles files")
    assert(spark.read.parquet(out).where(col("dt") === "2024-01-02").count() > 0)

    // All rows survive the layout round trip.
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("IVF cell layout: probes read a partition-pruned subset of cells") {
    import graft.operators.Similarity
    val out = Files.createTempDirectory("graft-ivf-layout").toString + "/ivf"
    val vecs = (0 until 200)
      .map(i => (i.toLong, Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = vecs.where(col("vec_id") < 4)
    Similarity.assignCells(vecs, cents, "vec_id", "embedding")
      .write.partitionBy("cid").parquet(out)
    val back = spark.read.parquet(out)
    // Static cell filter → the scan's numFiles metric covers ONE cell's
    // files, not the whole layout (4 cells -> ≤ 1/4 of the files; each cell
    // directory may hold several files, so count files, not dirs).
    val allFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val oneCell = org.apache.spark.sql.graft.Shim.scannedFileCounts(
      back.where(col("cid") === 1)).sum
    assert(oneCell > 0 && oneCell <= allFiles / 4,
      s"cid filter scanned $oneCell of $allFiles files")
    assert(back.where(col("cid") === 1).count() > 0 && back.where(col("cid") === 1).count() < 200)
    // And the prebuilt probe path returns the same rows as the in-plan IVF.
    val q = vecs.where(col("vec_id") >= 190)
    val a = Similarity.topKIvfPrebuilt(q, back, cents, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    val b = Similarity.topKIvf(q, vecs, cents, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // The probe SCAN is pruned: one query probing nProbe=1 of 4 cells must
    // touch ≤ 1/4 of the layout's files (DPP does not fire for this join
    // shape — the operator pushes the probed-cell set as a static filter).
    val oneQ = vecs.where(col("vec_id") === 190)
    val probeFiles = org.apache.spark.sql.graft.Shim.scannedFileCounts(
      Similarity.topKIvfPrebuilt(oneQ, back, cents, "vec_id", "embedding", k = 3, nProbe = 1)).sum
    assert(probeFiles > 0 && probeFiles <= allFiles / 4,
      s"probe scanned $probeFiles of $allFiles files")
  }

  test("curriculum layout: a decile-head reader prunes to its buckets") {
    import graft.operators.Quality
    val out = Files.createTempDirectory("graft-cur-layout").toString + "/cur"
    val docs = (1 to 400).map(i => (i.toLong, s"src${i % 2}", (i * 37 % 991) + 10))
      .toDF("doc_id", "source", "n_chars")
    val ranked = Quality.rankBlend(docs, "source", "doc_id", Seq(col("n_chars")))
    graft.sinks.ParquetLayout.writePartitioned(
      ranked.select("doc_id", "source", "n_chars", "decile"),
      out, partitionCols = Seq("decile"), sortCols = Seq("n_chars"))
    val back = spark.read.parquet(out)
    val allFiles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    // The easy-head reader (2 of 10 deciles) touches ≤ 1/5 + rounding of
    // the layout's files — directory pruning, no data read from the tail.
    val headFiles = org.apache.spark.sql.graft.Shim.scannedFileCounts(
      back.where(col("decile") <= 2)).sum
    assert(headFiles > 0 && headFiles <= (allFiles * 2) / 10 + 1,
      s"head read scanned $headFiles of $allFiles files")
    // Every row lands in exactly one decile and the round trip is lossless.
    assert(back.count() == 400)
    assert(back.select("decile").distinct().count() == 10)
  }
}
