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

    // Partition pruning: a dt filter reads one directory only.
    val plan = spark.read.parquet(out).where(col("dt") === "2024-01-02")
      .queryExecution.executedPlan.toString
    assert(spark.read.parquet(out).where(col("dt") === "2024-01-02").count() > 0)
    assert(!plan.contains("dt=2024-01-01"))

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
    // Static cell filter → PartitionFilters prune the scan to that directory.
    val pruned = back.where(col("cid") === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cid"))
    assert(pruned.count() > 0 && pruned.count() < 200)
    // And the prebuilt probe path returns the same rows as the in-plan IVF.
    val q = vecs.where(col("vec_id") >= 190)
    val a = Similarity.topKIvfPrebuilt(q, back, cents, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    val b = Similarity.topKIvf(q, vecs, cents, "vec_id", "embedding", k = 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
