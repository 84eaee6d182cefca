package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    // Warm the executor/codegen paths AND the parquet scan machinery (footer
    // decode, page cache, vectorized reader codegen) so the alphabetically
    // first query's time is its own, not the JVM's.
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    Seq("events", "documents", "embeddings", "orders", "lineitem").foreach { t =>
      // Tolerant like the query loop below: a partial dataset dir should
      // degrade that table's queries, not abort the whole bench.
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // Optional positional args = run only these queries (local iteration aid;
    // the driver invokes with no args and gets the full suite).
    val only = args.toSet
    val selected = if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(q => only(q._1))
    // Failure-honest accounting: a query that crashes records -1 (never its
    // crash latency) and lands in the `failed` list; the total covers ONLY
    // succeeding queries. A partial board can therefore never masquerade as
    // a full-run total — readers of the artifact alone see exactly which
    // queries contributed.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val (passed, failed) = results.partition(_._2 >= 0)
    val total = passed.map(_._2).sum
    val failedArr = failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","passed":${passed.size},"failed":$failedArr,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Subset runs (positional args) are local iteration aids — they must
    // never overwrite the full-board artifact-of-record. Guard on the
    // registry size too, not just `only`: an env-override invocation that
    // somehow measured fewer queries than the registry holds is a partial
    // board and has no business becoming the record (this exact failure
    // shipped once: a 9-query subset landed as BENCH_local_r08.json).
    if (only.isEmpty && results.size == SparkEntry.queries.size) writeArtifact(line)
    spark.stop()
  }

  /** Artifact-of-record: persist the full per-query JSON in-repo so bench
    * totals never depend on a truncated stdout capture. Round number is
    * inferred from the driver's `CORRECTNESS_r{N}.json` files (current round
    * = max on disk + 1; `SPARK_GRAFT_ROUND` overrides the inference — the
    * driver's post-correctness run of round N would otherwise infer N+1,
    * which is exactly how round 9's official run landed misfiled as
    * `BENCH_local_r10.json`); `SPARK_GRAFT_BENCH_OUT` overrides the path
    * outright. The payload is stamped with the git HEAD sha and a
    * working-tree-dirty flag so two artifacts with the same totals are
    * distinguishable as distinct measurements of (possibly) distinct trees —
    * a reviewer can rebind a misfiled artifact to its true round from the
    * sha alone. Best-effort — a read-only cwd or missing git must not fail
    * the bench.
    */
  private def writeArtifact(line: String): Unit = try {
    import java.nio.file.{Files, Paths}
    val round = sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption).getOrElse {
      val pat = "CORRECTNESS_r(\\d+)\\.json".r
      val rounds = Option(new java.io.File(".").list()).getOrElse(Array.empty[String])
        .collect { case pat(n) => n.toInt }
      (if (rounds.isEmpty) 0 else rounds.max) + 1
    }
    val (sha, dirty) = gitStamp()
    val out = sys.env.get("SPARK_GRAFT_BENCH_OUT").map(Paths.get(_))
      .getOrElse(Paths.get(f"BENCH_local_r$round%02d.json"))
    // Splice provenance fields into the (known-object-shaped) JSON line.
    val stamped = s"""{"round":$round,"gitSha":"$sha","gitDirty":$dirty,""" + line.stripPrefix("{")
    Files.writeString(out, stamped + "\n")
  } catch { case scala.util.control.NonFatal(e) =>
    System.err.println(s"[bench] artifact write skipped: ${e.getMessage}")
  }

  /** HEAD sha + dirty flag via git plumbing; ("unknown", false) when git is
    * unavailable. Kept out of the measured path — runs once post-bench.
    */
  private def gitStamp(): (String, Boolean) = try {
    def run(cmd: String*): String = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) out else ""
    }
    val sha = run("git", "rev-parse", "HEAD")
    val dirty = run("git", "status", "--porcelain").nonEmpty
    (if (sha.nonEmpty) sha else "unknown", dirty)
  } catch { case scala.util.control.NonFatal(_) => ("unknown", false) }
}
