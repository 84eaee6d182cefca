package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM A/B adjudicator for per-gate bench deltas (not part of the
  * driver contract): runs the named gates back-to-back in BOTH orderings
  * inside one session, so a gate-family slowdown that appears in a long
  * 209-query run but not here is a load/ordering artifact, while one that
  * reproduces is real. BASELINE.md documents that this back-to-back shape
  * is the only valid signal for adjudicating cross-run per-gate ratios —
  * machine load during a 4-minute full board is not.
  *
  * `runMain graft.BenchAB [gate ...]` — defaults to the round-9 `weak`
  * cluster (the 6 ANN gates + st_curate_increment + t7_datetime_no +
  * x_sample_dsir). Prints one line per (pass, gate) and a final summary
  * with min-of-passes per gate — min, not mean, because the question is
  * the gate's unloaded cost.
  */
object BenchAB {
  private val defaultGates = Seq(
    "x_ann_bruteforce", "x_ann_ivf", "x_ann_ivf_incr", "x_ann_ivf_layout",
    "x_ann_ivfpq", "x_ann_int8_rescore",
    // Round-10 driver-run outliers (6.9x / 2.5x vs their r9 quiet close)
    // that sat in the same loaded alphabetical stretch as the six gates
    // above but were not in the original A/B set — added per round-10
    // verdict item 1 so their `weak` marks are adjudicable.
    "x_ann_ivfpq_residual", "x_ann_kmeans",
    "st_curate_increment", "t7_datetime_no", "x_sample_dsir")

  def main(args: Array[String]): Unit = {
    val gates = if (args.nonEmpty) args.toSeq else defaultGates
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    // Same warmers as Bench: codegen/scan machinery out of the first gate.
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    Seq("events", "documents", "embeddings", "orders", "lineitem").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val unknown = gates.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gates: ${unknown.mkString(", ")}")

    val snap = TaskMetricsCollector.install(spark.sparkContext)
    def once(name: String): (Double, TaskMetricsCollector.Snap) = {
      val m0 = snap()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, snap() - m0)
    }
    val passes = Seq("fwd" -> gates, "rev" -> gates.reverse,
      "fwd2" -> gates, "rev2" -> gates.reverse)
    val times = scala.collection.mutable.Map.empty[String, List[(Double, TaskMetricsCollector.Snap)]]
      .withDefaultValue(Nil)
    passes.foreach { case (label, order) =>
      order.foreach { g =>
        val (s, m) = once(g)
        times(g) = (s, m) :: times(g)
        println(f"[ab] $label%-5s $g%-24s $s%7.2f s   cpu ${m.cpuMs}%6d ms  shufR ${m.shufReadB}%10d B  shufW ${m.shufWriteB}%10d B")
      }
    }
    println("[ab] ===== min-of-4 per gate (quiet cost; cpu/shuffle of the min pass) =====")
    gates.foreach { g =>
      val ts = times(g)
      val (minS, minM) = ts.minBy(_._1)
      println(f"[ab] MIN $g%-24s $minS%7.2f s   cpu ${minM.cpuMs}%6d ms  shufR ${minM.shufReadB}%10d B  shufW ${minM.shufWriteB}%10d B   (all: ${ts.reverse.map(t => f"${t._1}%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
