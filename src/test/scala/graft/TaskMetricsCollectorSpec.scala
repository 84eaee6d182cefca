package graft

/** The bench's load-invariant telemetry source: per-gate deltas of executor
  * CPU, task time, and shuffle bytes from a listener. These specs pin the
  * two properties the adjudication protocol rests on: (a) a job that
  * shuffles shows non-zero, query-proportional shuffle bytes in the delta;
  * (b) a shuffle-free job shows zero — so a wall-clock spike with flat
  * cpu/shuffle is attributable to environment, not plan.
  */
class TaskMetricsCollectorSpec extends SparkSpec {

  test("snapshot deltas capture cpu, tasks, and shuffle volume of exactly the bracketed job") {
    val snap = TaskMetricsCollector.install(spark.sparkContext)
    val m0 = snap()
    // A real shuffle: groupBy over forced round-robin partitions.
    val n = spark.range(0, 200000, 1, 8)
      .selectExpr("id % 1000 AS k", "id AS v")
      .repartition(16)
      .groupBy("k").count().count()
    assert(n == 1000)
    val d1 = snap() - m0
    assert(d1.tasks > 0)
    assert(d1.cpuMs >= 0 && d1.taskMs > 0)
    assert(d1.shufWriteB > 0, "repartition+groupBy must write shuffle bytes")
    assert(d1.shufReadB > 0)
    // Shuffle-free job: a pure scan-free local computation.
    val m1 = snap()
    assert(spark.range(0, 100000, 1, 4).selectExpr("sum(id)").head().getLong(0) > 0)
    val d2 = snap() - m1
    assert(d2.tasks > 0)
    // range->partial agg->single-partition final: Spark plans this as one
    // stage with a single-partition exchange only when >1 partition; the
    // partial-agg rows are tiny — assert it is orders below the real shuffle.
    assert(d2.shufReadB < d1.shufReadB / 10)
  }

  test("Snap json shape matches the artifact contract") {
    val s = TaskMetricsCollector.Snap(1, 2, 3, 4, 5, 6)
    assert(s.json ===
      """{"cpuMs":1,"taskMs":2,"shufReadB":3,"shufWriteB":4,"spillB":5,"tasks":6}""")
    val z = s - TaskMetricsCollector.Snap(1, 1, 1, 1, 1, 1)
    assert(z === TaskMetricsCollector.Snap(0, 1, 2, 3, 4, 5))
  }
}
