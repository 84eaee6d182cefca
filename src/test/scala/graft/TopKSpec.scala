package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** [[graft.expressions.TopKAgg]] contract: (1) exact parity with the window
  * `row_number <= k` idiom it replaces, ties included; (2) the scale claim —
  * the exchange under the bounded agg carries O(keys × k × partitions)
  * records, not O(N) — asserted from executed-task shuffle metrics, not plan
  * text.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(n: Int, keys: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // Coarse scores force ties so the tie-break path is actually exercised.
    (0 until n).map(i => (rnd.nextInt(keys), rnd.nextInt(20).toDouble, i.toLong))
      .toDF("k", "score", "id").repartition(8)
  }

  private def windowTopK(df: DataFrame, k: Int, largest: Boolean): DataFrame = {
    val o = if (largest) Seq(col("score").desc, col("id").desc)
            else Seq(col("score").asc, col("id").asc)
    df.withColumn("rn", row_number().over(Window.partitionBy("k").orderBy(o: _*)))
      .where(col("rn") <= k).select("k", "score", "id")
  }

  test("topKPerKey == window row_number parity, largest and smallest, with ties") {
    val df = randomDf(5000, 37, seed = 7).cache()
    try {
      for (largest <- Seq(true, false)) {
        val got = TopK.topKPerKey(df, Seq("k"),
            struct(col("score"), col("id")), k = 3, largest = largest)
          .as[(Int, Double, Long)].collect().toSet
        val want = windowTopK(df, 3, largest).as[(Int, Double, Long)].collect().toSet
        assert(got == want, s"largest=$largest")
      }
    } finally df.unpersist()
  }

  test("output is best-first within each key; k larger than group returns whole group") {
    val df = Seq((1, 5.0, 1L), (1, 9.0, 2L), (1, 7.0, 3L), (2, 1.0, 4L))
      .toDF("k", "score", "id")
    val rows = TopK.topKPerKey(df, Seq("k"), struct(col("score"), col("id")), k = 10)
      .as[(Int, Double, Long)].collect()
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byKey(1) == Seq(9.0, 7.0, 5.0))
    assert(byKey(2) == Seq(1.0))
  }

  test("null inputs are skipped, null-scored struct fields rank below every real score") {
    val df = Seq((1, Some(5.0), 1L), (1, None, 2L), (1, Some(3.0), 3L), (1, None, 4L))
      .toDF("k", "score", "id")
    val top2 = TopK.topKPerKey(df.where(col("score").isNotNull),
        Seq("k"), struct(col("score"), col("id")), k = 2)
      .as[(Int, Double, Long)].collect().toSeq
    assert(top2 == Seq((1, 5.0, 1L), (1, 3.0, 3L)))
    // Without the filter: null fields order smallest, so they only appear
    // when the non-null pool is exhausted.
    val top3 = TopK.topKPerKey(df, Seq("k"), struct(col("score"), col("id")), k = 3)
      .select("score").as[Option[Double]].collect().toSeq
    assert(top3 == Seq(Some(5.0), Some(3.0), None))
  }

  test("scalar (non-struct) values aggregate too") {
    val got = Seq(("a", 3L), ("a", 9L), ("a", 5L), ("b", 1L)).toDF("k", "v")
      .groupBy("k").agg(TopK.topK(col("v"), 2).as("t"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == Seq(9L, 5L) && got("b") == Seq(1L))
  }

  test("serialize/deserialize roundtrip preserves buffer contents") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Literal}
    import graft.expressions.TopKAgg
    // A RESOLVED catalyst struct child so dataType is available off-plan
    // (functions.struct builds an unresolved node in Spark 4's column API).
    val e = TopKAgg(CreateNamedStruct(Seq(
      Literal("score"), Literal(0.0), Literal("id"), Literal(0L))), k = 4)
    val buf = e.createAggregationBuffer()
    Seq((5.0, 1L), (2.0, 2L), (9.0, 3L), (7.0, 4L), (1.0, 5L)).foreach { case (s, i) =>
      buf.insert(InternalRow(s, i))
    }
    def pairs(b: graft.expressions.TopKBuffer): Seq[(Double, Long)] =
      b.sortedDesc.toSeq.map { v =>
        val r = v.asInstanceOf[InternalRow]; (r.getDouble(0), r.getLong(1))
      }
    val back = e.deserialize(e.serialize(buf))
    assert(pairs(back) == Seq((9.0, 3L), (7.0, 4L), (5.0, 1L), (2.0, 2L)))
    assert(pairs(back) == pairs(buf))
  }

  /** The 100 TB claim, measured: on N=40k rows × 8 partitions × 23 keys with
    * k=3, the bounded agg's exchange must carry ≤ keys×k×partitions = 552
    * records. The naive window (Spark's `WindowGroupLimit` rewrite disabled)
    * shuffles all 40k — that rewrite, when ON, reaches the same volume bound
    * as the agg, which the third measurement documents; TopKAgg's remaining
    * edge is sort-avoidance + agg composability, claimed in its scaladoc and
    * A/B'd in BASELINE.md. Metrics come from task-level shuffle-write
    * counters of the executed jobs, not plan text.
    */
  test("shuffle records are bounded by keys*k*partitions, not N") {
    val n = 40000; val keys = 23; val parts = 8
    val df = randomDf(n, keys, seed = 13).cache()
    val glKey = "spark.sql.optimizer.windowGroupLimitThreshold"
    val glOld = spark.conf.get(glKey)
    try {
      df.count() // materialize outside the measured window
      import org.apache.spark.sql.graft.Shim

      val bound = keys.toLong * 3 * parts
      val bounded = Shim.shuffleRecordsWritten(
        TopK.topKPerKey(df, Seq("k"), struct(col("score"), col("id")), 3))
      spark.conf.set(glKey, "-1")
      val naive = Shim.shuffleRecordsWritten(windowTopK(df, 3, largest = true))
      spark.conf.set(glKey, glOld)
      val groupLimited = Shim.shuffleRecordsWritten(windowTopK(df, 3, largest = true))

      assert(bounded <= bound,
        s"bounded agg shuffled $bounded records, expected <= $bound")
      assert(naive >= n,
        s"naive window baseline shuffled $naive records, expected >= $n")
      assert(groupLimited <= bound,
        s"WindowGroupLimit window shuffled $groupLimited, expected <= $bound")
    } finally { spark.conf.set(glKey, glOld); df.unpersist() }
  }
}
