package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain groupBy on a skewed distribution") {
    // 90% of rows on one key — the classic hot-reducer shape.
    val df = (0 until 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("key"), Seq("v"), salts = 8)(
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").cast("long").as("n")))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedAgg phase-1 spreads the hot key over the salt space") {
    val df = (0 until 1000).map(i => ("HOT", i.toLong)).toDF("key", "v")
    val salted = df.withColumn("_salt", pmod(hash(col("v")), lit(8)))
    val spread = salted.groupBy("_salt").count().as[(Int, Long)].collect()
    assert(spread.length == 8) // all 8 sub-keys materialize
    assert(spread.map(_._2).max < 1000 * 0.3) // no sub-key holds the bulk
  }

  test("saltedJoin equals plain join on skewed keys") {
    val left = (0 until 5000).map(i => (if (i % 20 == 0) i % 5 else 1, i)).toDF("k", "lv")
    val right = (0 until 10).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), Seq("lv"), salts = 4)
      .select("k", "lv", "rv").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    val n = 1000
    (0 until n).map(i => (i.toLong, s"o$i")).toDF("k", "o")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_orders")
    (0 until n * 4).map(i => ((i % n).toLong, i.toDouble)).toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_lines")
    try {
      val joined = spark.table("bkt_lines").join(spark.table("bkt_orders"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got: $shuffles")
      assert(joined.count() == n * 4)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }

  test("persisted LSH band index, bucketed by band_val: incremental probe does not shuffle the index") {
    import graft.operators.Dedup
    val corpus = (0L until 60L).map { i =>
      val base = s"shared prefix tokens for group ${i / 3} body body body"
      (i, if (i % 3 == 0) base else base + s" tail$i")
    }.toDF("doc_id", "text")
    // The persistable index artifact, laid out on the probe key.
    Dedup.minHashBands(corpus.where(col("doc_id") < 40), "doc_id", "text")
      .write.mode("overwrite").bucketBy(8, "band_val").saveAsTable("bkt_lsh_index")
    try {
      val idx = spark.table("bkt_lsh_index")
      val pairs = Dedup.lshPairsIncremental(
        corpus.where(col("doc_id") >= 40), idx, "doc_id", "text")
      // Correctness: same at-least-one-new slice as the batch rebuild.
      val full = Dedup.minHashLshPairs(corpus, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      assert(pairs.as[(Long, Long)].collect().toSet ===
        full.filter { case (a, b) => a >= 40 || b >= 40 })
      // Layout: the bucketed index feeds its bucket-count aggregate in
      // place (partial+final fuse over the bucketed scan), so the probe
      // shuffles strictly fewer RECORDS than the same probe against an
      // unbucketed copy — the unbucketed plan must move every index band
      // row through an exchange to aggregate it; the bucketed plan moves
      // only aggregated bucket counts. Exchange COUNT ties (the counts
      // join still aligns partitionings), so the assertion is on volume.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def shuffledRecords(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        def walk(p: SparkPlan): Long = {
          val self = p match {
            case s: ShuffleExchangeExec =>
              s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
            case _ => 0L
          }
          val into = p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case q: QueryStageExec => walk(q.plan)
            case _ => 0L
          }
          self + into + p.children.map(walk).sum
        }
        walk(df.queryExecution.executedPlan)
      }
      val flatIdx = idx.select("doc_id", "band", "band_val")
        .localCheckpoint(true) // strips the bucket metadata, same rows
      val flatPairs = Dedup.lshPairsIncremental(
        corpus.where(col("doc_id") >= 40), flatIdx, "doc_id", "text")
      val (bucketedVol, flatVol) = (shuffledRecords(pairs), shuffledRecords(flatPairs))
      assert(bucketedVol < flatVol,
        s"bucketed index should shuffle fewer records: $bucketedVol vs $flatVol")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_lsh_index")
    }
  }

  test("AQE skew-join split fires: the executed SMJ is marked isSkewJoin") {
    // The Skew scaladoc claims "AQE's skew-join splitting handles most
    // runtime skew" — pin it on an executed plan instead of taking Spark's
    // word: one key holds ~80% of a 200k-row left side; with the skew
    // thresholds lowered to gate-data scale, AQE must replan the SMJ with
    // isSkewJoin=true (the hot partition fans out over multiple tasks).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // md5 payload: skew detection reads COMPRESSED map-output sizes, and
      // a repetitive literal payload lz4-compresses under the threshold.
      val left = spark.range(200000).select(
        when(col("id") % 10 < 8, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("v"))
      val right = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, Seq("k"))
      // Execute THIS dataset (a .count() would execute a different query
      // and leave j's own AQE plan un-replanned), then read its final plan.
      // 160k hot rows match k=0, plus the 400 ids < 2000 with id%10 ∈ {8,9}.
      assert(j.collect().length === 160400)
      def smjs(p: SparkPlan): Seq[SortMergeJoinExec] = p match {
        case s: SortMergeJoinExec => Seq(s)
        case a: AdaptiveSparkPlanExec => smjs(a.executedPlan)
        case q: QueryStageExec => smjs(q.plan)
        case other => other.children.flatMap(smjs)
      }
      val joins = smjs(
        j.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.executedPlan)
      assert(joins.nonEmpty, "no SortMergeJoin in the executed plan")
      assert(joins.exists(_.isSkewJoin),
        "AQE did not mark the skewed SMJ as isSkewJoin — the skew-split " +
          "claim in Skew's scaladoc would be false at this shape")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
