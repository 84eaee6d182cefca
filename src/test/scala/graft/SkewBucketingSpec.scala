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
}
