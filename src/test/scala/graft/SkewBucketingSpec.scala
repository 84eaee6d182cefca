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
}
