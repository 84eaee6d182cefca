package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximation with VERIFIED accuracy: sketches themselves
  * are engine-specific bytes (not oracle-portable), so the gateable output
  * is the ACCURACY CONTRACT — exact values plus a boolean asserting the
  * sketch estimate landed inside its guaranteed error band. A correctness
  * harness on any engine can then check the claim (`true` for every row)
  * without reproducing the sketch internals.
  */
object Sketches {

  /** Count–min-sketch heavy-hitter check: the exact top-`topK` token counts
    * (distributed agg) side-by-side with the CMS point estimates. CMS
    * guarantees `exact <= est <= exact + eps*N` with probability
    * `confidence` per query; `cms_ok` asserts that band (the upper slack
    * doubled to keep the gate deterministic at 99% per-row confidence).
    *
    * Scale shape: the sketch is a fixed-size mergeable accumulator (one
    * pass, no shuffle of the token stream beyond the exact-count agg we
    * produce anyway); only the `topK` head rows and the O(1) sketch come
    * to the driver — the same bounded-rollup policy as Packing.
    */
  def cmsHeavyHitterCheck(
      docs: DataFrame,
      textCol: String,
      topK: Int = 20,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(Dedup.tokens(col(textCol))).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(topK)
    val cms = toks.stat.countMinSketch("tok", eps, confidence, seed)
    // The sketch already carries the stream length — no dedicated
    // count job for N.
    val slack = math.max(1L, math.ceil(2 * eps * cms.totalCount()).toLong)
    top.collect().toSeq.map { r =>
      val t = r.getString(0); val c = r.getLong(1)
      val est = cms.estimateCount(t)
      (t, c, est >= c && est <= c + slack)
    }.toDF("tok", "exact_cnt", "cms_ok")
  }
}
