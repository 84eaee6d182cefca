package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collocation (phrase) mining: rank adjacent word pairs by pointwise
  * mutual information over the corpus — the standard phrase-extraction pass
  * of a training-data pipeline (multi-word expressions for tokenizer vocab
  * decisions, boilerplate phrase discovery).
  *
  * PMI(w1,w2) = ln( (c12/B) / ((c1/N)(c2/N)) ) with B = total bigrams,
  * N = total tokens. A minimum pair count keeps the head of the ranking out
  * of the hapax noise (classic PMI failure mode: a pair seen once between
  * two words seen once scores the maximum).
  *
  * Scale shape: bigrams are built INSIDE each row's token array (zip with
  * its own tail — no positional self-join), so the corpus contributes two
  * explode scans (unigrams, bigrams) each feeding a map-side-combining
  * count; the joins that attach c1/c2 to pairs are keyed on the VOCABULARY
  * (orders of magnitude smaller than the corpus; AQE broadcasts when it
  * fits); the two grand totals ride single-row frames through broadcast
  * cross-joins. Nothing holds per-doc state.
  */
object Collocations {

  /** Bigram array of a token array: zip with the own tail, drop the final
    * (last-token, null) pad pair. */
  def bigramsOf(ws: Column): Column =
    filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws), lit(1))),
        (x, y) => struct(x.as("w1"), y.as("w2"))),
      p => p.getField("w2").isNotNull)

  /** Top-`topK` bigrams by PMI with `c12 >= minCount`, deterministic
    * (pmi desc, w1, w2) ranking; pmi rounded to 4 decimals so the libm
    * ln() last-ULP difference between engines cannot reorder equal ranks.
    */
  def pmiBigrams(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 30): DataFrame = {
    val toks = docs.select(Dedup.tokens(col(textCol)).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.select(explode(bigramsOf(col("ws"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val nTotal = uni.agg(sum(col("c")).cast("double").as("n"))
    val bTotal = bi.agg(sum(col("c12")).cast("double").as("b"))
    val scored = bi.where(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(bTotal))
      // Multiplication order mirrors the oracle exactly (left-assoc) so the
      // double product is bit-identical before the ln/round.
      .withColumn("pmi",
        round(log(col("c12") * col("n") * col("n") / (col("b") * col("c1") * col("c2"))), 4))
    // Bounded global top-k through the native TopKAgg (k-capped partial
    // buffers, map-side combine — no unpartitioned WindowExec sorting the
    // full bigram-vocab frame). Order (pmi desc, w1, w2) becomes the
    // smallest-first struct (−pmi, w1, w2); rank is the array position of
    // the already-best-first output. c12 rides as a carried payload field
    // AFTER the ordering fields.
    val picked = scored.agg(
      TopK.topK(struct((-col("pmi")).as("np"), col("w1"), col("w2"), col("c12")),
        topK, largest = false).as("top"))
    picked.select(posexplode(col("top")))
      .select(col("col.w1").as("w1"), col("col.w2").as("w2"),
        col("col.c12").as("c12"), (-col("col.np")).as("pmi"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
