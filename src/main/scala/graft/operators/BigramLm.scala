package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language model with STUPID BACKOFF (Brants et al. 2007 — the
  * scoring scheme built for distributed count-based LMs: no normalization
  * pass, no discounting state, just counts and one multiplier), trained on
  * a REFERENCE corpus and scoring a TARGET corpus — the held-out shape of
  * the classic KenLM-style quality filter (score crawl text against a
  * clean-corpus model; unusual word SEQUENCES, not just unusual words,
  * drive the tail).
  *
  * Per scored document: mean log score over its bigrams,
  * `S(w₂|w₁) = cb(w₁w₂)/cu(w₁)` when the bigram was seen in training,
  * else `α · (cu(w₂)+1)/(N+V)` (backoff to an add-one unigram — add-one
  * because the target corpus may carry tokens the reference never saw,
  * and a zero-probability row would turn the whole document score into
  * −∞ instead of "very unusual").
  *
  * Scale shape: training counts are two keyed aggregations (bigram,
  * unigram) with map-side combine; scoring joins the per-(doc, bigram)
  * term frequencies against them — bigram-keyed and token-keyed shuffles,
  * never a broadcast of a corpus-sized vocabulary. The per-document
  * reduction folds in sorted-bigram order over an array bounded by the
  * doc's distinct-bigram count (the [[UnigramLm]] discipline — an
  * arbitrary-order double sum would not replay across engines), and the
  * `ln`/divide math is materialized as a codegen'd column BEFORE the
  * interpreted fold touches it.
  */
object BigramLm {

  /** Returns `(idCol, bigram_lm_score)` — documents with FEWER THAN TWO
    * tokens have no bigrams and hence NO ROW (a likelihood over zero
    * events is undefined, the [[UnigramLm]] empty-doc contract); a caller
    * using this as a filter must left-join and decide the no-bigram policy
    * explicitly rather than inherit an inner join's silent drop.
    */
  def scoreDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame,
      trainTextCol: String,
      alpha: Double = 0.4): DataFrame = {
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions

    def bigramsOf(frame: DataFrame, keep: Seq[String], text: String): DataFrame = {
      val ws = Dedup.tokens(col(text))
      frame
        .select(keep.map(col) :+ ws.as("_ws"): _*)
        .select(keep.map(col) :+ zip_with(
          slice(col("_ws"), lit(1), greatest(size(col("_ws")) - 1, lit(0))),
          slice(col("_ws"), lit(2), greatest(size(col("_ws")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"))).as("_bg"): _*)
        .select(keep.map(col) :+ explode_outer(col("_bg")).as("_p"): _*)
        .where(col("_p").isNotNull && col("_p.w1") =!= "" && col("_p.w2") =!= "")
        .select(keep.map(col) ++ Seq(col("_p.w1").as("w1"), col("_p.w2").as("w2")): _*)
    }

    val trainTok = train
      .select(explode_outer(Dedup.tokens(col(trainTextCol))).as("t"))
      .where(col("t").isNotNull && col("t") =!= "")
    val uni = trainTok.groupBy(col("t")).agg(count(lit(1)).as("cu"))
    val totals = broadcast(uni.agg(
      sum(col("cu")).cast("long").as("_N"), count(lit(1)).cast("long").as("_V")))
    val bg = bigramsOf(train, Seq.empty, trainTextCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))

    // cu(w₁) attaches to the TRAIN-side bigram table (train bigram types,
    // far smaller than the scored corpus's bigram stream), so scoring pays
    // ONE (w1, w2)-keyed join for the seen path; the backoff path — only
    // the rows that missed — pays a w2-keyed join of that sliver alone.
    // Three full corpus-bigram shuffles become one plus a miss-sized one.
    // Measured tradeoff: the two branches consume `joined` twice (~1 s
    // extra at sf0.1, AQE serves both from the one materialized exchange);
    // at scale the two avoided corpus-wide re-partitions dominate that
    // re-read by orders of magnitude — shuffle bytes, not stage count, is
    // what a 1000-executor cluster pays for.
    val bgw = bg.join(uni.select(col("t").as("w1"), col("cu").as("cu1")), Seq("w1"))
    val docBg = bigramsOf(df, Seq(idCol), textCol)
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("tf"))
      .repartition(parallelism, col("w1"), col("w2"))
    val joined = docBg.join(bgw, Seq("w1", "w2"), "left")
    val seen = joined.where(col("cb").isNotNull)
      .withColumn("lp", log(col("cb").cast("double") / col("cu1").cast("double")))
      .select(col(idCol), col("w1"), col("w2"), col("tf"), col("lp"))
    val backoff = joined.where(col("cb").isNull)
      .select(col(idCol), col("w1"), col("w2"), col("tf"))
      .join(uni.select(col("t").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .crossJoin(totals)
      .withColumn("lp", log(lit(alpha) * (coalesce(col("cu2"), lit(0L)).cast("double") + 1.0)
        / (col("_N") + col("_V")).cast("double")))
      .select(col(idCol), col("w1"), col("w2"), col("tf"), col("lp"))
    val scored = seen.unionByName(backoff)
    val perDoc = scored.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(
        col("w1"), col("w2"), col("tf"), col("lp")))).as("_l"))
    val num = aggregate(col("_l"), lit(0.0),
      (acc, s) => acc + s.getField("tf").cast("double") * s.getField("lp"))
    val den = aggregate(col("_l"), lit(0L), (acc, s) => acc + s.getField("tf"))
    perDoc.select(col(idCol), round(num / den.cast("double"), 6).as("bigram_lm_score"))
  }
}
