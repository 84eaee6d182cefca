package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the classic
  * perplexity-style quality filter for training corpora (score docs by how
  * typical their token distribution is of the corpus; gibberish, boilerplate
  * code, and wrong-language text land in the tail). The reference has no LM
  * surface (its quality controls are the per-field filters of
  * `/root/reference/src/config.py`); this is part of the declared
  * training-data extension inventory.
  *
  * The "model" is the corpus itself: p(t) = count(t) / N over the whole
  * input, and a document's score is its length-normalized log-likelihood
  * `sum(tf_t · ln(count(t)/N)) / sum(tf_t)`. No smoothing is needed —
  * scoring corpus == training corpus, so every token has count ≥ 1.
  *
  * Scale shape: ONE tokenize+explode of the corpus (repartitioned by id
  * before the expansion — small-file/skew guard), collapsed immediately to
  * per-(doc, token) term frequencies; the vocabulary count and the
  * score join both consume the SAME token-keyed exchange (explicit
  * `repartition(token)`, ReuseExchange serves both — the boilerplate-span
  * pattern, see [[Dedup.removeBoilerplateSpans]]). The corpus total `N` is
  * one scalar row, broadcast. The per-doc reduction folds in sorted-token
  * order over an array bounded by the doc's distinct-token count — exactly
  * reproducible in any engine (the DuckDB oracle replays it with
  * `list(... ORDER BY t)` + `list_reduce`), which an arbitrary-order
  * double `sum()` would not be.
  */
object UnigramLm {

  /** Returns (idCol, lm_score): mean per-token natural-log probability of
    * the document under the corpus unigram distribution, rounded to 6 dp.
    * Empty documents (no tokens) drop out — they have no likelihood.
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"))
      .repartition(parallelism, col(idCol))
    val docTok = toks
      .select(col(idCol), explode_outer(col("_ws")).as("tok"))
      // explode_outer + filter, not explode: the InferFiltersFromGenerate
      // pushdown trap (see Dedup.shingleTable).
      .where(col("tok").isNotNull && col("tok") =!= "")
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // One token-keyed shuffle shared by the vocab count and the score join:
    // both consumers reference the identical repartition subplan. Catalyst's
    // static ReuseExchange can't unify them here (the vocab side continues
    // into a BroadcastExchange, a different subtree), but AQE's runtime
    // exchange reuse (on in GraftSession) serves both from one materialized
    // shuffle.
    val byTok = docTok.repartition(parallelism, col("tok"))
    val vocab = byTok.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    // The corpus total N folds off the pre-explode frame (same id-keyed
    // exchange as docTok, no token shuffle): sum of per-doc non-empty token
    // counts == sum(vocab.cnt), one scalar row, broadcast.
    val totals = broadcast(toks.select(
      size(filter(col("_ws"), t => t.isNotNull && t =!= "")).as("_n"))
      .agg(sum(col("_n")).cast("long").as("_N")))
    // ln(cnt/N) is materialized as a codegen'd column BEFORE the per-doc
    // array is collected: HOF lambdas are interpreted with no CSE (the
    // repo's own trap, see Dedup.shinglesOf), so folding ln/cast/divide per
    // element would run the expensive math interpreted on the hot path.
    // The fold below is pure tf·lp accumulation over the same sorted order —
    // bit-identical result.
    val perDoc = byTok.join(vocab, Seq("tok"))
      .crossJoin(totals)
      .withColumn("lp", log(col("cnt").cast("double") / col("_N").cast("double")))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("tok").as("t"), col("tf"), col("lp")))).as("_l"))
    val num = aggregate(col("_l"), lit(0.0),
      (acc, s) => acc + s.getField("tf").cast("double") * s.getField("lp"))
    val den = aggregate(col("_l"), lit(0L), (acc, s) => acc + s.getField("tf"))
    perDoc.select(col(idCol), round(num / den.cast("double"), 6).as("lm_score"))
  }
}
