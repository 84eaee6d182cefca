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

  /** CCNet-shaped SEGMENT-level quality pruning (Wenzek et al. 2020 filter
    * LM applied below document granularity): cut each document into
    * fixed-`segTokens` token windows, score every window under the corpus
    * unigram distribution (same length-normalized log-likelihood as
    * [[scoreDocs]]), DROP windows scoring below `minScore`, and reassemble
    * the document from the kept windows in order. The production value:
    * a mostly-good document with one gibberish/boilerplate stretch keeps
    * its good text instead of dying whole at the doc-level filter.
    *
    * Fixed windows, not delimiter paragraphs: delimiter choice is corpus-
    * specific, while fixed token windows are deterministic on any text and
    * give the oracle an exact replay (`(pos-1) / segTokens` is the window
    * id in both engines).
    *
    * Scale shape: the corpus model is ONE token-keyed aggregation (shared
    * exchange discipline of [[scoreDocs]]); segment scoring adds only a
    * segment id to the same per-(doc, token) frame, so the whole filter is
    * two id-keyed exchanges + the model join — no new shuffle class over
    * doc-level scoring. Reassembly is a per-doc sorted fold over O(doc)
    * segments, never a corpus-wide sort.
    *
    * Returns (idCol, n_seg, n_kept, text_clean); docs with zero tokens drop
    * out (no likelihood), matching [[scoreDocs]].
    */
  def segmentFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int = 20,
      minScore: Double = -3.41): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol), Dedup.tokens(col(textCol)).as("_ws"))
      .repartition(parallelism, col(idCol))
    // (id, seg, pos, tok): posexplode gives the 0-based token position; the
    // window id is pos / segTokens. explode_outer+filter — the
    // InferFiltersFromGenerate pushdown trap (see Dedup.shingleTable).
    val segTok = toks
      .select(col(idCol), posexplode_outer(col("_ws")))
      .where(col("col").isNotNull && col("col") =!= "")
      .select(col(idCol), (col("pos") / segTokens).cast("int").as("seg"),
        col("pos"), col("col").as("tok"))
    val tf = segTok.groupBy(col(idCol), col("seg"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .repartition(parallelism, col("tok"))
    // Corpus model over the SAME frame (vocab counts are segment-sum =
    // doc-sum); N broadcast as one scalar row.
    val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val totals = broadcast(vocab.agg(sum(col("cnt")).cast("long").as("_N")))
    val scored = tf.join(vocab, Seq("tok"))
      .crossJoin(totals)
      .withColumn("lp", log(col("cnt").cast("double") / col("_N").cast("double")))
      .groupBy(col(idCol), col("seg"))
      .agg(array_sort(collect_list(struct(col("tok").as("t"), col("tf"), col("lp")))).as("_l"))
    val num = aggregate(col("_l"), lit(0.0),
      (acc, s) => acc + s.getField("tf").cast("double") * s.getField("lp"))
    val den = aggregate(col("_l"), lit(0L), (acc, s) => acc + s.getField("tf"))
    val segScore = scored.select(col(idCol), col("seg"),
      round(num / den.cast("double"), 6).as("sc"))
    // Segment text re-derived from the positional frame (first-seen order
    // inside the window), then per-doc ordered reassembly of kept windows.
    val segText = segTok.groupBy(col(idCol), col("seg"))
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("pos"), col("tok")))), s => s.getField("tok")), " ").as("txt"))
    segScore.join(segText, Seq(idCol, "seg"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_seg"),
        sum(when(col("sc") >= minScore, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("sc") >= minScore, struct(col("seg"), col("txt"))))),
          s => s.getField("txt")), " ").as("text_clean"))
  }
}
