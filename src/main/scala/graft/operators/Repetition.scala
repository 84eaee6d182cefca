package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition-based quality metrics for training-data filtering (the
  * Gopher/MassiveText-style heuristics): documents dominated by repeated
  * lines, words, or n-grams are boilerplate/spam and get filtered before
  * training. Per-document scalars so the downstream filter is a pushed-down
  * `where` on the scan.
  *
  * Plan shape: the line/word facets are pure per-row column math
  * (shuffle-free, codegen'd). The top-bigram facet is RELATIONAL — explode →
  * groupBy(doc, bigram) → groupBy(doc) — rather than a per-row
  * count-within-array lambda: higher-order-function lambdas are interpreted
  * (no codegen, no CSE) and O(n·distinct) per row, while the relational shape
  * is two keyed partial-agg shuffles that scale to any document length and
  * corpus size. Input is repartitioned before the explode (compact parquet
  * arrives as one input partition; the ~n× bigram expansion must not run on
  * one core).
  */
object Repetition {

  /** Per-document repetition metrics:
    *  - `n_words`        whitespace token count
    *  - `dup_word_frac`  1 − distinct/total tokens
    *  - `dup_line_frac`  1 − distinct/total newline-split lines
    *  - `top_bigram_frac` occurrences of the most frequent word 2-gram /
    *    total 2-grams (0.0 for docs with <2 tokens)
    */
  def metrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df.repartition(parallelism, col(idCol))
      .select(col(idCol), col(textCol).as("_t"))
      .withColumn("_ws", Dedup.tokens(col("_t")))
      .withColumn("_ls", split(col("_t"), "\n"))
    val perRow = base.select(
      col(idCol),
      size(col("_ws")).cast("long").as("n_words"),
      (lit(1.0) - size(array_distinct(col("_ws"))).cast("double") /
        greatest(size(col("_ws")), lit(1)).cast("double")).as("dup_word_frac"),
      (lit(1.0) - size(array_distinct(col("_ls"))).cast("double") /
        greatest(size(col("_ls")), lit(1)).cast("double")).as("dup_line_frac"))
    // explode_outer + null-filter, NOT plain explode: InferFiltersFromGenerate
    // would infer `size(shinglesOf(..)) > 0` from a non-outer explode and
    // predicate pushdown sinks it below the repartition exchange, re-running
    // the tokenizer per element on the single compact pre-shuffle partition
    // (the measured 12x trap documented at Dedup.shingleTable).
    val cnt = base.select(col(idCol), explode_outer(Dedup.shinglesOf(col("_ws"), 2)).as("bg"))
      .where(col("bg").isNotNull)
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
    val top = cnt.groupBy(col(idCol)).agg(max("c").as("mx"), sum("c").as("tot"))
      .select(col(idCol), (col("mx").cast("double") / col("tot").cast("double")).as("top_bigram_frac"))
    perRow.join(top, Seq(idCol), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** The REST of the Gopher rule battery (Rae et al. 2021, Appendix A1 —
    * the published MassiveText filter; [[metrics]] covers its repetition
    * rules): word-count bounds, mean word length bounds, symbol-to-word
    * ratio, bullet/ellipsis line fractions, alphabetic-word fraction, and
    * the stop-word presence check, each as a per-document scalar plus its
    * rule boolean and an overall `gopher_pass`. Shuffle-free per-row
    * column math — the filter form a scan absorbs; every ratio is an exact
    * rational in doubles and the mean folds in element order, so the gate
    * hashes without rounding belts.
    */
  /** The battery as ONE boolean Column — the form a config-driven filter
    * (`CurateMain`) pushes into a `where` without materializing facet
    * columns. Same rules as [[gopherRules]] (the spec asserts the two
    * agree); repeated `tokens(text)` references collapse under codegen
    * subexpression elimination, and no HOF lambda closes over an outer
    * expression (the stop-word check is a plain add-chain, not a filter
    * over a literal array).
    */
  def gopherPass(text: org.apache.spark.sql.Column, minWords: Int = 50,
      maxWords: Int = 100000): org.apache.spark.sql.Column = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ws = Dedup.tokens(text)
    val ls = split(text, "\n")
    val n = greatest(size(ws), lit(1)).cast("double")
    val nl = greatest(size(ls), lit(1)).cast("double")
    val nWords = size(ws).cast("long")
    val meanLen = aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / n
    val symRatio = (regexp_count(text, lit("#")) +
      regexp_count(text, lit("\\.\\.\\.|…"))).cast("double") / n
    val bulletFrac = size(filter(ls, l => trim(l).rlike("^[-*•]"))).cast("double") / nl
    val ellipsisFrac = size(filter(ls, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nl
    val alphaFrac = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / n
    val stopHits = stops.map(s => array_contains(ws, s).cast("int")).reduce(_ + _)
    (nWords >= minWords && nWords <= maxWords) &&
      (meanLen >= 3.0 && meanLen <= 10.0) &&
      symRatio < 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
      alphaFrac >= 0.8 && stopHits >= 2
  }

  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val base = df.select(col(idCol), col(textCol).as("_t"))
      .withColumn("_ws", Dedup.tokens(col("_t")))
      .withColumn("_ls", split(col("_t"), "\n"))
      .withColumn("_n", greatest(size(col("_ws")), lit(1)).cast("double"))
      .withColumn("_nl", greatest(size(col("_ls")), lit(1)).cast("double"))
    val meanLen = aggregate(col("_ws"), lit(0L), (a, w) => a + length(w))
      .cast("double") / col("_n")
    val symRatio = (regexp_count(col("_t"), lit("#")) +
      regexp_count(col("_t"), lit("\\.\\.\\.|…"))).cast("double") / col("_n")
    val bulletFrac = size(filter(col("_ls"),
      l => trim(l).rlike("^[-*•]"))).cast("double") / col("_nl")
    val ellipsisFrac = size(filter(col("_ls"),
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / col("_nl")
    val alphaFrac = size(filter(col("_ws"),
      w => w.rlike("[A-Za-z]"))).cast("double") / col("_n")
    val stopHits = size(filter(
      array(stops.map(lit): _*), s => array_contains(col("_ws"), s))).cast("int")
    val scored = base.select(col(idCol),
      size(col("_ws")).cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("stop_hits"))
    scored.select(col(idCol), col("n_words"), col("mean_word_len"),
      col("symbol_word_ratio"), col("bullet_line_frac"), col("ellipsis_line_frac"),
      col("alpha_word_frac"), col("stop_hits"),
      (col("n_words") >= minWords && col("n_words") <= maxWords).as("ok_word_count"),
      (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("ok_mean_len"),
      (col("symbol_word_ratio") < 0.1).as("ok_symbols"),
      (col("bullet_line_frac") < 0.9).as("ok_bullets"),
      (col("ellipsis_line_frac") < 0.3).as("ok_ellipsis"),
      (col("alpha_word_frac") >= 0.8).as("ok_alpha"),
      (col("stop_hits") >= 2).as("ok_stops"))
      .withColumn("gopher_pass",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") && col("ok_stops"))
  }
}
