package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Shared per-facet builders — BOTH forms (the facet frame and the
    * single-Column predicate) compose these, so a threshold or regex edit
    * cannot drift between the gate and the config-driven filter.
    */
  private val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def gopherFacets(text: Column, ws: Column, ls: Column): Seq[(String, Column)] = {
    val n = greatest(size(ws), lit(1)).cast("double")
    val nl = greatest(size(ls), lit(1)).cast("double")
    Seq(
      "n_words" -> size(ws).cast("long"),
      "mean_word_len" ->
        (aggregate(ws, lit(0L), (a, w) => a + length(w)).cast("double") / n),
      "symbol_word_ratio" -> ((regexp_count(text, lit("#")) +
        regexp_count(text, lit("\\.\\.\\.|…"))).cast("double") / n),
      "bullet_line_frac" ->
        (size(filter(ls, l => trim(l).rlike("^[-*•]"))).cast("double") / nl),
      "ellipsis_line_frac" ->
        (size(filter(ls, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nl),
      "alpha_word_frac" ->
        (size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / n),
      // plain add-chain, not a HOF over a literal array: no lambda closes
      // over an outer expression, and codegen CSE collapses the ws refs
      "stop_hits" -> gopherStops.map(x => array_contains(ws, x).cast("int")).reduce(_ + _))
  }

  private def gopherOks(f: Map[String, Column], minWords: Int,
      maxWords: Int): Seq[(String, Column)] = Seq(
    "ok_word_count" -> (f("n_words") >= minWords && f("n_words") <= maxWords),
    "ok_mean_len" -> (f("mean_word_len") >= 3.0 && f("mean_word_len") <= 10.0),
    "ok_symbols" -> (f("symbol_word_ratio") < 0.1),
    "ok_bullets" -> (f("bullet_line_frac") < 0.9),
    "ok_ellipsis" -> (f("ellipsis_line_frac") < 0.3),
    "ok_alpha" -> (f("alpha_word_frac") >= 0.8),
    "ok_stops" -> (f("stop_hits") >= 2))

  /** The battery as ONE boolean Column — the form a config-driven filter
    * (`CurateMain`) pushes into a `where` without materializing facet
    * columns; composed from the SAME builders as [[gopherRules]].
    */
  def gopherPass(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val f = gopherFacets(text, Dedup.tokens(text), split(text, "\n")).toMap
    gopherOks(f, minWords, maxWords).map(_._2).reduce(_ && _)
  }

  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("_t"))
      .withColumn("_ws", Dedup.tokens(col("_t")))
      .withColumn("_ls", split(col("_t"), "\n"))
    val facets = gopherFacets(col("_t"), col("_ws"), col("_ls"))
    val scored = base.select(
      col(idCol) +: facets.map { case (nm, c) => c.as(nm) }: _*)
    val named = facets.map { case (nm, _) => nm -> col(nm) }.toMap
    val oks = gopherOks(named, minWords, maxWords)
    scored.select(
      (col(idCol) +: facets.map(f => col(f._1))) ++
        oks.map { case (nm, c) => c.as(nm) }: _*)
      .withColumn("gopher_pass", oks.map(o => col(o._1)).reduce(_ && _))
  }
}
