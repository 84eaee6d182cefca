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
}
