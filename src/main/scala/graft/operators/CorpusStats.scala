package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level token statistics: per-document token entropy (a repetition /
  * degeneracy quality signal) and corpus-wide top-k n-grams (the Google-
  * n-grams shape: count everything, keep the heavy head).
  */
object CorpusStats {

  /** Shannon entropy (nats) of the within-document token distribution —
    * near-zero for degenerate repetition ("buy buy buy …"), ~ln(n_tokens)
    * for all-distinct text. A standard corpus-quality facet next to the
    * repetition ratios in [[Repetition]]: entropy catches *skewed* repetition
    * (one token dominating) that the distinct-ratio misses when the tail is
    * varied.
    *
    * Plan: explode to (doc, token) → count per (doc, token) → per-doc fold
    * `H = ln(n) − Σ c·ln(c) / n`. Two exchanges, both keyed on `doc_id`, so
    * the second aggregation reuses the first's partitioning (no re-shuffle:
    * (doc,token) → doc is a prefix-key rollup and AQE plans it as a local
    * aggregation). Shuffle volume is O(distinct tokens per doc), already
    * capped by document length; nothing is ever collected per-doc into one
    * buffer. The `ln(n) − Σc·ln(c)/n` form does one float fold over counts
    * (not two over probabilities), and the result is rounded to 6 dp so the
    * fold order never surfaces in the gate hash.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val wc = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    wc.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clnc"))
      .select(col(idCol),
        round(log(col("n").cast("double")) - col("clnc") / col("n").cast("double"), 6)
          .as("token_entropy"))
  }

  /** Corpus-wide top-k word n-grams by document-blind occurrence count,
    * minimum-count filtered; ties broken lexicographically so the cut is
    * deterministic.
    *
    * Plan: n-grams are built per-row with `transform(sequence(...))` over the
    * token array (no self-join, no per-position explode until after the gram
    * string exists), one hash-partial count absorbs duplicates map-side, and
    * the global top-k goes through [[TopK.topK]]'s bounded aggregate — the
    * driver receives exactly k rows and the final exchange carries at most
    * k × partitions pre-aggregated candidates, not the full gram vocabulary.
    * At 100 TB the gram count shuffle is the cost; it is the canonical
    * word-count shape (map-side combine, power-law keys absorbed by partial
    * aggregation, no skew join anywhere).
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int, minCount: Long): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    // Guard the sequence: Spark's `sequence(0, -1)` infers a NEGATIVE step
    // and yields [0, -1] — a doc shorter than n tokens must produce zero
    // grams, not two broken ones.
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    val counted = docs
      .select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
    // Bounded global top-k: order by (cnt desc, gram asc). TopKAgg orders
    // structs lexicographically largest-first, so negate the count and flip.
    val picked = counted.agg(
      TopK.topK(struct((-col("cnt")).as("nc"), col("gram")), k, largest = false).as("top"))
    picked.select(explode(col("top")).as("t"))
      .select((-col("t.nc")).as("cnt"), col("t.gram").as("gram"))
  }
}
