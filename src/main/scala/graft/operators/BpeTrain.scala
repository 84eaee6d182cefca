package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Distributed BPE merge-rule LEARNING — the training half of the tokenizer
  * story ([[TextAnalysis.bpeTokenCount]] is the application half): greedy
  * byte-pair encoding over the corpus word-frequency table, the classic
  * Sennrich et al. (2016) algorithm.
  *
  * Scale shape — the reason this is tractable at 100 TB: the CORPUS-sized
  * work happens exactly once (one token explode → word-frequency
  * aggregation, a keyed shuffle with map-side combine). Every learning
  * iteration after that operates on the VOCAB-sized `(symbol-stream,
  * count)` table — the same trick every production BPE trainer uses
  * (counts over the frequency dict, not the raw text). Per round: one
  * pair-count aggregation over the vocab (weighted by word frequency), a
  * deterministic argmax (count desc, pair asc — ties cannot flip between
  * engines), and a literal replace that applies the merge to the vocab
  * streams. The `limit(1).collect()` per round is O(1) driver rows
  * by construction; `localCheckpoint` truncates the per-round lineage
  * exactly like the Lloyd trainers.
  *
  * Merge application uses the same boundary-safe space-DOUBLING replace
  * as [[TextAnalysis.bpeTokenCount]] — exact greedy left-to-right BPE
  * semantics (`a a a a a → aa aa a`, matching reference trainers on odd
  * runs) — so learned rules feed the application path unchanged.
  */
object BpeTrain {

  /** Learn `numMerges` merge rules from `df.textCol`. Returns one row per
    * rule: `(rank, pair, merged, cnt)` in learning order — `pair` is the
    * space-delimited symbol pair ("t h"), `merged` its concatenation
    * ("th"), `cnt` the frequency-weighted occurrence count that won the
    * round. Fewer rows than `numMerges` when the vocab runs dry.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    // Corpus-sized pass, once: word frequencies, then char-spaced streams.
    var cur = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("c"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 0
    var dry = false
    while (k < numMerges && !dry) {
      val ws = split(trim(col("sym")), " ")
      // zip_with of the two shifted slices: the lambda touches ONLY its
      // arguments, so the split evaluates once per row — an element_at(ws,…)
      // inside the lambda would re-run the split per element (the
      // interpreted-HOF O(n²) trap; HOF lambdas get no CSE).
      val bigrams = zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b))
      val top = cur
        .where(size(ws) > 1)
        .select(explode(bigrams).as("pair"), col("c"))
        .groupBy("pair").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val pair = top(0).getString(0)
        val merged = pair.replace(" ", "")
        learned += ((k, pair, merged, top(0).getLong(1)))
        val p2 = " " + pair.replace(" ", "  ") + " " // pair in doubled-space form
        cur = cur
          .select(replace(replace(replace(col("sym"), lit(" "), lit("  ")),
            lit(p2), lit(s" $merged ")), lit("  "), lit(" ")).as("sym"), col("c"))
          .localCheckpoint(true)
        k += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "pair", "merged", "cnt")
  }
}
