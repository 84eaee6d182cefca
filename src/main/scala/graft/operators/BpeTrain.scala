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
  * (counts over the frequency dict, not the raw text). Per ROUND: one
  * pair-count aggregation over the vocab (weighted by word frequency), a
  * bounded `limit(K).collect()` of the count-ordered head (O(K) driver
  * rows), and ONE literal-replace projection that applies every merge the
  * round proved safe; `localCheckpoint` truncates the per-round lineage
  * exactly like the Lloyd trainers.
  *
  * BATCHED rounds, exactly ≡ sequential greedy: a real 32k-merge vocab as
  * one Spark job per merge is 32k sequential jobs — the driver loop, not
  * the data, becomes the bottleneck. Each round therefore accepts the
  * maximal SYMBOL-DISJOINT prefix of the count-ordered pair head, cut at
  * the first candidate sharing a symbol with an accepted pair, then trims
  * every accepted pair (beyond the first) whose count does not STRICTLY
  * exceed that stopping candidate's count. Equivalence argument: merging
  * `(a,b)` leaves counts of symbol-disjoint pairs untouched, only lowers
  * counts of pairs sharing `a`/`b`, and every NEW pair `(x,ab)`/`(ab,y)`
  * is count-bounded by an OLD pair sharing a symbol (`(x,a)`/`(b,y)` —
  * each new adjacency was such an old adjacency). All symbol-sharing
  * pairs order at/after the stop candidate, so each kept merge beats
  * every possible rival of the corresponding sequential round on count
  * alone — no cross-engine tie-break on names sequential never compared.
  * Disjointness also makes the in-round replaces non-interacting (each
  * doubled-space pattern owns its boundary spaces), so one projection
  * applies the whole batch. `Round10PropertySpec` replays batched vs
  * forced-sequential (`batchSize = 1`) for equality; the measured rounds
  * reduction is recorded in BASELINE.md.
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
  def learnMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      batchSize: Int = 16): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    require(batchSize >= 1, "batchSize must be positive")
    val spark = df.sparkSession
    // Corpus-sized pass, once: word frequencies, then char-spaced streams.
    var cur = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("c"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var dry = false
    while (learned.size < numMerges && !dry) {
      val want = math.min(batchSize, numMerges - learned.size)
      // Head large enough to always contain the stop candidate when the
      // disjoint prefix fills the whole batch (`want` disjoint pairs + 1).
      val headK = 2 * want + 1
      val ws = split(trim(col("sym")), " ")
      // zip_with of the two shifted slices: the lambda touches ONLY its
      // arguments, so the split evaluates once per row — an element_at(ws,…)
      // inside the lambda would re-run the split per element (the
      // interpreted-HOF O(n²) trap; HOF lambdas get no CSE).
      val bigrams = zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat(a, lit(" "), b))
      val head = cur
        .where(size(ws) > 1)
        .select(explode(bigrams).as("pair"), col("c"))
        .groupBy("pair").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(headK).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (head.isEmpty) dry = true
      else {
        // Maximal symbol-disjoint prefix, cut at the FIRST overlap.
        val touched = scala.collection.mutable.HashSet.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var stopCnt = -1L // count of the first non-accepted candidate seen
        var i = 0
        var open = true
        while (open && i < head.length && accepted.size < want) {
          val (p, c) = head(i)
          val Array(u, v) = p.split(" ", 2)
          if (touched(u) || touched(v)) { stopCnt = c; open = false }
          else { accepted += ((p, c)); touched += u; touched += v }
          i += 1
        }
        // Exhausted the collected head (or hit `want`) without an overlap:
        // unseen candidates are count-bounded by the head's tail.
        if (stopCnt < 0 && i < head.length) stopCnt = head(i)._2
        else if (stopCnt < 0 && head.length == headK) stopCnt = head.last._2
        // Keep the argmax unconditionally (it IS sequential's pick); every
        // later merge must STRICTLY out-count the stop candidate, which
        // bounds all residual and newly-created rival pairs.
        val kept = accepted.head +:
          accepted.tail.takeWhile { case (_, c) => c > stopCnt }
        kept.foreach { case (p, c) =>
          learned += ((learned.size, p, p.replace(" ", ""), c))
        }
        // One projection applies the whole (pairwise-disjoint) batch: the
        // doubled-space patterns own their boundary spaces, so replaces
        // neither overlap nor enable each other, in any order.
        val doubled = replace(col("sym"), lit(" "), lit("  "))
        val applied = kept.foldLeft(doubled) { case (c, (p, _)) =>
          replace(c, lit(" " + p.replace(" ", "  ") + " "),
            lit(" " + p.replace(" ", "") + " "))
        }
        cur = cur
          .select(replace(applied, lit("  "), lit(" ")).as("sym"), col("c"))
          .localCheckpoint(true)
        rounds += 1
      }
    }
    lastRounds.set(rounds)
    import spark.implicits._
    learned.toSeq.toDF("rank", "pair", "merged", "cnt")
  }

  /** Rounds (Spark job groups) the most recent [[learnMerges]] call used —
    * diagnostic only (BASELINE.md batching measurement + spec assertions).
    */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger(0)
}
