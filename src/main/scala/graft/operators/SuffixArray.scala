package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.Shim

/** Distributed SUFFIX ARRAY over a document corpus — the exact-substring
  * primitive of the dedup literature (suffix arrays over concatenated
  * training corpora drive exact duplicate-span removal at trillion-token
  * scale; this engine's winnowing family approximates the same signal with
  * sampled anchors, the suffix array IS the exact version).
  *
  * Suffix space: every (doc, offset) suffix of every document — suffixes
  * never span documents, which keeps the relational construction clean and
  * loses nothing for dedup (a substring shared across documents is a shared
  * prefix of two suffixes regardless of any concatenation order).
  *
  * Construction is PREFIX DOUBLING (Karp–Miller–Rosenberg / Manber–Myers),
  * expressed relationally:
  *  - round 0 ranks each suffix by its first [[SuffixArray.InitPrefix]]
  *    code points (dense rank over the substring, binary order — identical
  *    to UTF-8 byte order, the collation DuckDB's `ORDER BY` uses, so
  *    oracle replays agree; a substring that ends at the document boundary
  *    is shorter and sorts first, exactly string order) — seeding the loop
  *    at k = InitPrefix instead of k = 1 removes log2(InitPrefix) rounds;
  *  - round k ranks by the pair `(rank, rank of the suffix k positions
  *    later)` — a self-join on `(doc, off+k)` with missing-next mapped to
  *    rank 0 (shorter-is-smaller, exactly string order) — doubling the
  *    compared prefix every round: O(log maxDocLen) rounds total;
  *  - equal suffixes (identical docs produce them) keep equal DENSE ranks
  *    forever; the loop stops when a doubling round refines nothing (the
  *    KMR fixpoint: a partition stable under one doubling is the final
  *    suffix-equivalence partition) or when all ranks are distinct, with a
  *    LOUD `require` on the round budget — never a silently-wrong array.
  *
  * The global dense rank is [[denseRankGlobal]] — range-partition + local
  * window + O(partitions) driver prefix offsets; no single-partition
  * window, no global sort skew, no distinct/join-back round trips (the
  * non-distinct rowset is ranked in place and the distinct count falls out
  * of the same pass). Scale shape per round: one keyed self-join + one
  * range exchange over the CHARACTER-count row space — the honest cost of
  * exact suffix indexing (the published systems pay exactly this), bounded
  * by `maxRounds` ≈ log2 of the longest document.
  */
object SuffixArray {

  /** Code points compared by the round-0 rank (and thus the starting `k`).
    * 16 keeps the seed cheap (one substr per suffix, no extra rounds for
    * short docs) while saving log2(16) = 4 doubling rounds on long ones.
    */
  val InitPrefix = 16

  /** Global 1-based DENSE rank of `keys` tuples (binary/lexicographic
    * order), appended as `out`; also returns the total distinct-tuple
    * count (the prefix-doubling convergence signal, measured here for
    * free). Two-phase: range-partition the rows (duplicates land in the
    * same range by construction), dense-rank locally per partition, lift
    * by per-partition DISTINCT-count offsets (O(partitions) driver rows —
    * same bounded-collect discipline as the bucket rollups). Rank VALUES
    * are partition-independent (they are the mathematical dense rank), so
    * results are deterministic even though range boundaries come from
    * sampling. The returned frame is eagerly localCheckpoint-ed: every
    * caller immediately re-consumes it at least twice (count probes, the
    * next round's self-join), and checkpointing here also pins the
    * sampled range placement.
    */
  private[operators] def denseRankGlobal(
      df: DataFrame, keys: Seq[String], out: String): (DataFrame, Long) = {
    val ss = df.sparkSession
    val kc = keys.map(col)
    val width = ss.sessionState.conf.numShufflePartitions
    val win = Window.partitionBy("_pid").orderBy(kc: _*)
    val local = df
      .repartitionByRange(width, kc: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", dense_rank().over(win))
      .localCheckpoint(true)
    val counts = local.groupBy("_pid").agg(max("_lr").as("_n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
    val offsets = (0 until width).scanLeft(0L) {
      case (acc, p) => acc + counts.getOrElse(p, 0L)
    }
    import ss.implicits._
    val offDf = (0 until width).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val ranked = local
      .join(broadcast(offDf), "_pid")
      .withColumn(out, col("_off") + col("_lr"))
      .drop("_pid", "_lr", "_off")
      .localCheckpoint(true)
    (ranked, offsets(width))
  }

  /** Build the suffix array: one row per (doc, 1-based char offset) with
    * its global dense `rank` in suffix order. Equal suffixes share a rank.
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 32): DataFrame = {
    // One row per suffix, keyed by its InitPrefix-char window — offsets
    // come from a sequence explode; no per-character row blowup beyond
    // the suffix rows themselves.
    val sufs = docs
      .where(length(col(textCol)) >= 1)
      .select(col(idCol).as("_d"), col(textCol).as("_t"),
        explode(sequence(lit(1L), length(col(textCol)).cast("long"))).as("_o"))
      .select(col("_d"), col("_o"),
        col("_t").substr(col("_o").cast("int"), lit(InitPrefix)).as("_c"))
    var (s, distinct) = denseRankGlobal(sufs, Seq("_c"), "_r")
    s = s.select("_d", "_o", "_r")
    val total = s.count()
    var k = InitPrefix.toLong
    var rounds = 0
    var done = distinct == total
    while (!done && rounds < maxRounds) {
      // Suffix (d, o)'s continuation rank = rank of (d, o + k): realized by
      // shifting the rank table left by k and LEFT-joining — missing (past
      // end of doc) becomes rank 0, which sorts before every real rank:
      // the shorter-suffix-first rule of string order.
      val nxt = s.select(col("_d"), (col("_o") - k).as("_o"), col("_r").as("_rn"))
        .where(col("_o") >= 1L)
      val paired = s.join(nxt, Seq("_d", "_o"), "left")
        .select(col("_d"), col("_o"), col("_r"),
          coalesce(col("_rn"), lit(0L)).as("_rn"))
      val (ranked, nd) = denseRankGlobal(paired, Seq("_r", "_rn"), "_r2")
      s = ranked.select(col("_d"), col("_o"), col("_r2").as("_r"))
      done = nd == total || nd == distinct // all unique, or KMR fixpoint
      distinct = nd
      k *= 2
      rounds += 1
    }
    require(done || total == 0,
      s"suffix array did not converge within $maxRounds doubling rounds " +
        s"(distinct ranks $distinct of $total)")
    s.select(col("_d").as(idCol), col("_o").as("off"), col("_r").as("rank"))
  }

  private def commonPrefixLen(a: Column, b: Column, cap: Int): Column =
    Shim.column(graft.expressions.CommonPrefixLen(
      Shim.expression(a), Shim.expression(b), cap))

  /** Exact repeated substrings of length >= `minLen`: adjacent suffixes in
    * suffix-array order compared by [[graft.expressions.CommonPrefixLen]]
    * — the classic LCP-array signal (every maximal repeat shows up as an
    * adjacent-suffix LCP >= its length). Output one row per adjacent pair
    * `(id_a, off_a, id_b, off_b, lcp)` with lcp capped at `cap`
    * (cap-bounded suffix WINDOWS are what ship to the comparison at scale;
    * a repeat longer than the cap reports exactly `cap` — the dedup
    * decision needs only `>= minLen`, never the exact tail length).
    *
    * Adjacency needs a TOTAL order, so ties (equal suffixes) are broken by
    * (doc, off) through a second [[denseRankGlobal]] pass — all-distinct
    * tuples, i.e. a global row number. The oracle replays the same
    * ordering with a lag window.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      cap: Int = 512,
      maxRounds: Int = 32): DataFrame = {
    require(minLen >= 1 && cap >= minLen, "need 1 <= minLen <= cap")
    val sa = build(docs, idCol, textCol, maxRounds)
    val (pos, _) = denseRankGlobal(sa, Seq("rank", idCol, "off"), "_p")
    // cap-bounded suffix windows ride the pair join — never full suffixes.
    val withSuf = pos.join(docs.select(col(idCol), col(textCol)), idCol)
      .select(col("_p"), col(idCol), col("off"),
        col(textCol).substr(col("off").cast("int"), lit(cap)).as("_suf"))
      .localCheckpoint(true) // consumed by both sides of the adjacency join
    val a = withSuf.select(col("_p"), col(idCol).as("id_a"),
      col("off").as("off_a"), col("_suf").as("_sa"))
    val b = withSuf.select((col("_p") - 1L).as("_p"), col(idCol).as("id_b"),
      col("off").as("off_b"), col("_suf").as("_sb"))
    a.join(b, "_p")
      .withColumn("lcp", commonPrefixLen(col("_sa"), col("_sb"), cap))
      .where(col("lcp") >= minLen)
      .select(col("_p").as("sa_pos"), col("id_a"), col("off_a"),
        col("id_b"), col("off_b"), col("lcp"))
  }

  /** Corpus-wide EXACT-substring dedup cut — the published ExactSubstr
    * contract (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): EVERY occurrence of a substring of length
    * >= `minLen` that appears more than once ANYWHERE in the corpus
    * (across documents or within one) is deleted. Realized from
    * [[repeatedSpans]] by cutting BOTH sides of every qualifying adjacent
    * pair: a suffix lies in a duplicate run iff its LCP with the adjacent
    * suffix on at least one side reaches `minLen`, so the two-sided cut
    * covers every run member — including the run head — with no
    * keep-policy coordination across runs (the keep-one variant at
    * document scope is [[Dedup.removeSelfDupText]]). Per-suffix intervals
    * overlap heavily inside a long repeat; the shared interval-union
    * rebuild collapses them, so a repeat longer than `cap` is still
    * removed in full (successive suffix positions tile it).
    *
    * One row per input document: `(idCol, text_clean, n_spans,
    * n_removed_chars)` — `n_spans` counts cut intervals attributed to the
    * document (both-side attribution, before the union collapse);
    * untouched docs carry original text with zero counts. Single pass: a
    * duplicate formed ACROSS a cut seam is not re-hunted, matching the
    * production contract of the span family.
    */
  def removeRepeatedText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      cap: Int = 512,
      maxRounds: Int = 32): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, minLen, cap, maxRounds)
    val cuts = spans
      .select(col("id_a").as(idCol), col("off_a").as("s"), col("lcp").as("l"))
      .unionAll(spans
        .select(col("id_b").as(idCol), col("off_b").as("s"), col("lcp").as("l")))
    Dedup.cutIntervalsRebuild(docs, idCol, textCol, cuts)
  }
}
