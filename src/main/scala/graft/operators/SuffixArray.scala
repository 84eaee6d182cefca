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
  * Construction is SEED RANK + BUCKET REFINEMENT (Larsson–Sadakane bucket
  * refinement with direct blocked comparison), expressed relationally:
  *  - the seed pass ranks each suffix by its first
  *    [[SuffixArray.InitPrefix]] code points (binary order — identical to
  *    UTF-8 byte order, the collation DuckDB's `ORDER BY` uses, so oracle
  *    replays agree; a substring that ends at the document boundary is
  *    shorter and sorts first, exactly string order). Ranks are
  *    MIN-POSITION (class rank = sorted position of the class head), which
  *    makes them local under refinement: uniquely-ranked suffixes freeze
  *    immediately and are never read again;
  *  - each refinement round re-sorts ONLY still-tied classes by the next
  *    [[SuffixArray.CompareBlock]] characters of their suffixes, fetched
  *    from the documents table by a broadcast join — the direct,
  *    memcmp-style comparison the published suffix-dedup implementations
  *    use, blocked so a round ships a bounded window, never an unbounded
  *    suffix. Ties that exhaust their text are genuinely EQUAL suffixes
  *    and keep their shared rank — with a LOUD `require` on the round
  *    budget, never a silently-wrong array;
  *  - one final global pass converts the converged min-position ranks to
  *    the DENSE ranks of the public contract.
  *
  * The global rank passes use [[denseRankGlobal]]-style two-phase ranking —
  * range-partition + local window + O(partitions) driver prefix offsets; no
  * single-partition window, no global sort skew. Scale shape: TWO
  * corpus-wide range exchanges total (seed + final dense), plus per-round
  * work proportional to the still-tied suffixes only (measured 12% of the
  * sf0.1 corpus after the 32-char seed) with rounds ≈ ceil(repeat-depth /
  * block) — typically one.
  */
object SuffixArray {

  /** Code points compared by the round-0 rank (and thus the starting `k`).
    * The seed width decides how much of the corpus survives into the
    * bucket-refinement rounds: under the 32-char window only suffixes
    * inside genuinely repeated ≥32-char text stay tied (measured 12% of
    * the sf0.1 corpus vs 70% at 16 chars — and the dedup minLen of the
    * span family is 20, so a 32-char seed already separates everything the
    * cut will not touch). Doubling the seed doubles round-0 key bytes but
    * round 0 is ONE exchange; each saved/shrunk refinement round is a
    * whole extra pass. 48+ chars measured no further tie reduction.
    */
  val InitPrefix = 32

  /** Rows per range partition the ranker targets. A suffix row in the
    * seed exchange is a (doc, off, 32-char key) tuple ≈ 100–150B plus
    * window-sort overhead, so 256k rows keep a partition's sort working
    * set a few tens of MB — comfortably in executor memory at any scale.
    *
    * The width is sized to the DATA, in BOTH directions (round 14): the
    * session conf is neither a floor (gate-sized inputs would pay
    * 32-task fixed overhead per refinement round — the corpus-pipeline
    * stage-boundary lesson) nor a CEILING. The previous version capped at
    * `numShufflePartitions`, and the f=30 hostile probe (46M suffixes)
    * showed exactly what that costs: 32 partitions × 1.4M rows forced
    * 9.4GB of sort spill. Uncapped, f=30 runs at 176 partitions × 256k
    * rows with spill ≈ 0. The loud 1<<20 guard bounds the driver's
    * O(width) offset arrays; a corpus that trips it (≈275G chars in one
    * SA build) should be sharded upstream — the gram-cut family is the
    * documented scale path long before that point (see the curation
    * YAML's SA-vs-gram-cut boundary note).
    *
    * Skew bound, documented: equal seed keys land in ONE range partition
    * by construction, so a single ≥32-char boilerplate value repeated X
    * times concentrates X rows in one task's window sort regardless of
    * width. The per-class width bound is therefore max-class-size, not
    * rows/width; a corpus dominated by one such value needs the gram-cut
    * path (which caps posting lists) or a pre-pass stripping the
    * boilerplate — the refinement rounds are safe either way (they
    * re-sort only still-tied classes, and an exhausted equal class
    * freezes rather than loops).
    */
  private def rankWidth(ss: org.apache.spark.sql.SparkSession, rows: Long): Int = {
    val w = (rows + 262143L) / 262144L
    require(w <= (1L << 20),
      s"suffix-array build over $rows suffixes would need $w range partitions; " +
        "shard the corpus (or use Dedup.exactSubstrCutByGrams, the documented " +
        "scale path) instead of one monolithic SA build")
    math.max(1L, w).toInt
  }

  /** Global 1-based DENSE rank of `keys` tuples (binary/lexicographic
    * order), appended as `out`; also returns the total distinct-tuple
    * count (a convergence signal for rank-refinement callers, measured
    * here for free). Two-phase: range-partition the rows (duplicates land in the
    * same range by construction), dense-rank locally per partition, lift
    * by per-partition DISTINCT-count offsets (O(partitions) driver rows —
    * same bounded-collect discipline as the bucket rollups). Rank VALUES
    * are partition-independent (they are the mathematical dense rank), so
    * results are deterministic even though range boundaries come from
    * sampling. Only the post-sort frame is eagerly localCheckpoint-ed
    * (it is consumed by the offset collect AND every downstream read);
    * the returned frame is a broadcast-join veneer over that
    * materialization — re-reading it costs a checkpoint scan, never a
    * re-sort, so a second checkpoint would only add a job per round.
    */
  private[operators] def denseRankGlobal(
      df: DataFrame, keys: Seq[String], out: String, width: Int): (DataFrame, Long) = {
    val ss = df.sparkSession
    val kc = keys.map(col)
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
    (ranked, offsets(width))
  }

  /** Active-set rows above this count fall back from a broadcast probe to a
    * plain shuffled join in the refinement rounds — the guard that keeps a
    * pathologically repetitive corpus (active set ~ corpus) from
    * broadcasting an unbounded frame. 4M rows of (doc, off, rank, len)
    * ≈ 128MB serialized, the conventional broadcast ceiling.
    */
  val BroadcastActiveMax = 4L << 20

  /** Characters of text each refinement round compares per still-tied
    * suffix (the published suffix-dedup implementations compare suffixes
    * DIRECTLY, memcmp-style — this is that comparison, blocked so a round
    * ships a bounded window, never an unbounded suffix). 512 matches the
    * span family's default LCP cap: one round fully separates every tie
    * the cut could act on.
    */
  val CompareBlock = 512

  /** Build the suffix array: one row per (doc, 1-based char offset) with
    * its global dense `rank` in suffix order. Equal suffixes share a rank.
    *
    * SEED RANK + BUCKET REFINEMENT (Larsson–Sadakane bucket refinement,
    * with direct blocked comparison instead of rank doubling):
    *
    *  - ONE corpus-wide pass ranks every suffix by its
    *    [[SuffixArray.InitPrefix]]-char window. The loop carries
    *    MIN-POSITION ranks (a class's rank = the global sorted position of
    *    its first row) rather than dense ranks, because min-position ranks
    *    are LOCAL under refinement — when a tied class splits, the new
    *    subclass ranks land inside the parent class's position interval
    *    and every other rank in the array is untouched. Suffixes whose
    *    class reaches size 1 therefore FREEZE immediately and are never
    *    read again.
    *  - Each refinement round re-ranks ONLY the still-tied rows (measured
    *    12% of the sf0.1 corpus after the 32-char seed; ties survive only
    *    inside genuinely repeated text) by the NEXT
    *    [[SuffixArray.CompareBlock]] characters of their suffix, fetched
    *    straight from the documents table — `substr` past the end yields
    *    the shorter window, which sorts first, exactly string order, so
    *    suffix exhaustion needs no length bookkeeping. Rounds needed:
    *    ceil(repeat-depth / block), typically ONE — versus the classic
    *    relational KMR loop's log2(maxDocLen) full-corpus self-joins and
    *    full-corpus global re-ranks. Per-round bytes: the documents text
    *    column (~1B/char, broadcast-joined against the active set) versus
    *    prefix doubling's rank-table scan (~24B/suffix = 24B/char) — the
    *    direct comparison is cheaper per round AND needs far fewer rounds.
    *  - Dense ranks (the public contract, equal suffixes share a rank) are
    *    recovered by one final global pass over the converged min-position
    *    ranks (a single long key).
    *
    * `block` is exposed for tests (a tiny block forces many rounds); the
    * default is the production setting.
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 32,
      block: Int = CompareBlock): DataFrame = {
    val (raw, width) = buildRaw(docs, idCol, textCol, maxRounds, block)
    // Dense ranks for the public contract: one global pass over the
    // converged min-position ranks (a single long key).
    val (dense, _) = denseRankGlobal(raw, Seq("_r"), "_dr", width)
    dense.select(col("_d").as(idCol), col("_o").as("off"),
      col("_dr").as("rank"))
  }

  /** The refinement loop of [[build]], stopping at converged MIN-POSITION
    * ranks (same order, same tie classes, sparse values) plus the exchange
    * width — for consumers like [[repeatedSpans]] that impose their own
    * total order anyway and would otherwise pay the dense conversion's
    * corpus-wide pass just to discard it.
    */
  private[operators] def buildRaw(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 32,
      block: Int = CompareBlock): (DataFrame, Int) = {
    require(block >= 1, "block must be >= 1")
    val ss = docs.sparkSession
    import ss.implicits._
    // The suffix count IS the corpus character count, so it comes from a
    // pre-explode aggregate (one cheap scan of `docs`) — it sizes the rank
    // exchanges without counting the exploded rowset.
    val nonEmpty = docs.where(length(col(textCol)) >= 1)
    val total = Option(nonEmpty
      .agg(sum(length(col(textCol)).cast("long"))).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val width = rankWidth(ss, total)
    // One row per suffix, keyed by its InitPrefix-char window — offsets
    // come from a sequence explode; no per-character row blowup beyond the
    // suffix rows themselves.
    val sufs = nonEmpty
      .select(col(idCol).as("_d"), col(textCol).as("_t"),
        explode(sequence(lit(1L), length(col(textCol)).cast("long"))).as("_o"))
      .select(col("_d"), col("_o"),
        col("_t").substr(col("_o").cast("int"), lit(InitPrefix)).as("_c"))
    // Seed pass — the ONE corpus-wide exchange: range-partition by the
    // seed window (equal keys land together by construction), row_number
    // locally, lift to global positions by per-partition row counts, then
    // take each seed class's min position as its rank and its size as the
    // freeze signal. Positions of class HEADS depend only on how many
    // suffixes sort strictly below, so ranks are deterministic even though
    // range boundaries come from sampling.
    val winPos = Window.partitionBy("_pid").orderBy("_c")
    val winCls = Window.partitionBy("_pid", "_c")
    // Class-local min row-number and class size are computed BEFORE the
    // checkpoint so the seed-key column (InitPrefix chars per suffix) never
    // materializes; offsets lift the local min to the global min position
    // (the class is contained in one range partition by construction).
    val local = sufs
      .repartitionByRange(width, col("_c"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_rn", row_number().over(winPos))
      .withColumn("_lr", min("_rn").over(winCls))
      .withColumn("_sz", count(lit(1)).over(winCls))
      .drop("_c", "_rn")
      .localCheckpoint(true)
    val rowCounts = local.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until width).scanLeft(0L) {
      case (acc, p) => acc + rowCounts.getOrElse(p, 0L)
    }
    val offDf = (0 until width).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val based = local
      .join(broadcast(offDf), "_pid")
      .withColumn("_r", col("_off") + col("_lr"))
      .select(col("_d"), col("_o"), col("_r"), col("_sz"))
    // Frozen rows stay as lazy filters over their round's checkpointed
    // frame (a narrow re-scan, never a re-sort); only the shrinking active
    // set is re-materialized per round.
    var frozen = List(based.where(col("_sz") === 1).select("_d", "_o", "_r"))
    var active = based.where(col("_sz") > 1)
      .select("_d", "_o", "_r").localCheckpoint(true)
    var activeCnt = active.count()
    val docsTxt = nonEmpty.select(col(idCol).as("_d"), col(textCol).as("_t"))
    var off = InitPrefix.toLong // chars already compared per active suffix
    var rounds = 0
    var done = activeCnt == 0L
    while (!done && rounds < maxRounds) {
      // Fetch each active suffix's next `block` characters by joining back
      // to the documents table — broadcast the (small) active side so the
      // corpus text is only SCANNED, with the join's doc-id filter pruning
      // what reaches the window computation.
      val probeSide =
        if (activeCnt <= BroadcastActiveMax) broadcast(active) else active
      // Size the refinement exchange to the DATA TOO (round 14): the
      // class-window sort below carries `block` chars per active row
      // (~0.5KB at the default), and inheriting the session width hands
      // each task activeCnt/width of that — at the f=30 hostile probe
      // (46M active rows, width 32) that is ~790MB of sort working set
      // per task × 32 concurrent, which spilled 9.4GB in r13 and OOMs
      // outright in an 8GB local[32] driver. Repartition by the class key
      // at the session's ADVISORY partition size (Spark's own
      // post-shuffle sizing knob — cluster operators already tune it to
      // their per-core memory; 64MB default) of window bytes per
      // partition. The Window's ClusteredDistribution(_r) is satisfied by
      // this exchange, so no second shuffle is added — the width of the
      // ONE exchange just follows the bytes it must sort. Equal keys
      // stay co-located (hash on _r), exactly as before; a single
      // over-sized tie class still lands in one task (see the skew bound
      // note on rankWidth).
      val advisory = math.max(1L << 20,
        ss.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
      val refWidth = math.max(1, math.min(1L << 20,
        activeCnt * (block + 64L) / advisory + 1L)).toInt
      val paired = probeSide.join(docsTxt, "_d")
        .withColumn("_w",
          col("_t").substr((col("_o") + off).cast("int"), lit(block)))
        .drop("_t")
        .repartition(refWidth, col("_r"))
      // Refine within each class: rank() over the window strings is
      // exactly min-position semantics (1 + the number of strictly-smaller
      // members, ties share), so subclass ranks slot into the parent
      // interval without touching any other class. Both windows shuffle
      // ACTIVE rows only. A window that runs past the end of the document
      // is shorter and sorts first — the shorter-suffix-first rule of
      // string order, for free.
      val winR = Window.partitionBy("_r").orderBy("_w")
      val winSub = Window.partitionBy("_r", "_w")
      // The comparison window column is DROPPED before materialization —
      // checkpointing it would hold `block` chars per active row (the f=30
      // hostile probe OOMed exactly there); only its length survives, as
      // the exhaustion bit.
      val refined = paired
        .withColumn("_r2", col("_r") + rank().over(winR) - 1L)
        .withColumn("_sz", count(lit(1)).over(winSub))
        .withColumn("_live",
          (col("_sz") > 1 && length(col("_w")) > 0).cast("int"))
        .drop("_w")
        .localCheckpoint(true)
      // One tiny driver row per round: the surviving-tie count and whether
      // any surviving tie still has text left to compare. An exhausted tie
      // (empty window on every member) is a class of genuinely EQUAL
      // suffixes — they share their rank forever, which IS convergence.
      val Array(nextCnt, liveCnt) = refined
        .agg(sum(when(col("_sz") > 1, 1L).otherwise(0L)),
          sum(col("_live").cast("long")))
        .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Long]).getOrElse(0L))
        .toArray
      frozen = refined.where(col("_sz") === 1)
        .select(col("_d"), col("_o"), col("_r2").as("_r")) :: frozen
      active = refined.where(col("_sz") > 1)
        .select(col("_d"), col("_o"), col("_r2").as("_r"))
      activeCnt = nextCnt
      done = activeCnt == 0L || liveCnt == 0L
      off += block
      rounds += 1
    }
    require(done || total == 0,
      s"suffix array did not converge within $maxRounds refinement rounds " +
        s"($activeCnt of $total suffixes still tied)")
    ((frozen :+ active.select("_d", "_o", "_r")).reduce(_ unionAll _), width)
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
    // The raw min-position ranks order identically to the dense ranks, so
    // the total-order pass here (tiebreak by doc, off) is the ONLY global
    // rank conversion the span report pays.
    val (rawRanks, width) = buildRaw(docs, idCol, textCol, maxRounds)
    val (pos, _) = denseRankGlobal(rawRanks, Seq("_r", "_d", "_o"), "_p", width)
    // Adjacency FIRST, windows LAST: the (position, doc, off) triples pair
    // up on the 24B/row position key, and only then does each pair side
    // fetch its cap-bounded suffix window by a doc-keyed join straight
    // from the documents table. The windows therefore exist only inside
    // the final comparison stage — the previous shape materialized a
    // cap-chars-per-suffix checkpoint (0.5 KB × corpus characters; the
    // f=30 growth probe spilled 9 GB on exactly that frame) before the
    // pair join shipped the same windows again.
    val slim = pos.select(col("_p"), col("_d"), col("_o"))
    val a = slim.select(col("_p"), col("_d").as("id_a"), col("_o").as("off_a"))
    val b = slim.select((col("_p") - 1L).as("_p"), col("_d").as("id_b"),
      col("_o").as("off_b"))
    val pairs = a.join(b, "_p")
    val txt = docs.select(col(idCol), col(textCol))
    pairs
      .join(txt.select(col(idCol).as("id_a"), col(textCol).as("_ta")), "id_a")
      .withColumn("_sa", col("_ta").substr(col("off_a").cast("int"), lit(cap)))
      .drop("_ta")
      .join(txt.select(col(idCol).as("id_b"), col(textCol).as("_tb")), "id_b")
      .withColumn("_sb", col("_tb").substr(col("off_b").cast("int"), lit(cap)))
      .drop("_tb")
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
