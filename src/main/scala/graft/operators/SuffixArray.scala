package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * refinement with direct blocked comparison):
  *  - the seed pass ranks each suffix by its first
  *    [[SuffixArray.InitPrefix]] code points (binary order — identical to
  *    UTF-8 byte order, the collation DuckDB's `ORDER BY` uses, so oracle
  *    replays agree). Ranks are MIN-POSITION (class rank = sorted position
  *    of the class head), which makes them local under refinement:
  *    uniquely-ranked suffixes freeze immediately and are never read again;
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
  * EXCHANGE SHAPE AND SKEW (round 15 — this is the load-bearing design):
  * every pass is ONE range exchange whose key ends in the (doc, offset)
  * tiebreak, so partitions are balanced BY CONSTRUCTION no matter how
  * skewed the key distribution is — a corpus where half the suffixes share
  * one ≥32-char boilerplate window spreads that tie class across as many
  * partitions as its row count demands. The per-partition rank/size scan
  * is a single `mapPartitions` pass over the sorted partition (NOT a
  * `Window.partitionBy(pid)`, which EnsureRequirements would feed with a
  * second corpus-wide hash exchange — measured on the round-14 shape: the
  * window form re-shuffled the whole suffix frame a second time per pass
  * AND re-concentrated oversized classes into single hash groups). Classes
  * that straddle a partition boundary — only the FIRST and LAST class of
  * each partition can — are reconciled from ≤2 tiny boundary records per
  * partition: global stats (min position, total size, cross-partition
  * strictly-smaller counts) are aggregated over that O(partitions) record
  * frame and broadcast-joined back, so the reconciliation moves kilobytes
  * while the corpus-sized frame never shuffles again.
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
    * sort overhead, so 256k rows keep a partition's sort working set a
    * few tens of MB — comfortably in executor memory at any scale.
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
    * Skew bound (round 15): per-task width is rows/width REGARDLESS of
    * key skew — the range keys end in the (doc, offset) tiebreak, so an
    * oversized tie class SPREADS across partitions and is reconciled from
    * boundary records (see the class scaladoc). The former contract
    * ("equal seed keys land in ONE partition, per-class width bound is
    * max-class-size") no longer applies.
    */
  private def rankWidth(ss: org.apache.spark.sql.SparkSession, rows: Long): Int = {
    val w = (rows + 262143L) / 262144L
    require(w <= (1L << 20),
      s"suffix-array build over $rows suffixes would need $w range partitions; " +
        "shard the corpus (or use Dedup.exactSubstrCutByGrams, the documented " +
        "scale path) instead of one monolithic SA build")
    math.max(1L, w).toInt
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

  // ------------------------------------------------------------------
  // Per-partition scans (internal-row mapPartitions over range-sorted
  // partitions — Shim.mapPartitionsInternal; the external-row codec cost
  // ~6 allocations PER SUFFIX per pass and GC-bound the 46M-suffix growth
  // probe). Row kinds in the scan outputs: 0 = data row, 1 = boundary
  // record. Input rows are reused buffers: primitives are extracted
  // immediately, UTF8String keys cloned once per RUN (never per row);
  // output rides one reused SpecificInternalRow through one reused
  // UnsafeProjection — consumers copy when they buffer, per the internal
  // iterator contract.
  // ------------------------------------------------------------------

  private def copyOf(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case x => x
  }

  /** Seed-pass scan: input rows (id, off, key) sorted by key within the
    * partition. Emits one data row per suffix with its class's LOCAL head
    * position `_lr` and LOCAL size `_sz` (global values for classes
    * contained in the partition — only the first/last class can straddle),
    * plus ≤2 boundary records carrying the first/last class's key, head
    * position, local size, and the partition row count. The 32-char key
    * column therefore never materializes beyond the boundary records.
    */
  private def seedScan(idType: DataType): (StructType, Iterator[InternalRow] => Iterator[InternalRow]) = {
    val schema = StructType(Seq(
      StructField("_kind", IntegerType, nullable = false),
      StructField("_d", idType, nullable = true),
      StructField("_o", LongType, nullable = true),
      StructField("_lr", LongType, nullable = false),
      StructField("_sz", LongType, nullable = false),
      StructField("_k", StringType, nullable = true),
      StructField("_pn", LongType, nullable = true),
      StructField("_pid", IntegerType, nullable = false)))
    val fn = (rows: Iterator[InternalRow]) => new Iterator[InternalRow] {
      private val pid = TaskContext.getPartitionId()
      private val proj = UnsafeProjection.create(schema)
      private val out = new SpecificInternalRow(schema.fields.map(_.dataType).toSeq)
      private var pos = 0L
      private val bufD = new ArrayBuffer[Any]()
      // unboxed: a generic ArrayBuffer[Long] would box every offset
      private val bufO = new scala.collection.mutable.ArrayBuilder.ofLong
      private var runKey: UTF8String = null
      private var runStart = 1L
      // values of the row that ended the current run, held across the flush
      private var pendD: Any = null
      private var pendO = 0L
      private var pendK: UTF8String = null
      private var pend = false
      // (key, headPos, size) of the partition's first and latest class run
      private var firstRun: (UTF8String, Long, Long) = null
      private var lastRun: (UTF8String, Long, Long) = null
      private var recsDone = false
      private var cur: Iterator[InternalRow] = Iterator.empty

      private def emit(kind: Int, d: Any, o: Long, oNull: Boolean, lr: Long,
          sz: Long, k: UTF8String, pn: Long, pnNull: Boolean): InternalRow = {
        out.setInt(0, kind)
        if (d == null) out.setNullAt(1) else out.update(1, d)
        if (oNull) out.setNullAt(2) else out.setLong(2, o)
        out.setLong(3, lr)
        out.setLong(4, sz)
        if (k == null) out.setNullAt(5) else out.update(5, k)
        if (pnNull) out.setNullAt(6) else out.setLong(6, pn)
        out.setInt(7, pid)
        proj(out)
      }
      private def closeRun(): Unit = {
        val sz = bufD.length.toLong
        val run = (runKey, runStart, sz)
        if (firstRun == null) firstRun = run
        lastRun = run
        val ds = bufD.toArray
        val os = bufO.result()
        bufD.clear(); bufO.clear()
        val start = runStart
        cur = new Iterator[InternalRow] {
          private var i = 0
          def hasNext: Boolean = i < ds.length
          def next(): InternalRow = {
            val r = emit(0, ds(i), os(i), oNull = false, start, sz, null, 0L, pnNull = true)
            i += 1; r
          }
        }
      }
      private def advance(): Unit = {
        if (pend || rows.hasNext) {
          if (pend) {
            runKey = pendK; runStart = pos + 1
            bufD += pendD; bufO += pendO; pos += 1
            pend = false
          } else {
            val r = rows.next()
            runKey = r.getUTF8String(2).clone(); runStart = pos + 1
            bufD += copyOf(r.get(0, idType)); bufO += r.getLong(1); pos += 1
          }
          var open = true
          while (open && rows.hasNext) {
            val r = rows.next()
            val k = r.getUTF8String(2)
            if (k.equals(runKey)) {
              bufD += copyOf(r.get(0, idType)); bufO += r.getLong(1); pos += 1
            } else {
              pendK = k.clone(); pendD = copyOf(r.get(0, idType)); pendO = r.getLong(1)
              pend = true; open = false
            }
          }
          closeRun()
        } else if (!recsDone) {
          recsDone = true
          if (lastRun != null) {
            val pn = pos
            val recs = if (firstRun eq lastRun) List(firstRun) else List(firstRun, lastRun)
            // emit() reuses one row buffer — keep the calls inside next()
            cur = recs.iterator.map(r =>
              emit(1, null, 0L, oNull = true, r._2, r._3, r._1, pn, pnNull = false))
          }
        }
      }
      def hasNext: Boolean = {
        while (!cur.hasNext && !recsDone) advance()
        cur.hasNext
      }
      def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
    }
    (schema, fn)
  }

  /** Refinement-round scan: input rows (id, off, rank, window) sorted by
    * (rank, window) within the partition. Emits one data row per suffix
    * with its subclass's LOCAL min-position rank-within-class `_lrk`,
    * LOCAL subclass size `_lsub`, and the window-nonempty bit, plus ≤2
    * boundary records (the partition's first and last subclass run)
    * carrying the subclass key (rank, window), its local size, the owning
    * class's local row count, and — on the last record — the local rank of
    * that final run (so tail-subclass rows are identifiable without
    * carrying the window on any data row).
    */
  private def refineScan(idType: DataType): (StructType, Iterator[InternalRow] => Iterator[InternalRow]) = {
    val schema = StructType(Seq(
      StructField("_kind", IntegerType, nullable = false),
      StructField("_d", idType, nullable = true),
      StructField("_o", LongType, nullable = true),
      StructField("_r", LongType, nullable = false),
      StructField("_lrk", LongType, nullable = false),
      StructField("_lsub", LongType, nullable = false),
      StructField("_wne", BooleanType, nullable = true),
      StructField("_w", StringType, nullable = true),
      StructField("_clsCnt", LongType, nullable = true),
      StructField("_isFirst", BooleanType, nullable = true),
      StructField("_isLast", BooleanType, nullable = true),
      StructField("_pid", IntegerType, nullable = false)))
    val fn = (rows: Iterator[InternalRow]) => new Iterator[InternalRow] {
      private val pid = TaskContext.getPartitionId()
      private val proj = UnsafeProjection.create(schema)
      private val out = new SpecificInternalRow(schema.fields.map(_.dataType).toSeq)
      private val bufD = new ArrayBuffer[Any]()
      // unboxed: a generic ArrayBuffer[Long] would box every offset
      private val bufO = new scala.collection.mutable.ArrayBuilder.ofLong
      private var runR = 0L
      private var runW: UTF8String = null
      private var runLrk = 1L
      // pending lookahead values (the row that ended the current run)
      private var pendD: Any = null
      private var pendO = 0L
      private var pendR = 0L
      private var pendW: UTF8String = null
      private var pend = false
      // current class state
      private var clsKey = 0L
      private var clsRows = 0L        // rows of the current class emitted so far
      private var haveCls = false
      // partition boundary bookkeeping
      private var firstRun: (Long, UTF8String, Long, Long) = null // (r, w, lrk, size)
      private var lastRun: (Long, UTF8String, Long, Long) = null
      private var firstClsR = 0L
      private var firstClsCnt = -1L   // finalized when the first class ends
      private var recsDone = false
      private var cur: Iterator[InternalRow] = Iterator.empty

      private def emitData(d: Any, o: Long, r: Long, lrk: Long, lsub: Long,
          wne: Boolean): InternalRow = {
        out.setInt(0, 0)
        if (d == null) out.setNullAt(1) else out.update(1, d)
        out.setLong(2, o)
        out.setLong(3, r)
        out.setLong(4, lrk)
        out.setLong(5, lsub)
        out.setBoolean(6, wne)
        out.setNullAt(7); out.setNullAt(8); out.setNullAt(9); out.setNullAt(10)
        out.setInt(11, pid)
        proj(out)
      }
      private def emitRec(run: (Long, UTF8String, Long, Long), clsCnt: Long,
          isFirst: Boolean, isLast: Boolean): InternalRow = {
        out.setInt(0, 1)
        out.setNullAt(1); out.setNullAt(2)
        out.setLong(3, run._1)
        out.setLong(4, run._3)
        out.setLong(5, run._4)
        out.setNullAt(6)
        out.update(7, run._2)
        out.setLong(8, clsCnt)
        out.setBoolean(9, isFirst)
        out.setBoolean(10, isLast)
        out.setInt(11, pid)
        proj(out)
      }
      private def openRun(d: Any, o: Long, r: Long, w: UTF8String): Unit = {
        if (!haveCls || r != clsKey) {
          if (haveCls && clsKey == firstClsR && firstClsCnt < 0) firstClsCnt = clsRows
          clsKey = r; clsRows = 0L; haveCls = true
          if (firstRun == null) firstClsR = r
        }
        runR = r; runW = w; runLrk = clsRows + 1L
        bufD += d; bufO += o
      }
      private def closeRun(): Unit = {
        val sz = bufD.length.toLong
        clsRows += sz
        val run = (runR, runW, runLrk, sz)
        if (firstRun == null) firstRun = run
        lastRun = run
        val ds = bufD.toArray
        val os = bufO.result()
        bufD.clear(); bufO.clear()
        val wne = runW.numBytes > 0
        val (r0, lrk0) = (runR, runLrk)
        cur = new Iterator[InternalRow] {
          private var i = 0
          def hasNext: Boolean = i < ds.length
          def next(): InternalRow = {
            val row = emitData(ds(i), os(i), r0, lrk0, sz, wne)
            i += 1; row
          }
        }
      }
      private def advance(): Unit = {
        if (pend || rows.hasNext) {
          if (pend) { openRun(pendD, pendO, pendR, pendW); pend = false }
          else {
            val r = rows.next()
            openRun(copyOf(r.get(0, idType)), r.getLong(1), r.getLong(2),
              r.getUTF8String(3).clone())
          }
          var open = true
          while (open && rows.hasNext) {
            val r = rows.next()
            val rv = r.getLong(2)
            val wv = r.getUTF8String(3)
            if (rv == runR && wv.equals(runW)) {
              bufD += copyOf(r.get(0, idType)); bufO += r.getLong(1)
            } else {
              pendD = copyOf(r.get(0, idType)); pendO = r.getLong(1)
              pendR = rv; pendW = wv.clone()
              pend = true; open = false
            }
          }
          closeRun()
        } else if (!recsDone) {
          recsDone = true
          if (lastRun != null) {
            if (firstClsCnt < 0) firstClsCnt = clsRows // single-class partition
            val lastClsCnt = clsRows
            // emitRec reuses one row buffer — keep the calls inside next()
            cur =
              if (firstRun eq lastRun)
                Iterator(0).map(_ => emitRec(firstRun, firstClsCnt, isFirst = true, isLast = true))
              else {
                val fcc = firstClsCnt
                Iterator(
                  () => emitRec(firstRun, fcc, isFirst = true, isLast = false),
                  () => emitRec(lastRun, lastClsCnt, isFirst = false, isLast = true)
                ).map(_.apply())
              }
          }
        }
      }
      def hasNext: Boolean = {
        while (!cur.hasNext && !recsDone) advance()
        cur.hasNext
      }
      def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
    }
    (schema, fn)
  }

  /** Global 1-based DENSE rank of `keys` tuples (binary/lexicographic
    * order), appended as `out`; also returns the total distinct-tuple
    * count (a convergence signal for rank-refinement callers, measured
    * here for free). ONE range exchange keyed (keys ++ salt) — the salt
    * spreads oversized tie classes so partitions stay balanced under any
    * key skew — then a single sorted `mapPartitions` scan assigns local
    * dense ranks and emits a first/last-key boundary record per partition.
    * Ranks lift to global by per-partition distinct-count offsets ADJUSTED
    * for boundary-straddling keys (a key spanning partitions p..q is
    * locally counted q−p+1 times; each straddled boundary subtracts one),
    * which makes the straddling key's rows agree on one global rank with
    * NO row-level correction: the later partition's local rank 1 plus its
    * adjusted offset equals the earlier partition's value by construction.
    * O(partitions) driver rows — same bounded-collect discipline as the
    * bucket rollups. Rank VALUES are partition-independent (they are the
    * mathematical dense rank), so results are deterministic even though
    * range boundaries come from sampling.
    */
  private[operators] def denseRankGlobal(
      df: DataFrame, keys: Seq[String], out: String, width: Int,
      salt: Seq[String] = Nil): (DataFrame, Long) = {
    val ss = df.sparkSession
    import ss.implicits._
    val dataCols = df.schema.fields.map(_.name).toSeq
    val keyIdx = keys.map(dataCols.indexOf).toArray
    val inTypes = df.schema.fields.map(_.dataType)
    val schema = StructType(
      df.schema.fields.map(f => f.copy(nullable = true)).toSeq ++ Seq(
        StructField("_kind", IntegerType, nullable = false),
        StructField("_lr", LongType, nullable = false),
        StructField("_cnt", LongType, nullable = true),
        StructField("_pid", IntegerType, nullable = false)))
    val nIn = dataCols.length
    val fn = (rows: Iterator[InternalRow]) => new Iterator[InternalRow] {
      private val pid = TaskContext.getPartitionId()
      private val proj = UnsafeProjection.create(schema)
      private val out = new SpecificInternalRow(schema.fields.map(_.dataType).toSeq)
      private var rank = 0L
      private var prevKey: Array[Any] = null  // copied values, safe to hold
      private var firstKey: Array[Any] = null
      private var recsDone = false
      private var cur: Iterator[InternalRow] = Iterator.empty
      private def keyCopy(r: InternalRow): Array[Any] =
        keyIdx.map(i => copyOf(r.get(i, inTypes(i))))
      private def keyChanged(r: InternalRow): Boolean = {
        if (prevKey == null) return true
        var i = 0
        while (i < keyIdx.length) {
          if (r.get(keyIdx(i), inTypes(keyIdx(i))) != prevKey(i)) return true
          i += 1
        }
        false
      }
      private def emitRec(k: Array[Any], cnt: Long, cntNull: Boolean): InternalRow = {
        var i = 0
        while (i < nIn) { out.setNullAt(i); i += 1 }
        i = 0
        while (i < keyIdx.length) { out.update(keyIdx(i), k(i)); i += 1 }
        out.setInt(nIn, 1)
        out.setLong(nIn + 1, 0L)
        if (cntNull) out.setNullAt(nIn + 2) else out.setLong(nIn + 2, cnt)
        out.setInt(nIn + 3, pid)
        proj(out)
      }
      private def advance(): Unit = {
        if (rows.hasNext) {
          val r = rows.next()
          if (keyChanged(r)) { rank += 1L; prevKey = keyCopy(r) }
          if (firstKey == null) firstKey = prevKey
          var i = 0
          while (i < nIn) {
            val v = r.get(i, inTypes(i)) // views are fine: projected immediately
            if (v == null) out.setNullAt(i) else out.update(i, v)
            i += 1
          }
          out.setInt(nIn, 0)
          out.setLong(nIn + 1, rank)
          out.setNullAt(nIn + 2)
          out.setInt(nIn + 3, pid)
          cur = Iterator.single(proj(out))
        } else if (!recsDone) {
          recsDone = true
          if (prevKey != null) {
            val one = firstKey eq prevKey
            val fk = firstKey
            val pk = prevKey
            val rk = rank
            // emitRec reuses one row buffer — keep the calls inside next()
            cur =
              if (one) Iterator(0).map(_ => emitRec(fk, rk, cntNull = false))
              else Iterator(
                () => emitRec(fk, 0L, cntNull = true),
                () => emitRec(pk, rk, cntNull = false)
              ).map(_.apply())
          }
        }
      }
      def hasNext: Boolean = {
        while (!cur.hasNext && !recsDone) advance()
        cur.hasNext
      }
      def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
    }
    val rangeCols = (keys ++ salt).map(col)
    val chk = Shim.mapPartitionsInternal(
        df.repartitionByRange(width, rangeCols: _*)
          .sortWithinPartitions(keys.map(col): _*),
        schema)(fn)
      .localCheckpoint(true)
    // Boundary records: per pid the first key (cnt null) and last key
    // (cnt = local distinct count); merged when the partition holds one
    // key. O(width) rows of primitive key columns — driver-safe.
    val recs = chk.where(col("_kind") === 1)
      .select((Seq(col("_pid"), col("_cnt")) ++ keys.map(col)): _*)
      .collect()
    val cnts = new Array[Long](width)
    val firstK = new Array[Seq[Any]](width)
    val lastK = new Array[Seq[Any]](width)
    recs.foreach { r =>
      val p = r.getInt(0)
      val k = (2 until 2 + keys.length).map(r.get)
      if (r.isNullAt(1)) firstK(p) = k
      else {
        cnts(p) = r.getLong(1)
        lastK(p) = k
        if (firstK(p) == null) firstK(p) = k // single-key partition
      }
    }
    // Adjusted offsets: subtract one per straddled boundary (lastKey(q) ==
    // firstKey(q+1) means the key was locally counted on both sides).
    val adjOff = new Array[Long](width + 1)
    var acc = 0L
    var p = 0
    while (p < width) {
      val dup = p > 0 && lastK(p - 1) != null && firstK(p) != null &&
        lastK(p - 1) == firstK(p)
      adjOff(p) = acc - (if (dup) 1L else 0L)
      acc = adjOff(p) + cnts(p)
      p += 1
    }
    adjOff(width) = acc
    val offDf = (0 until width).map(i => (i, adjOff(i))).toDF("_pid", "_off")
    val ranked = chk.where(col("_kind") === 0)
      .join(broadcast(offDf), "_pid")
      .withColumn(out, col("_off") + col("_lr"))
      .select((dataCols :+ out).map(col): _*)
    (ranked, acc)
  }

  private def commonPrefixLen(a: Column, b: Column, cap: Int): Column =
    Shim.column(graft.expressions.CommonPrefixLen(
      Shim.expression(a), Shim.expression(b), cap))

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
    *    ranks (a single long key, (doc, off)-salted against oversized
    *    equal-suffix classes).
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
    val (dense, _) = denseRankGlobal(raw, Seq("_r"), "_dr", width,
      salt = Seq("_d", "_o"))
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
    val idType = docs.schema(idCol).dataType
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
    // Seed pass — the ONE corpus-wide exchange: range-partition by
    // (window, doc, off) — the tiebreak keeps partitions balanced under
    // any key skew — then one sorted scan per partition assigns each
    // class its local head position and size, emitting the first/last
    // class of each partition as boundary records (the only classes that
    // can straddle). The seed-key column (InitPrefix chars per suffix)
    // never materializes beyond those ≤2 records per partition. Class
    // head positions depend only on how many suffixes sort strictly
    // below, so ranks are deterministic even though range boundaries come
    // from sampling.
    val (seedSchema, seedFn) = seedScan(idType)
    val chk = Shim.mapPartitionsInternal(
        sufs.repartitionByRange(width, col("_c"), col("_d"), col("_o"))
          .sortWithinPartitions(col("_c")),
        seedSchema)(seedFn)
      .localCheckpoint(true)
    val recs = chk.where(col("_kind") === 1)
    // Per-partition row counts ride the boundary records: O(width) driver
    // rows lift local head positions to global positions.
    val pnByPid = recs.select(col("_pid"), col("_pn")).distinct()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until width).scanLeft(0L) {
      case (acc, p) => acc + pnByPid.getOrElse(p, 0L)
    }
    val offDf = (0 until width).map(p => (p, offsets(p))).toDF("_pid", "_off")
    // Straddling-class reconciliation: group the boundary records by the
    // seed key (equal keys ARE the same class — range order makes a class
    // contiguous across partitions), take the global min position and the
    // global size, and broadcast the per-(partition, head-position) fixup
    // back onto the rows. Non-straddling first/last classes get the
    // identity fixup; interior classes never need one.
    val gstats = recs.join(broadcast(offDf), "_pid")
      .groupBy("_k")
      .agg(min(col("_off") + col("_lr")).as("_gmin"), sum("_sz").as("_gtot"))
    val corrSeed = recs.join(gstats, "_k")
      .select(col("_pid"), col("_lr"), col("_gmin"), col("_gtot"))
    val based = chk.where(col("_kind") === 0)
      .join(broadcast(offDf), "_pid")
      .join(broadcast(corrSeed), Seq("_pid", "_lr"), "left")
      .select(col("_d"), col("_o"),
        coalesce(col("_gmin"), col("_off") + col("_lr")).as("_r"),
        coalesce(col("_gtot"), col("_sz")).as("_sz"))
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
    val (refSchema, refFn) = refineScan(idType)
    while (!done && rounds < maxRounds) {
      // Fetch each active suffix's next `block` characters by joining back
      // to the documents table — broadcast the (small) active side so the
      // corpus text is only SCANNED, with the join's doc-id filter pruning
      // what reaches the per-partition scan.
      val probeSide =
        if (activeCnt <= BroadcastActiveMax) broadcast(active) else active
      // Size the refinement exchange to the DATA TOO (round 14): each
      // active row carries `block` chars (~0.5KB at the default); target
      // the session's ADVISORY partition size (Spark's own post-shuffle
      // sizing knob — cluster operators already tune it to their per-core
      // memory; 64MB default) of window bytes per partition, so the ONE
      // exchange's width follows the bytes it must sort. The (doc, off)
      // tiebreak in the range key spreads an oversized tie class across
      // partitions — the per-task bound is rows/width by construction
      // (round 15; boundary classes are reconciled below). Range
      // partitioning's boundary-sampling pre-pass re-executes this
      // broadcast join + substr once per round — pure scan+cpu, no
      // shuffle; the hash-partition alternative that avoids it is
      // exactly the one-class-one-task skew this shape exists to kill.
      val advisory = math.max(1L << 20,
        ss.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
      val refWidth = math.max(1, math.min(1L << 20,
        activeCnt * (block + 64L) / advisory + 1L)).toInt
      val paired = probeSide.join(docsTxt, "_d")
        .select(col("_d"), col("_o"), col("_r"),
          col("_t").substr((col("_o") + off).cast("int"), lit(block)).as("_w"))
      // Refine within each class: the sorted scan assigns each subclass
      // run its min-position rank-within-class (1 + rows of the class
      // strictly below — ties share), so subclass ranks slot into the
      // parent interval without touching any other class. A window that
      // runs past the end of the document is shorter and sorts first —
      // the shorter-suffix-first rule of string order, for free. The
      // comparison window is DROPPED inside the scan (checkpointing it
      // would hold `block` chars per active row — the f=30 hostile probe
      // OOMed exactly there); only its nonempty bit survives, as the
      // exhaustion signal, plus the ≤2 boundary records per partition
      // that carry a window for cross-partition subclass accounting.
      val rchk = Shim.mapPartitionsInternal(
          paired.repartitionByRange(refWidth, col("_r"), col("_w"), col("_d"), col("_o"))
            .sortWithinPartitions(col("_r"), col("_w")),
          refSchema)(refFn)
        .localCheckpoint(true)
      // Straddling-class reconciliation from the O(refWidth) boundary
      // records: per (partition, class) the rows-in-earlier-partitions
      // total (all strictly smaller except head-window equals, which the
      // head record's cross-partition prefix count removes) and the
      // global sizes of the partition's head/tail subclasses. All frames
      // here are ≤2 rows per partition; the corpus-sized frame sees one
      // broadcast join, no second exchange.
      val rrecs = rchk.where(col("_kind") === 1)
      val wSubPrev = org.apache.spark.sql.expressions.Window
        .partitionBy("_r", "_w").orderBy("_pid")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val recsS = rrecs
        .withColumn("_totSub", sum("_lsub").over(
          org.apache.spark.sql.expressions.Window.partitionBy("_r", "_w")))
        .withColumn("_prevSub", coalesce(sum("_lsub").over(wSubPrev), lit(0L)))
      val wClsPrev = org.apache.spark.sql.expressions.Window
        .partitionBy("_r").orderBy("_pid")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val clsPrev = rrecs.groupBy("_pid", "_r")
        .agg(max("_clsCnt").as("_cc"))
        .withColumn("_totalPrev", coalesce(sum("_cc").over(wClsPrev), lit(0L)))
        .select("_pid", "_r", "_totalPrev")
      val headP = recsS.where(col("_isFirst"))
        .select(col("_pid"), col("_r"), col("_prevSub").as("_eqPrevHead"),
          col("_totSub").as("_totHead"))
      val tailP = recsS.where(col("_isLast"))
        .select(col("_pid"), col("_r"), col("_totSub").as("_totTail"),
          col("_lrk").as("_tailLrk"))
      val corr = clsPrev
        .join(headP, Seq("_pid", "_r"), "left")
        .join(tailP, Seq("_pid", "_r"), "left")
        .localCheckpoint(true)
      val refined = rchk.where(col("_kind") === 0)
        .join(broadcast(corr), Seq("_pid", "_r"), "left")
        .withColumn("_r2", col("_r") + (col("_lrk") - 1L) +
          coalesce(col("_totalPrev"), lit(0L)) -
          when(col("_lrk") === 1L, coalesce(col("_eqPrevHead"), lit(0L)))
            .otherwise(lit(0L)))
        .withColumn("_sz",
          when(col("_lrk") === 1L, coalesce(col("_totHead"), col("_lsub")))
            .when(col("_lrk") === col("_tailLrk"),
              coalesce(col("_totTail"), col("_lsub")))
            .otherwise(col("_lsub")))
      // One tiny driver row per round: the surviving-tie count and whether
      // any surviving tie still has text left to compare. An exhausted tie
      // (empty window on every member) is a class of genuinely EQUAL
      // suffixes — they share their rank forever, which IS convergence.
      val Array(nextCnt, liveCnt) = refined
        .agg(sum(when(col("_sz") > 1, 1L).otherwise(0L)),
          sum(when(col("_sz") > 1 && col("_wne"), 1L).otherwise(0L)))
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
