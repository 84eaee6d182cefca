package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{CorpusStats, EventAnalytics}

/** Fixtures for rolling active users, vocab coverage, and the streaming
  * funnel state machine (including its cross-batch monotonicity contract).
  */
class RollingVocabFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("rollingActive: trailing window unions user-day sets, stickiness = dau/trailing") {
    // u1 active Jan 1 + Jan 3; u2 active Jan 1 (twice — dedup); u3 Jan 9.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 09:00:00")),
      (3L, ts("2024-01-09 08:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.rollingActive(ev, "user_id", "ts", windowDays = 7)
      .as[(String, Long, Long, Double)].collect().toSet
    // Jan 1: dau 2 (u1,u2), trailing 2. Jan 3: dau 1 (u1), trailing 2 (u1,u2
    // from Jan 1 still inside [Dec 28..Jan 3]). Jan 9: dau 1 (u3), trailing 2
    // (u1's Jan 3 still inside [Jan 3..Jan 9]; Jan 1 activity expired).
    assert(got == Set(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-03", 1L, 2L, 0.5),
      ("2024-01-09", 1L, 2L, 0.5)))
  }

  test("vocabCoverage: exact shares on a known distribution") {
    // counts: a×6, b×3, c×1 → total 10. Ranked: a, b, c.
    val docs = Seq((1L, "a a a b"), (2L, "a a a b b c")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", Seq(1, 2, 3))
      .as[(Int, Double)].collect().toMap
    assert(got == Map(1 -> 0.6, 2 -> 0.9, 3 -> 1.0))
  }

  test("vocabCoverage: lexicographic tie-break makes the cut deterministic") {
    // b and z tie at 2; rank 1 must take b (lexicographic), so cutoff 1 = 0.5.
    val docs = Seq((1L, "z b z b")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(docs, "text", Seq(1))
      .as[(Int, Double)].collect().toMap
    assert(got == Map(1 -> 0.5))
  }

  test("funnelStateful: greedy fold matches the batch operator on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val batch = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "view", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      (3L, "click", 50L), (3L, "view", 100L)
    )
    val input = MemoryStream[(Long, String, Long)]
    val stream = EventAnalytics.funnelStateful(
      input.toDF().toDF("u", "et", "t"), Seq("view", "click", "purchase"))
    val q = stream.writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(batch: _*)
    q.processAllAvailable()
    val perUser = spark.table("funnel_out").groupBy("u")
      .agg(max("reached").as("reached")).as[(Long, Int)].collect().toMap
    q.stop()
    // u1 full funnel (2); u2 purchase precedes click → stops at click (1);
    // u3's click precedes its view → view only (0).
    assert(perUser == Map(1L -> 2, 2L -> 1, 3L -> 0))
    // Batch parity on the identical frame.
    val b = EventAnalytics.funnel(batch.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).map(_._3).toSeq
    assert(b == Seq(3L, 2L, 1L))
  }

  test("funnelStateful: state carries across batches; late earlier event cannot regress the stage") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val stream = EventAnalytics.funnelStateful(
      input.toDF().toDF("u", "et", "t"), Seq("view", "click"))
    val q = stream.writeStream.format("memory").queryName("funnel_xbatch")
      .outputMode(OutputMode.Append()).start()
    input.addData((1L, "view", 100L))
    q.processAllAvailable()
    input.addData((1L, "click", 200L)) // batch 2 advances using batch-1 state
    q.processAllAvailable()
    input.addData((1L, "view", 50L)) // late earlier view: must NOT regress
    q.processAllAvailable()
    val reached = spark.table("funnel_xbatch").groupBy("u")
      .agg(max("reached").as("r")).as[(Long, Int)].collect().toMap
    q.stop()
    assert(reached == Map(1L -> 1))
  }

  test("corpusDigest: partitioning-invariant, mergeable, change-sensitive") {
    import graft.operators.CorpusStats
    val rows = (1 to 200).map(i => ("s" + i % 3, s"document body $i"))
    val df = rows.toDF("source", "text")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = key(CorpusStats.corpusDigest(df, Seq("source"), "text"))
    // Row order / partitioning invariance: shuffled + repartitioned input
    // produces the identical digest (xor and mod-p sum are commutative).
    val scrambled = key(CorpusStats.corpusDigest(
      df.orderBy(org.apache.spark.sql.functions.rand(7)).repartition(13),
      Seq("source"), "text"))
    assert(scrambled == base)
    // Mergeable: digests of two disjoint halves combine to the whole —
    // count adds, xor xors, sum adds mod p.
    val p = 2305843009213693951L
    val a = key(CorpusStats.corpusDigest(rows.take(90).toDF("source", "text"), Seq("source"), "text"))
    val b = key(CorpusStats.corpusDigest(rows.drop(90).toDF("source", "text"), Seq("source"), "text"))
    base.foreach { case (src, (n, x, sm)) =>
      val (na, xa, sa) = a.getOrElse(src, (0L, 0L, 0L))
      val (nb, xb, sb) = b.getOrElse(src, (0L, 0L, 0L))
      assert(na + nb == n, src)
      assert((xa ^ xb) == x, src)
      assert((sa + sb) % p == sm, src)
    }
    // Change-sensitive: editing one document flips the digest.
    val edited = key(CorpusStats.corpusDigest(
      (("s1", "document body 1 EDITED") +: rows.tail).toDF("source", "text"),
      Seq("source"), "text"))
    assert(edited("s1") != base("s1"))
    // The documented XOR blind spot: an even count of identical copies
    // cancels in xor — but the count and sum both still move.
    val dup = key(CorpusStats.corpusDigest(
      (rows ++ Seq(("s1", "document body 1"), ("s1", "document body 1"))).toDF("source", "text"),
      Seq("source"), "text"))
    assert(dup("s1")._2 == base("s1")._2)  // xor blind
    assert(dup("s1")._1 == base("s1")._1 + 2 && dup("s1")._3 != base("s1")._3)
  }
}
