package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, EventAnalytics}
import graft.functions.TextAnalysis

/** Hand-built fixtures with known answers for the event-analytics and
  * corpus-statistics operators: funnel strict-order semantics, retention
  * cohort arithmetic, entropy/readability closed-form values, trigram top-k
  * determinism.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel enforces strict stage order per user") {
    // u1 completes all three in order; u2 purchases BEFORE clicking (no
    // conversion past click); u3 only views; u4's click precedes its view
    // (click must not count).
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      (2L, "view", ts("2024-01-01 09:00:00")),
      (2L, "purchase", ts("2024-01-01 09:30:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-02 08:00:00")),
      (4L, "click", ts("2024-01-03 07:00:00")),
      (4L, "view", ts("2024-01-03 08:00:00")),
      (5L, "error", ts("2024-01-03 08:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("funnel: equal timestamps do NOT advance the stage (strict >)") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0, "view", 1L), (1, "click", 0L)))
  }

  test("funnel maxDelay: conversion window anchors on first touch") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")), // within 1h of view ✓
      (2L, "view", ts("2024-01-02 10:00:00")),
      (2L, "click", ts("2024-01-02 12:00:00")), // 2h after view — outside
      // first-touch attribution: u3's SECOND view would admit the click,
      // but the window anchors on the first view.
      (3L, "view", ts("2024-01-03 08:00:00")),
      (3L, "view", ts("2024-01-03 11:00:00")),
      (3L, "click", ts("2024-01-03 11:30:00"))
    ).toDF("user_id", "event_type", "ts")
    // maxDelay is numeric arithmetic on the time column — feed epoch ms.
    val evMs = ev.select(col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("tms"))
    val res = EventAnalytics.funnel(evMs, "user_id", "event_type", "tms",
      Seq("view", "click"), maxDelay = Some(3600L * 1000))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(res.toSeq == Seq((0, "view", 3L), (1, "click", 1L)))
  }

  test("retention cohorts by first day; offset-0 row equals cohort size") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 23:59:59")), (2L, ts("2024-01-02 00:00:01")),
      (3L, ts("2024-01-02 12:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(ev, "user_id", "ts")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), // u1, u2 cohort Jan 1
      ("2024-01-01", 1, 1L), // u2 active Jan 2
      ("2024-01-01", 2, 1L), // u1 active Jan 3
      ("2024-01-02", 0, 1L))) // u3 cohort Jan 2
  }

  test("tokenEntropy: closed-form values and degeneracy ordering") {
    val docs = Seq(
      (1L, "a a a a"), // H = 0
      (2L, "a b c d"), // H = ln 4
      (3L, "a a b b") // H = ln 2
    ).toDF("doc_id", "text")
    val got = CorpusStats.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == math.rint(math.log(4) * 1e6) / 1e6)
    assert(got(3L) == math.rint(math.log(2) * 1e6) / 1e6)
  }

  test("topNgrams: deterministic cut with count-then-lexicographic order") {
    val docs = Seq(
      (1L, "x y z x y z x y z"), // "x y z" ×3, "y z x" ×2, "z x y" ×2
      (2L, "a b c a b c"), // "a b c" ×2, "b c a" ×1, "c a b" ×1
      (3L, "q r") // too short: zero trigrams
    ).toDF("doc_id", "text")
    val got = CorpusStats.topNgrams(docs, "text", n = 3, k = 3, minCount = 2)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "x y z"), (2L, "a b c"), (2L, "y z x")))
  }

  test("transitionMatrix: consecutive pairs per user, rows normalize to 1") {
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 11L), (1L, "a", 3L, 12L), // a→b, b→a
      (2L, "a", 1L, 20L), (2L, "a", 2L, 21L), // a→a
      (3L, "c", 1L, 30L) // single event: no pair
    ).toDF("user_id", "event_type", "t", "event_id")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "event_type", Seq("t", "event_id"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      ("a", "b") -> (1L, 0.5), ("a", "a") -> (1L, 0.5),
      ("b", "a") -> (1L, 1.0)))
  }

  test("resampleDaily: gaps filled forward, latest id wins within a day, spans per entity") {
    val ev = Seq(
      // user 1: Jan 1 has two events — id 11 (v=5.0) then id 12 (v=7.5)
      // must win; Jan 2-3 silent; Jan 4 observed.
      (1L, 11L, 5.0, java.sql.Date.valueOf("2024-01-01")),
      (1L, 12L, 7.5, java.sql.Date.valueOf("2024-01-01")),
      (1L, 13L, 1.0, java.sql.Date.valueOf("2024-01-04")),
      // user 2: single day — one output row, no gaps.
      (2L, 21L, 3.0, java.sql.Date.valueOf("2024-01-10"))
    ).toDF("user_id", "event_id", "value", "d")
    val got = EventAnalytics.resampleDaily(ev, "user_id", "event_id", "value", "d")
      .as[(Long, String, Double, Int)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 7.5, 0),
      (1L, "2024-01-02", 7.5, 1),
      (1L, "2024-01-03", 7.5, 1),
      (1L, "2024-01-04", 1.0, 0),
      (2L, "2024-01-10", 3.0, 0)))
  }

  test("sourceDivergence: identical sources → 0, disjoint vocabularies → ln 2, asymmetric overlap by hand") {
    val docs = Seq(
      ("s1", "a b"), ("s2", "a b"), // identical distributions
      ("s3", "x y"), // disjoint from s1/s2
      ("s4", "a a b b x x y y") // uniform over union
    ).toDF("source", "text")
    val got = graft.operators.CorpusStats.sourceDivergence(docs, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s1", "s2")) == 0.0)
    assert(got(("s1", "s3")) == math.rint(math.log(2) * 1e6) / 1e6)
    // s1 = {a:.5, b:.5}; s4 = uniform .25 over {a,b,x,y}.
    // m(a)=m(b)=.375, m(x)=m(y)=.125.
    val want = 2 * (0.25 * math.log(0.5 / 0.375)) +
      2 * (0.125 * math.log(0.25 / 0.375)) + 2 * (0.125 * math.log(0.25 / 0.125))
    assert(got(("s1", "s4")) == math.rint(want * 1e6) / 1e6)
    assert(got.values.forall(_ >= 0.0))
  }

  test("Basket.pairRules: hand-computed support/confidence/lift; multiset collapse; loud guard") {
    // Baskets: b1={1,2,3}, b2={1,2}, b3={1,3} (with a duplicate 3), b4={2}.
    val df = Seq(
      ("b1", 1), ("b1", 2), ("b1", 3),
      ("b2", 1), ("b2", 2),
      ("b3", 1), ("b3", 3), ("b3", 3),
      ("b4", 2)
    ).toDF("b", "i")
    val got = graft.operators.Basket.pairRules(df, "b", "i", minSupport = 2)
      .as[(Int, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // {1,2}: support 2 (b1,b2); cnt(1)=3, cnt(2)=3, n=4 → conf 2/3, lift 2*4/9.
    // {1,3}: support 2 (b1,b3) — the duplicate 3 in b3 collapses first.
    assert(got.keySet == Set((1, 2), (1, 3)))
    assert(got((1, 2)) == (2L, math.rint(2.0 / 3 * 1e6) / 1e6, math.rint(8.0 / 9 * 1e6) / 1e6))
    assert(got((1, 3)) == (2L, math.rint(2.0 / 3 * 1e6) / 1e6, math.rint(8.0 / 6 * 1e6) / 1e6))
    // A basket wider than the cap must raise, not run the quadratic join.
    val wide = (1 to 12).map(i => ("hot", i)).toDF("b", "i")
    val e = intercept[Exception] {
      graft.operators.Basket.pairRules(wide, "b", "i", 1, maxBasket = 10).collect()
    }
    assert(e.getMessage.contains("basket wider than 10"))
  }

  test("fleschReadingEase: closed-form check") {
    // "The cat sat." — 3 words, 1 sentence, syllables: the=1, cat=1, sat.=1.
    val df = Seq((1L, "The cat sat.")).toDF("doc_id", "text")
    val got = df.select(TextAnalysis.fleschReadingEase(col("text"))).as[Double].head()
    val want = math.rint((206.835 - 1.015 * 3.0 - 84.6 * (3.0 / 3.0)) * 1e6) / 1e6
    assert(got == want)
  }
}
