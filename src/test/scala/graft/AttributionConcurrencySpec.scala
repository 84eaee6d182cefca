package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Hand-computed fixtures for the round-9 event-analytics additions:
  * multi-touch attribution credit arithmetic, RFM quintile boundaries,
  * top-path truncation/tie order, and the hierarchical sweep-line's
  * boundary rules (end-exactly-at-hour-boundary, carry across hours and
  * days, within-hour intervals) against a brute-force step-function
  * replay.
  */
class AttributionConcurrencySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ attribution
  test("attribution: linear and U-shaped credits across path lengths") {
    // u1: 3 touches (view, click, error) before its first purchase
    //     -> linear 1/3 each; U-shape first(view)=0.4 last(error)=0.4
    //        middle(click)=0.2
    // u2: 1 touch -> 1.0 both models
    // u3: 2 touches -> 0.5 each, both models
    // u4: touch AFTER purchase only -> no credit
    // u5: touches but never converts -> no credit
    val ev = Seq(
      (1L, "view", 100L, 10L), (1L, "click", 200L, 11L), (1L, "error", 300L, 12L),
      (1L, "purchase", 400L, 13L), (1L, "view", 500L, 14L),
      (2L, "click", 100L, 20L), (2L, "purchase", 150L, 21L),
      (3L, "view", 100L, 30L), (3L, "view", 200L, 31L), (3L, "purchase", 250L, 32L),
      (4L, "purchase", 100L, 40L), (4L, "view", 200L, 41L),
      (5L, "view", 100L, 50L), (5L, "click", 200L, 51L)
    ).toDF("u", "et", "t", "id")
    val got = EventAnalytics.attribution(ev, "u", "et", "t", "id", "purchase")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("click", 2L, 1.0 / 3 + 1.0, 0.2 + 1.0),
      ("error", 1L, 1.0 / 3, 0.4),
      ("view", 3L, 1.0 / 3 + 0.5 + 0.5, 0.4 + 0.5 + 0.5)
    ).map(r => (r._1, r._2, math.rint(r._3 * 1e6) / 1e6, math.rint(r._4 * 1e6) / 1e6)))
  }

  test("attribution: equal-timestamp touches resolve first/last by event id") {
    // three touches all at t=100; first = min id, last = max id
    val ev = Seq(
      (1L, "a", 100L, 1L), (1L, "b", 100L, 2L), (1L, "c", 100L, 3L),
      (1L, "purchase", 200L, 4L)
    ).toDF("u", "et", "t", "id")
    val got = EventAnalytics.attribution(ev, "u", "et", "t", "id", "purchase")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._4)) == Seq(("a", 0.4), ("b", 0.2), ("c", 0.4)))
  }

  test("attribution: credit conservation — both models sum to the converted-with-touches user count") {
    // every user's credits sum to exactly 1.0 under BOTH models, so the
    // corpus totals must equal the number of users with >= 1 touch before
    // their first conversion — on randomized event streams.
    val rnd = new scala.util.Random(67)
    val types = Seq("view", "click", "error", "purchase")
    val ev = (0 until 600).map { i =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(100000).toLong, i.toLong)
    }.toDF("u", "et", "t", "id")
    val got = EventAnalytics.attribution(ev, "u", "et", "t", "id", "purchase")
      .agg(sum("linear_credit"), sum("position_credit")).as[(Double, Double)].head()
    // brute-force the expected count
    val rows = ev.as[(Long, String, Long, Long)].collect()
    val expected = rows.groupBy(_._1).count { case (_, es) =>
      val conv = es.filter(_._2 == "purchase").map(_._3)
      conv.nonEmpty && es.exists(e => e._2 != "purchase" && e._3 < conv.min)
    }
    assert(math.abs(got._1 - expected) < 1e-6, s"linear ${got._1} vs $expected")
    assert(math.abs(got._2 - expected) < 1e-6, s"position ${got._2} vs $expected")
  }

  // -------------------------------------------------------------------- rfm
  test("rfm: quintile scores with deterministic tie-break") {
    // five users, one purchase each on consecutive days with rising value:
    // every metric splits 1..5 exactly; most recent / highest value = 5.
    val ev = (1 to 5).map { i =>
      (i.toLong, "purchase", java.sql.Timestamp.valueOf(f"2024-01-0$i 10:00:00"), i * 10.0)
    }.toDF("u", "et", "t", "v")
    val got = EventAnalytics.rfm(ev, "u", "et", "t", "v", "purchase")
      .select("user_id", "recency_days", "r", "f", "m", "segment")
      .as[(Long, Int, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    // user 5 purchased last (recency 0 -> r=5) and highest value (m=5);
    // frequency all 1 -> f splits by user id tie-break: u1..u5 -> 1..5.
    assert(got.map(_._2) == Seq(4, 3, 2, 1, 0))
    assert(got.map(_._3) == Seq(1, 2, 3, 4, 5)) // recency desc
    assert(got.map(_._4) == Seq(1, 2, 3, 4, 5)) // freq ties -> user id
    assert(got.map(_._5) == Seq(1, 2, 3, 4, 5))
    assert(got.map(_._6) == Seq("111", "222", "333", "444", "555"))
  }

  // -------------------------------------------------------------- topPaths
  test("topPaths: depth truncation, tie order, and count cut") {
    val ev = Seq(
      // u1 and u2 share path a>b; u3 has a>c; u4 has a 3-deep path cut at 2
      (1L, "a", 100L, 1L), (1L, "b", 200L, 2L),
      (2L, "a", 100L, 3L), (2L, "b", 200L, 4L),
      (3L, "a", 100L, 5L), (3L, "c", 200L, 6L),
      (4L, "a", 100L, 7L), (4L, "b", 150L, 8L), (4L, "z", 900L, 9L)
    ).toDF("u", "et", "t", "id")
    val got = EventAnalytics.topPaths(ev, "u", "et", "t", "id", depth = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b", 3L), ("a>c", 1L)))
  }

  test("topPaths: equal timestamps within a user order by event id") {
    val ev = Seq((1L, "b", 100L, 2L), (1L, "a", 100L, 1L)).toDF("u", "et", "t", "id")
    val got = EventAnalytics.topPaths(ev, "u", "et", "t", "id", depth = 5, k = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b", 1L)))
  }

  // ------------------------------------------------------- peakConcurrency
  /** Brute-force step-function peak per day: evaluate concurrency after
    * every boundary instant plus each day's start, from first principles.
    */
  private def bruteForce(iv: Seq[(Long, Long)]): Map[String, Long] = {
    val DAY = 86400000L
    val instants = iv.flatMap { case (s, e) => Seq(s, e) }.distinct.sorted
    def at(t: Long): Long = iv.count { case (s, e) => s <= t && t < e }
    val days = instants.map(_ / DAY).distinct
    days.map { d =>
      val inDay = instants.filter(t => t / DAY == d)
      val cands = inDay.map(at) :+ at(d * DAY)
      val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
        .format(java.time.LocalDate.ofEpochDay(d.toInt))
      fmt -> cands.max
    }.toMap
  }

  private def runPeak(iv: Seq[(Long, Long)]): Map[String, Long] =
    EventAnalytics.peakConcurrency(
      iv.toDF("s", "e").select(col("s").as("t"), (col("e") - col("s")).as("dur")),
      "t", col("dur"))
      .as[(String, Long)].collect().toMap

  test("peakConcurrency: hour-boundary and carry semantics match brute force") {
    val H = 3600000L
    val iv = Seq(
      (1000L, 2000L), (1500L, 2500L), (1800L, 1900L), // within-hour overlap of 3
      (H - 500L, H + 500L),            // crosses hour boundary (carry)
      (2 * H - 1000L, 2 * H),          // ends EXACTLY at hour boundary
      (2 * H, 2 * H + 10L),            // starts exactly at hour boundary
      (5 * H + 10L, 5 * H + 20L)
    )
    assert(runPeak(iv) == bruteForce(iv))
  }

  test("peakConcurrency: midnight crossings and day attribution match brute force") {
    val DAY = 86400000L
    val iv = Seq(
      (DAY - 1000L, DAY + 1000L),      // crosses midnight: carry into day 2
      (DAY - 3000L, DAY - 2000L),
      (DAY + 500L, DAY + 600L),        // overlaps the carried interval
      (2 * DAY, 2 * DAY + 100L),       // starts exactly at midnight
      (3 * DAY - 10L, 3 * DAY)         // ends exactly at midnight: day-4 peak 0
    )
    val got = runPeak(iv)
    assert(got == bruteForce(iv))
    assert(got.keySet ==
      Set("1970-01-01", "1970-01-02", "1970-01-03", "1970-01-04"))
    assert(got("1970-01-02") == 2L) // carried + overlapping
    assert(got("1970-01-04") == 0L) // boundary instant observed, nothing active
  }

  test("peakConcurrency: randomized intervals equal the brute-force replay") {
    val rnd = new scala.util.Random(9)
    val iv = Seq.fill(300) {
      val s = rnd.nextInt(5 * 86400000 / 100).toLong * 100
      (s, s + 1 + rnd.nextInt(3 * 3600000))
    }
    assert(runPeak(iv) == bruteForce(iv))
  }

  test("peakConcurrency: zero and negative durations are dropped") {
    val iv = Seq((1000L, 1000L), (2000L, 1500L))
    assert(EventAnalytics.peakConcurrency(
      iv.toDF("s", "e").select(col("s").as("t"), (col("e") - col("s")).as("dur")),
      "t", col("dur")).count() == 0L)
  }
}
