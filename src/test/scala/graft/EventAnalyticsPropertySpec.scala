package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Randomized equivalence against plain-Scala brute-force references: the
  * funnel join chain (with and without conversion windows) against a
  * per-user greedy fold, rolling active users against literal set counting.
  */
class EventAnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("s0", "s1", "s2")

  /** Greedy per-user fold over ts-sorted events — the independently-stated
    * semantics the chain must reproduce.
    */
  private def bruteFunnel(
      events: Seq[(Long, String, Long)], maxDelay: Option[Long]): Seq[Long] = {
    val byUser = events.groupBy(_._1)
    val reached = byUser.values.map { evs =>
      var si = -1
      var ft = Long.MinValue
      evs.sortBy(e => (e._3, stages.indexOf(e._2))).foreach { case (_, et, t) =>
        if (si + 1 < stages.length && et == stages(si + 1) &&
          (si == -1 || (t > ft && maxDelay.forall(d => t <= ft + d)))) {
          si += 1; ft = t
        }
      }
      si
    }.toSeq
    stages.indices.map(i => reached.count(_ >= i).toLong)
  }

  test("funnel == brute-force greedy fold on random event logs (windowed and not)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3; maxDelay <- Seq(None, Some(50L))) {
      val events = Seq.fill(600)((rnd.nextInt(40).toLong,
        stages(rnd.nextInt(3)), rnd.nextInt(500).toLong))
      val got = EventAnalytics.funnel(events.toDF("u", "et", "t"),
        "u", "et", "t", stages, maxDelay)
        .as[(Int, String, Long)].collect().sortBy(_._1).map(_._3).toSeq
      assert(got == bruteFunnel(events, maxDelay),
        s"trial=$trial maxDelay=$maxDelay diverged")
    }
  }

  test("transitionMatrix: rows normalize to 1 and counts conserve pairs on random paths") {
    val rnd = new scala.util.Random(23)
    val ev = Seq.fill(500)((rnd.nextInt(30).toLong, stages(rnd.nextInt(3)),
      rnd.nextInt(10000).toLong, rnd.nextLong())).toDF("u", "et", "t", "id")
    val out = graft.operators.EventAnalytics.transitionMatrix(ev, "u", "et", Seq("t", "id"))
    val rowSums = out.groupBy("from_type")
      .agg(sum("p").as("s"), sum("n").as("cnt")).as[(String, Double, Long)].collect()
    rowSums.foreach { case (ft, s, _) =>
      assert(math.abs(s - 1.0) < 1e-4, s"row $ft sums to $s") // 6dp rounding per cell
    }
    // Total pair count = events − distinct users with ≥1 event (one fewer
    // pair than events per user).
    val users = ev.select("u").distinct().count()
    assert(rowSums.map(_._3).sum == ev.count() - users)
  }

  test("rollingActive == literal set counting on random user-days") {
    val rnd = new scala.util.Random(11)
    val w = 7
    val pairs = Seq.fill(300)((rnd.nextInt(25).toLong,
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(40)))))
    val df = pairs.map { case (u, d) => (u, new java.sql.Timestamp(d.getTime + 3600 * 1000)) }
      .toDF("user_id", "ts")
    val got = EventAnalytics.rollingActive(df, "user_id", "ts", w)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val userDays = pairs.map { case (u, d) => (u, d.toLocalDate) }.distinct
    val observedDays = userDays.map(_._2).distinct
    observedDays.foreach { day =>
      val dau = userDays.count(_._2 == day).toLong
      val trailing = userDays.filter { case (_, d) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(w))
      }.map(_._1).distinct.size.toLong
      assert(got(day.toString) == (dau, trailing), s"day $day diverged")
    }
    assert(got.size == observedDays.size)
  }
}
