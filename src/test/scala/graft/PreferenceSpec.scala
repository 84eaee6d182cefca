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

  test("self-preference is an upstream data bug and fails loudly") {
    val err = intercept[Exception] {
      fit(Seq(("A", "B"), ("B", "B")))
    }
    assert(err.getMessage != null)
  }
}
