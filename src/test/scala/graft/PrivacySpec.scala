package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** k-anonymity suppression and the deterministic-Laplace DP counts:
  * suppression boundary exactly at k, report/suppress consistency, noise
  * replayability and zero-centering.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // Quasi space: ("a") ×6 rows, ("b") ×5, ("c") ×1 — k=6 keeps only a.
  private def rows = (
    (1 to 6).map(i => (i.toLong, "a")) ++
    (7 to 11).map(i => (i.toLong, "b")) ++
    Seq((12L, "c"))
  ).toDF("id", "q")

  test("kAnonymize keeps exactly the >= k groups (boundary inclusive)") {
    val kept = Privacy.kAnonymize(rows, Seq("q"), k = 6)
      .select("id").as[Long].collect().toSet
    assert(kept == (1 to 6).map(_.toLong).toSet)
    // k=5 admits b; k=1 keeps everything.
    assert(Privacy.kAnonymize(rows, Seq("q"), 5).count() == 11)
    assert(Privacy.kAnonymize(rows, Seq("q"), 1).count() == 12)
  }

  test("kAnonymityReport flags exactly the groups kAnonymize suppresses") {
    val rep = Privacy.kAnonymityReport(rows, Seq("q"), k = 6)
      .as[(String, Long, Int)].collect()
      .map { case (q, n, s) => q -> (n, s) }.toMap
    assert(rep == Map("a" -> (6L, 0), "b" -> (5L, 1), "c" -> (1L, 1)))
  }

  test("dpNoisyCounts: replayable noise, exact raw counts, bounded for moderate u") {
    val out = Privacy.dpNoisyCounts(rows, Seq("q"), epsilon = 1.0)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val again = Privacy.dpNoisyCounts(rows, Seq("q"), epsilon = 1.0)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq, "noise must be deterministic")
    assert(out.map(r => r._1 -> r._2).toMap == Map("a" -> 6L, "b" -> 5L, "c" -> 1L))
    // Independent JVM replay of the hash-uniform Laplace inverse CDF.
    out.foreach { case (q, n, noisy) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$q|dp".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      val c = u - 0.5
      val want = math.rint((n - math.signum(c) * math.log(1 - 2 * math.abs(c))) * 1e6) / 1e6
      assert(noisy == want, s"group $q: got $noisy want $want")
    }
  }

  test("property: kAnonymize output NEVER contains a group smaller than k (random sweeps)") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 3) {
      val df = Seq.fill(500)((rnd.nextInt(1000).toLong, rnd.nextInt(40).toString))
        .toDF("id", "q")
      val k = 2 + rnd.nextInt(8)
      val out = Privacy.kAnonymize(df, Seq("q"), k)
      val minGroup = out.groupBy("q").count().agg(min("count")).as[Long].collect().headOption
      minGroup.foreach(m => assert(m >= k, s"trial $trial: group of $m under k=$k"))
      // Suppression removes exactly the rows of the small groups.
      val expected = df.groupBy("q").count().where(col("count") >= k)
        .agg(sum("count")).as[Option[Long]].collect().head.getOrElse(0L)
      assert(out.count() == expected)
    }
  }

  test("zipfFit: recovers a planted exponent exactly on synthetic power-law counts") {
    // Construct a corpus whose token counts are exactly c_i = round(1000 / i)
    // for tokens w01..w20 — the OLS fit on the log-log head must be the
    // same numbers an independent JVM least-squares computes.
    val words = (1 to 20).flatMap(i => Seq.fill(math.round(1000.0 / i).toInt)(f"w$i%02d"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = graft.operators.CorpusStats.zipfFit(docs, "text", k = 20)
      .as[(Long, Double, Double)].collect().head
    val xs = (1 to 20).map(i => math.log(i.toDouble))
    val ys = (1 to 20).map(i => math.log(math.round(1000.0 / i).toDouble))
    val n = 20.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val intercept = (sy - slope * sx) / n
    assert(got._1 == 20L)
    assert(math.abs(got._2 - slope) < 2e-6 && math.abs(got._3 - intercept) < 2e-6)
    assert(got._2 > -1.05 && got._2 < -0.95) // the planted exponent is ≈ −1
  }

  test("dpNoisyCounts: scale tracks sensitivity/epsilon") {
    val e1 = Privacy.dpNoisyCounts(rows, Seq("q"), epsilon = 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._3 - r._2)).toMap
    val e05 = Privacy.dpNoisyCounts(rows, Seq("q"), epsilon = 0.5)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._3 - r._2)).toMap
    e1.foreach { case (q, d1) =>
      // Same uniform (same key+salt) → noise scales exactly by b ratio = 2,
      // up to the 6 dp rounding at the output boundary.
      assert(math.abs(e05(q) - 2 * d1) < 5e-6, s"group $q: ${e05(q)} vs ${2 * d1}")
    }
  }
}
