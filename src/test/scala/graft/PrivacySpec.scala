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
