package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** [[Mixture.weightedSample]] — the A-ES key replayed in plain Scala must
  * select exactly the same rows, non-positive weights refuse loudly, and
  * keys are per-row (append-stable).
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def key(id: Long, w: Double): Double = {
    val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / (math.pow(2, 52) + 2.0)
    -math.log(u) / w
  }

  test("selection equals the scalar replay of the exponential keys") {
    val rows = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b", (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "grp", "w")
    val got = Mixture.weightedSample(df, "id", col("w"), "grp", k = 5)
      .select("id").as[Long].collect().toSet
    val expected = rows.groupBy(_._2).values.flatMap { g =>
      g.sortBy { case (id, _, w) => (key(id, w), id) }.take(5).map(_._1)
    }.toSet
    assert(got == expected)
  }

  test("weights matter: heavy rows win far more often than light ones") {
    // One group, weight 100 vs 1 split evenly: the k=20 sample of 200 rows
    // should be dominated by heavy rows (P[light beats heavy] tiny per pair).
    val rows = (1L to 200L).map(i => (i, "g", if (i <= 100) 100.0 else 1.0))
    val picked = Mixture.weightedSample(rows.toDF("id", "grp", "w"), "id", col("w"), "grp", k = 20)
      .select("id").as[Long].collect()
    assert(picked.count(_ <= 100) >= 17, s"heavy picked only ${picked.count(_ <= 100)}/20")
  }

  test("append stability: adding rows never changes surviving rows' keys") {
    val base = (1L to 30L).map(i => (i, "g", 2.0))
    val grown = base ++ (31L to 60L).map(i => (i, "g", 2.0))
    val k = 30 // every base row kept when alone
    val keysBase = Mixture.weightedSample(base.toDF("id", "grp", "w"), "id", col("w"), "grp", k)
      .select("id").as[Long].collect().toSet
    assert(keysBase == base.map(_._1).toSet)
    // In the grown corpus the base rows that survive are exactly the scalar
    // replay's winners — their keys did not move.
    val gotGrown = Mixture.weightedSample(grown.toDF("id", "grp", "w"), "id", col("w"), "grp", k)
      .select("id").as[Long].collect().toSet
    val expGrown = grown.sortBy { case (id, _, w) => (key(id, w), id) }.take(k).map(_._1).toSet
    assert(gotGrown == expGrown)
  }

  test("non-positive weight refuses loudly") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 0.0)).toDF("id", "grp", "w")
    val e = intercept[Exception] {
      Mixture.weightedSample(df, "id", col("w"), "grp", k = 1).collect()
    }
    assert(e.getMessage != null)
  }
}
