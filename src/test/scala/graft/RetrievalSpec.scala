package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** [[graft.operators.Retrieval.rrfFuse]] contract: reciprocal-rank sums per
  * Cormack's formula, ids missing from a list contribute zero (not null),
  * `n_lists` counts surfacing rankers, output is (score DESC, id ASC)
  * top-k, and three-list fusion folds in list order deterministically.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(pairs: (Long, Int)*) = pairs.toSeq.toDF("id", "rank")

  test("two-list fusion: hand-computed scores, missing side contributes zero") {
    val a = ranked(1L -> 1, 2L -> 2, 3L -> 3)
    val b = ranked(2L -> 1, 4L -> 2)
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", c = 60, k = 10)
      .as[(Long, Double, Long)].collect().toList
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    val want = List(
      (2L, r(1.0 / 62 + 1.0 / 61), 2L), // both lists — wins
      (1L, r(1.0 / 61), 1L),
      (4L, r(1.0 / 62), 1L),
      (3L, r(1.0 / 63), 1L))
    assert(got == want)
  }

  test("k cuts after the deterministic (score DESC, id ASC) order") {
    val a = ranked(10L -> 1, 11L -> 2, 12L -> 3)
    val b = ranked(20L -> 1, 21L -> 2, 22L -> 3)
    // Symmetric ranks → pairwise score ties; id breaks them.
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", c = 60, k = 4)
      .select("id").as[Long].collect().toList
    assert(got == List(10L, 20L, 11L, 21L))
  }

  test("three lists: n_lists counts rankers, fold order is by list position") {
    val got = Retrieval.rrfFuse(
        Seq(ranked(1L -> 1), ranked(1L -> 2, 2L -> 1), ranked(1L -> 3)),
        "id", "rank", c = 10, k = 5)
      .as[(Long, Double, Long)].collect().toList
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == List(
      (1L, r((1.0 / 11 + 1.0 / 12) + 1.0 / 13), 3L),
      (2L, r(1.0 / 11), 1L)))
  }
}
