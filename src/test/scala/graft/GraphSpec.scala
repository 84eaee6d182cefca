package graft

import graft.operators.Graph

/** [[graft.operators.Graph.pageRank]]: values match a plain-Scala reference
  * replaying the same sorted-source fold, mass is conserved, hubs out-rank
  * leaves, and repeated runs are bit-stable (the determinism the oracle
  * depends on).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: same math, same (sorted-by-source) fold
    * order, no rounding until the end.
    */
  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(_._1).sorted.foldLeft(0.0)((acc, src) => acc + r(src) / deg(src))
      }
      r = nodes.map(v => v -> ((1 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private val star: Seq[(Long, Long)] = {
    val undirected = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L)
    undirected ++ undirected.map(_.swap)
  }

  test("matches the plain-Scala reference on a hand-built graph") {
    val got = Graph.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val want = referenceRanks(star, 5, 0.85).view
      .mapValues(v => math.rint(v * 1e6) / 1e6).toMap
    assert(got == want)
  }

  test("rank mass is conserved and the hub out-ranks leaves") {
    val got = Graph.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
    assert(got(1L) > got(2L) && got(2L) > got(4L),
      s"expected hub 1 > bridge 2 > leaf 4, got $got")
  }

  test("bit-stable across runs") {
    def run() = Graph.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 5)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }
}
