package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Joins, Similarity}

/** Round-9 batch F: k-core peeling against brute force, forward as-of
  * semantics, and the decimal-exact covariance matrix.
  */
class KcoreAsofForwardSpec extends SparkSpec {
  import spark.implicits._

  test("kCore: triangle survives, pendant chain peels away") {
    // triangle 1-2-3 plus chain 3-4-5: 2-core = the triangle
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val got = Graph.kCore(e, "s", "d", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  private def brutePeel(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 != e._2).distinct
    var changed = true
    while (changed) {
      val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, l) => v -> l.size }
      val bad = deg.filter(_._2 < k).keySet
      val pruned = und.filterNot(e => bad(e._1) || bad(e._2))
      changed = pruned.size != und.size
      und = pruned
    }
    und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, l) => v -> l.size.toLong }
  }

  test("kCore: randomized graphs equal brute-force peeling at k=2 and k=3") {
    val rnd = new scala.util.Random(23)
    for (k <- Seq(2, 3)) {
      val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2)
      val got = Graph.kCore(edges.toDF("s", "d"), "s", "d", k)
        .as[(Long, Long)].collect().toMap
      assert(got == brutePeel(edges, k), s"k=$k")
    }
  }

  test("kCore: maxIter guard fails loudly instead of returning a half-peeled core") {
    // a long path needs ~n/2 peel rounds at k=2
    val path = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
    val ex = intercept[IllegalArgumentException] {
      Graph.kCore(path.toDF("s", "d"), "s", "d", k = 2, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("converge"))
  }

  test("asOfForward: nearest at-or-after, equal-ts inclusive, trailing null") {
    val facts = Seq((1L, 100L), (1L, 250L), (1L, 900L), (2L, 50L))
      .toDF("u", "ft")
    val dim = Seq((1L, 100L, "a"), (1L, 300L, "b"), (1L, 600L, "c"))
      .toDF("u", "dt", "v")
    val got = Joins.asOfForward(facts, dim, Seq("u"), "ft", "dt", Seq("v", "dt"))
      .select("u", "ft", "asof_v", "asof_dt")
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 100L, Some("a"), Some(100L)), // equal ts visible
      (1L, 250L, Some("b"), Some(300L)),
      (1L, 900L, None, None),            // nothing after
      (2L, 50L, None, None)))            // key absent from dim
  }

  test("asOfForward == asOf on negated timestamps") {
    val rnd = new scala.util.Random(29)
    val facts = Seq.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
      .toDF("u", "ft")
    val dim = Seq.fill(30)((rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }.toDF("u", "dt", "v")
    val fwd = Joins.asOfForward(facts, dim, Seq("u"), "ft", "dt", Seq("v"))
      .select("u", "ft", "asof_v").as[(Long, Long, Option[Long])].collect().sorted.toSeq
    val neg = Joins.asOf(
      facts.withColumn("ft", -col("ft")), dim.withColumn("dt", -col("dt")),
      Seq("u"), "ft", "dt", Seq("v"))
      .select(col("u"), (-col("ft")).as("ft"), col("asof_v"))
      .as[(Long, Long, Option[Long])].collect().sorted.toSeq
    assert(fwd == neg)
  }

  test("covarianceMatrix: hand-checked 2-dim case and naive-replay property") {
    // vectors (1,2), (3,6), (5,4): mean (3,4); cov(0,0)=8/3, cov(1,1)=8/3,
    // cov(0,1)=4/3 (population covariance)
    val df = Seq(Seq(1f, 2f), Seq(3f, 6f), Seq(5f, 4f)).toDF("embedding")
    val got = Similarity.covarianceMatrix(df, "embedding")
      .select("i", "j", "cov").as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((0, 0) -> 2.666667, (0, 1) -> 1.333333, (1, 1) -> 2.666667))

    val rnd = new scala.util.Random(31)
    val vecs = Seq.fill(40)(Seq.fill(6)((rnd.nextInt(2000) - 1000) / 100.0f))
    val mine = Similarity.covarianceMatrix(vecs.toDF("embedding"), "embedding")
      .select("i", "j", "cov").as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val n = vecs.size
    for (i <- 0 until 6; j <- i until 6) {
      val xs = vecs.map(_(i).toDouble); val ys = vecs.map(_(j).toDouble)
      val naive = (xs.zip(ys).map { case (x, y) => x * y }.sum -
        xs.sum * ys.sum / n) / n
      assert(math.abs(mine((i, j)) - naive) < 1e-6, s"($i,$j)")
    }
  }
}
