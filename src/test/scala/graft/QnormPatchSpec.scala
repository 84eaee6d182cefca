package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Quality}

/** Round-9 batch G: quantile-normalization mapping properties and
  * real-decode ViT patch extraction.
  */
class QnormPatchSpec extends SparkSpec {
  import spark.implicits._

  test("quantileNormalize: endpoints map to global min/max, order preserved") {
    // group a: 1,2,3 ; group b: 100, 200 — global range [1, 200]
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 4L, 100.0), ("b", 5L, 200.0)).toDF("g", "id", "s")
    val got = Quality.quantileNormalize(df, "g", "id", "s", gridSize = 4)
      .select("id", "pct_rank", "norm_score")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    // lowest of each group -> pct 0 -> global min (1.0); highest -> max (200)
    assert(got.head == ((1L, 0.0, 1.0)))
    assert(got(2) == ((3L, 1.0, 200.0)))
    assert(got(3) == ((4L, 0.0, 1.0)))
    assert(got(4) == ((5L, 1.0, 200.0)))
    // within-group order preserved after normalization
    val a = got.take(3).map(_._3)
    assert(a == a.sorted && a.distinct.size == 3)
  }

  test("quantileNormalize: a group matching the global distribution maps onto itself") {
    // one group = whole corpus, uniform 0..100: norm ~= own score
    val df = (0 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "s")
    val got = Quality.quantileNormalize(df, "g", "id", "s", gridSize = 100)
      .select("s", "norm_score").as[(Double, Double)].collect()
    got.foreach { case (s, n) => assert(math.abs(s - n) < 1e-6, s"$s -> $n") }
  }

  test("imagePatches: sums replay the fixture pixel formula, edges truncate") {
    // doc_id = 1: w = 2, h = 2 (1+1%37, 1+1%23) with patch 4 -> one 2x2 tile
    // doc_id = 5: w = 6, h = 6 -> 2x2 grid with edge tiles 4x2 / 2x4 / 2x2
    val docs = Seq(1L, 5L).toDF("doc_id")
    val got = Multimodal.imagePatches(
      Multimodal.syntheticPngs(docs, "doc_id"), "doc_id", "blob", patch = 4)
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[Int],
        Option[Int], Option[Int], Option[Long], Option[Long], Boolean)]
      .collect().toSeq
    def pix(id: Long, x: Int, y: Int): Long = (id + 31L * x + 17L * y) % 256
    def expSum(id: Long, x0: Int, y0: Int, pw: Int, ph: Int): Long =
      (for { y <- y0 until y0 + ph; x <- x0 until x0 + pw } yield pix(id, x, y)).sum
    val one = got.filter(_._1 == 1L)
    assert(one == Seq((1L, Some(0), Some(0), Some(0), Some(0), Some(2), Some(2),
      Some(expSum(1, 0, 0, 2, 2)), Some(4L), true)))
    val five = got.filter(_._1 == 5L)
    assert(five.size == 4)
    val fMap = five.map(r => (r._2.get, r._3.get) -> r).toMap
    assert(fMap((1, 1)) == ((5L, Some(1), Some(1), Some(4), Some(4), Some(2), Some(2),
      Some(expSum(5, 4, 4, 2, 2)), Some(4L), true)))
    assert(fMap((0, 0))._6 == Some(4) && fMap((0, 0))._7 == Some(4))
    assert(five.map(_._9.get).sum == 36L) // tiles partition the 6x6 image
  }

  test("imagePatches: undecodable blob degrades to one decoded=false row") {
    val df = Seq((7L, "junk".getBytes)).toDF("doc_id", "blob")
    val got = Multimodal.imagePatches(df, "doc_id", "blob", patch = 4).collect()
    assert(got.length == 1 && !got.head.getBoolean(9) && got.head.isNullAt(1))
  }
}
