package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlOps
import graft.operators.{EventAnalytics, Quality}

/** Round-9 profiling/time-series additions: truncated-EWMA prediction
  * arithmetic, stage-latency percentiles, href extraction, and the
  * decimal-exact correlation matrix.
  */
class EwmaCorrSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaAnomaly: hand-computed truncated fold, seeding, and spike flag") {
    // user 1: values 10, 10, 10, 100 (spike) with alpha .5, window 2, k 1
    val ev = Seq((1L, 1L, 100L, 10.0), (1L, 2L, 200L, 10.0),
      (1L, 3L, 300L, 10.0), (1L, 4L, 400L, 100.0))
      .toDF("u", "id", "t", "v")
    val got = EventAnalytics.ewmaAnomaly(ev, "u", "id", "t", "v",
      alpha = 0.5, window = 2, k = 1.0)
      .select("id", "ewma_prev", "residual", "is_anomaly")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    // id 1 has no history -> absent; ids 2,3: history all 10 -> pred 10;
    // id 4: pred 10, residual 90, sigma = std(10,10,10,100) = 38.97 -> flag
    assert(got.map(_._1) == Seq(2L, 3L, 4L))
    assert(got.forall(r => r._2 == 10.0 || r._1 == 4L))
    assert(got.last == ((4L, 10.0, 90.0, true)))
    assert(!got.head._4)
  }

  test("ewmaAnomaly: weights are newest-first with truncated mass") {
    // history (old->new) 1, 2 with alpha .5, window 5:
    // pred = (.5*2 + .25*1) / (.5 + .25) = 1.25/0.75 = 1.666667
    val ev = Seq((1L, 1L, 100L, 1.0), (1L, 2L, 200L, 2.0), (1L, 3L, 300L, 0.0))
      .toDF("u", "id", "t", "v")
    val got = EventAnalytics.ewmaAnomaly(ev, "u", "id", "t", "v",
      alpha = 0.5, window = 5, k = 100.0)
      .select("id", "ewma_prev").as[(Long, Double)].collect().toMap
    assert(got(3L) == 1.666667)
  }

  test("stageLatency: hand percentiles over converted users") {
    // two users convert view->click with delays 100 and 300
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 100L),
      (2L, "view", 0L), (2L, "click", 300L),
      (3L, "view", 0L) // never clicks
    ).toDF("u", "et", "t")
    val got = EventAnalytics.stageLatency(ev, "u", "et", "t", Seq("view", "click"))
      .as[(Int, String, Long, Double, Double, Double, Long)].collect().toSeq
    // exact interpolated percentiles of {100, 300}
    assert(got == Seq((1, "click", 2L, 150.0, 200.0, 280.0, 300L)))
  }

  test("extractHrefs: document order, no-match, and domain composition") {
    val html = Seq(
      """<a href="https://a.x.com/1">A</a><p><a href="http://b.y.org/2?q=3">B</a>""",
      "no links here").toDF("h")
    val got = html.select(UrlOps.extractHrefs(col("h"))).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("https://a.x.com/1", "http://b.y.org/2?q=3"), Seq()))
    val dom = html.limit(1).select(explode(UrlOps.extractHrefs(col("h"))).as("u"))
      .select(UrlOps.registrableDomain(UrlOps.urlHost(col("u"))))
      .as[String].collect().toSeq
    assert(dom == Seq("x.com", "y.org"))
  }

  test("corrPairs: perfect, inverse, independent, and constant columns") {
    val df = (1 to 50).map { i =>
      ("g", i.toDouble, 2.0 * i + 1, 51.0 - i, 7.0)
    }.toDF("g", "x", "y2", "yneg", "c")
    val got = Quality.corrPairs(df, "g", Seq("x", "y2", "yneg", "c"))
      .select("col_a", "col_b", "corr")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("x", "y2")) == Some(1.0))
    assert(got(("x", "yneg")) == Some(-1.0))
    assert(got(("x", "c")) == None) // zero variance -> NULL
  }

  test("corrPairs: agrees with Spark's own corr to float tolerance") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(500)(("g", math.rint(rnd.nextDouble() * 1e4) / 100,
      math.rint(rnd.nextDouble() * 1e4) / 100))
    val df = rows.toDF("g", "x", "y")
    val mine = Quality.corrPairs(df, "g", Seq("x", "y"))
      .select("corr").as[Double].head()
    val ref = df.agg(corr(col("x"), col("y"))).as[Double].head()
    assert(math.abs(mine - ref) < 1e-6)
  }
}
