package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EventAnalytics, Graph, Quality}

/** Cross-operator randomized invariants for the round-9 surface — the
  * property layer on top of the hand fixtures (the Round8PropertySpec
  * discipline): brute-force replays and structural laws that must hold on
  * ANY input, not just the crafted cases.
  */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup: randomized corpora equal a brute-force replay") {
    val rnd = new scala.util.Random(71)
    val pool = (1 to 10).map(i => s"line number $i")
    val corpus = (0 until 50).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(5))(pool(rnd.nextInt(pool.size))).mkString("\n"))
    }
    for (minDf <- Seq(2, 4)) {
      val got = Dedup.lineDedup(corpus.toDF("doc_id", "text"), "doc_id", "text", minDf)
        .as[(Long, String, Long, Long)].collect().toSet
      // brute force: distinct-doc df per non-blank line, remove everywhere
      val df = corpus.flatMap { case (id, t) => t.split("\n", -1).filter(_.trim.nonEmpty)
        .distinct.map(l => (l, id)) }.groupBy(_._1).map { case (l, xs) => l -> xs.size }
      val expect = corpus.map { case (id, t) =>
        val lines = t.split("\n", -1).toSeq
        val kept = lines.filter(l => l.trim.isEmpty || df.getOrElse(l, 0) < minDf)
        (id, kept.mkString("\n"), kept.size.toLong, (lines.size - kept.size).toLong)
      }.toSet
      assert(got == expect, s"minDf=$minDf")
    }
  }

  test("quantileNormalize: within-group monotone; outputs bounded by global extremes") {
    val rnd = new scala.util.Random(73)
    val df = (0 until 300).map { i =>
      (s"g${i % 4}", i.toLong, math.rint(rnd.nextDouble() * 1e4) / 100)
    }.toDF("g", "id", "s")
    val rows = Quality.quantileNormalize(df, "g", "id", "s", gridSize = 50)
      .select("g", "s", "norm_score").as[(String, Double, Double)].collect()
    val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.foreach { case (_, _, n) => assert(n >= lo - 1e-9 && n <= hi + 1e-9) }
    rows.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(r => (r._2, r._3))
      sorted.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, n2)) =>
          if (s1 < s2) assert(n1 <= n2 + 1e-9, s"monotonicity: $s1->$n1 vs $s2->$n2")
        case _ => ()
      }
    }
  }

  test("topPaths: every user contributes exactly one path (count conservation)") {
    val rnd = new scala.util.Random(79)
    val types = Seq("a", "b", "c", "d")
    val ev = (0 until 500).map { i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(10000).toLong, i.toLong)
    }.toDF("u", "et", "t", "id")
    val users = ev.select("u").distinct().count()
    val total = EventAnalytics.topPaths(ev, "u", "et", "t", "id",
      depth = 3, k = 10000).agg(sum("users")).as[Long].head()
    assert(total == users)
  }

  test("kCore: cores nest — the k-core is a subgraph of the (k-1)-core") {
    val rnd = new scala.util.Random(83)
    val edges = Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).toDF("s", "d")
    val cores = (2 to 4).map { k =>
      k -> Graph.kCore(edges, "s", "d", k).select("node_id").as[Long].collect().toSet
    }.toMap
    assert(cores(3).subsetOf(cores(2)))
    assert(cores(4).subsetOf(cores(3)))
    assert(cores(2).nonEmpty) // the fixture must exercise the law
  }

  test("attribution position credits: per-user credit is exactly 1.0 for every path length") {
    // path lengths 1..6 in one frame; per-user sums must each be 1.0 exact
    val ev = (1 to 6).flatMap { u =>
      (1 to u).map(j => (u.toLong, s"t$j", j.toLong * 10, (u * 100 + j).toLong)) :+
        ((u.toLong, "purchase", 1000L, (u * 100 + 99).toLong))
    }.toDF("u", "et", "t", "id")
    val perType = EventAnalytics.attribution(ev, "u", "et", "t", "id", "purchase")
      .agg(sum("linear_credit"), sum("position_credit")).as[(Double, Double)].head()
    // each per-type total is rounded to 6 dp before this sum, so the
    // conservation check carries a (n_types × 5e-7) rounding budget
    assert(math.abs(perType._1 - 6.0) < 1e-5)
    assert(math.abs(perType._2 - 6.0) < 1e-5)
  }
}
