package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Sketches, TfIdf}

/** Unit coverage for the retrieval/profiling operators that are otherwise
  * proven only through their DuckDB gates — hand-checkable fixtures pin the
  * semantics the gates can't isolate (rank order, slack band, robustness).
  */
class RetrievalProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: term saturation and length normalization order documents correctly") {
    val docs = Seq(
      (1L, "spark spark spark spark spark"),            // high tf, short
      (2L, "spark filler filler filler filler filler"), // low tf, longer
      (3L, "filler filler filler filler filler filler"),// no query term
      (4L, "spark spark filler")                        // mid tf, shortest
    ).toDF("doc_id", "text")
    val out = TfIdf.bm25(docs, "doc_id", "text", Seq("spark"), topK = 10)
      .orderBy("rank").as[(Long, Double, Int)].collect()
    // doc 3 has no query term -> absent entirely
    assert(!out.map(_._1).contains(3L))
    // more occurrences in fewer tokens wins; doc 2 (1 hit, longest) ranks last
    assert(out.head._1 == 1L && out.last._1 == 2L)
    assert(out.map(_._3).toSeq == (1 to out.length).toSeq)
    assert(out.forall(_._2 > 0.0))
  }

  test("madOutliers: planted outlier flagged, symmetric bulk is not; zero-MAD group survives") {
    val rows = (1 to 101).map(i => ("g", 100.0 + (i % 11) - 5)) :+ (("g", 10000.0)) :+
      (("flat", 7.0)) :+ (("flat", 7.0)) :+ (("flat", 7.0))
    val out = Quality.madOutliers(rows.toDF("grp", "x"), "x", "grp", z = 3.0)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val g = out("g")
    assert(g._2 == 100.0 && g._3 > 0.0)  // median at the bulk, positive MAD
    assert(g._5 == 1L)                    // exactly the planted outlier
    // all-identical group: MAD 0 -> any deviation would flag, none exists
    assert(out("flat")._3 == 0.0 && out("flat")._5 == 0L)
  }

  test("hllDistinct: estimate within the published band, linear counting small-range, partition-invariant") {
    // 5000 distinct values in one group: raw regime (E >> 2.5m).
    // Published std error at m=256 is 1.04/sqrt(256) = 6.5%; assert 3 sigma.
    val big = (0 until 5000).map(i => ("a", s"v$i")) ++ (0 until 5000).map(i => ("a", s"v$i"))
    // 3 distinct values in group b: linear-counting regime, near-exact.
    val small = (0 until 60).map(i => ("b", s"s${i % 3}"))
    val df = (big ++ small).toDF("grp", "v")
    val out = Sketches.hllDistinct(df, Seq("grp"), col("v"), p = 8)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(out("a")._3 - 5000) < 5000 * 0.195,
      s"raw-regime estimate ${out("a")._3} off by more than 3 sigma from 5000")
    assert(math.abs(out("b")._3 - 3) < 1.0,
      s"linear-counting estimate ${out("b")._3} should be within 1 of 3")
    assert(out("b")._2 <= 3) // at most 3 registers occupied by 3 distincts
    // duplicates can never move a register: estimate is purely set-determined
    val dedup = Sketches.hllDistinct(
      df.distinct(), Seq("grp"), col("v"), p = 8)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(dedup("a") == out("a")._3 && dedup("b") == out("b")._3)
    // bit-identical under a different partitioning (exact-fold claim)
    val repart = Sketches.hllDistinct(df.repartition(13), Seq("grp"), col("v"), p = 8)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(repart("a") == out("a")._3 && repart("b") == out("b")._3)
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df, Seq("grp"), col("v"), p = 13)
    }
  }

  test("hllMergeRegisters: disjoint and OVERLAPPING slices merge to the whole-data sketch exactly") {
    val df = (0 until 2000).map(i => ("g", s"v$i")).toDF("grp", "v")
    val whole = Sketches.hllDistinct(df, Seq("grp"), col("v"), p = 8)
      .as[(String, Long, Double)].collect().head
    // disjoint halves
    val lo = Sketches.hllRegisters(df.where(expr("substr(v, 2) < '1'")), Seq("grp"), col("v"), p = 8)
    val hi = Sketches.hllRegisters(df.where(expr("substr(v, 2) >= '1'")), Seq("grp"), col("v"), p = 8)
    val mergedDisjoint = Sketches.hllEstimate(
      Sketches.hllMergeRegisters(Seq("grp"), lo, hi), Seq("grp"), p = 8)
      .as[(String, Long, Double)].collect().head
    assert(mergedDisjoint == whole)
    // overlapping slices: max is idempotent, double-counted rows change nothing
    val a = Sketches.hllRegisters(df.limit(1500), Seq("grp"), col("v"), p = 8)
    val b = Sketches.hllRegisters(df, Seq("grp"), col("v"), p = 8)
    val mergedOverlap = Sketches.hllEstimate(
      Sketches.hllMergeRegisters(Seq("grp"), a, b), Seq("grp"), p = 8)
      .as[(String, Long, Double)].collect().head
    assert(mergedOverlap == whole)
  }

  test("quantileSampleRows: merge of disjoint slices == whole-data sample; small groups pass through exactly") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 5000).map(i =>
      (s"id$i", if (i % 2 == 0) "g1" else "g2", rnd.nextDouble() * 1000))
      .toDF("id", "grp", "x")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("grp", "hv", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val whole = Sketches.quantileSampleRows(
      rows, Seq("grp"), col("id"), col("x"), k = 128)
    // disjoint thirds merge losslessly (bottom-k of union == bottom-k of
    // the slices' bottom-k's)
    val slices = (0 until 3).map(t => Sketches.quantileSampleRows(
      rows.where(abs(hash(col("id"))) % 3 === t), Seq("grp"), col("id"), col("x"), k = 128))
    val merged = Sketches.quantileSampleMerge(Seq("grp"), 128, slices: _*)
    assert(canon(merged) == canon(whole))
    // a group smaller than k keeps ALL its rows — sample quantiles exact
    val tiny = (0 until 50).map(i => (s"t$i", "g", i.toDouble)).toDF("id", "grp", "x")
    val s = Sketches.quantileSampleRows(tiny, Seq("grp"), col("id"), col("x"), k = 128)
    assert(s.count() == 50)
    assert(s.agg(expr("percentile(v, 0.5)")).head().getDouble(0) == 24.5)
  }

  test("kmvOverlap: known-overlap sets estimated in band; small sets exact; duplicate-invariant") {
    // |A| = 3000, |B| = 3000, |A ∩ B| = 1000 (ids 2000..2999), J = 0.2.
    val a = (0 until 3000).map(i => s"v$i").toDF("v")
    val b = (2000 until 5000).map(i => s"v$i").toDF("v")
    val out = Sketches.kmvOverlap(a, col("v"), b, col("v"), k = 256)
      .as[(Double, Double, Double, Double, Double)].collect().head
    // KMV rel error ~1/sqrt(k-2) = 6.3% on the set sizes; Jaccard adds
    // sampling noise (±3 sigma of sqrt(J(1-J)/k) ≈ 0.075 absolute).
    assert(math.abs(out._1 - 3000) < 3000 * 0.19, s"n_a_est ${out._1}")
    assert(math.abs(out._2 - 3000) < 3000 * 0.19, s"n_b_est ${out._2}")
    assert(math.abs(out._3 - 5000) < 5000 * 0.19, s"n_union_est ${out._3}")
    assert(math.abs(out._4 - 0.2) < 0.075, s"jaccard ${out._4}")
    assert(math.abs(out._5 - 1000) < 1000 * 0.5, s"n_intersection_est ${out._5}")
    // below-k sets: every estimate is EXACT (the sample is the set)
    val sa = (0 until 30).map(i => s"s$i").toDF("v")
    val sb = (20 until 60).map(i => s"s$i").toDF("v")
    val ex = Sketches.kmvOverlap(sa, col("v"), sb, col("v"), k = 128)
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(ex._1 == 30.0 && ex._2 == 40.0 && ex._3 == 60.0)
    assert(ex._4 == 0.166667 && math.abs(ex._5 - 10.0) < 1e-6) // round(1/6, 6)
    // multiplicity never moves a bottom-k sample
    val dup = Sketches.kmvOverlap(a.union(a), col("v"), b, col("v"), k = 256)
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(dup == out)
  }

  test("cmsHeavyHitterCheck: exact top-k ordering with every estimate in band") {
    val docs = Seq.tabulate(200)(i =>
      (s"w${i % 5} common", if (i % 2 == 0) "alpha beta" else "alpha")).map(t => t._1 + " " + t._2)
      .toDF("text")
    val out = Sketches.cmsHeavyHitterCheck(docs, "text", topK = 4)
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 4)
    assert(out.map(_._2).sorted.reverse.toSeq == out.map(_._2).toSeq) // desc exact counts
    assert(out.forall(_._3), s"estimates out of band: ${out.mkString(",")}")
    // 'common' and 'alpha' appear in every row -> they must lead the head
    assert(out.take(2).map(_._1).toSet == Set("common", "alpha"))
  }
}
