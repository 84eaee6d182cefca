package graft

import org.apache.spark.sql.functions._

import graft.expressions.JaroWinklerImpl
import graft.operators.{CorpusStats, Dedup, Linkage}

/** Round-9 text/linkage additions: Jaro–Winkler pinned semantics (known
  * literature values, DuckDB-pinned edges, codegen/interpreted agreement),
  * blocked fuzzy pairs with the hot-block guard, weighted-Jaccard multiset
  * arithmetic, line-dedup reassembly, and TextRank structural properties.
  */
class LinkageTextRankSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaroWinkler: literature values and pinned DuckDB edges") {
    // classic textbook pairs
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    // pinned DuckDB edges: empty-vs-empty is 0, not 1; either side empty is 0
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0 && jw("", "abc") == 0.0)
    // equal non-empty strings
    assert(jw("same", "same") == 1.0)
    // no matches at all
    assert(jw("abc", "xyz") == 0.0)
    // boost threshold: jaro <= 0.7 gets NO prefix boost
    val lowSim = jw("abcdefgh", "abxxxxxx") // shares 2-char prefix, low jaro
    val rawJaro = (2.0 / 8 + 2.0 / 8 + 2.0 / 2) / 3
    assert(math.abs(lowSim - rawJaro) < 1e-12) // boost NOT applied
  }

  test("jaroWinkler: codegen and interpreted paths agree") {
    val df = Seq(("martha", "marhta"), ("", ""), ("red widget", "red gadget"),
      ("a", "b"), ("prefix match", "prefix hatch")).toDF("a", "b")
    val viaExpr = df.select(Linkage.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    val direct = df.as[(String, String)].collect().map { case (a, b) => jw(a, b) }
    assert(viaExpr.toSeq == direct.toSeq)
    // null propagation (BinaryExpression null-intolerant contract)
    val withNull = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("fuzzyPairs: blocking prunes cross-block pairs; threshold applies") {
    val recs = Seq((1L, "red widget"), (2L, "red gadget"), (3L, "blue bolt"),
      (4L, "rex widget")).toDF("id", "name")
    val got = Linkage.fuzzyPairs(recs, "id", "name",
      substring(col("name"), 1, 1), threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 3 is in block "b" alone; 1-2, 1-4, 2-4 compared, all >= 0.8
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("fuzzyPairs: hot block fails loudly at maxBlock") {
    val recs = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val ex = intercept[Exception] {
      Linkage.fuzzyPairs(recs, "id", "name", lit("hot"), threshold = 0.0,
        maxBlock = 10).collect()
    }
    assert(ex.getMessage.contains("maxBlock"))
  }

  test("weightedJaccardPairs: multiset min/max arithmetic with cap") {
    // a: x x x y   b: x y y   (cap 5)
    // elements a = {x1,x2,x3,y1}, b = {x1,y1,y2}; inter = {x1,y1} = 2
    // union = 4 + 3 - 2 = 5 -> wj = 0.4
    val docs = Seq((1L, "x x x y"), (2L, "x y y")).toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      n = 1, cap = 5, threshold = 0.3, maxDf = 1000)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.4)))
  }

  test("weightedJaccardPairs: cap bounds repetition influence") {
    // identical under cap=2: both reduce to {x1,x2}; wj = 1.0
    val docs = Seq((1L, "x x x x x x"), (2L, "x x")).toDF("doc_id", "text")
    val capped = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      n = 1, cap = 2, threshold = 0.9, maxDf = 100)
      .as[(Long, Long, Double)].collect().toSeq
    assert(capped == Seq((1L, 2L, 1.0)))
    // uncapped-ish (cap 10): inter 2, union 6+2-2 -> 1/3 < 0.9
    assert(Dedup.weightedJaccardPairs(docs, "doc_id", "text",
      n = 1, cap = 10, threshold = 0.9, maxDf = 100).count() == 0L)
  }

  test("lineDedup: shared lines removed everywhere, order preserved, blanks immune") {
    val docs = Seq(
      (1L, "keep me\nshared line\nalso mine"),
      (2L, "shared line\nunique two"),
      (3L, "shared line"),
      (4L, "\n\n")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDf = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, "keep me\nalso mine", 2L, 1L)))
    assert(got(1) == ((2L, "unique two", 1L, 1L)))
    assert(got(2) == ((3L, "", 0L, 1L))) // fully-removed doc stays present
    // blank lines are never dup-counted: doc 4 keeps its (empty) lines
    assert(got(3)._1 == 4L && got(3)._4 == 0L)
  }

  test("lineDedupIncremental == full lineDedup sliced to the batch (randomized)") {
    val rnd = new scala.util.Random(61)
    val lines = (1 to 8).map(i => s"line $i")
    val all = (0 until 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(3))(lines(rnd.nextInt(lines.size))).mkString("\n"))
    }.toDF("doc_id", "text")
    val old = all.where(col("doc_id") % 2 === 0)
    val batch = all.where(col("doc_id") % 2 === 1)
    val incr = Dedup.lineDedupIncremental(
      Dedup.lineIndex(old, "doc_id", "text"), batch, "doc_id", "text", minDf = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    val full = Dedup.lineDedup(all, "doc_id", "text", minDf = 3)
      .as[(Long, String, Long, Long)].collect().filter(_._1 % 2 == 1).toSet
    assert(incr == full && incr.nonEmpty)
    // index advance: old index + batch index sums to the full-corpus index
    val advanced = Dedup.lineIndex(old, "doc_id", "text")
      .unionByName(Dedup.lineIndex(batch, "doc_id", "text"))
      .groupBy("line").agg(sum("df").as("df"))
      .as[(String, Long)].collect().toMap
    val fullIdx = Dedup.lineIndex(all, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(advanced == fullIdx)
  }

  test("textRankKeywords: hub word outranks leaves; symmetric words tie") {
    // star graph: h adjacent to a, b, c (each pair twice to clear minCount);
    // h has degree 3, leaves degree 1 -> h must rank first, leaves tie.
    val docs = Seq.fill(2)("h a h b h c").map(Tuple1(_)).toDF("text")
    val got = CorpusStats.textRankKeywords(docs, "text", minCount = 2,
      iters = 5, k = 10).as[(String, Double)].collect().toSeq
    assert(got.head._1 == "h")
    val leaves = got.filter(r => Set("a", "b", "c")(r._1)).map(_._2).distinct
    assert(leaves.size == 1) // symmetric leaves have identical rank
    assert(got.map(_._1) == Seq("h", "a", "b", "c")) // tie-break by word
  }
}
