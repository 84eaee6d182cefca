package graft

import org.apache.spark.sql.functions._
import graft.operators.{Collocations, Similarity}

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramsOf: adjacent pairs, no null pad pair, degenerate arrays empty") {
    val out = Seq(Seq("a", "b", "c"), Seq("x"), Seq.empty[String])
      .toDF("ws")
      .select(Collocations.bigramsOf(col("ws")).as("b"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(out === Seq(Seq(("a", "b"), ("b", "c")), Seq.empty, Seq.empty))
  }

  test("pmiBigrams: hand-checked PMI for a dominated pair, minCount filters hapax") {
    // "x y" occurs 6 times; fillers make other words frequent so x,y are
    // rare outside the pair. N = 24 tokens, B = 18 bigrams.
    val docs = Seq.fill(6)("x y f1 f2").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 5L, topK = 10)
      .as[(String, String, Long, Double, Int)].collect()
    val m = out.map(r => (r._1, r._2) -> r).toMap
    // c12("x","y")=6, c1=c2=6, N=24, B=18: pmi = ln(6*24*24/(18*6*6)) = ln(16/3)
    assert(m(("x", "y"))._3 == 6L)
    assert(math.abs(m(("x", "y"))._4 - math.log(16.0 / 3.0)) < 1e-3)
    // "y f1" / "f1 f2" appear 6 times too and survive; nothing below minCount does
    assert(out.forall(_._3 >= 5L))
    assert(out.map(_._5).sorted.toSeq == (1 to out.length).toSeq)
  }

  test("bpeTokenCount: ordered merges compose, left-to-right non-overlap, ws count unchanged") {
    import graft.functions.TextAnalysis
    val merges = Seq("t h" -> "th", "e r" -> "er", "th e" -> "the")
    val out = Seq("the other", "a", "thin her").toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text"), merges).as("n"))
      .as[Int].collect().toSeq
    // "the"  : t h e -> th e -> the            = 1 token
    // "other": o t h e r -> o th e r -> o th er = 3 tokens  -> doc0 = 4
    // "a"    : 1 token
    // "thin" : t h i n -> th i n               = 3; "her": h e r -> h er = 2 -> doc2 = 5
    assert(out === Seq(4, 1, 5))
    // Odd run of the same pair: exact greedy BPE merges left-to-right,
    // a a a a a -> [aa aa a], so the follow-up 'aa aa' rule fires -> 2
    // tokens. (The naive non-overlapping replace would strand the middle
    // 'a' — [aa a aa] — and 'aa aa' could never fire: 3 tokens.)
    val oddRun = Seq("aaaaa").toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text"),
        Seq("a a" -> "aa", "aa aa" -> "aaaa")).as("n"))
      .as[Int].head()
    assert(oddRun === 2)
  }

  test("bpeTokens materializes the stream the count counts") {
    import graft.functions.TextAnalysis
    val merges = Seq("t h" -> "th", "e r" -> "er", "th e" -> "the")
    val d = Seq("the other", "thin her").toDF("text")
    val toks = d.select(TextAnalysis.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(toks == Seq(
      Seq("the", "o", "th", "er"),
      Seq("th", "i", "n", "h", "er")))
    // size of the stream == bpeTokenCount, by construction
    val counts = d.select(
        size(TextAnalysis.bpeTokens(col("text"), merges)).as("a"),
        TextAnalysis.bpeTokenCount(col("text"), merges).as("b"))
      .as[(Int, Int)].collect()
    counts.foreach { case (a, b) => assert(a == b) }
  }

  test("spanCorrupt: hash-placed span, sentinel numbering, token conservation") {
    import graft.operators.SpanCorrupt
    val words = (1 to 20).map(i => s"t$i")
    val d = Seq((7L, words.mkString(" ")), (8L, "too short")).toDF("doc_id", "text")
    val out = SpanCorrupt.spanCorrupt(d, "doc_id", "text", spanLen = 3, rate = 0.15)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    // doc 7: n=20 -> ns=1, seg=20, offset = hash32("7:0") % 18 (replayed here)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7:0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val off = (BigInt(md5hex.take(8), 16) % 18).toInt
    val (_, in7, tgt7, ns7) = out(7L)
    assert(ns7 == 1L)
    assert(tgt7 == s"<extra_id_0> t${off + 1} t${off + 2} t${off + 3}")
    val expectedIn = (words.take(off) :+ "<extra_id_0>") ++ words.drop(off + 3)
    assert(in7 == expectedIn.mkString(" "))
    // token conservation: every original token appears exactly once across
    // input and target (minus sentinels)
    val rebuilt = (in7.split(" ").toSeq ++ tgt7.split(" ").toSeq)
      .filterNot(_.startsWith("<extra_id_"))
    assert(rebuilt.sorted == words.sorted)
    // short doc: no span fits the rate -> identity input, empty target
    val (_, in8, tgt8, ns8) = out(8L)
    assert(ns8 == 0L && in8 == "too short" && tgt8 == "")
  }

  test("randomProject: deterministic, right arity, JL-ball norm preservation") {
    val vecs = (0L until 50L).map(i =>
      (i, Seq.tabulate(64)(d => (((i * 31 + d * 7) % 13) - 6).toFloat))).toDF("id", "v")
    val p = vecs.select(col("id"), Similarity.randomProject(col("v"), 64, 16).as("p"),
      Similarity.norm(col("v")).as("n0"))
    val rows = p.select(col("id"), size(col("p")).as("k"),
        (Similarity.norm(col("p")) / col("n0")).as("ratio"))
      .as[(Long, Int, Double)].collect()
    assert(rows.forall(_._2 == 16))
    // Sign JL at dOut=16: norms preserved within a loose constant-factor ball
    assert(rows.forall { case (_, _, r) => r > 0.4 && r < 2.0 })
    val again = vecs.select(Similarity.randomProject(col("v"), 64, 16).as("p"))
      .as[Seq[Double]].collect().toSeq
    val first = p.select(col("p")).as[Seq[Double]].collect().toSeq
    assert(again === first)
  }
}
