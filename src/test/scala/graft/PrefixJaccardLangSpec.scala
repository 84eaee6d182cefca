package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LangProfile}

/** Round-9 batch H: AllPairs prefix-filtered Jaccard equivalence and the
  * trained Cavnar–Trenkle language-ID.
  */
class PrefixJaccardLangSpec extends SparkSpec {
  import spark.implicits._

  private def randDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = ('a' to 'p').map(_.toString)
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    (0 until n).foreach { i =>
      // plant near-dups: every third doc is its predecessor with one word
      // mutated — pairs across the whole jaccard range
      if (i % 3 == 2 && out.nonEmpty)
        out += out.last.updated(rnd.nextInt(out.last.size), "zz")
      else
        out += Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
    }
    out.toSeq.zipWithIndex.map { case (w, i) => (i.toLong, w.mkString(" ")) }
  }

  test("jaccardPairsPrefix == jaccardPairs on randomized corpora (several thresholds)") {
    for ((seed, thr) <- Seq((41, 0.2), (43, 0.3), (47, 0.5))) {
      val docs = randDocs(seed, 60).toDF("doc_id", "text")
      val plain = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = thr)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = thr)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == plain, s"seed=$seed thr=$thr")
      assert(plain.nonEmpty, s"degenerate fixture at seed=$seed") // the property must bite
    }
  }

  test("prefix filter prunes candidates: prefix-collision pairs are a strict subset") {
    val docs = randDocs(53, 80)
    // re-derive both candidate sets from first principles
    def shingles(t: String): Seq[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq.distinct
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (s, l) => s -> l.size }
    val t = 0.3
    def prefix(id: Long): Seq[String] = {
      val sorted = sh(id).sortBy(s => (df(s), s))
      sorted.take(math.max(sorted.size - math.floor(t * sorted.size).toInt, 1))
    }
    val ids = docs.map(_._1)
    val allCand = (for { a <- ids; b <- ids if a < b
      if sh(a).toSet.intersect(sh(b).toSet).nonEmpty } yield (a, b)).toSet
    val prefCand = (for { a <- ids; b <- ids if a < b
      if prefix(a).toSet.intersect(prefix(b).toSet).nonEmpty } yield (a, b)).toSet
    assert(prefCand.subsetOf(allCand) && prefCand.size < allCand.size)
    // completeness: every pair the full operator emits is a prefix candidate
    val emitted = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, threshold = t).as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(emitted.subsetOf(prefCand))
    info(s"candidates: all=${allCand.size} prefix=${prefCand.size} emitted=${emitted.size}")
  }

  test("ctLangId: planted separable languages classify correctly") {
    // language A: texts over 'aha bah cah'; language B: over 'xix yxy zyz'
    val rnd = new scala.util.Random(59)
    val aw = Seq("aha", "bah", "cah", "haa"); val bw = Seq("xix", "yxy", "zyz", "xxy")
    val docs = (0 until 40).map { i =>
      val w = if (i % 2 == 0) aw else bw
      (i.toLong, Seq.fill(20)(w(rnd.nextInt(w.size))).mkString(" "),
        if (i % 2 == 0) "A" else "B")
    }.toDF("id", "text", "lang")
    val got = LangProfile.ctLangId(docs, "id", "text", "lang", k = 30)
      .select("id", "pred_lang", "correct").as[(Long, String, Boolean)].collect()
    assert(got.length == 40 && got.forall(_._3))
  }

  test("ctLangId: argmin tie resolves to the lexicographically first language") {
    // two identically-distributed languages -> identical profiles -> every
    // doc ties and must resolve to "A"
    val docs = Seq((1L, "q q q q q q", "A"), (2L, "q q q q q q", "B"))
      .toDF("id", "text", "lang")
    val got = LangProfile.ctLangId(docs, "id", "text", "lang", k = 10)
      .select("pred_lang").as[String].collect().toSet
    assert(got == Set("A"))
  }
}
