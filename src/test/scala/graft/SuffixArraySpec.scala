package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.CommonPrefixLen
import graft.operators.SuffixArray

/** Suffix-array construction ([[SuffixArray.build]], relational prefix
  * doubling) pinned against brute force, the classic fixture, and its own
  * tie/fixpoint semantics; plus the [[CommonPrefixLen]] LCP primitive and
  * the [[SuffixArray.repeatedSpans]] adjacent-LCP report.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Brute-force dense ranks: sort all (suffix, doc, off), dense-number by
    * suffix equality.
    */
  private def brute(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = for ((d, t) <- docs; i <- 1 to t.length) yield (t.substring(i - 1), d, i.toLong)
    val sorted = sufs.sortBy { case (s, d, o) => (s, d, o) }
    var rank = 0L
    var prev: String = null
    sorted.map { case (s, d, o) =>
      if (s != prev) { rank += 1; prev = s }
      (d, o) -> rank
    }.toMap
  }

  test("banana: the classic array, all ranks distinct") {
    val r = ranksOf(Seq(1L -> "banana"))
    assert(r == Map((1L, 1L) -> 4L, (1L, 2L) -> 3L, (1L, 3L) -> 6L,
      (1L, 4L) -> 2L, (1L, 5L) -> 5L, (1L, 6L) -> 1L))
  }

  test("identical documents: every suffix ties with its twin (KMR fixpoint termination)") {
    val r = ranksOf(Seq(1L -> "abcabc", 2L -> "abcabc"))
    (1 to 6).foreach { o =>
      assert(r((1L, o.toLong)) == r((2L, o.toLong)), s"offset $o should tie across twins")
    }
    // ...and the tied array still agrees with brute force
    assert(r == brute(Seq(1L -> "abcabc", 2L -> "abcabc")))
  }

  test("randomized corpus: prefix doubling == brute-force suffix sort") {
    val rnd = new scala.util.Random(13)
    val docs = (1L to 12L).map { d =>
      // small alphabet forces deep shared prefixes and many doubling rounds
      d -> (0 until (5 + rnd.nextInt(40))).map(_ => "abx"(rnd.nextInt(3))).mkString
    }
    assert(ranksOf(docs) == brute(docs))
    // unicode: multi-byte chars rank by code point / byte order identically
    val uni = Seq(1L -> "æøåab", 2L -> "aæbøc", 3L -> "øab")
    assert(ranksOf(uni) == brute(uni))
  }

  test("randomized astral-unicode corpus: blocked windows == code-point brute force") {
    // The engine slices windows by CODE POINT (Spark substr/length) and
    // compares UTF-8 BYTES (= code-point order). Java String order is
    // UTF-16-unit order, which astral characters break (surrogates sort
    // below U+E000 while their code points sort above U+FFFF), and Java
    // String.length counts units, not code points — so this brute force
    // works in code-point space end to end: suffixes enumerated by code
    // point, ordered via a fixed-width hex expansion of each code point
    // (lexicographic on the expansion == numeric code-point order).
    val alpha = Array("a", "b", "æ", "ø", "日", "€",
      new String(Character.toChars(0x1D54F)), // 𝕏 astral, 2 UTF-16 units
      new String(Character.toChars(0x1F600))) // 😀 astral
    val rnd = new scala.util.Random(97)
    // A shared 40-code-point multi-byte phrase planted on a third of the
    // docs forces tie classes past the 32-cp seed, so the blocked window
    // rounds run over astral-char slices rather than converging at seed.
    val phrase = (0 until 40).map(i => alpha(i % alpha.length)).mkString
    val docs = (1L to 12L).map { d =>
      val body = (0 until (3 + rnd.nextInt(30)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      d -> (if (d % 3 == 0L) phrase + body else body)
    }
    def cps(s: String): Vector[Int] = {
      val it = s.codePoints().iterator()
      val b = Vector.newBuilder[Int]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def key(v: Vector[Int]): String = v.map(c => f"$c%06X").mkString
    val sufs = for {
      (d, t) <- docs; c = cps(t); i <- 1 to c.length
    } yield (key(c.drop(i - 1)), d, i.toLong)
    val sorted = sufs.sortBy { case (s, d, o) => (s, d, o) }
    var rank = 0L
    var prev: String = null
    val expect = sorted.map { case (s, d, o) =>
      if (s != prev) { rank += 1; prev = s }
      (d, o) -> rank
    }.toMap
    assert(ranksOf(docs) == expect)
  }

  test("empty and single-char documents") {
    val r = ranksOf(Seq(1L -> "", 2L -> "a", 3L -> "b"))
    assert(r == Map((2L, 1L) -> 1L, (3L, 1L) -> 2L))
  }

  test("CommonPrefixLen: code-point counting, cap, multi-byte boundaries") {
    def lcp(a: String, b: String, cap: Int = 512): Int =
      CommonPrefixLen.count(UTF8String.fromString(a), UTF8String.fromString(b), cap)
    assert(lcp("hello world", "hello there") == 6)
    assert(lcp("same", "same") == 4)
    assert(lcp("", "x") == 0)
    assert(lcp("abc", "xbc") == 0)
    assert(lcp("aaaa", "aaaa", cap = 2) == 2) // cap binds
    // multi-byte: æ counts as ONE (DuckDB char semantics), not its 2 bytes
    assert(lcp("æøå-x", "æøå-y") == 4)
    // astral pair = ONE code point ("😀a" is 2); differing astral chars share nothing
    assert(lcp("😀ab", "😀ac") == 2)
    assert(lcp("😀", "😁") == 0)
  }

  test("repeatedSpans: a planted 25-char cross-doc repeat surfaces; cap truncates lcp") {
    val shared = "the quick brown fox jumps" // 25 chars
    val docs = Seq(
      1L -> s"AA$shared tail one",
      2L -> s"BBBB$shared other tail",
      3L -> "nothing in common here").toDF("doc_id", "text")
    val spans = SuffixArray.repeatedSpans(docs, "doc_id", "text", minLen = 20)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    // the full repeat is an adjacent pair at lcp >= 25 (offsets 3 and 5)
    assert(spans.exists { case (a, oa, b, ob, l) =>
      Set(a, b) == Set(1L, 2L) && l >= 25 &&
        Seq(oa, ob).sorted == Seq(3L, 5L)
    }, s"missing the planted repeat in: ${spans.mkString(", ")}")
    // doc 3 shares no >= 20 span with anyone
    assert(!spans.exists { case (a, _, b, _, _) => a == 3L || b == 3L })
    // cap truncation: with cap = 20 the same repeat reports exactly 20
    val capped = SuffixArray.repeatedSpans(docs, "doc_id", "text", minLen = 20, cap = 20)
      .collect().map(_.getInt(5))
    assert(capped.nonEmpty && capped.forall(_ <= 20))
  }

  test("removeRepeatedText: every occurrence of a cross-doc repeat is cut (Lee et al. semantics)") {
    val shared = "the quick brown fox jumps over it" // 33 chars, >= minLen everywhere
    val docs = Seq(
      1L -> s"AA$shared tail one",
      2L -> s"BBBB$shared other tail",
      3L -> "nothing in common here").toDF("doc_id", "text")
    val out = SuffixArray.removeRepeatedText(docs, "doc_id", "text", minLen = 20)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // BOTH occurrences die — neither cleaned text contains the repeat (nor
    // any >= 20-char window of it), per the remove-all-copies contract.
    Seq(1L, 2L).foreach { d =>
      val (clean, nSpans, nRemoved) = out(d)
      assert(!clean.contains(shared.substring(0, 20)), s"doc $d kept the repeat: '$clean'")
      assert(nSpans >= 1 && nRemoved >= 20, s"doc $d: nSpans=$nSpans nRemoved=$nRemoved")
    }
    // the untouched doc comes back verbatim with zero counts
    assert(out(3L) == (("nothing in common here", 0L, 0L)))
  }

  test("removeRepeatedText: identical twin docs are both fully cut; counts are exact") {
    val t = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars
    val docs = Seq(1L -> t, 2L -> t).toDF("doc_id", "text")
    val out = SuffixArray.removeRepeatedText(docs, "doc_id", "text", minLen = 20)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // The whole document is a duplicated substring (off=1 ties at lcp=36),
    // so BOTH twins empty out entirely; offsets 1..17 each contribute one
    // tied adjacent pair >= minLen, attributed to both sides: 17 intervals
    // per doc before the union collapse.
    Seq(1L, 2L).foreach { d =>
      val (clean, nSpans, nRemoved) = out(d)
      assert(clean == "" && nRemoved == 36L, s"doc $d kept '$clean' ($nRemoved removed)")
      assert(nSpans == 17L, s"doc $d nSpans=$nSpans")
    }
  }

  test("exactSubstrCutByGrams == removeRepeatedText on the real sf0.001 corpus (two algorithms, one function)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def canon(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
      df.select("doc_id", "text_clean", "n_removed_chars").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val sa = canon(SuffixArray.removeRepeatedText(docs, "doc_id", "text", minLen = 20))
    val gr = canon(graft.operators.Dedup.exactSubstrCutByGrams(docs, "doc_id", "text", minLen = 20))
    assert(sa.keySet == gr.keySet)
    val diff = sa.keySet.filter(k => sa(k) != gr(k))
    assert(diff.isEmpty, s"cleaned text diverges for docs: ${diff.take(5).mkString(", ")}")
    // and the cut is non-trivial on this corpus — the equivalence is not vacuous
    assert(sa.values.exists(_._2 > 0))
  }

  test("exactSubstrCutByGrams == removeRepeatedText on random small-alphabet corpora (dense repeats)") {
    // Three seeded corpora over a 3-char alphabet: dense accidental repeats
    // at minLen=6 hammer every interval-union edge (overlaps, adjacency,
    // whole-doc cuts) far harder than natural text does.
    for (seed <- Seq(7, 99, 4242)) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 15L).map { d =>
        d -> (0 until (6 + rnd.nextInt(60))).map(_ => "abc"(rnd.nextInt(3))).mkString
      }.toDF("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Long)] =
        df.select("doc_id", "text_clean", "n_removed_chars").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val sa = canon(SuffixArray.removeRepeatedText(docs, "doc_id", "text", minLen = 6))
      val gr = canon(graft.operators.Dedup.exactSubstrCutByGrams(docs, "doc_id", "text", minLen = 6))
      assert(sa == gr, s"seed $seed: cleaned text diverges")
      assert(sa.values.exists(_._2 > 0), s"seed $seed: vacuous fixture (no cuts)")
    }
  }

  test("exactContamination: planted verbatim overlap measured exactly; clean docs report zero") {
    val shared = "x" * 5 + "the payload shared with the benchmark set" // 46 chars
    // boundary chars differ on BOTH sides so the verbatim overlap is
    // exactly the planted 46 chars, not accidentally extended
    assert(shared.length == 46)
    val corpus = Seq(
      1L -> s"lead-in text!$shared?trailing words here",
      2L -> "completely unrelated content with no overlap at all").toDF("doc_id", "text")
    val bench = Seq(10L -> s"question:$shared;answer: forty-two").toDF("doc_id", "text")
    val out = graft.operators.Dedup.exactContamination(
        corpus, "doc_id", "text", bench, "doc_id", "text", minLen = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    // hits = the 46-20+1 = 27 window positions; covered chars = the 46-char span
    assert(out(1L) == ((27L, 46L, 1)), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 0)))
  }

  test("convergence guard fires loudly on an impossible round budget") {
    // One refinement round from the InitPrefix-char seed compares
    // InitPrefix + block chars; a run longer than that still has ties
    // after it, so the budget of 1 must fail loudly rather than return a
    // half-refined array. A tiny block forces the many-round path the
    // production block size rarely needs.
    val docs = Seq(
      1L -> ("a" * (SuffixArray.InitPrefix + 8 * 4 + 5) + "b"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SuffixArray.build(docs, "doc_id", "text", maxRounds = 1, block = 8)
        .collect()
    }
    // ... and the same corpus converges exactly once the budget allows it.
    val ok = SuffixArray.build(docs, "doc_id", "text", block = 8)
      .collect()
    assert(ok.length == SuffixArray.InitPrefix + 8 * 4 + 6)
    assert(ok.map(_.getLong(2)).distinct.length == ok.length) // all distinct
  }
}
