package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.Repetition

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).as[String].head()

  test("langId: marker argmax with en-first tie-break; no markers → und") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      "the cat and the dog went to the market",          // en markers ×5
      "el que la de los por una casa grande",            // es markers
      "der hund und die katze ist nicht mit",            // de markers
      "xyzzy plugh quux frobnicate",                     // nothing → und
      "the el").toDF("text")                             // 1-1 tie → en first
    val out = df.select(graft.functions.TextAnalysis.langId(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "de", "und", "en"))
  }

  test("quality facets: hand-computed score, bounds, and length saturation") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.TextAnalysis
    // "the cat sat." — 12 chars, 3 tokens, 1 en-stopword, 1 punct char:
    // len 12/500=0.024, sw 1/3, punct 1/12 → capped 10/12
    val expected = BigDecimal(0.024 * 0.5 + (1.0 / 3) * 0.4 + (1 - 10.0 / 12) * 0.1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Seq("the cat sat.").toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"$got vs $expected")
    // Bounds: every score in [0,1] across shapes incl. empty and huge.
    val scores = Seq("", "a", "the " * 400, "!!!!!!!!", "x. y. z.")
      .toDF("text").select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0), scores.mkString(","))
    // Length term saturates at 500 chars — longer adds nothing by itself.
    val Seq(at500, at5000) = Seq("z " * 250, "z " * 2500).map(t =>
      Seq(t).toDF("text").select(TextAnalysis.qualityScore(col("text")))
        .collect().head.getDouble(0))
    assert(at500 == at5000)
  }

  test("token counting and fingerprint: hand counts, determinism, sensitivity") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.TextAnalysis
    val df = Seq("  the  quick,brown fox — 42 jumps!  ").toDF("text")
    val n = df.select(TextAnalysis.nTokens(col("text"))).collect().head.getInt(0)
    assert(n == 6, s"whitespace tokens: got $n") // the|quick,brown|fox|—|42|jumps!
    val fp = (s: String) => Seq(s).toDF("text")
      .select(TextAnalysis.rollingFingerprint(col("text")))
      .collect().head.getLong(0)
    assert(fp("same text") == fp("same text"))
    assert(fp("same text") != fp("same text!"))
  }

  test("pii redaction: email, fnr, phone (with and without +47)") {
    assert(redact("mail ola.nordmann+x@nav.example.no her") == "mail <EMAIL> her")
    assert(redact("fnr 12345678901 slutt") == "fnr <FNR> slutt")
    assert(redact("ring 99887766 eller +47 99887766") == "ring <PHONE> eller <PHONE>")
    assert(redact("alt: a@b.no 12345678901 +4799887766") == "alt: <EMAIL> <FNR> <PHONE>")
  }

  test("pii redaction: order prevents cross-type shredding") {
    // 11-digit fnr must NOT be half-eaten by the 8-digit phone pattern,
    // digits inside an email local part must not leak as phone/fnr
    assert(redact("12345678901") == "<FNR>")
    assert(redact("user12345678@x.no") == "<EMAIL>")
    // 8 digits inside a longer digit run: no word boundary -> untouched
    assert(redact("123456789012345") == "123456789012345")
  }

  test("pii counts agree with redaction placeholders") {
    val df = Seq("a@b.no og 12345678901 og +47 99887766 og c@d.org").toDF("t")
    val row = df.select(TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((2, 1, 1)))
  }

  test("chunking: overlap windows, short docs one chunk, contained tails dropped") {
    val d = Seq(
      (1L, "t1 t2 t3"),                                     // < chunkSize: one chunk
      (2L, (1 to 10).map("w" + _).mkString(" "))            // 10 tokens
    ).toDF("doc_id", "text")
    // chunkSize 8, overlap 4, step 4: doc 2 starts 0,4 (8 dropped: 8+4 >= 10)
    val out = graft.operators.Chunking.chunkTokens(d, "doc_id", "text", chunkSize = 8, overlap = 4)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 0, 3, "t1 t2 t3"),
      (2L, 0, 0, 8, (1 to 8).map("w" + _).mkString(" ")),
      (2L, 1, 4, 6, (5 to 10).map("w" + _).mkString(" "))))
  }

  test("repetition metrics: duplicate lines and dominant bigram") {
    val d = Seq(
      (1L, "spam spam spam spam"),             // one distinct word; bigram 'spam spam' x3
      (2L, "a b\na b\nc d"),                   // 3 lines, one duplicated
      (3L, "w")                                // single token: no bigrams
    ).toDF("doc_id", "text")
    val m = Repetition.metrics(d, "doc_id", "text")
      .select("doc_id", "n_words", "dup_word_frac", "dup_line_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 == 4 && m(1L)._3 == 0.75 && m(1L)._5 == 1.0)
    assert(m(2L)._4 == 1.0 - 2.0 / 3.0)
    assert(m(3L)._5 == 0.0)
  }

  test("BPE learning: greedy merges with deterministic tie-breaks, hand-checked") {
    import graft.operators.BpeTrain
    // the×3, cat×1. Round 0: (t h)=3 ties (h e)=3 -> 'h e' wins (pair asc).
    // Round 1: (t he)=3. Round 2: (c a)=1 ties (a t)=1 -> 'a t'. Round 3: (c at)=1.
    val d = Seq("the the the cat").toDF("text")
    val got = BpeTrain.learnMerges(d, "text", numMerges = 4)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "h e", "he", 3L),
      (1, "t he", "the", 3L),
      (2, "a t", "at", 1L),
      (3, "c at", "cat", 1L)))
    // vocab runs dry: every word fully merged -> fewer rows than requested
    val dry = BpeTrain.learnMerges(Seq("aa aa").toDF("text"), "text", numMerges = 5)
    assert(dry.count() == 1) // only (a a) -> aa is learnable
    // odd run of identical symbols: greedy left-to-right semantics make
    // round 0 produce [aa aa a] (NOT [aa a aa] — the naive double-replace
    // strands the middle token), so round 1's pair table holds (aa aa) and
    // (aa a), and the (cnt tie, pair asc) winner is 'aa a'.
    val odd = BpeTrain.learnMerges(Seq("aaaaa").toDF("text"), "text", numMerges = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(odd == Seq((0, "a a", "aa", 4L), (1, "aa a", "aaa", 1L)))
    // learned rules feed the application path unchanged
    val merges = got.map(r => r._2 -> r._3)
    val nTok = d.select(graft.functions.TextAnalysis.bpeTokenCount(col("text"), merges))
      .as[Int].head()
    assert(nTok == 4) // 'the' x3 + 'cat' all single tokens after the 4 rules
  }

  test("gopherRules: each rule fires on its designed violation") {
    import graft.operators.Repetition
    val goodWords = (1 to 13).flatMap(_ => Seq("the", "brown", "fox", "and", "dog")).mkString(" ")
    val cases = Seq(
      (0L, goodWords),                                    // 65 words, all rules pass
      (1L, "too short to pass the word count rule here"), // n_words < 50
      (2L, goodWords + " " + ("#### " * 8).trim),         // symbol ratio >= 0.1
      (3L, (1 to 55).map(i => s"- bullet $i").mkString("\n")), // bullet lines
      (4L, (1 to 55).map(_ => "12345 67890").mkString(" "))) // no alphabetic words, no stops
      .toDF("doc_id", "text")
    val got = Repetition.gopherRules(cases, "doc_id", "text")
      .select("doc_id", "ok_word_count", "ok_symbols", "ok_bullets", "ok_alpha",
        "ok_stops", "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L)._7, "clean doc passes the battery")
    assert(!got(1L)._2 && !got(1L)._7, "short doc fails word count")
    assert(!got(2L)._3 && !got(2L)._7, "hash spam fails symbol ratio")
    assert(!got(3L)._4 && !got(3L)._7, "bullet wall fails bullet fraction")
    assert(!got(4L)._5 && !got(4L)._6 && !got(4L)._7, "numeric doc fails alpha and stops")
    // the single-Column form (CurateMain's filter) agrees with the facet frame
    val passCol = cases.select(col("doc_id"), Repetition.gopherPass(col("text")).as("p"))
      .as[(Long, Boolean)].collect().toMap
    got.foreach { case (id, r) => assert(passCol(id) == r._7, s"drift at doc $id") }
  }

  test("bigram LM stupid backoff: hand-computed seen and backed-off scores") {
    import graft.operators.BigramLm
    val train = Seq("a b a b").toDF("text")
    val score = Seq((0L, "a b a b"), (1L, "a c"), (2L, "x")).toDF("doc_id", "text")
    val got = BigramLm.scoreDocs(score, "doc_id", "text", train, "text")
      .as[(Long, Double)].collect().toMap
    // train: uni a:2 b:2 (N=4, V=2); bigrams (a,b):2 (b,a):1
    // doc0: tf(a,b)=2 lp=ln(2/2)=0; tf(b,a)=1 lp=ln(1/2) -> ln(.5)/3
    assert(math.abs(got(0L) - math.log(0.5) / 3.0) < 1e-6)
    // doc1: (a,c) unseen -> ln(0.4 * (0+1)/(4+2)) ; c is OOV (add-one)
    assert(math.abs(got(1L) - math.log(0.4 / 6.0)) < 1e-6)
    // doc2: single token, no bigram -> no row
    assert(!got.contains(2L))
  }

  test("htmlToText: tags, script/style elements, entities, double-decode trap") {
    import graft.functions.TextAnalysis
    val cases = Seq(
      // script ELEMENT content dropped, incl. markup-looking strings inside
      ("<p>Hello</p><script>x = \"<b>not text</b>\";</script><p>world</p>", "Hello world"),
      // style element dropped; case-insensitive; attributes on the tag
      ("<STYLE type=\"x\">p{}</STYLE>text<br/>more", "text more"),
      // comment (multi-line) dropped
      ("a<!-- c\nc -->b", "a b"),
      // entity decode; &amp;lt; is literal '&lt;' text, never '<'
      ("x &amp; y &lt;z&gt; &amp;lt;raw&#39;s&nbsp;end", "x & y <z> &lt;raw's end"),
      // whitespace collapse + trim
      ("  <div> a\n\n b\t</div>  ", "a b"),
      (null, null))
      .toDF("html", "want")
    val got = cases.select(TextAnalysis.htmlToText(col("html")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w, s"'$g' != '$w'") }
  }

  test("url ops: host, registrable domain, canonical url") {
    import graft.functions.UrlOps
    val cases = Seq(
      // (url, host, domain, normalized)
      ("https://Example.COM/path/x", "example.com", "example.com", "https://example.com/path/x"),
      ("http://sub.shop.co.uk:80/item?id=1#frag", "sub.shop.co.uk", "shop.co.uk",
        "http://sub.shop.co.uk/item?id=1"),
      ("https://cdn.example.com:443/a", "cdn.example.com", "example.com", "https://cdn.example.com/a"),
      ("http://user:pw@www.data.org:8080/x", "www.data.org", "data.org",
        "http://www.data.org:8080/x"),   // non-default port kept, userinfo stripped
      ("https://no-path.io", "no-path.io", "no-path.io", "https://no-path.io/"),
      // path-less WITH query: '/' inserted before '?' so it dedups
      // against the explicit-slash spelling of the same resource
      ("https://no-path.io?q=1", "no-path.io", "no-path.io", "https://no-path.io/?q=1"),
      ("ftp://files.example.net/pub", "files.example.net", "example.net", "ftp://files.example.net/pub"),
      ("localhost/nope", null, null, null),  // no scheme -> null
      // bracketed IPv6 authorities: unparseable across the whole chain
      // (NULL), never the truncated '[' garbage key
      ("http://[::1]:8080/x", null, null, null),
      ("https://u@[2001:db8::1]/y", null, null, null),
      ("https://single", "single", "single", "https://single/"))
      .toDF("url", "h", "d", "n")
    val got = cases.select(
      UrlOps.urlHost(col("url")).as("gh"),
      UrlOps.registrableDomain(UrlOps.urlHost(col("url"))).as("gd"),
      UrlOps.urlNormalize(col("url")).as("gn"),
      col("h"), col("d"), col("n"))
      .as[(String, String, String, String, String, String)].collect()
    got.foreach { case (gh, gd, gn, h, d, n) =>
      assert(gh == h, s"host: $gh != $h")
      assert(gd == d, s"domain: $gd != $d")
      assert(gn == n, s"norm: $gn != $n")
    }
  }

  test("filterBlockedDomains: subdomains fall to the registrable entry, non-urls pass") {
    import graft.functions.UrlOps
    val rows = Seq(
      (1L, "https://a.spam.com/x"),    // blocked via registrable domain
      (2L, "https://b.spam.com/y"),    // second subdomain, same entry
      (3L, "https://fine.org/z"),      // kept
      (4L, "not a url at all"))        // null domain -> kept
      .toDF("id", "url")
    val block = Seq("SPAM.com").toDF("domain") // case-normalized
    val kept = UrlOps.filterBlockedDomains(rows, col("url"), block, "domain")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
  }

  test("scriptCount/dominantScript: code-point counts per script, argmax with first-listed tie-break") {
    val d = Seq(
      (1L, "hello мир"),        // 5 latin, 3 cyrillic, 1 space
      (2L, "αβγ ab"),           // 3 greek, 2 latin
      (3L, "дом dom"),          // 3 cyrillic, 3 latin -> tie, latin listed first
      (4L, "12345 !!"))         // nothing in any script
      .toDF("id", "text")
    val out = d.select(col("id"),
        TextAnalysis.scriptCount(col("text"), "Latin").as("lat"),
        TextAnalysis.scriptCount(col("text"), "Cyrillic").as("cyr"),
        TextAnalysis.scriptCount(col("text"), "Greek").as("grk"),
        TextAnalysis.dominantScript(col("text"), Seq("Latin", "Cyrillic", "Greek")).as("dom"))
      .as[(Long, Int, Int, Int, String)].collect().toMap2
    assert(out(1L) == ((5, 3, 0, "latin")))
    assert(out(2L) == ((2, 0, 3, "greek")))
    assert(out(3L) == ((3, 3, 0, "latin"))) // tie -> first listed
    assert(out(4L) == ((0, 0, 0, "latin"))) // all-zero tie -> first listed
  }

  implicit private class Tup5Ops[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[A, (B, C, D, E)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
