package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the 100 TB training-data pipeline surface:
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * All pure per-row Column compositions — shuffle-free, codegen'd, and
  * deterministic across engines (every hash primitive is md5/sha2, every
  * float reduction a left fold), so the DuckDB oracle can replay them
  * bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokenization — the shared primitive. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  // Small per-language marker lexicons for the n-gram/stopword heuristic.
  // (Heuristic quality is bounded by the synthetic corpus; determinism and
  // plan shape are what the engine owns.)
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ein", "mit", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "pour"),
    "zh" -> Seq("de5", "shi4", "zai4", "you3", "wo3", "ta1", "le5", "bu4"))

  /** Marker-hit count for one language. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** Language-ID: argmax of marker hits, ties broken in [[markers]] order;
    * zero hits everywhere → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val hits = markers.map { case (lang, ws) => lang -> markerHits(toks, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight means earlier entries win ties (the when-chain checks en first)
    pick
  }

  /** Quality facets: each one a scalar the scorer (and filters at scale)
    * can push down to the parquet scan.
    */
  def nChars(text: Column): Column = length(text)
  def nTokens(text: Column): Column = size(tokens(text))
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]")).cast("double") / greatest(length(text), lit(1)).cast("double")
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    markerHits(toks, markers.head._2).cast("double") / greatest(size(toks), lit(1)).cast("double")
  }
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]-ish: length saturation + stopword
    * presence − punctuation excess. Deterministic double math, rounded to
    * 6 dp at the boundary.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(nChars(text).cast("double") / lit(500.0), lit(1.0))
    val sw = stopwordRatio(text)
    val punct = punctRatio(text)
    round(lenScore * lit(0.5) + sw * lit(0.4) + (lit(1.0) - least(punct * lit(10.0), lit(1.0))) * lit(0.1), 6)
  }

  /** Flesch reading ease, 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with the standard heuristics an engine can
    * compute in one codegen'd pass: sentences = terminal-punctuation runs
    * (`[.!?]+`, floored at 1), syllables per word = vowel-group count
    * (`[aeiouy]+` on the lowercased word, floored at 1). Rounded to 6 dp at
    * the boundary so the per-word fold order never surfaces in a gate hash.
    * Shuffle-free scalar — at scale it rides the same scan as the other
    * quality facets and pushes down as a filter bound.
    */
  def fleschReadingEase(text: Column): Column = {
    val toks = tokens(lower(text))
    val nW = greatest(size(toks), lit(1)).cast("double")
    val nS = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("double")
    val syl = aggregate(toks, lit(0L),
      (acc, w) => acc + greatest(regexp_count(w, lit("[aeiouy]+")), lit(1)).cast("long"))
      .cast("double")
    round(lit(206.835) - lit(1.015) * (nW / nS) - lit(84.6) * (syl / nW), 6)
  }

  /** Whitespace token count + a BPE-ish subword count (letter runs, digit
    * runs, and single punctuation marks each count as one token — the classic
    * pre-tokenizer regex).
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Rolling polynomial fingerprint over the text's code units:
    * `h = (h*31 + code) mod 1e9+7`, evaluated as a left fold — identical in
    * any engine with 64-bit integers (intermediate < 3.3e10).
    */
  def rollingFingerprint(text: Column): Column = {
    val codes = transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * lit(31L) + c.cast("long"), lit(1000000007L)))
  }

  // ------------------------------------------------------------------ PII
  // Training corpora must be scrubbed of personal identifiers before use;
  // the reference's whole privacy surface (F2 flag-fields, J1 k6-masking)
  // is the same concern at the per-field level — this is the free-text
  // counterpart. Patterns are deliberately RE2-compatible (no backrefs, no
  // lookaround) so any engine — and the DuckDB oracle — runs them verbatim.
  // Norwegian shapes to match the reference's domain: fnr (11-digit national
  // id) and 8-digit phone numbers with optional +47 prefix.
  val piiEmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiFnrPattern: String = "\\b\\d{11}\\b"
  // NB: two alternatives, not one optional prefix — `\b` cannot sit between
  // a space and '+' (both non-word) nor between the 7 of "+47" and the
  // number's first digit (both word chars), so the prefixed form is anchored
  // by the literal `\+` alone and only the bare form carries the leading \b.
  val piiPhonePattern: String = "\\+47 ?\\d{8}\\b|\\b\\d{8}\\b"

  /** Redact PII in place with type-tagged placeholders. Replacement ORDER is
    * part of the semantics: emails first (their local/domain parts can
    * contain digit runs a later pattern would shred), then the longer digit
    * shape (fnr) before the shorter (phone) — `\b` alone keeps an 8-digit
    * match out of the middle of an 11-digit run, but not out of
    * `+47`-prefixed text. Pure codegen'd regexp chain, shuffle-free.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, piiEmailPattern, "<EMAIL>")
    val f = regexp_replace(e, piiFnrPattern, "<FNR>")
    regexp_replace(f, piiPhonePattern, "<PHONE>")
  }

  /** Per-type PII match counts (audit/reporting facet of [[redactPii]] —
    * counted on the same intermediate stages the redaction chain sees, so
    * counts and redactions always agree).
    */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, piiEmailPattern, "<EMAIL>")
    val afterFnr = regexp_replace(afterEmail, piiFnrPattern, "<FNR>")
    Seq(
      "n_email" -> regexp_count(text, lit(piiEmailPattern)),
      "n_fnr" -> regexp_count(afterEmail, lit(piiFnrPattern)),
      "n_phone" -> regexp_count(afterFnr, lit(piiPhonePattern)))
  }

  /** HTML → text extraction (crawl-curation front door: WET-style text out
    * of raw markup) as a pure codegen'd Column chain, RE2-portable so any
    * engine replays it byte-for-byte:
    *
    *   1. drop comments, then `<script>`/`<style>` ELEMENTS (their text is
    *      code, not content) — non-greedy, case-insensitive, dot-matches-
    *      newline via inline `(?is)` flags (Java regex and RE2 agree);
    *   2. every remaining tag becomes a space (block/inline distinction
    *      deliberately flattened — downstream quality metrics operate on
    *      whitespace-collapsed text anyway);
    *   3. one-pass named-entity decode for the HTML 2.0 core set, `&amp;`
    *      LAST so `&amp;lt;` yields the literal text `&lt;` instead of
    *      double-decoding to `<` (decoded entities are content, never
    *      re-parsed as markup — single-pass, standards-correct);
    *   4. whitespace runs collapse to one space, ends trimmed.
    *
    * NULL markup → NULL. Numeric character references (`&#x2026;`) are out
    * of scope (documented; a general decoder needs charcode→UTF-8, not
    * expressible as a literal replace on both engines).
    */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?is)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComments, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val entities = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Token count under a byte-pair-encoding merge list: each word is split
    * to characters, then the merges apply IN ORDER as space-DELIMITED pair
    * joins — the pattern is `" a b "` against the `" c h a r s "` form, so
    * a rule can only fuse two whole adjacent tokens, never a token prefix
    * across a boundary (`th`+`e` must not fire inside `th er`). Later
    * rules see earlier rules' output, so `t h → th` then `th e → the`
    * composes. Each rule applies with EXACT greedy left-to-right BPE
    * semantics via the space-DOUBLING trick: doubling every delimiter
    * gives each potential match its own boundary spaces, so one
    * non-overlapping replace pass merges `a a a a a → aa aa a` exactly
    * like reference BPE (a naive replace would strand the middle token:
    * the shared delimiter gets consumed by the previous match). The
    * doubled form is an invariant — each replacement re-contributes one
    * space per side — so a final `"  " → " "` restores single spacing.
    *
    * The tokenizer-budget question — "how many BPE tokens is this corpus"
    * — answered as a pure per-row Column expression: no UDF, no vocabulary
    * shuffle, merges baked into the plan as literal replaces.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    requireMerges(merges)
    aggregate(
      transform(tokens(text), w => size(split(trim(bpeApply(w, merges)), " "))),
      lit(0), (acc, v) => acc + v)
  }

  private def requireMerges(merges: Seq[(String, String)]): Unit = {
    require(merges.nonEmpty, "merges required")
    require(merges.forall { case (a, b) => (a + b).matches("[A-Za-z0-9 ]+") },
      "merge pairs must be alphanumeric")
  }

  /** One WORD's merge application (shared by [[bpeTokenCount]] and
    * [[bpeTokens]]): " t h e " — leading space added, trailing space comes
    * from the char-spacer, so every token (incl. first/last) is
    * space-delimited; each rule then applies via the space-doubling greedy
    * replace described on [[bpeTokenCount]].
    */
  private def bpeApply(w: Column, merges: Seq[(String, String)]): Column = {
    val delimited = concat(lit(" "), regexp_replace(w, "(.)", "$1 "))
    merges.foldLeft(delimited) { case (acc, (a, b)) =>
      val p2 = " " + a.replace(" ", "  ") + " " // pair in doubled-space form
      replace(replace(replace(acc, lit(" "), lit("  ")), lit(p2), lit(s" $b ")),
        lit("  "), lit(" "))
    }
  }

  /** TOKENIZE under a merge list: the flattened subword token stream in
    * document order (what [[bpeTokenCount]] counts, materialized) — feed it
    * a vocab join for token IDS, or aggregate it for type/frequency
    * tables. Same pure-Column plan shape as the count: merges baked in as
    * literal replaces, no UDF, no vocabulary shuffle.
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column = {
    requireMerges(merges)
    flatten(transform(tokens(text), w => split(trim(bpeApply(w, merges)), " ")))
  }

  /** Count of characters in a Unicode SCRIPT (Latin, Cyrillic, Greek, Han,
    * …): length minus the length with that script's characters removed.
    * Both regex engines in play understand script classes (Java
    * `\p{IsXxx}`, RE2/DuckDB `\p{Xxx}`) and both `length`s count code
    * points, so the oracle replays exactly. Two codegen'd regex passes per
    * script — fine for a triage profile; a per-codepoint histogram
    * Expression is the upgrade path if dozens of scripts are needed.
    */
  def scriptCount(text: Column, script: String): Column =
    length(text) - length(regexp_replace(text, s"\\p{Is$script}", ""))

  /** Dominant script among the candidates, first-listed winning ties —
    * the multilingual-corpus triage label (script ≠ language, but script
    * routing is the cheap first cut before any language-ID model runs).
    */
  def dominantScript(text: Column, scripts: Seq[String]): Column = {
    require(scripts.nonEmpty, "at least one script")
    // Bind the per-script counts ONCE as an array (the Similarity.letBound
    // discipline): the argmax chain below references each count O(n) times
    // and CaseWhen defeats common-subexpression elimination for
    // conditionally-evaluated branches — inlined counts would re-run the
    // two regex passes per script O(n²) times per row.
    val counts = array(scripts.map(s => scriptCount(text, s).cast("long")): _*)
    element_at(transform(array(counts), cs => {
      def cnt(i: Int): Column = element_at(cs, i + 1)
      // First script whose count is >= every LATER count wins — equivalent
      // to argmax with first-listed tie-break (earlier scripts strictly
      // below the max always fail against the max's position).
      scripts.zipWithIndex.foldRight(lit(scripts.last.toLowerCase): Column) {
        case ((name, i), rest) =>
          val geLater = (i + 1 until scripts.length)
            .foldLeft(lit(true))((acc, j) => acc && cnt(i) >= cnt(j))
          when(geLater, lit(name.toLowerCase)).otherwise(rest)
      }
    }), 1)
  }
}
