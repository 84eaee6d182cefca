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
}
