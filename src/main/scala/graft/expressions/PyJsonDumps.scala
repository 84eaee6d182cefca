package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-`json.dumps(..., ensure_ascii=False)`-exact canonical JSON, as a
  * native Catalyst expression over the RAW message text.
  *
  * The reference persists `kafka_message` as
  * `json.dumps(filtered_dict, ensure_ascii=False)`
  * (`/root/reference/src/kafka_source.py:107-118`): the message is parsed
  * with `json.loads` (which preserves each row's own key insertion order),
  * F1 keypath drops and F2 presence flags are applied in place
  * (`kafka_source.py:85-100`), and the dict is re-serialized with Python's
  * default separators `", "` / `": "`, minimal escaping, and Python float
  * `repr`. Spark's `to_json` diverges on every one of those axes — schema
  * order instead of insertion order, compact separators, Jackson number
  * formatting — so a struct-payload migration would diff every golden
  * message byte-wise.
  *
  * This expression closes the gap by never going through a struct at all:
  * it re-emits the raw JSON text in one pass, tracking the benedict-style
  * cleaned keypath (array indexes stripped, `kafka_source.py:89,98`) to
  * apply the SAME drop/flag mutations the reference applies between parse
  * and dump. Because the traversal order IS the original text order, the
  * per-row key insertion order is preserved exactly — something no
  * schema-driven serializer can reproduce.
  *
  * Semantics mirrored from CPython's `json` module (observed behavior, not
  * code): object/array items joined with `", "`, keys followed by `": "`;
  * strings minimally escaped (`\"`, `\\`, `\b \t \n \f \r`, other C0
  * controls as lowercase `\u00xx`; all other code points raw — DEL and
  * U+2028/29 included); JSON escapes in the input (`\/`, `\uXXXX`,
  * surrogate pairs) are decoded and re-encoded canonically; integers pass
  * through at arbitrary precision (`-0` → `0`); floats are re-emitted with
  * Python `repr` (shortest round-trip digits; scientific iff the decimal
  * exponent is < -4 or >= 16, exponent sign always written and zero-padded
  * to two digits); `NaN`/`Infinity`/`-Infinity` literals (which CPython's
  * parser accepts) round-trip, and an overflowing float literal becomes
  * `Infinity` just as `float("1e999")` does. Malformed JSON yields NULL —
  * callers route that through the ST5 corrupt channel like
  * [[graft.operators.Envelope.json]] does — and "malformed" is CPython's
  * strict definition: number tokens must match `json.scanner.NUMBER_RE`
  * (`007`, `+5`, `1-2`, `.5`, bare `-` all reject), raw C0 controls inside
  * string tokens reject ("Invalid control character"). Duplicate keys
  * within an object resolve exactly as `json.loads` does — LAST value at
  * the FIRST occurrence's position — via a rewind-and-buffer fallback that
  * re-parses only the offending object (duplicate-free payloads, the
  * overwhelmingly common case, never leave the one-pass streaming path);
  * a message the reference processes is therefore never routed to the
  * corrupt channel over key duplication.
  *
  * `doGenCode` emits a direct static call (no UDF, no interpreted
  * fallback), so the operator stays inside whole-stage codegen; the
  * drop/flag sets ride along as one broadcast-free plan reference object.
  *
  * @param child raw JSON text (the Kafka value bytes cast to string)
  * @param dropPaths F1 `message-fields-filter` cleaned keypaths
  * @param flagPaths F2 `flag-field-config` cleaned keypaths
  * @param keypathSeparator benedict keypath separator (config default `.`)
  */
case class PyJsonDumps(
    child: Expression,
    dropPaths: Seq[String] = Nil,
    flagPaths: Seq[String] = Nil,
    keypathSeparator: String = ".") extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_py_json"

  @transient private lazy val cfg = PyJsonDumpsImpl.cfgOf(dropPaths, flagPaths, keypathSeparator)

  override def eval(input: InternalRow): Any =
    PyJsonDumpsImpl.emit(child.eval(input).asInstanceOf[UTF8String], cfg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cfgRef = ctx.addReferenceObj("pyJsonCfg", cfg, classOf[PyJsonDumpsImpl.Cfg].getName)
    ev.copy(code = code"""
      ${childGen.code}
      UTF8String ${ev.value} = graft.expressions.PyJsonDumpsImpl.emit(
        ${childGen.isNull} ? null : ${childGen.value}, $cfgRef);
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PyJsonDumps =
    copy(child = newChild)
}

/** Python-`json.dumps(str, ensure_ascii=False)`-exact quoting of a BARE
  * string (not JSON text) — the S6 string-deserializer's `kafka_message`
  * (`/root/reference/src/kafka_source.py:121-127`). Differs from
  * `to_json(array(s))`-based quoting in control-char escape case (Python
  * emits lowercase hex in \\u00xx escapes, Jackson uppercase) and shares the expression's
  * minimal-escape rules.
  */
case class PyJsonQuote(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_py_json_quote"

  override def eval(input: InternalRow): Any =
    PyJsonDumpsImpl.quote(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      UTF8String ${ev.value} = graft.expressions.PyJsonDumpsImpl.quote(
        ${childGen.isNull} ? null : ${childGen.value});
      boolean ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PyJsonQuote =
    copy(child = newChild)
}

object PyJsonDumpsImpl {

  /** Plan-time config: drop/flag membership sets keyed by cleaned keypath. */
  final class Cfg(
      val drop: java.util.HashSet[String],
      val flag: java.util.HashSet[String],
      val sep: String) extends Serializable {
    val active: Boolean = !drop.isEmpty || !flag.isEmpty
  }

  def cfgOf(drop: Seq[String], flag: Seq[String], sep: String): Cfg = {
    val d = new java.util.HashSet[String](); drop.foreach(d.add)
    val f = new java.util.HashSet[String](); flag.foreach(f.add)
    new Cfg(d, f, sep)
  }

  /** Entry point (also the codegen target). NULL/malformed → null. */
  def emit(input: UTF8String, cfg: Cfg): UTF8String = {
    if (input == null) return null
    val s = input.toString
    val p = new Emitter(s, cfg)
    try {
      p.skipWs()
      p.value(new java.lang.StringBuilder)
      p.skipWs()
      if (!p.atEnd) null else UTF8String.fromString(p.result)
    } catch { case _: MalformedJson => null }
  }

  /** Shared no-op config for [[quote]] — the S6 hot path quotes one bare
    * string per message; allocating a fresh Cfg (two HashSets) per row
    * bought nothing.
    */
  private val emptyCfg = cfgOf(Nil, Nil, ".")

  /** `json.dumps(bare_string, ensure_ascii=False)` — quote + minimal escape. */
  def quote(input: UTF8String): UTF8String = {
    if (input == null) return null
    val p = new Emitter("", emptyCfg)
    p.encodeString(input.toString)
    UTF8String.fromString(p.result)
  }

  private final class MalformedJson extends RuntimeException(null, null, false, false)

  /** Single-pass recursive-descent re-emitter. `path` holds the cleaned
    * keypath of the value being parsed (array indexes contribute nothing,
    * matching the reference's `re.sub(r"\[\d+\]", "", key)`).
    */
  private final class Emitter(s: String, cfg: Cfg) {
    private var pos = 0
    // var, not val: [[objBuffered]] temporarily redirects emission into a
    // per-member buffer when an object turns out to contain duplicate keys.
    private var out = new java.lang.StringBuilder(s.length + 16)
    def result: String = out.toString
    def atEnd: Boolean = pos >= s.length

    private def fail(): Nothing = throw new MalformedJson
    private def peek: Char = { if (pos >= s.length) fail(); s.charAt(pos) }
    def skipWs(): Unit = {
      while (pos < s.length && {
        val c = s.charAt(pos); c == ' ' || c == '\t' || c == '\n' || c == '\r'
      }) pos += 1
    }

    /** Parse one value and append its canonical form. `path` is the cleaned
      * keypath of this value (empty at top level).
      */
    def value(path: java.lang.StringBuilder): Unit = peek match {
      case '{' => obj(path)
      case '[' => arr(path)
      case '"' => encodeString(decodeString())
      case 't' => literal("true")
      case 'f' => literal("false")
      case 'n' => literal("null")
      case 'N' => expect("NaN"); out.append("NaN")
      case 'I' => expect("Infinity"); out.append("Infinity")
      case _ => number()
    }

    private def literal(lit: String): Unit = { expect(lit); out.append(lit) }

    private def expect(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail()
      pos += lit.length
    }

    private def obj(path: java.lang.StringBuilder): Unit = {
      val inStart = pos   // rewind point if a duplicate key surfaces
      val outMark = out.length()
      pos += 1 // '{'
      out.append('{')
      skipWs()
      var first = true
      if (peek == '}') { pos += 1; out.append('}'); return }
      // Duplicate-key tracking: CPython's json.loads keeps only the LAST
      // occurrence (at the FIRST occurrence's dict position), so the
      // reference's dumps emits one key where a naive streaming re-emitter
      // would emit every duplicate — a silent byte divergence. Keep-last
      // can't be emitted in one streaming pass, so on the first duplicate
      // THIS object rewinds (input to its '{', output to its mark) and
      // re-parses through [[objBuffered]], which buffers per-member output
      // and replays CPython's exact dict semantics. Only the offending
      // object pays the buffering cost; duplicate-free payloads (the
      // overwhelmingly common case) stay on the allocation-light streaming
      // path. Lazy set allocation keeps small objects cheap.
      var firstKey: String = null
      var seenKeys: java.util.HashSet[String] = null
      while (true) {
        if (peek != '"') fail()
        val key = decodeString()
        if (firstKey == null && seenKeys == null) firstKey = key
        else {
          if (seenKeys == null) {
            seenKeys = new java.util.HashSet[String]()
            seenKeys.add(firstKey)
          }
          if (!seenKeys.add(key)) {
            pos = inStart
            out.setLength(outMark)
            objBuffered(path)
            return
          }
        }
        skipWs()
        if (peek != ':') fail()
        pos += 1
        skipWs()
        val mark = path.length()
        if (mark > 0) path.append(cfg.sep)
        path.append(key)
        val cleaned = if (cfg.active) path.toString else null
        if (cfg.active && cfg.drop.contains(cleaned)) {
          skipValue() // F1: key and subtree vanish from the emitted message
        } else {
          if (!first) out.append(", ")
          first = false
          encodeString(key)
          out.append(": ")
          if (cfg.active && cfg.flag.contains(cleaned)) {
            // F2: presence flag — 1 for any non-null value, 0 for null
            // (`kafka_source.py:100`), the original value never emitted.
            out.append(if (skipValue()) '0' else '1')
          } else value(path)
        }
        path.setLength(mark)
        skipWs()
        peek match {
          case ',' => pos += 1; skipWs()
          case '}' => pos += 1; out.append('}'); return
          case _ => fail()
        }
      }
    }

    /** Keep-LAST re-parse of ONE object whose streaming pass hit a duplicate
      * key. Replays CPython dict-build semantics exactly: repeated
      * assignment keeps the FIRST occurrence's position and the LAST
      * occurrence's value (`d[k] = v` never moves an existing key) — which
      * `LinkedHashMap.put` reproduces verbatim. F1 drops remove the key
      * regardless of occurrence (the reference drops AFTER loads, when only
      * one survives); F2 flags are computed per occurrence and keep-last
      * like any other value. Member values are rendered through the normal
      * [[value]] machinery with `out` redirected into a per-member buffer,
      * so nested objects (including further duplicate-key rewinds, whose
      * marks are relative to the redirected buffer) behave identically to
      * the streaming path.
      */
    private def objBuffered(path: java.lang.StringBuilder): Unit = {
      pos += 1 // '{'
      skipWs()
      // Defensive: only reachable with >= 2 members, but keep the grammar total.
      if (peek == '}') { pos += 1; out.append("{}"); return }
      val members = new java.util.LinkedHashMap[String, String]()
      var done = false
      while (!done) {
        if (peek != '"') fail()
        val key = decodeString()
        skipWs()
        if (peek != ':') fail()
        pos += 1
        skipWs()
        val mark = path.length()
        if (mark > 0) path.append(cfg.sep)
        path.append(key)
        val cleaned = if (cfg.active) path.toString else null
        if (cfg.active && cfg.drop.contains(cleaned)) {
          skipValue()
        } else if (cfg.active && cfg.flag.contains(cleaned)) {
          members.put(key, if (skipValue()) "0" else "1")
        } else {
          val saved = out
          out = new java.lang.StringBuilder
          value(path)
          members.put(key, out.toString)
          out = saved
        }
        path.setLength(mark)
        skipWs()
        peek match {
          case ',' => pos += 1; skipWs()
          case '}' => pos += 1; done = true
          case _ => fail()
        }
      }
      out.append('{')
      val it = members.entrySet().iterator()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) out.append(", ")
        first = false
        encodeString(e.getKey)
        out.append(": ")
        out.append(e.getValue)
      }
      out.append('}')
    }

    private def arr(path: java.lang.StringBuilder): Unit = {
      pos += 1 // '['
      out.append('[')
      skipWs()
      var first = true
      if (peek == ']') { pos += 1; out.append(']'); return }
      while (true) {
        if (!first) out.append(", ")
        first = false
        // Array indexes do not extend the cleaned path — a drop/flag path
        // addressing `a.b` hits `a[i].b` for every element i.
        value(path)
        skipWs()
        peek match {
          case ',' => pos += 1; skipWs()
          case ']' => pos += 1; out.append(']'); return
          case _ => fail()
        }
      }
    }

    /** Skip one well-formed value without emitting; true iff it was `null`. */
    private def skipValue(): Boolean = peek match {
      case 'n' => expect("null"); true
      case 't' => expect("true"); false
      case 'f' => expect("false"); false
      case 'N' => expect("NaN"); false
      case 'I' => expect("Infinity"); false
      case '"' => decodeString(); false
      case '{' =>
        pos += 1; skipWs()
        if (peek == '}') { pos += 1; return false }
        while (true) {
          if (peek != '"') fail()
          decodeString(); skipWs()
          if (peek != ':') fail()
          pos += 1; skipWs()
          skipValue(); skipWs()
          peek match {
            case ',' => pos += 1; skipWs()
            case '}' => pos += 1; return false
            case _ => fail()
          }
        }
        false
      case '[' =>
        pos += 1; skipWs()
        if (peek == ']') { pos += 1; return false }
        while (true) {
          skipValue(); skipWs()
          peek match {
            case ',' => pos += 1; skipWs()
            case ']' => pos += 1; return false
            case _ => fail()
          }
        }
        false
      case _ => skipNumber(); false
    }

    /** Scan one number token with CPython's exact grammar
      * (`json.scanner.NUMBER_RE`: `-?(0|[1-9]\d*)(\.\d+)?([eE][-+]?\d+)?`,
      * plus the `-Infinity` extension). Anything looser — `007`, `+5`,
      * `1-2`, `.5`, `5.`, a bare `-` — fails, exactly as `json.loads`
      * raises on it; the earlier digit-soup scan re-emitted those verbatim
      * and silently produced invalid canonical bytes.
      */
    private def scanNumber(): String = {
      val start = pos
      def digit = pos < s.length && { val c = s.charAt(pos); c >= '0' && c <= '9' }
      if (pos < s.length && s.charAt(pos) == '-') pos += 1
      if (pos < s.length && s.charAt(pos) == 'I') { expect("Infinity"); return s.substring(start, pos) }
      if (!digit) fail()
      if (s.charAt(pos) == '0') pos += 1
      else while (digit) pos += 1
      if (pos < s.length && s.charAt(pos) == '.') {
        pos += 1
        if (!digit) fail()
        while (digit) pos += 1
      }
      if (pos < s.length && { val c = s.charAt(pos); c == 'e' || c == 'E' }) {
        pos += 1
        if (pos < s.length && { val c = s.charAt(pos); c == '+' || c == '-' }) pos += 1
        if (!digit) fail()
        while (digit) pos += 1
      }
      s.substring(start, pos)
    }

    private def skipNumber(): Unit = { scanNumber(); () }

    /** Number token → canonical form. Integers (no `.`/exponent) pass
      * through at arbitrary precision like Python ints; anything else goes
      * through double parse + Python `repr`.
      */
    private def number(): Unit = {
      val tok = scanNumber()
      if (tok == "-Infinity") { out.append(tok); return }
      var isFloat = false
      var i = 0
      while (i < tok.length && !isFloat) {
        val c = tok.charAt(i)
        if (c == '.' || c == 'e' || c == 'E') isFloat = true
        i += 1
      }
      if (!isFloat) {
        // json.loads("-0") parses to int 0.
        out.append(if (tok == "-0") "0" else tok)
      } else {
        val d = try java.lang.Double.parseDouble(tok) catch { case _: NumberFormatException => fail() }
        out.append(pythonRepr(d))
      }
    }

    /** Decode a JSON string token (standard escapes, `\uXXXX`, surrogate
      * pairs combine naturally as UTF-16 units).
      */
    private def decodeString(): String = {
      if (peek != '"') fail()
      pos += 1
      val sb = new java.lang.StringBuilder
      while (true) {
        if (pos >= s.length) fail()
        val c = s.charAt(pos)
        if (c == '"') { pos += 1; return sb.toString }
        else if (c == '\\') {
          pos += 1
          if (pos >= s.length) fail()
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail()
              val hex = s.substring(pos + 1, pos + 5)
              val cp = try Integer.parseInt(hex, 16) catch { case _: NumberFormatException => fail() }
              sb.append(cp.toChar)
              pos += 4
            case _ => fail()
          }
          pos += 1
        } else if (c < 0x20) {
          // CPython json.loads default strict mode rejects raw C0 controls
          // inside string tokens ("Invalid control character"); accepting
          // them here would canonicalize rows the reference fails on.
          fail()
        } else { sb.append(c); pos += 1 }
      }
      sb.toString
    }

    /** Python `ensure_ascii=False` escaping: only `"`, `\` and C0 controls
      * escape; everything else (non-ASCII, DEL, U+2028/29) raw.
      */
    def encodeString(v: String): Unit = {
      out.append('"')
      var i = 0
      while (i < v.length) {
        val c = v.charAt(i)
        c match {
          case '"' => out.append("\\\"")
          case '\\' => out.append("\\\\")
          case '\b' => out.append("\\b")
          case '\f' => out.append("\\f")
          case '\n' => out.append("\\n")
          case '\r' => out.append("\\r")
          case '\t' => out.append("\\t")
          case _ =>
            if (c < 0x20) out.append(f"\\u${c.toInt}%04x")
            else out.append(c)
        }
        i += 1
      }
      out.append('"')
    }
  }

  /** Python `repr(float)` (= what `json.dumps` emits for floats): shortest
    * decimal digits that round-trip, positional when the decimal exponent is
    * in [-4, 16), else scientific with a signed, >=2-digit exponent.
    *
    * The shortest digits come from CORRECTLY-ROUNDED decimal conversion of
    * the EXACT binary value (`new BigDecimal(double)` is exact; HALF_EVEN
    * matches dtoa's tie rule), binary-searched for the smallest precision
    * whose parse round-trips — the same decimal CPython's dtoa mode-0
    * picks. An earlier formulation formatted via Java's `%.{p}e`, which on
    * JDK 17 double-rounds THROUGH `Double.toString`'s 17 digits (half-up on
    * a decimal string): for values like 4.7356337844798495e18 the correctly
    * rounded 16-digit form (…849) is never produced (…8495 → half-up →
    * …850, which does not round-trip), so a 17-digit repr shipped where
    * CPython prints 16. Found by the 500k-case differential fuzz
    * (`PyJsonFuzz` seed 100 line 102951); the regression row is spec-pinned.
    */
  def pythonRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    val neg = (java.lang.Double.doubleToRawLongBits(d) >>> 63) == 1L
    val a = math.abs(d)
    if (a == 0.0) return if (neg) "-0.0" else "0.0"
    val exact = new java.math.BigDecimal(a)
    def candAt(p: Int): java.math.BigDecimal =
      exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
    // Smallest round-tripping precision; monotone (a longer correctly-
    // rounded form is never farther from the value), 17 always suffices.
    var lo = 1
    var hi = 17
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (candAt(mid).doubleValue() == a) hi = mid else lo = mid + 1
    }
    val cand = candAt(lo)
    val unscaled = cand.unscaledValue().toString
    val exp10 = (unscaled.length - 1) - cand.scale()
    var last = unscaled.length
    while (last > 1 && unscaled.charAt(last - 1) == '0') last -= 1
    val digits = unscaled.substring(0, last)
    val sb = new java.lang.StringBuilder(24)
    if (neg) sb.append('-')
    if (exp10 >= -4 && exp10 < 16) {
      if (exp10 >= 0) {
        val intDigits = exp10 + 1
        if (digits.length <= intDigits) {
          sb.append(digits)
          var i = digits.length
          while (i < intDigits) { sb.append('0'); i += 1 }
          sb.append(".0")
        } else {
          sb.append(digits, 0, intDigits).append('.').append(digits, intDigits, digits.length)
        }
      } else {
        sb.append("0.")
        var i = -1
        while (i > exp10) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (exp10 < 0) '-' else '+')
      val ea = math.abs(exp10)
      if (ea < 10) sb.append('0')
      sb.append(ea)
    }
    sb.toString
  }
}
