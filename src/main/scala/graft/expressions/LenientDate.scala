package graft.expressions

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId}
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** The lenient date-parse ladder (reference `dateparser` emulation,
  * `/root/reference/src/transform.py:49-60`) as ONE native Catalyst
  * expression: a single imperative pass per row over the same rung order as
  * [[graft.functions.Conversions.lenientDateOsloBuiltins]] — the builtin
  * composition it replaces and is property-tested against.
  *
  * Why an Expression: the builtin ladder is a ~45-branch `coalesce` whose
  * heavy subexpressions (the lower-cased/normalized string, the anchor's
  * date and time-of-day, a dozen `regexp_extract`s per rung) are
  * re-evaluated at every reference — Catalyst's subexpression elimination
  * cannot hoist work out of lazily-evaluated `coalesce`/`when` branches,
  * and the expression tree is too large for whole-stage codegen to keep in
  * one compiled method. Measured on the t7 gate corpus (150k rows,
  * single partition): builtin ladder ~8 s, ~6 s of it in the relative
  * rungs; this expression computes each shared piece exactly once per row.
  *
  * Format-rung parity is BY CONSTRUCTION, not re-implementation: every
  * format attempt goes through the same `TimestampFormatter` that
  * `try_to_timestamp(col, lit(pattern))` uses (via
  * [[org.apache.spark.sql.graft.Shim.timestampFormatter]]), created with
  * the expression's session timezone. Regex rungs reuse the builtin
  * ladder's pattern strings verbatim with Java `find()` — the same engine
  * and anchoring semantics as Spark's `RLIKE`.
  *
  * Null contract (mirrors the builtin ladder): NULL input → NULL; NULL
  * anchor → the relative rungs contribute nothing (a `when` whose VALUE is
  * null falls through `coalesce`), format/Norwegian rungs still apply.
  * Returns the parsed instant as TimestampType micros; callers convert to
  * Oslo wall-clock outside (`from_utc_timestamp`), exactly like the
  * builtin ladder.
  */
case class LenientDate(
    str: Expression,
    anchor: Expression,
    timeZoneId: Option[String] = None)
  extends Expression with TimeZoneAwareExpression {

  override def children: Seq[Expression] = Seq(str, anchor)
  // AbstractDataType/ExpectsInputTypes are private[sql]; plain check instead
  // (same stance as the other graft expressions).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (str.dataType == StringType && anchor.dataType == TimestampType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_lenient_date expects (string, timestamp), got " +
        s"(${str.dataType.simpleString}, ${anchor.dataType.simpleString})")
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lenient_date"

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(timeZoneId))

  @transient private lazy val parser = new LenientDateParser(zoneId.getId)

  override def eval(input: InternalRow): Any = {
    val s = str.eval(input)
    if (s == null) null
    else {
      val a = anchor.eval(input)
      parser.parse(s.asInstanceOf[UTF8String].toString,
        if (a == null) null else java.lang.Long.valueOf(a.asInstanceOf[Long]))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lenientDateParser", parser,
      classOf[LenientDateParser].getName)
    val strGen = str.genCode(ctx)
    val anchorGen = anchor.genCode(ctx)
    ev.copy(code = code"""
      ${strGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${strGen.isNull}) {
        ${anchorGen.code}
        java.lang.Long r = $ref.parse(${strGen.value}.toString(),
          ${anchorGen.isNull} ? null : java.lang.Long.valueOf(${anchorGen.value}));
        if (r != null) { ${ev.isNull} = false; ${ev.value} = r.longValue(); }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), anchor = newChildren(1))
}

/** The per-row parsing engine behind [[LenientDate]] — one instance per
  * expression, shipped to executors by reference; formatters/regexes are
  * `@transient lazy` and rebuilt on first use per JVM.
  *
  * RUNG ORDER is the contract: it replays
  * [[graft.functions.Conversions.lenientDateOsloBuiltins]]'s `coalesce`
  * top to bottom (formats → epoch bands → Norwegian month-name → relative
  * literals → calendar ago/in → seconds ago/in → Norwegian relatives →
  * compound "N units ago <weekday>" → month-day). The structural guards on
  * format rungs are NECESSARY conditions only (Java strict field widths),
  * so a skipped attempt is one that was guaranteed to fail.
  */
final class LenientDateParser(zoneIdStr: String) extends Serializable {
  import LenientDateParser._

  @transient private lazy val zone: ZoneId = ZoneId.of(zoneIdStr)

  private type Guard = String => Boolean
  /** (guard, formatter, needsResolve). `needsResolve` marks AM/PM patterns:
    * `parseOptional` goes through `parseUnresolved`, which does NOT combine
    * ClockHourOfAmPm ('h') with the AM/PM marker — "01:30 PM" comes back as
    * 12:30, silently wrong (caught by ConversionsSpec/Round10PropertySpec
    * when the full suite ran in round 12). Those rungs use the throwing
    * `parse` (the exact path `try_to_timestamp` takes) wrapped in a catch;
    * the amPm guard keeps the exception cost off non-AM/PM rows.
    */
  @transient private lazy val formatRungs: Array[(Guard, org.apache.spark.sql.catalyst.util.TimestampFormatter, Boolean)] = {
    def f(p: String) = Shim.timestampFormatter(p, zone)
    // guards: char positions are 0-indexed here (the builtin ladder's
    // substring positions minus one).
    def at(s: String, i: Int, c: Char) = s.length > i && s.charAt(i) == c
    val isoFam: Guard = s => at(s, 4, '-') && at(s, 7, '-')
    val cT: Guard = s => at(s, 10, 'T')
    val cSp: Guard = s => at(s, 10, ' ')
    val dot: Guard = s => s.indexOf('.') >= 0
    val off: Guard = s => hasOffsetSuffix(s)
    val amPm: Guard = s => endsAmPm(s)
    Array[(Guard, String)](
      (s => isoFam(s) && cT(s) && dot(s) && off(s), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"),
      (s => isoFam(s) && cT(s) && dot(s) && off(s), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
      (s => isoFam(s) && cT(s) && off(s), "yyyy-MM-dd'T'HH:mm:ssXXX"),
      (s => isoFam(s) && cSp(s) && off(s), "yyyy-MM-dd HH:mm:ssXXX"),
      (s => isoFam(s) && cT(s) && dot(s), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
      (s => isoFam(s) && cT(s) && dot(s), "yyyy-MM-dd'T'HH:mm:ss.SSS"),
      (s => isoFam(s) && cT(s), "yyyy-MM-dd'T'HH:mm:ss"),
      (s => isoFam(s) && cSp(s) && dot(s), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
      (s => isoFam(s) && cSp(s) && dot(s), "yyyy-MM-dd HH:mm:ss.SSS"),
      (s => isoFam(s) && cSp(s), "yyyy-MM-dd HH:mm:ss"),
      (s => isoFam(s) && s.length == 10, "yyyy-MM-dd"),
      (s => at(s, 4, '/'), "yyyy/MM/dd"),
      (s => at(s, 2, '.'), "dd.MM.yyyy HH:mm:ss"),
      (s => at(s, 2, '.'), "dd.MM.yyyy"),
      (s => at(s, 2, '/') && !amPm(s), "dd/MM/yyyy HH:mm:ss"),
      (s => at(s, 2, '/') && !amPm(s), "dd/MM/yyyy"),
      (s => at(s, 2, '-'), "dd-MM-yyyy HH:mm:ss"),
      (s => at(s, 2, '-'), "dd-MM-yyyy"),
      (s => isoFam(s) && amPm(s), "yyyy-MM-dd hh:mm:ss a"),
      (s => isoFam(s) && amPm(s), "yyyy-MM-dd hh:mm a"),
      (s => at(s, 2, '/') && amPm(s), "dd/MM/yyyy hh:mm a"),
      (s => alphaAt0(s) && amPm(s), "MMM d, yyyy hh:mm a"),
      (s => dayThenAlpha(s), "d MMM yyyy"),
      (s => dayThenAlpha(s), "d MMMM yyyy"),
      (s => alphaAt0(s), "MMM dd yyyy"),
      (s => alphaAt0(s), "MMMM dd, yyyy"),
      (s => allDigits(s) && s.length == 8, "yyyyMMdd")
    ).map { case (g, p) => (g, f(p), p.contains(" a")) }
  }

  @transient private lazy val fmtNoDate = Shim.timestampFormatter("yyyy-MM-dd", zone)
  @transient private lazy val fmtMd1 = Shim.timestampFormatter("yyyy MMMM d", zone)
  @transient private lazy val fmtMd2 = Shim.timestampFormatter("yyyy MMM d", zone)
  @transient private lazy val fmtDm1 = Shim.timestampFormatter("yyyy d MMMM", zone)
  @transient private lazy val fmtDm2 = Shim.timestampFormatter("yyyy d MMM", zone)

  def parse(raw: String, anchorMicros: java.lang.Long): java.lang.Long = {
    val s = trimSpaces(raw) // builtin `trim` strips ASCII spaces only
    // ---- format rungs (guards are necessary conditions; see class doc)
    var i = 0
    while (i < formatRungs.length) {
      val (g, fmt, needsResolve) = formatRungs(i)
      if (g(s)) {
        if (needsResolve) {
          // parseOptional's parseUnresolved path drops the AM/PM+clock-hour
          // resolution — use the throwing parse, like try_to_timestamp.
          try return java.lang.Long.valueOf(fmt.parse(s))
          catch { case scala.util.control.NonFatal(_) => () }
        } else {
          val r = fmt.parseOptional(s)
          if (r.isDefined) return java.lang.Long.valueOf(r.get)
        }
      }
      i += 1
    }
    // ---- epoch-in-string bands (digit counts disjoint from every format)
    if (allDigits(s)) {
      if (s.length == 9 || s.length == 10)
        return java.lang.Long.valueOf(s.toLong * 1000000L)
      if (s.length == 12 || s.length == 13)
        return java.lang.Long.valueOf(s.toLong * 1000L)
    }
    val low = lowerLikeSpark(s)
    // ---- Norwegian month-name date, optional weekday prefix
    val nm = NoDatePattern.matcher(low)
    if (nm.find()) {
      val day = nm.group(1).toInt
      val monthIdx = NorwegianMonths.indexOf(nm.group(2)) + 1
      val iso = f"${nm.group(3)}%s-$monthIdx%02d-$day%02d"
      val r = fmtNoDate.parseOptional(iso)
      if (r.isDefined) return java.lang.Long.valueOf(r.get)
    }
    // ---- relative rungs (anchored to the frozen batch time)
    if (anchorMicros == null) return null
    val a = anchorMicros.longValue()
    // "a/an <unit>" → "1 <unit>", mirroring the builtin's two regexp_replace
    val norm = InA2.matcher(InA1.matcher(low).replaceAll("1 ")).replaceAll("in 1 ")
    norm match {
      case "now" | "today" | "nå" | "i dag" => return anchorMicros
      case "yesterday" | "i går" => return java.lang.Long.valueOf(a - DayMicros)
      case "tomorrow" | "i morgen" => return java.lang.Long.valueOf(a + DayMicros)
      case _ => ()
    }
    val agoM = AgoPattern.matcher(norm)
    if (agoM.find())
      return shiftEnglish(a, agoM.group(1).toLong, agoM.group(2), -1)
    val inM = InPattern.matcher(norm)
    if (inM.find())
      return shiftEnglish(a, inM.group(1).toLong, inM.group(2), 1)
    val noAgoM = NoAgoPattern.matcher(norm)
    if (noAgoM.find())
      return shiftEnglish(a, noAgoM.group(1).toLong, unitNoEn(noAgoM.group(2)), -1)
    val noInM = NoInPattern.matcher(norm)
    if (noInM.find())
      return shiftEnglish(a, noInM.group(1).toLong, unitNoEn(noInM.group(2)), 1)
    val cm = CompoundAgoPattern.matcher(norm)
    if (cm.find()) {
      val base = shiftEnglish(a, cm.group(1).toLong, cm.group(2), -1).longValue()
      val d0 = Instant.ofEpochSecond(Math.floorDiv(base, 1000000L),
        Math.floorMod(base, 1000000L) * 1000L).atZone(zone).toLocalDate
      val monday = d0.minusDays(d0.getDayOfWeek.getValue - 1L)
      val idx = EnglishDays.indexOf(cm.group(3))
      val res = monday.plusDays(idx.toLong).atStartOfDay(zone).toInstant
      return java.lang.Long.valueOf(instantMicros(res))
    }
    // ---- month-day forms without a year (year from the anchor)
    if (MdPattern.matcher(norm).find()) {
      val yr = anchorYearString(a)
      val r1 = fmtMd1.parseOptional(yr + " " + norm)
      if (r1.isDefined) return java.lang.Long.valueOf(r1.get)
      val r2 = fmtMd2.parseOptional(yr + " " + norm)
      if (r2.isDefined) return java.lang.Long.valueOf(r2.get)
    }
    if (DmPattern.matcher(norm).find()) {
      val yr = anchorYearString(a)
      val r1 = fmtDm1.parseOptional(yr + " " + norm)
      if (r1.isDefined) return java.lang.Long.valueOf(r1.get)
      val r2 = fmtDm2.parseOptional(yr + " " + norm)
      if (r2.isDefined) return java.lang.Long.valueOf(r2.get)
    }
    null
  }

  /** English-unit relative shift: seconds-span for second..week, CALENDAR
    * arithmetic for month/year (`add_months` clamping via `plusMonths`,
    * anchor's wall-clock time-of-day re-attached including micros) — the
    * builtin ladder's calShift/shift pair.
    */
  private def shiftEnglish(a: Long, n: Long, unit: String, sign: Int): java.lang.Long =
    unit match {
      case "second" => java.lang.Long.valueOf(a + sign * n * 1000000L)
      case "minute" => java.lang.Long.valueOf(a + sign * n * 60000000L)
      case "hour"   => java.lang.Long.valueOf(a + sign * n * 3600000000L)
      case "day"    => java.lang.Long.valueOf(a + sign * n * DayMicros)
      case "week"   => java.lang.Long.valueOf(a + sign * n * 7L * DayMicros)
      case m =>
        val months = if (m == "month") sign * n else sign * n * 12L
        val zdt = Instant.ofEpochSecond(Math.floorDiv(a, 1000000L),
          Math.floorMod(a, 1000000L) * 1000L).atZone(zone)
        val d2 = zdt.toLocalDate.plusMonths(months)
        val res = LocalDateTime.of(d2, zdt.toLocalTime).atZone(zone).toInstant
        java.lang.Long.valueOf(instantMicros(res))
    }

  private def anchorYearString(a: Long): String = {
    val y = Instant.ofEpochSecond(Math.floorDiv(a, 1000000L),
      Math.floorMod(a, 1000000L) * 1000L).atZone(zone).getYear
    f"$y%04d"
  }

  private def unitNoEn(u: String): String =
    if (u.startsWith("sekund")) "second"
    else if (u.startsWith("minutt")) "minute"
    else if (u.startsWith("time")) "hour"
    else if (u.startsWith("dag")) "day"
    else if (u.startsWith("uke")) "week"
    else if (u.startsWith("måned")) "month"
    else "year"
}

object LenientDateParser {
  private final val DayMicros = 86400000000L

  // Shared vocabulary — single source of truth is Conversions; duplicated
  // here as the expression module must not depend on the functions module.
  // ConversionsSpec pins the two lists equal.
  val NorwegianMonths: IndexedSeq[String] = IndexedSeq(
    "januar", "februar", "mars", "april", "mai", "juni",
    "juli", "august", "september", "oktober", "november", "desember")
  val NorwegianDays: IndexedSeq[String] = IndexedSeq(
    "mandag", "tirsdag", "onsdag", "torsdag", "fredag", "lørdag", "søndag")
  val EnglishDays: IndexedSeq[String] = IndexedSeq(
    "monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday")
  private val NoUnits =
    "sekund|sekunder|minutt|minutter|time|timer|dag|dager|uke|uker|måned|måneder|år"

  // Pattern strings are the builtin ladder's verbatim; matched with find()
  // like RLIKE.
  private val AgoPattern =
    Pattern.compile("^(\\d{1,6}) (second|minute|hour|day|week|month|year)s? ago$")
  private val InPattern =
    Pattern.compile("^in (\\d{1,6}) (second|minute|hour|day|week|month|year)s?$")
  private val NoAgoPattern = Pattern.compile(s"^for (\\d{1,6}) ($NoUnits) siden$$")
  private val NoInPattern = Pattern.compile(s"^om (\\d{1,6}) ($NoUnits)$$")
  private val CompoundAgoPattern = Pattern.compile(
    s"^(\\d{1,6}) (second|minute|hour|day|week|month|year)s? ago (${EnglishDays.mkString("|")})$$")
  private val MdPattern = Pattern.compile("^[a-z]{3,9} \\d{1,2}$")
  private val DmPattern = Pattern.compile("^\\d{1,2} [a-z]{3,9}$")
  private val NoDatePattern = Pattern.compile(
    s"^(?:(?:${NorwegianDays.mkString("|")}),? )?" +
      s"(\\d{1,2})\\.? (${NorwegianMonths.mkString("|")}) (\\d{4})$$")
  private val InA1 = Pattern.compile("^(a|an) ")
  private val InA2 = Pattern.compile("^in (a|an) ")

  private def instantMicros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Spark's `trim(col)` strips ASCII space (0x20) ONLY — not Java
    * `String.trim`'s ≤0x20 class.
    */
  private def trimSpaces(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** Spark `lower(col)`: ASCII fast path, full-string `toLowerCase`
    * (default locale) otherwise — UTF8String.toLowerCase's exact shape.
    */
  private def lowerLikeSpark(s: String): String = {
    var i = 0; var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) {
      val b = new java.lang.StringBuilder(s.length)
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        j += 1
      }
      b.toString
    } else s.toLowerCase
  }

  private def allDigits(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) { if (s.charAt(i) < '0' || s.charAt(i) > '9') return false; i += 1 }
    true
  }

  private def alphaAt0(s: String): Boolean =
    s.nonEmpty && Character.isLetter(s.charAt(0)) && s.charAt(0) < 0x80

  /** `^\d{1,2} [A-Za-z]` */
  private def dayThenAlpha(s: String): Boolean = {
    if (s.isEmpty || !s.charAt(0).isDigit) return false
    val sp = if (s.length > 1 && s.charAt(1).isDigit) 2 else 1
    s.length > sp + 1 && s.charAt(sp) == ' ' && {
      val c = s.charAt(sp + 1)
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    }
  }

  /** `(Z|[+-]\d{2}:\d{2})$` — the only offset shapes pattern `XXX` accepts. */
  private def hasOffsetSuffix(s: String): Boolean = {
    val n = s.length
    if (n >= 1 && s.charAt(n - 1) == 'Z') return true
    n >= 6 && (s.charAt(n - 6) == '+' || s.charAt(n - 6) == '-') &&
      s.charAt(n - 5).isDigit && s.charAt(n - 4).isDigit &&
      s.charAt(n - 3) == ':' && s.charAt(n - 2).isDigit && s.charAt(n - 1).isDigit
  }

  private def endsAmPm(s: String): Boolean = {
    val n = s.length
    n >= 2 && {
      val c1 = s.charAt(n - 2); val c0 = s.charAt(n - 1)
      (c1 == 'A' || c1 == 'P' || c1 == 'a' || c1 == 'p') && (c0 == 'M' || c0 == 'm')
    }
  }
}
