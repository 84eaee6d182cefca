package graft

import org.apache.spark.sql.functions._

import graft.functions.Conversions

class ConversionsSpec extends SparkSpec {
  import spark.implicits._

  test("nanosToEpochMs floors exactly, incl. above 2^53 and negatives") {
    val ns = Seq(
      1704067798778549829L, // 2024 — above double's exact range
      1704067798778999999L,
      -1L,                  // pre-1970: floor, not truncate-toward-zero
      -999999L,
      0L, 999999L, 1000000L)
    val got = ns.toDF("ns").select(Conversions.nanosToEpochMs(col("ns"))).as[Long].collect()
    val want = ns.map(n => Math.floorDiv(n, 1000000L))
    assert(got.toSeq == want)
  }

  test("nanosToEpochMs matches floorDiv for random longs (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val ns = Seq.fill(200)(rnd.nextLong() / 2)
    val got = ns.toDF("ns").select(Conversions.nanosToEpochMs(col("ns"))).as[Long].collect()
    assert(got.toSeq == ns.map(n => Math.floorDiv(n, 1000000L)))
  }

  test("strCode: DVH code standard parity") {
    val cases = Seq(
      ("blå himmel", "BLAA_HIMMEL"),
      ("  padded  words ", "PADDED_WORDS"),
      ("æøå", "AOAA"),
      ("a-b.c!d", "ABCD"),
      ("", "UKJENT"),
      ("   ", "UKJENT"),
      ("!!!", "UKJENT"),
      (null, "UKJENT"),
      ("already_OK_123", "ALREADY_OK_123"),
      // Python str.split() splits on UNICODE whitespace: NBSP, NEL, figure
      // space, narrow NBSP and LINE SEPARATOR are all word breaks upstream.
      ("a b", "A_B"),
      ("ab", "A_B"),
      ("a b", "A_B"),
      ("a b", "A_B"),
      ("a b", "A_B"),
      ("  ", "UKJENT"))
    val got = cases.map(_._1).toDF("s").select(Conversions.strCode(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("StrCode expression == builtin chain on adversarial random strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab C_9.!-æøåÆØÅß \t\n  èÉ§\u00A0\u0085\u2007\u202F\u2028\u3000" // ws runs (incl. unicode ws), 1:N uppercase
    val inputs = Seq("", " ", "  \t ", null, "æ ø å", "__", "ß sharp") ++
      Seq.fill(300)(Seq.fill(rnd.nextInt(24))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = inputs.toDF("s")
    val got = df.select(Conversions.strCode(col("s")), Conversions.strCodeBuiltins(col("s")))
      .as[(String, String)].collect()
    got.zip(inputs).foreach { case ((custom, builtin), in) =>
      assert(custom == builtin, s"mismatch for input ${Option(in).map(_.map(_.toInt))}")
    }
  }

  test("lenientDateOslo: format ladder incl. offsets; garbage -> null") {
    val got = Seq(
      "2024-06-15T12:00:00",        // naive -> UTC -> Oslo +2 (CEST)
      "2024-01-15T12:00:00+01:00",  // offset-bearing: instant 11:00Z -> Oslo 12:00
      "2024-01-15",
      "15.01.2024",
      "15-01-2024 12:00:00",        // dd-MM-yyyy with time
      "15/01/2024 01:30 PM",        // 12-hour clock, PM
      "2024-01-15 12:00:00 AM",     // 12 AM = midnight
      "Jan 15, 2024 11:59 PM",      // month-name + 12-hour clock
      "1705320000",                 // epoch seconds in string: 2024-01-15 12:00Z
      "1705320000000",              // epoch millis in string: same instant
      "17053200001",                // 11 digits: ambiguous -> null
      "nonsense")
      .toDF("s")
      .select(date_format(Conversions.lenientDateOslo(col("s")), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2024-06-15 14:00:00",
      "2024-01-15 12:00:00",
      "2024-01-15 01:00:00",
      "2024-01-15 01:00:00",
      "2024-01-15 13:00:00",
      "2024-01-15 14:30:00",
      "2024-01-15 01:00:00",
      "2024-01-16 00:59:00",
      "2024-01-15 13:00:00",
      "2024-01-15 13:00:00",
      null,
      null))
  }

  test("nfcNormalize: composed/decomposed merge, ASCII no-op, null passthrough") {
    val rows = Seq(
      ("e\u0301", "\u00E9"),            // decomposed -> composed
      ("a\u030Ab", "\u00E5b"),          // mid-string combining mark
      ("\u00E9", "\u00E9"),             // already composed: unchanged
      ("plain ascii", "plain ascii"),   // fast path
      (null, null))
      .toDF("s", "want")
    val got = rows.select(Conversions.nfcNormalize(col("s")).as("g"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, want) => assert(g == want) }
    // length collapses where a merge happened
    val lens = Seq("e\u0301").toDF("s")
      .select(length(col("s")), length(Conversions.nfcNormalize(col("s"))))
      .as[(Int, Int)].head()
    assert(lens == ((2, 1)))
    // matches java.text.Normalizer on arbitrary strings (interpreted eval
    // and codegen path both route through the same impl)
    val samples = Seq("A\u030A\u0301mixed", "x\u0308\u0301y", "", "\u212B")
    val sparkOut = samples.toDF("s").select(Conversions.nfcNormalize(col("s"))).as[String].collect()
    val javaOut = samples.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(sparkOut.toSeq == javaOut)
  }

  test("lenientDateOslo: Norwegian month-name dates") {
    val got = Seq(
      "2. januar 2024",     // dotted day
      "15 mars 2023",       // no dot
      "1. DESEMBER 2022",   // case-insensitive
      "31. desember 2024",
      "15 January 2024",    // English name: handled by the MMMM rung, not this one
      "32. januar 2024")    // invalid day -> null
      .toDF("s")
      .select(date_format(Conversions.lenientDateOslo(col("s")), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2024-01-02 01:00:00",
      "2023-03-15 01:00:00",
      "2022-12-01 01:00:00",
      "2024-12-31 01:00:00",
      "2024-01-15 01:00:00",
      null))
  }

  test("lenientDateOslo: relative forms anchored to the batch time") {
    // anchor 2024-06-01 12:00:00 UTC -> Oslo wall clock 14:00 (CEST)
    val anchor = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val got = Seq(
      "now", "today", "YESTERDAY", "tomorrow",
      "2 days ago", "1 day ago", "3 hours ago", "90 minutes ago", "2 weeks ago",
      "in 3 hours", "in 1 day",
      "2024-01-15",        // fixed ladder still wins for absolute dates
      "5 fortnights ago")  // unsupported unit -> null
      .toDF("s")
      .select(date_format(
        Conversions.lenientDateOslo(col("s"), Some(lit(anchor))), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2024-06-01 14:00:00", "2024-06-01 14:00:00", "2024-05-31 14:00:00", "2024-06-02 14:00:00",
      "2024-05-30 14:00:00", "2024-05-31 14:00:00", "2024-06-01 11:00:00", "2024-06-01 12:30:00", "2024-05-18 14:00:00",
      "2024-06-01 17:00:00", "2024-06-02 14:00:00",
      "2024-01-15 01:00:00",
      null))
    // without an anchor the relative forms are unparseable -> null
    val noAnchor = Seq("yesterday").toDF("s")
      .select(Conversions.lenientDateOslo(col("s"))).as[java.sql.Timestamp].collect()
    assert(noAnchor.head == null)
  }

  test("lenientDateOslo: Norwegian weekday prefix, Norwegian relatives, compound relatives") {
    val anchor = java.sql.Timestamp.valueOf("2024-06-01 12:00:00") // UTC, a Saturday
    val got = Seq(
      "mandag 1. januar 2024",   // weekday-led Norwegian date (token stripped)
      "Lørdag 15. juni 2024",    // case-insensitive, comma-less
      "i går", "i morgen", "nå", // Norwegian day words
      "for 2 dager siden",       // "2 days ago"
      "om 3 timer",              // "in 3 hours"
      "for 3 måneder siden",     // calendar months
      "om 1 år",                 // calendar year
      "for 2 uker siden",        // weeks (seconds arithmetic)
      // compound: shift, then the weekday of the shifted base's ISO week
      "2 weeks ago tuesday",     // base Sat 2024-05-18 -> Tue 2024-05-14 00:00 UTC
      "1 day ago sunday",        // base Fri 2024-05-31 -> Sun 2024-06-02 00:00 UTC
      "3 months ago monday",     // calendar base Fri 2024-03-01 -> Mon 2024-02-26
      "for 2 fjortendager siden") // unsupported unit -> null
      .toDF("s")
      .select(date_format(
        Conversions.lenientDateOslo(col("s"), Some(lit(anchor))), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2024-01-01 01:00:00",
      "2024-06-15 02:00:00",
      "2024-05-31 14:00:00", "2024-06-02 14:00:00", "2024-06-01 14:00:00",
      "2024-05-30 14:00:00",
      "2024-06-01 17:00:00",
      "2024-03-01 13:00:00",
      "2025-06-01 14:00:00",
      "2024-05-18 14:00:00",
      "2024-05-14 02:00:00",
      "2024-06-02 02:00:00",
      "2024-02-26 01:00:00",
      null))
  }

  test("lenientDateOslo: calendar-unit relatives, article forms, month-day without year") {
    val anchor = java.sql.Timestamp.valueOf("2024-06-01 12:00:00") // UTC anchor
    val got = Seq(
      "3 months ago",   // calendar arithmetic: 2024-03-01 12:00 UTC
      "in 2 months",    // 2024-08-01 12:00 UTC
      "1 year ago",     // 2023-06-01 12:00 UTC
      "a week ago",     // article -> 1: 2024-05-25 12:00 UTC
      "in an hour",     // 2024-06-01 13:00 UTC
      "June 15",        // year from anchor, time 00:00 UTC
      "15 june",        // day-first, case-insensitive
      "Dec 31",         // abbreviated month
      "last tuesday")   // weekday anchoring is settings-dependent -> NULL by design
      .toDF("s")
      .select(date_format(
        Conversions.lenientDateOslo(col("s"), Some(lit(anchor))), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq(
      "2024-03-01 13:00:00", // CET +1
      "2024-08-01 14:00:00", // CEST +2
      "2023-06-01 14:00:00",
      "2024-05-25 14:00:00",
      "2024-06-01 15:00:00",
      "2024-06-15 02:00:00",
      "2024-06-15 02:00:00",
      "2024-12-31 01:00:00",
      null))
    // month-end clamp: relativedelta semantics (May 31 - 3 months = Feb 29)
    val clamp = Seq("3 months ago").toDF("s")
      .select(date_format(Conversions.lenientDateOslo(col("s"),
        Some(lit(java.sql.Timestamp.valueOf("2024-05-31 12:00:00")))), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(clamp == "2024-02-29 13:00:00")
    // sub-second anchor: calendar-unit shifts keep fractional seconds
    // (relativedelta moves only the date) — both relative families agree
    val subSec = Seq("2 months ago", "3 hours ago").toDF("s")
      .select(date_format(Conversions.lenientDateOslo(col("s"),
        Some(lit(java.sql.Timestamp.valueOf("2024-06-01 12:00:00.123456")))),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].collect()
    assert(subSec.toSeq == Seq(
      "2024-04-01 14:00:00.123456",  // calendar branch keeps micros (CEST)
      "2024-06-01 11:00:00.123456")) // seconds branch keeps micros
  }

  test("unix seconds/millis to Oslo wall clock across DST boundary") {
    // 2024-03-31 00:30Z is CET (+1); 01:30Z is after the 01:00Z spring jump (+2)
    val got = Seq(1711845000L, 1711848600L)
      .toDF("s")
      .select(date_format(Conversions.unixSecondsOslo(col("s")), "yyyy-MM-dd HH:mm:ss"))
      .as[String].collect()
    assert(got.toSeq == Seq("2024-03-31 01:30:00", "2024-03-31 03:30:00"))
  }

  test("bigEndianLongKey decodes 8-byte big-endian ids") {
    val got = Seq(13L, 0L, 123456789012L)
      .toDF("id")
      .select(Conversions.bigEndianLongKey(unhex(lpad(hex(col("id")), 16, "0"))))
      .as[String].collect()
    assert(got.toSeq == Seq("13", "0", "123456789012"))
  }

  test("schemaId reads big-endian uint32 at bytes 2-5") {
    val wire = Array[Byte](0, 0, 0, 1, 5) ++ "datum".getBytes("UTF-8")
    val got = Seq(wire).toDF("v").select(Conversions.schemaId(col("v"))).as[Int].head()
    assert(got == (1 << 8 | 5)) // 0x00000105
  }

  test("jsonQuote matches JSON string escaping") {
    val got = Seq("""{"k": 87}""", "a\"b\\c", null)
      .toDF("s").select(Conversions.jsonQuote(col("s"))).as[String].collect()
    assert(got.toSeq == Seq("\"{\\\"k\\\": 87}\"", "\"a\\\"b\\\\c\"", null))
  }
}
