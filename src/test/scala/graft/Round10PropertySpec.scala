package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.window.WindowExec

import graft.operators.{Collocations, Dedup, EventAnalytics, TfIdf}

/** Round-10 regression pins: the exact-distributed-ntile rewrite (RFM),
  * TopKAgg replacements for the global rank windows (BM25, PMI), the
  * lineDedup NULL-membership contract, the prefix-filter/strict-threshold
  * pairing, the ewmaAnomaly unbounded-broadcast removal, and the
  * peakConcurrency day-label timezone independence.
  */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Every WindowExec in the executed plan must carry a partition spec —
    * an empty one is the single-task global sort these rewrites remove.
    */
  private def assertNoUnpartitionedWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned WindowExec in plan:\n${bad.mkString("\n")}")
  }

  test("withExactNtile ≡ ntile window: random frames, ties, both directions, n ∈ {3,5,7}") {
    val rng = new scala.util.Random(10101)
    for (trial <- 0 until 6) {
      val nRows = Seq(3, 17, 100, 257, 4, 999)(trial) // incl. total < n
      val n = Seq(5, 3, 7, 5, 5, 5)(trial)
      // Heavy tie plateaus on purpose: values drawn from a tiny domain.
      val rows = (0 until nRows).map { i =>
        (f"u$i%04d", rng.nextInt(4).toLong, rng.nextInt(3) * 0.5)
      }
      val df = rows.toDF("uid", "v_long", "v_dbl")
      for ((vc, desc) <- Seq(("v_long", false), ("v_long", true), ("v_dbl", false))) {
        val got = EventAnalytics.withExactNtile(df, vc, desc, "uid", "nt", n,
          rangeBuckets = 4) // few buckets → exercises offsets across buckets
          .select("uid", "nt").as[(String, Int)].collect().toMap
        val ord = if (desc) col(vc).desc else col(vc).asc
        val want = df.select(col("uid"),
          ntile(n).over(Window.orderBy(ord, col("uid"))).as("nt"))
          .as[(String, Int)].collect().toMap
        assert(got == want, s"trial=$trial vc=$vc desc=$desc")
      }
    }
  }

  test("rfm plan has no unpartitioned WindowExec and matches the ntile formulation") {
    val rng = new scala.util.Random(7)
    val ev = (0 until 400).map { i =>
      val u = f"u${rng.nextInt(60)}%03d"
      val t = java.sql.Timestamp.valueOf(f"2024-01-${1 + rng.nextInt(28)}%02d 10:00:00")
      (u, if (i % 3 == 0) "purchase" else "view", t, rng.nextInt(50) / 2.0)
    }.toDF("user_id", "event_type", "t", "value")
    val got = EventAnalytics.rfm(ev, "user_id", "event_type", "t", "value", "purchase")
    assertNoUnpartitionedWindow(got)
    // Independent ntile-window replay (the oracle's formulation).
    val conv = ev.where(col("event_type") === "purchase")
    val pu = conv.groupBy(col("user_id")).agg(
      max(to_date(col("t"))).as("last_day"),
      count(lit(1)).as("frequency"),
      round(sum(col("value")), 6).as("monetary"))
    val ref = conv.agg(max(to_date(col("t"))).as("ref"))
    val sc = pu.crossJoin(ref)
      .withColumn("recency_days", datediff(col("ref"), col("last_day")))
    val want = sc.select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
      ntile(5).over(Window.orderBy(col("recency_days").desc, col("user_id"))).as("r"),
      ntile(5).over(Window.orderBy(col("frequency"), col("user_id"))).as("f"),
      ntile(5).over(Window.orderBy(col("monetary"), col("user_id"))).as("m"))
    val g = got.select("user_id", "r", "f", "m").as[(String, Int, Int, Int)].collect().sortBy(_._1)
    val w = want.select("user_id", "r", "f", "m").as[(String, Int, Int, Int)].collect().sortBy(_._1)
    assert(g.toSeq == w.toSeq)
  }

  test("bm25 and pmiBigrams plans carry no WindowExec at all (TopKAgg rank)") {
    val docs = Seq(
      ("d1", "spark scala engine spark"),
      ("d2", "spark query engine"),
      ("d3", "scala spark spark engine query plan"),
      ("d4", "plan plan plan")).toDF("doc_id", "text")
    val bm = TfIdf.bm25(docs, "doc_id", "text", Seq("spark", "plan"), topK = 3)
    val pmi = Collocations.pmiBigrams(docs, "text", minCount = 1L, topK = 5)
    for (df <- Seq(bm, pmi)) {
      val ws = df.queryExecution.executedPlan.collect { case w: WindowExec => w }
      assert(ws.isEmpty, s"WindowExec survived the TopKAgg rewrite:\n${ws.mkString("\n")}")
    }
    // Rank order/values unchanged vs the window formulation: best-first,
    // ties broken by id / (w1, w2).
    val bmRows = bm.collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    assert(bmRows.map(_._2) == (1 to bmRows.size), s"ranks not dense: $bmRows")
    val pmiRows = pmi.select("w1", "w2", "pmi", "rank")
      .as[(String, String, Double, Int)].collect().toSeq
    assert(pmiRows.map(_._4) == (1 to pmiRows.size))
    assert(pmiRows.sortBy(r => (-r._3, r._1, r._2)) == pmiRows,
      "PMI output not in (pmi desc, w1, w2) order")
  }

  test("lineDedup and lineDedupIncremental: NULL-text docs survive as empty rows") {
    val docs = Seq(
      ("a", "shared line\nunique a"),
      ("b", "shared line\nunique b"),
      ("c", null.asInstanceOf[String]),
      ("d", "")).toDF("doc_id", "text")
    val full = Dedup.lineDedup(docs, "doc_id", "text", minDf = 2)
      .as[(String, String, Long, Long)].collect().sortBy(_._1)
    assert(full.map(_._1).toSeq == Seq("a", "b", "c", "d"),
      s"corpus membership changed: ${full.map(_._1).mkString(",")}")
    val byId = full.map(r => r._1 -> r).toMap
    assert(byId("c")._2 == "" && byId("c")._3 == 1L) // one (empty) line kept
    assert(byId("a")._2 == "unique a" && byId("a")._4 == 1L)
    val idx = Dedup.lineIndex(docs.where(col("doc_id") === "a"), "doc_id", "text")
    val incr = Dedup.lineDedupIncremental(idx,
      docs.where(col("doc_id").isin("b", "c")), "doc_id", "text", minDf = 2)
      .as[(String, String, Long, Long)].collect().sortBy(_._1)
    assert(incr.map(_._1).toSeq == Seq("b", "c"))
    assert(incr.find(_._1 == "c").get._2 == "")
    assert(incr.find(_._1 == "b").get._2 == "unique b")
  }

  test("jaccardPairsPrefix ≡ jaccardPairs on integral-t·size corpora (strict-filter pairing)") {
    // The prefix length `size − floor(t·size)` is complete ONLY for the
    // strict `jaccard > t` final filter (required overlap ⌊t·|A|⌋+1). The
    // adversarial corpus here makes t·size integral for every doc (t = 0.5,
    // even shingle counts), where an off-by-one in either half of the
    // pairing would silently drop qualifying pairs.
    val rng = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")
    val docs = (0 until 40).map { i =>
      // 2·k tokens → even distinct-shingle counts dominate (unigram shingles)
      val k = 2 + rng.nextInt(4)
      val toks = (0 until 2 * k).map(_ => vocab(rng.nextInt(vocab.size)))
      (f"d$i%02d", toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.25)) {
      val plain = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1, threshold = t)
        .as[(String, String, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      val prefix = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 1, threshold = t)
        .as[(String, String, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(prefix == plain, s"t=$t: prefix-filtered pairs diverge from plain")
    }
  }

  test("BpeTrain batched rounds ≡ forced-sequential greedy; rounds measurably cut") {
    val rng = new scala.util.Random(1234)
    // Zipf-ish synthetic corpus: skewed word draws over a small alphabet so
    // merge candidates are plentiful and frequently symbol-disjoint.
    val words = Vector("the", "think", "than", "song", "songs", "ring",
      "rings", "blink", "stone", "stones", "tone", "honk", "shrink", "go")
    val docs = (0 until 120).map { _ =>
      val n = 4 + rng.nextInt(10)
      (0 until n).map(_ => words(math.min(rng.nextInt(14), rng.nextInt(14))))
        .mkString(" ")
    }.toDF("text")
    val seq = operators.BpeTrain.learnMerges(docs, "text", 40, batchSize = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    val seqRounds = operators.BpeTrain.lastRounds.get()
    val bat = operators.BpeTrain.learnMerges(docs, "text", 40, batchSize = 16)
      .as[(Int, String, String, Long)].collect().toSeq
    val batRounds = operators.BpeTrain.lastRounds.get()
    assert(bat == seq, "batched merge list diverged from sequential greedy")
    assert(seqRounds == seq.size)
    assert(batRounds < seqRounds,
      s"batching produced no round reduction ($batRounds vs $seqRounds)")
  }

  test("ewmaAnomaly carries no broadcast hint (stats frame is unbounded-cardinality)") {
    val ev = (0 until 50).map(i => (s"e${i % 5}", i.toLong, i.toLong * 1000, i * 1.5))
      .toDF("entity", "id", "t", "v")
    val got = EventAnalytics.ewmaAnomaly(ev, "entity", "id", "t", "v")
    val hints = got.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, s"broadcast hint on unbounded frame: $hints")
    assert(got.count() > 0)
  }

  test("native LenientDate ≡ builtin ladder: every rung + fuzz, with and without anchor") {
    import graft.functions.Conversions
    val rng = new scala.util.Random(77)
    val months = Conversions.norwegianMonths
    val days = Conversions.norwegianDays
    val enDays = Conversions.englishDays
    def pad(n: Int) = f"$n%02d"
    val shaped = (0 until 400).flatMap { i =>
      val y = 2020 + rng.nextInt(6); val mo = 1 + rng.nextInt(12); val d = 1 + rng.nextInt(28)
      val hh = rng.nextInt(24); val mi = rng.nextInt(60); val ss = rng.nextInt(60)
      val iso = s"$y-${pad(mo)}-${pad(d)}"
      val tpart = s"${pad(hh)}:${pad(mi)}:${pad(ss)}"
      Seq(
        iso, s"${iso}T$tpart", s"$iso $tpart", s"${iso}T$tpart+02:00",
        s"${iso}T$tpart.123Z", s"${iso}T$tpart.123456+05:30",
        s"$iso $tpart.999", s"$y/${pad(mo)}/${pad(d)}",
        s"${pad(d)}.${pad(mo)}.$y", s"${pad(d)}.${pad(mo)}.$y $tpart",
        s"${pad(d)}/${pad(mo)}/$y", s"${pad(d)}/${pad(mo)}/$y $tpart",
        s"${pad(d)}-${pad(mo)}-$y", s"${pad(d)}-${pad(mo)}-$y $tpart",
        s"$iso ${pad(1 + rng.nextInt(12))}:${pad(mi)} ${if (rng.nextBoolean()) "AM" else "PM"}",
        s"${pad(d)}/${pad(mo)}/$y ${pad(1 + rng.nextInt(12))}:${pad(mi)} PM",
        s"Jan $d, $y ${pad(1 + rng.nextInt(12))}:${pad(mi)} AM",
        s"$d Mar $y", s"$d March $y", s"Feb ${pad(d)} $y", s"February ${pad(d)}, $y",
        s"$y${pad(mo)}${pad(d)}",
        (1000000000L + rng.nextInt(1000000000)).toString, // 10-digit epoch s
        (1500000000000L + rng.nextInt(1000000000)).toString, // 13-digit epoch ms
        s"$d. ${months(mo - 1)} $y", s"$d ${months(mo - 1)} $y",
        s"${days(rng.nextInt(7))} $d. ${months(mo - 1)} $y",
        s"${days(rng.nextInt(7))}, $d. ${months(mo - 1)} $y",
        "yesterday", "tomorrow", "now", "today", "i går", "i dag", "i morgen", "nå",
        s"${1 + rng.nextInt(2000)} days ago", s"in ${1 + rng.nextInt(90)} hours",
        s"${1 + rng.nextInt(50)} weeks ago", s"${1 + rng.nextInt(48)} months ago",
        s"in ${1 + rng.nextInt(20)} years", "a week ago", "an hour ago",
        "in a day", "in an hour", "1 second ago", "in 59 minutes",
        s"for ${1 + rng.nextInt(100)} dager siden", s"om ${1 + rng.nextInt(10)} timer",
        s"for ${1 + rng.nextInt(10)} måneder siden", s"om ${1 + rng.nextInt(5)} år",
        s"for ${1 + rng.nextInt(9)} uker siden",
        s"${1 + rng.nextInt(8)} weeks ago ${enDays(rng.nextInt(7))}",
        s"${1 + rng.nextInt(14)} months ago ${enDays(rng.nextInt(7))}",
        "June 15", "june 15", "15 june", "3 October", "October 3",
        "absolutely not a date", "", "   ", "32. januar 2024", "99 foobars ago",
        "2024-13-45", "junk 123", "11111111111", // 11-digit: deliberately unparsed
        s"  $iso  ", s" ${iso}T$tpart ", "A June 15", "An hour ago xx"
      )
    } ++ Seq(null)
    val df = shaped.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      .repartition(4).localCheckpoint(true)
    // Anchors chosen to cross DST folds and month-end clamping.
    val anchors = Seq("2024-06-01 12:00:00", "2024-03-31 01:30:00",
      "2023-10-29 02:30:00", "2024-05-31 23:59:59")
    for (anc <- anchors; withAnchor <- Seq(true, false)) {
      val aOpt = if (withAnchor) Some(lit(java.sql.Timestamp.valueOf(anc))) else None
      val got = df.select(col("id"), Conversions.lenientDateOslo(col("s"), aOpt).as("t"))
      val want = df.select(col("id"), Conversions.lenientDateOsloBuiltins(col("s"), aOpt).as("t"))
      val diff = got.join(want, "id")
        .where(!(got("t") <=> want("t")))
      val bad = diff.join(df, "id").select(col("s"), col("id")).limit(5).collect()
      assert(bad.isEmpty,
        s"anchor=$anc withAnchor=$withAnchor diverged on: ${bad.mkString("; ")}")
    }
  }

  test("peakConcurrency day labels are session-timezone independent") {
    // Interval crossing UTC midnight; under +05:30 the straddling hour
    // bucket used to be labeled with the LOCAL day.
    val DAY = 86400000L
    // The IST leg runs on an ISOLATED newSession() (own SessionState/conf,
    // shared SparkContext): mutating the shared session's TZ races every
    // TZ-sensitive suite under sbt's parallel execution.
    def run(s: org.apache.spark.sql.SparkSession): Seq[(String, Long)] = {
      val sq = s.sqlContext
      import sq.implicits._
      val ev = Seq(
        DAY * 100 + 23 * 3600000L + 1800000L, // 23:30 UTC day 100
        DAY * 100 + 23 * 3600000L + 2400000L, // 23:40 UTC day 100
        DAY * 101 + 600000L // 00:10 UTC day 101
      ).toDF("t")
      EventAnalytics.peakConcurrency(ev, "t", lit(3600000L))
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    }
    val utc = run(spark)
    val ist = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      run(s2)
    }
    assert(utc == ist, s"day attribution drifted with session TZ: utc=$utc ist=$ist")
    assert(utc.map(_._1) == Seq("1970-04-11", "1970-04-12"))
  }
}
