package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dimension, Quality}

class DimensionQualitySpec extends SparkSpec {
  import spark.implicits._

  // (key, stamp, tracked) change feed with every interesting shape:
  //  k=1: value changes A -> A -> B -> B -> A  (collapse + reopen)
  //  k=2: single version
  //  k=3: NULL -> X -> NULL tracked transitions (null-safe change detect)
  private def feed = Seq(
    (1L, 10L, Some("A")), (1L, 20L, Some("A")), (1L, 30L, Some("B")),
    (1L, 40L, Some("B")), (1L, 50L, Some("A")),
    (2L, 10L, Some("Z")),
    (3L, 10L, None), (3L, 20L, Some("X")), (3L, 30L, None)
  ).toDF("k", "ts", "v")

  test("scd2Build: consecutive-identical collapse, interval chaining, open current row") {
    val out = Dimension.scd2Build(feed, Seq("k"), Seq("ts"), Seq("v"))
      .orderBy("k", "valid_from")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, Some("A"), 10L, Some(30L)),
      (1L, Some("B"), 30L, Some(50L)),
      (1L, Some("A"), 50L, None),
      (2L, Some("Z"), 10L, None),
      (3L, None, 10L, Some(20L)),
      (3L, Some("X"), 20L, Some(30L)),
      (3L, None, 30L, None)))
  }

  test("scd2Apply: apply-then-read == rebuild-then-read at every split point") {
    // Split the fixture feed at every stamp boundary; incremental apply of
    // the tail onto the head's dimension must equal the full rebuild —
    // including splits where the batch's first value repeats the open row's
    // (no spurious version) and splits introducing brand-new keys.
    val full = Dimension.scd2Build(feed, Seq("k"), Seq("ts"), Seq("v"))
      .collect().toSet
    Seq(15L, 25L, 35L, 45L).foreach { split =>
      val dim = Dimension.scd2Build(feed.where(col("ts") < split), Seq("k"), Seq("ts"), Seq("v"))
      val got = Dimension.scd2Apply(dim, feed.where(col("ts") >= split),
        Seq("k"), Seq("ts"), Seq("v")).collect().toSet
      assert(got == full, s"split=$split diverged from the full rebuild")
    }
  }

  test("scd2Apply: randomized apply == rebuild sweep (many keys, repeated values, null tracked)") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 3) {
      val feed = Seq.tabulate(300) { i =>
        (rnd.nextInt(25).toLong, i.toLong * 2, // strictly increasing stamps
          if (rnd.nextInt(5) == 0) None else Some(('A' + rnd.nextInt(3)).toChar.toString))
      }.toDF("k", "ts", "v")
      val full = Dimension.scd2Build(feed, Seq("k"), Seq("ts"), Seq("v")).collect().toSet
      Seq(100L, 300L, 450L).foreach { split =>
        val dim = Dimension.scd2Build(feed.where(col("ts") < split), Seq("k"), Seq("ts"), Seq("v"))
        val got = Dimension.scd2Apply(dim, feed.where(col("ts") >= split),
          Seq("k"), Seq("ts"), Seq("v")).collect().toSet
        assert(got == full, s"trial=$trial split=$split diverged")
      }
    }
  }

  test("scd2Apply: a batch repeating every open value changes nothing") {
    val dim = Dimension.scd2Build(feed, Seq("k"), Seq("ts"), Seq("v"))
    // Echo each key's current value with a later stamp — no versions may
    // appear, no open row may close.
    val echo = Seq((1L, 100L, Some("A")), (2L, 100L, Some("Z")), (3L, 100L, None))
      .toDF("k", "ts", "v")
    val got = Dimension.scd2Apply(dim, echo, Seq("k"), Seq("ts"), Seq("v"))
    assert(got.collect().toSet == dim.collect().toSet)
  }

  test("scd2Build: intervals tile the key's history — each valid_to equals the next valid_from") {
    val out = Dimension.scd2Build(feed, Seq("k"), Seq("ts"), Seq("v"))
    val chained = out.withColumn("next_from",
      lead(col("valid_from"), 1) over
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("valid_from"))
    assert(chained.where(col("valid_to") =!= col("next_from")).isEmpty)
    assert(chained.where(col("valid_to").isNull && col("next_from").isNotNull).isEmpty)
  }

  test("scd2Build consistency: each key's open interval carries the latestByKey value (events sf0.001)") {
    val ev = graft.sources.EventsTable.load(spark, "/root/testdata/sf0.001")
      .select(col("user_id"),
        graft.functions.Conversions.nanosToEpochMs(col("ts")).as("ts_ms"),
        col("event_id"), col("event_type"))
    val current = Dimension.scd2Build(ev, Seq("user_id"), Seq("ts_ms", "event_id"), Seq("event_type"))
      .where(col("valid_to").isNull)
      .select(col("user_id"), col("event_type").as("scd2_type"))
    val latest = operators.Dedup.latestByKey(ev, Seq("user_id"),
      Seq("ts_ms", "event_id"), Seq("event_type"))
      .select(col("user_id"), col("event_type").as("latest_type"))
    // exactly one open interval per key, and it agrees with the SCD-1 view
    assert(current.groupBy("user_id").count().where(col("count") =!= 1).isEmpty)
    assert(current.join(latest, "user_id")
      .where(col("scd2_type") =!= col("latest_type")).isEmpty)
    assert(current.count() == latest.count())
  }

  test("cdcApply: latest delete removes the key, superseded delete does not, delete-only key absent") {
    val cdc = Seq(
      (1L, 10L, "U", "a"), (1L, 20L, "D", "x"),              // delete latest -> gone
      (2L, 10L, "U", "b"), (2L, 20L, "D", "x"), (2L, 30L, "U", "c"), // delete superseded
      (3L, 10L, "D", "x"),                                    // delete-only -> gone
      (4L, 10L, "U", "d")
    ).toDF("k", "ts", "op", "payload")
    val out = Dimension.cdcApply(cdc, Seq("k"), Seq("ts"), Seq("payload"), "op")
      .orderBy("k").as[(Long, Long, String)].collect().toSeq
    assert(out === Seq((2L, 30L, "c"), (4L, 10L, "d")))
    assert(!out.map(_._1).contains(1L) && !out.map(_._1).contains(3L))
  }

  test("Quality.evaluate: each check counts its own violations; duplicated dim pk does not multiply") {
    import Quality.DqCheck._
    val fact = Seq(
      (Some(1L), 1L, 5.0, Some("A")),
      (Some(2L), 2L, -1.0, Some("B")),   // range violation
      (None, 3L, 5.0, Some("A")),        // not-null violation (fk null -> not an fk violation)
      (Some(9L), 4L, 5.0, Some("C")),    // fk violation (9 not in dim) + accepted violation
      (Some(1L), 4L, 11.0, None)         // unique violation (id 4 dup) + range violation (11 > 10)
    ).toDF("fk", "id", "x", "cat")
    // dim pk 1 duplicated on purpose: a naive left join would double fact rows.
    val dim = Seq(1L, 1L, 2L).toDF("pk")
    val out = Quality.evaluate(fact, Seq(
      NotNull("fk"), Unique(Seq("id")), InRange("x", 0.0, 10.0),
      AcceptedValues("cat", Seq("A", "B")), Referential("fk", dim, "pk")))
      .as[(String, Long)].collect().toMap
    assert(out === Map(
      "not_null:fk" -> 1L, "unique:id" -> 1L, "range:x" -> 2L,
      "accepted:cat" -> 1L, "fk:fk" -> 1L))
  }

  test("Quality.evaluate: Unique ignores NULL key tuples (NotNull's job), matching SQL count(DISTINCT)") {
    import Quality.DqCheck._
    val fact = Seq(Some(1L), Some(1L), None, None, Some(2L)).toDF("id")
    val out = Quality.evaluate(fact, Seq(Unique(Seq("id")), NotNull("id")))
      .as[(String, Long)].collect().toMap
    // one real dup (1L twice); the two NULL rows are NotNull violations only
    assert(out === Map("unique:id" -> 1L, "not_null:id" -> 2L))
  }

  test("Quality.evaluate: clean table yields all-zero violations") {
    import Quality.DqCheck._
    val fact = Seq((1L, "A"), (2L, "B")).toDF("id", "cat")
    val out = Quality.evaluate(fact,
      Seq(NotNull("id"), Unique(Seq("id")), AcceptedValues("cat", Seq("A", "B"))))
      .as[(String, Long)].collect().toMap
    assert(out.values.forall(_ == 0L))
  }

  test("linearLogit: left-fold arithmetic exact; sigmoid threshold via logit literal") {
    val d = Seq((1L, 0.1, 0.5), (2L, 1.0, 0.9)).toDF("id", "f1", "f2")
    val logit = Quality.linearLogit(Seq((col("f1"), 2.0), (col("f2"), -1.5)), bias = 0.25)
    val got = d.select(col("id"), logit.as("l")).as[(Long, Double)].collect().toMap
    // exact IEEE fold in declaration order: ((0.25 + f1*2.0) + f2*(-1.5))
    assert(got(1L) == ((0.25 + 0.1 * 2.0) + 0.5 * -1.5)) // -0.3
    assert(got(2L) == ((0.25 + 1.0 * 2.0) + 0.9 * -1.5)) // 0.9
    // keep at p=0.6 == logit > ln(0.6/0.4): row 2 (logit 0.9) only
    val thr = math.log(0.6 / 0.4)
    val kept = d.where(logit > lit(thr)).select("id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("resolveClustersBy: keeps highest-preference member, tie min id, singletons kept") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, 10L), (2L, 99L),  // component 1: 2 wins on prefer
      (5L, 7L), (6L, 7L),    // component 5: tie -> min id 5
      (9L, 1L))              // singleton: kept
      .toDF("doc_id", "score")
    val comp = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("id", "component")
    val kept = Dedup.resolveClustersBy(docs, "doc_id", comp, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 5L, 9L))
    // contrast: blind min-id keep chooses 1 over the higher-scoring 2
    val blind = Dedup.resolveClusters(docs, "doc_id", comp)
      .select("doc_id").as[Long].collect().toSet
    assert(blind == Set(1L, 5L, 9L))
  }

  test("snapshotDiff: add/remove/change statuses; null text is presence, not a phantom") {
    val old = Seq(
      (1L, Some("same")), (2L, Some("will change")), (3L, Some("will vanish")),
      (4L, None: Option[String]), (5L, None: Option[String]))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, Some("same")), (2L, Some("changed")), (6L, Some("brand new")),
      (4L, None: Option[String]),    // null -> null: unchanged, NOT reported
      (5L, Some("text appeared")))   // null -> text: changed
      .toDF("doc_id", "text")
    val out = Dimension.snapshotDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("driftReport: planted skew token heads its group, balanced tokens rank below") {
    // 'common' is uniform across groups (zero divergence); 'LEAK' exists
    // only in group b — maximal divergence there, and its ABSENCE skews
    // group a's 'common' share too (a's topK stays defined via tie-break).
    val d = Seq(
      ("a", "common common common common"),
      ("b", "common common LEAK LEAK"))
      .toDF("source", "text")
    val out = Quality.driftReport(d, "text", "source", topK = 1)
      .select("source", "token", "n_group", "n_corpus", "rank")
      .as[(String, String, Long, Long, Int)].collect().toMap2
    assert(out(("b", "LEAK")) == ((2L, 2L, 1)))
    // group a's biggest divergence is 'common' (4/4 vs 6/8 corpus-wide)
    assert(out(("a", "common")) == ((4L, 6L, 1)))
  }

  test("snapshot-CDC composition: diff-driven versions build the right SCD-2 rows") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dimension
    // snapshots: id 1 unchanged, id 2 changed, id 3 removed, id 4 added
    val snap1 = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val snap2 = Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "text")
    val diff = Dimension.snapshotDiff(snap1, snap2, "id", "text")
    val ev1 = snap1.select(col("id"), lit(1).as("t"), md5(col("text")).as("h"))
    val ev2 = diff.join(snap2, Seq("id"), "left")
      .select(col("id"), lit(2).as("t"),
        when(col("status") === "removed", lit("GONE"))
          .otherwise(md5(col("text"))).as("h"))
    val dim = Dimension.scd2Build(ev1.unionAll(ev2), Seq("id"), Seq("t"), Seq("h"))
      .select("id", "h", "valid_from", "valid_to")
      .as[(Long, String, Int, Option[Int])].collect().toSeq.sortBy(r => (r._1, r._3))
    def h(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      d.map("%02x".format(_)).mkString
    }
    assert(dim == Seq(
      (1L, h("same"), 1, None),          // unchanged: one open version
      (2L, h("old"), 1, Some(2)),        // changed: closed at t=2
      (2L, h("new"), 2, None),
      (3L, h("gone"), 1, Some(2)),       // removed: soft-delete version
      (3L, "GONE", 2, None),
      (4L, h("fresh"), 2, None)))        // added: appears at t=2 only
  }

  implicit private class Map2[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[(A, B), (C, D, E)] =
      rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
  }
}
