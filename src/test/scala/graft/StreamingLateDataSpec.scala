package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-vacuity and equivalence pins for the `st_late_data` gate — the
  * cross-batch late-arrival behavior the round-12 verdict flagged as the
  * one streaming class the board didn't exercise.
  *
  * Three claims, all against the gate's own fixture derivation:
  *  1. the fixture REALLY contains both late classes — held-back rows whose
  *     hour window is still open at the batch-2 watermark (must merge) and
  *     ones whose window is finalized (must drop). A fixture where either
  *     set is empty would let the gate pass vacuously;
  *  2. the streaming output equals the batch replay over exactly the
  *     watermark-admitted subset (the oracle's `keep` predicate);
  *  3. the drops CHANGE the answer vs a naive all-rows aggregation — i.e.
  *     the gate genuinely distinguishes late-beyond-watermark handling.
  */
class StreamingLateDataSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(String, String, Long, Option[Double])] =
    df.collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(math.round(r.getDouble(3) * 100).toDouble / 100))
    }.toSet

  test("fixture has both late classes; stream == watermark-admitted batch != naive batch") {
    val ev = sources.EventsTable.load(spark, dir)
      .select(graft.functions.Conversions.nanosToTimestamp(col("ts")).as("ts"),
        col("event_id"), col("event_type"), col("value"))
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val cut = mn + (mx - mn) * 6 / 10
    val recent = cut - 14400000000L
    val lab = ev.withColumn("_us", unix_micros(col("ts")))
      .withColumn("_late",
        (col("_us") < recent && col("event_id") % 7 === 3) ||
        (col("_us") >= recent && col("_us") < cut && col("event_id") % 3 === 1))
      .localCheckpoint(true) // shared by the class splits and both batch replays
    // The late-event filter watermark: max event time of batch b0 (on-time
    // OLD rows) − 10 min — by the dual-watermark rule it is b0's watermark,
    // aged through the b1 spacer, that judges b2's late arrivals.
    val wm1 = lab.where(!col("_late") && col("_us") < recent)
      .agg(max(col("_us"))).head().getLong(0) - 600000000L
    val wEnd = unix_micros(date_trunc("hour", col("ts"))) + 3600000000L

    // 1. non-vacuity: both late classes present in the fixture
    val late = lab.where(col("_late"))
    val accepted = late.where(wEnd > wm1).count()
    val dropped = late.where(wEnd <= wm1).count()
    assert(accepted > 0, "no late-WITHIN-watermark rows: fixture can't exercise the merge path")
    assert(dropped > 0, "no late-BEYOND-watermark rows: fixture can't exercise the drop path")

    def hourAgg(df: DataFrame): DataFrame = df.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

    // 2. stream ≡ batch over the admitted subset (the oracle's keep rule)
    val streamed = rows(SparkEntry.queries("st_late_data")(spark, dir))
    val admitted = rows(hourAgg(lab.where(!col("_late") || wEnd > wm1)))
    assert(streamed == admitted,
      s"streamed ${streamed.size} rows != admitted-batch ${admitted.size}")

    // 3. the drops are visible: naive all-rows aggregation disagrees
    val naive = rows(hourAgg(ev))
    assert(streamed != naive, "dropping late-beyond-watermark rows changed nothing — vacuous gate")
  }

  /** Shared fixture derivation for the round-14 stateful-twin late gates —
    * identical cut/band/sample arithmetic to the gates themselves.
    */
  private def labeled(): (DataFrame, Long) = {
    val ev = sources.EventsTable.load(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        graft.functions.Conversions.nanosToTimestamp(col("ts")).as("ts"))
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val cut = mn + (mx - mn) * 6 / 10
    val recent = cut - 14400000000L
    val lab = ev.withColumn("_us", unix_micros(col("ts")))
      .withColumn("_late",
        (col("_us") < recent && col("event_id") % 7 === 3) ||
        (col("_us") >= recent && col("_us") < cut && col("event_id") % 3 === 1))
      .localCheckpoint(true)
    val wm1 = lab.where(!col("_late") && col("_us") < recent)
      .agg(max(col("_us"))).head().getLong(0) - 600000000L
    (lab, wm1)
  }

  test("st_sessionize late fixture: both classes present; stream == admitted-subset sessionizer != naive") {
    import org.apache.spark.sql.expressions.Window
    val (lab, wm1) = labeled()
    // fMGWS event-time-timeout late filter judges the RAW event time.
    val late = lab.where(col("_late"))
    assert(late.where(col("_us") > wm1).count() > 0,
      "no late-within rows: the cross-batch session-merge path is unexercised")
    assert(late.where(col("_us") <= wm1).count() > 0,
      "no late-beyond rows: the fMGWS drop path is unexercised")

    def sessionize(df: DataFrame): Set[(Long, Long, Long, Long)] = {
      val w = Window.partitionBy("user_id").orderBy("t")
      df.select(col("user_id"), (col("_us") / 1000L).cast("long").as("t"))
        .withColumn("_prev", lag("t", 1).over(w))
        .withColumn("_brk",
          when(col("_prev").isNull || col("t") - col("_prev") > 21600000L, 1).otherwise(0))
        .withColumn("_sid", sum("_brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "_sid")
        .agg(min("t").as("s"), max("t").as("e"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    }
    val streamed = SparkEntry.queries("st_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val admitted = sessionize(lab.where(!col("_late") || col("_us") > wm1))
    assert(streamed == admitted,
      s"streamed ${streamed.size} sessions != admitted-subset ${admitted.size}")
    val naive = sessionize(lab)
    assert(streamed != naive, "session drops changed nothing — vacuous late fixture")
  }

  test("st_sliding_counts late fixture: per-copy drop classes present; stream == admitted expansion != naive") {
    val (lab, wm1) = labeled()
    // The sliding agg judges each EXPANDED (event, hop-window) copy by its
    // own window end — one copy of a late row can merge while the other drops.
    val ex = lab.select(col("event_type"), col("_late"),
        explode(array(date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"),
          date_trunc("hour", col("ts")))).as("ws"))
      .withColumn("_wend", unix_micros(col("ws")) + 7200000000L)
      .localCheckpoint(true)
    val lateCopies = ex.where(col("_late"))
    assert(lateCopies.where(col("_wend") > wm1).count() > 0, "no late-within window copies")
    assert(lateCopies.where(col("_wend") <= wm1).count() > 0, "no late-beyond window copies")

    def agg(df: DataFrame): Set[(String, String, Long)] = df.groupBy(
        date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamed = SparkEntry.queries("st_sliding_counts")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val admitted = agg(ex.where(!col("_late") || col("_wend") > wm1))
    assert(streamed == admitted,
      s"streamed ${streamed.size} window rows != admitted expansion ${admitted.size}")
    val naive = agg(ex)
    assert(streamed != naive, "sliding drops changed nothing — vacuous late fixture")
  }
}
