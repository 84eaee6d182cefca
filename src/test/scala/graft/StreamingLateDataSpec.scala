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
}
