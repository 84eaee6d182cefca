package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over right-censored durations —
  * time-to-conversion, time-to-churn, time-to-first-error: the standard
  * estimator for "how long until X, given that many subjects never reached
  * X inside the observation window".
  */
object Survival {

  /** KM curve from per-subject durations.
    *
    * Input: one row per subject with `durationCol` (integer time buckets,
    * e.g. days) and `eventCol` (1 = the event happened at that duration,
    * 0 = right-censored there). Output: one row per duration bucket WITH
    * events — `(t, n_risk, n_events, survival)` where
    * `S(t) = Π_{t_j ≤ t} (1 − d_j / n_j)` and censored-at-t subjects count
    * as still at risk at t (the standard convention).
    *
    * Scale shape: subjects aggregate to the DURATION-BUCKET frame in one
    * keyed exchange — everything after (at-risk suffix counts, the running
    * log-sum product) is a window over a frame bounded by the observation
    * window's bucket count (days, not subjects), so the curve math is
    * effectively free at any corpus size. The product is computed as
    * `exp(Σ ln(1 − d/n))` in bucket order, rounded at the output boundary
    * — replayable by any engine with the same window order.
    */
  def kaplanMeier(
      subjects: DataFrame,
      durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = subjects
      .groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
    val total = subjects.agg(count(lit(1)).as("n_total"))
    val wBefore = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
      // A bucket where EVERY remaining at-risk subject has its event drives
      // the factor to exactly zero — ln would blow up, so the zero is
      // tracked as a flag and the curve is pinned to 0.0 from there on.
      .withColumn("lnterm",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("zeroed",
        max(when(col("d") >= col("n_risk") && col("d") > 0, 1).otherwise(0)).over(wUpTo))
      .withColumn("survival",
        when(col("zeroed") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("lnterm")).over(wUpTo)), 6)))
      .where(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("n_events"), col("survival"))
  }

  /** Time-to-conversion subject table from an event stream: duration (in
    * `bucketMs` units) from each subject's first `startType` to its first
    * `endType` strictly after it; subjects that never convert are censored
    * at `censorTs` (normally the corpus max timestamp). Events with no
    * `startType` occurrence do not enter the study.
    *
    * Two subject-keyed aggregations + one join — the [[EventAnalytics]]
    * conditional-min discipline.
    */
  def durations(
      events: DataFrame,
      subjectCol: String,
      typeCol: String,
      tsCol: String,
      startType: String,
      endType: String,
      bucketMs: Long,
      censorTs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val starts = events.where(col(typeCol) === startType)
      .groupBy(col(subjectCol).as("subj")).agg(min(col(tsCol)).as("t0"))
    val ends = events.where(col(typeCol) === endType)
      .select(col(subjectCol).as("esubj"), col(tsCol).as("t1"))
    // The `t1 > t0` condition lives in the JOIN, not a post-filter: a
    // subject whose end-events all precede its start must come out
    // CENSORED (null t1), not vanish from the study.
    starts.join(ends, col("subj") === col("esubj") && col("t1") > col("t0"), "left")
      .groupBy(col("subj"), col("t0"))
      .agg(min(col("t1")).as("t1"))
      .select(col("subj"),
        when(col("t1").isNotNull,
          floor((col("t1") - col("t0")) / lit(bucketMs)))
          .otherwise(floor((lit(censorTs) - col("t0")) / lit(bucketMs)))
          .cast("long").as("duration"),
        col("t1").isNotNull.cast("int").as("converted"))
  }
}
