package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic event-stream analytics — ordered funnels and cohort retention —
  * expressed as keyed relational plans that hold up at 100 TB.
  *
  * Both operators share one design rule: the wide `events` scan is projected
  * down to the 2–3 columns the analysis needs BEFORE any shuffle, and every
  * subsequent exchange is keyed on the entity (`user`) so the per-key state
  * is O(1) — no per-user event arrays, no `collect_list`, no window over an
  * unpartitioned frame. The alternative one-shuffle formulation
  * (`sort_array(collect_list(...))` + a fold) carries every event of a user
  * in one aggregation buffer, which a hot entity (bot traffic, a service
  * account) turns into a single-task OOM at scale; the conditional-min join
  * chain used here never materializes more than one timestamp per user per
  * stage.
  */
object EventAnalytics {

  /** Strict-order funnel: how many users reached stage k, where stage k
    * counts only if it happened strictly AFTER that user's qualifying
    * stage-(k-1) time (the standard "view → click → purchase" semantics —
    * a purchase before the first view does not convert).
    *
    * Plan shape: one slim projection of the events scan filtered to funnel
    * stages (persisted — at 100 TB the funnel events are a small fraction
    * of the raw stream and each stage iteration re-reads the slim frame,
    * not the scan), then per stage one `groupBy(user).min(ts)` plus one
    * user-keyed join against the previous stage's times. Every exchange
    * hashes on `user`, so AQE coalesces them onto one partitioning and the
    * joins never re-shuffle the smaller (per-user, single-row) side beyond
    * its own aggregation. Per-stage frontier frames are one row per
    * surviving user — monotonically shrinking.
    *
    * Output: `(stage_idx, stage, users)` with `users` non-increasing in
    * `stage_idx` by construction.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._

    val slim = events
      .where(col(typeCol).isin(stages.map(s => s: Any): _*))
      .select(col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
      .persist()

    // frontier: one row per user who has completed stages 0..k, carrying the
    // earliest completion time of stage k under the strict-order constraint.
    var frontier = slim.where(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("t")).as("ft"))
    var counts = Vector(frontier.count())
    stages.tail.foreach { st =>
      frontier = slim.where(col("et") === st)
        .join(frontier, "u")
        .where(col("t") > col("ft"))
        .groupBy(col("u")).agg(min(col("t")).as("ft"))
      counts :+= frontier.count()
    }
    slim.unpersist()
    stages.zipWithIndex
      .map { case (st, i) => (i, st, counts(i)) }
      .toDF("stage_idx", "stage", "users")
  }

  /** Day-granularity cohort retention: users are cohorted by the calendar
    * day of their first event; `users` counts distinct cohort members active
    * `day_offset` days after that (offset 0 = the cohort day itself, so
    * every cohort's offset-0 row equals its size).
    *
    * Two user-keyed exchanges total: the first-day aggregation and the
    * distinct active-day set both hash on `user`, the join between them is
    * co-partitioned, and the final rollup groups on the tiny
    * (cohort_day, offset) key space — output is O(days²), independent of
    * event volume. No windows, no arrays; a year of 100 TB events rolls up
    * to ≤ 366² rows.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val active = events.select(col(userCol).as("u"), day.as("d")).distinct()
    val first = active.groupBy(col("u")).agg(min(col("d")).as("cohort"))
    active.join(first, "u")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("u")).as("users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("users"))
  }
}
