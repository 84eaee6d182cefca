package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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
    *
    * `maxDelay` uses FIRST-TOUCH attribution: the window anchors on the
    * earliest qualifying previous-stage time (the min chain). A later
    * previous-stage instance whose window would admit an otherwise-late
    * event does NOT resurrect the conversion — the documented, replayable
    * choice among the standard funnel-attribution variants.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String],
      maxDelay: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._

    val slim = events
      .where(col(typeCol).isin(stages.map(s => s: Any): _*))
      .select(col(userCol).as("u"), col(typeCol).as("et"), col(tsCol).as("t"))
      .persist()

    // frontier: one row per user who has completed stages 0..k, carrying the
    // earliest completion time of stage k under the strict-order constraint.
    // With `maxDelay` (same unit as tsCol), stage k also has to land within
    // maxDelay of the stage k-1 time — the conversion-window semantics
    // ("click within 7 days of the view").
    val within = (t: Column, ft: Column) =>
      maxDelay.map(d => t <= ft + lit(d)).getOrElse(lit(true))
    var frontier = slim.where(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("t")).as("ft"))
    var counts = Vector(frontier.count())
    stages.tail.foreach { st =>
      frontier = slim.where(col("et") === st)
        .join(frontier, "u")
        .where(col("t") > col("ft") && within(col("t"), col("ft")))
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

  /** Rolling active-user metrics per observed day: DAU, trailing-`windowDays`
    * active users (WAU for 7), and the DAU/WAU stickiness ratio.
    *
    * The trailing count is computed by CONTRIBUTION EXPLOSION, not a range
    * window: each distinct (user, day) row fans out to the `windowDays`
    * observation days it contributes to, then a distinct + count per
    * observation day. That multiplies the *deduplicated* user-day frame by a
    * small constant w — at 100 TB that frame is users × active-days, orders
    * of magnitude below raw events — and every exchange stays keyed
    * (user-day distinct, observation-day count). A `range between` window
    * over days would need the per-day user SETS (not counts) to dedupe
    * across the window, which no window frame expresses; the explode is the
    * scalable encoding of exactly that set union. Output days are the
    * OBSERVED days (≥ 1 active user that day) — trailing counts for silent
    * days are not emitted.
    */
  def rollingActive(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val active = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val dau = active.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val contrib = active
      .select(col("u"), explode(transform(
        sequence(lit(0), lit(windowDays - 1)),
        i => date_add(col("d"), i))).as("obs"))
      .distinct()
    val trailing = contrib.groupBy(col("obs")).agg(count(lit(1)).as("trailing"))
    dau.join(trailing, dau("d") === trailing("obs"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("trailing"),
        round(col("dau").cast("double") / col("trailing").cast("double"), 6)
          .as("stickiness"))
  }

  /** First-order Markov transition matrix over per-user event paths: for
    * every ordered pair of CONSECUTIVE events of one user, the transition
    * count and conditional probability P(next = b | current = a) — the
    * user-path analysis behind "what do users do after an error".
    *
    * One user-keyed window (ordered by time with the unique id as
    * tie-break — the scd2Build ordering discipline) produces the
    * consecutive pairs; counts and row-normalization are aggregations on
    * the TYPE×TYPE frame, which is vocabulary-sized, not event-sized.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("total"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6).as("p"))
  }

  /** Per-entity daily resample with forward fill: calendar days between an
    * entity's first and last observation, carrying the last observed value
    * across silent days — time-series regularization for feature pipelines.
    *
    * Deterministic latest-per-day via `max(struct(idCol, valueCol))`
    * (argmax by the unique id — no window sort); day spans exploded from
    * one bounds aggregation (fan-out = entity-day span, keyed on the
    * entity); the fill is `last(_, ignoreNulls)` over a per-entity
    * day-ordered frame — the window sort is per-entity-span, never global.
    * Output: (entity, day, value, was_gap).
    */
  def resampleDaily(
      events: DataFrame,
      entityCol: String,
      idCol: String,
      valueCol: String,
      dayCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDay = events.groupBy(col(entityCol), col(dayCol).as("d"))
      .agg(max(struct(col(idCol), col(valueCol))).as("m"))
      .select(col(entityCol), col("d"), col(s"m.$valueCol").as("v"))
    val bounds = perDay.groupBy(col(entityCol))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val allDays = bounds.select(col(entityCol),
      explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allDays.join(perDay, Seq(entityCol, "d"), "left")
      .select(col(entityCol), date_format(col("d"), "yyyy-MM-dd").as("day"),
        round(last(col("v"), ignoreNulls = true).over(w).cast("double"), 6).as("value"),
        col("v").isNull.cast("int").as("was_gap"))
  }

  /** Streaming funnel state machine: the incremental counterpart of
    * [[funnel]], as a `flatMapGroupsWithState` over a user-keyed stream.
    *
    * Per-user state is two scalars — the furthest stage index reached and
    * the timestamp of its qualifying event — so the state store stays
    * O(users) whatever the event volume; each micro-batch sorts only ITS
    * OWN events for the user (the standard sessionizer bound: per-user
    * per-batch, not per-user total) and replays the same greedy fold the
    * batch operator's conditional-min chain computes. The greedy scan in
    * event-time order is equivalent to the min-chain: at stage k−1 with
    * qualifying time t, the first stage-k event with ts > t IS
    * min(stage-k ts > t). Late events inside a batch are handled by the
    * sort; cross-batch event-time regressions (an earlier event arriving a
    * batch later) can only under-advance, never mis-advance, the stage —
    * the same monotone guarantee the reference's at-least-once pipeline
    * gives its consumers.
    *
    * Input: a STREAMING frame with columns `(u: long, et: string,
    * t: long)` pre-filtered to funnel stages. Output: `(u, reached)`
    * appended each batch the user has activity; downstream takes
    * `max(reached)` per user.
    */
  def funnelStateful(events: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val order = stages.zipWithIndex.toMap
    events.select(col("u").cast("long"), col("et").cast("string"), col("t").cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), (Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (u, it, state) =>
          var (si, ts) = state.getOption.getOrElse((-1, Long.MinValue))
          // Tie-break the sort by stage order for determinism; qualification
          // itself compares timestamps only, so the tie-break never changes
          // the reached stage (strict > means an equal-ts event of the next
          // stage cannot qualify regardless of scan position).
          it.toArray.sortBy(e => (e._3, order(e._2))).foreach { case (_, et, t) =>
            if (si + 1 < stages.length && et == stages(si + 1) && (si == -1 || t > ts)) {
              si += 1; ts = t
            }
          }
          state.update((si, ts))
          Iterator.single((u, si))
      }.toDF("u", "reached")
  }
}
