package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import Sessionize.{Event, KeyState, Session, SessionState}

/** The event-time sessionizer on `transformWithState` — the third state
  * shape of the 4.x API in this repo (named [[ValueState]] + EVENT-TIME
  * TIMERS, next to [[FunnelTws]]'s plain ValueState and
  * [[CountsTws]]'s MapState): watermark-timed session closes become
  * registered timers and a `handleExpiredTimer` callback instead of
  * `GroupStateTimeout.EventTimeTimeout`.
  *
  * The state-transition LOGIC is [[Sessionize]]'s, verbatim — open
  * session + at-most-one pre-start straggler run, the same merge windows,
  * bridge check and batch-equivalence argument — re-wired onto the new
  * API's state/timer surface. One timer per key (the earliest close
  * deadline); on every update the old timer is deleted and the new
  * deadline registered, so timer state is O(keys) like the value state.
  * Gated against the SAME batch oracle as `st_sessionize`, which makes
  * the fMGWS → TWS migration a proven swap exactly like the funnel pair.
  */
object SessionizeTws {

  private class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, Session] {

    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState](
        "session", Encoders.product[KeyState], TTLConfig.NONE)

    private def emit(userId: Long, s: SessionState): Session =
      Session(userId, s.start, s.last, s.n, s.sum)
    private def deadline(ks: KeyState): Long =
      math.min(ks.cur.last + gapMs, ks.strag.map(_.last + gapMs).getOrElse(Long.MaxValue))

    private def rearm(wm: Long, ks: KeyState): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(deadline(ks), wm + 1))
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = if (state.exists()) Some(state.get().cur) else None
      var strag = if (state.exists()) state.get().strag else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs && s.start - t <= gapMs =>
            cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) if t - s.last > gapMs =>
            closed ::= emit(key, s)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(_) =>
            strag match {
              case Some(s) if t - s.last <= gapMs && s.start - t <= gapMs =>
                strag = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1, s.sum + e.value))
              case other =>
                other.foreach(s => closed ::= emit(key, s))
                strag = Some(SessionState(t, t, 1, e.value))
            }
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      (cur, strag) match {
        case (Some(c), Some(s)) if c.start - s.last <= gapMs =>
          cur = Some(SessionState(math.min(s.start, c.start), math.max(s.last, c.last),
            c.n + s.n, c.sum + s.sum))
          strag = None
        case _ => ()
      }
      cur.foreach { c =>
        val ks = KeyState(c, strag)
        state.update(ks)
        rearm(timerValues.getCurrentWatermarkInMs(), ks)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (!state.exists()) return Iterator.empty
      val ks = state.get()
      val wm = timerValues.getCurrentWatermarkInMs()
      var out = List.empty[Session]
      var strag = ks.strag
      var cur: Option[SessionState] = Some(ks.cur)
      strag.filter(s => wm >= s.last + gapMs).foreach { s => out ::= emit(key, s); strag = None }
      cur.filter(s => wm >= s.last + gapMs).foreach { s => out ::= emit(key, s); cur = None }
      cur match {
        case None => state.clear()
        case Some(c) =>
          val ks2 = KeyState(c, strag)
          state.update(ks2)
          rearm(wm, ks2)
      }
      out.reverseIterator
    }
  }

  /** Same wiring contract as [[Sessionize.sessions]] (`user_id LONG,
    * ts TIMESTAMP, value DOUBLE` → closed [[Session]]s, append output).
    */
  def sessions(spark: SparkSession, events: Dataset[_], gapMs: Long, watermarkDelay: String): Dataset[Session] = {
    import spark.implicits._
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("userId"), col("ts"),
        col("value").cast("double").as("value"))
      .as[Event](Encoders.product[Event])
      .groupByKey(_.userId)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
