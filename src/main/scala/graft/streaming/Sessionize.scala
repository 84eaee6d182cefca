package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state — the Structured
  * Streaming extension surface (`KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * A session is a run of events for one user with gaps < `gapMs`; a session
  * closes when the event-time WATERMARK passes its last event + gap (not on
  * wall clock), so results are deterministic under replay. State per key is
  * one [[Sessionize.SessionState]] — O(active users), not O(events).
  *
  * At scale: state lives in the state store keyed by user (RocksDB-backed on
  * a real cluster), partitioned by the groupBy key — adding executors shards
  * the state; no driver involvement per event.
  */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long, sumValue: Double)

  /** The state-transition function: accumulate events while the gap holds,
    * emit a [[Session]] when the watermark times the key out.
    */
  def updateState(gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start, s.last, s.n, s.sum))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      // Pending pre-start straggler run (see the straggler case below):
      // successive stragglers within gap of EACH OTHER belong to one earlier
      // session and must merge before closing — the batch-local sorted fold
      // has them adjacent, so an O(1) accumulator suffices.
      var strag = Option.empty[SessionState]
      def closeStrag(): Unit = strag.foreach { s =>
        closed ::= Session(userId, s.start, s.last, s.n, s.sum)
        strag = None
      }
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // `<=`: a new session starts only when the gap is EXCEEDED —
          // the same convention as the batch lag-window sessionizer
          // (`diff > gap` breaks), so batch and streaming agree at the
          // exact-boundary instant. The merge window is the full interval
          // [start − gap, last + gap]: a late-but-within-watermark event
          // from a LATER micro-batch can carry t < s.last (the sort above
          // is batch-local), and min/max keeps the extent correct under any
          // cross-batch arrival order — but ONLY within gap of the interval;
          // see the straggler case below.
          case Some(s) if t - s.last <= gapMs && s.start - t <= gapMs =>
            cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) if t - s.last > gapMs =>
            closed ::= Session(userId, s.start, s.last, s.n, s.sum)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(_) =>
            // Pre-start straggler: a cross-batch late event MORE than gap
            // before the open session's start. Absorbing it would stretch
            // `start` backwards across a gap the batch sessionizer breaks
            // on; it belongs to an earlier session. Same-batch stragglers
            // within gap of each other merge via the accumulator; the run
            // closes when it breaks (or at batch end). (Known divergence:
            // stragglers split across DIFFERENT micro-batches that would
            // merge with each other emit separately — exact repair needs a
            // per-key event buffer, not O(1) state.)
            strag match {
              case Some(s) if t - s.last <= gapMs =>
                strag = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
              case _ =>
                closeStrag()
                strag = Some(SessionState(t, t, 1, e.value))
            }
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      closeStrag()
      cur.foreach { s =>
        state.update(s)
        // Clamp above the current watermark: a timeout timestamp at or below
        // it is invalid (the session would never time out / Spark rejects it).
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
      }
      closed.reverseIterator
    }
  }

  /** Wire the stateful sessionizer onto a streaming frame with columns
    * `user_id LONG, ts TIMESTAMP, value DOUBLE`. Emits sessions as they
    * close (watermark-timed append output).
    */
  def sessions(spark: SparkSession, events: Dataset[_], gapMs: Long, watermarkDelay: String): Dataset[Session] = {
    import spark.implicits._
    val typed = events.toDF()
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("userId"), col("ts"),
        col("value").cast("double").as("value"))
      .as[Event](Encoders.product[Event])
    typed.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateState(gapMs))
  }
}
