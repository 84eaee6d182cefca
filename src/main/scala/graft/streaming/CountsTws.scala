package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Incremental per-(user, event_type) counters on `transformWithState`
  * with a named [[MapState]] — the second state-variable shape of the 4.x
  * API next to [[FunnelTws]]'s ValueState: one state map per user, keyed
  * by event type, so a user's counter set grows with ITS OWN type
  * vocabulary, never with the stream.
  *
  * Each batch emits the user's counters for exactly the types that batch
  * touched (bounded by the batch, not the state); counters are monotone,
  * so downstream `max` per (user, type) is the running total — the same
  * append-mode contract as the funnel's `max(reached)`. Gated against the
  * plain batch `count(*)` oracle, which is what makes the state plumbing's
  * cross-batch accumulation PROVEN rather than assumed.
  */
object CountsTws {

  private class CountsProcessor
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, String)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      val batch = rows.toArray.groupBy(_._2)
      val out = batch.toArray.sortBy(_._1).map { case (et, hits) =>
        val cur = if (counts.containsKey(et)) counts.getValue(et) else 0L
        val next = cur + hits.length
        counts.updateValue(et, next)
        (key, et, next)
      }
      out.iterator
    }
  }

  /** Streaming frame `(u: long, et: string)` → `(u, et, n)` appended per
    * batch for touched types; downstream takes `max(n)` per (u, et).
    */
  def counts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("u").cast("long"), col("et").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new CountsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("u", "et", "n")
  }
}
