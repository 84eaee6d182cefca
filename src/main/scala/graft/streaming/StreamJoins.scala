package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream joins with bounded state — the streaming counterpart of
  * the batch [[graft.operators.Joins.rangeJoin]]/as-of family.
  *
  * Spark buffers BOTH sides of a stream-stream join in the state store;
  * without a time bound the state grows forever. The interval form below is
  * the production-safe shape: each side carries an event-time watermark and
  * the join condition bounds how far the two times may sit apart, so Spark
  * can evict a buffered row as soon as the other side's watermark passes
  * its match horizon — state is O(rows within the interval window), not
  * O(stream).
  */
object StreamJoins {

  /** Watermarked interval join: fact rows match dim rows with the same key
    * whose time lies in `[factTime - maxSpanMs, factTime]` (the "fact
    * happened within `maxSpanMs` after the dim" shape — signup → purchase
    * attribution, error → effect windows, …).
    *
    * Both inputs must be STREAMING frames; `factTs`/`dimTs` are event-time
    * timestamp columns. MATCHED rows emit eagerly (no watermark wait), so
    * an AvailableNow `"inner"` run over a bounded source produces exactly
    * the batch join result. With `"left_outer"`, a fact's null-padded row
    * emits only once BOTH sides' watermarks pass its match horizon — a
    * bounded run must push the watermark beyond `max(ts) + maxSpanMs +
    * delay` (sentinel rows) or tail facts stay buffered and their outer
    * rows are never emitted. Column names pass through — alias before the
    * call if the sides collide on anything besides `key`.
    */
  def intervalJoin(
      facts: DataFrame,
      dims: DataFrame,
      key: String,
      factTs: String,
      dimTs: String,
      maxSpanMs: Long,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(maxSpanMs > 0, "maxSpanMs must be positive")
    require(Set("inner", "left_outer").contains(joinType),
      "joinType must be inner or left_outer (right/full outer mirror left)")
    val f = facts.withWatermark(factTs, watermarkDelay)
    val d = dims.withWatermark(dimTs, watermarkDelay)
    f.join(d,
      f(key) === d(key) &&
        col(dimTs) <= col(factTs) &&
        col(factTs) <= col(dimTs) + expr(s"INTERVAL $maxSpanMs MILLISECOND"),
      joinType)
      .drop(d(key))
  }
}
