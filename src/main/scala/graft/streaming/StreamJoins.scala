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

  /** Watermarked interval INNER join: fact rows match dim rows with the
    * same key whose time lies in `[factTime - maxSpanMs, factTime]` (the
    * "fact happened within `maxSpanMs` after the dim" shape — signup →
    * purchase attribution, error → effect windows, …).
    *
    * Both inputs must be STREAMING frames; `factTs`/`dimTs` are event-time
    * timestamp columns. Inner joins emit eagerly (no watermark wait for
    * output), so an AvailableNow run over a bounded source produces exactly
    * the batch join result. Column names pass through — alias before the
    * call if the sides collide on anything besides `key`.
    */
  def intervalJoin(
      facts: DataFrame,
      dims: DataFrame,
      key: String,
      factTs: String,
      dimTs: String,
      maxSpanMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(maxSpanMs > 0, "maxSpanMs must be positive")
    val f = facts.withWatermark(factTs, watermarkDelay)
    val d = dims.withWatermark(dimTs, watermarkDelay)
    f.join(d,
      f(key) === d(key) &&
        col(dimTs) <= col(factTs) &&
        col(factTs) <= col(dimTs) + expr(s"INTERVAL ${maxSpanMs / 1000} SECONDS"),
      "inner")
      .drop(d(key))
  }
}
