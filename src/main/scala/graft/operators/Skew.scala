package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives: salting for hot keys.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * plan-level tool for the cases AQE can't fix — a groupBy where one key
  * holds a large share of all rows (one reducer does all the work no matter
  * how AQE splits files), or a shuffle join against a hot key set known in
  * advance.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `salts` sub-keys
    * (deterministic spread via a hash of stable `spreadOn` columns — NOT
    * rand(), so replays and retries stay consistent), partially aggregated
    * per (key, salt), then finally aggregated per key.
    *
    * Phase 1 shuffles on (key, salt) — the hot key's load spreads over
    * `salts` reducers; phase 2 shuffles only the tiny partial-agg output.
    * Use for algebraic aggregates (sum/count/min/max — anything with a
    * merge step).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      spreadOn: Seq[String],
      salts: Int)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && partial.length == merge.length,
      "partial and merge aggregate lists must align")
    val salted = df.withColumn("_salt",
      pmod(hash(spreadOn.map(col): _*), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted shuffle join for a skewed LEFT side against a small-ish right
    * side that cannot be broadcast: left rows get a deterministic salt in
    * [0, salts); the right side is exploded `salts` times so every
    * (key, salt) bucket finds its match. Right-side amplification × salts is
    * the price — use only when broadcast is impossible and AQE's splitting
    * is insufficient.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      spreadOn: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(spreadOn.map(col): _*), lit(salts)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
