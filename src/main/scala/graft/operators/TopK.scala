package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shim

import graft.expressions.TopKAgg

/** Per-key top-k without the full-data shuffle or the full-data sort.
  *
  * The [[graft.expressions.TopKAgg]] aggregate underneath this API caps
  * every partial buffer at k, so the exchange carries at most
  * `distinct_keys × k × input_partitions` rows regardless of N — the
  * difference between "shuffle 100 TB" and "shuffle megabytes" for
  * shortlist-shaped queries (per-domain best documents, per-query ANN
  * rescore cut, per-user latest events). Spark's `WindowGroupLimit` rewrite
  * of `row_number() <= k` reaches the same shuffle bound but pays two full
  * sorts (map-side before the limit, reduce-side for the window); the agg
  * pays a heap insert per row and composes with other aggregates in the
  * same `groupBy` — see TopKAgg's scaladoc and the TopKSpec metrics test.
  */
object TopK {

  /** Aggregate column: bounded top-k of `value` (any orderable type; use a
    * `struct(score, tiebreak, payload…)` for compound order + carried
    * fields). Output is `array<value.type>`, best-first.
    */
  def topK(value: Column, k: Int, largest: Boolean = true): Column =
    Shim.column(TopKAgg(Shim.expression(value), k, largest).toAggregateExpression())

  /** Per-key top-k, flattened back to rows.
    *
    * `ordered` is the named struct whose lexicographic order ranks rows —
    * put the score first, a unique tie-break second, carried payload after;
    * every struct field comes back as a column alongside the keys.
    *
    * Tuning: above ~128 distinct keys per task, ObjectHashAggregate's
    * default sort-based fallback kicks in and sorts the input by key —
    * re-introducing the very sort this operator avoids. The buffers here
    * are bounded (k items per key), so raising
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` is safe
    * and measured 5.9× on a high-cardinality probe (BASELINE.md "bounded
    * top-k A/B").
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], ordered: Column, k: Int,
      largest: Boolean = true): DataFrame = {
    val agged = df.groupBy(keys.map(col): _*)
      .agg(topK(ordered, k, largest).as("_topk"))
    // explode after the bounded agg: output size is keys × ≤k, trivial.
    agged.select(keys.map(col) :+ explode(col("_topk")).as("_e"): _*)
      .select(keys.map(col) :+ col("_e.*"): _*)
  }

  /** [[topKPerKey]] plus a 1-based `rank` column — the drop-in replacement
    * for `row_number().over(Window.partitionBy(keys).orderBy(…)) <= k`:
    * the aggregate's output arrays are already best-first, so rank is just
    * the array position, computed on keys × ≤k rows. Keys must not be
    * named `pos`/`col` (posexplode's intermediate names).
    */
  def topKPerKeyRanked(df: DataFrame, keys: Seq[String], ordered: Column, k: Int,
      largest: Boolean = true): DataFrame = {
    val agged = df.groupBy(keys.map(col): _*)
      .agg(topK(ordered, k, largest).as("_topk"))
    agged.select(keys.map(col) :+ posexplode(col("_topk")): _*)
      .select((keys.map(col) :+ (col("pos") + 1).cast("int").as("rank")) :+ col("col.*"): _*)
  }
}
