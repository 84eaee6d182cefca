package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{StructField, StructType}

/** AS-OF join as a first-class operator: logical node → strategy → physical
  * merge — the "whole-operator semantics" extension point (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`) for the one temporal join
  * the relational algebra can't say directly.
  *
  * Why a physical operator when [[graft.operators.Joins.asOf]] already
  * computes the same thing compositionally: the union+window encoding pays
  * for generality —
  *   - ONE sort over facts+dim TOGETHER (the union), where the native exec
  *     sorts each side separately (two smaller sorts, each potentially
  *     satisfied for free by an upstream ordering or a sort-merge-friendly
  *     layout);
  *   - dim payloads ride through the union as nullable columns on EVERY fact
  *     row in the sort, where the native exec's right side carries them only
  *     on dim rows;
  *   - the window operator buffers and re-scans its running frame machinery,
  *     where the merge below is a forward-only two-pointer pass with O(1)
  *     state (one candidate row per key).
  * Both plans shuffle the same bytes once; the native exec is the strictly
  * leaner post-shuffle pipeline, and `AsOfJoinSpec` pins the equivalence
  * plus the measured exchange/sort shape.
  *
  * Semantics (mirrors the composed operator and DuckDB `ASOF LEFT JOIN`):
  * for each left row, the right row with the greatest `rightTime` ≤
  * `leftTime` among rows with equal keys; no such row → null payload. Key
  * equality is null-safe (null keys form a group, as with the composed
  * version's `Window.partitionBy`). Right rows must be unique per
  * (key, time) — the API layer collapses duplicates deterministically
  * BEFORE constructing the node, keeping the exec single-purpose.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    outAttrs: Seq[AttributeReference])
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "as-of key arity mismatch")
  require(payload.length == outAttrs.length, "as-of payload/output arity mismatch")

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Maps the logical node 1:1; registered through
  * `spark.experimental.extraStrategies` (the public runtime hook — the
  * driver owns session construction, so build-time
  * `SparkSessionExtensions.injectPlannerStrategy` is not available to a
  * library; the two registration paths install the identical strategy
  * object).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
        p.payload, p.outAttrs, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge.
  *
  * Declares `ClusteredDistribution(keys)` for both children and per-child
  * `(keys..., time)` ascending sort — `EnsureRequirements` then inserts the
  * co-partitioning exchanges and sorts exactly as it does for a sort-merge
  * join (and elides any already satisfied: a bucketed layout or an upstream
  * sort feeds the merge shuffle-free). Execution is `zipPartitions` with a
  * forward-only two-pointer merge per partition: right rows are consumed at
  * most once, the only retained state is the latest qualifying right row
  * per current key (one copied row + its key), so memory is O(1) per
  * partition regardless of group size — no window frame, no buffered
  * group, nothing keyed by group cardinality. At 1000 executors the cost
  * is the two keyed exchanges; the merge itself is a linear scan.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    outAttrs: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keySchema = StructType(leftKeys.map(e => StructField("k", e.dataType, e.nullable)))
    val timeSchema = StructType(Seq(StructField("t", leftTime.dataType, nullable = true)))
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadAttrs = payload
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val rPayloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      // Null-safe key ordering: GenerateOrdering compares null==null as 0 —
      // the null-group semantics documented on the logical node.
      val keyOrd = GenerateOrdering.create(keySchema)
      val timeOrd = GenerateOrdering.create(timeSchema)
      // The out-projection projects the INPUT attrs (left ++ payload) — the
      // node's outAttrs carry fresh exprIds that exist nowhere in the input,
      // so binding must go through the payload attrs themselves; the rename
      // to outAttrs is purely schema metadata. Payload slots MUST bind
      // nullable so codegen emits null checks for the no-match row.
      val joinedSchema = (leftOut ++ payloadAttrs).map(_.withNullability(true))
      val outProj = UnsafeProjection.create(joinedSchema, joinedSchema)
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var cand: UnsafeRow = _ // copied latest qualifying right row
        private var candKey: UnsafeRow = _
        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          val lKey = lKeyProj(l)
          val lT = lTimeProj(l)
          var scanning = true
          while (scanning && (rHead != null || ri.hasNext)) {
            if (rHead == null) rHead = ri.next()
            val rKey = rKeyProj(rHead)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rHead = null // right group already passed every remaining left key ≥ lKey
            } else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lT) <= 0) {
              cand = rPayloadProj(rHead).copy()
              candKey = rKey.copy()
              rHead = null
            } else {
              scanning = false // right is ahead of this left row; keep for later
            }
          }
          val matched = cand != null && keyOrd.compare(candKey, lKey) == 0
          outProj(joined(l, if (matched) cand else nullPayload))
        }
      }
    }
  }
}
