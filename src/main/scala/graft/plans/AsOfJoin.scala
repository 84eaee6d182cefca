package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.internal.SQLConf
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
      // Stats-driven physical selection, mirroring the planner's own
      // hash-join choice: a dim side under the broadcast threshold skips
      // BOTH fact-side exchanges entirely (the 100 TB case — as-of lookup
      // against a dimension that fits on an executor must never shuffle
      // the fact stream); otherwise the co-partitioned sort-merge variant.
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      if (threshold >= 0 && p.right.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
          p.payload, p.outAttrs, planLater(p.left), planLater(p.right)) :: Nil
      else
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

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "facts with an as-of match"))

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
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
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
          numOutputRows += 1
          if (matched) numMatched += 1
          outProj(joined(l, if (matched) cand else nullPayload))
        }
      }
    }
  }
}

/** Broadcast as-of lookup: the physical variant for a dim side small enough
  * to broadcast — the dominant 100 TB shape (price table, profile snapshot,
  * config history vs an unbounded fact stream).
  *
  * The fact side requires NO distribution and NO ordering: it streams
  * through untouched — zero exchanges, zero sorts, preserved partitioning
  * and ordering — while the dim side arrives once per executor via an
  * `IdentityBroadcastMode` exchange. Each task builds (key → time-sorted
  * rows) from the broadcast value lazily and answers each fact row with a
  * binary search for the greatest dim time ≤ fact time. Per-task build cost
  * is O(|dim| log |dim|) — bounded by the broadcast threshold by
  * construction (the strategy only picks this variant under it), the same
  * trade BroadcastNestedLoopJoinExec makes with identity-broadcast input.
  */
case class BroadcastAsOfJoinExec(
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
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "facts with an as-of match"))

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
    val broadcastRelation = right.executeBroadcast[Array[InternalRow]]()
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().mapPartitions { li =>
      val timeOrd = GenerateOrdering.create(timeSchema)
      // One index build per EXECUTOR, not per task: with 32+ tasks sharing a
      // JVM, rebuilding the (copy + group + sort) index per partition costs
      // tasks×|dim| — measured 2-3× slower than the shuffled merge at 300 k
      // dim rows before memoization. Keyed by broadcast id with soft values,
      // the same lifetime discipline as the broadcast block itself.
      val index = BroadcastAsOfJoinExec.indexFor(broadcastRelation.id, () => {
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
        val rPayloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
        val built = new java.util.HashMap[UnsafeRow, Array[(UnsafeRow, UnsafeRow)]]()
        val grouped = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
        broadcastRelation.value.foreach { r =>
          val k = rKeyProj(r).copy()
          val entry = (rTimeProj(r).copy(), rPayloadProj(r).copy())
          val buf = grouped.get(k)
          if (buf == null) {
            val b = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]()
            b += entry; grouped.put(k, b)
          } else buf += entry
        }
        grouped.forEach { (k, buf) =>
          built.put(k, buf.sortWith((a, b) => timeOrd.compare(a._1, b._1) < 0).toArray)
        }
        built
      })
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val joinedSchema = (leftOut ++ payloadAttrs).map(_.withNullability(true))
      val outProj = UnsafeProjection.create(joinedSchema, joinedSchema)
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow
      li.map { l =>
        val group = index.get(lKeyProj(l))
        val payloadRow: InternalRow = if (group == null) nullPayload else {
          val lT = lTimeProj(l)
          // Greatest index with time ≤ lT (binary search on the sorted group).
          var lo = 0; var hi = group.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(group(mid)._1, lT) <= 0) { ans = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          if (ans >= 0) group(ans)._2 else nullPayload
        }
        numOutputRows += 1
        if (payloadRow ne nullPayload) numMatched += 1
        outProj(joined(l, payloadRow))
      }
    }
  }
}

object BroadcastAsOfJoinExec {
  private type Index = java.util.HashMap[UnsafeRow, Array[(UnsafeRow, UnsafeRow)]]
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.ref.SoftReference[Index]]()

  /** Executor-local memo of the built as-of index for one broadcast variable.
    * Soft references let the JVM reclaim an index under memory pressure (a
    * later task simply rebuilds); the map itself stays small — one entry per
    * live broadcast id.
    */
  private[plans] def indexFor(id: Long, build: () => Index): Index = {
    val ref = cache.get(id)
    val hit = if (ref != null) ref.get else null
    if (hit != null) hit
    else cache.synchronized {
      val again = cache.get(id)
      val v = if (again != null) again.get else null
      if (v != null) v
      else {
        val built = build()
        cache.put(id, new java.lang.ref.SoftReference(built))
        built
      }
    }
  }
}

/** Optimizer rule restoring fact-side filter pushdown through the custom
  * node: Catalyst's `PushPredicateThroughNonJoin`/`PushDownPredicates`
  * only know the built-in operators, so ANY custom logical node is a
  * pushdown barrier by default — a `WHERE` on fact columns above an as-of
  * join would otherwise run after the merge instead of reaching the
  * parquet scan. Deterministic (fact-only) conjuncts move below the left
  * child; predicates touching the as-of payload stay put (they depend on
  * the join's result). Registered through `experimental.extraOptimizations`
  * next to the strategy — together with the native expressions
  * ([[graft.expressions.StrCode]] et al.) and [[graft.expressions.TopKAgg]]
  * this completes the Expression / Rule / Strategy / SparkPlan extension
  * quartet.
  */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond).partition { p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet)
      }
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
