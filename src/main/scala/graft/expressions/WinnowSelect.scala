package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native winnowing selection (Schleimer et al. 2003, the MOSS fingerprint
  * rule): over a document's k-gram hash array, select from every length-`w`
  * window its minimum — LEFTMOST on ties — and return the distinct
  * `(fp, pos)` selections in first-occurrence order (`pos` 1-based, the
  * same coordinates the DuckDB oracles replay via `list_position`). Arrays
  * shorter than `w` degrade to selecting every element, the composition's
  * documented fallback.
  *
  * Semantics are IDENTICAL to the HOF composition this replaces
  * (`array_distinct(transform(sequence(...), j => struct(array_min(slice(h,
  * j, w)), j - 1 + array_position(...))))` under a `letBound` — see
  * [[graft.operators.Dedup.winnowingFingerprintPositions]]), property-tested
  * element-for-element in WinnowSelectSpec.
  *
  * Why an Expression: the composition evaluates interpreted (HOFs have no
  * codegen) and does O(w) work per window — slice allocation, array_min
  * scan, array_position rescan — O(len·w) boxed operations per document,
  * the dominant cost of the winnowing family (#2 bench entry at round-7
  * close, 38 s on the 30× hostile probe). This expression runs one O(len)
  * monotonic-deque pass (pop-strictly-greater keeps the front the LEFTMOST
  * minimum) with primitive longs and no per-window allocation; distinctness
  * is an exact first-occurrence hash-set pass over the per-window
  * selections, matching `array_distinct` struct equality bit for bit.
  *
  * Input contract: `array<bigint>` with NO null elements — the only
  * producer is [[graft.operators.Dedup.hash32]] over non-null substrings
  * (null/short text is gated to an EMPTY array upstream). A null element
  * fails loudly rather than silently diverging from the composition.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, s"window must be positive, got $w")

  override def prettyName: String = "graft_winnow_select"
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = WinnowSelectImpl.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelectImpl.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.expressions.WinnowSelectImpl.select(${childGen.value}, $w);
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelectImpl {

  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)

  /** One O(len) deque pass + exact first-occurrence distinct. Returns the
    * selections as struct rows; never null (empty array in → empty out).
    */
  def select(h: ArrayData, w: Int): ArrayData = {
    val n = h.numElements()
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (h.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_winnow_select: null hash element (inputs come from hash32 and are never null)")
      vals(i) = h.getLong(i)
      i += 1
    }
    // Per-window leftmost-min selections, in window order.
    val selFp = new Array[Long](n)
    val selPos = new Array[Long](n)
    var m = 0
    if (n > 0 && n < w) {
      // Short-document fallback: every element is selected.
      i = 0
      while (i < n) { selFp(m) = vals(i); selPos(m) = i + 1L; m += 1; i += 1 }
    } else if (n >= w) {
      // Monotonic deque of indices; values strictly increase front-to-back,
      // so the front is the window minimum and — because equal values are
      // NOT popped — the front stays the LEFTMOST minimum.
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var j = 0
      while (j < n) {
        while (tail > head && vals(dq(tail - 1)) > vals(j)) tail -= 1
        dq(tail) = j; tail += 1
        val start = j - w + 1
        if (start >= 0) {
          while (dq(head) < start) head += 1
          val p = dq(head)
          // Consecutive windows re-selecting the same element emit the same
          // (fp, pos); collapse the run here, full distinct below.
          if (m == 0 || selPos(m - 1) != p + 1L || selFp(m - 1) != vals(p)) {
            selFp(m) = vals(p); selPos(m) = p + 1L; m += 1
          }
        }
        j += 1
      }
    }
    // Exact array_distinct semantics: first occurrence of each (fp, pos)
    // pair survives, order preserved. (Winnowing selections are in fact
    // non-decreasing in pos, making the run-collapse above sufficient, but
    // the set pass guarantees equality with the composition uncondition-
    // ally at O(selections) cost.)
    val seen = new java.util.HashSet[java.lang.Long](Math.max(8, m * 2))
    val outRows = new Array[Any](m)
    var cnt = 0
    i = 0
    while (i < m) {
      // pos uniquely keys a selection (one element has one position); pair
      // identity is (fp, pos) and fp is a function of pos.
      if (seen.add(java.lang.Long.valueOf(selPos(i)))) {
        outRows(cnt) = InternalRow(selFp(i), selPos(i))
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(if (cnt == m) outRows else outRows.take(cnt))
  }
}
