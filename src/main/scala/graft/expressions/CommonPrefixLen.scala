package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Length (in CODE POINTS, capped) of the common prefix of two strings —
  * the LCP primitive under [[graft.operators.SuffixArray.repeatedSpans]]
  * (adjacent-suffix LCP is the exact-repeated-substring signal of the
  * suffix-array dedup literature).
  *
  * Counting unit is code points so the value is interchangeable with
  * DuckDB's char-indexed `substr`/`len` arithmetic in the gate oracles
  * (UTF8String's char = code point, same convention). The byte-level scan
  * walks full code points, so a shared byte prefix that splits a
  * multi-byte sequence can never inflate the count. `cap` bounds the walk
  * — at scale callers compare cap-bounded suffix windows, so the cap is
  * load-bearing, not cosmetic.
  */
case class CommonPrefixLen(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {
  require(cap > 0, "cap must be positive")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_common_prefix_len"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.count(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.CommonPrefixLen.count($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {
  /** Code-point count of the common prefix, walking whole code points
    * DIRECTLY on the UTF-8 buffers (round 14, advisor note): the previous
    * version `toString`ed both operands, allocating O(full string) UTF-16
    * per row even when `cap` is tiny. Byte-stepping allocates nothing and
    * touches at most ~4·cap bytes per side. Whole-sequence byte equality
    * IS code-point equality (UTF-8 is injective), so counts are unchanged
    * for valid UTF-8 — Spark strings always are; a malformed tail
    * sequence conservatively ends the prefix.
    */
  def count(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val la = a.numBytes
    val lb = b.numBytes
    var i = 0
    var n = 0
    while (n < cap && i < la && i < lb) {
      val w = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + w > la || i + w > lb) return n
      var j = 0
      while (j < w) {
        if (a.getByte(i + j) != b.getByte(i + j)) return n
        j += 1
      }
      i += w
      n += 1
    }
    n
  }
}
