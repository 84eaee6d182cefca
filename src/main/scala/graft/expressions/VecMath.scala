package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector reductions — the hot inner loop of every
  * similarity / dedup / quantization operator.
  *
  * Semantics are IDENTICAL to the `aggregate(zip_with(a, b, (x, y) =>
  * x.cast("double") * y.cast("double")), 0.0, _+_)` composition they
  * replace: a strict LEFT FOLD in element order over double-promoted
  * elements, so results stay bit-exact across engines (the DuckDB oracles
  * replay the same fold) — including the null contract (null array, null
  * element, or length mismatch → null, exactly what zip_with's null-padding
  * + aggregate's null-absorbing `+` produce).
  *
  * Why an Expression: Spark's higher-order functions are evaluated by the
  * INTERPRETED expression path (`HigherOrderFunction` has no `doGenCode`),
  * which boxes every lambda variable per element. On a 64-dim dot that is
  * ~130 boxed allocations per PAIR — the dominant cost of the all-pairs
  * embedding near-dup stage at sf0.1 (12.7 s, #2 bench entry in round 5).
  * This expression compiles to a branch-free primitive `while` loop inside
  * whole-stage codegen: same fold, same bits, none of the boxing.
  */
abstract class VecFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def implMethod: String

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"$prettyName requires array<float|double> input, got array<$other>")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val res = if (implMethod == "dot")
      VecMathImpl.dot(l.asInstanceOf[ArrayData], isFloat(left),
        r.asInstanceOf[ArrayData], isFloat(right))
    else
      VecMathImpl.l2sq(l.asInstanceOf[ArrayData], isFloat(left),
        r.asInstanceOf[ArrayData], isFloat(right))
    res // java.lang.Double or null — Catalyst accepts the box for DoubleType
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("fold")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        java.lang.Double $boxed = graft.expressions.VecMathImpl.$implMethod(
          ${leftGen.value}, ${isFloat(left)}, ${rightGen.value}, ${isFloat(right)});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
      }
    """)
  }
}

/** Strict-left-fold dot product: Σᵢ (double)aᵢ · (double)bᵢ. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_dot"
  override protected def implMethod: String = "dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot = copy(newLeft, newRight)
}

/** Strict-left-fold squared L2 distance: Σᵢ ((double)aᵢ − (double)bᵢ)².
  * The square is an explicit multiply (`pow` is not guaranteed bit-identical
  * across engines; `x*x` is).
  */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "graft_vec_l2sq"
  override protected def implMethod: String = "l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq = copy(newLeft, newRight)
}

object VecMathImpl {

  /** Returns null (not NaN) on length mismatch or a null element — the
    * exact contract of the zip_with + aggregate composition this replaces.
    */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def l2sq(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (x - y) * (x - y)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
