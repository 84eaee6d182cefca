package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

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

  /** Element accessor kind for [[VecMathImpl]]: 0=double 1=float 2=long
    * 3=int 4=short 5=byte. Integral elements promote exactly as the old
    * `x.cast("double")` inside zip_with did, so callers feeding integer
    * embedding columns (the composition's tolerance) keep working.
    */
  private def elemKind(e: Expression): Int = e.dataType match {
    case ArrayType(DoubleType, _)  => 0
    case ArrayType(FloatType, _)   => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _)   => 4
    case ArrayType(ByteType, _)    => 5
    case _ => -1
  }

  /** Analysis-time contract (not a mid-job ClassCastException): both inputs
    * must be arrays of a primitive numeric type.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemKind(left) >= 0 && elemKind(right) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<numeric> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val res = if (implMethod == "dot")
      VecMathImpl.dot(l.asInstanceOf[ArrayData], elemKind(left),
        r.asInstanceOf[ArrayData], elemKind(right))
    else
      VecMathImpl.l2sq(l.asInstanceOf[ArrayData], elemKind(left),
        r.asInstanceOf[ArrayData], elemKind(right))
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
          ${leftGen.value}, ${elemKind(left)}, ${rightGen.value}, ${elemKind(right)});
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

  /** Read element i promoted to double; `kind` is the loop-invariant code
    * from `VecFold.elemKind` (a tableswitch the JIT hoists/predicts — the
    * hot float/double cases cost one branch, no boxing).
    */
  @inline private def elem(a: ArrayData, kind: Int, i: Int): Double = kind match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  /** Returns null (not NaN) on length mismatch or a null element — the
    * exact contract of the zip_with + aggregate composition this replaces.
    */
  def dot(a: ArrayData, aKind: Int, b: ArrayData, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, aKind, i) * elem(b, bKind, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def l2sq(a: ArrayData, aKind: Int, b: ArrayData, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, aKind, i) - elem(b, bKind, i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
