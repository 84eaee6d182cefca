package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram polynomial rolling hashes of a string in ONE O(len) pass —
  * the fingerprint feed for the winnowing family ([[WinnowSelect]],
  * `Dedup.winnowingFingerprints/…Positions`).
  *
  * Replaces the `transform(sequence(1, m), i -> hash32(substr(text, i, k)))`
  * composition, which is O(len · k) md5 work executed in an INTERPRETED
  * higher-order-function lambda (no codegen, no CSE — the repo's documented
  * HOF trap). Measured at sf0.1 the interpreted md5 pass dominated the
  * winnowing gates (~90% of `x_dedup_exact_spans`' wall at k=33).
  *
  * Hash: h(i) = Σ_{j=0..k-1} cp(i+j) · B^(k−1−j) mod M over Unicode CODE
  * POINTS with B = 257, M = 1_000_000_007 — the same portable family as
  * `TextAnalysis.rollingFingerprint`, replayed exactly in the DuckDB
  * oracles via `(acc * 257 + ascii(substr(text, j, 1))) % 1000000007`
  * folds (DuckDB `substr`/`ascii` operate on code points; so does this
  * expression — NOT UTF-16 units — so supplementary-plane text hashes
  * identically in both engines).
  *
  * Null text yields an EMPTY array (bit-compatible with the
  * `when(m > 0, …).otherwise(array())` composition it replaces, whose
  * null-condition branch also produced the empty array).
  *
  * Output values sit in [0, M): the winnowing window-min comparisons and
  * the df-keyed posting joins downstream are hash-value-agnostic, so the
  * only semantic change vs the md5 feed is WHICH k-grams collide — a
  * quality-neutral swap (both are uniform 30-bit-scale families) that the
  * gates' oracles replay exactly.
  */
case class KgramHash(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kgram_hash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    KgramHashImpl.compute(child.eval(input).asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.expressions.KgramHashImpl.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $k);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): KgramHash =
    copy(child = newChild)
}

object KgramHashImpl {

  final val B = 257L
  final val M = 1000000007L

  private val Empty = new GenericArrayData(Array.empty[Long])

  /** One pass: decode code points once into a scratch array, seed the first
    * window with the direct fold, then slide — subtract the leaving code
    * point's B^(k−1) term, multiply by B, add the entering one. All
    * intermediates stay under 2^51 (cp ≤ 0x10FFFF, h < M), so the modular
    * arithmetic is exact in Long.
    */
  /** Decode a string to its code-point array — shared with the span
    * verification walk ([[graft.operators.Dedup]]), which must index by
    * the SAME units as the hash positions (code points, not UTF-16).
    */
  def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0; var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    cps
  }

  def compute(input: UTF8String, k: Int): ArrayData = {
    if (input == null) return Empty
    val s = input.toString
    val cps = codePoints(s)
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return Empty
    // B^(k-1) mod M
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk = bk * B % M; e += 1 }
    val out = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + cps(j)) % M; j += 1 }
    out(0) = h
    var i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * bk % M + M) % M * B + cps(i + k - 1)) % M
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
