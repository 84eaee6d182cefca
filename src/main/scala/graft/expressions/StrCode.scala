package graft.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `str -> str-code` (DVH code standard,
  * `/root/reference/src/transform.py:33-46`) as a native Catalyst expression.
  *
  * Semantics (identical to the 6-step builtin chain it replaces, by
  * construction — see [[StrCodeImpl.convert]] and the equivalence property
  * spec): NULL → "UKJENT"; strip edge whitespace; interior whitespace runs →
  * `_`; uppercase; Æ→A Ø→O Å→AA; drop anything outside `[0-9A-Z_]`;
  * empty → "UKJENT".
  *
  * Why an Expression instead of the `regexp_replace` composition: one fused
  * pass per row instead of six regex executions with five intermediate
  * UTF8Strings; `doGenCode` emits a direct static call, so the operator
  * stays inside whole-stage codegen with no interpreted fallback and no
  * UDF serialization.
  */
case class StrCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_str_code"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    StrCodeImpl.convert(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = graft.expressions.StrCodeImpl.convert(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): StrCode =
    copy(child = newChild)
}

object StrCodeImpl {

  private val Ukjent = UTF8String.fromString("UKJENT")

  /** Python `str.split()` whitespace (`/root/reference/src/transform.py:44`
    * uses argless `split()`, which splits on UNICODE whitespace, not just
    * ASCII `\s`). Java's `Character.isWhitespace` covers the same set except
    * four characters it deliberately excludes as "non-breaking": NEL U+0085,
    * NBSP U+00A0, figure space U+2007, narrow NBSP U+202F -- Python treats
    * all four as whitespace, so they are added back explicitly.
    */
  @inline private def isWs(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == 0x85.toChar || c == 0xA0.toChar || c == 0x2007.toChar || c == 0x202F.toChar

  /** Single-allocation rewrite. Order of operations mirrors the chain:
    * edge-trim + collapse-to-`_` first (on the raw string), THEN uppercase
    * (full-string `toUpperCase(Locale.ROOT)`, so 1:N mappings like ß→SS
    * behave exactly like the builtin `upper`), then fold + strip.
    */
  def convert(input: UTF8String): UTF8String = {
    if (input == null) return Ukjent
    val s = input.toString
    // pass 1: trim edges, collapse interior \s+ runs to a single '_'
    val collapsed = new java.lang.StringBuilder(s.length)
    var pendingUs = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (collapsed.length > 0) pendingUs = true }
      else {
        if (pendingUs) { collapsed.append('_'); pendingUs = false }
        collapsed.append(c)
      }
      i += 1
    }
    // pass 2: uppercase (locale-stable), fold Norwegian letters, strip
    val upper = collapsed.toString.toUpperCase(Locale.ROOT)
    val out = new java.lang.StringBuilder(upper.length)
    i = 0
    while (i < upper.length) {
      val c = upper.charAt(i)
      c match {
        case 'Æ' => out.append('A')
        case 'Ø' => out.append('O')
        case 'Å' => out.append("AA")
        case _ =>
          if ((c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || c == '_') out.append(c)
      }
      i += 1
    }
    if (out.length == 0) Ukjent else UTF8String.fromString(out.toString)
  }
}
