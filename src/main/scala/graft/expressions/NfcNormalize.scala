package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the text
  * CANONICALIZATION step a training corpus needs before any hash-based
  * operator touches it: the same visible string in composed ("é") and
  * decomposed ("e" + U+0301) form hashes differently, so exact dedup,
  * shingling, minhash and fingerprinting all silently miss duplicates
  * across sources that disagree on normalization form. The reference has
  * no text surface (its payloads are field-level), so this is part of the
  * declared training-data extension inventory.
  *
  * Spark has no normalization builtin; the alternatives are a Scala UDF
  * (serialization + codegen break) or this: an `Expression` whose
  * `doGenCode` emits a direct static call, staying inside whole-stage
  * codegen. The already-normalized fast path (`Normalizer.isNormalized` —
  * always true for pure-ASCII text) returns the input UTF8String untouched,
  * so the common case costs one String materialization and a scan, with no
  * re-encode.
  *
  * NFC (not NFKC) on purpose: NFC is the W3C/canonical-equivalence form and
  * is loss-free; NFKC folds compatibility characters (ligatures, width
  * variants) and belongs in a lossy cleaning profile, not the default
  * canonicalization. The DuckDB oracle's `nfc_normalize` replays this
  * exactly (both implement Unicode normalization, which is
  * implementation-independent by spec).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalizeImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeImpl {
  def normalize(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
