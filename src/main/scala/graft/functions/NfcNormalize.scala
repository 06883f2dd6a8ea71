package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — Spark has
  * no normalization builtin, yet pretrain text cleaning starts with it
  * (decomposed accents, compatibility forms, mixed-source corpora all
  * hash/dedup differently un-normalized). Semantics are exactly
  * `java.text.Normalizer.normalize(s, NFC)`, which matches the Unicode
  * reference algorithm (and e.g. DuckDB's nfc_normalize — oracle-checked
  * in the x20 catalog entry). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def norm(u: UTF8String): UTF8String = {
    val s = u.toString
    // fast path: already-normalized text (the common case) copies nothing
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
