package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — the
  * canonical-composition pass every hash-keyed text pipeline needs
  * BEFORE dedup/fingerprinting (CCNet/FineWeb discipline): the same
  * visible text can arrive precomposed (`é` U+00E9) or decomposed
  * (`e` + U+0301) and would otherwise carry different content hashes,
  * silently splitting duplicate groups. NFC is the web's dominant
  * form (W3C charmod-norm), is idempotent, and — unlike NFKC — never
  * changes what the text SAYS (no compatibility folding of ligatures,
  * width, or super/subscripts), so it is safe ahead of training-text
  * hashing. `java.text.Normalizer` implements the published Unicode
  * UAX #15 algorithm; DuckDB's `nfc_normalize` is the same published
  * form, which is what makes queries over this expression hash-exact
  * against the oracle. Stays inside whole-stage codegen as a static
  * call (the [[ByteUnicode]] pattern).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfcJ(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcNormalize.nfcJ($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfcJ(s: UTF8String): UTF8String = {
    val str = s.toString
    // isNormalized is a cheap scan; ASCII and already-composed text
    // (the overwhelming majority of a web corpus) skips the allocation
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  }
}
