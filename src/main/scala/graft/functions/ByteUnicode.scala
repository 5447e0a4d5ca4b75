package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte↔unicode alphabet (Radford et al. 2019; the public
  * `bytes_to_unicode` construction from the reference encoder,
  * restated): byte-level BPE needs every possible byte to be a
  * PRINTABLE, space-free symbol so merge tables serialize as plain
  * text. Bytes that are already printable non-space characters
  * (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves; the remaining 68
  * (controls, space, DEL, the soft-hyphen gap) map, in byte order, to
  * code points 256, 257, … — e.g. space → `Ġ` (U+0120), newline → `Ċ`
  * (U+010A). The map is a bijection, so byte-level tokenization is
  * LOSSLESS: unmap(map(s)) == s for every string, whitespace included —
  * the property the whitespace-splitting word tokenizers (p45/p47)
  * structurally cannot have.
  */
object ByteUnicode {
  /** byteToChar(b & 0xFF) = the mapped code point (all < 0x400). */
  val byteToChar: Array[Char] = {
    val printable = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var next = 256
    (0 until 256).foreach { b =>
      if (printable(b)) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
    }
    out
  }

  private val charToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    (0 until 256).foreach(b => m.put(byteToChar(b), b.toByte))
    m
  }

  /** UTF-8 bytes of `s` → one mapped char each. */
  def mapBytes(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(byteToChar(bs(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Inverse of [[mapBytes]]; characters outside the alphabet raise —
    * feeding a non-byte-mapped string here is a caller bug, and a
    * silent skip would break the lossless contract undetectably.
    */
  def unmapBytes(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = charToByte.get(s.charAt(i))
      require(b != null,
        s"unmapBytes: '${s.charAt(i)}' (U+${s.charAt(i).toInt.toHexString}) " +
          "is not in the byte-unicode alphabet")
      out(i) = b
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  // JVM entry points for codegen
  def mapJ(s: UTF8String): UTF8String =
    UTF8String.fromString(mapBytes(s.toString))
  def unmapJ(s: UTF8String): UTF8String =
    UTF8String.fromString(unmapBytes(s.toString))

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def toUnicode(c: Column): Column =
    ColumnBridge.column(ByteToUnicode(ColumnBridge.expression(c)))
  def toBytes(c: Column): Column =
    ColumnBridge.column(UnicodeToByte(ColumnBridge.expression(c)))
}

/** Column form of [[ByteUnicode.mapBytes]] — stays inside whole-stage
  * codegen as a static call (the BpeSegment pattern).
  */
case class ByteToUnicode(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    ByteUnicode.mapJ(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ByteUnicode.mapJ($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column form of [[ByteUnicode.unmapBytes]]. */
case class UnicodeToByte(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    ByteUnicode.unmapJ(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ByteUnicode.unmapJ($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
