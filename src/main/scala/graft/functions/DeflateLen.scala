package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string's UTF-8 bytes — the
  * tokenizer-free junk signal the char-entropy gate cannot see alone:
  * a compression RATIO near 1 marks high-entropy payloads masquerading
  * as text (base64/hex blobs, packed binaries), a very low ratio marks
  * machine-generated repetition/templating (the CCNet/Gopher-adjacent
  * heuristic; both tails are junk for LM training). This expression
  * returns only the exact compressed byte count — callers derive the
  * ratio against `octet_length` in exact integer arithmetic, keeping
  * the whole gate hash-stable.
  *
  * Determinism: one `java.util.zip.Deflater` per call with PINNED
  * parameters (level 6, raw/nowrap) — zlib output for a fixed level and
  * strategy is a pure function of the input bytes within a JVM, which
  * is what lets the oracle replay planted inputs as generated literal
  * constants (the p61 pattern). JVM-native (zlib via the JDK), no UDF:
  * the call sits inside whole-stage codegen like [[CharCounts]].
  * Null → null; empty string → 0-byte input, a few header bytes out —
  * callers must guard the ratio's division by octet_length.
  */
case class DeflateLen(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.deflateLenJ(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateLen.deflateLenJ($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {

  /** One native Deflater per executor thread, `reset()` between rows —
    * deflateInit allocates a ~256 KB native window per instance, and a
    * per-row allocate/end pair would dominate the gate's runtime on
    * short documents. `reset()` restores the exact initial stream
    * state, so output stays a pure function of (bytes, level 6, raw).
    */
  private val localDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6, true))

  /** Exact DEFLATE(level 6, raw) output length of the UTF-8 bytes;
    * static-forwarded so generated code calls it directly.
    */
  def deflateLenJ(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}
