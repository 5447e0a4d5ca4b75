package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (Gear/FastCDC rolling hash) — the
  * storage-dedup technique that makes SUB-DOCUMENT duplicate detection
  * insertion-robust: a fixed-width chunker shifts every boundary after
  * an edit, so one inserted sentence re-keys the whole document; a
  * content-defined chunker re-synchronizes within one chunk, so all
  * other chunks keep their hashes and cross-snapshot chunk dedup sees
  * the unchanged remainder. Used for incremental crawl diffing and
  * shared-boilerplate detection below the line/paragraph granularity.
  *
  * Algorithm (over CODE POINTS, so chunk offsets are `substr`-ready on
  * both engines): `h ← (h·2 + gear[cp mod 256]) mod 2^64` per code
  * point; a boundary falls after position p when the chunk reached
  * `maxLen` (force cut — bounds every chunk) or is at least `minLen`
  * with the low `maskBits` bits of h all zero (expected chunk length
  * ≈ 2^maskBits + minLen); h resets at every cut, the re-sync
  * property. The gear table is md5-derived (`md5("gear:" || i)`, first
  * 15 hex digits), so a SQL oracle replays the identical constants —
  * and the 2^64 wrap is exact on both engines (signed-long overflow
  * here ≡ HUGEINT mod 2^64 in SQL; the boundary test only reads low
  * bits). Returns `array<struct<start,len>>` with 1-based code-point
  * offsets; empty/null text → empty/null array. Deterministic, no RNG.
  */
case class GearChunks(child: Expression, minLen: Int, maxLen: Int,
    maskBits: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen: $minLen, $maxLen")
  require(maskBits >= 1 && maskBits <= 48,
    s"maskBits must be in [1,48]: $maskBits")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("len", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    GearChunks.gearChunksJ(input.asInstanceOf[UTF8String],
      minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GearChunks.gearChunksJ(" +
        s"$a, $minLen, $maxLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GearChunks {

  /** 256 md5-derived 60-bit gear constants — the same values the SQL
    * oracle computes with `('0x' || substr(md5('gear:' || i), 1, 15))`.
    */
  private val Gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { i =>
      md.reset()
      val h = md.digest(s"gear:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16)
    }.toArray
  }

  /** Boundary walk; static-forwarded so generated code calls it
    * directly. 1-based code-point offsets.
    */
  def gearChunksJ(s: UTF8String, minLen: Int, maxLen: Int,
      maskBits: Int): ArrayData = {
    val str = s.toString
    val mask = (1L << maskBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var h = 0L
    var chunkStart = 1L
    var p = 0L   // code-point position, 1-based after increment
    var i = 0    // UTF-16 index
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      p += 1
      h = h * 2L + Gear(cp % 256)   // wrapping mod 2^64
      val len = p - chunkStart + 1L
      if (len >= maxLen || (len >= minLen && (h & mask) == 0L)) {
        out += InternalRow(chunkStart, len)
        chunkStart = p + 1L
        h = 0L
      }
    }
    if (chunkStart <= p)
      out += InternalRow(chunkStart, p - chunkStart + 1L)
    new GenericArrayData(out.toArray[Any])
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, minLen: Int, maxLen: Int, maskBits: Int): Column =
    ColumnBridge.column(GearChunks(
      ColumnBridge.expression(text), minLen, maxLen, maskBits))
}
