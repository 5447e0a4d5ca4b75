package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row code-point histogram of a string: a `map<string, long>` from
  * each distinct character (full Unicode code point — the same unit
  * DuckDB's `regexp_extract_all(text, '[\s\S]')` yields, so the counts
  * are engine-identical) to its occurrence count, in ONE pass over the
  * UTF-8 bytes.
  *
  * This is the explode-killer for character-distribution statistics
  * ([[graft.pipeline.Quality.charEntropy]]): the naive relational form
  * explodes EVERY character (~hundreds of rows per document) into a
  * (doc, char) aggregate — two shuffles and an 840M-row explode at the
  * 2M-doc smoke — where the histogram bounds the per-document payload
  * by the ALPHABET size and the downstream entropy fold becomes a pure
  * projection with no shuffle at all. Map iteration order is
  * unspecified, which is exactly why the caller must fold with
  * order-free integer arithmetic (the established micro-quantization
  * discipline).
  *
  * UTF-8 walk shares [[RollingHash]]'s truncation guard: a dangling
  * multi-byte lead counts as a lone code point instead of reading past
  * the buffer. Eval-only (CodegenFallback): one call per ROW — unlike
  * the per-window [[CharWindowHashes]] there is no inner hot loop for
  * codegen to win back, and the HashMap build dominates either way.
  */
case class CharCounts(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
  with CodegenFallback {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CharCounts.histogram(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression)
      : CharCounts = copy(child = newChild)
}

object CharCounts {

  private[graft] def histogram(s: UTF8String): ArrayBasedMapData = {
    val b = s.getBytes
    val nb = b.length
    val counts = new java.util.LinkedHashMap[Long, Long]()
    var i = 0
    while (i < nb) {
      val b0 = b(i) & 0xFF
      var cp = 0L
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 >= 0xC0 && b0 < 0xE0 && i + 1 < nb) {
        cp = ((b0 & 0x1F) << 6) | (b(i + 1) & 0x3F); len = 2
      } else if (b0 >= 0xE0 && b0 < 0xF0 && i + 2 < nb) {
        cp = ((b0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        len = 3
      } else if (b0 >= 0xF0 && b0 < 0xF5 && i + 3 < nb) {
        cp = ((b0 & 0x07).toLong << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        len = 4
        // 0xF4 leads can still decode past U+10FFFF (trail > 0x8F);
        // Character.toChars would throw — fall back to the lone-lead
        // treatment so garbage bytes can never crash the query
        if (cp > 0x10FFFF) { cp = b0; len = 1 }
      } else { cp = b0 } // truncated/invalid lead (incl. 0xF5-0xFF):
      // lone code point, no overrun, never throws
      counts.merge(cp, 1L, (a, x) => a + x)
      i += len
    }
    val n = counts.size()
    val keys = new Array[AnyRef](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(
        new String(Character.toChars(e.getKey.toInt)))
      vals(k) = e.getValue
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(s: Column): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(s)))
}
