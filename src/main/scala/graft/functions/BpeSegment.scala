package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword segmentation of a single word under a learned merge table
  * (Sennrich et al. 2016 apply step, greedy lowest-rank-first — the
  * GPT-2/SentencePiece-BPE convention): repeatedly merge the adjacent
  * symbol pair with the smallest merge rank until none applies. The
  * merge table rides as a codegen reference object (one hash probe per
  * adjacent pair per round), so encoding stays inside whole-stage
  * codegen as a plain method call — no UDF, no serialization per row.
  *
  * Symbols are Unicode code points (matching
  * [[graft.pipeline.Bpe.trainMerges]]); no end-of-word marker is used on
  * either side, a deliberate simplification documented there. Invariant:
  * concatenating the output subwords always reproduces the input word.
  * Null word → null; empty word → empty array.
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // space char never occurs inside a symbol (tokens are whitespace-split
      // text), so the joined key is unambiguous
      val k = l + " " + r
      if (!m.containsKey(k)) m.put(k, i)
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeSegment.segmentJ(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeSegment.segmentJ($a, $r);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {

  /** Code-point split shared with the trainer. */
  def codePoints(s: String): Array[String] =
    s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** The greedy apply loop; static-forwarded so generated code calls it
    * directly. O(rounds × symbols) with one hash probe per adjacent pair
    * per round — words are short, merge counts modest; this is the
    * standard in-memory BPE encoder shape.
    */
  def segmentJ(word: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = word.toString
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    codePoints(s).foreach(parts += _)
    var merged = true
    while (merged && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < parts.length - 1) {
        val r = ranks.get(parts(j) + " " + parts(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) merged = false
      else {
        parts(bestAt) = parts(bestAt) + parts(bestAt + 1)
        parts.remove(bestAt + 1)
      }
    }
    new GenericArrayData(parts.map(p => UTF8String.fromString(p)).toArray[Any])
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(word), merges))
}
