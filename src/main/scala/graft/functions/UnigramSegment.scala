package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword segmentation (Kudo 2018, "Subword Regularization",
  * §3 decoding): Viterbi best path over the piece lattice — the
  * segmentation maximizing Σ log p(piece), i.e. minimizing the integer
  * cost Σ negLogProbMicro. The model rides as a codegen reference
  * object (piece → cost in micro-nats, quantized by the trainer so
  * scoring is integer and platform-independent); encoding is a plain
  * method call inside whole-stage codegen — no UDF.
  *
  * Coverage: every single code point is scoreable — pieces absent from
  * the model fall back to `unkCostMicro` at length 1, so any input
  * segments. Tie-break is deterministic: lower cost, then LONGER piece
  * (the SentencePiece preference for fewer pieces), resolved
  * left-to-right by the DP order. Invariant: concatenating the output
  * pieces reproduces the input word. Null → null; empty → empty array.
  */
case class UnigramSegment(child: Expression, model: Seq[(String, Long)],
    unkCostMicro: Long, maxPieceLen: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegment.segmentJ(input.asInstanceOf[UTF8String], costs,
      unkCostMicro, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("unigramCosts", costs, "java.util.HashMap")
      s"${ev.value} = graft.functions.UnigramSegment.segmentJ($a, $m, ${unkCostMicro}L, $maxPieceLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {

  /** Viterbi over code points; static-forwarded for generated code.
    * O(len × maxPieceLen) probes per word.
    */
  def segmentJ(word: UTF8String, costs: java.util.HashMap[String, java.lang.Long],
      unkCostMicro: Long, maxPieceLen: Int): ArrayData = {
    val cps = BpeSegment.codePoints(word.toString)
    val n = cps.length
    if (n == 0)
      return new GenericArrayData(Array.empty[Any])
    // prefix sums of code-point string offsets via cumulative concat —
    // build the raw string once, slice by code-point index
    val best = new Array[Long](n + 1)
    val bestLen = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var len = 1
      val maxL = math.min(i, maxPieceLen)
      while (len <= maxL) {
        if (best(i - len) != Long.MaxValue) {
          val sb = new java.lang.StringBuilder()
          var k = i - len
          while (k < i) { sb.append(cps(k)); k += 1 }
          val piece = sb.toString
          val c = costs.get(piece)
          val cost: Long =
            if (c != null) c.longValue()
            else if (len == 1) unkCostMicro
            else -1L
          if (cost >= 0L) {
            val cand = best(i - len) + cost
            if (cand < best(i) || (cand == best(i) && len > bestLen(i))) {
              best(i) = cand
              bestLen(i) = len
            }
          }
        }
        len += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = bestLen(p)
      val sb = new java.lang.StringBuilder()
      var k = p - l
      while (k < p) { sb.append(cps(k)); k += 1 }
      out += sb.toString
      p -= l
    }
    new GenericArrayData(
      out.reverseIterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(word: Column, model: Seq[(String, Long)], unkCostMicro: Long,
      maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(word), model,
      unkCostMicro, maxPieceLen))
}
