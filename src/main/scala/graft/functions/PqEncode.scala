package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder ([[graft.pipeline.Similarity.pqIndex]]):
  * assigns each of the vector's `nSub` contiguous subvectors to its
  * nearest codebook centroid (squared-L2, strict-less argmin ⇒ lowest
  * centroid id wins ties — deterministic), returning `array<int>` of
  * length `nSub`.
  *
  * `right` is the FLAT codebook laid out
  * `cb[(j * ksub + c) * dsub + d]` — one Literal array, not thousands
  * of expression nodes, so the plan stays small and the whole encode is
  * one codegen'd loop per row (replaces `nSub` spark.ml
  * `KMeansModel.transform` UDF columns: no vector boxing, no UDF
  * serialization, one scan).
  */
case class PqEncode(left: Expression, right: Expression, nSub: Int, ksub: Int)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(vec: Any, cb: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val t = cb.asInstanceOf[ArrayData]
    val dsub = t.numElements() / (nSub * ksub)
    // heterogeneous vector lengths would otherwise silently mis-encode
    // (dsub derived per ROW truncates trailing dims or walks past the
    // codebook layout) — pqIndex validates only the first row, so the
    // encoder itself must reject mismatches
    if (v.numElements() != nSub * dsub)
      throw new IllegalArgumentException(
        s"PqEncode: vector length ${v.numElements()} != nSub*dsub = ${nSub * dsub}" +
          s" implied by the codebook (nSub=$nSub, ksub=$ksub)")
    val out = new Array[Int](nSub)
    var j = 0
    while (j < nSub) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(j * dsub + d) - t.getDouble((j * ksub + c) * dsub + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, t) => {
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dsub = ctx.freshName("dsub")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val out = ctx.freshName("out")
      s"""
         |int $dsub = $t.numElements() / (${nSub * ksub});
         |if ($v.numElements() != $nSub * $dsub) {
         |  throw new IllegalArgumentException(
         |    "PqEncode: vector length " + $v.numElements() +
         |    " != nSub*dsub = " + ($nSub * $dsub) +
         |    " implied by the codebook (nSub=$nSub, ksub=$ksub)");
         |}
         |int[] $out = new int[$nSub];
         |for (int $j = 0; $j < $nSub; $j++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $v.getDouble($j * $dsub + $d)
         |        - $t.getDouble(($j * $ksub + $c) * $dsub + $d);
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, flatCodebook: Column, nSub: Int, ksub: Int): Column =
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(vec), ColumnBridge.expression(flatCodebook),
        nSub, ksub))
}
