package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** ADC lookup table for one query vector against a flat PQ codebook
  * ([[graft.pipeline.Similarity.pqTopK]] / ivfPqTopK):
  * `lut[j*ksub + c] = Σ_d qv[j*dsub + d] · cb[(j*ksub + c)*dsub + d]`
  * — the partial dot of the query's j-th subvector with centroid c of
  * codebook j, accumulated left-to-right like [[DotProductDouble]] so
  * the values are bit-identical to the relational formulation this
  * replaces (a crossJoin with the codebook + groupBy/collect_list —
  * which SHUFFLED the query frame; this is a pure projection, usable
  * unchanged on a streaming query frame where a pre-stateful-op
  * aggregation is unsupported).
  *
  * `right` is the flat codebook Literal laid out exactly as
  * [[PqEncode]]'s. Throws on a vector whose length contradicts the
  * codebook layout (same guard as PqEncode).
  */
case class PqLut(left: Expression, right: Expression, nSub: Int, ksub: Int)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(vec: Any, cb: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val t = cb.asInstanceOf[ArrayData]
    val dsub = t.numElements() / (nSub * ksub)
    if (v.numElements() != nSub * dsub)
      throw new IllegalArgumentException(
        s"PqLut: vector length ${v.numElements()} != nSub*dsub = ${nSub * dsub}" +
          s" implied by the codebook (nSub=$nSub, ksub=$ksub)")
    val out = new Array[Double](nSub * ksub)
    var j = 0
    while (j < nSub) {
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          acc += v.getDouble(j * dsub + d) * t.getDouble((j * ksub + c) * dsub + d)
          d += 1
        }
        out(j * ksub + c) = acc
        c += 1
      }
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
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $dsub = $t.numElements() / (${nSub * ksub});
         |if ($v.numElements() != $nSub * $dsub) {
         |  throw new IllegalArgumentException(
         |    "PqLut: vector length " + $v.numElements() +
         |    " != nSub*dsub = " + ($nSub * $dsub) +
         |    " implied by the codebook (nSub=$nSub, ksub=$ksub)");
         |}
         |double[] $out = new double[${nSub * ksub}];
         |for (int $j = 0; $j < $nSub; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $acc += $v.getDouble($j * $dsub + $d)
         |        * $t.getDouble(($j * $ksub + $c) * $dsub + $d);
         |    }
         |    $out[$j * $ksub + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqLut {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, flatCodebook: Column, nSub: Int, ksub: Int): Column =
    ColumnBridge.column(
      PqLut(ColumnBridge.expression(vec), ColumnBridge.expression(flatCodebook),
        nSub, ksub))
}
