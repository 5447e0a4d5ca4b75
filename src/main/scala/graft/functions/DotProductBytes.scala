package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Dot product of two `array<tinyint>` (int8 quantization code)
  * columns as a native codegen'd expression — the hot kernel of the
  * quantized ANN candidate scan ([[graft.pipeline.Similarity
  * .quantizedRescoreTopK]]).
  *
  * Works directly on the byte codes: no cast of the whole array to
  * `array<double>` per pair (which materialized a fresh 8×-larger
  * array in the inner join loop). Accumulates in LONG — exact: |codes|
  * ≤ 127, so each term ≤ 16129 and 2⁶³ overflows only past ~5·10¹⁴
  * elements — and integer math makes the result trivially
  * bit-reproducible against the SQL oracle, with no floating
  * summation-order caveats at all.
  */
case class DotProductBytes(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductBytes {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductBytes(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
