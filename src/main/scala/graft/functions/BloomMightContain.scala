package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a 64-bit key column — the
  * crawl-frontier fast path: "is this key DEFINITELY new?" answered
  * from an in-memory sketch with zero index I/O. The sketch rides as a
  * codegen reference object (it is broadcast with the serialized plan,
  * the same way join bloom filters ship), so the probe is one
  * `mightContainLong` call inside whole-stage codegen — no UDF.
  *
  * Contract: NO false negatives — a key that was put can never probe
  * false, so gating an exact lookup behind this filter cannot lose a
  * duplicate; false positives (rate set at build time) only cost a
  * wasted exact confirm. Build and probe must hash the SAME way:
  * [[graft.pipeline.Dedup.buildExactBloom]] builds over
  * `xxhash64(content_hash)` and this expression probes the same
  * column expression.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bf = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(key: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), bloom))
}
