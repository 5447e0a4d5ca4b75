package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `collect_list` over BIGINTs with a HARD buffer cap — the aggregate
  * that makes a per-key doc-list safe on power-law keys. A plain
  * `collect_list` on an inverted shingle index buffers one entry per
  * occurrence, so a boilerplate shingle present in 10^9 documents
  * builds a multi-GB array in a single aggregation buffer; this
  * aggregate stops appending at `cap` elements (update AND merge), so
  * the buffer is ≤ cap longs regardless of the key's true frequency.
  *
  * Intended use is the dedup pipelines' `maxDf` cutoff with
  * `cap = maxDf + 1`: a group whose RESULT size exceeds maxDf is known
  * to have overflowed (true df ≥ cap) and is filtered out; a surviving
  * group never hit the cap, so it holds EVERY occurrence — which docs
  * were dropped from overflowed groups can depend on shuffle order,
  * but no overflowed group is ever emitted, so output is
  * deterministic. The result array is sorted ascending.
  *
  * Reference behavior being restated ([[graft.pipeline.Dedup]]): the
  * df-count + semi-join + collect formulation — this fuses all three
  * into ONE shuffle of the (doc, shingle) relation.
  */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectLong.Buffer] {

  import CappedCollectLong.Buffer

  require(cap >= 1, s"cap must be >= 1: $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null && buf.size < cap) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    var i = 0
    while (i < b2.size && b1.size < cap) { b1.add(b2.values(i)); i += 1 }
    b1
  }

  override def eval(buf: Buffer): Any = {
    val a = java.util.Arrays.copyOf(buf.values, buf.size)
    java.util.Arrays.sort(a)
    new GenericArrayData(a)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.values(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CappedCollectLong {
  /** Growable primitive long buffer (no boxing on the update path). */
  final class Buffer {
    var values: Array[Long] = new Array[Long](8)
    var size: Int = 0
    def add(v: Long): Unit = {
      if (size == values.length)
        values = java.util.Arrays.copyOf(values, size * 2)
      values(size) = v; size += 1
    }
  }

  /** `capped_collect(v, cap)` as a Column aggregate. */
  def apply(v: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedCollectLong(ColumnBridge.expression(v), cap).toAggregateExpression())
}
