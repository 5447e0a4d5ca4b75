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

/** The k SMALLEST BIGINTs per group as a sorted array, with a buffer
  * hard-bounded at k — the aggregate that makes "top-N rows per key"
  * safe on power-law keys. The naive formulation
  * (`row_number() over (partition by key order by rank)`) materializes
  * EVERY row of a key inside one window partition before ranking, so a
  * host with 10^8 documents pins 10^8 rows on one task; this aggregate
  * keeps a size-k max-heap in update AND merge, so the shuffle carries
  * at most k longs per (mapper, key) — partial aggregation does the
  * pruning map-side and the reduce-side state is ≤ k regardless of the
  * key's true cardinality.
  *
  * Top-N-by-anything reduces to this by PACKING the ordering into the
  * long: callers encode (rank, id) as `rank · 2^idBits + id` with both
  * components bounded (see [[graft.pipeline.Sampling.hostCap]]), take
  * the k smallest packed keys, and decode. The result array is sorted
  * ascending, i.e. already in rank order — deterministic whenever the
  * packed ordering is total (distinct packed values), independent of
  * partitioning and merge order.
  */
case class TopKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKLongs.Buffer] {

  import TopKLongs.Buffer

  require(k >= 1, s"k must be >= 1: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.heap(i)); i += 1 }
    b1
  }

  override def eval(buf: Buffer): Any = {
    val a = java.util.Arrays.copyOf(buf.heap, buf.size)
    java.util.Arrays.sort(a)
    new GenericArrayData(a)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.heap(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKLongs {
  /** Fixed-capacity binary MAX-heap over primitive longs: `offer`
    * inserts while under k, then replaces the root only when the
    * candidate is strictly smaller — O(log k) per element, no boxing.
    */
  final class Buffer(k: Int) {
    val heap: Array[Long] = new Array[Long](k)
    var size: Int = 0

    def offer(v: Long): Unit = {
      if (size < k) {
        heap(size) = v; size += 1
        var i = size - 1
        while (i > 0 && heap((i - 1) / 2) < heap(i)) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t
          i = p
        }
      } else if (v < heap(0)) {
        heap(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && heap(l) > heap(m)) m = l
          if (r < size && heap(r) > heap(m)) m = r
          if (m == i) done = true
          else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
        }
      }
    }
  }

  /** `top_k_longs(v, k)` as a Column aggregate (k smallest, sorted). */
  def apply(v: Column, k: Int): Column =
    ColumnBridge.column(
      TopKLongs(ColumnBridge.expression(v), k).toAggregateExpression())
}
