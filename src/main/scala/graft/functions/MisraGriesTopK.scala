package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitter summary over a string column —
  * the candidate generator that makes "all n-grams with count ≥ T"
  * computable WITHOUT shuffling the full gram tail. A plain
  * `groupBy(gram).count()` moves every distinct gram across the wire
  * (at crawl scale the tail is ~the corpus itself); this aggregate
  * keeps at most `capacity` counters per partial buffer, so the only
  * thing that ever leaves a partition is a ≤ capacity-entry summary.
  *
  * Guarantee (Misra-Gries '82; merge rule and proof from Agarwal et
  * al., "Mergeable Summaries", PODS '12): after any sequence of
  * updates and merges over n total items, every stored count
  * undercounts its item's true frequency by at most n/(capacity+1),
  * and any item NOT stored has true frequency ≤ n/(capacity+1).
  * Hence every item with true count > n/(capacity+1) is guaranteed
  * present — the summary is a provable SUPERSET of the
  * minCount-heavy items whenever minCount > n/(capacity+1), which
  * [[graft.pipeline.HeavyHitters]] enforces as a loud post-hoc
  * certificate (n rides the same aggregate as a `count(1)`).
  * A second exact-count pass over just the candidates (broadcast
  * equality join, then the groupBy touches ONLY candidate grams)
  * removes the false positives, so the final relation is exact and
  * deterministic — the sketch only ever decides what gets verified.
  *
  * update is amortized O(1): a decrement-all pass costs O(size) but
  * removes `size` total count mass that `size` prior increments paid
  * for. merge is the PODS '12 rule: sum counts, then subtract the
  * (capacity+1)-th largest count from all and drop the non-positive.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < capacity) buf.put(key, 1L)
      else { // full, unseen key: decrement-all (the arrival is absorbed)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, java.lang.Long],
      b2: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it2 = b2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey,
        if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(b1.size - capacity - 1) // descending rank capacity+1
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(k => UTF8String.fromString(k): Any))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 24 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len); bb.get(kb)
      buf.put(new String(kb, UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesTopK {
  /** `misra_gries(item, capacity)` as a Column aggregate → sorted
    * array<string> of candidate heavy hitters (≤ capacity entries).
    */
  def apply(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
