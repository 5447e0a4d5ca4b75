package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables × planesPerTable` hyperplane sign tests of a vector in ONE
  * codegen'd pass: returns `array<long>` of length `tables`, where entry
  * t packs the sign bits of planes `[t·b, (t+1)·b)` — the banded-LSH
  * signature of [[graft.pipeline.Similarity.cosineNearDupPairs]].
  *
  * The composed form (one `DotProductDouble(vec, array(lit...))` per
  * plane) builds 128 expression nodes each dragging a 64-element literal
  * array through codegen — constant-folding and compiling that tree
  * dominated the whole query (measured ~10 s for 10k vectors at the
  * scale smoke). Here the planes live in ONE shared `double[]` reference
  * object and the generated code is two tight primitive loops.
  *
  * Per-plane arithmetic is the identical strict left-to-right dot
  * product (same clamped length, same `>= 0` sign rule), so bucket
  * values are bit-identical to the literal-array form and to the DuckDB
  * oracle's mirrored banding.
  */
case class HyperplaneBuckets(child: Expression, tables: Int,
    planesPerTable: Int, dim: Int) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planes: Array[Double] =
    HyperplaneBuckets.planesFlat(tables * planesPerTable, dim)

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    // STRICT dimension check: silently clamping (min(len, dim)) would
    // truncate longer vectors and zero-pad shorter ones, voiding the
    // stated recall guarantees without any error — a mismatch here is a
    // caller bug and must be loud.
    if (x.numElements() != dim)
      throw new IllegalArgumentException(
        s"HyperplaneBuckets: vector has ${x.numElements()} dims, expected $dim")
    val n = dim
    val out = new Array[Long](tables)
    val nPlanes = tables * planesPerTable
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val base = p * dim
      var d = 0
      while (d < n) { acc += x.getDouble(d) * planes(base + d); d += 1 }
      if (acc >= 0) out(p / planesPerTable) |= 1L << (p % planesPerTable)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "HyperplaneBuckets: vector has " + $x.numElements() + " dims, expected " + $dim);
         |}
         |int $n = $dim;
         |long[] $out = new long[$tables];
         |for (int $p = 0; $p < ${tables * planesPerTable}; $p++) {
         |  double $acc = 0.0;
         |  int $base = $p * $dim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $x.getDouble($d) * $pl[$base + $d];
         |  }
         |  if ($acc >= 0.0) $out[$p / $planesPerTable] |= 1L << ($p % $planesPerTable);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import java.security.MessageDigest

  /** Deterministic pseudo-random hyperplane component grid: plane p,
    * component d = (md5("plane:p:d") first 6 bytes % 2001 - 1000) / 1000
    * — reproducible in any engine from the md5 formula alone (the DuckDB
    * oracle mirrors it in SQL).
    */
  def planesFlat(nPlanes: Int, dim: Int): Array[Double] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var d = 0
      while (d < dim) {
        val h = md.digest(s"plane:$p:$d".getBytes("UTF-8"))
        val v = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
          ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
        out(p * dim + d) = (v % 2001 - 1000) / 1000.0
        d += 1
      }
      p += 1
    }
    out
  }

  def hyperplane(p: Int, dim: Int): Array[Double] = {
    val flat = planesFlat(p + 1, dim)
    java.util.Arrays.copyOfRange(flat, p * dim, (p + 1) * dim)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(vec), tables, planesPerTable, dim))
}
