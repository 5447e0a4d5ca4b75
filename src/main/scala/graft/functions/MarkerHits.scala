package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements present in a fixed marker lexicon (with
  * multiplicity) — the language-ID scoring kernel.
  *
  * Replaces the round-3 `size(filter(toks, t => array_contains(lit_array,
  * t)))` formulation, which rescans the 10-element marker array linearly
  * for every token of every document and for every one of the 4 languages.
  * Here the lexicon is a hashed `java.util.HashSet` built once per task
  * (a codegen reference object), so scoring is one O(1) probe per token.
  * Semantics are identical — multiplicity-preserving membership count —
  * so the DuckDB oracle (`len(list_filter(toks, t -> list_contains(...)))`)
  * still hash-matches; pinned by `RollingHashSemanticsSpec`.
  *
  * Null array → null; null elements don't match (same as array_contains
  * filter, which drops nulls from the filtered result).
  */
case class MarkerHits(child: Expression, markers: Seq[String])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = LongType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("markerSet", set, "java.util.HashSet")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      s"""
         |int $n = $a.numElements();
         |long $hits = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $s.contains($a.getUTF8String($i))) $hits++;
         |}
         |${ev.value} = $hits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerHits {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(toks: Column, markers: Seq[String]): Column =
    ColumnBridge.column(MarkerHits(ColumnBridge.expression(toks), markers))
}
