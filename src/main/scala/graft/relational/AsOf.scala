package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the single right
  * row with the latest `tsCol <= left.tsCol` (direction "backward", the
  * default — sensor enrichment, "state as of this event"), or the
  * earliest `tsCol >= left.tsCol` ("forward"), per join key. The same
  * operation as pandas `merge_asof` on a sorted frame.
  *
  * SCALE SHAPE — this is deliberately NOT a join node. A range/theta
  * join (`r.ts <= l.ts` + row_number) makes every in-bucket pair a
  * candidate: quadratic in the per-key row count, and Spark plans it
  * as a broadcast-nested-loop when the equi-key is absent. Instead the
  * two sides UNION into one stream tagged left/right, shuffled ONCE on
  * the key, sorted ONCE on (ts, tag, id), and a running
  * `last(_, ignoreNulls)` window carries the right payload forward to
  * each left row: O(n log n) per partition, one Exchange + one Sort in
  * the physical plan (asserted by AsOfSpec), and per-key data never
  * concentrates more than the detector windows already do. At 100 TB
  * the window state is one row's payload — constant memory — vs a
  * sort-merge-join's whole-bucket buffering.
  *
  * Determinism: right rows tie-broken by `rightId` — equal (key, ts)
  * groups resolve to the max id for backward (the "last" such row) and
  * the min id for forward, so results are stable under any input
  * order. A left row with no candidate gets NULL carried columns (left
  * join semantics). `tolerance` (a SQL interval literal like
  * "15 minutes") nulls out matches farther than that from the left
  * timestamp, mirroring merge_asof's `tolerance`.
  *
  * Carried columns surface as `<name><suffix>` (default `_r`):
  * the matched timestamp, the right id, and each of `rightVals`.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightId: String, rightVals: Seq[String] = Nil,
      direction: String = "backward", tolerance: Option[String] = None,
      suffix: String = "_r"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val carry = (Seq(tsCol, rightId) ++ rightVals).distinct
    val lOut = left.columns.toSeq
    carry.foreach(c => require(right.columns.contains(c),
      s"right side lacks column '$c'"))

    // one tagged stream: left rows keep their columns (right-carried
    // slots null); right rows null-fill left payload and expose the
    // carried slots. Tags order right rows before left for backward
    // (inclusive <=) and after left for forward (inclusive >=).
    val rightTag = if (direction == "backward") 0 else 2
    val ridT = right.schema(rightId).dataType
    val lExpr: Seq[Column] =
      lOut.map(col) ++
        Seq(lit(1).as("__tag"), lit(null).cast(ridT).as("__rid")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(c + suffix))
    val rExpr: Seq[Column] =
      lOut.map { c =>
        if (keys.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++
        Seq(lit(rightTag).as("__tag"), col(rightId).cast(ridT).as("__rid")) ++
        carry.map(c => col(c).as(c + suffix))
    val u = left.select(lExpr: _*).union(right.select(rExpr: _*))

    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__rid").asc_nulls_first)
    val matched: Seq[Column] =
      if (direction == "backward") {
        val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry.map(c => last(col(c + suffix), ignoreNulls = true).over(w).as(c + suffix))
      } else {
        val w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry.map(c => first(col(c + suffix), ignoreNulls = true).over(w).as(c + suffix))
      }
    val joined = u
      .select((lOut.map(col) :+ col("__tag")) ++ matched: _*)
      .filter(col("__tag") === 1)
      .drop("__tag")

    tolerance match {
      case None => joined
      case Some(tol) =>
        // a match farther than `tol` from the left timestamp is no match
        val matchedTs = col(tsCol + suffix)
        val valid =
          if (direction == "backward") matchedTs >= col(tsCol) - expr(s"INTERVAL $tol")
          else matchedTs <= col(tsCol) + expr(s"INTERVAL $tol")
        joined.select(lOut.map(col) ++ carry.map(c =>
          when(valid, col(c + suffix)).otherwise(lit(null)).as(c + suffix)): _*)
    }
  }
}
