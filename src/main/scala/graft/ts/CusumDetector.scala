package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
import graft.util.Json
import graft.util.Json._

/** Two-sided CUSUM changepoint detector (Page 1954; engine extension, no
  * reference counterpart): per series it maintains the classic cumulative
  * sums
  *
  *   S⁺_t = max(0, S⁺_{t-1} + x_t − (target + slack))
  *   S⁻_t = max(0, S⁻_{t-1} − x_t + (target − slack))
  *
  * and flags a sample when either sum exceeds `threshold` — a sustained
  * drift above/below `target` accumulates until it trips, which catches
  * level shifts far smaller than any single-point rule can (the
  * complement of RangeDetector's static bounds and EWMA's forecast
  * deviation).
  *
  * Like [[EwmaDetector]] the recursion is not a window frame, so it runs
  * as the same one-linear-scan-per-series mapPartitions shape with O(1)
  * state that resets on series change (SURVEY.md "(d) mapPartitions as a
  * last resort"). Nulls pass through unflagged without touching the
  * sums. Arithmetic is ordered exactly as the DuckDB oracle's
  * `list_reduce` — `(acc + x) − hi` / `(acc − x) + lo` — so flags are
  * hash-reproducible.
  */
final case class CusumDetector(
    target: Double = 0.0,
    slack: Double = 0.0,
    threshold: Double = Double.PositiveInfinity) extends Detector {

  require(slack >= 0.0, "slack must be non-negative")
  require(threshold > 0.0, "threshold must be positive")

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val inCols = df.columns.toSeq
    val withV = df.withColumn("__v", TsOps.cleanValue(spec))
    val arranged =
      (if (spec.seriesId.isEmpty) withV.repartition(1)
       else withV.repartition(spec.seriesId.map(col): _*))
        .sortWithinPartitions((spec.seriesId ++ spec.orderBy).map(col): _*)
    val schema = StructType(arranged.schema.fields :+
      StructField(spec.flag, BooleanType, nullable = false))
    val keyIdx = spec.seriesId.map(arranged.schema.fieldIndex)
    val vIdx = arranged.schema.fieldIndex("__v")
    val hi = target + slack
    val lo = target - slack
    val thr = threshold
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    arranged.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var sHi = 0.0
      var sLo = 0.0
      rows.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; sHi = 0.0; sLo = 0.0 }
        val v: java.lang.Double = if (r.isNullAt(vIdx)) null else r.getDouble(vIdx)
        var anomaly = false
        if (v != null) {
          sHi = math.max(0.0, sHi + v.doubleValue() - hi)
          sLo = math.max(0.0, sLo - v.doubleValue() + lo)
          anomaly = sHi > thr || sLo > thr
        }
        Row.fromSeq(r.toSeq :+ anomaly)
      }
    }.toDF().select((inCols :+ spec.flag).map(col): _*)
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("CusumDetector"),
    "target" -> Json.num(target),
    "slack" -> Json.num(slack),
    "threshold" -> Json.num(threshold)))
}

object CusumDetector {
  def fromJson(j: JValue): CusumDetector =
    CusumDetector(j("target").num, j("slack").num, j("threshold").num)
}
