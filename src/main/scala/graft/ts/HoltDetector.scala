package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
import graft.util.Json
import graft.util.Json._

/** Double-exponential (Holt) forecast-deviation detector (engine
  * extension, no reference counterpart — the trend-aware sibling of
  * [[EwmaDetector]]): maintains level `s` and trend `b` per series
  *
  *   s_t = α·x_t + (1−α)·(s_{t−1} + b_{t−1})
  *   b_t = β·(s_t − s_{t−1}) + (1−β)·b_{t−1}
  *
  * and flags `|x_t − (s_{t−1} + b_{t−1})| > threshold` — deviation from
  * the one-step-ahead forecast. On a steadily trending series the plain
  * EWMA lags and flags every sample; Holt's trend term follows the ramp
  * and flags only genuine departures from it.
  *
  * Same imperative path as EWMA (the recursion has no window-frame
  * form): repartition by series, sort within partitions, one linear
  * scan with O(2 doubles) state resetting on series change. The first
  * non-null sample seeds `s = x, b = 0` and is never flagged; nulls
  * pass through unflagged without touching the state. Same
  * single-series SCALE WARNING as [[EwmaDetector]]: empty
  * `spec.seriesId` means one partition; the streaming form
  * ([[graft.streaming.StreamingDetectors.holtStream]]) carries the
  * identical arithmetic with O(1) state.
  */
final case class HoltDetector(
    alpha: Double = 0.3,
    beta: Double = 0.1,
    threshold: Double = Double.PositiveInfinity) extends Detector {

  require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")

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
    val a = alpha
    val be = beta
    val thr = threshold
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    arranged.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var seeded = false
      var s = 0.0
      var b = 0.0
      rows.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; seeded = false; s = 0.0; b = 0.0 }
        val v: java.lang.Double = if (r.isNullAt(vIdx)) null else r.getDouble(vIdx)
        val anomaly = v != null && seeded &&
          math.abs(v.doubleValue() - (s + b)) > thr
        if (v != null) {
          if (!seeded) { s = v.doubleValue(); b = 0.0; seeded = true }
          else {
            val s1 = a * v.doubleValue() + (1 - a) * (s + b)
            b = be * (s1 - s) + (1 - be) * b
            s = s1
          }
        }
        Row.fromSeq(r.toSeq :+ anomaly)
      }
    }.toDF().select((inCols :+ spec.flag).map(col): _*)
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("HoltDetector"),
    "alpha" -> Json.num(alpha),
    "beta" -> Json.num(beta),
    "threshold" -> Json.num(threshold)))
}

object HoltDetector {
  def fromJson(j: JValue): HoltDetector =
    HoltDetector(j("alpha").num, j("beta").num, j("threshold").num)
}
