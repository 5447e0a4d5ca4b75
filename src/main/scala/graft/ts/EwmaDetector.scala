package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
import graft.util.Json
import graft.util.Json._

/** Forecast-deviation detector (engine extension, no reference
  * counterpart): maintains a recursive exponentially-weighted moving
  * average per series (`ewma_t = α·x_t + (1-α)·ewma_{t-1}`, pandas
  * `ewm(adjust=False)` recursion) and flags
  * `|x_t − ewma_{t-1}| > threshold` — a sample is anomalous when it
  * deviates from the smoothed forecast of its own history.
  *
  * The recursion is not expressible as a Spark window frame, so this is
  * the one detector on the imperative path (SURVEY.md's "(d)
  * mapPartitions as a last resort"): repartition by series, sort within
  * partitions by (series, time), then ONE linear scan per partition with
  * O(1) state that resets on series change — the canonical stateful-scan
  * shape that holds at any series count. Nulls pass through unflagged
  * without updating the state; the first sample seeds the average and is
  * never flagged.
  *
  * SCALE WARNING: with an empty `spec.seriesId` the whole frame is one
  * logical series, so the scan necessarily runs in ONE partition
  * (`repartition(1)`) — a global recursion cannot parallelize. That path
  * is for modest single-sensor frames; at cluster scale always provide
  * series keys, which spread the recursion across executors.
  */
final case class EwmaDetector(
    alpha: Double = 0.3,
    threshold: Double = Double.PositiveInfinity) extends Detector {

  require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")

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
    val thr = threshold
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    arranged.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var ewma: java.lang.Double = null
      rows.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; ewma = null }
        val v: java.lang.Double = if (r.isNullAt(vIdx)) null else r.getDouble(vIdx)
        val anomaly = v != null && ewma != null &&
          math.abs(v.doubleValue() - ewma.doubleValue()) > thr
        if (v != null)
          ewma = if (ewma == null) v
            else java.lang.Double.valueOf(a * v + (1 - a) * ewma)
        Row.fromSeq(r.toSeq :+ anomaly)
      }
    }.toDF().select((inCols :+ spec.flag).map(col): _*)
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("EwmaDetector"),
    "alpha" -> Json.num(alpha),
    "threshold" -> Json.num(threshold)))
}

object EwmaDetector {
  def fromJson(j: JValue): EwmaDetector =
    EwmaDetector(j("alpha").num, j("threshold").num)
}
