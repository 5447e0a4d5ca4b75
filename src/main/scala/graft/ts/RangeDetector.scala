package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Flag values outside `[minValue, maxValue]`
  * (`/root/reference/tsod/detectors.py:58-136`). Nulls (the reference's
  * NaNs) are never anomalies. One-sided checks use ±∞ defaults exactly like
  * the reference; `fit` sets the bounds to exact quantiles of the training
  * data (default quantiles `[0, 1]` = min/max), computed with Spark's exact
  * `percentile` (linear interpolation — same rule as `np.nanquantile`).
  */
final case class RangeDetector(
    minValue: Double = Double.NegativeInfinity,
    maxValue: Double = Double.PositiveInfinity,
    quantiles: (Double, Double) = (0.0, 1.0)) extends Detector {

  require(quantiles._1 >= 0.0 && quantiles._1 <= 1.0, "quantiles must be in [0, 1]")
  require(quantiles._2 >= 0.0 && quantiles._2 <= 1.0, "quantiles must be in [0, 1]")

  override def contextRows: Int = 0 // pure per-row compare

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val v = TsOps.cleanValue(spec)
    df.withColumn(spec.flag,
      coalesce(v < lit(minValue) || v > lit(maxValue), lit(false)))
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): RangeDetector = {
    validate(df, spec)
    val v = TsOps.cleanValue(spec)
    val row = df.agg(
      percentile(v, lit(quantiles._1)).as("lo"),
      percentile(v, lit(quantiles._2)).as("hi")).head()
    if (row.isNullAt(0) || row.isNullAt(1)) this
    else {
      val (lo, hi) = (row.getDouble(0), row.getDouble(1))
      copy(minValue = math.min(lo, hi), maxValue = math.max(lo, hi))
    }
  }

  /** Sketch-based fit for petabyte training frames: exact `percentile`
    * is a global sort-aggregate, while `percentile_approx` (KLL-style
    * sketch) is one mergeable pass. `accuracy` trades memory for error
    * (1/accuracy relative rank error) — use where thresholds tolerate
    * approximation; the reference's exact semantics stay in [[fit]].
    */
  def fitApprox(df: DataFrame, spec: SeriesSpec = SeriesSpec(),
      accuracy: Int = 10000): RangeDetector = {
    validate(df, spec)
    val v = TsOps.cleanValue(spec)
    val row = df.agg(
      percentile_approx(v, lit(quantiles._1), lit(accuracy)).as("lo"),
      percentile_approx(v, lit(quantiles._2), lit(accuracy)).as("hi")).head()
    if (row.isNullAt(0) || row.isNullAt(1)) this
    else {
      val (lo, hi) = (row.getDouble(0), row.getDouble(1))
      copy(minValue = math.min(lo, hi), maxValue = math.max(lo, hi))
    }
  }

  /** Reference display parity (`detectors.py:135-136` __repr__). */
  override def toString: String =
    s"RangeDetector(min: ${TsOps.pyExp(minValue)}, max: ${TsOps.pyExp(maxValue)})"

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("RangeDetector"),
    "min_value" -> Json.num(minValue),
    "max_value" -> Json.num(maxValue),
    "quantiles" -> JArr(Seq(JNum(quantiles._1), JNum(quantiles._2)))))
}

object RangeDetector {
  def fromJson(j: JValue): RangeDetector = RangeDetector(
    j("min_value").num, j("max_value").num,
    (j("quantiles").arr(0).num, j("quantiles").arr(1).num))
}
