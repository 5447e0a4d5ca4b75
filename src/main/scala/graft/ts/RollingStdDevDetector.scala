package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Flag windows with excessive sample standard deviation
  * (`/root/reference/tsod/detectors.py:186-219`). Matches pandas
  * `rolling(window, center).std()`: sample stddev (ddof=1), window only
  * valid with exactly `windowSize` non-null values, centered frame
  * `[-⌊w/2⌋, +⌊(w-1)/2⌋]` when `center`. The first row of each series is
  * forced false (`detectors.py:215`). `fit` learns the max RIGHT-ALIGNED
  * rolling stddev even when the detector itself is centered — an asymmetry
  * of the reference (`detectors.py:206` vs `:212`) preserved for parity.
  */
final case class RollingStdDevDetector(
    windowSize: Int = 10,
    maxStd: Double = Double.PositiveInfinity,
    center: Boolean = true) extends Detector {

  override def contextRows: Int = windowSize // centered/trailing w-row frame

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val v = TsOps.cleanValue(spec)
    val frame =
      if (center) TsOps.centeredFrame(spec.w, windowSize)
      else TsOps.trailingFrame(spec.w, windowSize)
    val std = TsOps.guarded(stddev_samp, v, frame, windowSize)
    val (rn, _) = TsOps.rowNumberAndCount(spec)
    df.withColumn(spec.flag,
      coalesce(std > lit(maxStd), lit(false)) && rn =!= 1)
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): RollingStdDevDetector = {
    validate(df, spec)
    val v = TsOps.cleanValue(spec)
    val std = TsOps.guarded(stddev_samp, v, TsOps.trailingFrame(spec.w, windowSize), windowSize)
    val row = df.select(std.as("__s")).agg(max(col("__s")).as("m")).head()
    if (row.isNullAt(0)) this else copy(maxStd = row.getDouble(0))
  }

  /** Reference display parity (`detectors.py:218-219` __str__; the
    * reference class is named RollingStandardDeviationDetector). */
  override def toString: String =
    s"RollingStdDevDetector(window_size:$windowSize, max_std:${TsOps.pyFloat(maxStd)})"

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("RollingStdDevDetector"),
    "window_size" -> Json.num(windowSize.toDouble),
    "max_std" -> Json.num(maxStd),
    "center" -> JBool(center)))
}

object RollingStdDevDetector {
  def fromJson(j: JValue): RollingStdDevDetector = RollingStdDevDetector(
    j("window_size").num.toInt, j("max_std").num,
    j("center") match { case JBool(b) => b; case _ => true })
}
