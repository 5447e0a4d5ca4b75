package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Flag abrupt per-second rates of change
  * (`/root/reference/tsod/detectors.py:282-324` + `base.py:82-90`).
  * `gradient_t = (x_t - x_{t-1}) / Δt_t` with Δt in seconds; the head of
  * each series (null gradient) is never an anomaly. `fit` learns
  * `max(|gradient|)`. The reference eagerly asserts a strictly increasing
  * index on every call; at scale that is an extra full scan, so here it is
  * the opt-in `Detector.assertStrictlyIncreasing`.
  */
final case class GradientDetector(
    maxGradient: Double = Double.PositiveInfinity,
    direction: String = "both") extends Detector {

  Directions.check(direction)

  override def contextRows: Int = 1 // lag(1) value + ts

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val g = TsOps.gradient(spec)
    val cond = direction match {
      case "both" => abs(g) > lit(maxGradient)
      case "positive" => g > lit(maxGradient)
      case "negative" => g < -lit(maxGradient)
    }
    df.withColumn(spec.flag, coalesce(cond, lit(false)))
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): GradientDetector = {
    validate(df, spec)
    val row = df.select(abs(TsOps.gradient(spec)).as("__g"))
      .agg(max(col("__g")).as("m")).head()
    if (row.isNullAt(0)) this else copy(maxGradient = row.getDouble(0))
  }

  /** Reference display parity (`detectors.py:320-324` __str__ — per HOUR). */
  override def toString: String =
    s"GradientDetector(${TsOps.pyFloat(maxGradient * 3600.0)}/hr, direction:$direction)"

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("GradientDetector"),
    "max_gradient" -> Json.num(maxGradient),
    "direction" -> JStr(direction)))
}

object GradientDetector {
  def fromJson(j: JValue): GradientDetector =
    GradientDetector(j("max_gradient").num, j("direction").str)
}
