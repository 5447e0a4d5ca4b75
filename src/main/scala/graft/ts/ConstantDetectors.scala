package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Flag flat-lined (stuck-sensor) stretches
  * (`/root/reference/tsod/detectors.py:222-254`): centered rolling max-min
  * spread below `threshold` (windows with nulls or at series edges never
  * flag), first and last rows forced false, then a one-step morphological
  * dilation (the rows immediately before and after every flagged row are
  * also flagged, `detectors.py:243-249`). `fit` is a no-op.
  *
  * The reference computes the rolling extremes with an interpreted
  * `rolling().apply(np.nanmax)` per-window Python callback — here the same
  * semantics are native `max/min OVER frame` window aggregates, which
  * Catalyst evaluates in one pass per frame.
  */
final case class ConstantValueDetector(
    windowSize: Int = 3,
    threshold: Double = 1e-7) extends Detector {

  override def contextRows: Int = windowSize + 1 // centered frame + dilation

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val clean = s"__${spec.flag}_cv"
    TsOps.constantMask(
      df.withColumn(clean, TsOps.cleanValue(spec)),
      spec, clean, spec.flag, windowSize, threshold)
      .drop(clean)
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): ConstantValueDetector = {
    validate(df, spec); this
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("ConstantValueDetector"),
    "window_size" -> Json.num(windowSize.toDouble),
    "threshold" -> Json.num(threshold)))

  /** Reference `__str__` (`detectors.py:253-254`). */
  override def toString: String =
    s"ConstantValueDetector($windowSize, ${TsOps.pyFloat(threshold)})"
}

object ConstantValueDetector {
  def fromJson(j: JValue): ConstantValueDetector =
    ConstantValueDetector(j("window_size").num.toInt, j("threshold").num)
}

/** Flag linear-interpolated stretches (constant gradient,
  * `/root/reference/tsod/detectors.py:257-279`): the ConstantValueDetector
  * mask pipeline applied to BOTH the forward per-second gradient and the
  * backward difference over the forward Δt (the reference idiosyncrasy at
  * `base.py:89`), OR-combining the two masks. Threshold is fixed at the
  * parent default 1e-7.
  */
final case class ConstantGradientDetector(windowSize: Int = 3) extends Detector {

  private val threshold = 1e-7

  override def contextRows: Int = windowSize + 2 // gradient lag/lead + frame + dilation

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val (gF, gB, mF, mB) = ("__cg_fwd", "__cg_bwd", "__cg_mask_fwd", "__cg_mask_bwd")
    val withGrads = df
      .withColumn(gF, TsOps.gradient(spec, periods = 1))
      .withColumn(gB, TsOps.gradient(spec, periods = -1))
    val masked = TsOps.constantMask(
      TsOps.constantMask(withGrads, spec, gF, mF, windowSize, threshold),
      spec, gB, mB, windowSize, threshold)
    masked
      .withColumn(spec.flag, col(mF) || col(mB))
      .drop(gF, gB, mF, mB)
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): ConstantGradientDetector = {
    validate(df, spec); this
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("ConstantGradientDetector"),
    "window_size" -> Json.num(windowSize.toDouble)))

  /** Reference `__str__` (`detectors.py:278-279`). */
  override def toString: String = s"ConstantGradientDetector($windowSize)"
}

object ConstantGradientDetector {
  def fromJson(j: JValue): ConstantGradientDetector =
    ConstantGradientDetector(j("window_size").num.toInt)
}
