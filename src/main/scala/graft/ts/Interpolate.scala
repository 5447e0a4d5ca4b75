package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap repair for sensor series: linear interpolation of missing
  * (NULL) values between their nearest non-null neighbors in time.
  *
  * The reference corpus treats interpolation as part of the data's QC
  * vocabulary (CMEMS flag 8 = `interpolated_value`,
  * `/root/reference/notebooks/cmems.ipynb` flag_meanings) but performs
  * none itself — this is an engine extension in the same family as
  * time-bucket resampling ([[TsOps]] `det_resample_1h`), for preparing
  * gappy QC-masked feeds before detection.
  *
  * Semantics (deliberately simple and symmetric, documented rather
  * than mirroring any library's corner cases):
  *  - interior NULL runs are filled linearly IN TIME between the
  *    nearest non-null values: v = v0 + (v1 − v0)·(t − t0)/(t1 − t0);
  *  - leading/trailing NULLs (no neighbor on one side) stay NULL;
  *  - `maxGap` (seconds): when the bracketing non-null neighbors are
  *    farther apart than this, the run is considered a real outage and
  *    stays NULL (an 8-hour sensor death should not become a straight
  *    line through a tide cycle);
  *  - an `interpolated` flag marks filled rows, mirroring the CMEMS
  *    flag-8 convention.
  *
  * Execution shape: two `last/first(_, ignoreNulls)` window sweeps over
  * the standard per-series (partition, order) — the SAME single
  * Exchange + Sort every detector shares (Catalyst reuses one window
  * group for all four carried values), so adding interpolation in
  * front of a detector ensemble costs no extra shuffle.
  */
object Interpolate {

  def linear(df: DataFrame, spec: SeriesSpec,
      maxGapSeconds: Option[Double] = None): DataFrame = {
    val v = col(spec.value)
    val tsUs = unix_micros(col(spec.ts)).cast("double")
    val before = spec.w.rowsBetween(Window.unboundedPreceding, -1)
    val after = spec.w.rowsBetween(1, Window.unboundedFollowing)
    val v0 = last(v, ignoreNulls = true).over(before)
    val t0 = last(when(v.isNotNull, tsUs), ignoreNulls = true).over(before)
    val v1 = first(v, ignoreNulls = true).over(after)
    val t1 = first(when(v.isNotNull, tsUs), ignoreNulls = true).over(after)
    val gapOk = maxGapSeconds match {
      case Some(g) => (t1 - t0) <= g * 1e6
      case None => lit(true)
    }
    val filled = when(v.isNotNull, v).otherwise(
      when(v0.isNotNull && v1.isNotNull && gapOk,
        v0 + (v1 - v0) * (tsUs - t0) / (t1 - t0)))
    // one projection → one Window node (two withColumns would split the
    // window expressions across two Window operators)
    val cols = df.columns.map {
      case c if c == spec.value => filled.as(spec.value)
      case c => col(c)
    } :+ (v.isNull && filled.isNotNull).as("interpolated")
    df.select(cols.toSeq: _*)
  }
}
