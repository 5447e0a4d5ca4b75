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
  * Execution shape: ONE Exchange on the series key, then two sorted
  * window sweeps — ascending for the previous non-null, DESCENDING for
  * the next one. The descending pass exists because Spark evaluates a
  * `(1, unboundedFollowing)` shrinking frame by re-scanning the tail
  * for every row — O(rows²) per series, measured 0.67M rows/s at the
  * 100M-row smoke — while "next non-null" restated as "previous
  * non-null over reverse order" is an UnboundedPreceding growing frame
  * Spark maintains incrementally. The second Sort shares the same hash
  * partitioning, so no extra shuffle (plan-asserted).
  */
object Interpolate {

  def linear(df: DataFrame, spec: SeriesSpec,
      maxGapSeconds: Option[Double] = None): DataFrame = {
    val v = col(spec.value)
    val tsUs = unix_micros(col(spec.ts)).cast("double")
    val pDesc =
      if (spec.seriesId.isEmpty) Window.partitionBy()
      else Window.partitionBy(spec.seriesId.map(col): _*)
    val wDesc = pDesc.orderBy(spec.orderBy.map(c => col(c).desc): _*)
    val before = spec.w.rowsBetween(Window.unboundedPreceding, -1)
    val after = wDesc.rowsBetween(Window.unboundedPreceding, -1)
    val v0 = last(v, ignoreNulls = true).over(before)
    val t0 = last(when(v.isNotNull, tsUs), ignoreNulls = true).over(before)
    val v1 = last(v, ignoreNulls = true).over(after)
    val t1 = last(when(v.isNotNull, tsUs), ignoreNulls = true).over(after)
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
