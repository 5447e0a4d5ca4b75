package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Hampel filter (rolling median ± scaled MAD,
  * `/root/reference/tsod/hampel.py:27-90`): for each interior row t the
  * window is rows `[t-ws, t+ws-1]` (length 2·ws, includes t); anomaly iff
  * `|x_t - median| > threshold · 1.4826 · median(|window - median|)`.
  * The first and last `ws` rows of each series are never flagged (the
  * reference's loop bounds). Nulls are skipped inside windows
  * (`np.nanmedian`) and a null x_t is never an anomaly.
  *
  * The reference needs a numba-JIT'd scalar loop; here both medians are
  * computed per-row from a frame-bounded `collect_list` with
  * `array_sort` + element access — O(n·w log w) inside one WindowExec
  * pass, no UDF, distributed by `seriesId`.
  */
final case class HampelDetector(
    windowSize: Int = 5,
    threshold: Double = 3.0,
    k: Double = TsOps.GaussianScaleFactor) extends Detector {

  if (windowSize <= 0) throw new InvalidArgumentError("window_size", "nonnegative")
  if (threshold < 0) throw new InvalidArgumentError("threshold", "positive")

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val ws = windowSize
    val frame = spec.w.rowsBetween(-ws.toLong, (ws - 1).toLong)
    val v = TsOps.cleanValue(spec)
    val (rn, cnt) = TsOps.rowNumberAndCount(spec)
    val (arrC, medC, madC, rnC, cntC) =
      ("__hampel_arr", "__hampel_med", "__hampel_mad", "__hampel_rn", "__hampel_cnt")
    df
      // collect_list skips nulls — matches np.nanmedian's NaN skipping
      .withColumn(arrC, collect_list(v).over(frame))
      .withColumn(rnC, rn).withColumn(cntC, cnt)
      .withColumn(medC, TsOps.sortedArrayMedian(array_sort(col(arrC))))
      .withColumn(madC,
        lit(k) * TsOps.sortedArrayMedian(
          array_sort(transform(col(arrC), x => abs(x - col(medC))))))
      .withColumn(spec.flag,
        col(rnC) > ws && col(rnC) <= col(cntC) - ws &&
          coalesce(abs(v - col(medC)) > lit(threshold) * col(madC), lit(false)))
      .drop(arrC, medC, madC, rnC, cntC)
  }

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("HampelDetector"),
    "window_size" -> Json.num(windowSize.toDouble),
    "threshold" -> Json.num(threshold),
    "k" -> Json.num(k)))
}

object HampelDetector {
  def fromJson(j: JValue): HampelDetector =
    HampelDetector(j("window_size").num.toInt, j("threshold").num, j("k").num)
}
