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
  * The reference needs a numba-JIT'd scalar loop; here both medians come
  * from the custom [[graft.functions.HampelStats]]
  * `TypedImperativeAggregate` over the frame (one sorted primitive
  * buffer per row, no UDF, distributed by `seriesId`). `impl =
  * "builtin"` keeps the pure-built-ins formulation (`collect_list` +
  * `array_sort` + element access) — bit-identical results, used to
  * cross-check the native aggregate.
  */
final case class HampelDetector(
    windowSize: Int = 5,
    threshold: Double = 3.0,
    k: Double = TsOps.GaussianScaleFactor,
    impl: String = "native") extends Detector {

  if (windowSize <= 0) throw new InvalidArgumentError("window_size", "nonnegative")
  if (threshold < 0) throw new InvalidArgumentError("threshold", "positive")
  require(impl == "native" || impl == "builtin", s"unknown impl: $impl")

  override def contextRows: Int = windowSize // [t-ws, t+ws-1] frame + edge rule

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val ws = windowSize
    val frame = spec.w.rowsBetween(-ws.toLong, (ws - 1).toLong)
    val v = TsOps.cleanValue(spec)
    val (rn, cnt) = TsOps.rowNumberAndCount(spec)
    val (rnC, cntC) = ("__hampel_rn", "__hampel_cnt")
    val withMedMad = if (impl == "native") {
      val statsC = "__hampel_stats"
      df.withColumn(statsC, graft.functions.HampelStats(v).over(frame))
        .withColumn(rnC, rn).withColumn(cntC, cnt)
        .withColumn("__hampel_med", col(statsC).getField("med"))
        .withColumn("__hampel_mad", lit(k) * col(statsC).getField("rawmad"))
        .drop(statsC)
    } else {
      val arrC = "__hampel_arr"
      df
        // collect_list skips nulls — matches np.nanmedian's NaN skipping
        .withColumn(arrC, collect_list(v).over(frame))
        .withColumn(rnC, rn).withColumn(cntC, cnt)
        .withColumn("__hampel_med", TsOps.sortedArrayMedian(array_sort(col(arrC))))
        .withColumn("__hampel_mad",
          lit(k) * TsOps.sortedArrayMedian(
            array_sort(transform(col(arrC), x => abs(x - col("__hampel_med"))))))
        .drop(arrC)
    }
    withMedMad
      .withColumn(spec.flag,
        col(rnC) > ws && col(rnC) <= col(cntC) - ws &&
          coalesce(abs(v - col("__hampel_med")) > lit(threshold) * col("__hampel_mad"),
            lit(false)))
      .drop("__hampel_med", "__hampel_mad", rnC, cntC)
  }

  /** Reference display parity (`hampel.py:89-90` __str__). */
  override def toString: String =
    s"HampelDetector($windowSize, ${TsOps.pyFloat(threshold)})"

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("HampelDetector"),
    "window_size" -> Json.num(windowSize.toDouble),
    "threshold" -> Json.num(threshold),
    "k" -> Json.num(k),
    "impl" -> JStr(impl)))
}

object HampelDetector {
  def fromJson(j: JValue): HampelDetector =
    HampelDetector(j("window_size").num.toInt, j("threshold").num, j("k").num,
      j("impl").opt.map(_.str).getOrElse("native"))
}
