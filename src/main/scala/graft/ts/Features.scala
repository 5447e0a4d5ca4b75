package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering helpers mirroring `/root/reference/tsod/features.py`.
  */
object Features {

  /** One shifted copy of the value per requested lag, appended as columns
    * named `lag.toString` (`features.py:19-23`; pandas `shift(k)` = value
    * k rows earlier, negative k looks ahead).
    */
  def lagTimeSeries(df: DataFrame, lags: Seq[Int], spec: SeriesSpec = SeriesSpec()): DataFrame =
    lags.foldLeft(df) { (acc, k) =>
      val shifted =
        if (k >= 0) lag(spec.valueCol, k).over(spec.w)
        else lead(spec.valueCol, -k).over(spec.w)
      acc.withColumn(k.toString, shifted)
    }

  /** Sliding-window tensor dataset (`features.py:26-32`): for each row i
    * (0-based, i ≤ n - steps - 1) emit features = the next `steps` rows of
    * `xCols` (an array of per-row arrays) and label = `yCol` at row
    * i + steps. Output appends `features: array<array<double>>` and
    * `label: double`, keeping only complete windows.
    */
  def createDataset(
      df: DataFrame, xCols: Seq[String], yCol: String, timeSteps: Int,
      spec: SeriesSpec = SeriesSpec()): DataFrame = {
    val frame = spec.w.rowsBetween(0, (timeSteps - 1).toLong)
    val xRow = array(xCols.map(c => col(c).cast("double")): _*)
    val (rn, cnt) = TsOps.rowNumberAndCount(spec)
    df
      .withColumn("features", collect_list(xRow).over(frame))
      .withColumn("label", lead(col(yCol).cast("double"), timeSteps).over(spec.w))
      .withColumn("__rn", rn).withColumn("__cnt", cnt)
      .filter(col("__rn") <= col("__cnt") - timeSteps)
      .drop("__rn", "__cnt")
  }
}
