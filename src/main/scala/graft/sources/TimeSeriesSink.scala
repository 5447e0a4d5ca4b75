package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ts.SeriesSpec

/** Anomaly-output sinks (the reference keeps results in memory and
  * plots; at fleet scale the mask table is data). Parquet partitioned by
  * detection date so downstream readers prune to the days they ask for
  * — the idiom that keeps a 100 TB anomaly archive queryable.
  */
object TimeSeriesSink {

  /** Write the full mask table partitioned by `det_date` (derived from
    * the series timestamp). `anomaliesOnly` drops the unflagged rows
    * first — the common archive shape (a few ppm of the input).
    */
  def writeAnomalies(detected: DataFrame, path: String,
      spec: SeriesSpec = SeriesSpec(), anomaliesOnly: Boolean = true): Unit = {
    val out = (if (anomaliesOnly) detected.filter(col(spec.flag)) else detected)
      .withColumn("det_date", col(spec.ts).cast("date"))
    out.write.mode("overwrite")
      .partitionBy("det_date")
      .parquet(path)
  }
}
