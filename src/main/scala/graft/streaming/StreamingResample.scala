package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming time-bucket resampling — the continuous form of the batch
  * `det_resample_1h` / `det_resample_ohlc` queries, built on Spark's
  * NATIVE watermarked event-time window aggregation (no custom state):
  * one aggregate buffer per open (key, bucket) pair, each bucket emits
  * exactly once when the watermark passes its end, and its state is
  * evicted. State is therefore bounded by keys × (watermark delay /
  * bucket width), independent of stream length — the canonical
  * Structured Streaming aggregation shape, and the plan Spark runs is
  * identical partial/final hash aggregation to the batch query, so
  * closed buckets match batch output exactly (asserted in
  * StreamingSpec). Late rows beyond the watermark are dropped — the
  * documented divergence from batch (SURVEY.md §2.10).
  */
object StreamingResample {

  /** Per-bucket count / mean / min / max (the pandas
    * `.resample().agg([...])` analog). `bucket` is any Spark window
    * duration ("1 hour", "15 minutes", ...).
    */
  def resampleStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucket: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), window(col(tsCol), bucket).as("w"))
      .agg(count(lit(1)).as("n"),
        round(avg(valueCol), 6).as("avg_value"),
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"))
      .select(col(keyCol), col("w.start").as("bucket_start"), col("n"),
        col("avg_value"), col("min_value"), col("max_value"))

  /** OHLC per bucket: open/close via the struct-min/max trick (the
    * earliest/latest `(ts, value)` in the bucket — ties on ts break
    * toward the smaller/larger value), high/low plain min/max. Still
    * one native windowed aggregation — struct min/max are algebraic,
    * so partial aggregation and streaming state both stay O(1) per
    * open bucket.
    */
  def resampleOhlcStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucket: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), window(col(tsCol), bucket).as("w"))
      .agg(
        min(struct(col(tsCol), col(valueCol))).getField(valueCol).as("open"),
        max(valueCol).as("high"), min(valueCol).as("low"),
        max(struct(col(tsCol), col(valueCol))).getField(valueCol).as("close"))
      .select(col(keyCol), col("w.start").as("bucket_start"),
        col("open"), col("high"), col("low"), col("close"))
}
