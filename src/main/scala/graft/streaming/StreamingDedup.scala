package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous document ingestion: emit
  * only the first arrival of each content hash. Built on Structured
  * Streaming's native dedup state rather than custom
  * `flatMapGroupsWithState` — the state store already handles per-key
  * bookkeeping, checkpointing and (with the watermark variant) eviction.
  */
object StreamingDedup {

  /** Exact-dedup a document stream by content hash, keeping state only
    * within the event-time watermark: a hash not seen for
    * `watermarkDelay` is evicted, so state is bounded by the duplicate
    * horizon instead of growing with the corpus — the only shape that
    * survives an unbounded stream. Duplicates farther apart than the
    * horizon pass through; catch them downstream with the batch
    * [[graft.pipeline.Dedup.exactGroups]] or the incremental minhash
    * index over the stored corpus.
    */
  def dedupExactStream(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Unbounded-state variant: exact stream dedup across ALL history.
    * Correct for bounded backfills; for true continuous ingestion prefer
    * [[dedupExactStream]].
    */
  def dedupExactStreamUnbounded(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .dropDuplicates("content_hash")
}
