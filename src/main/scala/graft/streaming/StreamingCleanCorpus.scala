package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Quality, TextOps}

/** The clean-corpus recipe's INGEST half on a stream — as much of
  * [[graft.pipeline.Dedup.cleanCorpusV2]] as streaming semantics allow,
  * run per micro-batch as documents arrive:
  *
  *   main-content extraction → line corrections → Gopher / C4 /
  *   word-list gates → PII / card / IBAN scrubs → exact dedup.
  *
  * Everything up to the dedup is STATELESS projections and filters, so
  * it streams unchanged; the exact dedup is Structured Streaming's
  * watermarked first-arrival state ([[StreamingDedup.dedupExactStream]]'s
  * shape). The batch recipe's remaining stages need cross-document pair
  * joins (minhash near-dup, semantic dedup) — on a stream those serve
  * against STORED indexes ([[StreamingNearDup]], [[StreamingAnn]]) or
  * run in the periodic batch compactor; this front end is the
  * ingest-side 90%: a page that fails a gate never reaches the
  * expensive stages at all.
  *
  * Composition note: the batch recipe computes the three gates as
  * narrow (id, keep) JOINS (persist barriers make that the cheap batch
  * shape); a stream cannot self-join or persist, so the gates chain as
  * carry-through projections instead — `Quality.*(…, carry = …)` rides
  * the text and event time along. The surviving SET is identical (the
  * gates are a conjunction either way), which the batch-equivalence
  * spec pins across micro-batch splits. The cost difference is honest:
  * each gate re-derives its token/line arrays per micro-batch row
  * instead of reusing a cached barrier — stateless recompute is the
  * price of a retry-safe stream.
  */
object StreamingCleanCorpus {

  /** `pages(idCol, tsCol, htmlCol)` (streaming) → surviving
    * `(idCol, tsCol, text)` — first arrival per content hash within the
    * watermark horizon; later identical texts are dropped, and content
    * recurring farther apart than `watermarkDelay` is caught by the
    * batch compactor (the [[StreamingDedup.dedupExactStream]]
    * state-bound argument).
    */
  def cleanCorpusStream(pages: DataFrame, idCol: String, tsCol: String,
      htmlCol: String, blocklist: Seq[String], watermarkDelay: String,
      minChars: Int = 25, maxLinkDensityPct: Int = 20): DataFrame = {
    val mc = pages.select(col(idCol), col(tsCol),
      TextOps.mainContentBlocks(col(htmlCol), minChars, maxLinkDensityPct)
        .getField("text_main").as("text"))
    val lc = Quality.lineCorrections(mc, idCol, "text", carry = Seq(tsCol))
      .select(col(idCol), col(tsCol), col("text_clean").as("text"))
    val afterGopher = Quality
      .gopherRules(lc, idCol, "text", carry = Seq(tsCol, "text"))
      .filter(col("keep")).select(col(idCol), col(tsCol), col("text"))
    val afterC4 = Quality
      .c4Clean(afterGopher, idCol, "text", carry = Seq(tsCol, "text"))
      .filter(col("keep")).select(col(idCol), col(tsCol), col("text"))
    val gated = Quality
      .wordlistFilter(afterC4, idCol, "text", blocklist,
        maxFraction = 0.0, carry = Seq(tsCol, "text"))
      .filter(col("keep_strict")).select(col(idCol), col(tsCol), col("text"))
    val scrubbed = Seq(
      Quality.piiScrub(_: DataFrame, idCol, "text", carry = Seq(tsCol)),
      Quality.luhnCardScrub(_: DataFrame, idCol, "text", carry = Seq(tsCol)),
      Quality.ibanScrub(_: DataFrame, idCol, "text", carry = Seq(tsCol)))
      .foldLeft(gated)((d, f) =>
        f(d).select(col(idCol), col(tsCol), col("text_redacted").as("text")))
    scrubbed
      .withColumn("content_hash", md5(col("text")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col(idCol), col(tsCol), col("text"))
  }
}
