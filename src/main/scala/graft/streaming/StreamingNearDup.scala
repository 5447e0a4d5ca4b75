package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Dedup

/** Streaming NEAR-dup screening (the streaming twin of
  * [[graft.pipeline.Dedup.minhashLshPairs]]): each arriving document is
  * checked against previously-seen documents that share an LSH band
  * bucket, with similarity estimated from the minhash signatures
  * themselves (matching slots / k — the unbiased Jaccard estimator), so
  * the state carries k longs per doc instead of its shingle set.
  *
  * Shape: signature + band buckets are STATELESS projections (same
  * codegen'd expressions as batch); only the per-bucket membership list
  * is state, keyed by (band, bucket) — the same shuffle key as the batch
  * candidate join. A pair colliding in several bands is emitted once per
  * collision; aggregate downstream if exactly-once pairs matter.
  */
object StreamingNearDup {

  final case class NearDupHit(doc_id: Long, matched_doc: Long, est_jaccard: Double)
  final case class BucketDocs(docs: Seq[(Long, Seq[Long])])

  /** @param maxPerBucket cap on remembered docs per bucket (oldest
    *   evicted) — bounds state on adversarial/hot buckets; real near-dup
    *   buckets are tiny, so the cap only degrades recall against floods.
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, estThreshold: Double,
      maxPerBucket: Int = 256): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val r = k / bands
    val toks = graft.pipeline.TextOps.tokens(col(textCol))
    val sigDf = docs
      .select(col(idCol).cast("long").as("doc"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .withColumn("sig",
        Dedup.minhashSignature(Dedup.shingles(col("__toks"), n), k))
      .select(col("doc"), col("sig"),
        explode(Dedup.bandBuckets(col("sig"), bands, r)).as("bb"))
      .select(col("doc"), col("sig"), col("bb.band"), col("bb.bucket"))
    sigDf.as[(Long, Seq[Long], Int, String)]
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, String), rows: Iterator[(Long, Seq[Long], Int, String)],
            state: GroupState[BucketDocs]) =>
          var seen = state.getOption.map(_.docs.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[NearDupHit]
          // deterministic within a micro-batch: smaller ids are "earlier"
          rows.toVector.sortBy(_._1).foreach { case (doc, sig, _, _) =>
            seen.foreach { case (prevDoc, prevSig) =>
              val matching = sig.iterator.zip(prevSig.iterator)
                .count { case (a, b) => a == b }
              val est = matching.toDouble / k
              if (est >= estThreshold) out += NearDupHit(doc, prevDoc, est)
            }
            seen = (seen :+ (doc -> sig)).takeRight(maxPerBucket)
          }
          state.update(BucketDocs(seen))
          out.result().iterator
      }
  }
}
