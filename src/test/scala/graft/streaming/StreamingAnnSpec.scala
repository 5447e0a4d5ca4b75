package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import graft.ts.SparkSpecBase

/** Streaming IVF-PQ serving must emit exactly the batch ivfPqTopK rows
  * when the same query vectors arrive through MemoryStream micro-batches
  * (including a split between batches — each query is self-contained, so
  * the split must not change anything).
  */
class StreamingAnnSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("ivfPqServeStream matches batch ivfPqTopK row for row across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "embeddings")
    val (cents, codebook, codesL) = Similarity.ivfPqIndex(corpus,
      nLists = 8, nSub = 8, ksub = 16, maxIter = 5)
    val queryIds = (0L until 20L)
    val batch = Similarity.ivfPqTopK(codesL, cents, codebook, corpus,
        corpus.filter(col("vec_id") < 20), k = 3, mCand = 12, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val qVecs = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Double])]
    val streamQ = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingAnn.ivfPqServeStream(streamQ, cents, codebook, codesL,
        corpus, k = 3, mCand = 12, nProbe = 3)
      .writeStream.format("memory").queryName("ann_serve")
      .outputMode("append").start()
    val got = try {
      mem.addData(qVecs.take(7)); q.processAllAvailable()
      mem.addData(qVecs.drop(7)); q.processAllAvailable()
      spark.table("ann_serve").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
        .toMap
    } finally q.stop()
    assert(got.nonEmpty && queryIds.forall(id => got.keySet.exists(_._1 == id)))
    assert(got == batch)
  }

  test("pqServeStream matches batch pqTopK row for row across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sfDir, "embeddings")
    val (codebook, codes) = Similarity.pqIndex(corpus,
      nSub = 8, ksub = 16, maxIter = 5)
    val queryIds = (0L until 20L)
    val batch = Similarity.pqTopK(codes, codebook, corpus,
        corpus.filter(col("vec_id") < 20), k = 3, mCand = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val qVecs = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, Seq[Double])]
    val streamQ = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingAnn.pqServeStream(streamQ, codebook, codes,
        corpus, k = 3, mCand = 12)
      .writeStream.format("memory").queryName("pq_serve")
      .outputMode("append").start()
    val got = try {
      mem.addData(qVecs.take(7)); q.processAllAvailable()
      mem.addData(qVecs.drop(7)); q.processAllAvailable()
      spark.table("pq_serve").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
        .toMap
    } finally q.stop()
    assert(got.nonEmpty && queryIds.forall(id => got.keySet.exists(_._1 == id)))
    assert(got == batch)
  }
}
