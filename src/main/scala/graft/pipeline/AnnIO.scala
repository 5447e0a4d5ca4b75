package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for ANN indexes. At corpus scale the index IS the
  * artifact — PQ codes / IVF assignments are built once and served for
  * months while the raw embeddings stay cold — so both index kinds
  * round-trip through plain parquet (any Hadoop FS: local, hdfs://,
  * s3a://):
  *
  *   - PQ: `path/codebook` (sub, centroid_id, centroid) +
  *     `path/codes` (id, code, cn);
  *   - IVF: `path/centroids` (list, centroid) + `path/corpus`
  *     PARTITIONED BY `list` — each inverted list is its own directory,
  *     so a probe-pruned read (`WHERE list IN (...)`) touches only
  *     nProbe/nLists of the files (partition pruning, no data skipped
  *     row-by-row).
  *
  * No pickled models: the stored relations are the entire state, so
  * any session (or engine) can read them back.
  */
object AnnIO {

  def savePqIndex(codebook: DataFrame, codes: DataFrame, path: String): Unit = {
    codebook.write.mode("overwrite").parquet(s"$path/codebook")
    codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Returns (codebook, codes) exactly as [[Similarity.pqIndex]] built
    * them; [[Similarity.pqTopK]] takes them unchanged.
    */
  def loadPqIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codebook"), spark.read.parquet(s"$path/codes"))

  /** Persist an IVF index: centroids + the indexed corpus partitioned
    * by inverted list.
    */
  def saveIvfIndex(centroids: Array[Array[Double]], indexedCorpus: DataFrame,
      path: String): Unit = {
    val spark = indexedCorpus.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .write.mode("overwrite").parquet(s"$path/centroids")
    indexedCorpus.write.mode("overwrite")
      .partitionBy("list").parquet(s"$path/corpus")
  }

  /** Returns (centroids, indexedCorpus) for [[Similarity.ivfTopK]]. */
  def loadIvfIndex(spark: SparkSession, path: String): (Array[Array[Double]], DataFrame) = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("list").collect()
      .map(r => r.getSeq[Double](1).toArray)
    (centroids, spark.read.parquet(s"$path/corpus"))
  }
}
