package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._

/** Dedup-pipeline scale smoke: synthetic corpora far beyond the driver
  * tables (default 200k docs ≈ 40× sf0.1), generated distributively with
  * planted near-duplicates — every doc with id ≡ 1 (mod 100) is its
  * predecessor with 3 of 60 words perturbed (true Jaccard ≈ 0.9), so the
  * expected LSH pair count is known (~totalDocs/100) and recall is
  * checkable at any size.
  *
  * Usage: runMain graft.ScaleSmokeDocs [totalDocs]
  */
object ScaleSmokeDocs {
  def main(args: Array[String]): Unit = {
    val totalDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val words = 60
    val isDup = col("id") % 100 === 1
    val baseId = when(isDup, col("id") - 1).otherwise(col("id"))
    val docs = spark.range(totalDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(words - 1)), i => {
        val perturbed = isDup && i < 3
        val h = when(perturbed, hash(col("id"), i, lit("x")))
          .otherwise(hash(baseId, i))
        concat(lit("w"), pmod(h, lit(5000)))
      })).as("text"))
      .persist()
    val n = docs.count()
    println(s"[docs-scale] docs=$n planted_pairs=${n / 100} cores=$cpus")

    def stage(name: String)(rows: => Long): Long = {
      val t0 = System.nanoTime()
      val r = rows
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[docs-scale] $name%-22s $sec%8.2fs  ${n / sec / 1000}%8.1fk docs/s  rows=$r")
      r
    }

    stage("exact_dedup")(Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("dup_cnt") > 1).count())
    stage("fingerprint")(docs.select(
      graft.pipeline.TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count())
    val found = stage("minhash_lsh")(Dedup.minhashLshPairs(
      docs, "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.5).count())
    stage("simhash_sigs")(Dedup.simhashSignatures(docs, "doc_id", "text").count())
    stage("tfidf_top3")(TfIdf.topTerms(docs, "doc_id", "text", 3).count())
    val planted = n / 100
    println(f"[docs-scale] lsh recall vs planted: ${found * 100.0 / planted}%.1f%% " +
      s"($found of $planted)")

    // ANN over synthetic embeddings: half the doc count, 64 dims
    val nVec = math.max(10000L, totalDocs / 2)
    val vecs = spark.range(nVec).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(hash(col("id"), d), lit(2001)) - 1000) / lit(1000.0))
        .as("embedding"))
      .persist()
    vecs.count()
    def vstage(name: String)(rows: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = rows
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[docs-scale] $name%-22s $sec%8.2fs  rows=$r")
    }
    vstage(s"ann_brute_100q_${nVec / 1000}kvec")(
      Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 100), 5).count())
    vstage("ann_lsh_multiprobe")(
      Similarity.lshBucketedTopK(vecs, vecs.filter(col("vec_id") < 1000),
        5, nPlanes = 8, dim = 64, probes = 2).count())
    spark.stop()
  }
}
