package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every document in a raw SOURCE pool by how
  * much more likely its hashed n-gram features are under a TARGET
  * distribution (the high-quality corpus you want more of) than under
  * the source itself, then keep the top slice. The published recipe —
  * bag-of-hashed-unigrams+bigrams, add-one-smoothed bucket
  * distributions, mean log-ratio per document — restated as three
  * aggregates and two bounded joins.
  *
  * Determinism replaces the paper's Gumbel-top-k draw: selection is a
  * hard cutoff at the source-pool `selectFrac` score quantile (exact
  * `percentile`, the oracle-parity choice), so membership is a pure
  * function of the corpus — reproducible across cluster sizes, no RNG,
  * same discipline as [[Sampling]].
  *
  * Scale shape: one gram explode (unigrams + bigrams WITH multiplicity,
  * [[Quality.ngrams]]), one groupBy over `buckets` hash buckets
  * counting target/source occurrences in a single pass, a one-row
  * totals attach, then the per-bucket log-ratio table — AT MOST
  * `buckets` rows, a true constant-bounded broadcast — joins back to
  * the gram stream; one per-doc sum; one one-row cutoff attach. No
  * all-pairs anything, no global sort.
  *
  * Exactness: per-bucket log ratios are quantized to integer MICRO-NATS
  * (`round(ln·10⁶)` as BIGINT) before the per-doc mean, so the doc
  * aggregate is an exact order-free integer sum on both engines — the
  * [[Quality.lmScore]] arithmetic, for the same reason (a float mean
  * flips its last decimal on summation order).
  *
  * Output (SOURCE docs only — target docs are the reference, not
  * candidates): `(doc id, n_grams, dsir_score, selected)`; gram-less
  * docs score NULL and are never selected.
  */
object Dsir {

  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024,
      selectFrac: Double = 0.2): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(selectFrac > 0 && selectFrac <= 1,
      s"selectFrac must be in (0, 1], got $selectFrac")
    val toks = tokens(col(textCol))
    val grams = docs.select(col(idCol), isTarget.as("__t"),
        explode(concat(toks, Quality.ngrams(toks, 2))).as("g"))
      .withColumn("b", pmod(hash60(concat(lit("dsir:"), col("g"))), lit(buckets.toLong)))
      .select(col(idCol), col("__t"), col("b"))
    // one pass counts BOTH distributions; a bucket unseen on one side
    // simply counts 0 there (the +1 smoothing keeps its ratio finite)
    val bucketCounts = grams.groupBy("b").agg(
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"),
      sum(when(col("__t"), lit(0L)).otherwise(lit(1L))).as("cs"))
    val totals = bucketCounts.agg(
      sum("ct").as("__nt"), sum("cs").as("__ns"))
    val lam = bucketCounts.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("ct") + lit(1.0)) / (col("__nt") + lit(buckets.toDouble))) -
          log((col("cs") + lit(1.0)) / (col("__ns") + lit(buckets.toDouble))))
          * lit(1000000.0)).cast("long").as("lam"))
    val scored = grams.filter(!col("__t"))
      .join(broadcast(lam), Seq("b")) // <= `buckets` rows by construction
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_grams"), sum("lam").as("__s"))
      .withColumn("dsir_score",
        round(col("__s") / (col("n_grams") * lit(1000000.0)), 6))
    val cutoff = scored.agg(
      round(percentile(col("dsir_score"), lit(1.0 - selectFrac)), 6).as("__c"))
    docs.filter(!isTarget).select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(cutoff))
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("dsir_score"),
        coalesce(col("dsir_score") >= col("__c"), lit(false)).as("selected"))
  }
}
