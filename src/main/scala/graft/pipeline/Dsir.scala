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
  * distributions, mean log-ratio per document — restated as one
  * aggregate and two shuffle-free scan passes.
  *
  * Determinism replaces the paper's Gumbel-top-k draw: selection is a
  * hard cutoff at the source-pool `selectFrac` score quantile (exact
  * `percentile`, the oracle-parity choice), so membership is a pure
  * function of the corpus — reproducible across cluster sizes, no RNG,
  * same discipline as [[Sampling]].
  *
  * Scale shape: ONE gram explode (unigrams + bigrams WITH multiplicity,
  * [[Quality.ngrams]]) feeding a groupBy over `buckets` hash buckets
  * that counts target/source occurrences in a single pass — folded
  * map-side to at most `buckets` rows per task. The per-bucket
  * log-ratio table is then AT MOST `buckets` rows by construction (a
  * hard bound, checked below), so it is collected and folded into the
  * scoring expression as a LITERAL array — the [[Similarity]] codebook
  * precedent. Scoring is thereafter a pure per-row projection
  * (array lookup + integer sum over the doc's own grams): no join, no
  * shuffle, no explode on the scoring side at all. The quantile cutoff
  * is one two-column aggregate attached back as a one-row broadcast.
  * An earlier formulation kept the log-ratio table distributed and
  * joined the exploded gram stream against it; the unshared aggregate
  * subtrees made Spark evaluate the gram explode up to six times —
  * 6× slower at every size measured, with no semantic difference.
  *
  * Exactness: per-bucket log ratios are quantized to integer MICRO-NATS
  * (round-half-up of ln·10⁶, the same `BigDecimal` arithmetic Spark's
  * `round` applies) before the per-doc mean, so the doc aggregate is an
  * exact order-free integer sum on both engines — the
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
    require(buckets <= (1 << 16),
      s"buckets is folded into a literal lookup array and must stay " +
        s"driver-sized (<= 65536), got $buckets")
    require(selectFrac > 0 && selectFrac <= 1,
      s"selectFrac must be in (0, 1], got $selectFrac")
    // tokens are MATERIALIZED into a column before the n-gram build:
    // [[Quality.ngrams]]' per-element lambda re-evaluates its argument
    // expression on every element, so handing it the raw tokenize
    // expression multiplies the regex split by the gram count (measured
    // 4-10x on this query before the projection split)
    val gramsOf = concat(col("__toks"), Quality.ngrams(col("__toks"), 2))
    def bucketOf(g: Column): Column =
      pmod(hash60(concat(lit("dsir:"), g)), lit(buckets.toLong))
    // single corpus pass: per-bucket occurrence counts of BOTH
    // distributions; a bucket unseen on one side simply counts 0 there
    // (the +1 smoothing keeps its ratio finite)
    val bucketCounts = docs
      .select(isTarget.as("__t"), tokens(col(textCol)).as("__toks"))
      .select(col("__t"), explode(gramsOf).as("g"))
      .select(col("__t"), bucketOf(col("g")).as("b"))
      .groupBy("b").agg(
        sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"),
        sum(when(col("__t"), lit(0L)).otherwise(lit(1L))).as("cs"))
      .collect() // <= `buckets` rows by construction (b = hash % buckets)
    var nt = 0L
    var ns = 0L
    bucketCounts.foreach { r => nt += r.getLong(1); ns += r.getLong(2) }
    // quantize exactly as Spark's round(_).cast("long") would in-plan:
    // BigDecimal HALF_UP (round half away from zero — DuckDB agrees;
    // Long.round does NOT for negative ratios)
    def microNats(ct: Long, cs: Long): Long =
      java.math.BigDecimal.valueOf(
        (math.log((ct + 1.0) / (nt + buckets.toDouble)) -
          math.log((cs + 1.0) / (ns + buckets.toDouble))) * 1000000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val lamArr = Array.fill(buckets)(microNats(0L, 0L))
    bucketCounts.foreach { r =>
      lamArr(r.getLong(0).toInt) = microNats(r.getLong(1), r.getLong(2))
    }
    val lam = typedLit(lamArr.toSeq)
    // scoring: a pure projection over source docs — literal-array lookup
    // per gram, exact long sum, micro-nat mean. Three narrow projections
    // (tokens → grams → score) so each non-cheap array is built once per
    // row; CollapseProject keeps them separate because the aliases are
    // multiply referenced
    val scored = docs.filter(!isTarget)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), gramsOf.as("__g"))
      .select(col(idCol),
        coalesce(when(size(col("__g")) >= 0, size(col("__g"))), lit(0))
          .cast("long").as("n_grams"),
        aggregate(transform(col("__g"),
            g => element_at(lam, (bucketOf(g) + lit(1L)).cast("int"))),
          lit(0L), (acc, x) => acc + x).as("__s"))
      .withColumn("dsir_score",
        when(col("n_grams") > 0,
          round(col("__s") / (col("n_grams") * lit(1000000.0)), 6)))
    val cutoff = scored.agg(
      round(percentile(col("dsir_score"), lit(1.0 - selectFrac)), 6).as("__c"))
    scored.crossJoin(broadcast(cutoff))
      .select(col(idCol), col("n_grams"), col("dsir_score"),
        coalesce(col("dsir_score") >= col("__c"), lit(false)).as("selected"))
  }
}
