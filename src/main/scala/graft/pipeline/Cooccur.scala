package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.tokens

/** Word co-occurrence statistics — the embedding-prep step (word2vec
  * skip-gram pair generation, Mikolov et al. '13) and its collocation
  * reading (PMI phrase mining). A symmetric ±window skip-gram emits
  * (center, context) both ways for every pair of tokens ≤ window
  * positions apart, so the directional count table is symmetric and the
  * canonical unordered pair carries all the information.
  *
  * Deliberately JOIN-FREE: the naive formulation is a positional
  * self-join on (doc, |pos_i − pos_j| ≤ w) — a range join that explodes
  * at corpus scale. Here each offset d ∈ 1..w is an ARRAY SLICE of the
  * materialized token array (the [[Quality.ngrams]] HOF contract:
  * tokens are materialized once, the lambda reads an attribute), so
  * pair extraction is a projection and the only shuffle is the count
  * aggregate — the same shape as [[Bpe.pairCounts]].
  */
object Cooccur {

  /** Top-k co-occurring unordered token pairs within a ±`window`
    * skip-gram, with their PMI. Returns (t1, t2, n_cooc, pmi) where
    * t1 ≤ t2, ranked by (n_cooc desc, t1, t2), n_cooc counts
    * co-occurrence events (each unordered pair of positions once), and
    * pmi = round(ln(P(u,v) / (P(u)·P(v))), 6) with P(u,v) = n_cooc/Np,
    * P(u) = c_u/Nt — the collocation score, 6-dp rounded before output
    * so libm ln ulps can't leak (the idf argument). Scalar totals
    * (Nt, Np) attach as one-row broadcasts.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, k: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(k > 0, s"k must be positive: $k")
    // materialized token attribute — HOF lambdas re-evaluate argument
    // expressions per element (the Quality.ngrams contract)
    val toksDf = docs.select(tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    val t = col("__toks")
    val slices = (1 to window).map { d =>
      // guard the start-index range: sequence(1, 0) DESCENDS in Spark
      // and an out-of-range element_at throws under ANSI, so short docs
      // contribute an empty slice for offsets past their length
      val idx = when(size(t) > d, sequence(lit(1), size(t) - d))
        .otherwise(array().cast("array<int>"))
      transform(idx,
        i => struct(
          least(element_at(t, i), element_at(t, i + d)).as("t1"),
          greatest(element_at(t, i), element_at(t, i + d)).as("t2")))
    }
    val pairs = toksDf
      .select(explode(flatten(array(slices: _*))).as("__p"))
      .select(col("__p.t1").as("t1"), col("__p.t2").as("t2"))
    val cooc = pairs.groupBy("t1", "t2").agg(count(lit(1)).as("n_cooc"))
    val uni = toksDf.select(explode(t).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__cu"))
    val nt = uni.agg(sum("__cu").as("__nt"))
    val np = cooc.agg(sum("n_cooc").as("__np"))
    cooc
      .join(uni.withColumnRenamed("term", "t1").withColumnRenamed("__cu", "__c1"), "t1")
      .join(uni.withColumnRenamed("term", "t2").withColumnRenamed("__cu", "__c2"), "t2")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(np))
      .withColumn("pmi", round(log(
        col("n_cooc") / col("__np") * col("__nt") / col("__c1")
          * col("__nt") / col("__c2")), 6))
      .select("t1", "t2", "n_cooc", "pmi")
      .orderBy(col("n_cooc").desc, col("t1"), col("t2"))
      .limit(k)
  }
}
