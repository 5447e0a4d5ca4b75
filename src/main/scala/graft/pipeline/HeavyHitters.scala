package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesTopK
import graft.pipeline.CacheLedger.TrackedPersist
import graft.pipeline.Quality.ngrams
import graft.pipeline.TextOps.tokens

/** Corpus-frequent n-gram mining — the stop-gram / boilerplate-phrase
  * census a crawl pipeline runs before filtering (C4's "policy lines",
  * RefinedWeb's boilerplate phrases are exactly the grams every shard
  * shares), exact-by-construction but SKETCH-PRUNED so the gram tail
  * never shuffles.
  *
  * The obvious relation — explode n-grams, `groupBy(gram).count()`,
  * filter ≥ minCount — moves EVERY distinct gram across the exchange;
  * at crawl scale the tail of once-seen grams is ~the token count of
  * the corpus, so the shuffle is corpus-sized for an answer that is a
  * few thousand rows ([[graft.relational.PipelineQueries]] p31 is that
  * shape for single tokens, where the vocabulary is small enough; for
  * n ≥ 2 it is not). This operator instead:
  *
  *   1. candidate pass — ONE [[MisraGriesTopK]] aggregate over the
  *      gram stream (each partition emits a ≤ capacity-entry summary;
  *      the exchange carries summaries, not grams) with the total gram
  *      count riding the same aggregate;
  *   2. certificate — `minCount > total/(capacity+1)` is REQUIRED
  *      post-hoc (Misra-Gries' deficiency bound): when it holds, the
  *      candidate array provably contains every minCount-heavy gram;
  *      when it does not, the run fails loudly with the capacity to
  *      retry at — never a silently incomplete result;
  *   3. verify pass — exact counts for candidates only: the gram
  *      stream equality-joins the BROADCAST candidate array before the
  *      `groupBy`, so the only grams that ever reach an exchange are
  *      the ≤ capacity survivors.
  *
  * The threshold is support-relative with a floor —
  * `minCount = max(minFloor, ceil(total/phiInverse))` — so the same
  * parameters are meaningful at any corpus size (φ-heavy-hitters, with
  * the floor keeping tiny test corpora non-degenerate). Output is the
  * exact `(gram, cnt)` relation, `cnt >= minCount`, ordered
  * (cnt desc, gram): byte-identical to the full-shuffle relation, per
  * the HeavyHittersSpec equivalence and the DuckDB oracle.
  *
  * The token projection is persisted: the candidate and verify passes
  * both consume it, and [[Quality.ngrams]]'s caller contract requires a
  * materialized attribute (the per-element lambda would otherwise
  * re-tokenize per gram). At cluster scale the cache is a disk-backed
  * convenience, not a correctness need — two scans of the corpus is
  * the honest cost of sketch-then-verify.
  */
object HeavyHitters {

  /** All whitespace-token n-grams of `textCol` with exact corpus count
    * ≥ max(minFloor, ceil(total/phiInverse)) — see object doc.
    */
  def frequentNgrams(spark: SparkSession, docs: DataFrame, textCol: String,
      n: Int, phiInverse: Long = 16384L, minFloor: Long = 6L,
      capacity: Int = 1 << 15): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val toks = docs.select(tokens(col(textCol)).as("__toks")).persistTracked()
    val grams = toks.select(explode(ngrams(col("__toks"), n)).as("gram"))
    val Array(first) = grams
      .agg(MisraGriesTopK(col("gram"), capacity).as("cands"),
        count(lit(1)).as("total"))
      .collect()
    val cands = first.getSeq[String](0)
    val total = first.getLong(1)
    val minCount = math.max(minFloor, math.ceil(total / phiInverse.toDouble).toLong)
    // the Misra-Gries deficiency bound: only below this threshold can a
    // heavy gram have been evicted from every summary
    require(minCount > total / (capacity + 1.0),
      s"heavy-hitter capacity too small for an exact answer: total=$total " +
        s"grams, capacity=$capacity gives error bound " +
        s"${total / (capacity + 1.0)} >= minCount=$minCount; retry with " +
        s"capacity > ${(total / minCount).toInt}")
    import spark.implicits._
    val candDf = cands.toDF("gram")
    grams.join(broadcast(candDf), Seq("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(minCount))
      .orderBy(col("cnt").desc, col("gram"))
  }
}
