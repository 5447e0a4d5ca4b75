package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.CacheLedger.TrackedPersist
import TextOps.tokens

/** Corpus-level term statistics: smoothed TF-IDF with per-document
  * top-k terms. Two shuffles (term-frequency group-by, document-
  * frequency group-by) + one broadcasted scalar (corpus size) — the
  * standard shape that scales linearly with corpus size. IDF is rounded
  * to 6 dp BEFORE ranking so `ln` libm ulp differences can't reorder
  * near-ties across engines.
  */
object TfIdf {

  /** (doc_id, term, score, rnk) for the top-k tf-idf terms per doc;
    * score = tf · round(ln((N+1)/(df+1)), 6), ties broken by term.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val idf = round(log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))), 6)
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * idf, 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "score", "rnk")
  }

  /** BM25 top-k retrieval (Robertson/Lucene formulation) for a fixed
    * query-term set — the retrieval-based data-selection primitive
    * (score a corpus against a target task's query and keep the best
    * matches). The doc-length normalization is what [[topTerms]]'s raw
    * TF-IDF lacks: a term occurring twice in a tweet outranks it
    * occurring twice in a book.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Determinism across engines: idf and avgdl are rounded to 6 dp
    * (libm `ln` / mean division ulps can't leak), each term's
    * contribution is quantized to integer micro-points before the
    * per-doc sum (the lmScore pattern — integer addition is order-free
    * where float addition is not), and the final ranking ties break on
    * doc_id. Plan shape: one tokenize pass feeds both the per-doc
    * length and the query-term tf (the filter on `queryTerms` lands
    * BEFORE the tf shuffle, so the aggregate moves only matching
    * tokens); df/idf live on a ≤|queryTerms|-row broadcast frame;
    * the result is a TakeOrderedAndProject top-k, never a global sort.
    * Docs containing no query term score 0 and are absent.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    bm25Scores(docs, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** The scoring relation under [[bm25TopK]]: every doc containing ≥1
    * query term with its integer micro-point score — also the batch
    * reference for the streaming frozen-stats scorer
    * ([[graft.streaming.StreamingBm25]]).
    *
    * Plan shape: the query-term set is bounded (a retrieval query), so
    * per-term tfs PIVOT into conditional-count columns of ONE doc-keyed
    * aggregate — a single tokenize pass and a single exchange. (The
    * relational formulation — separate dl/qtf/df frames joined back —
    * re-tokenized the corpus five times: the aggregates differ, so
    * exchange reuse never fires. Measured 3× slower at 2M docs.) The
    * per-doc frame is persisted for its two consumers (corpus stats,
    * scoring projection); per-term scores sum as integers left to
    * right — order-free, identical totals to the join formulation.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      count(when(col("term") === t, 1)).as(s"__tf$i")
    }
    val perDoc = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
      .persistTracked()
    val statCols = Seq(count(lit(1)).as("nd"), round(avg("dl"), 6).as("avgdl")) ++
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val norm = lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")
    val pts = queryTerms.indices.map { i =>
      val idf = round(log(lit(1.0) +
        (col("nd") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5))), 6)
      when(col(s"__tf$i") > 0,
        round(idf * (col(s"__tf$i") * lit(k1 + 1.0)) /
          (col(s"__tf$i") + lit(k1) * norm) * lit(1000000.0)).cast("long"))
        .otherwise(0L)
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .filter(queryTerms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), pts.as("bm25_micro"), col("dl").as("n_tokens"))
  }

  /** Freeze the corpus-side BM25 statistics for serving: per-query-term
    * 6-dp idf plus the 6-dp average doc length. The collect is bounded
    * by |queryTerms| + 1 rows — the PQ-codebook argument — and the
    * values are EXACTLY the ones [[bm25Scores]] plans internally, so a
    * scorer that replays the formula over them reproduces batch scores
    * bit-for-bit on the same corpus.
    */
  def bm25FrozenStats(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): (Map[String, Double], Double) = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"),
      round(avg("dl"), 6).as("avgdl"))
    val df = tok.filter(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .withColumn("idf", round(log(lit(1.0) +
        (col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .select("term", "idf")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val avgdl = stats.select("avgdl").head().getDouble(0)
    (idf, avgdl)
  }
}
