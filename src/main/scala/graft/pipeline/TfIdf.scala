package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
}
