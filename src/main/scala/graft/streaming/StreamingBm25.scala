package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.TextOps

/** Streaming BM25 scoring over FROZEN corpus statistics (the streaming
  * twin of [[graft.pipeline.TfIdf.bm25Scores]], same discipline as
  * [[StreamingQuality]]): the per-query-term idf values and the average
  * document length are computed ONCE from a reference corpus
  * ([[graft.pipeline.TfIdf.bm25FrozenStats]] — a ≤ |queryTerms|+1-row
  * collect) and every arriving document is scored against them. The
  * production shape: route incoming pages by relevance to a fixed
  * retrieval query without the score drifting as the stream grows.
  *
  * Shape: tokenize is the stateless batch expression; the frozen idf
  * map rides a STREAM-STATIC left join on term (static side is
  * |queryTerms| rows — always a broadcast); the one stateful operator
  * folds each doc's rows into (dl, per-term tf) and replays the batch
  * micro-point formula in the same IEEE operation order with the same
  * HALF_UP rounding, so on the reference corpus itself the emitted
  * scores equal [[graft.pipeline.TfIdf.bm25Scores]] row for row. Docs
  * containing no query term emit nothing (the batch relation's
  * semantics); no state survives the micro-batch.
  */
object StreamingBm25 {

  final case class Bm25Doc(doc_id: Long, bm25_micro: Long, n_tokens: Long)

  def bm25ServeStream(docs: DataFrame, idf: Map[String, Double],
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[Bm25Doc] = {
    require(idf.nonEmpty, "idf map must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val idfDf = idf.toSeq.toDF("term", "__idf")
    val toks = docs.select(col(idCol).as("__id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
      .join(broadcast(idfDf), Seq("term"), "left")
      .select(col("__id"), col("term"), col("__idf"))
      .as[(Long, String, Option[Double])]
    toks.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[(Long, String, Option[Double])],
            state: GroupState[Int]) => {
          var dl = 0L
          val tf = scala.collection.mutable.HashMap.empty[String, (Long, Double)]
          rows.foreach { case (_, term, i) =>
            dl += 1
            i.foreach { v =>
              val prev = tf.getOrElse(term, (0L, v))
              tf.update(term, (prev._1 + 1, v))
            }
          }
          if (tf.isEmpty) Iterator.empty
          else {
            // the batch __pts expression verbatim: same operand order,
            // same HALF_UP integer quantization
            val norm = (1.0 - b) + b * dl.toDouble / avgdl
            var s = 0L
            tf.values.foreach { case (n, i) =>
              val pts = i * (n.toDouble * (k1 + 1.0)) /
                (n.toDouble + k1 * norm) * 1000000.0
              s += java.math.BigDecimal.valueOf(pts)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            }
            Iterator.single(Bm25Doc(id, s, dl))
          }
        })
  }
}
