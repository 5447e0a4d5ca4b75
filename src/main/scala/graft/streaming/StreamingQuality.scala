package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.TextOps

/** Streaming CCNet-style quality scoring over a FROZEN unigram LM (the
  * streaming twin of [[graft.pipeline.Quality.lmScore]]): the LM — the
  * `(term, cnt)` table plus its two totals — is built ONCE from a
  * reference corpus batch-side, and each arriving document is scored
  * against it. The production shape: a crawler scores incoming pages
  * against last month's LM; scores are comparable across the stream
  * because the model does not drift with the batch contents.
  *
  * Shape (the [[StreamingAnn]] discipline): per-token NLL is computed
  * IN-PLAN by the exact expressions the batch path uses (stateless
  * projection after a STREAM-STATIC left join on term — the static
  * side plans like any batch scan, so a broadcast-sized LM broadcasts),
  * and the only stateful operator is one `flatMapGroupsWithState` per
  * doc folding its token NLLs into the exact integer micro-nat sum.
  * No state survives batches (a document is self-contained in its
  * micro-batch; a re-sent id is simply scored again).
  *
  * Semantics vs batch: scoring the LM's own training corpus reproduces
  * [[graft.pipeline.Quality.lmScore]] row for row INCLUDING token-less
  * docs (explode_outer keeps them; they emit `n_tokens = 0`, NULL
  * score). Terms unseen in the LM — impossible batch-side, routine when
  * serving fresh data — take the add-one smoothing floor `cnt = 0`,
  * the natural extension of the batch formula.
  */
object StreamingQuality {

  final case class LmDoc(doc_id: Long, n_tokens: Long, lm_nll: Option[Double])

  /** @param docs    streaming frame with (idCol, textCol)
    * @param counts  the frozen LM: `(term, cnt)` from the reference
    *                corpus (e.g. the aggregate inside `Quality.lmScore`)
    * @param nTotal  sum of all cnt in the LM
    * @param vocab   number of distinct terms in the LM
    */
  def lmServeStream(docs: DataFrame, counts: DataFrame,
      nTotal: Long, vocab: Long,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[LmDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("__id"),
      explode_outer(TextOps.tokens(col(textCol))).as("term"))
    val scored = toks
      .join(counts.select(col("term"), col("cnt").as("__cnt")), Seq("term"), "left")
      .select(col("__id"),
        // the batch lmScore expression verbatim, with the totals frozen
        // as literals and unseen terms smoothed at cnt = 0
        when(col("term").isNotNull,
          round(-log((coalesce(col("__cnt"), lit(0L)) + lit(1.0)) /
              (lit(nTotal) + lit(vocab))) * lit(1000000.0)).cast("long"))
          .as("__nllu"))
      .as[(Long, Option[Long])]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[(Long, Option[Long])],
            state: GroupState[Int]) => {
          var n = 0L
          var s = 0L
          rows.foreach { case (_, nllu) =>
            nllu.foreach { u => n += 1; s += u }
          }
          val nll =
            if (n == 0) None
            else Some(java.math.BigDecimal.valueOf(s.toDouble / (n * 1000000.0))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
          Iterator.single(LmDoc(id, n, nll))
        })
  }

  final case class KnDoc(doc_id: Long, n_bigrams: Long, kn_nll: Option[Double])

  /** Streaming Kneser–Ney scoring over a FROZEN bigram model — the KN
    * twin of [[lmServeStream]] and the streaming serve of
    * [[graft.pipeline.Quality.knBigramScore]] (the KenLM/CCNet gate):
    * the model is the reference corpus's bigram-TYPE relation `cb`
    * (pair, cb) plus its type count; the context (c(v), N1+(v·)) and
    * continuation (N1+(·w)) statistics derive from `cb` on the STATIC
    * side, so each arriving document costs three stream-static
    * equality joins and one per-doc stateful fold — no state survives
    * batches.
    *
    * Held-out semantics follow the batch operator exactly: unseen
    * pairs under a seen context back off to the discounted
    * continuation term, unseen contexts score `Pcont(w)` alone, and
    * unseen words floor at 1/(2·N1+(··)) — so self-scoring the
    * training corpus reproduces the batch row for row, and fresh data
    * degrades exactly as documented there.
    */
  def knServeStream(docs: DataFrame, cb: DataFrame, nTypes: Long,
      discount: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): Dataset[KnDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ctx = cb
      .withColumn("__p", split(col("pair"), " ").getItem(0))
      .groupBy(col("__p"))
      .agg(sum("cb").as("__cv"), count(lit(1)).as("__n1f"))
    val cont = cb
      .withColumn("__ww", split(col("pair"), " ").getItem(1))
      .groupBy(col("__ww"))
      .agg(count(lit(1)).as("__n1b"))
    val prs = docs.select(col(idCol).as("__id"),
      explode_outer(graft.pipeline.Quality.ngrams(
        TextOps.tokens(col(textCol)), 2)).as("pair"))
      .withColumn("__prev", split(col("pair"), " ").getItem(0))
      .withColumn("__w", split(col("pair"), " ").getItem(1))
    val d = lit(discount)
    val nt = lit(nTypes)
    val scored = prs
      .join(cb.select(col("pair"), col("cb").as("__cb")), Seq("pair"), "left")
      .join(ctx, prs("__prev") === ctx("__p"), "left")
      .join(cont, prs("__w") === cont("__ww"), "left")
      .withColumn("__pcont", coalesce(col("__n1b"), lit(0L)) / nt)
      .withColumn("__prob",
        when(coalesce(col("__cv"), lit(0L)) > 0,
          greatest(coalesce(col("__cb"), lit(0L)) - d, lit(0.0)) / col("__cv") +
            d * col("__n1f") / col("__cv") * col("__pcont"))
          .otherwise(col("__pcont")))
      .withColumn("__prob2",
        when(col("__prob") > 0, col("__prob")).otherwise(lit(0.5) / nt))
      .select(col("__id"),
        when(col("pair").isNotNull,
          round(-log(col("__prob2")) * lit(1000000.0)).cast("long"))
          .as("__nllu"))
      .as[(Long, Option[Long])]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (id: Long, rows: Iterator[(Long, Option[Long])],
            state: GroupState[Int]) => {
          var n = 0L
          var s = 0L
          rows.foreach { case (_, nllu) =>
            nllu.foreach { u => n += 1; s += u }
          }
          val nll =
            if (n == 0) None
            else Some(java.math.BigDecimal.valueOf(s.toDouble / (n * 1000000.0))
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
          Iterator.single(KnDoc(id, n, nll))
        })
  }
}
