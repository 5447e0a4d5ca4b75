package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Similarity

/** Streaming ANN query serving over a PERSISTED IVF-PQ index (the
  * streaming twin of [[Similarity.ivfPqTopK]], e.g. on the relations
  * [[graft.pipeline.AnnIO.loadIvfPqIndex]] returns): each arriving query
  * vector probes its nProbe nearest inverted lists, ADC-scans those
  * lists' PQ codes, exact-rescores the mCand best and emits its top-k —
  * batch-equivalent row for row.
  *
  * Shape: query prep (probe ranking + ADC LUT via the codegen'd
  * [[graft.functions.PqLut]]) is a STATELESS projection — deliberately
  * shared with the batch path, and the reason the LUT is an expression
  * rather than the old crossJoin+groupBy (a streaming aggregation
  * upstream of a stateful operator is unsupported; a projection is
  * fine). Candidates come from a STREAM-STATIC equality join on the
  * list id — Spark plans the static side like any batch scan, so the
  * probed-list partition pruning of the persisted index still applies.
  * The only stateful operator is one `flatMapGroupsWithState` per
  * query id that keeps a bounded mCand heap, rescores exactly, and
  * KEEPS NO STATE across batches (every query is self-contained in its
  * micro-batch; a re-sent query id is simply served again).
  *
  * Scale tradeoff (documented, deliberate): the static scan side joins
  * the full-precision vectors next to the codes so the exact rescore can
  * happen inside the single stateful operator — per candidate row that
  * hauls dim doubles, where batch hauls only codes and rescores via a
  * second join. At cluster scale you would split the rescore into a
  * second hop (chained stateful operators) or an external vector fetch;
  * one stateful operator keeps the streaming plan inside what Spark's
  * unsupported-operations checker allows on all output modes.
  */
object StreamingAnn {

  final case class AnnResult(query_id: Long, neighbor_id: Long, sim: Double, rnk: Long)
  private def roundHalfUp6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Left-to-right dot — the exact accumulation order of the codegen'd
    * [[graft.functions.DotProductDouble]] the batch rescore uses, so
    * streaming sims are bit-identical to batch.
    */
  private def dotLR(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** @param queries  streaming frame with (idCol, vecCol)
    * @param centroids/codebook/codesWithList  the persisted IVF-PQ index
    * @param corpus   static full-precision vectors for the exact rescore
    */
  def ivfPqServeStream(queries: DataFrame,
      centroids: Array[Array[Double]], codebook: DataFrame,
      codesWithList: DataFrame, corpus: DataFrame,
      k: Int, mCand: Int, nProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Dataset[AnnResult] = {
    val (probed, ksub) = Similarity.ivfPqQueryFrame(
      queries, centroids, codebook, nProbe, idCol, vecCol)
    // static side: codes + full vectors co-located by id (see scaladoc)
    val static = codesWithList
      .join(corpus.select(col(idCol),
        col(vecCol).cast("array<double>").as("__cv")), Seq(idCol))
      .select(col(idCol).as("neighbor_id"), col("list"), col("code"),
        col("cn"), col("__cv"))
    val scored = probed.join(static, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
    heapRescoreTopK(scored, ksub, k, mCand)
  }

  /** Streaming twin of [[Similarity.pqTopK]] — flat-PQ serving over a
    * persisted codebook + code table ([[graft.pipeline.AnnIO
    * .loadPqIndex]]), no coarse quantizer: every arriving query
    * ADC-scans the WHOLE code table and exact-rescores its mCand best.
    * Query prep and the stateful heap are byte-for-byte the IVF-PQ
    * path's; only the candidate source differs — with no list id to
    * equi-join on, the stream-static join is the same deliberate
    * exhaustive scan as the batch flat-PQ candidate stage, with the
    * sides INVERTED: batch broadcasts the tiny query LUT frame and
    * scans codes; a stream side cannot be broadcast, so here the
    * codes+vectors frame is the build side. Right for code tables that
    * fit an executor (flat PQ's whole niche); past that, build the IVF
    * variant and serve with [[ivfPqServeStream]].
    */
  def pqServeStream(queries: DataFrame, codebook: DataFrame,
      codes: DataFrame, corpus: DataFrame, k: Int, mCand: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Dataset[AnnResult] = {
    val (qf, ksub) = Similarity.pqQueryFrame(queries, codebook, idCol, vecCol)
    val static = codes
      .join(corpus.select(col(idCol),
        col(vecCol).cast("array<double>").as("__cv")), Seq(idCol))
      .select(col(idCol).as("neighbor_id"), col("code"), col("cn"), col("__cv"))
    val scored = qf.join(static, col("query_id") =!= col("neighbor_id"))
    heapRescoreTopK(scored, ksub, k, mCand)
  }

  /** Shared tail of the streaming serve paths: ADC-score the candidate
    * rows, keep a bounded mCand heap per query id, exact-rescore the
    * survivors and emit the k-cut — one `flatMapGroupsWithState` that
    * keeps no state across batches (every query is self-contained in
    * its micro-batch; a re-sent query id is simply served again).
    */
  private def heapRescoreTopK(candidates: DataFrame, ksub: Int,
      k: Int, mCand: Int): Dataset[AnnResult] = {
    import candidates.sparkSession.implicits._
    val scored = candidates
      .withColumn("qsim",
        graft.functions.PqAdcScore(col("code"), col("lut"), ksub) /
          (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("qsim"),
        col("qv"), col("qn"), col("__cv"))
      .as[(Long, Long, Double, Seq[Double], Double, Seq[Double])]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (qid: Long,
         rows: Iterator[(Long, Long, Double, Seq[Double], Double, Seq[Double])],
         state: GroupState[Boolean]) =>
          // bounded mCand heap: dequeue evicts the WORST candidate, so
          // the ordering ranks "worse" largest — (-qsim, nid) ascending
          // mirrors the batch row_number (qsim DESC, neighbor_id ASC)
          val worstFirst = Ordering.by[(Long, Double, Seq[Double], Seq[Double], Double), (Double, Long)] {
            case (nid, qsim, _, _, _) => (-qsim, nid)
          }
          val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
          var qv: Seq[Double] = null
          var qn = 0.0
          rows.foreach { case (_, nid, qsim, v, n, cv) =>
            qv = v; qn = n
            heap.enqueue((nid, qsim, v, cv, n))
            if (heap.size > mCand) heap.dequeue()
          }
          // exact rescore of the survivors, then the k-cut — identical
          // expressions (and FP order) to the batch rescore stage
          val survivors: Seq[(Long, Double, Seq[Double], Seq[Double], Double)] =
            heap.dequeueAll
          // rank on the UNROUNDED sim exactly like the batch row_number
          // (batch rounds only in its final select) — ranking on the
          // rounded value would flip the k-boundary whenever two sims
          // differ only past the 6th decimal
          survivors.map { case (nid, _, _, cv, _) =>
            val cn2 = math.sqrt(dotLR(cv, cv))
            (nid, dotLR(qv, cv) / (qn * cn2))
          }
            .sortBy { case (nid, sim) => (-sim, nid) }
            .take(k)
            .zipWithIndex
            .map { case ((nid, sim), i) =>
              AnnResult(qid, nid, roundHalfUp6(sim), i + 1L) }
            .iterator
      }
  }
}
