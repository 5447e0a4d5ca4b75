package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.CacheLedger.TrackedPersist

/** Streaming exact deduplication for continuous document ingestion: emit
  * only the first arrival of each content hash. Built on Structured
  * Streaming's native dedup state rather than custom
  * `flatMapGroupsWithState` — the state store already handles per-key
  * bookkeeping, checkpointing and (with the watermark variant) eviction.
  */
object StreamingDedup {

  /** Exact-dedup a document stream by content hash, keeping state only
    * within the event-time watermark: a hash not seen for
    * `watermarkDelay` is evicted, so state is bounded by the duplicate
    * horizon instead of growing with the corpus — the only shape that
    * survives an unbounded stream. Duplicates farther apart than the
    * horizon pass through; catch them downstream with the batch
    * [[graft.pipeline.Dedup.exactGroups]] or the incremental minhash
    * index over the stored corpus.
    */
  def dedupExactStream(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Unbounded-state variant: exact stream dedup across ALL history.
    * Correct for bounded backfills; for true continuous ingestion prefer
    * [[dedupExactStream]].
    */
  def dedupExactStreamUnbounded(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .dropDuplicates("content_hash")

  /** One surviving line of a streamed document (see
    * [[dedupLinesStream]]); dropped lines are simply absent.
    */
  final case class DedupLineRow(doc_id: Long, pos: Int, line: String)

  /** Streaming LINE dedup — the streaming complement of
    * [[graft.pipeline.Dedup.dedupLines]] (p37): every non-empty line's
    * FIRST-ever occurrence across the stream survives; later
    * occurrences — in later micro-batches, later docs of the same
    * batch, or later positions of the same doc — are dropped.
    * Whitespace-only lines always pass through (layout, not content —
    * the batch contract). Since an emitted line cannot be retracted,
    * "first occurrence" is arrival order, which equals the batch
    * operator's (doc id, pos) order whenever docs arrive in id order —
    * the equivalence the spec pins across micro-batch splits.
    *
    * Shape: explode is stateless; the ONLY state is one boolean per
    * line key (the 60-bit [[graft.pipeline.TextOps.lineKey]]), keyed
    * exactly like the batch operator's shuffle. Whitespace rows share
    * the operator (grouped under (key, isContent=false)) but never
    * read or write state. `stateTtlMs > 0` bounds state to the
    * duplicate horizon via processing-time timeout — the
    * [[dedupExactStream]] eviction argument; 0 keeps all history
    * (bounded backfills).
    *
    * Output is line-granular (doc_id, pos, line) in append mode — the
    * natural sink shape for ingestion (line survivors written as they
    * resolve); rebuild full documents at the sink with
    * [[reassembleLines]].
    */
  def dedupLinesStream(docs: DataFrame, idCol: String, textCol: String,
      stateTtlMs: Long = 0L): Dataset[DedupLineRow] = {
    import docs.sparkSession.implicits._
    // a pos = -1 sentinel per doc rides the stateless branch so a doc
    // whose EVERY line is dropped still appears in the output (and
    // reassembles to "", the batch behavior)
    val lines = docs.select(col(idCol).cast("long").as("doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .unionByName(docs.select(col(idCol).cast("long").as("doc"),
        lit(-1).as("pos"), lit("").as("line")))
      .withColumn("ct", col("pos") >= 0 && col("line").rlike("\\S"))
      .withColumn("lk", graft.pipeline.TextOps.lineKey(col("line")))
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    lines.select(col("lk"), col("ct"), col("doc"), col("pos"), col("line"))
      .as[(Long, Boolean, Long, Int, String)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: (Long, Boolean),
            rows: Iterator[(Long, Boolean, Long, Int, String)],
            state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (!key._2) rows.map(r => DedupLineRow(r._3, r._4, r._5))
          else {
            var seen = state.getOption.getOrElse(false)
            // deterministic within a micro-batch: (doc, pos) order —
            // the batch operator's min(struct) rule
            val out = rows.toVector.sortBy(r => (r._3, r._4)).flatMap { r =>
              if (seen) None else { seen = true; Some(DedupLineRow(r._3, r._4, r._5)) }
            }
            state.update(true)
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
      }
  }

  final case class ScreenHit(vec_a: Long, vec_b: Long, sim: Double)

  /** Streaming embedding screen against a STORED cosine index
    * ([[graft.pipeline.Similarity.saveCosineIndex]]): each arriving
    * micro-batch of vectors is banded under the index's OWN plane
    * family (read from the meta row — the serve self-configures, so
    * family drift is impossible) and near-dup'd against the static
    * corpus via the (band, bucket) stream-static equality join +
    * exact-cosine verify. A pair colliding in several bands must emit
    * ONCE: the per-pair fold is a `flatMapGroupsWithState` that keeps
    * no state across batches (the heapRescoreTopK pattern) — a
    * streaming `distinct` would grow state with the corpus.
    * Within-batch pairs are NOT emitted (a stream cannot self-join
    * unbounded); run [[dedupExactStream]] upstream and fold the batch
    * into the stored index downstream, the cross-snapshot loop.
    * Batch-equivalence: rows = the batch
    * [[graft.pipeline.Similarity.cosineNearDupAgainstIndex]] result
    * minus its batch-internal pairs, any micro-batch split.
    */
  def cosineScreenStream(vecs: DataFrame, indexPath: String,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): Dataset[ScreenHit] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val (tables, planes, d, storedV, storedBands) =
      graft.pipeline.Similarity.loadCosineIndex(spark, indexPath)
    val newSide = vecs.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(graft.pipeline.Similarity.dot(col("v"), col("v"))))
      .select(col("id"), col("v"), col("nrm"),
        explode(graft.pipeline.Similarity.hyperplaneBands(
          col("v"), tables, planes, d)).as("bb"))
      .select(col("id"), col("v"), col("nrm"),
        col("bb.band"), col("bb.bucket"))
    // the static side is materialized ONCE at stream construction,
    // PRE-PARTITIONED on the join keys: a stream-static join re-plans
    // the static subtree every micro-batch, so without this barrier
    // each batch would re-run the bands⋈vectors join AND re-shuffle
    // the whole corpus into the screen join — the O(corpus)-per-batch
    // class the batch screens shed this round. The cached relation
    // carries hashpartitioning(band, bucket) in its outputPartitioning,
    // so per-batch joins exchange ONLY the arriving micro-batch
    // (MEMORY_AND_DISK: an index outgrowing executor memory spills
    // instead of failing)
    val staticSide = storedBands.join(storedV, "id")
      .select(col("id").as("id_b"), col("band"), col("bucket"),
        col("v").as("vb"), col("nrm").as("nb"))
      .repartition(col("band"), col("bucket"))
      .persistTracked()
    staticSide.count()
    val verified = newSide.join(staticSide, Seq("band", "bucket"))
      .filter(col("id") =!= col("id_b"))
      .withColumn("sim", round(
        graft.pipeline.Similarity.dot(col("v"), col("vb")) /
          (col("nrm") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select(least(col("id"), col("id_b")).as("vec_a"),
        greatest(col("id"), col("id_b")).as("vec_b"), col("sim"))
      .as[(Long, Long, Double)]
    verified.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long, Double)],
         state: GroupState[Boolean]) =>
          // one emission per pair per micro-batch; sim identical on
          // every colliding band (same verify expression), take head
          val sim = rows.next()._3
          Iterator.single(ScreenHit(key._1, key._2, sim))
      }
  }

  /** Streaming EXACT screen against a stored exact index
    * ([[graft.pipeline.Dedup.saveExactIndex]]) — the content-hash
    * frontier question per arriving document: how many times has this
    * exact content been seen in the stored corpus, and what is its
    * canonical id there? Stateless: one hash projection + a
    * stream-static LEFT join against the index's partial groups
    * COMBINED ONCE at stream construction (min keep / sum cnt per
    * hash, pre-partitioned on the hash — the cosineScreenStream
    * barrier, so each micro-batch exchanges only itself). Within-batch
    * duplicates are [[dedupExactStream]]'s job upstream; fold
    * survivors in via `mergeIntoExactIndex` downstream (and re-run
    * `buildExactBloom` — its drift stamp makes forgetting that loud).
    *
    * `useBloom = true` adds the in-memory fast path: rows the sidecar
    * sketch rules out take the miss branch WITHOUT touching the join
    * at all (no false negatives ⇒ rows identical, pinned by the spec).
    * Output: (doc_id, content_hash, n_corpus, corpus_keep — null when
    * the corpus has never seen the content (n_corpus 0), and ALSO null
    * when a [[graft.pipeline.Dedup.deleteFromExactIndex]] takedown
    * forgot the stored winner of still-retained copies (n_corpus > 0
    * — a duplicate of unknown canonical id; the two cases separate on
    * n_corpus).
    */
  def exactScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String,
      useBloom: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    val staticSide = graft.pipeline.Dedup.loadExactIndex(spark, indexPath)
      .groupBy("content_hash")
      .agg(min(col("keep_id")).as("corpus_keep"),
        sum(col("dup_cnt")).as("__cn"))
      .repartition(col("content_hash"))
      .persistTracked()
    staticSide.count()
    val hashed = docs.select(col(idCol).cast("long").as("doc_id"),
      md5(col(textCol)).as("content_hash"))
    def joined(src: DataFrame): DataFrame = src
      .join(staticSide, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        coalesce(col("__cn"), lit(0L)).as("n_corpus"), col("corpus_keep"))
    if (!useBloom) joined(hashed)
    else {
      val bloom = graft.pipeline.Dedup.loadExactBloom(spark, indexPath)
      val flagged = hashed.withColumn("__maybe",
        graft.functions.BloomMightContain(
          xxhash64(col("content_hash")), bloom))
      joined(flagged.filter(col("__maybe")).drop("__maybe"))
        .unionByName(flagged.filter(!col("__maybe"))
          .select(col("doc_id"), col("content_hash"),
            lit(0L).as("n_corpus"),
            lit(null).cast("long").as("corpus_keep")))
    }
  }

  /** Streaming screen against a STORED priority index
    * ([[graft.pipeline.Dedup.savePriorityIndex]]) — the
    * [[exactScreenStream]] twin for the cross-source trust rule: each
    * arriving doc is judged against the FROZEN corpus winner for its
    * content hash (the serving contract — cross-batch winners are the
    * fold's job, not the stream's). Emits per doc: the corpus winner's
    * decoded (keep_id, keep_priority), corpus occurrence count, and
    * `beats_corpus` = this doc's packed (priority, id) outranks every
    * stored copy (true for unseen text — a frontier admit). The static
    * side is the monoid-combined partial groups, materialized ONCE and
    * pre-partitioned on the join key.
    */
  def priorityScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String, priorityCol: String): DataFrame = {
    val spark = docs.sparkSession
    val (idx, maxPriority, idBits) =
      graft.pipeline.Dedup.loadPriorityIndex(spark, indexPath)
    val idMod = 1L << idBits
    val staticSide = idx.groupBy("content_hash")
      .agg(min(col("win")).as("__cw"), sum(col("dup_cnt")).as("__cn"))
      .repartition(col("content_hash"))
      .persistTracked()
    staticSide.count()
    // a post-deletion key can hold retained copies with an UNKNOWN
    // winner (win NULL but count > 0, [[deleteFromPriorityIndex]]):
    // an arriving copy must NOT claim beats_corpus — the retained
    // copies' trust tier was folded away, so outranking them is not
    // provable. The honest verdict is the batch screen's: false, with
    // the decoded winner halves NULL. Unreachable for never-deleted
    // indexes; distinct from the frontier-admit case (count 0).
    val unknownWinner =
      col("__cw").isNull && coalesce(col("__cn"), lit(0L)) > 0
    docs.select(col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("content_hash"),
        graft.pipeline.Dedup.packPriority(idCol, priorityCol,
          maxPriority, idBits).as("__p"))
      .join(staticSide, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        (col("__cw") % idMod).as("corpus_keep_id"),
        expr(s"__cw div $idMod").as("corpus_keep_priority"),
        coalesce(col("__cn"), lit(0L)).as("n_corpus"),
        when(unknownWinner, lit(false))
          .otherwise(col("__cw").isNull || col("__p") < col("__cw"))
          .as("beats_corpus"))
  }

  final case class ChunkScreenRow(doc_id: Long, n_chunks: Long,
      chunk_chars: Long, n_dup: Long, dup_chars: Long, dup_permille: Long)

  /** Streaming CDC-chunk screen against a STORED chunk index
    * ([[graft.pipeline.Dedup.saveChunkIndex]]) — "which regions of
    * this arriving document did the corpus already store, even
    * shifted?" per document, as it arrives. Each doc is chunked under
    * the index's OWN stored geometry (from the meta row — the serve
    * self-configures, boundary drift is impossible), chunk hashes take
    * a stateless stream-static LEFT join against the index's distinct
    * hash set (materialized once, pre-partitioned — the
    * [[cosineScreenStream]] barrier), and one per-doc fold re-rolls
    * the report. The fold keeps NO state across batches: a document's
    * chunks all live in its own micro-batch, so `flatMapGroupsWithState`
    * here is a per-doc reduce, not a cross-batch reservoir.
    *
    * SERVING CONTRACT (the [[priorityScreenStream]] discipline): each
    * doc is judged against the FROZEN corpus only — within-batch and
    * cross-batch chunk sharing is the FOLD's job
    * (`mergeIntoChunkIndex` downstream, then rebuild the sidecar).
    * Batch-equivalence therefore holds against
    * [[graft.pipeline.Dedup.chunksAgainstIndex]] whenever the batch
    * carries no fresh chunk shared BETWEEN batch docs — pinned by the
    * spec; a batch with internal sharing reports those chunks fresh
    * here and duplicated there, by contract.
    *
    * A doc whose text yields no chunks still emits its zeros row (the
    * sentinel-union pattern of [[dedupLinesStream]]).
    */
  def chunkScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String): Dataset[ChunkScreenRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (idx, minLen, maxLen, maskBits, startBits) =
      graft.pipeline.Dedup.loadChunkIndex(spark, indexPath)
    val staticSide = idx.select(col("chunk_hash")).distinct()
      .withColumn("__known", lit(true))
      .repartition(col("chunk_hash"))
      .persistTracked()
    staticSide.count()
    val chunks = graft.pipeline.Dedup.cdcChunkOccurrences(docs, idCol,
        textCol, minLen, maxLen, maskBits, startBits)
      .select(col("doc"), col("len"), col("chunk_hash"))
      // zero-length sentinel per doc: a chunk-less doc must still
      // report its zeros row (real chunks always have len >= 1)
      .unionByName(docs.select(col(idCol).cast("long").as("doc"),
        lit(0L).as("len"), lit(null).cast("string").as("chunk_hash")))
    chunks
      .join(staticSide, Seq("chunk_hash"), "left")
      .select(col("doc"), col("len"),
        coalesce(col("__known"), lit(false)).as("known"))
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (doc: Long, rows: Iterator[(Long, Long, Boolean)],
            state: GroupState[Boolean]) =>
          var n = 0L; var chars = 0L; var nd = 0L; var dc = 0L
          rows.foreach { case (_, len, known) =>
            if (len > 0) {
              n += 1; chars += len
              if (known) { nd += 1; dc += len }
            }
          }
          Iterator.single(ChunkScreenRow(doc, n, chars, nd, dc,
            dc * 1000L / math.max(chars, 1L)))
      }
  }

  final case class ContainmentHit(doc_id: Long, corpus_doc: Long,
      inter: Long, containment: Double)

  /** Streaming CONTAINMENT screen against a STORED shingle index
    * ([[graft.pipeline.Dedup.saveShingleIndex]]) — "is this arriving
    * document an excerpt/quote of something already stored?" per doc,
    * as it arrives. The batch-inside-corpus DIRECTION ONLY (the
    * frontier question; the reverse direction asks about the frozen
    * corpus and belongs to the batch screen): each arriving doc's
    * shingle hashes take a stateless stream-static join against the
    * stored postings — materialized ONCE with the df cutoff applied
    * over the FULL stored relation (for folded snapshots this is the
    * exact union-df semantics, at least as strict as the batch
    * screen's matched-keys cutoff) and pre-partitioned on sg — then a
    * per-(doc, corpus_doc) fold computes `inter / n_sh(doc)`. The fold
    * keeps no state across batches (a doc's shingles live in its own
    * micro-batch).
    *
    * Batch-equivalence (pinned by the spec): rows = the batch
    * [[graft.pipeline.Dedup.containmentAgainstIndex]] relation
    * restricted to `doc_inner` = an arriving doc, for any micro-batch
    * split, whenever no matched shingle's df straddles the cutoff
    * between the two df scopes (a single-snapshot index always
    * qualifies).
    */
  def containmentScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String,
      threshold: Double): Dataset[ContainmentHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (postings, _, n, maxDf) =
      graft.pipeline.Dedup.loadShingleIndex(spark, indexPath)
    val cold = postings.join(
      postings.groupBy("sg").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("sg"),
      Seq("sg"), "left_semi")
    val staticSide = cold
      .select(col("sg"), col("doc").as("corpus_doc"))
      .repartition(col("sg"))
      .persistTracked()
    staticSide.count()
    val toks = graft.pipeline.TextOps.tokens(col(textCol))
    val withSh = docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), array_distinct(transform(
        graft.pipeline.Dedup.shingles(col("__toks"), n),
        s => graft.pipeline.TextOps.hash60(s))).as("sh"))
    withSh
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("sg"))
      .join(staticSide, Seq("sg"))
      .select(col("doc_id"), col("corpus_doc"), col("n_sh"))
      .as[(Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long, Long)],
            state: GroupState[Boolean]) =>
          var inter = 0L; var nSh = 0L
          rows.foreach { r => inter += 1; nSh = r._3 }
          val c = BigDecimal(inter * 1.0 / nSh)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (c >= threshold)
            Iterator.single(ContainmentHit(key._1, key._2, inter, c))
          else Iterator.empty
      }
  }

  final case class WinnowHit(doc_id: Long, corpus_doc: Long,
      n_shared: Long)

  /** Streaming WINNOW screen against a STORED winnow index
    * ([[graft.pipeline.Dedup.saveWinnowIndex]]) — formatting-
    * insensitive clone hits per arriving doc, as it arrives. Each
    * batch doc is fingerprinted under the index's OWN stored (k, w)
    * geometry (the serve self-configures) via the row-local
    * [[graft.pipeline.Dedup.winnowLocal]] — value-identical to the
    * batch expression pipeline, and the streaming-safe form: the
    * expression pipeline needs a persist barrier between its gram
    * and window transforms, which a streaming frame cannot take.
    * Stored postings (df-capped with the stored bound, the
    * containmentScreenStream discipline) materialize once
    * pre-partitioned on fp; the per-(doc, corpus_doc) shared count
    * folds in a stateless flatMapGroupsWithState. Batch-equivalence
    * vs [[graft.pipeline.Dedup.winnowAgainstIndex]] holds per
    * micro-batch (pinned by the spec); within-batch sharing is the
    * fold's job, per the serving contract.
    */
  def winnowScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String,
      minShared: Int = 4): Dataset[WinnowHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (postings, _, k, w, maxDf) =
      graft.pipeline.Dedup.loadWinnowIndex(spark, indexPath)
    val cold = postings.join(
      postings.groupBy("fp").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("fp"),
      Seq("fp"), "left_semi")
    val staticSide = cold
      .select(col("fp"), col("doc").as("corpus_doc"))
      .repartition(col("fp"))
      .persistTracked()
    staticSide.count()
    docs.select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.pipeline.Dedup.winnowLocal(t, k, w).map(fp => (id, fp)) }
      .toDF("doc_id", "fp")
      .join(staticSide, Seq("fp"))
      .select(col("doc_id"), col("corpus_doc"))
      .as[(Long, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long)],
            state: GroupState[Boolean]) =>
          val n = rows.size.toLong
          if (n >= minShared) Iterator.single(WinnowHit(key._1, key._2, n))
          else Iterator.empty
      }
  }

  final case class EditDistHit(doc_id: Long, corpus_doc: Long,
      edit_dist: Long)

  /** Streaming EDIT-DISTANCE screen against a stored title index
    * ([[graft.pipeline.Dedup.saveEditDistIndex]]) — prompt dedup at
    * ingest: is this arriving title within the stored k edits of
    * something the corpus already holds? Each arriving title's symdel
    * variant hashes generate row-locally (trivially stateless; the
    * geometry comes from the stored meta), candidates come off the
    * stream-static variant join, a stateless per-(doc, corpus_doc)
    * fold dedups multi-variant agreement, and Spark's threshold
    * levenshtein verifies against the stored titles — the
    * [[graft.pipeline.Dedup.editDistanceAgainstIndex]] relation per
    * micro-batch, pinned by the spec. Over-cap titles are REJECTED
    * loudly row-side (raise_error), the batch contract.
    */
  def editDistScreenStream(docs: DataFrame, indexPath: String,
      idCol: String, textCol: String): Dataset[EditDistHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (titles, variants, maxEdits, lenCap) =
      graft.pipeline.Dedup.loadEditDistIndex(spark, indexPath)
    val staticVars = variants
      .select(col("vh"), col("doc").as("corpus_doc"))
      .repartition(col("vh"))
      .persistTracked()
    staticVars.count()
    val staticTitles = titles
      .select(col("doc").as("corpus_doc"), col("title").as("__tb"))
      .persistTracked()
    staticTitles.count()
    docs.select(col(idCol).cast("long").as("doc_id"),
        when(length(col(textCol)) <= lenCap, col(textCol))
          .otherwise(raise_error(lit(
            s"editDistScreenStream: title longer than the stored " +
              s"lenCap=$lenCap — the symdel variant cost is len^" +
              s"$maxEdits"))).as("__t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.pipeline.Dedup.symdelLocal(t, maxEdits)
          .map(vh => (id, t, vh)) }
      .toDF("doc_id", "__ta", "vh")
      .join(staticVars, Seq("vh"))
      .select(col("doc_id"), col("__ta"), col("corpus_doc"))
      .as[(Long, String, Long)]
      .groupByKey(r => (r._1, r._3))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, String, Long)],
            state: GroupState[Boolean]) =>
          Iterator.single((key._1, key._2, rows.next()._2))
      }
      .toDF("doc_id", "corpus_doc", "__ta")
      .join(staticTitles, Seq("corpus_doc"))
      .select(col("doc_id"), col("corpus_doc"),
        levenshtein(col("__ta"), col("__tb"), maxEdits).as("__d"))
      .filter(col("__d") >= 0)
      .select(col("doc_id"), col("corpus_doc"),
        col("__d").cast("long").as("edit_dist"))
      .as[EditDistHit]
  }

  final case class HammingHit(doc_a: Long, doc_b: Long, hamming: Long)

  /** Streaming 48-bit-signature screen against a STORED signature
    * index ([[graft.pipeline.Dedup.saveSignatureIndex]]) — the
    * [[cosineScreenStream]] twin for simhash / image-dHash /
    * audio-fingerprint corpora: each arriving micro-batch of
    * signatures is banded under the index's OWN stored Hamming cutoff
    * (from the meta row — the serve self-configures, so cutoff drift
    * is impossible) and screened via the (band, bits) stream-static
    * equality join + exact bit_count verify. A pair agreeing on
    * several bands must emit ONCE: the per-pair fold is a stateless
    * `flatMapGroupsWithState` (no state across batches — a streaming
    * `distinct` would grow state with the corpus). Within-batch pairs
    * are NOT emitted; run exact dedup upstream and fold survivors in
    * via [[graft.pipeline.Dedup.mergeIntoSignatureIndex]] downstream.
    * Batch-equivalence: rows = the batch
    * [[graft.pipeline.Dedup.hammingAgainstIndex]] result minus its
    * batch-internal pairs, any micro-batch split.
    */
  def hammingScreenStream(sigs: DataFrame, indexPath: String,
      idCol: String = "doc_id", sigCol: String = "sig")
      : Dataset[HammingHit] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val (maxHamming, nBlocks, storedSigs, storedBands) =
      graft.pipeline.Dedup.loadSignatureIndex(spark, indexPath)
    val newSide = sigs
      .select(col(idCol).cast("long").as("doc"), col(sigCol).as("sh"))
      .withColumn("__bb",
        explode(graft.pipeline.Dedup.hammingBands48(col("sh"), maxHamming,
          nBlocks)))
      .select(col("doc"), col("sh"), col("__bb.band"), col("__bb.bits"))
    // static side materialized once, pre-partitioned on the join keys
    // (the cosineScreenStream barrier — see its comment): per-batch
    // joins exchange only the arriving micro-batch
    val staticSide = storedBands.join(storedSigs, "doc")
      .select(col("doc").as("doc_b"), col("band"), col("bits"),
        col("sh").as("shb"))
      .repartition(col("band"), col("bits"))
      .persistTracked()
    staticSide.count()
    val verified = newSide.join(staticSide, Seq("band", "bits"))
      .filter(col("doc") =!= col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sh").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("doc"), col("doc_b")).as("doc_a"),
        greatest(col("doc"), col("doc_b")).as("doc_b2"), col("hamming"))
      .as[(Long, Long, Long)]
    verified.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long), rows: Iterator[(Long, Long, Long)],
         state: GroupState[Boolean]) =>
          // one emission per pair per micro-batch; hamming identical
          // on every agreeing band, take head
          val h = rows.next()._3
          Iterator.single(HammingHit(key._1, key._2, h))
      }
  }

  /** Batch helper rebuilding document texts from [[dedupLinesStream]]
    * survivors (run it in the sink / over the stored line relation):
    * group by doc, order by position, rejoin with newlines. A doc whose
    * every content line was dropped rebuilds to its remaining
    * whitespace skeleton — same as the batch operator.
    */
  def reassembleLines(lineRows: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    lineRows.groupBy(col("doc_id").as(idCol))
      .agg(array_join(
        transform(filter(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("pos") >= 0),
          x => x.getField("line")), "\n").as(textCol))
}
