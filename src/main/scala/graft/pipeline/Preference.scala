package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.CacheLedger.TrackedPersist

/** Preference-pair (RLHF / DPO) data prep — the artifact every
  * post-training pipeline builds right after SFT: a `(prompt, chosen,
  * rejected)` relation is validated and audited before optimization,
  * because a single degenerate or leaked pair poisons a reward signal
  * far more than a bad pretraining doc poisons an LM. Composes the
  * engine's existing dedup/decontamination machinery over the PROMPT
  * column (the identity of a preference pair is its prompt — two pairs
  * with the same prompt double-count that comparison):
  *
  *   - `empty_side`: chosen or rejected is NULL/whitespace-only — no
  *     gradient can prefer something over nothing;
  *   - `degenerate`: chosen == rejected exactly — the comparison
  *     carries zero preference information (the classic label-noise
  *     artifact of annotation UIs);
  *   - `exact_dup`: another pair with a SMALLER id carries the
  *     byte-identical prompt (keep-first rule, the [[Dedup.exactGroups]]
  *     aggregate — no window);
  *   - `near_dup`: a verified MinHash-LSH pair links this prompt to a
  *     smaller-id prompt at `threshold` Jaccard or above (the
  *     [[Dedup.minhashLshPairs]] banding; "drop the larger id of every
  *     verified pair" — the p3 relation replayed, not a new rule);
  *   - `contaminated`: the prompt shares an `nGram`-token shingle with
  *     the benchmark set ([[Dedup.contaminationFlags]] — a leaked eval
  *     prompt trains the reward model on the test);
  *   - `keep`: none of the above.
  *
  * Also renders BOTH branches through the ChatML layout
  * ([[TextOps.renderChatML]], the p128 contract) so the survivors are
  * one projection away from a DPO trainer's input.
  *
  * Scale shape: three prompt-keyed hash aggregates/joins (exact
  * groups, LSH bands, shingle hits) — every one the scale-certified
  * path it composes; the flags projection and both renders are
  * zero-shuffle codegen. Deterministic: all keys hash-derived.
  *
  * Output: `(idCol, empty_side, degenerate, exact_dup, near_dup,
  * contaminated, chosen_rendered, rejected_rendered, keep)`.
  */
object Preference {

  def prepPairs(pairs: DataFrame, idCol: String, promptCol: String,
      chosenCol: String, rejectedCol: String, benchmark: DataFrame,
      nGram: Int = 3, minhashK: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val base = pairs.select(col(idCol), col(promptCol).as("__prompt"),
      col(chosenCol).as("__chosen"), col(rejectedCol).as("__rejected"))
      .persistTracked()
    // keep-first exact prompt groups: one hash aggregate, no window.
    // NULL prompts coalesce to '' BEFORE hashing — md5(NULL) is NULL
    // and a plain equi-join on it would silently DROP the pair from
    // the audit (the one thing an audit relation must never do)
    val ph = md5(coalesce(col("__prompt"), lit("")))
    val exactKeep = base
      .groupBy(ph.as("__h"))
      .agg(min(col(idCol)).as("__keep"))
    // verified near-dup pairs (doc_a < doc_b): the larger id is flagged
    val nearIds = Dedup.minhashLshPairs(
        base.select(col(idCol), col("__prompt")),
        idCol, "__prompt", n = nGram, k = minhashK, bands = bands,
        threshold = threshold)
      .select(col("doc_b").as(idCol)).distinct()
      .withColumn("__near", lit(true))
    val contam = Dedup.contaminationFlags(
        base.select(col(idCol), col("__prompt")),
        idCol, "__prompt", benchmark, n = nGram)
      .select(col(idCol), col("contaminated"))
    def rendered(c: org.apache.spark.sql.Column) =
      TextOps.renderChatML(array(
        struct(lit("user").as("role"), col("__prompt").as("content")),
        struct(lit("assistant").as("role"), c.as("content"))))
        .getField("rendered")
    base
      .join(exactKeep, ph === col("__h"))
      .join(nearIds, Seq(idCol), "left")
      .join(contam, Seq(idCol))
      .select(col(idCol),
        (trim(coalesce(col("__chosen"), lit(""))) === "" ||
          trim(coalesce(col("__rejected"), lit(""))) === "").as("empty_side"),
        (coalesce(col("__chosen"), lit("")) ===
          coalesce(col("__rejected"), lit(""))).as("degenerate"),
        (col(idCol) =!= col("__keep")).as("exact_dup"),
        coalesce(col("__near"), lit(false)).as("near_dup"),
        col("contaminated"),
        rendered(col("__chosen")).as("chosen_rendered"),
        rendered(col("__rejected")).as("rejected_rendered"))
      .withColumn("keep",
        !col("empty_side") && !col("degenerate") && !col("exact_dup") &&
          !col("near_dup") && !col("contaminated"))
  }

  /** Threaded-conversation flattening — the step BEFORE preference/SFT
    * prep on forum / chat-branching data (ShareGPT trees, assistant
    * regeneration branches): one row per message `(id, parent — NULL
    * for a root, role, content)` in, one row per LEAF out, carrying
    * the full root-to-leaf path as parallel arrays `(ids, roles,
    * contents)` plus `root_id` and `depth` — each leaf row IS one
    * linear conversation, one projection away from
    * [[TextOps.renderChatML]] / [[prepPairs]].
    *
    * Algorithm: POINTER DOUBLING (the parallel list-ranking classic —
    * Wyllie '79): state `(id, anc, path)` starts at `(id, parent,
    * [self])`; each round self-joins on `anc == id`, PREPENDING the
    * ancestor's collected path and jumping `anc` to the ancestor's
    * `anc`. Path span doubles per round, so ceil(log2(maxDepth))
    * shuffles flatten ANY forest of that depth — a 64-deep thread
    * costs 6 rounds, not 64 chained joins. Each round
    * localCheckpoints (the distributed union-find discipline: one
    * materializing job + lineage cut per round, else the self-join
    * doubles the plan tree every round).
    *
    * Loud failures, never a wrong traversal: a parent id absent from
    * the relation (dangling pointer) is rejected up front; a pointer
    * still live after the round budget means depth > maxDepth OR a
    * parent CYCLE — both named in the error.
    *
    * Scale: every round's join is key-unique on both sides (ids are
    * unique), fan-out exactly 1 — no hot key exists structurally;
    * state rows carry one ≤ depth-length array each, so the shuffle
    * volume is O(total path length) = the output's own size.
    */
  def flattenThreads(msgs: DataFrame, idCol: String, parentCol: String,
      roleCol: String, contentCol: String, maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 4096,
      s"flattenThreads: maxDepth $maxDepth outside [1, 4096]")
    val m = msgs.select(col(idCol).cast("long").as("id"),
      col(parentCol).cast("long").as("parent"),
      col(roleCol).cast("string").as("role"),
      col(contentCol).cast("string").as("content"))
    val ids = m.select(col("id").as("__pid"))
    val dangling = m.filter(col("parent").isNotNull)
      .join(ids, col("parent") === col("__pid"), "left_anti").count()
    require(dangling == 0,
      s"flattenThreads: $dangling messages point at a parent id absent " +
        "from the relation — repair or drop the dangling subtrees upstream")
    var state = m.select(col("id"), col("parent").as("anc"),
      array(col("id")).as("ids"), array(col("role")).as("roles"),
      array(col("content")).as("contents"))
      .localCheckpoint()
    var span = 1
    while (span < maxDepth) {
      val t = state.select(col("id").as("t_id"), col("anc").as("t_anc"),
        col("ids").as("t_ids"), col("roles").as("t_roles"),
        col("contents").as("t_contents"))
      state = state.join(t, col("anc") === col("t_id"), "left")
        .select(col("id"),
          when(col("t_id").isNull, col("anc")).otherwise(col("t_anc"))
            .as("anc"),
          when(col("t_id").isNull, col("ids"))
            .otherwise(concat(col("t_ids"), col("ids"))).as("ids"),
          when(col("t_id").isNull, col("roles"))
            .otherwise(concat(col("t_roles"), col("roles"))).as("roles"),
          when(col("t_id").isNull, col("contents"))
            .otherwise(concat(col("t_contents"), col("contents")))
            .as("contents"))
        .localCheckpoint()
      span *= 2
    }
    val live = state.filter(col("anc").isNotNull).count()
    require(live == 0,
      s"flattenThreads: $live messages still carry a live ancestor " +
        s"pointer after span-$span doubling — thread depth exceeds " +
        s"maxDepth=$maxDepth, or the parent relation contains a cycle " +
        "(which no traversal terminates)")
    val parents = m.filter(col("parent").isNotNull)
      .select(col("parent").as("__pp")).distinct()
    state
      .join(parents, col("id") === col("__pp"), "left_anti")
      .select(col("id").as("leaf_id"),
        element_at(col("ids"), 1).as("root_id"),
        size(col("ids")).cast("long").as("depth"),
        col("ids"), col("roles"), col("contents"))
  }
}
