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
}
