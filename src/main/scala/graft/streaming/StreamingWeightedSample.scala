package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming weighted reservoir sampling, k per group — the
  * Efraimidis-Spirakis order ([[graft.pipeline.Sampling.weightedSample]])
  * in its NATIVE habitat: A-ES was designed as a one-pass reservoir
  * algorithm, so the streaming form is the textbook one. State per
  * group is the current top-k `(key, id, weight)` reservoir — O(k),
  * independent of stream length; each arrival computes its hash-derived
  * key and displaces the reservoir minimum iff it beats it.
  *
  * Because keys are salted-id hashes (no RNG), the reservoir after ANY
  * arrival order equals the batch operator's selection over the same
  * rows — the batch-equivalence the spec pins across micro-batch
  * splits. Each micro-batch that CHANGES a group's reservoir emits the
  * group's full current selection stamped with a monotone `version`;
  * downstream keeps max-version rows per group (update-mode semantics
  * — a reservoir is a replacement, not an append).
  *
  * Rows with non-positive weight carry no E-S key and are ignored,
  * exactly like the batch form.
  *
  * INPUT CONTRACT: rows are identified by (id, group, weight) — the
  * reservoir deduplicates exact replays, both within a micro-batch and
  * across batches (at-least-once source delivery must not double-count
  * a doc). Batch equivalence therefore holds for inputs whose rows are
  * distinct, the normal id-keyed corpus; a MULTISET input where the
  * same doc row legitimately occurs twice ranks twice in the batch
  * operator's window but once here.
  */
object StreamingWeightedSample {

  case class WeightedDoc(doc_id: Long, group: String, weight: Double)
  case class Selection(group: String, doc_id: Long, weight: Double,
      rank: Long, version: Long)
  case class Reservoir(entries: Vector[(Long, Long, Double)],
      version: Long)

  /** The batch operator's QUANTIZED key, computed JVM-side:
    * `floor(ln(u)/w · 10⁶)` with `u = (hash60(salt:id)+1)/2^60` —
    * bit-identical to the Column form (same md5, same long→double
    * conversion, same `ln`, same IEEE multiply and floor), so the
    * reservoir's (key desc, id asc) order matches the batch packed
    * order exactly, micro ties included.
    */
  def esKeyMicro(id: Long, weight: Double, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    math.floor(
      math.log((h + 1L) / 1152921504606846976.0) / weight * 1e6).toLong
  }

  def weightedSampleStream(docs: Dataset[WeightedDoc], k: Int,
      salt: String = "ws"): Dataset[Selection] = {
    import docs.sparkSession.implicits._
    require(k > 0, s"k must be positive: $k")
    docs.filter(_.weight > 0).groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (group: String, batch: Iterator[WeightedDoc],
            state: GroupState[Reservoir]) =>
          val st = state.getOption.getOrElse(Reservoir(Vector.empty, 0L))
          val merged = (st.entries ++ batch.map(d =>
              (esKeyMicro(d.doc_id, d.weight, salt), d.doc_id, d.weight)))
            .distinct // replay dedup — same-batch AND cross-batch (see contract)
            .sortBy(e => (-e._1, e._2))
            .take(k)
          if (merged == st.entries) Iterator.empty
          else {
            val next = Reservoir(merged, st.version + 1L)
            state.update(next)
            merged.iterator.zipWithIndex.map { case ((_, id, w), i) =>
              Selection(group, id, w, (i + 1).toLong, next.version)
            }
          }
      }
  }
}
