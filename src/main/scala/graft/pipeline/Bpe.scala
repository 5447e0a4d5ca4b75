package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import TextOps._

/** Tokenizer-training statistics: the corpus-wide symbol-pair counting
  * step of byte-pair encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" §3.2). BPE training is
  * an iterative loop — count adjacent symbol pairs, merge the most
  * frequent, repeat — whose per-iteration cost at corpus scale is
  * entirely this counting aggregate; the merge itself touches only the
  * vocabulary. The engine exposes the counting pass as a first-class
  * distributed operator: one explode over token occurrences, one over
  * within-token adjacent pairs, then a single hash aggregate with
  * map-side partials (the canonical word-count shuffle shape — no
  * all-pairs, no driver loop).
  */
object Bpe {

  /** Within-word adjacent character pairs (the BPE iteration-1 merge
    * candidates), weighted by word OCCURRENCE (a word appearing 100×
    * contributes its pairs 100×, as in the reference algorithm's
    * frequency-weighted pair counts). Single-char words contribute
    * nothing.
    */
  private def charPairs(w: Column): Column =
    when(length(w) >= 2,
      transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))

  /** Top-`k` most frequent adjacent character pairs across all word
    * occurrences in the corpus, ties broken by pair string ascending so
    * the cut is deterministic (the oracle-parity requirement for any
    * LIMIT). Output: `(pair, n_count)` ordered by count desc, pair asc.
    */
  def pairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = docs.select(explode(tokens(col(textCol))).as("w"))
    words.select(explode(charPairs(col("w"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_count"))
      .orderBy(col("n_count").desc, col("pair"))
      .limit(k)
  }

  /** Full BPE merge-table training (Sennrich et al. 2016, learn_bpe):
    * the corpus contributes ONE word-frequency aggregate (the only
    * distributed pass — at 100 TB the vocabulary is millions of rows
    * where the corpus is trillions of tokens); the iterative merge loop
    * then runs driver-local over that compact dictionary, exactly the
    * size-gated driver-compute pattern of PQ codebook training
    * ([[Similarity]]'s sampled Lloyd's — FAISS practice). The dictionary
    * is capped at the `maxWords` MOST FREQUENT words (count desc, word
    * asc — deterministic), the standard practice for web-scale corpora
    * where the hapax tail adds cost but no merges.
    *
    * Tie-breaks are pinned so training is reproducible across cluster
    * sizes: the winning pair each round is (max count, then
    * lexicographically smallest pair). Returns the learned merges in
    * order: `(rank, left, right, pair_count)`.
    *
    * Complexity: the INDEXED incremental formulation — an initial
    * O(dictionary chars) pass builds pair→count plus pair→wordIds, and
    * each round then touches only the words containing the winning
    * pair (plus O(log P) lazy-deletion heap maintenance for the max).
    * Affected-word sets shrink geometrically with rank, so a
    * production 32k-merge run is feasible where the naive
    * O(nMerges · dictionary chars) rescan (kept as
    * [[trainMergesNaiveLocal]] for the equivalence spec) is not.
    * Selection and update order are EXACTLY the naive rule — the two
    * formulations produce identical merge tables by construction.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1000000): Seq[(Int, String, String, Long)] = {
    val vocab: Array[(Array[String], Long)] = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (graft.functions.BpeSegment.codePoints(r.getString(0)),
        r.getLong(1)))
    trainMergesLocal(vocab, nMerges)
  }

  /** Driver-local indexed BPE over a collected `(symbols, freq)` dict.
    *
    * Data structures (the classic incremental learn_bpe shape):
    *  - `counts`: pair → corpus-weighted adjacent-occurrence count
    *  - `where`:  pair → set of word indices currently containing it
    *  - `heap`:   lazy-deletion max-heap of `(pair, count)` snapshots;
    *    an entry is valid iff its count still equals `counts(pair)`.
    *    Every count CHANGE pushes a fresh snapshot, so the set of valid
    *    entries always covers every live pair and the first valid pop
    *    is the true argmax under (count desc, pair asc) — the same
    *    deterministic tie-break as the naive rescan.
    *
    * Per round, only words in `where(best)` are touched: each has its
    * old pair contributions subtracted, the merge applied in place
    * (identical left-to-right overlap rule to the naive loop), and its
    * new contributions added — a full per-word recount, which avoids
    * the fiddly neighbor-delta bookkeeping while staying O(affected
    * word chars) per round.
    */
  private[pipeline] def trainMergesLocal(vocab: Array[(Array[String], Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val words = vocab.map(v => mutable.ArrayBuffer.from(v._1))
    val freqs = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + freqs(i)
        where.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
      i += 1
    }
    // max-heap: greater = (higher count, then lexicographically SMALLER pair)
    val ord = new Ordering[((String, String), Long)] {
      def compare(x: ((String, String), Long), y: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(x._2, y._2)
        if (c != 0) c
        else {
          val a = y._1._1.compareTo(x._1._1)
          if (a != 0) a else y._1._2.compareTo(x._1._2)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[((String, String), Long)](ord)
    counts.foreach(heap += _)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // pop stale snapshots until the head reflects a live count
      var top: Option[((String, String), Long)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (counts.get(cand._1).contains(cand._2)) top = Some(cand)
      }
      top match {
        case None => done = true
        case Some((best, bestCnt)) =>
          merges += ((rank, best._1, best._2, bestCnt))
          val joined = best._1 + best._2
          val affected = where(best).toArray.sorted
          val delta = mutable.HashMap.empty[(String, String), Long]
          var a = 0
          while (a < affected.length) {
            val idx = affected(a)
            val w = words(idx)
            val f = freqs(idx)
            var j = 0
            while (j < w.length - 1) {
              delta((w(j), w(j + 1))) = delta.getOrElse((w(j), w(j + 1)), 0L) - f
              j += 1
            }
            j = 0
            while (j < w.length - 1) {
              if (w(j) == best._1 && w(j + 1) == best._2) {
                w(j) = joined
                w.remove(j + 1)
              } else j += 1
            }
            j = 0
            while (j < w.length - 1) {
              delta((w(j), w(j + 1))) = delta.getOrElse((w(j), w(j + 1)), 0L) + f
              j += 1
            }
            a += 1
          }
          // apply count deltas + refresh membership for the touched words
          delta.foreach { case (p, d) =>
            if (d != 0) {
              val nc = counts.getOrElse(p, 0L) + d
              if (nc <= 0L) { counts.remove(p); where.remove(p) }
              else { counts(p) = nc; heap += ((p, nc)) }
            }
          }
          // membership: a touched word may still/newly contain p — rescan
          // the touched words' pairs once (cheap: same words just walked)
          var b = 0
          while (b < affected.length) {
            val idx = affected(b)
            val w = words(idx)
            var j = 0
            while (j < w.length - 1) {
              val p = (w(j), w(j + 1))
              if (counts.contains(p))
                where.getOrElseUpdate(p, mutable.HashSet.empty) += idx
              j += 1
            }
            b += 1
          }
          rank += 1
      }
    }
    merges.result()
  }

  /** The round-6 naive formulation — full pair recount every round.
    * Retained UNEXPORTED solely so the spec can assert the indexed
    * variant reproduces it merge-for-merge on arbitrary dicts.
    */
  private[pipeline] def trainMergesNaiveLocal(
      vocab: Array[(Array[String], Long)],
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    val words = vocab.map(_._1.toBuffer)
    val freqs = vocab.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var j = 0
        while (j < w.length - 1) {
          val p = (w(j), w(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + freqs(i)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) done = true
      else {
        val (best, bestCnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, best._1, best._2, bestCnt))
        val joined = best._1 + best._2
        i = 0
        while (i < words.length) {
          val w = words(i)
          var j = 0
          while (j < w.length - 1) {
            if (w(j) == best._1 && w(j + 1) == best._2) {
              w(j) = joined
              w.remove(j + 1)
            } else j += 1
          }
          i += 1
        }
        rank += 1
      }
    }
    merges.result()
  }
}
