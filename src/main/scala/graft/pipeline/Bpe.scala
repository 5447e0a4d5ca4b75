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
    * Complexity: each round recounts pairs over the whole dictionary —
    * O(nMerges · dictionary chars) — which is the simple reference
    * formulation and fine for the few-hundred-merge analytics uses
    * here. A 32k-merge production tokenizer run wants the classic
    * indexed variant (pair→count plus pair→wordIds, touching only the
    * words the winning merge changed); the surrounding plumbing — one
    * corpus aggregate in, a merge table out — is unchanged by that
    * swap.
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
