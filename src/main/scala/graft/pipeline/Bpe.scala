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
}
