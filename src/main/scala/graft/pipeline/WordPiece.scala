package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (the BERT-family subword scheme) — the one
  * production tokenizer family the engine lacked next to BPE
  * (char + byte) and unigram-LM. Two halves:
  *
  *  - SERVING — [[graft.functions.WordPieceSegment]]: greedy
  *    longest-match-first with `##` continuations and the
  *    all-or-nothing `[UNK]` rule, bit-for-bit the BERT inference
  *    contract and (unlike the likelihood-trained merge loops)
  *    deterministic AND SQL-replayable, so corpus queries over it are
  *    hash-exact against the DuckDB oracle.
  *  - VOCAB CONSTRUCTION — [[vocabFrame]]: a deterministic
  *    frequency-rank recipe (top-K whole words + their `##`-suffixes +
  *    full character coverage), NOT the likelihood trainer of the BERT
  *    paper — the honest simplification: the segmenter is the
  *    production-exact part, and a real trained vocabulary drops in
  *    through the same [[TokenizerIO]] relation.
  *
  * Scale: vocab construction is one word-count shuffle + bounded
  * projections; serving is a codegen expression over the token array —
  * zero shuffles, embarrassingly parallel at any corpus size.
  */
object WordPiece {

  /** The vocabulary relation, one `piece` per row:
    *
    *  - the `topWords` most frequent words (by count desc, then word) —
    *    word-initial whole pieces, so frequent words stay one token and
    *    greedy matching finds whole-word PREFIXES of longer words
    *    ('batches' → 'batch' + '##es');
    *  - every `##`-prefixed mid-word n-gram of length ≤ `contLen` from
    *    every DISTINCT word — multi-char continuations (bounded by
    *    type count × word length × contLen, never token count). Capped
    *    length matters: an UNCAPPED suffix set would contain each
    *    word's own full tail, so greedy segmentation would always stop
    *    after two pieces — the cap is what produces real greedy chains
    *    ('stream' → 's' + '##tre' + '##am' at contLen 3);
    *  - every single character observed word-initially (bare) — full
    *    coverage, so corpus words never hit `[UNK]` (length-1
    *    continuations are in the n-gram set; foreign-alphabet input at
    *    serve time still can hit `[UNK]`, by design).
    *
    * Every step is replayable in SQL — the property the oracle needs.
    */
  def vocabFrame(docs: DataFrame, textCol: String, topWords: Int,
      contLen: Int = 3): DataFrame = {
    require(topWords >= 1 && contLen >= 1,
      s"topWords and contLen must be >= 1: $topWords, $contLen")
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
    val counts = words.groupBy("w").agg(count(lit(1)).as("c"))
    val distinctW = counts.select("w")
    val whole = counts
      .withColumn("__r", row_number().over(
        Window.orderBy(col("c").desc, col("w"))))
      .filter(col("__r") <= topWords)
      .select(col("w").as("piece"))
    // mid-word n-grams, ## prefixed; a length-1 word has none
    // (sequence(2, 1) would DESCEND, not return empty — guard first)
    val contGrams = distinctW
      .filter(length(col("w")) >= 2)
      .select(explode(sequence(lit(2), length(col("w")))).as("i"), col("w"))
      .select(explode(sequence(lit(1),
        least(lit(contLen), length(col("w")) - col("i") + 1))).as("l"),
        col("i"), col("w"))
      .select(concat(lit("##"), col("w").substr(col("i"), col("l"))).as("piece"))
    val bareChars = distinctW.select(substring(col("w"), 1, 1).as("piece"))
    whole.unionByName(contGrams).unionByName(bareChars).distinct()
  }

  /** Segment a word column under `vocab` — the serving column. */
  def segment(word: Column, vocab: Seq[String],
      unkToken: String = "[UNK]"): Column =
    graft.functions.WordPieceSegment(word, vocab, unkToken)
}
