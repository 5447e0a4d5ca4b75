package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ByteUnicode

/** Byte-level BPE with GPT-2-style regex pre-tokenization (Radford et
  * al. 2019; the tiktoken/HuggingFace `gpt2` tokenizer family) — the
  * production counterpart of the whitespace-word BPE in [[Bpe]]:
  *
  *   - PRE-TOKENIZATION splits text into contraction suffixes,
  *     optionally-space-prefixed letter/digit/punctuation runs, and
  *     whitespace chunks. Pre-tokens PARTITION the text exactly
  *     (`concat(pretokens) == strip_u0001(text)` — the U+0001 strip is
  *     the single normalization, see [[pretokens]]), so the tokenizer
  *     is LOSSLESS —
  *     whitespace survives round-trips, the property that makes this
  *     the tokenizer family production LLMs actually train on.
  *   - The ALPHABET is the 256 mapped bytes ([[ByteUnicode]]), so no
  *     string — emoji, CJK, binary junk — is ever out-of-vocabulary:
  *     unknown characters decompose into byte symbols.
  *   - MERGES are learned by the same indexed trainer as [[Bpe]]
  *     (`trainMergesLocal` — the distributed pass is one pre-token
  *     frequency aggregate; the loop runs driver-local over the capped
  *     dictionary), just over byte symbols of pre-tokens instead of
  *     code points of words.
  *
  * GPT-2's published pattern ends `\s+(?!\S)|\s+` — a negative
  * LOOKAHEAD, which Java regex has but RE2 (the oracle's engine) does
  * not. The lookahead implements one rule: a maximal whitespace run
  * before a non-space splits as (run minus its last char) + (last char
  * attaches to the next token when it can). [[pretokens]] gets the
  * identical partition lookahead-free: one `regexp_replace` inserts a
  *  marker between the last two whitespace characters of every
  * such run, the text splits at markers, and each segment tokenizes
  * under the remaining (RE2-safe) alternation — so the DuckDB oracle
  * replays pre-tokenization exactly, marker transform and all. The
  * equivalence cases (space vs tab last-char, runs of 1/2/n, trailing
  * runs) are pinned in the spec against the lookahead form run through
  * Java regex.
  */
object BpeByte {

  /** The whitespace class, spelled out. Java's `\s` includes U+000B
    * (vertical tab) but RE2's — the oracle's engine — does not, so a
    * literal `\s` here would tokenize a `\x0B`-bearing doc differently
    * in the engine vs DuckDB. The explicit class is identical in both
    * engines; U+000B is consistently a punctuation-class char on both
    * sides.
    */
  val Ws: String = " \\t\\n\\f\\r"

  /** The GPT-2 alternation minus the lookahead branch (handled by the
    * marker transform) — Java-regex/RE2-identical constructs only.
    */
  val PretokenRe: String =
    s"'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^$Ws\\p{L}\\p{N}]+|[$Ws]+"

  /** The marker insertion: between the last two whitespace chars of any
    * whitespace run that precedes a non-space.
    */
  val MarkerRe: String = s"([$Ws])([$Ws])([^$Ws])"

  /** GPT-2 pre-tokens of `text`, in order, partitioning it exactly —
    * after the ONE normalization this tokenizer applies: pre-existing
    * U+0001 (SOH, a transport control byte with no text content) is
    * stripped FIRST, because U+0001 is the pre-tokenizer's internal
    * split marker and an in-band occurrence would otherwise be silently
    * dropped mid-token by the split, breaking the partition. The
    * invariant is `concat(pretokens) == strip_u0001(text)` — byte-exact
    * for every string that does not contain SOH — and the strip is
    * applied identically here, in [[pretokensLocal]], and in the DuckDB
    * oracle mirrors (`replace(text, chr(1), '')`), pinned by spec.
    * Lossless asserts must compare against [[stripMarker]] of the input.
    */
  def pretokens(text: Column): Column =
    flatten(transform(
      split(regexp_replace(stripMarker(text), MarkerRe, "$1\u0001$2$3"),
        "\u0001"),
      seg => regexp_extract_all(seg, lit(PretokenRe), lit(0))))

  /** The [[pretokens]] input normalization (U+0001 strip), exposed so
    * lossless asserts and oracle mirrors reference the same text.
    */
  def stripMarker(text: Column): Column =
    regexp_replace(text, "\u0001", "")

  /** JVM mirror of [[pretokens]] for the driver-local trainer path and
    * the spec's lookahead-equivalence check.
    */
  def pretokensLocal(text: String): Seq[String] = {
    val marked =
      text.replace("\u0001", "").replaceAll(MarkerRe, "$1\u0001$2$3")
    val re = java.util.regex.Pattern.compile(PretokenRe)
    marked.split("\u0001", -1).toSeq.flatMap { seg =>
      val m = re.matcher(seg)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out
    }
  }

  /** Byte-level merge-table training: ONE distributed pre-token
    * frequency aggregate (count desc, token asc, capped at `maxWords` —
    * the [[Bpe.trainMerges]] discipline), then the indexed incremental
    * loop over byte-mapped symbols. Returns `(rank, left, right,
    * pair_count)` with symbols in the mapped alphabet.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 1000000): Seq[(Int, String, String, Long)] = {
    val vocab: Array[(Array[String], Long)] = docs
      .select(explode(pretokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (graft.functions.BpeSegment.codePoints(
        ByteUnicode.mapBytes(r.getString(0))), r.getLong(1)))
    Bpe.trainMergesLocal(vocab, nMerges)
  }
}
