package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece subword segmentation of a single word (Wu et al. 2016,
  * "Google's Neural Machine Translation System" §4.1 — the BERT-family
  * serve path): greedy LONGEST-match-first against a fixed vocabulary,
  * continuation pieces carrying the `##` prefix, and the all-or-nothing
  * rule — a word with ANY unmatchable position collapses to the single
  * `unkToken`, never a partial segmentation (the HuggingFace
  * BertWordPieceTokenizer contract). The vocabulary rides as codegen
  * reference objects (two hash sets: word-initial pieces and
  * `##`-stripped continuations), so encoding stays inside whole-stage
  * codegen as a plain method call — no UDF.
  *
  * Greedy longest-match is DETERMINISTIC and SQL-replayable: at a given
  * position and length only one candidate string exists (the substring
  * itself), so "longest match" has no tie to break — the property that
  * lets the DuckDB oracle replay segmentation bit-for-bit, unlike the
  * likelihood-trained BPE/unigram merge loops.
  *
  * Symbols are Unicode code points (the [[BpeSegment]] convention, and
  * DuckDB's substr/length unit, so positions agree cross-engine).
  * Words longer than `maxInputChars` code points (HF default 100)
  * collapse to `unkToken` without probing — the
  * max_input_chars_per_word rule. Invariant: for a non-UNK result,
  * concatenating the pieces with the `##` prefixes stripped reproduces
  * the input word. Null → null; empty word → empty array.
  */
case class WordPieceSegment(child: Expression, vocab: Seq[String],
    unkToken: String, maxInputChars: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // vocab split ONCE: entries starting with "##" are continuation-only
  // (stored stripped), the rest word-initial-only — mirroring the
  // lookup classes the greedy loop probes
  @transient private lazy val bareSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (!p.startsWith("##")) s.add(p))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
    s
  }
  // longest piece per lookup class, in CODE POINTS (the probe unit):
  // the greedy loop's first probe length starts here, not at the full
  // remaining span — without the cap a single long whitespace-free junk
  // token (common in crawl data) costs O(len³) char-copy work per word
  @transient private lazy val maxBareLen: Int =
    if (bareSet.isEmpty) 0
    else vocab.iterator.filter(!_.startsWith("##"))
      .map(p => p.codePointCount(0, p.length)).max
  @transient private lazy val maxContLen: Int =
    if (contSet.isEmpty) 0
    else vocab.iterator.filter(_.startsWith("##"))
      .map(p => p.codePointCount(2, p.length)).max

  override protected def nullSafeEval(input: Any): Any =
    WordPieceSegment.segmentJ(input.asInstanceOf[UTF8String],
      bareSet, contSet, unkToken, maxBareLen, maxContLen, maxInputChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("wpBare", bareSet, "java.util.HashSet")
      val c = ctx.addReferenceObj("wpCont", contSet, "java.util.HashSet")
      val u = ctx.addReferenceObj("wpUnk", unkToken, "java.lang.String")
      s"${ev.value} = graft.functions.WordPieceSegment.segmentJ($a, $b, $c, " +
        s"$u, $maxBareLen, $maxContLen, $maxInputChars);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceSegment {

  /** The greedy apply loop; static-forwarded so generated code calls it
    * directly. Probe lengths start at min(remaining span, longest vocab
    * piece of the lookup class) — no probe longer than the longest piece
    * can ever match, so the cap changes nothing semantically while
    * bounding work at O(len × maxPieceLen²) char copies instead of
    * O(len³). Words longer than `maxInputChars` code points collapse to
    * `[unk]` up front (the HuggingFace max_input_chars_per_word rule —
    * also the guard that keeps a megabyte junk token from stalling an
    * executor). The first hit is still the longest match by construction.
    */
  def segmentJ(word: UTF8String, bare: java.util.HashSet[String],
      cont: java.util.HashSet[String], unk: String,
      maxBare: Int, maxCont: Int, maxInputChars: Int): ArrayData = {
    val cps = BpeSegment.codePoints(word.toString)
    if (cps.length == 0) return new GenericArrayData(Array.empty[Any])
    if (cps.length > maxInputChars)
      return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cps.length) {
      val set = if (i == 0) bare else cont
      var l = math.min(cps.length - i, if (i == 0) maxBare else maxCont)
      var matched = -1
      while (l >= 1 && matched < 0) {
        if (set.contains(cps.slice(i, i + l).mkString)) matched = l
        else l -= 1
      }
      if (matched < 0) // all-or-nothing: one unmatchable position
        return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
      val piece = cps.slice(i, i + matched).mkString
      out += (if (i == 0) piece else "##" + piece)
      i += matched
    }
    new GenericArrayData(out.map(p => UTF8String.fromString(p)).toArray[Any])
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(word: Column, vocab: Seq[String],
      unkToken: String = "[UNK]", maxInputChars: Int = 100): Column =
    ColumnBridge.column(WordPieceSegment(ColumnBridge.expression(word),
      vocab, unkToken, maxInputChars))
}
