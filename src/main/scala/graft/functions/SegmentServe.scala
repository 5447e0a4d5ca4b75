package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass tokenizer SERVING statistics (r13 optimization).
  *
  * The serving queries (p47/p62/p93/p100/p112/p141/p142/p146/p152/p153)
  * previously composed the per-word segmenter expressions with array
  * higher-order functions — `transform` → `aggregate`/`forall` →
  * `flatten`/`array_join` — plus `element_at` on map LITERALS for vocab
  * lookups. Two structural costs, both per ROW × per TOKEN:
  *
  *   1. HigherOrderFunction expressions are CodegenFallback — every
  *      lambda invocation is interpreted, with an AtomicReference set
  *      per element per lambda, and nested HOFs multiply it;
  *   2. `element_at` on a map literal is a LINEAR key scan
  *      (ArrayBasedMapData has no index), so a vocab of V entries costs
  *      O(V) string compares per emitted token.
  *
  * These expressions compute the SAME values in one codegen-resident
  * pass per document: iterate the word array once, call the exact same
  * static segmentation kernels ([[BpeSegment.segmentJ]],
  * [[UnigramSegment.segmentJ]], [[WordPieceSegment.segmentJ]],
  * [[ByteUnicode.mapJ]]) the composed form called, and fold counts /
  * certificates / concatenations locally, with vocab lookups through a
  * prebuilt HashMap. The segmentation algebra lives ONLY in the kernels
  * — nothing is reimplemented, so the fused outputs cannot drift from
  * the per-word expressions (pinned by SegmentServeSpec equivalence
  * tests). Null word-array → null struct (the HOF chains' null
  * propagation); the reconstruction certificates are computed for real
  * (string compares per word), not assumed.
  */
object SegmentServe {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bpe(words: Column, merges: Seq[(String, String)],
      vocab: Seq[(String, Int)], byteMode: Boolean): Column =
    ColumnBridge.column(BpeServeStats(ColumnBridge.expression(words),
      merges, vocab, byteMode))

  def unigram(words: Column, model: Seq[(String, Long)], unkCostMicro: Long,
      maxPieceLen: Int, prefix: String): Column =
    ColumnBridge.column(UnigramServeStats(ColumnBridge.expression(words),
      model, unkCostMicro, maxPieceLen, prefix))

  def wordPiece(words: Column, vocab: Seq[String], unkToken: String,
      maxInputChars: Int): Column =
    ColumnBridge.column(WordPieceServeStats(ColumnBridge.expression(words),
      vocab, unkToken, maxInputChars))
}

/** Byte/word-BPE serving fold over a word (or pretoken) array.
  *
  * Output struct:
  *   - `n_segments`  — Σ per-word subword counts;
  *   - `rebuilt_ok`  — every word's segments concatenate back to the
  *     (byte-mapped, in byteMode) word;
  *   - `seg_concat`  — all segments concatenated in order (==
  *     `array_join(flatten(segs), "")` of the composed form — the
  *     lossless certificate's input);
  *   - `id_sum`      — Σ vocab ids of the segments (missing → +0, the
  *     `coalesce(id, 0)` fold);
  *   - `all_in_vocab`— every segment present in `vocab`.
  * With an empty `vocab`, id_sum = 0 and all_in_vocab = words-empty
  * vacuous truth — callers without a vocab ignore both fields.
  */
case class BpeServeStats(child: Expression, merges: Seq[(String, String)],
    vocab: Seq[(String, Int)], byteMode: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BpeServeStats expects array<string>, got $other")
    }

  override def dataType: DataType = BpeServeStats.schema

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val k = l + " " + r
      if (!m.containsKey(k)) m.put(k, i)
    }
    m
  }
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(t, i.toLong) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeServeStats.evalJ(input.asInstanceOf[ArrayData], ranks, ids, byteMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.addReferenceObj("bpeServeRanks", ranks, "java.util.HashMap")
      val v = ctx.addReferenceObj("bpeServeIds", ids, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeServeStats.evalJ($a, $r, $v, $byteMode);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeServeStats {
  val schema: StructType = StructType(Seq(
    StructField("n_segments", LongType, nullable = false),
    StructField("rebuilt_ok", BooleanType, nullable = false),
    StructField("seg_concat", StringType, nullable = false),
    StructField("id_sum", LongType, nullable = false),
    StructField("all_in_vocab", BooleanType, nullable = false)))

  def evalJ(words: ArrayData, ranks: java.util.HashMap[String, Integer],
      ids: java.util.HashMap[String, java.lang.Long],
      byteMode: Boolean): InternalRow = {
    var nSegs = 0L
    var rebuilt = true
    var idSum = 0L
    var allIn = true
    val concat = new java.lang.StringBuilder()
    var w = 0
    val n = words.numElements()
    while (w < n) {
      val raw = words.getUTF8String(w)
      val u = if (byteMode) ByteUnicode.mapJ(raw) else raw
      val segs = BpeSegment.segmentJ(u, ranks)
      val m = segs.numElements()
      nSegs += m
      val back = new java.lang.StringBuilder()
      var j = 0
      while (j < m) {
        val s = segs.getUTF8String(j)
        val str = s.toString
        back.append(str)
        concat.append(str)
        val id = ids.get(str)
        if (id != null) idSum += id.longValue() else allIn = false
        j += 1
      }
      if (back.toString != u.toString) rebuilt = false
      w += 1
    }
    new GenericInternalRow(Array[Any](nSegs, rebuilt,
      UTF8String.fromString(concat.toString), idSum, allIn))
  }
}

/** Unigram-LM (SentencePiece) serving fold over a word array; each word
  * is segmented as `prefix + word` (the ▁ word-boundary convention —
  * pass "" for the bare p62 form).
  *
  * Output struct:
  *   - `n_pieces`    — Σ per-word piece counts;
  *   - `rebuilt_ok`  — every word's pieces concatenate back to its
  *     prefixed form;
  *   - `sp_text`     — all pieces joined with single spaces (==
  *     `array_join(flatten(segs), " ")`);
  *   - `piece_concat`— all pieces concatenated (the lossless
  *     certificate's input);
  *   - `n_unk`       — pieces with no model entry;
  *   - `covered`     — every piece is a model piece OR a single code
  *     point (the unk-fallback coverage certificate).
  */
case class UnigramServeStats(child: Expression, model: Seq[(String, Long)],
    unkCostMicro: Long, maxPieceLen: Int, prefix: String)
  extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"UnigramServeStats expects array<string>, got $other")
    }

  override def dataType: DataType = UnigramServeStats.schema

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    UnigramServeStats.evalJ(input.asInstanceOf[ArrayData], costs,
      unkCostMicro, maxPieceLen, prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("unigramServeCosts", costs,
        "java.util.HashMap")
      val p = ctx.addReferenceObj("unigramServePrefix", prefix,
        "java.lang.String")
      s"${ev.value} = graft.functions.UnigramServeStats.evalJ($a, $m, " +
        s"${unkCostMicro}L, $maxPieceLen, $p);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramServeStats {
  val schema: StructType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("rebuilt_ok", BooleanType, nullable = false),
    StructField("sp_text", StringType, nullable = false),
    StructField("piece_concat", StringType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("covered", BooleanType, nullable = false)))

  def evalJ(words: ArrayData, costs: java.util.HashMap[String, java.lang.Long],
      unkCostMicro: Long, maxPieceLen: Int, prefix: String): InternalRow = {
    var nPieces = 0L
    var rebuilt = true
    var nUnk = 0L
    var covered = true
    val spText = new java.lang.StringBuilder()
    val concat = new java.lang.StringBuilder()
    var w = 0
    val n = words.numElements()
    while (w < n) {
      val u = prefix + words.getUTF8String(w).toString
      val segs = UnigramSegment.segmentJ(UTF8String.fromString(u), costs,
        unkCostMicro, maxPieceLen)
      val m = segs.numElements()
      nPieces += m
      val back = new java.lang.StringBuilder()
      var j = 0
      while (j < m) {
        val str = segs.getUTF8String(j).toString
        back.append(str)
        concat.append(str)
        if (spText.length() > 0) spText.append(' ')
        spText.append(str)
        if (!costs.containsKey(str)) {
          nUnk += 1L
          if (str.codePointCount(0, str.length) != 1) covered = false
        }
        j += 1
      }
      if (back.toString != u) rebuilt = false
      w += 1
    }
    new GenericInternalRow(Array[Any](nPieces, rebuilt,
      UTF8String.fromString(spText.toString),
      UTF8String.fromString(concat.toString), nUnk, covered))
  }
}

/** WordPiece serving fold over a word array.
  *
  * Output struct:
  *   - `n_pieces` — Σ per-word piece counts;
  *   - `n_unk`    — words collapsed to the single unk token (size 1 and
  *     equal to `unkToken`, exactly the composed form's test);
  *   - `wp_text`  — all pieces joined with single spaces.
  */
case class WordPieceServeStats(child: Expression, vocab: Seq[String],
    unkToken: String, maxInputChars: Int)
  extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"WordPieceServeStats expects array<string>, got $other")
    }

  override def dataType: DataType = WordPieceServeStats.schema

  // the same split-once lookup structures as WordPieceSegment
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
  @transient private lazy val maxBareLen: Int =
    if (bareSet.isEmpty) 0
    else vocab.iterator.filter(!_.startsWith("##"))
      .map(p => p.codePointCount(0, p.length)).max
  @transient private lazy val maxContLen: Int =
    if (contSet.isEmpty) 0
    else vocab.iterator.filter(_.startsWith("##"))
      .map(p => p.codePointCount(2, p.length)).max

  override protected def nullSafeEval(input: Any): Any =
    WordPieceServeStats.evalJ(input.asInstanceOf[ArrayData], bareSet, contSet,
      unkToken, maxBareLen, maxContLen, maxInputChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.addReferenceObj("wpServeBare", bareSet, "java.util.HashSet")
      val c = ctx.addReferenceObj("wpServeCont", contSet, "java.util.HashSet")
      val u = ctx.addReferenceObj("wpServeUnk", unkToken, "java.lang.String")
      s"${ev.value} = graft.functions.WordPieceServeStats.evalJ($a, $b, $c, " +
        s"$u, $maxBareLen, $maxContLen, $maxInputChars);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceServeStats {
  val schema: StructType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("wp_text", StringType, nullable = false)))

  def evalJ(words: ArrayData, bare: java.util.HashSet[String],
      cont: java.util.HashSet[String], unk: String,
      maxBare: Int, maxCont: Int, maxInputChars: Int): InternalRow = {
    var nPieces = 0L
    var nUnk = 0L
    val wpText = new java.lang.StringBuilder()
    var w = 0
    val n = words.numElements()
    while (w < n) {
      val segs = WordPieceSegment.segmentJ(words.getUTF8String(w), bare, cont,
        unk, maxBare, maxCont, maxInputChars)
      val m = segs.numElements()
      nPieces += m
      if (m == 1 && segs.getUTF8String(0).toString == unk) nUnk += 1L
      var j = 0
      while (j < m) {
        if (wpText.length() > 0) wpText.append(' ')
        wpText.append(segs.getUTF8String(j).toString)
        j += 1
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](nPieces, nUnk,
      UTF8String.fromString(wpText.toString)))
  }
}
