package graft.functions

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The fused serve expressions (r13 optimization) must produce the
  * EXACT values of the composed HOF chains they replaced — compared
  * here field by field over a corpus with edge cases: empty docs,
  * empty words list, unk-only words, multi-byte UTF-8, whitespace runs
  * (byte mode), vocab hits and misses, over-maxInputChars words.
  */
class SegmentServeSpec extends SparkSpecBase {

  private val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"))
  private val vocab = Seq("the" -> 10, "and" -> 20, "t" -> 1, "h" -> 2,
    "e" -> 3, "a" -> 4, "n" -> 5, "d" -> 6, "x" -> 7)

  private def wordsDf = {
    val rows = Seq(
      Seq("the", "and", "then", "xyz", "café", "中文"),
      Seq.empty[String],
      Seq("a"),
      Seq("thethe", "qqq"),
      Seq("don't", "1234", "!!"))
    val spark = this.spark
    import spark.implicits._
    rows.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "words")
  }

  test("BpeServeStats == composed HOF chain (word and byte mode)") {
    for (byteMode <- Seq(false, true)) {
      val base = wordsDf.withColumn("mapped",
        if (byteMode) transform(col("words"), t => ByteUnicode.toUnicode(t))
        else col("words"))
      val vmap = typedLit(vocab.toMap)
      val composed = base
        .withColumn("segs", transform(col("mapped"),
          m => BpeSegment(m, merges)))
        .withColumn("ids", transform(flatten(col("segs")),
          t => element_at(vmap, t)))
        .select(col("id"),
          size(col("ids")).cast("long").as("n_segments"),
          forall(zip_with(col("mapped"), col("segs"),
            (m, sg) => concat_ws("", sg) === m), b => b).as("rebuilt_ok"),
          array_join(flatten(col("segs")), "").as("seg_concat"),
          aggregate(col("ids"), lit(0L),
            (a, x) => a + coalesce(x.cast("long"), lit(0L))).as("id_sum"),
          forall(col("ids"), i => i.isNotNull).as("all_in_vocab"))
      val fused = wordsDf
        .withColumn("__st", SegmentServe.bpe(col("words"), merges, vocab,
          byteMode))
        .select(col("id"), col("__st.n_segments"), col("__st.rebuilt_ok"),
          col("__st.seg_concat"), col("__st.id_sum"), col("__st.all_in_vocab"))
      val a = composed.orderBy("id").collect().toSeq
      val b = fused.orderBy("id").collect().toSeq
      assert(a == b, s"byteMode=$byteMode:\ncomposed=$a\nfused=$b")
    }
  }

  test("UnigramServeStats == composed HOF chain (with and without prefix)") {
    val model = Seq("▁" -> 2200000L, "▁the" -> 2800000L, "the" -> 3600000L,
      "an" -> 4500000L, "d" -> 6030000L, "t" -> 6190000L, "h" -> 6070000L,
      "e" -> 6040000L, "a" -> 6000000L, "n" -> 6130000L, "x" -> 6230000L)
    val unkCost = 16230000L
    val maxLen = 4
    for (prefix <- Seq("", "▁")) {
      val vmap = typedLit(model.toMap)
      val composed = wordsDf
        .withColumn("segs", transform(col("words"),
          w => UnigramSegment(concat(lit(prefix), w), model, unkCost, maxLen)))
        .select(col("id"),
          aggregate(col("segs"), lit(0L), (a, x) => a + size(x)).as("n_pieces"),
          forall(zip_with(col("words"), col("segs"),
            (w, sg) => concat_ws("", sg) === concat(lit(prefix), w)), b => b)
            .as("rebuilt_ok"),
          array_join(flatten(col("segs")), " ").as("sp_text"),
          array_join(flatten(col("segs")), "").as("piece_concat"),
          aggregate(flatten(col("segs")), lit(0L),
            (a, p) => a + when(element_at(vmap, p).isNull, 1L).otherwise(0L))
            .as("n_unk"),
          forall(flatten(col("segs")),
            p => element_at(vmap, p).isNotNull || length(p) === 1)
            .as("covered"))
      val fused = wordsDf
        .withColumn("__st", SegmentServe.unigram(col("words"), model,
          unkCost, maxLen, prefix))
        .select(col("id"), col("__st.n_pieces"), col("__st.rebuilt_ok"),
          col("__st.sp_text"), col("__st.piece_concat"), col("__st.n_unk"),
          col("__st.covered"))
      val a = composed.orderBy("id").collect().toSeq
      val b = fused.orderBy("id").collect().toSeq
      assert(a == b, s"prefix='$prefix':\ncomposed=$a\nfused=$b")
    }
  }

  test("WordPieceServeStats == composed HOF chain (incl. maxInputChars)") {
    val pieces = Seq("[UNK]", "the", "an", "a", "t", "h", "e", "n", "d",
      "##e", "##n", "##d", "##he", "##z")
    val unk = "[UNK]"
    for (maxChars <- Seq(3, 100)) {
      val composed = wordsDf
        .withColumn("segs", transform(col("words"),
          w => WordPieceSegment(w, pieces, unk, maxChars)))
        .select(col("id"),
          aggregate(col("segs"), lit(0L), (a, x) => a + size(x)).as("n_pieces"),
          aggregate(col("segs"), lit(0L),
            (a, x) => a + when(size(x) === 1 && element_at(x, 1) === unk,
              1L).otherwise(0L)).as("n_unk"),
          array_join(flatten(col("segs")), " ").as("wp_text"))
      val fused = wordsDf
        .withColumn("__st", SegmentServe.wordPiece(col("words"), pieces,
          unk, maxChars))
        .select(col("id"), col("__st.n_pieces"), col("__st.n_unk"),
          col("__st.wp_text"))
      val a = composed.orderBy("id").collect().toSeq
      val b = fused.orderBy("id").collect().toSeq
      assert(a == b, s"maxChars=$maxChars:\ncomposed=$a\nfused=$b")
    }
  }
}
