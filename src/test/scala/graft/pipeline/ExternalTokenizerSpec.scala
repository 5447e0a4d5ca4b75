package graft.pipeline

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** Published-tokenizer interop (r13): the committed fixture FILES under
  * `src/test/resources/external_tok/` must parse, through the real
  * loaders, to exactly the [[TokenizerFixtures]] constants (file and
  * code cannot drift), segmentation under the loaded artifacts must
  * match hand-computed expectations, and unsupported artifacts must
  * fail loudly by name.
  */
class ExternalTokenizerSpec extends SparkSpecBase {

  private val fixDir = "src/test/resources/external_tok"

  test("committed GPT-2 fixture parses to the canonical constants; segmentation + ids hand-checked") {
    val (merges, vocab) = TokenizerIO.loadExternalGpt2(spark,
      s"$fixDir/gpt2_toy/vocab.json", s"$fixDir/gpt2_toy/merges.txt")
    assert(merges == TokenizerFixtures.Gpt2Merges)
    assert(vocab == TokenizerFixtures.Gpt2Vocab.toMap)
    // hand-computed greedy lowest-rank-first segmentation:
    //  "the"  -> (t h)r0 -> (th e)r1 -> [the]
    //  "Ġand" -> (a n)r5 fires before (Ġ a)r7 -> [Ġ, an, d]
    //            -> (an d)r6 -> [Ġ, and]; (Ġ,and) is no merge
    //  "Ġof"  -> (o f)r11 before (Ġ o)r13 -> [Ġ, of]
    import spark.implicits._
    val out = Seq("the and of").toDF("text")
      .select(BpeByte.pretokens(col("text")).as("pts"))
      .select(transform(col("pts"), t =>
        graft.functions.BpeSegment(
          graft.functions.ByteUnicode.toUnicode(t), merges)).as("segs"))
      .collect().head.getSeq[Seq[String]](0)
    assert(out == Seq(Seq("the"), Seq("Ġ", "and"), Seq("Ġ", "of")), out)
    // ids through the loaded vocab: byte symbols at their byte value,
    // merged symbols at 256 + rank
    assert(vocab("the") == 257 && vocab("and") == 262 && vocab("of") == 267)
    assert(vocab("Ġ") == 32) // mapped space sits at the space byte
  }

  test("committed HF WordPiece fixture parses to the constants; greedy serve matches; custom unk honored") {
    val (pieces, unk, maxChars) = TokenizerIO.loadExternalHfWordPiece(
      spark, s"$fixDir/hf_wordpiece_toy/tokenizer.json")
    assert(pieces == TokenizerFixtures.HfWpPieces)
    assert(unk == TokenizerFixtures.HfWpUnk && unk == "<unk>")
    assert(maxChars == TokenizerFixtures.HfWpMaxChars && maxChars == 64)
    import spark.implicits._
    def seg(w: String) = Seq(w).toDF("w")
      .select(graft.functions.WordPieceSegment(col("w"), pieces, unk,
        maxChars).as("s"))
      .collect().head.getSeq[String](0)
    // whole word; longest-match chains; ## continuations; digits
    assert(seg("the") == Seq("the"))
    assert(seg("theming") == Seq("the", "##m", "##ing"))
    assert(seg("wither") == Seq("with", "##er"))
    assert(seg("a1") == Seq("a", "##1"))
    // uncovered char -> all-or-nothing unk; over-length -> unk unprobed
    assert(seg("naïve") == Seq("<unk>"))
    assert(seg("a" * 65) == Seq("<unk>"))
  }

  test("committed HF-BPE fixture (single-file GPT-2 export) parses to the same merges + vocab") {
    val (merges, vocab) = TokenizerIO.loadExternalHfBpe(spark,
      s"$fixDir/hf_bpe_toy/tokenizer.json")
    // the single-file export and the vocab.json+merges.txt pair are the
    // SAME artifact — both must load to identical tables
    assert(merges == TokenizerFixtures.Gpt2Merges)
    assert(vocab == TokenizerFixtures.Gpt2Vocab.toMap)
    // the "left right" STRING merge form loads identically
    def writeTmp(content: String): String = {
      val f = java.nio.file.Files.createTempFile("tok", ".json")
      java.nio.file.Files.writeString(f, content)
      f.toString
    }
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = om.readTree(TokenizerFixtures.hfBpeJson)
    val m = tree.get("model").asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    val strMerges = m.putArray("merges")
    TokenizerFixtures.Gpt2Merges.foreach { case (l, r) =>
      strMerges.add(s"$l $r") }
    val (merges2, vocab2) = TokenizerIO.loadExternalHfBpe(spark,
      writeTmp(om.writeValueAsString(tree)))
    assert(merges2 == merges && vocab2 == vocab)
    // add_prefix_space=true is not the engine's pre-tokenization
    val pt = tree.get("pre_tokenizer").asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    pt.put("add_prefix_space", true)
    val e = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalHfBpe(spark,
        writeTmp(om.writeValueAsString(tree)))
    }
    assert(e.getMessage.contains("add_prefix_space"), e.getMessage)
  }

  test("unsupported external artifacts fail loudly by name") {
    def writeTmp(content: String): String = {
      val f = java.nio.file.Files.createTempFile("tok", ".json")
      java.nio.file.Files.writeString(f, content)
      f.toString
    }
    // a BPE-model tokenizer.json routed to the WordPiece loader
    val bpe = writeTmp("""{"model":{"type":"BPE","vocab":{"a":0}}}""")
    val e1 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalHfWordPiece(spark, bpe)
    }
    assert(e1.getMessage.contains("not WordPiece"), e1.getMessage)
    // a normalizer the engine does not implement
    val norm = writeTmp("""{"normalizer":{"type":"BertNormalizer","lowercase":true},
      "model":{"type":"WordPiece","unk_token":"[UNK]","vocab":{"[UNK]":0}}}""")
    val e2 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalHfWordPiece(spark, norm)
    }
    assert(e2.getMessage.contains("unsupported normalizer") &&
      e2.getMessage.contains("BertNormalizer"), e2.getMessage)
    // a foreign continuation prefix
    val pfx = writeTmp("""{"model":{"type":"WordPiece","unk_token":"[UNK]",
      "continuing_subword_prefix":"++","vocab":{"[UNK]":0}}}""")
    val e3 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalHfWordPiece(spark, pfx)
    }
    assert(e3.getMessage.contains("'++'"), e3.getMessage)
    // a vocab.json missing byte symbols is not byte-level BPE
    val part = writeTmp("""{"a": 0, "b": 1}""")
    val mergesOk = java.nio.file.Files.createTempFile("m", ".txt")
    java.nio.file.Files.writeString(mergesOk, "a b\n")
    val e4 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalGpt2(spark, part, mergesOk.toString)
    }
    assert(e4.getMessage.contains("single-byte symbols"), e4.getMessage)
    // a merge whose result is absent from vocab (mismatched pair)
    val badMerges = java.nio.file.Files.createTempFile("m", ".txt")
    java.nio.file.Files.writeString(badMerges, "#version: 0.2\nĠ q\n")
    val e5 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalGpt2(spark,
        s"$fixDir/gpt2_toy/vocab.json", badMerges.toString)
    }
    assert(e5.getMessage.contains("mismatched artifact pair"), e5.getMessage)
    // malformed JSON names the file
    val junk = writeTmp("{not json")
    val e6 = intercept[IllegalArgumentException] {
      TokenizerIO.loadExternalHfWordPiece(spark, junk)
    }
    assert(e6.getMessage.contains("not valid JSON"), e6.getMessage)
  }

  // ---- SentencePiece .model (r13 follow-on) ------------------------------

  test("committed SentencePiece fixture parses to the constants; Viterbi serve hand-checked") {
    val m = TokenizerIO.loadExternalSentencePiece(spark,
      s"$fixDir/sp_unigram_toy/sp.model")
    assert(m == TokenizerFixtures.spExpectedModel)
    // the renderer and committed bytes cannot drift either
    val committed = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixDir/sp_unigram_toy/sp.model"))
    assert(java.util.Arrays.equals(committed,
      TokenizerFixtures.spModelBytes))
    // unk follows the SentencePiece runtime rule: (10 − min score)·1e6
    // (min lattice score is digit '9' at −6.59)
    assert(m.unkPiece == "<unk>" && m.unkCostMicro == 16590000L)
    assert(m.maxPieceLen == 4 && m.addDummyPrefix)
    // control pieces (<s>, </s>) are NOT lattice pieces
    val ps = m.pieces.map(_._1).toSet
    assert(!ps.contains("<s>") && !ps.contains("</s>") && !ps.contains("<unk>"))
    assert(ps.contains("▁the") && m.pieces.toMap.apply("▁the") == 2800000L)

    import spark.implicits._
    def seg(unit: String): Seq[String] = Seq(unit).toDF("w")
      .select(graft.functions.UnigramSegment(col("w"), m.pieces,
        m.unkCostMicro, m.maxPieceLen).as("s"))
      .collect().head.getSeq[String](0)
    // hand-run Viterbi (micro-nat costs in comments):
    //  ▁the      -> [▁the] 2.8M beats [▁,the] 5.8M
    //  ▁standing -> [▁,st,and,ing] 2.2+5.0+3.7+3.8 = 14.7M beats
    //               [▁,st,an,d,ing] 21.53M
    //  ▁order    -> [▁,or,d,er] 2.2+4.7+6.03+4.1 = 17.03M
    assert(seg("▁the") == Seq("▁the"))
    assert(seg("▁standing") == Seq("▁", "st", "and", "ing"))
    assert(seg("▁order") == Seq("▁", "or", "d", "er"))
    // unknown code point -> single-cp unk fallback, lossless
    assert(seg("▁é") == Seq("▁", "é"))
  }

  test("unsupported SentencePiece artifacts fail loudly by name") {
    // local minimal protobuf encoder (the wire format is public; the
    // spec builds VARIANT artifacts the fixture renderer refuses to)
    def vi(n: Long): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var v = n
      while ((v & ~0x7fL) != 0L) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      (out += v.toByte).toArray
    }
    def key(f: Int, wt: Int) = vi((f.toLong << 3) | wt)
    def ld(f: Int, b: Array[Byte]) = key(f, 2) ++ vi(b.length) ++ b
    def str(f: Int, s: String) = ld(f, s.getBytes("UTF-8"))
    def flt(f: Int, x: Float) = {
      val bits = java.lang.Float.floatToIntBits(x)
      key(f, 5) ++ Array[Byte](bits.toByte, (bits >> 8).toByte,
        (bits >> 16).toByte, (bits >> 24).toByte)
    }
    def num(f: Int, v: Long) = key(f, 0) ++ vi(v)
    def piece(p: String, score: Float, tpe: Int) =
      ld(1, str(1, p) ++ flt(2, score) ++ num(3, tpe))
    val basePieces = piece("<unk>", 0.0f, 2) ++ piece("a", -1.0f, 1) ++
      piece("b", -2.0f, 1)

    def parse(b: Array[Byte]) = SentencePiece.parse(b, "test")
    def failing(b: Array[Byte]): String =
      intercept[IllegalArgumentException](parse(b)).getMessage

    // BPE model_type routed here
    assert(failing(basePieces ++ ld(2, num(3, 2))).contains("BPE"))
    // a non-identity normalizer is named (nmt_nfkc family)
    assert(failing(basePieces ++ ld(3, str(1, "nmt_nfkc") ++
      ld(2, Array[Byte](1, 2, 3)))).contains("nmt_nfkc"))
    // a precompiled charsmap is rejected even under an identity name
    assert(failing(basePieces ++ ld(3, str(1, "identity") ++
      ld(2, Array[Byte](1, 2, 3)))).contains("charsmap"))
    // escape_whitespaces=false breaks the ▁ convention
    assert(failing(basePieces ++ ld(3, num(5, 0)))
      .contains("escape_whitespaces"))
    // add_dummy_prefix=false / remove_extra_whitespaces=false named
    assert(failing(basePieces ++ ld(3, num(3, 0)))
      .contains("add_dummy_prefix"))
    assert(failing(basePieces ++ ld(3, num(4, 0)))
      .contains("remove_extra_whitespaces"))
    // byte_fallback (BYTE pieces) not implemented
    assert(failing(basePieces ++ piece("<0x41>", -3.0f, 6))
      .contains("byte_fallback"))
    // user-defined symbols not implemented
    assert(failing(basePieces ++ piece("<extra_id_0>", 0.0f, 4))
      .contains("USER_DEFINED"))
    // exactly one UNKNOWN piece
    assert(failing(basePieces ++ piece("<unk2>", 0.0f, 2))
      .contains("UNKNOWN"))
    // interior ▁ would break the per-word serving decomposition
    assert(failing(basePieces ++ piece("a▁b", -3.0f, 1))
      .contains("past position 0"))
    // positive score is not a log probability
    assert(failing(basePieces ++ piece("zz", 0.5f, 1))
      .contains("positive score"))
    // truncation and junk are loud parse errors, never a garbage model
    val ok = TokenizerFixtures.spModelBytes
    assert(failing(ok.dropRight(3)).contains("not a SentencePiece model"))
    intercept[IllegalArgumentException] {
      parse("definitely not a protobuf model file".getBytes("UTF-8"))
    }
  }

  test("SentencePiece export round-trips: fixture exactly, trained model within float32") {
    // render ∘ parse on the fixture's lattice reproduces the model
    // exactly (every cost below the float32 integer-precision bound)
    val exp = TokenizerFixtures.spExpectedModel
    val rt = SentencePiece.parse(
      SentencePiece.render(exp.pieces, exp.unkPiece), "roundtrip")
    assert(rt == exp)
    // an engine-TRAINED model exports to a loadable artifact; cost
    // drift is bounded by the format's own float32 score precision
    val dict = Array(("the", 50L), ("them", 20L), ("theme", 10L),
      ("thesis", 5L), ("such", 8L), ("much", 7L))
    val trained = Unigram.trainLocal(dict, vocabSize = 12, maxPieceLen = 4)
    val path = java.nio.file.Files.createTempDirectory("sp").toString + "/m.model"
    TokenizerIO.saveAsSentencePiece(spark, trained, path)
    val loaded = TokenizerIO.loadExternalSentencePiece(spark, path)
    val tCosts = trained.pieces.toMap
    assert(loaded.pieces.map(_._1).toSet == tCosts.keySet)
    val maxDrift = loaded.pieces.map { case (p, c) =>
      math.abs(c - tCosts(p)) }.max
    assert(maxDrift <= 1L, s"cost drift $maxDrift > 1 micro-nat")
    // the trainer's unk rule (max cost + 10M) IS the runtime's
    // (min_score − 10) after negation — the loop closes on its own
    assert(math.abs(loaded.unkCostMicro - trained.unkCostMicro) <= 1L)
    assert(loaded.maxPieceLen == trained.maxPieceLen)
    // an unloadable artifact can never be written
    val e = intercept[IllegalArgumentException] {
      SentencePiece.render(Seq(("a▁b", 1000L)), "<unk>")
    }
    assert(e.getMessage.contains("interior-▁"), e.getMessage)
    intercept[IllegalArgumentException] {
      SentencePiece.render(Seq(("a", 1L), ("a", 2L)), "<unk>")
    }
    intercept[IllegalArgumentException] {
      SentencePiece.render(Seq(("a", 1L)), "a")
    }
  }
}
