package graft.pipeline

import graft.functions.ByteUnicode

/** Canonical published-tokenizer-format fixtures (r13) — the SINGLE
  * source of truth for three consumers that must agree byte-for-byte:
  *
  *   1. the committed files under `src/test/resources/external_tok/`
  *     (the parity spec asserts the committed bytes parse to exactly
  *     these constants, so file and code cannot drift);
  *   2. the p141/p142 queries, which WRITE these renderings into their
  *     stage dir and load them back through [[TokenizerIO]]'s external
  *     loaders — the Verify gate exercises the real file parsers, not
  *     in-memory shortcuts;
  *   3. the DuckDB oracles, whose vocab literals are generated from
  *     the same constants (the p61 generated-constants pattern).
  *
  * The GPT-2 fixture is a genuine byte-level BPE artifact pair: all
  * 256 byte symbols (ids = byte order, the published construction's
  * id layout for the toy case) plus one merged symbol per merge line,
  * in the exact `vocab.json`/`merges.txt` syntax the reference
  * encoder ships. The WordPiece fixture is a genuine HF
  * `tokenizer.json` (model.type WordPiece, `##` continuations,
  * explicit unk) with full lowercase letter+digit coverage so greedy
  * chains are non-trivial on the corpus.
  */
object TokenizerFixtures {

  /** Merge list, rank order — builds "the/and/in/of" chains over the
    * byte-unicode alphabet (Ġ = mapped space).
    */
  val Gpt2Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("Ġ", "t"), ("Ġt", "h"),
    ("Ġth", "e"), ("a", "n"), ("an", "d"), ("Ġ", "a"),
    ("Ġa", "n"), ("Ġan", "d"), ("i", "n"), ("o", "f"),
    ("e", "r"), ("Ġ", "o"), ("Ġo", "f"), ("e", "s"))

  /** Token → id: the 256 byte symbols at their byte values, then one
    * token per merge at 256 + rank.
    */
  val Gpt2Vocab: Seq[(String, Int)] =
    (0 until 256).map(b => ByteUnicode.byteToChar(b).toString -> b) ++
      Gpt2Merges.zipWithIndex.map { case ((l, r), i) => (l + r) -> (256 + i) }

  /** `vocab.json` rendering (Jackson — real JSON escaping, the bytes a
    * published artifact would carry).
    */
  def gpt2VocabJson: String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    Gpt2Vocab.foreach { case (t, i) => node.put(t, i) }
    om.writeValueAsString(node)
  }

  /** `merges.txt` rendering, with the conventional version header. */
  def gpt2MergesTxt: String =
    ("#version: 0.2" +: Gpt2Merges.map { case (l, r) => s"$l $r" })
      .mkString("\n") + "\n"

  /** HF single-file `tokenizer.json` rendering of the SAME GPT-2 toy
    * artifact (model.type BPE, ByteLevel pre-tokenizer, merges in the
    * `[left, right]` array form so the loader's pair branch is the one
    * the committed fixture exercises; the string form is spec-covered
    * inline).
    */
  def hfBpeJson: String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("normalizer")
    val pt = root.putObject("pre_tokenizer")
    pt.put("type", "ByteLevel")
    pt.put("add_prefix_space", false)
    val model = root.putObject("model")
    model.put("type", "BPE")
    val vocab = model.putObject("vocab")
    Gpt2Vocab.foreach { case (t, i) => vocab.put(t, i) }
    val merges = model.putArray("merges")
    Gpt2Merges.foreach { case (l, r) =>
      val pair = merges.addArray(); pair.add(l); pair.add(r)
    }
    om.writeValueAsString(root)
  }

  /** WordPiece pieces, id order: specials, whole words, bare
    * letters/digits, `##` continuations (letters, digits, and a few
    * multi-char suffixes so greedy chains exercise longest-match).
    */
  val HfWpPieces: Seq[String] = {
    val letters = ('a' to 'z').map(_.toString)
    val digits = ('0' to '9').map(_.toString)
    Seq("<unk>", "the", "and", "of", "to", "in", "for", "with") ++
      letters ++ digits ++
      Seq("##ing", "##ed", "##er", "##es", "##ly", "##tion") ++
      letters.map("##" + _) ++ digits.map("##" + _)
  }

  val HfWpUnk: String = "<unk>"
  val HfWpMaxChars: Int = 64

  /** HF `tokenizer.json` rendering: WordPiece model, no normalizer,
    * WhitespaceSplit pre-tokenizer, `##` continuations.
    */
  def hfWordPieceJson: String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", "1.0")
    root.putNull("normalizer")
    root.putObject("pre_tokenizer").put("type", "WhitespaceSplit")
    val model = root.putObject("model")
    model.put("type", "WordPiece")
    model.put("unk_token", HfWpUnk)
    model.put("continuing_subword_prefix", "##")
    model.put("max_input_chars_per_word", HfWpMaxChars)
    val vocab = model.putObject("vocab")
    HfWpPieces.zipWithIndex.foreach { case (p, i) => vocab.put(p, i) }
    om.writeValueAsString(root)
  }

  // ---- SentencePiece unigram fixture (r13 follow-on) ---------------------

  /** (piece, score, type) — a genuine toy unigram model: one UNKNOWN,
    * two CONTROL specials (excluded from the lattice, as the runtime
    * does), ▁-prefixed word pieces, bare subwords/suffixes, and full
    * letter+digit singles so every corpus word is coverable. Scores are
    * distinct everywhere (the engine's cost tie-break — longer piece —
    * never has to fire against a published artifact's unknown rule).
    */
  val SpPieces: Seq[(String, Float, Int)] = {
    val specials = Seq(("<unk>", 0.0f, 2), ("<s>", 0.0f, 3), ("</s>", 0.0f, 3))
    val words = Seq(
      ("▁", -2.2f), ("▁the", -2.8f), ("▁of", -3.0f), ("▁and", -3.1f),
      ("▁in", -3.2f), ("▁a", -3.3f), ("▁to", -3.4f),
      ("the", -3.6f), ("and", -3.7f), ("ing", -3.8f), ("ed", -4.0f),
      ("er", -4.1f), ("es", -4.2f), ("in", -4.3f), ("on", -4.4f),
      ("an", -4.5f), ("at", -4.6f), ("or", -4.7f), ("en", -4.8f),
      ("ar", -4.9f), ("st", -5.0f))
    val letters = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      (c.toString, -6.0f - i * 0.01f) }
    val digits = ('0' to '9').zipWithIndex.map { case (c, i) =>
      (c.toString, -6.5f - i * 0.01f) }
    specials ++ (words ++ letters ++ digits).map { case (p, s) => (p, s, 1) }
  }

  // protobuf wire encoding shared with the export path
  import SentencePiece.{pbLen, pbString, pbFloat, pbVarintField}

  /** Serialized ModelProto: repeated pieces (field 1: piece/score/type),
    * trainer_spec (field 2: model_type=UNIGRAM, vocab_size), and
    * normalizer_spec (field 3: name=identity, the three whitespace
    * flags explicitly true) — the exact bytes `spm_train` would emit
    * for this toy configuration.
    */
  def spModelBytes: Array[Byte] = {
    val pieces = SpPieces.flatMap { case (p, score, tpe) =>
      pbLen(1, pbString(1, p) ++ pbFloat(2, score) ++ pbVarintField(3, tpe))
    }.toArray
    val trainer = pbLen(2,
      pbVarintField(3, 1) ++ // model_type = UNIGRAM
        pbVarintField(4, SpPieces.length)) // vocab_size
    val normalizer = pbLen(3,
      pbString(1, "identity") ++ pbVarintField(3, 1) ++
        pbVarintField(4, 1) ++ pbVarintField(5, 1))
    pieces ++ trainer ++ normalizer
  }

  /** The loaded-model constants the committed `.model` must parse to
    * (micro-nat costs of the NORMAL pieces; unk = (10 − min score)·1e6
    * per the SentencePiece runtime rule).
    */
  def spExpectedModel: SentencePiece.Model = {
    val lattice = SpPieces.filter(_._3 == 1)
    SentencePiece.Model(
      lattice.map { case (p, s, _) => p -> math.round(-s.toDouble * 1e6) },
      "<unk>",
      math.round((10.0 - lattice.map(_._2).min.toDouble) * 1e6),
      lattice.map(p => p._1.codePointCount(0, p._1.length)).max,
      addDummyPrefix = true)
  }

  /** Write a UTF-8 rendering at `path` (Hadoop FS, any scheme). */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
      content: String): Unit =
    writeBytes(spark, path,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Write raw bytes at `path` (Hadoop FS, any scheme) — the binary
    * sibling of [[write]] for the SentencePiece `.model` rendering.
    */
  def writeBytes(spark: org.apache.spark.sql.SparkSession, path: String,
      content: Array[Byte]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content)
    finally out.close()
  }
}
