package graft.pipeline

/** Published-SentencePiece `.model` interop (the third published
  * tokenizer family beside GPT-2 vocab/merges and HF tokenizer.json —
  * the T5/Llama/Gemma artifact): a from-scratch reader for the
  * protobuf-serialized `ModelProto` the SentencePiece trainer emits
  * (public `sentencepiece_model.proto`: `pieces` = repeated
  * (piece, float score, type), `trainer_spec.model_type`,
  * `normalizer_spec` flags), mapped onto the engine's integer-cost
  * Viterbi segmenter [[graft.functions.UnigramSegment]].
  *
  * The wire decoder is ~60 lines of the published protobuf wire format
  * (varint keys, length-delimited submessages, little-endian floats) —
  * no protobuf library dependency, same spirit as the from-scratch
  * HDF5/netCDF readers.
  *
  * Score mapping: SentencePiece Viterbi MAXIMIZES Σ score (natural-log
  * piece probabilities); the engine MINIMIZES Σ cost with
  * `cost_micro = round(-score · 1e6)` — the same path order, integer
  * and platform-exact. The unknown-character score follows the public
  * SentencePiece runtime (`unigram_model.cc`):
  * `unk_score = min_score - 10.0` (kUnkPenalty), i.e.
  * `unk_cost_micro = round((10 - min_score) · 1e6)`.
  *
  * STRICT about what the engine implements — an artifact outside this
  * envelope fails loudly BY NAME rather than segmenting differently
  * from the published tokenizer (the [[TokenizerIO]] external-loader
  * discipline):
  *
  *   - `trainer_spec.model_type` must be UNIGRAM (BPE/WORD/CHAR named
  *     in the error);
  *   - `normalizer_spec.name` must be "identity" (or absent) and
  *     `precompiled_charsmap` empty — the engine applies no
  *     normalization (an `nmt_nfkc` artifact would disagree on
  *     accented/width-variant input);
  *   - `add_dummy_prefix`, `remove_extra_whitespaces` and
  *     `escape_whitespaces` must all be true (the defaults): together
  *     they make the normalized sentence exactly `▁w1▁w2…` — one
  *     U+2581 marker per whitespace-split word — which is what the
  *     engine's per-word serving reproduces;
  *   - no BYTE pieces (byte-fallback serving is not implemented) and
  *     no USER_DEFINED pieces (their pre-segmentation extraction is
  *     not implemented);
  *   - exactly one UNKNOWN piece;
  *   - no lattice piece may carry `▁` past position 0. This is the
  *     load-bearing check for WHY per-word serving is exact: in the
  *     escaped sentence `▁w1▁w2…`, every unit starts with `▁` and no
  *     piece can span a unit boundary without containing an interior
  *     `▁`, so the global Viterbi lattice decomposes into independent
  *     per-unit lattices — segmenting each `▁word` unit alone is
  *     bit-identical to segmenting the whole sentence.
  *
  * Documented divergence (scores unaffected): consecutive unknown code
  * points emit one unk piece EACH, where the SentencePiece runtime
  * merges adjacent unknowns into a single surface piece; totals that
  * count unk EVENTS differ on multi-char unknown runs. The engine's
  * form is the lossless one (each piece concatenates back).
  */
object SentencePiece {

  /** Loaded model: lattice pieces (NORMAL type) as (piece, cost_micro),
    * the unk surface piece, the SentencePiece-rule unk cost, the max
    * lattice piece length in code points, and the dummy-prefix flag
    * (always true under the current strict envelope, carried so the
    * serving code reads its convention from the model, not a constant).
    */
  final case class Model(pieces: Seq[(String, Long)], unkPiece: String,
      unkCostMicro: Long, maxPieceLen: Int, addDummyPrefix: Boolean)

  // piece types, sentencepiece_model.proto SentencePiece.Type
  private val TNormal = 1
  private val TUnknown = 2
  private val TControl = 3
  private val TUserDefined = 4
  private val TUnused = 5
  private val TByte = 6

  /** Minimal protobuf wire reader over a byte slice. Every overrun or
    * malformed key fails as IllegalArgumentException so a non-model
    * file is a loud parse error, never a garbage model.
    */
  private final class Wire(b: Array[Byte], val to: Int, where: String,
      var pos: Int) {

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"$where: not a SentencePiece model ($msg at byte $pos)")

    def hasMore: Boolean = pos < to

    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (shift < 64) {
        if (pos >= to) fail("truncated varint")
        val x = b(pos) & 0xff
        pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      fail("varint longer than 64 bits")
    }

    /** Returns (fieldNumber, wireType). */
    def key(): (Int, Int) = {
      val k = varint()
      val wt = (k & 7).toInt
      val f = (k >>> 3).toInt
      if (f == 0) fail("field number 0")
      (f, wt)
    }

    def slice(len: Int): Wire = {
      if (len < 0 || pos + len > to) fail(s"truncated length-delimited field ($len bytes)")
      val w = new Wire(b, pos + len, where, pos)
      pos += len
      w
    }

    def bytes(len: Int): Array[Byte] = {
      if (len < 0 || pos + len > to) fail(s"truncated bytes field ($len bytes)")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len)
      pos += len
      out
    }

    def float32(): Float = {
      if (pos + 4 > to) fail("truncated float")
      val bits = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4
      java.lang.Float.intBitsToFloat(bits)
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => if (pos + 8 > to) fail("truncated fixed64") else pos += 8
      case 2 => val n = varint().toInt; bytes(n)
      case 5 => if (pos + 4 > to) fail("truncated fixed32") else pos += 4
      case w => fail(s"unsupported wire type $w")
    }
  }

  // ---- wire ENCODING (the render/export half) ----------------------------

  private[pipeline] def pbVarint(n: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var v = n
    while ((v & ~0x7fL) != 0L) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
    out.toArray
  }
  private[pipeline] def pbKey(field: Int, wt: Int): Array[Byte] =
    pbVarint((field.toLong << 3) | wt)
  private[pipeline] def pbLen(field: Int, body: Array[Byte]): Array[Byte] =
    pbKey(field, 2) ++ pbVarint(body.length) ++ body
  private[pipeline] def pbString(field: Int, s: String): Array[Byte] =
    pbLen(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private[pipeline] def pbFloat(field: Int, f: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(f)
    pbKey(field, 5) ++ Array[Byte](bits.toByte, (bits >> 8).toByte,
      (bits >> 16).toByte, (bits >> 24).toByte)
  }
  private[pipeline] def pbVarintField(field: Int, v: Long): Array[Byte] =
    pbKey(field, 0) ++ pbVarint(v)

  /** Serialize a loaded/trained model back to the published `.model`
    * wire format (the interop EXPORT half — an engine-trained
    * [[Unigram.Model]] becomes an artifact any SentencePiece runtime
    * loads): `<unk>` first as the UNKNOWN piece (score 0, the trainer
    * convention — the runtime re-derives the unk score from
    * min_score − 10, the same rule [[parse]] applies), then the
    * lattice pieces with `score = −cost_micro / 1e6` as float32,
    * trainer_spec model_type=UNIGRAM, identity normalizer with the
    * three whitespace flags explicitly true.
    *
    * Precision: the FORMAT stores float32 scores, so a cost above
    * ~16.7M micro-nats may round-trip ±1 micro — that is the published
    * format's own precision, not a parser defect; [[parse]] ∘
    * [[render]] is exact for every cost the quantizer emits below
    * that. Pieces must satisfy the same envelope parse enforces
    * (validated here so an unloadable artifact can never be written).
    */
  def render(pieces: Seq[(String, Long)], unkPiece: String): Array[Byte] = {
    require(pieces.nonEmpty, "render: no pieces")
    require(pieces.map(_._1).distinct.length == pieces.length,
      "render: duplicate pieces")
    require(!pieces.exists(_._1 == unkPiece),
      s"render: unk piece '$unkPiece' collides with a lattice piece")
    pieces.foreach { case (p, c) =>
      require(p.nonEmpty && p.indexOf('▁', 1) < 0,
        s"render: piece '$p' violates the interior-▁ envelope")
      require(c >= 0L, s"render: negative cost $c for piece '$p'")
    }
    val pieceMsgs =
      pbLen(1, pbString(1, unkPiece) ++ pbFloat(2, 0.0f) ++
        pbVarintField(3, TUnknown)) ++
      pieces.flatMap { case (p, c) =>
        pbLen(1, pbString(1, p) ++ pbFloat(2, (-(c.toDouble / 1e6)).toFloat) ++
          pbVarintField(3, TNormal))
      }
    val trainer = pbLen(2,
      pbVarintField(3, 1) ++ pbVarintField(4, pieces.length + 1))
    val normalizer = pbLen(3,
      pbString(1, "identity") ++ pbVarintField(3, 1) ++
        pbVarintField(4, 1) ++ pbVarintField(5, 1))
    pieceMsgs ++ trainer ++ normalizer
  }

  /** Parse + validate a serialized ModelProto. `where` names the file
    * in every error.
    */
  def parse(modelBytes: Array[Byte], where: String): Model = {
    val root = new Wire(modelBytes, modelBytes.length, where, 0)

    val pieces = Seq.newBuilder[(String, Float, Int)]
    var modelType = 1 // TrainerSpec.model_type default UNIGRAM
    var normName = "" // NormalizerSpec.name
    var charsmapLen = 0 // NormalizerSpec.precompiled_charsmap
    var addDummyPrefix = true
    var removeExtraWs = true
    var escapeWs = true

    while (root.hasMore) {
      val (f, wt) = root.key()
      (f, wt) match {
        case (1, 2) => // repeated SentencePiece pieces
          val m = root.slice(root.varint().toInt)
          var piece: String = null
          var score = 0.0f
          var tpe = TNormal
          while (m.hasMore) {
            val (pf, pwt) = m.key()
            (pf, pwt) match {
              case (1, 2) => piece = new String(m.bytes(m.varint().toInt),
                java.nio.charset.StandardCharsets.UTF_8)
              case (2, 5) => score = m.float32()
              case (3, 0) => tpe = m.varint().toInt
              case (_, w) => m.skip(w)
            }
          }
          require(piece != null && piece.nonEmpty,
            s"$where: a SentencePiece entry carries no piece string")
          pieces += ((piece, score, tpe))
        case (2, 2) => // TrainerSpec
          val m = root.slice(root.varint().toInt)
          while (m.hasMore) {
            val (tf, twt) = m.key()
            (tf, twt) match {
              case (3, 0) => modelType = m.varint().toInt
              case (_, w) => m.skip(w)
            }
          }
        case (3, 2) => // NormalizerSpec
          val m = root.slice(root.varint().toInt)
          while (m.hasMore) {
            val (nf, nwt) = m.key()
            (nf, nwt) match {
              case (1, 2) => normName = new String(m.bytes(m.varint().toInt),
                java.nio.charset.StandardCharsets.UTF_8)
              case (2, 2) => charsmapLen = m.varint().toInt; m.bytes(charsmapLen)
              case (3, 0) => addDummyPrefix = m.varint() != 0L
              case (4, 0) => removeExtraWs = m.varint() != 0L
              case (5, 0) => escapeWs = m.varint() != 0L
              case (_, w) => m.skip(w)
            }
          }
        case (_, w) => root.skip(w)
      }
    }

    val all = pieces.result()
    require(all.nonEmpty, s"$where: no pieces — not a SentencePiece model")
    require(all.map(_._1).distinct.length == all.length,
      s"$where: duplicate pieces in the model")

    val typeName = Map(2 -> "BPE", 3 -> "WORD", 4 -> "CHAR")
    require(modelType == 1,
      s"$where: trainer_spec.model_type " +
        s"${typeName.getOrElse(modelType, modelType.toString)} is not " +
        "UNIGRAM — the engine serves the unigram Viterbi lattice")
    require(normName.isEmpty || normName == "identity",
      s"$where: unsupported normalizer '$normName' — the engine applies " +
        "no normalization; re-export the model with --normalization_rule_name=identity")
    require(charsmapLen == 0,
      s"$where: the model carries a ${charsmapLen}-byte precompiled " +
        "normalization charsmap — the engine applies no normalization")
    require(addDummyPrefix,
      s"$where: add_dummy_prefix=false is not implemented — per-word " +
        "serving prefixes every word (including the first) with ▁")
    require(removeExtraWs,
      s"$where: remove_extra_whitespaces=false is not implemented — " +
        "per-word serving collapses whitespace runs")
    require(escapeWs,
      s"$where: escape_whitespaces=false is not implemented — per-word " +
        "serving relies on the ▁ marker convention")

    val byteCnt = all.count(_._3 == TByte)
    require(byteCnt == 0,
      s"$where: model carries $byteCnt BYTE pieces (byte_fallback) — " +
        "byte-fallback serving is not implemented; unknown code points " +
        "are served by the unk cost")
    val userCnt = all.count(_._3 == TUserDefined)
    require(userCnt == 0,
      s"$where: model carries $userCnt USER_DEFINED pieces — their " +
        "pre-segmentation extraction is not implemented")
    val unks = all.filter(_._3 == TUnknown)
    require(unks.length == 1,
      s"$where: ${unks.length} UNKNOWN pieces (want exactly 1)")

    val lattice = all.filter(_._3 == TNormal)
    require(lattice.nonEmpty, s"$where: no NORMAL pieces to serve")
    lattice.foreach { case (p, score, _) =>
      val interior = p.indexOf('▁', 1)
      require(interior < 0,
        s"$where: piece '$p' carries ▁ past position 0 — such a " +
          "piece can span a word boundary, which breaks the per-word " +
          "serving decomposition (not implemented)")
      require(score <= 0.0f,
        s"$where: piece '$p' has positive score $score — scores are " +
          "log probabilities and must be <= 0")
    }

    val minScore = lattice.map(_._2).min
    val costs = lattice.map { case (p, score, _) =>
      p -> math.round(-score.toDouble * 1e6)
    }
    val maxLen = lattice.map(p =>
      p._1.codePointCount(0, p._1.length)).max
    Model(costs, unks.head._1,
      math.round((10.0 - minScore.toDouble) * 1e6), maxLen, addDummyPrefix)
  }
}
