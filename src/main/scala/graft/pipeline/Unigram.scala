package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps._

/** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" §3 — the SentencePiece `--model_type=unigram` family,
  * the other mainstream subword tokenizer beside BPE): treat
  * segmentations as a latent variable under a unigram piece model and
  * fit piece probabilities by EM, shrinking an over-complete seed
  * vocabulary down to the target size.
  *
  * Distribution shape is EXACTLY [[Bpe.trainMerges]]'s: the corpus
  * contributes ONE word-frequency aggregate (the only distributed
  * pass — at 100 TB the capped dictionary is a constant-size frame
  * where the corpus is trillions of tokens); the EM loop then runs
  * driver-local over that compact dict, the size-gated driver-compute
  * pattern of the PQ codebooks. Serving is a codegen Viterbi
  * projection ([[graft.functions.UnigramSegment]]).
  *
  * Faithful pieces: over-complete substring seed; soft EM with
  * per-word forward–backward marginal piece counts (not hard Viterbi
  * counts); iterative prune-to-target. Documented simplifications vs
  * the SentencePiece implementation: pruning ranks pieces by expected
  * count instead of the exact likelihood-loss-if-removed (the loss
  * computation is another full E pass per candidate; count ranking is
  * the standard cheap surrogate and keeps the same fixed points), and
  * there is no BPE-style character-coverage/byte-fallback machinery —
  * single code points seen in the dict are always retained, unseen
  * ones are served by the UNK cost.
  *
  * The returned model is INTEGER: piece → cost in micro-nats
  * (round(-ln p · 1e6)), so downstream scoring/segmentation is
  * platform-exact even though EM itself runs in doubles.
  */
object Unigram {

  /** Model: sorted (piece, costMicro) plus the UNK single-char cost. */
  final case class Model(pieces: Seq[(String, Long)], unkCostMicro: Long,
      maxPieceLen: Int)

  /** Train on the corpus's capped word dictionary. */
  def trainModel(docs: DataFrame, textCol: String, vocabSize: Int,
      maxWords: Int = 100000, maxPieceLen: Int = 8): Model = {
    val vocab: Array[(String, Long)] = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(vocab, vocabSize, maxPieceLen)
  }

  /** Driver-local EM over a collected (word, freq) dict — deterministic:
    * pieces live in sorted arrays, words iterate in dict order, no RNG.
    *
    * PRODUCTION-regime engineering (round-8, the indexed-BPE lesson
    * applied to EM — the 32k-vocab/256k-seed run was unmeasured and
    * the naive loop re-hashed every substring every pass):
    *  - the (start, len) → piece-id lattice of every word is resolved
    *    ONCE against the immutable global seed table; EM passes do
    *    array reads only, zero string hashing;
    *  - pruning DEACTIVATES pieces by zeroing their probability — a
    *    zero-prob piece contributes exactly 0.0 to every lattice sum
    *    (bit-identical to being absent, since all terms are
    *    non-negative), so the lattices never rebuild across shrink
    *    rounds;
    *  - the E step fans out over a FIXED 32-chunk split of the word
    *    array (the PQ per-subspace futures pattern): chunk boundaries
    *    are a pure function of the word count and chunk sums merge in
    *    chunk order, so the result is bit-reproducible regardless of
    *    thread scheduling or core count.
    */
  private[pipeline] def trainLocal(vocabIn: Array[(String, Long)],
      vocabSize: Int, maxPieceLen: Int): Model = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    // words as code-point arrays; drop pathological >64-cp tokens from
    // TRAINING only (lattices are O(len·maxPieceLen); serving still
    // covers them via single-char pieces)
    val words: Array[(Array[String], Long)] = vocabIn
      .map { case (w, f) => (graft.functions.BpeSegment.codePoints(w), f) }
      .filter(_._1.length <= 64)
    // ---- seed: all substrings up to maxPieceLen, occurrence-weighted
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (cps, f) =>
      var i = 0
      while (i < cps.length) {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < math.min(cps.length, i + maxPieceLen)) {
          sb.append(cps(j))
          val p = sb.toString
          seedCounts(p) = seedCounts.getOrElse(p, 0.0) + f
          j += 1
        }
        i += 1
      }
    }
    val singles = words.flatMap(_._1).distinct.sorted
    val seedCap = math.max(vocabSize * 8, singles.length + vocabSize)
    val multis = seedCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }.take(seedCap - singles.length)
      .map(_._1)
    val pieces: Array[String] = (singles ++ multis).distinct.sorted
    val nP = pieces.length
    val idx = new java.util.HashMap[String, Integer](nP * 2)
    pieces.indices.foreach(i => idx.put(pieces(i), i))
    var probs: Array[Double] = {
      val tot = pieces.map(seedCounts(_)).sum
      pieces.map(seedCounts(_) / tot)
    }
    val active = Array.fill(nP)(true)
    val singleSet = singles.toSet
    val isSingle: Array[Boolean] = pieces.map(singleSet)

    // one-time lattice resolve: gid of substring (i, len l) at
    // a(i*maxPieceLen + l - 1), -1 when absent from the seed
    val nW = words.length
    val wlens = words.map(_._1.length)
    val freqs = words.map(_._2)
    val latt: Array[Array[Int]] = words.map { case (cps, _) =>
      val n = cps.length
      val a = new Array[Int](n * maxPieceLen)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder()
        var l = 0
        while (l < maxPieceLen) {
          if (i + l < n) {
            sb.append(cps(i + l))
            val g = idx.get(sb.toString)
            a(i * maxPieceLen + l) = if (g == null) -1 else g.intValue
          } else a(i * maxPieceLen + l) = -1
          l += 1
        }
        i += 1
      }
      a
    }

    def emChunk(from: Int, until: Int, pr: Array[Double]): Array[Double] = {
      val exp = new Array[Double](nP)
      var w = from
      while (w < until) {
        val n = wlens(w)
        val f = freqs(w).toDouble
        val a = latt(w)
        val alpha = new Array[Double](n + 1)
        alpha(0) = 1.0
        var i = 1
        while (i <= n) {
          var l = 1
          var s = 0.0
          while (l <= math.min(i, maxPieceLen)) {
            val id = a((i - l) * maxPieceLen + (l - 1))
            if (id >= 0) s += alpha(i - l) * pr(id)
            l += 1
          }
          alpha(i) = s
          i += 1
        }
        val z = alpha(n)
        if (z > 0.0) {
          val beta = new Array[Double](n + 1)
          beta(n) = 1.0
          i = n - 1
          while (i >= 0) {
            var l = 1
            var s = 0.0
            while (l <= math.min(n - i, maxPieceLen)) {
              val id = a(i * maxPieceLen + (l - 1))
              if (id >= 0) s += pr(id) * beta(i + l)
              l += 1
            }
            beta(i) = s
            i -= 1
          }
          i = 0
          while (i < n) {
            var l = 1
            while (l <= math.min(n - i, maxPieceLen)) {
              val id = a(i * maxPieceLen + (l - 1))
              if (id >= 0) {
                val m = alpha(i) * pr(id) * beta(i + l) / z
                if (m > 0.0) exp(id) += f * m
              }
              l += 1
            }
            i += 1
          }
        }
        w += 1
      }
      exp
    }

    val nChunks = 32
    val bounds = (0 to nChunks).map(c => (c.toLong * nW / nChunks).toInt)
    def emStep(): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val pr = probs
      val parts = (0 until nChunks).map(c =>
        Future(emChunk(bounds(c), bounds(c + 1), pr))(
          scala.concurrent.ExecutionContext.global))
        .map(Await.result(_, Duration.Inf))
      val exp = new Array[Double](nP)
      parts.foreach { e =>
        var i = 0
        while (i < nP) { exp(i) += e(i); i += 1 }
      }
      var tot = 0.0
      var i = 0
      while (i < nP) { tot += exp(i); i += 1 }
      if (tot > 0.0) { // degenerate input: keep the previous probs
        val np = new Array[Double](nP)
        i = 0
        while (i < nP) { np(i) = exp(i) / tot; i += 1 }
        probs = np
      }
    }

    // ---- EM + prune to target (2 E/M passes per shrink round)
    val minKeep = math.max(vocabSize, singleSet.size)
    var activeCount = nP
    var guard = 0
    while (activeCount > minKeep && guard < 100) {
      emStep(); emStep()
      val keepN = math.max(minKeep, (activeCount * 3) / 4)
      val actIdx = pieces.indices.filter(active).toArray
      val ranked = actIdx.sortBy(i => (-probs(i), pieces(i)))
      val kept = scala.collection.mutable.LinkedHashSet.empty[Int]
      actIdx.foreach(i => if (isSingle(i)) kept += i)
      ranked.foreach(i => if (kept.size < keepN) kept += i)
      actIdx.foreach(i => if (!kept(i)) { active(i) = false; probs(i) = 0.0 })
      var t = 0.0
      var i = 0
      while (i < nP) { t += probs(i); i += 1 }
      if (t > 0.0) {
        i = 0
        while (i < nP) { probs(i) /= t; i += 1 }
      }
      activeCount = kept.size
      guard += 1
    }
    emStep(); emStep()

    // ---- integer quantization: micro-nat costs, probability floor so
    // unreached-but-retained single chars stay finite
    val floor = 1e-9
    val costs = pieces.indices.filter(active).map { i =>
      pieces(i) -> math.round(-math.log(math.max(probs(i), floor)) * 1e6)
    }
    val unk = costs.map(_._2).max + 10000000L
    Model(costs, unk, maxPieceLen)
  }

  /** ONE soft-EM step (forward–backward marginal piece counts over each
    * word's lattice, then renormalize): returns the new probability
    * array, or null when no word is reachable (degenerate input).
    * Package-private so the spec can pin a hand-computed step.
    */
  private[pipeline] def emOnce(words: Array[(Array[String], Long)],
      pieces: Array[String], probs: Array[Double],
      maxPieceLen: Int): Array[Double] = {
    val idx = pieces.zipWithIndex.toMap
    val exp = new Array[Double](pieces.length)
    words.foreach { case (cps, f) =>
      val n = cps.length
      // resolve piece ids per (start, len) once
      val pid = Array.ofDim[Int](n, maxPieceLen)
      var i = 0
      while (i < n) {
        val sb = new java.lang.StringBuilder()
        var l = 0
        while (l < maxPieceLen) {
          if (i + l < n) {
            sb.append(cps(i + l))
            pid(i)(l) = idx.getOrElse(sb.toString, -1)
          } else pid(i)(l) = -1
          l += 1
        }
        i += 1
      }
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      i = 1
      while (i <= n) {
        var l = 1
        var a = 0.0
        while (l <= math.min(i, maxPieceLen)) {
          val id = pid(i - l)(l - 1)
          if (id >= 0) a += alpha(i - l) * probs(id)
          l += 1
        }
        alpha(i) = a
        i += 1
      }
      val z = alpha(n)
      if (z > 0.0) {
        val beta = new Array[Double](n + 1)
        beta(n) = 1.0
        i = n - 1
        while (i >= 0) {
          var l = 1
          var b = 0.0
          while (l <= math.min(n - i, maxPieceLen)) {
            val id = pid(i)(l - 1)
            if (id >= 0) b += probs(id) * beta(i + l)
            l += 1
          }
          beta(i) = b
          i -= 1
        }
        i = 0
        while (i < n) {
          var l = 1
          while (l <= math.min(n - i, maxPieceLen)) {
            val id = pid(i)(l - 1)
            if (id >= 0) {
              val m = alpha(i) * probs(id) * beta(i + l) / z
              if (m > 0.0) exp(id) += f * m
            }
            l += 1
          }
          i += 1
        }
      }
    }
    val tot = exp.sum
    if (tot > 0.0) exp.map(_ / tot) else null
  }
}
