package graft.pipeline

import java.io.ByteArrayInputStream
import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column next to typed metadata; decode/feature-extract
  * runs batched per partition (the Scala analog of `mapInPandas`), so the
  * decoder amortizes its setup per batch, not per row.
  *
  * Image bytes are decoded FOR REAL via `javax.imageio.ImageIO` (JDK
  * built-in: PNG / JPEG / BMP / GIF / WBMP) — width, height, frame count
  * (animated GIF) and mean-luma brightness come from the actual pixels.
  * Blobs that are not a decodable image (sniffed by magic bytes before
  * any stream is built, so a text corpus pays ~zero decode overhead)
  * fall back to the deterministic md5-derived fake, flagged
  * `decoded_real = false` — that keeps the operator total and the
  * text-backed driver oracle exact, while `MultimodalDecodeSpec` pins
  * the real path against analytically-known painted fixtures.
  */
object Multimodal {

  /** Media rows: pretend each document's UTF-8 bytes are an image blob. */
  def attachMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("image/fake").as("media_type"))

  final case class DecodedMedia(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long, brightness: Double, decoded_real: Boolean)

  /** Batched decode: one pass per partition over (id, blob) pairs, one
    * decoder instance per partition.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new MediaDecoder // per-partition init, not per-row
        rows.map { case (id, blob) => decoder.decode(id, blob) }
      }
      .toDF()
  }

  final case class DecodedAudio(
      doc_id: Long, n_bytes: Long, sample_rate: Long, n_channels: Long,
      n_frames: Long, duration_ms: Double, rms: Double, decoded_real: Boolean)

  /** Batched audio decode (WAV/AIFF/AU via the JDK's javax.sound.sampled
    * — zero new dependencies): real sample rate / channels / frame count
    * / duration and the RMS level of the PCM samples in [0, 1]. Blobs
    * that aren't decodable audio get deterministic md5-derived fake
    * metadata with `decoded_real = false`, keeping the operator total —
    * the same dispatch contract as [[decodeFeatures]] for images.
    */
  def decodeAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AudioDecoder // per-partition init, not per-row
        rows.map { case (id, blob) => decoder.decode(id, blob) }
      }
      .toDF()
  }

  final case class AudioSpectrum(
      doc_id: Long, n_bytes: Long, sample_rate: Long, fft_size: Long,
      dominant_freq_hz: Double, spectral_centroid_hz: Double,
      decoded_real: Boolean)

  /** Batched spectral feature extraction: Hann-windowed radix-2 FFT
    * over the first `fftSize` mono-mixed PCM frames of each decodable
    * clip (zero-padded when shorter) → dominant-bin frequency and
    * spectral centroid in Hz — the two features a pretraining-data
    * audio triage actually filters on (tones/DTMF/silence vs speech-
    * or music-shaped spectra). Pure-JVM FFT (iterative Cooley–Tukey,
    * no dependencies), one O(fftSize·log fftSize) pass per clip inside
    * the partition-batched decoder; non-audio blobs fall back to
    * md5-deterministic fakes with `decoded_real = false`, the
    * [[decodeAudioFeatures]] dispatch contract.
    */
  def decodeAudioSpectrum(media: DataFrame, fftSize: Int = 4096): DataFrame = {
    require(fftSize >= 8 && (fftSize & (fftSize - 1)) == 0,
      s"fftSize must be a power of two >= 8: $fftSize")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AudioDecoder
        rows.map { case (id, blob) => decoder.decodeSpectrum(id, blob, fftSize) }
      }
      .toDF()
  }

  /** Aspect-preserving resize metadata. */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("long"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("long"))

  /** Evenly spaced frame-sample offsets (video-style). */
  def frameSamplePlan(decoded: DataFrame, maxFrames: Int): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("n_frames") <= maxFrames, sequence(lit(0L), col("n_frames") - 1))
        .otherwise(transform(sequence(lit(0), lit(maxFrames - 1)),
          i => floor(i * col("n_frames") / maxFrames).cast("long"))))

  final case class FrameFeature(
      doc_id: Long, frame_idx: Long, luma: Double, decoded_real: Boolean)

  /** Per-frame feature extraction at the [[frameSamplePlan]] stride: for
    * each blob, decode the evenly spaced sample frames (all of them when
    * `n_frames <= maxFrames`, else `floor(i·n_frames/maxFrames)` — the
    * same offsets frameSamplePlan plans) and emit one row per sampled
    * frame with its mean Rec.601 luma. Real multi-frame decode for
    * ImageIO-readable blobs (animated GIF); the md5 fake otherwise, with
    * the SAME fake n_frames as [[decodeFeatures]] so the two operators
    * agree on a corpus. One decoder instance per partition, rows fan out
    * ≤ maxFrames per blob.
    */
  def decodeFrameFeatures(media: DataFrame, maxFrames: Int): DataFrame = {
    require(maxFrames > 0, "maxFrames must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new MediaDecoder // per-partition init, not per-row
        rows.flatMap { case (id, blob) => decoder.decodeFrames(id, blob, maxFrames) }
      }
      .toDF()
  }

  final case class ImageHash(doc_id: Long, dhash: Long, decoded_real: Boolean)

  /** Perceptual image fingerprints (difference hash): 48-bit dHash per
    * blob — the image-side analogue of [[Dedup.simhashSignatures]],
    * and the screen LAION-style image corpora dedup on (a re-encoded /
    * resized / slightly-recompressed copy keeps its dHash within a few
    * bits, while a cryptographic hash of the bytes sees nothing).
    * Real path: decode frame 0, block-average the Rec.601 luma onto a
    * 7×8 grid (7 columns × 8 rows; cell (c, r) averages pixels
    * x ∈ [c·w/7, (c+1)·w/7), y ∈ [r·h/8, (r+1)·h/8)), then bit
    * r·6+x = 1 iff grid(r)(x+1) > grid(r)(x) — 6 comparisons × 8 rows
    * = 48 bits, matching the banding width of the SimHash machinery so
    * [[Dedup.hammingPairs48]] pairs either signature kind. Images
    * narrower than the grid (w < 7 or h < 8) and non-image payloads
    * take the deterministic md5 fallback (first 48 bits), which the
    * driver oracle replays from `md5(text)`; the real path is pinned by
    * MultimodalDecodeSpec's painted fixtures, including the
    * brightness/re-scale invariance that motivates dHash. One
    * `mapPartitions` projection, no shuffle.
    */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new MediaDecoder
        rows.map { case (id, blob) => decoder.dHash48(id, blob) }
      }
      .toDF()
  }

  final case class AudioHash(doc_id: Long, afp: Long, decoded_real: Boolean)

  /** 48-bit spectral audio fingerprint — [[imageDHash]]'s gradient idea
    * applied to the time–frequency plane (the band-energy-difference
    * family behind Chromaprint/AcoustID and Haitsma–Kalker 2002): the
    * decoded mono PCM is cut into 8 equal time windows; each window's
    * FFT power spectrum folds into 7 equal bands, and bit `w·6+x` = 1
    * iff band x+1 carries more energy than band x. Energy RATIOS make
    * the signature exactly invariant to amplitude scaling (volume
    * normalization, the audio twin of dHash's brightness invariance)
    * and stable under re-encode quantization noise, while md5-of-bytes
    * sees nothing. 48 bits matches the SimHash banding width, so
    * [[Dedup.hammingPairs48]] pairs audio fingerprints, image dHashes
    * and SimHashes with the same pigeonhole machinery. Non-audio blobs
    * and clips too short to frame take the md5 fallback (first 48
    * bits), replayed by the driver oracle; the real path is pinned by
    * MultimodalDecodeSpec's synthesized-WAV fixtures. One
    * `mapPartitions` projection, no shuffle.
    */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new AudioDecoder
        rows.map { case (id, blob) => decoder.fingerprint48(id, blob) }
      }
      .toDF()
  }

  final case class MediaContainer(doc_id: Long, container: String, n_bytes: Long)

  /** Container detection over a media-blob relation — the format-census
    * pass a multimodal ingest runs before routing blobs to the right
    * decoder pool (image vs animation vs audio executors). Pure
    * magic-byte/chunk-walk sniffing ([[MediaDecoder.containerOf]]):
    * image formats, raw Motion-JPEG (≥2 SOIs, second past the first
    * EOI), WebP incl. the animated VP8X/ANMF form, WAV/AIFF/AU. One
    * `mapPartitions` projection, no decode, no shuffle.
    */
  def detectContainers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new MediaDecoder
        rows.map { case (id, blob) =>
          MediaContainer(id, decoder.containerOf(blob), blob.length.toLong) }
      }
      .toDF()
  }

  final case class VideoMeta(doc_id: Long, container: String,
    video_codec: String, n_tracks: Long, n_samples: Long, duration_ms: Long)

  /** Video-container metadata walk — the pass a crawl ingest runs over
    * the mp4/WebM blobs that dominate real media corpora: codec id,
    * track count, sample/frame count, duration, all from pure
    * box (ISO-BMFF 14496-12) and EBML/Matroska structure walking — NO
    * pixel decode (no VP9/H.264 decoder exists on the JVM; none is
    * needed for routing/budgeting, the same argument as the
    * animated-WebP ANMF walk). Non-video blobs and truncated/malformed
    * structures degrade to zeros with the sniffed container label, so
    * the census never throws on crawl garbage. One `mapPartitions`
    * projection, no shuffle.
    */
  def videoMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new MediaDecoder
        rows.map { case (id, blob) => decoder.videoMetaOf(id, blob) }
      }
      .toDF()
  }
}

/** Per-partition audio decoder: javax.sound.sampled for WAV/AIFF/AU
  * (RIFF/FORM/.snd magic sniffed first), md5 fake otherwise. RMS is
  * computed over the normalized PCM samples ([-1, 1]; 16-bit signed
  * little/big-endian and 8-bit supported) in one streaming pass.
  */
final class AudioDecoder extends Serializable {
  private val mdig = MessageDigest.getInstance("MD5")

  private def hexSlice(hex: String, from: Int, len: Int): Long =
    java.lang.Long.parseLong(hex.substring(from, from + len), 16)

  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') || // wav
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') || // aiff
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')) // au

  private def realDecode(blob: Array[Byte]): Option[(Long, Long, Long, Double, Double)] = {
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        val nFrames = in.getFrameLength
        val rate = fmt.getSampleRate.toDouble
        val channels = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        // LINEAR PCM only: mu-law/A-law (the canonical .au payload) and
        // anything else companded would silently compute garbage RMS if
        // treated as linear — those fall back rather than lie. 16-bit
        // must be signed (unsigned 16-bit PCM is nonstandard in these
        // containers and the sample loop assumes two's complement).
        import javax.sound.sampled.AudioFormat.Encoding
        val enc = fmt.getEncoding
        val linearOk =
          (bits == 16 && enc == Encoding.PCM_SIGNED) ||
          (bits == 8 && (enc == Encoding.PCM_SIGNED || enc == Encoding.PCM_UNSIGNED))
        if (nFrames <= 0 || rate <= 0 || !linearOk) return None
        // bound the PCM buffer before materializing it (frames × frame
        // size): a crafted header claiming hours of audio must fall
        // back, not allocate gigabytes inside a task
        if (nFrames * math.max(fmt.getFrameSize, 1) > 64L * 1024 * 1024) return None
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val signed = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        var sumSq = 0.0
        var n = 0L
        var i = 0
        while (i + (bits / 8) <= bytes.length) {
          val s =
            if (bits == 8) {
              val raw = bytes(i) & 0xFF
              (if (signed) bytes(i).toDouble else (raw - 128).toDouble) / 128.0
            } else {
              val (lo, hi) = if (big) (bytes(i + 1) & 0xFF, bytes(i)) else (bytes(i) & 0xFF, bytes(i + 1))
              ((hi.toInt << 8) | lo).toShort.toDouble / 32768.0
            }
          sumSq += s * s
          n += 1
          i += bits / 8
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        Some((rate.toLong, channels.toLong, nFrames,
          nFrames * 1000.0 / rate, rms))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Mono-mixed normalized PCM of the first `maxFrames` frames, under
    * the same format guards as [[realDecode]] (linear PCM only, bounded
    * buffer). Multi-channel frames average their channels.
    */
  private def pcmMono(blob: Array[Byte],
      maxFrames: Int): Option[(Long, Array[Double])] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        val nFrames = in.getFrameLength
        val rate = fmt.getSampleRate.toDouble
        val channels = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        import javax.sound.sampled.AudioFormat.Encoding
        val enc = fmt.getEncoding
        val linearOk =
          (bits == 16 && enc == Encoding.PCM_SIGNED) ||
          (bits == 8 && (enc == Encoding.PCM_SIGNED || enc == Encoding.PCM_UNSIGNED))
        if (nFrames <= 0 || rate <= 0 || channels <= 0 || !linearOk) return None
        val sampleBytes = bits / 8
        val frameBytes = sampleBytes * channels
        val wantFrames = math.min(nFrames, maxFrames.toLong).toInt
        val buf = new Array[Byte](wantFrames * frameBytes)
        var off = 0
        var read = 0
        while (off < buf.length && read >= 0) {
          read = in.read(buf, off, buf.length - off)
          if (read > 0) off += read
        }
        val gotFrames = off / frameBytes
        val big = fmt.isBigEndian
        val signed = enc == Encoding.PCM_SIGNED
        val out = new Array[Double](gotFrames)
        var f = 0
        while (f < gotFrames) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val i = f * frameBytes + c * sampleBytes
            acc +=
              (if (bits == 8) {
                val raw = buf(i) & 0xFF
                (if (signed) buf(i).toDouble else (raw - 128).toDouble) / 128.0
              } else {
                val (lo, hi) =
                  if (big) (buf(i + 1) & 0xFF, buf(i)) else (buf(i) & 0xFF, buf(i + 1))
                ((hi.toInt << 8) | lo).toShort.toDouble / 32768.0
              })
            c += 1
          }
          out(f) = acc / channels
          f += 1
        }
        Some((rate.toLong, out))
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** In-place iterative radix-2 Cooley–Tukey; re/im length must be a
    * power of two.
    */
  private def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  def decodeSpectrum(id: Long, blob: Array[Byte],
      fftSize: Int): Multimodal.AudioSpectrum = {
    val pcm = if (looksLikeAudio(blob)) pcmMono(blob, fftSize) else None
    pcm match {
      case Some((rate, samples)) if samples.nonEmpty =>
        val re = new Array[Double](fftSize)
        val im = new Array[Double](fftSize)
        var i = 0
        while (i < samples.length) {
          // Hann window over the full frame (zero-padding tail stays 0)
          val w = 0.5 * (1 - math.cos(2.0 * math.Pi * i / (fftSize - 1)))
          re(i) = samples(i) * w
          i += 1
        }
        fft(re, im)
        // bins 1..n/2 (skip DC); magnitude-weighted centroid + argmax
        var best = 1
        var bestMag = -1.0
        var sumMag = 0.0
        var sumFMag = 0.0
        var k = 1
        while (k <= fftSize / 2) {
          val mag = math.sqrt(re(k) * re(k) + im(k) * im(k))
          val f = k.toDouble * rate / fftSize
          if (mag > bestMag) { bestMag = mag; best = k }
          sumMag += mag
          sumFMag += f * mag
          k += 1
        }
        val centroid = if (sumMag > 0) sumFMag / sumMag else 0.0
        Multimodal.AudioSpectrum(id, blob.length.toLong, rate, fftSize.toLong,
          best.toDouble * rate / fftSize, centroid, decoded_real = true)
      case _ =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        Multimodal.AudioSpectrum(
          doc_id = id,
          n_bytes = blob.length.toLong,
          sample_rate = Seq(8000L, 16000L, 22050L, 44100L)(
            (hexSlice(hex, 0, 12) % 4).toInt),
          fft_size = fftSize.toLong,
          dominant_freq_hz = (hexSlice(hex, 12, 12) % 4000000L) / 1000.0,
          spectral_centroid_hz = (hexSlice(hex, 20, 12) % 4000000L) / 1000.0,
          decoded_real = false)
    }
  }

  /** Real path of [[Multimodal.audioFingerprint]]: 8 time windows over
    * the first 8×512 mono frames, per window an FFT over the largest
    * power-of-two prefix (≤512), bins 1..n/2−1 folded into 7 equal
    * bands, 6 adjacent-band energy comparisons per window. Clips
    * shorter than 8×16 frames can't frame meaningfully → None (md5
    * fallback), same contract as the sub-grid image fallback.
    */
  private def realFingerprint(blob: Array[Byte]): Option[Long] = {
    pcmMono(blob, 8 * 512).flatMap { case (_, pcm) =>
      if (pcm.length < 8 * 16) None
      else {
        val win = pcm.length / 8
        var n = 16
        while (n * 2 <= math.min(win, 512)) n *= 2
        var bits = 0L
        var w = 0
        while (w < 8) {
          val re = new Array[Double](n)
          val im = new Array[Double](n)
          var i = 0
          while (i < n) { re(i) = pcm(w * win + i); i += 1 }
          fft(re, im)
          val half = n / 2
          val e = new Array[Double](7)
          var k = 1
          while (k < half) {
            val b = math.min((k - 1) * 7 / (half - 1), 6)
            e(b) += re(k) * re(k) + im(k) * im(k)
            k += 1
          }
          var x = 0
          while (x < 6) {
            if (e(x + 1) > e(x)) bits |= 1L << (w * 6 + x)
            x += 1
          }
          w += 1
        }
        Some(bits)
      }
    }
  }

  def fingerprint48(id: Long, blob: Array[Byte]): Multimodal.AudioHash = {
    val real = if (looksLikeAudio(blob)) realFingerprint(blob) else None
    real match {
      case Some(bits) => Multimodal.AudioHash(id, bits, decoded_real = true)
      case None =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        Multimodal.AudioHash(id, hexSlice(hex, 0, 12), decoded_real = false)
    }
  }

  def decode(id: Long, blob: Array[Byte]): Multimodal.DecodedAudio = {
    val real = if (looksLikeAudio(blob)) realDecode(blob) else None
    real match {
      case Some((rate, ch, frames, durMs, rms)) =>
        Multimodal.DecodedAudio(id, blob.length.toLong, rate, ch, frames,
          durMs, rms, decoded_real = true)
      case None =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        Multimodal.DecodedAudio(
          doc_id = id,
          n_bytes = blob.length.toLong,
          sample_rate = Seq(8000L, 16000L, 22050L, 44100L)(
            (hexSlice(hex, 0, 12) % 4).toInt),
          n_channels = 1L + hexSlice(hex, 12, 4) % 2,
          n_frames = 1L + hexSlice(hex, 16, 12) % 1000000,
          duration_ms = (hexSlice(hex, 4, 12) % 10000000L) / 1000.0,
          rms = (hexSlice(hex, 20, 12) % 1000000L) / 1000000.0,
          decoded_real = false)
    }
  }
}

/** Per-partition decoder: real ImageIO for image blobs, deterministic
  * md5 fake for everything else (reproducible across engines — the
  * DuckDB oracle computes the same values from `md5(text)`).
  */
final class MediaDecoder extends Serializable {
  private val mdig = MessageDigest.getInstance("MD5")

  private def hexSlice(hex: String, from: Int, len: Int): Long =
    java.lang.Long.parseLong(hex.substring(from, from + len), 16)

  /** Cheap magic-byte sniff — PNG / JPEG / GIF / BMP. Non-images skip
    * stream + reader construction entirely.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Real decode: dimensions from the decoded raster, frame count from
    * the reader (animated GIF > 1), brightness = mean Rec.601 luma of
    * frame 0 in [0, 1]. Returns None for anything ImageIO can't read —
    * truncated files, unknown formats — so the operator stays total.
    */
  private def realDecode(blob: Array[Byte]): Option[(Long, Long, Long, Double)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val nFrames = math.max(reader.getNumImages(true), 1)
        // size gate BEFORE decoding: a crafted header declaring e.g.
        // 60000×60000 would otherwise attempt a multi-GB BufferedImage
        // allocation whose OutOfMemoryError is not NonFatal — one
        // adversarial blob in a corpus must take the fallback, not
        // kill the executor. getWidth/getHeight read only the header.
        val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
        if (hw <= 0 || hh <= 0 || hw.toLong * hh > 64L * 1024 * 1024) return None
        val img = reader.read(0)
        Some((img.getWidth.toLong, img.getHeight.toLong, nFrames.toLong,
          lumaOf(img)))
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** Mean Rec.601 luma in [0, 1] — the accumulation order every painted
    * fixture in MultimodalDecodeSpec replays bit-exactly.
    */
  private def lumaOf(img: java.awt.image.BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    sum / (w.toLong * h * 255.0)
  }

  /** Sampled offsets — integer-division floor, identical to
    * frameSamplePlan's `floor(i·n/max)` column formula.
    */
  private def sampleOffsets(nFrames: Long, maxFrames: Int): Seq[Long] =
    if (nFrames <= maxFrames) (0L until nFrames).toSeq
    else (0 until maxFrames).map(i => i * nFrames / maxFrames)

  private def realFrames(blob: Array[Byte], maxFrames: Int): Option[Seq[(Long, Double)]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val nFrames = math.max(reader.getNumImages(true), 1)
        val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
        // same per-frame size gate as realDecode — ×frames is bounded
        // by maxFrames, so the worst case stays maxFrames × 64 MP
        if (hw <= 0 || hh <= 0 || hw.toLong * hh > 64L * 1024 * 1024) return None
        Some(sampleOffsets(nFrames.toLong, maxFrames)
          .map(f => (f, lumaOf(reader.read(f.toInt)))))
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  // ---- container detection (round 7) ---------------------------------

  private def at(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => b(i + k) == s.charAt(k).toByte)

  private def indexOfSoi(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 2 < b.length) {
      if (b(i) == 0xFF.toByte && b(i + 1) == 0xD8.toByte && b(i + 2) == 0xFF.toByte)
        return i
      i += 1
    }
    -1
  }

  private def indexOfEoi(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == 0xFF.toByte && b(i + 1) == 0xD9.toByte) return i
      i += 1
    }
    -1
  }

  /** RIFF/WEBP chunk walk: Some((hasVp8x, anmfCount, w, h)) for WEBP
    * containers (w/h from VP8X's 24-bit minus-one fields, 0 if absent).
    */
  private def parseWebp(b: Array[Byte]): Option[(Boolean, Int, Long, Long)] = {
    if (!(at(b, 0, "RIFF") && at(b, 8, "WEBP"))) return None
    var i = 12
    var vp8x = false
    var anmf = 0
    var w = 0L
    var h = 0L
    while (i + 8 <= b.length) {
      val size = (b(i + 4) & 0xFFL) | ((b(i + 5) & 0xFFL) << 8) |
        ((b(i + 6) & 0xFFL) << 16) | ((b(i + 7) & 0xFFL) << 24)
      if (at(b, i, "VP8X") && i + 8 + 10 <= b.length) {
        vp8x = true
        w = 1L + ((b(i + 12) & 0xFFL) | ((b(i + 13) & 0xFFL) << 8) |
          ((b(i + 14) & 0xFFL) << 16))
        h = 1L + ((b(i + 15) & 0xFFL) | ((b(i + 16) & 0xFFL) << 8) |
          ((b(i + 17) & 0xFFL) << 16))
      }
      if (at(b, i, "ANMF")) anmf += 1
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      if (size < 0 || size > b.length) return Some((vp8x, anmf, w, h))
    }
    Some((vp8x, anmf, w, h))
  }

  /** Magic-byte container sniff. `mjpeg` = a JPEG stream holding a
    * SECOND SOI after the first EOI — concatenated frames, the raw
    * Motion-JPEG shape; an EXIF thumbnail's embedded SOI sits BEFORE
    * the main image's EOI and correctly stays `jpeg`. `webp-anim` = a
    * WEBP container with ANMF frame chunks.
    */
  def containerOf(b: Array[Byte]): String =
    if (b.length < 4) "unknown"
    else if (b(0) == 0x89.toByte && at(b, 1, "PNG")) "png"
    else if (at(b, 0, "GIF8")) "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) {
      val eoi = indexOfEoi(b, 2)
      if (eoi >= 0 && indexOfSoi(b, eoi + 2) >= 0) "mjpeg" else "jpeg"
    }
    else if (at(b, 0, "RIFF") && at(b, 8, "WEBP"))
      parseWebp(b) match {
        case Some((_, anmf, _, _)) if anmf > 0 => "webp-anim"
        case _ => "webp"
      }
    else if (at(b, 0, "RIFF") && at(b, 8, "WAVE")) "wav"
    else if (at(b, 0, "FORM")) "aiff"
    else if (at(b, 0, ".snd")) "au"
    else if (b.length >= 12 && at(b, 4, "ftyp")) "mp4"
    else if (b.length >= 4 && b(0) == 0x1A.toByte && b(1) == 0x45.toByte &&
      b(2) == 0xDF.toByte && b(3) == 0xA3.toByte)
      (if (mkvDocType(b) == "webm") "webm" else "mkv")
    else "unknown"

  // ---- ISO-BMFF (mp4/mov) box walk — ISO 14496-12 structure only ----

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  /** Children of the byte range [from, to): (boxType, payloadStart,
    * payloadEnd). size==1 → 64-bit largesize header; size==0 → box
    * extends to the end of the range. A malformed/truncated header
    * stops the walk (crawl data is hostile; never throw).
    */
  private def mp4Boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = from
    while (i + 8 <= to) {
      var size = u32(b, i)
      var hdr = 8
      if (size == 1 && i + 16 <= to) { size = u64(b, i + 8); hdr = 16 }
      else if (size == 0) size = (to - i).toLong
      if (size < hdr || size > to - i) return out.result()
      val typ = new String(b, i + 4, 4, "ISO-8859-1")
      out += ((typ, i + hdr, i + size.toInt))
      i += size.toInt
    }
    out.result()
  }

  private def mp4Child(b: Array[Byte], box: (String, Int, Int),
      typ: String): Option[(String, Int, Int)] =
    mp4Boxes(b, box._2, box._3).find(_._1 == typ)

  /** (container, videoCodec, nTracks, nSamples, durationMs) from the
    * moov structure: per trak, mdhd gives timescale/duration (v0 32-bit
    * and v1 64-bit forms), hdlr the handler class, stbl/stsd the first
    * sample-entry fourcc, stbl/stsz the sample count. The VIDEO track's
    * values win; a moov-less or trak-less file reports zeros.
    */
  private def parseMp4(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
    if (b.length < 12 || !at(b, 4, "ftyp")) return None
    val top = mp4Boxes(b, 0, b.length)
    val moov = top.find(_._1 == "moov").getOrElse(return Some(("", 0L, 0L, 0L)))
    val traks = mp4Boxes(b, moov._2, moov._3).filter(_._1 == "trak")
    var best: Option[(String, Long, Long)] = None // codec, samples, durMs
    var firstTrack: Option[(String, Long, Long)] = None
    for (t <- traks; mdia <- mp4Child(b, t, "mdia")) {
      val p = mdia._2
      val handler = mp4Child(b, mdia, "hdlr") match {
        case Some((_, hp, he)) if hp + 12 <= he =>
          new String(b, hp + 8, 4, "ISO-8859-1")
        case _ => ""
      }
      val (timescale, duration) = mp4Child(b, mdia, "mdhd") match {
        case Some((_, mp, me)) if mp < me =>
          val v = b(mp) & 0xFF
          if (v == 1 && mp + 32 <= me) (u32(b, mp + 20), u64(b, mp + 24))
          else if (v == 0 && mp + 20 <= me) (u32(b, mp + 12), u32(b, mp + 16))
          else (0L, 0L)
        case _ => (0L, 0L)
      }
      val stbl = mp4Child(b, mdia, "minf").flatMap(m => mp4Child(b, m, "stbl"))
      val codec = stbl.flatMap(s => mp4Child(b, s, "stsd")) match {
        case Some((_, sp, se)) if sp + 16 <= se && u32(b, sp + 4) >= 1 =>
          new String(b, sp + 12, 4, "ISO-8859-1")
        case _ => ""
      }
      val nSamples = stbl.flatMap(s => mp4Child(b, s, "stsz")) match {
        case Some((_, sp, se)) if sp + 12 <= se => u32(b, sp + 8)
        case _ => 0L
      }
      val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
      val row = (codec, nSamples, durMs)
      if (firstTrack.isEmpty) firstTrack = Some(row)
      if (handler == "vide" && best.isEmpty) best = Some(row)
    }
    val (codec, samples, durMs) = best.orElse(firstTrack).getOrElse(("", 0L, 0L))
    Some((codec, traks.size.toLong, samples, durMs))
  }

  // ---- EBML / Matroska / WebM walk — structure only, no block decode ----

  private def vintLen(first: Int): Int = {
    var mask = 0x80
    var len = 1
    while (len <= 8 && (first & mask) == 0) { mask >>= 1; len += 1 }
    len
  }

  /** Children of the byte range [from, to): (elementId, payloadStart,
    * payloadEnd). IDs keep their marker bits (the class values, e.g.
    * 0x1A45DFA3); sizes strip theirs; an all-ones size vint means
    * "unknown — extends to the end of the parent" (streaming Segment).
    * Malformed input stops the walk.
    */
  private def ebmlChildren(b: Array[Byte], from: Int, to: Int): Seq[(Long, Int, Int)] = {
    val out = Seq.newBuilder[(Long, Int, Int)]
    var i = from
    while (i < to) {
      val il = vintLen(b(i) & 0xFF)
      if (il > 4 || i + il > to) return out.result()
      var id = 0L
      for (k <- 0 until il) id = (id << 8) | (b(i + k) & 0xFF)
      val sp = i + il
      if (sp >= to) return out.result()
      val sl = vintLen(b(sp) & 0xFF)
      if (sl > 8 || sp + sl > to) return out.result()
      var sz = (b(sp) & 0xFF).toLong & ((1L << (8 - sl)) - 1)
      var allOnes = sz == (1L << (8 - sl)) - 1
      for (k <- 1 until sl) {
        sz = (sz << 8) | (b(sp + k) & 0xFF)
        allOnes &&= (b(sp + k) & 0xFF) == 0xFF
      }
      val ps = sp + sl
      val pe = if (allOnes) to else ps + sz.toInt
      if (pe > to || pe < ps) return out.result()
      out += ((id, ps, pe))
      i = pe
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], ps: Int, pe: Int): Long = {
    var v = 0L
    for (k <- ps until math.min(pe, ps + 8)) v = (v << 8) | (b(k) & 0xFF)
    v
  }

  private def ebmlFloat(b: Array[Byte], ps: Int, pe: Int): Double =
    if (pe - ps == 4) java.lang.Float.intBitsToFloat(u32(b, ps).toInt).toDouble
    else if (pe - ps == 8) java.lang.Double.longBitsToDouble(u64(b, ps))
    else 0.0

  /** DocType from the EBML header — "webm" vs "matroska" is the only
    * difference the container census needs.
    */
  private def mkvDocType(b: Array[Byte]): String =
    ebmlChildren(b, 0, b.length).find(_._1 == 0x1A45DFA3L) match {
      case Some((_, hs, he)) =>
        ebmlChildren(b, hs, he).find(_._1 == 0x4282L)
          .map { case (_, ps, pe) => new String(b, ps, pe - ps, "ISO-8859-1") }
          .getOrElse("matroska")
      case None => "matroska"
    }

  /** (videoCodec, nTracks, nBlocks, durationMs) from the Segment walk:
    * Info gives TimestampScale (ns per tick, default 10^6) and the
    * float Duration (ticks); Tracks gives TrackEntry count and the
    * video (TrackType 1) CodecID; frame count = SimpleBlocks summed
    * over ALL Clusters.
    */
  private def parseMkv(b: Array[Byte]): Option[(String, Long, Long, Long)] = {
    if (b.length < 4 || b(0) != 0x1A.toByte || b(1) != 0x45.toByte ||
      b(2) != 0xDF.toByte || b(3) != 0xA3.toByte) return None
    val segment = ebmlChildren(b, 0, b.length).find(_._1 == 0x18538067L)
      .getOrElse(return Some(("", 0L, 0L, 0L)))
    var timescale = 1000000L
    var durTicks = 0.0
    var codec = ""
    var firstCodec = ""
    var nTracks = 0L
    var nBlocks = 0L
    for ((id, ps, pe) <- ebmlChildren(b, segment._2, segment._3)) id match {
      case 0x1549A966L => // Info
        for ((iid, ips, ipe) <- ebmlChildren(b, ps, pe)) iid match {
          case 0x2AD7B1L => timescale = ebmlUint(b, ips, ipe)
          case 0x4489L => durTicks = ebmlFloat(b, ips, ipe)
          case _ =>
        }
      case 0x1654AE6BL => // Tracks
        for ((tid, tps, tpe) <- ebmlChildren(b, ps, pe) if tid == 0xAEL) {
          nTracks += 1
          var ttype = 0L
          var tcodec = ""
          for ((eid, eps, epe) <- ebmlChildren(b, tps, tpe)) eid match {
            case 0x83L => ttype = ebmlUint(b, eps, epe)
            case 0x86L => tcodec = new String(b, eps, epe - eps, "ISO-8859-1")
            case _ =>
          }
          if (firstCodec.isEmpty) firstCodec = tcodec
          if (ttype == 1L && codec.isEmpty) codec = tcodec
        }
      case 0x1F43B675L => // Cluster
        nBlocks += ebmlChildren(b, ps, pe).count(_._1 == 0xA3L)
      case _ =>
    }
    val durMs = math.rint(durTicks * timescale / 1e6).toLong
    Some((if (codec.nonEmpty) codec else firstCodec, nTracks, nBlocks, durMs))
  }

  /** The [[Multimodal.videoMetadata]] row: container sniff + the
    * matching metadata walk; non-video containers report zeros.
    */
  def videoMetaOf(id: Long, blob: Array[Byte]): Multimodal.VideoMeta = {
    val container = containerOf(blob)
    val (codec, tracks, samples, durMs) = container match {
      case "mp4" => parseMp4(blob).getOrElse(("", 0L, 0L, 0L))
      case "webm" | "mkv" => parseMkv(blob).getOrElse(("", 0L, 0L, 0L))
      case _ => ("", 0L, 0L, 0L)
    }
    Multimodal.VideoMeta(id, container, codec, tracks, samples, durMs)
  }

  /** Raw MJPEG: frame k starts at the k-th SOI; each segment is a
    * complete JPEG ImageIO decodes independently. Only the SAMPLED
    * frames are decoded (a 10k-frame clip at maxFrames=8 reads 8).
    */
  private def mjpegFrames(blob: Array[Byte],
      maxFrames: Int): Option[Seq[(Long, Double)]] = {
    val sois = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = indexOfSoi(blob, 0)
    while (i >= 0) { sois += i; i = indexOfSoi(blob, i + 3) }
    if (sois.length < 2) return None
    val n = sois.length
    try {
      Some(sampleOffsets(n.toLong, maxFrames).map { f =>
        val from = sois(f.toInt)
        val until = if (f.toInt + 1 < n) sois(f.toInt + 1) else blob.length
        val seg = java.util.Arrays.copyOfRange(blob, from, until)
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(seg))
        if (img == null) return None
        if (img.getWidth.toLong * img.getHeight > 64L * 1024 * 1024) return None
        (f, lumaOf(img))
      })
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Per-frame rows for [[Multimodal.decodeFrameFeatures]]. Dispatch by
    * container: ImageIO formats (incl. animated GIF) and raw MJPEG
    * decode REAL lumas; animated WebP has no JVM pixel decoder, so its
    * rows carry the REAL frame count/offsets from the ANMF container
    * walk with the md5-fake luma (decoded_real=false); everything else
    * reuses decode's fake n_frames and derives a per-frame luma from
    * the same md5 (deterministic, frame-index-sensitive).
    */
  def decodeFrames(id: Long, blob: Array[Byte],
      maxFrames: Int): Seq[Multimodal.FrameFeature] = {
    val container = containerOf(blob)
    val real = container match {
      case "mjpeg" => mjpegFrames(blob, maxFrames)
      case "png" | "jpeg" | "gif" | "bmp" => realFrames(blob, maxFrames)
      case _ => None
    }
    real match {
      case Some(fs) =>
        fs.map { case (f, l) =>
          Multimodal.FrameFeature(id, f, l, decoded_real = true) }
      case None =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        val nFrames = container match {
          case "webp-anim" =>
            parseWebp(blob).map(_._2.toLong).filter(_ > 0)
              .getOrElse(1L + hexSlice(hex, 16, 12) % 32)
          case _ => 1L + hexSlice(hex, 16, 12) % 32 // decode's fake count
        }
        sampleOffsets(nFrames, maxFrames).map(f =>
          Multimodal.FrameFeature(id, f,
            ((hexSlice(hex, 20, 12) + f * 2654435761L) % 1000000L) / 1000000.0,
            decoded_real = false))
    }
  }

  /** 7×8 block-averaged luma grid → 48-bit dHash (see
    * [[Multimodal.imageDHash]] for the exact cell/bit layout). Returns
    * None when the frame is narrower than the grid — an empty cell has
    * no defined average, so tiny icons take the md5 fallback rather
    * than an arbitrary convention.
    */
  private def realDHash(blob: Array[Byte]): Option[Long] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
        if (hw < 7 || hh < 8 || hw.toLong * hh > 64L * 1024 * 1024) return None
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val grid = Array.ofDim[Double](8, 7)
        var r = 0
        while (r < 8) {
          val y0 = r * h / 8; val y1 = (r + 1) * h / 8
          var c = 0
          while (c < 7) {
            val x0 = c * w / 7; val x1 = (c + 1) * w / 7
            var sum = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) +
                  0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            grid(r)(c) = sum / ((y1 - y0).toLong * (x1 - x0))
            c += 1
          }
          r += 1
        }
        var bits = 0L
        r = 0
        while (r < 8) {
          var x = 0
          while (x < 6) {
            if (grid(r)(x + 1) > grid(r)(x)) bits |= 1L << (r * 6 + x)
            x += 1
          }
          r += 1
        }
        Some(bits)
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  def dHash48(id: Long, blob: Array[Byte]): Multimodal.ImageHash = {
    val real = if (looksLikeImage(blob)) realDHash(blob) else None
    real match {
      case Some(bits) => Multimodal.ImageHash(id, bits, decoded_real = true)
      case None =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        Multimodal.ImageHash(id, hexSlice(hex, 0, 12), decoded_real = false)
    }
  }

  def decode(id: Long, blob: Array[Byte]): Multimodal.DecodedMedia = {
    val real = if (looksLikeImage(blob)) realDecode(blob) else None
    real match {
      case Some((w, h, frames, brightness)) =>
        Multimodal.DecodedMedia(
          doc_id = id, n_bytes = blob.length.toLong,
          width = w, height = h, n_frames = frames,
          brightness = brightness, decoded_real = true)
      case None =>
        val hex = mdig.digest(blob).map("%02x".format(_)).mkString
        Multimodal.DecodedMedia(
          doc_id = id,
          n_bytes = blob.length.toLong,
          width = 1L + hexSlice(hex, 0, 12) % 512,
          height = 1L + hexSlice(hex, 12, 12) % 512,
          n_frames = 1L + hexSlice(hex, 16, 12) % 32,
          brightness = (hexSlice(hex, 20, 12) % 1000000L) / 1000000.0,
          decoded_real = false)
    }
  }
}

/** Deterministic minimal-but-valid mp4 / WebM byte builders for the
  * p70 plant and the parser fixtures: the oracle states the planted
  * parameters in closed form, so a correct [[MediaDecoder]] walk must
  * INVERT these builders exactly — a mis-read offset or vint shows up
  * as an oracle hash mismatch, not a silent pass.
  */
private[graft] object VideoFixtures {

  def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
    val total = 8 + payloads.map(_.length).sum
    be32(total.toLong) ++ typ.getBytes("ISO-8859-1") ++
      payloads.toArray.flatten
  }

  private def trak(handler: String, codec: String, nSamples: Long,
      durTicks: Long, timescale: Long): Array[Byte] = {
    val vflags = new Array[Byte](4)
    val mdhd = box("mdhd", vflags, be32(0), be32(0),
      be32(timescale), be32(durTicks))
    val hdlr = box("hdlr", vflags, be32(0),
      handler.getBytes("ISO-8859-1"), new Array[Byte](13))
    val stsd = box("stsd", vflags, be32(1),
      be32(16), codec.getBytes("ISO-8859-1"), new Array[Byte](8))
    val stsz = box("stsz", vflags, be32(100), be32(nSamples))
    box("trak", box("mdia", mdhd, hdlr,
      box("minf", box("stbl", stsd, stsz))))
  }

  /** 1 video track (`codec`) + optionally 1 audio track (mp4a, 2×
    * samples — the walk must pick the VIDEO track's numbers).
    * mdhd timescale is 1000, so duration ticks = milliseconds.
    */
  def mp4(tracks: Int, nSamples: Long, durationMs: Long,
      codec: String): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(512),
      "isommp42".getBytes("ISO-8859-1"))
    val trs = trak("vide", codec, nSamples, durationMs, 1000L) ++
      (if (tracks >= 2) trak("soun", "mp4a", nSamples * 2, durationMs, 1000L)
       else Array.empty[Byte])
    ftyp ++ box("moov", trs) ++ box("mdat", Array[Byte](1, 2, 3, 4))
  }

  def id(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  /** 2-byte size vints throughout — sidesteps the 0x7F/0xFF
    * "unknown size" encodings a 1-byte form can collide with.
    */
  def vsize(n: Int): Array[Byte] = {
    require(n >= 0 && n < 0x3FFF, s"fixture element too large: $n")
    Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)
  }

  def el(idBytes: Array[Byte], payloads: Array[Byte]*): Array[Byte] = {
    val body = payloads.toArray.flatten
    idBytes ++ vsize(body.length) ++ body
  }

  private def be64d(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (7 to 0 by -1).map(k => ((bits >>> (8 * k)) & 0xFF).toByte).toArray
  }

  def cluster(nBlocks: Int): Array[Byte] =
    el(id(0x1F, 0x43, 0xB6, 0x75),
      (el(id(0xE7), Array(0.toByte)) +:
        Seq.fill(nBlocks)(el(id(0xA3),
          Array(0x81.toByte, 0.toByte, 0.toByte, 0.toByte)))): _*)

  /** TimestampScale 10^6 ns (1 ms per tick), Duration = durationMs as a
    * float64 — so the walked duration_ms equals the parameter exactly.
    */
  def webm(nBlocks: Int, durationMs: Long, codec: String,
      docType: String = "webm"): Array[Byte] = {
    val header = el(id(0x1A, 0x45, 0xDF, 0xA3),
      el(id(0x42, 0x82), docType.getBytes("ISO-8859-1")))
    val info = el(id(0x15, 0x49, 0xA9, 0x66),
      el(id(0x2A, 0xD7, 0xB1),
        Array(0x0F.toByte, 0x42.toByte, 0x40.toByte)),
      el(id(0x44, 0x89), be64d(durationMs.toDouble)))
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B),
      el(id(0xAE),
        el(id(0x83), Array(1.toByte)),
        el(id(0x86), codec.getBytes("ISO-8859-1"))))
    header ++ el(id(0x18, 0x53, 0x80, 0x67), info, tracks, cluster(nBlocks))
  }
}
