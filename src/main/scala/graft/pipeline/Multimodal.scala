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
    else "unknown"

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
