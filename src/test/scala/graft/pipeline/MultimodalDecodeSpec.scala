package graft.pipeline

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ts.SparkSpecBase

/** Pins [[MediaDecoder]]'s REAL ImageIO path against fixtures whose
  * metadata is known analytically: images are painted pixel-by-pixel in
  * the test, so expected width/height/brightness come from the paint
  * loop, not from any decoder. Lossless formats (PNG, BMP) must match
  * the mean-luma brightness bit-exactly (same accumulation order);
  * JPEG is lossy so brightness gets a tolerance; GIF exercises the
  * multi-frame count. Non-image and truncated blobs must fall back to
  * the deterministic fake with decoded_real = false.
  */
class MultimodalDecodeSpec extends SparkSpecBase {

  private def paint(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  private def bytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer in this JDK")
    out.toByteArray
  }

  /** Expected brightness via the decoder's exact accumulation order. */
  private def meanLuma(img: BufferedImage): Double = {
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sum / (img.getWidth.toLong * img.getHeight * 255.0)
  }

  private def decodeAll(blobs: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map(b => Row(b._1, b._2)), 2), schema)
    Multimodal.decodeFeatures(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
  }

  test("PNG and BMP decode real dimensions and bit-exact mean-luma brightness") {
    val solid = paint(16, 12)((_, _) => (100 << 16) | (150 << 8) | 200)
    val gradient = paint(7, 5)((x, y) => {
      val v = (x * 30 + y * 40) % 256; (v << 16) | (v << 8) | v
    })
    val out = decodeAll(Seq(
      1L -> bytes(solid, "png"), 2L -> bytes(gradient, "png"),
      3L -> bytes(solid, "bmp"), 4L -> bytes(gradient, "bmp")))
    for ((id, img) <- Seq(1L -> solid, 2L -> gradient, 3L -> solid, 4L -> gradient)) {
      val (w, h, frames, brightness, real) = out(id)
      assert(real, s"doc $id should take the real path")
      assert((w, h) == (img.getWidth.toLong, img.getHeight.toLong), s"dims of $id")
      assert(frames == 1L, s"frames of $id")
      assert(brightness == meanLuma(img), s"brightness of $id")
    }
  }

  test("JPEG decodes exact dimensions and approximate brightness (lossy)") {
    val img = paint(24, 18)((_, _) => (90 << 16) | (120 << 8) | 60)
    val out = decodeAll(Seq(1L -> bytes(img, "jpg")))
    val (w, h, frames, brightness, real) = out(1L)
    assert(real && (w, h) == (24L, 18L) && frames == 1L)
    assert(math.abs(brightness - meanLuma(img)) < 0.02,
      s"jpeg brightness $brightness vs ${meanLuma(img)}")
  }

  test("animated GIF reports its real frame count") {
    val f1 = paint(8, 8)((_, _) => 0xFF0000)
    val f2 = paint(8, 8)((_, _) => 0x00FF00)
    val f3 = paint(8, 8)((_, _) => 0x0000FF)
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(f1, f2, f3).foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val res = decodeAll(Seq(1L -> out.toByteArray))
    val (w, h, frames, _, real) = res(1L)
    assert(real && (w, h) == (8L, 8L))
    assert(frames == 3L, s"expected 3 GIF frames, got $frames")
  }

  // ---- round-8: perceptual dHash -------------------------------------

  private def dhashAll(blobs: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map(b => Row(b._1, b._2)), 2), schema)
    Multimodal.imageDHash(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
  }

  /** Expected dHash via the decoder's exact grid math, fed from the
    * painted pixels — the analytic truth [[MediaDecoder.dHash48]] must
    * reproduce.
    */
  private def expectedDHash(im: BufferedImage): Long = {
    val grid = Array.ofDim[Double](8, 7)
    for (r <- 0 until 8; c <- 0 until 7) {
      val y0 = r * im.getHeight / 8; val y1 = (r + 1) * im.getHeight / 8
      val x0 = c * im.getWidth / 7;  val x1 = (c + 1) * im.getWidth / 7
      var sum = 0.0
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = im.getRGB(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
      }
      grid(r)(c) = sum / ((y1 - y0).toLong * (x1 - x0))
    }
    (for (r <- 0 until 8; x <- 0 until 6 if grid(r)(x + 1) > grid(r)(x))
      yield 1L << (r * 6 + x)).sum
  }

  test("dHash matches the analytic grid; invariant to exact upscale and uniform brightness; jpeg stays near") {
    // 14×16 → every 7×8 grid cell is an exact 2×2 pixel block
    val img = paint(14, 16) { (x, y) =>
      val v = ((x * 17 + y * 29) % 180) + 20; (v << 16) | (v << 8) | v
    }
    // nearest-neighbour 2× upscale replicates blocks → identical averages
    val up = paint(28, 32)((x, y) => img.getRGB(x / 2, y / 2))
    // +40 on every channel (v ≤ 199, no clamping) preserves every
    // neighbour comparison — the invariance that makes dHash a
    // PERCEPTUAL hash where md5-of-bytes sees nothing
    val bright = paint(14, 16) { (x, y) =>
      val rgb = img.getRGB(x, y)
      def c(v: Int) = v + 40
      (c((rgb >> 16) & 0xFF) << 16) | (c((rgb >> 8) & 0xFF) << 8) | c(rgb & 0xFF)
    }
    val out = dhashAll(Seq(
      1L -> bytes(img, "png"), 2L -> bytes(up, "png"),
      3L -> bytes(bright, "png"), 4L -> bytes(img, "bmp"),
      5L -> bytes(img, "jpg")))
    assert(out(1L) == ((expectedDHash(img), true)))
    assert(out(2L) == out(1L), "2x upscale changed the dHash")
    assert(out(3L) == out(1L), "uniform brightness shift changed the dHash")
    assert(out(4L) == out(1L), "lossless re-encode (bmp) changed the dHash")
    val (jh, jreal) = out(5L)
    assert(jreal && java.lang.Long.bitCount(jh ^ out(1L)._1) <= 6,
      s"jpeg re-encode drifted ${java.lang.Long.bitCount(jh ^ out(1L)._1)} bits")
  }

  test("dHash fallback: non-image and sub-grid blobs take md5 first-48-bits, decoded_real=false") {
    val txt = "definitely not an image payload".getBytes("UTF-8")
    val tiny = paint(4, 4)((_, _) => 0x808080) // narrower than the 7×8 grid
    val out = dhashAll(Seq(1L -> txt, 2L -> bytes(tiny, "png")))
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(txt).map("%02x".format(_)).mkString
    assert(out(1L) == ((java.lang.Long.parseLong(md5hex.take(12), 16), false)))
    assert(!out(2L)._2, "4x4 image must take the fallback, not an arbitrary grid")
  }

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    out.toByteArray
  }

  private def frameRows(blob: Array[Byte], maxFrames: Int) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, blob)), 2), schema)
    Multimodal.decodeFrameFeatures(df, maxFrames)
      .orderBy("frame_idx").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
  }

  // ---- round-7 containers: raw MJPEG + animated WebP -----------------

  private def le(v: Int, n: Int): Array[Byte] =
    (0 until n).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray

  private def riffChunk(fourcc: String, payload: Array[Byte]): Array[Byte] =
    fourcc.getBytes("UTF-8") ++ le(payload.length, 4) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  /** Minimal animated-WebP container: VP8X (anim flag, canvas w×h) +
    * one ANMF chunk per frame (payloads are opaque to the chunk walk).
    */
  private def webpAnim(nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val vp8x = Array[Byte](0x02, 0, 0, 0) ++ le(w - 1, 3) ++ le(h - 1, 3)
    val inner = riffChunk("VP8X", vp8x) ++
      (0 until nFrames).flatMap(_ => riffChunk("ANMF", Array.fill[Byte](16)(0)))
    "RIFF".getBytes("UTF-8") ++ le(4 + inner.length, 4) ++
      "WEBP".getBytes("UTF-8") ++ inner
  }

  test("container sniff: png/jpeg/mjpeg/webp/webp-anim/wav classified; EXIF-like inner SOI stays jpeg") {
    val dec = new MediaDecoder
    val png = bytes(paint(4, 4)((_, _) => 0x808080), "png")
    val jpg = bytes(paint(4, 4)((_, _) => 0x808080), "jpg")
    assert(dec.containerOf(png) == "png")
    assert(dec.containerOf(jpg) == "jpeg")
    assert(dec.containerOf(jpg ++ jpg) == "mjpeg")
    // an embedded SOI BEFORE the main EOI (the EXIF-thumbnail shape)
    // must NOT flip classification to mjpeg
    val exifLike = jpg.dropRight(2) ++ Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xD9.toByte) ++ jpg.takeRight(2)
    assert(dec.containerOf(exifLike) == "jpeg")
    assert(dec.containerOf(webpAnim(3, 16, 9)) == "webp-anim")
    val stillWebp = "RIFF".getBytes("UTF-8") ++ le(12, 4) ++
      "WEBP".getBytes("UTF-8") ++ riffChunk("VP8 ", Array.fill[Byte](4)(1))
    assert(dec.containerOf(stillWebp) == "webp")
    assert(dec.containerOf("RIFF1234WAVEdata".getBytes("UTF-8")) == "wav")
    assert(dec.containerOf("plain text".getBytes("UTF-8")) == "unknown")
    assert(dec.containerOf(Array[Byte](1, 2)) == "unknown")
  }

  test("mp4/WebM metadata walk: v1 mdhd, largesize, unknown boxes, multi-cluster, DocType, truncation") {
    val dec = new MediaDecoder
    import VideoFixtures.{mp4, webm, box, be32, el, id, cluster, vsize}
    def be64(v: Long): Array[Byte] =
      (7 to 0 by -1).map(k => ((v >>> (8 * k)) & 0xFF).toByte).toArray
    // builder round-trip: 2-track file, the VIDEO track's numbers win
    val m = dec.videoMetaOf(1L, mp4(2, 25L, 4500L, "avc1"))
    assert(m.container == "mp4" && m.video_codec == "avc1" &&
      m.n_tracks == 2 && m.n_samples == 25 && m.duration_ms == 4500, m.toString)
    // hand-assembled: version-1 mdhd (64-bit times, timescale 90000),
    // an unknown 'free' box to skip, and moov under a LARGESIZE header
    val vf = Array[Byte](0, 0, 0, 0)
    val mdhdV1 = box("mdhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0),
      be32(90000), be64(180000L))
    val hdlr = box("hdlr", vf, be32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](13))
    val stsd = box("stsd", vf, be32(1), be32(16),
      "av01".getBytes("ISO-8859-1"), new Array[Byte](8))
    val stsz = box("stsz", vf, be32(100), be32(42))
    val trakB = box("trak", box("mdia", mdhdV1, hdlr,
      box("minf", box("stbl", stsd, stsz))))
    val largeMoov = be32(1) ++ "moov".getBytes("ISO-8859-1") ++
      be64(16L + trakB.length) ++ trakB
    val blob = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0)) ++
      box("free", Array.fill[Byte](9)(3)) ++ largeMoov
    val r = dec.videoMetaOf(2L, blob)
    assert(r.video_codec == "av01" && r.n_tracks == 1 && r.n_samples == 42 &&
      r.duration_ms == 180000L * 1000 / 90000, r.toString) // = 2000 ms
    // WebM builder round-trip + DocType routing
    val w = dec.videoMetaOf(3L, webm(7, 1234L, "V_VP9"))
    assert(w.container == "webm" && w.video_codec == "V_VP9" &&
      w.n_tracks == 1 && w.n_samples == 7 && w.duration_ms == 1234, w.toString)
    assert(dec.videoMetaOf(4L,
      webm(1, 10L, "V_MPEG4/ISO/AVC", docType = "matroska")).container == "mkv")
    // hand-assembled: UNKNOWN-size Segment (streaming shape) holding
    // TWO clusters — SimpleBlocks must sum across them
    val header = el(id(0x1A, 0x45, 0xDF, 0xA3),
      el(id(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val info = el(id(0x15, 0x49, 0xA9, 0x66),
      el(id(0x2A, 0xD7, 0xB1), Array(0x0F.toByte, 0x42.toByte, 0x40.toByte)),
      el(id(0x44, 0x89), be64(java.lang.Double.doubleToLongBits(500.0))))
    val tracks = el(id(0x16, 0x54, 0xAE, 0x6B),
      el(id(0xAE), el(id(0x83), Array(1.toByte)),
        el(id(0x86), "V_AV1".getBytes("ISO-8859-1"))))
    val segBody = info ++ tracks ++ cluster(3) ++ cluster(4)
    val blob2 = header ++ id(0x18, 0x53, 0x80, 0x67) ++
      Array(0xFF.toByte) ++ segBody
    val u = dec.videoMetaOf(5L, blob2)
    assert(u.container == "webm" && u.video_codec == "V_AV1" &&
      u.n_samples == 7 && u.duration_ms == 500, u.toString)
    // truncation degrades to zeros, never throws
    val tm = dec.videoMetaOf(6L, mp4(1, 5L, 100L, "avc1").take(30))
    assert(tm.container == "mp4" && tm.n_samples == 0 && tm.video_codec == "")
    val tw = dec.videoMetaOf(7L, webm(5, 100L, "V_VP8").take(16))
    assert(tw.container == "webm" && tw.n_samples == 0 && tw.video_codec == "")
    // the sniff contract: 'ftyp' at bytes 4-7 is mp4 even for ASCII
    assert(dec.containerOf("xxxxftypabcdefgh".getBytes("UTF-8")) == "mp4")
    assert(vsize(7).length == 2) // fixture sizes are 2-byte vints
  }

  test("raw MJPEG: real per-frame decode pins frame order and stride") {
    // four concatenated JPEGs of increasing gray — lossy, so lumas are
    // approximate, but ORDER must be strictly increasing and close
    val grays = Seq(20, 90, 160, 230)
    val frames = grays.map(g => paint(8, 6)((_, _) => (g << 16) | (g << 8) | g))
    val blob = frames.map(f => bytes(f, "jpg")).reduce(_ ++ _)
    val all = frameRows(blob, maxFrames = 8)
    assert(all.map(_._1) == (0L until 4L).toSeq, s"order: ${all.map(_._1)}")
    assert(all.forall(_._3), "mjpeg must take the real path")
    all.zip(grays).foreach { case ((_, luma, _), g) =>
      assert(math.abs(luma - g / 255.0) < 0.05, s"gray $g luma $luma") }
    assert(all.map(_._2) == all.map(_._2).sorted, "lumas must ascend with frames")
    // stride: maxFrames=2 over 4 frames → offsets 0 and 2
    val sampled = frameRows(blob, maxFrames = 2)
    assert(sampled.map(_._1) == Seq(0L, 2L))
    assert(math.abs(sampled(1)._2 - grays(2) / 255.0) < 0.05,
      "stride must decode frame 2, not frame 1")
  }

  test("animated WebP: real frame count from the ANMF walk, fake luma, detectContainers") {
    val blob = webpAnim(6, 32, 8)
    val all = frameRows(blob, maxFrames = 8)
    // container walk yields the REAL 6 frames even though VP8 pixels
    // are undecodable on the JVM (fake luma, decoded_real = false)
    assert(all.map(_._1) == (0L until 6L).toSeq, s"offsets: ${all.map(_._1)}")
    assert(all.forall(!_._3))
    assert(all == frameRows(blob, maxFrames = 8), "fake luma must be deterministic")
    val sampled = frameRows(blob, maxFrames = 3)
    assert(sampled.map(_._1) == Seq(0L, 2L, 4L))
    // the DataFrame census API
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, blob),
        Row(2L, bytes(paint(4, 4)((_, _) => 0x112233), "png")),
        Row(3L, "nope".getBytes("UTF-8"))), 2), schema)
    val got = Multimodal.detectContainers(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == "webp-anim" && got(1L)._2 == blob.length.toLong)
    assert(got(2L)._1 == "png")
    assert(got(3L)._1 == "unknown")
  }

  test("multi-frame GIF: per-frame luma pins frame ORDER and sampling STRIDE") {
    // six frames of distinct solid grays — per-frame expected luma comes
    // from the paint loop, so a reordered or mis-strided read cannot pass
    val grays = Seq(10, 60, 110, 160, 210, 250)
    val frames = grays.map(g => paint(8, 6)((_, _) => (g << 16) | (g << 8) | g))
    val blob = animatedGif(frames)
    // maxFrames above the count: every frame, in index order
    val all = frameRows(blob, maxFrames = 8)
    assert(all.map(_._1) == (0L until 6L).toSeq, s"frame order: ${all.map(_._1)}")
    assert(all.forall(_._3), "should take the real path")
    for (((_, luma, _), i) <- all.zipWithIndex)
      assert(luma == meanLuma(frames(i)), s"frame $i luma $luma")
    // maxFrames = 3 over 6 frames: stride floor(i·6/3) = frames 0, 2, 4 —
    // and their lumas must be those frames', proving read(offset) honors
    // the planned stride rather than reading the first three
    val sampled = frameRows(blob, maxFrames = 3)
    assert(sampled.map(_._1) == Seq(0L, 2L, 4L), s"stride: ${sampled.map(_._1)}")
    assert(sampled.map(_._2) == Seq(0, 2, 4).map(i => meanLuma(frames(i))))
    // the offsets must equal frameSamplePlan's column formula verbatim
    val planned = Multimodal.frameSamplePlan(
        spark.range(1).select(lit(6L).as("n_frames")), maxFrames = 3)
      .select("sampled_frames").head().getSeq[Long](0)
    assert(planned == Seq(0L, 2L, 4L), s"plan/decode stride drift: $planned")
    // fallback blobs fan out deterministically with the same fake count
    // decodeFeatures reports, capped by maxFrames
    val junk = "definitely not an image".getBytes("UTF-8")
    val fakeN = decodeAll(Seq(1L -> junk))(1L)._3
    val fake = frameRows(junk, maxFrames = 4)
    assert(fake.size == math.min(fakeN, 4L).toInt && fake.forall(!_._3))
    assert(fake == frameRows(junk, maxFrames = 4), "fake path must be deterministic")
  }

  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def decodeAudioAll(blobs: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map(b => Row(b._1, b._2)), 2), schema)
    Multimodal.decodeAudioFeatures(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getBoolean(7))))
      .toMap
  }

  test("WAV decodes real rate/frames/duration and bit-exact RMS") {
    // square wave at half amplitude: every sample ±16384 ⇒ each
    // normalized s² is exactly 0.25 ⇒ RMS exactly 0.5
    val square = Array.tabulate[Short](8000)(i =>
      if (i % 2 == 0) 16384 else -16384)
    val silent = Array.fill[Short](400)(0)
    val out = decodeAudioAll(Seq(
      1L -> wavBytes(square, 8000f), 2L -> wavBytes(silent, 16000f)))
    val (rate1, ch1, frames1, durMs1, rms1, real1) = out(1L)
    assert(real1 && rate1 == 8000L && ch1 == 1L && frames1 == 8000L)
    assert(durMs1 == 1000.0)
    assert(rms1 == 0.5, s"square-wave RMS must be exactly 0.5, got $rms1")
    val (rate2, _, frames2, durMs2, rms2, real2) = out(2L)
    assert(real2 && rate2 == 16000L && frames2 == 400L && durMs2 == 25.0)
    assert(rms2 == 0.0)
  }

  test("audio spectrum: FFT finds the tone, centroid separates timbres") {
    def spectrumAll(blobs: Seq[(Long, Array[Byte])]) = {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("media", BinaryType)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(blobs.map(b => Row(b._1, b._2)), 2), schema)
      Multimodal.decodeAudioSpectrum(df, fftSize = 4096).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
        .toMap
    }
    val binHz = 8000.0 / 4096
    val sine = Array.tabulate[Short](8000)(i =>
      math.round(0.8 * 32767 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    // 250 Hz square: period 32 samples at 8000 Hz — odd harmonics at
    // 250·(2k−1) with 1/(2k−1) amplitudes pull the centroid far above
    // the fundamental (predicted ≈ 990 Hz; the sine's stays at 440)
    val square = Array.tabulate[Short](8000)(i =>
      if ((i / 16) % 2 == 0) 16384 else -16384)
    val out = spectrumAll(Seq(
      1L -> wavBytes(sine, 8000f), 2L -> wavBytes(square, 8000f)))
    val (rate1, dom1, cen1, real1) = out(1L)
    assert(real1 && rate1 == 8000L)
    assert(math.abs(dom1 - 440.0) <= 2 * binHz, s"sine dominant $dom1")
    assert(math.abs(cen1 - 440.0) <= 30.0, s"sine centroid $cen1")
    val (_, dom2, cen2, real2) = out(2L)
    assert(real2)
    assert(math.abs(dom2 - 250.0) <= 2 * binHz, s"square dominant $dom2")
    assert(cen2 > 600.0 && cen2 > cen1 + 300.0, s"square centroid $cen2")

    // stereo mono-mix: L = sine, R = silence → same dominant tone
    val stereoPcm = new Array[Byte](sine.length * 4)
    sine.zipWithIndex.foreach { case (s, i) =>
      stereoPcm(4 * i) = (s & 0xFF).toByte
      stereoPcm(4 * i + 1) = ((s >> 8) & 0xFF).toByte
      // right channel stays zero
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereoPcm), fmt, sine.length.toLong)
    val so = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, so)
    val sOut = spectrumAll(Seq(3L -> so.toByteArray))
    assert(sOut(3L)._4 && math.abs(sOut(3L)._2 - 440.0) <= 2 * binHz)

    // non-audio falls back deterministically
    val text = "not audio".getBytes("UTF-8")
    val f1 = spectrumAll(Seq(9L -> text))
    assert(!f1(9L)._4 && f1 == spectrumAll(Seq(9L -> text)))
  }

  test("non-audio and truncated blobs fall back to the audio fake deterministically") {
    val wav = wavBytes(Array.fill[Short](100)(1000), 8000f)
    val truncated = wav.take(16) // RIFF magic, unreadable body
    val text = "definitely not audio".getBytes("UTF-8")
    val out = decodeAudioAll(Seq(1L -> truncated, 2L -> text))
    assert(!out(1L)._6 && !out(2L)._6)
    assert(out == decodeAudioAll(Seq(1L -> truncated, 2L -> text)))
    // mixed batch: real and fallback side by side
    val mixed = decodeAudioAll(Seq(1L -> wav, 2L -> text))
    assert(mixed(1L)._6 && !mixed(2L)._6)
  }

  // --- audio spectral fingerprint -----------------------------------
  // band centers for rate 8000, fft n = 512 (half = 256, 7 bands of
  // ~36.4 bins): bin k ↦ k·15.625 Hz, centers ≈ bins 18..236
  private val BandFreqs =
    Seq(281.25, 859.375, 1421.875, 1984.375, 2562.5, 3125.0, 3687.5)

  private def mixTone(amps: Seq[Double], rate: Int, n: Int,
      scale: Double): Array[Short] = {
    val norm = amps.sum max 1.0
    Array.tabulate(n) { i =>
      val v = amps.zip(BandFreqs).map { case (a, f) =>
        a * math.sin(2.0 * math.Pi * f * i / rate) }.sum / norm
      (v * scale * 32000).toShort
    }
  }

  private def fpAll(blobs: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("media", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map(b => Row(b._1, b._2)), 2), schema)
    Multimodal.audioFingerprint(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
  }

  test("audio fingerprint: band-energy gradient bits are analytic on tone mixtures") {
    // strictly increasing per-band amplitudes → every adjacent-band
    // comparison is 1 in every window; strictly decreasing → all 0
    val up = wavBytes(mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 4096, 0.8), 8000f)
    val down = wavBytes(mixTone(Seq(7, 6, 5, 4, 3, 2, 1), 8000, 4096, 0.8), 8000f)
    val out = fpAll(Seq(1L -> up, 2L -> down))
    assert(out(1L) == ((0xFFFFFFFFFFFFL, true)), f"up: ${out(1L)._1}%012x")
    assert(out(2L) == ((0L, true)))
  }

  test("audio fingerprint: amplitude-scaling invariance (the dHash-brightness twin)") {
    val loud = wavBytes(mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 4096, 0.9), 8000f)
    val quiet = wavBytes(mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 4096, 0.1), 8000f)
    val out = fpAll(Seq(1L -> loud, 2L -> quiet))
    assert(out(1L)._2 && out(2L)._2)
    assert(out(1L)._1 == out(2L)._1,
      "energy-ratio bits must not see volume changes")
  }

  test("audio fingerprint: windows capture temporal structure exactly") {
    // first 4 windows increasing mix (bits 1), last 4 decreasing (bits 0):
    // the signature must be exactly the low 24 bits
    val first = mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 2048, 0.8)
    val second = mixTone(Seq(7, 6, 5, 4, 3, 2, 1), 8000, 2048, 0.8)
    val wav = wavBytes(first ++ second, 8000f)
    val out = fpAll(Seq(1L -> wav))
    assert(out(1L) == ((0xFFFFFFL, true)), f"got ${out(1L)._1}%012x")
  }

  test("audio fingerprint: non-audio and too-short clips take the deterministic md5 fallback") {
    val text = "definitely not audio".getBytes("UTF-8")
    val short = wavBytes(mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 64, 0.8), 8000f)
    val out = fpAll(Seq(1L -> text, 2L -> short))
    assert(!out(1L)._2 && !out(2L)._2)
    assert(out(1L)._1 >= 0L && out(1L)._1 < (1L << 48))
    assert(fpAll(Seq(1L -> text, 2L -> short)) == out, "fallback must be deterministic")
    // and pairs with the real path in one batch
    val wav = wavBytes(mixTone(Seq(1, 2, 3, 4, 5, 6, 7), 8000, 4096, 0.8), 8000f)
    val mixed = fpAll(Seq(1L -> wav, 2L -> text))
    assert(mixed(1L)._2 && !mixed(2L)._2)
  }

  test("non-image and truncated blobs fall back to the deterministic fake") {
    val png = bytes(paint(9, 9)((_, _) => 0x808080), "png")
    val truncated = png.take(20) // valid magic, unreadable body
    val text = "just some document text".getBytes("UTF-8")
    val out = decodeAll(Seq(1L -> truncated, 2L -> text))
    assert(!out(1L)._5 && !out(2L)._5)
    // fake metadata is the md5 derivation — deterministic across runs
    val again = decodeAll(Seq(1L -> truncated, 2L -> text))
    assert(out == again)
    // and the real path on the intact bytes still works in the same batch
    val mixed = decodeAll(Seq(1L -> png, 2L -> text))
    assert(mixed(1L)._5 && !mixed(2L)._5)
    assert(mixed(1L)._1 == 9L && mixed(1L)._2 == 9L)
  }
}
