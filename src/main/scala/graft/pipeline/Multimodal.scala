package graft.pipeline

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column next to typed metadata; decode/feature-extract
  * runs batched per partition (the Scala analog of `mapInPandas`), so a
  * real decoder would amortize native-library setup per batch, not per
  * row.
  *
  * The actual byte decoding is a STUB — image/audio codecs are not in
  * this container — replaced by a deterministic md5-derived fake
  * (`FakeDecoded`). The Spark-side plumbing (binary schema, Dataset
  * encoders, partition-batched execution, metadata struct shape) is real
  * and tested; swap [[MediaDecoder.decode]]'s body for a codec call to
  * go live.
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
      n_frames: Long, brightness: Double)

  /** Batched "decode": one pass per partition over (id, blob) pairs.
    * A production decoder would initialize its codec once per partition
    * here; the stub derives metadata deterministically from md5(blob).
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

  /** Aspect-preserving resize metadata (no pixels in the stub). */
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
}

/** The stub decoder. Every field is a deterministic function of the blob's
  * md5, so results are reproducible across engines (the DuckDB oracle
  * computes the same values from `md5(text)`).
  */
final class MediaDecoder extends Serializable {
  private val mdig = MessageDigest.getInstance("MD5")

  private def hexSlice(hex: String, from: Int, len: Int): Long =
    java.lang.Long.parseLong(hex.substring(from, from + len), 16)

  def decode(id: Long, blob: Array[Byte]): Multimodal.DecodedMedia = {
    // ??? real codec goes here; deterministic fake below
    val hex = mdig.digest(blob).map("%02x".format(_)).mkString
    Multimodal.DecodedMedia(
      doc_id = id,
      n_bytes = blob.length.toLong,
      width = 1L + hexSlice(hex, 0, 12) % 512,
      height = 1L + hexSlice(hex, 12, 12) % 512,
      n_frames = 1L + hexSlice(hex, 16, 12) % 32,
      brightness = (hexSlice(hex, 20, 12) % 1000000L) / 1000000.0)
  }
}
