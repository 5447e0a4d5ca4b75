package graft.ts

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.util.Json
import graft.util.Json._

/** Detector persistence: a portable JSON parameter document replacing the
  * reference's joblib pickles (`/root/reference/tsod/base.py:13-22,95-104`).
  * `save(path)`/`load(path)` round-trip every detector including nested
  * `CombinedDetector` children, like `tests/test_persistence.py:6-48`.
  */
object DetectorIO {

  def toJsonString(d: Detector): String =
    JObj(Seq("format" -> JStr("tsodspark/1"), "detector" -> d.toJson)).render

  def fromJsonString(s: String): Detector = {
    val doc = Json.parse(s)
    fromJson(doc("detector").opt.getOrElse(doc))
  }

  def fromJson(j: JValue): Detector = j("type").str match {
    case "RangeDetector" => RangeDetector.fromJson(j)
    case "DiffDetector" => DiffDetector.fromJson(j)
    case "GradientDetector" => GradientDetector.fromJson(j)
    case "RollingStdDevDetector" => RollingStdDevDetector.fromJson(j)
    case "ConstantValueDetector" => ConstantValueDetector.fromJson(j)
    case "ConstantGradientDetector" => ConstantGradientDetector.fromJson(j)
    case "HampelDetector" => HampelDetector.fromJson(j)
    case "EwmaDetector" => EwmaDetector.fromJson(j)
    case "HoltDetector" => HoltDetector.fromJson(j)
    case "CusumDetector" => CusumDetector.fromJson(j)
    case "CombinedDetector" => CombinedDetector.fromJson(j)
    case other => throw new TsodSparkException(s"Unknown detector type: $other")
  }

  /** `.joblib` paths save in the REFERENCE's own pickle format (so a
    * model fitted here goes straight back into tsod — [[JoblibIO]]
    * write parity); anything else saves the engine's JSON document.
    */
  def save(d: Detector, path: String): Unit =
    if (path.endsWith(".joblib")) JoblibIO.save(d, path)
    else Files.write(Paths.get(path),
      toJsonString(d).getBytes(StandardCharsets.UTF_8))

  /** Loads either format, like `tsod.load`: the engine's JSON documents,
    * or the reference's joblib pickle files (sniffed by the pickle PROTO
    * byte 0x80, which no JSON document can start with) via [[JoblibIO]].
    */
  def load(path: String): Detector = {
    val bytes = Files.readAllBytes(Paths.get(path))
    if (bytes.nonEmpty && (bytes(0) & 0xFF) == 0x80) JoblibIO.fromBytes(bytes)
    else fromJsonString(new String(bytes, StandardCharsets.UTF_8))
  }

  /** Hadoop-FS variants for cluster deployments (hdfs://, s3a://, ...):
    * same JSON document, written through the session's FileSystem.
    */
  def save(d: Detector, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(toJsonString(d).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(path: String, spark: org.apache.spark.sql.SparkSession): Detector = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      fromJsonString(new String(bytes.toByteArray, StandardCharsets.UTF_8))
    } finally in.close()
  }
}
