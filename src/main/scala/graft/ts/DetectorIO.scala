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
    case "CombinedDetector" => CombinedDetector.fromJson(j)
    case other => throw new TsodSparkException(s"Unknown detector type: $other")
  }

  def save(d: Detector, path: String): Unit =
    Files.write(Paths.get(path), toJsonString(d).getBytes(StandardCharsets.UTF_8))

  def load(path: String): Detector =
    fromJsonString(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}
