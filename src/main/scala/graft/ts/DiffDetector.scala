package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Json
import graft.util.Json._

/** Flag large jumps between consecutive samples, time-ignorant
  * (`/root/reference/tsod/detectors.py:139-183`). Direction `both` compares
  * `|Δx| > maxDiff`; `positive`/`negative` compare signed. The first sample
  * of each series (null Δ) is never an anomaly. `fit` learns the SIGNED max
  * diff of the training data — not the absolute max — reproducing
  * `detectors.py:169`.
  */
final case class DiffDetector(
    maxDiff: Double = Double.PositiveInfinity,
    direction: String = "both") extends Detector {

  Directions.check(direction)

  override def contextRows: Int = 1 // lag(1)

  override protected def detectImpl(df: DataFrame, spec: SeriesSpec): DataFrame = {
    val v = TsOps.cleanValue(spec)
    val d = v - lag(v, 1).over(spec.w)
    val cond = direction match {
      case "both" => abs(d) > lit(maxDiff)
      case "positive" => d > lit(maxDiff)
      case "negative" => d < -lit(maxDiff)
    }
    df.withColumn(spec.flag, coalesce(cond, lit(false)))
  }

  override def fit(df: DataFrame, spec: SeriesSpec = SeriesSpec()): DiffDetector = {
    validate(df, spec)
    val v = TsOps.cleanValue(spec)
    val d = v - lag(v, 1).over(spec.w)
    val row = df.select(d.as("__d")).agg(max(col("__d")).as("m")).head()
    if (row.isNullAt(0)) this else copy(maxDiff = row.getDouble(0))
  }

  /** Reference display parity (`detectors.py:180-183` __str__). */
  override def toString: String =
    s"DiffDetector(${TsOps.pyFloat(maxDiff)}, direction:$direction)"

  override def toJson: JValue = JObj(Seq(
    "type" -> JStr("DiffDetector"),
    "max_diff" -> Json.num(maxDiff),
    "direction" -> JStr(direction)))
}

object DiffDetector {
  def fromJson(j: JValue): DiffDetector =
    DiffDetector(j("max_diff").num, j("direction").str)
}

private[ts] object Directions {
  val valid: Seq[String] = Seq("both", "positive", "negative")
  def check(direction: String): Unit =
    if (!valid.contains(direction))
      throw new IllegalArgumentException(
        s"Selected direction, '$direction' is not a valid direction. " +
          s"Valid directions are: ${valid.mkString("('", "', '", "')")}")
}
