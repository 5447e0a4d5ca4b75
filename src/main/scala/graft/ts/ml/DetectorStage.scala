package graft.ts.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
import graft.ts.{Detector, SeriesSpec}

/** spark.ml integration (the BASELINE "MLlib + DataFrame windowing"
  * approach): any [[graft.ts.Detector]] drops into an
  * `org.apache.spark.ml.Pipeline` —
  *
  *   - [[DetectorModel]] is the Transformer (`transform == detect`),
  *   - [[DetectorEstimator]] is the Estimator (`fit` learns thresholds
  *     on the training frame, like the reference's novelty workflow
  *     `detector.fit(normal).detect(dirty)` at
  *     `/root/reference/README.md:46-52`).
  *
  * This gives tsod pipelines access to ml.Pipeline composition and
  * ParamMap-free simplicity; persistence stays with DetectorIO's JSON
  * documents.
  */
final class DetectorModel(
    override val uid: String,
    val detector: Detector,
    val spec: SeriesSpec = SeriesSpec()) extends Model[DetectorModel] {

  def this(detector: Detector, spec: SeriesSpec) =
    this(Identifiable.randomUID(detector.name), detector, spec)
  def this(detector: Detector) = this(detector, SeriesSpec())

  override def transform(ds: Dataset[_]): DataFrame =
    detector.detect(ds.toDF(), spec)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(spec.flag, BooleanType, nullable = false))

  override def copy(extra: ParamMap): DetectorModel =
    new DetectorModel(uid, detector, spec)
}

final class DetectorEstimator(
    override val uid: String,
    val detector: Detector,
    val spec: SeriesSpec = SeriesSpec()) extends Estimator[DetectorModel] {

  def this(detector: Detector, spec: SeriesSpec) =
    this(Identifiable.randomUID(detector.name), detector, spec)
  def this(detector: Detector) = this(detector, SeriesSpec())

  override def fit(ds: Dataset[_]): DetectorModel =
    new DetectorModel(detector.fit(ds.toDF(), spec), spec)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(spec.flag, BooleanType, nullable = false))

  override def copy(extra: ParamMap): DetectorEstimator =
    new DetectorEstimator(uid, detector, spec)
}
