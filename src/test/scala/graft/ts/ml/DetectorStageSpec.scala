package graft.ts.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._
import graft.ts._

class DetectorStageSpec extends SparkSpecBase {

  test("detectors compose as spark.ml Pipeline stages (fit-then-detect workflow)") {
    val train = seriesDf(loadGolden("range_normal"))
    val score = seriesDf(loadGolden("range_abnormal"))
    val pipeline = new Pipeline().setStages(Array(
      new DetectorEstimator(RangeDetector(), SeriesSpec(flag = "range_flag")),
      new DetectorModel(ConstantValueDetector(), SeriesSpec(flag = "const_flag"))))
    val model = pipeline.fit(train)
    val out = model.transform(score)
    assert(out.columns.toSeq == Seq("ts", "value", "range_flag", "const_flag"))
    // fitted RangeDetector on range_normal: min 0 / max 4 (reference test)
    val flags = out.orderBy("ts").select("range_flag").collect().map(_.getBoolean(0)).toVector
    assert(flags == Vector(true, false, false, false, false, false, true, true))
    // the fitted stage carries the learned thresholds
    val fitted = model.stages(0).asInstanceOf[DetectorModel]
      .detector.asInstanceOf[RangeDetector]
    assert(fitted.minValue == 0.0 && fitted.maxValue == 4.0)
  }

  test("transformSchema appends the flag column") {
    val est = new DetectorEstimator(DiffDetector(1.0))
    val schema = seriesDf(loadGolden("walk")).schema
    val out = est.transformSchema(schema)
    assert(out.fieldNames.toSeq == Seq("ts", "value", "is_anomaly"))
  }
}
