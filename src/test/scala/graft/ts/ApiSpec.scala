package graft.ts

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Error paths, persistence round-trips, features — mirroring the
  * reference's test_detectors.py error tests and test_persistence.py.
  */
class ApiSpec extends SparkSpecBase {

  def walk = seriesDf(loadGolden("walk"))

  test("wrong input columns raise WrongInputDataTypeError (base.py:74-80 analog)") {
    val df = walk.withColumnRenamed("value", "other")
    intercept[WrongInputDataTypeError](RangeDetector(0, 1).detect(df))
    intercept[WrongInputDataTypeError](
      DiffDetector(1.0).detect(walk, SeriesSpec(value = "nope")))
    intercept[WrongInputDataTypeError](
      RangeDetector(0, 1).detect(walk.withColumn("value", col("value").cast("string"))))
  }

  test("invalid direction raises (detectors.py:158-164)") {
    val e = intercept[IllegalArgumentException](DiffDetector(1.0, "sideways"))
    assert(e.getMessage.contains("not a valid direction"))
    intercept[IllegalArgumentException](GradientDetector(1.0, "up"))
  }

  test("hampel argument validation (hampel.py:16-24)") {
    assert(intercept[InvalidArgumentError](HampelDetector(0))
      .getMessage == "window_size must be nonnegative.")
    assert(intercept[InvalidArgumentError](HampelDetector(5, -1))
      .getMessage == "threshold must be positive.")
  }

  test("assertStrictlyIncreasing rejects duplicate timestamps (base.py:86-87)") {
    val dup = walk.union(walk.limit(1))
    val e = intercept[IllegalArgumentException](
      Detector.assertStrictlyIncreasing(dup))
    assert(e.getMessage == "Index must be monotonically increasing")
    Detector.assertStrictlyIncreasing(walk) // clean series passes
  }

  test("persistence round-trip incl. CombinedDetector (test_persistence.py analog)") {
    val original = CombinedDetector(Seq(
      ConstantValueDetector(5, 1e-4),
      RangeDetector(maxValue = 2.0),
      HampelDetector(7, 2.5),
      DiffDetector(3.0, "negative"),
      GradientDetector(),
      RollingStdDevDetector(8, 1.25, center = false),
      ConstantGradientDetector(4)))
    val path = Files.createTempDirectory("tsod").resolve("combined.json").toString
    DetectorIO.save(original, path)
    val loaded = DetectorIO.load(path)
    assert(loaded == original)
    // fitted params survive the round-trip
    val fitted = RangeDetector().fit(walk)
    DetectorIO.save(fitted, path)
    assert(DetectorIO.load(path) == fitted)
    // non-finite defaults survive (inf encoded as string in JSON)
    val d = DetectorIO.load({
      DetectorIO.save(DiffDetector(), path); path
    }).asInstanceOf[DiffDetector]
    assert(d.maxDiff.isPosInfinity)
    // Hadoop-FS variant round-trips through the session's FileSystem
    DetectorIO.save(original, s"file://$path", spark)
    assert(DetectorIO.load(s"file://$path", spark) == original)
  }

  test("loads the committed v1 parameter document (back-compat artifact, " +
    "like tests/data/combined.joblib)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/combined_detector_v1.json"), "UTF-8")
    val doc = try src.mkString finally src.close()
    val cd = DetectorIO.fromJsonString(doc).asInstanceOf[CombinedDetector]
    assert(cd.length == 3)
    assert(cd(0) == ConstantValueDetector(3, 1e-7))
    assert(cd(1) == RangeDetector(Double.NegativeInfinity, 2.0))
    // missing "impl" field defaults — older documents stay loadable
    assert(cd(2).asInstanceOf[HampelDetector].windowSize == 5)
    // and it actually detects (reference test_persistence analog)
    val out = cd.detect(seriesDf(loadGolden("range_abnormal")))
    assert(maskOf(out).count(identity) > 0)
  }

  test("display parity: reference __str__/__repr__ formats " +
    "(detectors.py:132-136,180-183,218-219,320-324; hampel.py:89-90)") {
    assert(RangeDetector(0.5, 2.0).toString == "RangeDetector(min: 5.0e-01, max: 2.0e+00)")
    assert(RangeDetector().toString == "RangeDetector(min: -inf, max: inf)")
    assert(DiffDetector(3.0, "negative").toString == "DiffDetector(3.0, direction:negative)")
    assert(DiffDetector().toString == "DiffDetector(inf, direction:both)")
    // gradient prints per HOUR (detectors.py:320-324)
    assert(GradientDetector(0.5).toString == "GradientDetector(1800.0/hr, direction:both)")
    assert(RollingStdDevDetector(8, 1.25).toString ==
      "RollingStdDevDetector(window_size:8, max_std:1.25)")
    assert(HampelDetector(5, 3.0).toString == "HampelDetector(5, 3.0)")
    // threshold 1e-7 must print Python-style ("1e-07", not "1.0E-7"):
    // scientific below 1e-4, sign + two-digit exponent, bare mantissa
    assert(ConstantValueDetector().toString == "ConstantValueDetector(3, 1e-07)")
    assert(ConstantValueDetector(4, 0.0001).toString ==
      "ConstantValueDetector(4, 0.0001)") // Python keeps 1e-4 decimal
    assert(ConstantGradientDetector(5).toString == "ConstantGradientDetector(5)")
    // the reference defines no CombinedDetector.__str__ → class name only
    assert(CombinedDetector(Seq(RangeDetector())).toString == "CombinedDetector")
    assert(RangeDetector(1.5e-7, 2.34e18).toString ==
      "RangeDetector(min: 1.5e-07, max: 2.3e+18)") // __repr__ .1e form
  }

  test("export_joblib.py migrates the reference's pickle artifact " +
    "(tests/data/combined.joblib → JSON → load)") {
    // src/test/resources/golden/combined_from_joblib.json is the committed
    // output of `python3 scripts/export_joblib.py` over the reference's
    // back-compat fixture — a tsod user's saved model survives migration
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/combined_from_joblib.json"), "UTF-8")
    val doc = try src.mkString finally src.close()
    val cd = DetectorIO.fromJsonString(doc).asInstanceOf[CombinedDetector]
    // exact pickled state of the fixture (tests/test_persistence.py:24-48)
    assert(cd == CombinedDetector(Seq(
      ConstantValueDetector(5, 1e-7),
      RangeDetector(Double.NegativeInfinity, 2.0))))
    val out = cd.detect(seriesDf(loadGolden("range_abnormal")))
    assert(maskOf(out).count(identity) > 0)
  }

  test("lagTimeSeries appends one column per lag named str(lag) (features.py:5-23)") {
    val out = Features.lagTimeSeries(walk, Seq(1, 2, -1))
    assert(Seq("1", "2", "-1").forall(out.columns.contains))
    val rows = out.orderBy("ts").select("value", "1", "2", "-1").collect()
    val v = rows.map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    def colv(i: Int) = rows.map(r => Option(r.get(i)).map(_.asInstanceOf[Double]))
    assert(colv(1).drop(1).toSeq == v.dropRight(1).toSeq) // lag 1
    assert(colv(1)(0).isEmpty)
    assert(colv(3).dropRight(1).toSeq == v.drop(1).toSeq) // lead (lag -1)
  }

  test("createDataset emits complete windows + shifted label (features.py:26-32)") {
    val steps = 2
    val out = Features.createDataset(walk, Seq("value"), "value", steps)
      .orderBy("ts").select("features", "label").collect()
    val n = walk.count().toInt
    assert(out.length == n - steps)
    val vals = walk.orderBy("ts").select("value").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    // row i: features = values[i, i+1], label = values[i+2]
    val feats0 = out(0).getSeq[Seq[java.lang.Double]](0)
    assert(feats0.length == steps)
    assert(Option(out(0).get(1)).map(_.asInstanceOf[Double]) == vals(steps))
  }

  test("detect preserves input columns and appends non-null boolean flag") {
    val out = HampelDetector(5, 3).detect(walk.withColumn("extra", lit("x")))
    assert(out.columns.toSeq == Seq("ts", "value", "extra", "is_anomaly"))
    assert(out.filter(col("is_anomaly").isNull).count() == 0)
    // custom flag column name
    val out2 = RangeDetector(0, 1).detect(walk, SeriesSpec(flag = "flag2"))
    assert(out2.columns.contains("flag2"))
  }

  test("CombinedDetector is sequence-like (detectors.py:51-55)") {
    val cd = CombinedDetector(Seq(ConstantValueDetector(), RangeDetector()))
    assert(cd.length == 2)
    assert(cd(0).isInstanceOf[ConstantValueDetector])
    assert(cd(1).isInstanceOf[RangeDetector])
  }
}
