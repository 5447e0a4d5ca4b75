package graft.ts

import org.apache.spark.sql.functions._

/** Per-series fit must equal running the reference's global fit
  * independently on each series.
  */
class PerSeriesFitSpec extends SparkSpecBase {

  val names = Seq("range_normal", "walk", "irregular", "jump_normal")
  lazy val stacked = stackedDf(names.map(loadGolden)).cache()
  val spec = SeriesSpec(seriesId = Seq("sid"))

  def perSeriesMask(out: org.apache.spark.sql.DataFrame, s: String): Vector[Boolean] =
    maskOf(out.filter(col("sid") === s))

  test("per-series range fit == per-series global RangeDetector fits") {
    val joint = PerSeriesFit.rangeDetect(stacked, stacked, spec = spec)
    for (n <- names) {
      val single = seriesDf(loadGolden(n))
      val want = maskOf(RangeDetector().fit(single).detect(single))
      assert(perSeriesMask(joint, n) == want, n)
    }
  }

  test("per-series diff fit == per-series global DiffDetector fits") {
    val joint = PerSeriesFit.diffDetect(stacked, stacked, spec = spec)
    for (n <- names) {
      val single = seriesDf(loadGolden(n))
      val want = maskOf(DiffDetector().fit(single).detect(single))
      assert(perSeriesMask(joint, n) == want, n)
    }
  }

  test("per-series gradient fit == per-series global GradientDetector fits") {
    val joint = PerSeriesFit.gradientDetect(stacked, stacked, spec = spec)
    for (n <- names) {
      val single = seriesDf(loadGolden(n))
      val want = maskOf(GradientDetector().fit(single).detect(single))
      assert(perSeriesMask(joint, n) == want, n)
    }
  }

  test("per-series rolling-std fit == per-series global RollingStdDev fits") {
    val joint = PerSeriesFit.rollingStdDetect(stacked, stacked, windowSize = 4, spec = spec)
    for (n <- names) {
      val single = seriesDf(loadGolden(n))
      val want = maskOf(RollingStdDevDetector(4).fit(single).detect(single))
      assert(perSeriesMask(joint, n) == want, n)
    }
  }

  test("train/score split: thresholds come from the train frame only") {
    val train = stacked.filter(col("value") < 5 || col("value").isNull)
    val joint = PerSeriesFit.rangeDetect(train, stacked, spec = spec)
    for (n <- names) {
      val g = loadGolden(n)
      val single = seriesDf(g)
      val singleTrain = single.filter(col("value") < 5 || col("value").isNull)
      val want = maskOf(RangeDetector().fit(singleTrain).detect(single))
      assert(perSeriesMask(joint, n) == want, n)
    }
  }
}
