package graft.ts

import org.apache.spark.sql.functions._

/** Differential parity against the REAL reference implementation: every
  * mask column in src/test/resources/golden/<series>.csv was produced by
  * running /root/reference tsod (scripts/gen_golden.py); here the same
  * detector configs run on Spark and must reproduce every mask bit.
  */
class GoldenParitySpec extends SparkSpecBase {

  val seriesNames = Seq(
    "range_normal", "range_abnormal", "cgrad_normal", "cgrad_abnormal",
    "const_abnormal", "jump_normal", "jump_abnormal", "walk", "irregular",
    "quant_train", "quant_test")

  lazy val golden: Map[String, GoldenSeries] =
    seriesNames.map(n => n -> loadGolden(n)).toMap

  /** Unfitted configs, named exactly as the golden CSV columns. */
  def unfitted: Map[String, Detector] = Map(
    "range_0_2" -> RangeDetector(0, 2),
    "range_min3" -> RangeDetector(minValue = 3),
    "range_max3" -> RangeDetector(maxValue = 3),
    "diff_0p5" -> DiffDetector(0.5),
    "diff_0p5_pos" -> DiffDetector(0.5, "positive"),
    "diff_0p5_neg" -> DiffDetector(0.5, "negative"),
    "grad_1em4" -> GradientDetector(1e-4),
    "grad_1em4_pos" -> GradientDetector(1e-4, "positive"),
    "rollstd_w4_0p5" -> RollingStdDevDetector(4, 0.5),
    "rollstd_w5_0p5_right" -> RollingStdDevDetector(5, 0.5, center = false),
    "rollstd_w10_1" -> RollingStdDevDetector(10, 1.0),
    "const_w3_1em4" -> ConstantValueDetector(3, 1e-4),
    "const_w5_1em7" -> ConstantValueDetector(5),
    "cgrad_w3" -> ConstantGradientDetector(3),
    "cgrad_w5" -> ConstantGradientDetector(5),
    "hampel_w5_t3" -> HampelDetector(5, 3),
    "hampel_w3_t2" -> HampelDetector(3, 2.0),
    "hampel_w1_t0" -> HampelDetector(1, 0),
    "combined_const_range2" -> CombinedDetector(
      Seq(ConstantValueDetector(), RangeDetector(maxValue = 2.0))))

  /** Fitted configs: (train series, constructor). */
  def fitted: Map[String, (String, Detector)] = Map(
    "fit_range_on_range_normal" -> ("range_normal", RangeDetector()),
    "fit_range_q_on_quant_train" -> ("quant_train", RangeDetector(quantiles = (0.001, 0.999))),
    "fit_diff_on_range_normal" -> ("range_normal", DiffDetector()),
    "fit_diff_on_walk" -> ("walk", DiffDetector()),
    "fit_grad_on_jump_normal" -> ("jump_normal", GradientDetector()),
    "fit_grad_on_irregular" -> ("irregular", GradientDetector()),
    "fit_rollstd_w10_on_quant_train" -> ("quant_train", RollingStdDevDetector(10)),
    "fit_rollstd_w4_on_walk" -> ("walk", RollingStdDevDetector(4)))

  def allDetectors: Map[String, Detector] =
    unfitted ++ fitted.map { case (n, (trainKey, d)) =>
      n -> d.fit(seriesDf(golden(trainKey)))
    }

  for (sName <- seriesNames) {
    test(s"golden parity on $sName (all configs)") {
      val g = golden(sName)
      val df = seriesDf(g).cache()
      val failures = allDetectors.flatMap { case (cName, det) =>
        val got = maskOf(det.detect(df))
        val want = g.expected(cName)
        if (got != want)
          Some(s"$cName: got ${got.map(b => if (b) 1 else 0).mkString}" +
            s" want ${want.map(b => if (b) 1 else 0).mkString}")
        else None
      }
      df.unpersist()
      assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
    }
  }

  test("multi-series run isolates partitions (masks identical to per-series runs)") {
    val stacked = stackedDf(seriesNames.map(golden)).cache()
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val sample = Map(
      "hampel_w5_t3" -> HampelDetector(5, 3),
      "cgrad_w3" -> ConstantGradientDetector(3),
      "rollstd_w4_0p5" -> RollingStdDevDetector(4, 0.5),
      "diff_0p5" -> DiffDetector(0.5),
      "const_w3_1em4" -> ConstantValueDetector(3, 1e-4))
    for ((cName, det) <- sample) {
      val out = det.detect(stacked, spec)
      for (sName <- seriesNames) {
        val got = maskOf(out.filter(col("sid") === sName))
        assert(got == golden(sName).expected(cName), s"$cName on $sName via stacked run")
      }
    }
    stacked.unpersist()
  }

  test("row order of the input does not change masks") {
    val g = golden("walk")
    val shuffled = seriesDf(g).orderBy(rand(seed = 1))
    val det = HampelDetector(5, 3)
    assert(maskOf(det.detect(shuffled)) == g.expected("hampel_w5_t3"))
  }
}
