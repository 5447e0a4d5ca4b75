package graft.ts

import graft.util.Json

/** Fitted-parameter parity vs the reference's fit() outputs
  * (golden/fitted_params.json, produced by scripts/gen_golden.py).
  */
class FitParitySpec extends SparkSpecBase {

  lazy val want: Json.JValue = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/fitted_params.json"), "UTF-8")
    try Json.parse(src.mkString) finally src.close()
  }

  def train(name: String) = seriesDf(loadGolden(name))

  def close(got: Double, want: Double, tol: Double = 1e-9): Boolean =
    got == want || math.abs(got - want) <= tol * math.max(1.0, math.abs(want))

  test("RangeDetector.fit min/max quantiles") {
    val d = RangeDetector().fit(train("range_normal"))
    assert(d.minValue == want("fit_range_on_range_normal")("_min").num)
    assert(d.maxValue == want("fit_range_on_range_normal")("_max").num)

    val q = RangeDetector(quantiles = (0.001, 0.999)).fit(train("quant_train"))
    assert(close(q.minValue, want("fit_range_q_on_quant_train")("_min").num))
    assert(close(q.maxValue, want("fit_range_q_on_quant_train")("_max").num))
  }

  test("RangeDetector.fitApprox tracks the exact quantile fit") {
    val t = train("quant_train")
    val exact = RangeDetector(quantiles = (0.05, 0.95)).fit(t)
    val approx = RangeDetector(quantiles = (0.05, 0.95)).fitApprox(t)
    assert(math.abs(exact.minValue - approx.minValue) < 0.1)
    assert(math.abs(exact.maxValue - approx.maxValue) < 0.1)
  }

  test("DiffDetector.fit learns SIGNED max diff") {
    val d = DiffDetector().fit(train("range_normal"))
    assert(d.maxDiff == want("fit_diff_on_range_normal")("_max_diff").num)
    val w = DiffDetector().fit(train("walk"))
    assert(w.maxDiff == want("fit_diff_on_walk")("_max_diff").num)
  }

  test("GradientDetector.fit learns max |gradient| (per second)") {
    val d = GradientDetector().fit(train("jump_normal"))
    assert(close(d.maxGradient, want("fit_grad_on_jump_normal")("_max_gradient").num))
    val i = GradientDetector().fit(train("irregular"))
    assert(close(i.maxGradient, want("fit_grad_on_irregular")("_max_gradient").num))
  }

  test("RollingStdDevDetector.fit is right-aligned even when centered") {
    val d = RollingStdDevDetector(10).fit(train("quant_train"))
    assert(close(d.maxStd, want("fit_rollstd_w10_on_quant_train")("_max_std").num, 1e-8))
    val w = RollingStdDevDetector(4).fit(train("walk"))
    assert(close(w.maxStd, want("fit_rollstd_w4_on_walk")("_max_std").num, 1e-8))
  }

  test("CombinedDetector.fit fits children on the same data (reference test_combined_fit)") {
    val cd = CombinedDetector(Seq(ConstantValueDetector(), RangeDetector()))
      .fit(train("range_normal"))
    val got = maskOf(cd.detect(seriesDf(loadGolden("range_abnormal"))))
    assert(got == Vector(true, false, false, false, false, false, true, true))
  }
}
