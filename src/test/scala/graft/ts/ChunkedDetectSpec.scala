package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ChunkedDetect must reproduce the unchunked masks BIT-IDENTICALLY for
  * every row-bounded detector, across chunk-boundary frames, positional
  * edge rules, thin head/tail chunks, and the thin-interior-chunk
  * fallback.
  */
class ChunkedDetectSpec extends SparkSpecBase {

  // the golden fixtures cover nulls, spikes, constant and linear
  // stretches, irregular cadence (gaps from 60 s to 2 h) — chunk those
  // at several widths so boundaries land everywhere
  lazy val golden: Map[String, GoldenSeries] =
    Seq("walk", "irregular", "const_abnormal", "quant_train")
      .map(n => n -> loadGolden(n)).toMap

  def dets: Map[String, Detector] = Map(
    "range" -> RangeDetector(0, 2),
    "diff" -> DiffDetector(0.5),
    "grad" -> GradientDetector(1e-4),
    "rollstd_w4" -> RollingStdDevDetector(4, 0.5),
    "rollstd_w5_right" -> RollingStdDevDetector(5, 0.5, center = false),
    "const_w3" -> ConstantValueDetector(3, 1e-4),
    "cgrad_w3" -> ConstantGradientDetector(3),
    "hampel_w5" -> HampelDetector(5, 3),
    "combined" -> CombinedDetector(Seq(
      ConstantValueDetector(), RangeDetector(maxValue = 2.0), HampelDetector(5, 3))))

  test("chunked masks are bit-identical to unchunked on every golden series") {
    val spec = SeriesSpec()
    for ((sName, g) <- golden; bucketHours <- Seq(3, 24, 500)) {
      val df = seriesDf(g).cache()
      for ((dName, det) <- dets) {
        val want = maskOf(det.detect(df, spec))
        val got = maskOf(ChunkedDetect.detect(det, df, spec, bucketHours * 3600L))
        assert(got == want,
          s"$dName on $sName (bucket ${bucketHours}h): chunked mask diverged")
      }
      df.unpersist()
    }
  }

  test("multi-series chunked run matches per-series unchunked masks") {
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val stacked = stackedDf(Seq(golden("walk"), golden("irregular"))).cache()
    for ((dName, det) <- Seq("hampel_w5", "cgrad_w3", "diff").map(n => n -> dets(n))) {
      val out = ChunkedDetect.detect(det, stacked, spec, 6 * 3600L)
      for (sName <- Seq("walk", "irregular")) {
        val got = maskOf(out.filter(col("sid") === sName))
        val want = maskOf(det.detect(stacked.filter(col("sid") === sName), spec))
        assert(got == want, s"$dName on $sName via chunked stacked run")
      }
    }
    stacked.unpersist()
  }

  test("thin interior chunks trigger the exact fallback (gap-heavy series)") {
    // 40 hourly rows, then a 10-day gap, then ONE row, another gap, 40
    // more: with a 6h bucket the lone row is a thin interior chunk for
    // hampel_w5 (m=5) — the series must fall back and still be exact
    import spark.implicits._
    val rows =
      (0 until 40).map(i => (java.sql.Timestamp.valueOf(f"2020-01-01 ${i / 4}%02d:${15 * (i % 4)}%02d:00"), math.sin(i) * 3)) ++
        Seq((java.sql.Timestamp.valueOf("2020-01-12 00:00:00"), 42.0)) ++
        (0 until 40).map(i => (java.sql.Timestamp.valueOf(f"2020-01-24 ${i / 4}%02d:${15 * (i % 4)}%02d:00"), math.cos(i) * 3))
    val df = rows.toDF("ts", "value")
    val spec = SeriesSpec()
    for ((dName, det) <- dets) {
      val want = maskOf(det.detect(df, spec))
      val got = maskOf(ChunkedDetect.detect(det, df, spec, 6 * 3600L))
      assert(got == want, s"$dName with thin interior chunk diverged")
    }
  }

  test("minRowsToChunk splits hot from cold; masks identical either way") {
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val stacked = stackedDf(Seq(golden("walk"), golden("quant_train"))).cache()
    for ((dName, det) <- Seq("hampel_w5", "diff").map(n => n -> dets(n))) {
      val want = Seq("walk", "quant_train").map(s =>
        s -> maskOf(det.detect(stacked.filter(col("sid") === s), spec))).toMap
      // threshold between the series sizes (walk 120, quant_train 1000):
      // quant_train is chunked, walk takes the plain window — one job
      val out = ChunkedDetect.detect(det, stacked, spec,
        bucketSeconds = 24 * 3600L, marginSeconds = 12 * 3600L,
        minRowsToChunk = 500L)
      for (s <- Seq("walk", "quant_train"))
        assert(maskOf(out.filter(col("sid") === s)) == want(s),
          s"$dName on $s via hot/cold split")
      // threshold above every series: pure pass-through to det.detect
      val none = ChunkedDetect.detect(det, stacked, spec,
        bucketSeconds = 24 * 3600L, minRowsToChunk = 1000000L)
      for (s <- Seq("walk", "quant_train"))
        assert(maskOf(none.filter(col("sid") === s)) == want(s))
    }
    stacked.unpersist()
  }

  test("unbounded-context detectors (EWMA) pass through unchunked") {
    assert(EwmaDetector(0.3, 3.0).contextRows == -1)
    val g = golden("walk")
    val df = seriesDf(g)
    val spec = SeriesSpec()
    val want = maskOf(EwmaDetector(0.3, 3.0).detect(df, spec))
    val got = maskOf(ChunkedDetect.detect(EwmaDetector(0.3, 3.0), df, spec, 3600L))
    assert(got == want)
  }

  test("chunked plan partitions windows by (series, chunk), not by series alone") {
    val stacked = stackedDf(Seq(golden("walk"), golden("quant_train")))
    // hourly series, 24h buckets, 12h margins: validation passes for
    // m=5, so the pure chunked plan (no fallback union) must be used
    val out = ChunkedDetect.detect(HampelDetector(5, 3), stacked,
      SeriesSpec(seriesId = Seq("sid")), 24 * 3600L, 12 * 3600L)
    val plan = out.queryExecution.executedPlan.toString
    // the detector's window must carry the chunk key — that's the whole
    // skew mitigation; a plan windowing on sid alone regressed to the
    // hot-series straggler
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition(sid")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("__chunk")),
      s"detector window lost the chunk key:\n${windowLines.mkString("\n")}")
  }
}
