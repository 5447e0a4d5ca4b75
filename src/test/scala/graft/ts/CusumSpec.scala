package graft.ts

/** CUSUM semantics pinned against hand-computed Page recursion values. */
class CusumSpec extends SparkSpecBase {

  private def series(vals: Seq[java.lang.Double]): GoldenSeries =
    GoldenSeries("cusum", vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(f"2020-01-01 ${i}%02d:00:00"), v, Map.empty[String, Boolean])
    }.toVector)

  test("accumulating drift trips the high side; settle-back resets (hand-computed)") {
    // target=10, slack=2 → hi=12, lo=8, threshold=5
    // x:    10   14   14   14    6    10
    // S+:    0    2    4    6    0     0   (6-12 floors at 0)
    // S-:    0    0    0    0    2     0
    val df = seriesDf(series(Seq(10.0, 14.0, 14.0, 14.0, 6.0, 10.0)))
    val mask = maskOf(CusumDetector(target = 10.0, slack = 2.0, threshold = 5.0)
      .detect(df))
    assert(mask == Vector(false, false, false, true, false, false))
  }

  test("sustained low drift trips the low side; nulls pass through unflagged") {
    // lo=8: x=5 contributes +3 per sample to S-
    val df = seriesDf(series(Seq(10.0, 5.0, null, 5.0, 5.0)))
    // S-: 0, 3, (null skips), 6, 9 → trips at the last sample (thr=7)
    val mask = maskOf(CusumDetector(target = 10.0, slack = 2.0, threshold = 7.0)
      .detect(df))
    assert(mask == Vector(false, false, false, false, true))
  }

  test("multi-series state resets per series; drift below slack never trips") {
    val a = series(Seq(14.0, 14.0, 14.0)).copy(name = "a")
    val b = series(Seq(14.0, 14.0, 14.0)).copy(name = "b")
    val stacked = stackedDf(Seq(a, b))
    // per series S+ reaches 6 (= 3 × 2) — below an 8 threshold; if state
    // leaked across the series boundary the combined 6-row run would hit 12
    val out = CusumDetector(target = 10.0, slack = 2.0, threshold = 8.0)
      .detect(stacked, SeriesSpec(seriesId = Seq("sid")))
    assert(out.filter(org.apache.spark.sql.functions.col("is_anomaly")).count() == 0)
    // slack swallows any drift smaller than it, at any length
    val loose = CusumDetector(target = 0.0, slack = 1e6, threshold = 1.0)
      .detect(stacked, SeriesSpec(seriesId = Seq("sid")))
    assert(loose.filter(org.apache.spark.sql.functions.col("is_anomaly")).count() == 0)
  }

  test("segmented-scan detectChunked matches the sequential scan") {
    import org.apache.spark.sql.functions.col
    val g = loadGolden("walk")
    val df = seriesDf(g)
    // walk around its own mean: pick params that accumulate and trip
    val det = CusumDetector(target = 0.0, slack = 0.5, threshold = 3.0)
    val want = maskOf(det.detect(df))
    assert(want.exists(identity), "params should trip at least once on the walk")
    for (bucketHours <- Seq(5, 24, 1000)) {
      val got = maskOf(det.detectChunked(df, SeriesSpec(), bucketHours * 3600L))
      assert(got == want, s"chunked CUSUM diverged at bucket ${bucketHours}h")
    }
    // multi-series: per-series state isolation survives chunking
    val stacked = stackedDf(Seq(loadGolden("range_normal"), loadGolden("walk")))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val outC = det.detectChunked(stacked, spec, 24 * 3600L)
    for (n <- Seq("range_normal", "walk")) {
      val single = maskOf(det.detect(stacked.filter(col("sid") === n), spec))
      assert(maskOf(outC.filter(col("sid") === n)) == single, n)
    }
  }

  test("dyadic-grid inputs: detectChunked == detect bitwise (driver-query contract)") {
    import org.apache.spark.sql.functions.col
    // det_cusum_chunked's guarantee: values that are multiples of 1/64
    // (with grid hi/lo constants) make every +/−/max exact, so the
    // max-plus transfer composes associatively — equality is structural,
    // not luck. Adversarial fixture: values hugging the threshold, ~5%
    // nulls, three series, and small buckets to force many chunk entries.
    val rnd = new scala.util.Random(7)
    def gridSeries(name: String, n: Int, drift: Double): GoldenSeries =
      GoldenSeries(name, (0 until n).map { i =>
        val v: java.lang.Double =
          if (rnd.nextInt(20) == 0) null
          else math.floor((rnd.nextDouble() * 4 - 2 + drift) * 64) / 64
        (new java.sql.Timestamp(1577836800000L + i * 3600000L), v,
          Map.empty[String, Boolean])
      }.toVector)
    // hi = 0.375 (24/64), lo = 0.125 (8/64) — grid constants
    val det = CusumDetector(target = 0.25, slack = 0.125, threshold = 2.0)
    val stacked = stackedDf(Seq(
      gridSeries("a", 500, 0.3), gridSeries("b", 500, 0.0),
      gridSeries("c", 500, -0.3)))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    for (bucketHours <- Seq(3, 17, 100)) {
      val outC = det.detectChunked(stacked, spec, bucketHours * 3600L)
      var tripped = 0
      for (n <- Seq("a", "b", "c")) {
        val seq = maskOf(det.detect(stacked.filter(col("sid") === n), spec))
        if (seq.exists(identity)) tripped += 1
        assert(maskOf(outC.filter(col("sid") === n)) == seq,
          s"grid chunked diverged: series $n bucket ${bucketHours}h")
      }
      assert(tripped > 0, "fixture should trip at least one series")
    }
  }

  test("JSON persistence round-trip") {
    val d = CusumDetector(target = 90.0, slack = 50.0, threshold = 200.0)
    val back = DetectorIO.fromJsonString(DetectorIO.toJsonString(d))
    assert(back == d)
  }
}
