package graft.ts

import org.apache.spark.sql.functions._

/** Holt (level+trend) semantics pinned by hand-computed recursions and
  * the motivating contrast: a steady ramp that lag-flags under plain
  * EWMA is quiet under Holt.
  */
class HoltSpec extends SparkSpecBase {

  test("hand-computed recursion: level+trend forecast, seed, null skip") {
    // α=0.5, β=0.5 on [1, 3, 5, null, 7]:
    //   seed: s=1, b=0
    //   x=3: forecast 1 (dev 2); s'=.5·3+.5·1=2, b'=.5·(2−1)+.5·0=0.5
    //   x=5: forecast 2.5 (dev 2.5); s'=.5·5+.5·2.5=3.75, b'=.5·1.75+.25=1.125
    //   null: passes, state frozen
    //   x=7: forecast 4.875 (dev 2.125)
    val g = GoldenSeries("holt", Vector(
      (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), Double.box(1.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 01:00:00"), Double.box(3.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 02:00:00"), Double.box(5.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 03:00:00"), null, Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 04:00:00"), Double.box(7.0), Map())))
    val df = seriesDf(g)
    val m1 = maskOf(HoltDetector(0.5, 0.5, 2.2).detect(df))
    assert(m1 == Vector(false, false, true, false, false))
    val m2 = maskOf(HoltDetector(0.5, 0.5, 2.05).detect(df))
    assert(m2 == Vector(false, false, true, false, true))
  }

  test("steady ramp: EWMA lag-flags, Holt's trend term follows it") {
    // x_t = 10·t — the EWMA forecast lags by a growing margin while
    // Holt converges onto the ramp
    val ramp = GoldenSeries("ramp", (0 until 40).map(i =>
      (java.sql.Timestamp.valueOf(f"2020-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        Double.box(10.0 * i), Map[String, Boolean]())).toVector)
    val df = seriesDf(ramp)
    val ewmaFlags = maskOf(EwmaDetector(alpha = 0.3, threshold = 15.0).detect(df))
      .count(identity)
    val holtFlags = maskOf(HoltDetector(alpha = 0.3, beta = 0.3,
      threshold = 15.0).detect(df)).count(identity)
    assert(ewmaFlags > 25, s"EWMA should lag-flag most of the ramp: $ewmaFlags")
    assert(holtFlags < 10, s"Holt should converge onto the ramp: $holtFlags")
    // and a genuine departure from the ramp still flags under Holt
    val broken = GoldenSeries("ramp2", ramp.rows.updated(30,
      (ramp.rows(30)._1, Double.box(10.0 * 30 + 200.0), Map[String, Boolean]())))
    val m = maskOf(HoltDetector(0.3, 0.3, 100.0).detect(seriesDf(broken)))
    assert(m(30), "the 200-unit departure from the ramp must flag")
  }

  test("multi-series state resets; persistence round-trip") {
    val stacked = stackedDf(Seq(loadGolden("range_normal"), loadGolden("walk")))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    for (n <- Seq("range_normal", "walk")) {
      val single = maskOf(HoltDetector(0.4, 0.2, 5.0)
        .detect(seriesDf(loadGolden(n))))
      val joint = maskOf(HoltDetector(0.4, 0.2, 5.0).detect(stacked, spec)
        .filter(col("sid") === n))
      assert(single == joint, n)
    }
    val d = HoltDetector(0.25, 0.15, 4.5)
    assert(DetectorIO.fromJsonString(DetectorIO.toJsonString(d)) == d)
  }

  test("segmented-scan detectChunked matches the sequential scan") {
    val g = loadGolden("walk")
    val df = seriesDf(g)
    val det = HoltDetector(0.3, 0.2, 5.0)
    val want = maskOf(det.detect(df))
    for (bucketHours <- Seq(5, 24, 1000)) {
      val got = maskOf(det.detectChunked(df, SeriesSpec(), bucketHours * 3600L))
      assert(got == want, s"chunked Holt diverged at bucket ${bucketHours}h")
    }
    // multi-series isolation survives chunking
    val stacked = stackedDf(Seq(loadGolden("range_normal"), loadGolden("walk")))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val outC = det.detectChunked(stacked, spec, 24 * 3600L)
    for (n <- Seq("range_normal", "walk")) {
      val single = maskOf(det.detect(stacked.filter(col("sid") === n), spec))
      assert(maskOf(outC.filter(col("sid") === n)) == single, n)
    }
    // a 50k-row trending series crossing ~20 chunk boundaries with
    // nulls and spikes: flag sets must agree (entry states may drift by
    // ulps — the documented contract — these thresholds sit far from
    // any |x − forecast| value)
    import spark.implicits._
    val big = (0 until 50000).map { i =>
      val v: java.lang.Double =
        if (i % 997 == 0) null
        else if (i % 500 == 13) 2.0 * i + 300.0
        else 2.0 * i + (i % 7) * 0.5
      (new java.sql.Timestamp(1577836800000L + i * 60000L), v)
    }.toDF("ts", "value")
    val wantBig = maskOf(det.copy(threshold = 150.0).detect(big))
    val gotBig = maskOf(det.copy(threshold = 150.0)
      .detectChunked(big, SeriesSpec(), 40 * 3600L))
    assert(wantBig.count(identity) == 100, s"${wantBig.count(identity)}")
    assert(gotBig == wantBig)
  }
}
