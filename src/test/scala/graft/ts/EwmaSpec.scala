package graft.ts

import org.apache.spark.sql.functions._

/** EWMA semantics pinned against hand-computed pandas
  * `ewm(alpha, adjust=False)` recursion values.
  */
class EwmaSpec extends SparkSpecBase {

  test("flags deviations from the running forecast (hand-computed recursion)") {
    // alpha=0.5: ewma after [1, 1, 1] is 1.0; x=9 deviates by 8
    val g = GoldenSeries("ewma", Vector(
      (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), Double.box(1.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 01:00:00"), Double.box(1.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 02:00:00"), Double.box(1.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 03:00:00"), Double.box(9.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 04:00:00"), null, Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 05:00:00"), Double.box(5.0), Map()),
      (java.sql.Timestamp.valueOf("2020-01-01 06:00:00"), Double.box(5.0), Map())))
    val df = seriesDf(g)
    // ewma trace: 1, 1, 1, ->5 (after x=9), (null skips), ->5, 5
    // deviations from PRIOR ewma: -, 0, 0, 8, -, 0 (5 vs 5.0), 0
    val mask = maskOf(EwmaDetector(alpha = 0.5, threshold = 3.0).detect(df))
    assert(mask == Vector(false, false, false, true, false, false, false))
    // tighter threshold also catches the settle-back sample? 5 vs ewma 5.0 = 0 — no
    val mask2 = maskOf(EwmaDetector(alpha = 0.5, threshold = 0.5).detect(df))
    assert(mask2 == Vector(false, false, false, true, false, false, false))
  }

  test("constant series never flags; multi-series state resets per series") {
    val stacked = stackedDf(Seq(loadGolden("range_normal"), loadGolden("walk")))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val out = EwmaDetector(0.3, 1e9).detect(stacked, spec)
    assert(out.filter(col("is_anomaly")).count() == 0)
    // per-series isolation: first non-null sample of EACH series seeds fresh
    val tight = EwmaDetector(0.3, 0.0).detect(stacked, spec)
    val firstFlagged = tight.filter(col("is_anomaly")).count()
    assert(firstFlagged > 0) // every deviation flags with threshold 0
    // and a per-series run gives the same masks as the stacked run
    for (n <- Seq("range_normal", "walk")) {
      val single = maskOf(EwmaDetector(0.3, 5.0).detect(seriesDf(loadGolden(n))))
      val joint = maskOf(EwmaDetector(0.3, 5.0).detect(stacked, spec)
        .filter(col("sid") === n))
      assert(single == joint, n)
    }
  }

  test("persistence round-trip") {
    val d = EwmaDetector(0.25, 4.5)
    assert(DetectorIO.fromJsonString(DetectorIO.toJsonString(d)) == d)
  }

  test("segmented-scan detectChunked matches the sequential scan") {
    // single unnamed series (the repartition(1) case detectChunked
    // exists to kill): golden walk fixture, several chunk widths so
    // boundaries land on nulls, spikes and quiet stretches
    val g = loadGolden("walk")
    val df = seriesDf(g)
    val det = EwmaDetector(0.3, 5.0)
    val want = maskOf(det.detect(df))
    for (bucketHours <- Seq(5, 24, 1000)) {
      val got = maskOf(det.detectChunked(df, SeriesSpec(), bucketHours * 3600L))
      assert(got == want, s"chunked EWMA diverged at bucket ${bucketHours}h")
    }
    // multi-series: per-series state isolation survives chunking
    val stacked = stackedDf(Seq(loadGolden("range_normal"), loadGolden("walk")))
    val spec = SeriesSpec(seriesId = Seq("sid"))
    val outC = det.detectChunked(stacked, spec, 24 * 3600L)
    for (n <- Seq("range_normal", "walk")) {
      val single = maskOf(det.detect(stacked.filter(col("sid") === n), spec))
      assert(maskOf(outC.filter(col("sid") === n)) == single, n)
    }
    // a 50k-row series crossing ~20 chunk boundaries with nulls: flag
    // SETS must agree (entry states may drift by ulps — the documented
    // contract — but these thresholds sit far from any |x-ewma| value)
    import spark.implicits._
    val big = (0 until 50000).map { i =>
      val v: java.lang.Double =
        if (i % 997 == 0) null
        else if (i % 500 == 13) 60.0 + i % 7
        else math.sin(i / 30.0) * 10
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1500000000L + i * 60L)), v)
    }.toDF("ts", "value")
    val seqFlags = det.detect(big).filter(col("is_anomaly"))
      .select("ts").collect().map(_.getTimestamp(0)).toSet
    val chFlags = det.detectChunked(big, SeriesSpec(), 50 * 3600L)
      .filter(col("is_anomaly")).select("ts").collect().map(_.getTimestamp(0)).toSet
    assert(seqFlags.nonEmpty)
    assert(chFlags == seqFlags,
      s"diff=${(chFlags -- seqFlags) ++ (seqFlags -- chFlags)}")
  }
}
