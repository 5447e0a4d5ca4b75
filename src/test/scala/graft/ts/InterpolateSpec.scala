package graft.ts

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Interpolate.linear semantics: interior fill, time-weighting, edge
  * and outage behavior, and the shared-window plan shape.
  */
class InterpolateSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val spec = SeriesSpec(orderBy = Seq("ts"), seriesId = Seq("sid"))

  private lazy val frame = {
    import spark.implicits._
    Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(10.0)),
      ("a", ts("2024-01-01 00:01:00"), None),          // interior, 1/3 of gap
      ("a", ts("2024-01-01 00:03:00"), Some(16.0)),
      ("a", ts("2024-01-01 00:04:00"), None),          // trailing → stays null
      ("b", ts("2024-01-01 00:00:00"), None),          // leading → stays null
      ("b", ts("2024-01-01 00:01:00"), Some(5.0)),
      ("b", ts("2024-01-01 00:02:00"), None),          // bracketed by 2h gap
      ("b", ts("2024-01-01 02:01:00"), Some(7.0)))
      .toDF("sid", "ts", "value")
  }

  test("interior nulls fill linearly in time; edges stay null") {
    val out = Interpolate.linear(frame, spec)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        ((Option(r.get(2)), r.getBoolean(3)))).toMap
    // 1 minute into a 3-minute 10→16 ramp = 12.0
    assert(out(("a", "2024-01-01 00:01:00.0")) == ((Some(12.0), true)))
    assert(out(("a", "2024-01-01 00:04:00.0")) == ((None, false)))
    assert(out(("b", "2024-01-01 00:00:00.0")) == ((None, false)))
    // non-null rows untouched, flag false
    assert(out(("a", "2024-01-01 00:00:00.0")) == ((Some(10.0), false)))
    // no maxGap → even the 2h bracket fills (1 min into 120 min of 5→7)
    val v = out(("b", "2024-01-01 00:02:00.0"))._1.get.asInstanceOf[Double]
    assert(math.abs(v - (5.0 + 2.0 * 1.0 / 120.0)) < 1e-12)
  }

  test("maxGap turns wide brackets into preserved outages") {
    val out = Interpolate.linear(frame, spec, maxGapSeconds = Some(600.0))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        Option(r.get(2))).toMap
    assert(out(("a", "2024-01-01 00:01:00.0")) == Some(12.0)) // 3 min ≤ 10 min
    assert(out(("b", "2024-01-01 00:02:00.0")) == None)       // 2 h > 10 min
  }

  test("interpolation plan: one Exchange, two sorted sweeps, no shrinking frame") {
    val plan = Interpolate.linear(frame, spec)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan)
    // both window passes must be growing (unboundedpreceding$) frames —
    // a (1, unboundedfollowing$) frame is re-scanned per row, O(rows²)
    // per series (the 100M-row smoke measured 0.67M rows/s before)
    assert(!plan.toLowerCase.contains("unboundedfollowing"), plan)
  }
}
