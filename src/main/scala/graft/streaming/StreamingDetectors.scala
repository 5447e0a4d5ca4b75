package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ts.{RangeDetector, SeriesSpec}

/** Structured Streaming variants of the detectors whose semantics permit
  * online evaluation (SURVEY.md §2.10; the reference is batch-only but
  * names realtime detection as the goal, README.md:42):
  *
  *  - RangeDetector is stateless — the batch expression applies to a
  *    streaming DataFrame unchanged.
  *  - Diff/Gradient need exactly the previous sample: keyed
  *    `flatMapGroupsWithState` holds one (ts, value) per series — O(1)
  *    state per key, append-mode output.
  *
  * Centered-window detectors (rolling-std center=true, constant-*,
  * Hampel) need future rows; they would emit with a bounded delay via a
  * ring buffer in the same state pattern — deferred.
  *
  * Contract: rows are processed in event-time order WITHIN each
  * micro-batch (sorted here) and batches must arrive in order per series
  * (no late data) — one (ts,value) of state cannot repair reordering.
  * Fitting stays a batch concern: fit offline, pass the fitted detector
  * (a literal threshold) into the stream.
  */
object StreamingDetectors {

  final case class Point(series_id: String, ts: Timestamp, value: java.lang.Double)
  final case class FlaggedPoint(
      series_id: String, ts: Timestamp, value: java.lang.Double, is_anomaly: Boolean)
  final case class LastPoint(tsMicros: Long, value: java.lang.Double)

  /** Stateless: same Catalyst expression as the batch detector. */
  def rangeStream(stream: DataFrame, detector: RangeDetector,
      spec: SeriesSpec = SeriesSpec()): DataFrame =
    detector.detect(stream, spec)

  /** `|Δvalue| > maxDiff` against the previous sample of the series.
    * First sample of a series (or after a null) is never an anomaly —
    * matches the batch DiffDetector's null-diff semantics.
    */
  def diffStream(points: Dataset[Point], maxDiff: Double,
      direction: String = "both"): Dataset[FlaggedPoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], state: GroupState[LastPoint]) =>
          evalWithPrev(key, rows, state) { (prev, p) =>
            flagged(direction, maxDiff) {
              for (pv <- Option(prev.value); v <- Option(p.value))
                yield v - pv.doubleValue()
            }
          }
      }
  }

  /** Per-second gradient against the previous sample of the series. */
  def gradientStream(points: Dataset[Point], maxGradient: Double,
      direction: String = "both"): Dataset[FlaggedPoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], state: GroupState[LastPoint]) =>
          evalWithPrev(key, rows, state) { (prev, p) =>
            flagged(direction, maxGradient) {
              for (pv <- Option(prev.value); v <- Option(p.value))
                yield {
                  val dtSec = (micros(p.ts) - prev.tsMicros) / 1e6
                  (v - pv.doubleValue()) / dtSec
                }
            }
          }
      }
  }

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Shared state walk: sort the micro-batch by event time, thread the
    * last (ts, value) through, persist the newest as the series state.
    */
  private def evalWithPrev(key: String, rows: Iterator[Point],
      state: GroupState[LastPoint])(
      flag: (LastPoint, Point) => Boolean): Iterator[FlaggedPoint] = {
    val sorted = rows.toVector.sortBy(p => micros(p.ts))
    var prev = state.getOption.orNull
    val out = sorted.map { p =>
      val anomaly = prev != null && flag(prev, p)
      prev = LastPoint(micros(p.ts), p.value)
      FlaggedPoint(key, p.ts, p.value, anomaly)
    }
    if (prev != null) state.update(prev)
    out.iterator
  }

  private def flagged(direction: String, threshold: Double)(
      delta: Option[Double]): Boolean = delta match {
    case None => false
    case Some(d) => direction match {
      case "positive" => d > threshold
      case "negative" => d < -threshold
      case _ => math.abs(d) > threshold
    }
  }
}
