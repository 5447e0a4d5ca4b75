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

  /** Input for the bounded-lookahead detectors: a normal sample, or an
    * end-of-series marker (`eos = true`, value ignored) that flushes the
    * pending tail rows — flushed rows get `false` flags, exactly the
    * batch edge semantics (incomplete frames / tail masking).
    */
  final case class StreamEvent(
      series_id: String, ts: Timestamp, value: java.lang.Double, eos: Boolean)

  final case class WindowState(
      rows: Seq[(Long, Option[Double])], pendingFrom: Int, emitted: Long)

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

  /** Centered rolling-stddev detector on a stream: emits row t once
    * `lookahead` future rows exist (or on eos), computing the same
    * guarded sample-stddev flag as the batch
    * [[graft.ts.RollingStdDevDetector]] — verified mask-identical in
    * StreamingSpec.
    */
  def rollingStdStream(events: Dataset[StreamEvent], windowSize: Int,
      maxStd: Double, center: Boolean = true): Dataset[FlaggedPoint] = {
    val (back, ahead) =
      if (center) (windowSize / 2, (windowSize - 1) / 2)
      else (windowSize - 1, 0)
    slidingWindowStream(events, back, ahead, gate = ahead) {
      (win, centerIdx, rn) =>
        val vals = win.flatMap(_._2)
        rn != 1 && vals.length == windowSize && {
          val mean = vals.sum / vals.length
          val variance = vals.map(v => (v - mean) * (v - mean)).sum / (vals.length - 1)
          math.sqrt(variance) > maxStd
        }
    }
  }

  /** Hampel detector on a stream. The batch tail rule (`rn ≤ cnt - ws`)
    * needs to know whether ws rows FOLLOW t, so emission gates on ws
    * future rows even though the frame only spans ws-1 ahead; eos
    * flushes the tail as false — again exactly the batch masks.
    */
  def hampelStream(events: Dataset[StreamEvent], windowSize: Int,
      threshold: Double,
      k: Double = graft.ts.TsOps.GaussianScaleFactor): Dataset[FlaggedPoint] = {
    val ws = windowSize
    slidingWindowStream(events, back = ws, ahead = ws - 1, gate = ws) {
      (win, centerIdx, rn) =>
        rn > ws && {
          val vals = win.flatMap(_._2) // frame [t-ws, t+ws-1] includes row t
          val x = win(centerIdx)._2
          x.isDefined && vals.nonEmpty && {
            val sorted = vals.sorted.toArray
            val med = graft.functions.HampelStats.medianOfSorted(sorted)
            val dev = sorted.map(v => math.abs(v - med)).sorted
            val mad = k * graft.functions.HampelStats.medianOfSorted(dev)
            math.abs(x.get - med) > threshold * mad
          }
        }
    }
  }

  /** Shared bounded-lookahead machinery: per-series state keeps `back`
    * context rows plus the pending suffix; a pending row emits once
    * `gate` rows exist after it (or unconditionally false on eos). The
    * flag callback sees the window `[idx-back, idx+ahead]` (clipped at
    * the head), the row's index within it, and its 1-based position rn.
    */
  private def slidingWindowStream(events: Dataset[StreamEvent],
      back: Int, ahead: Int, gate: Int)(
      flag: (IndexedSeq[(Long, Option[Double])], Int, Long) => Boolean)
      : Dataset[FlaggedPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[StreamEvent], state: GroupState[WindowState]) =>
          val evs = batch.toVector.sortBy(e => (micros(e.ts), !e.eos))
          val st = state.getOption.getOrElse(WindowState(Vector.empty, 0, 0L))
          var rows = st.rows.toVector
          var pendingFrom = st.pendingFrom
          var emitted = st.emitted
          val out = Vector.newBuilder[FlaggedPoint]
          var flushed = false

          def emitUpTo(isEos: Boolean): Unit = {
            while (pendingFrom < rows.length &&
              (isEos || rows.length - 1 - pendingFrom >= gate)) {
              val idx = pendingFrom
              val lo = math.max(0, idx - back)
              val win = rows.slice(lo, math.min(rows.length, idx + ahead + 1))
              val rn = emitted + 1
              val isAnomaly = !isEos && flag(win, idx - lo, rn)
              val (tsm, v) = rows(idx)
              out += FlaggedPoint(key, new Timestamp(tsm / 1000L),
                v.map(Double.box).orNull, isAnomaly)
              emitted += 1
              pendingFrom += 1
            }
            // trim context no longer needed
            val keepFrom = math.max(0, pendingFrom - back)
            if (keepFrom > 0) {
              rows = rows.drop(keepFrom)
              pendingFrom -= keepFrom
            }
          }

          evs.foreach { e =>
            if (e.eos) { emitUpTo(isEos = true); flushed = true }
            else {
              rows = rows :+ (micros(e.ts) -> Option(e.value).map(_.doubleValue()))
              emitUpTo(isEos = false)
            }
          }
          if (flushed && pendingFrom >= rows.length) state.remove()
          else state.update(WindowState(rows, pendingFrom, emitted))
          out.result().iterator
      }
  }

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  // ---- streaming sessionization ---------------------------------------

  final case class SessionEvent(series_id: String, ts: Timestamp, eos: Boolean)
  final case class Session(
      series_id: String, session_no: Long, n_events: Long, duration_sec: Double)
  final case class SessionState(
      startMicros: Long, lastMicros: Long, n: Long, emitted: Long)

  /** Gap-based sessionization on a stream (the streaming twin of the
    * batch `q21_sessionize` query): a session closes when the gap to the
    * next event exceeds `gapSeconds` (emitting it downstream) or when an
    * eos marker flushes the open session. Events must arrive in order
    * per series across batches (sorted within each batch here).
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapSeconds: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L
    events.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val evs = batch.toVector.sortBy(e => (micros(e.ts), e.eos))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Session]
          def close(): Unit = if (st != null) {
            out += Session(key, st.emitted, st.n,
              (st.lastMicros - st.startMicros) / 1e6)
            st = SessionState(0, 0, 0, st.emitted + 1)
          }
          evs.foreach { e =>
            if (e.eos) { close(); st = null }
            else {
              val m = micros(e.ts)
              if (st == null || st.n == 0)
                st = SessionState(m, m,  1,
                  if (st == null) 0L else st.emitted)
              else if (m - st.lastMicros > gapMicros) {
                close()
                st = st.copy(startMicros = m, lastMicros = m, n = 1)
              } else st = st.copy(lastMicros = m, n = st.n + 1)
            }
          }
          if (st == null) state.remove() else state.update(st)
          out.result().iterator
      }
  }

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
