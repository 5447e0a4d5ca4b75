package graft.relational

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** AsOf.join semantics (merge_asof parity cases) and plan shape. */
class AsOfSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) / quotes (right) — the canonical as-of example
  private lazy val trades = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:05"), 100L),
      ("A", ts("2024-01-01 10:00:10"), 101L),
      ("A", ts("2024-01-01 10:00:00"), 102L), // exact-tie with a quote
      ("B", ts("2024-01-01 09:00:00"), 103L), // before any B quote
      ("C", ts("2024-01-01 10:00:00"), 104L)) // key with no quotes at all
      .toDF("sym", "ts", "trade_id")
  }
  private lazy val quotes = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 10.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 11.0), // same-ts dup: max id wins
      ("A", ts("2024-01-01 10:00:07"), 3L, 12.0),
      ("B", ts("2024-01-01 12:00:00"), 4L, 20.0))
      .toDF("sym", "ts", "quote_id", "px")
  }

  test("backward: latest quote at-or-before each trade, ties to max id") {
    val out = AsOf.join(trades, quotes, keys = Seq("sym"), tsCol = "ts",
        rightId = "quote_id", rightVals = Seq("px"))
      .select("trade_id", "quote_id_r", "px_r")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2))))).toMap
    assert(out(100L) == ((Some(2L), Some(11.0)))) // 10:00:05 → 10:00:00, dup→id 2
    assert(out(101L) == ((Some(3L), Some(12.0)))) // 10:00:10 → 10:00:07
    assert(out(102L) == ((Some(2L), Some(11.0)))) // exact tie is inclusive
    assert(out(103L) == ((None, None)))           // no quote before 09:00
    assert(out(104L) == ((None, None)))           // key never quoted
  }

  test("forward: earliest quote at-or-after, ties to min id") {
    val out = AsOf.join(trades, quotes, keys = Seq("sym"), tsCol = "ts",
        rightId = "quote_id", rightVals = Seq("px"), direction = "forward")
      .select("trade_id", "quote_id_r")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == Some(3L)) // 10:00:05 → 10:00:07
    assert(out(101L) == None)     // nothing after 10:00:10
    assert(out(102L) == Some(1L)) // exact tie inclusive, min id
    assert(out(103L) == Some(4L)) // B's later quote
  }

  test("tolerance nulls matches farther than the interval") {
    val out = AsOf.join(trades, quotes, keys = Seq("sym"), tsCol = "ts",
        rightId = "quote_id", rightVals = Seq("px"),
        tolerance = Some("3 seconds"))
      .select("trade_id", "quote_id_r")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == None)     // 5s-old quote > 3s tolerance
    assert(out(101L) == Some(3L)) // 3s-old quote exactly at tolerance
    assert(out(102L) == Some(2L)) // same-instant match always survives
  }

  test("left rows and columns pass through untouched") {
    val out = AsOf.join(trades, quotes, keys = Seq("sym"), tsCol = "ts",
      rightId = "quote_id", rightVals = Seq("px"))
    assert(out.columns.toSeq ==
      Seq("sym", "ts", "trade_id", "ts_r", "quote_id_r", "px_r"))
    assert(out.count() == trades.count())
  }

  test("plan: one Exchange, one Sort, no join node") {
    val out = AsOf.join(trades, quotes, keys = Seq("sym"), tsCol = "ts",
      rightId = "quote_id", rightVals = Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    val sorts = plan.linesIterator.count(_.contains("Sort"))
    assert(exchanges == 1, s"as-of join must shuffle exactly once:\n$plan")
    assert(sorts == 1, s"as-of join must sort exactly once:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join node:\n$plan")
  }
}
