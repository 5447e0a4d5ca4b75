package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ts._

/** The native HampelStats aggregate must be indistinguishable from the
  * built-in collect_list formulation on every mask bit.
  */
class HampelStatsSpec extends SparkSpecBase {

  test("native impl == builtin impl on all golden series and configs") {
    val names = Seq("walk", "irregular", "quant_test", "range_normal")
    for (n <- names; (ws, thr) <- Seq((5, 3.0), (3, 2.0), (1, 0.0), (7, 1.5))) {
      val df = seriesDf(loadGolden(n))
      val native = maskOf(HampelDetector(ws, thr).detect(df))
      val builtin = maskOf(HampelDetector(ws, thr, impl = "builtin").detect(df))
      assert(native == builtin, s"$n ws=$ws thr=$thr")
    }
  }

  test("native impl == builtin impl on random multi-series data (property)") {
    val genValues = Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.choose(-10.0, 10.0).map(Some(_)),
        1 -> Gen.const(Option.empty[Double]))))
    val prop = Prop.forAll(genValues, Gen.choose(1, 5)) { (values, ws) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      val rows = values.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(
          java.sql.Timestamp.valueOf(f"2020-01-01 00:${i % 60}%02d:00"),
          v.map(Double.box).orNull)
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      maskOf(HampelDetector(ws, 2.0).detect(df)) ==
        maskOf(HampelDetector(ws, 2.0, impl = "builtin").detect(df))
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(7L), prop)
    assert(res.passed, res.status.toString)
  }

  test("buffer serialization round-trips") {
    val agg = HampelStats(ColumnBridgeTestAccess.expr(lit(1.0)))
    val buf = agg.createAggregationBuffer()
    Seq(3.5, -1.0, 7.25, 0.0).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSortedArray.toSeq == Seq(-1.0, 0.0, 3.5, 7.25))
  }
}

object ColumnBridgeTestAccess {
  def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
}
