package graft.ts

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5.2): random series with nulls
  * must satisfy the structural laws pandas gives the reference for free
  * and Spark has to earn — length preservation, non-null masks, order
  * independence, edge behavior, fit idempotence, and persistence
  * round-trips.
  */
class PropertySpec extends SparkSpecBase {

  val genValues: Gen[List[Option[Double]]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, Gen.frequency(
        4 -> Gen.choose(-10.0, 10.0).map(Some(_)),
        1 -> Gen.const(Option.empty[Double]),
        1 -> Gen.oneOf(Seq(Some(0.0), Some(5.0), Some(-5.0)))))
    }

  def df(values: Seq[Option[Double]]): DataFrame = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(Timestamp.valueOf(f"2020-01-${1 + i / 24}%02d ${i % 24}%02d:00:00"),
        v.map(Double.box).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  def detectors: Seq[Detector] = Seq(
    RangeDetector(-3, 3), DiffDetector(2.0), GradientDetector(3e-4),
    RollingStdDevDetector(4, 2.0), ConstantValueDetector(3, 0.5),
    ConstantGradientDetector(3), HampelDetector(3, 2.0),
    CombinedDetector(Seq(RangeDetector(-3, 3), HampelDetector(3, 2.0))))

  def check(name: String, prop: Prop, n: Int = 12): Unit = test(name) {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withInitialSeed(42L),
      prop)
    assert(res.passed, res.status.toString)
  }

  check("masks preserve length and are never null, for every detector",
    Prop.forAll(genValues) { values =>
      val d = df(values)
      detectors.forall { det =>
        val out = det.detect(d)
        out.count() == values.length &&
          out.filter(col("is_anomaly").isNull).count() == 0
      }
    })

  check("input row order never changes the mask",
    Prop.forAll(genValues) { values =>
      values.isEmpty || {
        val sorted = df(values)
        val shuffled = sorted.orderBy(rand(7))
        detectors.forall(det =>
          maskOf(det.detect(shuffled)) == maskOf(det.detect(sorted)))
      }
    }, n = 6)

  check("stacking series never changes per-series masks",
    Prop.forAll(genValues, genValues) { (va, vb) =>
      val spec = SeriesSpec(seriesId = Seq("sid"))
      val stacked = df(va).withColumn("sid", lit("a"))
        .unionByName(df(vb).withColumn("sid", lit("b")))
      detectors.forall { det =>
        val out = det.detect(stacked, spec)
        maskOf(out.filter(col("sid") === "a")) == maskOf(det.detect(df(va))) &&
          maskOf(out.filter(col("sid") === "b")) == maskOf(det.detect(df(vb)))
      }
    }, n = 6)

  // Note: the reference's dilation step re-flags the edge positions it
  // just forced false (verified against tsod directly), so a fully
  // constant series is flagged in its entirety.
  check("a constant series is flagged everywhere (ConstantValueDetector)",
    Prop.forAll(Gen.choose(3, 30), Gen.choose(-5.0, 5.0)) { (n, v) =>
      maskOf(ConstantValueDetector().detect(df(List.fill(n)(Some(v)))))
        .forall(_ == true)
    })

  check("fit-on-self with min/max quantiles flags nothing (RangeDetector)",
    Prop.forAll(genValues) { values =>
      val d = df(values)
      maskOf(RangeDetector().fit(d).detect(d)).forall(_ == false)
    })

  check("hourly cadence: GradientDetector(g) == DiffDetector(g*3600)",
    Prop.forAll(genValues, Gen.choose(0.1, 5.0)) { (values, thr) =>
      val d = df(values)
      maskOf(GradientDetector(thr / 3600.0).detect(d)) ==
        maskOf(DiffDetector(thr).detect(d))
    })

  check("Hampel never flags the first/last ws rows",
    Prop.forAll(genValues, Gen.choose(1, 4)) { (values, ws) =>
      val mask = maskOf(HampelDetector(ws, 0.5).detect(df(values)))
      val n = mask.length
      mask.zipWithIndex.forall { case (m, i) =>
        !(i < ws || i >= n - ws) || !m
      }
    })

  check("persistence round-trips arbitrary detector parameters",
    Prop.forAll(
      Gen.choose(-100.0, 0.0), Gen.choose(0.0, 100.0),
      Gen.choose(1, 20), Gen.choose(0.0, 10.0),
      Gen.oneOf("both", "positive", "negative")) { (lo, hi, w, t, dir) =>
      val d = CombinedDetector(Seq(
        RangeDetector(lo, hi), DiffDetector(t, dir), HampelDetector(w, t),
        RollingStdDevDetector(w, t, center = w % 2 == 0),
        GradientDetector(t, dir), ConstantValueDetector(w, t),
        ConstantGradientDetector(w)))
      DetectorIO.fromJsonString(DetectorIO.toJsonString(d)) == d
    }, n = 30)
}
