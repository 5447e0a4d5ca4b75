package graft.functions

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The native int8 dot kernel must agree with the double formulation
  * (exact for |codes| ≤ 127) in both codegen and interpreted eval.
  */
class DotProductBytesSpec extends SparkSpecBase {

  test("byte dot == double dot on codes, nulls propagate, lengths clamp") {
    import spark.implicits._
    // Seq[Byte] (not Array[Byte], which encodes as BINARY) → array<tinyint>
    val df = Seq(
      (1L, Seq[Byte](127, -127, 3, 0), Seq[Byte](1, 2, -3, 127)),
      (2L, Seq[Byte](5, 5), Seq[Byte](5, 5, 5)), // length clamp
      (3L, null.asInstanceOf[Seq[Byte]], Seq[Byte](1)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
        DotProductBytes(col("a"), col("b")).as("bl"),
        DotProductDouble(col("a").cast("array<double>"),
          col("b").cast("array<double>")).as("dd"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L)._1 == Some(127L * 1 - 127L * 2 - 9L))
    assert(out(1L)._1.map(_.asInstanceOf[Long].toDouble) == out(1L)._2)
    assert(out(2L)._1 == Some(50L))
    assert(out(3L) == ((None, None)))
    // property: random code arrays agree with the double path exactly
    val rnd = new scala.util.Random(42)
    val codes = Seq.fill(200)((
      rnd.nextLong(),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte)))
    val big = codes.toDF("id", "a", "b")
    val mism = big.select(
        (DotProductBytes(col("a"), col("b")).cast("double") =!=
          DotProductDouble(col("a").cast("array<double>"),
            col("b").cast("array<double>"))).as("ne"))
      .filter(col("ne")).count()
    assert(mism == 0)
  }
}
