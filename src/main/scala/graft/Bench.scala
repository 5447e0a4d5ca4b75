package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,"errors":{...}}
  *
  * Measurement notes:
  *  - The timed action is a checksum over EVERY output column:
  *    `count()` would let Catalyst prune unreferenced projections, timing
  *    the scan instead of the operator (projection-heavy queries measured
  *    5-10x too fast in round 1).
  *  - The checksum aggregate is `bit_xor`, NOT `sum`: xxhash64 values are
  *    uniform over int64, so summing more than a handful overflows Long
  *    and Spark 4's default ANSI mode aborts the final stage
  *    (ARITHMETIC_OVERFLOW) — which in round 2 silently voided 54/57
  *    query timings. bit_xor cannot overflow, is order-insensitive, and
  *    still forces materialization of all columns.
  *  - Failures are NEVER swallowed: a query that throws gets an entry in
  *    "errors" and the process exits non-zero, so a failed query can
  *    never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warm-up: JVM/codegen spin-up and parquet footer listing
    // otherwise land on whichever query happens to run first
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    var errors = Vector.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).head()
      } catch {
        case e: Throwable =>
          errors :+= (name -> s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200).replaceAll("[\"\\n\\r\\\\]", " ")}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errJson = errors.map { case (k, m) => s""""$k":"$m"""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errJson}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errors.size} queries errored: ${errors.map(_._1).mkString(", ")}")
      sys.exit(1)
    }
  }
}
