package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JVM/codegen spin-up and parquet footer listing
    // otherwise land on whichever query happens to run first
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // checksum over EVERY output column: count() would let Catalyst
      // prune unreferenced projections, timing the scan instead of the
      // operator (projection-heavy queries measured 5-10× too fast)
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(sum("__h")).head()
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
