package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Time a single registered query, splitting plan-construction time
  * (which for the index/statistics-building queries includes eager
  * driver-side work) from execution of the bench checksum action.
  *
  * Usage: runMain graft.BenchOne <query> [sfDir] [repeats]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query>"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    for (i <- 1 to repeats) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).head()
      val t2 = System.nanoTime()
      println(f"[bench-one] $name run$i construct=${(t1 - t0) / 1e9}%.2fs " +
        f"execute=${(t2 - t1) / 1e9}%.2fs total=${(t2 - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
