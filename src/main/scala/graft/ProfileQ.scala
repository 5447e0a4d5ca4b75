package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Per-query cost breakdown for the optimization rounds: separates the
  * driver-side costs (DataFrame construction, analysis+optimization+
  * physical planning) from execution, per warm iteration — the Bench
  * number is their sum, and at sf0.1 the split tells you whether the
  * fix is "simplify the plan" or "move fewer bytes".
  *
  * Usage: sbt "runMain graft.ProfileQ <queryName> [<queryName> ...]"
  * (default: a spread of the slowest bench queries). Env contract
  * matches Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PLAN_STR", "2147483632"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(js.jobId, System.nanoTime())
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val d = (System.nanoTime() - t0.getOrDefault(je.jobId, 0L)) / 1e6
            println(f"  JOB ${je.jobId}%4d ${d}%8.1f ms")
          }
        })
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // build-only sampling mode: loop plan construction forever so a
    // thread-dump sampler can attribute driver-side build cost
    if (sys.env.get("SPARK_GRAFT_PROFILE_MODE").contains("build")) {
      val fn = SparkEntry.queries(names.head)
      while (true) { fn(spark, sfDir); graft.pipeline.CacheLedger.drain() }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // one untimed cold pass absorbs codegen/JIT/index builds
      locally {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).head()
      }
      val rows = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val timed = df.select(
          xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h")))
        timed.queryExecution.executedPlan // force analysis+opt+planning
        val t2 = System.nanoTime()
        timed.head()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      val (b, p, e) = (rows.map(_._1).min, rows.map(_._2).min,
        rows.map(_._3).min)
      println(f"PROFILE $name%-40s build=$b%8.1f ms  plan=$p%8.1f ms  exec=$e%8.1f ms  total=${b + p + e}%8.1f ms")
    }
    spark.stop()
  }
}
