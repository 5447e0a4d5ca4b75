package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Dedup, Quality}

    def docs0 = Tables.load(spark, sfDir, "documents")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        graft.pipeline.CacheLedger.drain()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"TIME $label%-30s ${runs.min}%8.1f ms (runs ${runs.map(_.toInt).mkString(",")})")
    }

    // how many times does the tokenizer appear in the optimized plans?
    val funnel = Quality.filterFunnel(docs0, "doc_id", "text", Seq("badword"))
    val funnelPlan = funnel.queryExecution.optimizedPlan.toString
    println(s"FUNNEL split-count=${"split\\(".r.findAllIn(funnelPlan).length} " +
      s"filter-nodes=${"Filter".r.findAllIn(funnelPlan).length}")
    val fe = Dedup.cleanCorpusFrontEnd(
      docs0.select(col("doc_id"),
        concat(lit("<html><body><p>"), col("text"),
          lit(" and we keep many solid words here with care today." +
            " that line also ends with a clean period mark." +
            " have another proper sentence of plain words now." +
            " with this final sentence the document clearly ends." +
            " the quick brown fox jumps over the lazy dog daily.")
          , lit("</p></body></html>")).as("html")),
      "doc_id", "html", Seq("badword"))
    val fePlan = fe.queryExecution.optimizedPlan.toString
    println(s"FRONTEND split-count=${"split\\(".r.findAllIn(fePlan).length} " +
      s"tokencalls=${"lower\\(".r.findAllIn(fePlan).length}")
    time("funnel fused") { noop(funnel) }
    time("frontEnd fused") { noop(fe) }
    graft.pipeline.CacheLedger.drain()
    spark.stop()
  }
}
