package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ts.SparkSpecBase

class JsonlCorpusSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def corpus() = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "plain text", "en"),
      Row(2L, "line\nbreaks\tand \"quotes\" and \\backslashes\\", "en"),
      Row(3L, "unicode: héllo 你好 " + new String(Character.toChars(0x1F600)), "zh"),
      Row(4L, null, "de"), // null field must survive with its key
      Row(5L, "{looks like json} [but is text]", null)), 2), schema)

  test("JSONL round-trip: newlines, quotes, unicode and nulls survive exactly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonlCorpus.write(corpus(), s"$dir/c")
    val back = JsonlCorpus.read(spark, s"$dir/c", schema)
      .orderBy("doc_id").collect()
    val want = corpus().orderBy("doc_id").collect()
    assert(back.toSeq == want.toSeq, s"got ${back.toSeq}")
    // every line carries every key (ignoreNullFields=false): a reader
    // can tell null from schema drift
    val raw = spark.read.text(s"$dir/c").collect().map(_.getString(0))
    assert(raw.forall(l => l.contains("\"text\"") && l.contains("\"lang\"")),
      s"null fields dropped from: ${raw.mkString("\n")}")
    // gzip round-trip too (the codec path)
    JsonlCorpus.write(corpus(), s"$dir/gz", compression = "gzip")
    assert(new java.io.File(s"$dir/gz").listFiles.exists(_.getName.endsWith(".gz")))
    assert(JsonlCorpus.read(spark, s"$dir/gz", schema).count() == 5)
  }

  test("strict read fails LOUDLY on a malformed line; permissive salvages the rest") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      """{"doc_id":1,"text":"good","lang":"en"}
        |this is not json at all
        |{"doc_id":3,"text":"also good","lang":"de"}
        |
        |""".stripMargin)
    val e = intercept[Exception] {
      // collect, not count: a bare count() prunes every column and the
      // parse never runs (lazy plans validate what they evaluate)
      JsonlCorpus.read(spark, dir, schema).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.toLowerCase.contains("alformed")),
      s"wrong failure: ${msgs(e).mkString(" | ")}")
    val salvaged = JsonlCorpus.read(spark, dir, schema, strict = false)
    assert(salvaged.count() == 3, "permissive keeps a null row for the bad line")
    assert(salvaged.filter(col("doc_id").isNotNull).count() == 2)
  }
}
