package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** WARC-source scale smoke: synthesizes a member-per-record gzip archive
  * (the Common Crawl layout) of `nRecords` across `nFiles`, then times
  * the three scan shapes that matter at archive scale — the full
  * payload scan, the payload-free metadata scan (column pruning), and
  * the type-filtered responses-only scan (parser pushdown) — plus the
  * composed ingest: responses → htmlToText → token count.
  *
  * Usage: runMain graft.ScaleSmokeWarc [nRecords] [nFiles]
  */
object ScaleSmokeWarc {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(100000)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("warc_smoke").toString
    val t0 = System.nanoTime()
    // records alternate request/response; response bodies are ~1 KiB of
    // chrome-wrapped HTML so payload pruning has real bytes to skip AND
    // the composed clean-corpus stage has real extraction/dedup work:
    // bodies carry id-flanked marker words (shared boilerplate without
    // unique words makes ANY banded LSH quadratic — the p91 plant
    // lesson), with 1 exact + 1 near duplicate planted per 100 responses
    // id-flanked markers interrupt every shared 3-gram: shared-template
    // shingles would give EVERY cross-doc pair jaccard > threshold and
    // make the banded join quadratic (the p91 plant lesson)
    def contentOf(x: Long): String =
      (1 to 6).map { k =>
        s"The article m${x}a$k begins and m${x}b$k explains that " +
          s"m${x}c$k readers keep m${x}d$k context with m${x}e$k " +
          "every stage done."
      }.mkString(" ")
    def bodyOf(id: Long): String = {
      val text =
        if (id % 200 == 101) contentOf(id - 100) // exact dup of a leader
        else if (id % 200 == 103)                // near dup of a leader
          contentOf(id - 102).replaceFirst("readers", "viewers")
        else contentOf(id)
      "<html><head><title>t</title></head><body>" +
        "<nav><a href=/a>Home</a> <a href=/b>About</a></nav>" +
        s"<p>$text</p>" +
        "<footer>Copyright Site <a href=/t>Terms</a></footer></body></html>"
    }
    val perFile = nRecords / nFiles
    require(perFile > 0, s"nRecords=$nRecords must be >= nFiles=$nFiles")
    for (f <- 0 until nFiles) {
      val out = new FileOutputStream(f"$dir/crawl-$f%05d.warc.gz")
      for (i <- 0 until perFile) {
        val id = f.toLong * perFile + i
        val block =
          if (id % 2 == 0)
            ("GET /p HTTP/1.1\r\nHost: x\r\n\r\n").getBytes(ISO_8859_1)
          else
            (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n${bodyOf(id)}")
              .getBytes(ISO_8859_1)
        val wtype = if (id % 2 == 0) "request" else "response"
        val rec = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
          s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
          s"WARC-Date: 2024-05-01T00:00:00Z\r\n" +
          s"WARC-Target-URI: http://site/$id\r\n" +
          s"Content-Type: application/http; msgtype=$wtype\r\n" +
          s"Content-Length: ${block.length}\r\n\r\n").getBytes(ISO_8859_1)
        val gz = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(gz)
        g.write(rec); g.write(block); g.write("\r\n\r\n".getBytes(ISO_8859_1))
        g.close()
        out.write(gz.toByteArray)
      }
      out.close()
    }
    println(f"[warc-scale] wrote ${nFiles * perFile} records / $nFiles files " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.2fs")

    def stage(name: String)(rows: => Long): Unit = {
      val t = System.nanoTime()
      val r = rows
      val sec = (System.nanoTime() - t) / 1e9
      println(f"[warc-scale] $name%-24s $sec%8.2fs  ${nFiles * perFile / sec / 1000}%8.1fk rec/s  rows=$r")
    }
    val df = spark.read.format("warc").load(s"$dir/*.warc.gz")
    stage("full_scan_with_payload")({
      df.select(sum(length(col("payload"))).cast("long")).head().getLong(0)
    })
    stage("metadata_only_pruned")(
      df.select("record_id", "warc_type", "content_length")
        .filter(col("content_length") > 0).count())
    stage("responses_type_pushdown")(
      df.filter(col("warc_type") === "response").count())
    stage("ingest_html_tokens")(
      df.filter(col("warc_type") === "response" && col("http_status") === 200)
        .select(graft.pipeline.TextOps.htmlToText(
          col("payload").cast("string")).as("text"))
        .select(sum(size(graft.pipeline.TextOps.tokens(col("text"))))
          .cast("long")).head().getLong(0))
    // the full crawl-to-corpus path (VERDICT r9 gap #2): archive bytes →
    // warc_type pushdown → main-content extraction → the verified
    // clean-corpus v2 chain (corrections, gates, PII scrubs, exact +
    // minhash dedup; no embedding table on the crawl path — docs
    // without embeddings pass the semantic stage by design). Expected
    // survivors: responses minus the planted 2-per-200 duplicates.
    stage("warc_clean_corpus_v2")({
      import org.apache.spark.sql.types._
      val pages = df
        .filter(col("warc_type") === "response" && col("http_status") === 200)
        .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1)
          .cast("long").as("doc_id"),
          col("payload").cast("string").as("html"))
      val emb = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      val n = graft.pipeline.Dedup.cleanCorpusV2(pages, emb,
        "doc_id", "html", blocklist = Seq("badword")).count()
      graft.pipeline.CacheLedger.drain()
      n
    })
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
