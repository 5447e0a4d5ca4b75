package graft.streaming

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The composed crawl front door, end to end on a STREAM:
  *
  *   `readStream.format("warc")` (archives arriving one per
  *   micro-batch) → response/200 filter → payload-as-HTML →
  *   [[StreamingCleanCorpus.cleanCorpusStream]] (extraction →
  *   corrections → gates → scrubs → watermarked exact dedup).
  *
  * Batch-equivalence reference is the SAME pipeline through the batch
  * reader and [[graft.pipeline.Dedup.cleanCorpusFrontEnd]] over both
  * archives at once. Fixture archives are written byte-by-byte here
  * (Common Crawl member-per-record gzip layout) with one page per gate
  * and — the cross-archive state under test — an exact duplicate whose
  * first copy is in archive 0 and second copy in archive 1, i.e. the
  * duplicate STRADDLES both the archive file and the micro-batch
  * boundary, so only the watermarked dedup state can catch it.
  */
class StreamingWarcIngestSpec extends SparkSpecBase {

  private def warcRecord(wtype: String, uri: String, id: String,
      date: String, ctype: String, block: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $wtype\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:$id>\r\n")
      .append(s"WARC-Date: $date\r\n")
    if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
    head.append(s"Content-Type: $ctype\r\n")
      .append(s"Content-Length: ${block.length}\r\n")
      .append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(head.toString.getBytes(ISO_8859_1))
    out.write(block)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def httpOk(body: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n" + body).getBytes(ISO_8859_1)

  // id-flanked markers keep docs genuinely distinct (shared-boilerplate
  // 3-grams would make every cross-doc pair near-identical); chrome
  // must die in extraction before any gate sees it
  private def body(seed: Int): String = (1 to 6).map { k =>
    s"The article m${seed}a$k begins and m${seed}b$k explains that " +
      s"m${seed}c$k readers keep m${seed}d$k context with m${seed}e$k " +
      "every stage done."
  }.mkString(" ")

  private def pageHtml(title: String, b: String): String =
    s"<html><head><title>$title</title></head><body>" +
      "<nav><a href=/a>Home</a> <a href=/b>About</a></nav>" +
      s"<p>$b</p>" +
      "<footer>Copyright 2024 Site Inc <a href=/tos>Terms</a></footer>" +
      "</body></html>"

  /** Member-per-record gzip archive (the Common Crawl layout). */
  private def writeArchive(dir: String, name: String,
      records: Seq[Array[Byte]]): String = {
    val p = s"$dir/$name.warc.gz"
    val out = new FileOutputStream(p)
    records.foreach { r =>
      val gz = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(gz)
      g.write(r); g.close()
      out.write(gz.toByteArray)
    }
    out.close(); p
  }

  test("warc stream -> cleanCorpusStream == batch front end; dup straddles archives") {
    val dir = java.nio.file.Files.createTempDirectory("warc_clean").toString
    def resp(id: String, uri: String, sec: Int, html: String) =
      warcRecord("response", uri, id, f"2024-05-01T00:00:$sec%02dZ",
        "application/http; msgtype=response", httpOk(html))
    // archive 0: keep, keep, blocklist-fail, stub-fail (+ a warcinfo
    // and a request record the type filter must drop before extraction)
    val arc0 = Seq(
      warcRecord("warcinfo", "", "info-0", "2024-05-01T00:00:00Z",
        "application/warc-fields",
        "software: graft-test\r\n".getBytes(ISO_8859_1)),
      warcRecord("request", "http://ex.org/a1", "q-a1",
        "2024-05-01T00:00:01Z", "application/http; msgtype=request",
        "GET /a1 HTTP/1.1\r\n\r\n".getBytes(ISO_8859_1)),
      resp("a1", "http://ex.org/a1", 1, pageHtml("One", body(1))),
      resp("a2", "http://ex.org/a2", 2, pageHtml("Two", body(2))),
      resp("a3", "http://ex.org/a3", 3,
        pageHtml("Bad", body(3) + " That page also says badword plainly.")),
      resp("a4", "http://ex.org/a4", 4,
        pageHtml("Stub", "Too short to keep, sadly so.")))
    // archive 1 (lands AFTER the first micro-batch): keep, exact dup of
    // a1's extracted text under a different uri/record id, PII page
    val arc1 = Seq(
      resp("b1", "http://ex.org/b1", 5, pageHtml("Five", body(5))),
      resp("b2", "http://mirror.example/a1-copy", 6,
        pageHtml("One", body(1))),
      resp("b3", "http://ex.org/b3", 7, pageHtml("Pii", body(7) +
        " Write to jane.doe@example.com or charge card 4111111111111111 today.")))
    writeArchive(dir, "seg-00000", arc0)

    def project(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("record_id"), col("date"),
        col("payload").cast("string").as("html"))

    val out = StreamingCleanCorpus.cleanCorpusStream(
      project(spark.readStream.format("warc").load(dir)),
      "record_id", "date", "html", blocklist = Seq("badword"),
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("warc_clean_stream")
      .outputMode("append").start()
    val got = try {
      q.processAllAvailable() // micro-batch 1 = archive 0 only
      writeArchive(dir, "seg-00001", arc1) // next file lands
      q.processAllAvailable() // micro-batch 2 = archive 1
      spark.table("warc_clean_stream").collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
    } finally q.stop()

    // batch reference over BOTH archives at once; record ids were named
    // so batch min-id keep == streaming first-arrival for the dup pair
    val want = graft.pipeline.Dedup.cleanCorpusFrontEnd(
        project(spark.read.format("warc").load(s"$dir/*.warc.gz"))
          .select(col("record_id"), col("html")),
        "record_id", "html", blocklist = Seq("badword"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want, s"stream=${got.keySet.toSeq.sorted} " +
      s"batch=${want.keySet.toSeq.sorted}")
    // every gate exercised; the straddling dup b2 died to STATE, not a gate
    assert(want.keySet ==
      Set("a1", "a2", "b1", "b3").map(i => s"<urn:uuid:$i>"), want.keySet)
    val pii = got("<urn:uuid:b3>")
    assert(pii.contains("[EMAIL]") && pii.contains("[CARD]") &&
      !pii.contains("jane.doe@example.com"), pii)
    assert(got.values.forall(t => !t.contains("Copyright")), got)
    graft.pipeline.CacheLedger.drain()
  }
}
