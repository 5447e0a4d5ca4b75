package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** WARC DSv2 source against hand-assembled fixtures: plain `.warc`,
  * whole-file gzip, and the Common Crawl member-per-record gzip layout.
  * Every byte of the fixtures is written by this spec, so field values,
  * payload bytes, pruning, and pushdown are all pinned exactly.
  */
class WarcSourceSpec extends SparkSpecBase {

  private def record(wtype: String, uri: String, id: String,
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

  private def httpResponse(status: Int, ctype: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n" + body).getBytes(ISO_8859_1)

  private def fixtureRecords: Seq[Array[Byte]] = Seq(
    record("warcinfo", "", "info-1", "2024-05-01T00:00:00Z",
      "application/warc-fields",
      "software: graft-test\r\nformat: WARC File Format 1.0\r\n"
        .getBytes(ISO_8859_1)),
    record("request", "http://example.org/a", "req-1", "2024-05-01T00:00:01Z",
      "application/http; msgtype=request",
      "GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n".getBytes(ISO_8859_1)),
    record("response", "http://example.org/a", "resp-1", "2024-05-01T00:00:02Z",
      "application/http; msgtype=response",
      httpResponse(200, "text/html; charset=utf-8",
        "<html><body>page A</body></html>")),
    record("response", "http://example.org/b", "resp-2",
      "2024-05-01T00:00:03.250Z", "application/http; msgtype=response",
      httpResponse(404, "text/plain", "not found")),
    record("metadata", "http://example.org/a", "meta-1",
      "2024-05-01T00:00:04Z", "application/warc-fields",
      "fetchTimeMs: 12\r\n".getBytes(ISO_8859_1)))

  private def writePlain(dir: String, name: String): String = {
    val p = s"$dir/$name.warc"
    val out = new FileOutputStream(p)
    fixtureRecords.foreach(out.write)
    out.close(); p
  }

  private def writeGzip(dir: String, name: String, perRecord: Boolean): String = {
    val p = s"$dir/$name.warc.gz"
    val out = new FileOutputStream(p)
    if (perRecord) fixtureRecords.foreach { r =>
      val gz = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(gz)
      g.write(r); g.close()
      out.write(gz.toByteArray) // one gzip MEMBER per record, concatenated
    } else {
      val g = new GZIPOutputStream(out)
      fixtureRecords.foreach(g.write)
      g.close()
    }
    out.close(); p
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("warc_spec").toString

  test("plain WARC decodes all record types with parsed HTTP columns") {
    val dir = tmpDir()
    writePlain(dir, "crawl-00000")
    val df = spark.read.format("warc").load(s"$dir/crawl-00000.warc")
    val rows = df.orderBy("record_id").collect()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getString(1) -> r).toMap
    val resp = byId("<urn:uuid:resp-1>")
    assert(resp.getString(2) == "response")
    assert(resp.getString(3) == "http://example.org/a")
    assert(resp.getInt(7) == 200)
    assert(resp.getString(8) == "text/html; charset=utf-8")
    assert(new String(resp.getAs[Array[Byte]](9), ISO_8859_1) ==
      "<html><body>page A</body></html>")
    assert(byId("<urn:uuid:resp-2>").getInt(7) == 404)
    // fractional seconds parse to micros
    assert(byId("<urn:uuid:resp-2>").getTimestamp(4).getTime % 1000 == 250)
    // non-HTTP records carry the raw block as payload, NULL http columns
    val info = byId("<urn:uuid:info-1>")
    assert(info.isNullAt(7) && info.isNullAt(8))
    assert(new String(info.getAs[Array[Byte]](9), ISO_8859_1)
      .startsWith("software: graft-test"))
    // content_length equals the block length as written
    assert(rows.forall(r => r.getLong(6) > 0))
  }

  test("whole-file and member-per-record gzip decode identically to plain") {
    val dir = tmpDir()
    writePlain(dir, "p")
    writeGzip(dir, "w", perRecord = false)
    writeGzip(dir, "m", perRecord = true)
    def canon(path: String): Seq[(String, String, Long)] =
      spark.read.format("warc").load(path)
        .select("record_id", "warc_type", "content_length")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val plain = canon(s"$dir/p.warc")
    assert(plain.length == 5)
    assert(canon(s"$dir/w.warc.gz") == plain)
    assert(canon(s"$dir/m.warc.gz") == plain)
  }

  test("column pruning reaches the scan; warc_type and file filters push down") {
    val dir = tmpDir()
    writePlain(dir, "crawl-00000")
    writePlain(dir, "crawl-00001")
    writePlain(dir, "other-00002")
    val df = spark.read.format("warc").load(s"$dir/*.warc")
    assert(df.count() == 15)
    // pruned projection: the scan's read schema drops payload
    val pruned = df.select("target_uri", "http_status")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("cols=[target_uri,http_status]"), scanLine)
    assert(!scanLine.contains("payload"), scanLine)
    // type pushdown reaches the parser (description shows it) AND the
    // residual filter keeps semantics
    val responses = df.filter(col("warc_type") === "response")
    val rLine = responses.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(rLine.contains("types=[response]"), rLine)
    assert(responses.count() == 6)
    // file pruning: one file's partition survives planning
    val one = df.filter(col("file") === "crawl-00001")
    assert(one.count() == 5)
    // prefix pruning composes with count
    assert(df.filter(col("file").startsWith("crawl-")).count() == 10)
  }

  test("WET conversion records (extracted-text sibling) read as plain payloads") {
    // a WET file is a WARC whose records are warc_type=conversion with
    // text/plain blocks — no HTTP framing to parse
    val dir = tmpDir()
    val recs = Seq(
      record("warcinfo", "", "winfo", "2024-05-01T00:00:00Z",
        "application/warc-fields", "format: WET\r\n".getBytes(ISO_8859_1)),
      record("conversion", "http://example.org/a", "conv-1",
        "2024-05-01T00:00:01Z", "text/plain",
        "extracted page text one".getBytes(ISO_8859_1)),
      record("conversion", "http://example.org/b", "conv-2",
        "2024-05-01T00:00:02Z", "text/plain",
        "extracted page text two".getBytes(ISO_8859_1)))
    val out = new FileOutputStream(s"$dir/seg.warc")
    recs.foreach(out.write); out.close()
    val df = spark.read.format("warc").load(s"$dir/seg.warc")
      .filter(col("warc_type") === "conversion")
      .select(col("target_uri"), col("payload").cast("string").as("text"),
        col("http_status"))
      .orderBy("target_uri").collect()
    assert(df.length == 2)
    assert(df.map(_.getString(1)).toSeq ==
      Seq("extracted page text one", "extracted page text two"))
    assert(df.forall(_.isNullAt(2))) // no HTTP message to parse
  }

  test("folded headers (LWS continuation) and sloppy status lines degrade cleanly") {
    val dir = tmpDir()
    val http = "HTTP/1.1  200 OK\r\nContent-Type: text/plain\r\n\r\nbody"
      .getBytes(ISO_8859_1) // double space in the status line
    val head = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:fold-1>\r\n" +
      "WARC-Date: 2024-05-01T00:00:00Z\r\n" +
      "WARC-Target-URI: http://example.org/very\r\n" +
      " /long/folded/path\r\n" + // legal LWS continuation line
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(ISO_8859_1)
    val out = new FileOutputStream(s"$dir/f.warc")
    out.write(head); out.write(http)
    out.write("\r\n\r\n".getBytes(ISO_8859_1)); out.close()
    val r = spark.read.format("warc").load(s"$dir/f.warc").collect().head
    assert(r.getString(3) == "http://example.org/very /long/folded/path")
    assert(r.getInt(7) == 200) // run-of-spaces split, not a crash
  }

  test("metadata-only projections never buffer a block (skip path)") {
    val dir = tmpDir()
    writePlain(dir, "s")
    // all-pruned projection AND a type filter both exercise skipFully;
    // results stay byte-identical to the buffered path
    val df = spark.read.format("warc").load(s"$dir/s.warc")
    val meta = df.select("record_id", "content_length").orderBy("record_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val full = df.select("record_id", "content_length", "payload")
      .orderBy("record_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(meta.toSeq == full.toSeq)
    val onlyResp = df.filter(col("warc_type") === "response")
      .select("record_id", "http_status").collect()
    assert(onlyResp.length == 2 && onlyResp.forall(!_.isNullAt(1)))
  }

  test("malformed archives fail loudly, naming the file") {
    val dir = tmpDir()
    // truncated mid-block: Content-Length promises more bytes than exist
    val rec = fixtureRecords.head
    val cut = new FileOutputStream(s"$dir/cut.warc")
    cut.write(rec, 0, rec.length - 20); cut.close()
    val e1 = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(s"$dir/cut.warc").count()
    }
    assert(e1.getMessage.contains("truncated") ||
      Option(e1.getCause).exists(_.getMessage.contains("truncated")))
    // garbage where a version line should be
    val bad = new FileOutputStream(s"$dir/bad.warc")
    bad.write("not a warc at all\r\n".getBytes(ISO_8859_1)); bad.close()
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(s"$dir/bad.warc").count()
    }
    val msg2 = e2.getMessage +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("version line"), msg2)
  }

  test("micro-batch streaming ingests archive files as they arrive") {
    val dir = tmpDir()
    writePlain(dir, "seg-00000") // present before the query starts
    val q = spark.readStream.format("warc").load(dir)
      .filter(col("warc_type") === "response")
      .select("record_id", "target_uri", "http_status")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 2)
      // a new file lands (name sorts after — the crawl-segment
      // convention the offset contract documents) → next micro-batch
      writePlain(dir, "seg-00001")
      q.processAllAvailable()
      val rows = spark.table("warc_stream").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getInt(2)).sorted.toSeq == Seq(200, 200, 404, 404))
    } finally q.stop()
  }

  test("streaming the archive into html extraction composes end to end") {
    val dir = tmpDir()
    writeGzip(dir, "cc", perRecord = true)
    val pages = spark.read.format("warc").load(s"$dir/cc.warc.gz")
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("target_uri"),
        graft.pipeline.TextOps.htmlToText(
          col("payload").cast("string")).as("text"))
      .collect()
    assert(pages.length == 1)
    assert(pages.head.getString(0) == "http://example.org/a")
    assert(pages.head.getString(1) == "page A")
  }
}
