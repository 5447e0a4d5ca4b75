package graft.pipeline

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The whole ingest pipeline, end to end, from bytes on disk to packed
  * training sequences: WARC archive → HTML extraction → C4 line/page
  * cleaning → Gopher doc-quality keep → exact dedup → sequence packing.
  * The archive is synthesized with KNOWN contamination — duplicate
  * pages, a lorem-ipsum page, a javascript-wall page, a too-short page —
  * so the surviving set is predicted exactly, not just counted.
  */
class EndToEndIngestSpec extends SparkSpecBase {

  private def warcResponse(uri: String, id: Long, html: String): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html")
      .getBytes(ISO_8859_1)
    val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <urn:uuid:$id>\r\nWARC-Date: 2024-05-01T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\nContent-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream()
    out.write(head); out.write(http); out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  // a page body that passes every filter: ≥50 words across proper
  // sentences, ≥2 Gopher stop words, terminal punctuation per line
  private def goodBody(seed: Int): String =
    (1 to 6).map { k =>
      s"The section $seed part $k of this article explains the " +
        s"pipeline and that readers have context with every stage done."
    }.mkString(" ")

  private def page(title: String, body: String): String =
    s"<html><head><title>$title</title></head><body><p>$body</p></body></html>"

  test("WARC → html → C4 → Gopher → dedup → pack: predicted survivors exactly") {
    val dir = java.nio.file.Files.createTempDirectory("e2e_warc").toString
    val out = new FileOutputStream(s"$dir/seg-00000.warc")
    // 4 good unique pages; page 5 duplicates page 1 verbatim (dedup);
    // page 6 is lorem ipsum (C4 page drop); page 7 is a javascript wall
    // whose only real line dies at the line rule (then fails the
    // 5-sentence gate); page 8 is too short for Gopher's word count
    out.write(warcResponse("http://site/1", 1, page("One", goodBody(1))))
    out.write(warcResponse("http://site/2", 2, page("Two", goodBody(2))))
    out.write(warcResponse("http://site/3", 3, page("Three", goodBody(3))))
    out.write(warcResponse("http://site/4", 4, page("Four", goodBody(4))))
    out.write(warcResponse("http://site/5", 5, page("One", goodBody(1))))
    out.write(warcResponse("http://site/6", 6,
      page("Spam", "lorem ipsum dolor sit amet. " + goodBody(6))))
    out.write(warcResponse("http://site/7", 7,
      page("Wall", "Please enable javascript to read this article now.")))
    out.write(warcResponse("http://site/8", 8,
      page("Stub", "Too short to keep, sadly so.")))
    out.close()

    // 1. ingest: archive → (url, text)
    val pages = spark.read.format("warc").load(s"$dir/*.warc")
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long").as("doc_id"),
        col("target_uri"),
        TextOps.htmlToText(col("payload").cast("string")).as("text"))
    assert(pages.count() == 8)

    // 2. C4 page gate (line rules + sentences + lorem/brace)
    val c4 = Quality.c4Clean(pages, "doc_id", "text")
      .filter(col("keep"))
      .select(col("doc_id"), col("text_clean").as("text"))
    assert(c4.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L, 5L), "C4 must drop lorem (6), js wall (7), stub (8)")

    // 3. Gopher doc-quality keep
    val gophered = c4.join(
      Quality.gopherRules(c4, "doc_id", "text")
        .filter(col("keep")).select("doc_id"), Seq("doc_id"))
    assert(gophered.count() == 5)

    // 4. exact dedup (verbatim duplicate page 5 collapses into page 1)
    val deduped = Dedup.dropExactDuplicates(gophered, "doc_id", "text")
    assert(deduped.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))

    // 5. pack into fixed 128-token sequences (single shard)
    val packed = Sampling.packSequences(
      deduped.withColumn("shard", lit("s0")), "doc_id", "text", "shard", 128)
      .collect().sortBy(_.getLong(0))
    assert(packed.length == 4)
    val total = packed.map(_.getLong(2)).sum
    // offsets are a gapless concatenation in doc order
    packed.foldLeft(0L) { (acc, r) =>
      assert(r.getLong(3) * 128 + r.getLong(4) == acc,
        s"doc ${r.getLong(0)} not contiguous")
      acc + r.getLong(2)
    }
    assert(total == packed.map(_.getLong(2)).sum && total > 200)
  }

  // v2 bodies: id-flanked markers interrupt every shared 3-gram —
  // goodBody differs only in one seed token, which puts EVERY cross-doc
  // pair above the minhash threshold and collapses the corpus into one
  // near-dup cluster (the p91 plant lesson, re-learned here the hard way)
  private def uniqueBody(seed: Int): String =
    (1 to 6).map { k =>
      s"The article m${seed}a$k begins and m${seed}b$k explains that " +
        s"m${seed}c$k readers keep m${seed}d$k context with m${seed}e$k " +
        "every stage done."
    }.mkString(" ")

  // chrome-wrapped page: nav/footer are tag-pruned, the link-farm div
  // dies at the block link-density rule — only the <p> body survives
  private def chromePage(title: String, body: String): String =
    s"<html><head><title>$title</title></head><body>" +
      "<nav><a href=/a>Home</a> <a href=/b>About</a> <a href=/c>Contact</a></nav>" +
      s"<p>$body</p>" +
      "<div><a href=/x>click</a> <a href=/y>here</a> <a href=/z>now</a></div>" +
      "<footer>Copyright 2024 Site Inc <a href=/tos>Terms</a></footer>" +
      "</body></html>"

  test("WARC → cleanCorpusV2: the full crawl-to-corpus path, survivors predicted exactly") {
    val dir = java.nio.file.Files.createTempDirectory("e2e_warc_v2").toString
    val out = new FileOutputStream(s"$dir/seg-00000.warc")
    // 1, 2: good unique articles; 3: byte-exact duplicate of 1 (exact
    // dedup); 4: one-word near-duplicate of 2 (minhash keep, canonical
    // min-id); 5: blocklist hit (strict wordlist gate); 6: good article
    // carrying PII that must be SCRUBBED, not dropped; 7: stub (Gopher)
    out.write(warcResponse("http://site/1", 1, chromePage("One", uniqueBody(1))))
    out.write(warcResponse("http://site/2", 2, chromePage("Two", uniqueBody(2))))
    out.write(warcResponse("http://site/3", 3, chromePage("One", uniqueBody(1))))
    out.write(warcResponse("http://site/4", 4,
      chromePage("Two2", uniqueBody(2).replaceFirst("readers", "viewers"))))
    out.write(warcResponse("http://site/5", 5,
      chromePage("Bad", uniqueBody(5) + " That page also says badword plainly.")))
    out.write(warcResponse("http://site/6", 6,
      chromePage("Pii", uniqueBody(6) +
        " Write to jane.doe@example.com or charge card 4111111111111111 today.")))
    out.write(warcResponse("http://site/7", 7,
      chromePage("Stub", "Too short to keep, sadly so.")))
    // request records ride along so the warc_type pushdown has rows to kill
    out.close()

    val pages = spark.read.format("warc").load(s"$dir/*.warc")
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(
        regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload").cast("string").as("html"))

    // the composed extraction PREFIX keeps the source pushdown and
    // stays shuffle-free: one plan from archive bytes to main-content
    // text, with the type filter inside the WARC parser
    val prefix = pages.select(col("doc_id"),
      TextOps.mainContentBlocks(col("html")).getField("text_main").as("text"))
    val plan = prefix.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("types=[response]"),
      s"warc_type pushdown lost in the composed plan: $scanLine")
    assert(!plan.contains("Exchange"),
      s"extraction prefix must be a zero-shuffle projection:\n$plan")

    // embeddings exist for the two keepers (orthogonal — both kept);
    // docs without embeddings pass the semantic stage by design
    import spark.implicits._
    val emb = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0f)),
      (2L, Array.tabulate(64)(i => if (i == 1) 1f else 0f)))
      .toDF("vec_id", "embedding")

    val survivors = Dedup.cleanCorpusV2(pages, emb, "doc_id", "html",
      blocklist = Seq("badword"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(survivors.keySet == Set(1L, 2L, 6L),
      s"survivors: ${survivors.keySet}")
    // chrome never reached the corpus
    for ((id, t) <- survivors) {
      assert(!t.contains("Copyright") && !t.contains("click"),
        s"doc $id kept chrome: $t")
    }
    // the PII page survived SCRUBBED
    assert(survivors(6L).contains("[EMAIL]") && survivors(6L).contains("[CARD]"),
      survivors(6L))
    assert(!survivors(6L).contains("jane.doe@example.com") &&
      !survivors(6L).contains("4111111111111111"), survivors(6L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
