package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.{Map => JMap}
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WARC reader (ISO 28500, the Common Crawl container):
  * `spark.read.format("warc").load(pathOrGlob)` — the ingest front end
  * of a web-scale training-data pipeline, feeding the HTML-extraction /
  * quality / dedup operators downstream.
  *
  * Fixed schema, one row per WARC record:
  * `(file string, record_id string, warc_type string, target_uri string,
  * date timestamp, content_type string, content_length long,
  * http_status int, http_content_type string, payload binary)` —
  * `payload` is the HTTP message body for `application/http` blocks
  * (status line and headers parsed into the `http_*` columns), the raw
  * block otherwise.
  *
  * Scale shape, mirroring [[NetCdfSource]]:
  *  - ONE INPUT PARTITION PER FILE — WARC (and per-record-gzip WARC)
  *    is not splittable without an external index, and the archive
  *    convention compensates: Common Crawl ships ~64k files per crawl,
  *    so file-level parallelism saturates any cluster. Records stream
  *    off the (decompressed) byte stream one at a time — a 1 GiB WARC
  *    never materializes whole.
  *  - COLUMN PRUNING: dropping `payload` from the projection skips the
  *    body copy entirely (bytes are still skipped on the stream, never
  *    buffered); metadata-only scans over an archive touch ~1% of the
  *    bytes' allocation cost.
  *  - FILTER PUSHDOWN: equality/IN on `warc_type` suppresses row
  *    creation and HTTP parsing for non-matching records at the
  *    parser (the standard "responses only" scan skips request /
  *    metadata records for free); equality/IN/prefix on `file` prunes
  *    whole input files at planning time. Both are also left as
  *    residuals, so pushdown is an optimization, never the
  *    correctness boundary.
  *
  * `.warc.gz` files may be a single gzip stream or the Common Crawl
  * convention of one gzip MEMBER per record back to back —
  * `GZIPInputStream` reads concatenated members transparently, so both
  * decode with the same path.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcMini.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(WarcMini.rawPaths(new CaseInsensitiveStringMap(properties)))
}

private[sources] class WarcTable(raw: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"warc(${raw.mkString(",")})"
  override def schema(): StructType = WarcMini.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(raw)
}

private[sources] class WarcScanBuilder(raw: Seq[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = WarcMini.Schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(f =>
      WarcMini.isFileFilter(f) || WarcMini.isTypeFilter(f))
    filters // all stay residual — pruning is never the correctness boundary
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
  override def build(): Scan = new WarcScan(required, raw, pushed)
}

private[sources] case class WarcInputPartition(path: String) extends InputPartition

/** Micro-batch offset: the count of (sorted) archive files fully
  * processed. The streaming contract is the crawl-archive convention —
  * files arrive with lexicographically INCREASING names (Common Crawl
  * segments are timestamp-named), so the sorted listing only ever grows
  * at the tail and `[start, end)` slices are stable across relistings.
  */
private[sources] case class WarcOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

private[sources] class WarcScan(required: StructType, raw: Seq[String],
    pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    WarcMini.resolvePaths(raw, allowEmpty = false)
      .filter(p => WarcMini.keepFile(p, pushed))
      .map(WarcInputPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val entries = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    new WarcReaderFactory(required, pushed, entries)
  }
  override def description(): String =
    s"warc cols=[${required.fieldNames.mkString(",")}] " +
      s"types=[${WarcMini.wantedTypes(pushed).map(_.mkString(",")).getOrElse("*")}]"

  // ---- continuous ingest: new archive files become micro-batches ------
  import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    this
  override def initialOffset(): Offset = WarcOffset(0)
  override def latestOffset(): Offset =
    WarcOffset(WarcMini.resolvePaths(raw, allowEmpty = true).size)
  override def deserializeOffset(json: String): Offset =
    WarcOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcOffset].n
    val e = end.asInstanceOf[WarcOffset].n
    WarcMini.resolvePaths(raw, allowEmpty = true).slice(s, e)
      .filter(p => WarcMini.keepFile(p, pushed))
      .map(WarcInputPartition.apply).toArray
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class WarcReaderFactory(required: StructType,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[WarcInputPartition].path
    new PartitionReader[InternalRow] {
      private val conf = {
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val stream = WarcMini.openStream(path, conf)
      private val rows = WarcMini.records(stream, path, required,
        WarcMini.wantedTypes(pushed))
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = stream.close()
    }
  }
}

/** From-scratch streaming WARC parser (ISO 28500 §4: a record is a
  * `WARC/1.x` version line, named header fields, CRLF, Content-Length
  * block bytes, CRLF CRLF). No external library; tolerant of leading
  * blank lines between records and of a missing trailing separator at
  * EOF.
  */
object WarcMini {

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("date", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType)))

  import org.apache.spark.sql.sources.{EqualTo, Filter, In, StringStartsWith}

  def isFileFilter(f: Filter): Boolean = f match {
    case EqualTo("file", _: String) => true
    case In("file", _) => true
    case StringStartsWith("file", _) => true
    case _ => false
  }

  def isTypeFilter(f: Filter): Boolean = f match {
    case EqualTo("warc_type", _: String) => true
    case In("warc_type", _) => true
    case _ => false
  }

  /** Record types the pushed filters allow; None = all. Multiple type
    * predicates intersect (they are AND-ed residually anyway).
    */
  def wantedTypes(pushed: Array[Filter]): Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo("warc_type", v: String) => Set(v)
      case In("warc_type", vs) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  def fileTagOf(path: String): String = {
    val n = path.split('/').last
    n.stripSuffix(".gz").stripSuffix(".warc")
  }

  def keepFile(path: String, pushed: Array[Filter]): Boolean = {
    val tag = fileTagOf(path)
    pushed.forall {
      case EqualTo("file", v: String) => tag == v
      case In("file", vs) => vs.exists(_ == tag)
      case StringStartsWith("file", p) => tag.startsWith(p)
      case _ => true
    }
  }

  /** The raw path option strings (globs/dirs NOT expanded) — streaming
    * relists them on every `latestOffset`, batch expands once at plan.
    */
  def rawPaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(_.split(","))
    require(raw.nonEmpty, "warc source requires a path")
    raw
  }

  /** Expand raw paths through the Hadoop filesystem (globs and
    * directories supported). `allowEmpty` is the streaming mode — an
    * archive directory legitimately starts empty.
    */
  def resolvePaths(raw: Seq[String], allowEmpty: Boolean): Seq[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    raw.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val statuses =
        if (fs.isDirectory(hp)) fs.listStatus(hp).toSeq.filter { s =>
          val n = s.getPath.getName
          n.endsWith(".warc") || n.endsWith(".warc.gz")
        }
        else Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      require(allowEmpty || statuses.nonEmpty, s"no warc files at $p")
      statuses.map(_.getPath.toString)
    }.sorted
  }

  /** Open the (possibly gzipped) record stream. GZIPInputStream handles
    * the Common Crawl member-per-record layout transparently.
    */
  def openStream(path: String, conf: Configuration): InputStream = {
    val hp = new Path(path)
    val raw = hp.getFileSystem(conf).open(hp)
    val buffered = new BufferedInputStream(raw, 1 << 16)
    if (!path.endsWith(".gz")) buffered
    else
      // a corrupt gzip header throws from the constructor AFTER the
      // filesystem stream opened — close it or the connection leaks
      try new BufferedInputStream(new GZIPInputStream(buffered, 1 << 16), 1 << 16)
      catch { case e: Throwable => buffered.close(); throw e }
  }

  /** One CRLF- (or bare-LF-) terminated header line; None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(80)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Int, path: String): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(
        s"warc file $path truncated: expected $n block bytes, got $off")
      off += r
    }
    buf
  }

  /** `block` is None when the caller asked for the bytes to be SKIPPED
    * (filtered-out record type, or a projection needing no payload) —
    * the allocation-free path the class doc promises.
    */
  private final case class RawRecord(headers: Map[String, String],
    blockLen: Int, block: Option[Array[Byte]])

  private def skipFully(in: InputStream, n: Long, path: String): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() >= 0) left -= 1 // gzip streams may refuse skip at a boundary
      else throw new EOFException(
        s"warc file $path truncated: ${left} block bytes missing")
    }
  }

  /** Next record's HEADERS off the stream (skipping inter-record blank
    * lines), then either buffer or skip the block as `wantBlock`
    * decides from the parsed headers. Header names are lowercased (WARC
    * headers are case-insensitive); folded continuation lines (leading
    * space/tab, legal LWS per the ISO 28500 grammar) append to the
    * previous field's value.
    */
  private def readRecord(in: InputStream, path: String,
      wantBlock: Map[String, String] => Boolean): Option[RawRecord] = {
    var line = readLine(in)
    while (line.exists(_.isEmpty)) line = readLine(in)
    line match {
      case None => None
      case Some(v) =>
        require(v.startsWith("WARC/"),
          s"warc file $path: expected record version line, got '$v'")
        var fields = Vector.empty[(String, String)]
        var h = readLine(in)
        while (h.exists(_.nonEmpty)) {
          val s = h.get
          if ((s.charAt(0) == ' ' || s.charAt(0) == '\t') && fields.nonEmpty) {
            val (k, prev) = fields.last
            fields = fields.init :+ (k -> (prev + " " + s.trim))
          } else {
            val i = s.indexOf(':')
            require(i > 0, s"warc file $path: malformed header line '$s'")
            fields = fields :+
              (s.substring(0, i).trim.toLowerCase -> s.substring(i + 1).trim)
          }
          h = readLine(in)
        }
        val hs = fields.toMap
        val len = hs.getOrElse("content-length",
          sys.error(s"warc file $path: record without Content-Length")).toLong
        // readFully buffers one record — a multi-GiB record would need a
        // chunked payload surface; fail loudly instead of overflowing
        require(len >= 0 && len <= Int.MaxValue,
          s"warc file $path: record Content-Length $len outside the " +
            "2GiB single-record buffer limit")
        if (wantBlock(hs))
          Some(RawRecord(hs, len.toInt, Some(readFully(in, len.toInt, path))))
        else {
          skipFully(in, len, path)
          Some(RawRecord(hs, len.toInt, None))
        }
    }
  }

  /** Split an `application/http` block into (status, content-type,
    * body); None when the block is not an HTTP message.
    */
  private def parseHttp(block: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    if (block.length < 5 || !(block(0) == 'H' && block(1) == 'T' &&
      block(2) == 'T' && block(3) == 'P' && block(4) == '/')) return None
    // header/body boundary: first CRLFCRLF (tolerate LFLF)
    var i = 0
    var bodyAt = -1
    while (bodyAt < 0 && i < block.length - 1) {
      if (block(i) == '\n') {
        if (block(i + 1) == '\n') bodyAt = i + 2
        else if (i + 2 < block.length && block(i + 1) == '\r' &&
          block(i + 2) == '\n') bodyAt = i + 3
      }
      i += 1
    }
    if (bodyAt < 0) bodyAt = block.length
    val head = new String(block, 0, bodyAt, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    // split on RUNS of spaces — a sloppy 'HTTP/1.1  200 OK' status line
    // must degrade to -1 or parse, never throw on an empty token
    val status = lines.head.trim.split(" +") match {
      case parts if parts.length >= 2 && parts(1).nonEmpty &&
        parts(1).forall(_.isDigit) && parts(1).length <= 9 => parts(1).toInt
      case _ => -1
    }
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.getOrElse("")
    Some((status, ctype, java.util.Arrays.copyOfRange(block, bodyAt, block.length)))
  }

  private def parseDateMicros(s: String): Any =
    try {
      val inst = java.time.Instant.parse(s)
      Long.box(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    } catch { case _: Exception => null }

  /** Stream → pruned catalyst rows. `wanted` suppresses row creation,
    * HTTP parsing AND block buffering for filtered-out record types
    * (their bytes are skipped on the stream, never allocated); when the
    * projection needs neither payload nor http_* columns, no record's
    * block is buffered at all — `content_length` comes from the header.
    */
  def records(in: InputStream, path: String, required: StructType,
      wanted: Option[Set[String]]): Iterator[InternalRow] = {
    val fileTag = UTF8String.fromString(fileTagOf(path))
    val needHttp = required.fieldNames.exists(f =>
      f == "http_status" || f == "http_content_type" || f == "payload")
    val wantBlock: Map[String, String] => Boolean = hs =>
      needHttp && wanted.forall(_.contains(hs.getOrElse("warc-type", "")))
    new Iterator[InternalRow] {
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        var rec = readRecord(in, path, wantBlock)
        while (nextRow == null && rec.isDefined) {
          val r = rec.get
          val wtype = r.headers.getOrElse("warc-type", "")
          if (wanted.forall(_.contains(wtype))) {
            val isHttp = r.headers.getOrElse("content-type", "")
              .startsWith("application/http")
            val http = r.block.filter(_ => needHttp && isHttp).flatMap(parseHttp)
            val out = new Array[Any](required.fields.length)
            var j = 0
            while (j < required.fields.length) {
              out(j) = required.fields(j).name match {
                case "file" => fileTag
                case "record_id" => r.headers.get("warc-record-id")
                  .map(UTF8String.fromString).orNull
                case "warc_type" => UTF8String.fromString(wtype)
                case "target_uri" => r.headers.get("warc-target-uri")
                  .map(UTF8String.fromString).orNull
                case "date" => r.headers.get("warc-date")
                  .map(parseDateMicros).orNull
                case "content_type" => r.headers.get("content-type")
                  .map(UTF8String.fromString).orNull
                case "content_length" => Long.box(r.blockLen.toLong)
                case "http_status" =>
                  http.map(h => Int.box(h._1)).orNull
                case "http_content_type" =>
                  http.map(h => UTF8String.fromString(h._2)).orNull
                case "payload" =>
                  http.map(_._3).orElse(r.block).orNull
                case other => sys.error(s"unknown warc column $other")
              }
              j += 1
            }
            nextRow = new GenericInternalRow(out)
          } else rec = readRecord(in, path, wantBlock)
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }
}
