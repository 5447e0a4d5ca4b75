package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** netCDF-4 time-series ingestion — the reference's flagship real-data
  * workflow (CMEMS marine observations with per-sample QC flags,
  * `/root/reference/notebooks/cmems.ipynb` cells 1-11; fixture
  * `tests/data/BO_TS_MO_FINO2.nc`), re-expressed for Spark:
  *
  *  - parsing runs on EXECUTORS: `readMany` maps Spark's `binaryFile`
  *    source over a path/glob, one task per file — the scale path for a
  *    large observation archive is many medium files, not one giant one;
  *  - CF conventions are applied on read: `units = "<unit> since
  *    <epoch>"` time decoding, `scale_factor`/`add_offset` unpacking,
  *    `_FillValue` → null;
  *  - a 2-D variable (time × depth) explodes into one series per depth
  *    level (`series_id = "<file>:<var>:<level>"`), each paired with its
  *    `<var>_QC` flag channel when present — the reference keeps QC==1
  *    ("good_data") samples for fitting, so the flag is a first-class
  *    column rather than pre-filtered.
  *
  * The HDF5 container parsing itself is [[Hdf5Mini]] (pure JVM — no
  * native netCDF/HDF5 bindings exist on plain executors).
  */
object NetCDF {

  val schema: StructType = StructType(Seq(
    StructField("series_id", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType),
    StructField("qc", IntegerType)))

  private final case class VarData(dims: Seq[Long], vals: Array[Double],
      scale: Double, offset: Double, fill: Option[Double],
      qc: Option[Array[Double]])

  /** Decode one netCDF byte payload to rows of (series_id, ts, value, qc),
    * dispatching on the container magic: netCDF-4 (HDF5) via
    * [[Hdf5Mini]], netCDF-3 classic via [[NetCdf3Mini]]. `fileTag`
    * prefixes the series id so unions over many files keep series
    * distinct.
    */
  def decode(bytes: Array[Byte], valueVars: Seq[String], timeVar: String,
      fileTag: String): Iterator[(String, java.sql.Timestamp, java.lang.Double, Integer)] = {
    val (timeUnits, timeRaw, varData) =
      if (bytes.length > 3 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F') {
        val rd = new NetCdf3Mini.Reader(bytes)
        val vars = rd.byName
        val time = vars.getOrElse(timeVar,
          throw new IllegalArgumentException(s"no $timeVar variable"))
        (time.attrs.get("units").map(_.string), rd.readDoubles(time),
          valueVars.map { vn =>
            val v = vars.getOrElse(vn,
              throw new IllegalArgumentException(s"no $vn variable"))
            vn -> VarData(v.dims, rd.readDoubles(v),
              v.attrs.get("scale_factor").map(_.double).getOrElse(1.0),
              v.attrs.get("add_offset").map(_.double).getOrElse(0.0),
              v.attrs.get("_FillValue").map(_.double),
              vars.get(vn + "_QC").map(rd.readDoubles))
          })
      } else {
        val rd = new Hdf5Mini.Reader(bytes)
        val dsets = rd.rootDatasets()
        val time = dsets.getOrElse(timeVar,
          throw new IllegalArgumentException(s"no $timeVar variable"))
        (time.attrs.get("units").map(_.string), rd.readDoubles(time),
          valueVars.map { vn =>
            val v = dsets.getOrElse(vn,
              throw new IllegalArgumentException(s"no $vn variable"))
            vn -> VarData(v.dims, rd.readDoubles(v),
              v.attrDouble("scale_factor").getOrElse(1.0),
              v.attrDouble("add_offset").getOrElse(0.0),
              v.attrDouble("_FillValue"),
              dsets.get(vn + "_QC").map(rd.readDoubles))
          })
      }
    val (epochMicros, unitMicros) =
      parseTimeUnits(timeUnits.getOrElse("seconds since 1970-01-01"))
    val ts = timeRaw.map { t =>
      val m = epochMicros + (t * unitMicros).round
      java.sql.Timestamp.from(Instant.ofEpochSecond(m / 1000000L, m % 1000000L * 1000))
    }
    val tag = if (fileTag.isEmpty) "" else fileTag + ":"
    varData.iterator.flatMap { case (vname, v) =>
      val levels = if (v.dims.length > 1) v.dims(1).toInt else 1
      val nT = v.dims.head.toInt
      for {
        lvl <- (0 until levels).iterator
        i <- (0 until nT).iterator
      } yield {
        val raw = v.vals(i * levels + lvl)
        val isFill = v.fill.contains(raw) || raw.isNaN
        val value: java.lang.Double = if (isFill) null else raw * v.scale + v.offset
        val flag: Integer = v.qc.map(q => Int.box(q(i * levels + lvl).toInt)).orNull
        val sid = if (levels == 1) s"$tag$vname" else s"$tag$vname:$lvl"
        (sid, ts(i), value, flag)
      }
    }
  }

  /** CF time units "days|hours|minutes|seconds since <date>" →
    * (epoch micros, micros per unit).
    */
  private[sources] def parseTimeUnits(units: String): (Long, Long) = {
    val parts = units.trim.split("\\s+since\\s+")
    require(parts.length == 2, s"unparseable time units: '$units'")
    val unitMicros = parts(0).toLowerCase match {
      case u if u.startsWith("day") => 86400000000L
      case u if u.startsWith("hour") => 3600000000L
      case u if u.startsWith("min") => 60000000L
      case u if u.startsWith("sec") => 1000000L
      case u if u.startsWith("milli") => 1000L
      case u => throw new IllegalArgumentException(s"time unit '$u'")
    }
    val dateStr = parts(1).trim.stripSuffix("Z").replace('T', ' ')
    val dt =
      if (dateStr.contains(" ")) LocalDateTime.parse(dateStr.replace(' ', 'T'))
      else LocalDate.parse(dateStr).atStartOfDay()
    (dt.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L, unitMicros)
  }

  /** Read one local netCDF file into a time-series DataFrame (driver-side
    * parse — for the many-file scale path use [[readMany]]).
    */
  def read(spark: SparkSession, path: String, valueVars: Seq[String],
      timeVar: String = "TIME"): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val rows = decode(bytes, valueVars, timeVar, fileTag = "").map {
      case (s, t, v, q) => org.apache.spark.sql.Row(s, t, v, q)
    }.toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 500000)), schema)
  }

  /** Read a directory/glob of netCDF files with parsing distributed over
    * executors: Spark's `binaryFile` source lists and splits the file
    * set, each task decodes its files' bytes locally. Partition count
    * scales with file count — on a cluster this ingests an archive with
    * no driver bottleneck and no shuffle.
    */
  def readMany(spark: SparkSession, pathGlob: String, valueVars: Seq[String],
      timeVar: String = "TIME"): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    val vv = valueVars
    val tv = timeVar
    files.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      val tag = path.split('/').last.stripSuffix(".nc")
      NetCDF.decode(bytes, vv, tv, tag)
    }.toDF("series_id", "ts", "value", "qc")
  }
}
