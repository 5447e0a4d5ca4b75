package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ts.SeriesSpec

/** CSV time-series ingestion mirroring the reference corpus' inputs
  * (`tests/data/example.csv`: header `datetime,value`;
  * `docs/getting_started.rst:58-62` selects one column of a datetime-
  * indexed frame). Produces the engine-canonical
  * `(series_id?, ts, value)` schema with NaN → NULL on ingest
  * (SURVEY.md §1.2).
  *
  * NetCDF/dfs0 from the reference notebooks stay out of scope
  * (pre-convert to parquet; SURVEY.md §2.4).
  */
object TimeSeriesCSV {

  /** Read `tsCol,valueCol` (+ optional series id column) from CSV with a
    * header row. Unparseable timestamps/values become NULL rather than
    * failing the job (PERMISSIVE ingest — bad sensor lines are data, not
    * errors, at fleet scale).
    */
  def read(spark: SparkSession, path: String,
      tsCol: String = "datetime", valueCol: String = "value",
      seriesIdCol: Option[String] = None,
      tsFormat: Option[String] = None): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
    // try_* variants: ANSI mode (Spark 4 default) makes plain casts THROW
    // on malformed input; bad sensor lines must become NULLs instead
    val ts = tsFormat match {
      case Some(fmt) => try_to_timestamp(col(tsCol), lit(fmt))
      case None => try_to_timestamp(col(tsCol))
    }
    val value = {
      val d = col(valueCol).try_cast(DoubleType)
      nanvl(d, lit(null).cast(DoubleType)) // "NaN" strings → NaN → NULL
    }
    val base = raw.select(
      (seriesIdCol.map(c => col(c).as("series_id")).toSeq :+
        ts.as("ts") :+ value.as("value")): _*)
    base
  }

  /** The SeriesSpec matching [[read]]'s output. */
  def spec(withSeriesId: Boolean): SeriesSpec =
    if (withSeriesId) SeriesSpec(seriesId = Seq("series_id"))
    else SeriesSpec()
}
