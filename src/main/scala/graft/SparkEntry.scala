package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query; each has
  * a DuckDB-runnable oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the tsod core — an ensemble of detectors scored in a single pass over
    * the events series.
    */
  def entry(spark: SparkSession): DataFrame =
    relational.DetectorQueries.queries("det_combined")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++
      relational.DetectorQueries.queries ++
      relational.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracle ++
      relational.DetectorQueries.oracle ++
      relational.PipelineQueries.oracle
}
