package graft.sources

import org.apache.spark.sql.functions._

/** One-off generator for `src/test/resources/golden/cmems_temp0.csv`:
  * the first 8000 samples of the CMEMS fixture's TEMP:0 series as
  * decoded by [[NetCDF.read]] (ts, value, qc).
  *
  * The committed CSV is the INPUT to `scripts/gen_cmems_golden.py`,
  * which runs the reference's pandas detectors over the exact same
  * numbers to produce `golden/cmems_masks.csv` — closing the loop
  * "reader feeds detectors the same numbers pandas saw" (the decode
  * itself is pinned independently by NetCdfSourceSpec's byte-level
  * spot checks). Re-run (`sbt "Test/runMain graft.sources.DumpCmemsGolden"`,
  * then the python script) only if the reader's decode changes.
  */
object DumpCmemsGolden {
  def main(args: Array[String]): Unit = {
    val spark = graft.ts.SparkSpecBase.session
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val rows = NetCDF.read(spark,
        "/root/reference/tests/data/BO_TS_MO_FINO2.nc", valueVars = Seq("TEMP"))
      .filter(col("series_id") === "TEMP:0")
      .orderBy("ts").limit(8000)
      .select("ts", "value", "qc")
      .collect()
    val out = new java.io.PrintWriter("src/test/resources/golden/cmems_temp0.csv")
    try {
      out.println("ts,value,qc")
      rows.foreach { r =>
        val ts = r.getTimestamp(0).toLocalDateTime.format(fmt)
        val v = if (r.isNullAt(1)) "" else r.getDouble(1).toString
        out.println(s"$ts,$v,${r.getInt(2)}")
      }
    } finally out.close()
    println(s"wrote ${rows.length} rows")
    spark.stop()
  }
}
