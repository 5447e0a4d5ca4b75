package graft

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The SQL front-end registrations (GraftExtensions / GraftFunctions)
  * must resolve, codegen, and return exactly what the Scala Column API
  * returns — a pure-SQL user gets the same kernels.
  */
class SqlFunctionsSpec extends SparkSpecBase {

  // registration is idempotent — safe at spec construction
  GraftFunctions.register(spark)

  test("rolling_hash and marker_hits resolve in SQL and match the Column API") {
    import spark.implicits._
    Seq((1L, "the quick brown fox"), (2L, "naïve café 中文"), (3L, ""))
      .toDF("id", "text").createOrReplaceTempView("t_sql_docs")
    val viaSql = spark.sql(
      """SELECT id, rolling_hash(text) AS fp,
                marker_hits(split(text, ' '), array('the', 'fox')) AS hits
         FROM t_sql_docs""").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaApi = spark.table("t_sql_docs")
      .select(col("id"),
        graft.functions.RollingHash(col("text")).as("fp"),
        graft.functions.MarkerHits(split(col("text"), " "), Seq("the", "fox")).as("hits"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaSql == viaApi)
    assert(viaSql(1L)._2 == 2L)
  }

  test("char_window_hashes resolves in SQL and matches the Column API") {
    import spark.implicits._
    Seq((1L, "abcdefgh"), (2L, "naïve café"), (3L, "ab"))
      .toDF("id", "text").createOrReplaceTempView("t_sql_cwh")
    val viaSql = spark.sql(
      "SELECT id, char_window_hashes(text, 3) AS h FROM t_sql_cwh")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = spark.table("t_sql_cwh")
      .select(col("id"),
        graft.functions.CharWindowHashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
    assert(viaSql(1L).length == 6) // 8 chars → 6 windows of 3
    assert(viaSql(3L).isEmpty)     // shorter than the window
  }

  test("dot products, PQ kernels and LSH signature resolve in SQL") {
    val row = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                dot_product_int8(array(1Y, 2Y), array(3Y, 4Y)) AS dpb,
                pq_encode(array(0.9d, 0.1d), array(0.0d, 1.0d), 2, 1) AS enc,
                pq_adc_score(array(0, 0), array(0.5d, 0.25d), 1) AS adc,
                size(hyperplane_buckets(array(1.0d, -1.0d), 2, 4, 2)) AS nb""").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 11L)
    assert(row.getSeq[Int](2) == Seq(0, 0))
    assert(row.getDouble(3) == 0.75)
    assert(row.getInt(4) == 2)
  }

  test("hampel_stats aggregates in SQL groups") {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("b", 5.0))
      .toDF("k", "v").createOrReplaceTempView("t_sql_vals")
    val got = spark.sql(
      "SELECT k, hampel_stats(v) AS hs FROM t_sql_vals GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getStruct(1).toString).toMap
    val api = spark.table("t_sql_vals").groupBy("k")
      .agg(graft.functions.HampelStats(col("v")).as("hs"))
      .collect().map(r => r.getString(0) -> r.getStruct(1).toString).toMap
    assert(got == api && got.size == 2)
  }

  test("capped_collect caps hot groups; small groups collect fully and sorted") {
    import spark.implicits._
    (Seq.fill(10)("hot" -> 7L) ++ Seq("cold" -> 3L, "cold" -> 1L))
      .toDF("k", "v").createOrReplaceTempView("t_sql_cc")
    val got = spark.sql(
      "SELECT k, capped_collect(v, 4) AS vs FROM t_sql_cc GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("cold") == Seq(1L, 3L))          // full, sorted
    assert(got("hot").length == 4)              // hard-capped, never 10
    assert(got("hot").forall(_ == 7L))
  }

  test("non-literal static parameters fail analysis loudly") {
    import spark.implicits._
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("t_sql_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT pq_adc_score(array(0), array(0.5d), a) FROM t_sql_bad")
        .collect()
    }
    assert(err.getMessage.contains("literal integer")
      || Option(err.getCause).exists(_.getMessage.contains("literal integer")))
  }
}
