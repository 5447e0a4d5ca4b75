package graft.relational

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

class ScaleSpec extends SparkSpecBase {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of the big side hits one key — the classic hot-key shape
    val big = spark.range(20000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = big.join(small, Seq("k")).agg(
      count(lit(1)), sum("payload"), sum("v")).head()
    val salted = Scale.saltedJoin(big, small, "k", saltFactor = 8).agg(
      count(lit(1)), sum("payload"), sum("v")).head()
    assert(plain == salted)
    // left joins preserve unmatched rows too
    val plainLeft = big.join(small.filter(col("k") < 5), Seq("k"), "left")
      .agg(count(lit(1)), sum("v")).head()
    val saltedLeft = Scale.saltedJoin(big, small.filter(col("k") < 5), "k", 8, "left")
      .agg(count(lit(1)), sum("v")).head()
    assert(plainLeft == saltedLeft)
    // semi/anti preserve big-side multiplicity
    val plainAnti = big.join(small.filter(col("k") < 5), Seq("k"), "left_anti").count()
    assert(Scale.saltedJoin(big, small.filter(col("k") < 5), "k", 8, "left_anti")
      .count() == plainAnti)
    // small-side-preserving joins are rejected (they would duplicate rows)
    intercept[IllegalArgumentException](
      Scale.saltedJoin(big, small, "k", 8, "full"))
  }

  test("bucketed tables join without an Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Scale.bucketizeForJoin(spark, li, o, "l_orderkey", 8, "li_b", "o_b", wh)
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"plan had a shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
