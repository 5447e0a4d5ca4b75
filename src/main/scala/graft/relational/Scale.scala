package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: skew-salted joins and bucketed co-located joins —
  * the two shuffle-shaping techniques AQE cannot always supply on its
  * own (extreme single-key skew in non-sortmerge paths; repeated joins
  * over the same key at 100 TB where one up-front bucketing pays for
  * every later join).
  */
object Scale {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `saltFactor` sub-partitions. The big side gets a random
    * salt per row; the small side is replicated `saltFactor`× with every
    * salt value, so each (key, salt) pair meets exactly once — results
    * are identical to the plain join, but a single hot key now lands on
    * `saltFactor` reducers instead of one.
    *
    * Use when a handful of keys dominate (power-law user activity, null
    * buckets); prefer plain joins + AQE skew handling otherwise.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each UNMATCHED small row once per salt
    // replica — only big-side-preserving join types are sound here
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write both sides bucketed by the join key into the session catalog,
    * so every subsequent join on that key is exchange-free (bucketed
    * scan feeds SortMergeJoin directly). Returns the two catalog table
    * names. At warehouse scale you run this once at ingest; local tests
    * assert the joined plan contains no Exchange.
    */
  def bucketizeForJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String,
      basePath: String): (String, String) = {
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"$basePath/$name")
        .saveAsTable(name)
    write(left, leftName)
    write(right, rightName)
    (leftName, rightName)
  }
}
