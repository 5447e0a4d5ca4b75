package graft.pipeline

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** [[HeavyHitters.frequentNgrams]] — sketch-pruned heavy n-grams must
  * equal the exact full-shuffle relation whenever the Misra-Gries
  * certificate admits the run, and must REFUSE (loudly) when capacity
  * is too small for the guarantee, never return a silently incomplete
  * answer.
  */
class HeavyHittersSpec extends SparkSpecBase {
  import graft.pipeline.TextOps.tokens

  // 4000 unique-tail words (every doc contributes one never-repeated
  // word) + planted heavies: far more distinct grams than `capacity`,
  // so partial buffers genuinely evict — the sketch is exercised, not
  // just a pass-through map
  private def corpus() = {
    val heavies =
      Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
        Seq.fill(15)("gamma") ++ Seq.fill(14)("nearmiss")
    val rows = (0 until 4000).map(i => (i.toLong, s"tail$i")) ++
      heavies.zipWithIndex.map { case (w, i) => ((10000 + i).toLong, w) }
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  test("sketch-pruned result == exact groupBy relation (unigrams, real evictions)") {
    val c = corpus()
    // total = 4094 grams, capacity 512 -> MG error bound 7.98; floor 15
    // clears it, so the certificate admits the run while distinct
    // (4004) >> capacity forces evictions in every partial
    val got = HeavyHitters.frequentNgrams(spark, c, "text", n = 1,
        phiInverse = 1000000L, minFloor = 15L, capacity = 512)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("alpha", 40L), ("beta", 25L), ("gamma", 15L)),
      got.toSeq) // nearmiss(14) excluded by the EXACT count, not the sketch
    val exact = c.select(explode(tokens(col("text"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 15).orderBy(col("cnt").desc, col("gram"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq)
    CacheLedger.drain()
  }

  test("3-gram form matches the exact relation on repeated phrases") {
    val phrase = "the quick brown fox jumps"
    val rows = (0 until 30).map(i => (i.toLong, s"$phrase uniq$i end")) ++
      (100 until 140).map(i => (i.toLong, s"only once here uniq$i tail"))
    val c = spark.createDataFrame(rows).toDF("doc_id", "text")
    val got = HeavyHitters.frequentNgrams(spark, c, "text", n = 3,
        phiInverse = 1000000L, minFloor = 10L, capacity = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = c.select(tokens(col("text")).as("t"))
      .select(explode(Quality.ngrams(col("t"), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10).orderBy(col("cnt").desc, col("gram"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq, s"got=${got.toSeq}")
    // the shared phrase's interior 3-grams are the heavies
    assert(got.exists(_._1 == "the quick brown") &&
      got.exists(_._1 == "quick brown fox"), got.toSeq)
    CacheLedger.drain()
  }

  test("capacity below the deficiency bound fails loudly, never truncates") {
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.frequentNgrams(spark, corpus(), "text", n = 1,
        phiInverse = 1000000L, minFloor = 15L, capacity = 64)
    }
    assert(e.getMessage.contains("capacity too small"), e.getMessage)
    assert(e.getMessage.contains("retry with capacity >"), e.getMessage)
    CacheLedger.drain()
  }

  test("verify pass joins the BROADCAST candidate set before the count") {
    val plan = HeavyHitters.frequentNgrams(spark, corpus(), "text", n = 1,
        phiInverse = 1000000L, minFloor = 15L, capacity = 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    CacheLedger.drain()
  }
}
