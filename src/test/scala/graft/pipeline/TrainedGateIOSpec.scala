package graft.pipeline

import org.apache.spark.sql.functions._
import graft.ts.SparkSpecBase

/** The persisted-weights serve path (r13: the p90 build-once artifact)
  * must be indistinguishable from the in-line trainAndServe — same
  * rows, same certificate — and the envelope validation must refuse a
  * mismatched load loudly.
  */
class TrainedGateIOSpec extends SparkSpecBase {

  private def labeled = {
    val spark = this.spark
    import spark.implicits._
    (0L until 40L).map { i =>
      val good = i % 2 == 0
      val text =
        if (good) s"the committee published findings $i after careful review"
        else s"click here buy now free offer $i cheap deals click"
      (i, if (good) "good" else "bad", text)
    }.toDF("doc_id", "weak_label", "text")
  }

  test("save/load round-trip serves identically to trainAndServe") {
    val dir = java.nio.file.Files.createTempDirectory("gateio").toString
    val classes = Seq("good", "bad")
    val train = labeled.filter(col("doc_id") % 4 < 2)
    val held = labeled.filter(col("doc_id") % 4 >= 2)
    val inline = TextClassifier.trainAndServe(train, held, "doc_id",
      "weak_label", "text", classes, b = 64, maxSamples = 100,
      agreementFloor = 0.0, fast = true)
    val w = TextClassifier.trainFromDF(train, "doc_id", "weak_label",
      "text", classes, 64, TextClassifier.bucketsRing(_, 64), 100)
    TextClassifier.saveWeights(spark, s"$dir/w", classes, 64, fast = true, w)
    val loaded = TextClassifier.loadWeights(spark, s"$dir/w", classes, 64,
      fast = true)
    assert(loaded == w)
    val served = TextClassifier.serveCertified(held, "doc_id", "weak_label",
      "text", classes, 64, loaded, agreementFloor = 0.0, fast = true)
    val a = inline.orderBy("doc_id").collect().toSeq
    val b = served.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("mismatched envelope refuses to load") {
    val dir = java.nio.file.Files.createTempDirectory("gateio2").toString
    val classes = Seq("good", "bad")
    val w = TextClassifier.trainFromDF(labeled, "doc_id", "weak_label",
      "text", classes, 64, TextClassifier.bucketsRing(_, 64), 100)
    TextClassifier.saveWeights(spark, s"$dir/w", classes, 64, fast = true, w)
    val e = intercept[IllegalArgumentException] {
      TextClassifier.loadWeights(spark, s"$dir/w", classes, 64, fast = false)
    }
    assert(e.getMessage.contains("envelope"))
  }
}
