package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ts.SparkSpecBase

/** Pins the codegen'd RollingHash / MarkerHits expressions to the exact
  * semantics of the round-3 HOF formulations they replaced (per-char
  * `regexp_extract_all(".") + ascii` aggregate; per-token `array_contains`
  * filter) — the DuckDB oracles were written against those, so drift here
  * would silently break p10/p11 hash-exactness.
  */
class RollingHashSemanticsSpec extends SparkSpecBase {

  private val texts = Seq(
    "the quick brown fox",
    "  leading   and trailing   ws  ",
    "MIXED Case Tokens",
    "punctuation, everywhere! (yes)",
    "accented élève naïve über", // 2-byte UTF-8
    "cjk 中文文本 and 日本語", // 3-byte UTF-8
    "emoji 😀 and 🤖 robots", // 4-byte UTF-8 (surrogate pairs)
    "", // empty -> hash 0
    "a" // single char
  )

  private def df = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType, nullable = true)))
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) } :+
      Row(99L, null)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def legacyFingerprint(text: org.apache.spark.sql.Column) = {
    val norm = concat_ws(" ", graft.pipeline.TextOps.tokens(text))
    val chars = regexp_extract_all(norm, lit("."), lit(0))
    aggregate(
      transform(chars, c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % graft.pipeline.TextOps.HashPrime)
  }

  test("RollingHash matches the legacy HOF fingerprint on multilingual text") {
    val got = df.select(
        col("id"),
        graft.pipeline.TextOps.fingerprint(col("text")).as("fp"),
        legacyFingerprint(col("text")).as("legacy"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broke on id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"fp mismatch on id=${r.getLong(0)}")
    }
    // empty text hashes to the fold seed
    val empty = got.find(_.getLong(0) == 7L).get
    assert(empty.getLong(1) == 0L)
  }

  test("RollingHash interpreted eval agrees with codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    texts.foreach { t =>
      val norm = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
      var acc = 0L
      norm.codePoints().forEach(cp => acc = (acc * 31 + cp) % 1000000007L)
      assert(RollingHash.hash(UTF8String.fromString(norm)) == acc, s"on: $t")
    }
  }

  test("RollingHash degrades gracefully on truncated UTF-8 (no array read past end)") {
    import org.apache.spark.unsafe.types.UTF8String
    // Spark does not validate a binary→string cast, so an expression can
    // receive bytes that end mid-sequence; the hash must treat the
    // dangling lead byte as a lone code point instead of throwing.
    val truncated = Seq(
      Array(0xE4, 0xB8).map(_.toByte),              // 3-byte lead, 1 continuation
      Array(0xF0, 0x9F, 0x98).map(_.toByte),        // 4-byte lead, 2 continuations
      Array('a'.toByte, 0xC3.toByte),               // ascii then dangling 2-byte lead
      Array(0xC3).map(_.toByte))                    // lone 2-byte lead
    truncated.foreach { bytes =>
      val s = UTF8String.fromBytes(bytes)
      val h = RollingHash.hash(s) // must not throw
      assert(h >= 0L && h < 1000000007L)
    }
    // and the codegen path agrees: run the truncated bytes through a
    // binary→string cast inside a query
    val rows = truncated.zipWithIndex.map { case (b, i) => Row(i.toLong, b) }
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("raw", BinaryType)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val got = d.select(col("id"),
        RollingHash(col("raw").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truncated.zipWithIndex.foreach { case (b, i) =>
      assert(got(i.toLong) == RollingHash.hash(UTF8String.fromBytes(b)),
        s"codegen/interpreted divergence on fixture $i")
    }
  }

  test("MarkerHits matches the legacy array_contains filter, with multiplicity") {
    val markers = graft.pipeline.TextOps.LangMarkers.toMap.apply("en")
    val toks = graft.pipeline.TextOps.tokens(col("text"))
    val m = array(markers.map(lit): _*)
    val legacy = size(filter(toks, t => array_contains(m, t))).cast("long")
    val extra = Seq((100L, "the the the of of a"), (101L, "der die das"))
    val d = df.union(spark.createDataFrame(
      spark.sparkContext.parallelize(extra.map(r => Row(r._1, r._2)), 1),
      df.schema))
    val got = d.select(col("id"),
        graft.pipeline.TextOps.markerHits(toks, markers).as("hits"),
        legacy.as("legacy_hits"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broke on id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"hits mismatch on id=${r.getLong(0)}")
    }
    assert(got.find(_.getLong(0) == 100L).get.getLong(1) == 6L)
  }
}
