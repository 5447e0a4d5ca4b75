package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.ts.SparkSpecBase

/** The automaton must agree with naive per-phrase `contains` on every
  * input — including overlap chains, phrases that are suffixes of
  * other phrases (the output-link path), duplicate list entries, and
  * multi-byte UTF-8 — in both interpreted eval and codegen.
  */
class AhoCorasickSpec extends SparkSpecBase {

  private def naive(text: String, phrases: Seq[String]): Int =
    phrases.distinct.count(text.contains)

  test("distinctMatches == naive contains on adversarial cases") {
    val cases = Seq(
      (Seq("ab", "ba", "aba"), Seq("", "a", "ab", "aba", "abab", "bab",
        "xabay", "aaaa", "bbbb", "ababab")),
      // suffix-of-phrase chains exercise output links: "she" ends with
      // "he"; "hers" contains "he" mid-walk
      (Seq("he", "she", "his", "hers"), Seq("ushers", "she", "ahishers",
        "h", "hehehe", "shshsh")),
      // duplicates in the list must not double-count
      (Seq("dog", "dog", "cat"), Seq("dog cat dog", "dog", "bird")),
      // multi-byte UTF-8 phrases; é is 2 bytes, 中 is 3
      (Seq("café", "中文", "é"), Seq("a café in 中文 town",
        "café", "caf", "中")),
      // single-byte phrases (depth-1 fail links back to root)
      (Seq("a", "b", "zz"), Seq("", "a", "ccc", "azb", "zzz")))
    cases.foreach { case (phrases, texts) =>
      val ac = AhoCorasick.build(phrases)
      texts.foreach { t =>
        assert(ac.distinctMatches(UTF8String.fromString(t)) ==
          naive(t, phrases), s"phrases=$phrases text='$t'")
      }
    }
    // property sweep: random texts over a 3-char alphabet vs random
    // short phrase lists (dense overlap structure by construction)
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { _ =>
      val phrases = (0 until (1 + rnd.nextInt(8))).map(_ =>
        (0 until (1 + rnd.nextInt(4))).map(_ =>
          ('a' + rnd.nextInt(3)).toChar).mkString)
      val ac = AhoCorasick.build(phrases)
      (0 until 20).foreach { _ =>
        val t = (0 until rnd.nextInt(40)).map(_ =>
          ('a' + rnd.nextInt(3)).toChar).mkString
        assert(ac.distinctMatches(UTF8String.fromString(t)) ==
          naive(t, phrases), s"phrases=$phrases text='$t'")
      }
    }
  }

  test("expression: codegen projection, null propagation, misuse loud") {
    import spark.implicits._
    val ac = AhoCorasick.build(Seq("quick brown", "lazy dog", "fox"))
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"),
        AcDistinctMatches(col("text"), ac).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1L -> Some(3), 2L -> Some(0), 3L -> None), got)
    // interpreted eval parity (rules out a codegen-only path)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val again = df.select(col("id"),
          AcDistinctMatches(col("text"), ac).as("n"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
      assert(again == got)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val e1 = intercept[IllegalArgumentException] {
      AhoCorasick.build(Seq("ok", ""))
    }
    assert(e1.getMessage.contains("empty phrase"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      AhoCorasick.build(Nil)
    }
    assert(e2.getMessage.contains("empty phrase list"), e2.getMessage)
  }
}
