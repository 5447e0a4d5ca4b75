package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-phrase matcher over UTF-8 BYTES — the blocklist
  * gate at crawl scale. A C4-style bad-words screen asks "does this doc
  * contain ANY of N phrases?" for N in the hundreds-to-tens-of-
  * thousands; a regex alternation is O(text × N) with a compile that
  * degrades superlinearly in N, while one automaton walk is O(text)
  * regardless of N. Matching is on raw UTF-8 bytes: a valid-UTF-8
  * phrase's byte sequence can only begin at a character boundary of
  * valid-UTF-8 text (lead and continuation byte ranges are disjoint),
  * so byte-level containment EQUALS character-level containment —
  * which is exactly what an oracle's `contains(text, phrase)`
  * computes. Case handling is the CALLER's: pass `lower(text)` and
  * lowercase phrases (the engine never invents its own folding, so
  * the oracle's `lower()` states the same relation).
  *
  * Built once driver-side and shipped as a plan reference object (the
  * [[BloomMightContain]] discipline) — broadcast with the serialized
  * plan, probed inside whole-stage codegen, no UDF.
  *
  * The automaton stores per-state sorted byte edges (binary search on
  * walk), BFS fail links, and output links (nearest suffix state that
  * terminates a phrase), the textbook construction.
  */
final class AhoCorasick private (
    edgeBytes: Array[Array[Byte]], edgeTo: Array[Array[Int]],
    fail: Array[Int], patternOf: Array[Int], outLink: Array[Int],
    val nPatterns: Int) extends Serializable {

  @transient private lazy val scratch =
    new ThreadLocal[Array[Long]] {
      override def initialValue(): Array[Long] =
        new Array[Long]((nPatterns + 63) / 64)
    }

  private def step(state0: Int, b: Byte): Int = {
    var state = state0
    while (true) {
      val bytes = edgeBytes(state)
      val i = java.util.Arrays.binarySearch(bytes, b)
      if (i >= 0) return edgeTo(state)(i)
      if (state == 0) return 0
      state = fail(state)
    }
    0 // unreachable
  }

  /** Number of DISTINCT phrases occurring in `text` (each phrase
    * counted once however many times it appears).
    */
  def distinctMatches(text: UTF8String): Int = {
    val bits = scratch.get()
    java.util.Arrays.fill(bits, 0L)
    val bytes = text.getBytes
    var state = 0
    var found = 0
    var i = 0
    while (i < bytes.length && found < nPatterns) {
      state = step(state, bytes(i))
      var s = if (patternOf(state) >= 0) state else outLink(state)
      while (s >= 0) {
        val p = patternOf(s)
        val w = p >>> 6
        val m = 1L << (p & 63)
        if ((bits(w) & m) == 0L) { bits(w) |= m; found += 1 }
        s = outLink(s)
      }
      i += 1
    }
    found
  }
}

object AhoCorasick {

  /** Build over the DISTINCT phrases (duplicates collapse — "distinct
    * phrases matched" must not double-count a twice-listed phrase).
    * Empty phrases are refused loudly: the empty byte string matches
    * everywhere and silently turns the gate into drop-all.
    */
  def build(phrases: Seq[String]): AhoCorasick = {
    val distinct = phrases.distinct
    require(distinct.nonEmpty, "AhoCorasick.build: empty phrase list")
    require(distinct.forall(_.nonEmpty),
      "AhoCorasick.build: empty phrase — it matches every document " +
        "and silently turns the gate into drop-all")
    // growable trie: per-node insertion-ordered edge maps
    val edges = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.LinkedHashMap.empty[Byte, Int])
    val pattern = scala.collection.mutable.ArrayBuffer(-1)
    distinct.zipWithIndex.foreach { case (ph, pid) =>
      var node = 0
      ph.getBytes("UTF-8").foreach { b =>
        node = edges(node).getOrElseUpdate(b, {
          edges += scala.collection.mutable.LinkedHashMap.empty[Byte, Int]
          pattern += -1
          edges.size - 1
        })
      }
      pattern(node) = pid
    }
    val n = edges.size
    val fail = new Array[Int](n)
    val out = Array.fill(n)(-1)
    val queue = scala.collection.mutable.Queue.empty[Int]
    edges(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      edges(u).foreach { case (b, c) =>
        var f = fail(u)
        while (f != 0 && !edges(f).contains(b)) f = fail(f)
        fail(c) = edges(f).get(b).filter(_ != c).getOrElse(0)
        out(c) = if (pattern(fail(c)) >= 0) fail(c) else out(fail(c))
        queue += c
      }
    }
    val eb = new Array[Array[Byte]](n)
    val et = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val sorted = edges(i).toArray.sortBy(_._1)
      eb(i) = sorted.map(_._1)
      et(i) = sorted.map(_._2)
      i += 1
    }
    new AhoCorasick(eb, et, fail, pattern.toArray, out, distinct.size)
  }
}

/** `distinctMatches` as a codegen scalar: one automaton walk per row
  * inside whole-stage codegen. NULL text yields NULL (the usual
  * null-propagating scalar contract — gates coalesce upstream).
  */
case class AcDistinctMatches(child: Expression, ac: AhoCorasick)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    ac.distinctMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("acAutomaton", ac,
        classOf[AhoCorasick].getName)
      s"${ev.value} = $ref.distinctMatches($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AcDistinctMatches {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(text: Column, ac: AhoCorasick): Column =
    ColumnBridge.column(AcDistinctMatches(ColumnBridge.expression(text), ac))
}
