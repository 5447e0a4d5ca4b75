package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All `windowLen`-code-point sliding-window hashes of a string in ONE
  * pass: element i (0-based) is the polynomial hash (base 31, wraparound
  * 64-bit ring arithmetic) of the code points [i, i+windowLen). Returns
  * an empty array when the string is shorter than the window.
  *
  * This is the O(n) kernel of character-level duplicated-substring
  * removal (the suffix-array regime of Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", restated as a rolling
  * window): hashing each window independently would cost O(n·L) — at a
  * 100 TB corpus that factor-of-L matters more than any constant. The
  * rolling update is h' = h·31 + cp_in − cp_out·31^L in Z/2^64, exact
  * ring arithmetic with no mod operations in the loop.
  *
  * Collision caveat (same class as the 60-bit gram hash of
  * [[graft.pipeline.Dedup.removeDuplicateSpans]]): two DIFFERENT windows
  * colliding in the 64-bit ring would mark non-duplicate text.
  * Birthday bound ≈ w²/2⁶⁵ for w distinct windows — negligible below
  * ~10⁹ windows; at true corpus scale verify candidates against the
  * real substrings or widen the key.
  *
  * UTF-8 walk shares [[RollingHash]]'s truncation guard: a dangling
  * multi-byte lead (unvalidated binary→string casts produce them)
  * counts as a lone code point instead of reading past the buffer.
  */
case class CharWindowHashes(child: Expression, windowLen: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(windowLen >= 2, s"window length must be >= 2, got $windowLen")

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      CharWindowHashes.hashes(input.asInstanceOf[UTF8String], windowLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("b")
      val nb = ctx.freshName("nb")
      val nc = ctx.freshName("nc")
      val cps = ctx.freshName("cps")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cp = ctx.freshName("cp")
      val c0 = ctx.freshName("c0")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val pL = CharWindowHashes.pow31(windowLen)
      // sequential shift-accumulate statements (janino mis-parses a
      // parenthesized shift followed by `|` as a cast — RollingHash note)
      // cps is sized by BYTE length, and the window count uses the walk's
      // own code-point count $ci — numChars() disagrees with the guarded
      // walk on truncated sequences (it skips by lead-byte width, the
      // walk degrades to lone code points), and trusting it would
      // overflow the buffer on exactly the malformed inputs the guard
      // exists for
      s"""
         |byte[] $b = $a.getBytes();
         |int $nb = $b.length;
         |int[] $cps = new int[$nb];
         |int $ci = 0;
         |int $i = 0;
         |while ($i < $nb) {
         |  int $c0 = $b[$i] & 0xFF;
         |  int $cp;
         |  if ($c0 < 0x80) { $cp = $c0; $i += 1; }
         |  else if ($c0 < 0xE0) {
         |    if ($i + 1 < $nb) {
         |      $cp = $c0 & 0x1F;
         |      $cp = ($cp << 6) + ($b[$i + 1] & 0x3F);
         |      $i += 2;
         |    } else { $cp = $c0; $i += 1; }
         |  } else if ($c0 < 0xF0) {
         |    if ($i + 2 < $nb) {
         |      $cp = $c0 & 0x0F;
         |      $cp = ($cp << 6) + ($b[$i + 1] & 0x3F);
         |      $cp = ($cp << 6) + ($b[$i + 2] & 0x3F);
         |      $i += 3;
         |    } else { $cp = $c0; $i += 1; }
         |  } else {
         |    if ($i + 3 < $nb) {
         |      $cp = $c0 & 0x07;
         |      $cp = ($cp << 6) + ($b[$i + 1] & 0x3F);
         |      $cp = ($cp << 6) + ($b[$i + 2] & 0x3F);
         |      $cp = ($cp << 6) + ($b[$i + 3] & 0x3F);
         |      $i += 4;
         |    } else { $cp = $c0; $i += 1; }
         |  }
         |  $cps[$ci] = $cp;
         |  $ci += 1;
         |}
         |int $nc = $ci;
         |long[] $out;
         |if ($nc < $windowLen) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$nc - $windowLen + 1];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $nc; $j++) {
         |    $h = $h * 31L + $cps[$j];
         |    if ($j >= $windowLen) $h -= $cps[$j - $windowLen] * ${pL}L;
         |    if ($j >= ${windowLen - 1}) $out[$j - ${windowLen - 1}] = $h;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharWindowHashes {

  /** 31^n in the Z/2^64 wraparound ring. */
  def pow31(n: Int): Long = {
    var p = 1L
    var i = 0
    while (i < n) { p *= 31L; i += 1 }
    p
  }

  /** Interpreted path — identical walk and ring arithmetic to the
    * generated code.
    */
  def hashes(s: UTF8String, windowLen: Int): Array[Long] = {
    val b = s.getBytes
    val nb = b.length
    // sized by bytes, counted by the walk — numChars() disagrees with
    // the guarded walk on truncated sequences (see codegen note)
    val cps = new Array[Int](nb)
    var ci = 0
    var i = 0
    while (i < nb) {
      val c0 = b(i) & 0xFF
      var cp = 0
      if (c0 < 0x80) { cp = c0; i += 1 }
      else if (c0 < 0xE0) {
        if (i + 1 < nb) { cp = ((c0 & 0x1F) << 6) | (b(i + 1) & 0x3F); i += 2 }
        else { cp = c0; i += 1 }
      } else if (c0 < 0xF0) {
        if (i + 2 < nb) {
          cp = ((c0 & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
          i += 3
        } else { cp = c0; i += 1 }
      } else {
        if (i + 3 < nb) {
          cp = ((c0 & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
            ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
          i += 4
        } else { cp = c0; i += 1 }
      }
      cps(ci) = cp
      ci += 1
    }
    val nc = ci
    if (nc < windowLen) Array.emptyLongArray
    else {
      val pL = pow31(windowLen)
      val out = new Array[Long](nc - windowLen + 1)
      var h = 0L
      var j = 0
      while (j < nc) {
        h = h * 31L + cps(j)
        if (j >= windowLen) h -= cps(j - windowLen) * pL
        if (j >= windowLen - 1) out(j - windowLen + 1) = h
        j += 1
      }
      out
    }
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(s: Column, windowLen: Int): Column =
    ColumnBridge.column(CharWindowHashes(ColumnBridge.expression(s), windowLen))
}
