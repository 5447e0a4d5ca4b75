package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions._

/** SQL front-end registration for the engine's native Catalyst
  * expressions, so a pure-SQL user (spark-sql shell, JDBC, notebooks)
  * can call the codegen'd kernels without touching the Scala API:
  *
  * {{{
  * spark-shell --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT rolling_hash(text) FROM docs")
  * }}}
  *
  * or imperatively on an existing session:
  * `graft.GraftFunctions.register(spark)`.
  *
  * Static parameters (subspace counts, lexicons) are taken as foldable
  * literal arguments and validated at resolution time — a non-literal
  * fails analysis with a clear message rather than planning a
  * per-row-configurable kernel that could never be codegen'd.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(fn: String, args: Seq[Expression], pos: Int): Int = {
    val e = args(pos)
    val integral = e.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(e.foldable && integral,
      s"$fn: argument ${pos + 1} must be a literal integer")
    e.eval() match {
      case n: Number => n.intValue
      case _ => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a non-NULL literal integer")
    }
  }

  private def stringArrayArg(fn: String, args: Seq[Expression], pos: Int): Seq[String] = {
    val e = args(pos)
    require(e.foldable, s"$fn: argument ${pos + 1} must be a literal string array")
    e.eval() match {
      case a: ArrayData =>
        a.toObjectArray(org.apache.spark.sql.types.StringType)
          .map(s => if (s == null) null else s.toString).toSeq
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be an array literal, got $other")
    }
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  /** (name, info, builder) for every SQL-exposable engine expression. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash",
      info("rolling_hash",
        "rolling_hash(str) - Rabin-Karp code-point hash mod 1e9+7"),
      args => { arity("rolling_hash", args, 1); RollingHash(args.head) }),
    ("char_window_hashes",
      info("char_window_hashes",
        "char_window_hashes(str, window_len) - rolling 64-bit hashes of every window_len-char substring"),
      args => {
        arity("char_window_hashes", args, 2)
        CharWindowHashes(args.head, intArg("char_window_hashes", args, 1))
      }),
    ("marker_hits",
      info("marker_hits",
        "marker_hits(tokens, array('the','a')) - count of tokens in the literal lexicon"),
      args => {
        arity("marker_hits", args, 2)
        MarkerHits(args.head, stringArrayArg("marker_hits", args, 1))
      }),
    ("dot_product",
      info("dot_product",
        "dot_product(a, b) - left-to-right double dot product"),
      args => { arity("dot_product", args, 2); DotProductDouble(args(0), args(1)) }),
    ("dot_product_int8",
      info("dot_product_int8",
        "dot_product_int8(a, b) - exact LONG dot product of tinyint code arrays"),
      args => { arity("dot_product_int8", args, 2); DotProductBytes(args(0), args(1)) }),
    ("hyperplane_buckets",
      info("hyperplane_buckets",
        "hyperplane_buckets(vec, tables, planes_per_table, dim) - banded sign-bucket LSH signature"),
      args => {
        arity("hyperplane_buckets", args, 4)
        HyperplaneBuckets(args.head,
          intArg("hyperplane_buckets", args, 1),
          intArg("hyperplane_buckets", args, 2),
          intArg("hyperplane_buckets", args, 3))
      }),
    ("pq_encode",
      info("pq_encode",
        "pq_encode(vec, flat_codebook, n_sub, ksub) - PQ code assignment"),
      args => {
        arity("pq_encode", args, 4)
        PqEncode(args(0), args(1),
          intArg("pq_encode", args, 2), intArg("pq_encode", args, 3))
      }),
    ("pq_lut",
      info("pq_lut",
        "pq_lut(vec, flat_codebook, n_sub, ksub) - per-query ADC lookup table"),
      args => {
        arity("pq_lut", args, 4)
        PqLut(args(0), args(1),
          intArg("pq_lut", args, 2), intArg("pq_lut", args, 3))
      }),
    ("pq_adc_score",
      info("pq_adc_score",
        "pq_adc_score(code, lut, ksub) - approximate dot via ADC table lookups"),
      args => {
        arity("pq_adc_score", args, 3)
        PqAdcScore(args(0), args(1), intArg("pq_adc_score", args, 2))
      }),
    ("hampel_stats",
      info("hampel_stats",
        "hampel_stats(value) - aggregate (median, MAD-sigma) struct over the group"),
      args => {
        arity("hampel_stats", args, 1)
        // the analyzer wraps a bare AggregateFunction in an
        // AggregateExpression, same as the built-in registry entries
        HampelStats(args.head)
      }),
    ("capped_collect",
      info("capped_collect",
        "capped_collect(x, cap) - BIGINT collect_list with a hard buffer cap; a group whose result size exceeds your df bound is known to have overflowed"),
      args => {
        arity("capped_collect", args, 2)
        CappedCollectLong(args.head, intArg("capped_collect", args, 1))
      })
  )

  /** Imperative registration on an already-built session (tests, REPLs
    * that didn't pass spark.sql.extensions).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
