package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) — the interchange format every
  * public training-data release actually ships (Dolma, FineWeb,
  * RedPajama, The Pile): JSON string escaping is what makes it safe for
  * text carrying newlines, quotes, tabs and arbitrary unicode — the
  * failure modes that corrupt CSV corpora silently. Thin by design —
  * Spark's text source + `to_json`/`from_json` do the heavy lifting
  * (splittable scan, predicate-friendly downstream, distributed write)
  * — with two deliberate policies on top:
  *
  *   - WRITES keep null fields (`ignoreNullFields=false`), so every
  *     line carries the full schema and a reader's `from_json` never
  *     has to guess whether an absent key means null or drift;
  *   - STRICT reads fail LOUDLY on the first malformed line (in-plan
  *     `assert_true`, naming the offending prefix) instead of
  *     shrinking the corpus silently — a truncated shard or mojibake
  *     upload should stop the run, not thin it. `strict = false`
  *     degrades to null rows for the salvage path.
  */
object JsonlCorpus {

  /** Write `df` as JSONL at `path`, one object per row, all columns.
    * `compression`: "none", "gzip", … (the text-source codecs).
    */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.select(to_json(struct(df.columns.map(col): _*),
        java.util.Map.of("ignoreNullFields", "false")).as("value"))
      .write.mode("overwrite").option("compression", compression).text(path)

  /** Read JSONL under an EXPLICIT schema (inference over a 100-TB
    * corpus is a full extra pass and a drift hazard; training-data
    * schemas are known). Strict mode fails the first corrupt line.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      strict: Boolean = true): DataFrame = {
    // strict = from_json FAILFAST (PERMISSIVE can't signal corruption:
    // it yields a struct of null FIELDS, indistinguishable in-plan from
    // a legitimate all-null row, so an assert_true on the struct would
    // never fire); permissive = the default null-fields salvage row.
    // Lazy-plan caveat: validation rides the parse, so an action that
    // prunes every column (a bare count()) never parses and never
    // fails — any action that reads a field validates what it reads
    val opts: java.util.Map[String, String] =
      if (strict) java.util.Map.of("mode", "FAILFAST")
      else java.util.Map.of()
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines are not rows
      .select(from_json(col("value"), schema, opts).as("j"))
      .select(col("j.*"))
  }
}
