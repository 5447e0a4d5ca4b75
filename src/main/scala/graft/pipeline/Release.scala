package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

/** The last step of the crawl → clean → datasheet loop: SHIP the
  * surviving corpus. One call writes deterministic JSONL shards and
  * proves, before returning, that what landed on disk is byte-for-byte
  * the relation that was handed in — a release that cannot silently
  * drop rows, mangle escapes, or reorder fields.
  *
  * Reference scope note: persistence round-trips are the reference's
  * §2.3 save/load discipline (tsod persists detectors; a data engine
  * persists corpora); the JSONL + shard layout is the public release
  * convention (Dolma, FineWeb, The Pile all ship sharded JSONL).
  */
object Release {

  /** Export `corpus` as `nShards` deterministic JSONL shards under
    * `path` (layout `path/shard=K/part-*.txt[.gz]`), then read every
    * shard back under the corpus's own schema and require count +
    * full-column-checksum identity — the p96 round-trip check made a
    * release invariant. Returns the released row count.
    *
    *   - Shard membership is `Sharding.shardId(salt, id, nShards)` —
    *     a pure function, so a re-release of the same corpus produces
    *     the same shard for every doc (resumable uploads, stable
    *     diffing between releases).
    *   - Rows are sorted by (shard, id) within files: deterministic
    *     bytes for a given corpus, and consumers stream docs in id
    *     order per shard.
    *   - The identity certificate re-scans the input relation once
    *     (count + TWO order-insensitive combiners of the full-column
    *     xxhash64 — bit_xor AND an exact decimal sum, see
    *     [[verifyRelease]]) and scans the written files once. Callers releasing
    *     an expensive derivation (e.g. [[Dedup.cleanCorpusV2]]
    *     survivors) should hand in a persisted frame — the chain's
    *     internal barriers make the re-scan cheap, but only while
    *     they are cached.
    *   - Float columns: JSON text round-trips are only identity-safe
    *     for integral/string/boolean columns; release numeric scores
    *     as strings or fixed-point longs (the engine's money/micro-nat
    *     discipline) if they must survive bit-exactly.
    */
  def releaseCorpus(corpus: DataFrame, idCol: String, path: String,
      nShards: Int = 64, compression: String = "gzip",
      salt: String = "release"): Long = {
    require(nShards > 0, "releaseCorpus: nShards must be positive")
    val spark = corpus.sparkSession
    val cols = corpus.columns
    require(cols.contains(idCol), s"releaseCorpus: no $idCol column")
    require(!cols.contains("shard"),
      "releaseCorpus: the corpus already has a 'shard' column — it would " +
        "be overwritten by the layout column before serialization " +
        "(rename it, or drop it if it is a previous release's)")
    corpus
      .withColumn("shard", Sharding.shardId(col(idCol), nShards, salt))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .select(col("shard"),
        to_json(struct(cols.map(col): _*),
          java.util.Map.of("ignoreNullFields", "false")).as("value"))
      .write.mode("overwrite").option("compression", compression)
      .partitionBy("shard").text(path)
    verifyRelease(corpus, path)
  }

  /** The identity certificate, callable on its own (audit a release
    * later, or after a copy between stores): schema-read every field of
    * every shard back (partition discovery adds the shard column; the
    * schema projection drops it) and require count + order-insensitive
    * full-column-checksum equality against `corpus`. Returns the row
    * count; throws on ANY divergence.
    */
  def verifyRelease(corpus: DataFrame, path: String): Long = {
    val spark = corpus.sparkSession
    val cols = corpus.columns
    val back = JsonlCorpus.read(spark, path, corpus.schema)
    // TWO order-insensitive combiners over the row hashes, because one
    // alone is weaker: XOR cancels in PAIRS (replacing a duplicated row
    // pair {A,A} with junk {B,B} passes count + xor), while the
    // wide-decimal SUM is duplicate-sensitive but additive-forgeable in
    // ways xor would catch. The combined check is PROBABILISTIC, not a
    // multiset identity — counterexamples that preserve count, xor and
    // sum simultaneously exist (e.g. hashes {1,2} → {0,3}) — but any
    // such change must collide all three over 64-bit-hash images of the
    // rows, which corruption and truncation do not do by accident.
    // Strictly stronger than xor alone. The sum is decimal(38,0) —
    // xxhash64 sums overflow a BIGINT at ~2^33 rows, and decimal
    // addition is exact (an overflow would NULL-coalesce to 0, itself
    // astronomically unreachable below ~10^19 rows).
    def sig(df: DataFrame): (Long, Long, java.math.BigDecimal) = {
      val h = xxhash64(cols.map(col): _*)
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(h), lit(0L)),
        coalesce(sum(h.cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getLong(1), r.getDecimal(2))
    }
    val (n0, x0, s0) = sig(corpus)
    val (n1, x1, s1) = sig(back)
    require(n0 == n1 && x0 == x1 && s0.compareTo(s1) == 0,
      s"releaseCorpus: read-back mismatch at $path — wrote $n0 rows " +
        s"(xor $x0, sum $s0), read $n1 (xor $x1, sum $s1); the release " +
        "is NOT the corpus")
    n0
  }
}
