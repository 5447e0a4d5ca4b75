package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.CacheLedger.TrackedPersist
import graft.ts.SparkSpecBase

class PipelineSpec extends SparkSpecBase {

  val sfDir = "/root/testdata/sf0.001"

  def docs: DataFrame = graft.Tables.load(spark, sfDir, "documents")
  def emb: DataFrame = graft.Tables.load(spark, sfDir, "embeddings")

  def docsOf(rows: (Long, String)*): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("exact dedup groups identical texts and keeps the min id") {
    val d = docsOf((1L, "a b c"), (2L, "a b c"), (3L, "x y"), (7L, "x y"), (5L, "zz"))
    val groups = Dedup.exactGroups(d, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(groups.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (3L, 2L), (5L, 1L)))
    val kept = Dedup.dropExactDuplicates(d, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 5L))
  }

  test("minhash-LSH finds every jaccard pair on the test corpus (high-sim recall)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ≥0.7-jaccard pairs collide in ≥1 of 8 bands with prob ~1-(1-0.7^4)^8 ≈ 0.9;
    // on this corpus the survivors are ≥0.9 so recall should be total.
    assert(exact.nonEmpty)
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("simhash of identical docs is identical; near-dup pairs have small hamming") {
    val d = docsOf(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different words entirely unrelated content here"))
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", 48)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) < pairs((1L, 4L)))
    assert(pairs((1L, 3L)) <= 12)
  }

  test("banded simhash pairs == all-pairs compare (pigeonhole is lossless)") {
    // sf0.001 corpus is small enough for the exact O(n²) baseline
    val d = docs.filter(size(TextOps.tokens(col("text"))) > 0)
    def collectPairs(df: DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (maxH <- Seq(2, 5)) {
      val banded = Dedup.simhashPairs(d, "doc_id", "text", maxH)
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"banded simhash still O(n²) at maxHamming=$maxH:\n$plan")
      // the exact path (maxHamming >= 48) filtered down is the truth
      val exact = Dedup.simhashPairs(d, "doc_id", "text", 48)
        .filter(col("hamming") <= maxH)
      assert(collectPairs(banded) == collectPairs(exact),
        s"banding lost/invented pairs at maxHamming=$maxH")
    }
  }

  test("clusterBalancedSelect: per-cluster quota capped, ranks dense, partitioning-invariant") {
    val sel = Similarity.clusterBalancedSelect(emb, k = 8, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    val byCluster = sel.groupBy(_._2)
    assert(byCluster.size > 1, "assignment collapsed to one cluster")
    for ((cid, rows) <- byCluster) {
      val nSel = rows.count(_._4)
      assert(nSel == math.min(rows.length, 5),
        s"cluster $cid: ${rows.length} members but $nSel selected")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"cluster $cid ranks not dense")
      // selected = exactly the rank <= quota rows
      assert(rows.forall(r => r._4 == (r._3 <= 5)))
    }
    val reparted = Similarity.clusterBalancedSelect(
      emb.repartition(13, col("vec_id")), k = 8, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(sel.sortBy(_._1).toSeq == reparted.sortBy(_._1).toSeq,
      "selection depends on physical partitioning")
  }

  test("wordlistFilter: whole-token case-insensitive hits; strict and fraction policies") {
    val d = docsOf(
      (1L, "Clean text entirely fine"),
      (2L, "one BAD token here"),
      (3L, "bad bad bad bad bad bad"),
      (4L, "badge is not bad-word substring")) // no substring Scunthorpe hits
    val out = Quality.wordlistFilter(d, "doc_id", "text", Seq("BAD"), 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((4L, 0L, true, true)))
    assert(out(2L) == ((4L, 1L, false, true))) // 0.25 <= 0.3
    assert(out(3L) == ((6L, 6L, false, false)))
    assert(out(4L) == ((5L, 0L, true, true)))
  }

  test("hammingPairs48 pairs ANY 48-bit signature relation under arbitrary column names") {
    val schema = StructType(Seq(
      StructField("img", LongType), StructField("fp", LongType)))
    val sigs = Seq(
      (10L, 0x0L), (11L, 0x3L), (12L, 1L << 47),
      (20L, 0x0000FFFFFFFFFFFFL & ~0x3L)) // far from the 10-cluster
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sigs.map(s => Row(s._1, s._2)), 2), schema)
    val got = Dedup.hammingPairs48(df, "img", "fp", 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 3L),
      s"got $got")
  }

  test("banded cosine near-dup pairs: no cartesian, finds planted high-sim pairs") {
    import org.apache.spark.sql.functions.{array => fArray}
    // planted: vec 1000+i = vec i with one coordinate nudged → cosine ≈ 1
    val base = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val dups = base.select((col("vec_id") + 1000).as("vec_id"),
      concat(
        fArray(element_at(col("embedding"), 1) + lit(0.01f)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = base.unionByName(dups)
    val banded = Similarity.cosineNearDupPairs(corpus, 0.9)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded cosine pairs still O(n²):\n$plan")
    val found = banded.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosineNearDupPairsExact(corpus, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 50, s"planting failed: only ${exact.size} high-sim pairs")
    // ≥0.9-cosine pairs collide in ≥1 of 16 8-plane tables w.p. >0.999
    val recall = found.intersect(exact).size * 1.0 / exact.size
    assert(recall >= 0.95, s"recall $recall (${found.size} found, ${exact.size} true)")
    assert(found.subsetOf(exact), "banded verify admitted a sub-threshold pair")
  }

  test("jaccard maxDf cutoff bounds hot-shingle fan-out and keeps rare-shingle pairs") {
    // two true near-dups (differ in one token) + many docs sharing ONE
    // boilerplate shingle ("s1 s2 s3", document frequency 52)
    val boiler = "s1 s2 s3"
    val rows = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 x9 $boiler"),
      (2L, s"a1 a2 a3 a4 a5 a6 a7 b8 x9 $boiler")) ++
      (10L until 60L).map(i => (i, s"unique$i distinct$i words$i only$i $boiler"))
    val d = docsOf(rows: _*)
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cut = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.3, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2): exact inter=7/10 shingles → J=0.538; with the hot shingle
    // dropped inter=6 → J=6/14≈0.43 — still over threshold
    assert(cut.contains((1L, 2L)), "cutoff dropped a rare-shingle near-dup pair")
    assert(cut.subsetOf(exact), "cutoff invented pairs")
  }

  test("removeBoilerplateLines strips hot lines, keeps order, empties all-boiler docs") {
    val banner = "Accept  ALL cookies" // normalization: case + whitespace
    val d = docsOf(
      (1L, s"unique first line\n$banner\nunique last line"),
      (2L, s"another doc\naccept all cookies"),
      (3L, s"accept all COOKIES"), // only boilerplate → emptied
      (4L, s"$banner\nmiddle kept\n$banner"),
      (5L, "no boiler here"))
    val out = Dedup.removeBoilerplateLines(d, "doc_id", "text", maxLineDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique first line\nunique last line")
    assert(out(2L) == "another doc")
    assert(out(3L) == "")
    assert(out(4L) == "middle kept")
    assert(out(5L) == "no boiler here")
  }

  test("contaminationFlags counts benchmark n-gram overlaps per doc") {
    import spark.implicits._
    val d = docsOf(
      (10L, "the quick brown fox jumps high"),   // shares "the quick brown"+
      (11L, "totally clean document words only"),
      (12L, "quick brown fox seen again today")) // shares "quick brown fox"
    val benchmark = Seq("the quick brown", "quick brown fox", "unused gram x")
      .toDF("sh")
    val out = Dedup.contaminationFlags(d, "doc_id", "text", benchmark, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10L) == ((2L, true)))
    assert(out(11L) == ((0L, false)))
    assert(out(12L) == ((1L, true)))
  }

  test("cleanCorpus end-to-end: boilerplate → exact dedup → near-dup clusters") {
    val banner = "accept all cookies"
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearBody = (1 to 30).map(i => if (i == 1) "x1" else s"w$i").mkString(" ")
    val d = docsOf(
      (1L, s"$body\n$banner"),
      (2L, s"$body\n$banner"),      // exact dup of 1 after de-boilering
      (3L, s"$nearBody\n$banner"),  // near dup of 1 (jaccard ≈ 0.9)
      (4L, s"completely different content entirely unrelated words\n$banner"))
    val out = Dedup.cleanCorpus(d, "doc_id", "text", maxLineDf = 2, threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 4L), s"survivors=${out.keySet}")
    assert(out(1L) == body) // banner stripped
  }

  test("duplicateClusters groups transitive chains; dropNearDuplicates keeps one per cluster") {
    import spark.implicits._
    // chain 1-2-3 (1~2, 2~3, but NOT 1~3) + isolated pair 10-11
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // distributed label-propagation path (forced) agrees with union-find
    val distClusters = Dedup.duplicateClusters(pairs, driverUnionFindMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distClusters == clusters)
    val docs = Seq(1L, 2L, 3L, 5L, 10L, 11L).toDF("doc_id")
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .collect().map(_.getLong(0)).toSet
    // one canonical per cluster + untouched singleton 5
    assert(kept == Set(1L, 5L, 10L))
  }

  test("duplicateClusters handles STRING doc ids (falls through the Long-only fast path)") {
    import spark.implicits._
    // chain a-b-c + isolated pair x-y; the driver union-find fast path
    // reads Longs, so string ids must take the distributed propagation
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(clusters == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
    val docs = Seq("a", "b", "c", "q", "x", "y").toDF("doc_id")
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("a", "q", "x"))
  }

  test("distributed propagation converges on a 60-diameter chain within 20 rounds") {
    import spark.implicits._
    // without pointer jumping, min-label propagation needs diameter
    // rounds and would hit maxIterations=20 (now a loud throw); with
    // jumping it converges in O(log 60) ≈ 7 rounds
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(chain, driverUnionFindMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == 61)
    assert(clusters.values.forall(_ == 0L), s"split clusters: ${clusters.values.toSet}")
  }

  test("cosineNearDupPairs derives dim from data; mismatched dims throw, not truncate") {
    import spark.implicits._
    def vec(seed: Int, dim: Int): Array[Double] =
      Array.tabulate(dim)(d => math.sin(seed * 31 + d).abs + 0.1)
    // 32-dim corpus with a planted near-identical pair — the default
    // dim=-1 must derive 32 from the data (a hard-coded 64 would
    // zero-pad and still bucket, but this pins the derivation path)
    val c32 = Seq(
      (1L, vec(1, 32)), (2L, vec(1, 32).updated(0, vec(1, 32)(0) + 0.001)),
      (3L, vec(7, 32)), (4L, vec(13, 32)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(c32, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted 32-dim pair missed: $pairs")
    // a corpus with inconsistent dims must fail loudly — silent
    // truncation/padding voids the recall guarantee
    val mixed = Seq((1L, vec(1, 32)), (2L, vec(2, 16))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.cosineNearDupPairs(mixed, 0.5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("HyperplaneBuckets")), s"unexpected error: $e")
  }

  test("brute-force ANN: self-similarity excluded, scores ordered, k respected") {
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 5)
    val rows = topk.collect()
    assert(rows.length == 25)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH-bucketed ANN returns a subset quality ≥ bucket-mate best (recall sanity)") {
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), 3)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probes=2 (the p7 configuration): every hamming-1 bucket probed
    val lsh = Similarity.lshBucketedTopK(emb, emb.filter(col("vec_id") < 50),
        3, 4, 64, probes = 2)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every query must get SOME neighbor (buckets are non-trivial with 4 planes
    // over 500 vectors) and a recall floor vs brute force (measured
    // rank-1 recall ~0.5 with multiprobe; 0.25 = regression alarm)
    assert(lsh.nonEmpty)
    val hits = lsh.count { case (q, n) => brute.get(q).contains(n) }
    assert(hits * 1.0 / lsh.size > 0.25, s"rank-1 recall ${hits}/${lsh.size}")
  }

  test("minhash index save/load pins parameters; nearDupAgainstIndex serves from the stored path") {
    import spark.implicits._
    val all = docs
    val corpus = all.filter(col("doc_id") < 400)
    val newDocs = all.filter(col("doc_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx_io").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(corpus, "doc_id", "text", 3, 32, 8), dir, n = 3)
    val (n, k, bands, idx) = Dedup.loadMinhashIndex(spark, dir)
    assert(n == 3 && k == 32 && bands == 8 &&
      idx.count() == corpus.count())
    // the one-call serving shape equals full pairs restricted to the batch
    val served = Dedup.nearDupAgainstIndex(newDocs, dir, "doc_id", "text", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.minhashLshPairs(all, "doc_id", "text", 3, 32, 8, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = full.keySet.filter { case (a, b) => a >= 400 || b >= 400 }
    assert(served.keySet == want,
      s"missing=${want -- served.keySet} extra=${served.keySet -- want}")
    assert(want.forall(p => served(p) == full(p)))
    // a meta row disagreeing with the stored rows must fail LOUDLY —
    // joining against an index built with different k silently misses
    // duplicates, the worst failure mode for a dedup pipeline
    Seq((3, 16, 8)).toDF("n", "k", "bands")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadMinhashIndex(spark, dir)
    }
    assert(e.getMessage.contains("but meta says"), e.getMessage)
  }

  test("foreign-append probes: cosine and signature loaders fail loudly on later-file drift") {
    // the loadMinhashIndex per-file probe, mirrored onto its two
    // siblings (round-10 verdict gap): an out-of-band append with a
    // different dim / plane family / band geometry lands in its own
    // NEW files, which a head row-sample never reads — pre-fix it
    // surfaced as silently missed duplicates on every later screen.
    import spark.implicits._
    val cosDir = java.nio.file.Files.createTempDirectory("cos_probe").toString
    Similarity.saveCosineIndex(emb.filter(col("vec_id") < 100), cosDir,
      tables = 16, planesPerTable = 8, dim = 64)
    // sanity: the clean index loads
    Similarity.loadCosineIndex(spark, cosDir)
    // foreign-dim vectors appended as a new file
    Seq((9001L, Array.fill(32)(0.5), 1.0)).toDF("id", "v", "nrm")
      .coalesce(1).write.mode("append").parquet(s"$cosDir/vectors")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.loadCosineIndex(spark, cosDir)
    }
    assert(e1.getMessage.contains("but meta says dim"), e1.getMessage)
    // out-of-family band cells appended as a new file
    val cosDir2 = java.nio.file.Files.createTempDirectory("cos_probe2").toString
    Similarity.saveCosineIndex(emb.filter(col("vec_id") < 100), cosDir2,
      tables = 16, planesPerTable = 8, dim = 64)
    Seq((9001L, 99L, 5L)).toDF("id", "band", "bucket")
      .coalesce(1).write.mode("append").parquet(s"$cosDir2/bands")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.loadCosineIndex(spark, cosDir2)
    }
    assert(e2.getMessage.contains("outside the meta family"), e2.getMessage)

    val sigDir = java.nio.file.Files.createTempDirectory("sig_probe").toString
    val corpus = docs.select(col("doc_id"),
      expr("CAST(conv(substr(md5(string(doc_id)), 1, 12), 16, 10) AS BIGINT)")
        .as("sig"))
    Dedup.saveSignatureIndex(corpus, sigDir, "doc_id", "sig", maxHamming = 4)
    Dedup.loadSignatureIndex(spark, sigDir)
    // band id from a different geometry (maxHamming=4, nBlocks=5 has
    // exactly 5 single-block bands)
    Seq((9001L, 77L, 3L)).toDF("doc", "band", "bits")
      .coalesce(1).write.mode("append").parquet(s"$sigDir/bands")
    val e3 = intercept[IllegalArgumentException] {
      Dedup.loadSignatureIndex(spark, sigDir)
    }
    assert(e3.getMessage.contains("outside the meta geometry"), e3.getMessage)
    // bits wider than the band's key width (band 0 is 10 bits here)
    val sigDir2 = java.nio.file.Files.createTempDirectory("sig_probe2").toString
    Dedup.saveSignatureIndex(corpus, sigDir2, "doc_id", "sig", maxHamming = 4)
    Seq((9001L, 0L, 1L << 20)).toDF("doc", "band", "bits")
      .coalesce(1).write.mode("append").parquet(s"$sigDir2/bands")
    val e4 = intercept[IllegalArgumentException] {
      Dedup.loadSignatureIndex(spark, sigDir2)
    }
    assert(e4.getMessage.contains("outside the meta geometry"), e4.getMessage)
    for (d <- Seq(cosDir, cosDir2, sigDir, sigDir2))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
  }

  test("index fold-in: merge == fresh rebuild for minhash and cosine; id clash fails loudly") {
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // minhash: index A, fold in B, screen C — must equal screening C
    // against an index built on A ∪ B in one shot
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val c = docs.filter(col("doc_id") >= 400)
    val foldDir = java.nio.file.Files.createTempDirectory("mh_fold").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(a, "doc_id", "text", 3, 32, 8), foldDir, n = 3)
    Dedup.mergeIntoMinhashIndex(b, foldDir, "doc_id", "text")
    val rebuildDir = java.nio.file.Files.createTempDirectory("mh_rebuild").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(a.unionByName(b), "doc_id", "text", 3, 32, 8),
      rebuildDir, n = 3)
    val merged = pairMap(Dedup.nearDupAgainstIndex(c, foldDir, "doc_id", "text", 0.4))
    val rebuilt = pairMap(Dedup.nearDupAgainstIndex(c, rebuildDir, "doc_id", "text", 0.4))
    assert(merged == rebuilt && rebuilt.nonEmpty,
      s"merged=${merged.size} rebuilt=${rebuilt.size}")
    val clash = intercept[IllegalArgumentException] {
      Dedup.mergeIntoMinhashIndex(b, foldDir, "doc_id", "text", assertNewIds = true)
    }
    assert(clash.getMessage.contains("already exist"), clash.getMessage)
    // cosine twin
    val va = emb.filter(col("vec_id") < 150)
    val vb = emb.filter(col("vec_id") >= 150 && col("vec_id") < 220)
    val vc = emb.filter(col("vec_id") >= 220)
    val cosFold = java.nio.file.Files.createTempDirectory("cos_fold").toString
    Similarity.saveCosineIndex(va, cosFold, tables = 16, planesPerTable = 8, dim = 64)
    Similarity.mergeIntoCosineIndex(vb, cosFold)
    val cosRebuild = java.nio.file.Files.createTempDirectory("cos_rebuild").toString
    Similarity.saveCosineIndex(va.unionByName(vb), cosRebuild,
      tables = 16, planesPerTable = 8, dim = 64)
    val cm = pairMap(Similarity.cosineNearDupAgainstIndex(vc, cosFold, 0.35))
    val cr = pairMap(Similarity.cosineNearDupAgainstIndex(vc, cosRebuild, 0.35))
    assert(cm == cr && cr.nonEmpty, s"cos merged=${cm.size} rebuilt=${cr.size}")
    val cclash = intercept[IllegalArgumentException] {
      Similarity.mergeIntoCosineIndex(vb, cosFold, assertNewIds = true)
    }
    assert(cclash.getMessage.contains("already exist"), cclash.getMessage)
  }

  test("exact stored index: screen == keep rule over union; fold == rebuild; bucketed identical + exchange-free") {
    import spark.implicits._
    // plant exact duplicates (the corpus has none naturally): ids with
    // doc_id%5<2 share 'grp:(id div 4)' — groups straddle the splits
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 5 < 2,
        concat(lit("grp:"), expr("doc_id div 4").cast("string")))
        .otherwise(col("text")).as("text"))
    // mod-4 splits so the 4-wide plant groups straddle corpus and
    // batch (an id-RANGE split would keep every group on one side)
    val a = planted.filter(col("doc_id") % 4 < 2)
    val b = planted.filter(col("doc_id") % 4 === 2)
    val c = planted.filter(col("doc_id") % 4 === 3)
    def screenMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // expected: p1's keep rule over corpus ∪ batch restricted to batch
    val corpus = a.unionByName(b)
    val all = corpus.unionByName(c)
    val keepIds = all.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCorp = corpus.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = c.select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map { r =>
        val (id, h) = (r.getLong(0), r.getString(1))
        id -> ((h, keepIds(h), nCorp.getOrElse(h, 0L), id == keepIds(h)))
      }.toMap
    // fold path: save A, merge B, screen C — must equal the rebuild
    val foldDir = java.nio.file.Files.createTempDirectory("ex_fold").toString
    Dedup.saveExactIndex(a, "doc_id", "text", foldDir)
    Dedup.mergeIntoExactIndex(b, foldDir, "doc_id", "text")
    val served = screenMap(
      Dedup.exactAgainstIndex(c, foldDir, "doc_id", "text"))
    assert(served == want && want.nonEmpty, "fold-path screen diverged")
    assert(want.values.exists(!_._4) && want.values.exists(_._4),
      "plant must produce both dups and keeps")
    assert(want.values.exists(_._3 > 0), "plant must hit the corpus")
    val rebuildDir = java.nio.file.Files.createTempDirectory("ex_re").toString
    Dedup.saveExactIndex(corpus, "doc_id", "text", rebuildDir)
    assert(screenMap(Dedup.exactAgainstIndex(c, rebuildDir, "doc_id", "text"))
      == served, "fold != rebuild")

    // bucketed layout: identical relation, corpus side exchange-free
    val bkDir = java.nio.file.Files.createTempDirectory("ex_bk").toString
    Dedup.saveExactIndexBucketed(a, "doc_id", "text", bkDir,
      nBuckets = 8, tablePrefix = "t_ex")
    Dedup.mergeIntoExactIndexBucketed(b, bkDir, "doc_id", "text",
      tablePrefix = "t_ex")
    val bkScreen = Dedup.exactAgainstIndexBucketed(c, bkDir,
      "doc_id", "text", tablePrefix = "t_ex")
    assert(screenMap(bkScreen) == want, "bucketed screen diverged")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.exactAgainstIndexBucketed(c, bkDir,
        "doc_id", "text", tablePrefix = "t_ex")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"stored side must scan bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    // the plain merge must refuse the bucketed layout
    val e1 = intercept[IllegalArgumentException] {
      Dedup.mergeIntoExactIndex(b, bkDir, "doc_id", "text")
    }
    assert(e1.getMessage.contains("BUCKETED layout"), e1.getMessage)
    // foreign key material in a LATER file fails the per-file probe
    Seq(("deadbeef", 1L, 1L)).toDF("content_hash", "keep_id", "dup_cnt")
      .coalesce(1).write.mode("append").parquet(s"$foldDir/index")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.loadExactIndex(spark, foldDir)
    }
    assert(e2.getMessage.contains("non-md5 content_hash"), e2.getMessage)
    // a foreign FAMILY in meta fails before any join
    Seq(("simhash", 16)).toDF("family", "hash_len")
      .write.mode("overwrite").parquet(s"$rebuildDir/meta")
    val e3 = intercept[IllegalArgumentException] {
      Dedup.loadExactIndex(spark, rebuildDir)
    }
    assert(e3.getMessage.contains("not exact_md5"), e3.getMessage)
    for (d <- Seq(foldDir, rebuildDir, bkDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    CacheLedger.drain()
  }

  test("annealSchedule: linear keep fractions, nested epochs, null scores ride epoch 0 only") {
    import spark.implicits._
    // 100 docs with distinct scores 1..100 (lower = better) + one
    // null-score doc (the unscorable-empty-text case)
    val scored = (1L to 100L).map(i => (i, Some(i.toDouble)))
      .toDF("doc_id", "q")
      .unionByName(Seq((999L, None: Option[Double])).toDF("doc_id", "q"))
    val out = Sampling.annealSchedule(scored, "doc_id", "q",
        nEpochs = 4, finalKeepBp = 2500)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSeq
    val byEpoch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // epoch 0 = everything (incl. the null score); later epochs keep
    // the best 75/50/25% — exact on distinct scores
    assert(byEpoch(0L).size == 101 && byEpoch(0L).contains(999L))
    assert(byEpoch(1L) == (1L to 75L).toSet, s"e1=${byEpoch(1L).size}")
    assert(byEpoch(2L) == (1L to 50L).toSet)
    assert(byEpoch(3L) == (1L to 25L).toSet)
    // annealing is NESTED: each epoch's pool is a subset of the prior
    for (e <- 1L to 3L)
      assert(byEpoch(e).subsetOf(byEpoch(e - 1)), s"epoch $e not nested")
    // deterministic at any parallelism
    val rep = Sampling.annealSchedule(scored.repartition(13), "doc_id", "q",
        nEpochs = 4, finalKeepBp = 2500)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(rep == out.toSet)
    // the cutoff aggregate is ONE row — no global sort in the plan
    val plan = Sampling.annealSchedule(scored, "doc_id", "q", 4, 2500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"annealing must not globally sort:\n$plan")
  }

  test("compressionGate: both deflate junk tails flagged, prose kept, empty/null guarded") {
    import spark.implicits._
    val rep = "buy now click here " * 100            // machine repetition
    val rnd = {                                      // high-entropy printable
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new StringBuilder
      var seed = "junk:0".getBytes("UTF-8")
      while (sb.length < 2048) {
        md.digest(seed).foreach(b => sb.append((33 + ((b & 0xff) % 94)).toChar))
        seed = sb.takeRight(16).toString.getBytes("UTF-8")
      }
      sb.toString
    }
    val prose = "A quiet survey of the northern valley found thirty " +
      "potential well sites. Rainfall charts from the past decade " +
      "suggest caution before expanding the orchard. Local carpenters " +
      "prefer seasoned oak although imported pine arrives faster. The " +
      "ferry timetable changes whenever the river drops below two " +
      "meters. Students mapped the old quarry and catalogued forty " +
      "mineral samples. Evening markets draw larger crowds during the " +
      "harvest festival weeks."
    val d = Seq((1L, Some(rep)), (2L, Some(rnd)), (3L, Some(prose)),
      (4L, Some("")), (5L, None: Option[String])).toDF("doc_id", "text")
    val out = Quality.compressionGate(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))).toMap
    val (repR, repKeep) = out(1L)
    val (rndR, rndKeep) = out(2L)
    val (proseR, proseKeep) = out(3L)
    // repetition compresses to almost nothing; high-entropy barely at
    // all; varied prose sits mid-band — both tails rejected, prose kept
    assert(repR.exists(_ < 250) && !repKeep, s"rep ratio $repR")
    assert(rndR.exists(_ > 750) && !rndKeep, s"rnd ratio $rndR")
    assert(proseR.exists(r => r >= 250 && r <= 750) && proseKeep,
      s"prose ratio $proseR")
    // empty text: NULL ratio, keep = false; NULL text row survives with
    // NULL stats (nullSafeEval), keep = false
    assert(out(4L) == ((None, false)) && out(5L) == ((None, false)))
    // ratio is exact integer arithmetic over exact byte counts — stable
    // under repartition (hash-stability, not float luck)
    val rep2 = Quality.compressionGate(d.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))).toMap
    assert(rep2 == out)
  }

  test("packSequencesBinned: no cross-doc fragments; minimal splits; beats concat-and-chunk utilization; deterministic") {
    import spark.implicits._
    def docOfLen(id: Long, nTok: Int) =
      (id, Seq.fill(nTok)("w").mkString(" "))
    val d = docsOf(docOfLen(1, 60), docOfLen(2, 60), docOfLen(3, 60),
        docOfLen(4, 40), docOfLen(5, 40), docOfLen(6, 40),
        docOfLen(7, 250), // longer than ctx: splits minimally 100+100+50
        docOfLen(8, 0))   // token-less: produces no pieces
      .withColumn("source", lit("s1"))
    val B = 100
    val out = Sampling.packSequencesBinned(d, "doc_id", "text", "source", B)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    // the FULL hand-packed layout: 100-group tops bin0 + fresh bin1;
    // 60s each open fresh bins (remainder 0 declines them); the 50
    // remainder opens bin5 which the first 40 then tops off; the last
    // two 40s share bin6. (doc, n, piece, len, seq, off):
    val want = Set(
      (7L, 250L, 0L, 100L, 0L, 0L), (7L, 250L, 1L, 100L, 1L, 0L),
      (1L, 60L, 0L, 60L, 2L, 0L), (2L, 60L, 0L, 60L, 3L, 0L),
      (3L, 60L, 0L, 60L, 4L, 0L),
      (7L, 250L, 2L, 50L, 5L, 0L), (4L, 40L, 0L, 40L, 5L, 50L),
      (5L, 40L, 0L, 40L, 6L, 0L), (6L, 40L, 0L, 40L, 6L, 40L))
    assert(out == want, s"missing=${want -- out} extra=${out -- want}")
    // invariants, independent of the hand computation: every piece lies
    // INSIDE one sequence, pieces of a bin never overlap, splitting is
    // minimal (ceil(n/B) pieces, only for n > B), token-less docs absent
    assert(out.forall { case (_, _, _, len, _, off) => off + len <= B })
    out.groupBy(t => t._5).foreach { case (seq, ps) =>
      val sorted = ps.toSeq.sortBy(_._6)
      sorted.sliding(2).foreach {
        case Seq((_, _, _, la, _, oa), (_, _, _, _, _, ob)) =>
          assert(oa + la <= ob, s"overlap in seq $seq")
        case _ =>
      }
    }
    assert(out.groupBy(_._1).forall { case (_, ps) =>
      val n = ps.head._2
      ps.size == ((n + B - 1) / B).toInt
    }, "splitting is not minimal")
    assert(!out.exists(_._1 == 8L))
    // utilization: usable (whole-doc or minimal-split) tokens per slot
    // beats concat-and-chunk, where a doc is usable only if it lies
    // wholly inside one sequence
    val bfdBins = out.map(_._5).max + 1
    val bfdUtil = out.toSeq.map(_._4).sum.toDouble / (bfdBins * B)
    val cc = Sampling.packSequences(d, "doc_id", "text", "source", B)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val ccBins = cc.map { case (n, s, off) => (off + n - 1) / B + s }.max + 1
    val ccUsable = cc.collect {
      case (n, _, off) if n > 0 && off + n <= B => n }.sum
    val ccUtil = ccUsable.toDouble / (ccBins * B)
    assert(bfdUtil > ccUtil,
      f"BFD util $bfdUtil%.3f must beat concat-and-chunk's usable $ccUtil%.3f")
    // deterministic at any parallelism
    val rep = Sampling.packSequencesBinned(d.repartition(7), "doc_id",
        "text", "source", B)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rep == out)
  }

  test("packedSequenceSpans: spans tile without overlap, fill+waste = budget, boundaries match pieces") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val B = 16
    val d = Seq(
      (1L, words(7), "s"), (2L, words(7), "s"), (3L, words(9), "s"),
      (4L, words(40), "s"), // longer than budget: splits minimally
      (5L, words(5), "t"))
      .toDF("doc_id", "text", "source")
    val pieces = Sampling.packSequencesBinned(d, "doc_id", "text",
      "source", B)
    val out = Sampling.packedSequenceSpans(pieces, "doc_id", "source", B)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6)))).toMap
    // every sequence: spans parse, tile in order without overlap, and
    // total length == fill; fill + waste == budget
    out.foreach { case ((src, seq), (nP, nD, fill, waste, spans)) =>
      val sp = spans.split(",").map { s =>
        val Array(a, b) = s.split(":"); (a.toLong, b.toLong) }
      assert(sp.length == nP && nD <= nP)
      assert(fill + waste == B, s"$src/$seq: $fill + $waste != $B")
      assert(sp.map { case (a, b) => b - a }.sum == fill)
      sp.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 <= s2,
          s"$src/$seq overlaps: $spans")
        case _ =>
      }
    }
    // the split doc's full-budget pieces own their sequences outright
    val fullSeqs = out.filter(_._2._3 == B.toLong)
    assert(fullSeqs.exists(_._2._5 == s"0:$B"),
      s"no full-budget single-span sequence: $out")
    // shard t: one sequence holding the one 5-token doc
    assert(out(("t", 0L)) == ((1L, 1L, 5L, 11L, "0:5")))
    // deterministic at any parallelism
    val rep = Sampling.packedSequenceSpans(
      Sampling.packSequencesBinned(d.repartition(7), "doc_id", "text",
        "source", B), "doc_id", "source", B)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6)))).toMap
    assert(rep == out)
  }

  test("packSequencesBinned: non-atomic shard keys refused loudly (identity toString)") {
    import spark.implicits._
    // an array shard column's toString is identity-based — every row
    // would become its own shard and packing would silently stop
    // packing; the guard must name the degradation
    val arr = Seq((1L, "a b c", Seq("s"))).toDF("doc_id", "text", "shard")
    val e = intercept[IllegalArgumentException] {
      Sampling.packSequencesBinned(arr, "doc_id", "text", "shard", 8)
    }
    assert(e.getMessage.contains("non-atomic") &&
      e.getMessage.contains("own shard"), e.getMessage)
    val bin = Seq((1L, "a b c", Array[Byte](1, 2))).toDF("doc_id", "text", "shard")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.packSequencesBinned(bin, "doc_id", "text", "shard", 8)
    }
    assert(e2.getMessage.contains("BINARY"), e2.getMessage)
  }

  test("chunkTokens: right-aligned last window, exact overlap, zero exchanges") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(5)),   // n < size: one whole chunk
      (2L, words(8)),   // n == size: exactly one chunk
      (3L, words(14)),  // starts 0, 6, clamp(12 -> 6)? no: nc=2, last start=6
      (4L, words(21)),  // nc = ceil(13/6)+1 = 4; last start clamps 18 -> 13
      (5L, ""))         // token-less: one empty chunk, id stays represented
      .toDF("doc_id", "text")
    val out = Sampling.chunkTokens(d, "doc_id", "text", size = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2))
    def expectChunks(id: Long, starts: Seq[Int], n: Int) =
      starts.zipWithIndex.map { case (s, i) =>
        val toks = (s + 1 to math.min(s + 8, n)).map(j => s"w$j")
        (id, i.toLong, toks.size.toLong, toks.mkString(" "))
      }
    val want = (expectChunks(1L, Seq(0), 5) ++ expectChunks(2L, Seq(0), 8) ++
      expectChunks(3L, Seq(0, 6), 14) ++
      expectChunks(4L, Seq(0, 6, 12, 13), 21) ++
      Seq((5L, 0L, 0L, ""))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == want, s"got=${out.toSeq}")
    // every doc-4 chunk is FULL size (the right-aligned contract)
    assert(out.filter(_._1 == 4L).forall(_._3 == 8L))
    // pure projection: no Exchange anywhere in the physical plan
    val plan = Sampling.chunkTokens(d, "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedSample: E-S keys match plain-Scala recompute; weight drives inclusion") {
    import spark.implicits._
    // 1000 heavy (w=50) + 1000 light (w=1) rows in one group, plus a
    // second group and null/zero weights that must be excluded
    val rows = (1L to 2000L).map(i =>
      (i, "g1", Some(if (i <= 1000) 50L else 1L))) ++
      (3000L to 3009L).map(i => (i, "g2", Some(3L))) ++
      Seq((4000L, "g1", None: Option[Long]), (4001L, "g1", Some(0L)))
    val d = rows.toDF("doc_id", "source", "n_chars")
    val got = Sampling.weightedSample(d, "doc_id", "source", "n_chars", k = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // independent recomputation of the reservoir order in plain Scala
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // the engine's quantized order: key_micro = floor(ln(u)/w * 1e6),
    // micro ties break by id (the packed-BIGINT total order)
    def kq(id: Long, w: Long): Long = math.floor(
      math.log((hash60(s"ws:$id") + 1L) / 1152921504606846976.0) / w * 1e6)
      .toLong
    val want = rows.collect { case (id, g, Some(w)) if w > 0 => (id, g, w) }
      .groupBy(_._2).flatMap { case (g, rs) =>
        rs.sortBy(r => (-kq(r._1, r._3), r._1)).take(100).zipWithIndex
          .map { case ((id, grp, _), i) => (id, grp, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == want, s"got ${got.length} rows")
    // g2 has only 10 rows -> all selected; g1 capped at k
    assert(got.count(_._2 == "g2") == 10 && got.count(_._2 == "g1") == 100)
    // the 50x weight dominates the draw but does not monopolize it
    val heavy = got.count(t => t._2 == "g1" && t._1 <= 1000)
    assert(heavy >= 85, s"heavy=$heavy of 100")
    // deterministic at any parallelism
    val rep = Sampling.weightedSample(d.repartition(7), "doc_id", "source",
        "n_chars", 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(rep == got.toSet)
    // packing bounds fail loudly: a weight tiny enough to blow the
    // quantized-key budget must raise, not silently mis-rank
    val tiny = Seq((1L, "g", 1.0e-9)).toDF("doc_id", "source", "n_chars")
    val e = intercept[Exception] {
      Sampling.weightedSample(tiny, "doc_id", "source", "n_chars", 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packing bounds")), e.toString)
  }

  test("annealSchedule bucketWidth fallback: identical pools when grid-aligned, bounded deficit when coarse") {
    import spark.implicits._
    // scores on a 0.25 grid — 0.25 is a power of two, so
    // floor(score/0.25)·0.25 == score EXACTLY and the bucketed
    // histogram carries the same multiset as the raw scores
    val scored = (1L to 100L).map(i => (i, Some(i.toDouble * 0.25)))
      .toDF("doc_id", "q")
      .unionByName(Seq((999L, None: Option[Double])).toDF("doc_id", "q"))
    def pools(bw: Double) =
      Sampling.annealSchedule(scored, "doc_id", "q", nEpochs = 4,
          finalKeepBp = 2500, bucketWidth = bw)
        .collect().map(r => (r.getLong(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = pools(0.0)
    // grid-aligned bucketWidth: the O(distinct-scores) exact-percentile
    // buffer is traded for a bounded histogram with IDENTICAL pools
    val aligned = pools(0.25)
    for (e <- 0L to 3L)
      assert(aligned(e) == exact(e), s"epoch $e pools diverge at bw=0.25")
    // coarse buckets (8.0 = 32 docs/bucket): cutoffs use bucket lower
    // edges, so each epoch under-admits by AT MOST one bucket's mass,
    // stays nested, and epoch 0 still admits everything
    val coarse0 = pools(8.0)
    def coarse(e: Long) = coarse0.getOrElse(e, Set.empty[Long])
    assert(coarse(0L) == exact(0L))
    for (e <- 1L to 3L) {
      assert(coarse(e).subsetOf(exact(e)), s"epoch $e over-admits at bw=8")
      assert(exact(e).size - coarse(e).size <= 32,
        s"epoch $e deficit ${exact(e).size - coarse(e).size} > one bucket")
      assert(coarse(e).subsetOf(coarse(e - 1)), s"epoch $e not nested at bw=8")
    }
    // deterministic at any parallelism
    val rep = Sampling.annealSchedule(scored.repartition(13), "doc_id", "q",
        4, 2500, bucketWidth = 0.25)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(rep == aligned.toSeq.flatMap { case (e, s) => s.map((e, _)) }.toSet)
  }

  test("exact-index bloom sidecar: screen identical; no false negatives; stale sketch fails") {
    import spark.implicits._
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 5 < 2,
        concat(lit("grp:"), expr("doc_id div 4").cast("string")))
        .otherwise(col("text")).as("text"))
    val corpus = planted.filter(col("doc_id") % 4 < 2)
    val batch = planted.filter(col("doc_id") % 4 >= 2)
    val dir = java.nio.file.Files.createTempDirectory("ex_bloom").toString
    Dedup.saveExactIndex(corpus, "doc_id", "text", dir)
    // no sidecar yet: the bloom paths must refuse, not degrade
    val e0 = intercept[IllegalArgumentException] {
      Dedup.loadExactBloom(spark, dir)
    }
    assert(e0.getMessage.contains("no bloom sidecar"), e0.getMessage)
    Dedup.buildExactBloom(spark, dir, expectedItems = 1000L, fpp = 0.01)
    def screenMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // the bloom-gated screen returns the IDENTICAL relation — the
    // no-false-negative contract made a row-for-row assertion
    val plain = screenMap(Dedup.exactAgainstIndex(batch, dir, "doc_id", "text"))
    val bloomed = screenMap(
      Dedup.exactAgainstIndexBloom(batch, dir, "doc_id", "text"))
    assert(bloomed == plain && plain.values.exists(_._3 > 0),
      "bloom screen diverged (or the plant missed the corpus)")
    // the in-memory frontier split: every TRUE duplicate is maybe_dup
    // (no false negatives); the fresh mass is mostly ruled out (fpp 1%,
    // asserted with a wide margin)
    val flags = Dedup.bloomFrontierFlags(batch, dir, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val trueDups = plain.collect { case (id, (_, _, n, _)) if n > 0 => id }
    assert(trueDups.nonEmpty && trueDups.forall(flags(_)),
      "a true duplicate was ruled out — a bloom false negative")
    val fresh = plain.collect { case (id, (_, _, 0L, _)) => id }.toSeq
    val fpRate = fresh.count(flags(_)).toDouble / fresh.size
    assert(fpRate < 0.1, f"false-positive rate $fpRate%.3f way above fpp")
    // a fold invalidates the sketch: the loader must fail LOUDLY (a
    // stale sketch has false negatives for the folded batch)
    Dedup.mergeIntoExactIndex(batch, dir, "doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.exactAgainstIndexBloom(batch, dir, "doc_id", "text")
    }
    assert(e1.getMessage.contains("re-run buildExactBloom"), e1.getMessage)
    // rebuilding restores service over the folded index
    Dedup.buildExactBloom(spark, dir, expectedItems = 2000L, fpp = 0.01)
    val after = screenMap(
      Dedup.exactAgainstIndexBloom(batch, dir, "doc_id", "text"))
    assert(after == screenMap(
      Dedup.exactAgainstIndex(batch, dir, "doc_id", "text")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    CacheLedger.drain()
  }

  test("bloom sidecars generalize: line/minhash/signature/cosine identical screens; stale-after-fold fails; family + size guards") {
    import spark.implicits._
    // ---- LINE family: identical rewrite; a fold staleness fails loudly
    val lnCorpus = docsOf(
      (2L, "alpha one\nshared footer\nbeta"),
      (4L, "gamma\nshared footer"))
    val lnBatch = docsOf(
      (11L, "fresh line one\nshared footer\nfresh line two"),
      (13L, "batch dup line\nunique a"),
      (15L, "batch dup line\nunique b"))
    val lnDir = java.nio.file.Files.createTempDirectory("ln_bloom").toString
    Dedup.saveLineIndex(lnCorpus, "doc_id", "text", lnDir)
    Dedup.buildLineBloom(spark, lnDir, expectedItems = 1000L)
    def lnMap(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lnMap(Dedup.linesAgainstIndexBloom(lnBatch, lnDir, "doc_id", "text"))
      == lnMap(Dedup.linesAgainstIndex(lnBatch, lnDir, "doc_id", "text")))
    // loading a line sidecar through the WRONG family loader fails
    val eFam = intercept[IllegalArgumentException] {
      Dedup.loadExactBloom(spark, lnDir)
    }
    assert(eFam.getMessage.contains("key family"), eFam.getMessage)
    Dedup.mergeIntoLineIndex(lnBatch, lnDir, "doc_id", "text")
    val eLn = intercept[IllegalArgumentException] {
      Dedup.linesAgainstIndexBloom(lnBatch, lnDir, "doc_id", "text")
    }
    assert(eLn.getMessage.contains("re-run buildLineBloom"), eLn.getMessage)
    // rebuild restores service over the folded index
    Dedup.buildLineBloom(spark, lnDir, expectedItems = 2000L)
    val lnBatch2 = docsOf((21L, "unique a\ntotally new"), (23L, "gamma\nnew"))
    assert(
      lnMap(Dedup.linesAgainstIndexBloom(lnBatch2, lnDir, "doc_id", "text"))
        == lnMap(Dedup.linesAgainstIndex(lnBatch2, lnDir, "doc_id", "text")))

    // ---- MINHASH family: planted near-dup pairs straddle the split AND
    // sit inside the batch (both candidate branches of the gated body)
    val mhAll = docsOf((0L until 30L).map(i =>
      (i, s"shared prose body for group ${i / 2} repeated tokens here")) ++
      Seq((101L, "batch internal twin xyz"), (103L, "batch internal twin xyz")): _*)
    val mhCorpus = mhAll.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
    val mhBatch = mhAll.filter(col("doc_id") % 2 === 1 || col("doc_id") > 100)
    val mhDir = java.nio.file.Files.createTempDirectory("mh_bloom").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(mhCorpus, "doc_id", "text", 3, 32, 8), mhDir, 3)
    Dedup.buildMinhashBloom(spark, mhDir, expectedItems = 1000L)
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.get(2)).toMap
    val mhPlain = pairMap(
      Dedup.nearDupAgainstIndex(mhBatch, mhDir, "doc_id", "text", 0.4))
    val mhBloom = pairMap(
      Dedup.nearDupAgainstIndexBloom(mhBatch, mhDir, "doc_id", "text", 0.4))
    assert(mhBloom == mhPlain && mhPlain.contains((101L, 103L)) &&
      mhPlain.exists { case ((a, b), _) => a % 2 == 0 || b % 2 == 0 },
      s"minhash bloom diverged or plant missing: ${mhPlain.keySet}")
    Dedup.mergeIntoMinhashIndex(mhBatch, mhDir, "doc_id", "text")
    val eMh = intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstIndexBloom(mhBatch, mhDir, "doc_id", "text", 0.4)
    }
    assert(eMh.getMessage.contains("re-run buildMinhashBloom"), eMh.getMessage)

    // ---- SIGNATURE family: the p82 base/flip plant
    val sig = docsOf((0L until 24L).map(i => (i, s"t$i")): _*)
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(string(doc_id - doc_id % 3)), 1, 12), 16, 10) AS BIGINT)")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L))).as("sig"))
    val sigDir = java.nio.file.Files.createTempDirectory("sig_bloom").toString
    Dedup.saveSignatureIndex(sig.filter(col("doc_id") % 2 === 0), sigDir,
      "doc_id", "sig", maxHamming = 4)
    Dedup.buildSignatureBloom(spark, sigDir, expectedItems = 1000L)
    val sgBatch = sig.filter(col("doc_id") % 2 === 1)
    val sgPlain = pairMap(
      Dedup.hammingAgainstIndex(sgBatch, sigDir, "doc_id", "sig"))
    val sgBloom = pairMap(
      Dedup.hammingAgainstIndexBloom(sgBatch, sigDir, "doc_id", "sig"))
    assert(sgBloom == sgPlain && sgPlain.nonEmpty,
      s"signature bloom diverged: plain=${sgPlain.keySet} bloom=${sgBloom.keySet}")
    Dedup.mergeIntoSignatureIndex(sgBatch, sigDir, "doc_id", "sig")
    val eSg = intercept[IllegalArgumentException] {
      Dedup.hammingAgainstIndexBloom(sgBatch, sigDir, "doc_id", "sig")
    }
    assert(eSg.getMessage.contains("re-run buildSignatureBloom"), eSg.getMessage)

    // ---- COSINE family: grouped near-parallel vectors
    val vecs = (0L until 20L).map { i =>
      val g = (i / 2).toInt
      (i, Seq.tabulate(8)(j =>
        (if (j == g % 8) 1.0 else 0.05 * ((g + j) % 3)) + 0.001 * (i % 2)))
    }.toDF("vec_id", "embedding")
    val cosDir = java.nio.file.Files.createTempDirectory("cos_bloom").toString
    Similarity.saveCosineIndex(vecs.filter(col("vec_id") % 2 === 0), cosDir,
      tables = 4, planesPerTable = 8, dim = 8)
    Similarity.buildCosineBloom(spark, cosDir, expectedItems = 1000L)
    val cosBatch = vecs.filter(col("vec_id") % 2 === 1)
    val cosPlain = pairMap(
      Similarity.cosineNearDupAgainstIndex(cosBatch, cosDir, 0.9))
    val cosBloom = pairMap(
      Similarity.cosineNearDupAgainstIndexBloom(cosBatch, cosDir, 0.9))
    assert(cosBloom == cosPlain && cosPlain.nonEmpty,
      s"cosine bloom diverged: plain=${cosPlain.keySet} bloom=${cosBloom.keySet}")
    Similarity.mergeIntoCosineIndex(cosBatch, cosDir)
    val eCos = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupAgainstIndexBloom(cosBatch, cosDir, 0.9)
    }
    assert(eCos.getMessage.contains("re-run buildCosineBloom"), eCos.getMessage)

    // ---- size guard: a sketch past the task-binary ceiling refuses to
    // build, with the sharding guidance, BEFORE any distributed work
    val eSz = intercept[IllegalArgumentException] {
      Dedup.buildLineBloom(spark, lnDir, expectedItems = 3000000000L)
    }
    assert(eSz.getMessage.contains("SHARD"), eSz.getMessage)
    assert(Dedup.bloomSketchBytes(1000000000L, 0.01) <= Dedup.MaxBloomSketchBytes,
      "a 1B-key 1% sketch must stay under the ceiling (the documented point)")

    for (d <- Seq(lnDir, mhDir, sigDir, cosDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    CacheLedger.drain()
  }

  test("line stored index: temporal screen rule; fold == rebuild; foreign keys fail loudly") {
    import spark.implicits._
    val corpus = docsOf(
      (2L, "alpha one\nshared footer\nbeta"),
      (4L, "gamma\nshared footer"))
    val batch = docsOf(
      (11L, "fresh line one\nshared footer\nfresh line two"),
      (13L, "batch dup line\n\t\nunique a"),
      (15L, "batch dup line\nunique b"))
    val dir = java.nio.file.Files.createTempDirectory("line_idx").toString
    Dedup.saveLineIndex(corpus, "doc_id", "text", dir)
    def screenMap(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = screenMap(
      Dedup.linesAgainstIndex(batch, dir, "doc_id", "text"))
    // corpus-known line dies from the TOUCHED doc; whitespace-only
    // lines always pass; the batch-internal dup keeps its first
    // (doc, pos) occurrence; untouched docs pass verbatim
    assert(out == Map(
      11L -> "fresh line one\nfresh line two",
      13L -> "batch dup line\n\t\nunique a",
      15L -> "unique b"), out)
    // fold == rebuild: after merging the batch in, a later batch's
    // screen must equal screening against a fresh corpus ∪ batch index
    Dedup.mergeIntoLineIndex(batch, dir, "doc_id", "text")
    val batch2 = docsOf(
      (21L, "unique a\nbrand new line"), // 'unique a' now known (from 13)
      (23L, "another new line"))
    val rebuilt = java.nio.file.Files.createTempDirectory("line_idx2").toString
    Dedup.saveLineIndex(corpus.unionByName(batch), "doc_id", "text", rebuilt)
    val foldScreen = screenMap(
      Dedup.linesAgainstIndex(batch2, dir, "doc_id", "text"))
    assert(foldScreen == screenMap(
      Dedup.linesAgainstIndex(batch2, rebuilt, "doc_id", "text")),
      "fold != rebuild")
    assert(foldScreen(21L) == "brand new line" &&
      foldScreen(23L) == "another new line", foldScreen)
    // bucketed layout (r13): identical rewritten batch, fold through
    // the catalog table, corpus side scans Bucketed: true, plain merge
    // refuses the layout
    val bkDir = java.nio.file.Files.createTempDirectory("line_bk").toString
    Dedup.saveLineIndexBucketed(corpus, "doc_id", "text", bkDir,
      nBuckets = 8, tablePrefix = "t_ln")
    assert(screenMap(Dedup.linesAgainstIndexBucketed(batch, bkDir,
      "doc_id", "text", tablePrefix = "t_ln")) == out,
      "bucketed line screen diverged")
    Dedup.mergeIntoLineIndexBucketed(batch, bkDir, "doc_id", "text",
      tablePrefix = "t_ln")
    assert(screenMap(Dedup.linesAgainstIndexBucketed(batch2, bkDir,
      "doc_id", "text", tablePrefix = "t_ln")) == foldScreen,
      "bucketed fold != plain fold")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.linesAgainstIndexBucketed(batch2, bkDir,
        "doc_id", "text", tablePrefix = "t_ln")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"stored side must scan bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    val eBk = intercept[IllegalArgumentException] {
      Dedup.mergeIntoLineIndex(batch, bkDir, "doc_id", "text")
    }
    assert(eBk.getMessage.contains("BUCKETED layout"), eBk.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(bkDir))
    // a foreign append with keys outside the 60-bit family fails loudly
    Seq((1L << 62, 1L, 0L, 1L)).toDF("lk", "doc", "pos", "cnt")
      .coalesce(1).write.mode("append").parquet(s"$dir/index")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadLineIndex(spark, dir)
    }
    assert(e.getMessage.contains("outside the"), e.getMessage)
    // a foreign FAMILY in meta fails before any join
    Seq(("simhash", 48)).toDF("family", "key_bits")
      .write.mode("overwrite").parquet(s"$rebuilt/meta")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.loadLineIndex(spark, rebuilt)
    }
    assert(e2.getMessage.contains("not line_md5_60"), e2.getMessage)
    for (d <- Seq(dir, rebuilt))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    CacheLedger.drain()
  }

  test("incremental hamming == full pairs touching the batch; stored index serves identically") {
    // groups of <=3 docs share a 48-bit base signature; members get a
    // doc-derived bit flip (the p74/p82 plant)
    val sig = docs.select(col("doc_id"),
      expr("CAST(conv(substr(md5(string(doc_id - doc_id % 3)), 1, 12), 16, 10) AS BIGINT)")
        .as("base"))
      .withColumn("sig", col("base")
        .bitwiseXOR(when(col("doc_id") % 3 >= 1,
          expr("shiftleft(1L, cast(doc_id % 48 as int))")).otherwise(lit(0L))))
      .select("doc_id", "sig")
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = pairMap(Dedup.hammingPairs48(sig, "doc_id", "sig", 4))
    val batch = sig.filter(col("doc_id") % 2 === 1)
    val corpus = sig.filter(col("doc_id") % 2 === 0)
    val inc = pairMap(Dedup.hammingPairsIncremental(
      batch, corpus, "doc_id", "sig", 4))
    val want = full.view.filterKeys { case (a, b) => a % 2 == 1 || b % 2 == 1 }.toMap
    assert(inc == want && want.nonEmpty,
      s"missing=${want.keySet -- inc.keySet} extra=${inc.keySet -- want.keySet}")
    // stored-path serve: parquet round-trip, self-configured from meta
    val dir = java.nio.file.Files.createTempDirectory("sig_idx").toString
    Dedup.saveSignatureIndex(corpus, dir, "doc_id", "sig", maxHamming = 4)
    val served = pairMap(Dedup.hammingAgainstIndex(batch, dir, "doc_id", "sig"))
    assert(served == inc)
    // a malformed meta must fail LOUDLY, not silently mis-band
    import spark.implicits._
    Seq(4, 5).toDF("max_hamming").write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadSignatureIndex(spark, dir)
    }
    assert(e.getMessage.contains("ONE meta row"), e.getMessage)
  }

  test("bucketed index layout: backfill screens == broadcast screens; corpus side exchange-free") {
    import org.apache.spark.sql.functions.{array => fArray}
    val batchDocs = docs.filter(col("doc_id") % 2 === 1)
    val corpusDocs = docs.filter(col("doc_id") % 2 === 0)
    def pairMap(df: DataFrame, a: String, b: String, v: String) = df.collect()
      .map(r => (r.getAs[Long](a), r.getAs[Long](b)) -> r.getAs[Any](v)).toMap

    // --- minhash: one data copy serves both access paths
    val mhDir = java.nio.file.Files.createTempDirectory("bk_mh").toString
    Dedup.saveMinhashIndexBucketed(
      Dedup.minhashIndex(corpusDocs, "doc_id", "text", 3, 32, 8), mhDir, 3,
      nBuckets = 8, tablePrefix = "t_mh")
    val mhWant = pairMap(Dedup.nearDupAgainstIndex(
      batchDocs, mhDir, "doc_id", "text", 0.4), "doc_a", "doc_b", "jaccard")
    val mhScreen = Dedup.nearDupAgainstIndexBucketed(
      batchDocs, mhDir, "doc_id", "text", 0.4, tablePrefix = "t_mh")
    assert(pairMap(mhScreen, "doc_a", "doc_b", "jaccard") == mhWant
      && mhWant.nonEmpty, "bucketed minhash screen diverged")
    // the corpus band table joins WITHOUT an exchange above its scan:
    // only the batch side shuffles (the scratch-proven single-exchange
    // shape), and the scan itself reports its buckets
    // broadcast disabled for the probe: at spec scale the tiny batch
    // would broadcast (also corpus-exchange-free, but not the backfill
    // shape under test — a backfill batch CANNOT broadcast)
    val batchBands = Dedup.lshBands(batchDocs, "doc_id", "text", 3, 32, 8)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = batchBands.join(spark.table("t_mh_bands"), Seq("band", "bucket"))
      val probePlan = probe.queryExecution.executedPlan.toString
      assert(probePlan.contains("Bucketed: true") &&
        probePlan.contains("SelectedBucketsCount"),
        s"corpus band scan not bucketed:\n$probePlan")
      // exactly ONE shuffle on the join keys — the batch side; the
      // corpus side's partitioning comes from the bucketed scan (the
      // batch's own minhash construction shuffles on doc internally,
      // which is batch-proportional and not under test here)
      assert(probePlan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(band")) == 1,
        s"expected ONE band-key exchange (batch side only):\n$probePlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

    // --- 48-bit signature
    val sig = docs.select(col("doc_id"),
      expr("CAST(conv(substr(md5(string(doc_id - doc_id % 3)), 1, 12), 16, 10) AS BIGINT)")
        .bitwiseXOR(when(col("doc_id") % 3 >= 1,
          expr("shiftleft(1L, cast(doc_id % 48 as int))")).otherwise(lit(0L)))
        .as("sig"))
    val sBatch = sig.filter(col("doc_id") % 2 === 1)
    val sCorpus = sig.filter(col("doc_id") % 2 === 0)
    val sgDir = java.nio.file.Files.createTempDirectory("bk_sig").toString
    Dedup.saveSignatureIndexBucketed(sCorpus, sgDir, "doc_id", "sig",
      maxHamming = 4, nBuckets = 8, tablePrefix = "t_sig")
    val sgWant = pairMap(Dedup.hammingAgainstIndex(
      sBatch, sgDir, "doc_id", "sig"), "doc_a", "doc_b", "hamming")
    val sgGot = pairMap(Dedup.hammingAgainstIndexBucketed(
      sBatch, sgDir, "doc_id", "sig", tablePrefix = "t_sig"),
      "doc_a", "doc_b", "hamming")
    assert(sgGot == sgWant && sgWant.nonEmpty, "bucketed hamming screen diverged")

    // --- cosine
    val base = emb.filter(col("vec_id") < 200).select("vec_id", "embedding")
    val cBatch = base.filter(col("vec_id") % 2 === 1)
      .unionByName(base.filter(col("vec_id") % 2 === 0).limit(20)
        .select((col("vec_id") + 10000).as("vec_id"),
          col("embedding"))) // planted copies of stored vectors
    val cCorpus = base.filter(col("vec_id") % 2 === 0)
    val csDir = java.nio.file.Files.createTempDirectory("bk_cos").toString
    Similarity.saveCosineIndexBucketed(cCorpus, csDir, dim = 64,
      nBuckets = 8, tablePrefix = "t_cos")
    val csWant = pairMap(Similarity.cosineNearDupAgainstIndex(
      cBatch, csDir, 0.35), "vec_a", "vec_b", "sim")
    val csGot = pairMap(Similarity.cosineNearDupAgainstIndexBucketed(
      cBatch, csDir, 0.35, tablePrefix = "t_cos"), "vec_a", "vec_b", "sim")
    assert(csGot == csWant && csWant.nonEmpty, "bucketed cosine screen diverged")

    // fresh-catalog re-registration: drop the session tables, screen
    // again — register() re-attaches the DDL over the existing files
    Seq("t_mh_docs", "t_mh_bands", "t_sig_sigs", "t_sig_bands",
      "t_cos_vecs", "t_cos_bands")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val mhAgain = pairMap(Dedup.nearDupAgainstIndexBucketed(
      batchDocs, mhDir, "doc_id", "text", 0.4, tablePrefix = "t_mh"),
      "doc_a", "doc_b", "jaccard")
    assert(mhAgain == mhWant, "re-registered catalog lost the layout")
    // a plain-layout index refuses the bucketed screen loudly
    val plainDir = java.nio.file.Files.createTempDirectory("bk_plain").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(corpusDocs, "doc_id", "text", 3, 32, 8), plainDir, 3)
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstIndexBucketed(batchDocs, plainDir, "doc_id",
        "text", 0.4)
    }
    assert(e.getMessage.contains("bucketed layout"), e.getMessage)
  }

  test("bucketed index merge: fold-in == fresh rebuild; plain merge refuses the layout") {
    val a = docs.filter(col("doc_id") < 300)
    val b = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val c = docs.filter(col("doc_id") >= 400)
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val foldDir = java.nio.file.Files.createTempDirectory("bk_fold").toString
    Dedup.saveMinhashIndexBucketed(
      Dedup.minhashIndex(a, "doc_id", "text", 3, 32, 8), foldDir, 3,
      nBuckets = 4, tablePrefix = "t_fold")
    // the PLAIN merge must refuse the bucketed layout LOUDLY — its
    // appended files would carry no bucket ids and silently corrupt
    // bucket-to-file assignment on every later bucketed read
    val e = intercept[IllegalArgumentException] {
      Dedup.mergeIntoMinhashIndex(b, foldDir, "doc_id", "text")
    }
    assert(e.getMessage.contains("BUCKETED layout"), e.getMessage)
    // the bucketed merge appends THROUGH the catalog: fold-in == rebuild
    Dedup.mergeIntoMinhashIndexBucketed(b, foldDir, "doc_id", "text",
      tablePrefix = "t_fold")
    val rebuildDir = java.nio.file.Files.createTempDirectory("bk_rb").toString
    Dedup.saveMinhashIndexBucketed(
      Dedup.minhashIndex(a.unionByName(b), "doc_id", "text", 3, 32, 8),
      rebuildDir, 3, nBuckets = 4, tablePrefix = "t_rb")
    val merged = pairMap(Dedup.nearDupAgainstIndexBucketed(
      c, foldDir, "doc_id", "text", 0.4, tablePrefix = "t_fold"))
    val rebuilt = pairMap(Dedup.nearDupAgainstIndexBucketed(
      c, rebuildDir, "doc_id", "text", 0.4, tablePrefix = "t_rb"))
    assert(merged == rebuilt && rebuilt.nonEmpty,
      s"merged=${merged.size} rebuilt=${rebuilt.size}")
    // and the broadcast/plain READ path sees the merged files too
    val plainRead = pairMap(Dedup.nearDupAgainstIndex(
      c, foldDir, "doc_id", "text", 0.4))
    assert(plainRead == rebuilt, "plain readers diverged after bucketed merge")
    // one prefix = one location: reusing t_fold for a DIFFERENT index
    // path must refuse, not silently scan the first index
    val e2 = intercept[IllegalArgumentException] {
      Dedup.nearDupAgainstIndexBucketed(c, rebuildDir, "doc_id", "text",
        0.4, tablePrefix = "t_fold")
    }
    assert(e2.getMessage.contains("cannot share a table prefix"),
      e2.getMessage)
  }

  test("epochShuffle + repeatUpsample: dense independent orders; budget met in expectation") {
    val out = Sampling.epochShuffle(docs, "doc_id", nEpochs = 3)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(2)).toMap
    val n = docs.count()
    for (e <- 0L to 2L) {
      val eps = out.collect { case ((`e`, _), pos) => pos }.toSeq.sorted
      assert(eps == (1L to n), s"epoch $e positions not dense")
    }
    // independent orders per epoch
    val ids = out.keys.map(_._2).toSeq.distinct
    assert(ids.count(id => out((0L, id)) != out((1L, id))) > ids.size / 2)
    // physical partitioning never moves a position
    val rep = Sampling.epochShuffle(docs.repartition(13), "doc_id", 3)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(2)).toMap
    assert(rep == out, "epoch order depends on partitioning")

    val ru = Sampling.repeatUpsample(docs, "doc_id", "text",
      budgetTokens = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ct = ru.map(_._2).sum
    val fe = math.min(4L, 100000L / ct)
    assert(ru.forall(r => r._3 == fe || r._3 == fe + 1),
      s"repeats outside {$fe, ${fe + 1}}")
    val emitted = ru.map(r => r._2 * r._3).sum
    assert(math.abs(emitted - 100000L) < ct / 2,
      s"emitted $emitted vs budget 100000 (corpus $ct)")
    // a budget past the repetition cliff caps at maxEpochs, frac 0
    val capped = Sampling.repeatUpsample(docs, "doc_id", "text",
      budgetTokens = ct * 100, maxEpochs = 4)
      .collect().map(_.getLong(2))
    assert(capped.forall(_ == 4L), "cap at maxEpochs violated")
  }

  test("nearDupDecontaminate: cross-set only, internal train dups never flag, benchmark broadcast") {
    def words(seed: Int) = (1 to 30)
      .map(k => s"w${seed}x$k token$k").mkString(" ")
    val train = docsOf(
      (1L, words(1)), (2L, words(2)),
      (3L, words(2)),                          // internal train near-dup — NOT contamination
      (4L, words(4) + " tail"), (5L, words(5)))
    val bench = docsOf(
      (100L, words(1).replaceFirst("token3", "token3b")), // near-dups train 1
      (101L, words(9)))                                    // clean benchmark doc
    val out = Dedup.nearDupDecontaminate(train, bench, "doc_id", "text")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet == Set((1L, 100L)),
      s"flagged ${rows.mkString(",")} — want exactly train 1 x bench 100")
    // the train-internal 2~3 duplicate pair must never surface here
    assert(!rows.exists(p => p._1 == 2L || p._1 == 3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the CROSS-SET joins broadcast the bounded benchmark side (the
    // index-construction joins inside minhashIndex may SMJ at spec
    // scale — corpus-keyed equi-joins, not under test here)
    assert(plan.contains("BroadcastHashJoin [band") &&
      plan.contains("BroadcastHashJoin [bench_id"),
      s"benchmark side must broadcast (bounded by construction):\n$plan")
    CacheLedger.drain()
  }

  test("fimTransform: PSM order pinned; cuts partition the text; rate edges") {
    val d = docsOf((1L, "abcdefghij"), (2L, "x"), (3L, ""),
      (4L, "h\u00e9llo w\u00f6rld \u4f60\u597d"))
    val out = Sampling.fimTransform(d, "doc_id", "text", fimRatePct = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val texts = Map(1L -> "abcdefghij", 2L -> "x", 3L -> "",
      4L -> "h\u00e9llo w\u00f6rld \u4f60\u597d")
    for ((id, (applied, a, b, fim)) <- out) {
      assert(applied, s"doc $id not applied at rate 100")
      val t = texts(id)
      assert(0 <= a && a <= b && b <= t.length, s"doc $id cuts ($a,$b)")
      val (pre, mid0, suf) = (t.substring(0, a.toInt),
        t.substring(a.toInt, b.toInt), t.substring(b.toInt))
      // PSM: PRE prefix SUF suffix MID middle — and the three pieces
      // partition the original exactly
      assert(fim == s"<|fim_pre|>$pre<|fim_suf|>$suf<|fim_mid|>$mid0",
        s"doc $id: $fim")
      assert(pre + mid0 + suf == t)
    }
    // rate 0: everything passes through verbatim
    val none = Sampling.fimTransform(d, "doc_id", "text", fimRatePct = 0)
      .collect().map(r => (r.getBoolean(1), r.getString(4)))
    assert(none.forall(!_._1) &&
      none.map(_._2).toSet == texts.values.toSet)
    // plan: one projection, no shuffle, no UDF
    val plan = Sampling.fimTransform(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("hardNegativesTopK: never a same-label neighbor; equals label-filtered brute force") {
    val q = emb.filter(col("vec_id") < 20)
    val got = Similarity.hardNegativesTopK(emb, q, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got.nonEmpty && got.values.forall { case (ql, nl, _, _) => ql != nl },
      "a same-label pair ranked as a hard negative")
    // ranks dense 1..5 per query
    val byQ = got.toSeq.groupBy(_._1._1)
    assert(byQ.values.forall(_.map(_._2._4).sorted.toSeq == (1L to 5L)))
    // the label predicate is the ONLY difference vs brute force:
    // every returned (query, neighbor, sim) appears in the unfiltered
    // top list restricted to cross-label pairs
    val labels = emb.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(emb, q, k = 200).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (((qid, nid), (_, _, sim, _)) <- got) {
      assert(labels(qid) != labels(nid))
      assert(brute.get((qid, nid)).forall(s => math.abs(s - sim) < 1e-9))
    }
  }

  test("hardNegativesBandedTopK: subset-of-exact with identical sims; planted near-dup negative never missed") {
    val q = emb.filter(col("vec_id") < 20)
    val banded = Similarity.hardNegativesBandedTopK(emb, q, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(banded.nonEmpty)
    // every banded row is cross-label and carries the TRUE cosine —
    // the exact form with a huge k is the reference relation
    val exact = Similarity.hardNegativesTopK(emb, q, k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
    for (((qid, nid), (ql, nl, sim, _)) <- banded) {
      assert(ql != nl, s"same-label pair ($qid,$nid) ranked")
      assert(exact.get((qid, nid)).exists(s => math.abs(s - sim) < 1e-9),
        s"banded sim for ($qid,$nid) not the true cosine")
    }
    // ranks dense 1..n within each query's candidate set
    for ((qid, rows) <- banded.toSeq.groupBy(_._1._1))
      assert(rows.map(_._2._4).sorted.toSeq == (1L to rows.size), s"query $qid")
    // the LSH guarantee in miniature: a TRUE near-duplicate negative
    // (sim = 1.0 — a scaled copy of a corpus vector under a foreign
    // label) signs identically in every table, so it can NEVER be
    // missed and must rank with sim 1.0
    val plant = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 9000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
        lit(-1L).as("label"))
    val got = Similarity.hardNegativesBandedTopK(emb, plant, k = 1, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.size == 10 && got.values.forall(_ == 1.0),
      s"planted near-dup negatives missed or mis-scored: $got")
    // the plan is candidate-bounded: no cartesian anywhere, and the
    // corpus-facing joins broadcast the bounded query/candidate sides
    val plan = Similarity.hardNegativesBandedTopK(emb, q, k = 5, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("releaseCorpus: deterministic shards, identity certificate, tamper detection") {
    val corpus = docs.select("doc_id", "text").limit(200)
      .withColumn("lang", lit("en")).persist()
    val dir = java.nio.file.Files.createTempDirectory("rel_spec").toString
    val n = Release.releaseCorpus(corpus, "doc_id", s"$dir/r1",
      nShards = 4, compression = "gzip", salt = "s")
    assert(n == corpus.count())
    // layout: one directory per shard, gzip parts inside
    val shards = new java.io.File(s"$dir/r1").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shards.nonEmpty && shards.length <= 4, shards.mkString(","))
    // shard membership is a pure function of (salt, id, nShards):
    // a re-release from a differently-partitioned frame lands every
    // doc in the same shard
    Release.releaseCorpus(corpus.repartition(13), "doc_id", s"$dir/r2",
      nShards = 4, compression = "gzip", salt = "s")
    def shardOf(path: String): Map[Long, String] = {
      import org.apache.spark.sql.types._
      spark.read.text(path)
        .select(input_file_name().as("f"), col("value"))
        .select(regexp_extract(col("f"), "shard=(\\d+)", 1).as("shard"),
          get_json_object(col("value"), "$.doc_id").cast("long").as("id"))
        .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    }
    assert(shardOf(s"$dir/r1") == shardOf(s"$dir/r2"),
      "shard membership depends on physical partitioning")
    // the certificate audits a landed release on its own — and FAILS
    // on tampering (a dropped shard must never verify)
    assert(Release.verifyRelease(corpus, s"$dir/r1") == n)
    val victim = new java.io.File(s"$dir/r1/${shards.head}")
    victim.listFiles().filter(_.getName.startsWith("part-")).foreach(_.delete())
    val e = intercept[IllegalArgumentException] {
      Release.verifyRelease(corpus, s"$dir/r1")
    }
    assert(e.getMessage.contains("read-back mismatch"), e.getMessage)
    corpus.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("verifyRelease: even-multiset substitution (XOR-cancelling) fails loudly") {
    // the round-10 certificate was count + bit_xor(xxhash64) only, and
    // XOR cancels in pairs: replacing a duplicated row pair {A,A} in
    // the landed files with a different duplicated pair {B,B} kept
    // BOTH checks green while the release silently lost data. The
    // round-11 certificate adds an exact decimal SUM of the row hashes
    // (order-free AND duplicate-sensitive), which this corruption must
    // trip.
    import spark.implicits._
    val corpus = Seq((1L, "alpha"), (1L, "alpha"), (2L, "keep"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rel_xor").toString
    Release.releaseCorpus(corpus, "doc_id", s"$dir/r", nShards = 1,
      compression = "none")
    val junk = """{"doc_id":1,"text":"junk"}"""
    for {
      shard <- new java.io.File(s"$dir/r").listFiles()
        if shard.getName.startsWith("shard=")
      part <- shard.listFiles() if part.getName.startsWith("part-")
    } {
      val lines = scala.io.Source.fromFile(part).getLines().toSeq
      val swapped = lines.map(l => if (l.contains("alpha")) junk else l)
      if (swapped != lines) {
        val w = new java.io.PrintWriter(part)
        try swapped.foreach(w.println) finally w.close()
        // drop Hadoop's local-FS .crc sidecar: it would catch the edit
        // before the certificate ever ran, and the corruption classes
        // the certificate exists for (remote stores, copies between
        // stores) carry no sidecars
        new java.io.File(part.getParent, s".${part.getName}.crc").delete()
      }
    }
    // demonstrate the corruption IS the xor-blind spot: same count,
    // same bit_xor over the row hashes as the source corpus
    val back = graft.sources.JsonlCorpus.read(spark, s"$dir/r", corpus.schema)
    def xorSig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("doc_id"), col("text")))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(xorSig(back) == xorSig(corpus),
      "counterexample must be invisible to count + bit_xor")
    val e = intercept[IllegalArgumentException] {
      Release.verifyRelease(corpus, s"$dir/r")
    }
    assert(e.getMessage.contains("read-back mismatch"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("band-geometry knob: pairs identical at any nBlocks; wider keys shrink candidates") {
    // the 100-TB failure mode the knob exists for, reproduced in
    // miniature: every doc shares its LOW 24 bits (boilerplate-like
    // signature mass), so at the minimal geometry (h=1 -> two 24-bit
    // blocks) block 0 is one giant bucket and candidates go O(n^2);
    // group structure lives in the HIGH 24 bits, so wider keys (every
    // 3-of-4-block combo includes a high block) collapse the bucket.
    // Pairs must be IDENTICAL at every geometry (pigeonhole holds for
    // any nBlocks > maxHamming) — only the candidate volume may move.
    val sig = docs.select(col("doc_id"),
      expr("CAST(conv(substr(md5(string(doc_id - doc_id % 3)), 1, 6), 16, 10) AS BIGINT)")
        .as("grp"))
      .withColumn("sig", shiftleft(col("grp"), 24)
        .bitwiseOR(lit(0xABCDEL))
        .bitwiseXOR(when(col("doc_id") % 3 >= 1,
          expr("shiftleft(1L, 24 + cast(doc_id % 24 as int))"))
          .otherwise(lit(0L))))
      .select("doc_id", "sig").persist()
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = pairMap(Dedup.hammingPairs48(sig, "doc_id", "sig", 48)
      .filter(col("hamming") <= 1))
    assert(want.nonEmpty, "plant produced no close pairs")
    def candidates(nBlocks: Int): Long = {
      val banded = sig.select(col("doc_id").as("doc"),
        explode(Dedup.hammingBands48(col("sig"), 1, nBlocks)).as("bb"))
        .select(col("doc"), col("bb.band"), col("bb.bits"))
      banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc") < col("b.doc"))
        .select(col("a.doc"), col("b.doc")).distinct().count()
    }
    for (m <- Seq(0, 2, 4, 8))
      assert(pairMap(Dedup.hammingPairs48(sig, "doc_id", "sig", 1, m)) == want,
        s"nBlocks=$m lost or invented pairs")
    val (c2, c4, c8) = (candidates(2), candidates(4), candidates(8))
    // minimal geometry: the shared low block buckets EVERYTHING together
    val n = sig.count()
    assert(c2 >= n * (n - 1) / 4, s"plant failed to flood the minimal bands: $c2")
    assert(c4 < c2 / 10 && c8 <= c4,
      s"wider keys must shrink candidates: c2=$c2 c4=$c4 c8=$c8")
    assert(c8 >= want.size, "candidates cannot undercut true pairs")
    // lossy geometries are refused up front
    val bad = intercept[IllegalArgumentException] {
      Dedup.hammingBands48(col("sig"), 2, 2)
    }
    assert(bad.getMessage.contains("losslessness"), bad.getMessage)
    // stored index pins its geometry; serving batches band under it
    val batch = sig.filter(col("doc_id") % 2 === 1)
    val corpus = sig.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("sig_geom").toString
    Dedup.saveSignatureIndex(corpus, dir, "doc_id", "sig", maxHamming = 1,
      nBlocks = 4)
    val (h, m, _, _) = Dedup.loadSignatureIndex(spark, dir)
    assert((h, m) == ((1, 4)), s"meta geometry: h=$h m=$m")
    val served = pairMap(Dedup.hammingAgainstIndex(batch, dir, "doc_id", "sig"))
    val inc = pairMap(Dedup.hammingPairsIncremental(
      batch, corpus, "doc_id", "sig", 1, nBlocks = 4))
    assert(served == inc && inc ==
      want.view.filterKeys { case (a, b) => a % 2 == 1 || b % 2 == 1 }.toMap)
    // an index persisted BEFORE the knob (meta lacks n_blocks) loads
    // as the minimal geometry its bands were actually built at
    import spark.implicits._
    Seq(1).toDF("max_hamming").write.mode("overwrite").parquet(s"$dir/meta")
    Dedup.saveSignatureIndex(corpus, s"$dir/rebuilt", "doc_id", "sig", 1)
    Seq(1).toDF("max_hamming").write.mode("overwrite")
      .parquet(s"$dir/rebuilt/meta")
    val (h0, m0, _, _) = Dedup.loadSignatureIndex(spark, s"$dir/rebuilt")
    assert((h0, m0) == ((1, 2)), s"legacy meta: h=$h0 m=$m0")
    sig.unpersist()
  }

  test("signature index fold-in: merge == fresh rebuild; id clash fails loudly") {
    val sig = docs.select(col("doc_id"),
      expr("CAST(conv(substr(md5(string(doc_id - doc_id % 3)), 1, 12), 16, 10) AS BIGINT)")
        .bitwiseXOR(when(col("doc_id") % 3 >= 1,
          expr("shiftleft(1L, cast(doc_id % 48 as int))")).otherwise(lit(0L)))
        .as("sig"))
    val a = sig.filter(col("doc_id") < 300)
    val b = sig.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val c = sig.filter(col("doc_id") >= 400)
    def pairMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val foldDir = java.nio.file.Files.createTempDirectory("sig_fold").toString
    Dedup.saveSignatureIndex(a, foldDir, "doc_id", "sig", maxHamming = 4)
    Dedup.mergeIntoSignatureIndex(b, foldDir, "doc_id", "sig")
    val rebuildDir = java.nio.file.Files.createTempDirectory("sig_rebuild").toString
    Dedup.saveSignatureIndex(a.unionByName(b), rebuildDir, "doc_id", "sig",
      maxHamming = 4)
    val merged = pairMap(Dedup.hammingAgainstIndex(c, foldDir, "doc_id", "sig"))
    val rebuilt = pairMap(Dedup.hammingAgainstIndex(c, rebuildDir, "doc_id", "sig"))
    assert(merged == rebuilt && rebuilt.nonEmpty,
      s"merged=${merged.size} rebuilt=${rebuilt.size}")
    val clash = intercept[IllegalArgumentException] {
      Dedup.mergeIntoSignatureIndex(b, foldDir, "doc_id", "sig",
        assertNewIds = true)
    }
    assert(clash.getMessage.contains("already exist"), clash.getMessage)
  }

  test("incremental minhash == full pairs restricted to pairs touching new docs") {
    val all = docs
    val newDocs = all.filter(col("doc_id") >= 400)
    val corpus = all.filter(col("doc_id") < 400)
    val full = Dedup.minhashLshPairs(all, "doc_id", "text", 3, 32, 8, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wantKeys = full.keySet.filter { case (a, b) => a >= 400 || b >= 400 }
    // the corpus index is stored between batches — parquet round-trip it
    // so the per-batch plan physically CANNOT recompute corpus shingles
    val idxDir = java.nio.file.Files.createTempDirectory("mh_index").toString
    Dedup.minhashIndex(corpus, "doc_id", "text", 3, 32, 8)
      .write.mode("overwrite").parquet(idxDir)
    val stored = spark.read.parquet(idxDir)
    // the wrapper is self-cleaning: it eagerly materializes the batch
    // result (localCheckpoint) and unpersists its own intermediates, so
    // a per-batch ingestion loop must not accumulate cached relations —
    // each call may retain AT MOST its checkpointed result RDD
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val incDf = Dedup.incrementalMinhashPairs(
      newDocs, stored, "doc_id", "text", 3, 32, 8, 0.4)
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter <= persistedBefore + 1,
      s"incremental batch leaked caches: $persistedBefore -> $persistedAfter")
    val inc = incDf
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc.keySet == wantKeys, s"missing=${wantKeys -- inc.keySet} extra=${inc.keySet -- wantKeys}")
    assert(wantKeys.forall(k => inc(k) == full(k)))
    // per-batch cost: the only text tokenization in the plan is the new
    // batch's — every scan of the raw documents carries the new-batch
    // filter, and the corpus side arrives pre-signed from the stored
    // index parquet. (The wrapper checkpoints its result, so plan shape
    // is asserted on the lazy core it delegates to.)
    val plan = Dedup.incrementalMinhashPairsFromIndex(
      Dedup.minhashIndex(newDocs, "doc_id", "text", 3, 32, 8), stored, 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("mh_index"), s"stored index not read:\n$plan")
    val docScanLines = plan.linesIterator.filter(_.contains("documents.parquet")).toSeq
    assert(docScanLines.nonEmpty)
    assert(docScanLines.forall(_.contains("GreaterThanOrEqual(doc_id,400)")),
      s"corpus documents re-scanned without the new-batch filter:\n${docScanLines.mkString("\n")}")
  }

  test("IVF ANN: probed-list search beats single-probe LSH recall on rank-1") {
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), 3)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (model, indexed) = Similarity.ivfIndex(emb, nLists = 16)
    val ivf = Similarity.ivfTopK(indexed, model,
      emb.filter(col("vec_id") < 50), k = 3, nProbe = 4)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.size == 50, "every query must get a neighbor")
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    // probing 4 of 16 data-adapted cells recovers most true rank-1s
    assert(hits * 1.0 / ivf.size > 0.35, s"IVF rank-1 recall $hits/50")
    // results are a subset of true similarities (exact cosine inside lists)
    val plan = Similarity.ivfTopK(indexed, model,
      emb.filter(col("vec_id") < 50), 3, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("multi-probe LSH recall dominates single-probe") {
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 50), 3)
      .filter(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(probes: Int): Double = {
      val got = Similarity.lshBucketedTopK(emb, emb.filter(col("vec_id") < 50),
        3, 4, 64, probes = probes)
        .filter(col("rnk") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.count { case (q, n) => brute.get(q).contains(n) } * 1.0 / brute.size
    }
    val r1 = recall(1); val r2 = recall(2)
    assert(r2 >= r1, s"multi-probe $r2 < single $r1")
    assert(r2 > 0.2, s"multi-probe recall $r2")
  }

  test("withRecall certificate: exact result scores 1.0; floor violation fails the query") {
    val q = emb.filter(col("vec_id") < 20)
    // brute force certified against itself: recall@k must be exactly 1
    val exact = Similarity.bruteForceTopK(emb, q, 3)
    val certified = Similarity.withRecall(exact, emb, q, k = 3, floor = 0.99)
    assert(certified.columns.contains("recall_at_k"))
    assert(certified.columns.contains("mean_recall"))
    val perQuery = certified.select("recall_at_k").distinct()
      .collect().map(_.getDouble(0)).toSeq
    assert(perQuery == Seq(1.0), s"per-query recalls: $perQuery")
    assert(certified.select("mean_recall").head().getDouble(0) == 1.0)
    // a deliberately wrong result (neighbors shifted out of the corpus)
    // must trip the in-plan floor assertion, not silently pass rows-only
    val wrong = exact.withColumn("neighbor_id",
      col("neighbor_id") + lit(10000000L))
    val ex = intercept[Exception] {
      Similarity.withRecall(wrong, emb, q, k = 3, floor = 0.5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("fell below floor")),
      s"unexpected failure: ${msgs(ex).mkString(" | ")}")
  }

  test("unigram LM score: hand-computed smoothed NLL; rare vocab scores higher") {
    // corpus: counts a=3, b=2 -> n=5, v=2; p(a)=4/7, p(b)=3/7
    // nll(a)=round(ln(7/4),6)=0.559616  nll(b)=round(ln(7/3),6)=0.847298
    val d = docsOf((1L, "a a b"), (2L, "a b"), (3L, "   "))
    val out = Quality.lmScore(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == BigDecimal((0.559616 * 2 + 0.847298) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._1 == 2L)
    assert(out(2L)._2 == BigDecimal((0.559616 + 0.847298) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // token-less doc: zero tokens, NULL score
    assert(out(3L)._1 == 0L && out(3L)._2.isNaN)
    // ranking property on a bigger corpus: a doc of corpus-common words
    // must score strictly below one of singleton gibberish
    val corpus = docsOf((0 until 50).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")) ++
      Seq((100L, "the quick brown fox"), (101L, "zxqj vvkw pplm qqrs")): _*)
    val scores = Quality.lmScore(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(100L) < scores(101L),
      s"common ${scores(100L)} should beat gibberish ${scores(101L)}")
  }

  test("line dedup: first (doc,pos) occurrence survives; normalization; blank lines pass") {
    val d = docsOf(
      (1L, "keep me\nshared line\nunique one"),
      (2L, "shared line\nother text"), // loses pos-0 line to doc 1 pos 1
      (3L, "repeat\nrepeat"), // intra-doc: second occurrence dropped
      (4L, "   \n\ttab"), // whitespace-only lines are layout, untouched
      (5L, "shared line"), // single line dropped -> reassembles to ""
      (6L, "Shared   LINE\nx")) // normalized match, original case lost
    val out = Dedup.dedupLines(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "keep me\nshared line\nunique one")
    assert(out(2L) == "other text")
    assert(out(3L) == "repeat")
    assert(out(4L) == "   \n\ttab")
    assert(out(5L) == "")
    assert(out(6L) == "x")
  }

  test("lm buckets: tertile split with ties-low boundary; empty doc gets NULL bucket") {
    // distinct scores over 3 docs -> one doc per bucket; doc 4 empty
    val d = docsOf(
      (1L, "a a a a"), // most common vocab -> lowest nll -> head
      (2L, "a a b b"),
      (3L, "c d e f"), // all singletons -> highest nll -> tail
      (4L, "  "))
    val out = Quality.lmBuckets(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap
    assert(out(1L) == "head")
    assert(out(2L) == "middle")
    assert(out(3L) == "tail")
    assert(out(4L) == null)
  }

  test("dsir: target-like source docs outscore gibberish; gram counts; target excluded") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    def mk(rows: (Long, String, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), schema)
    val d = mk(
      (1L, "alpha beta alpha beta", "en"), (2L, "alpha beta gamma", "en"),
      (10L, "alpha beta delta", "xx"), // shares target vocab + bigram
      (11L, "zz qq ww", "xx"), // disjoint from target
      (12L, "", "xx")) // gram-less
    val out = Dsir.importanceResample(d, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64, selectFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
          r.getBoolean(3)))).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // source docs only
    assert(out(10L)._1 == 5L) // 3 unigrams + 2 bigrams
    assert(out(11L)._1 == 5L)
    assert(out(10L)._2 > out(11L)._2,
      s"target-like ${out(10L)._2} must outscore gibberish ${out(11L)._2}")
    // selectFrac 0.5 over two scored docs: cutoff = midpoint, only the
    // target-like doc clears it; gram-less doc is never selected
    assert(out(10L)._3 && !out(11L)._3)
    assert(out(12L)._1 == 0L && out(12L)._2.isNaN && !out(12L)._3)
  }

  test("fingerprint is whitespace-normalization invariant and content-sensitive") {
    val d = docsOf(
      (1L, "hello   world  foo"), (2L, "hello world foo"),
      (3L, "Hello world foo"), (4L, "hello world bar"))
    val fps = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L)) // extra whitespace collapses
    assert(fps(2L) == fps(3L)) // case-folded
    assert(fps(2L) != fps(4L)) // content differs
    assert(fps.values.forall(_ >= 0))
  }

  test("multimodal: mapPartitions decode plumbing is deterministic and schema-typed") {
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    assert(media.schema("media").dataType == BinaryType)
    val decoded = Multimodal.decodeFeatures(media)
    assert(decoded.columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "n_frames", "brightness",
        "decoded_real"))
    // text bytes are not an image: every row takes the fallback path
    assert(decoded.filter(col("decoded_real")).count() == 0)
    val twice = Multimodal.decodeFeatures(media)
    assert(decoded.except(twice).count() == 0) // deterministic fallback
    val withResize = Multimodal.resizePlan(decoded, 256)
    val bad = withResize.filter(
      greatest(col("out_width"), col("out_height")) > 256 ||
        col("out_width") < 1 || col("out_height") < 1).count()
    assert(bad == 0)
    val frames = Multimodal.frameSamplePlan(decoded, 8)
    assert(frames.filter(size(col("sampled_frames")) > 8).count() == 0)
    assert(frames.filter(size(col("sampled_frames")) < 1).count() == 0)
  }

  test("repetition signals: degenerate docs score high, diverse docs low, empties zero") {
    val d = docsOf(
      (1L, "spam spam spam spam spam spam"),           // one word only
      (2L, "buy now buy now buy now buy now"),          // looping bigram
      (3L, "each word here appears exactly once today"),
      (4L, ""))                                         // no tokens
    val out = Quality.repetitionSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 == 1.0)     // max_word_frac: single repeated word
    assert(out(1L)._3 == 0.75)    // 4 trigram instances, 1 distinct → 3/4
    assert(out(2L)._2 >= 0.5, s"looping bigram frac ${out(2L)._2}")
    assert(out(3L)._1 < 0.2 && out(3L)._3 == 0.0)
    assert(out(4L) == ((0.0, 0.0, 0.0)))
  }

  test("PII scrub counts and redacts emails/IPs/phones; clean text untouched") {
    val d = docsOf(
      (1L, "mail a.b-c_1@sub.example.org and root@x.io now"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call 555-123-4567 maybe"),
      (4L, "no pii here at all"))
    val out = Quality.piiScrub(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L)._1 == 2 && out(1L)._4 == "mail [EMAIL] and [EMAIL] now")
    assert(out(2L)._2 == 2 && out(2L)._4 == "server at [IP] and [IP] up")
    assert(out(3L)._3 == 1 && out(3L)._4 == "call [PHONE] maybe")
    assert(out(4L) == ((0L, 0L, 0L, "no pii here at all")))
  }

  test("PII scrub counts agree with redaction on overlapping matches") {
    // the email consumes the would-be IP: it must count as 1 email,
    // 0 IPs — counts always match the [X] tokens in text_redacted
    val d = docsOf(
      (1L, "ping 1.2.3.4@example.com done"),
      (2L, "at 1.2.3.4 mail 1.2.3.4@example.com"))
    val out = Quality.piiScrub(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, "ping [EMAIL] done")))
    assert(out(2L) == ((1L, 1L, 0L, "at [IP] mail [EMAIL]")))
  }

  test("incremental cosine near-dup == full banded pairs touching the batch; stored index serves") {
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    def toMap(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = toMap(Similarity.cosineNearDupPairs(emb, 0.35,
      tables = 16, planesPerTable = 8, dim = 64))
    val want = full.keySet.filter { case (a, b) => a % 2 == 1 || b % 2 == 1 }
    val inc = toMap(Similarity.cosineNearDupPairsIncremental(batch, corpus,
      0.35, tables = 16, planesPerTable = 8, dim = 64))
    assert(inc.keySet == want,
      s"missing=${want -- inc.keySet} extra=${inc.keySet -- want}")
    assert(want.forall(k => inc(k) == full(k)))
    // persisted serving path: same result from the stored index, and
    // the new batch is the ONLY side banded fresh (the stored bands
    // parquet appears in the plan; the corpus embeddings do not)
    val dir = java.nio.file.Files.createTempDirectory("cos_idx").toString
    Similarity.saveCosineIndex(corpus, dir, tables = 16, planesPerTable = 8,
      dim = 64)
    val servedDf = Similarity.cosineNearDupAgainstIndex(batch, dir, 0.35)
    val plan = servedDf.queryExecution.executedPlan.toString
    assert(plan.contains("cos_idx"), s"stored index not read:\n$plan")
    val embScans = plan.linesIterator
      .filter(_.contains("embeddings.parquet")).toSeq
    assert(embScans.nonEmpty)
    val served = toMap(servedDf)
    assert(served.keySet == want && want.forall(k => served(k) == full(k)))
    // the serve path SELF-CONFIGURES from the meta row (bands the batch
    // under the STORED plane family, whatever the caller assumed) —
    // that, not a runtime check, is what makes family drift impossible
    import spark.implicits._
    Seq((8, 16, 64)).toDF("tables", "planes_per_table", "dim")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val (t2, p2, d2, _, _) = Similarity.loadCosineIndex(spark, dir)
    assert(t2 == 8 && p2 == 16 && d2 == 64)
    // and a corrupt meta (two rows) is rejected loudly
    Seq((8, 16, 64), (16, 8, 64)).toDF("tables", "planes_per_table", "dim")
      .write.mode("overwrite").parquet(s"$dir/meta")
    val ex = intercept[IllegalArgumentException] {
      Similarity.loadCosineIndex(spark, dir)
    }
    assert(ex.getMessage.contains("ONE meta row"))
  }

  test("cosineNearDupPairs skips null embeddings and derives dim past them") {
    import spark.implicits._
    def vec(seed: Int): Array[Double] =
      Array.tabulate(16)(d => math.sin(seed * 31 + d).abs + 0.1)
    // first row's embedding is null — dim derivation must look past it
    // instead of NPEing, and the null row must pair with nothing
    val rows = Seq((9L, null.asInstanceOf[Array[Double]]),
      (1L, vec(1)), (2L, vec(1).updated(0, vec(1)(0) + 0.001)), (3L, vec(7)))
    val pairs = Similarity.cosineNearDupPairs(
        rows.toDF("vec_id", "embedding"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L))
    // all-null corpus: empty pair frame, not a failure
    val allNull = Seq((1L, null.asInstanceOf[Array[Double]]))
      .toDF("vec_id", "embedding")
    assert(Similarity.cosineNearDupPairs(allNull, 0.5).count() == 0)
  }

  test("quantized-rescore ANN: int8 stage keeps the true top-k, output sims exact") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quant = Similarity.quantizedRescoreTopK(emb, queries, k = 5, m = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(quant.size == brute.size)
    // the rescore emits EXACT cosines, so overlapping pairs agree exactly
    val shared = quant.keySet intersect brute.keySet
    assert(shared.forall(k => quant(k) == brute(k)))
    // int8 candidate error must not evict true neighbors: recall >= 0.95
    val recall = shared.size.toDouble / brute.size
    assert(recall >= 0.95, s"quantized recall $recall")
  }

  test("removeDuplicateSpans keeps first occurrence, strips later copies, preserves case") {
    val d = docsOf(
      (1L, "Alpha bravo charlie delta echo unique-one tail"),
      (2L, "prefix Alpha bravo charlie delta echo unique-two tail"),
      (3L, "totally different words here nothing shared at all"),
      (4L, "short doc"))
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the first (doc_id, pos) occurrence of the 5-gram
    // "Alpha bravo charlie delta echo" — kept verbatim
    assert(out(1L) == "Alpha bravo charlie delta echo unique-one tail")
    // doc 2's copy of the span is removed; its unique words survive in order
    assert(out(2L) == "prefix unique-two tail")
    // no duplicated 5-gram touches docs 3 and 4 (4 is shorter than k)
    assert(out(3L) == "totally different words here nothing shared at all")
    assert(out(4L) == "short doc")
  }

  test("removeDuplicateSpans passes untouched docs through verbatim (whitespace kept)") {
    val d = docsOf(
      (1L, "alpha  double  spaced   text with no duplicate span at all"),
      (2L, "one two three four five shared residue A"),
      (3L, "one two three four five shared residue B"))
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 loses nothing — its double spaces must survive byte-identical
    assert(out(1L) == "alpha  double  spaced   text with no duplicate span at all")
    // doc 2 holds every first occurrence — verbatim too
    assert(out(2L) == "one two three four five shared residue A")
    // doc 3's grams at pos 0..2 duplicate doc 2 ⇒ tokens 0..6 covered
    assert(out(3L) == "B")
  }

  test("removeDuplicateSpans: exact-duplicate docs collapse to their unique residue") {
    val d = docsOf(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"))
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "one two three four five six seven eight nine ten")
    assert(out(2L) == "") // every position of doc 2 is covered by a duplicated 4-gram
  }

  test("removeDuplicateCharSpans catches sub-token-k runs, mid-word boundaries, verbatim pass-through") {
    val d = docsOf(
      // the 12-char run "SHARED-RUN-X" duplicates across docs 1/2 — only
      // ~2 whitespace tokens, far below any useful token-gram floor, and
      // in doc 2 it starts mid-"word" (glued to "prefix")
      (1L, "first SHARED-RUN-X tail one"),
      (2L, "prefixSHARED-RUN-X quit two"),
      (3L, "nothing in common here at all"),
      (4L, "tiny"))
    val out = Dedup.removeDuplicateCharSpans(d, "doc_id", "text", minLen = 12)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the first (doc_id, pos) occurrence — kept verbatim
    assert(out(1L) == "first SHARED-RUN-X tail one")
    // doc 2 loses the shared run AND the shared trailing space (both
    // docs have ' ' after the run, so the duplicated region is chars
    // [7,19], not just the 12 visible run chars) — splice is char-exact
    assert(out(2L) == "prefixquit two")
    assert(out(3L) == "nothing in common here at all")
    assert(out(4L) == "tiny") // shorter than minLen: no windows, verbatim
  }

  test("removeDuplicateCharSpans merges overlapping windows into maximal runs") {
    val run = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 chars, windows overlap
    val d = docsOf(
      (1L, s"keep $run keep"),
      (2L, s"lose $run lose"),
      (3L, s"$run")) // doc 3 IS the run
    val out = Dedup.removeDuplicateCharSpans(d, "doc_id", "text", minLen = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"keep $run keep")
    // all duplicated 10-windows merge to ONE interval covering the run
    // plus BOTH flanking spaces (docs 1 and 2 share " <run> ")
    assert(out(2L) == "loselose")
    assert(out(3L) == "") // fully covered doc reassembles to empty
  }

  test("removeDuplicateCharSpans interpreted and codegen window hashes agree") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("alpha bravo charlie", "überlänge straße größe", "早上好世界你好早上好",
      "mixed ascii und ümläute 混合", "")
    // via a data column (NOT lit: Catalyst would constant-fold through
    // the interpreted path and never exercise the generated code)
    val df = docsOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val viaExpr = df.select(col("doc_id"),
        graft.functions.CharWindowHashes(col("text"), 5).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val direct = graft.functions.CharWindowHashes.hashes(
        UTF8String.fromString(t), 5).toSeq
      assert(viaExpr(i.toLong) == direct, s"codegen/interpreted divergence on: $t")
      val nc = t.codePointCount(0, t.length)
      assert(direct.length == math.max(0, nc - 5 + 1), s"window count on: $t")
    }
    // rolling hash == direct polynomial hash of each window (ring Z/2^64)
    val t = "the quick brown fox jumps over the lazy dog"
    val cps = t.codePoints().toArray
    val want = (0 to cps.length - 7).map { p =>
      cps.slice(p, p + 7).foldLeft(0L)((a, c) => a * 31L + c)
    }
    assert(graft.functions.CharWindowHashes.hashes(
      UTF8String.fromString(t), 7).toSeq == want)
  }

  test("domain mix fills every source's quota exactly and is repartition-stable") {
    val out = graft.relational.PipelineQueries.queries("p32_domain_mix")(
      spark, sfDir)
    val perSource = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas: k_s = floor(p_s * N) with N = floor(min n_s / p_s) — every
    // source must deliver exactly its quota (never run short: N was
    // chosen as the largest total every source can fill)
    val docsDf = docs
    val n = docsDf.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val wraw = n.keys.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("mix:" + s).getBytes("UTF-8")).map("%02x".format(_)).mkString
      s -> (1 + java.lang.Long.parseLong(hex.take(15), 16) % 5).toDouble
    }.toMap
    val sumw = wraw.values.sum
    val bigN = math.floor(n.keys.map(s => n(s) / (wraw(s) / sumw)).min)
    n.keys.foreach { s =>
      val k = math.floor(wraw(s) / sumw * bigN).toLong
      assert(perSource.getOrElse(s, 0L) == k, s"source $s quota")
    }
    // membership is hash-derived: re-running under a DIFFERENT shuffle
    // partitioning must select the same doc ids (the salted-hash window
    // order is a total order, so layout can't leak into the quota cut)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = graft.relational.PipelineQueries.queries("p32_domain_mix")(
        spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(again == ids)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("training shards: balanced, one file per shard, partition-pruned read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      val n = 500
      Sharding.writeShards(docs, "doc_id", dir, nShards = 8)
      val back = spark.read.parquet(dir)
      assert(back.count() == n)
      val perShard = back.groupBy("shard").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perShard.keySet == (0 until 8).toSet)
      // hash balance: every shard within 3x of the uniform share
      assert(perShard.values.forall(c => c > n / 24 && c < n * 3 / 8),
        s"unbalanced shards: $perShard")
      // exactly one parquet file per shard directory
      (0 until 8).foreach { k =>
        val files = new java.io.File(s"$dir/shard=$k")
          .listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $k has ${files.length} files")
      }
      // membership is layout-independent: a repartitioned write selects
      // the same (doc -> shard) mapping
      val dir2 = java.nio.file.Files.createTempDirectory("graft_shards2_").toString
      try {
        Sharding.writeShards(docs.repartition(13), "doc_id", dir2, nShards = 8)
        val m1 = back.select("doc_id", "shard").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        val m2 = spark.read.parquet(dir2).select("doc_id", "shard").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(m1 == m2)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir2))
      // read-back of one shard prunes to its partition directory
      val one = Sharding.readShard(spark, dir, 3)
      assert(one.count() == perShard(3))
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters"), "expected a partition-pruned scan")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("holdoutSplit is deterministic, disjoint-exhaustive, and near the weights") {
    val split = Sampling.holdoutSplit(docs, "doc_id")
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    assert(n == docs.count())
    // 80/10/10 in expectation; the 500-doc corpus should land within ±40%
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.1,
      s"train frac ${counts("train").toDouble / n}")
    assert(counts.keySet == Set("train", "val", "test"))
    // determinism: a second evaluation assigns identical buckets
    val a = split.select("doc_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sampling.holdoutSplit(docs, "doc_id").select("doc_id", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // a different salt reshuffles membership
    val c = Sampling.holdoutSplit(docs, "doc_id", salt = "v2")
      .select("doc_id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a != c)
  }

  test("stratifiedSample keeps per-stratum fractions and is a pure filter") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), default = 0.2)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("en", 0L) == totals("en")) // fraction 1.0 keeps all
    assert(!byLang.contains("de")) // fraction 0.0 keeps none
    // sampled rows are a subset of the input (no projection change)
    assert(sampled.columns.toSeq == docs.columns.toSeq)
  }

  test("packSequences: offsets stay under budget, sequences are contiguous per shard") {
    val packed = Sampling.packSequences(docs, "doc_id", "text", "source", budget = 128)
      .collect()
    assert(packed.length == docs.count())
    packed.foreach { r =>
      val (off, seq) = (r.getLong(4), r.getLong(3))
      assert(off >= 0 && off < 128, s"seq_off $off out of [0,128)")
      assert(seq >= 0)
    }
    // per shard: doc_id order ⇒ non-decreasing seq_id starting at 0
    packed.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val bySeq = rows.sortBy(_.getLong(0)).map(_.getLong(3))
      assert(bySeq.head == 0L)
      assert(bySeq.zip(bySeq.tail).forall { case (a, b) => a <= b })
    }
  }

  test("PQ ANN: deterministic, codes compress, ADC+rescore recall beats floor") {
    val (codebook, codes) = Similarity.pqIndex(emb, nSub = 8, ksub = 16)
    // every vector encodes to 8 small codes + a norm
    val c0 = codes.collect()
    assert(c0.forall(_.getSeq[Int](1).length == 8))
    assert(codebook.count() == 8 * 16)
    val queries = emb.filter(col("vec_id") < 30)
    val pq = Similarity.pqTopK(codes, codebook, emb, queries, k = 3, mCand = 30)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(pq.size == brute.size)
    // rank-1 recall: the ADC stage keeps most true nearest neighbors
    val q1 = brute.keySet.filter(_._2 == 1L)
    val hit = q1.count(key => pq.get(key).contains(brute(key)))
    val recall = hit.toDouble / q1.size
    assert(recall >= 0.6, s"PQ rank-1 recall $recall")
    // determinism: seeded k-means + id tie-breaks reproduce exactly
    val (cb2, codes2) = Similarity.pqIndex(emb, nSub = 8, ksub = 16)
    val pq2 = Similarity.pqTopK(codes2, cb2, emb, queries, k = 3, mCand = 30)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(pq == pq2)
  }

  test("PQ and IVF indexes round-trip through parquet with identical results") {
    val tmp = java.nio.file.Files.createTempDirectory("annio").toString
    val queries = emb.filter(col("vec_id") < 20)
    // PQ: (codebook, codes) relations are the entire index state
    val (cb, codes) = Similarity.pqIndex(emb, nSub = 8, ksub = 16, maxIter = 5)
    AnnIO.savePqIndex(cb, codes, s"$tmp/pq")
    val (cb2, codes2) = AnnIO.loadPqIndex(spark, s"$tmp/pq")
    val before = Similarity.pqTopK(codes, cb, emb, queries, k = 3, mCand = 20)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val after = Similarity.pqTopK(codes2, cb2, emb, queries, k = 3, mCand = 20)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(before == after)
    // IVF: corpus persists PARTITIONED BY list (one directory per
    // inverted list — probe-pruned reads skip whole files)
    val (cents0, indexed) = Similarity.ivfIndex(emb, nLists = 8)
    AnnIO.saveIvfIndex(cents0, indexed, s"$tmp/ivf")
    val (cents, indexed2) = AnnIO.loadIvfIndex(spark, s"$tmp/ivf")
    val iBefore = Similarity.ivfTopK(indexed, cents0, queries, k = 3, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val iAfter = Similarity.ivfTopK(indexed2, cents, queries, k = 3, nProbe = 3,
        "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(iBefore == iAfter)
    val listDirs = new java.io.File(s"$tmp/ivf/corpus").listFiles()
      .filter(_.getName.startsWith("list="))
    assert(listDirs.length == 8, s"expected 8 list partitions, got ${listDirs.length}")
  }

  test("IVF-PQ: equality-join scan only probes lists, recall tracks the flat PQ path") {
    val queries = emb.filter(col("vec_id") < 30)
    val (cents, codebook, codesL) = Similarity.ivfPqIndex(emb,
      nLists = 8, nSub = 8, ksub = 16, maxIter = 5)
    val out = Similarity.ivfPqTopK(codesL, cents, codebook, emb, queries,
      k = 3, mCand = 30, nProbe = 4)
    // no theta join anywhere: candidate stage is an equality join on list
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val q1 = brute.keySet.filter(_._2 == 1L)
    val hit = q1.count(key => got.get(key).contains(brute(key)))
    val recall = hit.toDouble / q1.size
    // probing half the lists (4/8) bounds attainable recall vs flat PQ;
    // rank-1 should still be found for most queries
    assert(recall >= 0.5, s"IVF-PQ rank-1 recall $recall")
    assert(got.size == brute.size)
  }

  test("urlFilter counts hosts, flags blocklist hits, keeps clean docs") {
    val d = docsOf(
      (1L, "plain text no links"),
      (2L, "see https://ok.example.org/a and http://ads.tracker.net/x"),
      (3L, "https://ok.example.org/one https://ok.example.org/two"))
    val out = Quality.urlFilter(d, "doc_id", "text",
        Seq("ads.tracker.net"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((0L, 0L, true)))
    assert(out(2L) == ((2L, 1L, false)))
    assert(out(3L) == ((2L, 0L, true)))
  }

  test("new-op edge cases: empty inputs, whitespace-only docs, tiny corpora") {
    val empty = docsOf()
    // span dedup: empty corpus and all-whitespace docs survive unchanged
    assert(Dedup.removeDuplicateSpans(empty, "doc_id", "text", k = 5).count() == 0)
    val ws = docsOf((1L, "   "), (2L, ""))
    val wsOut = Dedup.removeDuplicateSpans(ws, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no duplicated span touches either doc ⇒ VERBATIM pass-through
    // (whitespace preserved; only rebuilt docs are re-joined with ' ')
    assert(wsOut == Map(1L -> "   ", 2L -> ""))
    // k < 2 rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.removeDuplicateSpans(ws, "doc_id", "text", k = 1)
    }
    // holdout split: bad weights rejected; empty frame fine
    intercept[IllegalArgumentException] {
      Sampling.holdoutSplit(ws, "doc_id", weights = Seq("a" -> 20000))
    }
    assert(Sampling.holdoutSplit(empty, "doc_id").count() == 0)
    // packing: empty-text docs pack with zero width at valid offsets
    val packed = Sampling.packSequences(
      docsOf((1L, ""), (2L, "a b"), (3L, "")).withColumn("src", lit("s")),
      "doc_id", "text", "src", budget = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(packed(1L) == ((0L, 0L, 0L)))
    assert(packed(2L) == ((2L, 0L, 0L)))
    assert(packed(3L) == ((0L, 0L, 2L))) // starts after doc 2's two tokens
    // pqIndex: empty corpus throws a clear error, not an opaque NPE
    val emptyVecs = emb.filter(col("vec_id") < 0)
    intercept[IllegalArgumentException] {
      Similarity.pqIndex(emptyVecs, nSub = 8, ksub = 16)
    }
  }

  test("langid marker scoring picks a language deterministically") {
    val d = docsOf(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro y la casa de los gatos"))
    val toks = TextOps.tokens(col("text"))
    val out = d.select(col("doc_id"),
      TextOps.markerHits(toks, TextOps.LangMarkers.toMap.apply("en")).as("en"),
      TextOps.markerHits(toks, TextOps.LangMarkers.toMap.apply("de")).as("de"),
      TextOps.markerHits(toks, TextOps.LangMarkers.toMap.apply("es")).as("es"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 > out(1L)._2 && out(1L)._1 > out(1L)._3)
    assert(out(2L)._2 > out(2L)._1)
    assert(out(3L)._3 > out(3L)._1)
  }

  test("cluster keep: highest-quality doc survives, ties to smallest id, " +
      "unclustered pass") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_chars", LongType)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 10L), Row(2L, 30L), Row(3L, 99L),
      Row(4L, 20L), Row(5L, 20L)), 2), schema)
    val clSchema = StructType(Seq(StructField("doc", LongType),
      StructField("cluster_id", LongType)))
    val clusters = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 1L), Row(2L, 1L), Row(4L, 4L), Row(5L, 4L)), 2), clSchema)
    val out = Dedup.keepClusterRepresentatives(d, "doc_id", clusters,
        quality = col("n_chars"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getBoolean(2))).toMap
    // cluster 1: doc 2 wins on quality (30 > 10); cluster 4: tie at 20,
    // doc 4 wins on id; doc 3 unclustered keeps itself
    assert(out == Map(
      1L -> ((1L, false)), 2L -> ((1L, true)), 3L -> ((-1L, true)),
      4L -> ((4L, true)), 5L -> ((4L, false))))
  }

  test("dup-ngram coverage invariants on random corpora (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val docs = docsOf((0 until 30).map { i =>
        // small vocab forces accidental 3-gram duplicates; one doc pair
        // is planted verbatim-identical → full coverage when n >= k
        val words = (0 until (3 + rnd.nextInt(12)))
          .map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
        (i.toLong, if (i == 29) "p0 p1 p2 p3" else if (i == 28) "p0 p1 p2 p3" else words)
      }: _*)
      val out = Quality.dupNgramCoverage(docs, "doc_id", "text", k = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      out.foreach { case (id, (n, starts, cov)) =>
        assert(cov <= n, s"trial $trial doc $id: covered $cov > n_tokens $n")
        assert((starts == 0) == (cov == 0),
          s"trial $trial doc $id: starts=$starts but covered=$cov")
        if (starts > 0)
          assert(cov >= 3, s"trial $trial doc $id: dup start but covered $cov < k")
      }
      // the verbatim-identical pair is fully covered
      assert(out(28L)._3 == out(28L)._1 && out(29L)._3 == out(29L)._1,
        s"trial $trial: verbatim pair not fully covered: ${out(28L)}, ${out(29L)}")
    }
  }

  test("cluster keep invariants on random clusterings (seeded)") {
    val rnd = new scala.util.Random(7)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("q", LongType)))
    val clSchema = StructType(Seq(StructField("doc", LongType),
      StructField("cluster_id", LongType)))
    for (trial <- 1 to 5) {
      val quality = (0L until 40L).map(i => i -> rnd.nextLong(100)).toMap
      val docs = spark.createDataFrame(spark.sparkContext.parallelize(
        quality.toSeq.map { case (i, q) => Row(i, q) }, 3), schema)
      // random partition of a subset of docs into clusters
      val membership = (0L until 40L).filter(_ => rnd.nextBoolean())
        .map(i => i -> rnd.nextInt(4).toLong)
      val clusters = spark.createDataFrame(spark.sparkContext.parallelize(
        membership.map { case (d, c) => Row(d, c) }, 2), clSchema)
      val out = Dedup.keepClusterRepresentatives(docs, "doc_id", clusters,
          quality = col("q"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      assert(out.length == 40)
      val byCluster = out.filter(_._2.isDefined).groupBy(_._2.get)
      byCluster.foreach { case (c, members) =>
        val kept = members.filter(_._3)
        assert(kept.length == 1, s"trial $trial cluster $c keeps ${kept.length}")
        val maxQ = members.map(m => quality(m._1)).max
        assert(quality(kept.head._1) == maxQ,
          s"trial $trial cluster $c kept ${kept.head._1} (q=${quality(kept.head._1)}) != max $maxQ")
      }
      out.filter(_._2.isEmpty).foreach { m =>
        assert(m._3, s"trial $trial unclustered doc ${m._1} not kept")
      }
    }
  }

  test("embedding decontamination: max cosine, nearest-id ties, threshold flag") {
    import spark.implicits._
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0)), (101L, Seq(1.0, 0.0, 0.0))) // identical pair
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), // sim 1.0 → contaminated
      (2L, Seq(0.0, 1.0, 0.0)), // sim 0.0 → clean
      (3L, Seq(0.9, 0.1, 0.0))) // sim ≈ 0.9939 → contaminated
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingDecontaminate(corpus, bench, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1.0, 100L, true))) // tie between 100/101 → 100
    assert(out(2L)._1 == 0.0 && !out(2L)._3)
    assert(out(3L)._2 == 100L && out(3L)._3 && out(3L)._1 > 0.99)
  }

  test("dup-ngram coverage: overlapping duplicated grams count positions once") {
    val d = docsOf(
      (1L, "a b c d e z"), // "a b c d e" shared with doc 4 ("b c d e z" unique)
      (2L, "q r s t u"), // no duplicated gram
      (4L, "a b c d e f g"), // [0,4] + [2,6] from "c d e f g" → union [0,6]
      (5L, "c d e f g"),
      (6L, "x")) // below k
    val out = Quality.dupNgramCoverage(d, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(out(1L) == ((6L, 1L, 5L, 0.833333))) // [0,4] of 6 tokens
    assert(out(2L) == ((5L, 0L, 0L, 0.0)))
    assert(out(4L) == ((7L, 2L, 7L, 1.0))) // merged, not 10
    assert(out(5L) == ((5L, 1L, 5L, 1.0)))
    assert(out(6L) == ((1L, 0L, 0L, 0.0)))
  }

  test("gopherRules: each rule fires on its crafted violator; clean doc keeps") {
    val longGood = (("the cat sat of mat and that have with " * 7) + "tail words here").trim
    val d = docsOf(
      (1L, longGood),                      // 66 words, all rules pass
      (2L, "the of short doc"),            // word count < 50
      (3L, ("word " * 60).trim + " the of ### ### ### ### ### ###"),  // symbols
      (4L, "• a\n• b\n• c\nplain"),        // 3/4 bullet lines (passes ≤0.9), few words
      (5L, "• a\n• b\n• c\n• d"),          // 100% bullet lines → bullet rule fails
      (6L, (("99 88 77 66 " * 15).trim + " the of")), // alpha frac 2/62 < 0.8
      (7L, ("zig zag " * 30).trim))        // 60 words but 0 gopher stops
    val out = Quality.gopherRules(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8), "clean long doc must keep")
    assert(out(1L).getLong(1) == 66L)
    assert(!out(2L).getBoolean(8) && out(2L).getLong(1) < 50)
    // doc 3: 18 '#' chars / 62 words ≈ 0.29 > 0.1
    assert(!out(3L).getBoolean(8))
    assert(out(3L).getDouble(3) > 0.1, s"symbol ratio ${out(3L).getDouble(3)}")
    assert(out(5L).getDouble(4) == 1.0) // bullet_line_frac
    assert(out(6L).getDouble(6) < 0.8, s"alpha frac ${out(6L).getDouble(6)}")
    assert(out(7L).getLong(7) == 0L)   // n_stop_distinct
    // ellipsis fraction: 1 of 2 lines ends with ellipsis → 0.5 > 0.3
    val e = Quality.gopherRules(
      docsOf((9L, "steady line\nwaiting for more...")), "doc_id", "text")
      .collect().head
    assert(e.getDouble(5) == 0.5)
  }

  test("c4Clean: line keep-rule and page gates replay the C4 heuristics") {
    val d = docsOf(
      (1L, "no terminal punct line\nToo few.\nThis line ends properly.\n" +
        "please enable JavaScript to proceed.\nA second proper sentence stays!"),
      (2L, "Only one good sentence here.\nshort line"),
      (3L, "First real sentence works. Second arrives now! Third follows here? " +
        "Fourth one lands. Fifth closes out.\nlorem ipsum dolor sit amet."),
      (4L, "Braces spoil pages { see. One two three four! Five six seven? " +
        "Eight nine ten. Last one here."))
    val out = Quality.c4Clean(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 5 lines; kept = "This line ends properly." + "A second proper
    // sentence stays!" (no-punct, <3-words, javascript all dropped)
    assert(out(1L).getLong(1) == 5L && out(1L).getLong(2) == 2L)
    assert(out(1L).getString(6) ==
      "This line ends properly.\nA second proper sentence stays!")
    assert(out(1L).getLong(3) == 2L) // n_sentences
    assert(!out(1L).getBoolean(7))   // keep: < 5 sentences
    assert(!out(2L).getBoolean(7))
    // doc 3: 6 sentences in kept text but lorem ipsum → page drop
    assert(out(3L).getLong(3) >= 5L && out(3L).getBoolean(4) && !out(3L).getBoolean(7))
    // doc 4: enough sentences but brace → page drop
    assert(out(4L).getBoolean(5) && !out(4L).getBoolean(7))
    // a clean page with ≥5 sentences keeps
    val ok = Quality.c4Clean(docsOf(
      (5L, "One fine sentence lands. Two more arrive now! Three is here? " +
        "Four follows along. Five wraps it up.")), "doc_id", "text")
      .collect().head
    assert(ok.getBoolean(7), "clean 5-sentence page must keep")
  }

  test("gopher/C4/BPE invariants on random corpora (seeded)") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("the", "word", "99", "x#", "end.", "stop!", "• item",
      "javascript", "lorem ipsum", "mixed{", "a", "tail...")
    for (trial <- 1 to 3) {
      val docs = docsOf((0 until 40).map { i =>
        val lines = (0 until 1 + rnd.nextInt(4)).map { _ =>
          (0 until rnd.nextInt(10))
            .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
        }
        (i.toLong, lines.mkString("\n"))
      }: _*)
      // gopher: line fractions are true fractions; keep == the
      // conjunction recomputed from the emitted signals
      Quality.gopherRules(docs, "doc_id", "text").collect().foreach { r =>
        for (idx <- Seq(4, 5, 6)) {
          val v = r.getDouble(idx)
          assert(v >= 0.0 && v <= 1.0, s"trial $trial col $idx: $v")
        }
        val keep = r.getLong(1) >= 50 && r.getLong(1) <= 100000 &&
          r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0 &&
          r.getDouble(3) <= 0.1 && r.getDouble(4) <= 0.9 &&
          r.getDouble(5) <= 0.3 && r.getDouble(6) >= 0.8 && r.getLong(7) >= 2
        assert(r.getBoolean(8) == keep, s"trial $trial doc ${r.getLong(0)}")
      }
      // c4: every kept line satisfies the line rule verbatim; counts and
      // the page gate recompute from the cleaned text
      Quality.c4Clean(docs, "doc_id", "text").collect().foreach { r =>
        val clean = r.getString(6)
        val kept = if (clean.isEmpty) Array.empty[String] else clean.split("\n")
        assert(r.getLong(2) <= r.getLong(1))
        assert(kept.length == r.getLong(2), s"trial $trial doc ${r.getLong(0)}")
        kept.foreach { l =>
          val rt = l.replaceAll("\\s+$", "")
          assert(rt.nonEmpty && ".!?\"".contains(rt.last.toString), s"'$l'")
          assert(l.trim.split("\\s+").count(_.nonEmpty) >= 3, s"'$l'")
          assert(!l.toLowerCase.contains("javascript"), s"'$l'")
        }
        assert(r.getLong(3) ==
          clean.count(ch => ch == '.' || ch == '!' || ch == '?'))
        assert(r.getBoolean(7) ==
          (r.getLong(3) >= 5 && !r.getBoolean(4) && !r.getBoolean(5)))
      }
      // bpe: merges learned on a random corpus always reconstruct, and
      // segmentation never exceeds the code-point count
      val merges = Bpe.trainMerges(docs, "text", nMerges = 10)
        .map(m => (m._2, m._3))
      val segs = docs
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .select(col("w"),
          graft.functions.BpeSegment(col("w"), merges).as("s"))
        .collect()
      segs.foreach { r =>
        val w = r.getString(0)
        val parts = r.getSeq[String](1)
        assert(parts.mkString == w, s"trial $trial: $parts != '$w'")
        assert(parts.length <= w.codePointCount(0, w.length))
        assert(parts.forall(_.nonEmpty))
      }
    }
  }

  test("htmlToText strips chrome, keeps body text, decodes entities") {
    val html = "<html><head><title>The Page</title>" +
      "<style>body { color: red; }</style></head>" +
      "<body><p>first para</p><p>second</p>" +
      "<script type=\"text/js\">if (1 < 2 && 3 > 0) { alert(\"x\"); }</script>" +
      "<a href=\"http://a/1\">one</a> <a class=\"x\" href='http://a/2'>two</a>" +
      "<a name=\"no-href\">anchor</a>" +
      " Tom &amp; Jerry &lt;3 &quot;quoted&quot; it&#39;s&nbsp;here</body></html>"
    val out = spark.range(1).select(
      TextOps.htmlToText(lit(html)).as("t"),
      TextOps.htmlTitle(lit(html)).as("title"),
      TextOps.htmlLinkCount(lit(html)).as("links")).head()
    assert(out.getString(0) ==
      "The Page first para second one two anchor " +
        "Tom & Jerry <3 \"quoted\" it's here")
    assert(out.getString(1) == "The Page")
    assert(out.getLong(2) == 2L) // href-less anchor not counted
    // adjacent tags never glue words; script/style bodies never leak
    assert(!out.getString(0).contains("alert") &&
      !out.getString(0).contains("color"))
    // &amp; decodes LAST: the page displays '&lt;' literally, so the
    // extracted text must too — amp-first would double-decode it to '<'
    val esc = spark.range(1).select(
      TextOps.htmlToText(lit("<p>shows &amp;lt; literally</p>")).as("t"))
      .head().getString(0)
    assert(esc == "shows &lt; literally", esc)
  }

  test("temperatureSample flattens the language distribution deterministically") {
    val bySize = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = bySize.values.sum
    val out = Sampling.temperatureSample(docs, "doc_id", "lang", budgetFrac = 0.5)
    val kept = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas replay exactly: k_l = min(c_l, floor(sqrt(c_l)/Σsqrt · floor(n/2)))
    val ssq = bySize.values.toSeq.sortBy(identity).map(c => math.sqrt(c.toDouble)).sum
    bySize.foreach { case (lang, c) =>
      val expect = math.min(c,
        math.floor(math.sqrt(c.toDouble) / ssq * math.floor(n * 0.5)).toLong)
      // summation order of Σsqrt may differ by an ulp from the engine's —
      // allow the boundary to flip by at most one doc
      assert(math.abs(kept.getOrElse(lang, 0L) - expect) <= 1,
        s"$lang kept=${kept.get(lang)} expect≈$expect")
    }
    // α=0.5 flattens: the rarest language keeps a LARGER fraction of its
    // docs than the most common one
    val big = bySize.maxBy(_._2)._1
    val small = bySize.minBy(_._2)._1
    assert(kept(small).toDouble / bySize(small) > kept(big).toDouble / bySize(big))
    // deterministic across evaluations
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(docs, "doc_id", "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("temperatureSampleApprox: threshold form tracks the exact quotas, no window") {
    val exact = Sampling.temperatureSample(docs, "doc_id", "lang", 0.5)
    val approx = Sampling.temperatureSampleApprox(docs, "doc_id", "lang", 0.5)
    val quotas = exact.select("lang", "quota").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = approx.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binomial wobble: |kept − k| within 4·√k of the exact quota
    quotas.foreach { case (lang, k) =>
      val got = kept.getOrElse(lang, 0L)
      assert(math.abs(got - k) <= math.max(4, 4 * math.sqrt(k.toDouble)).toLong,
        s"$lang kept=$got exact quota=$k")
    }
    // both forms derive the SAME quota numbers
    val aq = approx.select("lang", "quota").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aq == quotas)
    // deterministic: re-evaluation keeps identical membership
    val a = approx.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSampleApprox(docs, "doc_id", "lang", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the plan carries NO window — the hot-language sort is gone
    assert(!approx.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("unimaxSample replays the hand-computed water-filling allocation") {
    // langs: a=2 docs, b=10 docs; E=3, budget=floor(12·1.5)=18.
    // caps asc: a=6 (6·2+0=12 ≤ 18 → capped), b=30 (30·1+6=36 > 18 →
    // share = (18−6) div 1 = 12 > c=10 → 1 full epoch + 2 partial).
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val rows = (1L to 2L).map(i => Row(i, "a")) ++
      (11L to 20L).map(i => Row(i, "b"))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Sampling.unimaxSample(d, "doc_id", "lang",
      budgetFrac = 1.5, maxEpochs = 3).collect()
    assert(out.length == 18) // integer water-filling spends the budget exactly
    val byLang = out.groupBy(_.getString(1))
    // a: both docs replay all 3 epochs (capped at maxEpochs)
    val a = byLang("a")
    assert(a.length == 6)
    assert(a.groupBy(_.getLong(0)).values.forall(
      _.map(_.getLong(4)).sorted.toSeq == Seq(1L, 2L, 3L)))
    assert(a.forall(_.getLong(3) == 6L)) // quota column = cap
    // b: every doc gets epoch 1; exactly the 2 smallest-hash docs (rnk
    // ≤ 2) also get epoch 2; epochs per doc are contiguous from 1
    val b = byLang("b")
    assert(b.length == 12)
    assert(b.count(_.getLong(4) == 1L) == 10)
    assert(b.filter(_.getLong(4) == 2L).map(_.getLong(2)).sorted.toSeq ==
      Seq(1L, 2L))
    // deterministic across evaluations
    val again = Sampling.unimaxSample(d, "doc_id", "lang", 1.5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(4))).toSet)
  }

  test("bm25TopK: doc-length normalization and tf saturation behave") {
    val d = docsOf(
      (1L, "spark query"), // short doc, one hit
      (2L, "spark query " + ("filler words only here " * 10).trim), // long, one hit
      (3L, ("query " * 10).trim + " spark"), // tf=10
      (4L, "no relevant terms at all"))
    val out = TfIdf.bm25TopK(d, "doc_id", "text", Seq("query"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 4 has no query term → absent
    assert(!out.contains(4L))
    // same tf, shorter doc wins (length normalization)
    assert(out(1L) > out(2L))
    // tf saturates: 10 occurrences score < 10× one occurrence
    assert(out(3L) > out(1L) && out(3L) < 10L * out(1L))
    // k truncates deterministically
    assert(TfIdf.bm25TopK(d, "doc_id", "text", Seq("query"), k = 2)
      .collect().map(_.getLong(0)).toSeq ==
      out.toSeq.sortBy(kv => (-kv._2, kv._1)).take(2).map(_._1))
  }

  test("budgetSelect keeps an exact fluency-prefix within the token budget") {
    val out = Quality.budgetSelect(docs, "doc_id", "text", budgetFrac = 0.4)
      .collect()
    val total = out.map(_.getLong(1)).sum
    val budget = math.floor(total * 0.4).toLong
    val keptRows = out.filter(_.getBoolean(3))
    val keptTok = keptRows.map(_.getLong(1)).sum
    assert(keptTok <= budget, s"kept $keptTok > budget $budget")
    // kept set is a PREFIX of the (q_micro, doc_id) total order: no
    // dropped doc sorts strictly before a kept doc
    def key(r: Row) = (if (r.isNullAt(2)) Long.MaxValue else r.getLong(2),
      r.getLong(0))
    val ord = implicitly[Ordering[(Long, Long)]]
    val worstKept = keptRows.map(key).max
    val sortedDropped = out.filter(r => !r.getBoolean(3)).map(key).sorted
    assert(sortedDropped.forall(k => ord.gt(k, worstKept)))
    // budget tightness: the next doc in line would overflow it
    val nextTok = out.filter(r => !r.getBoolean(3) && !r.isNullAt(2))
      .sortBy(key).headOption.map(_.getLong(1))
    nextTok.foreach(t => assert(keptTok + t > budget,
      s"left $t-token doc on the table with ${budget - keptTok} unspent"))
    // token-less docs are never kept
    assert(out.filter(_.getLong(1) == 0L).forall(!_.getBoolean(3)))
  }

  test("containmentPairs reports the doc-in-doc direction Jaccard misses") {
    val inner = "alpha beta gamma delta epsilon zeta"
    val outer = inner + " " + (1 to 40).map(i => s"pad$i").mkString(" ")
    val d = docsOf((1L, inner), (2L, outer),
      (3L, "totally unrelated content with many different words"),
      (4L, inner)) // exact dup of 1
    val got = Dedup.containmentPairs(d, "doc_id", "text", n = 3,
      threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 1 ⊆ 2 at containment 1.0; the reverse direction is far below 0.8
    assert(got((1L, 2L)) == 1.0)
    assert(!got.contains((2L, 1L)))
    // exact dups contain each other: both directions at 1.0
    assert(got((1L, 4L)) == 1.0 && got((4L, 1L)) == 1.0)
    // unrelated doc appears in no pair
    assert(got.keys.forall(k => k._1 != 3L && k._2 != 3L))
    // jaccard at the same threshold indeed misses the (1,2) pair
    val j = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)) && !j.contains((2L, 1L)))
  }

  test("round-6 op invariants on random inputs (seeded)") {
    val rnd = new scala.util.Random(1106)
    for (trial <- 1 to 3) {
      // --- unimax: budget spent exactly, caps respected -------------
      val langs = (0 until 40).map { i =>
        (i.toLong, s"l${rnd.nextInt(2 + rnd.nextInt(6))}")
      }
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType)))
      val ld = spark.createDataFrame(spark.sparkContext.parallelize(
        langs.map(t => Row(t._1, t._2)), 3), schema)
      val e = 1 + rnd.nextInt(3)
      val frac = 0.3 + rnd.nextDouble() * (e - 0.3)
      val u = Sampling.unimaxSample(ld, "doc_id", "lang", frac, e).collect()
      val counts = langs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val budget = math.floor(langs.size * frac).toLong
      val byLang = u.groupBy(_.getString(1))
      byLang.foreach { case (l, rows) =>
        val quota = rows.head.getLong(3)
        assert(rows.length == quota, s"trial $trial $l emitted ${rows.length} != quota $quota")
        assert(quota <= e * counts(l), s"trial $trial $l quota $quota > cap")
        // epochs per doc contiguous from 1
        rows.groupBy(_.getLong(0)).values.foreach { dr =>
          val eps = dr.map(_.getLong(4)).sorted.toSeq
          assert(eps == (1L to eps.length).toSeq, s"trial $trial epochs $eps")
        }
      }
      assert(u.length <= budget, s"trial $trial total ${u.length} > budget $budget")
      // leftover smaller than the number of uncapped languages (floor loss)
      val uncapped = byLang.count { case (l, rows) =>
        rows.head.getLong(3) < e * counts(l) }
      assert(budget - u.length <= math.max(uncapped, 1),
        s"trial $trial unspent ${budget - u.length} with $uncapped uncapped langs")

      // --- pageRank: base floor, mass ceiling, determinism ----------
      val edges = (0 until 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      val es = spark.createDataFrame(spark.sparkContext.parallelize(
        edges.map(t => Row(t._1, t._2)), 3),
        StructType(Seq(StructField("src", LongType), StructField("dst", LongType))))
      val pr = GraphOps.pageRank(es, "src", "dst", 1 + rnd.nextInt(4)).collect()
      val nv = edges.flatMap(t => Seq(t._1, t._2)).distinct.size
      assert(pr.length == nv)
      pr.foreach(r => assert(r.getLong(1) >= 150000L, s"rank below base: $r"))
      // total mass never exceeds the initial |V| (integer leaks only shrink it)
      assert(pr.map(_.getLong(1)).sum <= nv * 1000000L)

      // --- containment: range, symmetry-on-dups, jaccard lower bound -
      val cd = docsOf((0 until 16).map { i =>
        (i.toLong, (0 until (4 + rnd.nextInt(10)))
          .map(_ => s"c${rnd.nextInt(5)}").mkString(" "))
      }: _*)
      val cp = Dedup.containmentPairs(cd, "doc_id", "text", 3, 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      cp.values.foreach(c => assert(c > 0 && c <= 1.0))
      val jp = Dedup.jaccardPairs(cd, "doc_id", "text", 3, 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // containment(inner→outer) >= jaccard for every surviving pair
      jp.foreach { case ((a, b), j) =>
        val c = math.max(cp.getOrElse((a, b), 0.0), cp.getOrElse((b, a), 0.0))
        assert(c >= j - 1e-9, s"trial $trial pair ($a,$b): containment $c < jaccard $j")
      }
    }
  }

  test("snapshot diff partitions ids into the planted delta classes") {
    val out = graft.relational.PipelineQueries
      .queries("p59_snapshot_diff")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def h(id: Long): Long =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(s"snap:$id".getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16).toLong % 7
    out.foreach { case (id, st) =>
      if (id >= 1000000L) assert(st == "added", s"$id $st")
      else st match {
        case "removed" => assert(h(id) == 0, s"$id")
        case "changed" => assert(h(id) == 1, s"$id")
        case "unchanged" => assert(h(id) >= 2, s"$id")
        case other => fail(s"$id unexpected $other")
      }
    }
    // every original id accounted for; every clone present
    val orig = out.keys.filter(_ < 1000000L).toSet
    assert(orig.size == 500)
    assert(out.keys.count(_ >= 1000000L) ==
      orig.count(id => h(id) == 2))
  }

  test("source outliers: zero-variance label has dist 0 and no outliers") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val flat = Array.fill(64)(0.5f)
    val rows = (0 until 20).map { i =>
      val v = if (i < 10) flat
        else Array.tabulate(64)(j => (math.sin(i * 64 + j) * 0.1 + 0.3).toFloat)
      Row(i.toLong, v.toSeq, if (i < 10) 1 else 2)
    }
    val e = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    // run the p60 body against this frame via a temp dir? — the query
    // reads from a dir, so replicate the composition inline instead
    val byDir = new java.io.File("/tmp/p60_fixture")
    byDir.mkdirs()
    e.coalesce(1).write.mode("overwrite").parquet("/tmp/p60_fixture/embeddings.parquet")
    // documents table must exist for Tables.load? only embeddings is read
    val out = graft.relational.PipelineQueries
      .queries("p60_source_outliers")(spark, "/tmp/p60_fixture")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // label 1 is ten identical vectors: centroid == vector, dist 0, no flags
    (0 until 10).foreach { i =>
      val (l, d, o) = out(i.toLong)
      assert(l == 1L && d == 0.0 && !o, s"$i -> ($l, $d, $o)")
    }
    // label 2 has spread: distances positive, at most ~5% + ties flagged
    val l2 = (10 until 20).map(i => out(i.toLong))
    assert(l2.forall(_._2 >= 0.0))
    assert(l2.count(_._3) <= 2)
  }

  test("normalizeText folds encoding variants; idempotent; dedup-relevant") {
    def norm(s: String): String = {
      val d = docsOf((1L, s))
      d.select(TextOps.normalizeText(col("text"))).head().getString(0)
    }
    // curly quotes, NBSP, em-dash, ellipsis, ZWSP, space runs
    assert(norm("\u201Chi\u201D\u00A0there\u2014now\u2026\u200B  ok") ==
      "\"hi\" there-now... ok")
    assert(norm("\u2018a\u2019 \u2013 b") == "'a' - b")
    // idempotent: normalizing twice changes nothing
    val once = norm("\u201Cx\u201D\u3000y\uFEFF")
    assert(norm(once) == once && once == "\"x\" y")
    // the dedup motivation: cosmetic variants land on the SAME string
    assert(norm("He said \u201Cyes\u201D now") ==
      norm("He said \"yes\"  now"))
  }

  test("scriptProfile counts Unicode scripts exactly and picks the dominant") {
    val d = docsOf(
      (1L, "Hello Привет 你好 مرحبا 123!"),
      (2L, "Все слова тут кириллица"),
      (3L, "только 中文 里面 多数 汉字"),
      (4L, ""),
      (5L, "αβγ δε ok"))
    val out = Quality.scriptProfile(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getString(8)))).toMap
    // doc 1: 22 non-space = 5 latin + 6 cyr + 2 han + 5 arabic + 3 digit + 1 other
    assert(out(1L) == ((22L, 5L, 6L, 2L, 5L, 3L, 1L, "cyrillic")))
    assert(out(2L)._8 == "cyrillic" && out(2L)._2 == 0L)
    assert(out(3L)._8 == "han" && out(3L)._4 == 8L)
    // empty doc: all zeros, tie chain lands on latin deterministically
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, "latin")))
    // wholly-uncovered script (Greek) + a latin token: other strictly
    // dominates → 'other', never 'latin' (the langid-prefilter fix)
    assert(out(5L) == ((7L, 2L, 0L, 0L, 0L, 0L, 5L, "other")))
  }

  test("KN bigram: hand-computed discount/continuation; degenerate docs") {
    // corpus: d1 "a b a b" → pairs {ab, ba, ab}; d2 "b a x" → {ba, ax}
    // cb: ab=2, ba=2, ax=1 → N1+(··)=3
    // ctx: a → cv=3, N1+(a·)=2 ; b → cv=2, N1+(b·)=1
    // cont: every word follows exactly 1 distinct context → Pcont = 1/3
    // P(b|a) = 1.25/3 + .75·2/3·(1/3) ; P(a|b) = 1.25/2 + .75·1/2·(1/3)
    // P(x|a) = 0.25/3 + .75·2/3·(1/3)
    val d = docsOf((1L, "a b a b"), (2L, "b a x"), (3L, "solo"))
    val out = Quality.knBigramScore(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    def nllu(p: Double): Long = math.round(-math.log(p) * 1e6)
    val pAB = math.max(2 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pBA = math.max(2 - 0.75, 0.0) / 2 + 0.75 * 1 / 2 * (1.0 / 3)
    val pAX = math.max(1 - 0.75, 0.0) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    def mean(us: Seq[Long]): Double =
      BigDecimal(us.sum.toDouble / (us.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, mean(Seq(nllu(pAB), nllu(pBA), nllu(pAB))))))
    assert(out(2L) == ((2L, mean(Seq(nllu(pBA), nllu(pAX))))))
    // the discounted rare pair scores strictly worse than the common one
    assert(pAX < pAB)
    // single-token doc: no bigrams, NULL score
    assert(out(3L)._1 == 0L && out(3L)._2.isNaN)
  }

  test("semanticDedup: cluster assignment, tau groups, least-central representative") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vecs = Seq(
      0L -> Array(1.0, 0.0),      // seed A (and a corpus member)
      1L -> Array(0.0, 1.0),      // seed B
      2L -> Array(1.0, 0.01),     // ~dup of seed A direction
      3L -> Array(0.99, 0.012),   // ~dup of 2
      4L -> Array(0.8, 0.25),     // cluster A but BELOW tau vs the group
      5L -> Array(0.1, 1.0),      // cluster B, sub-tau vs seed B (cos≈0.995)
      6L -> Array(1.0, 0.01))     // exact dup of 2
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map(v => Row(v._1, v._2.toSeq)), 2), schema)
    val out = Similarity.semanticDedup(df, k = 2, tau = 0.999)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // cluster assignment: A = {0,2,3,4,6}, B = {1,5}
    assert(Seq(0L, 2L, 3L, 4L, 6L).forall(out(_)._1 == 0L))
    assert(Seq(1L, 5L).forall(out(_)._1 == 1L))
    // duplicate group = {0,2,3,6} (4 is same-cluster but sub-tau);
    // exactly ONE kept, and it is the least-centroid-similar member
    val grp = Seq(0L, 2L, 3L, 6L)
    val keptIn = grp.filter(out(_)._3)
    assert(keptIn.size == 1, s"group kept: $keptIn")
    val expectedRep = grp.minBy(id => (out(id)._2, id))
    assert(keptIn.head == expectedRep,
      s"rep ${keptIn.head}, expected least-central $expectedRep")
    // non-duplicates all kept
    assert(Seq(1L, 4L, 5L).forall(out(_)._3))
    // deterministic across evaluations and partitionings
    val again = Similarity.semanticDedup(df.repartition(5), k = 2, tau = 0.999)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(again == out)
  }

  test("semanticDedupLsh: matches exact-pair groups on planted dups; non-contiguous ids") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // 80 vectors at dim 64, ids deliberately NON-contiguous starting at
    // 10^6 (regression for the seed-derivation fix: filter(id < k)
    // would find zero seeds and silently return an empty frame);
    // i % 10 == 1 plants a near-copy of its predecessor (cos ≈ 0.99998)
    val rnd = new scala.util.Random(7)
    val raw = Array.fill(80)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val base = raw.zipWithIndex.map { case (v, i) =>
      if (i % 10 == 1) { val c = raw(i - 1).clone(); c(0) += 0.01; c } else v
    }
    val ids = (0 until 80).map(i => 1000000L + i * 3)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(base).map { case (id, v) => Row(id, v.toSeq) }, 3), schema)
    val out = Similarity.semanticDedupLsh(df, k = 4, tau = 0.98,
        tables = 8, planesPerTable = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 80 && ids.forall(out.contains), "all vectors present")
    // independent driver-side reference: exact all-pairs tau graph
    // (same left-to-right dot, same 6-dp rounding), union-find
    // components, representative = min (cos_centroid, id)
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotl(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      d6(dotl(a, b) / (math.sqrt(dotl(a, a)) * math.sqrt(dotl(b, b))))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- 0 until 80; j <- i + 1 until 80
         if cos(base(i), base(j)) >= 0.98)
      parent(find(ids(i))) = find(ids(j))
    val groups = ids.groupBy(find).values.filter(_.size > 1).toSeq
    assert(groups.nonEmpty && groups.map(_.size).sum >= 8, "planted dups formed groups")
    for (g <- groups) {
      val rep = g.minBy(id => (out(id)._2, id))
      assert(g.forall(id => out(id)._3 == (id == rep)),
        s"group $g: expected sole rep $rep, got kept=${g.filter(out(_)._3)}")
    }
    val inGroup = groups.flatten.toSet
    assert(ids.filterNot(inGroup).forall(out(_)._3), "singletons all kept")
    // deterministic across partitionings
    val again = Similarity.semanticDedupLsh(df.repartition(7), k = 4,
        tau = 0.98, tables = 8, planesPerTable = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(again == out)
  }

  test("semanticDedupIvf: trained-centroid form keeps one rep per dup group; deterministic") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rnd = new scala.util.Random(13)
    val raw = Array.fill(60)(Array.fill(32)(rnd.nextDouble() * 2 - 1))
    val base = raw.zipWithIndex.map { case (v, i) =>
      if (i % 6 == 1) { val c = raw(i - 1).clone(); c(0) += 0.01; c } else v
    }
    val ids = (0 until 60).map(_.toLong)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(base).map { case (id, v) => Row(id, v.toSeq) }, 3), schema)
    val out = Similarity.semanticDedupIvf(df, nLists = 4, tau = 0.98,
        tables = 8, planesPerTable = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size == 60 && out.values.forall(v => v._1 >= 0 && v._1 < 4),
      "every vector assigned to a trained list")
    // dup groups from the exact tau graph; exactly one kept each, and
    // it is the member LEAST similar to its TRAINED centroid
    def d6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotl(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Array[Double], b: Array[Double]): Double =
      d6(dotl(a, b) / (math.sqrt(dotl(a, a)) * math.sqrt(dotl(b, b))))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- 0 until 60; j <- i + 1 until 60
         if cos(base(i), base(j)) >= 0.98)
      parent(find(ids(i))) = find(ids(j))
    val groups = ids.groupBy(find).values.filter(_.size > 1).toSeq
    assert(groups.nonEmpty)
    for (g <- groups) {
      val rep = g.minBy(id => (out(id)._2, id))
      assert(g.forall(id => out(id)._3 == (id == rep)), s"group $g")
    }
    assert(ids.filterNot(groups.flatten.toSet).forall(out(_)._3))
    val again = Similarity.semanticDedupIvf(df.repartition(7), nLists = 4,
        tau = 0.98, tables = 8, planesPerTable = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(again == out, "Lloyd's + assignment must be partitioning-invariant")
  }

  test("cosineNearDupPairs star cap bounds a hot cell; component survives") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // 40 IDENTICAL vectors — the pathological pile-up: same cell in
    // EVERY band, 780 all-pairs without the cap — plus 5 random ones
    val rnd = new scala.util.Random(11)
    val hot = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.1)
    val vecs = (0 until 40).map(i => i.toLong -> hot) ++
      (0 until 5).map(i => (100L + i) -> Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map { case (id, v) => Row(id, v.toSeq) }, 3), schema)
    val pairs = Similarity.cosineNearDupPairs(df, threshold = 0.99,
        tables = 8, planesPerTable = 8, starCapBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hotPairs = pairs.filter { case (a, b) => a < 100 && b < 100 }
    // star edges only: every hot pair anchors at the cell minimum (id 0)
    assert(hotPairs.nonEmpty && hotPairs.forall(_._1 == 0L),
      s"hot cell should emit star edges to id 0, got ${hotPairs.take(5).toSeq}")
    assert(hotPairs.length == 39, s"expected 39 star edges, got ${hotPairs.length}")
    // the duplicate group is still ONE component with one representative
    val out = Similarity.semanticDedupLsh(df, k = 3, tau = 0.99,
        tables = 8, planesPerTable = 8, starCapBucket = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert((0 until 40).count(i => out(i.toLong)) == 1,
      "exactly one representative kept from the identical pile-up")
    // uncapped call on the same data still returns ALL pairs (default path)
    val full = Similarity.cosineNearDupPairs(df, threshold = 0.99,
      tables = 8, planesPerTable = 8).count()
    assert(full >= 780, s"uncapped should keep all-pairs, got $full")
  }

  test("unigram LM: hand-computed EM step; Viterbi segmentation; training") {
    // ---- one soft-EM step on dict {ab:2, b:1}, pieces {a,b,ab} with
    // p = (2/7, 3/7, 2/7) (the seed counts): word "ab" has two paths,
    // [ab] (p=2/7) and [a][b] (p=6/49); Z = 20/49. Marginals: ab
    // -> (2/7)/(20/49) = 0.7, a -> 0.3, b -> 0.3 (each x freq 2);
    // word "b" adds 1 to b. Totals {a:0.6, b:1.6, ab:1.4}/3.6.
    val words = Array(
      (Array("a", "b"), 2L), (Array("b"), 1L))
    val probs = Unigram.emOnce(words, Array("a", "ab", "b"),
      Array(2.0 / 7, 2.0 / 7, 3.0 / 7), maxPieceLen = 2)
    assert(math.abs(probs(0) - 0.6 / 3.6) < 1e-12)   // a
    assert(math.abs(probs(1) - 1.4 / 3.6) < 1e-12)   // ab
    assert(math.abs(probs(2) - 1.6 / 3.6) < 1e-12)   // b
    // ---- Viterbi: cheap merged piece wins over char path; unk chars
    // fall back to single-cp pieces; reconstruction invariant
    val model = Seq("a" -> 1700000L, "b" -> 900000L, "ab" -> 1000000L)
    def seg(w: String): Seq[String] = spark.range(1)
      .select(graft.functions.UnigramSegment(lit(w), model, 20000000L, 2).as("s"))
      .head().getSeq[String](0)
    assert(seg("ab") == Seq("ab"))          // 1.0 < 1.7+0.9
    assert(seg("abb") == Seq("ab", "b"))
    assert(seg("axb") == Seq("a", "x", "b")) // x unked at len 1
    assert(seg("") == Seq.empty)
    assert(seg("abab").mkString == "abab")
    // equal-cost tie prefers the longer piece (fewer pieces)
    val tie = Seq("c" -> 500000L, "cc" -> 1000000L)
    assert(spark.range(1).select(graft.functions.UnigramSegment(
      lit("cc"), tie, 20000000L, 2).as("s")).head().getSeq[String](0) ==
      Seq("cc"))
    // ---- end-to-end training on a skewed mini-corpus: the dominant
    // collocation becomes a piece and wins the segmentation
    val d = docsOf(
      (1L, ("ingest " * 8).trim), (2L, ("ingest " * 8).trim),
      (3L, "in gest ing est"), (4L, "zq"))
    val m = Unigram.trainModel(d, "text", vocabSize = 30)
    assert(m.pieces.nonEmpty && m.pieces.forall(_._2 >= 0))
    val ingSeg = spark.range(1).select(graft.functions.UnigramSegment(
      lit("ingest"), m.pieces, m.unkCostMicro, m.maxPieceLen).as("s"))
      .head().getSeq[String](0)
    assert(ingSeg.mkString == "ingest")
    assert(ingSeg.length <= 2, s"dominant word over-fragmented: $ingSeg")
    // deterministic across re-training
    val m2 = Unigram.trainModel(d, "text", vocabSize = 30)
    assert(m.pieces == m2.pieces && m.unkCostMicro == m2.unkCostMicro)
  }

  test("tokenizer persistence: BPE + unigram round-trip parquet; corrupt artifacts fail") {
    val d = docsOf((1L, "low lower lowest newest widest " * 3))
    val tmp = java.nio.file.Files.createTempDirectory("tok_io").toString
    // BPE: model = the merge table; segmentation must be identical
    val merges = Bpe.trainMerges(d, "text", nMerges = 8)
    TokenizerIO.saveBpe(merges, spark, s"$tmp/bpe")
    val merges2 = TokenizerIO.loadBpe(spark, s"$tmp/bpe")
    assert(merges2 == merges)
    // unigram: full model round-trip, then equal Viterbi segmentation
    val m = Unigram.trainModel(d, "text", vocabSize = 20, maxPieceLen = 3)
    TokenizerIO.saveUnigram(m, spark, s"$tmp/uni")
    val m2 = TokenizerIO.loadUnigram(spark, s"$tmp/uni")
    assert(m2 == m)
    val seg = (mm: Unigram.Model) => spark.range(1)
      .select(graft.functions.UnigramSegment(lit("lowest"), mm.pieces,
        mm.unkCostMicro, mm.maxPieceLen).as("s")).head().getSeq[String](0)
    assert(seg(m2) == seg(m))
    // a corrupt merge table (non-dense ranks) must fail loudly
    import spark.implicits._
    Seq((0, "a", "b", 3L), (2, "c", "d", 2L))
      .toDF("rank", "left", "right", "pair_count")
      .write.mode("overwrite").parquet(s"$tmp/bad/merges")
    val err = intercept[IllegalArgumentException] {
      TokenizerIO.loadBpe(spark, s"$tmp/bad") }
    assert(err.getMessage.contains("dense"))
  }

  test("WordPiece: greedy longest-match semantics; vocab recipe; TokenizerIO round-trip") {
    import spark.implicits._
    // hand-built vocab pins the BERT inference contract exactly
    val vocab = Seq("un", "runn", "run", "##able", "##ning", "##n", "##i",
      "##ng", "a", "r", "u", "##un")
    def seg(w: String) = spark.range(1)
      .select(WordPiece.segment(lit(w), vocab).as("s"))
      .head().getSeq[String](0).toSeq
    // longest-match-first: 'runn' beats 'run' at the start
    assert(seg("running") == Seq("runn", "##i", "##ng"), seg("running"))
    // continuation pieces carry ##; multi-char beats char-by-char
    assert(seg("unable") == Seq("un", "##able"), seg("unable"))
    // all-or-nothing: 'z' is matchable nowhere -> the WHOLE word is
    // [UNK], not a partial prefix segmentation
    assert(seg("runz") == Seq("[UNK]"), seg("runz"))
    assert(seg("zrun") == Seq("[UNK]"), seg("zrun"))
    // a word-initial piece never matches mid-word and vice versa:
    // 'a' is bare-only, so 'ra' needs ##a (absent) -> UNK; 'aun'
    // starts bare 'a' then ##un
    assert(seg("ra") == Seq("[UNK]"), seg("ra"))
    assert(seg("aun") == Seq("a", "##un"), seg("aun"))
    // empty word -> empty array (null handled by nullSafeEval)
    assert(seg("") == Seq())
    // non-UNK results concatenate back to the word, ## stripped
    for (w <- Seq("running", "unable", "aun", "run", "a"))
      assert(seg(w).map(_.stripPrefix("##")).mkString == w, w)
    // HF max_input_chars_per_word: a word longer than the cap collapses
    // to [UNK] without probing (the default cap is 100 code points; a
    // segmentable word at exactly 100 still segments)
    assert(seg("run" * 34) == Seq("[UNK]"))  // 102 chars > 100
    val exactly99 = "r" + "un" * 49  // 99 chars: greedy run + ##un x48
    assert(seg(exactly99).head == "run" && seg(exactly99).length == 49)
    // an explicit tighter cap through the expression API
    val capped = spark.range(1)
      .select(graft.functions.WordPieceSegment(lit("running"), vocab,
        "[UNK]", maxInputChars = 5).as("s"))
      .head().getSeq[String](0).toSeq
    assert(capped == Seq("[UNK]"), capped)

    // vocab recipe: top-K whole words, capped ## n-grams, initial chars
    val d = docsOf((1L, "aaa bbb aaa ccc aaa bbb"), (2L, "dddd aaa bbb"))
    val pieces = WordPiece.vocabFrame(d, "text", topWords = 2)
      .collect().map(_.getString(0)).toSet
    assert(pieces.contains("aaa") && pieces.contains("bbb"), pieces) // top-2
    assert(!pieces.contains("ccc") && !pieces.contains("dddd"), pieces)
    assert(pieces.contains("##aa") && pieces.contains("##ddd"), pieces)
    assert(Seq("a", "b", "c", "d").forall(pieces.contains), pieces)
    // contLen cap: no ## piece longer than 3 bare chars
    assert(pieces.filter(_.startsWith("##")).forall(_.length <= 5), pieces)

    // persistence round-trip: identical vocab, identical segmentation
    val tmp = java.nio.file.Files.createTempDirectory("wp_io").toString
    TokenizerIO.saveWordPiece(WordPiece.vocabFrame(d, "text", 2),
      "[UNK]", s"$tmp/wp")
    val (loaded, unk) = TokenizerIO.loadWordPiece(spark, s"$tmp/wp")
    assert(loaded.toSet == pieces && unk == "[UNK]")
    val before = d.select(
      WordPiece.segment(lit("dddd"), pieces.toSeq).as("s")).head().getSeq[String](0)
    val after = d.select(
      WordPiece.segment(lit("dddd"), loaded, unk).as("s")).head().getSeq[String](0)
    assert(before == after && before.nonEmpty)
    // duplicate pieces in a stored vocab must fail loudly
    Seq("x", "x").toDF("piece").write.mode("overwrite").parquet(s"$tmp/bad/vocab")
    Seq("[UNK]").toDF("unk_token").write.mode("overwrite").parquet(s"$tmp/bad/meta")
    val err = intercept[IllegalArgumentException] {
      TokenizerIO.loadWordPiece(spark, s"$tmp/bad") }
    assert(err.getMessage.contains("duplicate"), err.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("split leakage: near-dup pairs straddling the holdout boundary, exactly") {
    // near-identical docs 0..39 in pairs (2k, 2k+1) — enough ids that
    // the hash split puts SOME pairs across boundaries; leakage must
    // equal the full pair set filtered by differing split labels
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = docsOf((0L until 40L).map(i =>
      i -> (base + " tail" + (i / 2))): _*)
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 32, 8, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = Sampling.holdoutSplit(d, "doc_id")
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(expected.nonEmpty, "fixture must produce cross-split pairs")
    assert(pairs.exists { case (a, b) => split(a) == split(b) },
      "fixture must also have same-split pairs (the filter must matter)")
    val leaked = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 32, 8, 0.9)
      .join(Sampling.holdoutSplit(d, "doc_id")
        .select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(Sampling.holdoutSplit(d, "doc_id")
        .select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b") // joins move their key columns first
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(leaked == expected)
  }

  test("dedup report: cluster-size histogram and removable fractions") {
    // 10 docs: one verbatim pair (1,2), one triple (4,5,6), rest unique
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docsOf(
      (1L, base), (2L, base), (3L, "three unique words here now ok yes no"),
      (4L, base + " tail"), (5L, base + " tail"), (6L, base + " tail"),
      (7L, "seven distinct tokens living in this doc fine"),
      (8L, "eight other tokens living around this doc fine"),
      (9L, "nine third tokens resting inside this doc fine"),
      (10L, "ten final tokens sitting beside this doc fine"))
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashLshPairs(d, "doc_id", "text", 3, 32, 8, 0.9))
    val total = d.agg(count(lit(1)).as("__n"))
    val rep = clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .withColumn("n_removable", (col("cluster_size") - 1) * col("n_clusters"))
      .crossJoin(broadcast(total))
      .select(col("cluster_size"), col("n_clusters"), col("n_removable"),
        round(col("n_removable") / col("__n"), 6).as("frac_removable"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rep == Map(
      2L -> ((1L, 1L, 0.1)),   // the pair: 1 removable of 10 docs
      3L -> ((1L, 2L, 0.2))))  // the triple: 2 removable
  }

  test("quality classifier: held-out prose vs spam; fast path agrees") {
    // none of these appear in the fixture
    val held = Seq(
      "keep" -> "the author describes the experiment and explains why the results matter",
      "keep" -> "farmers in the region rotate their crops to keep the soil healthy over many seasons",
      "keep" -> "the council voted to repair the bridge after engineers inspected the damage",
      "toss" -> "free free free click now best cheap offer buy discount click subscribe",
      "toss" -> "casino bonus jackpot slots win money fast click here no prescription pills",
      "toss" -> "xkcd qwop zzzz qwop xkcd zzzz qwop xkcd zzzz qwop wwww qqqq")
    val df = docsOf(held.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }: _*)
    val out = QualityClassifier.classify(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
    held.zipWithIndex.foreach { case ((l, s), i) =>
      assert(out(i.toLong)._1 == l, s"'${s.take(40)}…' → ${out(i.toLong)}")
      assert(out(i.toLong)._2 > 0) }
    // rolling-ring fast path: retrained weights, same predictions
    val fast = QualityClassifier.classifyFast(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    held.zipWithIndex.foreach { case ((l, _), i) =>
      assert(fast(i.toLong) == l, s"fast path disagreed on doc $i") }
    // gram-less text: zero scores, first class ('keep') with margin 0 —
    // threshold margins before trusting predictions
    val short = QualityClassifier.classify(
      docsOf((1L, "")), "doc_id", "text").head()
    assert(short.getString(3) == "keep" && short.getLong(4) == 0L)
  }

  test("readability: hand-computed FK on controlled sentences; gate flips on grade") {
    // doc 1: "the cat sat. the dog ran." -> W=6, S=2 ('.' chars), all
    // 1-syllable words -> Y=6. FK = 0.39*3 + 11.8*1 - 15.59 = -2.62
    // doc 2: one long sentence of polysyllabic-ish words: W=8, S=1,
    // syllables counted by the vowel-group heuristic below
    val d = docsOf(
      (1L, "the cat sat. the dog ran."),
      (2L, "university organization respectively naturally between academia computational linguistics."))
    val out = Quality.readability(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(6)))).toMap
    def syl(w: String): Int = {
      val g = "[aeiouy]+".r.findAllIn(w).length
      math.max(1, g - (if (w.matches(".*[^aeiouy]e$") && g > 1) 1 else 0))
    }
    def fk(ws: Seq[String], s: Int): Double = {
      val y = ws.map(syl).sum
      BigDecimal(0.39 * (ws.size.toDouble / s) + 11.8 * (y.toDouble / ws.size) - 15.59)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val w1 = "the cat sat. the dog ran.".toLowerCase.split("\\s+").toSeq
    assert(out(1L) == ((6L, 2L, w1.map(syl).sum.toLong, fk(w1, 2), fk(w1, 2) <= 12.0)))
    val w2 = "university organization respectively naturally between academia computational linguistics."
      .toLowerCase.split("\\s+").toSeq
    assert(out(2L)._1 == 8L && out(2L)._2 == 1L &&
      out(2L)._3 == w2.map(syl).sum.toLong && out(2L)._4 == fk(w2, 1))
    // the polysyllabic single-sentence doc must land HARDER than the
    // simple one, and past the grade-12 gate
    assert(out(2L)._4 > out(1L)._4 && !out(2L)._5 && out(1L)._5,
      s"grades: ${out(1L)._4} vs ${out(2L)._4}")
  }

  test("BpeByte.pretokens == GPT-2's lookahead pattern on every whitespace-rule case") {
    // ground truth: the PUBLISHED pattern (with the (?!\S) lookahead)
    // through Java regex — the engine's marker transform must produce
    // the identical partition on every case the lookahead governs
    // the whitespace class is the engine's EXPLICIT one (Java \s would
    // smuggle U+000B in, which RE2 — the oracle — excludes); what this
    // test proves is the LOOKAHEAD-free restatement, case by case
    val ws = BpeByte.Ws
    val gpt2 = java.util.regex.Pattern.compile(
      s"'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^$ws\\p{L}\\p{N}]+" +
        s"|[$ws]+(?![^$ws])|[$ws]+")
    // the tokenizer's single normalization, applied before the truth
    // pattern too: U+0001 is the internal marker and is stripped
    def norm(s: String): String = s.replace("\u0001", "")
    def truth(s: String): Seq[String] = {
      val m = gpt2.matcher(norm(s))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    val cases = Seq(
      "Hello world",            // single space attaches
      "don't stop, we'll go",   // contractions split off
      "abc  def",               // 2-space run: 1 ws token + attached space
      "abc   def",              // 3-space run: 2-space ws token + attach
      "a\tb", "a\t\tb", "a \tb", "a\t b", // tab never attaches, space does
      "trailing  ", "  leading", "   ",   // runs at edges
      "line1\nline2\n\nline3",  // newlines
      "x123y456", "3.14 costs $5!", "--flags--",
      "mixed\u00a0nbsp stays",  // U+00A0 is NOT \s for either engine
      "a\u000bb", "a \u000b b", // U+000B: punct class (RE2 parity), not ws
      // pre-existing U+0001 (the marker char) is STRIPPED, never
      // silently lost mid-token: the partition rebuilds norm(text)
      "pre\u0001mid post", "a \u0001 b", "\u0001", "ab  \u0001cd  ef")
    for (c <- cases) {
      val got = BpeByte.pretokensLocal(c)
      assert(got == truth(c), s"case '${c.replace("\n", "\\n").replace("\t", "\\t")}': " +
        s"got $got want ${truth(c)}")
      assert(got.mkString("") == norm(c),
        s"pretokens must partition norm('$c') exactly")
    }
    // the Column form agrees with the JVM mirror
    val df = docsOf(cases.zipWithIndex.map { case (c, i) => (i.toLong, c) }: _*)
    val viaCol = df.select(col("doc_id"), BpeByte.pretokens(col("text")).as("p"))
      .orderBy("doc_id").collect()
      .map(r => r.getSeq[String](1).toSeq).toSeq
    assert(viaCol == cases.map(truth), "Column path must equal the lookahead truth")
  }

  test("ByteUnicode: bijection on arbitrary unicode; byte-BPE is lossless end to end") {
    import graft.functions.ByteUnicode
    val samples = Seq("hello", " spaced out ", "\t\ntabs\n", "héllo wörld",
      "你好世界", "mixed 你 and é plus " + new String(Character.toChars(0x1F600)),
      "")
    for (s <- samples)
      assert(ByteUnicode.unmapBytes(ByteUnicode.mapBytes(s)) == s, s"roundtrip '$s'")
    // space maps to the GPT-2 'Ġ' (U+0120), newline to 'Ċ' (U+010A) —
    // the published table's best-known entries
    assert(ByteUnicode.mapBytes(" ") == "\u0120" && ByteUnicode.mapBytes("\n") == "\u010a")
    // mapped strings never contain a literal space (BpeSegment's rank-key
    // separator contract)
    assert(!samples.exists(s => ByteUnicode.mapBytes(s).contains(' ')))
    // end to end: train byte merges on a tiny corpus, segment, unmap —
    // original text reproduced byte for byte, whitespace included
    val d = docsOf(
      (1L, "the cat sat on the mat. the cat ran."),
      (2L, "the dog sat   on\tthe log, naturally."),
      (3L, "cats don't run 99 times!"))
    val merges = BpeByte.trainMerges(d, "text", nMerges = 12)
      .map(m => (m._2, m._3))
    assert(merges.size == 12)
    val out = d.select(col("doc_id"), col("text"),
        BpeByte.pretokens(col("text")).as("pts"))
      .withColumn("mapped", transform(col("pts"),
        t => graft.functions.ByteUnicode.toUnicode(t)))
      .withColumn("segs", transform(col("mapped"),
        m => graft.functions.BpeSegment(m, merges)))
      .select(col("doc_id"), col("text"),
        graft.functions.ByteUnicode.toBytes(
          array_join(flatten(col("segs")), "")).as("rebuilt"),
        aggregate(transform(col("segs"), a => size(a).cast("long")),
          lit(0L), (a, x) => a + x).as("n_tokens"),
        size(col("pts")).cast("long").as("n_pretokens"))
      .collect()
    for (r <- out) {
      assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)} not lossless: '${r.getString(2)}'")
      // 12 merges over this vocab cannot fully merge every pretoken
      assert(r.getLong(3) > r.getLong(4),
        s"doc ${r.getLong(0)}: segmentation collapsed (${r.getLong(3)} tokens, " +
          s"${r.getLong(4)} pretokens) — merges trivialized the spec")
    }
    // frequent " the" must compress well below its 4 raw byte symbols
    // (exact grouping depends on merge order; compression + exact
    // reconstruction are the invariants)
    val theSegs = d.sparkSession.range(1).select(
      graft.functions.BpeSegment(
        graft.functions.ByteUnicode.toUnicode(lit(" the")), merges).as("s"))
      .collect()(0).getSeq[String](0)
    assert(theSegs.mkString("") == "\u0120the" && theSegs.size <= 2,
      s"' the' segments: $theSegs")
  }

  test("byte-BPE merge tables round-trip through TokenizerIO; segmentation identical") {
    val d = docsOf(
      (1L, "the cat sat on the mat. the cat ran."),
      (2L, "the dog sat on the log, naturally."))
    val merges = BpeByte.trainMerges(d, "text", nMerges = 10)
    val dir = java.nio.file.Files.createTempDirectory("bytebpe_io").toString
    TokenizerIO.saveBpe(merges, spark, dir)
    val back = TokenizerIO.loadBpe(spark, dir)
    assert(back == merges, "byte merge table must round-trip exactly " +
      "(mapped-alphabet symbols are plain strings — the no-pickle contract holds)")
    val pairs = merges.map(m => (m._2, m._3))
    val seg = d.select(graft.functions.BpeSegment(
        graft.functions.ByteUnicode.toUnicode(col("text")), pairs).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    val seg2 = d.select(graft.functions.BpeSegment(
        graft.functions.ByteUnicode.toUnicode(col("text")),
        back.map(m => (m._2, m._3))).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(seg == seg2)
  }

  test("trainAndServe: certificate fails loudly below floor; served rows repartition-stable") {
    // perfectly learnable labels: 'zzz'-flooded docs are bad
    val rows = (0L until 120L).map { i =>
      val bad = i % 3 == 0
      val txt = if (bad) "zzz zzz zzz zzz keyboard mash zz zzz here"
        else "a perfectly ordinary clean sentence of plain prose words"
      (i, txt + s" tail$i", if (bad) "bad" else "good")
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("weak_label", StringType)))
    def df(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), parts), schema)
    val train = df(3).filter(col("doc_id") % 2 === 0)
    val serve = df(3).filter(col("doc_id") % 2 === 1)
    val out = TextClassifier.trainAndServe(train, serve, "doc_id", "weak_label",
      "text", Seq("good", "bad"), b = 128, maxSamples = 100, agreementFloor = 0.9)
      .select("doc_id", "pred", "agree").orderBy("doc_id").collect().toSeq
    assert(out.nonEmpty && out.forall(_.getBoolean(2)),
      "learnable labels must serve at full agreement")
    // same relation, different partitioning -> identical served rows
    // (trainFromDF's hash-gate + id re-sort make weights layout-free)
    val out2 = TextClassifier.trainAndServe(
      df(11).filter(col("doc_id") % 2 === 0), df(11).filter(col("doc_id") % 2 === 1),
      "doc_id", "weak_label", "text", Seq("good", "bad"),
      b = 128, maxSamples = 100, agreementFloor = 0.9)
      .select("doc_id", "pred", "agree").orderBy("doc_id").collect().toSeq
    assert(out2 == out, "served predictions must not depend on partitioning")
    // an unlearnable labeling (labels uncorrelated with text) must DIE
    // at the certificate, not serve silently-wrong predictions
    val coin = df(3).withColumn("weak_label",
      when(xxhash64(col("doc_id")) % 2 === 0, "good").otherwise("bad"))
    val e = intercept[Exception] {
      TextClassifier.trainAndServe(coin.filter(col("doc_id") % 2 === 0),
        coin.filter(col("doc_id") % 2 === 1), "doc_id", "weak_label", "text",
        Seq("good", "bad"), b = 128, maxSamples = 100, agreementFloor = 0.99)
        .count()
    }
    assert(e.getMessage != null && e.getMessage.contains("agreement"),
      s"certificate must name the agreement floor: ${e.getMessage}")
  }

  test("cleanCorpusV2: each stage visible on hand pages end to end") {
    val prose = "the quick brown fox jumps over the lazy dog today. " +
      "and we keep many solid words here with care. " +
      "that line also ends with a clean period mark. " +
      "have another proper sentence of plain words now. " +
      "some more plain filler words arrive to clear the gopher floor. " +
      "nothing unusual happens inside this calm spare sentence either. " +
      "with this final sentence the document clearly ends."
    def page(body: String) =
      "<html><body><nav><a href='/'>Home</a> menu</nav><p>" + body +
        "</p><footer>(c) footer</footer></body></html>"
    // every surviving body must END in terminal punctuation (the C4
    // line rule) and carry a distinct-enough tail that only the PLANTED
    // pair clears the 0.9 near-dup threshold over the shared prose
    val rows = Seq(
      (1L, page(prose + " unique tail for document number one.")),  // survives
      (2L, page(prose + " unique tail for document number one.")),  // exact dup of 1 -> dropped
      (3L, page(prose + " unique tail for document number one extraword.")), // near dup of 1 -> dropped
      (4L, page(prose + " " + ("#" * 40))),                  // gopher kill
      (5L, page(prose + " lorem ipsum dolor sit.")),         // c4 kill
      (6L, page(prose + " a badword appears.")),             // wordlist kill
      (7L, page(prose + " mail user7@example.com goes right here today.")), // survives, scrubbed
      (8L, page(prose + " document eight has its own closing words.")))     // semantic dup of 1 -> dropped
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("html", StringType)))
    val pages = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
    // embeddings: docs 8 and 1 semantic dups (identical vectors) -> the
    // non-kept member of the pair must drop; give the rest orthogonal-ish
    // distinct vectors
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, _) =>
        val v = Array.tabulate(8)(d =>
          if (i == 8L) (if (d == 0) 1.0f else 0.0f) // same direction as doc 1
          else if (i == 1L) (if (d == 0) 1.0f else 0.0f)
          else if (d == (i % 8).toInt) 1.0f else 0.0f)
        Row(i, v.toSeq)
      }, 2),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val out = Dedup.cleanCorpusV2(pages, vecs, "doc_id", "html",
      blocklist = Seq("badword"), threshold = 0.9,
      semK = 2, semTau = 0.99, semDim = 8, semStarCap = 24)
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // 2 exact-dropped, 3 near-dropped, 4/5/6 gated, 8 semantic-dropped
    // (doc 1 is the min-id rep of the {1,8} semantic pair)
    assert(ids == Seq(1L, 7L), s"survivors: $ids")
    val t7 = out(1).getString(1)
    assert(t7.contains("[EMAIL]") && !t7.contains("user7@example.com"),
      s"PII must be scrubbed: $t7")
    assert(!out(0).getString(1).contains("<"), "no tags may survive extraction")
  }

  test("trainFromDF: corpus-fit gate separates held-out docs; deterministic across partitionings") {
    // a labeled RELATION (not the embedded fixture): 120 docs, ids
    // non-contiguous, label decides a planted style; some rows carry
    // an out-of-class label or null text and must be excluded
    val keepW = Seq("committee", "evidence", "method", "report", "analysis",
      "measured", "reviewed", "published", "detailed", "findings")
    val tossW = Seq("click", "free", "cheap", "casino", "bonus", "offer",
      "jackpot", "subscribe", "discount", "pills")
    def sentence(ws: Seq[String], seed: Int): String =
      (0 until 12).map(j => ws((seed * 7 + j * 3) % ws.size)).mkString(" ")
    val rows = (0 until 120).map { i =>
      val id = 5000L + i * 11
      if (i % 20 == 19) Row(id, "other", "une phrase dans une autre classe")
      else if (i % 2 == 0) Row(id, "keep", sentence(keepW, i))
      else Row(id, "toss", sentence(tossW, i))
    }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("label", StringType), StructField("text", StringType)))
    val labeled = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val w = QualityClassifier.trainFromDF(labeled, "doc_id", "label", "text")
    // perceptron updates are order-sensitive — the hash-gated sample +
    // id re-sort must make weights a pure function of the DATA
    val w2 = QualityClassifier.trainFromDF(labeled.repartition(13),
      "doc_id", "label", "text")
    assert(w == w2, "weights changed under repartitioning")
    // held-out docs in the same planted styles, words recombined
    val held = Seq(
      "keep" -> "the findings were measured and reviewed before the committee published the analysis",
      "keep" -> "a detailed report of the evidence supported the method",
      "toss" -> "click the offer free bonus casino jackpot subscribe now cheap pills",
      "toss" -> "discount offer click free subscribe casino bonus jackpot")
    val df = docsOf(held.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }: _*)
    val out = QualityClassifier.classifyWith(df, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    held.zipWithIndex.foreach { case ((l, s), i) =>
      assert(out(i.toLong) == l, s"'${s.take(40)}' → ${out(i.toLong)}") }
    // maxSamples gates the collect (14 keep + 14 toss of the 108
    // in-class rows); a smaller deterministic sample still separates
    val wSmall = QualityClassifier.trainFromDF(labeled, "doc_id", "label",
      "text", maxSamples = 28)
    val outSmall = QualityClassifier.classifyWith(df, "doc_id", "text", wSmall)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    held.zipWithIndex.foreach { case ((l, _), i) =>
      assert(outSmall(i.toLong) == l) }
    // LangId variant: custom class set fit on the same machinery
    val langRows = (0 until 60).map { i =>
      val id = 100L + i * 7
      if (i % 2 == 0) Row(id, "en", "the house and the garden were quiet that morning and the road was empty")
      else Row(id, "de", "das haus und der garten waren ruhig und die strasse war leer am morgen")
    }
    val ldf = spark.createDataFrame(
      spark.sparkContext.parallelize(langRows, 3), schema)
    val lw = LangId.trainFromDF(ldf, "doc_id", "label", "text",
      classes = Seq("en", "de"))
    val lout = LangId.classifyWith(
      docsOf((0L, "the garden near the road was quiet"),
        (1L, "der garten an der strasse war ruhig")),
      "doc_id", "text", lw, classes = Seq("en", "de"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(lout(0L) == "en" && lout(1L) == "de")
    // fixture-derived oracle constants are untouched by the corpus path
    assert(QualityClassifier.Weights ==
      TextClassifier.train(QualityClassifier.TrainFixture,
        QualityClassifier.Classes, QualityClassifier.B,
        TextClassifier.bucketsMd5(_, QualityClassifier.B)))
  }

  test("langid margin routing: threshold gate, han fallback, und floor") {
    // the p72 composition on controlled docs: a confident prediction
    // passes the gate, sub-threshold garbage routes by script —
    // han-dominant rescues to zh, anything else floors at 'und'
    val df = docsOf(
      (0L, "the and of to in that it is was for"),
      (1L, "\u4F60\u597D\u4E16\u754C\u518D\u89C1"),
      (2L, "12345 67890"),
      (3L, "")) // gram-less: all scores 0, margin 0
    val cls = LangId.classify(df, "doc_id", "text")
    val prof = Quality.scriptProfile(df, "doc_id", "text")
      .select(col("doc_id"), col("dominant_script"))
    val out = cls.join(prof, "doc_id")
      .select(col("doc_id"), col("margin"),
        when(col("margin") >= 16, col("lang_pred"))
          .when(col("dominant_script") === "han", lit("zh"))
          .otherwise(lit("und")).as("r"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(0L)._1 >= 16 && out(0L)._2 == "en", out(0L).toString)
    assert(out(1L)._1 < 16 && out(1L)._2 == "zh", out(1L).toString)
    assert(out(2L)._1 < 16 && out(2L)._2 == "und", out(2L).toString)
    assert(out(3L)._1 == 0 && out(3L)._2 == "und")
  }

  test("langid classifier: held-out sentences, fixture consistency, edges") {
    // training is deterministic — weights must be stable across calls
    // (object init) and nonzero for every language row
    assert(LangId.Weights.length == LangId.Langs.length)
    assert(LangId.Weights.forall(_.exists(_ != 0L)))
    // the fixture itself must be fully separated (perceptron converged)
    val fixPred = LangId.classify(
      docsOf(LangId.TrainFixture.zipWithIndex.map {
        case ((_, s), i) => (i.toLong, s) }: _*), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    val fixAcc = LangId.TrainFixture.zipWithIndex.count {
      case ((l, _), i) => fixPred(i.toLong) == l }
    assert(fixAcc == LangId.TrainFixture.length,
      s"fixture self-accuracy $fixAcc/${LangId.TrainFixture.length}")
    // HELD-OUT sentences (none in the fixture): the generalization check
    val held = Seq(
      "en" -> "this is the house that we built for it and for the dog",
      "de" -> "das haus und der garten sind nicht mit dem wasser zu sehen",
      "es" -> "la casa de los amigos es un lugar que no quiero dejar",
      "fr" -> "la maison et le jardin ne sont pas dans une petite ville",
      "zh" -> "wo men zai zhe li you yi ge hao peng you ni lai ba")
    val out = LangId.classify(
      docsOf(held.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }: _*),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    held.zipWithIndex.foreach { case ((l, s), i) =>
      assert(out(i.toLong) == l, s"'$s' → ${out(i.toLong)}, wanted $l") }
    // confidence margin (the fastText 'und' signal): strictly positive
    // on every held-out sentence, and score(pred) − best other exactly
    val margins = LangId.classify(
      docsOf(held.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }: _*),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (((1 to 5).map(r.getLong), r.getString(6), r.getLong(7)))).toMap
    margins.values.foreach { case (scores, pred, m) =>
      val pi = LangId.Langs.indexOf(pred)
      assert(m == scores(pi) - scores.zipWithIndex
        .filter(_._2 != pi).map(_._1).max)
      assert(m > 0, s"held-out margin must be positive: $m")
    }
    // short/empty text: no grams → all-zero scores → deterministic 'en'
    // with margin 0 (threshold to 'und'); never an error under ANSI
    val short = LangId.classify(
      docsOf((1L, ""), (2L, "ab"), (3L, null.asInstanceOf[String])),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(6), r.getLong(7)))).toMap
    assert(short(1L) == ((0L, "en", 0L)) && short(2L) == ((0L, "en", 0L)) &&
      short(3L) == ((0L, "en", 0L)))
    // the rolling-hash fast path (retrained weights, no md5): its
    // fixture weights must separate, and predictions must AGREE with
    // the oracle path on the held-out sentences
    assert(LangId.WeightsFast.forall(_.exists(_ != 0L)))
    val fast = LangId.classifyFast(
      docsOf(held.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }: _*),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    held.zipWithIndex.foreach { case ((l, s), i) =>
      assert(fast(i.toLong) == l, s"fast path: '$s' → ${fast(i.toLong)}") }
  }

  test("pmiPairs counts ±window co-occurrences and scores collocations") {
    // doc "a b a c": window 2 position pairs (1,2)(2,3)(3,4)(1,3)(2,4)
    // → canonical (a,b),(a,b),(a,c),(a,a),(b,c); doc "x y": (x,y)
    val d = docsOf((1L, "a b a c"), (2L, "x y"), (3L, "solo"))
    val out = Cooccur.pmiPairs(d, "doc_id", "text", window = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.view.mapValues(_._1).toMap == Map(
      ("a", "b") -> 2L, ("a", "a") -> 1L, ("a", "c") -> 1L,
      ("b", "c") -> 1L, ("x", "y") -> 1L))
    // doc 3 ("solo", 1 token) contributes nothing — not even to the
    // unigram totals (the pair universe is docs with >= 2 tokens)
    // PMI sanity: Nt=6, Np=6; pmi(a,b) = ln(2/6*6/2*6/1) = ln(6);
    // pmi(x,y) = ln(1/6*6/1*6/1) = ln(6); pmi(a,a) = ln(1/6*6/2*6/2) = ln(1.5)
    assert(math.abs(out(("a", "b"))._2 - math.log(6.0)) < 1e-5)
    assert(math.abs(out(("x", "y"))._2 - math.log(6.0)) < 1e-5)
    assert(math.abs(out(("a", "a"))._2 - math.log(1.5)) < 1e-5)
    // rarer-in-context pair outranks frequent-word pair on PMI even
    // though counts tie
    assert(out(("x", "y"))._2 > out(("a", "c"))._2)
    // no positional self-join: the plan has exactly the two count
    // shuffles + the scalar attaches — no SortMergeJoin on a range
    val plan = Cooccur.pmiPairs(d, "doc_id", "text", 2, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("pageRank replays the hand-computed integer propagation") {
    // graph 1→2, 2→1, 3→1 (all outdeg 1), damping 0.85, base 150000:
    // iter1: every c = 850000 → r=(1850000, 1000000, 150000)
    // iter2: t=(1572500, 850000, 127500) → r=(1127500, 1722500, 150000)
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    val e = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, 2L), Row(2L, 1L), Row(3L, 1L)), 2), schema)
    val r2 = GraphOps.pageRank(e, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1127500L, 2L -> 1722500L, 3L -> 150000L))
    // a sink (no out-edges) still accumulates rank: 1→4 only
    val e2 = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, 4L)), 2), schema)
    val s1 = GraphOps.pageRank(e2, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == Map(1L -> 150000L, 4L -> 1000000L))
    // deterministic across evaluations and partitionings
    val a = GraphOps.pageRank(e, "src", "dst", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.pageRank(e.repartition(7), "src", "dst", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("BPE trainMerges learns the textbook example; BpeSegment applies by rank") {
    // Sennrich et al. 2016 §3.2 word dict: {low:5, lower:2, newest:6,
    // widest:3} (no end-of-word marker in this formulation). Weighted
    // pair counts give es=9/st=9 (tie → lexicographic), then est=9,
    // then lo=7/ow=7 (tie), then low=7.
    val d = docsOf(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim))
    val merges = Bpe.trainMerges(d, "text", nMerges = 4)
    assert(merges == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L), (3, "lo", "w", 7L)))
    val pairs = merges.map(m => (m._2, m._3))
    def segOf(w: String): Seq[String] = spark.range(1)
      .select(graft.functions.BpeSegment(lit(w), pairs).as("s"))
      .head().getSeq[String](0)
    // greedy lowest-rank-first: es → est → lo → low
    assert(segOf("lowest") == Seq("low", "est"))
    // unmerged symbols pass through; concatenation invariant holds
    assert(segOf("widest") == Seq("w", "i", "d", "est"))
    assert(segOf("widest").mkString == "widest")
    assert(segOf("") == Seq.empty)
    // training stops early when no pairs remain
    val tiny = Bpe.trainMerges(docsOf((1L, "a b c")), "text", nMerges = 5)
    assert(tiny.isEmpty)
  }

  test("BPE indexed trainer reproduces the naive rescan merge-for-merge") {
    // adversarial dict: overlap runs (aaaa), re-creatable pair strings
    // ((a,bc) vs (ab,c) both yield symbol "abc"), count ties resolved
    // lexicographically, and a hapax tail — exercises every branch of
    // the incremental update (per-word recount, lazy-heap staleness,
    // pair re-creation after a zero count)
    def dict(ws: (String, Long)*): Array[(Array[String], Long)] =
      ws.toArray.map { case (w, f) =>
        (graft.functions.BpeSegment.codePoints(w), f) }
    val d1 = dict("aaaa" -> 7L, "aab" -> 5L, "abc" -> 5L, "bca" -> 4L,
      "cab" -> 3L, "abcabc" -> 2L, "zq" -> 1L, "a" -> 9L)
    assert(Bpe.trainMergesLocal(d1, 20) == Bpe.trainMergesNaiveLocal(d1, 20))
    // pseudo-random 60-word dict, deep merge run (drains most pairs)
    val rng = new scala.util.Random(42)
    val d2 = dict((1 to 60).map(i =>
      (1 to (2 + rng.nextInt(8))).map(_ => ('a' + rng.nextInt(4)).toChar)
        .mkString -> (1L + rng.nextInt(9))): _*)
    assert(Bpe.trainMergesLocal(d2, 200) == Bpe.trainMergesNaiveLocal(d2, 200))
    // exhaustion parity: both stop at the same rank
    val d3 = dict("ab" -> 2L, "cd" -> 1L)
    assert(Bpe.trainMergesLocal(d3, 50) == Bpe.trainMergesNaiveLocal(d3, 50))
  }

  test("bigram LM: hand-computed smoothed NLL; unusual order outscores common order") {
    // docs 1-3 share the unigram profile {a:×, b:×} family but differ in
    // ORDER: (a b)/(b a) are corpus-common, (a a)/(b b) rare — only the
    // bigram model separates them
    val d = docsOf((1L, "a b a b"), (2L, "b a b a"), (3L, "a a b b"), (4L, "x"))
    val out = Quality.lm2Score(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    // corpus: cb = {ab:4, ba:3, aa:1, bb:1}, cu = {a:6, b:6, x:1}, V=3
    def nllu(cb: Long, cu: Long): Long =
      math.round(-math.log((cb + 1.0) / (cu + 3.0)) * 1e6)
    def mean(us: Seq[Long]): Double =
      BigDecimal(us.sum.toDouble / (us.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = nllu(4, 6)
    val ba = nllu(3, 6)
    val rare = nllu(1, 6)             // (a a) and (b b)
    assert(out(1L) == ((3L, mean(Seq(ab, ba, ab)))))
    assert(out(2L) == ((3L, mean(Seq(ba, ab, ba)))))
    assert(out(3L) == ((3L, mean(Seq(rare, ab, rare)))))
    assert(out(3L)._2 > out(1L)._2 && out(3L)._2 > out(2L)._2,
      "rare-order doc must score higher")
    assert(out(4L)._1 == 0L && out(4L)._2.isNaN) // single token: no bigrams
  }

  test("bpe pairCounts: occurrence-weighted within-word pairs, deterministic cut") {
    val d = docsOf((1L, "abab abab"), (2L, "ab"), (3L, "x yz"))
    val out = Bpe.pairCounts(d, "text", k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // abab ×2 → ab:2,ba:1 each; ab ×1 → ab:1; yz → yz:1 ⇒ ab=5, ba=2, yz=1
    assert(out.toMap == Map("ab" -> 5L, "ba" -> 2L, "yz" -> 1L))
    // ordering: count desc then pair asc
    assert(out.map(_._1).toSeq == Seq("ab", "ba", "yz"))
    // k cuts deterministically on the tie-broken order
    val top2 = Bpe.pairCounts(d, "text", k = 2).collect().map(_.getString(0)).toSeq
    assert(top2 == Seq("ab", "ba"))
  }

  test("knTrigramScore matches an independent plain-Scala KN-3 recomputation") {
    val corpus = Seq(
      (1L, "a b c a b c a b"),
      (2L, "b c a b c a"),
      (3L, "c c b a a b"),
      (4L, "x y"),             // < 3 tokens: n_trigrams = 0, NULL score
      (5L, "a b c"))
    val D = 0.75
    // independent oracle: plain maps, no Spark
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
    def grams(ts: Seq[String], n: Int) = ts.sliding(n).filter(_.size == n).toSeq
    val allTri = toks.flatMap { case (_, ts) => grams(ts, 3) }
    val ct = allTri.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val hist = ct.groupBy(_._1.take(2)).map { case (k, m) =>
      k -> ((m.values.sum, m.size.toLong)) }                      // cuv, n3f
    val mid = ct.keys.groupBy(t => (t(1), t(2))).map { case (k, v) =>
      k -> v.size.toLong }                                        // n1vw
    val midv = mid.groupBy(_._1._1).map { case (k, m) =>
      k -> ((m.values.sum, m.size.toLong)) }                      // n1mid, nfv
    val allBi = toks.flatMap { case (_, ts) => grams(ts, 2) }
    val cbTypes = allBi.groupBy(identity).keys.toSeq
    val n1b = cbTypes.groupBy(_(1)).map { case (k, v) => k -> v.size.toLong }
    val nt = cbTypes.size.toLong
    def nllu(tri: Seq[String]): Long = {
      val (cuv, n3f) = hist(tri.take(2))
      val (n1mid, nfv) = midv(tri(1))
      val pcont = n1b(tri(2)).toDouble / nt
      val pmid = math.max(mid((tri(1), tri(2))) - D, 0.0) / n1mid +
        D * nfv / n1mid * pcont
      val p = math.max(ct(tri) - D, 0.0) / cuv + D * n3f / cuv * pmid
      math.round(-math.log(p) * 1e6)
    }
    val want = toks.map { case (id, ts) =>
      val us = grams(ts, 3).map(nllu)
      id -> (if (us.isEmpty) (0L, None) else (us.size.toLong, Some(
        BigDecimal(us.sum.toDouble / (us.size * 1e6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }.toMap
    val out = Quality.knTrigramScore(docsOf(corpus: _*), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out.keySet == want.keySet)
    want.foreach { case (id, w) => assert(out(id) == w, s"doc $id") }
    // sanity on the smoothing itself: the repeated common phrase (doc 1)
    // must score more fluent than the rare-order doc 3
    assert(out(1L)._2.get < out(3L)._2.get)
  }

  test("filterFunnel: first-failing-gate attribution, all branches, funnel order matters") {
    // five proper sentences, 44 alpha words incl. the Gopher stops —
    // passes gopher + c4 + wordlist
    val passer =
      "the quick brown fox jumps over the lazy dog today and more. " +
      "and we keep many solid words here with care in this text. " +
      "that line also ends with a clean period mark as needed. " +
      "have another proper sentence of plain words right now too. " +
      "with this final sentence the document clearly ends for good."
    val d = docsOf(
      (1L, passer),                                        // survivor
      (2L, "too short."),                                  // fails gopher (AND c4) → gopher
      (3L, passer + "\nlorem ipsum dolor sit amet."),      // fails only c4
      (4L, passer + "\nbadword ends the line today."),     // fails only wordlist
      (5L, passer + " " + "#" * 40))                       // symbol flood → gopher
    val out = Quality.filterFunnel(d, "doc_id", "text", Seq("badword"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1_gopher" -> 2L, "2_c4" -> 1L,
      "3_wordlist" -> 1L, "4_survivor" -> 1L), out.toString)
  }

  test("lineCorrections: each furniture rule fires; uppercase counters double-count; survivors reassemble in order") {
    val d = docsOf(
      (1L, "good prose line here.\n42 / 107\n3 likes\nHOME ABOUT\nmore prose."),
      (2L, "12 THINGS WE KEPT TODAY\nALL CAPS\n2024-01-02"),  // 5-token caps SURVIVES
      (3L, "only prose in this one."),
      (4L, "117 Comments\n0 points\n999 views"))
    val out = Quality.lineCorrections(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((5L, 1L, 1L, 1L, "good prose line here.\nmore prose.")))
    // '2024-01-02' is numeric furniture; 'ALL CAPS' is 2-token caps;
    // the 5-token caps headline is past the bound and must stay
    assert(out(2L) == ((3L, 1L, 0L, 1L, "12 THINGS WE KEPT TODAY")))
    assert(out(3L) == ((1L, 0L, 0L, 0L, "only prose in this one.")))
    // counter rule is case-insensitive; all three lines are counters,
    // none double-counts as numeric (they contain letters)
    assert(out(4L) == ((3L, 0L, 3L, 0L, "")))
    // counter and caps are NOT disjoint: an uppercase counter matches
    // both (documented), so the per-rule counts exceed the drop total
    val dd = docsOf((9L, "3 LIKES\nprose."))
    val o9 = Quality.lineCorrections(dd, "doc_id", "text").collect()(0)
    assert((o9.getLong(1), o9.getLong(2), o9.getLong(3), o9.getLong(4),
      o9.getString(5)) == ((2L, 0L, 1L, 1L, "prose.")),
      "uppercase counter: dropped once, counted by BOTH counter and caps")
  }

  test("domainKl matches an independent plain-Scala recomputation; identical dist -> 0") {
    val rows = Seq(
      ("a", "x x y"), ("a", "x z"),        // src a: x:3 y:1 z:1
      ("b", "y y z z"), ("b", "y z"),      // src b: y:3 z:3
      ("c", "x x y z"), ("c", "x"))        // src c: x:3 y:1 z:1 (== a)
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
    val out = Quality.domainKl(df, "source", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // independent recomputation with plain maps
    val st = rows.flatMap { case (s, t) => t.split(" ").map(s -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ns = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = t.values.sum.toDouble
    def kl(s: String) = {
      val su = st.collect { case ((`s`, term), k) =>
        val ps = k.toDouble / ns(s)
        math.round(ps * math.log(ps / (t(term) / n)) * 1e6)
      }.sum
      BigDecimal(su / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.keySet == Set("a", "b", "c"))
    Seq("a", "b", "c").foreach { s =>
      assert(out(s) == ((ns(s), st.keys.count(_._1 == s).toLong, kl(s))), s)
    }
    // a and c have IDENTICAL distributions → identical KL; b diverges more
    assert(out("a")._3 == out("c")._3)
    assert(out("b")._3 > out("a")._3 && out("a")._3 > 0.0)
  }

  test("vocabDrift: statuses, exact log-ratios, minCount cut, threshold boundary") {
    val a = docsOf((1L, ("alpha " * 8 + "beta " * 8 + "gone " * 6).trim))
    val b = docsOf((2L, ("alpha " * 8 + "beta " * 4 + "born " * 6).trim))
    // totals: na = 22, nb = 18
    val out = Quality.vocabDrift(a, b, "text", minCount = 5,
        driftLogRatio = 0.69).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getString(4)))).toMap
    def lr(ka: Long, kb: Long) =
      BigDecimal(math.log((kb / 18.0) / (ka / 22.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // alpha: 8/22 -> 8/18, ratio ln(1.222) = 0.2007 < 0.69 -> stable
    assert(out("alpha") == ((8L, 8L, Some(lr(8, 8)), "stable")))
    // beta: 8/22 -> 4/18, ln(0.611) = -0.4925 -> stable (|.| < 0.69)
    assert(out("beta") == ((8L, 4L, Some(lr(8, 4)), "stable")))
    assert(out("gone") == ((6L, 0L, None, "vanished")))
    assert(out("born") == ((0L, 6L, None, "new")))
    assert(out.size == 4) // nothing below minCount leaks in
    // drifted fires once the ratio clears the threshold: 2 -> 8 copies
    val b2 = docsOf((2L, ("alpha " * 8 + "beta " * 8 + "hot " * 8).trim))
    val a2 = docsOf((1L, ("alpha " * 8 + "beta " * 8 + "hot " * 2).trim))
    val d2 = Quality.vocabDrift(a2, b2, "text", minCount = 5,
        driftLogRatio = 0.69).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(d2("hot") == "drifted" && d2("alpha") == "stable")
  }

  test("vocabGrowth: hand corpus — first-appearance attribution, cumulative columns") {
    // 4 docs, 2 buckets; ids non-contiguous to exercise the lo/hi form
    val d = docsOf(
      (10L, "a b a"),       // bucket 0: tokens 3
      (11L, "b c"),         // bucket 0: tokens 2; vocab after b0 = {a,b,c}
      (12L, "c d d"),       // bucket 1: d is new
      (13L, "a"))           // bucket 1
    val out = Quality.vocabGrowth(d, "doc_id", "text", buckets = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) == ((2L, 5L, 3L, 3L)))
    assert(out(1L) == ((4L, 9L, 4L, 1L)))
    // duplicated corpus: same vocab curve, doubled token curve
    val dup = d.unionByName(d.select((col("doc_id") + 100).as("doc_id"),
      col("text")))
    val o2 = Quality.vocabGrowth(dup, "doc_id", "text", buckets = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(o2(1L) == ((18L, 4L)), "dup corpus: tokens double, vocab flat")
  }

  test("CharCounts: code-point histogram — multi-byte chars, supplementary plane, determinism") {
    val d = docsOf((1L, "aéé你你你" + new String(Character.toChars(0x1F600))))
    val out = d.select(graft.functions.CharCounts(col("text")).as("m"))
      .selectExpr("explode(m)").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "é" -> 2L, "你" -> 3L,
      new String(Character.toChars(0x1F600)) -> 1L))
    // histogram total == code-point length; charEntropy over unicode
    // agrees with the independent formula
    val e = Quality.charEntropy(d, "doc_id", "text").collect()(0)
    assert(e.getLong(1) == 7L && e.getLong(2) == 4L)
    val su = Seq(1, 2, 3, 1).map { k =>
      val p = k / 7.0; math.round(-p * math.log(p) * 1e6) }.sum
    assert(e.getDouble(3) ==
      BigDecimal(su / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("index save on empty input fails loudly BEFORE writing anything") {
    val tmp = java.nio.file.Files.createTempDirectory("emptyidx").toString
    val emptyDocs = docsOf().toDF()
    val e1 = intercept[IllegalArgumentException] {
      Dedup.saveMinhashIndex(
        Dedup.minhashIndex(emptyDocs, "doc_id", "text", 5, 32, 8),
        s"$tmp/mh", 5)
    }
    assert(e1.getMessage.contains("EMPTY"), e1.getMessage)
    assert(!new java.io.File(s"$tmp/mh/meta").exists(),
      "no partial meta may be left behind")
    val allNull = emb.limit(3).withColumn("embedding",
      lit(null).cast("array<float>"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.saveCosineIndex(allNull, s"$tmp/cos")
    }
    assert(e2.getMessage.contains("EMPTY"), e2.getMessage)
    assert(!new java.io.File(s"$tmp/cos/meta").exists())
  }

  test("mainContentBlocks: each drop rule fires on its own violator; prose survives") {
    val prose = "This paragraph carries enough real sentence text to stay."
    def mc(html: String) = {
      val d = docsOf((1L, "x")).select(lit(html).as("h"))
      val r = d.select(TextOps.mainContentBlocks(col("h")).as("m"))
        .select(col("m.n_blocks"), col("m.n_kept"), col("m.text_main"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getString(2))
    }
    // chrome containers vanish WHOLESALE — their text never becomes a block
    assert(mc(s"<body><nav><a href='/'>Home</a> menu words here</nav><p>$prose</p></body>")
      == ((1L, 1L, prose)))
    assert(mc(s"<body><header>Big Site Name Banner Words</header><p>$prose</p>" +
      s"<footer>copyright words and links</footer></body>") == ((1L, 1L, prose)))
    assert(mc(s"<body><aside>Related articles sidebar text block</aside><p>$prose</p></body>")
      == ((1L, 1L, prose)))
    // link-density rule: a long-enough block that is mostly anchor text drops
    val linky = "<div><a href='/a'>Latest stories ranked</a> <a href='/b'>Top picks today</a> go</div>"
    assert(mc(s"<body>$linky<p>$prose</p></body>") == ((2L, 1L, prose)))
    // min-length rule: short blocks drop even with zero links
    assert(mc(s"<body><p>ok.</p><p>$prose</p></body>") == ((2L, 1L, prose)))
    // a long block with a MINOR link stays (density under the ceiling)
    val mixed = s"$prose See <a href='/x'>this</a> for more supporting detail text."
    val (nb, nk, tm) = mc(s"<body><p>$mixed</p></body>")
    assert(nb == 1L && nk == 1L && tm.contains("this"), s"($nb,$nk,$tm)")
    // entity decode + whitespace collapse inside kept blocks
    assert(mc("<body><p>alpha &amp; beta&nbsp;gamma   delta epsilon zeta</p></body>")
      == ((1L, 1L, "alpha & beta gamma delta epsilon zeta")))
    // block order is preserved in text_main
    val two = mc(s"<body><p>first paragraph with plenty of words inside.</p>" +
      s"<p>second paragraph also has plenty of words.</p></body>")
    assert(two == ((2L, 2L,
      "first paragraph with plenty of words inside.\nsecond paragraph also has plenty of words.")))
  }

  test("CacheLedger: internal barriers registered, drain releases, results survive a drain") {
    CacheLedger.drain()
    val d = docsOf((1L, "a b c a b c d"), (2L, "x y z x y"), (3L, "q w e r t y u"))
    val out = Quality.knTrigramScore(d, "doc_id", "text")
    assert(CacheLedger.pinned > 0,
      "knTrigramScore's token/type barriers must register with the ledger")
    val rows = out.orderBy("doc_id").collect().toSeq
    CacheLedger.drain()
    assert(CacheLedger.pinned == 0, "drain must empty the ledger")
    // a drained plan recomputes — identically
    assert(out.orderBy("doc_id").collect().toSeq == rows)
    // vocabDrift + hammingPairsIncremental register too
    Quality.vocabDrift(d, d.withColumn("text", concat(col("text"), lit(" new"))),
      "text", minCount = 1).count()
    val sigs = d.select(col("doc_id"), (col("doc_id") * 1024L).as("sig"))
    Dedup.hammingPairsIncremental(sigs, sigs.limit(0), "doc_id", "sig", 4).count()
    assert(CacheLedger.pinned > 0)
    CacheLedger.drain()
    assert(CacheLedger.pinned == 0)
    // the round-10 sweep: the BM25 per-doc barrier and PageRank's
    // edge/vertex/degree (+ iteration) barriers are tracked, not bare
    TfIdf.bm25Scores(d, "doc_id", "text", Seq("a", "x")).count()
    assert(CacheLedger.pinned > 0, "bm25 per-doc barrier must be tracked")
    CacheLedger.drain()
    val edges = docsOf((1L, "x"), (2L, "x")).select(
      col("doc_id").as("src"), (col("doc_id") % 2 + 1).as("dst"))
    GraphOps.pageRank(edges, "src", "dst", iterations = 6,
      materializeEvery = 2).count()
    assert(CacheLedger.pinned > 0, "pageRank barriers must be tracked")
    CacheLedger.drain()
    assert(CacheLedger.pinned == 0)
  }

  test("CharCounts: malformed UTF-8 never throws — 0xF5-0xFF leads and past-U+10FFFF decodes") {
    import org.apache.spark.unsafe.types.UTF8String
    // the point of each call: ArrayBasedMapData construction (which
    // runs Character.toChars over every decoded point) must not throw
    def hist(bytes: Int*): Long = {
      val m = graft.functions.CharCounts.histogram(
        UTF8String.fromBytes(bytes.map(_.toByte).toArray))
      (0 until m.numElements()).map(i => m.valueArray.getLong(i)).sum
    }
    // 0xF5 lead with 3 trail bytes: RFC 3629 forbids it (would decode
    // > U+10FFFF); must degrade to lone-lead, not crash in toChars
    assert(hist(0xF5, 0x80, 0x80, 0x80) == 4L)
    assert(hist(0xFF, 0xBF, 0xBF, 0xBF) == 4L)
    // 0xF4 with trail > 0x8F decodes to 0x110000 — exactly one past max
    assert(hist(0xF4, 0x90, 0x80, 0x80) == 4L)
    // valid supplementary-plane max still decodes as ONE code point
    assert(hist(0xF4, 0x8F, 0xBF, 0xBF) == 1L)
    // garbage + trailing ascii: every garbage byte a lone code point
    assert(hist(0xF5, 0x80, 0x80, 0x80, 0x61) == 5L)
  }

  test("charEntropy: analytic values on hand distributions, flood crushes the gate") {
    val d = docsOf(
      (1L, "aaaa"),          // one char type: entropy exactly 0
      (2L, "aabb"),          // uniform over 2: exactly ln 2
      (3L, "abcd"),          // uniform over 4: exactly ln 4
      (4L, "the quick brown fox jumps over the lazy dog " * 3 + "a" * 400))
    val out = Quality.charEntropy(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    def h(ps: Seq[Double]) = {
      val su = ps.map(p => math.round(-p * math.log(p) * 1e6)).sum
      BigDecimal(su / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L) == ((4L, 1L, 0.0, false)))
    assert(out(2L) == ((4L, 2L, h(Seq(0.5, 0.5)), false)))
    assert(out(3L) == ((4L, 4L, h(Seq(0.25, 0.25, 0.25, 0.25)), false)))
    // the prose prefix alone clears 2.5 nats; the 400-char flood must
    // drag the combined doc under the gate
    val proseOnly = Quality.charEntropy(
      docsOf((9L, "the quick brown fox jumps over the lazy dog " * 3)),
      "doc_id", "text").collect()(0)
    assert(proseOnly.getBoolean(4), s"prose entropy ${proseOnly.getDouble(3)}")
    assert(!out(4L)._4 && out(4L)._3 < proseOnly.getDouble(3))
  }

  test("ibanScrub: mod-97 arbitrates — valid spellings redacted, lookalikes untouched") {
    val d = docsOf(
      (1L, "acct DE89370400440532013000 ok"),
      (2L, "acct FR1420041010050500013M02606 ok"),  // letters mid-BBAN
      (3L, "acct DE89370400440532013001 bad"),      // checksum fails
      (4L, "short GB82WEST123 nope"),               // 11 chars: not a candidate
      (5L, "two NL91ABNA0417164300 and CH9300762011623852957 here"),
      (6L, "plain words only"))
    val out = Quality.ibanScrub(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(out(1L) == ((1L, 1L, false, "acct [IBAN] ok")))
    assert(out(2L) == ((1L, 1L, false, "acct [IBAN] ok")))
    assert(out(3L) == ((1L, 0L, true, "acct DE89370400440532013001 bad")))
    assert(out(4L) == ((0L, 0L, true, "short GB82WEST123 nope")))
    assert(out(5L) == ((2L, 2L, false, "two [IBAN] and [IBAN] here")))
    assert(out(6L) == ((0L, 0L, true, "plain words only")))
  }

  test("canonicalizeUrl: each RFC 3986 normalization step, and what must NOT change") {
    val cases = Seq(
      // fragment strip + scheme/host lowercase, path case preserved
      "HTTP://WWW.Example.COM/Path/A#frag" -> "http://www.example.com/Path/A",
      // default port stripped only when it matches the scheme
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "http://a.com:443/x" -> "http://a.com:443/x",
      "https://a.com:8080/x" -> "https://a.com:8080/x",
      // trailing slash runs collapse; bare root becomes empty path
      "http://a.com/x///" -> "http://a.com/x",
      "http://a.com/" -> "http://a.com",
      // tracking params dropped (case-insensitive key), survivors SORTED
      "http://a.com/p?utm_source=x&b=2&a=1&fbclid=z" -> "http://a.com/p?a=1&b=2",
      "http://a.com/p?UTM_Campaign=x&Ref=h" -> "http://a.com/p",
      // reordered spellings meet at one key
      "http://a.com/p?b=2&a=1" -> "http://a.com/p?a=1&b=2",
      // value-less and empty params: kept (non-tracking) / dropped (empty)
      "http://a.com/p?&flag&utm_x=1" -> "http://a.com/p?flag")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.zipWithIndex.map {
        case ((raw, want), i) => Row(i.toLong, raw, want) }, 2),
      StructType(Seq(StructField("id", LongType),
        StructField("raw", StringType), StructField("want", StringType))))
    val got = df.select(col("id"), UrlOps.canonicalizeUrl(col("raw")).as("c"),
      col("want")).collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"case ${r.getLong(0)}: got ${r.getString(1)} want ${r.getString(2)}")
    }
  }

  test("urlCanonicalDedup: spelling variants collapse, counts and first_doc right") {
    val urls = Seq(
      (5L, "HTTP://A.com/x/?utm_source=s"),
      (2L, "http://a.com:80/x"),
      (9L, "http://a.com/x#f"),
      (9L, "http://a.com/x#f"),         // exact repeat: occurrence, not variant
      (7L, "http://b.com/y"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(urls.map(u => Row(u._1, u._2)), 3),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("url", StringType))))
    val out = UrlOps.urlCanonicalDedup(df, "doc_id", "url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("http://a.com/x") == ((4L, 3L, 2L)))
    assert(out("http://b.com/y") == ((1L, 1L, 7L)))
    assert(out.size == 2)
  }

  test("luhnCardScrub: checksum arbitrates — valid spellings redacted, invalid untouched") {
    val d = docsOf(
      (1L, "pay 4111 1111 1111 1111 now"),        // valid, spaced
      (2L, "pay 4012-8888-8888-1881 now"),        // valid, hyphenated
      (3L, "amex 378282246310005 ok"),            // valid, 15 digits
      (4L, "ref 4111111111111112 here"),          // checksum fails
      (5L, "order 123456789012 done"),            // 12 digits: not a candidate
      (6L, "id 4111111111111111 bad 5500005555555559 x"), // two valid plain
      (7L, "plain text no digits"))
    val out = Quality.luhnCardScrub(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    assert(out(1L) == ((1L, 1L, false, "pay [CARD] now")))
    assert(out(2L) == ((1L, 1L, false, "pay [CARD] now")))
    assert(out(3L) == ((1L, 1L, false, "amex [CARD] ok")))
    assert(out(4L) == ((1L, 0L, true, "ref 4111111111111112 here")))
    assert(out(5L) == ((0L, 0L, true, "order 123456789012 done")))
    assert(out(6L) == ((2L, 2L, false, "id [CARD] bad [CARD] x")))
    assert(out(7L) == ((0L, 0L, true, "plain text no digits")))
  }

  test("codeGate: hand-computed signals; poetry and keyword-substring prose stay prose") {
    val d = docsOf(
      (1L, "a;\n    b{\nplain"),
      // fully-indented poetry: indentation alone must not cross 400
      (2L, "    roses are red\n    violets are blue\n    the cap is low\n    the gate is true"),
      // prose with 'return'-substring and parens: kw + light symbols stay under
      (3L, "He returned the books (on time), which the librarian noted."),
      (4L, ""),
      // real source: all four signals fire
      (5L, "import os\n\ndef f(x):\n    y = x + 1\n    return y\n"))
      .unionByName(spark.sql(
        "SELECT 6L AS doc_id, cast(null as string) AS text"))
    val out = Quality.codeGate(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: n_chars=15, n_lines=3, sym=2 -> 133; indent 1/3 -> 333;
    // term 2/3 -> 666; kw 0 => 3*133 + 2*666 + 333 div 4 = 1814
    val r1 = out(1L)
    assert(r1.getLong(1) == 15L && r1.getLong(2) == 3L)
    assert(r1.getLong(3) == 133L && r1.getLong(4) == 333L && r1.getLong(5) == 666L)
    assert(r1.getLong(6) == 0L && r1.getLong(7) == 1814L && r1.getBoolean(8))
    // poetry: indent 1000 -> contributes only 250; everything else 0
    assert(out(2L).getLong(4) == 1000L && out(2L).getLong(7) == 250L)
    assert(!out(2L).getBoolean(8))
    // prose: 'return' substring hits (100) + '(' ')' ',' -> low sym, stays prose
    assert(out(3L).getLong(6) >= 1L && !out(3L).getBoolean(8))
    // empty: zero everything
    assert(out(4L).getLong(7) == 0L && !out(4L).getBoolean(8))
    // python: keywords + indent + symbols clear the threshold
    assert(out(5L).getLong(6) >= 3L && out(5L).getBoolean(8))
    // NULL text scores exactly like empty (ADVICE r12: no NULL leak-through)
    val r6 = out(6L)
    assert(r6.getLong(1) == 0L && r6.getLong(2) == 1L &&
      r6.getLong(7) == 0L && !r6.getBoolean(8))
  }

  test("hostCap == window row_number on the real corpus; skew, small hosts, determinism") {
    import spark.implicits._
    val scored = docs.select(col("source"), col("doc_id"),
      (col("n_chars") % 1000).as("score"))
    val got = Sampling.hostCap(scored, "doc_id", "source", "score",
        n = 7, maxScore = 999L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    assert(got == want)
    // determinism under a different partitioning
    val again = Sampling.hostCap(scored.repartition(13), "doc_id", "source",
        "score", n = 7, maxScore = 999L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again == got)
    // one mega-host: only n survive, best-first
    val skew = spark.range(0, 1000).select(
      lit("farm").as("host"), col("id").as("doc_id"),
      (col("id") % 97).as("score"))
    val capped = Sampling.hostCap(skew, "doc_id", "host", "score",
        n = 3, maxScore = 96L)
      .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // best score 96 at ids 96, 193, 290, ... -> smallest ids win ties
    assert(capped == Seq((96L, 96L, 1L), (193L, 96L, 2L), (290L, 96L, 3L)))
    // a host with fewer than n docs keeps everything
    val tiny = Sampling.hostCap(
      Seq(("solo", 42L, 5L)).toDF("host", "doc_id", "score"),
      "doc_id", "host", "score", n = 7, maxScore = 999L).collect()
    assert(tiny.length == 1 && tiny.head.getLong(3) == 1L)
  }

  test("hostCap: packing-bound violations fail loudly, not silently wrong") {
    import spark.implicits._
    val bad = Seq(("h", 1L, 5000L)).toDF("host", "doc_id", "score")
    val e = intercept[Exception] {
      Sampling.hostCap(bad, "doc_id", "host", "score",
        n = 2, maxScore = 999L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packing bounds")), e.toString)
    intercept[IllegalArgumentException] {
      Sampling.hostCap(bad, "doc_id", "host", "score",
        n = 2, maxScore = Long.MaxValue / 2)
    }
  }

  test("renderChatML: exact render, spans address the assistant content, edge cases") {
    import spark.implicits._
    def render(msgs: org.apache.spark.sql.Column) = Seq(1L).toDF("id")
      .select(graft.pipeline.TextOps.renderChatML(msgs).as("r"))
      .select("r.rendered", "r.n_turns", "r.assistant_spans")
      .collect().head
    val r = render(array(
      struct(lit("system").as("role"), lit("sys").as("content")),
      struct(lit("user").as("role"), lit("hello").as("content")),
      struct(lit("assistant").as("role"), lit("hi there").as("content"))))
    assert(r.getString(0) ==
      "<|im_start|>system\nsys<|im_end|>\n" +
      "<|im_start|>user\nhello<|im_end|>\n" +
      "<|im_start|>assistant\nhi there<|im_end|>\n")
    assert(r.getLong(1) == 3L && r.getString(2) == "88:96")
    // span self-consistency: [s:e) carved out of the render IS the
    // content (BMP chars only, so code points == JVM chars here)
    assert(r.getString(0).substring(88, 96) == "hi there")
    // multi-byte BMP content shifts later spans by code points
    val u = render(array(
      struct(lit("assistant").as("role"), lit("中文 résumé").as("content")),
      struct(lit("assistant").as("role"), lit("ok").as("content"))))
    val spans = u.getString(2).split(",").map { s =>
      val Array(a, b) = s.split(":"); (a.toInt, b.toInt) }
    assert(spans.length == 2)
    assert(u.getString(0).substring(spans(0)._1, spans(0)._2) == "中文 résumé")
    assert(u.getString(0).substring(spans(1)._1, spans(1)._2) == "ok")
    // null content renders empty; empty conversation renders empty
    val n = render(array(
      struct(lit("assistant").as("role"),
        lit(null).cast("string").as("content"))))
    assert(n.getString(0) == "<|im_start|>assistant\n<|im_end|>\n")
    assert(n.getString(2) == "22:22")
    val e = render(array().cast("array<struct<role:string,content:string>>"))
    assert(e.getString(0) == "" && e.getLong(1) == 0L && e.getString(2) == "")
  }

  test("meanPoolMicros: exact integer pooling, toward-zero mean, ragged dims fail") {
    import spark.implicits._
    val chunks = Seq(
      (1L, Seq(1.0, -0.5)), (1L, Seq(0.5, -0.25)),
      (2L, Seq(-0.000001, 0.0)), (2L, Seq(-0.000002, 0.0)))
      .toDF("grp", "embedding")
    val out = Similarity.meanPoolMicros(chunks, "grp", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    val g1 = out(1L)
    assert(g1.getLong(1) == 2L && g1.getLong(2) == 2L)
    assert(g1.getSeq[Long](3) == Seq(750000L, -375000L))
    assert(g1.getLong(4) == 750000L * 750000L + 375000L * 375000L)
    // unit = mean / |mean|: (0.894427, -0.447214) at 6dp
    assert(g1.getSeq[Double](5) == Seq(0.894427, -0.447214))
    // sum -3 over 2 chunks truncates toward zero: -1, not floor's -2
    assert(out(2L).getSeq[Long](3) == Seq(-1L, 0L))
    // order independence
    val again = Similarity.meanPoolMicros(chunks.repartition(7), "grp", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap
    assert(again(1L) == Seq(750000L, -375000L) && again(2L) == Seq(-1L, 0L))
    // ragged vector lengths in one group fail loudly
    val ragged = Seq((9L, Seq(1.0, 2.0)), (9L, Seq(1.0)))
      .toDF("grp", "embedding")
    val err = intercept[Exception] {
      Similarity.meanPoolMicros(ragged, "grp", "embedding").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("ragged")), err.toString)
    // a mis-scaled embedding whose norm_sq would wrap BIGINT fails
    // loudly instead of serving a corrupt unit vector (ADVICE r12):
    // mean_micro 4e12 squared is ~1.6e25 >> Long.Max
    val huge = Seq((7L, Seq(4.0e6, 0.0)), (7L, Seq(4.0e6, 0.0)))
      .toDF("grp", "embedding")
    val err2 = intercept[Exception] {
      Similarity.meanPoolMicros(huge, "grp", "embedding").collect()
    }
    assert(msgs(err2).exists(_.contains("overflow bound")), err2.toString)
  }

  test("bitextMarginMine: planted counterparts mined, hubs rejected, banded == exact here") {
    val src = emb.filter(col("vec_id") % 5 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 0).select(
      (col("vec_id") + 100000L).as("vec_id"),
      zip_with(col("embedding"), reverse(col("embedding")),
        (a, b) => a.cast("double") * 0.9 + b.cast("double") * 0.1)
        .as("embedding"))
    val exact = Similarity.bitextMarginMine(src, tgt, k = 5,
      marginMilliMin = 1800L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(8)))).toMap
    // every src with a planted counterpart (vec_id%10==0) finds IT and
    // mines it; srcs without one are never mined (hub margins < 1.5)
    val planted = exact.filter { case (s, _) => s % 10 == 0 }
    assert(planted.nonEmpty)
    planted.foreach { case (s, (t, mined)) =>
      assert(t == s + 100000L && mined, s"src $s -> $t mined=$mined")
    }
    exact.filter { case (s, _) => s % 10 != 0 }.foreach { case (s, (_, mined)) =>
      assert(!mined, s"hub src $s was mined")
    }
    // the banded serving form agrees with the exact baseline on this
    // corpus (cos≈0.99 pairs collide in >=1 of 16 bands with P~1; the
    // candidate-graph neighborhoods happen to match the global ones
    // here, which the 3-SF oracle equality also pins)
    val banded = Similarity.bitextMarginMineBanded(src, tgt, k = 5,
      marginMilliMin = 1800L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(8)))).toMap
    planted.keys.foreach { s =>
      assert(banded.get(s).exists { case (t, m) => t == s + 100000L && m },
        s"banded missed planted src $s")
    }
  }

  test("bitextMarginMine: hand-computed integer margin on a 3-vector corpus") {
    import spark.implicits._
    // src x = e1; targets: y1 = e1 (sim 1e6), y2 = 45deg (sim 707107),
    // y3 = e2 (sim 0). k=2: wx = 1e6 + 707107 over 2 members; the
    // y-neighborhoods are singletons (one src): wy(y1) = 1e6 over 1 —
    // the margin divides by the ACTUAL member counts, not k
    val src = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (11L, Seq(1.0, 0.0)), (12L, Seq(1.0, 1.0)), (13L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.bitextMarginMine(src, tgt, k = 2,
      marginMilliMin = 1500L).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 11L)
    assert(row.getLong(2) == 1000000L)
    assert(row.getLong(3) == 1000000L + 707107L) // wx: top-2 of {1e6, 707107, 0}
    assert(row.getLong(4) == 1000000L)           // wy(11): only src 1
    assert(row.getLong(5) == 2L && row.getLong(6) == 1L)
    // margin = (1e6 * 1000 * (2+1)) div (1707107 + 1000000) = 1108...
    val expect = (1000000L * 1000L * 3L) / (1707107L + 1000000L)
    assert(row.getLong(7) == expect && expect == 1108L)
    assert(!row.getBoolean(8)) // 1108 < 1500: high absolute sim, low margin
    // the degenerate ISOLATED pair (each side's neighborhood is just
    // the pair) scores exactly 1000 = sim/sim — the case a fixed-k
    // divisor would inflate to k×1000 and auto-mine at any cosine
    val iso = Similarity.bitextMarginMine(
      Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding"),
      Seq((21L, Seq(0.9, 0.1))).toDF("vec_id", "embedding"),
      k = 5, marginMilliMin = 1800L).collect()
    assert(iso.length == 1)
    assert(iso.head.getLong(7) == 1000L && !iso.head.getBoolean(8))
  }

  test("GearChunks: exact tiling, length bounds, re-sync across shifted prefixes") {
    import spark.implicits._
    val (minLen, maxLen, maskBits) = (16, 128, 5)
    def chunksOf(texts: (Long, String)*) =
      texts.toSeq.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          explode(graft.functions.GearChunks(col("text"),
            minLen, maxLen, maskBits)).as("c"))
        .select(col("doc_id"), col("c.start"), col("c.len"),
          expr("substring(text, cast(start as int), cast(len as int))")
            .as("chunk"))
        .collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(1)).map(r =>
          (r.getLong(1), r.getLong(2), r.getString(3))).toSeq).toMap
    val base = ("the committee resolved to publish the annual water " +
      "survey before the spring thaw and the upstream gauges were " +
      "recalibrated twice while the ferry operators requested notice " +
      "of every change to the weir schedule and the dredging barge " +
      "worked the northern channel before the marina approach") * 2
    val out = chunksOf((1L, base), (2L, "DIFFERENT PREFIX!! " + base),
      (3L, ""), (4L, "short"))
    // exact tiling: contiguous starts, lens sum to the text length
    for (id <- Seq(1L, 2L)) {
      val cs = out(id)
      assert(cs.head._1 == 1L)
      cs.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      assert(cs.map(_._2).sum == (if (id == 1) base.length
        else base.length + 19))
      // every chunk <= maxLen; every non-final chunk >= minLen
      assert(cs.forall(_._2 <= maxLen))
      assert(cs.dropRight(1).forall(_._2 >= minLen))
    }
    // re-sync: after a 19-char prefix insertion the chunker recovers —
    // the tail chunk CONTENT multisets overlap heavily
    val h1 = out(1L).map(_._3)
    val h2 = out(2L).map(_._3)
    val shared = h1.toSet.intersect(h2.toSet)
    assert(shared.size >= h1.size / 2,
      s"re-sync failed: ${shared.size} of ${h1.size} chunks shared")
    // empty text -> no chunks; short text -> one final sub-minLen chunk
    assert(!out.contains(3L))
    assert(out(4L) == Seq((1L, 5L, "short")))
  }

  test("cdcDupChunks: shared shifted tails dedup; zeros row; determinism") {
    import spark.implicits._
    val tail = "the archivist noted that the flood plates of eighteen " +
      "ninety draw the most requests followed by the quarry surveys " +
      "and the mill ledgers and the county atlases on display"
    val d = Seq(
      (1L, "first document body with its own words " + tail),
      (2L, "a completely different and rather longer opening passage " + tail),
      (3L, "unrelated content about turbine cooperatives on the ridge"),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = Dedup.cdcDupChunks(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // doc 1 owns the tail's first occurrences; doc 2 re-finds them at a
    // DIFFERENT offset (the re-sync property) -> dup chars > 0
    assert(out(1L)._2 == 0L, s"doc1 should own first occurrences: ${out(1L)}")
    assert(out(2L)._2 >= 1L && out(2L)._3 > 0L,
      s"shifted shared tail not deduped: ${out(2L)}")
    assert(out(3L)._2 == 0L)
    assert(out(4L) == ((0L, 0L, 0L, 0L)))
    val again = Dedup.cdcDupChunks(d.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(again == out)
  }

  test("chunk stored index: shifted-offset temporal screen, fold == rebuild, geometry + family pinned") {
    import spark.implicits._
    val tail = "the archivist noted that the flood plates of eighteen " +
      "ninety draw the most requests followed by the quarry surveys " +
      "and the mill ledgers and the county atlases on display"
    val btail = "entirely novel shared region that only the batch " +
      "carries twice across two documents with enough length to span " +
      "several content defined chunks in a row for the within batch rule"
    val corpusA = docsOf(
      (2L, "first corpus document body with its own words " + tail))
    val corpusB = docsOf(
      (4L, "a different snapshot opening passage " + tail))
    val batch = docsOf(
      (11L, "completely fresh prose holding no shared region at all " +
        "just singular sentences about turbine cooperatives on the ridge"),
      // the corpus tail at ANOTHER offset: dup only if the stored
      // geometry re-syncs the batch chunker
      (13L, "much longer and structurally distinct batch prefix " + tail),
      (15L, "batch lead " + btail),
      (17L, "other lead " + btail)) // btail's first batch owner is 15
    val dir = java.nio.file.Files.createTempDirectory("chunk_idx").toString
    Dedup.saveChunkIndex(corpusA, "doc_id", "text", s"$dir/f")
    Dedup.mergeIntoChunkIndex(corpusB, s"$dir/f", "doc_id", "text")
    Dedup.saveChunkIndex(corpusA.unionByName(corpusB), "doc_id", "text",
      s"$dir/r")
    def screen(p: String) =
      Dedup.chunksAgainstIndex(batch, p, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val folded = screen(s"$dir/f")
    assert(folded == screen(s"$dir/r"), "fold != rebuild")
    // fresh doc: zero dups; corpus-tail doc: dup chunks despite the
    // shifted offset; batch-shared region: first batch owner (15)
    // keeps, the later copy (17) dups
    assert(folded(11L)._2 == 0L, s"fresh doc flagged: ${folded(11L)}")
    assert(folded(13L)._2 >= 1L && folded(13L)._3 > 0L,
      s"shifted corpus tail not caught: ${folded(13L)}")
    assert(folded(17L)._2 >= 1L, s"within-batch dup missed: ${folded(17L)}")
    assert(folded(17L)._2 > folded(15L)._2,
      s"batch-first owner must out-keep the copy: ${folded(15L)} ${folded(17L)}")
    // determinism at another parallelism
    assert(Dedup.chunksAgainstIndex(batch.repartition(7), s"$dir/f",
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap == folded)
    // bucketed layout (r13): identical report, fold through the
    // catalog table, Bucketed: true scan, plain merge refuses
    Dedup.saveChunkIndexBucketed(corpusA, "doc_id", "text", s"$dir/bk",
      nBuckets = 8, tablePrefix = "t_ch")
    Dedup.mergeIntoChunkIndexBucketed(corpusB, s"$dir/bk", "doc_id",
      "text", tablePrefix = "t_ch")
    assert(Dedup.chunksAgainstIndexBucketed(batch, s"$dir/bk", "doc_id",
        "text", tablePrefix = "t_ch")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap == folded,
      "bucketed chunk screen diverged")
    val threshBk = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.chunksAgainstIndexBucketed(batch, s"$dir/bk",
          "doc_id", "text", tablePrefix = "t_ch")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"stored side must scan bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshBk)
    val eBkCh = intercept[IllegalArgumentException] {
      Dedup.mergeIntoChunkIndex(corpusB, s"$dir/bk", "doc_id", "text")
    }
    assert(eBkCh.getMessage.contains("BUCKETED layout"), eBkCh.getMessage)
    // bloom sidecar (r13): identical report; stale-after-fold fails
    Dedup.buildChunkBloom(spark, s"$dir/f", expectedItems = 10000L)
    def screenBloom() =
      Dedup.chunksAgainstIndexBloom(batch, s"$dir/f", "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(screenBloom() == folded, "bloom chunk screen diverged")
    Dedup.mergeIntoChunkIndex(corpusB, s"$dir/f", "doc_id", "text")
    val eStale = intercept[IllegalArgumentException] { screenBloom() }
    assert(eStale.getMessage.contains("re-run buildChunkBloom"),
      eStale.getMessage)
    // foreign family fails before any join
    Dedup.saveExactIndex(corpusA, "doc_id", "text", s"$dir/exact")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadChunkIndex(spark, s"$dir/exact")
    }
    assert(e.getMessage.contains("not cdc_gear_md5"), e.getMessage)
    // non-md5 key material in a later file fails the per-file probe
    Seq(("nothex!", 1L, 1L)).toDF("chunk_hash", "first", "cnt")
      .coalesce(1).write.mode("append").parquet(s"$dir/f/index")
    val e2 = intercept[IllegalArgumentException] {
      Dedup.loadChunkIndex(spark, s"$dir/f")
    }
    assert(e2.getMessage.contains("non-md5 chunk_hash"), e2.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    CacheLedger.drain()
  }

  test("shingle stored index: excerpt containment 1.0, fold == rebuild, serve-time df cutoff, foreign family fails") {
    import spark.implicits._
    def words(a: Int, b: Int) = (a to b).map(i => s"w$i").mkString(" ")
    val corpusA = docsOf((2L, words(1, 60)))
    val corpusB = docsOf((4L, words(100, 160)))
    val batch = docsOf(
      (11L, words(10, 29)),            // interior excerpt of doc 2 -> 1.0
      (13L, words(120, 139)),          // excerpt of the FOLDED doc 4 -> 1.0
      (15L, "totally fresh words " + words(900, 940)))
    val dir = java.nio.file.Files.createTempDirectory("sh_idx").toString
    Dedup.saveShingleIndex(corpusA, "doc_id", "text", n = 3, s"$dir/f")
    Dedup.mergeIntoShingleIndex(corpusB, s"$dir/f", "doc_id", "text")
    Dedup.saveShingleIndex(corpusA.unionByName(corpusB), "doc_id", "text",
      n = 3, s"$dir/r")
    def screen(p: String) =
      Dedup.containmentAgainstIndex(batch, p, "doc_id", "text", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val folded = screen(s"$dir/f")
    assert(folded == screen(s"$dir/r"), "fold != rebuild")
    // both excerpts fully contained (18 shingles each), fresh doc absent
    assert(folded((11L, 2L)) == ((18L, 1.0)), folded.toString)
    assert(folded((13L, 4L)) == ((18L, 1.0)), folded.toString)
    assert(!folded.keys.exists(_._1 == 15L))
    // the big docs are NOT contained in their excerpts (reverse
    // direction under threshold)
    assert(!folded.contains((2L, 11L)) && !folded.contains((4L, 13L)))
    // bloom sidecar: identical relation; stale-after-fold fails by name
    Dedup.buildShingleBloom(spark, s"$dir/f", expectedItems = 10000L)
    def screenBloom() =
      Dedup.containmentAgainstIndexBloom(batch, s"$dir/f", "doc_id",
          "text", 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    assert(screenBloom() == folded, "bloom containment screen diverged")
    Dedup.mergeIntoShingleIndex(corpusB, s"$dir/f", "doc_id", "text")
    val eStale = intercept[IllegalArgumentException] { screenBloom() }
    assert(eStale.getMessage.contains("re-run buildShingleBloom"),
      eStale.getMessage)
    // bucketed layout: identical relation, fold through the catalog
    // table, Bucketed: true scan, plain merge refuses
    Dedup.saveShingleIndexBucketed(corpusA, "doc_id", "text", n = 3,
      s"$dir/bk", maxDf = 10000, nBuckets = 8, tablePrefix = "t_sh")
    Dedup.mergeIntoShingleIndexBucketed(corpusB, s"$dir/bk", "doc_id",
      "text", tablePrefix = "t_sh")
    def screenBk() =
      Dedup.containmentAgainstIndexBucketed(batch, s"$dir/bk", "doc_id",
          "text", 0.8, tablePrefix = "t_sh")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    assert(screenBk() == folded, "bucketed containment screen diverged")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.containmentAgainstIndexBucketed(batch, s"$dir/bk",
          "doc_id", "text", 0.8, tablePrefix = "t_sh")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"stored postings must scan bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    val eBk = intercept[IllegalArgumentException] {
      Dedup.mergeIntoShingleIndex(corpusB, s"$dir/bk", "doc_id", "text")
    }
    assert(eBk.getMessage.contains("BUCKETED layout"), eBk.getMessage)
    // serve-time df cutoff: an index built with maxDf 1 stores only
    // df-1 shingles; a batch doc whose every shingle matches TWO
    // stored docs is cut to nothing
    val hotCorpus = docsOf((2L, words(1, 30)), (4L, words(1, 30)))
    Dedup.saveShingleIndex(hotCorpus, "doc_id", "text", n = 3,
      s"$dir/hot", maxDf = 1)
    assert(Dedup.containmentAgainstIndex(docsOf((11L, words(5, 20))),
      s"$dir/hot", "doc_id", "text", 0.1).count() == 0,
      "df-cut shingles must not match")
    // SERVE-TIME cutoff under folds: each snapshot stores its copy
    // (df 1 <= maxDf at build), but the UNION df is 2 > maxDf — the
    // screen must re-derive df over the matched keys and cut
    Dedup.saveShingleIndex(docsOf((2L, words(200, 230))), "doc_id",
      "text", n = 3, s"$dir/fold1", maxDf = 1)
    Dedup.mergeIntoShingleIndex(docsOf((4L, words(200, 230))),
      s"$dir/fold1", "doc_id", "text")
    assert(Dedup.containmentAgainstIndex(docsOf((11L, words(205, 220))),
      s"$dir/fold1", "doc_id", "text", 0.1).count() == 0,
      "fold-union df must honor the stored bound at serve time")
    // foreign family fails before any join
    Dedup.saveExactIndex(corpusA, "doc_id", "text", s"$dir/exact")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadShingleIndex(spark, s"$dir/exact")
    }
    assert(e.getMessage.contains("not shingle_h60"), e.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    CacheLedger.drain()
  }

  test("NfcNormalize: composes decomposed sequences, unifies content hashes, idempotent, null-safe") {
    import spark.implicits._
    val decomposed = "café crème"   // e + combining acute/grave
    val precomposed = "café crème"    // single code points
    val d = Seq((1L, decomposed), (2L, precomposed),
      (3L, "plain ascii"), (4L, "Ångström"))
      .toDF("doc_id", "text")
      .unionByName(spark.sql("SELECT 5L AS doc_id, cast(null as string) AS text"))
    val out = d.select(col("doc_id"),
        graft.functions.NfcNormalize(col("text")).as("nfc"),
        md5(graft.functions.NfcNormalize(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    // the two spellings of the same visible text unify
    assert(out(1L) == out(2L), s"${out(1L)} vs ${out(2L)}")
    assert(out(1L)._1 == precomposed)
    // ASCII passes through; combining ring/diaeresis compose
    assert(out(3L)._1 == "plain ascii")
    assert(out(4L)._1 == "Ångström")
    // null -> null
    assert(out(5L) == ((null, null)))
    // idempotent
    val twice = d.filter(col("doc_id") === 1L).select(
      graft.functions.NfcNormalize(
        graft.functions.NfcNormalize(col("text")))).head().getString(0)
    assert(twice == precomposed)
  }

  test("licenseGate: SPDX wins, fingerprints classify, name-dropping prose stays none") {
    val d = docsOf(
      (1L, "// SPDX-License-Identifier: MIT\nint main() {}"),
      (2L, "/* Licensed under the Apache License, Version 2.0 */\ncode"),
      (3L, "Permission is hereby granted, free of charge, to any person\ncode"),
      (4L, "This program is free software under the GNU General Public License.\ncode"),
      // the false-positive probe: license NAMES in prose, no tag, no
      // license-text fingerprint
      (5L, "The MIT license is discussed in many classrooms, and the " +
        "Apache license appears in most textbooks about open source."),
      (6L, "// SPDX-License-Identifier: GPL-3.0-only\ncode"),
      (7L, "# SPDX-License-Identifier: Zlib\ncode"),
      (8L, "plain prose with no licensing content at all"),
      (9L, "Redistribution and use in source and binary forms, with or " +
        "without modification, are permitted.\ncode"))
    val out = Quality.licenseGate(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))).toMap
    assert(out(1L) == (("MIT", "mit", "permissive", true)))
    assert(out(2L) == (("", "apache-2.0", "permissive", true)))
    assert(out(3L) == (("", "mit", "permissive", true)))
    assert(out(4L) == (("", "gpl", "copyleft", false)))
    assert(out(5L) == (("", "none", "none", true)), s"probe: ${out(5L)}")
    assert(out(6L) == (("GPL-3.0-only", "gpl", "copyleft", false)))
    assert(out(7L) == (("Zlib", "other-spdx", "unknown", false)))
    assert(out(8L) == (("", "none", "none", true)))
    assert(out(9L) == (("", "bsd", "permissive", true)))
    // keepUnlicensed = false drops the none class
    val strict = Quality.licenseGate(d, "doc_id", "text",
        keepUnlicensed = false).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(!strict(5L) && !strict(8L) && strict(1L))
  }

  test("prepPairs: degenerate/empty/dup/contaminated pairs flagged, clean pairs keep, renders exact") {
    import spark.implicits._
    val long1 = "the quick brown fox jumps over the lazy dog while the " +
      "miller counts sacks of grain beside the river crossing at dawn"
    val long2 = "the quick brown fox jumps over the lazy dog while the " +
      "miller counts sacks of grain beside the river crossing at dusk"
    val pairs = Seq(
      (1L, "benchmark question about turbine cooperatives", "a", "b"),
      (10L, "what is the tallest mountain", "Everest", "Everest"), // degenerate
      (11L, "name a fast sorting algorithm", "quicksort", ""),     // empty side
      (12L, "shared prompt text exactly", "good answer", "bad answer"),
      (13L, "shared prompt text exactly", "another", "reply"),     // exact dup of 12
      (14L, long1, "fine answer", "poor answer"),
      (15L, long2, "one more", "other one"),                       // near dup of 14
      (16L, "ask about turbine cooperatives in the region", "x", "y"), // contaminated
      (17L, "a perfectly clean unique prompt nothing shares", "good", "bad"))
      .toDF("doc_id", "prompt", "chosen", "rejected")
    val benchmark = Dedup.shingleSets(
      pairs.filter(col("doc_id") < 10), "doc_id", "prompt", 3)
      .persistTracked().select(explode(col("sh")).as("sh"))
    val out = Preference.prepPairs(pairs, "doc_id", "prompt", "chosen",
        "rejected", benchmark, nGram = 3, threshold = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (out(id).getBoolean(1), out(id).getBoolean(2),
      out(id).getBoolean(3), out(id).getBoolean(4), out(id).getBoolean(5),
      out(id).getBoolean(8))
    // (empty, degenerate, exact_dup, near_dup, contaminated, keep)
    assert(flags(10L) == ((false, true, false, false, false, false)))
    assert(flags(11L) == ((true, false, false, false, false, false)))
    assert(flags(12L) == ((false, false, false, false, false, true)))
    assert(flags(13L)._3 && !flags(13L)._6, s"exact dup: ${flags(13L)}")
    assert(flags(14L) == ((false, false, false, false, false, true)))
    assert(flags(15L)._4 && !flags(15L)._6, s"near dup: ${flags(15L)}")
    assert(flags(16L)._5 && !flags(16L)._6, s"contaminated: ${flags(16L)}")
    assert(flags(17L) == ((false, false, false, false, false, true)))
    // renders are the exact ChatML layout for both branches
    assert(out(17L).getString(6) ==
      "<|im_start|>user\na perfectly clean unique prompt nothing shares" +
      "<|im_end|>\n<|im_start|>assistant\ngood<|im_end|>\n")
    assert(out(17L).getString(7).endsWith("assistant\nbad<|im_end|>\n"))
    // a NULL-prompt pair stays in the audit (never silently dropped)
    val withNull = pairs.unionByName(spark.sql(
      "SELECT 18L AS doc_id, cast(null as string) AS prompt, " +
        "'c' AS chosen, 'r' AS rejected"))
    val audited = Preference.prepPairs(withNull, "doc_id", "prompt",
        "chosen", "rejected", benchmark, nGram = 3, threshold = 0.4)
      .collect().map(r => r.getLong(0)).toSet
    assert(audited.contains(18L), s"null-prompt pair dropped: $audited")
    CacheLedger.drain()
  }

  test("priority index: fold == rebuild, screen semantics, loud foreign/oversize failures") {
    import spark.implicits._
    val corpusA = Seq((2L, "shared", 2L), (4L, "corpus only", 1L))
      .toDF("doc_id", "text", "priority")
    val corpusB = Seq((6L, "shared", 3L), (8L, "late better", 2L))
      .toDF("doc_id", "text", "priority")
    val batch = Seq(
      (11L, "shared", 0L),      // batch brings a MORE trusted copy -> wins
      (13L, "corpus only", 3L), // corpus copy more trusted -> loses
      (15L, "brand new", 2L),   // unseen text -> wins, n_corpus 0
      (17L, "late better", 1L)) // beats the FOLDED snapshot's copy
      .toDF("doc_id", "text", "priority")
    val dir = java.nio.file.Files.createTempDirectory("prio_idx_").toString
    Dedup.savePriorityIndex(corpusA, "doc_id", "text", "priority", 3L, s"$dir/f")
    Dedup.mergeIntoPriorityIndex(corpusB, s"$dir/f", "doc_id", "text", "priority")
    Dedup.savePriorityIndex(corpusA.union(corpusB), "doc_id", "text",
      "priority", 3L, s"$dir/r")
    def screen(p: String) =
      Dedup.priorityAgainstIndex(batch, p, "doc_id", "text", "priority")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6)))).toMap
    val folded = screen(s"$dir/f")
    assert(folded == screen(s"$dir/r"), "fold != rebuild")
    assert(folded(11L) == ((11L, 0L, 2L, 3L, true)))  // wins over prio 2 and 3
    assert(folded(13L) == ((4L, 1L, 1L, 2L, false)))  // corpus prio 1 holds
    assert(folded(15L) == ((15L, 2L, 0L, 1L, true)))  // unseen
    assert(folded(17L) == ((17L, 1L, 1L, 2L, true)))  // beats folded snapshot
    // bucketed layout (r13): identical screen relation, fold through
    // the catalog table, Bucketed: true scan, plain merge refuses
    Dedup.savePriorityIndexBucketed(corpusA, "doc_id", "text", "priority",
      3L, s"$dir/bk", nBuckets = 8, tablePrefix = "t_pr")
    Dedup.mergeIntoPriorityIndexBucketed(corpusB, s"$dir/bk", "doc_id",
      "text", "priority", tablePrefix = "t_pr")
    def screenBk() =
      Dedup.priorityAgainstIndexBucketed(batch, s"$dir/bk", "doc_id",
          "text", "priority", tablePrefix = "t_pr")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6)))).toMap
    assert(screenBk() == folded, "bucketed priority screen diverged")
    // bloom sidecar (r13): identical relation; stale-after-fold fails
    Dedup.buildPriorityBloom(spark, s"$dir/f", expectedItems = 1000L)
    def screenBloom() =
      Dedup.priorityAgainstIndexBloom(batch, s"$dir/f", "doc_id",
          "text", "priority")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getBoolean(6)))).toMap
    assert(screenBloom() == folded, "bloom priority screen diverged")
    Dedup.mergeIntoPriorityIndex(corpusB, s"$dir/f", "doc_id", "text",
      "priority")
    val eStale = intercept[IllegalArgumentException] { screenBloom() }
    assert(eStale.getMessage.contains("re-run buildPriorityBloom"),
      eStale.getMessage)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dedup.priorityAgainstIndexBucketed(batch, s"$dir/bk",
          "doc_id", "text", "priority", tablePrefix = "t_pr")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"stored side must scan bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    val eBk = intercept[IllegalArgumentException] {
      Dedup.mergeIntoPriorityIndex(corpusB, s"$dir/bk", "doc_id", "text",
        "priority")
    }
    assert(eBk.getMessage.contains("BUCKETED layout"), eBk.getMessage)
    // loud failures: bitmask ceiling, foreign family
    intercept[IllegalArgumentException] {
      Dedup.savePriorityIndex(corpusA, "doc_id", "text", "priority", 63L,
        s"$dir/too_wide")
    }
    Dedup.saveExactIndex(corpusA, "doc_id", "text", s"$dir/exact")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadPriorityIndex(spark, s"$dir/exact")
    }
    assert(e.getMessage.contains("not priority_md5"), e.getMessage)
  }

  test("robotsFilter: RFC 9309 longest-match + allow-tie semantics, hand-checked") {
    import spark.implicits._
    val rules = Seq(
      ("site1.example.org", "/private", false),
      ("site1.example.org", "/private/ok", true),
      ("site1.example.org", "/pub", false),
      ("site1.example.org", "/pub", true),
      ("site0.example.org", "/", false),
      ("site0.example.org", "/private", false),
      ("site0.example.org", "/private/ok", true))
      .toDF("host", "path_prefix", "allow")
    val docs = Seq(
      (1L, "https://site5.example.org/p1"), // unlisted host
      (2L, "https://site1.example.org/private/x"), // disallowed
      (3L, "https://site1.example.org/private/ok/x"), // longest re-allows
      (4L, "https://site1.example.org/pub/x"), // specificity tie -> allow
      (5L, "https://site0.example.org/anything"), // root disallow
      (6L, "https://site0.example.org/private/ok/x"), // 3 matches, longest allows
      (7L, "HTTPS://SITE1.EXAMPLE.ORG/private/x"), // host case-folded
      (8L, "https://site1.example.org"), // empty path -> "/", no rule
      (9L, "https://site0.example.org"), // empty path -> "/" root disallow
      (10L, "https://site1.example.org/private?x=1")) // query in match scope
      .toDF("doc_id", "url")
    val out = UrlOps.robotsFilter(docs, "doc_id", "url", rules)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq
    assert(out == Seq(
      (1L, "site5.example.org", 0L, -1L, true),
      (2L, "site1.example.org", 1L, 8L, false),
      (3L, "site1.example.org", 2L, 11L, true),
      (4L, "site1.example.org", 2L, 4L, true),
      (5L, "site0.example.org", 1L, 1L, false),
      (6L, "site0.example.org", 3L, 11L, true),
      (7L, "site1.example.org", 1L, 8L, false),
      (8L, "site1.example.org", 0L, -1L, true),
      (9L, "site0.example.org", 1L, 1L, false),
      (10L, "site1.example.org", 1L, 8L, false)), out.mkString("\n"))
    // a wildcard rule fails loudly by name, never silently prefix-matches
    val wild = Seq(("site1.example.org", "/a/*/b", false))
      .toDF("host", "path_prefix", "allow")
    val e = intercept[Exception] {
      UrlOps.robotsFilter(docs, "doc_id", "url", wild).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("wildcard rule"), chain(e))
  }

  test("parseRobotsTxt: RFC 9309 group/tier semantics; composes into robotsFilter") {
    import spark.implicits._
    val robots = Seq(
      // star group + comments + ignored fields
      ("a.org", "# policy\nUser-agent: *\nDisallow: /private\n" +
        "Allow: /private/ok\nCrawl-delay: 5\nSitemap: https://a.org/s.xml\n"),
      // exact agent group beats the root-disallow star group
      ("b.org", "User-agent: graftbot\nDisallow: /secret\n\n" +
        "User-agent: *\nDisallow: /\n"),
      // multi-agent header; orphan rule before any group dropped;
      // case/spacing variants; empty Disallow carries no rule
      ("c.org", "Disallow: /orphan\nUser-agent: graftbot\n" +
        "User-agent: otherbot\nDISALLOW : /x\nDisallow:\n"),
      // foreign-agent-only file: nothing applies
      ("d.org", "User-agent: somebot\nDisallow: /\n"))
      .toDF("host", "body")
    val rules = UrlOps.parseRobotsTxt(robots, "host", "body", "GraftBot")
    val got = rules.orderBy("host", "path_prefix")
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .toSeq
    assert(got == Seq(
      ("a.org", "/private", false), ("a.org", "/private/ok", true),
      ("b.org", "/secret", false), ("c.org", "/x", false)), got.mkString("\n"))
    // the full REP loop: parsed rules feed the matcher
    val docs = Seq(
      (1L, "https://a.org/private/ok/page"), // re-allowed by longest match
      (2L, "https://b.org/public"), // star group did NOT apply
      (3L, "https://b.org/secret/x"), // the exact group's rule did
      (4L, "https://d.org/anything")) // no applicable rules at all
      .toDF("doc_id", "url")
    val verdicts = UrlOps.robotsFilter(docs, "doc_id", "url", rules)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(4)))
      .toSeq
    assert(verdicts == Seq((1L, true), (2L, true), (3L, false), (4L, true)),
      verdicts.mkString("\n"))
  }

  test("robotsVerdict == robotsFilter row-for-row; wildcard rejected at build") {
    import spark.implicits._
    val rules = Seq(
      ("site1.example.org", "/private", false),
      ("site1.example.org", "/private/ok", true),
      ("site1.example.org", "/pub", false),
      ("site1.example.org", "/pub", true),
      ("site0.example.org", "/", false))
    val docs = (0L until 200L).toDF("doc_id")
      .selectExpr("doc_id",
        "concat('https://site', cast(doc_id % 3 as string), '.example.org'," +
          " case when doc_id % 4 = 0 then concat('/private/p', doc_id)" +
          " when doc_id % 4 = 1 then concat('/private/ok/p', doc_id)" +
          " when doc_id % 4 = 2 then concat('/pub/p', doc_id)" +
          " else concat('/p', doc_id) end) as url")
    val viaJoin = UrlOps.robotsFilter(docs, "doc_id", "url",
      rules.toDF("host", "path_prefix", "allow"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val viaLit = UrlOps.robotsVerdict(docs, "doc_id", "url", rules)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaJoin == viaLit)
    val e = intercept[IllegalArgumentException] {
      UrlOps.robotsVerdict(docs, "doc_id", "url",
        Seq(("a.org", "/x/*", false)))
    }
    assert(e.getMessage.contains("wildcard"), e.getMessage)
  }

  test("flattenThreads: branches, varied depths, loud dangling/cycle/over-depth") {
    import spark.implicits._
    val msgs = Seq(
      (10L, None, "user", "hi"),
      (11L, Some(10L), "assistant", "hello"),
      (12L, Some(11L), "user", "branch-a"),
      (13L, Some(11L), "user", "branch-b"),
      (14L, Some(13L), "assistant", "deep"),
      (20L, None, "user", "solo"))
      .toDF("id", "parent", "role", "content")
    val out = Preference.flattenThreads(msgs, "id", "parent", "role",
      "content", maxDepth = 8)
      .orderBy("leaf_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[String](5)))
      .toSeq
    assert(out == Seq(
      (12L, 10L, 3L, Seq(10L, 11L, 12L), Seq("hi", "hello", "branch-a")),
      (14L, 10L, 4L, Seq(10L, 11L, 13L, 14L),
        Seq("hi", "hello", "branch-b", "deep")),
      (20L, 20L, 1L, Seq(20L), Seq("solo"))), out.mkString("\n"))
    // composes into the ChatML renderer (the p128 contract)
    val rendered = Preference.flattenThreads(msgs, "id", "parent", "role",
        "content", maxDepth = 8)
      .filter(col("leaf_id") === 12L)
      .select(TextOps.renderChatML(zip_with(col("roles"), col("contents"),
        (r, c) => struct(r.as("role"), c.as("content")))).as("r"))
      .collect().head.getStruct(0).getString(0)
    assert(rendered ==
      "<|im_start|>user\nhi<|im_end|>\n" +
        "<|im_start|>assistant\nhello<|im_end|>\n" +
        "<|im_start|>user\nbranch-a<|im_end|>\n", rendered)
    // dangling parent: named count, fails before any traversal
    val dangling = Seq((1L, Some(99L), "user", "x"))
      .toDF("id", "parent", "role", "content")
    val e1 = intercept[IllegalArgumentException] {
      Preference.flattenThreads(dangling, "id", "parent", "role", "content")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
    // a parent cycle can never flatten — loud, names the cause
    val cycle = Seq((1L, Some(2L), "user", "a"), (2L, Some(1L), "user", "b"))
      .toDF("id", "parent", "role", "content")
    val e2 = intercept[IllegalArgumentException] {
      Preference.flattenThreads(cycle, "id", "parent", "role", "content",
        maxDepth = 4)
    }
    assert(e2.getMessage.contains("cycle"), e2.getMessage)
    // depth just past the budget is equally loud
    val chain = (1L to 5L).map(i =>
      (i, if (i == 1L) None else Some(i - 1L), "user", s"m$i"))
      .toDF("id", "parent", "role", "content")
    val e3 = intercept[IllegalArgumentException] {
      Preference.flattenThreads(chain, "id", "parent", "role", "content",
        maxDepth = 4)
    }
    assert(e3.getMessage.contains("maxDepth=4"), e3.getMessage)
    // and the same chain under an adequate budget flattens fine
    val ok = Preference.flattenThreads(chain, "id", "parent", "role",
      "content", maxDepth = 8).collect()
    assert(ok.length == 1 && ok.head.getLong(2) == 5L)
  }

  test("clusterConsistentSplit: near-dup clusters never straddle splits; singletons keep the p24 draw") {
    import spark.implicits._
    // three identical-text clusters of 4 + unique singletons
    val docs = (0L until 60L).map { i =>
      val text = if (i < 12L)
        s"shared duplicate corpus text block number ${i / 4} " * 6
      else (0 until 12).map(k => s"w${i}x$k").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val out = Sampling.clusterConsistentSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(out.length == 60)
    // every cluster member carries the representative's key and split
    for (c <- 0 until 3) {
      val members = out.filter(t => t._1 >= c * 4 && t._1 < (c + 1) * 4)
      assert(members.map(_._2).distinct == Seq(c * 4L),
        s"cluster $c keys: $members")
      assert(members.map(_._4).distinct.size == 1,
        s"cluster $c straddles splits: $members")
    }
    // singletons: split_key is the id itself and the draw matches p24's
    val plain = Sampling.holdoutSplit(docs.filter(col("doc_id") >= 12),
      "doc_id").select(col("doc_id"), col("bucket"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val singles = out.filter(_._1 >= 12L)
      .map(t => (t._1, t._3, t._4)).toSet
    assert(out.filter(_._1 >= 12L).forall(t => t._1 == t._2))
    assert(singles == plain)
  }

  test("deleteFromExactIndex: delete == rebuild modulo NULLed winners; screens honest; loud misuse") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val corpus = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"), // winner 1
      (4L, "beta"), (5L, "beta"), // winner 4
      (6L, "gamma"), (7L, "delta")) // singletons
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("idxdel").toString
    Dedup.saveExactIndex(corpus, "doc_id", "text", s"$dir/idx")
    // delete alpha's WINNER (1), a beta non-winner (5), ALL of delta (7)
    Dedup.deleteFromExactIndex(
      corpus.filter(col("doc_id").isin(1L, 5L, 7L)),
      s"$dir/idx", s"$dir/idx2", "doc_id", "text")
    val got = Dedup.loadExactIndex(spark, s"$dir/idx2")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .toSet
    assert(got == Set(
      (md5hex("alpha"), None, 2L), // winner forgotten, copies remain
      (md5hex("beta"), Some(4L), 1L), // winner retained, count shrunk
      (md5hex("gamma"), Some(6L), 1L))) // fully-deleted delta is GONE
    // the screen stays honest: an arriving copy of winner-less content
    // is a duplicate (keep=false, keep_id NULL); forgotten content
    // screens as new; untouched content keeps the stored winner
    val screen = Dedup.exactAgainstIndex(
      Seq((100L, "alpha"), (101L, "delta"), (102L, "beta"))
        .toDF("doc_id", "text"), s"$dir/idx2", "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(screen == Set(
      (100L, None, 2L, false),
      (101L, Some(101L), 0L, true),
      (102L, Some(4L), 1L, false)), screen)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    // deleting content the index never saw is loud
    val e1 = intercept[Exception] {
      Dedup.deleteFromExactIndex(Seq((9L, "zeta")).toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/idx3", "doc_id", "text")
    }
    assert(chain(e1).contains("never saw"), chain(e1))
    // deleting more copies than the index holds is loud
    val e2 = intercept[Exception] {
      Dedup.deleteFromExactIndex(
        Seq((6L, "gamma"), (8L, "gamma")).toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/idx4", "doc_id", "text")
    }
    assert(chain(e2).contains("more copies"), chain(e2))
    // duplicate ids in the delete list are loud
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromExactIndex(
        Seq((1L, "alpha"), (1L, "alpha")).toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/idx5", "doc_id", "text")
    }
    assert(e3.getMessage.contains("duplicate ids"), e3.getMessage)
    // in-place rewrite is refused
    val e4 = intercept[IllegalArgumentException] {
      Dedup.deleteFromExactIndex(corpus.limit(1), s"$dir/idx",
        s"$dir/idx", "doc_id", "text")
    }
    assert(e4.getMessage.contains("half-rewritten"), e4.getMessage)
  }

  test("deleteFromLineIndex: counts shrink, deleted winners NULL, forgotten keys screen as new") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "footer\nonly-in-one"),
      (2L, "footer\nuniq-two"),
      (3L, "footer\nuniq-three"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("linedel").toString
    Dedup.saveLineIndex(corpus, "doc_id", "text", s"$dir/idx")
    // delete doc 1: footer winner (doc 1, pos 0) is gone, count shrinks;
    // 'only-in-one' is fully forgotten
    Dedup.deleteFromLineIndex(corpus.filter(col("doc_id") === 1),
      s"$dir/idx", s"$dir/idx2", "doc_id", "text")
    val got = Dedup.loadLineIndex(spark, s"$dir/idx2")
      .collect().map(r => (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))).toSet
    assert(got == Set(
      (None, None, 2L), // footer: winner deleted, 2 copies remain
      (Some(2L), Some(1L), 1L), // uniq-two
      (Some(3L), Some(1L), 1L)), got) // uniq-three
    // a new doc re-carrying the forgotten line passes the screen
    // verbatim; the footer still dies (key existence is what serves)
    val screened = Dedup.linesAgainstIndex(
      Seq((9L, "footer\nonly-in-one")).toDF("doc_id", "text"),
      s"$dir/idx2", "doc_id", "text")
      .collect().map(r => r.getString(1)).toSeq
    assert(screened == Seq("only-in-one"), screened)
    // over-delete is loud (two docs claim the one remaining footer+line)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val e = intercept[Exception] {
      Dedup.deleteFromLineIndex(
        Seq((8L, "never-indexed-line")).toDF("doc_id", "text"),
        s"$dir/idx2", s"$dir/idx3", "doc_id", "text")
    }
    assert(chain(e).contains("never saw"), chain(e))
  }

  test("deleteFromMinhashIndex: deleted index serves as a retained rebuild; loud misuse") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val text = if (i % 10 <= 1) s"shared near dup text block ${i / 10} " * 8
        else (0 until 12).map(k => s"t${i}x$k").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mhdel").toString
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(docs, "doc_id", "text", n = 3, k = 32, bands = 8),
      s"$dir/idx", n = 3)
    Dedup.deleteFromMinhashIndex(
      docs.filter(col("doc_id") % 4 === 0).select("doc_id"),
      s"$dir/idx", s"$dir/idx2", "doc_id")
    // the deleted index is EXACTLY an index of the retained corpus:
    // identical screen verdicts on a batch of planted near-dups
    Dedup.saveMinhashIndex(
      Dedup.minhashIndex(docs.filter(col("doc_id") % 4 =!= 0),
        "doc_id", "text", n = 3, k = 32, bands = 8),
      s"$dir/idxR", n = 3)
    val batch = Seq(
      (100L, "shared near dup text block 0 " * 8),
      (101L, "shared near dup text block 2 " * 8)).toDF("doc_id", "text")
    def screen(p: String) = Dedup.nearDupAgainstIndex(
      batch, p, "doc_id", "text", threshold = 0.4)
      .collect().map(_.toSeq.take(2)).toSet
    val a = screen(s"$dir/idx2")
    val b = screen(s"$dir/idxR")
    assert(a == b, s"$a vs $b")
    // docs 0 and 20 (deleted) must be gone; 1 and 21 still pair
    assert(!a.exists(r => r.contains(0L) || r.contains(20L)), a)
    assert(a.exists(_.contains(1L)) && a.exists(_.contains(21L)), a)
    // loud misuse
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromMinhashIndex(Seq(999L).toDF("doc_id"),
        s"$dir/idx2", s"$dir/idx3", "doc_id")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.deleteFromMinhashIndex(Seq(1L, 1L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx4", "doc_id")
    }
    assert(e2.getMessage.contains("duplicate ids"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromMinhashIndex(Seq(1L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx", "doc_id")
    }
    assert(e3.getMessage.contains("half-rewritten"), e3.getMessage)
  }

  test("deleteFromCosineIndex: deleted index serves as a retained rebuild; loud misuse") {
    import spark.implicits._
    // three planted near-identical pairs (i, i+1) at i % 10 == 0
    val vecs = (0 until 30).map { i =>
      val v = if (i % 10 <= 1)
        Array.tabulate(8)(d => math.sin((i / 10) * 7.0 + d * 1.3))
      else Array.tabulate(8)(d => math.cos(i * 3.7 + d * 0.9))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("cosdel").toString
    Similarity.saveCosineIndex(vecs, s"$dir/idx",
      tables = 16, planesPerTable = 8, dim = 8)
    Similarity.deleteFromCosineIndex(
      vecs.filter(col("vec_id") % 4 === 0).select("vec_id"),
      s"$dir/idx", s"$dir/idx2", "vec_id")
    Similarity.saveCosineIndex(vecs.filter(col("vec_id") % 4 =!= 0),
      s"$dir/idxR", tables = 16, planesPerTable = 8, dim = 8)
    val batch = Seq(
      (100L, Array.tabulate(8)(d => math.sin(0 * 7.0 + d * 1.3)).toSeq),
      (101L, Array.tabulate(8)(d => math.sin(2 * 7.0 + d * 1.3)).toSeq))
      .toDF("vec_id", "embedding")
    def screen(p: String) = Similarity.cosineNearDupAgainstIndex(
      batch, p, threshold = 0.9).collect().map(_.toSeq).toSet
    val a = screen(s"$dir/idx2")
    val b = screen(s"$dir/idxR")
    assert(a == b, s"$a vs $b")
    // deleted winners (0, 20) gone; their retained twins (1, 21) pair
    assert(!a.exists(r => r.contains(0L) || r.contains(20L)), a)
    assert(a.exists(_.contains(1L)) && a.exists(_.contains(21L)), a)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.deleteFromCosineIndex(Seq(999L).toDF("vec_id"),
        s"$dir/idx2", s"$dir/idx3", "vec_id")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
  }

  test("priorityGroups: trusted source wins across dup groups; bounds enforced") {
    import spark.implicits._
    val d = Seq(
      (10L, "same text", 2L), (11L, "same text", 0L), (12L, "same text", 0L),
      (20L, "only crawl", 3L),
      (30L, "tie", 1L), (31L, "tie", 1L))
      .toDF("doc_id", "text", "priority")
    val out = Dedup.priorityGroups(d, "doc_id", "text", "priority",
        maxPriority = 3L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set(
      (11L, 0L, 3L, 2L), // min (priority, id): 11 beats 12 (tie) and 10 (prio 2)
      (20L, 3L, 1L, 1L),
      (30L, 1L, 2L, 1L))) // same priority: min id
    val e = intercept[Exception] {
      Dedup.priorityGroups(d.withColumn("priority", col("priority") + 10L),
        "doc_id", "text", "priority", maxPriority = 3L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packing bounds")), e.toString)
  }

  test("deleteFromSignatureIndex: deleted index serves as a retained rebuild; loud misuse") {
    import spark.implicits._
    // planted near-pairs (i, i+1) at i % 10 == 0: one bit flip apart;
    // everything else md5-far
    val sigs = (0L until 30L).map { i =>
      val base = (BigInt(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"sig${i / 10 * 10}".getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString, 16)).toLong & ((1L << 48) - 1)
      val sh = if (i % 10 <= 1) base ^ (if (i % 10 == 1) 1L << (i % 48) else 0L)
        else (BigInt(java.security.MessageDigest.getInstance("MD5")
          .digest(s"far$i".getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString, 16)).toLong & ((1L << 48) - 1)
      (i, sh)
    }.toDF("doc_id", "dhash")
    val dir = java.nio.file.Files.createTempDirectory("sigdel").toString
    Dedup.saveSignatureIndex(sigs, s"$dir/idx", "doc_id", "dhash",
      maxHamming = 4)
    Dedup.deleteFromSignatureIndex(
      sigs.filter(col("doc_id") % 4 === 0).select("doc_id"),
      s"$dir/idx", s"$dir/idx2", "doc_id")
    Dedup.saveSignatureIndex(sigs.filter(col("doc_id") % 4 =!= 0),
      s"$dir/idxR", "doc_id", "dhash", maxHamming = 4)
    val batch = sigs.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 100L).as("doc_id"), col("dhash"))
    def screen(p: String) = Dedup.hammingAgainstIndex(
      batch, p, "doc_id", "dhash").collect().map(_.toSeq.take(2)).toSet
    val a = screen(s"$dir/idx2")
    val b = screen(s"$dir/idxR")
    assert(a == b, s"$a vs $b")
    // deleted pair-partners 0 and 20 are gone; retained 1/10/11/21 pair
    assert(!a.exists(r => r.contains(0L) || r.contains(20L)), a)
    assert(a.exists(_.contains(1L)) && a.exists(_.contains(21L)), a)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromSignatureIndex(Seq(999L).toDF("doc_id"),
        s"$dir/idx2", s"$dir/idx3", "doc_id")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.deleteFromSignatureIndex(Seq(1L, 1L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx4", "doc_id")
    }
    assert(e2.getMessage.contains("duplicate ids"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromSignatureIndex(Seq(1L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx", "doc_id")
    }
    assert(e3.getMessage.contains("half-rewritten"), e3.getMessage)
  }

  test("deleteFromShingleIndex: deleted index serves as a retained rebuild; loud misuse") {
    import spark.implicits._
    val page = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (0L, page), // will be deleted — the excerpt's only source
      (2L, page + " with an extended unique twist ending here"),
      (4L, "completely different content about distributed query engines and shuffles"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shdel").toString
    Dedup.saveShingleIndex(docs, "doc_id", "text", n = 3, s"$dir/idx")
    Dedup.deleteFromShingleIndex(Seq(0L).toDF("doc_id"),
      s"$dir/idx", s"$dir/idx2", "doc_id")
    Dedup.saveShingleIndex(docs.filter(col("doc_id") =!= 0L),
      "doc_id", "text", n = 3, s"$dir/idxR")
    // an excerpt of the shared page: still contained in retained doc 2,
    // no longer reported against deleted doc 0
    val batch = Seq((9L, "quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    def screen(p: String) = Dedup.containmentAgainstIndex(
      batch, p, "doc_id", "text", threshold = 0.8)
      .collect().map(_.toSeq).toSet
    val a = screen(s"$dir/idx2")
    val b = screen(s"$dir/idxR")
    assert(a == b, s"$a vs $b")
    assert(!a.exists(_.contains(0L)), a)
    assert(a.exists(_.contains(2L)), a)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromShingleIndex(Seq(999L).toDF("doc_id"),
        s"$dir/idx2", s"$dir/idx3", "doc_id")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.deleteFromShingleIndex(Seq(2L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx", "doc_id")
    }
    assert(e2.getMessage.contains("half-rewritten"), e2.getMessage)
  }

  test("deleteFromPriorityIndex: monoid subtract, NULLed winners, superset mask; screens honest; loud misuse") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val corpus = Seq(
      (1L, "alpha", 2L), (2L, "alpha", 1L), (3L, "alpha", 3L), // winner 2 (prio 1)
      (4L, "beta", 0L), (5L, "beta", 1L), // winner 4 (prio 0)
      (6L, "gamma", 2L), (7L, "delta", 0L)) // singletons
      .toDF("doc_id", "text", "priority")
    val dir = java.nio.file.Files.createTempDirectory("priodel").toString
    Dedup.savePriorityIndex(corpus, "doc_id", "text", "priority",
      maxPriority = 3L, s"$dir/idx")
    // delete alpha's WINNER (2), a beta non-winner (5), ALL of delta (7)
    Dedup.deleteFromPriorityIndex(
      corpus.filter(col("doc_id").isin(2L, 5L, 7L)),
      s"$dir/idx", s"$dir/idx2", "doc_id", "text", "priority")
    val (idx, _, idBits) = Dedup.loadPriorityIndex(spark, s"$dir/idx2")
    val idMod = 1L << idBits
    val got = idx.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1) % idMod),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      // alpha: winner forgotten, copies remain, mask keeps deleted doc
      // 2's priority-1 bit (the documented non-retractable superset)
      (md5hex("alpha"), None, 2L, (1L << 1) | (1L << 2) | (1L << 3)),
      (md5hex("beta"), Some(4L), 1L, (1L << 0) | (1L << 1)),
      (md5hex("gamma"), Some(6L), 1L, 1L << 2)), got) // delta GONE
    // screens honest: a copy of winner-less alpha reports keep=false
    // with NULL keep_id AND keep_priority; forgotten delta screens as
    // new; beta keeps its stored more-trusted winner
    val screen = Dedup.priorityAgainstIndex(
      Seq((100L, "alpha", 0L), (101L, "delta", 2L), (102L, "beta", 3L))
        .toDF("doc_id", "text", "priority"),
      s"$dir/idx2", "doc_id", "text", "priority")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4), r.getBoolean(6))).toSet
    assert(screen == Set(
      (100L, None, None, 2L, false),
      (101L, Some(101L), Some(2L), 0L, true),
      (102L, Some(4L), Some(0L), 1L, false)), screen)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val e1 = intercept[Exception] {
      Dedup.deleteFromPriorityIndex(
        Seq((9L, "zeta", 0L)).toDF("doc_id", "text", "priority"),
        s"$dir/idx", s"$dir/idx3", "doc_id", "text", "priority")
    }
    assert(chain(e1).contains("never saw"), chain(e1))
    val e2 = intercept[Exception] {
      Dedup.deleteFromPriorityIndex(
        Seq((6L, "gamma", 2L), (8L, "gamma", 0L))
          .toDF("doc_id", "text", "priority"),
        s"$dir/idx", s"$dir/idx4", "doc_id", "text", "priority")
    }
    assert(chain(e2).contains("more copies"), chain(e2))
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromPriorityIndex(
        Seq((2L, "alpha", 1L), (2L, "alpha", 1L))
          .toDF("doc_id", "text", "priority"),
        s"$dir/idx", s"$dir/idx5", "doc_id", "text", "priority")
    }
    assert(e3.getMessage.contains("duplicate ids"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Dedup.deleteFromPriorityIndex(corpus.limit(1), s"$dir/idx",
        s"$dir/idx", "doc_id", "text", "priority")
    }
    assert(e4.getMessage.contains("half-rewritten"), e4.getMessage)
  }

  test("deleteFromChunkIndex: monoid subtract, NULLed firsts; screens serve as a retained rebuild; loud misuse") {
    import spark.implicits._
    val shared = ("the shared paragraph of text that every snapshot keeps " +
      "carrying around verbatim across crawls and re-crawls forever ") * 3
    val corpus = Seq(
      (1L, "doc one unique preamble body text goes here first. " + shared),
      (2L, "doc two other totally different lead-in sentence! " + shared),
      (3L, "doc three standalone content with nothing shared at all " +
        "beyond its own words repeated its own way " * 4))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdcdel").toString
    Dedup.saveChunkIndex(corpus, "doc_id", "text", s"$dir/idx")
    // delete doc 1 — the first occurrence of every shared-region chunk
    Dedup.deleteFromChunkIndex(corpus.filter(col("doc_id") === 1L),
      s"$dir/idx", s"$dir/idx2", "doc_id", "text")
    Dedup.saveChunkIndex(corpus.filter(col("doc_id") =!= 1L),
      "doc_id", "text", s"$dir/idxR")
    val (del, _, _, _, startBits) = Dedup.loadChunkIndex(spark, s"$dir/idx2")
    val (reb, _, _, _, _) = Dedup.loadChunkIndex(spark, s"$dir/idxR")
    val startMod = 1L << startBits
    val delRows = del.collect().map(r => r.getString(0) ->
      ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))))
      .toMap
    val rebRows = reb.collect().map(r =>
      (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // same surviving keys with the same counts as a retained rebuild
    assert(delRows.keySet == rebRows.keySet,
      s"${delRows.keySet.size} vs ${rebRows.keySet.size}")
    delRows.foreach { case (k, (first, cnt)) =>
      assert(cnt == rebRows(k)._2, s"$k: $cnt vs ${rebRows(k)._2}")
      first match {
        // a surviving first must be the rebuild's first (not deleted)
        case Some(f) =>
          assert(f == rebRows(k)._1 && f / startMod != 1L, s"$k")
        // NULLed first ⟺ the rebuild's first occurrence moved off doc 1
        case None => assert(rebRows(k)._1 / startMod != 1L, s"$k")
      }
    }
    // shared chunks survive (docs 2 held copies); doc-1-only chunks gone
    assert(delRows.exists(_._2._1.isEmpty), "expected NULLed firsts")
    // the screen (key existence) is identical to the retained rebuild
    val batch = Seq((9L, "fresh batch doc quoting the shared region: " +
      shared)).toDF("doc_id", "text")
    def screen(p: String) = Dedup.chunksAgainstIndex(
      batch, p, "doc_id", "text").collect().map(_.toSeq).toSet
    assert(screen(s"$dir/idx2") == screen(s"$dir/idxR"))
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val e1 = intercept[Exception] {
      Dedup.deleteFromChunkIndex(
        Seq((9L, "text the index has never chunked before in any form " +
          "or shape with plenty of length to emit chunks " * 3))
          .toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/idx3", "doc_id", "text")
    }
    assert(chain(e1).contains("never saw"), chain(e1))
    val e2 = intercept[Exception] {
      // doc 3's text claimed TWICE — more occurrences than stored
      Dedup.deleteFromChunkIndex(
        corpus.filter(col("doc_id") === 3L)
          .unionByName(corpus.filter(col("doc_id") === 3L)
            .select((col("doc_id") + 5L).as("doc_id"), col("text"))),
        s"$dir/idx", s"$dir/idx4", "doc_id", "text")
    }
    assert(chain(e2).contains("more occurrences"), chain(e2))
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromChunkIndex(corpus.limit(1), s"$dir/idx",
        s"$dir/idx", "doc_id", "text")
    }
    assert(e3.getMessage.contains("half-rewritten"), e3.getMessage)
  }

  test("compact*Index: one row per key, compact == rebuild, NULL winners carry; loud in-place") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha\nfooter", 1L), (2L, "alpha\nfooter", 0L),
      (3L, "beta\nfooter", 2L), (4L, "beta\nfooter", 1L),
      (5L, "gamma\nfooter", 0L))
      .toDF("doc_id", "text", "priority")
    val a = corpus.filter(col("doc_id") <= 2L) // snapshot 1
    val b = corpus.filter(col("doc_id") > 2L) // snapshot 2
    val dir = java.nio.file.Files.createTempDirectory("compact").toString

    // exact: fold doubles the footer-less alpha/beta keys across files
    Dedup.saveExactIndex(a, "doc_id", "text", s"$dir/e")
    Dedup.mergeIntoExactIndex(b, s"$dir/e", "doc_id", "text")
    Dedup.compactExactIndex(spark, s"$dir/e", s"$dir/eC")
    Dedup.saveExactIndex(corpus, "doc_id", "text", s"$dir/eR")
    def rows(p: String) = Dedup.loadExactIndex(spark, p).collect()
      .map(_.toSeq).toSet
    assert(rows(s"$dir/eC") == rows(s"$dir/eR"))
    // compacted = ONE row per key (the rebuild relation is already so)
    assert(Dedup.loadExactIndex(spark, s"$dir/eC").groupBy("content_hash")
      .count().filter(col("count") > 1).count() == 0L)

    // line: the shared footer is the multi-row hot key
    Dedup.saveLineIndex(a, "doc_id", "text", s"$dir/l")
    Dedup.mergeIntoLineIndex(b, s"$dir/l", "doc_id", "text")
    Dedup.compactLineIndex(spark, s"$dir/l", s"$dir/lC")
    Dedup.saveLineIndex(corpus, "doc_id", "text", s"$dir/lR")
    def lrows(p: String) = Dedup.loadLineIndex(spark, p).collect()
      .map(_.toSeq).toSet
    assert(lrows(s"$dir/lC") == lrows(s"$dir/lR"))

    // priority: min-win + mask combine across the fold
    Dedup.savePriorityIndex(a, "doc_id", "text", "priority",
      maxPriority = 3L, s"$dir/p")
    Dedup.mergeIntoPriorityIndex(b, s"$dir/p", "doc_id", "text", "priority")
    Dedup.compactPriorityIndex(spark, s"$dir/p", s"$dir/pC")
    Dedup.savePriorityIndex(corpus, "doc_id", "text", "priority",
      maxPriority = 3L, s"$dir/pR")
    def prows(p: String) = Dedup.loadPriorityIndex(spark, p)._1.collect()
      .map(_.toSeq).toSet
    assert(prows(s"$dir/pC") == prows(s"$dir/pR"))

    // chunk: min-first + cnt combine across the fold
    val longText = ("the compaction paragraph that both snapshots " +
      "carry around verbatim across crawls and re-crawls forever ") * 3
    val ca = Seq((1L, "one lead. " + longText)).toDF("doc_id", "text")
    val cb = Seq((2L, "two other lead! " + longText)).toDF("doc_id", "text")
    Dedup.saveChunkIndex(ca, "doc_id", "text", s"$dir/c")
    Dedup.mergeIntoChunkIndex(cb, s"$dir/c", "doc_id", "text")
    Dedup.compactChunkIndex(spark, s"$dir/c", s"$dir/cC")
    Dedup.saveChunkIndex(ca.unionByName(cb), "doc_id", "text", s"$dir/cR")
    def crows(p: String) = Dedup.loadChunkIndex(spark, p)._1.collect()
      .map(_.toSeq).toSet
    assert(crows(s"$dir/cC") == crows(s"$dir/cR"))

    // a deletion's NULL winner survives compaction (all-NULL stays
    // NULL — there is nothing to re-derive); count intact
    Dedup.deleteFromExactIndex(
      Seq((1L, "alpha\nfooter")).toDF("doc_id", "text"),
      s"$dir/eC", s"$dir/eD", "doc_id", "text")
    Dedup.compactExactIndex(spark, s"$dir/eD", s"$dir/eDC")
    val alphaRow = Dedup.loadExactIndex(spark, s"$dir/eDC")
      .filter(col("keep_id").isNull).collect()
    assert(alphaRow.length == 1 && alphaRow(0).getLong(2) == 1L,
      alphaRow.mkString(","))

    val e1 = intercept[IllegalArgumentException] {
      Dedup.compactExactIndex(spark, s"$dir/e", s"$dir/e")
    }
    assert(e1.getMessage.contains("half-rewritten"), e1.getMessage)
  }

  test("editDistancePairs: symdel blocking == brute force at k=1 and k=2; long keys loud") {
    import spark.implicits._
    // dense near-neighborhood: substitutions, deletions, insertions,
    // a transposition (= 2 edits), identical twins and far strings
    val titles = Seq(
      (0L, "open the pod bay doors"), (1L, "open the pod bay door"),
      (2L, "opun the pod bay doors"), (3L, "open the pod bay doors"),
      (4L, "opne the pod bay doors"), (5L, "completely different"),
      (6L, "xy"), (7L, "xz"), (8L, "x"), (9L, ""))
      .toDF("doc_id", "title")
    def brute(k: Int): Set[(Long, Long, Long)] = {
      val rows = titles.collect().map(r => (r.getLong(0), r.getString(1)))
      (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        d = {
          val m = Array.tabulate(ta.length + 1, tb.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0 }
          for (i <- 1 to ta.length; j <- 1 to tb.length)
            m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
              m(i - 1)(j - 1) + (if (ta(i - 1) == tb(j - 1)) 0 else 1))
          m(ta.length)(tb.length)
        } if d <= k
      } yield (ia, ib, d.toLong)).toSet
    }
    Seq(1, 2).foreach { k =>
      val got = Dedup.editDistancePairs(titles, "doc_id", "title",
        maxEdits = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == brute(k), s"k=$k: got ${got.size}, want ${brute(k).size}")
    }
    // the transposition pair (1,4)... (0,4) is 2 edits: k=1 misses it,
    // k=2 finds it — the planted separation the two runs must show
    assert(!brute(1).exists(p => p._1 == 0L && p._2 == 4L))
    assert(brute(2).exists(p => p._1 == 0L && p._2 == 4L))
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val e = intercept[Exception] {
      Dedup.editDistancePairs(
        Seq((1L, "x" * 300)).toDF("doc_id", "title"),
        "doc_id", "title").collect()
    }
    assert(chain(e).contains("lenCap"), chain(e))
    // NULL titles coalesce to '' (not a bogus over-cap error): two
    // absent keys are identical, a one-char key is one edit away
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "x"), (4L, "unrelated title words"))
      .toDF("doc_id", "title")
    val nullPairs = Dedup.editDistancePairs(withNull, "doc_id", "title")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(nullPairs == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)),
      nullPairs)
  }

  test("winnowFingerprints: reference parity, formatting invariance, guarantee floor") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(text: String, k: Int, w: Int): Set[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k + w - 1) Set.empty
      else {
        val grams = toks.sliding(k).map(g =>
          java.lang.Long.parseLong(
            md5hex(g.mkString(" ")).substring(0, 15), 16)).toArray
        grams.sliding(w).map(_.min).toSet
      }
    }
    val texts = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      // same token stream, hostile formatting — identical fingerprints
      (2L, "  alpha\n\tbeta   gamma\ndelta\t\tepsilon zeta\n eta  theta iota "),
      (3L, "alpha beta gamma delta epsilon zeta eta"), // exactly k+w-1
      (4L, "alpha beta gamma delta epsilon zeta"), // one under the floor
      (5L, "totally different words in this one right here now"))
    val got = Dedup.winnowFingerprints(texts.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty[Long]) == ref(t, 4, 4),
        s"doc $id")
    }
    assert(got(1L) == got(2L)) // formatting invariance
    assert(got(1L).nonEmpty && !got.contains(4L)) // the floor is sharp
    // the paper's guarantee: docs 1 and 3 share a >= k+w-1 token run,
    // so they MUST share at least one fingerprint
    assert(got(1L).intersect(got(3L)).nonEmpty)
    assert(got(1L).intersect(got(5L)).isEmpty)
    // overlap relation finds exactly the sharing pairs at threshold 1
    val pairs = Dedup.winnowOverlap(texts.toDF("doc_id", "text"),
        "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs)
  }

  test("winnow index family: fold == rebuild serve, deletion rebuild-exact, loud misuse") {
    import spark.implicits._
    val snippet = "winnow block seven alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa seven"
    val corpus = Seq(
      (0L, "first page body " + snippet),
      (2L, "second page other body " + snippet),
      (4L, "unrelated page holding plain prose sentences that only " +
        "this page carries onward"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winidx").toString
    // fold: two snapshots must serve as one rebuild
    Dedup.saveWinnowIndex(corpus.filter(col("doc_id") <= 0L),
      "doc_id", "text", s"$dir/idx")
    Dedup.mergeIntoWinnowIndex(corpus.filter(col("doc_id") > 0L),
      s"$dir/idx", "doc_id", "text")
    Dedup.saveWinnowIndex(corpus, "doc_id", "text", s"$dir/idxR")
    val batch = Seq((9L, "arriving doc quoting\t" +
      snippet.split(" ").mkString("\n"))).toDF("doc_id", "text")
    def screen(p: String) = Dedup.winnowAgainstIndex(
      batch, p, "doc_id", "text", minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(screen(s"$dir/idx") == screen(s"$dir/idxR"))
    assert(screen(s"$dir/idx") == Set((9L, 0L), (9L, 2L)))
    // deletion: anti-join rewrite serves as a retained rebuild
    Dedup.deleteFromWinnowIndex(Seq(0L).toDF("doc_id"),
      s"$dir/idx", s"$dir/idx2", "doc_id")
    Dedup.saveWinnowIndex(corpus.filter(col("doc_id") =!= 0L),
      "doc_id", "text", s"$dir/idxR2")
    assert(screen(s"$dir/idx2") == screen(s"$dir/idxR2"))
    assert(screen(s"$dir/idx2") == Set((9L, 2L)))
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromWinnowIndex(Seq(999L).toDF("doc_id"),
        s"$dir/idx2", s"$dir/idx3", "doc_id")
    }
    assert(e1.getMessage.contains("absent"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.deleteFromWinnowIndex(Seq(2L).toDF("doc_id"),
        s"$dir/idx", s"$dir/idx", "doc_id")
    }
    assert(e2.getMessage.contains("half-rewritten"), e2.getMessage)
    // foreign family refused loudly
    val e3 = intercept[IllegalArgumentException] {
      Dedup.loadWinnowIndex(spark, {
        Dedup.saveExactIndex(corpus, "doc_id", "text", s"$dir/foreign")
        s"$dir/foreign"
      })
    }
    assert(e3.getMessage.contains("winnow_h60"), e3.getMessage)
  }

  test("takedownAudit: forgotten / retained-via-others / forgotten-winner all separated") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"),
      (4L, "beta"), (5L, "beta"), (7L, "delta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("audit").toString
    Dedup.saveExactIndex(corpus, "doc_id", "text", s"$dir/idx")
    // delete alpha's winner (1), a beta NON-winner (5), all of delta (7)
    Dedup.deleteFromExactIndex(
      corpus.filter(col("doc_id").isin(1L, 5L, 7L)),
      s"$dir/idx", s"$dir/idx2", "doc_id", "text")
    val got = Dedup.takedownAudit(
      corpus.filter(col("doc_id").isin(1L, 5L, 7L)),
      s"$dir/idx2", "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> ((true, 2L, true)),  // alpha: 2 copies retained, winner gone
      5L -> ((true, 1L, false)), // beta: retained via doc 4, winner intact
      7L -> ((false, 0L, false))), got) // delta fully forgotten
  }
}
