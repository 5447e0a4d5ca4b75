package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline._
import graft.pipeline.CacheLedger.TrackedPersist
import graft.pipeline.TextOps._

/** Training-data pipeline operators exposed as driver-verifiable queries
  * over `documents` / `embeddings`. Every hash is md5-derived so the
  * DuckDB oracle reproduces Spark's values exactly; doubles are rounded
  * identically on both sides.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** The p109/p110 duplicate plant: the test corpus carries no natural
    * exact duplicates, so ids with doc_id%5<2 share 'grp:(doc_id div 4)'
    * as their text — scalar-only (both engines replay it without a
    * join), and the 4-wide grouping makes the duplicate pairs straddle
    * the even/odd corpus/batch split.
    */
  /** The p171 blocklist plant: 400 two-word phrases over the corpus
    * generator's own 30-word vocabulary, picked by pure modular
    * arithmetic so the oracle restates the identical list (the p61
    * generated-constants pattern). Collisions are intended — both
    * sides count DISTINCT listed phrases, so duplicates must collapse
    * identically.
    */
  private lazy val BlockVocab: IndexedSeq[String] = IndexedSeq(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private lazy val BlocklistPhrases: Seq[String] = (0 until 400).map { i =>
    BlockVocab((i * 7 + i / 30) % 30) + " " +
      BlockVocab((i * 11 + 3 * (i / 30) + 5) % 30)
  }

  /** The p174 winnowing plant: each group of 3 docs appends ONE
    * group-unique 14-token snippet in three formattings (spaces /
    * newline+indent / tabs) — the same token stream, so winnowing must
    * pair the members although every byte offset differs. The group
    * id is woven into EVERY OTHER position so every 4-gram contains
    * it: snippet fingerprints stay group-local instead of becoming a
    * corpus-universal df=N key whose self-join is quadratic (the
    * exact hot-fingerprint mode winnowOverlap's maxDf bound exists
    * for — the plant certifies correctness, not the bound).
    */
  private def winnowPlant(d: DataFrame): DataFrame = {
    val lead = (col("doc_id") - col("doc_id") % 3).cast("string")
    val toks = array(lit("winnow"), lead, lit("block"), lead,
      lit("alpha"), lead, lit("beta"), lead, lit("gamma"), lead,
      lit("delta"), lead, lit("epsilon"), lead)
    val snippet = when(col("doc_id") % 3 === 1, concat_ws("\n  ", toks))
      .when(col("doc_id") % 3 === 2, concat_ws("\t\t", toks))
      .otherwise(concat_ws(" ", toks))
    d.select(col("doc_id"), concat(col("text"), lit(" "), snippet).as("text"))
  }

  /** The p173 title plant: groups of 3 docs share a 24-char title;
    * members carry ONE planted char substitution or deletion at
    * position 5.
    */
  private def editdistPlant(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id").as("bid"),
      lower(substring(col("text"), 1, 24)).as("t0"))
    d.select(col("doc_id"))
      .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 1,
          concat(substring(col("t0"), 1, 4), lit("q"),
            substring(col("t0"), 6, 24)))
          .when(col("doc_id") % 3 === 2,
            concat(substring(col("t0"), 1, 4),
              substring(col("t0"), 6, 24)))
          .otherwise(col("t0")).as("title"))
  }

  private def exactPlant(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      when(col("doc_id") % 5 < 2,
        concat(lit("grp:"), expr("doc_id div 4").cast("string")))
        .otherwise(col("text")).as("text"))

  /** Build-once / serve-many for the ANN index queries (p15/p27/p29):
    * the index is persisted via [[AnnIO]] on first use and every
    * invocation serves from the LOADED parquet relations — the shape a
    * 100 TB cluster runs, where an index is trained once and queried for
    * months. Benching build+serve as one number misrepresented the
    * serving path (round-4 verdict); with the cache, bench run 1 pays
    * the build and run 2's serve-only time is what the per-query min
    * reports. Keyed by sf dir + parameters + a layout version so a
    * format change can never serve a stale index.
    */
  /** Cache key component derived from the BUILDER CODE itself: an md5
    * over the classfile bytes of every class on the index-build path
    * (plus this object, which holds the build parameters). Any recompile
    * that changes builder behavior changes the stamp, so a stale index
    * can never silently mask a builder edit — no hand-bumped version
    * constant to forget.
    */
  private def codeStamp(builderClasses: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cl = getClass.getClassLoader
    for (c <- builderClasses) {
      val in = cl.getResourceAsStream(c)
      require(in != null, s"builder classfile $c not found on classpath")
      try {
        val buf = new Array[Byte](8192)
        var r = in.read(buf)
        while (r > 0) { md.update(buf, 0, r); r = in.read(buf) }
      } finally in.close()
    }
    md.digest().map("%02x".format(_)).mkString.take(12)
  }

  private lazy val BuilderCodeStamp: String = codeStamp(Seq(
    "graft/pipeline/Similarity$.class", // pqIndex / ivfIndex / localLloyd
    "graft/pipeline/AnnIO$.class",      // on-disk layout
    "graft/functions/PqEncode.class",
    "graft/functions/PqAdcScore.class",
    "graft/functions/PqLut.class",
    "graft/relational/PipelineQueries$.class")) // build parameters live here

  /** Code stamp for the WRITE-side query artifacts (p96/p100/p101/p103):
    * everything on their build paths, so an engine edit rebuilds.
    */
  private lazy val PipelineCodeStamp: String = codeStamp(Seq(
    "graft/pipeline/Dedup$.class",          // minhash/exact index build
    "graft/pipeline/BucketedTables$.class", // bucketed layout
    "graft/pipeline/Release$.class",        // release export
    "graft/pipeline/BpeByte$.class",        // merge training
    "graft/pipeline/WordPiece$.class",      // vocab recipe
    "graft/pipeline/TokenizerIO$.class",    // tokenizer persistence
    "graft/pipeline/TokenizerFixtures$.class", // external-artifact bytes
    "graft/pipeline/SentencePiece$.class",  // .model parser
    "graft/pipeline/Preference$.class",     // thread flattening
    "graft/pipeline/Similarity$.class",     // cosine index build/delete
    "graft/sources/JsonlCorpus$.class",     // JSONL write
    "graft/relational/PipelineQueries$.class")) // build parameters

  /** Index kinds BUILT (not served from cache) by this JVM — lets Bench
    * report cold/warm per run so BENCH totals are interpretable.
    */
  private val builtKinds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def indexBuildsThisJvm: Set[String] = {
    import scala.jdk.CollectionConverters._
    builtKinds.asScala.toSet
  }
  def resetIndexBuildLog(): Unit = builtKinds.clear()

  private def cachedIndex(dir: String, kind: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    // key on the SOURCE DATA's identity (size + mtime of the embeddings
    // parquet), not just its path — a regenerated file at the same path
    // must rebuild, never serve a stale index. Fail loudly if the
    // single-file layout assumption breaks (a directory-style or renamed
    // parquet would otherwise stamp "0_0" and disable invalidation).
    val src = new java.io.File(s"$dir/embeddings.parquet")
    require(src.isFile,
      s"$dir/embeddings.parquet is not a plain file — index-cache data " +
        "stamping assumes the driver's single-file parquet layout")
    val stamp = s"${src.length()}_${src.lastModified()}"
    s"${System.getProperty("java.io.tmpdir")}/graft_ann_cache_c$BuilderCodeStamp/$safe/${kind}_$stamp"
  }

  private def buildOnce(path: String, kind: String)(
      build: String => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    if (!new java.io.File(s"$path/_built").exists()) {
      // build into a process-unique staging dir, then ATOMIC-rename into
      // place: concurrent builders (another suite, another Bench JVM)
      // each produce a complete artifact, exactly one rename wins, and
      // losers discard their copy — a reader can never observe a
      // half-written index
      val staging =
        s"$path.build.${ProcessHandle.current().pid()}.${System.nanoTime()}"
      builtKinds.add(kind)
      build(staging)
      Files.write(Paths.get(staging, "_built"), Array.emptyByteArray)
      try Files.move(Paths.get(staging), Paths.get(path),
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException =>
          // lost the race — a complete index is already in place
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(new java.io.File(staging))
      }
    }
  }

  private def withIndexCache[T](dir: String, kind: String)(
      build: String => Unit)(load: String => T): T = {
    val path = cachedIndex(dir, kind)
    buildOnce(path, kind)(build)
    load(path)
  }

  /** Build-once for the WRITE-side query artifacts (round-11 ADVICE):
    * p96/p100/p101/p103 must write an artifact their returned plan then
    * reads, but plan CONSTRUCTION must stay cheap — PlanShapeSpec
    * sweeps every registered plan and Verify constructs before running
    * — and the prior per-invocation temp dirs leaked one directory per
    * sweep. Keyed like the ANN cache: builder-code stamp + the source
    * parquet's size/mtime, so an engine edit or regenerated data
    * rebuilds and nothing can serve stale; concurrent builders stage +
    * atomic-rename. Returns the artifact root.
    */
  private def withPipelineArtifact(dir: String, kind: String)(
      build: String => Unit): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val src = new java.io.File(s"$dir/documents.parquet")
    require(src.isFile,
      s"$dir/documents.parquet is not a plain file — artifact data " +
        "stamping assumes the driver's single-file parquet layout")
    val stamp = s"${src.length()}_${src.lastModified()}"
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_pipe_cache_c$PipelineCodeStamp/$safe/${kind}_$stamp"
    buildOnce(path, kind)(build)
    path
  }

  /** Brute-force ground truth for the pinned ANN query set (vec_id < 50,
    * k = 3), shared by every recall certificate (p7/p15/p27/p29). A pure
    * function of the corpus, so it is a build-once artifact like the
    * indexes: recomputing the O(corpus × queries) scan inside every
    * serve would bill the certificate to the serving path (and at
    * 100 TB re-read the whole corpus per query run).
    */
  private def annTruth(s: SparkSession, dir: String): DataFrame =
    withIndexCache(dir, "truth3_q50") { path =>
      val e = emb(s, dir)
      AnnIO.saveTruth(Similarity.bruteForceTopK(
        e, e.filter(col("vec_id") < 50), k = 3), path)
    }(AnnIO.loadTruth(s, _))

  // tokenization prelude shared by the oracle SQL strings
  /** The p83 funnel's gate-passing suffix: five ≥3-word sentences on
    * one line (terminal '.', so the C4 line rule keeps it and counts 5
    * sentences), 44 alpha words carrying all the Gopher stop words.
    */
  private val FunnelPasser =
    "the quick brown fox jumps over the lazy dog today. " +
    "and we keep many solid words here with care. " +
    "that line also ends with a clean period mark. " +
    "have another proper sentence of plain words now. " +
    "with this final sentence the document clearly ends."

  /** p89 main-content thresholds (jusText-family defaults: short-block
    * floor, 20% link-density ceiling) — Scala vals interpolated into
    * BOTH the engine call and the oracle SQL (the FunnelPasser
    * discipline) so the sides cannot drift.
    */
  private val McMinChars = 25
  private val McLinkPct = 20

  private val TOKS =
    raw"""list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x != '')"""

  /** p154's parsed robots rule table (RFC 9309 Allow/Disallow lines),
    * interpolated into BOTH the engine DataFrame and the oracle VALUES
    * (the FunnelPasser discipline): sites 0-4 carry a disallow/
    * re-allow pair under /private plus an allow-wins tie under /pub;
    * site0 additionally a root disallow; sites 5-9 are unlisted.
    */
  private val RobotsRules: Seq[(String, String, Boolean)] =
    (0 to 4).flatMap { h =>
      val host = s"site$h.example.org"
      Seq((host, "/private", false), (host, "/private/ok", true),
        (host, "/pub", false), (host, "/pub", true))
    } :+ ("site0.example.org", "/", false)

  private def robotsRulesValues: String =
    RobotsRules.map { case (h, p, a) => s"('$h', '$p', $a)" }.mkString(", ")

  /** p155's robots.txt bodies (host index % 5 picks one), interpolated
    * into both sides: t0 the plain star group (+ ignored crawl-delay,
    * comments), t1 an exact-agent group overriding a root-disallow
    * star group, t2 a multi-agent header, t3 an orphan rule before any
    * group + case/spacing variants + the empty-Disallow convention,
    * t4 a foreign-agent-only file (no rules apply).
    */
  private val RobotsBodies: Seq[String] = Seq(
    "# corpus crawler policy\nUser-agent: *\nDisallow: /private\n" +
      "Allow: /private/ok\nCrawl-delay: 5\n",
    "User-agent: graftbot\nDisallow: /secret\n\nUser-agent: *\nDisallow: /\n",
    "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /x\n\n" +
      "User-agent: *\nAllow: /x/ok\n",
    "Disallow: /orphan\nUser-agent: *\nDISALLOW : /real\nDisallow:\n",
    "User-agent: somebot\nDisallow: /\n")

  /** DuckDB literal rendering of a body (newlines via chr(10)). */
  private def robotsBodySql(t: String): String =
    t.split("\n", -1).map(l => s"'$l'").mkString(" || chr(10) || ")

  /** p154/p156's planted URL corpus: 10 hosts × 4 path shapes,
    * decorrelated (host from doc_id div 4 so every host sees every
    * path case).
    */
  private def robotsUrlPlant(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      concat(lit("https://site"),
        (expr("doc_id div 4") % 10).cast("string"),
        lit(".example.org"),
        when(col("doc_id") % 4 === 0,
          concat(lit("/private/p"), col("doc_id").cast("string")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("/private/ok/p"), col("doc_id").cast("string")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("/pub/p"), col("doc_id").cast("string")))
          .otherwise(concat(lit("/p"), col("doc_id").cast("string"))))
        .as("url"))

  /** p118's planted texts — 12 variants keyed by doc_id % 12: 0..3
    * machine repetition (ratio ≈ 22‰), 4..7 deterministic high-entropy
    * printable blobs (≈ 834‰, the base64/packed-payload shape), 8..11
    * varied natural prose (≈ 590‰). DuckDB cannot deflate, so the
    * oracle replays the ENGINE-SHARED [[graft.functions.DeflateLen]]
    * helper's exact byte counts for these 12 strings as generated
    * literals (the p61 generated-constants pattern) — zlib at a pinned
    * level is a pure function of the bytes, so the parity is exact.
    */
  private lazy val deflateVariants: Seq[String] = {
    val rep = (0 until 4).map(v => s"buy now item$v click here " * 80)
    val rnd = (0 until 4).map { v =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new StringBuilder
      var seed = s"p118:$v".getBytes("UTF-8")
      while (sb.length < 2048) {
        val h = md.digest(seed)
        h.foreach(b => sb.append((33 + ((b & 0xff) % 94)).toChar))
        seed = sb.takeRight(16).toString.getBytes("UTF-8")
      }
      sb.toString
    }
    val sents = Seq(
      "A quiet survey of the northern valley found thirty potential well sites.",
      "Rainfall charts from the past decade suggest caution before expanding the orchard.",
      "Local carpenters prefer seasoned oak although imported pine arrives faster.",
      "The ferry timetable changes whenever the river drops below two meters.",
      "Students mapped the old quarry and catalogued forty mineral samples.",
      "Evening markets draw larger crowds during the harvest festival weeks.",
      "Engineers proposed a gravel bypass to relieve the stone bridge.",
      "The librarian archived letters describing the flood of eighteen ninety.",
      "Wind measurements on the ridge justify a small turbine cooperative.",
      "Beekeepers reported earlier swarms after the mild winter.")
    val prose = (0 until 4).map(v =>
      s"Report draft number $v follows. " + sents.mkString(" "))
    rep ++ rnd ++ prose
  }

  /** p126's planted texts — 6 variants keyed by doc_id % 8 (ids %8 >= 6
    * keep their real corpus prose): 0..3 are genuine source/config in
    * four syntaxes (all must route to code), 4 is fully-indented poetry
    * (the false-positive probe — indentation alone must NOT cross the
    * threshold), 5 is prose that mentions "import duties" and "return
    * policy" with a parenthetical (the keyword-substring probe). The
    * oracle replays these as escaped SQL literals.
    */
  private lazy val codeVariants: Seq[String] = Seq(
    // python
    "import os\n\ndef walk(root):\n    total = 0\n    for name in os.listdir(root):\n        total = total + 1\n    return total\n\nclass Walker:\n    def run(self):\n        return walk('.')\n",
    // c
    "#include <stdio.h>\n\nint main(int argc, char **argv) {\n    int i;\n    int acc = 0;\n    for (i = 0; i < argc; i++) {\n        acc += i;\n    }\n    printf(\"%d\\n\", acc);\n    return acc;\n}\n",
    // javascript
    "const parts = [];\nfunction join(xs) {\n    let out = '';\n    xs.forEach((x) => {\n        out = out + x;\n    });\n    return out;\n}\nmodule.exports = { join };\n",
    // json config
    "{\n    \"name\": \"pipeline\",\n    \"version\": 3,\n    \"stages\": [\"dedup\", \"filter\"],\n    \"limits\": {\n        \"max_docs\": 1000,\n        \"min_chars\": 25\n    }\n}\n",
    // indented poetry — must stay prose
    "    The river keeps its ledger in the reeds,\n    and every spring it audits what it owes.\n    A heron signs the margin where it feeds,\n    the current carries off the spring overflows.\n    No clerk records the interest on the rain,\n    yet every delta balances again.\n",
    // prose with keyword substrings — must stay prose
    "The committee reviewed import duties on ceramic goods (including tiles and tableware) and agreed to return the draft schedule to the ministry. Their classic function, as one member noted, remains consultative rather than binding, and the printed minutes reflect that consensus.\n")

  /** p128's fixed system prompt (shared by query and oracle). */
  private val ChatSysPrompt = "You are a helpful assistant."

  /** p135's planted shared tails — 7 paragraphs (~200 chars, several
    * expected chunks each) appended by doc_id % 7, so content-defined
    * chunking must find the shared region across docs even though its
    * ABSOLUTE offset differs per doc (the re-sync property a
    * fixed-width chunker lacks). Escaped into the oracle as literals.
    */
  private lazy val cdcParagraphs: Seq[String] = Seq(
    "The committee resolved to publish the annual water survey before the spring thaw, noting that the upstream gauges had been recalibrated twice and that the ferry operators requested earlier notice of any change to the weir schedule.",
    "Visitors to the eastern orchard are reminded that the cider press operates only on market days, that the storage barn remains closed during inspection week, and that surplus crates should be returned to the cooperative by Friday.",
    "According to the harbor master, the dredging barge will work the northern channel first, then the marina approach, and small craft are asked to keep to the marked lane until the depth survey confirms the new soundings.",
    "The library's map room reopened with the restored county atlases on display, and the archivist noted that the flood plates of eighteen ninety draw the most requests, followed by the quarry surveys and the mill ledgers.",
    "Farmers along the ridge road reported that the new culverts held through the heavy rains, though two field gates were silted shut, and the council agreed to schedule the grading crew before the harvest carts arrive.",
    "The evening lecture series continues with a talk on groundwater modeling, preceded by a short demonstration of the observatory's rain gauges and followed by questions from the irrigation board and the well drillers.",
    "Residents near the old tannery are advised that the soil sampling will proceed in marked plots, that results will be posted at the parish hall, and that the orchard boundary fence will be restored once the survey ends.")

  /** p130/p131's synthetic target side: every 2nd vector, mixed with
    * its own reverse (`0.9·v[i] + 0.1·v[n+1−i]`, double arithmetic so
    * the oracle's per-dimension restatement is bit-identical) and
    * re-keyed +100000 — sources with `vec_id % 10 == 0` therefore have
    * a planted high-cosine counterpart, the rest only hubs.
    */
  private def bitextTgt(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 2 === 0).select(
      (col("vec_id") + 100000L).as("vec_id"),
      zip_with(col("embedding"), reverse(col("embedding")),
        (a, b) => a.cast("double") * 0.9 + b.cast("double") * 0.1)
        .as("embedding"))

  /** Shared SQL for the p130/p131 oracles: `pairsFrom` is the FROM
    * clause of the sim relation (`s, t` = all pairs for the exact
    * baseline; the candidate join for the banded form, whose band
    * CTEs — the p111 replay — are prepended via `bandCtes`).
    */
  private def bitextOracleHead(pairsFrom: String): String = {
    val bandCtes =
      if (!pairsFrom.contains("cand")) ""
      else """
         pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                  ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                    % 2001) - 1000) / 1000.0) AS pv
                FROM unnest(generate_series(0, 127)) q(p)),
         u AS (SELECT src_id AS uid, sv AS v, true AS is_src FROM s
               UNION ALL SELECT tgt_id, tv, false FROM t),
         bits AS (SELECT uid, is_src, p // 8 AS band, 1 << (p % 8) AS w,
                    CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                  FROM u, pl),
         bk AS (SELECT uid, is_src, band, sum(bit * w) AS bucket
                FROM bits GROUP BY 1, 2, 3),
         cand AS (SELECT DISTINCT a.uid AS src_id, b.uid AS tgt_id
                  FROM bk a JOIN bk b ON a.band = b.band
                    AND a.bucket = b.bucket AND a.is_src AND NOT b.is_src),"""
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE vec_id % 5 = 0),
         t AS (SELECT vec_id + 100000 AS tgt_id,
             list_transform(generate_series(1, len(v)),
               i -> 0.9 * v[i] + 0.1 * v[len(v) + 1 - i]) AS tv
           FROM e WHERE vec_id % 2 = 0),$bandCtes
         p AS (SELECT src_id, tgt_id,
             CAST(round(list_dot_product(sv, tv) /
               (sqrt(list_dot_product(sv, sv)) * sqrt(list_dot_product(tv, tv)))
               * 1000000.0) AS BIGINT) AS sim_micro
           FROM $pairsFrom),"""
  }

  private val bitextOracleTail: String =
    """
         r AS (SELECT *,
             row_number() OVER (PARTITION BY src_id
               ORDER BY sim_micro DESC, tgt_id) AS rs,
             row_number() OVER (PARTITION BY tgt_id
               ORDER BY sim_micro DESC, src_id) AS rt
           FROM p),
         wx AS (SELECT src_id, CAST(sum(sim_micro) AS BIGINT) AS wx_sum,
             CAST(count(*) AS BIGINT) AS wx_cnt
           FROM r WHERE rs <= 5 GROUP BY 1),
         wy AS (SELECT tgt_id, CAST(sum(sim_micro) AS BIGINT) AS wy_sum,
             CAST(count(*) AS BIGINT) AS wy_cnt
           FROM r WHERE rt <= 5 GROUP BY 1),
         b AS (SELECT src_id, tgt_id, sim_micro FROM r WHERE rs = 1),
         m AS (SELECT b.src_id, b.tgt_id, b.sim_micro, wx.wx_sum, wy.wy_sum,
             wx.wx_cnt, wy.wy_cnt,
             CASE WHEN b.sim_micro >= 0 AND wx.wx_sum + wy.wy_sum > 0
               THEN (b.sim_micro * 1000 * (wx.wx_cnt + wy.wy_cnt))
                 // (wx.wx_sum + wy.wy_sum)
             END AS margin_milli
           FROM b JOIN wx USING (src_id) JOIN wy USING (tgt_id))
       SELECT src_id, tgt_id, sim_micro, wx_sum, wy_sum, wx_cnt, wy_cnt,
         margin_milli,
         coalesce(margin_milli >= 1800, false) AS mined
       FROM m"""

  /** The WordPiece vocab-recipe + greedy-match replay CTE chain shared
    * by the p112 and p134 oracles, ending at `j` = (doc_id, i, pieces).
    */
  private lazy val WpSegCtes: String =
    s"""WITH RECURSIVE toks AS MATERIALIZED (
             SELECT doc_id, $TOKS AS toks FROM documents),
           wAll AS MATERIALIZED (SELECT unnest(toks) AS w FROM toks),
           cnt AS MATERIALIZED (SELECT w, count(*) AS c FROM wAll GROUP BY 1),
           freq AS (SELECT w FROM (SELECT w, row_number()
                      OVER (ORDER BY c DESC, w) r FROM cnt) WHERE r <= 12),
           vocab AS MATERIALIZED (
             SELECT DISTINCT piece FROM (
               SELECT w AS piece FROM freq
               UNION ALL
               SELECT '##' || substr(w, i, l) AS piece
               FROM cnt, LATERAL unnest(generate_series(2, len(w))) t(i),
                    LATERAL unnest(generate_series(1, least(3, len(w) - i + 1))) u(l)
               WHERE len(w) >= 2
               UNION ALL
               SELECT substr(w, 1, 1) AS piece FROM cnt
             )),
           words AS MATERIALIZED (SELECT w AS word FROM cnt),
           positions AS (SELECT word, i AS pos FROM words,
                           LATERAL unnest(generate_series(1, len(word))) t(i)),
           m0 AS (SELECT p.word, p.pos,
                    CASE WHEN p.pos = 1 THEN v.piece
                         ELSE substr(v.piece, 3) END AS bare
                  FROM positions p JOIN vocab v
                    ON (p.pos = 1) = (v.piece NOT LIKE '##%')
                   AND substr(p.word, p.pos, len(CASE WHEN p.pos = 1
                         THEN v.piece ELSE substr(v.piece, 3) END)) =
                       CASE WHEN p.pos = 1 THEN v.piece
                            ELSE substr(v.piece, 3) END),
           best AS MATERIALIZED (SELECT word, pos, bare, len(bare) AS plen
                  FROM (SELECT *, row_number() OVER (PARTITION BY word, pos
                          ORDER BY len(bare) DESC) rn FROM m0) WHERE rn = 1),
           seg AS (
             SELECT word, 1 AS pos, []::VARCHAR[] AS pieces FROM words
             UNION ALL
             SELECT s.word,
               CASE WHEN b.bare IS NULL THEN len(s.word) + 1
                    ELSE s.pos + b.plen END AS pos,
               CASE WHEN b.bare IS NULL THEN ['[UNK]']
                    ELSE list_append(s.pieces, CASE WHEN s.pos = 1
                      THEN b.bare ELSE '##' || b.bare END) END AS pieces
             FROM seg s LEFT JOIN best b ON s.word = b.word AND s.pos = b.pos
             WHERE s.pos <= len(s.word)
           ),
           done AS MATERIALIZED (SELECT word,
                                   CASE WHEN len(word) > 100 THEN ['[UNK]']
                                        ELSE pieces END AS pieces
                                 FROM seg WHERE pos = len(word) + 1),
           ex AS (SELECT doc_id, i, toks[i] AS word FROM toks,
                    LATERAL unnest(generate_series(1, len(toks))) t(i)),
           j AS (SELECT e.doc_id, e.i, d.pieces
                 FROM ex e JOIN done d ON e.word = d.word)"""


  /** The p112 greedy WordPiece walk over the FIXED external vocabulary
    * ([[graft.pipeline.TokenizerFixtures.HfWpPieces]] as literals —
    * the p61 generated-constants pattern): same positions/best/seg
    * recursion as [[WpSegCtes]], with the fixture's own unk token and
    * max_input_chars, so the externally-loaded tokenizer is hash-exact.
    */
  private lazy val WpExternalSegCtes: String = {
    val vocabList = graft.pipeline.TokenizerFixtures.HfWpPieces
      .map(p => s"'$p'").mkString(", ")
    val unk = graft.pipeline.TokenizerFixtures.HfWpUnk
    val maxC = graft.pipeline.TokenizerFixtures.HfWpMaxChars
    s"""WITH RECURSIVE toks AS MATERIALIZED (
             SELECT doc_id, $TOKS AS toks FROM documents),
           vocab AS MATERIALIZED (SELECT unnest([$vocabList]) AS piece),
           words AS MATERIALIZED (
             SELECT DISTINCT unnest(toks) AS word FROM toks),
           positions AS (SELECT word, i AS pos FROM words,
                           LATERAL unnest(generate_series(1, len(word))) t(i)),
           m0 AS (SELECT p.word, p.pos,
                    CASE WHEN p.pos = 1 THEN v.piece
                         ELSE substr(v.piece, 3) END AS bare
                  FROM positions p JOIN vocab v
                    ON (p.pos = 1) = (v.piece NOT LIKE '##%')
                   AND substr(p.word, p.pos, len(CASE WHEN p.pos = 1
                         THEN v.piece ELSE substr(v.piece, 3) END)) =
                       CASE WHEN p.pos = 1 THEN v.piece
                            ELSE substr(v.piece, 3) END),
           best AS MATERIALIZED (SELECT word, pos, bare, len(bare) AS plen
                  FROM (SELECT *, row_number() OVER (PARTITION BY word, pos
                          ORDER BY len(bare) DESC) rn FROM m0) WHERE rn = 1),
           seg AS (
             SELECT word, 1 AS pos, []::VARCHAR[] AS pieces FROM words
             UNION ALL
             SELECT s.word,
               CASE WHEN b.bare IS NULL THEN len(s.word) + 1
                    ELSE s.pos + b.plen END AS pos,
               CASE WHEN b.bare IS NULL THEN ['$unk']
                    ELSE list_append(s.pieces, CASE WHEN s.pos = 1
                      THEN b.bare ELSE '##' || b.bare END) END AS pieces
             FROM seg s LEFT JOIN best b ON s.word = b.word AND s.pos = b.pos
             WHERE s.pos <= len(s.word)
           ),
           done AS MATERIALIZED (SELECT word,
                                   CASE WHEN len(word) > $maxC THEN ['$unk']
                                        ELSE pieces END AS pieces
                                 FROM seg WHERE pos = len(word) + 1),
           ex AS (SELECT doc_id, i, toks[i] AS word FROM toks,
                    LATERAL unnest(generate_series(1, len(toks))) t(i)),
           j AS (SELECT e.doc_id, e.i, d.pieces
                 FROM ex e JOIN done d ON e.word = d.word)"""
  }

  /** The p89 per-block clean chain (tag strip → six-entity decode →
    * whitespace collapse), generated once so the oracle's nesting
    * mirrors `TextOps.mainContentBlocks`' cleanOf token for token.
    */
  private def mcClean(inner: String): String =
    raw"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       regexp_replace(regexp_replace(regexp_replace(regexp_replace($inner,
         '<[^>]+>', ' ', 'g'),
         '&nbsp;', ' ', 'g'),
         '&lt;', '<', 'g'),
         '&gt;', '>', 'g'),
         '&quot;', '"', 'g'),
         '&#39;', '''', 'g'),
         '&amp;', '&', 'g'),
         '[ \t\n\f\r]+', ' ', 'g'))"""
  private val SHINGLES3 =
    s"""CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [] END"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")),

    "p2_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.4)),

    "p3_dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.4)),

    "p4_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(
        docs(s, dir).filter(size(tokens(col("text"))) > 0),
        "doc_id", "text", maxHamming = 5)),

    // banded hyperplane LSH (16 tables × 8 planes), candidates verified
    // with the exact cosine; the oracle mirrors the banding (same
    // md5-derived hyperplanes), so results are hash-exact
    "p5_dedup_embedding" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), threshold = 0.35,
        tables = 16, planesPerTable = 8, dim = 64)),

    // embedding near-dup pairs resolved into duplicate clusters — the
    // p5 banded-LSH pairs (hash-exact) composed with the p14 connected-
    // components machinery, so semantic-dedup canonical selection is
    // oracle-pinned end to end
    "p30_embedding_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Similarity.cosineNearDupPairs(emb(s, dir), threshold = 0.35,
            tables = 16, planesPerTable = 8, dim = 64)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))),

    "p6_ann_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 20), k = 5)),

    // LSH-bucketed ANN — approximate by construction, no SQL oracle;
    // self-certifying instead: per-query recall@3 vs the brute-force
    // truth rides in the output and the query FAILS below the floor
    // (single-probe 4-plane LSH is the low-recall baseline — the floor
    // is correspondingly low; p15/p27/p29 are the quality paths)
    "p7_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 50)
      // probes=2 explores every hamming-1 bucket (5 of 16): measured
      // mean recall 0.427/0.487/0.553 at sf0.001/0.01/0.1 (round 7) vs
      // ~0.13 single-probe. Floor 0.25 sits well under the weakest SF
      // yet 5x the round-6 0.05, which was too loose to catch a real
      // regression (VERDICT r6 item 8)
      Similarity.withRecall(
        Similarity.lshBucketedTopK(e, q, k = 3, nPlanes = 4, dim = 64,
          probes = 2),
        annTruth(s, dir), k = 3, floor = 0.25)
    }),

    // int8-quantized candidate scan + exact rescore — deterministic,
    // so unlike p7/p15 this approximate path IS oracle-checked
    "p21_ann_quantized" -> ((s, dir) =>
      Similarity.quantizedRescoreTopK(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 20), k = 5, m = 10)),

    // product-quantization ANN (PQ8×16 + ADC scan + exact rescore) —
    // k-means codebooks make it approximate-by-construction like
    // p7/p15: rows-only check, recall floor in PipelineSpec
    // serves from the persisted codebook+codes (built once per sf dir)
    "p27_ann_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      val (codebook, codes) = withIndexCache(dir, "pq8x16") { path =>
        // maxIter 5: codebook quality converges fast at ksub=16, and the
        // exact rescore absorbs residual ADC error — half the build passes
        val (cb, cd) = Similarity.pqIndex(e, nSub = 8, ksub = 16, maxIter = 5)
        AnnIO.savePqIndex(cb, cd, path)
      }(AnnIO.loadPqIndex(s, _))
      val q = e.filter(col("vec_id") < 50)
      Similarity.withRecall(
        Similarity.pqTopK(codes, codebook, e, q, k = 3, mCand = 20),
        annTruth(s, dir), k = 3, floor = 0.2)
    }),

    // IVF-PQ composition (FAISS IVFx,PQy shape): probed inverted lists
    // + ADC code scan + exact rescore — equality join only, no theta
    // join; approximate-by-construction, rows-only like p7/p15/p27
    // serves from the persisted index (built once per sf dir); probed
    // lists prune to whole parquet partitions on the loaded code table
    "p29_ann_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      val (cents, codebook, codesL) = withIndexCache(dir, "ivfpq16_8x16") { path =>
        val (cs, cb, cl) = Similarity.ivfPqIndex(e,
          nLists = 16, nSub = 8, ksub = 16, maxIter = 5)
        AnnIO.saveIvfPqIndex(cs, cb, cl, path)
      }(AnnIO.loadIvfPqIndex(s, _))
      val q = e.filter(col("vec_id") < 50)
      Similarity.withRecall(
        Similarity.ivfPqTopK(codesL, cents, codebook, e, q,
          k = 3, mCand = 20, nProbe = 4),
        annTruth(s, dir), k = 3, floor = 0.15)
    }),

    "p8_text_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(bpeishTokens(col("text"))).cast("long").as("n_bpe_tokens"))),

    // corpus vocabulary (BPE-training prep): global top-200 lexer tokens
    // by frequency. orderBy+limit plans TakeOrderedAndProject — each
    // partition keeps its local top-200 and only those merge on the
    // driver; no global sort, no single-partition window
    "p31_vocab_topk" -> ((s, dir) =>
      docs(s, dir).select(explode(bpeishTokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(200)),

    // domain mixing: resample each source to hash-derived target mixture
    // weights — the largest total N s.t. every source can fill its
    // quota, then the quota-k docs per source with the smallest salted
    // hash (deterministic membership, stable under repartitioning).
    // The scalar attaches (sum of weights, N) are one-row broadcast
    // crossJoins on the SOURCE-level frame (~20 rows), like p13's IDF
    "p32_domain_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val w = d.groupBy("source").agg(count(lit(1)).cast("double").as("n"))
        .withColumn("wraw",
          (hash60(concat(lit("mix:"), col("source"))) % 5 + 1).cast("double"))
      val sw = w.agg(sum("wraw").as("sumw"))
      val p = w.crossJoin(broadcast(sw)).withColumn("p", col("wraw") / col("sumw"))
      val bigN = p.agg(floor(min(col("n") / col("p"))).as("ntot"))
      val quota = p.crossJoin(broadcast(bigN))
        .withColumn("k", floor(col("p") * col("ntot")))
        .select("source", "k")
      d.withColumn("rnk", row_number().over(Window.partitionBy("source")
          .orderBy(hash60(concat(lit("mixsel:"), col("doc_id").cast("string"))),
            col("doc_id"))).cast("long"))
        .join(broadcast(quota), Seq("source"))
        .filter(col("rnk") <= col("k"))
        .select(col("doc_id"), col("source"), col("rnk"))
    }),

    "p9_text_quality" -> ((s, dir) => {
      val t = col("text")
      val toks = tokens(t)
      val nChars = length(t).cast("long")
      val nTokens = size(toks).cast("long")
      val sumTokLen = aggregate(
        transform(toks, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
      val nPunct = nChars - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
      val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
      val nUpper = nChars - length(regexp_replace(t, "[A-Z]", ""))
      val stopArr = array(Stopwords.map(lit): _*)
      val nStop = size(filter(toks, x => array_contains(stopArr, x))).cast("long")
      docs(s, dir)
        .withColumn("n_chars", nChars)
        .withColumn("n_tokens", nTokens)
        .withColumn("avg_token_len", ratio(sumTokLen, nTokens))
        .withColumn("punct_ratio", ratio(nPunct, nChars))
        .withColumn("digit_ratio", ratio(nDigit, nChars))
        .withColumn("upper_ratio", ratio(nUpper, nChars))
        .withColumn("stopword_ratio", ratio(nStop, nTokens))
        .withColumn("quality", round(
          least(lit(1.0), col("n_tokens") / lit(100.0)) *
            (lit(1.0) - col("punct_ratio")) * (lit(1.0) - col("digit_ratio")), 6))
        .select("doc_id", "n_chars", "n_tokens", "avg_token_len", "punct_ratio",
          "digit_ratio", "upper_ratio", "stopword_ratio", "quality")
    }),

    "p10_text_langid" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val scores = LangMarkers.map { case (lang, markers) =>
        lang -> markerHits(toks, markers)
      }
      val Seq(en, de, es, fr) = scores.map(_._2)
      docs(s, dir)
        .withColumn("s_en", en).withColumn("s_de", de)
        .withColumn("s_es", es).withColumn("s_fr", fr)
        .withColumn("lang_pred",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
            col("s_en") >= col("s_fr"), "en")
            .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
            .when(col("s_es") >= col("s_fr"), "es")
            .otherwise("fr"))
        .select("doc_id", "s_en", "s_de", "s_es", "s_fr", "lang_pred")
    }),

    "p11_text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))),

    "p12_multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(
        Multimodal.attachMedia(docs(s, dir), "doc_id", "text"))),

    // resize + frame-sample planning over the decoded metadata, exploded
    // to one row per sampled frame so the hash compare sees scalars
    "p22_multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSamplePlan(
          Multimodal.resizePlan(
            Multimodal.decodeFeatures(
              Multimodal.attachMedia(docs(s, dir), "doc_id", "text")),
            maxSide = 256),
          maxFrames = 8)
        .select(col("doc_id"), col("out_width"), col("out_height"),
          round(col("scale"), 6).as("scale"),
          explode(col("sampled_frames")).as("frame_no"))),

    // audio twin of p12: text bytes are never decodable audio, so the
    // oracle pins the fallback dispatch; the REAL javax.sound path is
    // pinned by MultimodalDecodeSpec's synthesized-WAV fixtures
    "p33_audio_decode" -> ((s, dir) =>
      Multimodal.decodeAudioFeatures(
        Multimodal.attachMedia(docs(s, dir), "doc_id", "text"))),

    "p13_text_tfidf" -> ((s, dir) =>
      TfIdf.topTerms(docs(s, dir), "doc_id", "text", k = 3)),

    // pairs → duplicate clusters (connected components by min-label
    // propagation); the oracle walks the same graph with a recursive CTE
    "p14_dedup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.4))),

    // IVF ANN (k-means inverted lists, 4-probe) — approximate by
    // construction like p7; rows-only check, recall floor in PipelineSpec.
    // Serves from the persisted index (built once per sf dir): the
    // timed path is probe + scan, not k-means training.
    "p15_ann_ivf" -> ((s, dir) => {
      val (cents, indexed) = withIndexCache(dir, "ivf16") { path =>
        val (cents0, idx) = Similarity.ivfIndex(emb(s, dir), nLists = 16)
        AnnIO.saveIvfIndex(cents0, idx, path)
      }(AnnIO.loadIvfIndex(s, _))
      val q = emb(s, dir).filter(col("vec_id") < 50)
      Similarity.withRecall(
        Similarity.ivfTopK(indexed, cents, q, k = 3, nProbe = 4,
          "vec_id", "embedding"),
        annTruth(s, dir), k = 3, floor = 0.25)
    }),

    // benchmark decontamination: docs 0-4 stand in for an eval set; any
    // doc sharing a 3-gram with them is flagged with its hit count
    "p17_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val benchmark = Dedup.shingleSets(
        d.filter(col("doc_id") < 5), "doc_id", "text", 3)
        .persistTracked() // barrier against tokenizer-in-lambda inlining
        .select(explode(col("sh")).as("sh"))
      Dedup.contaminationFlags(d.filter(col("doc_id") >= 5),
        "doc_id", "text", benchmark, n = 3)
    }),

    // boilerplate line removal over synthesized multi-line docs (the
    // corpus is single-line, so a shared banner line is planted in every
    // doc — mirrored in the oracle — and must be stripped while unique
    // head/tail lines survive)
    "p16_boilerplate_lines" -> ((s, dir) =>
      Dedup.removeBoilerplateLines(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit("\nshared cookie banner accept all\nDOC-"),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", maxLineDf = 10)),

    // the COMPOSED corpus-cleanup pipeline end-to-end (boilerplate strip
    // → exact dedup → minhash-LSH near-dup clusters → canonical keep),
    // on the same banner-planted corpus as p16; the oracle chains the
    // p16/p1/p3/p14 CTEs so the composition itself is oracle-pinned
    "p18_clean_corpus" -> ((s, dir) =>
      Dedup.cleanCorpus(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit("\nshared cookie banner accept all\nDOC-"),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", maxLineDf = 10, n = 3, k = 32, bands = 8,
        threshold = 0.4)),

    // Gopher/RefinedWeb repetition signals (degenerate-text filters)
    "p19_text_repetition" -> ((s, dir) =>
      Quality.repetitionSignals(docs(s, dir), "doc_id", "text")),

    // PII scrub over a corpus with one planted email/IP/phone per doc
    // (the synthetic corpus carries none; the oracle mirrors the plant)
    "p20_pii_scrub" -> ((s, dir) =>
      Quality.piiScrub(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com from 10.1."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 call 555-123-4567")).as("text")),
        "doc_id", "text")),

    // URL extraction + domain blocklist over planted links: every doc
    // links its shard site, every 5th doc also carries a tracker link
    // that must flip keep=false (the oracle mirrors the plant)
    "p28_url_filter" -> ((s, dir) =>
      Quality.urlFilter(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" visit https://site"),
            (col("doc_id") % 20).cast("string"), lit(".example.org/p"),
            col("doc_id").cast("string"),
            when(col("doc_id") % 5 === 0, lit(" and http://ads.tracker.net/x"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text",
        blockedHosts = Seq("ads.tracker.net", "spam.example.com"))),

    // exact duplicated-span removal (Lee et al. 2022 restated as
    // relational algebra): a 12-word span planted in every doc must
    // survive only at its first (doc_id, pos) occurrence; exact-dup
    // docs in the corpus additionally lose their whole shared prefix
    "p23_span_dedup" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" shared span alpha bravo charlie delta echo foxtrot" +
              " golf hotel india juliett tail-"),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", k = 8)),

    // deterministic hash holdout split (80/10/10 in basis points)
    "p24_split_holdout" -> ((s, dir) =>
      Sampling.holdoutSplit(docs(s, dir), "doc_id")
        .select("doc_id", "bucket", "split")),

    // concatenate-and-chunk sequence packing, 512-token budget, one
    // pack stream per source shard
    "p25_pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(docs(s, dir), "doc_id", "text", "source",
        budget = 512)),

    // round-12: CONTAMINATION-FREE packing (greedy length-descending
    // binning, no doc split unless longer than the context; p25 stays
    // as the concat-and-chunk throughput baseline). The per-shard fold
    // runs over the bounded length histogram, which is why the oracle
    // can replay it as a <= budget-step recursive CTE — hash-exact,
    // unlike any driver-loop packer
    "p117_pack_bfd" -> ((s, dir) =>
      Sampling.packSequencesBinned(docs(s, dir), "doc_id", "text", "source",
        budget = 512)),

    // r13: the packed relation's trainer handoff — per (shard, seq):
    // document-boundary attention spans (the cross-doc attention MASK
    // the "Fewer Truncations" recipe trains with) + fill/waste audit.
    // One bounded hash rollup (groups <= budget pieces by construction)
    "p145_pack_spans" -> ((s, dir) =>
      Sampling.packedSequenceSpans(
        Sampling.packSequencesBinned(docs(s, dir), "doc_id", "text",
          "source", budget = 512),
        "doc_id", "source", budget = 512)),

    // round-12: compression-ratio junk gate beside p84's char entropy —
    // BOTH deflate tails are junk (repetition/templating low, base64/
    // packed payloads high). Planted 12-variant texts keyed by
    // doc_id%12; the oracle replays DeflateLen's exact byte counts as
    // generated literals (p61 pattern) since DuckDB cannot deflate
    "p118_compression_gate" -> ((s, dir) =>
      Quality.compressionGate(
        docs(s, dir).select(col("doc_id"),
          element_at(typedlit(deflateVariants),
            (col("doc_id") % 12 + 1).cast("int")).as("text")),
        "doc_id", "text")),

    // code-vs-prose routing gate: docs with doc_id%8 < 6 carry planted
    // source/config/poetry variants (both classes + the indented-poetry
    // false-positive probe), the rest keep real corpus prose; the
    // oracle replays the plant as escaped literals and restates every
    // milli signal in identical integer arithmetic
    "p126_code_gate" -> ((s, dir) =>
      Quality.codeGate(
        docs(s, dir).select(col("doc_id"),
          when(col("doc_id") % 8 < 6,
            element_at(typedlit(codeVariants),
              (col("doc_id") % 8 + 1).cast("int")))
            .otherwise(col("text")).as("text")),
        "doc_id", "text")),

    // per-host document cap: best 7 docs per source by (score desc,
    // doc_id asc) with the skew-safe packed-TopK aggregate — the oracle
    // is the window-rank form the aggregate provably equals
    "p127_host_cap" -> ((s, dir) =>
      Sampling.hostCap(
        docs(s, dir).select(col("source"), col("doc_id"),
          (col("n_chars") % 1000).as("score")),
        "doc_id", "source", "score", n = 7, maxScore = 999L)),

    // SFT chat-template render: a deterministic 5-turn conversation per
    // doc (system + 2 user/assistant rounds carved from the doc text),
    // rendered ChatML with 0-based assistant loss-span offsets; the
    // oracle restates the closed-form length arithmetic
    "p128_chat_render" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextOps.renderChatML(array(
            struct(lit("system").as("role"),
              lit(ChatSysPrompt).as("content")),
            struct(lit("user").as("role"),
              substring(col("text"), 1, 120).as("content")),
            struct(lit("assistant").as("role"),
              substring(col("text"), 121, 200).as("content")),
            struct(lit("user").as("role"),
              lit("Continue.").as("content")),
            struct(lit("assistant").as("role"),
              substring(col("text"), 321, 160).as("content")))).as("r"))
        .select(col("doc_id"), col("r.rendered").as("rendered"),
          col("r.n_turns").as("n_turns"),
          col("r.assistant_spans").as("assistant_spans"))),

    // chunk→doc embedding pooling in exact integer micros (vec_id%50 as
    // the synthetic doc key), flattened one row per dimension for the
    // driver compare; unit_val is the L2-normalized mean at 6dp
    "p129_embed_pool" -> ((s, dir) =>
      Similarity.meanPoolMicros(
          emb(s, dir).select((col("vec_id") % 50).as("grp"),
            col("embedding")),
          "grp", "embedding")
        .select(col("grp"), col("n_chunks"), col("dim"), col("norm_sq"),
          posexplode(arrays_zip(col("mean_micros"), col("unit")))
            .as(Seq("pos", "z")))
        .select(col("grp"), col("n_chunks"), col("dim"), col("norm_sq"),
          col("pos").cast("long").as("pos"),
          col("z.mean_micros").as("mean_micro"),
          col("z.unit").as("unit_val"))),

    // margin-based bitext mining, EXACT baseline (Artetxe & Schwenk
    // ratio margin in integer milli): src = every 5th vector, tgt =
    // every 2nd vector mixed with its reverse (ids +100000) so srcs
    // with vec_id%10==0 have a planted counterpart at cos≈0.99; the
    // planted margins sit at 2173+ vs <=1493 for hubs, threshold 1800
    "p130_bitext_margin" -> ((s, dir) =>
      Similarity.bitextMarginMine(
        emb(s, dir).filter(col("vec_id") % 5 === 0),
        bitextTgt(emb(s, dir)),
        k = 5, marginMilliMin = 1800L)),

    // the SERVING form: banded hyperplane LSH candidates in front, the
    // margin computed within the candidate graph (the defined
    // semantics, restated by the oracle's band replay — p111 pattern)
    "p131_bitext_margin_lsh" -> ((s, dir) =>
      Similarity.bitextMarginMineBanded(
        emb(s, dir).filter(col("vec_id") % 5 === 0),
        bitextTgt(emb(s, dir)),
        k = 5, marginMilliMin = 1800L)),

    // cross-source priority dedup: the p109 duplicate plant makes the
    // dup groups straddle sources; priority = numeric source suffix
    // mod 4 (smaller = more trusted), winner = min (priority, id)
    "p132_priority_dedup" -> ((s, dir) =>
      Dedup.priorityGroups(
        docs(s, dir).select(col("doc_id"),
          when(col("doc_id") % 5 < 2,
            concat(lit("grp:"), expr("doc_id div 4").cast("string")))
            .otherwise(col("text")).as("text"),
          (substring(col("source"), 4, 10).cast("long") % 4)
            .as("priority")),
        "doc_id", "text", "priority", maxPriority = 3L)),

    // content-defined-chunk dedup (Gear/FastCDC): docs get a shared
    // ~200-char tail by doc_id%7 at a DIFFERENT absolute offset per
    // doc — the rolling-hash chunker re-syncs inside the shared region
    // so its chunks hash-match across docs; per doc, how many chunks /
    // chars already occur earlier in the corpus
    "p135_cdc_dedup" -> ((s, dir) =>
      Dedup.cdcDupChunks(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" "),
            element_at(typedlit(cdcParagraphs),
              (col("doc_id") % 7 + 1).cast("int"))).as("text")),
        "doc_id", "text")),

    // the CDC chunk family's cross-snapshot screen (r13, the
    // crawl-diff loop p135's scaladoc promises): even ids' chunk
    // hashes persist as the stored index with a second snapshot FOLDED
    // IN (so the (min first, sum cnt) monoid combine is inside the
    // certified relation), odd ids screened — shared tails sit at
    // DIFFERENT absolute offsets per doc, so the match only happens
    // because the stored geometry re-syncs the batch's boundaries
    "p138_cdc_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(typedlit(cdcParagraphs),
            (col("doc_id") % 7 + 1).cast("int"))).as("text"))
      val out = withPipelineArtifact(dir, "p138_chunk_idx") { stage =>
        Dedup.saveChunkIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoChunkIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
      }
      Dedup.chunksAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // r13: the chunk family's bucketed backfill — the last cell of the
    // per-family layout matrix (plain/bloom/bucketed × eight families);
    // p138's oracle VERBATIM
    "p151_cdc_backfill" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(typedlit(cdcParagraphs),
            (col("doc_id") % 7 + 1).cast("int"))).as("text"))
      val out = withPipelineArtifact(dir, "p151_chunk_idx_bucketed") { stage =>
        val bp = s"p151_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveChunkIndexBucketed(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx", nBuckets = 8, tablePrefix = bp)
        Dedup.mergeIntoChunkIndexBucketed(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_chunk")
      }
      Dedup.chunksAgainstIndexBucketed(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // cross-snapshot CONTAINMENT screen (r13 — the excerpt/quote
    // question no minhash band can serve: J ≈ n_quote/n_page is
    // invisible at any geometry): even ids' shingle POSTINGS persist
    // as the stored inverted index with a second snapshot FOLDED from
    // %4==2; odd batch docs screen against it — %10==1 batch docs
    // carry a 24-token interior excerpt of their even neighbor, so
    // their shingles are a strict subset and batch-inside-corpus
    // containment must read 1.0
    "p148_containment_screen" -> ((s, dir) => {
      val base = docs(s, dir)
      val evens = base.filter(col("doc_id") % 2 === 0)
      val batch = base.filter(col("doc_id") % 2 === 1)
        .join(evens.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__src")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1,
            concat_ws(" ", slice(tokens(col("__src")), 2, 24)))
            .otherwise(col("text")).as("text"))
      val out = withPipelineArtifact(dir, "p148_shingle_idx") { stage =>
        Dedup.saveShingleIndex(evens.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", n = 3, s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoShingleIndex(evens.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
      }
      Dedup.containmentAgainstIndex(batch, s"$out/idx", "doc_id", "text",
        threshold = 0.8)
    }),

    // r13: the shingle family's bloom fast path and bucketed backfill
    // layout — each must return p148's IDENTICAL relation (oracle
    // verbatim, the established per-family pattern)
    "p149_containment_bloom" -> ((s, dir) => {
      val base = docs(s, dir)
      val evens = base.filter(col("doc_id") % 2 === 0)
      val batch = base.filter(col("doc_id") % 2 === 1)
        .join(evens.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__src")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1,
            concat_ws(" ", slice(tokens(col("__src")), 2, 24)))
            .otherwise(col("text")).as("text"))
      val out = withPipelineArtifact(dir, "p149_shingle_bloom_idx") { stage =>
        Dedup.saveShingleIndex(evens.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", n = 3, s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoShingleIndex(evens.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.buildShingleBloom(s, s"$stage/idx",
          expectedItems = 1000000L, fpp = 0.01)
      }
      Dedup.containmentAgainstIndexBloom(batch, s"$out/idx", "doc_id",
        "text", threshold = 0.8)
    }),

    "p150_containment_backfill" -> ((s, dir) => {
      val base = docs(s, dir)
      val evens = base.filter(col("doc_id") % 2 === 0)
      val batch = base.filter(col("doc_id") % 2 === 1)
        .join(evens.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__src")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1,
            concat_ws(" ", slice(tokens(col("__src")), 2, 24)))
            .otherwise(col("text")).as("text"))
      val out = withPipelineArtifact(dir, "p150_shingle_idx_bucketed") { stage =>
        val bp = s"p150_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveShingleIndexBucketed(evens.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", n = 3, s"$stage/idx", maxDf = 100000,
          nBuckets = 8, tablePrefix = bp)
        Dedup.mergeIntoShingleIndexBucketed(
          evens.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_shingle")
      }
      Dedup.containmentAgainstIndexBucketed(batch, s"$out/idx", "doc_id",
        "text", threshold = 0.8)
    }),

    // r13: the bloom fast path generalized to the two NEW index
    // families. No false negatives ⇒ each relation is IDENTICAL to its
    // plain screen's — the oracles are p133's / p138's VERBATIM
    "p143_priority_bloom_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("grp:"), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("text"),
        (substring(col("source"), 4, 10).cast("long") % 4).as("priority"))
      val out = withPipelineArtifact(dir, "p143_priority_bloom_idx") { stage =>
        Dedup.savePriorityIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", "priority", maxPriority = 3L, s"$stage/idx")
        Dedup.mergeIntoPriorityIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", "priority")
        // sidecar AFTER the fold — stale-stamp discipline
        Dedup.buildPriorityBloom(s, s"$stage/idx",
          expectedItems = 10000L, fpp = 0.01)
      }
      Dedup.priorityAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text", "priority")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("keep_priority"), col("n_corpus"),
          col("n_priorities"), col("keep"))
    }),

    "p144_cdc_bloom_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(typedlit(cdcParagraphs),
            (col("doc_id") % 7 + 1).cast("int"))).as("text"))
      val out = withPipelineArtifact(dir, "p144_chunk_bloom_idx") { stage =>
        Dedup.saveChunkIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoChunkIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.buildChunkBloom(s, s"$stage/idx",
          expectedItems = 100000L, fpp = 0.01)
      }
      Dedup.chunksAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // license/SPDX header gate for the code route (r13): planted
    // SPDX tags, canonical license-text fingerprints, and the
    // false-positive probe — prose that NAME-DROPS licenses ("the MIT
    // license is discussed…", "the Apache license appears…") matches
    // neither the tag nor any fingerprint and must classify none
    "p139_license_gate" -> ((s, dir) => {
      val m = col("doc_id") % 7
      val hdr = when(m === 1, lit("// SPDX-License-Identifier: MIT\n"))
        .when(m === 2, lit("/* Licensed under the Apache License, " +
          "Version 2.0 (the \"License\") */\n"))
        .when(m === 3, lit("// This program is free software: you can " +
          "redistribute it under the terms of the GNU General Public " +
          "License.\n"))
        .when(m === 4, lit("Permission is hereby granted, free of " +
          "charge, to any person obtaining a copy of this software.\n"))
        .when(m === 5, lit("An essay observing that the MIT license is " +
          "discussed in classrooms while the Apache license appears in " +
          "seminars.\n"))
        .when(m === 6, lit("# SPDX-License-Identifier: BSD-3-Clause\n"))
        .otherwise(lit(""))
      Quality.licenseGate(
        docs(s, dir).select(col("doc_id"),
          concat(hdr, col("text")).as("text")),
        "doc_id", "text")
    }),

    // preference-pair (RLHF/DPO) prep (r13): prompts carry the p109
    // exact-dup plant (%5<2 share 'prompt group (id div 4)'), %11==1
    // pairs are degenerate (chosen==rejected), %11==2 have an empty
    // rejected side, prompts of docs<5 stand in for the eval set
    // (their 3-grams contaminate), and the corpus's natural near-dups
    // surface through the p3 minhash banding over prompts
    "p140_preference_pairs" -> ((s, dir) => {
      val d = docs(s, dir)
      val pr = d.select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("prompt group "), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("prompt"),
        substring(col("text"), 10, 200).as("chosen"),
        when(col("doc_id") % 11 === 1, substring(col("text"), 10, 200))
          .when(col("doc_id") % 11 === 2, lit(""))
          .otherwise(substring(col("text"), 50, 200)).as("rejected"))
      val benchmark = Dedup.shingleSets(
        pr.filter(col("doc_id") < 5), "doc_id", "prompt", 3)
        .persistTracked()
        .select(explode(col("sh")).as("sh"))
      Preference.prepPairs(pr, "doc_id", "prompt", "chosen", "rejected",
        benchmark, nGram = 3, threshold = 0.4)
    }),

    // the priority family's cross-snapshot screen: index built from
    // doc_id%4==0, a second snapshot FOLDED IN from %4==2 (so the
    // monoid combine across appended partials is inside the certified
    // relation), odd docs screened — winner and priority census across
    // corpus ∪ batch replayed by the oracle over the union
    "p133_priority_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("grp:"), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("text"),
        (substring(col("source"), 4, 10).cast("long") % 4).as("priority"))
      val out = withPipelineArtifact(dir, "p133_priority_idx") { stage =>
        Dedup.savePriorityIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", "priority", maxPriority = 3L, s"$stage/idx")
        Dedup.mergeIntoPriorityIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", "priority")
      }
      Dedup.priorityAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text", "priority")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("keep_priority"), col("n_corpus"),
          col("n_priorities"), col("keep"))
    }),

    // p133's oracle VERBATIM over the BUCKETED catalog path (the p110
    // precedent, closing the r12 backfill gap for the priority family):
    // stored partials live bucketBy(content_hash) with the fold
    // appended THROUGH the catalog table, so the per-hash combine and
    // the batch semi-join consume the table's own partitioning — zero
    // corpus-side exchanges at any batch size
    "p137_priority_backfill" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("grp:"), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("text"),
        (substring(col("source"), 4, 10).cast("long") % 4).as("priority"))
      val out = withPipelineArtifact(dir, "p137_priority_idx_bucketed") { stage =>
        val bp = s"p137_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.savePriorityIndexBucketed(
          planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", "priority", maxPriority = 3L, s"$stage/idx",
          nBuckets = 8, tablePrefix = bp)
        Dedup.mergeIntoPriorityIndexBucketed(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", "priority", tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_priority")
      }
      Dedup.priorityAgainstIndexBucketed(
          planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text", "priority")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("keep_priority"), col("n_corpus"),
          col("n_priorities"), col("keep"))
    }),

    // deterministic stratified sampling: 50% of en, 25% of de, 10% of
    // every other language
    // training-shard membership (the write path's partition key): pure
    // salted-hash projection, stable under any partitioning
    "p34_shard_assign" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        Sharding.shardId(col("doc_id"), nShards = 8).as("shard"))),

    "p26_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
        .select("doc_id", "lang", "source")),

    // character-level duplicated-substring removal (the Lee et al. '22
    // suffix-array regime p23's 8-token gram floor can't reach): a
    // 37-char / 6-token run — below p23's floor — is planted on every
    // doc, so each doc but the globally first loses it; natural ≥30-char
    // repeats in the corpus are caught the same way. The oracle groups
    // by the actual substring (exact); Spark groups by the 64-bit
    // rolling window hash — identical results absent a hash collision
    // (birthday ≈ w²/2⁶⁵; ~10⁻⁸ at this scale, and deterministic per
    // dataset, not flaky).
    "p35_substring_dedup" -> ((s, dir) =>
      Dedup.removeDuplicateCharSpans(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit(" sub-span golf echo bravo delta wrap-"),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text", minLen = 30)),

    // CCNet-style unigram-LM quality score: mean per-token negative log
    // prob under the corpus-trained smoothed unigram model (the
    // perplexity-proxy filter; Wenzek et al. 2020). One term aggregate,
    // one term join, one one-row broadcast total
    "p36_lm_score" -> ((s, dir) =>
      Quality.lmScore(docs(s, dir), "doc_id", "text")),

    // corpus-wide exact line dedup (RefinedWeb/Dolma line-wise pass):
    // a shared footer line planted on every doc must survive only on
    // the globally-first doc; the per-doc unique line survives
    // everywhere; natural duplicated lines (exact-dup doc bodies)
    // dedupe the same way
    "p37_line_dedup" -> ((s, dir) =>
      Dedup.dedupLines(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit("\nshared footer please subscribe\nuniq-"),
            col("doc_id").cast("string")).as("text")),
        "doc_id", "text")),

    // CCNet head/middle/tail perplexity tertiles over the p36 signal —
    // cutoffs by exact percentile attached as a one-row broadcast (NOT
    // a global ntile sort)
    "p38_lm_buckets" -> ((s, dir) =>
      Quality.lmBuckets(docs(s, dir), "doc_id", "text")),

    // DSIR importance resampling (Xie et al. 2023): hashed
    // unigram+bigram log-ratio score of every non-English doc against
    // the English target distribution, top-20% selected by exact
    // quantile cutoff — deterministic stand-in for Gumbel-top-k
    "p39_dsir_resample" -> ((s, dir) =>
      Dsir.importanceResample(docs(s, dir), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 1024,
        selectFrac = 0.2)),

    // quality-ranked keep-one-per-cluster over the p14 cluster relation:
    // the representative is the LONGEST doc (n_chars; smallest id on
    // ties), not p14's smallest-id convention — the audit-trail output
    // (cluster_id + kept) a RefinedWeb-style pipeline persists
    "p40_cluster_keep" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.keepClusterRepresentatives(d, "doc_id",
        Dedup.duplicateClusters(
          Dedup.minhashLshPairs(d, "doc_id", "text",
            n = 3, k = 32, bands = 8, threshold = 0.4)),
        quality = col("n_chars"))
    }),

    // corpus-duplicated 5-gram coverage per doc (Gopher/RefinedWeb
    // "duplicated n-gram" repetition family at token resolution):
    // position-interval union via one running-max window per doc
    "p41_dup_ngram_coverage" -> ((s, dir) =>
      Quality.dupNgramCoverage(docs(s, dir), "doc_id", "text", k = 5)),

    // embedding-space decontamination: every 50th vector stands in for
    // an eval set; corpus docs within 0.35 cosine of ANY of them are
    // flagged (the paraphrase-robust complement of p17's n-gram overlap)
    "p42_embedding_decontaminate" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.embeddingDecontaminate(
        e.filter(col("vec_id") % 50 =!= 0),
        e.filter(col("vec_id") % 50 === 0), threshold = 0.35)
    }),

    // Gopher appendix-A doc-quality rules over a corpus with planted
    // line structure (the synthetic corpus is single-line): every 3rd
    // doc gains two bullet lines, every 5th an ellipsis line (which
    // also adds the stop words to/be), every 7th a '#'-symbol line —
    // so each rule fires on a known subset (the oracle mirrors the
    // plant, as p16/p20/p28 do)
    "p43_gopher_quality" -> ((s, dir) =>
      Quality.gopherRules(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              lit("\n• planted bullet item\n• second bullet item"))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("\nto be continued..."))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0, lit("\n## ## tag ##"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),

    // C4 §2.2 line/page cleaning rules over planted lines: one proper
    // sentence always survives, every 2nd doc gains four more sentences
    // (crossing the ≥5-sentence page gate), every 7th a javascript
    // line (dropped at line level), every 11th a lorem-ipsum line and
    // every 13th a braced line (page-level drops)
    "p44_c4_filters" -> ((s, dir) =>
      Quality.c4Clean(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit("\nA good closing sentence appears here."),
            when(col("doc_id") % 2 === 0,
              lit("\nOne more fine line here. Another solid sentence follows! Was that enough? \"Quoted words end well.\""))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              lit("\nplease enable javascript to continue viewing"))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0,
              lit("\nlorem ipsum dolor sit amet."))
              .otherwise(lit("")),
            when(col("doc_id") % 13 === 0,
              lit("\nconfig sample { alpha beta }"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),

    // BPE iteration-1 merge candidates: top-50 within-word character
    // pairs by corpus occurrence count, deterministic tie-break
    "p45_bpe_pairs" -> ((s, dir) =>
      Bpe.pairCounts(docs(s, dir), "text", k = 50)),

    // add-one-smoothed bigram LM scoring (order-sensitive complement of
    // p36's unigram proxy): micro-nat integer sums keep both engines
    // bit-equal
    "p46_bigram_lm" -> ((s, dir) =>
      Quality.lm2Score(docs(s, dir), "doc_id", "text")),

    // per-source corpus health report (the dashboard every pipeline
    // maintains): doc/token totals, language spread, and exact-dup
    // incidence per source — one hash-window pass + one aggregate
    "p50_source_report" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val withTok = docs(s, dir).select(col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("nt"),
        md5(col("text")).as("h"))
      val dup = count(lit(1)).over(Window.partitionBy("h")) > 1
      withTok.withColumn("dup", dup)
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("nt").as("total_tokens"),
          round(avg("nt"), 6).as("avg_tokens"),
          countDistinct("lang").as("n_langs"),
          sum(when(col("dup"), lit(1L)).otherwise(lit(0L))).as("n_dup_docs"))
    }),

    // BPE end-to-end: 200 merges trained driver-local on the corpus
    // vocabulary (the one distributed pass is the word-count aggregate —
    // the PQ-codebook size-gated driver-compute pattern), then every
    // token segmented in-plan by the codegen'd BpeSegment expression.
    // Training is iterative (not SQL-replayable) so the driver check is
    // rows-only; the query self-certifies instead: the reconstruction
    // invariant (subwords concatenate back to each token) is asserted
    // in-plan, so a broken merge table fails the query loudly
    // temperature-based language rebalancing at α=0.5 (sqrt is the one
    // IEEE-correctly-rounded power, so quotas are bit-equal on both
    // engines), budget = half the corpus
    "p48_lang_sample" -> ((s, dir) =>
      Sampling.temperatureSample(docs(s, dir), "doc_id", "lang",
        budgetFrac = 0.5)),

    // HTML → text extraction (the Common Crawl ingest step) over docs
    // wrapped in planted page chrome: title, style block, anchor, every
    // 4th doc a script block whose '<'/'&&' must NOT leak into the
    // text, entity-bearing tail (the oracle mirrors the plant)
    "p49_html_extract" -> ((s, dir) => {
      val wrapped = docs(s, dir).select(col("doc_id"),
        concat(lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit("</title><style>p{color:red}</style></head><body><p>"),
          col("text"),
          lit("</p><a href=\"http://site/"), col("doc_id").cast("string"),
          lit("\">more</a>"),
          when(col("doc_id") % 4 === 0,
            lit("<script>var x = 1 < 2 && 3 > 0;</script>"))
            .otherwise(lit("")),
          lit("&amp; tail &lt;ok&gt;</body></html>")).as("html"))
      wrapped.select(col("doc_id"),
        htmlTitle(col("html")).as("title"),
        htmlLinkCount(col("html")).as("n_links"),
        htmlToText(col("html")).as("text_clean"))
    }),

    "p47_bpe_segment" -> ((s, dir) => {
      // r13: the trained merge table is a build-once artifact (the p100
      // rationale, verbatim): repeated plan construction must not
      // re-run the driver-loop trainer, and the persisted form IS the
      // production serve path
      val tokDir = withPipelineArtifact(dir, "p47_bpe200") { stage =>
        TokenizerIO.saveBpe(Bpe.trainMerges(docs(s, dir), "text",
          nMerges = 200, maxWords = 100000), s, s"$stage/bpe")
      }
      val merges = TokenizerIO.loadBpe(s, s"$tokDir/bpe")
        .map(m => (m._2, m._3))
      // r13 optimization: fused codegen serve pass (same kernel, same
      // values — SegmentServeSpec) replaces the interpreted HOF chain
      docs(s, dir).select(col("doc_id"), tokens(col("text")).as("__toks"))
        .withColumn("__st", graft.functions.SegmentServe.bpe(
          col("__toks"), merges, Seq.empty, byteMode = false))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          col("__st.n_segments").as("n_subwords"),
          col("__st.rebuilt_ok").as("rebuilt_ok"))
        .filter(assert_true(col("rebuilt_ok"),
          concat(lit("BPE reconstruction failed for doc "),
            col("doc_id").cast("string"))).isNull)
    }),

    // unigram-LM (SentencePiece) tokenizer: soft-EM training over the
    // capped word dict (driver-local, the p47/BPE shape), Viterbi
    // segmentation as a codegen projection. Rows-only like p47 —
    // training runs in doubles so no SQL oracle replays it — but the
    // in-plan assert pins the segmentation invariant (pieces
    // concatenate back to every token) over the whole corpus
    "p62_unigram_lm" -> ((s, dir) => {
      // maxPieceLen 3 < the corpus's max word length forces genuine
      // SUBWORD segmentation on the 31-word synthetic vocab (at the
      // default 8 every frequent word becomes one piece — correct
      // unigram behavior, but then the query demonstrates nothing)
      // r13: build-once trained-model artifact (the p100/p47 rationale)
      val tokDir = withPipelineArtifact(dir, "p62_unigram120") { stage =>
        TokenizerIO.saveUnigram(Unigram.trainModel(docs(s, dir), "text",
          vocabSize = 120, maxWords = 100000, maxPieceLen = 3),
          s, s"$stage/uni")
      }
      val m = TokenizerIO.loadUnigram(s, s"$tokDir/uni")
      // r13 optimization: fused codegen serve pass (same Viterbi kernel,
      // same values — SegmentServeSpec) replaces the interpreted HOFs
      docs(s, dir).select(col("doc_id"), tokens(col("text")).as("__toks"))
        .withColumn("__st", graft.functions.SegmentServe.unigram(
          col("__toks"), m.pieces, m.unkCostMicro, m.maxPieceLen, ""))
        .select(col("doc_id"),
          size(col("__toks")).cast("long").as("n_tokens"),
          col("__st.n_pieces").as("n_pieces"),
          col("__st.rebuilt_ok").as("rebuilt_ok"))
        .filter(assert_true(col("rebuilt_ok"),
          concat(lit("unigram reconstruction failed for doc "),
            col("doc_id").cast("string"))).isNull)
    }),

    // UniMax epoch-capped language rebalancing (complement of p48's
    // temperature quotas): budgetFrac > 1 is the regime the paper is
    // about — scarce languages replay up to maxEpochs, the leftover is
    // split equally, and a doc can appear once per epoch
    "p51_unimax_sample" -> ((s, dir) =>
      Sampling.unimaxSample(docs(s, dir), "doc_id", "lang",
        budgetFrac = 1.6, maxEpochs = 2)),

    // BM25 top-k retrieval against a fixed query — the retrieval-based
    // data-selection primitive; doc-length normalization is the delta
    // over p13's raw TF-IDF
    "p52_bm25_topk" -> ((s, dir) =>
      TfIdf.bm25TopK(docs(s, dir), "doc_id", "text",
        queryTerms = Seq("query", "window", "hash"), k = 20)),

    // token-budget selection on the p36 fluency signal: keep the
    // best-scoring docs until 40% of corpus tokens are spent, waterline
    // found on a bucket histogram (never a global sort)
    "p53_budget_select" -> ((s, dir) =>
      Quality.budgetSelect(docs(s, dir), "doc_id", "text",
        budgetFrac = 0.4)),

    // one-sided shingle containment (doc-in-doc): directed pairs where
    // ≥ 80% of the inner doc's 3-shingles appear in the outer doc —
    // the quote/subset duplication Jaccard structurally misses
    "p54_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8)),

    // integer-arithmetic PageRank over a hash-derived 500-node link
    // graph (the crawl-frontier host-centrality step); 10 iterations,
    // every operation an integer div/sum so both engines land the same
    // bits regardless of shuffle order
    "p55_pagerank" -> ((s, dir) => {
      val e = docs(s, dir).select(
        (hash60(concat(lit("pre:"), col("doc_id").cast("string"))) % 500)
          .as("src"),
        (hash60(concat(lit("prd:"), col("doc_id").cast("string"))) % 500)
          .as("dst"))
      GraphOps.pageRank(e, "src", "dst", iterations = 10)
    }),

    // word2vec-style ±3 skip-gram co-occurrence with PMI collocation
    // scores — top-200 pairs; pair extraction is array slices (no
    // positional self-join anywhere)
    "p56_pmi_pairs" -> ((s, dir) =>
      Cooccur.pmiPairs(docs(s, dir), "doc_id", "text",
        window = 3, k = 200)),

    // Unicode-script composition (the langid prefilter): exact integer
    // char counts per script class — one codegen'd projection
    "p57_script_profile" -> ((s, dir) =>
      Quality.scriptProfile(docs(s, dir), "doc_id", "text"))

    ,
    // unicode cleanup normalization over docs wrapped in planted
    // encoding junk (curly quotes, NBSP, ZWSP, em-dash, ellipsis — the
    // p49 planted-chrome pattern); normalized text is oracle-hashed
    // Unicode NFC canonical composition (r13 — the pre-hash normalize
    // p58's punctuation pass does NOT cover): the same visible text
    // arrives precomposed (é U+00E9) or decomposed (e + U+0301) and
    // would split duplicate groups under md5. Plant: %4==1 docs carry
    // the DECOMPOSED spelling of the exact suffix %4==2 docs carry
    // precomposed — after NFC their content hashes must unify. One
    // codegen projection (NfcNormalize expression), zero shuffles.
    "p147_nfc_normalize" -> ((s, dir) => {
      val wrapped = concat(col("text"),
        when(col("doc_id") % 4 === 1, lit(" café crème"))
          .when(col("doc_id") % 4 === 2, lit(" café crème"))
          .when(col("doc_id") % 4 === 3, lit(" Ångström"))
          .otherwise(lit(" plain")))
      docs(s, dir).select(col("doc_id"),
        graft.functions.NfcNormalize(wrapped).as("text_nfc"),
        (wrapped =!= graft.functions.NfcNormalize(wrapped)).as("changed"),
        length(wrapped).cast("long").as("n_raw"),
        length(graft.functions.NfcNormalize(wrapped)).cast("long")
          .as("n_nfc"),
        md5(graft.functions.NfcNormalize(wrapped)).as("content_hash"))
    }),

    "p58_text_normalize" -> ((s, dir) => {
      // plant: curly-quoted prefix + NBSP, and on every 3rd doc an
      // ellipsis + ZWSP + em-dash tail (unicode escapes, not literal
      // invisible chars)
      val wrapped = concat(lit("\u201Cq\u201D\u00A0"), col("text"),
        when(col("doc_id") % 3 === 0, lit("\u2026\u200B end\u2014x"))
          .otherwise(lit(" plain")))
      docs(s, dir).select(col("doc_id"),
        TextOps.normalizeText(wrapped).as("text_norm"),
        length(wrapped).cast("long").as("n_raw"),
        length(TextOps.normalizeText(wrapped)).cast("long").as("n_norm"))
    }),

    // crawl-to-crawl corpus delta (dataset versioning: what did the new
    // snapshot add/remove/change?). Snapshot B is derived
    // deterministically in-query (1/7 removed, 1/7 edited, 1/7 cloned
    // as new ids); the diff itself is the scale-right shape — compare
    // FINGERPRINTS through the full-outer join, so the shuffle moves
    // 16 bytes per doc, never the text
    "p59_snapshot_diff" -> ((s, dir) => {
      val a = docs(s, dir).select(col("doc_id"), col("text"))
      val h = hash60(concat(lit("snap:"), col("doc_id").cast("string"))) % 7
      val withH = a.withColumn("__h", h)
      val b = withH.filter(col("__h") =!= 0 && col("__h") =!= 1)
        .select(col("doc_id"), col("text"))
        .unionByName(withH.filter(col("__h") === 1)
          .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text")))
        .unionByName(withH.filter(col("__h") === 2)
          // clone offset must clear any plausible corpus id range: at
          // +1e6 a 1M-doc corpus would collide clone ids with real ids
          // (duplicate keys in B → full-outer fanout); 1e8 matches the
          // ScaleSmokeDocs variant
          .select((col("doc_id") + 100000000L).as("doc_id"),
            concat(col("text"), lit(" new")).as("text")))
      val fa = a.select(col("doc_id"), fingerprint(col("text")).as("fp_a"))
      val fb = b.select(col("doc_id"), fingerprint(col("text")).as("fp_b"))
      fa.join(fb, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("fp_b").isNull, lit("removed"))
            .when(col("fp_a").isNull, lit("added"))
            .when(col("fp_a") =!= col("fp_b"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
    }),

    // embedding-space source QA (CCMatrix-style class hygiene): per-
    // label centroid, per-vector distance to its OWN centroid, outliers
    // past the label's exact p95. Centroid sums are integer-quantized
    // micro-units (order-free — a float mean flips its 6th decimal with
    // shuffle order); distances go through the codegen'd sequential
    // DotProductDouble that DuckDB's list_dot_product mirrors bit-
    // for-bit; the centroid frame is label-count-bounded and broadcast
    "p60_source_outliers" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      val comp = e.select(col("label"), posexplode(col("v")))
        .withColumn("qx", round(col("col") * lit(1000000.0)).cast("long"))
        .groupBy("label", "pos")
        .agg(sum("qx").as("sq"), count(lit(1)).as("n"))
      val cent = comp
        .withColumn("c", round(col("sq") / (col("n") * lit(1000000.0)), 6))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("centroid"))
      val dist = e.join(broadcast(cent), "label")
        .withColumn("__d", zip_with(col("v"), col("centroid"), (x, c) => x - c))
        .select(col("vec_id"), col("label"),
          round(sqrt(Similarity.dot(col("__d"), col("__d"))), 6).as("dist"))
        .persistTracked()
      val cut = dist.groupBy("label")
        .agg(round(percentile(col("dist"), lit(0.95)), 6).as("__cut"))
      dist.join(broadcast(cut), "label")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dist"), (col("dist") > col("__cut")).as("is_outlier"))
    }),

    // media-container census (the format-routing pass of a multimodal
    // ingest): magic prefixes planted per doc_id class — PNG, single
    // JPEG, raw MJPEG (two SOIs, second past the first EOI), GIF, WAV —
    // over the text payload (ASCII, so no accidental magics); the
    // oracle replays the same byte tests on the same rebuilt blobs
    "p63_media_containers" -> ((s, dir) => {
      def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
      val payload = col("text").cast("binary")
      val cls = pmod(col("doc_id"), lit(8))
      val blob = when(cls === 0, concat(lit(b(0x89, 'P', 'N', 'G')), payload))
        .when(cls === 1,
          concat(lit(b(0xFF, 0xD8, 0xFF)), payload, lit(b(0xFF, 0xD9))))
        .when(cls === 2,
          concat(lit(b(0xFF, 0xD8, 0xFF)), payload, lit(b(0xFF, 0xD9)),
            lit(b(0xFF, 0xD8, 0xFF)), payload, lit(b(0xFF, 0xD9))))
        .when(cls === 3, concat(lit("GIF8".getBytes("UTF-8")), payload))
        .when(cls === 4, concat(lit("RIFF".getBytes("UTF-8")), lit(b(0, 0, 0, 0)),
          lit("WAVE".getBytes("UTF-8")), payload))
        // minimal ftyp box then payload — bytes 4-7 'ftyp' is the sniff
        .when(cls === 5, concat(lit(b(0, 0, 0, 0x10) ++
          "ftypisom".getBytes("UTF-8") ++ b(0, 0, 0, 0)), payload))
        // EBML magic + 7-byte header holding DocType 'webm'
        .when(cls === 6, concat(lit(b(0x1A, 0x45, 0xDF, 0xA3, 0x87,
          0x42, 0x82, 0x84) ++ "webm".getBytes("UTF-8")), payload))
        .otherwise(payload)
      Multimodal.detectContainers(
        docs(s, dir).select(col("doc_id"), blob.as("media")))
    }),

    // split-leakage audit (train/test contamination INSIDE the corpus:
    // a near-dup pair straddling the train/holdout boundary leaks
    // evaluation data into training — the self-inflicted variant of
    // p42's benchmark decontamination, the check Lee et al. '22 §6
    // runs on C4's own splits): minhash near-dup pairs joined to the
    // deterministic split labels, keep pairs whose sides land in
    // DIFFERENT splits
    "p68_split_leakage" -> ((s, dir) => {
      val split = Sampling.holdoutSplit(docs(s, dir), "doc_id")
        .select(col("doc_id"), col("split"))
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.4)
        .join(split.select(col("doc_id").as("doc_a"),
          col("split").as("split_a")), "doc_a")
        .join(split.select(col("doc_id").as("doc_b"),
          col("split").as("split_b")), "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .select(col("doc_a"), col("doc_b"),
          col("split_a"), col("split_b"), col("jaccard"))
    }),

    // corpus dedup report (the first table of every dedup paper:
    // FineWeb/Gopher report duplication rate + cluster-size
    // distribution before/after): minhash near-dup clusters folded to
    // one row per CLUSTER SIZE — n_clusters, n_docs, removable docs
    // (size-1 per cluster), and each as a 6-dp corpus fraction. The
    // histogram frame is ≤ max-cluster-size rows; the one-row corpus
    // total attaches broadcast (the p36 shape)
    "p67_dedup_report" -> ((s, dir) => {
      val clusters = Dedup.duplicateClusters(
        Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.4))
      val total = docs(s, dir).agg(count(lit(1)).as("__n"))
      clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
        .withColumn("n_removable", (col("cluster_size") - 1) * col("n_clusters"))
        .crossJoin(broadcast(total))
        .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
          col("n_removable"),
          round(col("n_docs") / col("__n"), 6).as("frac_docs"),
          round(col("n_removable") / col("__n"), 6).as("frac_removable"))
    }),

    // model-based quality filtering (the DCLM/FineWeb-Edu gate): the
    // shared hashed-3-gram linear classifier with a keep/toss head —
    // docs get a planted header (clean prose vs spam keyword-stuffing,
    // by doc_id parity) and the classifier must separate them; scores/
    // margin integer, oracle replays bit-for-bit
    "p66_quality_classifier" -> ((s, dir) => {
      val hdr = when(col("doc_id") % 2 === 0,
        lit("the report explains the method and the evidence in detail. "))
        .otherwise(
          lit("click here buy now free offer best price casino bonus. "))
      // classify header + an 80-char body prefix — the truncated-prefix
      // serving shape production gates use (bounded per-doc cost, and
      // the neutral synthetic body otherwise drowns the signal: 93.6%
      // full-text vs >99% prefix, measured)
      QualityClassifier.classify(
        docs(s, dir).select(col("doc_id"),
          concat(hdr, substring(col("text"), 1, 80)).as("t")), "doc_id", "t")
    }),

    // interpolated Kneser-Ney bigram scoring (the KenLM smoothing
    // behind CCNet's perplexity filter; p46's add-one is the textbook
    // proxy, this is the production formula — continuation
    // probabilities from the bigram-TYPE relation)
    "p65_kn_bigram" -> ((s, dir) =>
      Quality.knBigramScore(docs(s, dir), "doc_id", "text")),

    // interpolated Kneser-Ney TRIGRAM scoring (the SRILM/KenLM default
    // order: discounted trigram level, continuation-count middle level
    // from the trigram-TYPE relation, p65's Pcont(w) at the bottom)
    "p79_kn_trigram" -> ((s, dir) =>
      Quality.knTrigramScore(docs(s, dir), "doc_id", "text")),

    // SemDeDup (Abbas '23): embedding-space dedup — exemplar-seeded
    // clusters, within-cluster cosine tau-graph, keep the group member
    // LEAST similar to its centroid. Candidate volume n²/k by
    // construction (never corpus-wide all-pairs)
    "p64_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(emb(s, dir), k = 16, tau = 0.98)),

    // SemDeDup with the SCALE-SAFE pair source: same assignment /
    // components / representative rule as p64, but tau-pairs come from
    // the banded hyperplane LSH (p5's md5-mirrored planes — an
    // equality shuffle, never Σ cluster²) with a per-bucket star cap
    // so a pile-up of near-identical vectors cannot straggle. The
    // oracle replays planes, cap, and walk bit-for-bit — the 100-TB
    // form is itself hash-pinned, not just spec'd
    "p69_semantic_dedup_lsh" -> ((s, dir) =>
      Similarity.semanticDedupLsh(emb(s, dir), k = 16, tau = 0.35,
        tables = 16, planesPerTable = 8, dim = 64, starCapBucket = 24)),

    // the embedding-side twin of p71: screen an arriving embedding
    // batch (odd vec_ids) against the stored corpus (even) — only the
    // batch is banded fresh, candidates need >= 1 new side, verify is
    // exact cosine; relationally = p5's full banded pairs restricted
    // to pairs touching the batch
    "p73_incremental_semantic" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.cosineNearDupPairsIncremental(
        e.filter(col("vec_id") % 2 === 1),
        e.filter(col("vec_id") % 2 === 0),
        threshold = 0.35, tables = 16, planesPerTable = 8, dim = 64)
    }),

    // incremental 48-bit-signature near-dup (the p71/p73 pattern for
    // the hamming family): even doc_ids play the stored media corpus,
    // odd ids the arriving batch — p74's planted group/flip structure,
    // candidates need >= 1 odd side, the corpus never re-pairs with
    // itself. Relationally equivalent to "full hammingPairs48 with at
    // least one odd side", which is what the oracle states
    "p82_incremental_hamming" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val planted = Multimodal.imageDHash(grouped).withColumn("dhash",
        col("dhash")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      Dedup.hammingPairsIncremental(
        planted.filter(col("doc_id") % 2 === 1),
        planted.filter(col("doc_id") % 2 === 0),
        "doc_id", "dhash", maxHamming = 4)
    }),

    // near-dup decontamination vs the benchmark set (round-10 — exact
    // n-gram overlap (p17) misses paraphrased leakage; releases ALSO
    // drop train docs minhash-near a benchmark doc): docs %25==0 play
    // the benchmark, the rest the train corpus; strictly cross-set
    // band join, benchmark side broadcast end to end
    "p108_neardup_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.nearDupDecontaminate(
        d.filter(col("doc_id") % 25 =!= 0),
        d.filter(col("doc_id") % 25 === 0),
        "doc_id", "text", threshold = 0.4)
    }),

    // exact-dedup stored-index screen (round-11, the p71 pattern for
    // the EXACT family — crawl N+1's cheapest screen): even ids play
    // the stored crawl-N index (canonical-key partial groups), odd ids
    // the arriving batch; the corpus is touched only through its
    // persisted index, never re-hashed. The corpus carries no natural
    // exact dups, so the query PLANTS them scalar-only: ids with
    // doc_id%5<2 share 'grp:(doc_id div 4)' as their text — duplicate
    // pairs that straddle the even/odd split. Oracle = p1's keep rule
    // over corpus ∪ batch restricted to batch rows, hash-exact.
    "p109_exact_screen" -> ((s, dir) => {
      val planted = exactPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p109_exact_idx") { stage =>
        Dedup.saveExactIndex(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx")
      }
      Dedup.exactAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("n_corpus"), col("keep"))
    }),

    // p109's oracle VERBATIM over the BUCKETED catalog path (the p103
    // precedent): the stored partial groups live bucketBy(content_hash),
    // so the per-hash combine and the batch semi-join consume the
    // table's own partitioning — zero corpus-side exchanges at any
    // batch size. Hash-exact equality proves the layout returns the
    // identical relation.
    "p110_exact_backfill" -> ((s, dir) => {
      val planted = exactPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p110_exact_idx_bucketed") { stage =>
        val bp = s"p110_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveExactIndexBucketed(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx", nBuckets = 8, tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_exact")
      }
      Dedup.exactAgainstIndexBucketed(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("n_corpus"), col("keep"))
    }),

    // quality-annealed multi-epoch schedule (round-11 — the data
    // side of "anneal on high-quality data last": epoch 0 replays the
    // corpus, later epochs keep the most-fluent fraction by the p36
    // LM score, linearly down to 25% at epoch 3). Cutoffs = ONE exact
    // multi-percentile aggregate broadcast (the p38 discipline, no
    // global sort); admission a pure comparison — deterministic and
    // SQL-replayable
    "p116_anneal_schedule" -> ((s, dir) =>
      Sampling.annealSchedule(
        Quality.lmScore(docs(s, dir), "doc_id", "text"),
        "doc_id", "lm_nll", nEpochs = 4, finalKeepBp = 2500)),

    // bloom-prefiltered exact screen (round-11, the crawl-frontier
    // FAST PATH): a membership sketch built over the stored index's
    // keys answers "definitely new" in memory — only sketch-positive
    // hashes (true dups + the 1% fpp of the fresh mass) consult the
    // index at all. A Bloom filter has NO false negatives, so the
    // relation is IDENTICAL to p109's — which is exactly what the
    // oracle states: hash-exact equality here IS the no-false-negative
    // proof over this corpus
    "p115_bloom_screen" -> ((s, dir) => {
      val planted = exactPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p115_exact_bloom_idx") { stage =>
        Dedup.saveExactIndex(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.buildExactBloom(s, s"$stage/idx",
          expectedItems = 10000L, fpp = 0.01)
      }
      Dedup.exactAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("n_corpus"), col("keep"))
    }),

    // round-12: the p115 bloom fast path generalized to the LINE index —
    // p113's setup with a key sketch in front; no false negatives ⇒ the
    // rewritten batch is IDENTICAL, which is what the oracle states
    // (p113's verbatim)
    "p119_line_bloom_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nshared footer please subscribe\nuniq-"),
          col("doc_id").cast("string")).as("text"))
      val out = withPipelineArtifact(dir, "p119_line_bloom_idx") { stage =>
        Dedup.saveLineIndex(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.buildLineBloom(s, s"$stage/idx", expectedItems = 2000000L)
      }
      Dedup.linesAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // round-12: the bloom fast path over the MINHASH band cells — p71's
    // stored-index serving shape with a band-cell sketch in front;
    // sketch-negative batch cells never probe the corpus band scan.
    // Oracle = p71's verbatim (identical pairs by the no-false-negative
    // construction)
    "p120_minhash_bloom_screen" -> ((s, dir) => {
      val d = docs(s, dir)
      val out = withPipelineArtifact(dir, "p120_mh_bloom_idx") { stage =>
        Dedup.saveMinhashIndex(
          Dedup.minhashIndex(d.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", n = 3, k = 32, bands = 8), s"$stage/idx", n = 3)
        Dedup.buildMinhashBloom(s, s"$stage/idx", expectedItems = 2000000L)
      }
      Dedup.nearDupAgainstIndexBloom(d.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text", threshold = 0.4)
    }),

    // round-12: the bloom fast path over the COSINE band cells — p73's
    // embedding screen from a stored index with a sketch in front.
    // Oracle = p73's verbatim
    "p121_cosine_bloom_screen" -> ((s, dir) => {
      val e = emb(s, dir)
      val out = withPipelineArtifact(dir, "p121_cos_bloom_idx") { stage =>
        Similarity.saveCosineIndex(e.filter(col("vec_id") % 2 === 0),
          s"$stage/idx", tables = 16, planesPerTable = 8, dim = 64)
        Similarity.buildCosineBloom(s, s"$stage/idx",
          expectedItems = 2000000L)
      }
      Similarity.cosineNearDupAgainstIndexBloom(
        e.filter(col("vec_id") % 2 === 1), s"$out/idx", threshold = 0.35)
    }),

    // round-12: the bloom fast path over the SIGNATURE band cells —
    // p82's planted dHash structure screened from a stored index.
    // Oracle = p82's verbatim
    "p122_hamming_bloom_screen" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val planted = Multimodal.imageDHash(grouped).withColumn("dhash",
        col("dhash")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      val out = withPipelineArtifact(dir, "p122_sig_bloom_idx") { stage =>
        Dedup.saveSignatureIndex(
          planted.filter(col("doc_id") % 2 === 0), s"$stage/idx",
          "doc_id", "dhash", maxHamming = 4)
        Dedup.buildSignatureBloom(s, s"$stage/idx",
          expectedItems = 2000000L)
      }
      Dedup.hammingAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "dhash")
    }),

    // round-12: corpus-frequent 3-gram census (the stop-gram /
    // boilerplate-phrase report) — exact counts, but candidates come
    // from ONE mergeable Misra-Gries pass so the gram tail never
    // shuffles; the verify groupBy touches only the broadcast-joined
    // candidates. Exact-equivalence is certified in-plan (the MG
    // deficiency bound is require'd against the measured total), so
    // the result is byte-identical to the full-shuffle relation the
    // oracle computes. Support-relative threshold:
    // minCount = max(6, ceil(total/16384)).
    "p123_heavy_ngrams" -> ((s, dir) =>
      HeavyHitters.frequentNgrams(s, docs(s, dir), "text", n = 3)),

    // round-12: RAG/retrieval passage chunking — 32-token windows,
    // 8-token overlap, right-aligned last window. Pure codegen
    // projection (tokenize → arithmetic chunk count → sequence explode
    // → array slice): zero exchanges, scales as the scan does
    "p124_chunk_overlap" -> ((s, dir) =>
      Sampling.chunkTokens(docs(s, dir), "doc_id", "text",
        size = 32, overlap = 8)),

    // round-12: length-weighted corpus subsample — 20 docs per source,
    // inclusion probability ∝ n_chars, WITHOUT replacement
    // (Efraimidis-Spirakis hash-derived reservoir keys; deterministic,
    // exactly replayable in SQL)
    "p125_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(docs(s, dir), "doc_id", "source",
        "n_chars", k = 20)),

    // line-level stored-index screen (round-11, closing the
    // cross-snapshot matrix: exact-doc/minhash/cosine/hamming all have
    // save→screen→merge; this is the LINE family — the per-batch
    // boilerplate pass a recurring crawl otherwise re-pays over the
    // full history). p37's plant (shared footer + per-doc unique line),
    // even ids = the stored crawl-N line index, odd ids = the batch;
    // a batch line dies when the corpus knows its key (temporal
    // contract: the corpus was ingested first) or an earlier batch
    // (doc, pos) carries it. Output = the REWRITTEN batch docs.
    "p113_line_screen" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nshared footer please subscribe\nuniq-"),
          col("doc_id").cast("string")).as("text"))
      val out = withPipelineArtifact(dir, "p113_line_idx") { stage =>
        Dedup.saveLineIndex(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx")
      }
      Dedup.linesAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // p113's oracle VERBATIM over the BUCKETED catalog path (the p110
    // precedent, closing the r12 backfill gap for the line family):
    // the stored line-key partials live bucketBy(lk), so the batch
    // semi-join consumes the table's own partitioning — the corpus
    // side never exchanges even when the batch is backfill-scale
    "p136_line_backfill" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nshared footer please subscribe\nuniq-"),
          col("doc_id").cast("string")).as("text"))
      val out = withPipelineArtifact(dir, "p136_line_idx_bucketed") { stage =>
        val bp = s"p136_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveLineIndexBucketed(planted.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx", nBuckets = 8, tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_line")
      }
      Dedup.linesAgainstIndexBucketed(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text")
    }),

    // URL-frontier screen (round-11 — "have we fetched this URL
    // before, under ANY raw spelling?", the crawl scheduler's hottest
    // question): the p77 plant's RFC 3986 spelling variants are
    // canonicalized, the even ids' canonical keys persist as a stored
    // EXACT index, and the odd batch screens against it — n_corpus > 0
    // = already fetched, keep = this batch row is the canonical first
    // fetch across corpus ∪ batch
    "p114_url_frontier" -> ((s, dir) => {
      val urls = docs(s, dir).select(col("doc_id"),
        UrlOps.canonicalizeUrl(concat(
          when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
          lit("://Site"), (col("doc_id") % 10).cast("string"),
          lit(".Example.COM"),
          when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
          lit("/Page/"), (col("doc_id") % 7).cast("string"),
          when(col("doc_id") % 2 === 1, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            concat(lit("?id="), (col("doc_id") % 5).cast("string"),
              lit("&utm_source=feed")))
            .otherwise(concat(lit("?utm_source=feed&utm_campaign=x&id="),
              (col("doc_id") % 5).cast("string"))),
          lit("#s"), (col("doc_id") % 2).cast("string"))).as("text"))
      val out = withPipelineArtifact(dir, "p114_url_idx") { stage =>
        Dedup.saveExactIndex(urls.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", s"$stage/idx")
      }
      Dedup.exactAgainstIndex(urls.filter(col("doc_id") % 2 === 1),
          s"$out/idx", "doc_id", "text")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("n_corpus"), col("keep"))
    }),

    // deterministic epoch shuffle (round-10 — reproducible multi-epoch
    // data order: fresh salt per epoch so orders are independent;
    // the sort is the one a shuffled-dataset write pays anyway)
    "p106_epoch_shuffle" -> ((s, dir) =>
      Sampling.epochShuffle(docs(s, dir), "doc_id", nEpochs = 2)),

    // repeat-upsampling under a fixed token budget (round-10,
    // Muennighoff '23 data-constrained scaling: full epochs capped at
    // 4, fractional epoch by independent salted draw — integer
    // basis-point arithmetic, order-free, no sort, no running sum)
    "p107_repeat_upsample" -> ((s, dir) =>
      Sampling.repeatUpsample(docs(s, dir), "doc_id", "text",
        budgetTokens = 100000L)),

    // hard-negative mining (round-10 — the contrastive-training data
    // op: for each query vector, the top-k most-similar vectors of a
    // DIFFERENT label; DPR-class dual-encoder recipes train on exactly
    // this relation). Brute-force is the oracle-exact baseline — the
    // banded/IVF candidate generators compose in front at corpus scale
    "p104_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegativesTopK(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 20), k = 5)),

    // fill-in-the-middle transform (round-10, Bavarian '22): PSM
    // re-serialization at salted-md5 cut points, 50% apply rate — one
    // codegen'd projection, cuts and gate replayable in SQL
    "p105_fim_transform" -> ((s, dir) =>
      Sampling.fimTransform(docs(s, dir), "doc_id", "text")),

    // WordPiece tokenization (round-11, verdict gap #4 — the
    // BERT-family serve path): greedy longest-match-first with ##
    // continuations and the all-or-nothing [UNK] rule, served as a
    // codegen expression over a vocabulary that round-trips through
    // TokenizerIO (build-once artifact, the p100 discipline). Unlike
    // the likelihood-trained merge loops, greedy matching is
    // deterministic AND SQL-replayable, so the whole query — vocab
    // recipe, segmentation, per-doc rollup — is HASH-EXACT (the one
    // tokenizer family with a full oracle, not rows-only)
    "p112_wordpiece" -> ((s, dir) => {
      val d = docs(s, dir)
      val tokDir = withPipelineArtifact(dir, "p112_wordpiece") { stage =>
        TokenizerIO.saveWordPiece(
          WordPiece.vocabFrame(d, "text", topWords = 12), "[UNK]",
          s"$stage/wp")
      }
      val (vocab, unk) = TokenizerIO.loadWordPiece(s, s"$tokDir/wp")
      // r13 optimization: fused codegen serve pass (same greedy kernel,
      // same values — SegmentServeSpec) replaces the interpreted HOFs
      d.select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("__st", graft.functions.SegmentServe.wordPiece(
          col("toks"), vocab, unk, 100))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          col("__st.n_pieces").as("n_pieces"),
          col("__st.n_unk").as("n_unk"),
          col("__st.wp_text").as("wp_text"))
    }),

    // published-tokenizer interop, WordPiece half (r13 verdict gap
    // #1): an HF single-file tokenizer.json (written into the stage
    // dir from TokenizerFixtures — the query exercises the REAL file
    // parser) is loaded through loadExternalHfWordPiece and serves the
    // corpus through the same codegen segmenter as p112; the oracle
    // replays the greedy walk under the SAME fixed vocab as literals,
    // so the external path is hash-exact, custom unk and
    // max_input_chars included
    "p141_hf_wordpiece_external" -> ((s, dir) => {
      val tokDir = withPipelineArtifact(dir, "p141_hf_tok") { stage =>
        graft.pipeline.TokenizerFixtures.write(s, s"$stage/tokenizer.json",
          graft.pipeline.TokenizerFixtures.hfWordPieceJson)
      }
      val (pieces, unk, maxChars) = TokenizerIO.loadExternalHfWordPiece(
        s, s"$tokDir/tokenizer.json")
      // r13 optimization: fused codegen serve pass (same greedy kernel,
      // same values — SegmentServeSpec) replaces the interpreted HOFs
      docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("__st", graft.functions.SegmentServe.wordPiece(
          col("toks"), pieces, unk, maxChars))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          col("__st.n_pieces").as("n_pieces"),
          col("__st.n_unk").as("n_unk"),
          col("__st.wp_text").as("wp_text"))
    }),

    // context-fit report under the EXTERNAL tokenizer (r13): p98's
    // truncation accounting re-based on the loaded artifact's REAL
    // subword counts — the number every context-length decision
    // actually needs (whitespace tokens undercount by the fertility
    // factor). Same stored artifact as p141.
    "p146_external_context_fit" -> ((s, dir) => {
      val tokDir = withPipelineArtifact(dir, "p141_hf_tok") { stage =>
        graft.pipeline.TokenizerFixtures.write(s, s"$stage/tokenizer.json",
          graft.pipeline.TokenizerFixtures.hfWordPieceJson)
      }
      val (pieces, unk, maxChars) = TokenizerIO.loadExternalHfWordPiece(
        s, s"$tokDir/tokenizer.json")
      // r13 optimization: fused codegen serve pass (SegmentServeSpec)
      docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("__n", graft.functions.SegmentServe.wordPiece(
          col("toks"), pieces, unk, maxChars).getField("n_pieces"))
        .select(col("__n"),
          explode(typedLit(Seq(64L, 128L, 256L))).as("ctx_len"))
        .groupBy("ctx_len")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("__n") > col("ctx_len"), 1L).otherwise(0L))
            .cast("long").as("n_truncated"),
          sum(col("__n")).cast("long").as("n_tokens"),
          sum(greatest(col("__n") - col("ctx_len"), lit(0L))).cast("long")
            .as("tokens_lost"))
        .withColumn("lost_frac",
          round(col("tokens_lost") * lit(1.0) / col("n_tokens"), 6))
    }),

    // token-denominated mixture planning (r13): mixtures are specified
    // in TOKENS, not documents (the Pile/Dolma practice) — per source:
    // docs, REAL subword tokens under the external artifact, actual
    // token share, the hash-derived target share (p32's deterministic
    // target recipe), and the over/under-sampling factor a mixture job
    // needs. Pure aggregates + one broadcast scalar — no window
    "p152_token_mix" -> ((s, dir) => {
      val tokDir = withPipelineArtifact(dir, "p141_hf_tok") { stage =>
        graft.pipeline.TokenizerFixtures.write(s, s"$stage/tokenizer.json",
          graft.pipeline.TokenizerFixtures.hfWordPieceJson)
      }
      val (pieces, unk, maxChars) = TokenizerIO.loadExternalHfWordPiece(
        s, s"$tokDir/tokenizer.json")
      val per = docs(s, dir)
        .select(col("source"), tokens(col("text")).as("toks"))
        .withColumn("__n", graft.functions.SegmentServe.wordPiece(
          col("toks"), pieces, unk, maxChars).getField("n_pieces"))
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("__n")).cast("long").as("n_tokens"))
        .withColumn("target_w",
          (TextOps.hash60(concat(lit("mix:"), col("source"))) % 5 + 1)
            .cast("long"))
      val tot = per.agg(sum("n_tokens").as("__tt"), sum("target_w").as("__tw"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("(n_tokens * 1000) div __tt").as("share_milli"),
          expr("(target_w * 1000) div __tw").as("target_milli"),
          expr("(target_w * 1000 * __tt) div (__tw * n_tokens)")
            .as("sample_factor_milli"))
    }),

    // published-tokenizer interop, GPT-2 half: vocab.json + merges.txt
    // (written from TokenizerFixtures, loaded through the real parser
    // with its byte-coverage and merge-consistency validations) feed
    // the byte-BPE segmenter VERBATIM — the files are in the same
    // byte-unicode alphabet the engine compiles — plus token-id
    // encoding through the loaded vocab map. Merge-loop segmentation
    // has no SQL mirror (the p47/p93 precedent), so correctness is
    // certified IN-PLAN: byte-exact lossless reconstruction of every
    // doc and total vocab coverage of every emitted token id
    "p142_gpt2_external" -> ((s, dir) => {
      val tokDir = withPipelineArtifact(dir, "p142_gpt2_tok") { stage =>
        graft.pipeline.TokenizerFixtures.write(s, s"$stage/vocab.json",
          graft.pipeline.TokenizerFixtures.gpt2VocabJson)
        graft.pipeline.TokenizerFixtures.write(s, s"$stage/merges.txt",
          graft.pipeline.TokenizerFixtures.gpt2MergesTxt)
      }
      val (merges, vocab) = TokenizerIO.loadExternalGpt2(
        s, s"$tokDir/vocab.json", s"$tokDir/merges.txt")
      // r13 optimization: the interpreted HOF chain (transform→transform
      // →flatten→aggregate/forall with element_at on a map LITERAL — a
      // linear scan per token) is now ONE codegen pass per doc over the
      // same kernels; values identical (SegmentServeSpec pins it)
      docs(s, dir)
        .select(col("doc_id"), col("text"),
          BpeByte.pretokens(col("text")).as("pts"))
        .withColumn("__st", graft.functions.SegmentServe.bpe(
          col("pts"), merges, vocab.toSeq, byteMode = true))
        .select(col("doc_id"),
          size(col("pts")).cast("long").as("n_pretokens"),
          col("__st.n_segments").as("n_tokens"),
          col("__st.id_sum").as("id_sum"),
          col("__st.all_in_vocab").as("all_in_vocab"),
          (graft.functions.ByteUnicode.toBytes(col("__st.seg_concat"))
            === BpeByte.stripMarker(col("text"))).as("lossless"))
        .filter(assert_true(col("all_in_vocab") && col("lossless"),
          concat(lit("external GPT-2 certification failed for doc "),
            col("doc_id").cast("string"))).isNull)
    }),

    // published-tokenizer interop, SentencePiece half (r13 follow-on —
    // the T5/Llama/Gemma artifact family): a binary `.model` written
    // from TokenizerFixtures' protobuf renderer is loaded through the
    // real wire parser (loadExternalSentencePiece, with its strict
    // normalizer/model-type/piece-type envelope) and serves the corpus
    // through the codegen unigram Viterbi segmenter, one ▁-prefixed
    // unit per whitespace word — exact vs whole-sentence Viterbi by
    // the no-interior-▁ decomposition the loader enforces. Viterbi
    // min-cost paths have no SQL mirror (the p62/p142 precedent), so
    // correctness is certified IN-PLAN: byte-exact lossless
    // reconstruction of every escaped doc, and every emitted piece
    // either a model piece or a single-code-point unk fallback
    "p153_sentencepiece_external" -> ((s, dir) => {
      val tokDir = withPipelineArtifact(dir, "p153_sp_tok") { stage =>
        graft.pipeline.TokenizerFixtures.writeBytes(s, s"$stage/sp.model",
          graft.pipeline.TokenizerFixtures.spModelBytes)
      }
      val m = TokenizerIO.loadExternalSentencePiece(s, s"$tokDir/sp.model")
      // r13 optimization: one codegen pass per doc over the same Viterbi
      // kernel replaces the interpreted HOF chain + per-piece linear map
      // scans; values identical (SegmentServeSpec pins it)
      docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("__st", graft.functions.SegmentServe.unigram(
          col("toks"), m.pieces, m.unkCostMicro, m.maxPieceLen, "▁"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          col("__st.n_pieces").as("n_pieces"),
          col("__st.n_unk").as("n_unk"),
          col("__st.sp_text").as("sp_text"),
          (col("__st.piece_concat") ===
            when(size(col("toks")) === 0, lit(""))
              .otherwise(concat(lit("▁"),
                array_join(col("toks"), "▁")))).as("lossless"),
          col("__st.covered").as("covered"))
        .filter(assert_true(col("lossless") && col("covered"),
          concat(lit("external SentencePiece certification failed for doc "),
            col("doc_id").cast("string"))).isNull)
    }),

    // robots-exclusion compliance gate (RFC 9309) over planted URLs:
    // every doc carries one URL on one of 10 hosts with 4 path shapes;
    // the rule table (RobotsRules, interpolated into BOTH sides)
    // exercises the longest-match override (/private disallowed but
    // /private/ok re-allowed), the allow-wins specificity tie (/pub
    // both ways), a root disallow on site0, and unlisted hosts
    // (site5-9) passing by default
    "p154_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val rules = RobotsRules.toDF("host", "path_prefix", "allow")
      UrlOps.robotsFilter(robotsUrlPlant(docs(s, dir)), "doc_id", "url",
        rules)
    }),

    // the robots verdict's ZERO-SHUFFLE serving form (rules as one map
    // literal + a HOF fold — the streaming ingest / batch fast path)
    // over the SAME plant and rule table as p154; oracle = p154's
    // VERBATIM (the identical-relation claim, the p143/p149 pattern)
    "p156_robots_serve" -> ((s, dir) =>
      UrlOps.robotsVerdict(robotsUrlPlant(docs(s, dir)), "doc_id", "url",
        RobotsRules)),

    // threaded-conversation flattening (pointer doubling) over a
    // planted forest: every 5-block of doc_ids forms one tree (root
    // 5k; 5k+1 under it; 5k+2 and 5k+3 BRANCH under 5k+1; 5k+4 under
    // 5k+3), so leaves alternate depth 3 and depth 4 and every tree
    // has exactly two conversations. The flattened relation is an
    // artifact (the doubling is a driver loop — built once per
    // corpus); the oracle replays the traversal as a recursive CTE
    "p157_thread_flatten" -> ((s, dir) => {
      val out = withPipelineArtifact(dir, "p157_threads") { stage =>
        val msgs = docs(s, dir).select(col("doc_id").as("id"),
          when(col("doc_id") % 5 === 0, lit(null).cast("long"))
            .when(col("doc_id") % 5 === 3, col("doc_id") - 2)
            .otherwise(col("doc_id") - 1).as("parent"),
          when(col("doc_id") % 2 === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          substring(col("text"), 1, 60).as("content"))
        Preference.flattenThreads(msgs, "id", "parent", "role", "content",
          maxDepth = 8)
          .write.mode("overwrite").parquet(s"$stage/flat")
      }
      s.read.parquet(s"$out/flat")
        .select(col("leaf_id"), col("root_id"), col("depth"),
          array_join(zip_with(col("roles"), col("contents"),
            (r, c) => concat(r, lit(": "), c)), "\n").as("convo"))
    }),

    // near-dup-cluster-CONSISTENT holdout split (the train/test
    // leakage gate a per-doc hash split cannot give): members of one
    // verified minhash cluster — the p14 relation — draw their split
    // from the cluster REPRESENTATIVE's key, so no near-dup pair can
    // straddle train/test; singletons keep the p24 per-id draw
    "p158_cluster_split" -> ((s, dir) =>
      Sampling.clusterConsistentSplit(docs(s, dir), "doc_id", "text")),

    // right-to-be-forgotten DELETION from the stored exact index: the
    // planted-corpus index minus every doc_id % 7 == 0 — singleton
    // keys of deleted docs DISAPPEAR, group counts shrink, and groups
    // whose min-id WINNER is deleted keep their count with keep_id
    // NULL (the monoid cannot re-derive the next retained winner; the
    // oracle states the same rule). Built as an artifact like the
    // other index queries; the returned relation is the new index
    "p159_index_delete" -> ((s, dir) => {
      val out = withPipelineArtifact(dir, "p159_idx_del") { stage =>
        val corpus = exactPlant(docs(s, dir))
        Dedup.saveExactIndex(corpus, "doc_id", "text", s"$stage/idx")
        Dedup.deleteFromExactIndex(
          corpus.filter(col("doc_id") % 7 === 0),
          s"$stage/idx", s"$stage/idx_del", "doc_id", "text")
      }
      Dedup.loadExactIndex(s, s"$out/idx_del")
        .select(col("content_hash"), col("keep_id"), col("dup_cnt"))
    }),

    // the LINE family's deletion (takedowns must purge boilerplate
    // state too): the p113-planted line index minus every doc_id%7
    // doc — deleted docs' uniq- lines disappear, the shared footer's
    // count shrinks AND its first-(doc,pos) winner (doc 0, itself
    // deleted) goes NULL; serving is unaffected (line screens consume
    // key existence only)
    "p160_line_index_delete" -> ((s, dir) => {
      val out = withPipelineArtifact(dir, "p160_line_del") { stage =>
        val corpus = docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            lit("\nshared footer please subscribe\nuniq-"),
            col("doc_id").cast("string")).as("text"))
        Dedup.saveLineIndex(corpus, "doc_id", "text", s"$stage/idx")
        Dedup.deleteFromLineIndex(
          corpus.filter(col("doc_id") % 7 === 0),
          s"$stage/idx", s"$stage/idx_del", "doc_id", "text")
      }
      Dedup.loadLineIndex(s, s"$out/idx_del")
        .select(col("lk"), col("doc"), col("pos"), col("cnt"))
    }),

    // the NEAR-DUP family's deletion: the p71 even-corpus minhash
    // index minus every doc_id%6==0 doc (per-doc rows — a plain
    // anti-join rewrite, no winner caveat), then the odd batch
    // screened against the deleted index. The oracle is p71's pair
    // relation with the deleted evens excluded from BOTH sides —
    // i.e. the deleted index serves exactly as one built on the
    // retained corpus
    "p161_minhash_index_delete" -> ((s, dir) => {
      val d = docs(s, dir)
      val out = withPipelineArtifact(dir, "p161_mh_del") { stage =>
        Dedup.saveMinhashIndex(
          Dedup.minhashIndex(d.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", n = 3, k = 32, bands = 8),
          s"$stage/idx", n = 3)
        Dedup.deleteFromMinhashIndex(
          d.filter(col("doc_id") % 6 === 0).select(col("doc_id")),
          s"$stage/idx", s"$stage/idx_del", "doc_id")
      }
      Dedup.nearDupAgainstIndex(d.filter(col("doc_id") % 2 === 1),
        s"$out/idx_del", "doc_id", "text", threshold = 0.4)
    }),

    // the COSINE family's deletion (the p161 pattern on the embedding
    // side): the even-corpus cosine index minus every vec_id%6==0
    // vector, odd batch screened against the deleted index; oracle =
    // p73's pair relation with deleted evens off both sides
    "p162_cosine_index_delete" -> ((s, dir) => {
      val e = emb(s, dir)
      val out = withPipelineArtifact(dir, "p162_cos_del") { stage =>
        Similarity.saveCosineIndex(e.filter(col("vec_id") % 2 === 0),
          s"$stage/idx", tables = 16, planesPerTable = 8, dim = 64)
        Similarity.deleteFromCosineIndex(
          e.filter(col("vec_id") % 6 === 0).select(col("vec_id")),
          s"$stage/idx", s"$stage/idx_del", "vec_id")
      }
      Similarity.cosineNearDupAgainstIndex(
        e.filter(col("vec_id") % 2 === 1), s"$out/idx_del",
        threshold = 0.35)
    }),

    // the HAMMING family's deletion (r13 follow-on — the takedown
    // matrix extended to the signature side): the p82-planted
    // even-corpus signature index minus every doc_id%6==0 doc (per-doc
    // sigs + band rows — a plain anti-join rewrite, no winner caveat),
    // odd batch screened against the deleted index. Oracle = p82's
    // pair relation with the deleted evens off both sides: the deleted
    // index must serve exactly as one built on the retained signatures
    "p163_hamming_index_delete" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val planted = Multimodal.imageDHash(grouped).withColumn("dhash",
        col("dhash")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      val out = withPipelineArtifact(dir, "p163_ham_del") { stage =>
        Dedup.saveSignatureIndex(planted.filter(col("doc_id") % 2 === 0),
          s"$stage/idx", "doc_id", "dhash", maxHamming = 4)
        Dedup.deleteFromSignatureIndex(
          planted.filter(col("doc_id") % 6 === 0).select(col("doc_id")),
          s"$stage/idx", s"$stage/idx_del", "doc_id")
      }
      Dedup.hammingAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx_del", "doc_id", "dhash")
    }),

    // the PRIORITY family's deletion (the p159 monoid rules + the
    // family's own non-retractable extras): the p132-planted corpus
    // indexed whole, minus every doc_id%7==0 doc. Singleton keys of
    // deleted docs disappear, counts shrink, keys whose min-(priority,
    // id) WINNER is deleted go NULL on keep_id AND keep_priority (both
    // decode from the one packed win), and prio_mask stays AS STORED —
    // the bit_or cannot retract, so the oracle states the same
    // superset rule (mask over ALL original contributors)
    "p164_priority_index_delete" -> ((s, dir) => {
      val corpus = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("grp:"), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("text"),
        (substring(col("source"), 4, 10).cast("long") % 4).as("priority"))
      val out = withPipelineArtifact(dir, "p164_prio_del") { stage =>
        Dedup.savePriorityIndex(corpus, "doc_id", "text", "priority",
          maxPriority = 3L, s"$stage/idx")
        Dedup.deleteFromPriorityIndex(
          corpus.filter(col("doc_id") % 7 === 0),
          s"$stage/idx", s"$stage/idx_del", "doc_id", "text", "priority")
      }
      val (idx, _, idBits) = Dedup.loadPriorityIndex(s, s"$out/idx_del")
      val idMod = 1L << idBits
      idx.select(col("content_hash"),
        (col("win") % idMod).as("keep_id"),
        expr(s"win div $idMod").as("keep_priority"),
        col("dup_cnt"), col("prio_mask"))
    }),

    // the CDC CHUNK family's deletion (the p159 monoid rules under the
    // p138 plant, fold INCLUDED so the subtract combines across
    // appended snapshots): the even-corpus chunk index minus every
    // doc_id%6==0 doc — chunk hashes held only by deleted docs
    // disappear, counts shrink, and hashes whose FIRST-occurrence
    // packing sits in a deleted doc keep their count with the decoded
    // (first_doc, first_start) NULL
    "p165_chunk_index_delete" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(typedlit(cdcParagraphs),
            (col("doc_id") % 7 + 1).cast("int"))).as("text"))
      val out = withPipelineArtifact(dir, "p165_chunk_del") { stage =>
        Dedup.saveChunkIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoChunkIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.deleteFromChunkIndex(
          planted.filter(col("doc_id") % 6 === 0),
          s"$stage/idx", s"$stage/idx_del", "doc_id", "text")
      }
      val (idx, _, _, _, startBits) =
        Dedup.loadChunkIndex(s, s"$out/idx_del")
      val startMod = 1L << startBits
      idx.select(col("chunk_hash"),
        expr(s"first div $startMod").as("first_doc"),
        (col("first") % startMod).as("first_start"),
        col("cnt"))
    }),

    // the SHINGLE family's deletion (p161's per-doc-row rule on the
    // containment side): the p148-planted even-corpus inverted index
    // minus every doc_id%8==0 doc, odd batch screened for directed
    // containment against the deleted index. Oracle = p148's with the
    // deleted docs off the corpus side — including the %10==1 batch
    // excerpts whose SOURCE page was deleted, whose containment hit
    // must vanish with it
    "p166_shingle_index_delete" -> ((s, dir) => {
      val base = docs(s, dir)
      val evens = base.filter(col("doc_id") % 2 === 0)
      val batch = base.filter(col("doc_id") % 2 === 1)
        .join(evens.select((col("doc_id") + 1).as("doc_id"),
          col("text").as("__src")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1,
            concat_ws(" ", slice(tokens(col("__src")), 2, 24)))
            .otherwise(col("text")).as("text"))
      val out = withPipelineArtifact(dir, "p166_shingle_del") { stage =>
        Dedup.saveShingleIndex(evens.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", n = 3, s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoShingleIndex(evens.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.deleteFromShingleIndex(
          evens.filter(col("doc_id") % 8 === 0).select(col("doc_id")),
          s"$stage/idx", s"$stage/idx_del", "doc_id")
      }
      Dedup.containmentAgainstIndex(batch, s"$out/idx_del", "doc_id",
        "text", threshold = 0.8)
    }),

    // COMPACTION of the exact index (r13 follow-on — the
    // read-amplification fix after N folds): the even corpus lands as
    // TWO appended snapshots (%4==0 save + %4==2 fold), compaction
    // rewrites the doubled-up keys to one combined row each, and the
    // odd batch screens against the compacted index. Oracle = p109's
    // VERBATIM: serving must be byte-identical before and after
    "p167_exact_compact" -> ((s, dir) => {
      val planted = exactPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p167_exact_compact") { stage =>
        Dedup.saveExactIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoExactIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.compactExactIndex(s, s"$stage/idx", s"$stage/idx_c")
      }
      Dedup.exactAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx_c", "doc_id", "text")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("n_corpus"), col("keep"))
    }),

    // line-family compaction under the p113 plant (the shared footer
    // is the multi-row hot key the fold doubles); oracle = p113's
    // VERBATIM
    "p168_line_compact" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nshared footer please subscribe\nuniq-"),
          col("doc_id").cast("string")).as("text"))
      val out = withPipelineArtifact(dir, "p168_line_compact") { stage =>
        Dedup.saveLineIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoLineIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.compactLineIndex(s, s"$stage/idx", s"$stage/idx_c")
      }
      Dedup.linesAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx_c", "doc_id", "text")
    }),

    // priority-family compaction under the p133 plant (min win, sum
    // cnt, bit_or mask combined once); oracle = p133's VERBATIM
    "p169_priority_compact" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 < 2,
          concat(lit("grp:"), expr("doc_id div 4").cast("string")))
          .otherwise(col("text")).as("text"),
        (substring(col("source"), 4, 10).cast("long") % 4).as("priority"))
      val out = withPipelineArtifact(dir, "p169_priority_compact") { stage =>
        Dedup.savePriorityIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", "priority", maxPriority = 3L, s"$stage/idx")
        Dedup.mergeIntoPriorityIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", "priority")
        Dedup.compactPriorityIndex(s, s"$stage/idx", s"$stage/idx_c")
      }
      Dedup.priorityAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
          s"$out/idx_c", "doc_id", "text", "priority")
        .select(col("doc").as("doc_id"), col("content_hash"),
          col("keep_id"), col("keep_priority"), col("n_corpus"),
          col("n_priorities"), col("keep"))
    }),

    // chunk-family compaction under the p138 plant (min first, sum
    // cnt combined once); oracle = p138's VERBATIM
    "p170_chunk_compact" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "),
          element_at(typedlit(cdcParagraphs),
            (col("doc_id") % 7 + 1).cast("int"))).as("text"))
      val out = withPipelineArtifact(dir, "p170_chunk_compact") { stage =>
        Dedup.saveChunkIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx")
        Dedup.mergeIntoChunkIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.compactChunkIndex(s, s"$stage/idx", s"$stage/idx_c")
      }
      Dedup.chunksAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx_c", "doc_id", "text")
    }),

    // large-blocklist gate via ONE Aho-Corasick automaton walk (r13
    // follow-on — the C4 bad-words screen at real list sizes): 400
    // generated two-word phrases compile driver-side into a byte-level
    // automaton that rides the plan as a reference object; per doc,
    // the count of DISTINCT listed phrases present (byte containment ≡
    // char containment for valid UTF-8) and the gate verdict. Zero
    // shuffle, one codegen projection, O(text) independent of list
    // size — the regex-alternation class this replaces is
    // O(text × phrases)
    "p171_blocklist_gate" -> ((s, dir) => {
      val ac = graft.functions.AhoCorasick.build(BlocklistPhrases)
      docs(s, dir).select(col("doc_id"),
          graft.functions.AcDistinctMatches(lower(col("text")), ac)
            .cast("long").as("n_phrases"))
        .withColumn("keep", col("n_phrases") <= 24)
    }),

    // TAKEDOWN AUDIT (r13 follow-on — the verification half of the
    // p159 deletion): the p159 artifact chain re-run, then every
    // deleted doc audited against the REWRITTEN index — fully
    // forgotten singletons, content retained via other docs (with the
    // retained count), and forgotten-winner keys all separated, from
    // the index alone
    "p172_takedown_audit" -> ((s, dir) => {
      val corpus = exactPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p172_audit_idx") { stage =>
        Dedup.saveExactIndex(corpus, "doc_id", "text", s"$stage/idx")
        Dedup.deleteFromExactIndex(
          corpus.filter(col("doc_id") % 7 === 0),
          s"$stage/idx", s"$stage/idx_del", "doc_id", "text")
      }
      Dedup.takedownAudit(corpus.filter(col("doc_id") % 7 === 0),
        s"$out/idx_del", "doc_id", "text")
    }),

    // edit-distance near-dup over SHORT keys (r13 follow-on — the
    // prompt/title dedup regime shingle Jaccard is blind to): groups
    // of ≤3 docs share a 24-char title; members carry ONE planted
    // char substitution or deletion at position 5. Candidates from
    // the symmetric-deletion (SymSpell) equality join — lossless for
    // ed ≤ 1 by construction — verified with the threshold
    // levenshtein. The oracle is blocking-independent: brute-force
    // all-pairs levenshtein, so hash-equality certifies the
    // losslessness claim over this corpus
    "p173_editdist_dedup" -> ((s, dir) =>
      Dedup.editDistancePairs(editdistPlant(docs(s, dir)),
        "doc_id", "title", maxEdits = 1)),

    // the edit-distance STORED-INDEX screen (the title/prompt family's
    // cross-snapshot serve, fold included): even titles persist
    // (%4==0 save + %4==2 merge), odd batch screens — the %3-group
    // edits straddle the split. Oracle = p173's truth restricted to
    // cross-split pairs (blocking-independent, so the hashed-variant
    // candidates are re-certified lossless here)
    "p178_editdist_screen" -> ((s, dir) => {
      val planted = editdistPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p178_editdist_idx") { stage =>
        Dedup.saveEditDistIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "title", s"$stage/idx")
        Dedup.mergeIntoEditDistIndex(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "title")
      }
      Dedup.editDistanceAgainstIndex(
        planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "title")
    }),

    // the edit-distance family's deletion (per-doc rows — the p166
    // rule): the p178 index minus every doc_id%8==0 doc
    "p179_editdist_index_delete" -> ((s, dir) => {
      val planted = editdistPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p179_editdist_del") { stage =>
        Dedup.saveEditDistIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "title", s"$stage/idx")
        Dedup.mergeIntoEditDistIndex(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "title")
        Dedup.deleteFromEditDistIndex(
          planted.filter(col("doc_id") % 8 === 0).select(col("doc_id")),
          s"$stage/idx", s"$stage/idx_del", "doc_id")
      }
      Dedup.editDistanceAgainstIndex(
        planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx_del", "doc_id", "title")
    }),

    // winnowing fingerprint overlap (r13 follow-on — MOSS, the
    // formatting-insensitive clone detector byte-CDC can't be): each
    // group of 3 docs carries ONE group-unique code-ish snippet in
    // three formattings (spaces / newline+indent / tabs) — the same
    // token stream, so the members must pair on shared fingerprints
    // even though every byte offset differs. Body-text gram
    // coincidences are part of the truth: the oracle replays the full
    // tokenize→gram→window-min pipeline over ALL pairs
    "p174_winnow_overlap" -> ((s, dir) =>
      Dedup.winnowOverlap(winnowPlant(docs(s, dir)), "doc_id", "text",
        k = 4, w = 4, minShared = 4, maxDf = 100000)),

    // the winnow STORED-INDEX screen (the ninth index family's
    // cross-snapshot serve, fold included): even ids' fingerprint
    // postings persist (%4==0 save + %4==2 merge), odd batch docs
    // screen — the %3-group snippets straddle the even/odd split, so
    // the match only happens through the stored postings. Oracle =
    // p174's CTEs restricted to cross-split pairs
    "p175_winnow_screen" -> ((s, dir) => {
      val planted = winnowPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p175_winnow_idx") { stage =>
        Dedup.saveWinnowIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoWinnowIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
      }
      Dedup.winnowAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text", minShared = 4)
    }),

    // the winnow family's deletion (per-doc posting rows — the p166
    // rule): the p175 index minus every doc_id%8==0 doc, odd batch
    // screened; oracle = p175's with the deleted evens off the corpus
    // side
    "p176_winnow_index_delete" -> ((s, dir) => {
      val planted = winnowPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p176_winnow_del") { stage =>
        Dedup.saveWinnowIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoWinnowIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.deleteFromWinnowIndex(
          planted.filter(col("doc_id") % 8 === 0).select(col("doc_id")),
          s"$stage/idx", s"$stage/idx_del", "doc_id")
      }
      Dedup.winnowAgainstIndex(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx_del", "doc_id", "text", minShared = 4)
    }),

    // the winnow family's bloom fast path — no false negatives ⇒
    // p175's IDENTICAL relation (oracle verbatim, the per-family
    // pattern)
    "p177_winnow_bloom" -> ((s, dir) => {
      val planted = winnowPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p177_winnow_bloom_idx") { stage =>
        Dedup.saveWinnowIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx", maxDf = 100000)
        Dedup.mergeIntoWinnowIndex(planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text")
        Dedup.buildWinnowBloom(s, s"$stage/idx", expectedItems = 2000000L)
      }
      Dedup.winnowAgainstIndexBloom(planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text", minShared = 4)
    }),

    // the winnow family's bucketed backfill — p175's oracle VERBATIM
    // over the catalog path (the established per-family pattern)
    "p180_winnow_backfill" -> ((s, dir) => {
      val planted = winnowPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p180_winnow_idx_bucketed") { stage =>
        val bp = s"p180_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveWinnowIndexBucketed(
          planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", s"$stage/idx", maxDf = 100000, nBuckets = 8,
          tablePrefix = bp)
        Dedup.mergeIntoWinnowIndexBucketed(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "text", tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_winnow")
      }
      Dedup.winnowAgainstIndexBucketed(
        planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "text", minShared = 4)
    }),

    // the edit-distance family's bloom fast path — p178's IDENTICAL
    // relation (no false negatives; oracle verbatim)
    "p181_editdist_bloom" -> ((s, dir) => {
      val planted = editdistPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p181_editdist_bloom_idx") { stage =>
        Dedup.saveEditDistIndex(planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "title", s"$stage/idx")
        Dedup.mergeIntoEditDistIndex(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "title")
        Dedup.buildEditDistBloom(s, s"$stage/idx",
          expectedItems = 2000000L)
      }
      Dedup.editDistanceAgainstIndexBloom(
        planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "title")
    }),

    // the edit-distance family's bucketed backfill — p178's oracle
    // VERBATIM over the catalog path
    "p182_editdist_backfill" -> ((s, dir) => {
      val planted = editdistPlant(docs(s, dir))
      val out = withPipelineArtifact(dir, "p182_editdist_idx_bucketed") { stage =>
        val bp = s"p182_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveEditDistIndexBucketed(
          planted.filter(col("doc_id") % 4 === 0),
          "doc_id", "title", s"$stage/idx", nBuckets = 8,
          tablePrefix = bp)
        Dedup.mergeIntoEditDistIndexBucketed(
          planted.filter(col("doc_id") % 4 === 2),
          s"$stage/idx", "doc_id", "title", tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_editdist")
      }
      Dedup.editDistanceAgainstIndexBucketed(
        planted.filter(col("doc_id") % 2 === 1),
        s"$out/idx", "doc_id", "title")
    }),

    // robots.txt PARSING (RFC 9309 §2.1-2.2 — the other half of the
    // REP loop; p154 proves the matcher, this proves raw file → rule
    // relation): one templated body per planted host (RobotsBodies,
    // interpolated into BOTH sides) parsed for agent 'graftbot' —
    // comments, ignored fields, group boundaries, the exact-beats-star
    // tier rule, multi-agent headers, orphan rules, case/spacing
    // variants and the empty-Disallow convention all exercised
    "p155_robots_parse" -> ((s, dir) => {
      val body = RobotsBodies.zipWithIndex.tail.foldLeft(
        when(col("t") === 0, lit(RobotsBodies.head))) {
        case (acc, (b, i)) => acc.when(col("t") === i, lit(b))
      }
      val hosts = docs(s, dir)
        .select((expr("doc_id div 4") % 10).cast("int").as("h")).distinct()
        .select(concat(lit("site"), col("h").cast("string"),
          lit(".example.org")).as("host"), (col("h") % 5).as("t"))
        .withColumn("body", body)
      UrlOps.parseRobotsTxt(hosts, "host", "body", "graftbot")
    }),

    // per-language tokenizer-coverage / OOV report over the SAME stored
    // WordPiece artifact as p112 — the tokenizer-QA table every vocab
    // bump ships with: words, pieces, [UNK] words, unk-permille and
    // fertility (pieces per word, milli) by language. One segmentation
    // projection + one ≤|langs|-row rollup; all-integer milli ratios.
    "p134_oov_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val tokDir = withPipelineArtifact(dir, "p112_wordpiece") { stage =>
        TokenizerIO.saveWordPiece(
          WordPiece.vocabFrame(d, "text", topWords = 12), "[UNK]",
          s"$stage/wp")
      }
      val (vocab, unk) = TokenizerIO.loadWordPiece(s, s"$tokDir/wp")
      // r13 optimization: fused codegen serve pass (SegmentServeSpec)
      d.select(col("lang"), tokens(col("text")).as("toks"))
        .withColumn("__st", graft.functions.SegmentServe.wordPiece(
          col("toks"), vocab, unk, 100))
        .select(col("lang"),
          size(col("toks")).cast("long").as("nw"),
          col("__st.n_pieces").as("np"),
          col("__st.n_unk").as("nu"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_words"),
          sum("np").as("n_pieces"), sum("nu").as("n_unk"))
        .withColumn("unk_permille",
          expr("(n_unk * 1000) div greatest(n_words, 1)"))
        .withColumn("fertility_milli",
          expr("(n_pieces * 1000) div greatest(n_words, 1)"))
    }),

    // SCALE-SAFE hard-negative mining (round-11, the round-10
    // verdict's one `weak` closed): p104's label-inequality top-k,
    // but candidates come from the banded hyperplane LSH — per-query
    // verify cost tracks bucket collisions, never the corpus, and the
    // corpus contributes two exchange-free scans. The md5-derived
    // plane family is replayed in the oracle (the p69 CTEs), so the
    // whole thing — candidates, label filter, exact-cosine rank — is
    // hash-exact, not rows-only. p104 stays registered as the
    // exact-truth baseline.
    "p111_hard_negatives_lsh" -> ((s, dir) =>
      Similarity.hardNegativesBandedTopK(
        emb(s, dir), emb(s, dir).filter(col("vec_id") < 20), k = 5,
        tables = 16, planesPerTable = 8, dim = 64)),

    // the band-geometry knob ORACLE-CERTIFIED (round-10): p82's exact
    // plant and oracle, screened at the WIDE geometry. At maxHamming=4,
    // nBlocks=6 the pigeonhole keys span nBlocks-maxHamming = 2 of the
    // six 8-bit blocks: C(6,2) = 15 two-block combos with 16-bit keys,
    // vs the minimal geometry's 5 blocks keyed on 1 block of ~9-10 bits
    // — wider keys, fewer random collisions per cell.
    // Pigeonhole banding is LOSSLESS at any nBlocks > maxHamming, so
    // the oracle is geometry-independent — a hash-exact match here is
    // a proof the wider keys drop only CANDIDATES, never pairs
    "p102_hamming_wide" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val planted = Multimodal.imageDHash(grouped).withColumn("dhash",
        col("dhash")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      Dedup.hammingPairsIncremental(
        planted.filter(col("doc_id") % 2 === 1),
        planted.filter(col("doc_id") % 2 === 0),
        "doc_id", "dhash", maxHamming = 4, nBlocks = 6)
    }),

    // the bucketed backfill screen ORACLE-CERTIFIED (round-10): p71's
    // exact plant and oracle, but the corpus index is persisted in the
    // bucketBy layout and the batch screens through
    // nearDupAgainstIndexBucketed — hash-exact equality proves the
    // catalog path (bucketed scans, split candidate joins, semi-filtered
    // verify) returns the identical relation
    "p103_backfill_screen" -> ((s, dir) => {
      val d = docs(s, dir)
      // the bucketed index is a build-once artifact (the p96 rationale:
      // plan construction must not re-pay the index build or leak a
      // dir). The BUILD registers its catalog tables under a
      // process-unique prefix and drops them right after the save — the
      // data files survive the atomic move, the staging-path DDL must
      // not — and the SCREEN re-registers at the final path under the
      // default prefix (a hash of that path, so two sf dirs in one
      // session can never collide on a table name)
      val out = withPipelineArtifact(dir, "p103_minhash_idx") { stage =>
        val bp = s"p103_build_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}"
        Dedup.saveMinhashIndexBucketed(
          Dedup.minhashIndex(d.filter(col("doc_id") % 2 === 0),
            "doc_id", "text", n = 3, k = 32, bands = 8),
          s"$stage/idx", 3, nBuckets = 8, tablePrefix = bp)
        s.sql(s"DROP TABLE IF EXISTS ${bp}_docs")
        s.sql(s"DROP TABLE IF EXISTS ${bp}_bands")
      }
      Dedup.nearDupAgainstIndexBucketed(
        d.filter(col("doc_id") % 2 === 1), s"$out/idx", "doc_id", "text",
        threshold = 0.4)
    }),

    // image near-dup via perceptual dHash + the simhash Hamming-banding
    // machinery: text blobs always take the md5 fallback hash (the p12
    // dispatch precedent — the REAL luma-grid path is pinned by
    // MultimodalDecodeSpec), so the query plants its own duplicate
    // structure: groups of ≤3 docs share the group leader's bytes as
    // their "image", then members get 1–2 doc-derived bit flips — the
    // re-encode/resize drift dHash is designed to absorb — and the
    // banded pairer must recover every within-group pair at Hamming ≤ 4
    "p74_image_dhash_neardup" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val sig = Multimodal.imageDHash(grouped)
      val planted = sig.withColumn("dhash",
        col("dhash")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      Dedup.hammingPairs48(planted, "doc_id", "dhash", maxHamming = 4)
    }),

    // cluster-balanced selection (D4-style curation): p64's 16-seed
    // assignment, then an md5-draw rank within each cluster caps every
    // cluster at 12 — head modes can't dominate the selected set
    "p76_cluster_balanced" -> ((s, dir) =>
      Similarity.clusterBalancedSelect(emb(s, dir), k = 16, perCluster = 12)),

    // audio-fingerprint near-dup, the p74 pattern over the audio
    // signature: text bytes are never decodable audio so the oracle
    // pins the md5-fallback dispatch + the banded pairer; the REAL
    // spectral path is pinned by MultimodalDecodeSpec's synthesized
    // WAVs. Same planted group/flip structure as p74
    "p80_audio_fp_neardup" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val grouped = d.select(col("doc_id"))
        .join(base, col("doc_id") - col("doc_id") % 3 === col("bid"))
        .select(col("doc_id"), encode(col("btext"), "UTF-8").as("media"))
      val sig = Multimodal.audioFingerprint(grouped)
      val planted = sig.withColumn("afp",
        col("afp")
          .bitwiseXOR(when(col("doc_id") % 3 >= 1,
            expr("shiftleft(1L, cast(doc_id % 48 as int))"))
            .otherwise(lit(0L)))
          .bitwiseXOR(when(col("doc_id") % 3 === 2,
            expr("shiftleft(1L, cast((doc_id * 31 + 17) % 48 as int))"))
            .otherwise(lit(0L))))
      Dedup.hammingPairs48(planted, "doc_id", "afp", maxHamming = 4)
    }),

    // URL canonicalization dedup: every doc carries ONE planted URL
    // whose raw spelling exercises a different RFC 3986 normalization
    // each residue — scheme/host case (%2), default :80 port (%3),
    // trailing slash (%2), tracking params + param ORDER (%2),
    // fragment (%2) — so ~210 raw spellings per (host,page,id) triple
    // collapse into one canonical key and n_raw_variants < n_urls
    "p77_url_canonical_dedup" -> ((s, dir) =>
      UrlOps.urlCanonicalDedup(
        docs(s, dir).select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, lit("HTTP")).otherwise(lit("http")),
            lit("://Site"), (col("doc_id") % 10).cast("string"),
            lit(".Example.COM"),
            when(col("doc_id") % 3 === 0, lit(":80")).otherwise(lit("")),
            lit("/Page/"), (col("doc_id") % 7).cast("string"),
            when(col("doc_id") % 2 === 1, lit("/")).otherwise(lit("")),
            when(col("doc_id") % 2 === 0,
              concat(lit("?id="), (col("doc_id") % 5).cast("string"),
                lit("&utm_source=feed")))
              .otherwise(concat(lit("?utm_source=feed&utm_campaign=x&id="),
                (col("doc_id") % 5).cast("string"))),
            lit("#s"), (col("doc_id") % 2).cast("string")).as("raw_url")),
        "doc_id", "raw_url")),

    // filtering funnel (the Dolma/FineWeb per-stage rejection table):
    // every doc gets a gate-passing 5-sentence/44-word suffix, then
    // each %4 residue breaks exactly one later gate — a '#'-flood
    // token (gopher symbol ratio), a lorem line (c4), a blocklisted
    // token on its own proper sentence line (wordlist) — so all four
    // attribution branches are populated and first-fail order matters
    "p83_filter_funnel" -> ((s, dir) =>
      Quality.filterFunnel(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit("\n" + FunnelPasser),
            when(col("doc_id") % 4 === 1, lit(" " + "#" * 40))
              .when(col("doc_id") % 4 === 2, lit("\nlorem ipsum dolor sit amet."))
              .when(col("doc_id") % 4 === 3, lit("\nbadword ends the line today."))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text", blocklist = Seq("badword"))),

    // FineWeb line corrections: residue-keyed furniture lines (a page
    // counter, a social counter, an all-caps nav row) planted around a
    // keeper sentence; %2/%3/%5 residues vary the per-rule counts and
    // a 5-token caps line pins the token bound (caps but too long to
    // be nav chrome -> must SURVIVE)
    "p85_line_corrections" -> ((s, dir) =>
      Quality.lineCorrections(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 2 === 0, lit("\n42 / 107")).otherwise(lit("")),
            when(col("doc_id") % 3 === 0,
              concat(lit("\n"), (col("doc_id") % 90).cast("string"),
                lit(" likes"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0, lit("\nHOME ABOUT CONTACT"))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0, lit("\n12 THINGS WE KEPT TODAY"))
              .otherwise(lit("")),
            lit("\nthis closing line clearly stays here.")).as("text")),
        "doc_id", "text")),

    // main-content extraction (the trafilatura/jusText step between
    // WARC text and the quality gates): docs wrapped in planted page
    // chrome — nav/aside/footer SUBTREES (must vanish wholesale), a
    // link-heavy promo div (survives pruning, dropped by the 20%
    // link-density rule), a short title block and a %3-keyed stub
    // paragraph (dropped by the 25-char floor) around the real prose
    // <p> (must be the sole survivor). Projection-only, the p49 plant
    // mirrored in the oracle
    "p89_main_content" -> ((s, dir) => {
      val wrapped = docs(s, dir).select(col("doc_id"), concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style></head><body>"),
        lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a>" +
          " <a href=\"/faq\">FAQ</a></nav>"),
        lit("<div><a href=\"/l1\">Latest stories</a>" +
          " <a href=\"/l2\">Top picks</a> read</div>"),
        lit("<p>"), col("text"), lit("</p>"),
        when(col("doc_id") % 3 === 0, lit("<p>ok.</p>")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          lit("<aside>Related: <a href=\"/r\">one</a></aside>"))
          .otherwise(lit("")),
        lit("<footer>(c) 2026 Example &amp; Co</footer></body></html>"))
        .as("html"))
      wrapped
        .select(col("doc_id"),
          TextOps.mainContentBlocks(col("html"), McMinChars, McLinkPct).as("mc"))
        .select(col("doc_id"),
          col("mc.n_blocks").as("n_blocks"),
          col("mc.n_kept").as("n_kept"),
          length(col("mc.text_main")).cast("long").as("len_main"),
          col("mc.text_main").as("text_main"))
    }),

    // corpus-trained classifier SERVED through the gate (the DCLM /
    // FineWeb-Edu loop): weak labels derived IN-PLAN by the Gopher
    // rule over a plant that makes the bad class surface-learnable
    // (every 3rd doc gains a '#' flood that trips symbol_word_ratio;
    // the passer paragraph keeps the rest green), perceptron fit on
    // the EVEN-id half via trainFromDF (hash-gated, id-resorted,
    // partitioning-independent), served over the held-out ODD half as
    // one codegen projection. Training is an order-sensitive driver
    // loop — not SQL-replayable (the p47/p62 class), so the query is
    // rows-only with an in-plan held-out-agreement certificate
    // (assert_true >= 0.9, the withRecall shape) standing for the
    // oracle
    "p90_trained_quality_gate" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\n" + FunnelPasser),
          when(col("doc_id") % 3 === 0,
            lit("\n########## ########## ########## ##########"))
            .otherwise(lit(""))).as("text"))
      val labeled = Quality.gopherRules(planted, "doc_id", "text")
        .select(col("doc_id"),
          when(col("keep"), lit("good")).otherwise(lit("bad")).as("weak_label"))
        .join(planted, "doc_id")
      // rows-only query certified in-plan: the ring feature family
      // serves ~10× cheaper than md5-per-gram and nothing here needs
      // the oracle-mirrorable bucket function. r13: the trained weights
      // are a build-once artifact (the p100/p47 rationale — the
      // driver-loop perceptron is a pure function of the corpus and
      // must not re-run per plan construction); the held-out-agreement
      // certificate still computes IN-PLAN on every invocation.
      val gateDir = withPipelineArtifact(dir, "p90_gate_ring256") { stage =>
        TextClassifier.saveWeights(s, s"$stage/w", Seq("good", "bad"),
          b = 256, fast = true,
          TextClassifier.trainFromDF(
            labeled.filter(col("doc_id") % 2 === 0),
            "doc_id", "weak_label", "text", Seq("good", "bad"), b = 256,
            TextClassifier.bucketsRing(_, 256), maxSamples = 2000))
      }
      TextClassifier.serveCertified(
        labeled.filter(col("doc_id") % 2 === 1),
        "doc_id", "weak_label", "text", Seq("good", "bad"), b = 256,
        TextClassifier.loadWeights(s, s"$gateDir/w", Seq("good", "bad"),
          b = 256, fast = true),
        agreementFloor = 0.9, fast = true)
    }),

    // clean-corpus v2 — the flagship integration query: the FULL
    // FineWeb-order recipe (main-content extraction → line corrections
    // → Gopher/C4/wordlist gates → email+card+IBAN PII scrubs → exact
    // dedup → minhash near-dup canonical keep → SemDeDup-LSH verdicts)
    // over pages built from the corpus. Plant, all keyed by the BASE id
    // so copies stay byte-identical: every doc wears nav/link-farm/
    // footer chrome, carries an email + valid card + valid IBAN in its
    // prose, and the FunnelPasser paragraph; bid%5==1 adds a '#'-flood
    // block (gopher kill), %5==2 a lorem sentence (C4 kill), %5==3 a
    // badword sentence (wordlist kill); bid%2==0 adds a numeric
    // furniture block (line-corrected away, doc survives); doc_id%10==7
    // docs are EXACT copies of id-1, %10==9 near-copies of id-1 (one
    // extra sentence word — minhash @0.8 pairs them, min-id keeps the
    // base). Semantic verdicts are p69's exact configuration over the
    // embedding table; non-kept vec_ids drop their surviving docs
    "p91_clean_corpus_v2" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
      val src = d.select(col("doc_id"),
        (col("doc_id") - when(col("doc_id") % 10 === 7 ||
          col("doc_id") % 10 === 9, 1).otherwise(0)).as("bid"))
        .join(base, "bid")
      val body = concat(col("btext"),
        lit(" contact user"), col("bid").cast("string"),
        lit("@example.com pay 4111 1111 1111 1111 now acct" +
          " DE89370400440532013000 ok. " + FunnelPasser),
        when(col("bid") % 5 === 2,
          lit(" and lorem ipsum appears here sadly.")).otherwise(lit("")),
        when(col("bid") % 5 === 3,
          lit(" a badword slipped into prose today.")).otherwise(lit("")),
        when(col("doc_id") % 10 === 9, lit(" extranine.")).otherwise(lit("")))
      val html = concat(
        lit("<html><head><title>Doc</title></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
          "<div><a href=\"/l1\">Latest stories</a>" +
          " <a href=\"/l2\">Top picks</a> go</div><p>"),
        body, lit("</p>"),
        when(col("bid") % 5 === 1,
          lit("<p>########## ########## ########## ##########</p>"))
          .otherwise(lit("")),
        when(col("bid") % 2 === 0,
          lit("<p>42 / 107 13.5% 2024-01-02 10:11 99/100</p>"))
          .otherwise(lit("")),
        lit("<footer>(c) 2026 Example</footer></body></html>"))
      Dedup.cleanCorpusV2(
        src.select(col("doc_id"), html.as("html")), emb(s, dir),
        "doc_id", "html", blocklist = Seq("badword"), threshold = 0.8)
    }),

    // GPT-2 regex pre-tokenization (the byte-level-BPE front end): a
    // plant exercises every alternation branch — contractions, digit
    // runs, punctuation runs, multi-space/tab/newline whitespace runs
    // (the lookahead rule's cases) — and the output pins the count per
    // branch, an md5 of the full pre-token list, and the LOSSLESS
    // partition property (concat(pretokens) == text) as a hashed
    // boolean. The marker transform makes the lookahead-free chain
    // RE2-replayable, so the oracle runs the identical algebra
    "p92_gpt2_pretokenize" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit("\n\nDon't stop; we'll go 1234 times!!  "),
          when(col("doc_id") % 3 === 0, lit("\t\tindented tail here"))
            .otherwise(lit("spaced   out   tail")),
          when(col("doc_id") % 4 === 0, lit(" I'm done, you're not."))
            .otherwise(lit(" trailing spaces  "))).as("text"))
      val pt = planted.select(col("doc_id"), col("text"),
        BpeByte.pretokens(col("text")).as("pts"))
      pt.select(col("doc_id"),
        size(col("pts")).cast("long").as("n_pretokens"),
        size(filter(col("pts"),
          t => t.startsWith(" ") && t.rlike(s"[^${BpeByte.Ws}]")))
          .cast("long").as("n_space_prefixed"),
        size(filter(col("pts"), t => t.rlike(s"^[${BpeByte.Ws}]+$$")))
          .cast("long").as("n_ws_runs"),
        size(filter(col("pts"),
          t => t.isin("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")))
          .cast("long").as("n_contractions"),
        md5(array_join(col("pts"), "\u001f")).as("pt_hash"),
        (array_join(col("pts"), "") === BpeByte.stripMarker(col("text")))
          .as("lossless"))
    }),

    // byte-level BPE end to end (train on the corpus's own pre-token
    // dictionary, segment every pre-token over the 256-byte mapped
    // alphabet): training is the driver-local indexed loop (the p47
    // class — not SQL-replayable), so the query is rows-only with TWO
    // in-plan asserts standing for the oracle: every pre-token's
    // segments concatenate back to its byte-mapped form, and the
    // unmapped concatenation of ALL segments reproduces the original
    // text byte for byte — the lossless property that distinguishes
    // this family from the whitespace tokenizers (p45/p47)
    "p93_byte_bpe" -> ((s, dir) => {
      // the p92 plant rides along so the byte path crosses newlines,
      // tabs, digits, punctuation and contractions — the branches a
      // letters-only corpus never exercises; 24 merges (the corpus
      // vocabulary is ~40 pretokens) keep segmentation NON-trivial:
      // frequent pretokens merge to one token, the tail stays split
      def planted(d: DataFrame) = d.select(col("doc_id"),
        concat(col("text"),
          lit("\n\nDon't stop; we'll go 1234 times!!  "),
          when(col("doc_id") % 3 === 0, lit("\t\tindented tail here"))
            .otherwise(lit("spaced   out   tail"))).as("text"))
      // r13: build-once trained-merge artifact (the p100/p47 rationale)
      val tokDir = withPipelineArtifact(dir, "p93_bpe24") { stage =>
        TokenizerIO.saveBpe(BpeByte.trainMerges(planted(docs(s, dir)),
          "text", nMerges = 24, maxWords = 100000), s, s"$stage/bpe")
      }
      val merges = TokenizerIO.loadBpe(s, s"$tokDir/bpe")
        .map(m => (m._2, m._3))
      // r13 optimization: fused codegen serve pass (same kernels, same
      // values — SegmentServeSpec) replaces the interpreted HOF chain
      planted(docs(s, dir))
        .select(col("doc_id"), col("text"),
          BpeByte.pretokens(col("text")).as("pts"))
        .withColumn("__st", graft.functions.SegmentServe.bpe(
          col("pts"), merges, Seq.empty, byteMode = true))
        .select(col("doc_id"),
          size(col("pts")).cast("long").as("n_pretokens"),
          col("__st.n_segments").as("n_tokens"),
          col("__st.rebuilt_ok").as("rebuilt_ok"),
          (graft.functions.ByteUnicode.toBytes(col("__st.seg_concat"))
            === BpeByte.stripMarker(col("text"))).as("lossless"))
        .filter(assert_true(col("rebuilt_ok") && col("lossless"),
          concat(lit("byte-BPE reconstruction failed for doc "),
            col("doc_id").cast("string"))).isNull)
    }),

    // per-LINE language segmentation (the FineWeb-2/CCNet
    // mixed-document detector — docs whose paragraphs disagree on
    // language are either boilerplate-contaminated or need splitting
    // before monolingual training): three planted lexicon lines per
    // doc (line 1 flips to German on %4==0, line 2 to French on
    // %5==0), each line classified by the p61 scorer under a
    // composite line id, then one doc rollup: line count, distinct
    // predicted languages, the dominant language (max line count, tie
    // -> lexicographically smallest — a 3-row window per doc), mixed
    // flag. Plan: classify is one codegen projection over the exploded
    // line relation; the rollup shuffles (doc, lang) longs only
    "p94_line_langs" -> ((s, dir) => {
      def lineWords(l: String, line: Int) =
        concat_ws(" ", (0 until 10).map(k =>
          element_at(typedLit(LangId.Lexicons(l).toArray),
            (pmod(col("doc_id") * 7 + line * 11 + k * 3, lit(10)) + 1)
              .cast("int"))): _*)
      val l0 = lineWords("en", 0)
      val l1 = when(col("doc_id") % 4 === 0, lineWords("de", 1))
        .otherwise(lineWords("en", 1))
      val l2 = when(col("doc_id") % 5 === 0, lineWords("fr", 2))
        .otherwise(lineWords("en", 2))
      val lines = docs(s, dir).select(col("doc_id"),
        posexplode(array(l0, l1, l2)).as(Seq("pos", "line")))
        .select((col("doc_id") * 10 + col("pos")).as("lid"), col("line"))
      val scored = LangId.classify(lines, "lid", "line")
        .select(expr("lid div 10").as("doc_id"), col("lang_pred"))
      val perLang = scored.groupBy("doc_id", "lang_pred")
        .agg(count(lit(1)).as("__n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(col("__n").desc, col("lang_pred"))
      perLang
        .withColumn("__rk", row_number().over(w))
        .groupBy("doc_id")
        .agg(sum("__n").cast("long").as("n_lines"),
          count(lit(1)).cast("long").as("n_langs"),
          max(when(col("__rk") === 1, col("lang_pred"))).as("dominant_lang"),
          max(when(col("__rk") === 1, col("__n"))).cast("long")
            .as("n_dominant"))
        .withColumn("is_mixed", col("n_langs") >= 2)
    }),

    // Flesch–Kincaid readability (the edu-quality surface signal):
    // the corpus text carries no sentence punctuation, so a planted
    // closing sentence (plus a %3-keyed extra one, varying W/S) gives
    // the formulas their denominator; all ratios double-identical by
    // mirrored nesting, rounded at 6 dp
    "p95_readability" -> ((s, dir) =>
      Quality.readability(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(". and so it goes."),
            when(col("doc_id") % 3 === 0,
              lit(" more plain text follows here.")).otherwise(lit("")))
            .as("text")),
        "doc_id", "text")),

    // JSONL interchange round-trip (the format every public
    // training-data release ships): write the corpus as one JSON
    // object per line, read it back strict under the explicit schema —
    // the oracle is the IDENTITY over the source table, so any
    // escaping loss (newlines, quotes, unicode, nulls) hash-fails
    "p96_jsonl_roundtrip" -> ((s, dir) => {
      // build-once artifact (withPipelineArtifact): the write happens
      // once per (code, data) stamp — repeated plan construction
      // (PlanShapeSpec sweeps every registered plan) neither re-pays
      // the write nor leaks a temp dir, and concurrent sessions race
      // safely through the stage + atomic-rename
      val out = withPipelineArtifact(dir, "p96_jsonl") { stage =>
        graft.sources.JsonlCorpus.write(
          docs(s, dir).select("doc_id", "text", "lang", "source", "n_chars"),
          s"$stage/data")
      }
      graft.sources.JsonlCorpus.read(s, s"$out/data",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
    }),

    // cross-source near-dup attribution (the provenance matrix Dolma /
    // CCNet-style reports publish: which feeds duplicate which — a
    // crawl dump re-ingesting another source shows up as an off-
    // diagonal spike): p3's minhash pairs joined to each side's source,
    // counted per unordered source pair. The pair machinery is the
    // verified operator; this is the narrow (doc, source) attribution
    // join on top
    "p97_dedup_source_matrix" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.4)
      val src = d.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          "doc_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).cast("long").as("n_pairs"))
    }),

    // context-length fit report (the first question a training run asks
    // of a corpus: at sequence length L, how many documents truncate
    // and what fraction of tokens falls off the end): per candidate L,
    // docs over the limit, tokens lost, and the lost fraction — ONE
    // token-count projection exploded against the 3-row L literal,
    // then a 3-group aggregate
    "p98_context_fit" -> ((s, dir) =>
      docs(s, dir)
        .select(size(tokens(col("text"))).cast("long").as("__n"))
        .select(col("__n"), explode(typedLit(Seq(32L, 64L, 128L))).as("ctx_len"))
        .groupBy("ctx_len")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("__n") > col("ctx_len"), 1L).otherwise(0L))
            .cast("long").as("n_truncated"),
          sum(col("__n")).cast("long").as("n_tokens"),
          sum(greatest(col("__n") - col("ctx_len"), lit(0L))).cast("long")
            .as("tokens_lost"))
        .withColumn("lost_frac",
          round(col("tokens_lost") * lit(1.0) / col("n_tokens"), 6))),

    // corpus datasheet (Gebru '21 "Datasheets for Datasets" / the
    // summary table every public release ships — Dolma §4, The Pile
    // appendix): ONE row of corpus-level facts — sizes, language and
    // source diversity, the exact-dup rate, Gopher/C4 pass rates over
    // the RAW text, and PII incidence. Every metric is an aggregate of
    // an already-verified operator; the one-row frames attach via the
    // documented broadcast scalar shape
    "p99_corpus_datasheet" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(size(tokens(col("text")))).cast("long").as("n_tokens"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        countDistinct(col("source")).cast("long").as("n_sources"),
        countDistinct(md5(col("text"))).cast("long").as("n_unique_docs"))
      val topLang = d.groupBy("lang").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("lang")).limit(1)
        .select(col("lang").as("top_lang"),
          col("__c").cast("long").as("top_lang_docs"))
      val gop = Quality.gopherRules(d, "doc_id", "text")
        .agg(round(avg(col("keep").cast("double")), 6).as("gopher_pass_frac"))
      val c4 = Quality.c4Clean(d, "doc_id", "text")
        .agg(round(avg(col("keep").cast("double")), 6).as("c4_pass_frac"))
      val pii = Quality.piiScrub(d, "doc_id", "text")
        .agg(sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0,
          1L).otherwise(0L)).cast("long").as("docs_with_pii"))
      base
        .crossJoin(broadcast(topLang))
        .crossJoin(broadcast(gop))
        .crossJoin(broadcast(c4))
        .crossJoin(broadcast(pii))
        .withColumn("dup_doc_frac",
          round((col("n_docs") - col("n_unique_docs")) * lit(1.0) /
            col("n_docs"), 6))
        .withColumn("top_lang_frac",
          round(col("top_lang_docs") * lit(1.0) / col("n_docs"), 6))
    }),

    // release export (VERDICT r9 gap #4 — the loop's last step): the
    // corpus shipped through Release.releaseCorpus — deterministic
    // md5 shards, gzip JSONL, and the in-call identity certificate
    // (count + full-column checksum of the read-back vs the input) —
    // then read back as the query result. The oracle is the p96
    // identity: ANY loss in sharding, escaping, compression or parse
    // hash-fails against the source relation
    "p101_release_export" -> ((s, dir) => {
      // build-once artifact (the p96 rationale): the export — including
      // its in-call identity certificate — runs once per (code, data)
      // stamp instead of on every plan construction
      val out = withPipelineArtifact(dir, "p101_release") { stage =>
        val corpus = docs(s, dir)
          .select("doc_id", "text", "lang", "source", "n_chars")
        graft.pipeline.Release.releaseCorpus(corpus, "doc_id",
          s"$stage/data", nShards = 8, compression = "gzip")
      }
      graft.sources.JsonlCorpus.read(s, s"$out/data",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_chars",
            org.apache.spark.sql.types.LongType))))
    }),

    // context-length fit in REAL tokenizer units (VERDICT r9 gap #3): a
    // training run budgets context in BPE tokens, not whitespace words
    // — p98's truncation histogram restated under a PERSISTED byte-BPE
    // merge table (train → TokenizerIO round-trip → BpeSegment, the
    // exact production serve path), whitespace and BPE counts side by
    // side. The merge loop is not SQL-replayable (the p47/p93 class),
    // so the query is rows-only with the p93 lossless assert standing
    // for the oracle: the unmapped concatenation of every doc's
    // segments must reproduce its (U+0001-stripped) text byte-exactly
    // — any segmentation defect fails the WHOLE query, loudly
    "p100_bpe_context_fit" -> ((s, dir) => {
      val d = docs(s, dir)
      // 64 merges against the small test-corpus vocabulary keeps
      // segmentation NON-trivial (the p93 sizing note: enough merges
      // and every pretoken collapses to one token, making n_bpe ==
      // n_ws and the report degenerate); production loads a stored
      // 32k table here instead of training inline
      // the TRAINED merge table is a build-once artifact (the p96
      // rationale): repeated plan construction must not re-run the
      // driver-loop trainer, and the persisted form IS the production
      // serve path the query claims to exercise
      val tokDir = withPipelineArtifact(dir, "p100_bpe64") { stage =>
        val merges0 = BpeByte.trainMerges(d, "text", nMerges = 64,
          maxWords = 100000)
        TokenizerIO.saveBpe(merges0, s, s"$stage/bpe")
      }
      val merges = TokenizerIO.loadBpe(s, s"$tokDir/bpe")
        .map(m => (m._2, m._3))
      // narrow per-doc counts persisted: the segmentation HOF chain is
      // the expensive part and must run ONCE per doc, not once per
      // exploded ctx_len row (interpreted HOFs get no CSE)
      // r13 optimization: fused codegen serve pass (SegmentServeSpec)
      val per = d
        .select(col("text"), size(tokens(col("text"))).cast("long").as("n_ws"),
          BpeByte.pretokens(col("text")).as("pts"))
        .withColumn("__st", graft.functions.SegmentServe.bpe(
          col("pts"), merges, Seq.empty, byteMode = true))
        .withColumn("n_bpe", col("__st.n_segments"))
        .withColumn("lossless", graft.functions.ByteUnicode.toBytes(
          col("__st.seg_concat")) === BpeByte.stripMarker(col("text")))
        .filter(assert_true(col("lossless"),
          lit("byte-BPE context-fit segmentation not lossless")).isNull)
        .select("n_ws", "n_bpe")
        .persistTracked()
      per
        .select(col("n_ws"), col("n_bpe"),
          explode(typedLit(Seq(32L, 64L, 128L))).as("ctx_len"))
        .groupBy("ctx_len")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("n_ws") > col("ctx_len"), 1L).otherwise(0L))
            .cast("long").as("ws_truncated"),
          sum(when(col("n_bpe") > col("ctx_len"), 1L).otherwise(0L))
            .cast("long").as("bpe_truncated"),
          sum(col("n_ws")).cast("long").as("ws_tokens"),
          sum(col("n_bpe")).cast("long").as("bpe_tokens"),
          sum(greatest(col("n_bpe") - col("ctx_len"), lit(0L)))
            .cast("long").as("bpe_tokens_lost"))
        .withColumn("bpe_per_ws",
          round(col("bpe_tokens") * lit(1.0) / col("ws_tokens"), 6))
        .withColumn("bpe_lost_frac",
          round(col("bpe_tokens_lost") * lit(1.0) / col("bpe_tokens"), 6))
    }),

    // Heaps-law vocab growth over the raw corpus in 10 id-ordered
    // slices — global window over 10 rows, never the corpus
    "p88_vocab_growth" -> ((s, dir) =>
      Quality.vocabGrowth(docs(s, dir), "doc_id", "text")),

    // cross-snapshot vocab drift: A = even docs (+ 'legacyterm' on
    // %6==0 -> vanished), B = odd docs (+ 'freshterm' on %6==1 -> new,
    // + a 'slow' flood on %6==3 -> drifted up); common corpus terms
    // stay stable under the 0.69-nat (~2x) threshold
    "p87_vocab_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val a = d.filter(col("doc_id") % 2 === 0)
        .select(concat(col("text"),
          when(col("doc_id") % 6 === 0, lit(" legacyterm legacyterm"))
            .otherwise(lit(""))).as("text"))
      val b = d.filter(col("doc_id") % 2 === 1)
        .select(concat(col("text"),
          when(col("doc_id") % 6 === 1, lit(" freshterm freshterm"))
            .otherwise(lit("")),
          when(col("doc_id") % 6 === 3,
            lit(" slow slow slow slow slow slow slow slow"))
            .otherwise(lit(""))).as("text"))
      Quality.vocabDrift(a, b, "text")
    }),

    // per-source KL vs the corpus token distribution: each doc carries
    // its source name 3x as planted exclusive tokens, so every source
    // has a deterministic distribution skew on top of the natural
    // finite-sample divergence
    "p86_domain_kl" -> ((s, dir) =>
      Quality.domainKl(
        docs(s, dir).select(col("source"),
          concat_ws(" ", col("text"), col("source"), col("source"),
            col("source")).as("text")),
        "source", "text")),

    // char-entropy gibberish gate: every 5th doc gets a 200-char 'a'
    // flood that crushes its entropy below the 2.5-nat gate while the
    // clean corpus sits near 2.9 — both modes populated
    "p84_char_entropy" -> ((s, dir) =>
      Quality.charEntropy(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" "), lit("a" * 200))).otherwise(lit("")))
            .as("text")),
        "doc_id", "text")),

    // IBAN PII (mod-97-10): %3==0 docs cycle 5 valid test IBANs of
    // different lengths/countries, %3==1 carries a checksum-FAILING
    // lookalike (one trailing digit off) that must NOT redact
    "p81_iban_pii" -> ((s, dir) =>
      Quality.ibanScrub(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" acct "),
                when(col("doc_id") % 15 === 0, lit("DE89370400440532013000"))
                  .when(col("doc_id") % 15 === 3, lit("GB82WEST12345698765432"))
                  .when(col("doc_id") % 15 === 6, lit("FR1420041010050500013M02606"))
                  .when(col("doc_id") % 15 === 9, lit("NL91ABNA0417164300"))
                  .otherwise(lit("CH9300762011623852957")),
                lit(" ok")))
              .when(col("doc_id") % 3 === 1,
                lit(" acct DE89370400440532013001 bad"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),

    // Luhn card-number PII: docs cycle valid test PANs in four raw
    // spellings (spaced, hyphenated, plain 16- and 15-digit) at %3==0,
    // a checksum-FAILING 16-digit run plus a too-short digit run at
    // %3==1 (neither may redact — the whole point of the Luhn
    // arbitration), nothing at %3==2
    "p78_card_pii" -> ((s, dir) =>
      Quality.luhnCardScrub(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" pay "),
                when(col("doc_id") % 10 === 0, lit("4111 1111 1111 1111"))
                  .when(col("doc_id") % 10 === 3, lit("4012-8888-8888-1881"))
                  .when(col("doc_id") % 10 === 6, lit("378282246310005"))
                  .otherwise(lit("5555555555554444")),
                lit(" now")))
              .when(col("doc_id") % 3 === 1,
                lit(" ref 4111111111111112 and order 12345678 code"))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),

    // word-list (toxicity/NSFW) gate: 'slow' is a high-df corpus token
    // so every policy branch (strict drop, fraction keep, clean) is
    // populated; 'leak'/'spam' are absent, pinning the zero path
    "p75_wordlist_filter" -> ((s, dir) =>
      Quality.wordlistFilter(docs(s, dir), "doc_id", "text",
        blocklist = Seq("slow", "leak", "spam"), maxFraction = 0.02)),

    // margin-thresholded langid routing (how fastText is USED in
    // production: predictions under a confidence margin become 'und'
    // and fall back to the script-profile prefilter — CLD practice):
    // 3 of 4 docs carry the p61 language header (margins 16-43 by
    // construction), every 4th is garbage — Han text (rescued to 'zh'
    // by the han-dominant script) or digits (stays 'und'). Threshold
    // = 16, the minimum real-header margin
    "p72_langid_route" -> ((s, dir) => {
      val header = LangId.Langs.foldRight(lit(null).cast("string")) {
        (l, rest) =>
          when(col("lang") === l,
            concat_ws(" ", (0 until 10).map(k =>
              element_at(typedLit(LangId.Lexicons(l).toArray),
                (pmod(col("doc_id") * 7 + k * 3, lit(10)) + 1).cast("int"))): _*))
            .otherwise(rest)
      }
      val t = when(pmod(col("doc_id"), lit(4)) =!= 3, header)
        .when(pmod(col("doc_id"), lit(8)) === 3, // Han plant, \u-escaped
          lit("\u4F60\u597D\u4E16\u754C\u518D\u89C1\u670B\u53CB"))
        .otherwise(lit("12345 67890 12345"))
      val src = docs(s, dir).select(col("doc_id"), t.as("t"))
      val cls = LangId.classify(src, "doc_id", "t")
        .select(col("doc_id"), col("lang_pred"), col("margin"))
      val prof = Quality.scriptProfile(src, "doc_id", "t")
        .select(col("doc_id"), col("dominant_script"))
      cls.join(prof, "doc_id")
        .select(col("doc_id"), col("lang_pred"), col("margin"),
          col("dominant_script"),
          when(col("margin") >= 16, col("lang_pred"))
            .when(col("dominant_script") === "han", lit("zh"))
            .otherwise(lit("und")).as("lang_routed"))
    }),

    // incremental cross-snapshot near-dup (the crawl-N+1 serving
    // shape): even doc_ids play the STORED crawl-N index, odd ids the
    // arriving batch — only the batch is shingled-and-signed fresh,
    // candidates require >= 1 new side (the history is never re-paired
    // with itself), verify is exact Jaccard. Equivalent relationally
    // to "full-corpus minhash pairs with at least one odd side", which
    // is what the oracle states
    "p71_incremental_neardup" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpusIdx = Dedup.minhashIndex(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        n = 3, k = 32, bands = 8).persistTracked()
      val out = Dedup.incrementalMinhashPairs(
        d.filter(col("doc_id") % 2 === 1), corpusIdx, "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.4)
      corpusIdx.unpersist()
      out
    }),

    // video-container metadata walk (ISO-BMFF box + EBML/Matroska
    // structure — codec id, track count, sample count, duration; no
    // pixel decode): each doc gets a VALID minimal mp4 or WebM built
    // by VideoFixtures from closed-form parameters of its doc_id; the
    // oracle states those parameters directly, so the engine's parser
    // must INVERT the builder byte-exactly to match
    "p70_video_metadata" -> ((s, dir) => {
      val mp41 = (1 to 3).map(v => graft.pipeline.VideoFixtures.mp4(
        tracks = 1, nSamples = 10L * v, durationMs = 1000L * v, codec = "avc1"))
      val mp42 = (1 to 3).map(v => graft.pipeline.VideoFixtures.mp4(
        tracks = 2, nSamples = 10L * v, durationMs = 1000L * v, codec = "hvc1"))
      val webms = (1 to 3).map(v => graft.pipeline.VideoFixtures.webm(
        nBlocks = 10 * v, durationMs = 1000L * v, codec = "V_VP9"))
      val cls = pmod(col("doc_id"), lit(3))
      val vr = pmod(expr("doc_id div 3"), lit(3))
      def pick(arr: Seq[Array[Byte]]) =
        when(vr === 0, lit(arr(0))).when(vr === 1, lit(arr(1)))
          .otherwise(lit(arr(2)))
      val blob = when(cls === 0, pick(mp41)).when(cls === 1, pick(mp42))
        .otherwise(pick(webms))
      Multimodal.videoMetadata(
        docs(s, dir).select(col("doc_id"), blob.as("media")))
    }),

    // fastText-style langid (hashed char-3-gram linear classifier,
    // integer scores): each doc gets a HEADER planted in its label
    // language (10 function words picked by pure modular arithmetic —
    // the synthetic corpus's body text carries no language signal, the
    // lang column does), and the classifier must recover the label
    // from the text alone. One codegen projection, no shuffle.
    "p61_langid_classifier" -> ((s, dir) => {
      val header = LangId.Langs.foldRight(lit(null).cast("string")) {
        (l, rest) =>
          when(col("lang") === l,
            concat_ws(" ", (0 until 10).map(k =>
              element_at(typedLit(LangId.Lexicons(l).toArray),
                (pmod(col("doc_id") * 7 + k * 3, lit(10)) + 1).cast("int"))): _*))
            .otherwise(rest)
      }
      LangId.classify(
        docs(s, dir).select(col("doc_id"), header.as("hdr")),
        "doc_id", "hdr")
    })
  )

  // shared CTE chain producing minhash-LSH candidate pairs `j(doc_a,
  // doc_b, jaccard)` from relation `src(doc_id, text)` — used by the p3
  // pair oracle, the p14 cluster oracle (wrapped in a recursive component
  // walk), and the p18 end-to-end pipeline oracle
  private def minhashPairsCtes(src: String) =
    s"""d AS (SELECT doc_id, $TOKS AS toks FROM $src),
             s AS (SELECT doc_id, $SHINGLES3 AS sh FROM d),
             hp AS (SELECT doc_id, sh,
                      list_transform(sh, sg ->
                        ('0x' || substr(md5(sg), 1, 15))::BIGINT % 1000000007) AS hps
                    FROM s WHERE len(sh) > 0),
             sig AS (SELECT doc_id, sh,
                       list_transform(generate_series(0, 31), j ->
                         list_min(list_transform(hps, h ->
                           (((j * 2654435761 % 1000000007) | 1) * h +
                            (j * 40503 * 2654435761 % 1000000007)) % 1000000007))) AS sig
                     FROM hp),
             bands AS (SELECT doc_id, b,
                         md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS bucket
                       FROM sig, unnest(generate_series(0, 7)) t(b)),
             cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
             j AS (SELECT doc_a, doc_b,
                     round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                       (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6)
                       AS jaccard
                   FROM cand JOIN s sa ON doc_a = sa.doc_id
                             JOIN s sb ON doc_b = sb.doc_id)"""

  /** The Gear/FastCDC walk over the p135 plant, replayed exactly in
    * DuckDB (md5-derived gear constants, the 2^64 wrap in HUGEINT, the
    * same minLen/maxLen/maskBits cut rule), ending at the per-chunk
    * relation `ch (doc_id, start, len, chash, packed)` — shared by the
    * p135 within-corpus report and the p138 cross-snapshot screen.
    */
  private lazy val cdcWalkSql: String = {
    def esc(s: String) = s.replace("'", "''")
    val caseArms = cdcParagraphs.zipWithIndex.map { case (t, i) =>
      s"WHEN $i THEN '${esc(t)}'" }.mkString("\n             ")
    s"""WITH RECURSIVE g AS (SELECT i,
             ('0x' || substr(md5('gear:' || i), 1, 15))::BIGINT AS gv
           FROM unnest(generate_series(0, 255)) t(i)),
         dd AS (SELECT doc_id,
             text || ' ' || CASE doc_id % 7 $caseArms END AS text,
             length(text || ' ' || CASE doc_id % 7 $caseArms END) AS n
           FROM documents),
         walk AS (
           SELECT doc_id, 0 AS pos, CAST(0 AS HUGEINT) AS h,
             1 AS cstart, false AS cut, 0 AS clen, 1 AS chunk_start
           FROM dd
           UNION ALL
           SELECT doc_id, pos,
             CASE WHEN (clen >= 128 OR (clen >= 16 AND nh % 32 = 0))
               THEN CAST(0 AS HUGEINT) ELSE nh END AS h,
             CASE WHEN (clen >= 128 OR (clen >= 16 AND nh % 32 = 0))
               THEN pos + 1 ELSE cstart END AS cstart,
             (clen >= 128 OR (clen >= 16 AND nh % 32 = 0)) AS cut,
             clen, cstart AS chunk_start
           FROM (
             SELECT w.doc_id, w.pos + 1 AS pos,
               (w.h * 2 + gg.gv)
                 % CAST('18446744073709551616' AS HUGEINT) AS nh,
               w.cstart, w.pos + 1 - w.cstart + 1 AS clen
             FROM walk w
             JOIN dd ON dd.doc_id = w.doc_id
             JOIN g gg
               ON gg.i = unicode(substr(dd.text, w.pos + 1, 1)) % 256
             WHERE w.pos < dd.n) s
         ),
         bounds AS (
           SELECT doc_id, chunk_start AS start, clen AS len
           FROM walk WHERE cut
           UNION ALL
           SELECT w.doc_id, w.cstart, dd.n - w.cstart + 1
           FROM walk w JOIN dd USING (doc_id)
           WHERE w.pos = dd.n AND NOT w.cut AND dd.n > 0
         ),
         ch AS (SELECT b.doc_id, b.start, b.len,
             md5(substr(dd.text, b.start, b.len)) AS chash,
             b.doc_id * 16777216 + b.start AS packed
           FROM bounds b JOIN dd USING (doc_id))"""
  }

  /** The p117 BFD-packing oracle CTE chain, ending at the full piece
    * relation `packed (doc_id, source, n_tokens, piece, piece_len,
    * seq_id, seq_off)` — shared by the p117 relation dump and the p145
    * per-sequence span rollup.
    */
  private lazy val BfdPackSql: String =
    s"""WITH RECURSIVE d AS MATERIALIZED (
             SELECT doc_id, source, CAST(len($TOKS) AS BIGINT) AS n
             FROM documents),
           pieces AS MATERIALIZED (
             SELECT doc_id, source, n AS n_tokens, i AS piece,
               CASE WHEN i < n // 512 THEN 512 ELSE n % 512 END AS piece_len
             FROM d, LATERAL unnest(generate_series(0, n // 512)) t(i)
             WHERE (CASE WHEN i < n // 512 THEN 512 ELSE n % 512 END) >= 1),
           hq AS MATERIALIZED (
             SELECT source, piece_len, c,
               row_number() OVER (PARTITION BY source
                 ORDER BY piece_len DESC) AS g
             FROM (SELECT source, piece_len, count(*) AS c
                   FROM pieces GROUP BY 1, 2)),
           st AS (
             SELECT source, CAST(1 AS BIGINT) AS g, CAST(0 AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS f
             FROM (SELECT DISTINCT source FROM hq)
             UNION ALL
             SELECT s.source, s.g + 1,
               CASE WHEN h.c <= (512 - s.f) // h.piece_len THEN s.t
                    ELSE s.t + 1 + (h.c - (512 - s.f) // h.piece_len - 1)
                           // (512 // h.piece_len) END,
               CASE WHEN h.c <= (512 - s.f) // h.piece_len
                    THEN s.f + h.c * h.piece_len
                    ELSE ((h.c - (512 - s.f) // h.piece_len - 1)
                            % (512 // h.piece_len) + 1) * h.piece_len END
             FROM st s JOIN hq h ON h.source = s.source AND h.g = s.g),
           rk AS (
             SELECT p.*, row_number() OVER (PARTITION BY source, piece_len
               ORDER BY doc_id, piece) AS j
             FROM pieces p),
           asg AS (
             SELECT rk.doc_id, rk.source, rk.n_tokens, rk.piece,
               rk.piece_len, rk.j, st.t, st.f,
               (512 - st.f) // rk.piece_len AS r,
               512 // rk.piece_len AS k
             FROM rk
             JOIN hq ON rk.source = hq.source AND rk.piece_len = hq.piece_len
             JOIN st ON st.source = hq.source AND st.g = hq.g),
           packed AS (
             SELECT doc_id, source, n_tokens, piece, piece_len,
               CAST(CASE WHEN j <= r THEN t
                         ELSE t + 1 + (j - r - 1) // k END AS BIGINT) AS seq_id,
               CAST(CASE WHEN j <= r THEN f + (j - 1) * piece_len
                         ELSE ((j - r - 1) % k) * piece_len END AS BIGINT)
                 AS seq_off
             FROM asg)"""

  /** The p174 winnowing CTE chain through the exploded per-doc
    * fingerprint relation `e(doc_id, fp)` — shared by the p174
    * all-pairs oracle and the p175/p176 cross-split screen oracles.
    */
  private lazy val winnowCtes: String =
    raw"""d AS (SELECT doc_id,
             list_value('winnow', (doc_id - doc_id % 3)::VARCHAR,
               'block', (doc_id - doc_id % 3)::VARCHAR,
               'alpha', (doc_id - doc_id % 3)::VARCHAR,
               'beta', (doc_id - doc_id % 3)::VARCHAR,
               'gamma', (doc_id - doc_id % 3)::VARCHAR,
               'delta', (doc_id - doc_id % 3)::VARCHAR,
               'epsilon', (doc_id - doc_id % 3)::VARCHAR) AS tk,
             text AS bt
           FROM documents),
           p AS (SELECT doc_id, bt || ' ' ||
               CASE doc_id % 3
                 WHEN 1 THEN array_to_string(tk, chr(10) || '  ')
                 WHEN 2 THEN array_to_string(tk, chr(9) || chr(9))
                 ELSE array_to_string(tk, ' ') END AS text
             FROM d),
           c AS (SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x != '') AS toks
             FROM p),
           g AS (SELECT doc_id,
               CASE WHEN len(toks) >= 4 THEN
                 list_transform(generate_series(1, len(toks) - 3),
                   i -> ('0x' || substr(md5(array_to_string(
                     toks[i:i+3], ' ')), 1, 15))::BIGINT)
               ELSE [] END AS gs
             FROM c),
           f AS (SELECT doc_id,
               CASE WHEN len(gs) >= 4 THEN
                 list_distinct(list_transform(
                   generate_series(1, len(gs) - 3),
                   j -> list_min(gs[j:j+3])))
               ELSE [] END AS fp
             FROM g),
           e AS (SELECT doc_id, unnest(fp) AS fp FROM f)"""

  /** The p173 title-plant CTE chain through `p(doc_id, title)` —
    * shared by the all-pairs p173 oracle and the p178/p179
    * cross-split screen oracles.
    */
  private lazy val editdistCtes: String =
    """g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
           t AS (SELECT doc_id, lower(substr(btext, 1, 24)) AS t0 FROM g),
           p AS (SELECT doc_id,
               CASE WHEN doc_id % 3 = 1
                      THEN substr(t0, 1, 4) || 'q' || substr(t0, 6, 24)
                    WHEN doc_id % 3 = 2
                      THEN substr(t0, 1, 4) || substr(t0, 6, 24)
                    ELSE t0 END AS title
             FROM t)"""

  private val oracleBase: Map[String, String] = Map(
    "p1_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
         count(*) AS dup_cnt FROM documents GROUP BY md5(text)""",

    // shingles md5-hashed to FULL 60-bit longs before the self-join on
    // BOTH engines — identical join keys, 3× smaller shuffle rows on
    // Spark, and no mod-p reduction (which would shrink the key space
    // to ~2^30 and perturb Jaccard from ~30k distinct shingles up)
    "p2_dedup_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             s0 AS (SELECT doc_id, $SHINGLES3 AS sh0 FROM d),
             s AS (SELECT doc_id, list_distinct(list_transform(sh0, sg ->
                     ('0x' || substr(md5(sg), 1, 15))::BIGINT)) AS sh
                   FROM s0),
             ex AS (SELECT doc_id, unnest(sh) AS sg FROM s),
             sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
             inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                       FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
                       GROUP BY 1, 2),
             j AS (SELECT doc_a, doc_b,
                     round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
                   FROM inter JOIN sz sa ON doc_a = sa.doc_id
                              JOIN sz sb ON doc_b = sb.doc_id)
         SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.4""",

    "p3_dedup_minhash_lsh" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.4""",

    "p14_dedup_clusters" ->
      s"""WITH RECURSIVE ${minhashPairsCtes("documents")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src AS doc, w.label
                      FROM edges e JOIN walk w ON e.dst = w.doc)
         SELECT doc, min(label) AS cluster_id FROM walk GROUP BY doc""",


    "p4_dedup_simhash" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             h AS (SELECT doc_id,
                     list_transform(toks, t ->
                       ('0x' || substr(md5(t), 1, 12))::BIGINT) AS ths
                   FROM d WHERE len(toks) > 0),
             s AS (SELECT doc_id,
                     CAST(list_sum(list_transform(generate_series(0, 47), p ->
                       CASE WHEN list_sum(list_transform(ths, hh ->
                              CAST(floor((hh % (CAST(pow(2, p) AS BIGINT) * 2)) /
                                   CAST(pow(2, p) AS BIGINT)) AS BIGINT) * 2 - 1)) >= 0
                            THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT) AS sh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sh, b.sh)) <= 5""",

    // mirrors the Spark banding: 128 md5-derived hyperplanes (16 tables
    // × 8 planes), candidates = bucket collisions, verify exact cosine
    "p5_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id)
         SELECT vec_a, vec_b, sim FROM pr WHERE sim >= 0.35""",

    // the p5 pair CTEs + the p14 recursive min-label walk
    "p30_embedding_clusters" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id),
             pairs AS (SELECT vec_a, vec_b FROM pr WHERE sim >= 0.35),
             edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
                       UNION SELECT vec_b, vec_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT ed.src AS doc, w.label
                      FROM edges ed JOIN walk w ON ed.dst = w.doc)
         SELECT doc, min(label) AS cluster_id FROM walk GROUP BY doc""",

    "p6_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             s AS (SELECT query_id, c.vec_id AS neighbor_id,
                     list_dot_product(qv, c.v) /
                       (sqrt(list_dot_product(qv, qv)) *
                        sqrt(list_dot_product(c.v, c.v))) AS sim
                   FROM q JOIN e c ON c.vec_id <> query_id),
             r AS (SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
                   FROM s)
         SELECT query_id, neighbor_id, round(sim, 6) AS sim, rnk
         FROM r WHERE rnk <= 5""",

    // mirrors quantizeInt8 + quantizedRescoreTopK exactly: same
    // floor(x/s + 0.5) codes, same int8-cosine candidate cut at m=10,
    // same exact-cosine rescore to k=5
    "p21_ann_quantized" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             z AS (SELECT vec_id, v,
                     greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS s
                   FROM e),
             c AS (SELECT vec_id, v,
                     list_transform(v, x ->
                       greatest(-127.0, least(127.0, floor(x / s + 0.5)))) AS q
                   FROM z),
             qs AS (SELECT vec_id AS query_id, v AS qv, q AS qc FROM c
                    WHERE vec_id < 20),
             s1 AS (SELECT query_id, n.vec_id AS neighbor_id, qv, n.v AS cv,
                      list_dot_product(qc, n.q) /
                        (sqrt(list_dot_product(qc, qc)) *
                         sqrt(list_dot_product(n.q, n.q))) AS qsim
                    FROM qs JOIN c n ON n.vec_id <> query_id),
             s2 AS (SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY qsim DESC, neighbor_id) AS crnk FROM s1),
             s3 AS (SELECT query_id, neighbor_id,
                      round(list_dot_product(qv, cv) /
                        (sqrt(list_dot_product(qv, qv)) *
                         sqrt(list_dot_product(cv, cv))), 6) AS sim
                    FROM s2 WHERE crnk <= 10),
             r AS (SELECT query_id, neighbor_id, sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
                   FROM s3)
         SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= 5""",

    "p8_text_tokens" ->
      s"""SELECT doc_id,
          CAST(len($TOKS) AS BIGINT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS BIGINT) AS n_bpe_tokens
          FROM documents""",

    "p31_vocab_topk" ->
      s"""WITH t AS (SELECT unnest(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS term
                     FROM documents)
         SELECT term, count(*) AS cnt FROM t GROUP BY term
         ORDER BY cnt DESC, term LIMIT 200""",

    "p32_domain_mix" ->
      """WITH c AS (SELECT source, count(*)::DOUBLE AS n
                    FROM documents GROUP BY source),
             w AS (SELECT source, n,
                     (1 + ('0x' || substr(md5('mix:' || source), 1, 15))::BIGINT
                       % 5)::DOUBLE AS wraw
                   FROM c),
             sw AS (SELECT sum(wraw) AS sumw FROM w),
             p AS (SELECT source, n, wraw / sumw AS p FROM w, sw),
             nn AS (SELECT floor(min(n / p)) AS ntot FROM p),
             q AS (SELECT source, floor(p * ntot) AS k FROM p, nn),
             r AS (SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                       ORDER BY ('0x' || substr(md5('mixsel:' || doc_id::VARCHAR),
                                 1, 15))::BIGINT, doc_id) AS rnk
                   FROM documents)
         SELECT r.doc_id, r.source, CAST(r.rnk AS BIGINT) AS rnk
         FROM r JOIN q USING (source) WHERE r.rnk <= q.k""",

    "p9_text_quality" ->
      s"""WITH d AS (
            SELECT doc_id, text, $TOKS AS toks,
              CAST(length(text) AS BIGINT) AS n_chars
            FROM documents),
              m AS (
            SELECT doc_id, n_chars,
              CAST(len(toks) AS BIGINT) AS n_tokens,
              CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                   AS BIGINT) AS sum_tok_len,
              n_chars - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
              n_chars - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
              n_chars - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
              CAST(len(list_filter(toks, t -> list_contains(
                ['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by'],
                t))) AS BIGINT) AS n_stop
            FROM d),
              r AS (
            SELECT doc_id, n_chars, n_tokens,
              coalesce(round(sum_tok_len * 1.0 / nullif(n_tokens, 0), 6), 0.0) AS avg_token_len,
              coalesce(round(n_punct * 1.0 / nullif(n_chars, 0), 6), 0.0) AS punct_ratio,
              coalesce(round(n_digit * 1.0 / nullif(n_chars, 0), 6), 0.0) AS digit_ratio,
              coalesce(round(n_upper * 1.0 / nullif(n_chars, 0), 6), 0.0) AS upper_ratio,
              coalesce(round(n_stop * 1.0 / nullif(n_tokens, 0), 6), 0.0) AS stopword_ratio
            FROM m)
         SELECT doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
           digit_ratio, upper_ratio, stopword_ratio,
           round(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio) *
                 (1.0 - digit_ratio), 6) AS quality
         FROM r""",

    "p10_text_langid" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             sc AS (SELECT doc_id,
               CAST(len(list_filter(toks, t -> list_contains(
                 ['the','a','and','of','to','in','is','it','for','on'], t))) AS BIGINT) AS s_en,
               CAST(len(list_filter(toks, t -> list_contains(
                 ['der','die','das','und','ist','nicht','ein','zu','mit','von'], t))) AS BIGINT) AS s_de,
               CAST(len(list_filter(toks, t -> list_contains(
                 ['el','la','los','de','y','es','en','un','una','que'], t))) AS BIGINT) AS s_es,
               CAST(len(list_filter(toks, t -> list_contains(
                 ['le','la','les','et','est','un','une','dans','pour','que'], t))) AS BIGINT) AS s_fr
             FROM d)
         SELECT doc_id, s_en, s_de, s_es, s_fr,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
         FROM sc""",

    "p11_text_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, array_to_string($TOKS, ' ') AS norm FROM documents)
         SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(regexp_extract_all(norm, '.'), c -> ord(c)::BIGINT)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp
         FROM d""",

    "p13_text_tfidf" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
             n AS (SELECT count(*) AS nd FROM d),
             sc AS (SELECT doc_id, term,
                      round(tf * round(ln((nd + 1.0) / (df + 1.0)), 6), 6) AS score
                    FROM tf JOIN dfr USING (term), n),
             r AS (SELECT doc_id, term, score,
                     CAST(row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS BIGINT) AS rnk
                   FROM sc)
         SELECT doc_id, term, score, rnk FROM r WHERE rnk <= 3""",

    "p17_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             s AS (SELECT doc_id, $SHINGLES3 AS sh FROM d),
             bm AS (SELECT DISTINCT unnest(sh) AS sg FROM s WHERE doc_id < 5),
             ex AS (SELECT doc_id, unnest(sh) AS sg FROM s WHERE doc_id >= 5),
             h AS (SELECT doc_id, count(*) AS n_hits
                   FROM ex JOIN bm USING (sg) GROUP BY 1)
         SELECT d2.doc_id, coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d2
         LEFT JOIN h USING (doc_id)""",

    "p16_boilerplate_lines" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'shared cookie banner accept all' ||
                chr(10) || 'DOC-' || doc_id::VARCHAR AS text
              FROM documents),
             d AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d0),
             l AS (SELECT doc_id, i AS pos, ls[i] AS line
                   FROM d, unnest(generate_series(1, len(ls))) t(i)),
             lk AS (SELECT doc_id, pos, line,
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM l),
             hot AS (SELECT k FROM (SELECT k, count(DISTINCT doc_id) AS df
                                    FROM lk GROUP BY 1) WHERE df > 10),
             kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2
                      FROM lk ANTI JOIN hot USING (k) GROUP BY doc_id)
         SELECT d0.doc_id, coalesce(kept.t2, '') AS text
         FROM d0 LEFT JOIN kept USING (doc_id)""",

    // chains the p16 boilerplate CTEs → exact dedup (min doc_id per
    // md5(text)) → the p3 minhash-pair CTEs over the deduped relation →
    // the p14 recursive component walk → canonical-only survivors
    "p18_clean_corpus" ->
      raw"""WITH RECURSIVE d0 AS (SELECT doc_id,
                text || chr(10) || 'shared cookie banner accept all' ||
                chr(10) || 'DOC-' || doc_id::VARCHAR AS text
              FROM documents),
             dl AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d0),
             l AS (SELECT doc_id, i AS pos, ls[i] AS line
                   FROM dl, unnest(generate_series(1, len(ls))) t(i)),
             lk AS (SELECT doc_id, pos, line,
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM l),
             hot AS (SELECT k FROM (SELECT k, count(DISTINCT doc_id) AS df
                                    FROM lk GROUP BY 1) WHERE df > 10),
             kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2
                      FROM lk ANTI JOIN hot USING (k) GROUP BY doc_id),
             cleaned AS (SELECT d0.doc_id, coalesce(kept.t2, '') AS text
                         FROM d0 LEFT JOIN kept USING (doc_id)),
             dd AS (SELECT doc_id, text FROM cleaned
                    QUALIFY row_number() OVER (PARTITION BY md5(text)
                                               ORDER BY doc_id) = 1),
             ${minhashPairsCtes("dd")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src AS doc, w.label
                      FROM edges e JOIN walk w ON e.dst = w.doc),
             clusters AS (SELECT doc, min(label) AS cluster_id FROM walk GROUP BY doc),
             doomed AS (SELECT doc FROM clusters WHERE doc <> cluster_id)
         SELECT doc_id, text FROM dd
         WHERE doc_id NOT IN (SELECT doc FROM doomed)""",

    "p19_text_repetition" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             w AS (SELECT doc_id, unnest(toks) AS g FROM d),
             wc AS (SELECT doc_id, g, count(*) AS c FROM w GROUP BY 1, 2),
             ws AS (SELECT doc_id, max(c) AS w_max, sum(c) AS w_tot FROM wc GROUP BY 1),
             b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(generate_series(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+1], ' '))
                     ELSE [] END) AS g FROM d),
             bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
             bs AS (SELECT doc_id, max(c) AS b_max, sum(c) AS b_tot FROM bc GROUP BY 1),
             t AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
                     THEN list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i:i+2], ' '))
                     ELSE [] END) AS g FROM d),
             tc AS (SELECT doc_id, g, count(*) AS c FROM t GROUP BY 1, 2),
             ts AS (SELECT doc_id, sum(c) AS t_tot, count(*) AS t_dist FROM tc GROUP BY 1)
         SELECT d0.doc_id,
           coalesce(round(w_max * 1.0 / nullif(w_tot, 0), 6), 0.0) AS max_word_frac,
           coalesce(round(b_max * 1.0 / nullif(b_tot, 0), 6), 0.0) AS top_bigram_frac,
           coalesce(round((t_tot - t_dist) * 1.0 / nullif(t_tot, 0), 6), 0.0) AS dup_trigram_frac
         FROM (SELECT doc_id FROM documents) d0
         LEFT JOIN ws USING (doc_id)
         LEFT JOIN bs USING (doc_id)
         LEFT JOIN ts USING (doc_id)""",

    // counts are stage-by-stage on the progressively redacted text, so
    // n_X always equals the number of [X] tokens in text_redacted
    "p20_pii_scrub" ->
      raw"""WITH d AS (SELECT doc_id,
                text || ' contact user' || doc_id::VARCHAR || '@example.com from 10.1.' ||
                (doc_id % 256)::VARCHAR || '.7 call 555-123-4567' AS text
              FROM documents),
            r1 AS (SELECT doc_id, text, regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
              FROM d),
            r2 AS (SELECT doc_id, text, t1, regexp_replace(t1,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS t2
              FROM r1)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t1,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t2,
             '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
           regexp_replace(t2,
             '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS text_redacted
         FROM r2""",

    // mirrors resizePlan + frameSamplePlan over the same md5-derived
    // decode stub as p12
    "p22_multimodal_frames" ->
      """WITH m AS (SELECT doc_id,
             1 + ('0x' || substr(md5(text), 1, 12))::BIGINT % 512 AS width,
             1 + ('0x' || substr(md5(text), 13, 12))::BIGINT % 512 AS height,
             1 + ('0x' || substr(md5(text), 17, 12))::BIGINT % 32 AS n_frames
           FROM documents),
           r AS (SELECT doc_id, width, height, n_frames,
             CASE WHEN greatest(width, height) <= 256 THEN 1.0
                  ELSE 256.0 / greatest(width, height) END AS scale
           FROM m),
           f AS (SELECT doc_id,
             CAST(ceil(width * scale) AS BIGINT) AS out_width,
             CAST(ceil(height * scale) AS BIGINT) AS out_height,
             round(scale, 6) AS scale,
             CASE WHEN n_frames <= 8
                  THEN list_transform(range(0, n_frames::INT), x -> x::BIGINT)
                  ELSE list_transform(range(0, 8),
                         i -> CAST(floor(i * n_frames / 8.0) AS BIGINT))
             END AS frames
           FROM r)
         SELECT doc_id, out_width, out_height, scale,
           unnest(frames) AS frame_no
         FROM f""",

    // text bytes are never a decodable image, so the oracle pins the
    // fallback path (decoded_real = false for every row); the REAL
    // ImageIO path is pinned by MultimodalDecodeSpec's painted fixtures
    "p12_multimodal_decode" ->
      """SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         1 + ('0x' || substr(md5(text), 1, 12))::BIGINT % 512 AS width,
         1 + ('0x' || substr(md5(text), 13, 12))::BIGINT % 512 AS height,
         1 + ('0x' || substr(md5(text), 17, 12))::BIGINT % 32 AS n_frames,
         (('0x' || substr(md5(text), 21, 12))::BIGINT % 1000000) / 1000000.0 AS brightness,
         false AS decoded_real
         FROM documents""",

    "p33_audio_decode" ->
      """SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         list_extract([8000, 16000, 22050, 44100],
           CAST(1 + ('0x' || substr(md5(text), 1, 12))::BIGINT % 4 AS INT))
           ::BIGINT AS sample_rate,
         1 + ('0x' || substr(md5(text), 13, 4))::BIGINT % 2 AS n_channels,
         1 + ('0x' || substr(md5(text), 17, 12))::BIGINT % 1000000 AS n_frames,
         (('0x' || substr(md5(text), 5, 12))::BIGINT % 10000000) / 1000.0 AS duration_ms,
         (('0x' || substr(md5(text), 21, 12))::BIGINT % 1000000) / 1000000.0 AS rms,
         false AS decoded_real
         FROM documents""",

    "p28_url_filter" ->
      """WITH d AS (SELECT doc_id,
             text || ' visit https://site' || (doc_id % 20)::VARCHAR ||
             '.example.org/p' || doc_id::VARCHAR ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' and http://ads.tracker.net/x' ELSE '' END AS text
           FROM documents),
           h AS (SELECT doc_id,
             regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1) AS hosts
           FROM d)
         SELECT doc_id,
           CAST(len(hosts) AS BIGINT) AS n_urls,
           CAST(len(list_filter(hosts, x -> list_contains(
             ['ads.tracker.net', 'spam.example.com'], x))) AS BIGINT) AS n_blocked,
           len(list_filter(hosts, x -> list_contains(
             ['ads.tracker.net', 'spam.example.com'], x))) = 0 AS keep
         FROM h""",

    // mirrors UrlOps.robotsFilter over the planted URL corpus: same
    // host/path extraction regexes (identical Java-regex / RE2
    // semantics), same packed (2·prefix_len + allow) priority, longest
    // match via max, allow winning ties, no-match rows kept
    "p154_robots_filter" ->
      s"""WITH rules(host, path_prefix, allow) AS (VALUES $robotsRulesValues),
           d AS (SELECT doc_id,
             'https://site' || ((doc_id // 4) % 10)::VARCHAR ||
             '.example.org' ||
             CASE WHEN doc_id % 4 = 0 THEN '/private/p' || doc_id::VARCHAR
                  WHEN doc_id % 4 = 1 THEN '/private/ok/p' || doc_id::VARCHAR
                  WHEN doc_id % 4 = 2 THEN '/pub/p' || doc_id::VARCHAR
                  ELSE '/p' || doc_id::VARCHAR END AS url
           FROM documents),
           parts AS (SELECT doc_id,
             lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host,
             CASE WHEN regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
             END AS path
           FROM d),
           m AS (SELECT p.doc_id, p.host, r.path_prefix,
                   CASE WHEN r.path_prefix IS NULL THEN NULL
                        ELSE CAST(length(r.path_prefix) AS BIGINT) * 2 +
                             CASE WHEN r.allow THEN 1 ELSE 0 END
                   END AS prio
                 FROM parts p LEFT JOIN rules r
                   ON p.host = r.host
                  AND starts_with(p.path, r.path_prefix))
         SELECT doc_id, max(host) AS host,
           CAST(count(path_prefix) AS BIGINT) AS n_rules_matched,
           coalesce(max(prio) // 2, -1) AS matched_len,
           (max(prio) IS NULL OR max(prio) % 2 = 1) AS keep
         FROM m GROUP BY doc_id""",

    // mirrors UrlOps.parseRobotsTxt: same line split / comment strip /
    // field regexes, the lag-then-running-sum group assignment, the
    // exact-beats-star tier rule, orphan (group-0) rules dropped by
    // the group join, empty values carrying no rule
    "p155_robots_parse" ->
      s"""WITH hosts AS (SELECT DISTINCT
             'site' || ((doc_id // 4) % 10)::VARCHAR || '.example.org' AS host,
             ((doc_id // 4) % 10) % 5 AS t
           FROM documents),
           bodies AS (SELECT host,
             CASE t WHEN 0 THEN ${robotsBodySql(RobotsBodies(0))}
                    WHEN 1 THEN ${robotsBodySql(RobotsBodies(1))}
                    WHEN 2 THEN ${robotsBodySql(RobotsBodies(2))}
                    WHEN 3 THEN ${robotsBodySql(RobotsBodies(3))}
                    ELSE ${robotsBodySql(RobotsBodies(4))} END AS body
           FROM hosts),
           ln AS (SELECT host, i AS line_no,
                    trim(regexp_replace(ls[i], '#.*$$', '')) AS l
                  FROM (SELECT host,
                          string_split_regex(body, '\\r?\\n') AS ls
                        FROM bodies) b,
                       unnest(generate_series(1, len(ls))) t(i)),
           rel AS (SELECT * FROM (
                     SELECT host, line_no,
                       lower(regexp_extract(l, '^([A-Za-z-]+)\\s*:', 1)) AS field,
                       trim(regexp_extract(l, '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1)) AS value
                     FROM ln WHERE l != '')
                   WHERE field IN ('user-agent', 'allow', 'disallow')),
           g0 AS (SELECT *, lag(field) OVER
                    (PARTITION BY host ORDER BY line_no) AS prev_field
                  FROM rel),
           g1 AS (SELECT *, sum(CASE WHEN field = 'user-agent' AND
                      (prev_field IS NULL OR prev_field != 'user-agent')
                      THEN 1 ELSE 0 END) OVER
                    (PARTITION BY host ORDER BY line_no) AS grp
                  FROM g0),
           groups AS (SELECT host, grp,
                        max(CASE WHEN lower(value) = 'graftbot'
                            THEN 1 ELSE 0 END) AS exact,
                        max(CASE WHEN value = '*' THEN 1 ELSE 0 END) AS star
                      FROM g1 WHERE field = 'user-agent' GROUP BY host, grp),
           tier AS (SELECT host, max(exact) AS has_exact
                    FROM groups GROUP BY host),
           sel AS (SELECT g.host, g.grp FROM groups g JOIN tier USING (host)
                   WHERE CASE WHEN has_exact = 1 THEN exact = 1
                              ELSE star = 1 END)
         SELECT DISTINCT g1.host, value AS path_prefix,
           field = 'allow' AS allow
         FROM g1 JOIN sel ON g1.host = sel.host AND g1.grp = sel.grp
         WHERE field != 'user-agent' AND value != ''""",

    // mirrors flattenThreads over the planted 5-block forest: the
    // recursive CTE walks root-down accumulating the same 'role:
    // content' lines; leaves = ids never referenced as a parent
    "p157_thread_flatten" ->
      """WITH RECURSIVE msgs AS (SELECT doc_id AS id,
             CASE WHEN doc_id % 5 = 0 THEN NULL
                  WHEN doc_id % 5 = 3 THEN doc_id - 2
                  ELSE doc_id - 1 END AS parent,
             CASE WHEN doc_id % 2 = 0 THEN 'user'
                  ELSE 'assistant' END AS role,
             substr(text, 1, 60) AS content
           FROM documents),
           paths AS (
             SELECT id, id AS root_id, 1 AS depth,
               role || ': ' || content AS convo
             FROM msgs WHERE parent IS NULL
             UNION ALL
             SELECT m.id, p.root_id, p.depth + 1,
               p.convo || chr(10) || m.role || ': ' || m.content
             FROM msgs m JOIN paths p ON m.parent = p.id)
         SELECT p.id AS leaf_id, p.root_id,
           CAST(p.depth AS BIGINT) AS depth, p.convo
         FROM paths p
         ANTI JOIN (SELECT DISTINCT parent FROM msgs
                    WHERE parent IS NOT NULL) q
           ON p.id = q.parent""",

    // the p14 cluster walk + the p24 split recipe re-keyed on the
    // cluster representative (singletons on their own id)
    "p158_cluster_split" ->
      s"""WITH RECURSIVE ${minhashPairsCtes("documents")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src AS doc, w.label
                      FROM edges e JOIN walk w ON e.dst = w.doc),
             cl AS (SELECT doc, min(label) AS cluster_id
                    FROM walk GROUP BY doc),
             keyed AS (SELECT d.doc_id,
                         coalesce(cl.cluster_id, d.doc_id) AS split_key
                       FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc),
             b AS (SELECT doc_id, split_key,
                     ('0x' || substr(md5('split:' || split_key::VARCHAR),
                       1, 15))::BIGINT % 10000 AS bucket
                   FROM keyed)
         SELECT doc_id, split_key, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM b""",

    // mirrors deleteFromExactIndex over the planted corpus: totals
    // minus the delete list's per-hash counts, empty keys dropped,
    // deleted winners NULLed (the delete rule is by id, so the winner
    // test is keep_id % 7 = 0)
    "p159_index_delete" ->
      """WITH d0 AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                  ELSE text END AS text
           FROM documents),
           h AS (SELECT doc_id, md5(text) AS content_hash FROM d0),
           tot AS (SELECT content_hash, min(doc_id) AS keep_id,
                     CAST(count(*) AS BIGINT) AS dup_cnt
                   FROM h GROUP BY 1),
           del AS (SELECT content_hash, CAST(count(*) AS BIGINT) AS del_cnt
                   FROM h WHERE doc_id % 7 = 0 GROUP BY 1)
         SELECT t.content_hash,
           CASE WHEN t.keep_id % 7 = 0 THEN NULL ELSE t.keep_id END AS keep_id,
           t.dup_cnt - coalesce(d.del_cnt, 0) AS dup_cnt
         FROM tot t LEFT JOIN del d USING (content_hash)
         WHERE t.dup_cnt - coalesce(d.del_cnt, 0) > 0""",

    // mirrors deleteFromLineIndex over the p113 plant: per-line-key
    // totals minus the delete list's counts; the lexicographic
    // (doc, pos) winner packed as doc*4+pos (every planted doc has
    // exactly 3 lines, so pos < 4); winners of deleted docs NULLed
    "p160_line_index_delete" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'shared footer please subscribe' ||
                chr(10) || 'uniq-' || doc_id::VARCHAR AS text
              FROM documents),
             l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d0),
             l AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
                   FROM l0, unnest(generate_series(1, len(ls))) t(i)),
             k AS (SELECT doc_id, pos,
                     ('0x' || substr(md5(array_to_string(list_filter(
                       string_split_regex(lower(trim(line)), '\s+'),
                       x -> x != ''), ' ')), 1, 15))::BIGINT AS lk
                   FROM l WHERE regexp_matches(line, '\S')),
             tot AS (SELECT lk, min(doc_id * 4 + pos) AS w,
                       CAST(count(*) AS BIGINT) AS cnt
                     FROM k GROUP BY 1),
             del AS (SELECT lk, CAST(count(*) AS BIGINT) AS del_cnt
                     FROM k WHERE doc_id % 7 = 0 GROUP BY 1)
         SELECT t.lk,
           CASE WHEN (t.w // 4) % 7 = 0 THEN NULL ELSE t.w // 4 END AS doc,
           CASE WHEN (t.w // 4) % 7 = 0 THEN NULL ELSE t.w % 4 END AS pos,
           t.cnt - coalesce(d.del_cnt, 0) AS cnt
         FROM tot t LEFT JOIN del d USING (lk)
         WHERE t.cnt - coalesce(d.del_cnt, 0) > 0""",

    // p71's screen relation with the deleted evens off BOTH sides
    // (doc%6=0 implies even, so odd batch docs are never excluded):
    // the deleted index must serve exactly as one built on the
    // retained corpus
    "p161_minhash_index_delete" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT doc_a, doc_b, jaccard FROM j
         WHERE jaccard >= 0.4 AND (doc_a % 2 = 1 OR doc_b % 2 = 1)
           AND doc_a % 6 != 0 AND doc_b % 6 != 0""",

    // p73's pair relation with the deleted evens off both sides (the
    // p161 rule on the embedding family)
    "p162_cosine_index_delete" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id)
         SELECT vec_a, vec_b, sim FROM pr
         WHERE sim >= 0.35 AND (vec_a % 2 = 1 OR vec_b % 2 = 1)
           AND vec_a % 6 != 0 AND vec_b % 6 != 0""",

    // p82's pair relation with the deleted evens off BOTH sides
    // (doc%6=0 implies even, so odd batch docs are never excluded):
    // the deleted signature index must serve exactly as one built on
    // the retained signatures
    "p163_hamming_index_delete" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS dh0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(dh0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS dh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dh, b.dh)) <= 4
           AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
           AND a.doc_id % 6 != 0 AND b.doc_id % 6 != 0""",

    // mirrors deleteFromPriorityIndex over the p132 plant: per-hash
    // totals minus the delete list's counts, empty keys dropped, both
    // decoded winner halves NULLed when the packed winner's id is
    // deleted (packed values are unique per doc, so winner-deleted ⟺
    // the delete partials' min equals the stored min ⟺ id%7=0), and
    // prio_mask kept as the bit_or over ALL original contributors —
    // the documented non-retractable-superset rule
    "p164_priority_index_delete" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                  ELSE text END AS text,
             CAST(substr(source, 4) AS BIGINT) % 4 AS priority
           FROM documents),
           h AS (SELECT doc_id, priority, md5(text) AS content_hash FROM d),
           tot AS (SELECT content_hash,
                     min(priority * 1099511627776 + doc_id) AS win,
                     CAST(count(*) AS BIGINT) AS dup_cnt,
                     CAST(sum(DISTINCT (1::BIGINT << priority::INT))
                       AS BIGINT) AS prio_mask
                   FROM h GROUP BY 1),
           del AS (SELECT content_hash, CAST(count(*) AS BIGINT) AS del_cnt
                   FROM h WHERE doc_id % 7 = 0 GROUP BY 1)
         SELECT t.content_hash,
           CASE WHEN (t.win % 1099511627776) % 7 = 0 THEN NULL
                ELSE CAST(t.win % 1099511627776 AS BIGINT) END AS keep_id,
           CASE WHEN (t.win % 1099511627776) % 7 = 0 THEN NULL
                ELSE CAST(t.win // 1099511627776 AS BIGINT) END
             AS keep_priority,
           t.dup_cnt - coalesce(d.del_cnt, 0) AS dup_cnt,
           t.prio_mask
         FROM tot t LEFT JOIN del d USING (content_hash)
         WHERE t.dup_cnt - coalesce(d.del_cnt, 0) > 0""",

    // the shingle-family p148 CTEs with the deleted docs off the
    // corpus side of the candidate join — including the %10==1 batch
    // excerpts whose source page was deleted
    "p166_shingle_index_delete" ->
      raw"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
             srcm AS (SELECT doc_id + 1 AS doc_id, text AS srctext FROM ev),
             bt AS (SELECT b.doc_id,
                 CASE WHEN b.doc_id % 10 = 1 THEN
                   array_to_string((list_filter(string_split_regex(
                     lower(trim(s.srctext)), '\s+'), x -> x != ''))[2:25], ' ')
                 ELSE b.text END AS text
               FROM documents b LEFT JOIN srcm s ON b.doc_id = s.doc_id
               WHERE b.doc_id % 2 = 1),
             u AS (SELECT doc_id, text FROM ev
                   UNION ALL SELECT doc_id, text FROM bt),
             d AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   x -> x != '') AS toks
               FROM u),
             s0 AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                   THEN list_distinct(list_transform(
                     generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' ')))
                   ELSE [] END AS sh0
               FROM d),
             sx AS (SELECT doc_id, list_distinct(list_transform(sh0, sg ->
                 ('0x' || substr(md5(sg), 1, 15))::BIGINT)) AS sh
               FROM s0),
             ex AS (SELECT doc_id, unnest(sh) AS sg FROM sx),
             sz AS (SELECT doc_id, len(sh) AS n_sh FROM sx),
             inter AS (SELECT b.doc_id AS bdoc, c.doc_id AS cdoc,
                 count(*) AS inter
               FROM ex b JOIN ex c ON b.sg = c.sg
               WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
                 AND c.doc_id % 8 != 0
               GROUP BY 1, 2),
             cz AS (SELECT i.bdoc, i.cdoc, i.inter,
                 sb.n_sh AS nb, sc.n_sh AS nc
               FROM inter i JOIN sz sb ON i.bdoc = sb.doc_id
                 JOIN sz sc ON i.cdoc = sc.doc_id),
             dirn AS (SELECT bdoc AS doc_inner, cdoc AS doc_outer,
                 inter, round(inter * 1.0 / nb, 6) AS containment FROM cz
               UNION ALL
               SELECT cdoc AS doc_inner, bdoc AS doc_outer,
                 inter, round(inter * 1.0 / nc, 6) AS containment FROM cz)
         SELECT doc_inner, doc_outer, CAST(inter AS BIGINT) AS inter,
           containment
         FROM dirn WHERE containment >= 0.8""",

    // the p159 survivor CTEs joined back to the delete list: a deleted
    // doc's hash is still_present iff its group kept copies
    // (dup_cnt − del_cnt > 0), with that retained count; the winner is
    // forgotten iff the surviving key's stored min-id winner was
    // itself a deletee (keep_id % 7 = 0 — the delete rule is by id)
    "p172_takedown_audit" ->
      """WITH d0 AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                  ELSE text END AS text
           FROM documents),
           h AS (SELECT doc_id, md5(text) AS content_hash FROM d0),
           tot AS (SELECT content_hash, min(doc_id) AS keep_id,
                     CAST(count(*) AS BIGINT) AS dup_cnt
                   FROM h GROUP BY 1),
           del AS (SELECT content_hash, CAST(count(*) AS BIGINT) AS del_cnt
                   FROM h WHERE doc_id % 7 = 0 GROUP BY 1),
           sv AS (SELECT t.content_hash,
                    t.dup_cnt - coalesce(d.del_cnt, 0) AS rem,
                    t.keep_id % 7 = 0 AS wf
                  FROM tot t LEFT JOIN del d USING (content_hash)
                  WHERE t.dup_cnt - coalesce(d.del_cnt, 0) > 0)
         SELECT h.doc_id, h.content_hash,
           sv.content_hash IS NOT NULL AS still_present,
           coalesce(sv.rem, 0) AS retained_copies,
           coalesce(sv.wf, false) AS winner_forgotten
         FROM h LEFT JOIN sv USING (content_hash)
         WHERE h.doc_id % 7 = 0""",

    // BLOCKING-INDEPENDENT truth for p173: brute-force all-pairs
    // levenshtein over the planted titles (length prefilter only —
    // |len diff| > k already implies distance > k); hash-equality
    // against the engine's symmetric-deletion candidates certifies
    // the blocking lossless over this corpus
    "p173_editdist_dedup" ->
      s"""WITH $editdistCtes
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.title, b.title) AS BIGINT) AS edit_dist
         FROM p a JOIN p b
           ON a.doc_id < b.doc_id
           AND abs(len(a.title) - len(b.title)) <= 1
           AND levenshtein(a.title, b.title) <= 1""",

    // the p173 truth restricted to cross-split (batch-odd ×
    // corpus-even) pairs — the stored title index must serve the
    // identical relation without re-deriving corpus variants
    "p178_editdist_screen" ->
      s"""WITH $editdistCtes
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.title, b.title) AS BIGINT) AS edit_dist
         FROM p a JOIN p b
           ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
           AND abs(len(a.title) - len(b.title)) <= 1
           AND levenshtein(a.title, b.title) <= 1""",

    // p178's relation with the deleted evens off the corpus side
    "p179_editdist_index_delete" ->
      s"""WITH $editdistCtes
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.title, b.title) AS BIGINT) AS edit_dist
         FROM p a JOIN p b
           ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
           AND b.doc_id % 8 != 0
           AND abs(len(a.title) - len(b.title)) <= 1
           AND levenshtein(a.title, b.title) <= 1""",

    // the winnowing pipeline replayed verbatim: tokenize → SEQUENTIAL
    // 4-token gram hashes → 4-window minima → distinct per doc →
    // all-pairs shared counts at the same threshold (slices are 4
    // elements, DuckDB ranges being inclusive; 7 tokens / 4 grams are
    // the k + w − 1 guarantee floors under which no full window
    // exists)
    "p174_winnow_overlap" ->
      s"""WITH $winnowCtes,
           pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
             FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
         SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
         FROM pr WHERE n_shared >= 4""",

    // the p174 CTEs restricted to cross-split (batch-odd × corpus-
    // even) pairs — the stored-index screen must return the identical
    // relation without ever re-fingerprinting the corpus
    "p175_winnow_screen" ->
      s"""WITH $winnowCtes,
           pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
             FROM e a JOIN e b ON a.fp = b.fp
               AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
             GROUP BY 1, 2)
         SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
         FROM pr WHERE n_shared >= 4""",

    // p175's relation with the deleted evens off the corpus side: the
    // deleted winnow index serves exactly as one built on the
    // retained corpus
    "p176_winnow_index_delete" ->
      s"""WITH $winnowCtes,
           pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
             FROM e a JOIN e b ON a.fp = b.fp
               AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
               AND b.doc_id % 8 != 0
             GROUP BY 1, 2)
         SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
         FROM pr WHERE n_shared >= 4""",

    // the p171 phrase list restated by the same modular arithmetic
    // over the literal vocabulary; DISTINCT collapses the intended
    // collisions exactly as the automaton's build does, and
    // contains(lower(text), p) is the byte-containment the automaton
    // computes
    "p171_blocklist_gate" ->
      """WITH v AS (SELECT ['a','agg','batch','big','column','customer',
             'data','fast','filter','group','hash','join','key','line',
             'merge','order','part','query','row','scan','slow','small',
             'sort','spark','stream','table','the','value','vector',
             'window'] AS vs),
           ph AS (SELECT DISTINCT
               vs[((i*7 + i//30) % 30) + 1] || ' ' ||
               vs[((i*11 + 3*(i//30) + 5) % 30) + 1] AS p
             FROM unnest(generate_series(0, 399)) t(i), v),
           m AS (SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_phrases
                 FROM documents d JOIN ph ON contains(lower(d.text), ph.p)
                 GROUP BY 1)
         SELECT d.doc_id, coalesce(m.n_phrases, 0) AS n_phrases,
           coalesce(m.n_phrases, 0) <= 24 AS keep
         FROM documents d LEFT JOIN m USING (doc_id)""",

    // mirrors removeDuplicateSpans over the span-planted corpus:
    // case-preserving whitespace tokens, k=8 grams hashed to 60 bits,
    // every occurrence after the (doc_id, pos)-first removed, covered
    // token positions dropped, text reassembled in order
    "p23_span_dedup" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || ' shared span alpha bravo charlie delta echo foxtrot' ||
                ' golf hotel india juliett tail-' || doc_id::VARCHAR AS text
              FROM documents),
             w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
                   FROM d0),
             g AS (SELECT doc_id, p - 1 AS pos,
                     ('0x' || substr(md5(array_to_string(toks[p:p+7], ' ')), 1, 15))::BIGINT AS gh
                   FROM w, unnest(generate_series(1, len(toks) - 7)) t(p)
                   WHERE len(toks) >= 8),
             rm AS (SELECT doc_id, pos FROM g
                    QUALIFY row_number() OVER (PARTITION BY gh
                                               ORDER BY doc_id, pos) > 1),
             cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS pos
                     FROM rm),
             touched AS (SELECT DISTINCT doc_id FROM cov),
             wp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS word
                    FROM w, unnest(generate_series(1, len(toks))) t(i)
                    WHERE doc_id IN (SELECT doc_id FROM touched)),
             kept AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS t2
                      FROM wp ANTI JOIN cov USING (doc_id, pos)
                      GROUP BY doc_id)
         SELECT d0.doc_id,
           CASE WHEN t.doc_id IS NULL THEN d0.text
                ELSE coalesce(kept.t2, '') END AS text
         FROM d0 LEFT JOIN touched t USING (doc_id)
                 LEFT JOIN kept USING (doc_id)""",

    // exact mirror of removeDuplicateCharSpans, grouping by the ACTUAL
    // 30-char substring where Spark groups by its rolling 64-bit hash
    // — identical output absent a hash collision; interval merge and
    // gap-slice rebuild replayed verbatim
    "p35_substring_dedup" ->
      """WITH d0 AS (SELECT doc_id,
                text || ' sub-span golf echo bravo delta wrap-' ||
                doc_id::VARCHAR AS text
              FROM documents),
             w AS (SELECT doc_id, s, s + 29 AS e
                   FROM (SELECT doc_id, text,
                           unnest(generate_series(1, len(text) - 29)) AS s
                         FROM d0 WHERE len(text) >= 30) ws
                   QUALIFY row_number() OVER (
                     PARTITION BY substr(text, s, 30)
                     ORDER BY doc_id, s) > 1),
             m1 AS (SELECT doc_id, s, e,
                      max(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS pme
                    FROM w),
             m2 AS (SELECT doc_id, s, e,
                      CASE WHEN pme IS NULL OR s > pme + 1 THEN 1 ELSE 0 END
                        AS ni
                    FROM m1),
             m3 AS (SELECT doc_id, s, e,
                      sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS isl
                    FROM m2),
             iv AS (SELECT doc_id, min(s) AS s, max(e) AS e
                    FROM m3 GROUP BY doc_id, isl),
             gaps AS (
               SELECT doc_id,
                 coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
                   + 1 AS gs,
                 s - 1 AS ge
               FROM iv
               UNION ALL
               SELECT iv.doc_id, max(iv.e) + 1 AS gs, max(len(d0.text)) AS ge
               FROM iv JOIN d0 USING (doc_id) GROUP BY iv.doc_id),
             pieces AS (SELECT g.doc_id, gs,
                          substr(d0.text, gs, ge - gs + 1) AS piece
                        FROM gaps g JOIN d0 USING (doc_id) WHERE ge >= gs),
             reb AS (SELECT doc_id, string_agg(piece, '' ORDER BY gs) AS t2
                     FROM pieces GROUP BY doc_id),
             touched AS (SELECT DISTINCT doc_id FROM w)
         SELECT d0.doc_id,
           CASE WHEN t.doc_id IS NULL THEN d0.text
                ELSE coalesce(reb.t2, '') END AS text
         FROM d0 LEFT JOIN touched t USING (doc_id)
                 LEFT JOIN reb USING (doc_id)""",

    // identical add-one-smoothed unigram NLL: per-token MICRO-NAT
    // integers before the per-doc mean (exact BIGINT sum — a float mean
    // flips its 6th decimal on summation order, measured on 1 sf0.01
    // row); sum(cnt)/sum(nllu) cast to BIGINT (DuckDB sums to HUGEINT)
    "p36_lm_score" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
             t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS v FROM c),
             s AS (SELECT doc_id,
                     CAST(round(-ln((cnt + 1.0) / (n + v)) * 1000000)
                          AS BIGINT) AS nllu
                   FROM tok JOIN c USING (term), t),
             g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     round(CAST(sum(nllu) AS BIGINT)
                           / (count(*) * 1000000.0), 6) AS lm_nll
                   FROM s GROUP BY 1)
         SELECT doc_id,
           coalesce(n_tokens, CAST(0 AS BIGINT)) AS n_tokens, lm_nll
         FROM documents LEFT JOIN g USING (doc_id)""",

    // corpus-wide line dedup: first occurrence = smallest (doc_id, pos)
    // per normalized-line key; whitespace-only lines are layout and
    // never dedup; only touched docs are reassembled
    "p37_line_dedup" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'shared footer please subscribe' ||
                chr(10) || 'uniq-' || doc_id::VARCHAR AS text
              FROM documents),
             dl AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d0),
             l AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
                   FROM dl, unnest(generate_series(1, len(ls))) t(i)),
             c AS (SELECT doc_id, pos,
                     ('0x' || substr(md5(array_to_string(list_filter(
                       string_split_regex(lower(trim(line)), '\s+'),
                       x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                   FROM l WHERE regexp_matches(line, '\S')),
             rm AS (SELECT doc_id, pos FROM c
                    QUALIFY row_number() OVER (PARTITION BY k
                                               ORDER BY doc_id, pos) > 1),
             touched AS (SELECT DISTINCT doc_id FROM rm),
             wp AS (SELECT doc_id, pos, line FROM l
                    WHERE doc_id IN (SELECT doc_id FROM touched)),
             kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2
                      FROM wp ANTI JOIN rm USING (doc_id, pos)
                      GROUP BY doc_id)
         SELECT d0.doc_id,
           CASE WHEN t.doc_id IS NULL THEN d0.text
                ELSE coalesce(kept.t2, '') END AS text
         FROM d0 LEFT JOIN touched t USING (doc_id)
                 LEFT JOIN kept USING (doc_id)""",

    // p36's CTEs + exact tertile cutoffs; (1.0::DOUBLE)/3 forces DOUBLE
    // division (a DuckDB DECIMAL literal would interpolate at a subtly
    // different quantile position than Spark's double 1.0/3)
    "p38_lm_buckets" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
             t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS v FROM c),
             s AS (SELECT doc_id,
                     CAST(round(-ln((cnt + 1.0) / (n + v)) * 1000000)
                          AS BIGINT) AS nllu
                   FROM tok JOIN c USING (term), t),
             g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     round(CAST(sum(nllu) AS BIGINT)
                           / (count(*) * 1000000.0), 6) AS lm_nll
                   FROM s GROUP BY 1),
             cut AS (SELECT
                 round(quantile_cont(lm_nll, (1.0::DOUBLE)/3), 6) AS c1,
                 round(quantile_cont(lm_nll, (2.0::DOUBLE)/3), 6) AS c2
               FROM g)
         SELECT d0.doc_id,
           coalesce(g.n_tokens, CAST(0 AS BIGINT)) AS n_tokens, g.lm_nll,
           CASE WHEN g.lm_nll IS NULL THEN NULL
                WHEN g.lm_nll <= cut.c1 THEN 'head'
                WHEN g.lm_nll <= cut.c2 THEN 'middle'
                ELSE 'tail' END AS lm_bucket
         FROM documents d0 LEFT JOIN g USING (doc_id), cut""",

    // DSIR: hashed unigram+bigram buckets, add-one-smoothed target/source
    // log ratio in integer micro-nats (exact BIGINT doc sums, as p36),
    // top-20% selection by exact quantile cutoff
    "p39_dsir_resample" ->
      s"""WITH d AS (SELECT doc_id, lang = 'en' AS t, $TOKS AS toks
                     FROM documents),
             uni AS (SELECT doc_id, t, unnest(toks) AS g FROM d),
             bi AS (SELECT doc_id, t,
                      array_to_string(toks[i:i+1], ' ') AS g
                    FROM d, unnest(generate_series(1, len(toks) - 1)) s(i)
                    WHERE len(toks) >= 2),
             gr AS (SELECT doc_id, t, g FROM uni
                    UNION ALL SELECT doc_id, t, g FROM bi),
             gb AS (SELECT doc_id, t,
                      ('0x' || substr(md5('dsir:' || g), 1, 15))::BIGINT
                        % 1024 AS b
                    FROM gr),
             bc AS (SELECT b,
                      CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                      CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS cs
                    FROM gb GROUP BY 1),
             tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                            CAST(sum(cs) AS BIGINT) AS ns FROM bc),
             lam AS (SELECT b,
                       CAST(round((ln((ct + 1.0) / (nt + 1024.0)) -
                                   ln((cs + 1.0) / (ns + 1024.0)))
                                  * 1000000) AS BIGINT) AS lam
                     FROM bc, tot),
             sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                      round(CAST(sum(lam) AS BIGINT)
                            / (count(*) * 1000000.0), 6) AS dsir_score
                    FROM gb JOIN lam USING (b) WHERE NOT t GROUP BY 1),
             cut AS (SELECT round(quantile_cont(dsir_score,
                                    0.8::DOUBLE), 6) AS c FROM sc)
         SELECT s0.doc_id,
           coalesce(sc.n_grams, CAST(0 AS BIGINT)) AS n_grams,
           sc.dsir_score,
           coalesce(sc.dsir_score >= cut.c, FALSE) AS selected
         FROM (SELECT doc_id FROM documents WHERE NOT (lang = 'en')) s0
         LEFT JOIN sc USING (doc_id), cut""",

    // p14's recursive component walk + quality-ranked representative
    // (n_chars DESC, doc_id ASC — the row_number form of Spark's
    // min(struct(-quality, id)) aggregate)
    "p40_cluster_keep" ->
      s"""WITH RECURSIVE ${minhashPairsCtes("documents")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src AS doc, w.label
                      FROM edges e JOIN walk w ON e.dst = w.doc),
             cl AS (SELECT doc, min(label) AS cluster_id FROM walk GROUP BY doc),
             rep AS (SELECT cluster_id, doc_id AS rep_id FROM (
                       SELECT cl.cluster_id, dd.doc_id,
                         row_number() OVER (PARTITION BY cl.cluster_id
                           ORDER BY dd.n_chars DESC, dd.doc_id) AS rn
                       FROM cl JOIN documents dd ON dd.doc_id = cl.doc) t
                     WHERE rn = 1)
         SELECT d.doc_id, cl.cluster_id,
           coalesce(d.doc_id = rep.rep_id, TRUE) AS kept
         FROM documents d
         LEFT JOIN cl ON d.doc_id = cl.doc
         LEFT JOIN rep ON cl.cluster_id = rep.cluster_id""",

    // p23's gram hashing (raw \s+ split, 60-bit md5 gram hash) +
    // corpus-duplicate filter + the p35 running-max interval union,
    // aggregated to a per-doc coverage instead of a rewrite
    "p41_dup_ngram_coverage" ->
      raw"""WITH w AS (SELECT doc_id,
                list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
              FROM documents),
             g AS (SELECT doc_id, p - 1 AS pos,
                     ('0x' || substr(md5(array_to_string(toks[p:p+4], ' ')), 1, 15))::BIGINT AS gh
                   FROM w, unnest(generate_series(1, len(toks) - 4)) t(p)
                   WHERE len(toks) >= 5),
             dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) > 1),
             st AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
             m AS (SELECT doc_id, pos, pos + 4 AS e,
                     max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
                   FROM st),
             cov AS (SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS dup_starts,
                       CAST(sum(greatest(0, e - greatest(coalesce(pme, -1), pos - 1)))
                            AS BIGINT) AS covered_tokens
                     FROM m GROUP BY doc_id)
         SELECT w.doc_id,
           CAST(len(w.toks) AS BIGINT) AS n_tokens,
           coalesce(cov.dup_starts, CAST(0 AS BIGINT)) AS dup_starts,
           coalesce(cov.covered_tokens, CAST(0 AS BIGINT)) AS covered_tokens,
           CASE WHEN len(w.toks) > 0
                THEN round(coalesce(cov.covered_tokens, 0) / (len(w.toks) * 1.0), 6)
           END AS covered_frac
         FROM w LEFT JOIN cov USING (doc_id)""",

    // p6's cosine arithmetic; argmax replayed as row_number over
    // UNROUNDED sims (ties to smallest bench id), only the output rounds
    "p42_embedding_decontaminate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             b AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 50 = 0),
             c AS (SELECT vec_id, v AS cv FROM e WHERE vec_id % 50 <> 0),
             s AS (SELECT vec_id, bench_id,
                     list_dot_product(cv, bv) /
                       (sqrt(list_dot_product(cv, cv)) *
                        sqrt(list_dot_product(bv, bv))) AS sim
                   FROM c, b),
             r AS (SELECT vec_id, sim, bench_id,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY sim DESC, bench_id) AS rn
                   FROM s)
         SELECT vec_id, round(sim, 6) AS max_sim, bench_id AS nearest_bench,
           sim >= 0.35 AS contaminated
         FROM r WHERE rn = 1""",

    "p24_split_holdout" ->
      """WITH b AS (SELECT doc_id,
             ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 10000 AS bucket
           FROM documents)
         SELECT doc_id, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM b""",

    "p25_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source,
              CAST(len($TOKS) AS BIGINT) AS n_tokens
            FROM documents),
             c AS (SELECT doc_id, source, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS strt
                   FROM d)
         SELECT doc_id, source, n_tokens,
           CAST(floor(strt / 512.0) AS BIGINT) AS seq_id,
           CAST(strt % 512 AS BIGINT) AS seq_off
         FROM c""",

    // the engine's bounded histogram fold replayed as a <= 513-level
    // recursive CTE: one state row (entry bin t, entry fill f) per
    // (source, length-group) — scalar recursion state, every placement
    // then closed-form integer arithmetic from the group's entry state.
    // r = (512 - f) // len pieces top off the current bin, k = 512 //
    // len fill each fresh bin; exit state feeds the next (shorter)
    // group. All-BIGINT, so hash-exact by construction.
    "p117_pack_bfd" -> (BfdPackSql + """
         SELECT doc_id, source, n_tokens, piece, piece_len, seq_id,
           seq_off
         FROM packed"""),

    // the packed piece relation rolled up per (shard, sequence): the
    // document-boundary attention spans + fill/waste audit — same
    // CTEs, one GROUP BY with an ordered string_agg
    "p145_pack_spans" -> (BfdPackSql + """
         SELECT source, seq_id,
           CAST(count(*) AS BIGINT) AS n_pieces,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(piece_len) AS BIGINT) AS fill,
           CAST(512 - sum(piece_len) AS BIGINT) AS waste,
           string_agg(CAST(seq_off AS VARCHAR) || ':' ||
               CAST(seq_off + piece_len AS VARCHAR), ','
             ORDER BY seq_off) AS spans
         FROM packed GROUP BY 1, 2"""),


    // ENGINE-GENERATED literal table: n_bytes from the variant strings,
    // deflate_bytes from the shared DeflateLen helper (zlib level 6 raw
    // — a pure function of the bytes); ratio/keep arithmetic restated
    // in exact integer SQL
    "p118_compression_gate" -> {
      val consts = deflateVariants.zipWithIndex.map { case (t, i) =>
        val nb = t.getBytes("UTF-8").length.toLong
        val db = graft.functions.DeflateLen.deflateLenJ(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        (i, nb, db)
      }
      val nbCase = consts.map { case (i, nb, _) => s"WHEN $i THEN $nb" }
        .mkString(" ")
      val dbCase = consts.map { case (i, _, db) => s"WHEN $i THEN $db" }
        .mkString(" ")
      s"""WITH c AS (SELECT doc_id,
               CAST(CASE doc_id % 12 $nbCase END AS BIGINT) AS n_bytes,
               CAST(CASE doc_id % 12 $dbCase END AS BIGINT) AS deflate_bytes
             FROM documents),
           r AS (SELECT *, CASE WHEN n_bytes > 0
                   THEN (deflate_bytes * 1000) // n_bytes END AS ratio_milli
                 FROM c)
         SELECT doc_id, n_bytes, deflate_bytes, ratio_milli,
           coalesce(ratio_milli >= 250 AND ratio_milli <= 750, false) AS keep
         FROM r"""
    },

    // replays the 6 planted variants as escaped literals and restates
    // every code signal in identical integer milli arithmetic
    "p126_code_gate" -> {
      def esc(s: String) = s.replace("'", "''")
      val caseArms = codeVariants.zipWithIndex.map { case (t, i) =>
        s"WHEN $i THEN '${esc(t)}'" }.mkString("\n           ")
      val kw = graft.pipeline.Quality.CodeKeywords.map(k =>
        s"(CASE WHEN strpos(text, '${esc(k)}') > 0 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id,
             CASE doc_id % 8 $caseArms ELSE text END AS text
           FROM documents),
         s AS (SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             CAST(length(text) -
               length(translate(text, '{}();=<>[]', '')) AS BIGINT) AS sym_chars,
             CAST(len(list_filter(string_split(text, chr(10)),
               l -> substr(l, 1, 4) = '    ' OR substr(l, 1, 1) = chr(9)))
               AS BIGINT) AS indent_lines,
             CAST(len(list_filter(string_split(text, chr(10)),
               l -> right(rtrim(l), 1) IN (';', '{', '}')))
               AS BIGINT) AS term_lines,
             CAST($kw AS BIGINT) AS kw_hits
           FROM d),
         r AS (SELECT doc_id, n_chars, n_lines,
             (sym_chars * 1000) // greatest(n_chars, 1) AS sym_milli,
             (indent_lines * 1000) // greatest(n_lines, 1) AS indent_milli,
             (term_lines * 1000) // greatest(n_lines, 1) AS term_milli,
             kw_hits
           FROM s)
       SELECT doc_id, n_chars, n_lines, sym_milli, indent_milli,
         term_milli, kw_hits,
         3 * sym_milli + 2 * term_milli + (indent_milli // 4)
           + 100 * kw_hits AS score_milli,
         (3 * sym_milli + 2 * term_milli + (indent_milli // 4)
           + 100 * kw_hits) >= 400 AS is_code
       FROM r"""
    },

    // the window-rank form the packed-TopK aggregate provably equals
    "p127_host_cap" ->
      """WITH s AS (SELECT source, doc_id,
             CAST(n_chars % 1000 AS BIGINT) AS score FROM documents),
         r AS (SELECT source, doc_id, score,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
           FROM s)
       SELECT source, doc_id, score, rank FROM r WHERE rank <= 7""",

    // closed-form ChatML length arithmetic: per-turn overhead is
    // 24 + len(role) + len(content) (12 for <|im_start|>, newline,
    // 10 for <|im_end|>, newline); assistant content starts at
    // prefix + 12 + 9 + 1
    "p128_chat_render" -> {
      def esc(s: String) = s.replace("'", "''")
      val sys = esc(ChatSysPrompt)
      s"""WITH d AS (SELECT doc_id, text,
             CAST(length('$sys') AS BIGINT) AS ls,
             CAST(length(substr(text, 1, 120)) AS BIGINT) AS l1,
             CAST(length(substr(text, 121, 200)) AS BIGINT) AS l2,
             CAST(length(substr(text, 321, 160)) AS BIGINT) AS l4
           FROM documents),
         o AS (SELECT doc_id, text, l2, l4,
             (24 + 6 + ls) + (24 + 4 + l1) AS p2
           FROM d),
         sp AS (SELECT doc_id, text,
             p2 + 22 AS s2, p2 + 22 + l2 AS e2,
             p2 + (24 + 9 + l2) + (24 + 4 + 9) + 22 AS s4,
             p2 + (24 + 9 + l2) + (24 + 4 + 9) + 22 + l4 AS e4
           FROM o)
       SELECT doc_id,
         '<|im_start|>system' || chr(10) || '$sys' || '<|im_end|>'
           || chr(10) || '<|im_start|>user' || chr(10)
           || substr(text, 1, 120) || '<|im_end|>' || chr(10)
           || '<|im_start|>assistant' || chr(10)
           || substr(text, 121, 200) || '<|im_end|>' || chr(10)
           || '<|im_start|>user' || chr(10) || 'Continue.'
           || '<|im_end|>' || chr(10)
           || '<|im_start|>assistant' || chr(10)
           || substr(text, 321, 160) || '<|im_end|>' || chr(10)
           AS rendered,
         CAST(5 AS BIGINT) AS n_turns,
         CAST(s2 AS VARCHAR) || ':' || CAST(e2 AS VARCHAR) || ','
           || CAST(s4 AS VARCHAR) || ':' || CAST(e4 AS VARCHAR)
           AS assistant_spans
       FROM sp"""
    },

    // exact integer-micro pooling: same fixed-pointing, same
    // truncate-toward-zero division via nonnegative operands only
    "p129_embed_pool" ->
      """WITH x AS (SELECT vec_id % 50 AS grp, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0)
               AS BIGINT) AS v
           FROM embeddings,
             unnest(generate_series(1, len(embedding))) u(i)),
         a AS (SELECT grp, pos, CAST(sum(v) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
           FROM x GROUP BY grp, pos),
         g AS (SELECT grp, max(c) AS n_chunks,
             CAST(count(*) AS BIGINT) AS dim
           FROM a GROUP BY grp),
         m AS (SELECT grp, pos, s, c,
             CASE WHEN s >= 0 THEN s // c ELSE -((-s) // c) END AS mm
           FROM a),
         nr AS (SELECT grp, CAST(sum(mm * mm) AS BIGINT) AS norm_sq
           FROM m GROUP BY grp)
       SELECT m.grp, g.n_chunks, g.dim, nr.norm_sq,
         CAST(m.pos AS BIGINT) AS pos, m.mm AS mean_micro,
         CASE WHEN nr.norm_sq > 0 THEN
           round(CAST(m.mm AS DOUBLE) / sqrt(CAST(nr.norm_sq AS DOUBLE)), 6)
         END AS unit_val
       FROM m JOIN g ON m.grp = g.grp JOIN nr ON m.grp = nr.grp""",

    // all-pairs margin relation restated: same fixed-pointing, same
    // rank order, same one-division integer margin
    "p130_bitext_margin" -> (bitextOracleHead("s, t") + bitextOracleTail),

    // candidate-graph margin: the p111 band replay in front (planes
    // from md5('plane:'||p||':'||d), bucket = Σ bit·2^(p%8)), sims and
    // both neighborhoods computed only within candidate pairs
    "p131_bitext_margin_lsh" -> (bitextOracleHead(
      """cand JOIN s USING (src_id) JOIN t USING (tgt_id)""") +
      bitextOracleTail),

    "p132_priority_dedup" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2
               THEN 'grp:' || CAST(doc_id // 4 AS VARCHAR) ELSE text END AS text,
             CAST(substr(source, 4) AS BIGINT) % 4 AS priority
           FROM documents),
         g AS (SELECT md5(text) AS content_hash,
             min(priority * 1099511627776 + doc_id) AS win,
             CAST(count(*) AS BIGINT) AS dup_cnt,
             CAST(count(DISTINCT priority) AS BIGINT) AS n_sources
           FROM d GROUP BY 1)
       SELECT content_hash,
         CAST(win % 1099511627776 AS BIGINT) AS keep_id,
         CAST(win // 1099511627776 AS BIGINT) AS keep_priority,
         dup_cnt, n_sources
       FROM g""",

    // the Gear walk replayed exactly: md5-derived gear constants, the
    // 2^64 wrap in HUGEINT, the same minLen/maxLen/maskBits cut rule;
    // chunk hashes and the first-occurrence packing restated verbatim
    "p135_cdc_dedup" -> (cdcWalkSql +
      s""",
         fo AS (SELECT chash, min(packed) AS fp FROM ch GROUP BY 1),
         per AS (SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(len) AS BIGINT) AS chunk_chars,
             CAST(sum(CASE WHEN packed > fp THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup,
             CAST(sum(CASE WHEN packed > fp THEN len ELSE 0 END)
               AS BIGINT) AS dup_chars
           FROM ch JOIN fo USING (chash) GROUP BY 1)
       SELECT d.doc_id,
         coalesce(p.n_chunks, 0) AS n_chunks,
         coalesce(p.chunk_chars, 0) AS chunk_chars,
         coalesce(p.n_dup, 0) AS n_dup,
         coalesce(p.dup_chars, 0) AS dup_chars,
         (coalesce(p.dup_chars, 0) * 1000)
           // greatest(coalesce(p.chunk_chars, 0), 1) AS dup_permille
       FROM documents d LEFT JOIN per p USING (doc_id)"""),

    // the p135 walk VERBATIM under the cross-snapshot temporal
    // contract, restricted to odd (batch) docs: a batch chunk dies
    // when its hash appears in ANY even (corpus) doc — regardless of
    // packing, the corpus was ingested first — or when an earlier
    // batch occurrence (smaller (doc, start) packing) carries it
    "p138_cdc_screen" -> (cdcWalkSql +
      s""",
         ck AS (SELECT DISTINCT chash FROM ch WHERE doc_id % 2 = 0),
         bc AS (SELECT * FROM ch WHERE doc_id % 2 = 1),
         bf AS (SELECT chash, min(packed) AS bfp FROM bc GROUP BY 1),
         per AS (SELECT bc.doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(bc.len) AS BIGINT) AS chunk_chars,
             CAST(sum(CASE WHEN ck.chash IS NOT NULL OR bc.packed > bf.bfp
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             CAST(sum(CASE WHEN ck.chash IS NOT NULL OR bc.packed > bf.bfp
               THEN bc.len ELSE 0 END) AS BIGINT) AS dup_chars
           FROM bc JOIN bf USING (chash)
             LEFT JOIN ck ON bc.chash = ck.chash
           GROUP BY 1)
       SELECT d.doc_id,
         coalesce(p.n_chunks, 0) AS n_chunks,
         coalesce(p.chunk_chars, 0) AS chunk_chars,
         coalesce(p.n_dup, 0) AS n_dup,
         coalesce(p.dup_chars, 0) AS dup_chars,
         (coalesce(p.dup_chars, 0) * 1000)
           // greatest(coalesce(p.chunk_chars, 0), 1) AS dup_permille
       FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
         LEFT JOIN per p USING (doc_id)"""),

    // mirrors deleteFromChunkIndex over the even-corpus index (fold
    // included): per-chunk-hash totals minus the deleted docs'
    // re-chunked counts, empty keys dropped, the decoded
    // (first_doc, first_start) NULLed when the first-occurrence doc is
    // deleted (packed occurrences are unique, so winner-deleted ⟺ the
    // first packing's doc is divisible by 6)
    "p165_chunk_index_delete" -> (cdcWalkSql +
      s""",
         ec AS (SELECT * FROM ch WHERE doc_id % 2 = 0),
         tot AS (SELECT chash, min(packed) AS fp,
                   CAST(count(*) AS BIGINT) AS cnt
                 FROM ec GROUP BY 1),
         del AS (SELECT chash, CAST(count(*) AS BIGINT) AS del_cnt
                 FROM ec WHERE doc_id % 6 = 0 GROUP BY 1)
       SELECT t.chash AS chunk_hash,
         CASE WHEN (t.fp // 16777216) % 6 = 0 THEN NULL
              ELSE CAST(t.fp // 16777216 AS BIGINT) END AS first_doc,
         CASE WHEN (t.fp // 16777216) % 6 = 0 THEN NULL
              ELSE CAST(t.fp % 16777216 AS BIGINT) END AS first_start,
         t.cnt - coalesce(d.del_cnt, 0) AS cnt
       FROM tot t LEFT JOIN del d USING (chash)
       WHERE t.cnt - coalesce(d.del_cnt, 0) > 0"""),

    // the p54 directed-containment CTEs over the planted
    // excerpt-in-page corpus, restricted to cross-split (batch odd ×
    // corpus even) pairs — both directions, same hashed shingles,
    // same one-division rounding
    "p148_containment_screen" ->
      raw"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
             srcm AS (SELECT doc_id + 1 AS doc_id, text AS srctext FROM ev),
             bt AS (SELECT b.doc_id,
                 CASE WHEN b.doc_id % 10 = 1 THEN
                   array_to_string((list_filter(string_split_regex(
                     lower(trim(s.srctext)), '\s+'), x -> x != ''))[2:25], ' ')
                 ELSE b.text END AS text
               FROM documents b LEFT JOIN srcm s ON b.doc_id = s.doc_id
               WHERE b.doc_id % 2 = 1),
             u AS (SELECT doc_id, text FROM ev
                   UNION ALL SELECT doc_id, text FROM bt),
             d AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   x -> x != '') AS toks
               FROM u),
             s0 AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                   THEN list_distinct(list_transform(
                     generate_series(1, len(toks) - 2),
                     i -> array_to_string(toks[i:i+2], ' ')))
                   ELSE [] END AS sh0
               FROM d),
             sx AS (SELECT doc_id, list_distinct(list_transform(sh0, sg ->
                 ('0x' || substr(md5(sg), 1, 15))::BIGINT)) AS sh
               FROM s0),
             ex AS (SELECT doc_id, unnest(sh) AS sg FROM sx),
             sz AS (SELECT doc_id, len(sh) AS n_sh FROM sx),
             inter AS (SELECT b.doc_id AS bdoc, c.doc_id AS cdoc,
                 count(*) AS inter
               FROM ex b JOIN ex c ON b.sg = c.sg
               WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
               GROUP BY 1, 2),
             cz AS (SELECT i.bdoc, i.cdoc, i.inter,
                 sb.n_sh AS nb, sc.n_sh AS nc
               FROM inter i JOIN sz sb ON i.bdoc = sb.doc_id
                 JOIN sz sc ON i.cdoc = sc.doc_id),
             dirn AS (SELECT bdoc AS doc_inner, cdoc AS doc_outer,
                 inter, round(inter * 1.0 / nb, 6) AS containment FROM cz
               UNION ALL
               SELECT cdoc AS doc_inner, bdoc AS doc_outer,
                 inter, round(inter * 1.0 / nc, 6) AS containment FROM cz)
         SELECT doc_inner, doc_outer, CAST(inter AS BIGINT) AS inter,
           containment
         FROM dirn WHERE containment >= 0.8""",

    // the same plant spelled with chr() codes (decomposed = base char
    // + combining mark, precomposed = the single code point), run
    // through DuckDB's own UAX#15 NFC — the %4==1 / %4==2 hash
    // unification is the operator's claim
    "p147_nfc_normalize" ->
      """WITH d AS (SELECT doc_id, text ||
             CASE doc_id % 4
               WHEN 1 THEN ' cafe' || chr(769) || ' cre' || chr(768) || 'me'
               WHEN 2 THEN ' caf' || chr(233) || ' cr' || chr(232) || 'me'
               WHEN 3 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
               ELSE ' plain' END AS w
           FROM documents)
         SELECT doc_id, nfc_normalize(w) AS text_nfc,
           w <> nfc_normalize(w) AS changed,
           CAST(length(w) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(w)) AS BIGINT) AS n_nfc,
           md5(nfc_normalize(w)) AS content_hash
         FROM d""",

    // same planted headers, same header-shaped resolution: SPDX tag
    // first, license-text fingerprints second, name-dropping prose
    // falls through to none
    "p139_license_gate" ->
      raw"""WITH d AS (SELECT doc_id,
             CASE doc_id % 7
               WHEN 1 THEN '// SPDX-License-Identifier: MIT' || chr(10)
               WHEN 2 THEN '/* Licensed under the Apache License, Version 2.0 (the "License") */' || chr(10)
               WHEN 3 THEN '// This program is free software: you can redistribute it under the terms of the GNU General Public License.' || chr(10)
               WHEN 4 THEN 'Permission is hereby granted, free of charge, to any person obtaining a copy of this software.' || chr(10)
               WHEN 5 THEN 'An essay observing that the MIT license is discussed in classrooms while the Apache license appears in seminars.' || chr(10)
               WHEN 6 THEN '# SPDX-License-Identifier: BSD-3-Clause' || chr(10)
               ELSE '' END || text AS text
           FROM documents),
         h AS (SELECT doc_id, substr(text, 1, 2048) AS hdr,
             lower(substr(text, 1, 2048)) AS lh FROM d),
         sx AS (SELECT doc_id, lh,
             coalesce(regexp_extract(hdr,
               'SPDX-License-Identifier:\s*([A-Za-z0-9.+\-]+)', 1), '')
               AS spdx_id
           FROM h),
         lc AS (SELECT doc_id, spdx_id,
             CASE WHEN spdx_id <> '' THEN
                 CASE WHEN lower(spdx_id) LIKE 'mit%' THEN 'mit'
                      WHEN lower(spdx_id) LIKE 'apache%' THEN 'apache-2.0'
                      WHEN lower(spdx_id) LIKE 'bsd%' THEN 'bsd'
                      WHEN lower(spdx_id) LIKE 'mpl%' THEN 'mpl'
                      WHEN lower(spdx_id) LIKE '%gpl%' THEN 'gpl'
                      ELSE 'other-spdx' END
               WHEN contains(lh, 'permission is hereby granted, free of charge') THEN 'mit'
               WHEN contains(lh, 'apache license') AND contains(lh, 'version 2.0') THEN 'apache-2.0'
               WHEN contains(lh, 'redistribution and use in source and binary forms') THEN 'bsd'
               WHEN contains(lh, 'mozilla public license') THEN 'mpl'
               WHEN contains(lh, 'gnu general public license')
                 OR contains(lh, 'gnu lesser general public')
                 OR contains(lh, 'gnu affero general public') THEN 'gpl'
               ELSE 'none' END AS license
           FROM sx)
       SELECT doc_id, spdx_id, license,
         CASE WHEN license IN ('mit', 'apache-2.0', 'bsd') THEN 'permissive'
              WHEN license IN ('gpl', 'mpl') THEN 'copyleft'
              WHEN license = 'none' THEN 'none'
              ELSE 'unknown' END AS license_class,
         (license_class = 'permissive' OR license_class = 'none') AS keep
       FROM lc""",

    // the flags restated over the same plant: the p3 minhash CTEs over
    // PROMPTS (near-dup = larger id of a verified pair), keep-first
    // exact groups, the p17 shingle-hit contamination vs docs<5's
    // prompts, and the p128 ChatML render for both branches
    "p140_preference_pairs" -> {
      val src = "(SELECT doc_id, prompt AS text FROM pr)"
      s"""WITH pr AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2
               THEN 'prompt group ' || (doc_id // 4)::VARCHAR
               ELSE text END AS prompt,
             substr(text, 10, 200) AS chosen,
             CASE WHEN doc_id % 11 = 1 THEN substr(text, 10, 200)
                  WHEN doc_id % 11 = 2 THEN ''
                  ELSE substr(text, 50, 200) END AS rejected
           FROM documents),
         ${minhashPairsCtes(src)},
         nd AS (SELECT DISTINCT doc_b AS doc_id FROM j WHERE jaccard >= 0.4),
         ek AS (SELECT md5(prompt) AS h, min(doc_id) AS keep
           FROM pr GROUP BY 1),
         bm AS (SELECT DISTINCT unnest(sh) AS sg FROM s WHERE doc_id < 5),
         exs AS (SELECT doc_id, unnest(sh) AS sg FROM s),
         ct AS (SELECT DISTINCT exs.doc_id FROM exs JOIN bm USING (sg))
       SELECT pr.doc_id,
         (trim(coalesce(chosen, '')) = ''
           OR trim(coalesce(rejected, '')) = '') AS empty_side,
         coalesce(chosen, '') = coalesce(rejected, '') AS degenerate,
         pr.doc_id <> ek.keep AS exact_dup,
         nd.doc_id IS NOT NULL AS near_dup,
         ct.doc_id IS NOT NULL AS contaminated,
         '<|im_start|>user' || chr(10) || prompt || '<|im_end|>' || chr(10)
           || '<|im_start|>assistant' || chr(10) || coalesce(chosen, '')
           || '<|im_end|>' || chr(10) AS chosen_rendered,
         '<|im_start|>user' || chr(10) || prompt || '<|im_end|>' || chr(10)
           || '<|im_start|>assistant' || chr(10) || coalesce(rejected, '')
           || '<|im_end|>' || chr(10) AS rejected_rendered,
         (NOT empty_side AND NOT degenerate AND NOT exact_dup
           AND NOT near_dup AND NOT contaminated) AS keep
       FROM pr JOIN ek ON md5(pr.prompt) = ek.h
         LEFT JOIN nd ON pr.doc_id = nd.doc_id
         LEFT JOIN ct ON pr.doc_id = ct.doc_id"""
    },

    // winner + priority census over corpus (evens, two folded
    // snapshots) ∪ batch (odds), restricted to batch rows
    "p133_priority_screen" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                  ELSE text END AS text,
             CAST(substr(source, 4) AS BIGINT) % 4 AS priority
           FROM documents),
         h AS (SELECT doc_id, priority, md5(text) AS content_hash,
             priority * 1099511627776 + doc_id AS packed FROM d),
         k AS (SELECT content_hash, min(packed) AS win FROM h GROUP BY 1),
         c AS (SELECT content_hash, count(*) AS n_corpus
           FROM h WHERE doc_id % 2 = 0 GROUP BY 1),
         np AS (SELECT content_hash,
             count(DISTINCT priority) AS n_priorities
           FROM h GROUP BY 1)
       SELECT h.doc_id, h.content_hash,
         CAST(k.win % 1099511627776 AS BIGINT) AS keep_id,
         CAST(k.win // 1099511627776 AS BIGINT) AS keep_priority,
         CAST(coalesce(c.n_corpus, 0) AS BIGINT) AS n_corpus,
         CAST(np.n_priorities AS BIGINT) AS n_priorities,
         h.packed = k.win AS keep
       FROM h JOIN k USING (content_hash)
         LEFT JOIN c USING (content_hash)
         JOIN np USING (content_hash)
       WHERE h.doc_id % 2 = 1""",

    "p34_shard_assign" ->
      """SELECT doc_id,
           CAST(('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
             % 8 AS INT) AS shard
         FROM documents""",

    "p26_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ('0x' || substr(md5('sample:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 10000
             < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 ELSE 1000 END""",

    // mirrors the p43 plant, then replays every Gopher rule with the
    // identical rounded-ratio-then-threshold arithmetic
    "p43_gopher_quality" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text
                || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '• planted bullet item'
                     || chr(10) || '• second bullet item' ELSE '' END
                || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'to be continued...'
                     ELSE '' END
                || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '## ## tag ##'
                     ELSE '' END AS text
              FROM documents),
             d AS (SELECT doc_id, text,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                       x -> x != '') AS toks,
                     string_split(text, chr(10)) AS ls
                   FROM d0),
             m AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_words,
                     coalesce(round(list_sum(list_transform(toks, x -> length(x)))
                       * 1.0 / nullif(len(toks), 0), 6), 0.0) AS mean_word_len,
                     coalesce(round((length(text) - length(replace(text, '#', ''))
                       + (length(text) - length(replace(text, '...', ''))) / 3)
                       * 1.0 / nullif(len(toks), 0), 6), 0.0) AS symbol_word_ratio,
                     coalesce(round(len(list_filter(ls,
                         l -> substr(ltrim(l), 1, 1) IN ('•', '-')))
                       * 1.0 / nullif(len(ls), 0), 6), 0.0) AS bullet_line_frac,
                     coalesce(round(len(list_filter(ls,
                         l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
                       * 1.0 / nullif(len(ls), 0), 6), 0.0) AS ellipsis_line_frac,
                     coalesce(round(len(list_filter(toks,
                         x -> regexp_matches(x, '[a-z]')))
                       * 1.0 / nullif(len(toks), 0), 6), 0.0) AS alpha_word_frac,
                     CAST(len(list_filter(
                       ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                       w -> list_contains(toks, w))) AS BIGINT) AS n_stop_distinct
                   FROM d)
         SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_distinct,
           (n_words >= 50 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_word_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND n_stop_distinct >= 2) AS keep
         FROM m""",

    // mirrors the p44 plant, then replays the C4 line keep-rule and the
    // page-level sentence/lorem/brace gates
    "p44_c4_filters" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'A good closing sentence appears here.'
                || CASE WHEN doc_id % 2 = 0 THEN chr(10)
                     || 'One more fine line here. Another solid sentence follows! Was that enough? "Quoted words end well."'
                     ELSE '' END
                || CASE WHEN doc_id % 7 = 0 THEN chr(10)
                     || 'please enable javascript to continue viewing' ELSE '' END
                || CASE WHEN doc_id % 11 = 0 THEN chr(10)
                     || 'lorem ipsum dolor sit amet.' ELSE '' END
                || CASE WHEN doc_id % 13 = 0 THEN chr(10)
                     || 'config sample { alpha beta }' ELSE '' END AS text
              FROM documents),
             k AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls,
                     list_filter(string_split(text, chr(10)),
                       l -> substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
                         AND len(list_filter(string_split_regex(trim(l), '\s+'),
                               x -> x != '')) >= 3
                         AND NOT contains(lower(l), 'javascript')) AS kl
                   FROM d0),
             m AS (SELECT doc_id,
                     CAST(len(ls) AS BIGINT) AS n_lines,
                     CAST(len(kl) AS BIGINT) AS n_kept,
                     CAST(length(array_to_string(kl, chr(10)))
                       - length(regexp_replace(array_to_string(kl, chr(10)),
                           '[.!?]', '', 'g')) AS BIGINT) AS n_sentences,
                     contains(lower(text), 'lorem ipsum') AS has_lorem,
                     contains(text, '{') AS has_brace,
                     array_to_string(kl, chr(10)) AS text_clean
                   FROM k)
         SELECT doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
           (n_sentences >= 5 AND NOT has_lorem AND NOT has_brace) AS keep,
           text_clean
         FROM m""",

    // replays the bigram chain: pair counts, predecessor unigram counts,
    // vocab size, add-one smoothing, micro-nat quantization before the
    // per-doc mean (the p36 exact-integer-sum discipline)
    "p46_bigram_lm" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1])
                      ELSE [] END) AS pair FROM d),
             sp AS (SELECT doc_id, pair, string_split(pair, ' ')[1] AS prev
                    FROM pr),
             cb AS (SELECT pair, count(*) AS cb FROM pr GROUP BY 1),
             w AS (SELECT unnest(toks) AS term FROM d),
             cu AS (SELECT term, count(*) AS cu FROM w GROUP BY 1),
             v AS (SELECT count(*) AS v FROM cu),
             sc AS (SELECT doc_id,
                      CAST(round(-ln((cb.cb + 1.0) / (cu.cu + v.v))
                        * 1000000.0) AS BIGINT) AS nllu
                    FROM sp JOIN cb USING (pair)
                    JOIN cu ON sp.prev = cu.term CROSS JOIN v),
             agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       CAST(sum(nllu) AS BIGINT) AS ssum
                     FROM sc GROUP BY 1)
         SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
           round(agg.ssum / (agg.n_bigrams * 1000000.0), 6) AS lm2_nll
         FROM d LEFT JOIN agg USING (doc_id)""",

    // same hash-window dup flag, same aggregate; sums cast to BIGINT
    // (DuckDB sum(BIGINT) widens to HUGEINT)
    "p50_source_report" ->
      s"""WITH d AS (SELECT source, lang, md5(text) AS h,
              CAST(len($TOKS) AS BIGINT) AS nt
            FROM documents),
             f AS (SELECT source, lang, nt,
                     count(*) OVER (PARTITION BY h) > 1 AS dup
                   FROM d)
         SELECT source,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           round(avg(nt), 6) AS avg_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
         FROM f GROUP BY source""",

    // mirrors the p49 plant, then replays the strip/decode/collapse
    // chain with RE2's 'g' flag standing in for Java's replace-all
    "p49_html_extract" ->
      raw"""WITH h AS (SELECT doc_id,
                '<html><head><title>Doc ' || doc_id::VARCHAR
                || '</title><style>p{color:red}</style></head><body><p>'
                || text || '</p><a href="http://site/' || doc_id::VARCHAR
                || '">more</a>'
                || CASE WHEN doc_id % 4 = 0
                     THEN '<script>var x = 1 < 2 && 3 > 0;</script>'
                     ELSE '' END
                || '&amp; tail &lt;ok&gt;</body></html>' AS html
              FROM documents)
         SELECT doc_id,
           regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
           CAST(len(regexp_extract_all(html, '(?i)<a\b[^>]*\shref\s*='))
             AS BIGINT) AS n_links,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(html,
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' ', 'g'),
               '&lt;', '<', 'g'),
               '&gt;', '>', 'g'),
               '&quot;', '"', 'g'),
               '&#39;', '''', 'g'),
               '&amp;', '&', 'g'),
               '[ \t\n\f\r]+', ' ', 'g')) AS text_clean
         FROM h""",

    // replays the sqrt-temperature quotas and the salted-hash rank
    // selection (row_number ties broken by doc_id on both engines)
    "p48_lang_sample" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             t AS (SELECT sum(sqrt(c)) AS ssq, sum(c) AS n FROM c),
             q AS (SELECT lang, least(c, CAST(floor(sqrt(c) / t.ssq
                     * floor(t.n * 0.5)) AS BIGINT)) AS quota
                   FROM c, t),
             r AS (SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY ('0x' || substr(md5('langsample:'
                         || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS rnk
                   FROM documents)
         SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk, q.quota
         FROM r JOIN q USING (lang) WHERE r.rnk <= q.quota""",

    // within-word adjacent char pairs weighted by word occurrence;
    // deterministic LIMIT via the (count desc, pair asc) tie-break
    "p45_bpe_pairs" ->
      raw"""WITH w AS (SELECT unnest(list_filter(
                string_split_regex(lower(trim(text)), '\s+'), x -> x != '')) AS w
              FROM documents),
             p AS (SELECT unnest(CASE WHEN length(w) >= 2
                     THEN list_transform(generate_series(1, length(w) - 1),
                          i -> substr(w, i, 2))
                     ELSE [] END) AS pair
                   FROM w)
         SELECT pair, count(*) AS n_count FROM p
         GROUP BY 1 ORDER BY n_count DESC, pair LIMIT 50""",

    // UniMax water-filling replayed in pure integer arithmetic: capped
    // set = ascending-cap prefix, leftover split by integer division,
    // epochs = quota div c full passes + hash-ranked partial pass
    "p51_unimax_sample" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS L FROM c),
             x AS (SELECT lang, c, CAST(c * 2 AS BIGINT) AS cap,
                     CAST(row_number() OVER (ORDER BY c * 2, lang) AS BIGINT) AS i,
                     CAST(coalesce(sum(c * 2) OVER (ORDER BY c * 2, lang
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS cumprev
                   FROM c),
             y AS (SELECT x.*, t.L, CAST(floor(t.n * 1.6) AS BIGINT) AS B
                   FROM x, t),
             y2 AS (SELECT *, (cap * (L - i + 1) + cumprev <= B) AS iscap
                    FROM y),
             k AS (SELECT CAST(coalesce(max(CASE WHEN iscap THEN i END), 0)
                     AS BIGINT) AS k,
                     CAST(coalesce(sum(CASE WHEN iscap THEN cap END), 0)
                       AS BIGINT) AS capsum FROM y2),
             q AS (SELECT y2.lang, y2.c,
                     CASE WHEN y2.iscap THEN y2.cap
                          ELSE (y2.B - k.capsum) // (y2.L - k.k) END AS quota
                   FROM y2, k),
             r AS (SELECT doc_id, lang,
                     CAST(row_number() OVER (PARTITION BY lang ORDER BY
                       ('0x' || substr(md5('unimax:' || doc_id::VARCHAR), 1,
                         15))::BIGINT, doc_id) AS BIGINT) AS rnk
                   FROM documents),
             s AS (SELECT r.doc_id, r.lang, r.rnk, q.quota,
                     q.quota // q.c AS fullep, q.quota % q.c AS part
                   FROM r JOIN q USING (lang))
         SELECT doc_id, lang, rnk, quota,
           CAST(unnest(generate_series(1, CAST(fullep +
             CASE WHEN rnk <= part THEN 1 ELSE 0 END AS BIGINT)))
             AS BIGINT) AS epoch
         FROM s""",

    // BM25 with 6-dp idf/avgdl rounding and integer micro-point sums;
    // identical operator order to the Column expression so every IEEE
    // multiply/divide lands the same bits
    "p52_bm25_topk" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                    FROM tok GROUP BY 1),
             st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                      round(avg(dl), 6) AS avgdl FROM dl),
             qtf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                     FROM tok WHERE term IN ('query', 'window', 'hash')
                     GROUP BY 1, 2),
             dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                     FROM qtf GROUP BY 1),
             idf AS (SELECT term,
                       round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)), 6) AS idf
                     FROM dfr, st),
             sc AS (SELECT q.doc_id,
                      CAST(round(idf * (tf * 2.2) / (tf + 1.2 *
                        (0.25 + 0.75 * dl / avgdl)) * 1000000) AS BIGINT)
                        AS pts,
                      dl
                    FROM qtf q JOIN dl USING (doc_id)
                         JOIN idf USING (term), st)
         SELECT doc_id, CAST(sum(pts) AS BIGINT) AS bm25_micro,
           max(dl) AS n_tokens
         FROM sc GROUP BY 1 ORDER BY bm25_micro DESC, doc_id LIMIT 20""",

    // p36's micro-nat chain feeding a bucket-histogram waterline; the
    // only ordered windows run over the bounded bucket frame and within
    // single buckets
    "p53_budget_select" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
             t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS v FROM c),
             s AS (SELECT doc_id,
                     CAST(round(-ln((cnt + 1.0) / (n + v)) * 1000000)
                       AS BIGINT) AS nllu
                   FROM tok JOIN c USING (term), t),
             g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     round(CAST(sum(nllu) AS BIGINT)
                       / (count(*) * 1000000.0), 6) AS lm_nll
                   FROM s GROUP BY 1),
             sc AS (SELECT doc_id,
                      coalesce(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
                      CAST(round(lm_nll * 1000000) AS BIGINT) AS q_micro,
                      CAST(round(lm_nll * 1000000) AS BIGINT) // 100000 AS bkt
                    FROM documents LEFT JOIN g USING (doc_id)),
             tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS T FROM sc),
             bk AS (SELECT bkt, CAST(sum(n_tokens) AS BIGINT) AS btok
                    FROM sc WHERE bkt IS NOT NULL GROUP BY 1),
             bs AS (SELECT bkt, btok, CAST(floor(T * 0.4) AS BIGINT) AS B,
                      CAST(sum(btok) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
                    FROM bk, tt),
             bst AS (SELECT bkt,
                       CASE WHEN cum <= B THEN 'full'
                            WHEN cum - btok < B THEN 'boundary'
                            ELSE 'drop' END AS st,
                       B - (cum - btok) AS R
                     FROM bs),
             w AS (SELECT sc.*, bst.st, bst.R,
                     CAST(sum(n_tokens) OVER (PARTITION BY sc.bkt
                       ORDER BY q_micro, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cumtok
                   FROM sc LEFT JOIN bst USING (bkt))
         SELECT doc_id, n_tokens, q_micro,
           coalesce(st = 'full' OR (st = 'boundary' AND cumtok <= R), false)
             AS kept
         FROM w""",

    // p2's intersection chain, then each unordered pair emits both
    // directed containments and the threshold filters
    "p54_containment" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             s0 AS (SELECT doc_id, $SHINGLES3 AS sh0 FROM d),
             s AS (SELECT doc_id, list_distinct(list_transform(sh0, sg ->
                     ('0x' || substr(md5(sg), 1, 15))::BIGINT)) AS sh
                   FROM s0),
             ex AS (SELECT doc_id, unnest(sh) AS sg FROM s),
             sz AS (SELECT doc_id, len(sh) AS n_sh FROM s),
             inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         count(*) AS inter
                       FROM ex a JOIN ex b
                         ON a.sg = b.sg AND a.doc_id < b.doc_id
                       GROUP BY 1, 2),
             c AS (SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
                   FROM inter JOIN sz sa ON doc_a = sa.doc_id
                        JOIN sz sb ON doc_b = sb.doc_id),
             dir AS (SELECT doc_a AS doc_inner, doc_b AS doc_outer,
                       round(inter * 1.0 / n_a, 6) AS containment FROM c
                     UNION ALL
                     SELECT doc_b AS doc_inner, doc_a AS doc_outer,
                       round(inter * 1.0 / n_b, 6) AS containment FROM c)
         SELECT doc_inner, doc_outer, containment FROM dir
         WHERE containment >= 0.8""",

    // the 10 iterations unrolled mechanically (DuckDB's recursive CTEs
    // forbid aggregation in the recursive term); each stage is the
    // engine's integer formula verbatim
    "p55_pagerank" -> {
      val iters = (1 to 10).map { i =>
        s"""r$i AS (SELECT v.node,
               CAST(150000 + coalesce(sum(c.c), 0) AS BIGINT) AS r
             FROM v LEFT JOIN (
               SELECT e.dst, ((p.r * 850000) // 1000000) // d.deg AS c
               FROM e JOIN r${i - 1} p ON e.src = p.node
                    JOIN d ON e.src = d.src) c
             ON c.dst = v.node GROUP BY v.node)"""
      }.mkString(",\n             ")
      s"""WITH e AS (SELECT
               ('0x' || substr(md5('pre:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 % 500 AS src,
               ('0x' || substr(md5('prd:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 % 500 AS dst
             FROM documents),
             v AS (SELECT DISTINCT node FROM
               (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                   FROM e GROUP BY 1),
             r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM v),
             $iters
         SELECT node, r AS rank_micro FROM r10"""
    },

    // canonical unordered pairs as 'a b' string keys (tokens are
    // whitespace-split so ' ' can't occur inside one); identical
    // division order to the Column expression before the single
    // 6-dp-rounded ln
    "p56_pmi_pairs" -> {
      val perD = (1 to 3).map { d =>
        s"""CASE WHEN len(toks) > $d THEN list_transform(
               generate_series(1, len(toks) - $d),
               i -> CASE WHEN toks[i] <= toks[i+$d]
                         THEN toks[i] || ' ' || toks[i+$d]
                         ELSE toks[i+$d] || ' ' || toks[i] END)
             ELSE [] END"""
      }.mkString(",\n             ")
      s"""WITH f AS (SELECT toks FROM (SELECT $TOKS AS toks FROM documents)
                     WHERE len(toks) >= 2),
             p AS (SELECT unnest(flatten([$perD])) AS key FROM f),
             cooc AS (SELECT split_part(key, ' ', 1) AS t1,
                        split_part(key, ' ', 2) AS t2,
                        CAST(count(*) AS BIGINT) AS n_cooc
                      FROM p GROUP BY 1, 2),
             uni AS (SELECT unnest(toks) AS term FROM f),
             uc AS (SELECT term, CAST(count(*) AS BIGINT) AS cu
                    FROM uni GROUP BY 1),
             nt AS (SELECT CAST(sum(cu) AS BIGINT) AS nt FROM uc),
             np AS (SELECT CAST(sum(n_cooc) AS BIGINT) AS np FROM cooc)
         SELECT t1, t2, n_cooc,
           round(ln(n_cooc / np.np * nt.nt / c1.cu * nt.nt / c2.cu), 6)
             AS pmi
         FROM cooc JOIN uc c1 ON cooc.t1 = c1.term
              JOIN uc c2 ON cooc.t2 = c2.term, nt, np
         ORDER BY n_cooc DESC, t1, t2 LIMIT 200"""
    },

    // RE2 spells script classes \p{Latin} where Java needs \p{IsLatin};
    // both count the same code points. regexp_replace needs the 'g'
    // flag here (DuckDB default replaces first match only)
    "p57_script_profile" ->
      raw"""WITH c AS (SELECT doc_id, text,
               length(text) AS n,
               length(text) - length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) AS ws,
               length(text) - length(regexp_replace(text, '\p{Latin}', '', 'g')) AS lat,
               length(text) - length(regexp_replace(text, '\p{Cyrillic}', '', 'g')) AS cyr,
               length(text) - length(regexp_replace(text, '\p{Han}', '', 'g')) AS han,
               length(text) - length(regexp_replace(text, '\p{Arabic}', '', 'g')) AS ar,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS dig
             FROM documents)
         SELECT doc_id,
           CAST(n - ws AS BIGINT) AS n_nonspace,
           CAST(lat AS BIGINT) AS n_latin,
           CAST(cyr AS BIGINT) AS n_cyrillic,
           CAST(han AS BIGINT) AS n_han,
           CAST(ar AS BIGINT) AS n_arabic,
           CAST(dig AS BIGINT) AS n_digit,
           CAST(n - ws - lat - cyr - han - ar - dig AS BIGINT) AS n_other,
           CASE WHEN n - ws - lat - cyr - han - ar - dig >
                     greatest(lat, cyr, han, ar) THEN 'other'
                WHEN lat >= greatest(cyr, han, ar) THEN 'latin'
                WHEN cyr >= greatest(han, ar) THEN 'cyrillic'
                WHEN han >= ar THEN 'han'
                ELSE 'arabic' END AS dominant_script
         FROM c""",

    // plant rebuilt from chr() codes (8220/8221 curly quotes, 160
    // NBSP, 8230 ellipsis, 8203 ZWSP, 8212 em-dash); the normalize
    // chain mirrors TextOps.normalizeText with RE2's \x{...} spellings
    "p58_text_normalize" ->
      raw"""WITH w AS (SELECT doc_id,
               chr(8220) || 'q' || chr(8221) || chr(160) || text ||
                 CASE WHEN doc_id % 3 = 0
                      THEN chr(8230) || chr(8203) || ' end' || chr(8212) || 'x'
                      ELSE ' plain' END AS t
             FROM documents),
             n AS (SELECT doc_id, t, trim(regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(
               regexp_replace(t,
                 '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
                 '[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{3000}]', ' ', 'g'),
                 '[\x{2018}\x{2019}]', '''', 'g'),
                 '[\x{201C}\x{201D}]', '"', 'g'),
                 '[\x{2013}\x{2014}]', '-', 'g'),
                 '\x{2026}', '...', 'g'),
                 '[ \t\n\f\r]+', ' ', 'g')) AS tn
             FROM w)
         SELECT doc_id, tn AS text_norm,
           CAST(length(t) AS BIGINT) AS n_raw,
           CAST(length(tn) AS BIGINT) AS n_norm
         FROM n""",

    // snapshot B rebuilt with the same salted hash; the p11 rolling-
    // hash replay fingerprints both sides
    "p59_snapshot_diff" -> {
      def fp(rel: String) =
        s"""SELECT doc_id, list_reduce(
              list_prepend(0::BIGINT,
                list_transform(regexp_extract_all(
                  array_to_string($TOKS, ' '), '.'), c -> ord(c)::BIGINT)),
              (a, b) -> (a * 31 + b) % 1000000007) AS fp
            FROM $rel"""
      s"""WITH a AS (SELECT doc_id, text FROM documents),
             h AS (SELECT doc_id, text,
                     ('0x' || substr(md5('snap:' || doc_id::VARCHAR), 1,
                       15))::BIGINT % 7 AS hh
                   FROM a),
             b AS (SELECT doc_id, text FROM h WHERE hh NOT IN (0, 1)
                   UNION ALL
                   SELECT doc_id, text || ' v2' AS text FROM h WHERE hh = 1
                   UNION ALL
                   SELECT doc_id + 100000000 AS doc_id, text || ' new' AS text
                   FROM h WHERE hh = 2),
             fa AS (${fp("a")}),
             fb AS (${fp("b")})
         SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id,
           CASE WHEN fb.doc_id IS NULL THEN 'removed'
                WHEN fa.doc_id IS NULL THEN 'added'
                WHEN fa.fp != fb.fp THEN 'changed'
                ELSE 'unchanged' END AS status
         FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id"""
    },

    // integer-quantized centroid sums (order-free), sequential
    // list_dot_product distances, exact per-label p95 cutoff — the
    // q15/quantile and p6/dot-product parity precedents combined
    "p60_source_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
             comp AS (SELECT label, u.i AS pos,
                        CAST(round(v[u.i] * 1000000) AS BIGINT) AS qx
                      FROM e, (SELECT unnest(generate_series(1, 64)) AS i) u),
             cent AS (SELECT label, pos,
                        round(sum(qx) / (count(*) * 1000000.0), 6) AS c
                      FROM comp GROUP BY 1, 2),
             ca AS (SELECT label, list(c ORDER BY pos) AS centroid
                    FROM cent GROUP BY 1),
             d AS (SELECT vec_id, e.label, round(sqrt(list_dot_product(
                     list_transform(generate_series(1, 64),
                       i -> v[i] - centroid[i]),
                     list_transform(generate_series(1, 64),
                       i -> v[i] - centroid[i]))), 6) AS dist
                   FROM e JOIN ca ON e.label = ca.label),
             cut AS (SELECT label, round(quantile_cont(dist, 0.95), 6) AS cut
                     FROM d GROUP BY 1)
         SELECT vec_id, CAST(d.label AS BIGINT) AS label, dist,
           dist > cut.cut AS is_outlier
         FROM d JOIN cut ON d.label = cut.label""",

    // p3's pair CTE joined to p24's split labels
    "p68_split_leakage" ->
      s"""WITH ${minhashPairsCtes("documents")},
             pairs AS (SELECT doc_a, doc_b, jaccard FROM j
                       WHERE jaccard >= 0.4),
             sp AS (SELECT doc_id,
                      CASE WHEN ('0x' || substr(md5('split:' ||
                               doc_id::VARCHAR), 1, 15))::BIGINT
                             % 10000 < 8000 THEN 'train'
                           WHEN ('0x' || substr(md5('split:' ||
                               doc_id::VARCHAR), 1, 15))::BIGINT
                             % 10000 < 9000 THEN 'val'
                           ELSE 'test' END AS split
                    FROM documents)
         SELECT doc_a, doc_b, sa.split AS split_a, sb.split AS split_b,
           jaccard
         FROM pairs JOIN sp sa ON doc_a = sa.doc_id
              JOIN sp sb ON doc_b = sb.doc_id
         WHERE sa.split != sb.split""",

    // p14's recursive component walk folded to the size histogram
    "p67_dedup_report" ->
      s"""WITH RECURSIVE ${minhashPairsCtes("documents")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src AS doc, w.label
                      FROM edges e JOIN walk w ON e.dst = w.doc),
             comp AS (SELECT doc, min(label) AS cluster_id
                      FROM walk GROUP BY doc),
             sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT)
                         AS cluster_size
                       FROM comp GROUP BY 1),
             hist AS (SELECT cluster_size,
                        CAST(count(*) AS BIGINT) AS n_clusters
                      FROM sizes GROUP BY 1),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         SELECT cluster_size, n_clusters,
           cluster_size * n_clusters AS n_docs,
           (cluster_size - 1) * n_clusters AS n_removable,
           round(cluster_size * n_clusters / (tot.n * 1.0), 6) AS frac_docs,
           round((cluster_size - 1) * n_clusters / (tot.n * 1.0), 6)
             AS frac_removable
         FROM hist, tot""",

    // the generated two-class scoring over the same planted headers
    "p66_quality_classifier" -> {
      graft.pipeline.QualityClassifier.scoreSqlFrom(
        """SELECT doc_id, lower(
             CASE WHEN doc_id % 2 = 0
               THEN 'the report explains the method and the evidence in detail. '
               ELSE 'click here buy now free offer best price casino bonus. '
             END || substr(text, 1, 80)) AS __t
           FROM documents""")
    },

    // p46's count CTEs plus the KN statistics, all from the one
    // bigram-TYPE relation: c(v), N1+(v·) by prev, N1+(·w) by word,
    // N1+(··) broadcast; formula operand order mirrors the engine so
    // IEEE products land the same bits before the micro-nat round
    "p65_kn_bigram" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             pr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1])
                      ELSE [] END) AS pair FROM d),
             sp AS (SELECT doc_id, pair,
                      string_split(pair, ' ')[1] AS prev,
                      string_split(pair, ' ')[2] AS w
                    FROM pr),
             cb AS (SELECT pair, count(*) AS cb FROM pr GROUP BY 1),
             ctx AS (SELECT string_split(pair, ' ')[1] AS p,
                       CAST(sum(cb) AS BIGINT) AS cv, count(*) AS n1f
                     FROM cb GROUP BY 1),
             cont AS (SELECT string_split(pair, ' ')[2] AS ww,
                        count(*) AS n1b
                      FROM cb GROUP BY 1),
             nt AS (SELECT count(*) AS nt FROM cb),
             sc AS (SELECT doc_id,
                      CAST(round(-ln(
                        greatest(cb.cb - 0.75, 0.0) / ctx.cv +
                          0.75 * ctx.n1f / ctx.cv * (cont.n1b / nt.nt))
                        * 1000000.0) AS BIGINT) AS nllu
                    FROM sp JOIN cb USING (pair)
                    JOIN ctx ON sp.prev = ctx.p
                    JOIN cont ON sp.w = cont.ww
                    CROSS JOIN nt),
             agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       CAST(sum(nllu) AS BIGINT) AS ssum
                     FROM sc GROUP BY 1)
         SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
           round(agg.ssum / (agg.n_bigrams * 1000000.0), 6) AS kn_nll
         FROM d LEFT JOIN agg USING (doc_id)""",

    // the order-3 KN recursion replayed: trigram types feed the (u,v)
    // history rollup AND the continuation middle level ((v,w) types,
    // v-rollup); the bottom level is p65's bigram-type Pcont; the
    // probability nesting mirrors the engine token for token so the
    // micro-nat rounding is identical
    "p79_kn_trigram" ->
      s"""WITH d AS MATERIALIZED (SELECT doc_id, $TOKS AS toks FROM documents),
             tr AS MATERIALIZED (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
                      THEN list_transform(generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                      ELSE [] END) AS tri FROM d),
             sp AS MATERIALIZED (SELECT doc_id, tri,
                      string_split(tri, ' ')[1] AS u,
                      string_split(tri, ' ')[2] AS v,
                      string_split(tri, ' ')[3] AS w
                    FROM tr),
             ct AS MATERIALIZED (SELECT tri, count(*) AS ct FROM tr GROUP BY 1),
             typed AS MATERIALIZED (SELECT tri,
                         string_split(tri, ' ')[1] AS tu,
                         string_split(tri, ' ')[2] AS tv,
                         string_split(tri, ' ')[3] AS tw,
                         ct FROM ct),
             hist AS MATERIALIZED (SELECT tu, tv, CAST(sum(ct) AS BIGINT) AS cuv,
                        count(*) AS n3f
                      FROM typed GROUP BY 1, 2),
             mid AS MATERIALIZED (SELECT tv AS mv, tw AS mw, count(*) AS n1vw
                     FROM typed GROUP BY 1, 2),
             midv AS MATERIALIZED (SELECT mv AS vv, CAST(sum(n1vw) AS BIGINT) AS n1mid,
                        count(*) AS nfv
                      FROM mid GROUP BY 1),
             pr AS MATERIALIZED (SELECT unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1])
                      ELSE [] END) AS pair FROM d),
             cb AS MATERIALIZED (SELECT pair, count(*) AS cb FROM pr GROUP BY 1),
             cont AS MATERIALIZED (SELECT string_split(pair, ' ')[2] AS bw,
                        count(*) AS n1b
                      FROM cb GROUP BY 1),
             nt AS MATERIALIZED (SELECT count(*) AS nt FROM cb),
             sc AS (SELECT doc_id,
                      CAST(round(-ln(
                        greatest(ct.ct - 0.75, 0.0) / hist.cuv +
                          0.75 * hist.n3f / hist.cuv *
                          (greatest(mid.n1vw - 0.75, 0.0) / midv.n1mid +
                            0.75 * midv.nfv / midv.n1mid * (cont.n1b / nt.nt)))
                        * 1000000.0) AS BIGINT) AS nllu
                    FROM sp JOIN ct USING (tri)
                    JOIN hist ON sp.u = hist.tu AND sp.v = hist.tv
                    JOIN mid ON sp.v = mid.mv AND sp.w = mid.mw
                    JOIN midv ON sp.v = midv.vv
                    JOIN cont ON sp.w = cont.bw
                    CROSS JOIN nt),
             agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                       CAST(sum(nllu) AS BIGINT) AS ssum
                     FROM sc GROUP BY 1)
         SELECT d.doc_id, coalesce(agg.n_trigrams, 0) AS n_trigrams,
           round(agg.ssum / (agg.n_trigrams * 1000000.0), 6) AS kn3_nll
         FROM d LEFT JOIN agg USING (doc_id)""",

    // the full SemDeDup chain replayed relationally: seed assignment
    // (cosines via the sequential list_dot_product that mirrors the
    // engine's dot bit-for-bit, 6-dp rounded before every compare),
    // tau-pairs, recursive-CTE connected components (the p14 walk),
    // least-centroid-similar representative per group
    "p64_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
             seeds AS (SELECT vec_id AS cid, v AS cv FROM e
                       ORDER BY vec_id LIMIT 16),
             asg0 AS (SELECT e.vec_id, e.v, s.cid,
                        round(list_dot_product(e.v, s.cv) /
                          (sqrt(list_dot_product(e.v, e.v)) *
                           sqrt(list_dot_product(s.cv, s.cv))), 6) AS cosc
                      FROM e CROSS JOIN seeds s),
             asg AS (SELECT vec_id, v, cid, cosc FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cosc DESC, cid) AS rn FROM asg0) t
                     WHERE rn = 1),
             pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
                       FROM asg a JOIN asg b
                         ON a.cid = b.cid AND a.vec_id < b.vec_id
                       WHERE round(list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) *
                            sqrt(list_dot_product(b.v, b.v))), 6) >= 0.98),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e2.src AS doc, w.label
                      FROM edges e2 JOIN walk w ON e2.dst = w.doc),
             comp AS (SELECT doc AS vec_id, min(label) AS grp
                      FROM walk GROUP BY doc),
             reps AS (SELECT grp, vec_id AS rep FROM (
                       SELECT c.grp, a.vec_id, row_number() OVER (
                         PARTITION BY c.grp ORDER BY a.cosc, a.vec_id) AS rn
                       FROM comp c JOIN asg a USING (vec_id)) t WHERE rn = 1)
         SELECT a.vec_id, a.cid AS cluster_id, a.cosc AS cos_centroid,
           (c.grp IS NULL OR a.vec_id = r.rep) AS kept
         FROM asg a LEFT JOIN comp c USING (vec_id)
              LEFT JOIN reps r ON c.grp = r.grp""",

    // p64's seed-assignment + walk + representative CTEs, with the
    // pair source swapped to p5's md5-mirrored banded LSH plus the
    // star cap: cells over 24 members contribute star edges to their
    // minimum id instead of all pairs — replayed with the same window
    // count/min, so the scale form is hash-exact end to end
    "p69_semantic_dedup_lsh" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
             seeds AS (SELECT vec_id AS cid, v AS cv FROM e
                       ORDER BY vec_id LIMIT 16),
             asg0 AS (SELECT e.vec_id, e.v, s.cid,
                        round(list_dot_product(e.v, s.cv) /
                          (sqrt(list_dot_product(e.v, e.v)) *
                           sqrt(list_dot_product(s.cv, s.cv))), 6) AS cosc
                      FROM e CROSS JOIN seeds s),
             asg AS (SELECT vec_id, v, cid, cosc FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cosc DESC, cid) AS rn FROM asg0) t
                     WHERE rn = 1),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cells AS (SELECT vec_id, band, bucket,
                         count(*) OVER (PARTITION BY band, bucket) AS bsz,
                         min(vec_id) OVER (PARTITION BY band, bucket) AS bmin
                       FROM bk),
             cand AS (SELECT DISTINCT vec_a, vec_b FROM (
                        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
                        FROM cells a JOIN cells b ON a.band = b.band
                          AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                        WHERE a.bsz <= 24 AND b.bsz <= 24
                        UNION ALL
                        SELECT bmin, vec_id FROM cells
                        WHERE bsz > 24 AND vec_id > bmin) u),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id),
             pairs AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM pr
                       WHERE sim >= 0.35),
             edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e2.src AS doc, w.label
                      FROM edges e2 JOIN walk w ON e2.dst = w.doc),
             comp AS (SELECT doc AS vec_id, min(label) AS grp
                      FROM walk GROUP BY doc),
             reps AS (SELECT grp, vec_id AS rep FROM (
                       SELECT c.grp, a.vec_id, row_number() OVER (
                         PARTITION BY c.grp ORDER BY a.cosc, a.vec_id) AS rn
                       FROM comp c JOIN asg a USING (vec_id)) t WHERE rn = 1)
         SELECT a.vec_id, a.cid AS cluster_id, a.cosc AS cos_centroid,
           (c.grp IS NULL OR a.vec_id = r.rep) AS kept
         FROM asg a LEFT JOIN comp c USING (vec_id)
              LEFT JOIN reps r ON c.grp = r.grp""",

    // p5's plane/band/verify CTEs with the >= 1-new-side restriction —
    // the p71 equivalence argument over embeddings
    "p73_incremental_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id)
         SELECT vec_a, vec_b, sim FROM pr
         WHERE sim >= 0.35 AND (vec_a % 2 = 1 OR vec_b % 2 = 1)""",

    // the md5-fallback dHash + group plant + bit flips replayed; the
    // pair stage is the exact O(n²) restatement (the banding is
    // LOSSLESS, so the engine's equality-join form must agree row-exact
    // — the p4 oracle precedent)
    "p74_image_dhash_neardup" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS dh0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(dh0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS dh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dh, b.dh)) <= 4""",

    // p74's oracle restricted to pairs with >= 1 odd (batch) side —
    // the incremental screen is relationally exactly that
    "p82_incremental_hamming" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS dh0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(dh0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS dh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dh, b.dh)) <= 4
           AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)""",

    // the p2/p3 pair CTEs restricted to EXACTLY-ONE-side-benchmark and
    // re-oriented (train_id, bench_id) — relationally identical to the
    // engine's strictly-cross-set join
    "p108_neardup_decontaminate" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT CASE WHEN doc_a % 25 = 0 THEN doc_b ELSE doc_a END AS train_id,
           CASE WHEN doc_a % 25 = 0 THEN doc_a ELSE doc_b END AS bench_id,
           jaccard
         FROM j WHERE jaccard >= 0.4
           AND ((doc_a % 25 = 0) <> (doc_b % 25 = 0))""",

    // p1's keep rule over corpus ∪ batch, restricted to batch (odd)
    // rows — the stored-index screen must return the identical
    // relation without ever re-aggregating the corpus
    "p109_exact_screen" ->
      """WITH d AS (SELECT doc_id,
               CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                    ELSE text END AS text
             FROM documents),
           h AS (SELECT doc_id, md5(text) AS content_hash FROM d),
           k AS (SELECT content_hash, min(doc_id) AS keep_id
                 FROM h GROUP BY 1),
           c AS (SELECT content_hash, count(*) AS n_corpus
                 FROM h WHERE doc_id % 2 = 0 GROUP BY 1)
         SELECT h.doc_id, h.content_hash, k.keep_id,
           CAST(coalesce(c.n_corpus, 0) AS BIGINT) AS n_corpus,
           h.doc_id = k.keep_id AS keep
         FROM h JOIN k USING (content_hash) LEFT JOIN c USING (content_hash)
         WHERE h.doc_id % 2 = 1""",

    // p36's scoring CTEs + one quantile_cont over the same fraction
    // list (both engines interpolate lower + d·(higher−lower), the p38
    // precedent); epoch 0 admits everything incl. NULL-score docs
    "p116_anneal_schedule" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
             c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
             t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
                          CAST(count(*) AS BIGINT) AS v FROM c),
             s AS (SELECT doc_id,
                     CAST(round(-ln((cnt + 1.0) / (n + v)) * 1000000)
                          AS BIGINT) AS nllu
                   FROM tok JOIN c USING (term), t),
             g AS (SELECT doc_id,
                     round(CAST(sum(nllu) AS BIGINT)
                           / (count(*) * 1000000.0), 6) AS lm_nll
                   FROM s GROUP BY 1),
             sc AS (SELECT doc_id, lm_nll
                    FROM documents LEFT JOIN g USING (doc_id)),
             cut AS (SELECT quantile_cont(lm_nll,
                       [CAST(10000 AS DOUBLE)/10000.0,
                        CAST(7500 AS DOUBLE)/10000.0,
                        CAST(5000 AS DOUBLE)/10000.0,
                        CAST(2500 AS DOUBLE)/10000.0]) AS cuts FROM sc),
             e AS (SELECT doc_id, lm_nll, unnest([0, 1, 2, 3]) AS epoch
                   FROM sc)
         SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, lm_nll
         FROM e, cut
         WHERE epoch = 0 OR lm_nll <= cuts[epoch + 1]""",

    // p109's oracle VERBATIM: the bloom fast path must return the
    // identical relation (no false negatives, by construction)
    "p115_bloom_screen" ->
      """WITH d AS (SELECT doc_id,
               CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                    ELSE text END AS text
             FROM documents),
           h AS (SELECT doc_id, md5(text) AS content_hash FROM d),
           k AS (SELECT content_hash, min(doc_id) AS keep_id
                 FROM h GROUP BY 1),
           c AS (SELECT content_hash, count(*) AS n_corpus
                 FROM h WHERE doc_id % 2 = 0 GROUP BY 1)
         SELECT h.doc_id, h.content_hash, k.keep_id,
           CAST(coalesce(c.n_corpus, 0) AS BIGINT) AS n_corpus,
           h.doc_id = k.keep_id AS keep
         FROM h JOIN k USING (content_hash) LEFT JOIN c USING (content_hash)
         WHERE h.doc_id % 2 = 1""",

    // p71's oracle VERBATIM: the band-cell sketch has no false
    // negatives, so the bloom-gated stored-index screen returns the
    // identical >=1-odd-side pair relation
    "p120_minhash_bloom_screen" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT doc_a, doc_b, jaccard FROM j
         WHERE jaccard >= 0.4 AND (doc_a % 2 = 1 OR doc_b % 2 = 1)""",

    // p73's oracle VERBATIM (the cosine band cells' sketch — same
    // no-false-negative identity)
    "p121_cosine_bloom_screen" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                      FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.vec_id < b.vec_id),
             pr AS (SELECT vec_a, vec_b,
                      round(list_dot_product(ea.v, eb.v) /
                        (sqrt(list_dot_product(ea.v, ea.v)) *
                         sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                    FROM cand JOIN e ea ON vec_a = ea.vec_id
                              JOIN e eb ON vec_b = eb.vec_id)
         SELECT vec_a, vec_b, sim FROM pr
         WHERE sim >= 0.35 AND (vec_a % 2 = 1 OR vec_b % 2 = 1)""",

    // p82's oracle VERBATIM (the signature band cells' sketch)
    "p122_hamming_bloom_screen" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS dh0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(dh0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS dh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dh, b.dh)) <= 4
           AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)""",

    // the exact full-shuffle relation p123's sketch-pruned plan must
    // equal byte-for-byte (DuckDB 1-based INCLUSIVE list slice:
    // toks[i:i+2] = tokens i, i+1, i+2 — Spark's element_at(i..i+2))
    "p123_heavy_ngrams" ->
      s"""WITH d AS (SELECT $TOKS AS toks FROM documents),
             g AS (SELECT array_to_string(toks[i:i+2], ' ') AS gram
                   FROM d, unnest(generate_series(1, len(toks) - 2)) t(i)),
             tot AS (SELECT count(*)::BIGINT AS n FROM g),
             mc AS (SELECT greatest(6, CAST(ceil(n / 16384.0) AS BIGINT)) AS m
                    FROM tot),
             c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1)
         SELECT gram, cnt FROM c, mc WHERE cnt >= m
         ORDER BY cnt DESC, gram""",

    // chunk arithmetic mirrored exactly: stride 24 = size 32 - overlap
    // 8; last chunk start clamps to n-32 (right-aligned); inclusive
    // DuckDB slice toks[s+1 : s+32] = Spark slice(toks, s+1, 32)
    "p124_chunk_overlap" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             p AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
                     CASE WHEN len(toks) <= 32 THEN 1::BIGINT
                          ELSE CAST(ceil((len(toks) - 32) / 24.0) AS BIGINT) + 1
                     END AS nc
                   FROM d),
             c AS (SELECT doc_id, i AS chunk_idx,
                     least(i * 24, greatest(n - 32, 0)) AS s, toks
                   FROM p, unnest(generate_series(0, nc - 1)) t(i))
         SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
           len(toks[s + 1 : s + 32])::BIGINT AS n_tokens,
           array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text
         FROM c""",

    // E-S reservoir keys replayed exactly: u = (hash60+1)/2^60,
    // key_micro = floor(ln(u)/n_chars * 1e6) — the engine's packed-
    // BIGINT quantization (TopKLongs, no window) — top-20 per source
    // by key_micro desc (id tiebreak, the packed order)
    "p125_weighted_sample" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
                 CAST(floor(
                   ln((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 15))::BIGINT
                       + 1) / 1152921504606846976.0) / n_chars * 1e6)
                   AS BIGINT) AS kq
               FROM documents
               WHERE n_chars IS NOT NULL AND n_chars > 0)
         SELECT doc_id, source, n_chars,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY kq DESC, doc_id) AS BIGINT)
             AS rank
         FROM d
         QUALIFY rank <= 20""",

    // the p37 line rule under the cross-snapshot temporal contract,
    // restricted to the odd (batch) docs: a batch line dies when its
    // key appears in ANY even (corpus) doc, or when an earlier batch
    // (doc, pos) carries it; whitespace lines pass, untouched docs
    // verbatim, touched docs reassemble in position order
    "p113_line_screen" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'shared footer please subscribe' ||
                chr(10) || 'uniq-' || doc_id::VARCHAR AS text
              FROM documents),
             b AS (SELECT * FROM d0 WHERE doc_id % 2 = 1),
             bl0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM b),
             bl AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
                    FROM bl0, unnest(generate_series(1, len(ls))) t(i)),
             bc AS (SELECT doc_id, pos,
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM bl WHERE regexp_matches(line, '\S')),
             e AS (SELECT * FROM d0 WHERE doc_id % 2 = 0),
             el0 AS (SELECT string_split(text, chr(10)) AS ls FROM e),
             el AS (SELECT ls[i] AS line
                    FROM el0, unnest(generate_series(1, len(ls))) t(i)),
             ck AS (SELECT DISTINCT
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM el WHERE regexp_matches(line, '\S')),
             fresh AS (SELECT bc.* FROM bc ANTI JOIN ck USING (k)),
             rm AS (SELECT doc_id, pos FROM bc SEMI JOIN ck USING (k)
                    UNION ALL
                    SELECT doc_id, pos FROM (
                      SELECT doc_id, pos, row_number() OVER (PARTITION BY k
                        ORDER BY doc_id, pos) AS rn FROM fresh)
                    WHERE rn > 1),
             touched AS (SELECT DISTINCT doc_id FROM rm),
             wp AS (SELECT doc_id, pos, line FROM bl
                    WHERE doc_id IN (SELECT doc_id FROM touched)),
             kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2
                      FROM wp ANTI JOIN rm USING (doc_id, pos)
                      GROUP BY doc_id)
         SELECT b.doc_id,
           CASE WHEN t.doc_id IS NULL THEN b.text
                ELSE coalesce(kept.t2, '') END AS text
         FROM b LEFT JOIN touched t USING (doc_id)
                LEFT JOIN kept USING (doc_id)""",

    // p113's oracle VERBATIM: the line-key sketch has no false
    // negatives, so the bloom-gated line screen rewrites the batch
    // identically
    "p119_line_bloom_screen" ->
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || 'shared footer please subscribe' ||
                chr(10) || 'uniq-' || doc_id::VARCHAR AS text
              FROM documents),
             b AS (SELECT * FROM d0 WHERE doc_id % 2 = 1),
             bl0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM b),
             bl AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
                    FROM bl0, unnest(generate_series(1, len(ls))) t(i)),
             bc AS (SELECT doc_id, pos,
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM bl WHERE regexp_matches(line, '\S')),
             e AS (SELECT * FROM d0 WHERE doc_id % 2 = 0),
             el0 AS (SELECT string_split(text, chr(10)) AS ls FROM e),
             el AS (SELECT ls[i] AS line
                    FROM el0, unnest(generate_series(1, len(ls))) t(i)),
             ck AS (SELECT DISTINCT
                      ('0x' || substr(md5(array_to_string(list_filter(
                        string_split_regex(lower(trim(line)), '\s+'),
                        x -> x != ''), ' ')), 1, 15))::BIGINT AS k
                    FROM el WHERE regexp_matches(line, '\S')),
             fresh AS (SELECT bc.* FROM bc ANTI JOIN ck USING (k)),
             rm AS (SELECT doc_id, pos FROM bc SEMI JOIN ck USING (k)
                    UNION ALL
                    SELECT doc_id, pos FROM (
                      SELECT doc_id, pos, row_number() OVER (PARTITION BY k
                        ORDER BY doc_id, pos) AS rn FROM fresh)
                    WHERE rn > 1),
             touched AS (SELECT DISTINCT doc_id FROM rm),
             wp AS (SELECT doc_id, pos, line FROM bl
                    WHERE doc_id IN (SELECT doc_id FROM touched)),
             kept AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2
                      FROM wp ANTI JOIN rm USING (doc_id, pos)
                      GROUP BY doc_id)
         SELECT b.doc_id,
           CASE WHEN t.doc_id IS NULL THEN b.text
                ELSE coalesce(kept.t2, '') END AS text
         FROM b LEFT JOIN touched t USING (doc_id)
                LEFT JOIN kept USING (doc_id)""",

    // p77's canonicalization CTEs + p109's keep rule over the canonical
    // keys, restricted to the odd (batch) side
    "p114_url_frontier" ->
      raw"""WITH d AS (
             SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) ||
               '://Site' || (doc_id % 10)::VARCHAR || '.Example.COM' ||
               (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END) ||
               '/Page/' || (doc_id % 7)::VARCHAR ||
               (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
               (CASE WHEN doc_id % 2 = 0
                     THEN '?id=' || (doc_id % 5)::VARCHAR || '&utm_source=feed'
                     ELSE '?utm_source=feed&utm_campaign=x&id=' ||
                          (doc_id % 5)::VARCHAR END) ||
               '#s' || (doc_id % 2)::VARCHAR AS raw_url
             FROM documents),
           c0 AS (SELECT doc_id, raw_url,
                    regexp_replace(raw_url, '#.*$$', '') AS u FROM d),
           c1 AS (SELECT doc_id,
                    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
                    regexp_replace(regexp_extract(u,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1), '/+$$', '') AS path,
                    regexp_extract(u, '\?(.*)$$', 1) AS query
                  FROM c0),
           c2 AS (SELECT doc_id,
                    scheme || '://' ||
                    (CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                          THEN regexp_replace(hostport, ':80$$', '')
                          WHEN scheme = 'https' AND hostport LIKE '%:443'
                          THEN regexp_replace(hostport, ':443$$', '')
                          ELSE hostport END) || path ||
                    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canonical_url
                  FROM (SELECT *, array_to_string(list_sort(list_filter(
                          string_split(query, '&'),
                          p -> len(p) > 0 AND NOT regexp_matches(
                            lower(regexp_extract(p, '^([^=]*)', 1)),
                            '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)$$'))), '&') AS cq
                        FROM c1)),
           h AS (SELECT doc_id, md5(canonical_url) AS content_hash FROM c2),
           k AS (SELECT content_hash, min(doc_id) AS keep_id
                 FROM h GROUP BY 1),
           c AS (SELECT content_hash, count(*) AS n_corpus
                 FROM h WHERE doc_id % 2 = 0 GROUP BY 1)
         SELECT h.doc_id, h.content_hash, k.keep_id,
           CAST(coalesce(c.n_corpus, 0) AS BIGINT) AS n_corpus,
           h.doc_id = k.keep_id AS keep
         FROM h JOIN k USING (content_hash) LEFT JOIN c USING (content_hash)
         WHERE h.doc_id % 2 = 1""",

    // p109's oracle VERBATIM: the bucketed catalog path must return
    // the identical relation
    "p110_exact_backfill" ->
      """WITH d AS (SELECT doc_id,
               CASE WHEN doc_id % 5 < 2 THEN 'grp:' || (doc_id // 4)::VARCHAR
                    ELSE text END AS text
             FROM documents),
           h AS (SELECT doc_id, md5(text) AS content_hash FROM d),
           k AS (SELECT content_hash, min(doc_id) AS keep_id
                 FROM h GROUP BY 1),
           c AS (SELECT content_hash, count(*) AS n_corpus
                 FROM h WHERE doc_id % 2 = 0 GROUP BY 1)
         SELECT h.doc_id, h.content_hash, k.keep_id,
           CAST(coalesce(c.n_corpus, 0) AS BIGINT) AS n_corpus,
           h.doc_id = k.keep_id AS keep
         FROM h JOIN k USING (content_hash) LEFT JOIN c USING (content_hash)
         WHERE h.doc_id % 2 = 1""",

    // same per-epoch salted keys, same rank
    "p106_epoch_shuffle" ->
      """WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
             k AS (SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
                     ('0x' || substr(md5('ep:' || epoch::VARCHAR || ':' ||
                       doc_id::VARCHAR), 1, 15))::BIGINT AS k
                   FROM e)
         SELECT doc_id, epoch,
           CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
             AS BIGINT) AS position
         FROM k""",

    // same integer epoch/basis-point arithmetic, same salted draw
    "p107_repeat_upsample" ->
      s"""WITH n AS (SELECT doc_id, CAST(len($TOKS) AS BIGINT) AS n_tokens
               FROM documents),
             t AS (SELECT sum(n_tokens) AS ct FROM n),
             j AS (SELECT doc_id, n_tokens, ct,
                     least(4, 100000 // ct) AS fe FROM n CROSS JOIN t),
             f AS (SELECT *, CASE WHEN fe >= 4 THEN 0
                     ELSE ((100000 - fe * ct) * 10000) // ct END AS bp
                   FROM j)
         SELECT doc_id, n_tokens,
           CAST(fe + CASE WHEN ('0x' || substr(md5('rep:' ||
               doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < bp
             THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
         FROM f""",

    // the p6 pair loop with the label-inequality predicate in the join
    "p104_hard_negatives" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
                   FROM e WHERE vec_id < 20),
             s AS (SELECT query_id, CAST(qlabel AS BIGINT) AS query_label,
                     c.vec_id AS neighbor_id,
                     CAST(c.label AS BIGINT) AS neighbor_label,
                     list_dot_product(qv, c.v) /
                       (sqrt(list_dot_product(qv, qv)) *
                        sqrt(list_dot_product(c.v, c.v))) AS sim
                   FROM q JOIN e c
                     ON c.vec_id <> query_id AND c.label <> qlabel),
             r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
                   FROM s)
         SELECT query_id, query_label, neighbor_id, neighbor_label,
           round(sim, 6) AS sim, rnk
         FROM r WHERE rnk <= 5""",

    // the same vocab recipe (top-12 whole words by (count desc, word),
    // ##-prefixed mid-word n-grams <= 3 chars, word-initial chars) and
    // the same greedy longest-match loop, replayed as a recursive CTE
    // over a PRECOMPUTED best-match-per-(word, pos) relation — greedy
    // matching has no ties (at one position and length only the
    // substring itself can match), so the replay is bit-exact.
    // DuckDB-1.0 note: a LATERAL argmax inside the recursive term
    // silently matches nothing, hence the non-recursive `best` table.
    "p112_wordpiece" -> (WpSegCtes + raw""",
           agg AS (SELECT doc_id, count(*) AS n_words,
               sum(len(pieces)) AS n_pieces,
               sum(CASE WHEN pieces = ['[UNK]'] THEN 1 ELSE 0 END) AS n_unk,
               string_agg(array_to_string(pieces, ' '), ' ' ORDER BY i) AS wp_text
             FROM j GROUP BY 1)
         SELECT t.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
           CAST(coalesce(a.n_unk, 0) AS BIGINT) AS n_unk,
           coalesce(a.wp_text, '') AS wp_text
         FROM toks t LEFT JOIN agg a USING (doc_id)"""),

    // the p112 rollup under the FIXED external vocab (fixture unk
    // '<unk>', max_input_chars 64) — the externally-loaded tokenizer
    // serves hash-exact
    "p141_hf_wordpiece_external" -> (WpExternalSegCtes + {
      val unk = graft.pipeline.TokenizerFixtures.HfWpUnk
      raw""",
           agg AS (SELECT doc_id, count(*) AS n_words,
               sum(len(pieces)) AS n_pieces,
               sum(CASE WHEN pieces = ['$unk'] THEN 1 ELSE 0 END) AS n_unk,
               string_agg(array_to_string(pieces, ' '), ' ' ORDER BY i) AS wp_text
             FROM j GROUP BY 1)
         SELECT t.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
           CAST(coalesce(a.n_unk, 0) AS BIGINT) AS n_unk,
           coalesce(a.wp_text, '') AS wp_text
         FROM toks t LEFT JOIN agg a USING (doc_id)"""
    }),

    // per-source token totals under the same external segmentation +
    // the p32-style hash-derived targets, integer milli arithmetic
    "p152_token_mix" -> (WpExternalSegCtes + raw""",
           pn AS (SELECT doc_id, sum(len(pieces)) AS n FROM j GROUP BY 1),
           per AS (SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(pn.n, 0)) AS BIGINT) AS n_tokens,
               CAST(('0x' || substr(md5('mix:' || d.source), 1, 15))::BIGINT
                 % 5 + 1 AS BIGINT) AS target_w
             FROM documents d LEFT JOIN pn USING (doc_id)
             GROUP BY d.source),
           tot AS (SELECT sum(n_tokens) AS tt, sum(target_w) AS tw FROM per)
         SELECT source, n_docs, n_tokens,
           CAST((n_tokens * 1000) // tt AS BIGINT) AS share_milli,
           CAST((target_w * 1000) // tw AS BIGINT) AS target_milli,
           CAST((target_w * 1000 * tt) // (tw * n_tokens) AS BIGINT)
             AS sample_factor_milli
         FROM per CROSS JOIN tot"""),

    // p98's truncation arithmetic over the external artifact's REAL
    // per-doc piece counts — same greedy CTE chain as p141
    "p146_external_context_fit" -> (WpExternalSegCtes + raw""",
           pn AS (SELECT doc_id, sum(len(pieces)) AS n FROM j GROUP BY 1),
           alln AS (SELECT t.doc_id, coalesce(pn.n, 0) AS n
             FROM toks t LEFT JOIN pn USING (doc_id)),
           x AS (SELECT n, unnest([64, 128, 256]) AS ctx_len FROM alln)
         SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(greatest(n - ctx_len, 0)) AS BIGINT) AS tokens_lost,
           round(sum(greatest(n - ctx_len, 0)) * 1.0 / sum(n), 6)
             AS lost_frac
         FROM x GROUP BY ctx_len"""),

    // the p112 segmentation rolled up by language: the tokenizer-QA
    // table every vocab bump ships with — same CTE chain, per-lang sums
    "p134_oov_report" -> (WpSegCtes + raw""",
           agg AS (SELECT doc_id, count(*) AS n_words,
               sum(len(pieces)) AS n_pieces,
               sum(CASE WHEN pieces = ['[UNK]'] THEN 1 ELSE 0 END) AS n_unk
             FROM j GROUP BY 1),
           per AS (SELECT d.lang, count(*) AS n_docs,
               sum(coalesce(a.n_words, 0)) AS n_words,
               sum(coalesce(a.n_pieces, 0)) AS n_pieces,
               sum(coalesce(a.n_unk, 0)) AS n_unk
             FROM documents d LEFT JOIN agg a USING (doc_id) GROUP BY 1)
         SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(n_unk AS BIGINT) AS n_unk,
           (CAST(n_unk AS BIGINT) * 1000)
             // greatest(CAST(n_words AS BIGINT), 1) AS unk_permille,
           (CAST(n_pieces AS BIGINT) * 1000)
             // greatest(CAST(n_words AS BIGINT), 1) AS fertility_milli
         FROM per"""),

    // the p104 relation restricted to the LSH candidate set: the
    // md5-derived plane family (p69's CTEs) is replayed bit-for-bit,
    // so candidates — and therefore the banded top-k — are hash-exact
    "p111_hard_negatives_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
                    FROM embeddings),
             pl AS (SELECT p, list_transform(generate_series(0, 63), d ->
                      ((('0x' || substr(md5('plane:' || p || ':' || d), 1, 12))::BIGINT
                        % 2001) - 1000) / 1000.0) AS pv
                    FROM unnest(generate_series(0, 127)) t(p)),
             bits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS w,
                        CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                      FROM e, pl),
             bk AS (SELECT vec_id, band, sum(bit * w) AS bucket
                    FROM bits GROUP BY 1, 2),
             cand AS (SELECT DISTINCT a.vec_id AS query_id,
                        b.vec_id AS neighbor_id
                      FROM bk a JOIN bk b ON a.band = b.band
                        AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
                      WHERE a.vec_id < 20),
             s AS (SELECT c.query_id, CAST(eq.label AS BIGINT) AS query_label,
                     c.neighbor_id, CAST(en.label AS BIGINT) AS neighbor_label,
                     list_dot_product(eq.v, en.v) /
                       (sqrt(list_dot_product(eq.v, eq.v)) *
                        sqrt(list_dot_product(en.v, en.v))) AS sim
                   FROM cand c JOIN e eq ON c.query_id = eq.vec_id
                               JOIN e en ON c.neighbor_id = en.vec_id
                   WHERE eq.label <> en.label),
             r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
                   FROM s)
         SELECT query_id, query_label, neighbor_id, neighbor_label,
           round(sim, 6) AS sim, rnk
         FROM r WHERE rnk <= 5""",

    // the same salted-md5 draws, the same PSM concatenation — substr
    // arithmetic is position-identical on both engines
    "p105_fim_transform" ->
      """WITH h AS (SELECT doc_id, text, length(text) AS n,
               ('0x' || substr(md5('fima:' || doc_id::VARCHAR), 1, 15))::BIGINT AS ha,
               ('0x' || substr(md5('fimb:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hb,
               ('0x' || substr(md5('fimr:' || doc_id::VARCHAR), 1, 15))::BIGINT AS hr
             FROM documents),
             c AS (SELECT doc_id, text, n, hb, hr % 100 < 50 AS fim_applied,
                 ha % (n + 1) AS a FROM h),
             c2 AS (SELECT *, a + (hb % (n - a + 1)) AS b FROM c)
         SELECT doc_id, fim_applied, CAST(a AS BIGINT) AS cut_a,
           CAST(b AS BIGINT) AS cut_b,
           CASE WHEN fim_applied
             THEN '<|fim_pre|>' || substr(text, 1, a::INT)
               || '<|fim_suf|>' || substr(text, (b + 1)::INT, (n - b)::INT)
               || '<|fim_mid|>' || substr(text, (a + 1)::INT, (b - a)::INT)
             ELSE text END AS fim_text
         FROM c2""",

    // p82's oracle VERBATIM: banding is lossless at any block count,
    // so the truth relation does not mention geometry at all
    "p102_hamming_wide" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS dh0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(dh0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS dh
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.dh, b.dh)) <= 4
           AND (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)""",

    // p74's oracle verbatim over the audio signature: md5-fallback
    // dispatch + planted flips + the exact O(n²) pair restatement
    "p80_audio_fp_neardup" ->
      """WITH g AS (SELECT d.doc_id, b.text AS btext
               FROM documents d
               JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 3)),
             h AS (SELECT doc_id,
                     ('0x' || substr(md5(btext), 1, 12))::BIGINT AS fp0
                   FROM g),
             p AS (SELECT doc_id,
                     xor(xor(fp0,
                       CASE WHEN doc_id % 3 >= 1
                            THEN (1::BIGINT << (doc_id % 48)::INT)
                            ELSE 0::BIGINT END),
                       CASE WHEN doc_id % 3 = 2
                            THEN (1::BIGINT << ((doc_id * 31 + 17) % 48)::INT)
                            ELSE 0::BIGINT END) AS fp
                   FROM h)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         FROM p a JOIN p b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.fp, b.fp)) <= 4""",

    // p64's seed-assignment CTEs + the md5-draw in-cluster rank
    "p76_cluster_balanced" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             seeds AS (SELECT vec_id AS cid, v AS cv FROM e
                       ORDER BY vec_id LIMIT 16),
             asg0 AS (SELECT e.vec_id, e.v, s.cid,
                        round(list_dot_product(e.v, s.cv) /
                          (sqrt(list_dot_product(e.v, e.v)) *
                           sqrt(list_dot_product(s.cv, s.cv))), 6) AS cosc
                      FROM e CROSS JOIN seeds s),
             asg AS (SELECT vec_id, cid, cosc FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cosc DESC, cid) AS rn FROM asg0) t
                     WHERE rn = 1)
         SELECT vec_id, cid AS cluster_id, cosc AS cos_centroid,
           CAST(row_number() OVER (PARTITION BY cid
             ORDER BY md5('sel:' || vec_id::VARCHAR), vec_id) AS BIGINT) AS rnk,
           row_number() OVER (PARTITION BY cid
             ORDER BY md5('sel:' || vec_id::VARCHAR), vec_id) <= 12 AS selected
         FROM asg""",

    // the RFC 3986 §6 walk replayed step by step: fragment strip,
    // scheme/host lower, default-port strip, trailing-slash strip,
    // tracking-param filter + param sort — identical regexes (Java /
    // RE2 shared constructs), then the same group-by
    "p77_url_canonical_dedup" ->
      raw"""WITH d AS (
             SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) ||
               '://Site' || (doc_id % 10)::VARCHAR || '.Example.COM' ||
               (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END) ||
               '/Page/' || (doc_id % 7)::VARCHAR ||
               (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
               (CASE WHEN doc_id % 2 = 0
                     THEN '?id=' || (doc_id % 5)::VARCHAR || '&utm_source=feed'
                     ELSE '?utm_source=feed&utm_campaign=x&id=' ||
                          (doc_id % 5)::VARCHAR END) ||
               '#s' || (doc_id % 2)::VARCHAR AS raw_url
             FROM documents),
           c0 AS (SELECT doc_id, raw_url,
                    regexp_replace(raw_url, '#.*$$', '') AS u FROM d),
           c1 AS (SELECT doc_id, raw_url,
                    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
                    regexp_replace(regexp_extract(u,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1), '/+$$', '') AS path,
                    regexp_extract(u, '\?(.*)$$', 1) AS query
                  FROM c0),
           c2 AS (SELECT doc_id, raw_url,
                    scheme || '://' ||
                    (CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                          THEN regexp_replace(hostport, ':80$$', '')
                          WHEN scheme = 'https' AND hostport LIKE '%:443'
                          THEN regexp_replace(hostport, ':443$$', '')
                          ELSE hostport END) || path ||
                    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canonical_url
                  FROM (SELECT *, array_to_string(list_sort(list_filter(
                          string_split(query, '&'),
                          p -> len(p) > 0 AND NOT regexp_matches(
                            lower(regexp_extract(p, '^([^=]*)', 1)),
                            '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)$$'))), '&') AS cq
                        FROM c1))
         SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT raw_url) AS BIGINT) AS n_raw_variants,
           min(doc_id) AS first_doc
         FROM c2 GROUP BY 1""",

    // the three gate m-blocks of p43/p44/p75 composed over the funnel
    // plant, then the same first-fail CASE and group-by; the passer
    // suffix is interpolated from the SAME Scala constant the engine
    // plants, so the two sides cannot drift
    "p83_filter_funnel" -> {
      val passer = FunnelPasser
      raw"""WITH d0 AS (SELECT doc_id,
                text || chr(10) || '$passer'
                || CASE WHEN doc_id % 4 = 1 THEN ' ' || repeat('#', 40)
                        WHEN doc_id % 4 = 2 THEN chr(10) || 'lorem ipsum dolor sit amet.'
                        WHEN doc_id % 4 = 3 THEN chr(10) || 'badword ends the line today.'
                        ELSE '' END AS text
              FROM documents),
             dd AS (SELECT doc_id, text,
                      list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        x -> x != '') AS toks,
                      string_split(text, chr(10)) AS ls
                    FROM d0),
             g AS (SELECT doc_id,
                     (CAST(len(toks) AS BIGINT) >= 50 AND len(toks) <= 100000
                      AND coalesce(round(list_sum(list_transform(toks, x -> length(x)))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) BETWEEN 3.0 AND 10.0
                      AND coalesce(round((length(text) - length(replace(text, '#', ''))
                        + (length(text) - length(replace(text, '...', ''))) / 3)
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) <= 0.1
                      AND coalesce(round(len(list_filter(ls,
                          l -> substr(ltrim(l), 1, 1) IN ('•', '-')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.9
                      AND coalesce(round(len(list_filter(ls,
                          l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.3
                      AND coalesce(round(len(list_filter(toks,
                          x -> regexp_matches(x, '[a-z]')))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) >= 0.8
                      AND CAST(len(list_filter(
                        ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                        w -> list_contains(toks, w))) AS BIGINT) >= 2) AS gkeep
                   FROM dd),
             ck AS (SELECT doc_id, text,
                      list_filter(string_split(text, chr(10)),
                        l -> substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
                          AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                x -> x != '')) >= 3
                          AND NOT contains(lower(l), 'javascript')) AS kl
                    FROM d0),
             c AS (SELECT doc_id,
                     (CAST(length(array_to_string(kl, chr(10)))
                       - length(regexp_replace(array_to_string(kl, chr(10)),
                           '[.!?]', '', 'g')) AS BIGINT) >= 5
                      AND NOT contains(lower(text), 'lorem ipsum')
                      AND NOT contains(text, '{')) AS ckeep
                   FROM ck),
             w AS (SELECT doc_id,
                     len(list_filter(toks, t -> list_contains(['badword'], t))) = 0
                       AS wkeep
                   FROM dd)
         SELECT CASE WHEN NOT gkeep THEN '1_gopher'
                     WHEN NOT ckeep THEN '2_c4'
                     WHEN NOT wkeep THEN '3_wordlist'
                     ELSE '4_survivor' END AS stage,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM g JOIN c USING (doc_id) JOIN w USING (doc_id)
         GROUP BY 1"""
    },

    // same plant, same three disjoint line rules as list_filters over
    // the chr(10) split, same in-order reassembly
    "p85_line_corrections" ->
      raw"""WITH d AS (SELECT doc_id,
                text
                || CASE WHEN doc_id % 2 = 0 THEN chr(10) || '42 / 107' ELSE '' END
                || CASE WHEN doc_id % 3 = 0
                        THEN chr(10) || (doc_id % 90)::VARCHAR || ' likes'
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'HOME ABOUT CONTACT'
                        ELSE '' END
                || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '12 THINGS WE KEPT TODAY'
                        ELSE '' END
                || chr(10) || 'this closing line clearly stays here.' AS text
              FROM documents),
             sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d)
         SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(list_filter(ls,
             l -> regexp_matches(l, '^[\d.,:%/\s-]*\d[\d.,:%/\s-]*$$'))) AS BIGINT)
             AS n_numeric,
           CAST(len(list_filter(ls,
             l -> regexp_matches(lower(l),
               '^\s*\d+\s+(likes?|comments?|shares?|views?|points?)\s*$$')))
             AS BIGINT) AS n_counter,
           CAST(len(list_filter(ls,
             l -> regexp_matches(l, '[A-Z]') AND NOT regexp_matches(l, '[a-z]')
               AND len(list_filter(string_split_regex(trim(l), '\s+'),
                     t -> len(t) > 0)) <= 4)) AS BIGINT) AS n_caps,
           array_to_string(list_filter(ls,
             l -> NOT (regexp_matches(l, '^[\d.,:%/\s-]*\d[\d.,:%/\s-]*$$')
               OR regexp_matches(lower(l),
                 '^\s*\d+\s+(likes?|comments?|shares?|views?|points?)\s*$$')
               OR (regexp_matches(l, '[A-Z]') AND NOT regexp_matches(l, '[a-z]')
                 AND len(list_filter(string_split_regex(trim(l), '\s+'),
                       t -> len(t) > 0)) <= 4))), chr(10)) AS text_clean
         FROM sp""",

    // mirrors the p89 plant, prunes the chrome subtrees, splits at the
    // SAME block-tag regex (interpolated from TextOps.BlockTagRe), and
    // replays the per-block clean + link-density keep rule; coalesce
    // covers DuckDB's array_to_string([]) = NULL where Spark's
    // array_join([]) = ''
    "p89_main_content" -> {
      val keep = s"x -> length(x.txt) >= $McMinChars AND " +
        s"x.lch * 100 <= length(x.txt) * $McLinkPct"
      raw"""WITH h AS (SELECT doc_id,
                '<html><head><title>Doc ' || doc_id::VARCHAR
                || '</title><style>p{color:red}</style></head><body>'
                || '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/faq">FAQ</a></nav>'
                || '<div><a href="/l1">Latest stories</a> <a href="/l2">Top picks</a> read</div>'
                || '<p>' || text || '</p>'
                || CASE WHEN doc_id % 3 = 0 THEN '<p>ok.</p>' ELSE '' END
                || CASE WHEN doc_id % 4 = 0
                     THEN '<aside>Related: <a href="/r">one</a></aside>'
                     ELSE '' END
                || '<footer>(c) 2026 Example &amp; Co</footer></body></html>'
                  AS html
              FROM documents),
             pr AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(html,
                   '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                   '(?is)<nav\b[^>]*>.*?</nav>', ' ', 'g'),
                   '(?is)<header\b[^>]*>.*?</header>', ' ', 'g'),
                   '(?is)<footer\b[^>]*>.*?</footer>', ' ', 'g'),
                   '(?is)<aside\b[^>]*>.*?</aside>', ' ', 'g') AS html2
               FROM h),
             b AS (SELECT doc_id, list_transform(
                 string_split_regex(html2, '${graft.pipeline.TextOps.BlockTagRe}'),
                 c -> {'txt': ${mcClean("c")},
                       'lch': coalesce(length(${mcClean(
                         raw"""array_to_string(regexp_extract_all(c,
                           '(?is)<a\b[^>]*>(.*?)</a>', 1), ' ')""")}), 0)})
                 AS blocks
               FROM pr)
         SELECT doc_id,
           CAST(len(list_filter(blocks, x -> length(x.txt) > 0)) AS BIGINT)
             AS n_blocks,
           CAST(len(list_filter(blocks, $keep)) AS BIGINT) AS n_kept,
           CAST(coalesce(length(array_to_string(list_transform(
             list_filter(blocks, $keep), x -> x.txt), chr(10))), 0) AS BIGINT)
             AS len_main,
           coalesce(array_to_string(list_transform(
             list_filter(blocks, $keep), x -> x.txt), chr(10)), '') AS text_main
         FROM b"""
    },

    // clean-corpus v2: the whole recipe replayed as ONE CTE chain —
    // p89's extraction, p85's corrections, p83's gates, p20/p78/p81's
    // scrubs, p1's exact keep, p18's minhash walk, p69's semantic
    // verdicts (sm-prefixed to avoid CTE name clashes) — over the same
    // bid-keyed plant
    "p91_clean_corpus_v2" -> {
      val keep = s"x -> length(x.txt) >= $McMinChars AND " +
        s"x.lch * 100 <= length(x.txt) * $McLinkPct"
      val numeric = raw"""regexp_matches(l, '^[\d.,:%/\s-]*\d[\d.,:%/\s-]*$$')"""
      val counter = raw"""regexp_matches(lower(l),
        '^\s*\d+\s+(likes?|comments?|shares?|views?|points?)\s*$$')"""
      val caps = raw"""(regexp_matches(l, '[A-Z]') AND NOT regexp_matches(l, '[a-z]')
        AND len(list_filter(string_split_regex(trim(l), '\s+'),
              t -> len(t) > 0)) <= 4)"""
      raw"""WITH RECURSIVE base AS (SELECT doc_id AS bid, text AS btext FROM documents),
             src AS (SELECT doc_id,
                 doc_id - CASE WHEN doc_id % 10 IN (7, 9) THEN 1 ELSE 0 END AS bid
               FROM documents),
             d0 AS (SELECT s0.doc_id,
                 '<html><head><title>Doc</title></head><body>'
                 || '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
                 || '<div><a href="/l1">Latest stories</a> <a href="/l2">Top picks</a> go</div>'
                 || '<p>' || b.btext || ' contact user' || s0.bid::VARCHAR
                 || '@example.com pay 4111 1111 1111 1111 now acct DE89370400440532013000 ok. '
                 || '$FunnelPasser'
                 || CASE WHEN s0.bid % 5 = 2 THEN ' and lorem ipsum appears here sadly.' ELSE '' END
                 || CASE WHEN s0.bid % 5 = 3 THEN ' a badword slipped into prose today.' ELSE '' END
                 || CASE WHEN s0.doc_id % 10 = 9 THEN ' extranine.' ELSE '' END
                 || '</p>'
                 || CASE WHEN s0.bid % 5 = 1
                      THEN '<p>########## ########## ########## ##########</p>' ELSE '' END
                 || CASE WHEN s0.bid % 2 = 0
                      THEN '<p>42 / 107 13.5% 2024-01-02 10:11 99/100</p>' ELSE '' END
                 || '<footer>(c) 2026 Example</footer></body></html>' AS html
               FROM src s0 JOIN base b USING (bid)),
             pr AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(regexp_replace(html,
                   '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
                   '(?is)<nav\b[^>]*>.*?</nav>', ' ', 'g'),
                   '(?is)<header\b[^>]*>.*?</header>', ' ', 'g'),
                   '(?is)<footer\b[^>]*>.*?</footer>', ' ', 'g'),
                   '(?is)<aside\b[^>]*>.*?</aside>', ' ', 'g') AS html2
               FROM d0),
             mcb AS (SELECT doc_id, list_transform(
                 string_split_regex(html2, '${graft.pipeline.TextOps.BlockTagRe}'),
                 c -> {'txt': ${mcClean("c")},
                       'lch': coalesce(length(${mcClean(
                         raw"""array_to_string(regexp_extract_all(c,
                           '(?is)<a\b[^>]*>(.*?)</a>', 1), ' ')""")}), 0)})
                 AS blocks
               FROM pr),
             mct AS (SELECT doc_id,
                 coalesce(array_to_string(list_transform(
                   list_filter(blocks, $keep), x -> x.txt), chr(10)), '') AS text
               FROM mcb),
             lc AS (SELECT doc_id,
                 array_to_string(list_filter(string_split(text, chr(10)),
                   l -> NOT ($numeric OR $counter OR $caps)), chr(10)) AS text
               FROM mct),
             dd2 AS (SELECT doc_id, text, $TOKS AS toks,
                 string_split(text, chr(10)) AS ls
               FROM lc),
             g AS (SELECT doc_id,
                     (CAST(len(toks) AS BIGINT) >= 50 AND len(toks) <= 100000
                      AND coalesce(round(list_sum(list_transform(toks, x -> length(x)))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) BETWEEN 3.0 AND 10.0
                      AND coalesce(round((length(text) - length(replace(text, '#', ''))
                        + (length(text) - length(replace(text, '...', ''))) / 3)
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) <= 0.1
                      AND coalesce(round(len(list_filter(ls,
                          l -> substr(ltrim(l), 1, 1) IN ('•', '-')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.9
                      AND coalesce(round(len(list_filter(ls,
                          l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.3
                      AND coalesce(round(len(list_filter(toks,
                          x -> regexp_matches(x, '[a-z]')))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) >= 0.8
                      AND CAST(len(list_filter(
                        ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                        w2 -> list_contains(toks, w2))) AS BIGINT) >= 2) AS gkeep
                   FROM dd2),
             cg AS (SELECT doc_id,
                      (CAST(length(array_to_string(kl, chr(10)))
                        - length(regexp_replace(array_to_string(kl, chr(10)),
                            '[.!?]', '', 'g')) AS BIGINT) >= 5
                       AND NOT contains(lower(text), 'lorem ipsum')
                       AND NOT contains(text, '{')) AS ckeep
                    FROM (SELECT doc_id, text,
                        list_filter(ls,
                          l -> substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
                            AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                  x -> x != '')) >= 3
                            AND NOT contains(lower(l), 'javascript')) AS kl
                      FROM dd2) t),
             w AS (SELECT doc_id,
                     len(list_filter(toks, t -> list_contains(['badword'], t))) = 0
                       AS wkeep
                   FROM dd2),
             gated AS (SELECT dd2.doc_id, dd2.text
                       FROM dd2 JOIN g USING (doc_id) JOIN cg USING (doc_id)
                            JOIN w USING (doc_id)
                       WHERE gkeep AND ckeep AND wkeep),
             r3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                 '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS text
               FROM gated),
             cv AS (SELECT doc_id, text,
                 list_filter(regexp_extract_all(text, '\b\d(?:[ -]?\d){12,18}\b'), x ->
                     len(regexp_replace(x, '[ -]', '', 'g')) BETWEEN 13 AND 19 AND
                     list_sum(list_transform(
                       range(1, len(regexp_replace(x, '[ -]', '', 'g')) + 1), i ->
                       CASE WHEN (len(regexp_replace(x, '[ -]', '', 'g')) - i) % 2 = 1
                            THEN CASE WHEN substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 > 9
                                      THEN substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 - 9
                                      ELSE substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 END
                            ELSE substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT END)) % 10 = 0)
                   AS valid_raw
               FROM r3),
             r4 AS (SELECT doc_id,
                 list_reduce(list_prepend(text, valid_raw),
                   (acc, x) -> replace(acc, x, '[CARD]')) AS text
               FROM cv),
             vi AS (SELECT doc_id, text,
                 list_filter(regexp_extract_all(text, '\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b'), x ->
                     len(x) BETWEEN 15 AND 34 AND
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(range(1, len(x) + 1), i ->
                         CASE WHEN substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)
                                BETWEEN '0' AND '9'
                              THEN substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)::BIGINT
                              ELSE ascii(substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)) - 55 END)),
                       (acc, dd) -> (acc * (CASE WHEN dd >= 10 THEN 100 ELSE 10 END) + dd) % 97) = 1)
                   AS valid_raw
               FROM r4),
             scrub AS (SELECT doc_id,
                 list_reduce(list_prepend(text, valid_raw),
                   (acc, x) -> replace(acc, x, '[IBAN]')) AS text
               FROM vi),
             dd AS (SELECT doc_id, text FROM scrub
                    QUALIFY row_number() OVER (PARTITION BY md5(text)
                                               ORDER BY doc_id) = 1),
             ${minhashPairsCtes("dd")},
             pairs AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.8),
             edges AS (SELECT doc_a AS src2, doc_b AS dst FROM pairs
                       UNION SELECT doc_b, doc_a FROM pairs),
             nodes AS (SELECT DISTINCT src2 AS doc FROM edges),
             walk AS (SELECT doc, doc AS label FROM nodes
                      UNION
                      SELECT e.src2 AS doc, w2.label
                      FROM edges e JOIN walk w2 ON e.dst = w2.doc),
             clusters AS (SELECT doc, min(label) AS cluster_id FROM walk GROUP BY doc),
             doomed AS (SELECT doc FROM clusters WHERE doc <> cluster_id),
             nd AS (SELECT doc_id, text FROM dd
                    WHERE doc_id NOT IN (SELECT doc FROM doomed)),
             sme AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             smseeds AS (SELECT vec_id AS cid, v AS cv2 FROM sme
                         ORDER BY vec_id LIMIT 16),
             smasg0 AS (SELECT sme.vec_id, sme.v, s2.cid,
                          round(list_dot_product(sme.v, s2.cv2) /
                            (sqrt(list_dot_product(sme.v, sme.v)) *
                             sqrt(list_dot_product(s2.cv2, s2.cv2))), 6) AS cosc
                        FROM sme CROSS JOIN smseeds s2),
             smasg AS (SELECT vec_id, v, cid, cosc FROM (
                        SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cosc DESC, cid) AS rn FROM smasg0) t
                       WHERE rn = 1),
             smpl AS (SELECT p, list_transform(generate_series(0, 63), dims ->
                        ((('0x' || substr(md5('plane:' || p || ':' || dims), 1, 12))::BIGINT
                          % 2001) - 1000) / 1000.0) AS pv
                      FROM unnest(generate_series(0, 127)) t(p)),
             smbits AS (SELECT vec_id, p // 8 AS band, 1 << (p % 8) AS wbit,
                          CASE WHEN list_dot_product(v, pv) >= 0 THEN 1 ELSE 0 END AS bit
                        FROM sme, smpl),
             smbk AS (SELECT vec_id, band, sum(bit * wbit) AS bucket
                      FROM smbits GROUP BY 1, 2),
             smcells AS (SELECT vec_id, band, bucket,
                           count(*) OVER (PARTITION BY band, bucket) AS bsz,
                           min(vec_id) OVER (PARTITION BY band, bucket) AS bmin
                         FROM smbk),
             smcand AS (SELECT DISTINCT vec_a, vec_b FROM (
                          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
                          FROM smcells a JOIN smcells b ON a.band = b.band
                            AND a.bucket = b.bucket AND a.vec_id < b.vec_id
                          WHERE a.bsz <= 24 AND b.bsz <= 24
                          UNION ALL
                          SELECT bmin, vec_id FROM smcells
                          WHERE bsz > 24 AND vec_id > bmin) u),
             smpr AS (SELECT vec_a, vec_b,
                        round(list_dot_product(ea.v, eb.v) /
                          (sqrt(list_dot_product(ea.v, ea.v)) *
                           sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
                      FROM smcand JOIN sme ea ON vec_a = ea.vec_id
                                JOIN sme eb ON vec_b = eb.vec_id),
             smpairs AS (SELECT vec_a AS doc_a, vec_b AS doc_b FROM smpr
                         WHERE sim >= 0.35),
             smedges AS (SELECT doc_a AS src2, doc_b AS dst FROM smpairs
                         UNION SELECT doc_b, doc_a FROM smpairs),
             smnodes AS (SELECT DISTINCT src2 AS doc FROM smedges),
             smwalk AS (SELECT doc, doc AS label FROM smnodes
                        UNION
                        SELECT e2.src2 AS doc, w3.label
                        FROM smedges e2 JOIN smwalk w3 ON e2.dst = w3.doc),
             smcomp AS (SELECT doc AS vec_id, min(label) AS grp
                        FROM smwalk GROUP BY doc),
             smreps AS (SELECT grp, vec_id AS rep FROM (
                         SELECT c2.grp, a.vec_id, row_number() OVER (
                           PARTITION BY c2.grp ORDER BY a.cosc, a.vec_id) AS rn
                         FROM smcomp c2 JOIN smasg a USING (vec_id)) t WHERE rn = 1),
             smdrop AS (SELECT a.vec_id
                        FROM smasg a LEFT JOIN smcomp c2 USING (vec_id)
                             LEFT JOIN smreps r ON c2.grp = r.grp
                        WHERE NOT (c2.grp IS NULL OR a.vec_id = r.rep))
         SELECT doc_id, text FROM nd
         WHERE doc_id NOT IN (SELECT vec_id FROM smdrop)"""
    },

    // same marker transform (chr(1) between the last two whitespace
    // chars of a run before non-space), same split, same RE2-safe
    // alternation — the lookahead-free restatement both engines run
    "p92_gpt2_pretokenize" -> {
      val re = graft.pipeline.BpeByte.PretokenRe.replace("'", "''")
      val mk = graft.pipeline.BpeByte.MarkerRe
      val ws = graft.pipeline.BpeByte.Ws
      raw"""WITH d AS (SELECT doc_id,
                text || chr(10) || chr(10)
                || 'Don''t stop; we''ll go 1234 times!!  '
                || CASE WHEN doc_id % 3 = 0
                     THEN chr(9) || chr(9) || 'indented tail here'
                     ELSE 'spaced   out   tail' END
                || CASE WHEN doc_id % 4 = 0 THEN ' I''m done, you''re not.'
                     ELSE ' trailing spaces  ' END AS text
              FROM documents),
             n AS (SELECT doc_id, replace(text, chr(1), '') AS text
               FROM d),
             m AS (SELECT doc_id, text,
                 regexp_replace(text, '$mk',
                   '\1' || chr(1) || '\2\3', 'g') AS mk
               FROM n),
             p AS (SELECT doc_id, text,
                 flatten(list_transform(string_split(mk, chr(1)),
                   seg -> regexp_extract_all(seg, '$re'))) AS pts
               FROM m)
         SELECT doc_id,
           CAST(len(pts) AS BIGINT) AS n_pretokens,
           CAST(len(list_filter(pts, t -> t[1:1] = ' '
             AND regexp_matches(t, '[^$ws]'))) AS BIGINT)
             AS n_space_prefixed,
           CAST(len(list_filter(pts,
             t -> regexp_matches(t, '^[$ws]+$$'))) AS BIGINT) AS n_ws_runs,
           CAST(len(list_filter(pts, t -> list_contains(
             ['''s', '''t', '''re', '''ve', '''m', '''ll', '''d'], t)))
             AS BIGINT) AS n_contractions,
           md5(coalesce(array_to_string(pts, chr(31)), '')) AS pt_hash,
           coalesce(array_to_string(pts, ''), '') = text AS lossless
         FROM p"""
    },

    // the p61 generated scorer over the exploded line relation (same
    // lexicon arithmetic, composite line ids), then the same per-doc
    // rollup with the same (count desc, lang asc) dominant pick
    "p94_line_langs" -> {
      def words(l: String, line: Int) = {
        val lex = s"list_value(${graft.pipeline.LangId.Lexicons(l)
          .map(w => s"'$w'").mkString(",")})"
        (0 until 10).map(k =>
          s"($lex)[((doc_id*7 + ${line * 11} + ${k * 3}) % 10)::INT + 1]")
          .mkString(" || ' ' || ")
      }
      val srcSel = s"""SELECT doc_id*10 + pos AS doc_id, lower(CASE
           WHEN pos = 0 THEN ${words("en", 0)}
           WHEN pos = 1 THEN CASE WHEN doc_id % 4 = 0
             THEN ${words("de", 1)} ELSE ${words("en", 1)} END
           ELSE CASE WHEN doc_id % 5 = 0
             THEN ${words("fr", 2)} ELSE ${words("en", 2)} END END) AS __t
         FROM documents, (SELECT unnest([0, 1, 2]) AS pos) p"""
      val scoreSql = graft.pipeline.LangId.scoreSqlFrom(srcSel)
      raw"""WITH cls AS ($scoreSql),
           pl AS (SELECT CAST(doc_id // 10 AS BIGINT) AS doc_id, lang_pred,
                    count(*) AS n
                  FROM cls GROUP BY 1, 2),
           rk AS (SELECT doc_id, lang_pred, n,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY n DESC, lang_pred) AS rk
                  FROM pl)
         SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_langs,
           max(CASE WHEN rk = 1 THEN lang_pred END) AS dominant_lang,
           CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS n_dominant,
           count(*) >= 2 AS is_mixed
         FROM rk GROUP BY doc_id"""
    },

    // same plant, same vowel-group syllable heuristic, same formula
    // nesting (multiply-then-divide order mirrored so IEEE bits match
    // before the 6-dp round)
    "p95_readability" ->
      raw"""WITH d AS (SELECT doc_id,
                text || '. and so it goes.'
                || CASE WHEN doc_id % 3 = 0
                     THEN ' more plain text follows here.' ELSE '' END AS t
              FROM documents),
             c AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(t)), '\s+'),
                   x -> x != '') AS toks,
                 greatest(1, length(t) -
                   length(regexp_replace(t, '[.!?]', '', 'g'))) AS s
               FROM d),
             k AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(s AS BIGINT) AS n_sentences,
                 CAST(coalesce(list_sum(list_transform(toks, w ->
                   greatest(1,
                     len(regexp_extract_all(w, '[aeiouy]+'))
                     - CASE WHEN regexp_matches(w, '[^aeiouy]e$$')
                             AND len(regexp_extract_all(w, '[aeiouy]+')) > 1
                            THEN 1 ELSE 0 END))), 0) AS BIGINT)
                   AS n_syllables
               FROM c)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           round(0.39 * (n_words * 1.0 / n_sentences) +
             11.8 * (n_syllables * 1.0 / nullif(n_words, 0)) - 15.59, 6)
             AS fk_grade,
           round(206.835 - 1.015 * (n_words * 1.0 / n_sentences) -
             84.6 * (n_syllables * 1.0 / nullif(n_words, 0)), 6)
             AS flesch_ease,
           round(0.39 * (n_words * 1.0 / n_sentences) +
             11.8 * (n_syllables * 1.0 / nullif(n_words, 0)) - 15.59, 6)
             <= 12.0 AS keep
         FROM k""",

    // the identity: a lossless interchange round-trip must reproduce
    // the source relation exactly
    "p96_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    // the release pipeline (shard → gzip JSONL → schema read) is also
    // an identity — the certificate inside releaseCorpus already
    // enforced it once; the oracle enforces it independently
    "p101_release_export" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    // p3's pair CTEs + the source attribution joins + the unordered
    // pair fold
    "p97_dedup_source_matrix" ->
      s"""WITH ${minhashPairsCtes("documents")},
             pr2 AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.4),
             att AS (SELECT least(sa.source, sb.source) AS source_a,
                       greatest(sa.source, sb.source) AS source_b
                     FROM pr2
                     JOIN documents sa ON pr2.doc_a = sa.doc_id
                     JOIN documents sb ON pr2.doc_b = sb.doc_id)
         SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         FROM att GROUP BY 1, 2""",

    // same token counts, same 3-row L table, same greatest() loss fold
    "p98_context_fit" ->
      s"""WITH n AS (SELECT CAST(len($TOKS) AS BIGINT) AS n FROM documents),
             l AS (SELECT unnest([32, 64, 128]) AS ctx_len),
             x AS (SELECT CAST(ctx_len AS BIGINT) AS ctx_len, n
                   FROM n CROSS JOIN l)
         SELECT ctx_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > ctx_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(greatest(n - ctx_len, 0)) AS BIGINT) AS tokens_lost,
           round(sum(greatest(n - ctx_len, 0)) * 1.0 / sum(n), 6) AS lost_frac
         FROM x GROUP BY 1""",

    // the Gopher/C4 m-blocks over the RAW text, the p20 chained PII
    // counting, and plain aggregates, folded to one row
    "p99_corpus_datasheet" ->
      raw"""WITH dd AS (SELECT doc_id, text, lang, source,
                 list_filter(string_split_regex(lower(trim(text)), '\s+'),
                   x -> x != '') AS toks,
                 string_split(text, chr(10)) AS ls
               FROM documents),
             g AS (SELECT avg(CASE WHEN
                     (CAST(len(toks) AS BIGINT) >= 50 AND len(toks) <= 100000
                      AND coalesce(round(list_sum(list_transform(toks, x -> length(x)))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) BETWEEN 3.0 AND 10.0
                      AND coalesce(round((length(text) - length(replace(text, '#', ''))
                        + (length(text) - length(replace(text, '...', ''))) / 3)
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) <= 0.1
                      AND coalesce(round(len(list_filter(ls,
                          l -> substr(ltrim(l), 1, 1) IN ('•', '-')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.9
                      AND coalesce(round(len(list_filter(ls,
                          l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))
                        * 1.0 / nullif(len(ls), 0), 6), 0.0) <= 0.3
                      AND coalesce(round(len(list_filter(toks,
                          x -> regexp_matches(x, '[a-z]')))
                        * 1.0 / nullif(len(toks), 0), 6), 0.0) >= 0.8
                      AND CAST(len(list_filter(
                        ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'],
                        w2 -> list_contains(toks, w2))) AS BIGINT) >= 2)
                     THEN 1.0 ELSE 0.0 END) AS gp
                   FROM dd),
             c AS (SELECT avg(CASE WHEN
                     (CAST(length(array_to_string(kl, chr(10)))
                       - length(regexp_replace(array_to_string(kl, chr(10)),
                           '[.!?]', '', 'g')) AS BIGINT) >= 5
                      AND NOT contains(lower(text), 'lorem ipsum')
                      AND NOT contains(text, '{'))
                     THEN 1.0 ELSE 0.0 END) AS cp
                   FROM (SELECT doc_id, text,
                       list_filter(ls,
                         l -> substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
                           AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                 x -> x != '')) >= 3
                           AND NOT contains(lower(l), 'javascript')) AS kl
                     FROM dd) t),
             pii AS (SELECT CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS docs_with_pii
                     FROM (SELECT
                         len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
                         len(regexp_extract_all(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
                         len(regexp_extract_all(regexp_replace(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
                           '\b\d{3}-\d{3}-\d{4}\b')) AS np
                       FROM dd) u),
             tl AS (SELECT lang AS top_lang, CAST(count(*) AS BIGINT)
                      AS top_lang_docs
                    FROM dd GROUP BY 1
                    ORDER BY count(*) DESC, lang LIMIT 1),
             base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
                 CAST(sum(length(text)) AS BIGINT) AS n_chars,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_docs
               FROM dd)
         SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, n_unique_docs,
           top_lang, top_lang_docs,
           round(gp, 6) AS gopher_pass_frac,
           round(cp, 6) AS c4_pass_frac,
           docs_with_pii,
           round((n_docs - n_unique_docs) * 1.0 / n_docs, 6) AS dup_doc_frac,
           round(top_lang_docs * 1.0 / n_docs, 6) AS top_lang_frac
         FROM base CROSS JOIN tl CROSS JOIN g CROSS JOIN c CROSS JOIN pii""",

    // same integer bucket arithmetic, min-first-bucket vocabulary
    // attribution, 10-row cumulative window
    "p88_vocab_growth" ->
      raw"""WITH bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
                            FROM documents),
             db AS (SELECT CAST((doc_id - lo) * 10 // (hi - lo + 1) AS BIGINT) AS b,
                      text
                    FROM documents CROSS JOIN bounds),
             tk AS (SELECT b, unnest(list_filter(string_split_regex(
                      lower(trim(text)), '\s+'), x -> x != '')) AS term FROM db),
             fs AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS new_terms
                    FROM (SELECT term, min(b) AS fb FROM tk GROUP BY 1)
                    GROUP BY 1),
             tc AS (SELECT b, CAST(count(*) AS BIGINT) AS nt FROM tk GROUP BY 1),
             dc AS (SELECT b, CAST(count(*) AS BIGINT) AS nd FROM db GROUP BY 1)
         SELECT dc.b AS bucket,
           CAST(sum(dc.nd) OVER (ORDER BY dc.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS docs_cum,
           CAST(sum(coalesce(tc.nt, 0)) OVER (ORDER BY dc.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS tokens_cum,
           CAST(sum(coalesce(fs.new_terms, 0)) OVER (ORDER BY dc.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_cum,
           coalesce(fs.new_terms, 0) AS new_terms
         FROM dc LEFT JOIN tc ON dc.b = tc.b
         LEFT JOIN fs ON dc.b = fs.b""",

    // same split + plants, same full-outer term join, same single-ln
    // 6-dp log-ratio and status CASE
    "p87_vocab_drift" ->
      raw"""WITH av AS (SELECT
                text || CASE WHEN doc_id % 6 = 0 THEN ' legacyterm legacyterm'
                             ELSE '' END AS text
              FROM documents WHERE doc_id % 2 = 0),
             bv AS (SELECT
                text || CASE WHEN doc_id % 6 = 1 THEN ' freshterm freshterm'
                             ELSE '' END
                     || CASE WHEN doc_id % 6 = 3
                             THEN ' slow slow slow slow slow slow slow slow'
                             ELSE '' END AS text
              FROM documents WHERE doc_id % 2 = 1),
             ta AS (SELECT unnest(list_filter(string_split_regex(
                      lower(trim(text)), '\s+'), x -> x != '')) AS term FROM av),
             tb AS (SELECT unnest(list_filter(string_split_regex(
                      lower(trim(text)), '\s+'), x -> x != '')) AS term FROM bv),
             ca AS (SELECT term, CAST(count(*) AS BIGINT) AS ka FROM ta GROUP BY 1),
             cb AS (SELECT term, CAST(count(*) AS BIGINT) AS kb FROM tb GROUP BY 1),
             tot AS (SELECT (SELECT CAST(sum(ka) AS BIGINT) FROM ca) AS na,
                       (SELECT CAST(sum(kb) AS BIGINT) FROM cb) AS nb),
             j AS (SELECT coalesce(ca.term, cb.term) AS term, ka, kb
                   FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
                   WHERE coalesce(ka, 0) + coalesce(kb, 0) >= 5),
             r AS (SELECT term,
                     coalesce(ka, 0) AS k_old, coalesce(kb, 0) AS k_new,
                     CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
                          THEN round(ln((kb * 1.0 / tot.nb) / (ka * 1.0 / tot.na)), 6)
                          END AS log_ratio
                   FROM j CROSS JOIN tot)
         SELECT term, k_old, k_new, log_ratio,
           CASE WHEN k_old = 0 THEN 'new'
                WHEN k_new = 0 THEN 'vanished'
                WHEN abs(log_ratio) >= 0.69 THEN 'drifted'
                ELSE 'stable' END AS status
         FROM r""",

    // same plant; per-(source, term) micro-nat KL term, exact integer
    // sum per source, term marginal derived from the (source, term)
    // frame exactly as the engine does
    "p86_domain_kl" ->
      raw"""WITH d AS (SELECT source,
                concat_ws(' ', text, source, source, source) AS text
              FROM documents),
             tk AS (SELECT source,
                      unnest(list_filter(string_split_regex(lower(trim(text)),
                        '\s+'), x -> x != '')) AS term
                    FROM d),
             st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS kst
                    FROM tk GROUP BY 1, 2),
             t AS (SELECT term, CAST(sum(kst) AS BIGINT) AS kt
                   FROM st GROUP BY 1),
             ns AS (SELECT source, CAST(sum(kst) AS BIGINT) AS nsum,
                      CAST(count(*) AS BIGINT) AS n_terms
                    FROM st GROUP BY 1),
             tot AS (SELECT CAST(sum(kt) AS BIGINT) AS n FROM t),
             u AS (SELECT st.source,
                     CAST(round((st.kst * 1.0 / ns.nsum) *
                       ln((st.kst * 1.0 / ns.nsum) / (t.kt * 1.0 / tot.n))
                       * 1000000.0) AS BIGINT) AS klu
                   FROM st JOIN t USING (term)
                   JOIN ns USING (source)
                   CROSS JOIN tot),
             su AS (SELECT source, CAST(sum(klu) AS BIGINT) AS su
                    FROM u GROUP BY 1)
         SELECT ns.source, ns.nsum AS n_tokens, ns.n_terms,
           round(su.su / 1000000.0, 6) AS kl_nats
         FROM ns JOIN su USING (source)""",

    // same plant; per-char-type micro-nat term, exact integer sum,
    // 6-dp final — the p36 rounding discipline over characters
    "p84_char_entropy" ->
      raw"""WITH d AS (SELECT doc_id,
                text || CASE WHEN doc_id % 5 = 0 THEN ' ' || repeat('a', 200)
                             ELSE '' END AS text
              FROM documents),
             ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
                    FROM d),
             cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
                    FROM ch GROUP BY 1, 2),
             n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS n_distinct FROM cc GROUP BY 1),
             t AS (SELECT cc.doc_id,
                     CAST(round(-(cc.k * 1.0 / n.n) * ln(cc.k * 1.0 / n.n)
                       * 1000000.0) AS BIGINT) AS tu
                   FROM cc JOIN n USING (doc_id)),
             e AS (SELECT doc_id, CAST(sum(tu) AS BIGINT) AS su FROM t GROUP BY 1)
         SELECT n.doc_id, n.n AS n_chars, n.n_distinct AS n_distinct_chars,
           round(e.su / 1000000.0, 6) AS char_entropy,
           round(e.su / 1000000.0, 6) >= 2.5 AS keep
         FROM n JOIN e USING (doc_id)""",

    // same plant, same candidate regex, same rearrange + mod-97 fold
    // (letters via ascii-55, digit-count-aware radix per step), same
    // left-fold literal replace
    "p81_iban_pii" ->
      raw"""WITH d AS (
             SELECT doc_id, text ||
               CASE WHEN doc_id % 3 = 0 THEN
                      ' acct ' || (CASE WHEN doc_id % 15 = 0 THEN 'DE89370400440532013000'
                                        WHEN doc_id % 15 = 3 THEN 'GB82WEST12345698765432'
                                        WHEN doc_id % 15 = 6 THEN 'FR1420041010050500013M02606'
                                        WHEN doc_id % 15 = 9 THEN 'NL91ABNA0417164300'
                                        ELSE 'CH9300762011623852957' END) || ' ok'
                    WHEN doc_id % 3 = 1 THEN
                      ' acct DE89370400440532013001 bad'
                    ELSE '' END AS text
             FROM documents),
           c AS (SELECT doc_id, text,
                   regexp_extract_all(text, '\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b') AS cands
                 FROM d),
           v AS (SELECT doc_id, text, cands,
                   list_filter(cands, x ->
                     len(x) BETWEEN 15 AND 34 AND
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(range(1, len(x) + 1), i ->
                         CASE WHEN substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)
                                BETWEEN '0' AND '9'
                              THEN substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)::BIGINT
                              ELSE ascii(substr(substr(x, 5) || substr(x, 1, 4), i::INT, 1)) - 55 END)),
                       (acc, dd) -> (acc * (CASE WHEN dd >= 10 THEN 100 ELSE 10 END) + dd) % 97) = 1)
                     AS valid_raw
                 FROM c)
         SELECT doc_id,
           CAST(len(cands) AS BIGINT) AS n_candidates,
           CAST(len(valid_raw) AS BIGINT) AS n_valid,
           len(valid_raw) = 0 AS keep,
           list_reduce(list_prepend(text, valid_raw),
             (acc, x) -> replace(acc, x, '[IBAN]')) AS text_redacted
         FROM v""",

    // same plant, same candidate regex, same Luhn walk (positions
    // left to right, (n-i) odd -> double with >9-9 fold), same
    // left-fold literal replace of the VALID raw spellings only
    "p78_card_pii" ->
      raw"""WITH d AS (
             SELECT doc_id, text ||
               CASE WHEN doc_id % 3 = 0 THEN
                      ' pay ' || (CASE WHEN doc_id % 10 = 0 THEN '4111 1111 1111 1111'
                                       WHEN doc_id % 10 = 3 THEN '4012-8888-8888-1881'
                                       WHEN doc_id % 10 = 6 THEN '378282246310005'
                                       ELSE '5555555555554444' END) || ' now'
                    WHEN doc_id % 3 = 1 THEN
                      ' ref 4111111111111112 and order 12345678 code'
                    ELSE '' END AS text
             FROM documents),
           c AS (SELECT doc_id, text,
                   regexp_extract_all(text, '\b\d(?:[ -]?\d){12,18}\b') AS cands
                 FROM d),
           v AS (SELECT doc_id, text, cands,
                   list_filter(cands, x ->
                     len(regexp_replace(x, '[ -]', '', 'g')) BETWEEN 13 AND 19 AND
                     list_sum(list_transform(
                       range(1, len(regexp_replace(x, '[ -]', '', 'g')) + 1), i ->
                       CASE WHEN (len(regexp_replace(x, '[ -]', '', 'g')) - i) % 2 = 1
                            THEN CASE WHEN substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 > 9
                                      THEN substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 - 9
                                      ELSE substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT * 2 END
                            ELSE substr(regexp_replace(x, '[ -]', '', 'g'), i::INT, 1)::INT END)) % 10 = 0)
                     AS valid_raw
                 FROM c)
         SELECT doc_id,
           CAST(len(cands) AS BIGINT) AS n_candidates,
           CAST(len(valid_raw) AS BIGINT) AS n_valid,
           len(valid_raw) = 0 AS keep,
           list_reduce(list_prepend(text, valid_raw),
             (acc, x) -> replace(acc, x, '[CARD]')) AS text_redacted
         FROM v""",

    "p75_wordlist_filter" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
             c AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter(toks, t -> list_contains(
                       ['slow', 'leak', 'spam'], t))) AS BIGINT) AS n_listed
                   FROM d)
         SELECT doc_id, n_tokens, n_listed,
           round(n_listed / greatest(n_tokens, 1), 6) AS listed_frac,
           n_listed = 0 AS keep_strict,
           round(n_listed / greatest(n_tokens, 1), 6) <= 0.02 AS keep
         FROM c""",

    // p61's generated scoring over the routed source (headers by the
    // shared lexicon arithmetic, Han plant via chr() codes, digit
    // garbage), then the margin gate + p57's script CASE as the
    // fallback — the whole routing replayed relationally
    "p72_langid_route" -> {
      val hdr = graft.pipeline.LangId.Langs.map { l =>
        val lex = s"list_value(${graft.pipeline.LangId.Lexicons(l)
          .map(w => s"'$w'").mkString(",")})"
        val words = (0 until 10).map(k =>
          s"($lex)[((doc_id*7 + ${k * 3}) % 10)::INT + 1]")
          .mkString(" || ' ' || ")
        s"WHEN lang = '$l' THEN $words"
      }.mkString(" ")
      val han = Seq(20320, 22909, 19990, 30028, 20877, 35265, 26379, 21451)
        .map(c => s"chr($c)").mkString(" || ")
      val srcSel = s"""SELECT doc_id,
           CASE WHEN doc_id % 4 <> 3 THEN lower(CASE $hdr END)
                WHEN doc_id % 8 = 3 THEN $han
                ELSE '12345 67890 12345' END AS __t
         FROM documents"""
      val scoreSql = graft.pipeline.LangId.scoreSqlFrom(srcSel)
      raw"""WITH cls AS ($scoreSql),
           src2 AS ($srcSel),
           c0 AS (SELECT doc_id, length(__t) AS n,
               length(__t) - length(regexp_replace(__t, '[ \t\n\f\r]', '', 'g')) AS ws,
               length(__t) - length(regexp_replace(__t, '\p{Latin}', '', 'g')) AS lat,
               length(__t) - length(regexp_replace(__t, '\p{Cyrillic}', '', 'g')) AS cyr,
               length(__t) - length(regexp_replace(__t, '\p{Han}', '', 'g')) AS han,
               length(__t) - length(regexp_replace(__t, '\p{Arabic}', '', 'g')) AS ar,
               length(__t) - length(regexp_replace(__t, '[0-9]', '', 'g')) AS dig
             FROM src2),
           prof AS (SELECT doc_id,
               CASE WHEN n - ws - lat - cyr - han - ar - dig >
                         greatest(lat, cyr, han, ar) THEN 'other'
                    WHEN lat >= greatest(cyr, han, ar) THEN 'latin'
                    WHEN cyr >= greatest(han, ar) THEN 'cyrillic'
                    WHEN han >= ar THEN 'han'
                    ELSE 'arabic' END AS dominant_script
             FROM c0)
         SELECT c.doc_id, c.lang_pred, c.margin, p.dominant_script,
           CASE WHEN c.margin >= 16 THEN c.lang_pred
                WHEN p.dominant_script = 'han' THEN 'zh'
                ELSE 'und' END AS lang_routed
         FROM cls c JOIN prof p USING (doc_id)"""
    },

    // the incremental screen is relationally "full-corpus pairs with
    // >= 1 side in the new batch": candidates from (new x all) band
    // collisions are exactly the full self-join's pairs minus the
    // both-old ones, and the verify Jaccard is unchanged
    "p71_incremental_neardup" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT doc_a, doc_b, jaccard FROM j
         WHERE jaccard >= 0.4 AND (doc_a % 2 = 1 OR doc_b % 2 = 1)""",

    // p71's oracle VERBATIM: the bucketed catalog path must return the
    // identical >=1-odd-side pair relation
    "p103_backfill_screen" ->
      s"""WITH ${minhashPairsCtes("documents")}
         SELECT doc_a, doc_b, jaccard FROM j
         WHERE jaccard >= 0.4 AND (doc_a % 2 = 1 OR doc_b % 2 = 1)""",

    // closed-form restatement of the p70 plant parameters — doc_id%3
    // picks 1-track mp4 / 2-track mp4 / webm, (doc_id//3)%3 the
    // duration/sample variant; a parser that mis-walks any box or vint
    // reports different numbers and the hash diverges
    "p70_video_metadata" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 3 = 2 THEN 'webm' ELSE 'mp4' END AS container,
           CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                ELSE 'V_VP9' END AS video_codec,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_tracks,
           CAST(10 * ((doc_id // 3) % 3 + 1) AS BIGINT) AS n_samples,
           CAST(1000 * ((doc_id // 3) % 3 + 1) AS BIGINT) AS duration_ms
         FROM documents""",

    // the header plant (pure modular word picks per label lang) and
    // the full hashed-char-3-gram linear scoring are both generated
    // from LangId's OWN constants — lexicons and trained weights are
    // shared verbatim with the Spark plan, so the oracle replays the
    // classifier bit-for-bit
    // the same magic-byte sniff over the same rebuilt blobs, replayed
    // on hex(blob) (this DuckDB has no BLOB substr/position): every
    // byte test becomes an aligned hex-text test — alignment is safe
    // because the payload is ASCII (first hex digit 2-7), so 'FFD8FF'
    // etc. can only match at the planted markers
    "p63_media_containers" ->
      raw"""WITH b AS (SELECT doc_id,
               CASE doc_id % 8
                 WHEN 0 THEN '\x89PNG'::BLOB || text::BLOB
                 WHEN 1 THEN '\xFF\xD8\xFF'::BLOB || text::BLOB || '\xFF\xD9'::BLOB
                 WHEN 2 THEN '\xFF\xD8\xFF'::BLOB || text::BLOB || '\xFF\xD9'::BLOB ||
                             '\xFF\xD8\xFF'::BLOB || text::BLOB || '\xFF\xD9'::BLOB
                 WHEN 3 THEN 'GIF8'::BLOB || text::BLOB
                 WHEN 4 THEN 'RIFF'::BLOB || '\x00\x00\x00\x00'::BLOB ||
                             'WAVE'::BLOB || text::BLOB
                 WHEN 5 THEN '\x00\x00\x00\x10'::BLOB || 'ftypisom'::BLOB ||
                             '\x00\x00\x00\x00'::BLOB || text::BLOB
                 WHEN 6 THEN '\x1A\x45\xDF\xA3\x87\x42\x82\x84'::BLOB ||
                             'webm'::BLOB || text::BLOB
                 ELSE text::BLOB END AS blob
             FROM documents),
           h AS (SELECT doc_id, blob, hex(blob) AS hx FROM b)
         SELECT doc_id,
           -- the FULL containerOf branch set in the ENGINE's test order
           -- (png gif bmp jpeg/mjpeg webp wav aiff au): a class-5 text
           -- payload that happens to start 'BM'/'FORM'/'.snd'/'RIFF'
           -- must classify identically on both engines, not diverge
           -- data-dependently. webp-anim replays the chunk walk's
           -- first-chunk ANMF test — exact for ASCII payloads, whose
           -- LE chunk size is always > blob length so the engine walk
           -- stops after chunk one
           CASE WHEN octet_length(blob) < 4 THEN 'unknown'
                WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
                WHEN substr(hx, 1, 8) = hex('GIF8'::BLOB) THEN 'gif'
                WHEN substr(hx, 1, 4) = hex('BM'::BLOB) THEN 'bmp'
                WHEN substr(hx, 1, 6) = 'FFD8FF' THEN
                  CASE WHEN position('FFD8FF' IN
                         substr(hx, position('FFD9' IN hx) + 4)) > 0
                       THEN 'mjpeg' ELSE 'jpeg' END
                WHEN substr(hx, 1, 8) = hex('RIFF'::BLOB)
                     AND substr(hx, 17, 8) = hex('WEBP'::BLOB) THEN
                  CASE WHEN octet_length(blob) >= 20
                            AND substr(hx, 25, 8) = hex('ANMF'::BLOB)
                       THEN 'webp-anim' ELSE 'webp' END
                WHEN substr(hx, 1, 8) = hex('RIFF'::BLOB)
                     AND substr(hx, 17, 8) = hex('WAVE'::BLOB) THEN 'wav'
                WHEN substr(hx, 1, 8) = hex('FORM'::BLOB) THEN 'aiff'
                WHEN substr(hx, 1, 8) = hex('.snd'::BLOB) THEN 'au'
                WHEN octet_length(blob) >= 12
                     AND substr(hx, 9, 8) = hex('ftyp'::BLOB) THEN 'mp4'
                -- EBML magic is non-ASCII so only the planted class-6
                -- prefix reaches this branch; its DocType sits at the
                -- fixed header offset the engine walk derives
                WHEN substr(hx, 1, 8) = '1A45DFA3' THEN
                  CASE WHEN substr(hx, 11, 4) = '4282'
                            AND substr(hx, 17, 8) = hex('webm'::BLOB)
                       THEN 'webm' ELSE 'mkv' END
                ELSE 'unknown' END AS container,
           CAST(octet_length(blob) AS BIGINT) AS n_bytes
         FROM h""",

    "p61_langid_classifier" -> {
      val hdr = graft.pipeline.LangId.Langs.map { l =>
        val lex = s"list_value(${graft.pipeline.LangId.Lexicons(l)
          .map(w => s"'$w'").mkString(",")})"
        val words = (0 until 10).map(k =>
          s"($lex)[((doc_id*7 + ${k * 3}) % 10)::INT + 1]")
          .mkString(" || ' ' || ")
        s"WHEN lang = '$l' THEN $words"
      }.mkString(" ")
      graft.pipeline.LangId.scoreSqlFrom(
        s"SELECT doc_id, lower(CASE $hdr END) AS __t FROM documents")
    }
  )

  /** The oracle map the driver consumes: the base plus VERBATIM-reuse
    * rows — the bucketed backfill layouts must return the IDENTICAL
    * relation to their broadcast-serving siblings, and sharing the SQL
    * text is that claim.
    */
  val oracle: Map[String, String] = oracleBase ++ Map(
    "p136_line_backfill" -> oracleBase("p113_line_screen"),
    "p137_priority_backfill" -> oracleBase("p133_priority_screen"),
    "p143_priority_bloom_screen" -> oracleBase("p133_priority_screen"),
    "p144_cdc_bloom_screen" -> oracleBase("p138_cdc_screen"),
    "p149_containment_bloom" -> oracleBase("p148_containment_screen"),
    "p150_containment_backfill" -> oracleBase("p148_containment_screen"),
    "p151_cdc_backfill" -> oracleBase("p138_cdc_screen"),
    // the zero-shuffle serving form computes the identical relation
    "p156_robots_serve" -> oracleBase("p154_robots_filter"),
    // compaction is a pure rewrite: serving is byte-identical, so each
    // compacted screen certifies against its plain sibling's verbatim
    "p167_exact_compact" -> oracleBase("p109_exact_screen"),
    "p168_line_compact" -> oracleBase("p113_line_screen"),
    "p169_priority_compact" -> oracleBase("p133_priority_screen"),
    "p170_chunk_compact" -> oracleBase("p138_cdc_screen"),
    // the winnow bloom fast path returns p175's identical relation
    "p177_winnow_bloom" -> oracleBase("p175_winnow_screen"),
    // the bucketed/bloom serving forms return their plain siblings'
    // identical relations
    "p180_winnow_backfill" -> oracleBase("p175_winnow_screen"),
    "p181_editdist_bloom" -> oracleBase("p178_editdist_screen"),
    "p182_editdist_backfill" -> oracleBase("p178_editdist_screen"))
}
