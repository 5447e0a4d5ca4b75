package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps._
import graft.pipeline.CacheLedger.TrackedPersist

/** Corpus-quality operators beyond the per-doc ratios of p9: repetition
  * signals (the Gopher/RefinedWeb-style filters that catch boilerplate
  * and degenerate generations) and PII scrubbing. All explode + hash
  * aggregate / codegen'd regex shapes — linear, shuffle-on-doc-id,
  * no UDFs — with exactly-equivalent DuckDB oracle forms
  * (PipelineQueries p19/p20).
  */
object Quality {

  /** All word n-grams WITH multiplicity (contrast [[Dedup.shingles]],
    * which is distinct-set semantics for Jaccard) — frequency signals
    * need the duplicates. CALLER CONTRACT: pass a MATERIALIZED column
    * (an attribute), not a raw tokenize expression — the per-element
    * lambda re-evaluates `toks` on every element (`element_at` below),
    * so an unmaterialized argument multiplies its cost by the gram
    * count. Project the tokens first (see [[repetitionStats]] /
    * [[graft.pipeline.Dsir]]).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(d => element_at(toks, i + d)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition signals (public filter thresholds from the
    * Gopher appendix / RefinedWeb pipeline):
    *
    *   - `max_word_frac`: occurrences of the most frequent word /
    *     total words — catches `foo foo foo ...` degeneracy;
    *   - `top_bigram_frac`: occurrences of the most frequent 2-gram /
    *     total 2-grams — catches looping phrases;
    *   - `dup_trigram_frac`: fraction of 3-gram instances that are
    *     repeats of an earlier 3-gram (1 − distinct/total) — catches
    *     paragraph-level copy loops.
    *
    * Docs with no tokens (or too few for an n-gram) report 0.0. Three
    * explode + hash-aggregate passes, joined back on doc id; ratios
    * rounded to 6 dp for oracle parity.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // persisted: three explodes consume the token relation; without the
    // barrier each re-tokenizes from raw text (the CollapseProject /
    // no-CSE-in-lambdas trap documented in Dedup)
    val toks = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("__toks"))
      .persistTracked()
    def freqStats(grams: Column, outMax: String, outTot: String, outDist: String) =
      toks.select(col("doc"), explode(grams).as("g"))
        .groupBy("doc", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc").agg(
          max(col("c")).as(outMax),
          sum(col("c")).as(outTot),
          count(lit(1)).as(outDist))
    val words = freqStats(col("__toks"), "w_max", "w_tot", "w_dist")
    val bi = freqStats(ngrams(col("__toks"), 2), "b_max", "b_tot", "b_dist")
    val tri = freqStats(ngrams(col("__toks"), 3), "t_max", "t_tot", "t_dist")
    docs.select(col(idCol).as("doc"))
      .join(words, Seq("doc"), "left")
      .join(bi, Seq("doc"), "left")
      .join(tri, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        ratio(col("w_max"), col("w_tot")).as("max_word_frac"),
        ratio(col("b_max"), col("b_tot")).as("top_bigram_frac"),
        ratio(col("t_tot") - col("t_dist"), col("t_tot")).as("dup_trigram_frac"))
  }

  /** CCNet-style language-model quality signal (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score each document by the mean negative log-probability of
    * its tokens under an add-one-smoothed UNIGRAM model trained on the
    * corpus itself — the deterministic, SQL-replayable stand-in for
    * CCNet's wiki-trained KenLM perplexity filter. Low `lm_nll` ≈
    * common/fluent vocabulary; high ≈ rare-token gibberish — threshold
    * it (or bucket into CCNet's head/middle/tail tertiles) to filter.
    *
    * Plan: one term-count aggregate (map-side partial), one token→count
    * equality join on the term, corpus totals attached as a ONE-ROW
    * broadcast crossJoin (the documented scalar-attach shape). Each
    * token's NLL is quantized to an integer count of MICRO-NATS before
    * the per-doc mean: the per-doc sum is then an exact 64-bit integer
    * (order-free — a float mean would flip its 6th decimal whenever
    * summation order lands it on a rounding boundary, and Spark vs
    * DuckDB order always differs), and the mean is one identical double
    * division on both engines. Token-less documents report
    * `n_tokens = 0` with a NULL score.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("__cnt"))
    val tot = counts.agg(sum("__cnt").as("__n"), count(lit(1)).as("__v"))
    val scored = toks.join(counts, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("__nllu",
        round(-log((col("__cnt") + lit(1.0)) / (col("__n") + col("__v")))
          * lit(1000000.0)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("__nllu").as("__s"))
      .withColumn("lm_nll",
        round(col("__s") / (col("n_tokens") * lit(1000000.0)), 6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("lm_nll"))
  }

  /** Bigram extension of [[lmScore]]: mean negative log-probability of
    * each token given its predecessor under an add-one-smoothed BIGRAM
    * model trained on the corpus itself — P(w|p) = (c(p,w)+1)/(c(p)+V).
    * One step closer to CCNet's KenLM n-gram perplexity than the unigram
    * proxy: degenerate repetition (high-frequency tokens in unusual
    * ORDER) scores high here while passing the unigram filter.
    *
    * Plan shape: bigrams come from the token ARRAY via [[ngrams]] (no
    * positional self-join), one pair-count aggregate, one equality join
    * on the pair, one on the predecessor term, vocabulary size attached
    * as a one-row broadcast. The same integer micro-nat quantization as
    * [[lmScore]] keeps the per-doc sum exact and order-free on both
    * engines. Documents with < 2 tokens report `n_bigrams = 0` and a
    * NULL score.
    */
  def lm2Score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // persisted barrier: the token relation feeds BOTH the pair explode
    // and the unigram count (the repetitionSignals precedent — without
    // it each consumer re-tokenizes from raw text, and the ngrams
    // lambda would re-evaluate an inlined tokenize per element)
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .persistTracked()
    val pairs = withToks
      .select(col(idCol), explode(ngrams(col("__toks"), 2)).as("pair"))
      .withColumn("__prev", split(col("pair"), " ").getItem(0))
    val cb = pairs.groupBy("pair").agg(count(lit(1)).as("__cb"))
    val cu = withToks.select(explode(col("__toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__cu"))
    val v = cu.agg(count(lit(1)).as("__v"))
    val scored = pairs
      .join(cb, Seq("pair"))
      .join(cu, pairs("__prev") === cu("term"))
      .crossJoin(broadcast(v))
      .withColumn("__nllu",
        round(-log((col("__cb") + lit(1.0)) / (col("__cu") + col("__v")))
          * lit(1000000.0)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"), sum("__nllu").as("__s"))
      .withColumn("lm2_nll",
        round(col("__s") / (col("n_bigrams") * lit(1000000.0)), 6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm2_nll"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 §3 — the smoothing inside KenLM, whose perplexity IS
    * CCNet's quality signal; [[lm2Score]]'s add-one is the textbook
    * proxy, this is the production formula):
    *
    *   P(w|v) = max(c(vw) − D, 0)/c(v) + D·N1+(v·)/c(v) · Pcont(w),
    *   Pcont(w) = N1+(·w) / N1+(··),  D = 0.75 (the standard discount)
    *
    * — the continuation probability ranks words by how many CONTEXTS
    * they follow, not raw frequency, so "Francisco" (frequent but only
    * after "San") stops inflating unseen-context estimates, the failure
    * mode add-one smoothing cannot see.
    *
    * Every statistic derives from the ONE bigram-type relation: c(v) and
    * N1+(v·) by prev-aggregation, N1+(·w) by word-aggregation, N1+(··)
    * as a one-row broadcast — same plan family as [[lm2Score]] (no
    * positional self-join, token array materialized once). Self-scoring
    * the corpus keeps every term positive; for held-out use, unseen
    * pairs back off to the continuation term and unseen words floor at
    * 1/(2·N1+(··)). Micro-nat integer quantization per position keeps
    * the per-doc sum exact and order-free on both engines. Documents
    * with < 2 tokens report `n_bigrams = 0` and a NULL score.
    */
  def knBigramScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .persistTracked()
    val pairs = withToks
      .select(col(idCol), explode(ngrams(col("__toks"), 2)).as("pair"))
      .withColumn("__prev", split(col("pair"), " ").getItem(0))
      .withColumn("__w", split(col("pair"), " ").getItem(1))
    val cb = pairs.groupBy("pair").agg(count(lit(1)).as("__cb")).persistTracked()
    val ctx = cb
      .withColumn("__p", split(col("pair"), " ").getItem(0))
      .groupBy(col("__p"))
      .agg(sum("__cb").as("__cv"), count(lit(1)).as("__n1f"))
    val cont = cb
      .withColumn("__ww", split(col("pair"), " ").getItem(1))
      .groupBy(col("__ww"))
      .agg(count(lit(1)).as("__n1b"))
    val nTypes = cb.agg(count(lit(1)).as("__nt"))
    val d = lit(discount)
    val scored = pairs
      .join(cb, Seq("pair"), "left")
      .join(ctx, pairs("__prev") === ctx("__p"), "left")
      .join(cont, pairs("__w") === cont("__ww"), "left")
      .crossJoin(broadcast(nTypes))
      .withColumn("__pcont",
        coalesce(col("__n1b"), lit(0L)) / col("__nt"))
      .withColumn("__prob",
        when(coalesce(col("__cv"), lit(0L)) > 0,
          greatest(coalesce(col("__cb"), lit(0L)) - d, lit(0.0)) / col("__cv") +
            d * col("__n1f") / col("__cv") * col("__pcont"))
          .otherwise(col("__pcont")))
      .withColumn("__prob2",
        when(col("__prob") > 0, col("__prob"))
          .otherwise(lit(0.5) / col("__nt")))
      .withColumn("__nllu",
        round(-log(col("__prob2")) * lit(1000000.0)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"), sum("__nllu").as("__s"))
      .withColumn("kn_nll",
        round(col("__s") / (col("n_bigrams") * lit(1000000.0)), 6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_nll"))
  }

  /** Interpolated Kneser–Ney TRIGRAM scoring — [[knBigramScore]] lifted
    * to the SRILM/KenLM default order-3 recursion (Chen & Goodman 1999
    * §3, eq. 18): the highest order discounts raw trigram counts; the
    * MIDDLE order runs entirely on continuation counts derived from the
    * trigram-TYPE relation (N1+(·vw) over N1+(·v·), with N1+(v·)
    * counting distinct continuations); the lowest order is
    * [[knBigramScore]]'s Pcont(w) from the bigram-type relation:
    *
    *   P3(w|uv)  = max(c(uvw)−D,0)/c(uv·) + D·N1+(uv·)/c(uv·) · P2(w|v)
    *   P2(w|v)   = max(N1+(·vw)−D,0)/N1+(·v·)
    *               + D·N1+(v·)/N1+(·v·) · Pcont(w)
    *   Pcont(w)  = N1+(·w) / N1+(··)
    *
    * Plan shape: the ONE persisted token relation feeds the trigram and
    * bigram explodes; every statistic is a keyed aggregate over the
    * trigram-type frame (counts, then (u,v)-, (v,w)- and v-rollups) or
    * the bigram-type frame — no positional self-join anywhere, N1+(··)
    * a one-row broadcast. Self-scoring the corpus keeps c(uvw) ≥ 1 so
    * the top level is always defined. The probability expression
    * mirrors the oracle's nesting token for token, so the micro-nat
    * quantization rounds identically on both engines. Documents with
    * < 3 tokens report `n_trigrams = 0` and a NULL score.
    */
  def knTrigramScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val withToks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .persistTracked()
    val tris = withToks
      .select(col(idCol), explode(ngrams(col("__toks"), 3)).as("tri"))
    // all statistics live on the trigram-TYPE relation; on Zipf corpora
    // types ≪ instances, so the stats join chain runs on the SMALL
    // frame and the instance relation shuffles exactly once (on tri)
    // to pick up its precomputed per-type micro-nat cost
    val typed = tris.groupBy("tri").agg(count(lit(1)).as("__ct"))
      .select(col("tri"),
        split(col("tri"), " ").getItem(0).as("__tu"),
        split(col("tri"), " ").getItem(1).as("__tv"),
        split(col("tri"), " ").getItem(2).as("__tw"),
        col("__ct"))
      .persistTracked()
    val hist = typed.groupBy(col("__tu").as("__hu"), col("__tv").as("__hv"))
      .agg(sum("__ct").as("__cuv"), count(lit(1)).as("__n3f"))
    val midTypes = typed
      .groupBy(col("__tv").as("__mv"), col("__tw").as("__mw"))
      .agg(count(lit(1)).as("__n1vw")).persistTracked()
    val midV = midTypes.groupBy(col("__mv").as("__vv"))
      .agg(sum("__n1vw").as("__n1mid"), count(lit(1)).as("__nfv"))
    val cbt = withToks.select(explode(ngrams(col("__toks"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("__cb"))
    val contW = cbt.select(split(col("pair"), " ").getItem(1).as("__bw"))
      .groupBy("__bw").agg(count(lit(1)).as("__n1b"))
    val nTypes = cbt.agg(count(lit(1)).as("__nt"))
    val d = lit(discount)
    val pcont = col("__n1b") / col("__nt")
    val pmid = greatest(col("__n1vw") - d, lit(0.0)) / col("__n1mid") +
      d * col("__nfv") / col("__n1mid") * pcont
    val prob = greatest(col("__ct") - d, lit(0.0)) / col("__cuv") +
      d * col("__n3f") / col("__cuv") * pmid
    val typeScore = typed
      .join(hist, typed("__tu") === col("__hu") && typed("__tv") === col("__hv"))
      .join(midTypes, typed("__tv") === col("__mv") && typed("__tw") === col("__mw"))
      .join(midV, typed("__tv") === col("__vv"))
      .join(contW, typed("__tw") === col("__bw"))
      .crossJoin(broadcast(nTypes))
      .select(col("tri"),
        round(-log(prob) * lit(1000000.0)).cast("long").as("__nllu"))
    val scored = tris
      .join(typeScore, Seq("tri"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_trigrams"), sum("__nllu").as("__s"))
      .withColumn("kn3_nll",
        round(col("__s") / (col("n_trigrams") * lit(1000000.0)), 6))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("kn3_nll"))
  }

  /** CCNet's head/middle/tail split over the [[lmScore]] signal (Wenzek
    * et al. 2020 §4.3: perplexity TERTILES, with "head" = most fluent):
    * documents are bucketed by where their `lm_nll` falls against the
    * corpus 1/3 and 2/3 cutoffs. Token-less documents (NULL score) get a
    * NULL bucket.
    *
    * Deliberately NOT `ntile(3)` — a global ntile is one total sort into
    * a single window partition (the anti-pattern that dies first at
    * scale). Instead the two cutoffs are computed by one exact
    * `percentile` aggregate (partial per partition) and attached as a
    * one-row broadcast; bucketing is then a per-row comparison.
    * Boundary docs tie INTO the lower bucket (`<=`), matching the SQL
    * mirror exactly; exact percentile (not approx) is the documented
    * oracle-parity choice, as in q15.
    */
  def lmBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = lmScore(docs, idCol, textCol)
    val cuts = scored.filter(col("lm_nll").isNotNull)
      .agg(round(percentile(col("lm_nll"), lit(1.0 / 3)), 6).as("__c1"),
        round(percentile(col("lm_nll"), lit(2.0 / 3)), 6).as("__c2"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("n_tokens"), col("lm_nll"),
        when(col("lm_nll").isNull, lit(null).cast("string"))
          .when(col("lm_nll") <= col("__c1"), lit("head"))
          .when(col("lm_nll") <= col("__c2"), lit("middle"))
          .otherwise(lit("tail")).as("lm_bucket"))
  }

  /** The Gopher quality-rule stop set (Rae et al. 2021, appendix A:
    * "contains at least two of the following English words").
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", appendix
    * A — the most-cited doc-level heuristic filter set for web-scale
    * training corpora). Per document:
    *
    *   - `n_words`, `mean_word_len`: 50 ≤ words ≤ 100 000 and mean word
    *     length in [3, 10];
    *   - `symbol_word_ratio`: ('#' chars + '...' occurrences) / words,
    *     must be ≤ 0.1;
    *   - `bullet_line_frac` / `ellipsis_line_frac`: fraction of lines
    *     starting with a bullet ('•' or '-') ≤ 0.9, fraction ending in an
    *     ellipsis ('...' or '…') ≤ 0.3;
    *   - `alpha_word_frac`: fraction of words with ≥1 alphabetic char,
    *     must be ≥ 0.8;
    *   - `n_stop_distinct`: distinct [[GopherStops]] present, must be ≥ 2.
    *
    * `keep` is the conjunction. One codegen'd projection — no shuffle,
    * no UDF; every ratio goes through [[TextOps.ratio]] (6-dp rounding)
    * BEFORE thresholding so both engines compare identical values.
    * Token-less documents fail the word-count rule (keep = false) with
    * all ratios 0.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val sigs = gopherSignalExprs(col(textCol), col("__g_toks"), col("__g_lines"))
    docs
      // materialize the token/line arrays ONCE per row: the signal
      // expressions reference them 4×/2×, and HigherOrderFunction
      // inputs get no codegen CSE — inlining the tokenizer into every
      // reference re-splits the text per signal (the ngrams caller
      // contract; CollapseProject keeps multiply-referenced non-cheap
      // aliases un-inlined, so this stays one codegen stage)
      .withColumn("__g_toks", tokens(col(textCol)))
      .withColumn("__g_lines", split(col(textCol), "\n"))
      .select((col(idCol) +: carry.map(col)) ++
        sigs.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", gopherKeepFrom(col))
  }

  /** The seven Gopher signal expressions over PRE-MATERIALIZED token and
    * line array columns — the single source both [[gopherRules]] and the
    * fused gate stack ([[filterFunnel]], [[Dedup.cleanCorpusFrontEnd]])
    * derive from, so the standalone and fused verdicts cannot drift.
    */
  private[pipeline] def gopherSignalExprs(t: Column, toks: Column,
      lines: Column): Seq[(String, Column)] = {
    val nWords = size(toks).cast("long")
    val meanLen = ratio(
      aggregate(transform(toks, x => length(x).cast("long")), lit(0L), (a, x) => a + x),
      nWords)
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEllipsis = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = ratio((nHash + nEllipsis).cast("long"), nWords)
    val nLines = size(lines).cast("long")
    val bulletFrac = ratio(
      size(filter(lines, l => substring(ltrim(l), 1, 1).isin("•", "-"))).cast("long"),
      nLines)
    val ellipsisFrac = ratio(
      size(filter(lines, l =>
        endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…")))).cast("long"),
      nLines)
    val alphaFrac = ratio(
      size(filter(toks, w => w.rlike("[a-z]"))).cast("long"), nWords)
    val nStop = size(filter(array(GopherStops.map(lit): _*),
      w => array_contains(toks, w))).cast("long")
    Seq("n_words" -> nWords, "mean_word_len" -> meanLen,
      "symbol_word_ratio" -> symbolRatio, "bullet_line_frac" -> bulletFrac,
      "ellipsis_line_frac" -> ellipsisFrac, "alpha_word_frac" -> alphaFrac,
      "n_stop_distinct" -> nStop)
  }

  /** The Gopher keep conjunction over a signal-name → Column resolver —
    * [[gopherRules]] passes `col` (named output columns), the fused
    * stack passes the raw signal expressions.
    */
  private[pipeline] def gopherKeepFrom(sig: String => Column): Column =
    sig("n_words") >= 50 && sig("n_words") <= 100000 &&
      sig("mean_word_len") >= 3.0 && sig("mean_word_len") <= 10.0 &&
      sig("symbol_word_ratio") <= 0.1 &&
      sig("bullet_line_frac") <= 0.9 &&
      sig("ellipsis_line_frac") <= 0.3 &&
      sig("alpha_word_frac") >= 0.8 &&
      sig("n_stop_distinct") >= 2

  /** The whole Gopher verdict as one boolean over pre-materialized
    * token/line arrays (for the fused single-pass gate stack).
    */
  private[pipeline] def gopherKeepExpr(t: Column, toks: Column,
      lines: Column): Column = {
    val m = gopherSignalExprs(t, toks, lines).toMap
    gopherKeepFrom(m)
  }

  /** C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer" §2.2 —
    * the line-level heuristics behind the C4 corpus). Line level: keep
    * only lines that end in terminal punctuation (`.` `!` `?` `"`), have
    * ≥ 3 words, and do not mention "javascript" (case-insensitive). Page
    * level: drop documents whose CLEANED text has < 5 sentences
    * (counted as `[.!?]` characters) or whose ORIGINAL text contains
    * "lorem ipsum" (case-insensitive) or a `{`.
    *
    * Output: `(id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    * keep, text_clean)` — `text_clean` is the kept lines joined by
    * newline in original order. One codegen'd projection, no shuffle.
    * (C4's remaining rule — cross-document three-sentence span dedup —
    * is [[Dedup.removeDuplicateSpans]] / p23.)
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    // materialize lines → kept lines → joined clean text stepwise: each
    // is referenced more than once downstream, and inlined copies would
    // re-run the whole filter chain per reference (CollapseProject
    // preserves the steps; still one codegen stage, zero shuffles)
    docs
      .withColumn("__c4_lines", split(t, "\n"))
      .withColumn("__c4_kept", filter(col("__c4_lines"), c4LineKeep(_)))
      .withColumn("__c4_clean", array_join(col("__c4_kept"), "\n"))
      .select(col(idCol) +: carry.map(col) :+
        size(col("__c4_lines")).cast("long").as("n_lines") :+
        size(col("__c4_kept")).cast("long").as("n_kept") :+
        (length(col("__c4_clean")) -
          length(regexp_replace(col("__c4_clean"), "[.!?]", ""))).cast("long")
          .as("n_sentences") :+
        lower(t).contains("lorem ipsum").as("has_lorem") :+
        t.contains("{").as("has_brace") :+
        col("__c4_clean").as("text_clean"): _*)
      .withColumn("keep",
        col("n_sentences") >= 5 && !col("has_lorem") && !col("has_brace"))
  }

  /** C4's line-keep predicate (shared by [[c4Clean]] and the fused gate
    * stack): terminal punctuation, ≥ 3 words, no "javascript".
    */
  private[pipeline] def c4LineKeep(l: Column): Column =
    substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
      size(filter(split(trim(l), "\\s+"), x => x =!= "")) >= 3 &&
      !lower(l).contains("javascript")

  /** The C4 page verdict over the text and a PRE-MATERIALIZED clean-text
    * column (`array_join(filter(lines, c4LineKeep), "\n")`) — the fused
    * gate stack materializes that once and passes it here.
    */
  private[pipeline] def c4KeepExpr(t: Column, textClean: Column): Column =
    (length(textClean) -
      length(regexp_replace(textClean, "[.!?]", ""))).cast("long") >= 5 &&
      !lower(t).contains("lorem ipsum") && !t.contains("{")

  /** The strict word-list verdict over a pre-materialized token array
    * (shared with [[wordlistFilter]]'s `keep_strict`).
    */
  private[pipeline] def wordlistKeepStrictExpr(toks: Column,
      blocklist: Seq[String]): Column = {
    val listed = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    size(filter(toks, t => array_contains(listed, t))) === 0
  }

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrub: count and redact emails, IPv4 addresses and
    * NNN-NNN-NNNN phone numbers. The three patterns use only regex
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (DuckDB): character classes, bounded repetition, `\b`. Email is
    * redacted FIRST so its domain can never be half-eaten by the IP
    * pass, and each count is taken on the text as it stood ENTERING
    * that stage — so `n_X` always equals the number of `[X]` tokens in
    * `text_redacted` (an overlapping match like `1.2.3.4@example.com`
    * counts once, as the email that consumed it). Pure codegen'd
    * regexp expressions — one projection, no shuffle at all.
    */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    // the stage texts are materialized columns (r13 optimization): each
    // was referenced twice (count + next stage), and without a named
    // alias the whole upstream regex chain re-ran per reference
    docs
      .withColumn("__pii_ae", regexp_replace(t, EmailRe, "[EMAIL]"))
      .withColumn("__pii_ai", regexp_replace(col("__pii_ae"), Ipv4Re, "[IP]"))
      .select(col(idCol) +: carry.map(col) :+
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails") :+
        size(regexp_extract_all(col("__pii_ae"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips") :+
        size(regexp_extract_all(col("__pii_ai"), lit(PhoneRe), lit(0))).cast("long").as("n_phones") :+
        regexp_replace(col("__pii_ai"), PhoneRe, "[PHONE]").as("text_redacted"): _*)
  }

  /** Payment-card candidate: 13–19 digits with optional single
    * space/hyphen group separators, word-bounded. Only constructs with
    * identical Java-regex / RE2 semantics (`\b`, non-capturing groups,
    * bounded repetition), so the DuckDB oracle replays it verbatim.
    */
  val CardCandidateRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Luhn (ISO/IEC 7812-1 mod-10) term for position `i` (1-based from
    * the LEFT) of digit string `s` with length `n`: digits an odd
    * distance from position `n` are doubled with the classic >9 → −9
    * fold. Pure column algebra so the whole check stays inside
    * whole-stage codegen — no UDF.
    */
  private def luhnTerm(s: Column, n: Column, i: Column): Column = {
    val d = s.substr(i, lit(1)).cast("int")
    when((n - i) % 2 === 1,
      when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
  }

  /** Luhn validity of a separator-free digit string: card length
    * (13–19) and mod-10 checksum over [[luhnTerm]] via
    * `sequence(1, length)` + `aggregate`.
    */
  private def luhnValid(s: Column): Column =
    length(s).between(13, 19) &&
      aggregate(sequence(lit(1), length(s)), lit(0),
        (acc, i) => acc + luhnTerm(s, length(s), i)) % 10 === 0

  /** Card-number PII scrub (the piiScrub sibling for the pattern class
    * where the REGEX alone over-matches and a checksum must arbitrate):
    * candidates are [[CardCandidateRe]] runs; a candidate is a card
    * only if its separator-stripped digits pass Luhn. Emits candidate /
    * valid counts, the C4-style `keep` gate (no valid card present),
    * and the text with each valid candidate literal-replaced by
    * `[CARD]` — invalid candidates (order numbers, timestamps) are
    * left untouched, which is exactly why the checksum pass exists.
    * One codegen'd projection, no shuffle.
    */
  def luhnCardScrub(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    // candidate and valid arrays materialized once (r13 optimization):
    // `validRaw` was referenced three times, re-running the candidate
    // regex AND the Luhn fold per reference. The Luhn walk runs on the
    // separator-stripped digits while the redaction replace targets the
    // raw spelling.
    docs
      .withColumn("__card_cands",
        regexp_extract_all(t, lit(CardCandidateRe), lit(0)))
      .withColumn("__card_valid", filter(col("__card_cands"),
        x => luhnValid(regexp_replace(x, "[ -]", ""))))
      .select(col(idCol) +: carry.map(col) :+
        size(col("__card_cands")).cast("long").as("n_candidates") :+
        size(col("__card_valid")).cast("long").as("n_valid") :+
        (size(col("__card_valid")) === 0).as("keep") :+
        aggregate(col("__card_valid"), t,
          (acc, x) => replace(acc, x, lit("[CARD]"))).as("text_redacted"): _*)
  }

  /** Filtering funnel report — the per-stage rejection table every
    * pipeline paper publishes (Dolma §4 / FineWeb's ablation tables /
    * RefinedWeb table 2 report exactly this: how many documents each
    * gate removes, in pipeline order): each document is attributed to
    * the FIRST gate that rejects it — Gopher rules, then the C4
    * sentence/lorem/brace page gate, then the strict word-list — or
    * to the survivor bucket. Output is the tiny (stage, n_docs)
    * frame.
    *
    * Plan shape (r13 optimization): ONE pass — the three verdicts are
    * the gates' own expression builders ([[gopherKeepExpr]],
    * [[c4KeepExpr]], [[wordlistKeepStrictExpr]] — identical booleans to
    * the standalone operators by construction) computed in a single
    * projection over one corpus scan, followed by the tiny stage
    * aggregate. The previous shape ran one text scan PER gate and
    * joined three (id, keep) frames back on the id — at corpus scale
    * that is two extra full text scans and three exchanges of the
    * whole id space for a relation this function immediately reduces
    * to four rows.
    */
  def filterFunnel(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], maxFraction: Double = 0.0): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("__ff_toks", tokens(t))
      .withColumn("__ff_lines", split(t, "\n"))
      .withColumn("__ff_clean",
        array_join(filter(col("__ff_lines"), c4LineKeep(_)), "\n"))
      .select(
        when(!gopherKeepExpr(t, col("__ff_toks"), col("__ff_lines")),
          lit("1_gopher"))
          .when(!c4KeepExpr(t, col("__ff_clean")), lit("2_c4"))
          .when(!wordlistKeepStrictExpr(col("__ff_toks"), blocklist),
            lit("3_wordlist"))
          .otherwise(lit("4_survivor")).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_docs"))
  }

  /** Character-level Shannon entropy per document — the gibberish /
    * key-mash / padding detector quality pipelines run beside the
    * word-level ratios (repetitive flooding like `aaaa…` crushes
    * entropy toward 0 while normal prose sits near 3–4 nats; the
    * signal needs no language model and no tokenizer, which is why
    * it's the first gate for binary-ish crawl junk). Per doc:
    * char count, distinct chars, entropy −Σ (k/n)·ln(k/n) in nats,
    * and the keep gate. Plan: a ZERO-shuffle projection — the per-doc
    * code-point histogram comes from one pass over the UTF-8 bytes
    * (`graft.functions.CharCounts`) and the entropy folds over its
    * ≤-alphabet-size map values with array HOFs, so no explode and no
    * aggregate ever touch the plan (the superseded first form exploded
    * every character into a (doc, char) hash aggregate — 840M rows and
    * two shuffles at the 2M-doc smoke). The per-char-type term is micro-nat
    * quantized before the exact integer sum (the p36 discipline), so
    * both engines round identically. Documents with empty text have
    * no char rows and drop from the output (mirrored by the oracle).
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String,
      minEntropy: Double = 2.5): DataFrame = {
    // the per-doc histogram comes from ONE pass over the bytes
    // (graft.functions.CharCounts) and the entropy folds over its
    // ≤-alphabet-size values as order-free integer micro-nats — zero
    // shuffle, zero explode (the first form exploded every character
    // into a (doc, char) aggregate: 840M rows and two shuffles at the
    // 2M-doc smoke, all constant the histogram deletes). Map iteration
    // order is unspecified; the integer sum makes that irrelevant.
    val p = (k: Column) => k * lit(1.0) / col("__n")
    docs
      .select(col(idCol),
        map_values(graft.functions.CharCounts(col(textCol))).as("__ks"))
      .withColumn("__n", aggregate(col("__ks"), lit(0L), (acc, k) => acc + k))
      .filter(col("__n") > 0) // empty text: no char rows in either form
      .withColumn("__su", aggregate(col("__ks"), lit(0L), (acc, k) =>
        acc + round(negate(p(k)) * log(p(k)) * lit(1000000.0)).cast("long")))
      .select(col(idCol), col("__n").as("n_chars"),
        size(col("__ks")).cast("long").as("n_distinct_chars"),
        round(col("__su") / lit(1000000.0), 6).as("char_entropy"))
      .withColumn("keep", col("char_entropy") >= minEntropy)
  }

  /** FineWeb-style line-level corrections (Penedo '24 §3's line
    * filters, the step between C4's sentence rule and whole-doc
    * gates: web pages keep their prose but lose the furniture): drop
    *
    *   - `numeric`: lines of digits/punctuation only (pagination,
    *     timestamps, vote tallies) — `^\s*[\d.,:%/-]+\s*$`;
    *   - `counter`: social-counter lines — a number followed by
    *     likes/comments/shares/views/points;
    *   - `caps`: short ALL-CAPS lines (≤ maxCapsTokens tokens, has an
    *     uppercase letter, no lowercase) — nav menus and section
    *     chrome.
    *
    * Numeric is disjoint from the other two (it admits no letters),
    * but counter and caps CAN both match one line (an uppercase
    * counter like `3 LIKES` is a ≤4-token all-caps line too), so
    * `n_numeric + n_counter + n_caps` may exceed the dropped-line
    * total; the oracle mirrors the same per-rule counting, so the
    * engines agree. One codegen'd projection — the
    * line split and every rule run as array HOFs, no explode, no
    * shuffle; `text_clean` reassembles the survivors in order.
    */
  def lineCorrections(docs: DataFrame, idCol: String, textCol: String,
      maxCapsTokens: Int = 4, carry: Seq[String] = Nil): DataFrame = {
    val NumericRe = "^[\\d.,:%/\\s-]*\\d[\\d.,:%/\\s-]*$"
    val CounterRe = "^\\s*\\d+\\s+(likes?|comments?|shares?|views?|points?)\\s*$"
    def numeric(l: Column) = l.rlike(NumericRe)
    def counter(l: Column) = lower(l).rlike(CounterRe)
    def caps(l: Column) =
      l.rlike("[A-Z]") && !l.rlike("[a-z]") &&
        size(filter(split(trim(l), "\\s+"), t => length(t) > 0)) <= maxCapsTokens
    def dropped(l: Column) = numeric(l) || counter(l) || caps(l)
    // materialize the line array ONCE (r13 optimization): five output
    // expressions reference it, HOF inputs get no CSE, and the split
    // otherwise re-runs per reference (the gopherRules discipline)
    val ls = col("__lc_lines")
    docs
      .withColumn("__lc_lines", split(col(textCol), "\n"))
      .select(col(idCol) +: carry.map(col) :+
        size(ls).cast("long").as("n_lines") :+
        size(filter(ls, numeric(_))).cast("long").as("n_numeric") :+
        size(filter(ls, counter(_))).cast("long").as("n_counter") :+
        size(filter(ls, caps(_))).cast("long").as("n_caps") :+
        array_join(filter(ls, l => !dropped(l)), "\n").as("text_clean"): _*)
  }

  /** Flesch–Kincaid readability (Kincaid et al. 1975 — the surface
    * signal edu-quality filters like FineWeb-Edu's annotator rubric
    * correlate with, and the oldest public text-difficulty formula):
    * per doc, word / sentence / syllable counts, the FK grade level
    * `0.39·(W/S) + 11.8·(Y/W) − 15.59` and the Flesch reading-ease
    * `206.835 − 1.015·(W/S) − 84.6·(Y/W)`, plus a `keep` gate at the
    * high-school grade cutoff. Syllables use the standard vowel-group
    * heuristic (maximal `[aeiouy]+` runs, minus one for a silent
    * consonant+`e` ending when more than one group, floor 1) — an
    * approximation by construction, stated not hidden; the VALUE here
    * is a deterministic, language-model-free difficulty axis, not
    * dictionary-exact syllabification. One codegen'd projection — the
    * token array materialized FIRST (the documented HOF-lambda
    * contract), counts as array folds, no explode, no shuffle.
    */
  def readability(docs: DataFrame, idCol: String, textCol: String,
      maxGrade: Double = 12.0): DataFrame = {
    def groups(w: Column) =
      size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
    val withToks = docs.select(col(idCol), col(textCol).as("__t"),
      tokens(col(textCol)).as("__toks"))
    withToks.select(col(idCol),
      size(col("__toks")).cast("long").as("n_words"),
      greatest(lit(1L), (length(col("__t")) -
        length(regexp_replace(col("__t"), "[.!?]", ""))).cast("long"))
        .as("n_sentences"),
      aggregate(col("__toks"), lit(0L), (acc, w) =>
        acc + greatest(lit(1),
          groups(w) - when(w.rlike("[^aeiouy]e$") && groups(w) > 1, 1)
            .otherwise(0)).cast("long")).as("n_syllables"))
      // zero-word docs: the Y/W term would be 0.0/0 = NaN in Spark but
      // NULL in a SQL mirror (list_sum of an empty list is NULL in
      // DuckDB) — emit NULL grades on BOTH engines (nullif in the SQL)
      // so library callers and oracles agree on empty-token docs
      .withColumn("fk_grade", when(col("n_words") === 0, lit(null))
        .otherwise(
          round(lit(0.39) * (col("n_words") * lit(1.0) / col("n_sentences")) +
            lit(11.8) * (col("n_syllables") * lit(1.0) / col("n_words")) -
            lit(15.59), 6)))
      .withColumn("flesch_ease", when(col("n_words") === 0, lit(null))
        .otherwise(
          round(lit(206.835) -
            lit(1.015) * (col("n_words") * lit(1.0) / col("n_sentences")) -
            lit(84.6) * (col("n_syllables") * lit(1.0) / col("n_words")), 6)))
      .withColumn("keep", col("fk_grade") <= maxGrade)
  }

  /** Per-source token-distribution divergence — the domain-mix monitor
    * behind DoReMi-style reweighting and data-mixture ablations (Xie
    * '23; the first diagnostic when a source behaves oddly in training
    * is "how far is its token distribution from the corpus"): for each
    * source, KL(P_source ‖ P_corpus) = Σ_t p_s(t)·ln(p_s(t)/p(t)) in
    * nats, plus its token and term counts. Support(P_s) ⊆ support(P)
    * by construction (the corpus term counts are the source counts
    * summed), so no smoothing is needed and every term is finite.
    * Plan: ONE token explode into a (source, term) hash aggregate;
    * the term marginal and source totals are rollups OF that frame
    * (the corpus is never re-scanned); grand total a one-row
    * broadcast. Per-(source, term) micro-nat quantization before the
    * exact integer sum — the p36 discipline, so both engines round
    * identically. Note micro-nat rounding of near-zero terms makes
    * the SUM exactly reproducible, not exactly KL; at 6 dp the
    * distinction is below the emitted precision.
    */
  def domainKl(docs: DataFrame, srcCol: String, textCol: String)
      : DataFrame = {
    val toks = docs.select(col(srcCol).as("source"),
      explode(tokens(col(textCol))).as("term"))
    val st = toks.groupBy("source", "term")
      .agg(count(lit(1)).as("__kst")).persistTracked()
    val t = st.groupBy("term").agg(sum("__kst").as("__kt"))
    val ns = st.groupBy("source")
      .agg(sum("__kst").as("__ns"), count(lit(1)).as("n_terms"))
    val tot = t.agg(sum("__kt").as("__n"))
    val ps = col("__kst") * lit(1.0) / col("__ns")
    val pc = col("__kt") * lit(1.0) / col("__n")
    val klu = st
      .join(t, Seq("term"))
      .join(ns.select(col("source"), col("__ns")), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("__klu",
        round(ps * log(ps / pc) * lit(1000000.0)).cast("long"))
      .groupBy("source").agg(sum("__klu").as("__su"))
    ns.join(klu, Seq("source"))
      .select(col("source"), col("__ns").as("n_tokens"), col("n_terms"),
        round(col("__su") / lit(1000000.0), 6).as("kl_nats"))
  }

  /** Cross-snapshot vocabulary drift — the distributional twin of the
    * doc-level snapshot diff (p59) and the first scraper-regression /
    * content-shift alarm a recurring crawl runs: per term, the
    * relative-frequency log-ratio between snapshot A and snapshot B,
    * with `new` / `vanished` statuses for terms on one side only and
    * a `drifted` flag past the log-ratio threshold. Output is VOCAB
    * sized (further cut by `minCount` on the combined count — rare
    * terms produce noise ratios). Plan: one token-count aggregate per
    * snapshot, a full-outer equality join on the term, totals as a
    * one-row broadcast — the shuffle moves (term, count) pairs, never
    * text.
    */
  def vocabDrift(oldDocs: DataFrame, newDocs: DataFrame, textCol: String,
      minCount: Long = 5, driftLogRatio: Double = 0.69): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.select(explode(tokens(col(textCol))).as("term"))
        .groupBy("term").agg(count(lit(1)).as(out))
    val a = counts(oldDocs, "__ka").persistTracked()
    val b = counts(newDocs, "__kb").persistTracked()
    val tot = a.agg(sum("__ka").as("__na"))
      .crossJoin(b.agg(sum("__kb").as("__nb")))
    val ratio = round(
      log((col("__kb") * lit(1.0) / col("__nb")) /
        (col("__ka") * lit(1.0) / col("__na"))), 6)
    a.join(b, Seq("term"), "full_outer")
      .filter(coalesce(col("__ka"), lit(0L)) + coalesce(col("__kb"), lit(0L))
        >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("term"),
        coalesce(col("__ka"), lit(0L)).as("k_old"),
        coalesce(col("__kb"), lit(0L)).as("k_new"),
        when(col("__ka").isNotNull && col("__kb").isNotNull, ratio)
          .as("log_ratio"))
      .withColumn("status",
        when(col("k_old") === 0, lit("new"))
          .when(col("k_new") === 0, lit("vanished"))
          .when(abs(col("log_ratio")) >= driftLogRatio, lit("drifted"))
          .otherwise(lit("stable")))
  }

  /** Vocabulary-growth (Heaps' law) curve — the corpus-health report
    * that catches both failure directions at a glance: vocabulary
    * flattening early means heavy duplication/templating, growing
    * near-linearly means OCR noise or encoding junk minting endless
    * new "terms" (healthy text sits on the Heaps V ∝ n^β, β ≈ 0.5
    * power law). Docs are cut into `buckets` equal id-ordered slices;
    * per slice the report emits cumulative docs, tokens, distinct
    * vocabulary, and the new-terms count of that slice. Plan: ONE
    * token explode; vocabulary attribution is `min(doc bucket)` per
    * term (its first-appearance slice) aggregated to a ≤`buckets`-row
    * frame; the cumulative sums are a window over those few rows —
    * never over the corpus. Id-range bounds arrive as a one-row
    * broadcast.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = docs.agg(min(col(idCol)).as("__lo"), max(col(idCol)).as("__hi"))
    // integer bucket arithmetic (no doubles): slice k covers ids with
    // (id - lo) * buckets / (hi - lo + 1) == k
    def bucketOf(id: Column) =
      // integer `div`, not `/`: Column./ is double division and the
      // long cast truncates while DuckDB's CAST rounds — div and //
      // agree exactly
      expr(s"CAST(((${id.toString} - __lo) * $buckets) div (__hi - __lo + 1) AS LONG)")
    val toks = docs.crossJoin(broadcast(bounds))
      .select(bucketOf(col(idCol)).as("__b"),
        explode(tokens(col(textCol))).as("term"))
    val firstSeen = toks.groupBy("term").agg(min("__b").as("__fb"))
      .groupBy(col("__fb").as("__b")).agg(count(lit(1)).as("new_terms"))
    val tokCounts = toks.groupBy("__b").agg(count(lit(1)).as("__nt"))
    val docCounts = docs.crossJoin(broadcast(bounds))
      .select(bucketOf(col(idCol)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__nd"))
    val w = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docCounts
      .join(tokCounts, Seq("__b"), "left")
      .join(firstSeen, Seq("__b"), "left")
      .select(col("__b").as("bucket"),
        sum("__nd").over(w).as("docs_cum"),
        sum(coalesce(col("__nt"), lit(0L))).over(w).as("tokens_cum"),
        sum(coalesce(col("new_terms"), lit(0L))).over(w).as("vocab_cum"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"))
  }

  /** IBAN candidate: 2 country letters + 2 check digits + 11–30
    * alphanumerics (total 15–34, the ISO 13616 length envelope),
    * word-bounded, uppercase as printed. Shared Java-regex / RE2
    * constructs only.
    */
  val IbanCandidateRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** ISO 13616 / ISO 7064 mod-97-10 validity: move the first 4 chars
    * to the end, map letters A–Z → 10–35, and the resulting digit
    * string must be ≡ 1 (mod 97). The big-integer mod folds left to
    * right ((acc·10^k + d) mod 97, k = digits contributed), so the
    * whole check is one `sequence` + `aggregate` HOF — no UDF, no
    * arbitrary-precision type.
    */
  private def ibanValid(s: Column): Column = {
    val r = concat(s.substr(lit(5), length(s) - 4), s.substr(lit(1), lit(4)))
    length(s).between(15, 34) &&
      aggregate(sequence(lit(1), length(r)), lit(0L), (acc, i) => {
        val c = r.substr(i, lit(1))
        val d = when(c.between("0", "9"), c.cast("long"))
          .otherwise((ascii(c) - 55).cast("long"))
        (acc * when(d >= 10, 100L).otherwise(10L) + d) % 97L
      }) === 1L
  }

  /** IBAN PII scrub — [[luhnCardScrub]]'s sibling for bank account
    * numbers (the second checksum-arbitrated PII class a web-scale
    * scrub handles): [[IbanCandidateRe]] candidates, mod-97-10
    * validation, valid spellings literal-replaced `[IBAN]`,
    * checksum-failing lookalikes left untouched. One codegen'd
    * projection, no shuffle.
    */
  def ibanScrub(docs: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    // same materialize-once discipline as [[luhnCardScrub]] (r13)
    docs
      .withColumn("__iban_cands",
        regexp_extract_all(t, lit(IbanCandidateRe), lit(0)))
      .withColumn("__iban_valid", filter(col("__iban_cands"), ibanValid(_)))
      .select(col(idCol) +: carry.map(col) :+
        size(col("__iban_cands")).cast("long").as("n_candidates") :+
        size(col("__iban_valid")).cast("long").as("n_valid") :+
        (size(col("__iban_valid")) === 0).as("keep") :+
        aggregate(col("__iban_valid"), t,
          (acc, x) => replace(acc, x, lit("[IBAN]"))).as("text_redacted"): _*)
  }

  /** Scheme-qualified URL host pattern, capture group 1 = the host.
    * Java-regex / RE2 identical constructs only.
    */
  val UrlHostRe = "https?://([A-Za-z0-9.-]+)"

  /** URL extraction + domain-blocklist filtering (the crawl-pipeline
    * source-quality gate): per document, the count of scheme-qualified
    * URLs, how many hit the blocklist (exact host match), and the
    * resulting keep flag. The blocklist is a plan literal — at real
    * scale it broadcasts; a suffix-match policy (subdomains) would
    * join on a reversed-host prefix instead. One codegen'd projection,
    * no shuffle.
    */
  def urlFilter(docs: DataFrame, idCol: String, textCol: String,
      blockedHosts: Seq[String]): DataFrame = {
    val hosts = regexp_extract_all(col(textCol), lit(UrlHostRe), lit(1))
    val blocked = array(blockedHosts.map(lit): _*)
    docs.select(col(idCol),
      size(hosts).cast("long").as("n_urls"),
      size(filter(hosts, h => array_contains(blocked, h))).cast("long")
        .as("n_blocked"))
      .withColumn("keep", col("n_blocked") === 0)
  }

  /** Blocklist (toxicity / NSFW word-list) gate — the C4 "bad words"
    * filter (Raffel et al. '20 §2.2 drop any page containing a listed
    * word; the Dolma/RefinedWeb variants soften it to a fraction
    * threshold, both emitted here so the caller picks the policy):
    * per doc, the listed-token count over [[TextOps.tokens]] (the
    * lowercased `\s+` split, so the list entries are matched
    * case-insensitively as WHOLE tokens — no substring
    * Scunthorpe-problem false hits), the fraction of tokens listed,
    * `keep_strict` (C4: zero hits) and `keep` (fraction ≤
    * maxFraction). The blocklist ships broadcast as an array literal —
    * real lists are O(100s) entries, a pure projection at any corpus
    * size; a million-entry list would move to a broadcast join on the
    * token instead.
    */
  def wordlistFilter(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], maxFraction: Double,
      carry: Seq[String] = Nil): DataFrame = {
    val listed = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol) +: carry.map(col) :+
        size(col("__toks")).cast("long").as("n_tokens") :+
        size(filter(col("__toks"), t => array_contains(listed, t)))
          .cast("long").as("n_listed"): _*)
      .withColumn("listed_frac",
        round(col("n_listed") / greatest(col("n_tokens"), lit(1L)), 6))
      .withColumn("keep_strict", col("n_listed") === 0)
      .withColumn("keep", col("listed_frac") <= maxFraction)
  }

  /** Per-document fraction of token positions covered by CORPUS-
    * duplicated k-grams — the "duplicated n-gram characters" family of
    * repetition filters (Gopher appendix A1 / RefinedWeb table 2),
    * at token resolution: a k-gram is duplicated when its hash occurs
    * more than once anywhere in the corpus (including twice in one
    * document), and a token position counts as covered when at least
    * one duplicated gram's `[start, start+k-1]` window contains it.
    * Distinguishes [[repetitionStats]] (WITHIN-document repetition)
    * from cross-document boilerplate that exact/minhash doc-level dedup
    * is too coarse to see and [[Dedup.removeDuplicateSpans]] would
    * rewrite — this is the measurement those removal decisions rank on.
    *
    * Scale shape: the [[Dedup.removeDuplicateSpans]] gram pass (hash per
    * token position, one groupBy on the 60-bit gram hash with map-side
    * partial counts) followed by an equality join back and ONE window
    * per document in position order — interval union via the classic
    * running-max-of-ends trick, so a position covered by overlapping
    * grams is counted once, with no per-position explode. Tokenization
    * is the raw `\s+` split of the span machinery (case-sensitive; NOT
    * [[TextOps.tokens]]' lowercased form) so the coverage agrees with
    * what span dedup would actually rewrite.
    *
    * Output: `(id, n_tokens, dup_starts, covered_tokens, covered_frac)`
    * — `covered_frac` NULL for token-less docs, 6-decimal rounded (the
    * oracle-parity float discipline).
    */
  def dupNgramCoverage(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"gram length k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{split => fsplit}
    val words = docs.select(col(idCol),
      filter(fsplit(col(textCol), "\\s+"), t => t =!= "").as("toks"))
    // persisted: the gram relation feeds BOTH the dup-count aggregate
    // and the join-back, whose exchange children differ (partial agg vs
    // plain scan) so ReuseExchange cannot dedupe them — without the
    // barrier the tokenize + posexplode + per-position md5 runs twice
    // over the corpus (the repetitionSignals precedent)
    val grams = words
      .filter(size(col("toks")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        p => hash60(array_join(slice(col("toks"), p + 1, lit(k)), " "))))
        .as(Seq("pos", "gh")))
      .persistTracked()
    val dupGrams = grams.groupBy("gh")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .select("gh")
    val starts = grams.join(dupGrams.hint("shuffle_hash"), Seq("gh"))
      .select(col(idCol), col("pos"))
    // interval union per doc: with starts in position order, a window's
    // NEW coverage is its end minus the running max of preceding ends
    // (clamped at its own start) — overlaps counted once, one Sort per
    // doc partition, no explode
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = starts
      .withColumn("__e", col("pos") + lit(k - 1))
      .withColumn("__pme", max(col("__e")).over(w))
      .withColumn("__new",
        greatest(lit(0),
          col("__e") - greatest(coalesce(col("__pme"), lit(-1)),
            col("pos") - 1)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_starts"),
        sum(col("__new")).cast("long").as("covered_tokens"))
    words
      .select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_starts"), lit(0L)).as("dup_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("covered_tokens"), lit(0L)) / col("n_tokens"), 6))
          .as("covered_frac"))
  }

  /** Unicode-script composition per document — the language-ID
    * prefilter real crawl pipelines run before n-gram langid (CLD/
    * fastText practice): a page claiming to be English whose chars are
    * 40% Cyrillic is mixed-script spam or mislabeled, and langid
    * models are unreliable on it. Counts are EXACT integers (no ratio
    * rounding to negotiate): non-whitespace chars and per-script char
    * counts via codegen'd regexp_replace length differences — Latin /
    * Cyrillic / Han / Arabic cover the high-volume scripts, digits are
    * script-Common and counted separately, everything else (punct,
    * other scripts) lands in `n_other`. `dominant_script` is 'other'
    * when the uncovered-script bucket strictly exceeds every named
    * script (a wholly-Greek/Hangul/Thai page must NOT be labeled
    * latin), with ties among the named scripts broken by the fixed
    * latin → cyrillic → han → arabic order, mirrored exactly by the
    * SQL CASE chain. Whitespace is the explicit [ \t\n\f\r] class —
    * spelled identically in both engines — because Java's \s includes
    * vertical tab \x0B while RE2's does not (a latent n_nonspace
    * mismatch on corpora containing one). One projection — no
    * shuffle, no UDF.
    */
  def scriptProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(re: String): Column =
      (length(t) - length(regexp_replace(t, re, ""))).cast("long")
    val ws = cnt("[ \\t\\n\\f\\r]")
    val latin = cnt("\\p{IsLatin}")
    val cyr = cnt("\\p{IsCyrillic}")
    val han = cnt("\\p{IsHan}")
    val arabic = cnt("\\p{IsArabic}")
    val digit = cnt("[0-9]")
    val other = length(t) - ws - latin - cyr - han - arabic - digit
    docs.select(col(idCol),
      (length(t) - ws).as("n_nonspace"),
      latin.as("n_latin"), cyr.as("n_cyrillic"), han.as("n_han"),
      arabic.as("n_arabic"), digit.as("n_digit"),
      other.as("n_other"),
      when(other > greatest(latin, cyr, han, arabic), lit("other"))
        .when(latin >= greatest(cyr, han, arabic), lit("latin"))
        .when(cyr >= greatest(han, arabic), lit("cyrillic"))
        .when(han >= arabic, lit("han"))
        .otherwise(lit("arabic")).as("dominant_script"))
  }

  /** Token-budget data selection: keep the most-fluent documents (by the
    * [[lmScore]] signal, lower NLL = better) until `budgetFrac` of the
    * corpus's tokens are spent — the "select the best X% of tokens"
    * step every budget-constrained pretraining run performs.
    *
    * Deliberately NOT a global sort + running sum (one total order into
    * a single window partition — the ntile anti-pattern lmBuckets also
    * avoids). Instead the selection threshold is found on a BUCKET
    * histogram: per-doc mean NLL is quantized to integer micro-nats
    * (`q_micro`, exact and order-free on both engines) and floored into
    * `bucketMicro`-wide buckets; the bucket frame (≤ nll-range /
    * bucketMicro rows by construction — the DSIR bounded-frame
    * argument) carries a running token sum that locates the waterline
    * bucket. Buckets wholly under budget are kept outright; the ONE
    * boundary bucket spends its remainder doc-by-doc (ranked q_micro
    * then id, running sum ≤ remainder); everything past it is dropped.
    * The per-bucket window is partitioned by bucket — parallelism is
    * the bucket count, and `bucketMicro` is the knob trading waterline
    * granularity against the boundary partition's size. Token-less
    * docs (NULL score) are never kept.
    *
    * Output: every doc with (n_tokens, q_micro, kept) — an audit
    * relation, filter `kept` downstream.
    */
  def budgetSelect(docs: DataFrame, idCol: String, textCol: String,
      budgetFrac: Double, bucketMicro: Long = 100000L): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0, 1]: $budgetFrac")
    require(bucketMicro > 0, s"bucketMicro must be positive: $bucketMicro")
    val scored = lmScore(docs, idCol, textCol)
      // round(x,6)·1e6 is within an ulp of an integer; round() lands the
      // same integer on both engines
      .withColumn("q_micro", round(col("lm_nll") * lit(1000000.0)).cast("long"))
      .withColumn("__bkt", expr(s"q_micro div $bucketMicro"))
      // persisted barrier (the jaccardPairs precedent): the scored frame
      // feeds the token total, the bucket histogram AND the final join —
      // without it each consumer replays the whole two-shuffle lmScore
      // chain (measured 3.3× the chain's lone cost at 2M docs)
      .persistTracked()
    val tot = scored.agg(sum("n_tokens").as("__T"))
    val bw = org.apache.spark.sql.expressions.Window.orderBy("__bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val buckets = scored.filter(col("__bkt").isNotNull)
      .groupBy("__bkt").agg(sum("n_tokens").as("__btok"))
      .crossJoin(broadcast(tot))
      .withColumn("__B", floor(col("__T") * lit(budgetFrac)).cast("long"))
      .withColumn("__cum", sum("__btok").over(bw))
      .withColumn("__st",
        when(col("__cum") <= col("__B"), lit("full"))
          .when(col("__cum") - col("__btok") < col("__B"), lit("boundary"))
          .otherwise(lit("drop")))
      .withColumn("__R", col("__B") - (col("__cum") - col("__btok")))
      .select("__bkt", "__st", "__R")
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy("__bkt")
      .orderBy(col("q_micro"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    scored.join(broadcast(buckets), Seq("__bkt"), "left")
      .withColumn("__cumtok", sum("n_tokens").over(wdoc))
      .select(col(idCol), col("n_tokens"), col("q_micro"),
        coalesce(col("__st") === "full" ||
          (col("__st") === "boundary" && col("__cumtok") <= col("__R")),
          lit(false)).as("kept"))
  }

  /** Compression-ratio junk gate — the tokenizer-free signal the
    * char-entropy gate (p84) complements: per doc, the DEFLATE ratio of
    * the UTF-8 bytes in exact integer milli-units,
    * `ratio_milli = (deflate_bytes · 1000) div n_bytes`. BOTH tails are
    * junk for LM training: `ratio_milli < lowMilli` = machine
    * repetition/templating (boilerplate farms, key-mash, log spam);
    * `ratio_milli > highMilli` = high-entropy payloads masquerading as
    * text (base64/hex blobs, packed binaries, already-compressed data).
    * Natural prose lands in between (~350–650 milli at paragraph
    * length — deflate needs a few hundred bytes of history, so very
    * short docs trend HIGH and should be length-gated first, the
    * Gopher-rule composition). One zero-shuffle codegen projection
    * ([[graft.functions.DeflateLen]] + `octet_length`), all-integer
    * outputs, hash-stable. Empty/whitespace-only docs have n_bytes
    * of 0 or tiny values — a 0-byte doc gets a NULL ratio and
    * `keep = false` (nothing to train on).
    *
    * Output: `(idCol, n_bytes, deflate_bytes, ratio_milli, keep)`.
    */
  def compressionGate(docs: DataFrame, idCol: String, textCol: String,
      lowMilli: Long = 250L, highMilli: Long = 750L): DataFrame = {
    require(lowMilli >= 0 && highMilli > lowMilli,
      s"need 0 <= lowMilli < highMilli: $lowMilli, $highMilli")
    docs.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        graft.functions.DeflateLen(col(textCol)).as("deflate_bytes"))
      .withColumn("ratio_milli",
        expr("CASE WHEN n_bytes > 0 THEN (deflate_bytes * 1000) div n_bytes END"))
      .withColumn("keep",
        coalesce(col("ratio_milli") >= lowMilli &&
          col("ratio_milli") <= highMilli, lit(false)))
  }

  /** The default keyword probes for [[codeGate]] — substrings whose
    * PRESENCE (not count) votes "code". Chosen to span the mainstream
    * source languages while staying rare in prose; each hit is worth
    * 100 score-milli, so two hits alone clear a 400-milli threshold
    * only together with symbol/structure signals.
    */
  val CodeKeywords: Seq[String] = Seq(
    "def ", "#include", "import ", "return", "function", "class ",
    "const ", "public static", "let ", "print(", "=>", "nullptr")

  /** Code-vs-prose detector (the StarCoder/Dolma-style routing signal
    * that decides whether a crawled doc feeds the code or the text
    * subset). Four integer signals per doc, all in exact milli units so
    * the DuckDB oracle replays them bit-for-bit:
    *
    *   - `sym_milli`: source-structure characters `{}();=<>[]` per 1000
    *     chars (`translate`-delete and subtract — no regex);
    *   - `indent_milli`: lines starting with four spaces or a tab per
    *     1000 lines (indented blocks — also fires on poetry, which is
    *     why no single signal decides);
    *   - `term_milli`: lines whose space-rtrimmed tail is `;`/`{`/`}`
    *     per 1000 lines (statement terminators / block braces);
    *   - `kw_hits`: how many of `keywords` occur at least once.
    *
    * `score_milli = 3·sym + 2·term + indent div 4 + 100·kw` and
    * `is_code = score_milli >= threshold` (default 400). Indentation is
    * deliberately the WEAKEST vote — a fully-indented doc contributes
    * only 250 milli, so poetry/quoted email can never cross the
    * threshold on indentation alone, while real source always carries
    * symbols or terminators too; prose with a parenthetical and an
    * "import duties" mention stays well under. One zero-shuffle codegen
    * projection: `split`/`filter`/`translate`/`contains` built-ins
    * only, no UDF, linear in text length. Empty docs score 0.
    *
    * Output: `(idCol, n_chars, n_lines, sym_milli, indent_milli,
    * term_milli, kw_hits, score_milli, is_code)`.
    */
  def codeGate(docs: DataFrame, idCol: String, textCol: String,
      threshold: Long = 400L,
      keywords: Seq[String] = CodeKeywords): DataFrame = {
    require(keywords.nonEmpty, "need at least one keyword probe")
    // NULL docs must score 0 like empty ones: length(NULL) is NULL and
    // size(split(NULL)) is -1 under legacy sizeOfNull, which would leak
    // NULL/garbage signals — coalesce once, every signal then sees ''
    val t = coalesce(col(textCol), lit(""))
    // line array materialized once (r13): three signals reference it
    val lines = col("__cg_lines")
    val kwHits = keywords.map(k =>
      when(contains(t, lit(k)), 1L).otherwise(0L)).reduce(_ + _)
    docs
      .withColumn("__cg_lines", split(t, "\n", -1))
      .select(col(idCol),
        length(t).cast("long").as("n_chars"),
        size(lines).cast("long").as("n_lines"),
        (length(t) - length(translate(t, "{}();=<>[]", "")))
          .cast("long").as("sym_chars"),
        size(filter(lines, l =>
          substring(l, 1, 4) === "    " || substring(l, 1, 1) === "\t"))
          .cast("long").as("indent_lines"),
        size(filter(lines, l =>
          rtrim(l).endsWith(";") || rtrim(l).endsWith("{") ||
            rtrim(l).endsWith("}")))
          .cast("long").as("term_lines"),
        kwHits.as("kw_hits"))
      .withColumn("sym_milli",
        expr("(sym_chars * 1000) div greatest(n_chars, 1)"))
      .withColumn("indent_milli",
        expr("(indent_lines * 1000) div greatest(n_lines, 1)"))
      .withColumn("term_milli",
        expr("(term_lines * 1000) div greatest(n_lines, 1)"))
      .withColumn("score_milli",
        expr("3 * sym_milli + 2 * term_milli + (indent_milli div 4) + 100 * kw_hits"))
      .withColumn("is_code", col("score_milli") >= threshold)
      .select(idCol, "n_chars", "n_lines", "sym_milli", "indent_milli",
        "term_milli", "kw_hits", "score_milli", "is_code")
  }

  /** License / SPDX header gate for the code route (the StarCoder /
    * Dolma pipelines' immediately-next filter after [[codeGate]]'s
    * code-vs-prose routing: only permissively-licensed source may feed
    * the code subset). Detection is HEADER-SHAPED, not name-dropping:
    *
    *   - an explicit `SPDX-License-Identifier:` tag anywhere in the
    *     first `headerChars` code points wins outright (the modern
    *     machine-readable convention — REUSE/SPDX spec);
    *   - otherwise the canonical license-text fingerprints decide:
    *     MIT's "permission is hereby granted, free of charge", BSD's
    *     "redistribution and use in source and binary forms", Apache's
    *     "apache license" + "version 2.0", MPL's and the GPL family's
    *     full names. PROSE THAT MENTIONS a license by name ("the MIT
    *     license is discussed…") matches neither the tag nor any
    *     license-text fingerprint and classifies `none` — the
    *     false-positive mode a keyword match would have.
    *
    * `license_class` folds to permissive (mit / apache-2.0 / bsd),
    * copyleft (gpl family / mpl), unknown (an SPDX tag outside the
    * mapped set — a human must look), or none; `keep` admits
    * permissive plus (by default) unlicensed docs, which inherit their
    * repository's license downstream. One zero-shuffle codegen
    * projection (`substring`/`lower`/`contains`/`regexp_extract`), no
    * UDF, linear in `headerChars` — the p126 shape.
    *
    * Output: `(idCol, spdx_id, license, license_class, keep)`.
    */
  def licenseGate(docs: DataFrame, idCol: String, textCol: String,
      headerChars: Int = 2048, keepUnlicensed: Boolean = true): DataFrame = {
    require(headerChars > 0, s"headerChars must be positive: $headerChars")
    val hdr = substring(coalesce(col(textCol), lit("")), 1, headerChars)
    val lh = lower(hdr)
    val spdx = regexp_extract(hdr,
      "SPDX-License-Identifier:\\s*([A-Za-z0-9.+\\-]+)", 1)
    val hasMit = contains(lh, lit("permission is hereby granted, free of charge"))
    val hasApache = contains(lh, lit("apache license")) &&
      contains(lh, lit("version 2.0"))
    val hasBsd = contains(lh,
      lit("redistribution and use in source and binary forms"))
    val hasMpl = contains(lh, lit("mozilla public license"))
    val hasGpl = contains(lh, lit("gnu general public license")) ||
      contains(lh, lit("gnu lesser general public")) ||
      contains(lh, lit("gnu affero general public"))
    docs.select(col(idCol), spdx.as("spdx_id"),
        hasMit.as("__mit"), hasApache.as("__apache"), hasBsd.as("__bsd"),
        hasMpl.as("__mpl"), hasGpl.as("__gpl"))
      .withColumn("license", {
        val sl = lower(col("spdx_id"))
        when(col("spdx_id") =!= "",
          when(sl.startsWith("mit"), "mit")
            .when(sl.startsWith("apache"), "apache-2.0")
            .when(sl.startsWith("bsd"), "bsd")
            .when(sl.startsWith("mpl"), "mpl")
            .when(sl.contains("gpl"), "gpl")
            .otherwise("other-spdx"))
          .when(col("__mit"), "mit")
          .when(col("__apache"), "apache-2.0")
          .when(col("__bsd"), "bsd")
          .when(col("__mpl"), "mpl")
          .when(col("__gpl"), "gpl")
          .otherwise("none")
      })
      .drop("__mit", "__apache", "__bsd", "__mpl", "__gpl")
      .withColumn("license_class",
        when(col("license").isin("mit", "apache-2.0", "bsd"), "permissive")
          .when(col("license").isin("gpl", "mpl"), "copyleft")
          .when(col("license") === "none", "none")
          .otherwise("unknown"))
      .withColumn("keep",
        col("license_class") === "permissive" ||
          (lit(keepUnlicensed) && col("license_class") === "none"))
  }
}
