package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-key dedup — the crawl-frontier /
  * WARC-dedup staple (every large crawl pipeline collapses
  * `HTTP://Site.COM/a/?utm_source=x#frag` and `http://site.com/a`
  * before fetching or near-dup screening; see e.g. the normalization
  * rules catalogued in RFC 3986 §6). Everything here is a single
  * codegen'd projection — regex extracts, `lower`, an array
  * filter/sort over the query params — followed by one hash
  * aggregate on the canonical key: the exact-dedup shuffle shape of
  * p1, linear at any corpus size.
  */
object UrlOps {

  /** Query-parameter keys that never affect page identity: the
    * cross-site tracking families (utm_*, the click ids) and bare
    * `ref`. Matched against the LOWERCASED key, whole-key anchored.
    */
  val TrackingKeyRe = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)$"

  /** RFC 3986 §6 normalization, restated as codegen'd column algebra
    * (each step uses only regex constructs with identical Java-regex /
    * RE2 semantics, so the DuckDB oracle replays it verbatim):
    *
    *   1. drop the fragment (`#...` — never sent to the server);
    *   2. lowercase scheme and host (§6.2.2.1 case normalization;
    *      path case is preserved — it IS significant);
    *   3. strip the scheme's default port (`:80` http, `:443` https);
    *   4. strip trailing `/` runs from the path (the `/a/` vs `/a`
    *      collapse; the bare root becomes the empty path);
    *   5. drop tracking params, then SORT the survivors — param order
    *      is almost never semantic, and sorting makes the key stable
    *      under reordering variants.
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val path = regexp_replace(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)", 1),
      "/+$", "")
    val query = regexp_extract(u, "\\?(.*)$", 1)
    val host =
      when(scheme === "http" && hostport.endsWith(":80"),
        regexp_replace(hostport, ":80$", ""))
        .when(scheme === "https" && hostport.endsWith(":443"),
          regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    val cquery = array_join(
      array_sort(filter(split(query, "&"), p =>
        length(p) > 0 &&
          !lower(regexp_extract(p, "^([^=]*)", 1)).rlike(TrackingKeyRe))),
      "&")
    concat(scheme, lit("://"), host, path,
      when(cquery === "", lit("")).otherwise(concat(lit("?"), cquery)))
  }

  /** robots.txt PARSING (RFC 9309 §2.1-2.2 — the other half of the
    * REP loop; [[robotsFilter]] consumes this relation): given
    * (host, robots.txt body) rows, produce the (host, path_prefix,
    * allow) rules that apply to `agent`:
    *
    *   - lines are `field: value` with `#` comments stripped; field
    *     names case-insensitive, whitespace around the colon
    *     tolerated; only user-agent / allow / disallow lines are
    *     significant (crawl-delay, sitemap etc. are ignored);
    *   - a GROUP is one or more consecutive user-agent lines followed
    *     by its rules; rules before any user-agent line belong to no
    *     group and are dropped (§2.2.1);
    *   - agent matching is the RFC's two-tier rule: if any group names
    *     `agent` exactly (case-insensitive product token), the union
    *     of THOSE groups' rules applies; otherwise the union of the
    *     `*` groups' (§2.2.1 "most specific match");
    *   - an empty allow/disallow value carries no rule (the
    *     conventional "Disallow:" = allow-everything line).
    *
    * Strict envelope: literal path values (a `*`/`$` wildcard rule
    * loads fine here but fails loudly in [[robotsFilter]]); no
    * percent-encoding normalization.
    *
    * Shape at 100 TB: the input is config-scale (one row per host) and
    * every window partitions by HOST ordered by line number — bounded
    * by a single robots.txt body (the RFC's own 500 KiB parse cap),
    * never by corpus size; the group-selection joins are on (host,
    * group), config-scale again. The output feeds the broadcast side
    * of [[robotsFilter]].
    */
  def parseRobotsTxt(robots: DataFrame, hostCol: String, textCol: String,
      agent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots
      .select(lower(col(hostCol)).as("host"),
        posexplode(split(col(textCol), "\r?\n")).as(Seq("line_no", "raw")))
      .withColumn("l", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("l") =!= "")
      .withColumn("field",
        lower(regexp_extract(col("l"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("l"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("line_no")
    val grouped = lines
      .withColumn("prev_field", lag("field", 1).over(w))
      .withColumn("grp", sum(
        when(col("field") === "user-agent" &&
          (col("prev_field").isNull || col("prev_field") =!= "user-agent"),
          1).otherwise(0)).over(w))
    val groups = grouped.filter(col("field") === "user-agent")
      .groupBy("host", "grp")
      .agg(
        max(when(lower(col("value")) === agent.toLowerCase, 1).otherwise(0))
          .as("exact"),
        max(when(col("value") === "*", 1).otherwise(0)).as("star"))
    val hostTier = groups.groupBy("host")
      .agg(max(col("exact")).as("has_exact"))
    val selected = groups.join(hostTier, "host")
      .filter(when(col("has_exact") === 1, col("exact") === 1)
        .otherwise(col("star") === 1))
      .select("host", "grp")
    grouped
      .filter(col("field") =!= "user-agent" && col("value") =!= "")
      .select(col("host"), col("grp"), col("value").as("path_prefix"),
        (col("field") === "allow").as("allow"))
      .join(selected, Seq("host", "grp"))
      .select("host", "path_prefix", "allow")
      .distinct()
  }

  /** Robots-exclusion filtering (RFC 9309, the Robots Exclusion
    * Protocol — the compliance gate every crawl-derived corpus runs
    * before anything else) restated as relational algebra: given a
    * parsed rule relation (host, path_prefix, allow — one row per
    * Allow/Disallow line) and an (id, url) relation, keep a URL iff
    * the MOST SPECIFIC (longest path_prefix) rule matching its host
    * and path allows it, with allow winning specificity ties (RFC 9309
    * §2.2.2: the least restrictive of the most specific rules applies);
    * a URL whose host or path matches no rule is kept — REP is
    * opt-out. Matching is against the path INCLUDING the query string
    * (§2.2.2), empty path normalized to "/".
    *
    * Strict envelope: literal path prefixes only — a rule carrying the
    * RFC's `*`/`$` wildcards fails IN-PLAN by name (expand wildcard
    * rules upstream), never silently prefix-matches metacharacters.
    *
    * Shape at 100 TB: the rule relation is crawler-config-sized
    * (thousands of hosts) beside the corpus, so the match is ONE
    * broadcast left join on host (prefix test as the join residual)
    * followed by ONE partial-aggregated groupBy(id) max over the
    * packed (2·specificity + allow) priority — no window touches the
    * corpus, and a viral host fans each of its URLs out only to that
    * host's own rule count before the map-side partial collapses it.
    */
  def robotsFilter(docs: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val u = col(urlCol)
    val host =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val pq = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(pq === "", lit("/")).otherwise(pq)
    val r = rules
      .select(lower(col("host")).as("__rhost"),
        col("path_prefix").cast("string").as("__rprefix"),
        col("allow").cast("boolean").as("__rallow"))
      .filter(assert_true(
        !col("__rprefix").contains("*") && !col("__rprefix").contains("$"),
        concat(lit("robotsFilter: wildcard rule not implemented " +
          "(expand upstream): "), col("__rprefix"))).isNull)
    docs
      .select(col(idCol), host.as("__host"), path.as("__path"))
      .join(broadcast(r),
        col("__host") === col("__rhost") &&
          col("__path").startsWith(col("__rprefix")), "left")
      .groupBy(col(idCol))
      .agg(
        max(col("__host")).as("host"),
        sum(when(col("__rprefix").isNotNull, 1L).otherwise(0L))
          .as("n_rules_matched"),
        max(when(col("__rprefix").isNotNull,
          length(col("__rprefix")).cast("long") * 2 +
            when(col("__rallow"), 1L).otherwise(0L))).as("__prio"))
      .select(col(idCol), col("host"), col("n_rules_matched"),
        coalesce(expr("__prio div 2"), lit(-1L)).as("matched_len"),
        (col("__prio").isNull || col("__prio") % 2 === 1).as("keep"))
  }

  /** Zero-shuffle serving form of [[robotsFilter]] — the rule relation
    * is config-scale BY NATURE (one row per Allow/Disallow line across
    * the crawl's hosts), so it rides as ONE map literal
    * host → array of (prefix, allow) and the verdict is a pure
    * codegen'd HOF projection: no join, no aggregate, no shuffle.
    * That makes it the STREAMING form (the licenseGate pattern — an
    * ingest stream screens against the fetched robots rules with zero
    * state) and the batch fast path alike. Semantics identical to
    * [[robotsFilter]]: longest prefix wins, allow wins specificity
    * ties, unmatched URLs kept, path matched including the query
    * string; wildcard rules are rejected loudly at BUILD time here
    * (the rules are driver-side).
    */
  def robotsVerdict(docs: DataFrame, idCol: String, urlCol: String,
      rules: Seq[(String, String, Boolean)]): DataFrame = {
    rules.foreach { case (h, p, _) =>
      require(!p.contains("*") && !p.contains("$"),
        s"robotsVerdict: wildcard rule not implemented (expand " +
          s"upstream): '$p' for host $h")
    }
    val byHost: Map[String, Seq[(String, Boolean)]] = rules
      .groupBy(_._1.toLowerCase)
      .map { case (h, rs) => h -> rs.map(r => (r._2, r._3)) }
    val m = typedLit(byHost)
    val u = col(urlCol)
    val host =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val pq = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(pq === "", lit("/")).otherwise(pq)
    docs
      .select(col(idCol), host.as("host"), path.as("__path"))
      .withColumn("__matched", filter(
        coalesce(element_at(m, col("host")),
          typedLit(Seq.empty[(String, Boolean)])),
        r => col("__path").startsWith(r.getField("_1"))))
      .withColumn("__prio", array_max(transform(col("__matched"),
        r => length(r.getField("_1")).cast("long") * 2 +
          when(r.getField("_2"), 1L).otherwise(0L))))
      .select(col(idCol), col("host"),
        size(col("__matched")).cast("long").as("n_rules_matched"),
        coalesce(floor(col("__prio") / 2).cast("long"), lit(-1L))
          .as("matched_len"),
        (col("__prio").isNull || col("__prio") % 2 === 1).as("keep"))
  }

  /** Canonical-URL dedup over a (id, url) relation: group by the
    * canonical form, report occurrence count, how many RAW spellings
    * collapsed into the key, and the first id that carried it (the
    * crawl "keep the earliest fetch" rule). One projection + one
    * hash aggregate; `n_raw_variants` is a distinct-aggregate inside
    * the same grouping (two-phase partial, no extra stage). A text
    * corpus composes in via `regexp_extract_all` + `explode` of the
    * scheme-qualified URL pattern.
    */
  def urlCanonicalDedup(urls: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    urls
      .select(col(idCol), col(urlCol).as("__raw"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("__raw")).as("n_raw_variants"),
        min(col(idCol)).as("first_doc"))
}
