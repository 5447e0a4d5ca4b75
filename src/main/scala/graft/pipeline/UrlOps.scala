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
