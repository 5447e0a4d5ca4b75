package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID and
  * document fingerprinting. All pure Catalyst expressions (codegen'd,
  * no UDFs) so they vectorize over billions of documents; every
  * expression has an exactly-equivalent DuckDB form used by the
  * driver oracle (see PipelineQueries).
  */
object TextOps {

  val HashPrime = 1000000007L

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** BPE-ish lexer tokens: letter runs, digit runs, single punctuation. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** First 15 hex chars of md5 as a 60-bit non-negative long — the shared
    * deterministic hash for minhash seeds and fingerprints (same value as
    * DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT`).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** 48-bit variant: values < 2^48 survive double-precision bit math
    * exactly (needed by SimHash's per-bit extraction, which must agree
    * bit-for-bit with the SQL oracle).
    */
  def hash48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Unicode cleanup normalization — the preprocessing step crawl
    * pipelines run BEFORE dedup/fingerprinting so cosmetic encoding
    * variants (curly vs straight quotes, NBSP vs space, zero-width
    * junk) don't defeat exact matching:
    *
    *   - zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) stripped;
    *   - unicode spaces (NBSP, en/em/thin spaces, ideographic space)
    *     → ASCII space;
    *   - curly quotes → straight, en/em dash → '-', ellipsis → '...';
    *   - whitespace runs collapsed, ends trimmed.
    *
    * Deliberately NOT full NFKC (the JVM could via Normalizer, but no
    * SQL engine replays it — this subset is exactly expressible on
    * both, so normalized text stays oracle-hashable). One codegen'd
    * regexp_replace chain, no shuffle.
    */
  def normalizeText(t: Column): Column = {
    val t1 = regexp_replace(t, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
    val t2 = regexp_replace(t1, "[\\u00A0\\u2000-\\u200A\\u202F\\u3000]", " ")
    val t3 = regexp_replace(t2, "[\\u2018\\u2019]", "'")
    val t4 = regexp_replace(t3, "[\\u201C\\u201D]", "\"")
    val t5 = regexp_replace(t4, "[\\u2013\\u2014]", "-")
    val t6 = regexp_replace(t5, "\\u2026", "...")
    // explicit class, not \s: Java's \s includes vertical tab \x0B,
    // RE2's (the DuckDB oracle) does not — spell it identically
    trim(regexp_replace(t6, "[ \\t\\n\\f\\r]+", " "))
  }

  /** Polynomial rolling hash (Rabin–Karp) over the code points of the
    * whitespace-normalized document: acc = (acc*31 + code) mod p. One
    * codegen'd pass over the UTF-8 bytes ([[graft.functions.RollingHash]]),
    * O(len) with zero per-character allocation; collision-checkable
    * fingerprint for content-defined dedup.
    */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHash(concat_ws(" ", tokens(text)))

  /** Language marker lexicons for the n-gram-free stopword heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "en", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"))

  /** Count of tokens present in a marker lexicon (with multiplicity).
    * Hash-set membership probe per token ([[graft.functions.MarkerHits]])
    * rather than a linear array_contains scan per token per language.
    */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    graft.functions.MarkerHits(toks, markers)

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by")

  /** Ratio helper: null-safe division rounded to 6 dp (both engines
    * compute the identical expression shape).
    */
  def ratio(num: Column, den: Column): Column =
    coalesce(round(num * lit(1.0) / nullif(den, lit(0)), 6), lit(0.0))

  /** Normalized line key for boilerplate detection: lowercased,
    * whitespace-collapsed, md5-hashed to a 60-bit long.
    */
  def lineKey(line: Column): Column =
    hash60(concat_ws(" ", filter(split(lower(trim(line)), "\\s+"), t => t =!= "")))

  /** HTML → text extraction (the Common Crawl ingest step ahead of every
    * quality filter; the heuristic core of tools like trafilatura /
    * jusText restated as a codegen'd regex chain): drop script/style
    * blocks wholesale, strip remaining tags (replaced by a space so
    * `</p><p>` never glues words), decode the six common entities,
    * collapse whitespace. Only regex constructs with identical semantics
    * in Java regex and RE2 are used (`(?is)` flags, lazy `.*?`,
    * character classes), so the DuckDB oracle replays it exactly.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    // `&amp;` decodes LAST (the standard order): amp-first would turn
    // the escaped literal `&amp;lt;` into `&lt;` and then wrongly into
    // `<` — double-decoding text the page displays as "&lt;"
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (ent, ch)) => regexp_replace(c, ent, ch)
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r]+", " "))
  }

  /** `<title>` contents (first match, empty when absent). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** Count of anchor tags carrying an href — the link-density signal
    * boilerplate classifiers key on.
    */
  def htmlLinkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\b[^>]*\\shref\\s*="), lit(0)))
      .cast("long")

  // block-level tag boundary — the segmentation points of jusText-class
  // extractors (Pomikálek 2011 §3.1 segments at block tags; trafilatura
  // and Arc90 readability walk the same element set)
  private[graft] val BlockTagRe =
    "(?i)</?(?:p|div|li|ul|ol|dl|dt|dd|h[1-6]|table|thead|tbody|tr|td|th|" +
      "section|article|main|blockquote|pre|figure|figcaption|form|br|hr)\\b[^>]*>"

  /** Main-content extraction — the block-level step real ingest
    * pipelines (FineWeb §3.1's trafilatura, RefinedWeb's jusText-class
    * extractor, Arc90 readability) run between the raw page and the
    * quality gates, where [[htmlToText]] alone keeps every nav menu and
    * cookie banner in the text. The public heuristic core, restated as
    * ONE codegen'd projection (split + array HOFs — no explode, no
    * shuffle, the p44/p85 shape):
    *
    *   1. chrome SUBTREES vanish wholesale: script/style (as in
    *      [[htmlToText]]) plus the semantic boilerplate containers
    *      `nav`/`header`/`footer`/`aside` (lazy match — nested
    *      same-tag containers are out of scope, stated not hidden);
    *   2. the remainder splits into blocks at [[BlockTagRe]];
    *   3. each block scores (clean text, link-text length) — link text
    *      = anchor inner texts, the jusText/readability link-density
    *      numerator;
    *   4. keep = text length ≥ `minChars` AND link chars ≤
    *      `maxLinkDensityPct`% of text chars (integer comparison — no
    *      float density, so both engines decide boundaries
    *      identically); survivors rejoin in document order.
    *
    * Returns a struct `(n_blocks, n_kept, text_main)` where `n_blocks`
    * counts non-empty-text blocks. Six-entity decode and whitespace
    * collapse reuse the [[htmlToText]] algebra per block; only
    * Java-regex/RE2-identical constructs, so the DuckDB oracle replays
    * the chain exactly (p89).
    */
  def mainContentBlocks(html: Column, minChars: Int = 25,
      maxLinkDensityPct: Int = 20): Column = {
    val pruned = Seq("script", "style", "nav", "header", "footer", "aside")
      .foldLeft(html)((c, t) =>
        regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t>", " "))
    def cleanOf(c: Column): Column = {
      val noTags = regexp_replace(c, "<[^>]+>", " ")
      val decoded = Seq(
        "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
        case (x, (ent, ch)) => regexp_replace(x, ent, ch)
      }
      trim(regexp_replace(decoded, "[ \\t\\n\\f\\r]+", " "))
    }
    val scored = transform(split(pruned, BlockTagRe), c =>
      struct(
        cleanOf(c).as("txt"),
        length(cleanOf(array_join(regexp_extract_all(c,
          lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))).as("lch")))
    // ONE fold over the scored blocks (r13 optimization): the previous
    // filter/filter/size/size/transform formulation referenced `scored`
    // three times, and HOF subtrees get no subexpression elimination
    // (lambda variables block CSE) — the whole per-block regex chain ran
    // ~3× per document. The fold walks the scored array once and
    // accumulates the identical (n_blocks, n_kept, text_main): a block
    // counts when its clean text is non-empty, keeps when additionally
    // ≥ minChars and within the integer link-density bound, and kept
    // texts join with "\n" in document order.
    aggregate(scored,
      struct(lit(0L).as("nb"), lit(0L).as("nk"), lit("").as("tm")),
      (a, b) => {
        val len = length(b.getField("txt"))
        val keep = len >= math.max(minChars, 1) &&
          b.getField("lch") * 100 <= len * maxLinkDensityPct
        struct(
          (a.getField("nb") + when(len > 0, 1L).otherwise(0L)).as("nb"),
          (a.getField("nk") + when(keep, 1L).otherwise(0L)).as("nk"),
          when(keep,
            concat(a.getField("tm"),
              when(a.getField("nk") > 0, lit("\n")).otherwise(lit("")),
              b.getField("txt")))
            .otherwise(a.getField("tm")).as("tm"))
      },
      a => struct(
        a.getField("nb").as("n_blocks"),
        a.getField("nk").as("n_kept"),
        a.getField("tm").as("text_main")))
  }

  /** SFT conversation → training text in the ChatML wire format, plus
    * the loss-mask offsets every fine-tuning run needs: each turn
    * renders as `<|im_start|>ROLE\nCONTENT<|im_end|>\n` and the spans
    * column lists the 0-based half-open [start:end) CHARACTER offsets
    * of every assistant turn's CONTENT inside the rendered string (the
    * canonical "train only on assistant tokens" mask), serialized
    * `"s:e,s:e"` so the row stays flat and hash-stable.
    *
    * One left-fold over the messages array (`aggregate` HOF — a single
    * zero-shuffle codegen projection, no UDF, no explode): the
    * accumulator carries (rendered-so-far, spans-so-far), and each
    * turn's span start is `len(so-far) + 12 + len(role) + 1` by
    * construction (12 = `<|im_start|>`, 1 = the newline). NULL content
    * renders as empty. Offsets are code-point positions — identical in
    * Spark (`length`) and DuckDB (`length`) — so the oracle restates
    * the arithmetic exactly.
    *
    * Input: `array<struct<role, content>>`. Output struct:
    * `(rendered, n_turns, assistant_spans)`.
    */
  def renderChatML(messages: Column): Column = {
    val acc = aggregate(messages,
      struct(lit("").as("txt"), lit("").as("spans")),
      (a, m) => {
        val role = m.getField("role")
        val content = coalesce(m.getField("content"), lit(""))
        val start = length(a.getField("txt")) + lit(12) + length(role) + lit(1)
        val end = start + length(content)
        struct(
          concat(a.getField("txt"), lit("<|im_start|>"), role, lit("\n"),
            content, lit("<|im_end|>\n")).as("txt"),
          when(role === "assistant",
            concat(a.getField("spans"),
              when(length(a.getField("spans")) > 0, lit(",")).otherwise(lit("")),
              start.cast("string"), lit(":"), end.cast("string")))
            .otherwise(a.getField("spans")).as("spans"))
      })
    struct(
      acc.getField("txt").as("rendered"),
      size(messages).cast("long").as("n_turns"),
      acc.getField("spans").as("assistant_spans"))
  }
}
