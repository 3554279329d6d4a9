package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus preparation operators: HTML boilerplate stripping and URL
  * normalization — the ingest steps in front of every web-crawl training
  * pipeline (the trafilatura/CCNet extract-then-dedup shape). All pure
  * Column expressions (codegen'd regexp/string kernels, no UDFs), so the
  * whole tier stays inside WholeStageCodegen and scales embarrassingly:
  * per-row work, zero shuffles until the caller aggregates.
  *
  * Regex dialect note: every pattern below is written in the common
  * subset of Java regex (Spark) and RE2 (the DuckDB oracle) — inline
  * `(?is)` flags, lazy quantifiers, explicit `[ \t\r\n]` whitespace
  * classes — so both engines transform identically, byte for byte.
  */
object Web {

  /** Visible text of an HTML document: script/style/comment blocks
    * removed, tags replaced by spaces (word boundaries survive), the
    * five entities HTML templates actually emit decoded (amp last, so
    * `&amp;lt;` decodes once, not twice), whitespace runs collapsed.
    */
  def htmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => regexp_replace(c, from, to) }
    trim(regexp_replace(ent, "[ \t\r\n]+", " "))
  }

  /** Number of anchor tags — the numerator of the link-density boilerplate
    * signal (nav/footer/ad blocks are link-dense, prose is not).
    */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\b"), lit(0))).cast("bigint")

  /** Links per extracted word; >~0.5 marks boilerplate-dominated pages.
    * The two-arg form takes already-extracted text so a pipeline that has
    * materialized `htmlText` (t17) reuses it instead of re-running the
    * extraction chain.
    */
  def linkDensity(html: Column, text: Column): Column =
    linkCount(html).cast("double") /
      greatest(size(split(text, " ")).cast("double"), lit(1.0))

  def linkDensity(html: Column): Column = linkDensity(html, htmlText(html))

  // -- URL normalization ---------------------------------------------------

  private val trackingPrefixes = Seq("utm_", "ref=", "fbclid=", "gclid=")

  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))
  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))

  /** Query string with tracking parameters (utm_*, ref, click ids)
    * removed, original order of the surviving parameters preserved.
    */
  def cleanedQuery(url: Column): Column = {
    val params = split(coalesce(parse_url(url, lit("QUERY")), lit("")), "&")
    val kept = filter(params, p =>
      p =!= "" && !trackingPrefixes.map(pre => p.startsWith(pre)).reduce(_ || _))
    array_join(kept, "&")
  }

  /** Canonical form: scheme://host/path[?cleaned-query] — fragment and
    * tracking parameters dropped, everything else byte-preserved.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = regexp_extract(url, "^([a-z][a-z0-9+.-]*)://", 1)
    val q = cleanedQuery(url)
    concat(scheme, lit("://"), urlHost(url), urlPath(url),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registered domain — last two host labels (the crawl dedup/quota key;
    * a public-suffix list refines this, the grouping shape is identical).
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)
}
