package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * THE pinned reference extractor: html bytes → (text, out-links).
 *
 * The reference repo contains no WARC/HTML ingestion at all (verified,
 * SURVEY.md §1.1) — the web-text layer is ours, and the north rule's
 * invariant is that extracted text is BYTE-IDENTICAL per url across
 * any run/partitioning. So extraction is a pure function of the html
 * bytes, defined twice over the same regexes:
 *
 *   - [[extractText]]/[[extractLinks]]: plain JVM functions (used by
 *     the corpus generator to pre-compute the expected `text` column,
 *     and by property tests);
 *   - [[textCol]]/[[linksCol]]: the identical transformation as
 *     codegen'd Catalyst expressions (regexp_replace /
 *     regexp_extract_all) for the distributed path.
 *
 * A ScalaCheck property asserts the two agree byte-for-byte.
 *
 * Pinned rules (v1, frozen):
 *   1. links   = values of href="..." attributes of <a> tags, in
 *                document order, possibly duplicated;
 *   2. text    = html with <script>/<style> elements dropped, all tags
 *                replaced by a single space, whitespace runs collapsed
 *                to one space, trimmed.
 */
object LinkExtractor {

  // Java and Spark's regexp_* share java.util.regex semantics, so one
  // pattern string serves both paths.
  val HrefPattern = "(?i)<a\\s[^>]*href=\"([^\"]*)\"[^>]*>"
  val ScriptStylePattern = "(?is)<(script|style)[^>]*>.*?</\\1>"
  val TagPattern = "<[^>]*>"
  val SpacePattern = "\\s+"

  // ---- JVM path (generator + property tests) ----

  def extractLinks(html: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(HrefPattern).matcher(html)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  def extractText(html: String): String = {
    val noScript = html.replaceAll(ScriptStylePattern, " ")
    val noTags = noScript.replaceAll(TagPattern, " ")
    noTags.replaceAll(SpacePattern, " ").trim
  }

  // ---- Catalyst path (distributed) ----

  /** html (binary or string) → decoded string column. */
  def htmlStr(html: Column): Column = html.cast("string")

  def textCol(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(htmlStr(html), ScriptStylePattern, " "),
        TagPattern, " "),
      SpacePattern, " "))

  def linksCol(html: Column): Column =
    regexp_extract_all(htmlStr(html), lit(HrefPattern), lit(1))

  /**
   * pages(url, html, …) → edge table (src_url, dst_url), one row per
   * anchor occurrence. Filter + explode are codegen'd; the scan only
   * reads (url, html) thanks to column pruning.
   */
  def pagesToEdges(pages: DataFrame): DataFrame =
    pages
      .select(col("url").as("src_url"),
        explode(linksCol(col("html"))).as("dst_url"))

  /** pages → (url, text) with the byte-identical-per-url guarantee. */
  def pagesToText(pages: DataFrame): DataFrame =
    pages.select(col("url"), textCol(col("html")).as("text"))
}
