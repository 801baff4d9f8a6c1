package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.LinkExtractor

/** One synthetic Common-Crawl-style page (BASELINE.json input_hint). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * Deterministic synthetic web corpus: pages whose html embeds an
 * RMAT-shaped link structure (same generator family and parameters as
 * the reference's benchmarks, see [[Rmat]]), so that running the
 * pinned extractor over the corpus yields a power-law link graph with
 * known ground truth. Every byte is a pure function of
 * (seed, scale, edgeFactor) — no RNG state, no external data — so the
 * corpus is identical across partitionings and cluster sizes.
 *
 * The `text` column stores the EXPECTED extraction (computed with the
 * same pinned pure function the engine's Catalyst path implements),
 * which is what makes the north rule's byte-identical-per-url
 * invariant testable.
 */
object PagesCorpus {

  val Epoch: Long = 1664582400000L // 2022-10-01T00:00:00Z, UTC

  def urlOf(v: Long): String = s"https://site${v % 97}.example/p/$v"

  private val fillerWords = Vector(
    "graph", "vertex", "edge", "rank", "component", "triangle", "label",
    "crawl", "page", "link", "web", "data", "engine", "scale", "spark")
  private val langWords = Map(
    "en" -> Vector("the", "and", "with", "from"),
    "de" -> Vector("und", "der", "mit", "von"),
    "fr" -> Vector("et", "les", "avec", "dans"))

  def langOf(seed: Long, v: Long): String = {
    val h = Math.floorMod(Rmat.mix64(seed ^ (v * 31L + 7L)), 10L)
    if (h == 8L) "de" else if (h == 9L) "fr" else "en"
  }

  /** Render one page's html (pure). Links appear in edge-index order. */
  def htmlOf(seed: Long, v: Long, links: Seq[Long], lang: String): String = {
    val lw = langWords(lang)
    val filler = (0 until 12).map { k =>
      val h = Rmat.mix64(seed ^ (v * 131L + k))
      val w1 = fillerWords((h & 0x7fffffff).toInt % fillerWords.size)
      val w2 = lw(((h >>> 32) & 0x7fffffff).toInt % lw.size)
      s"$w1 $w2"
    }.mkString(" ")
    val anchors = links.zipWithIndex.map { case (d, i) =>
      s"""<a href="${urlOf(d)}">link $i to page $d</a>"""
    }.mkString("\n")
    s"""<html><head><title>page $v</title>
       |<style>body { color: black; }</style>
       |<script>var x = $v;</script></head>
       |<body><h1>page $v</h1>
       |<p>$filler</p>
       |$anchors
       |</body></html>""".stripMargin
  }

  /**
   * The corpus as a DataFrame(url, warc_ts, html, text, lang).
   * Distributed generation: edges come from `spark.range` over edge
   * indices (splittable pure function), grouped into per-page ordered
   * link lists; pages with no out-links are produced by the range over
   * all vertex ids (left join) — those become PageRank dangling mass.
   */
  def pages(
      spark: SparkSession,
      seed: Long = 42L,
      scale: Int = 10,
      edgeFactor: Int = 16): Dataset[Page] = {
    import spark.implicits._
    val numV = 1L << scale
    val numE = numV * edgeFactor

    val links = spark.range(numE)
      .map { i => val (s, d) = Rmat.edge(seed, i, scale); (s, i, d) }
      .toDF("v", "idx", "dst")
      .groupBy("v")
      .agg(sort_array(collect_list(struct(col("idx"), col("dst"))))
        .as("ordered"))
      .select(col("v"), col("ordered.dst").as("links"))

    spark.range(numV).toDF("v")
      .join(links, Seq("v"), "left")
      .select(col("v"), coalesce(col("links"), array()).as("links"))
      .as[(Long, Seq[Long])]
      .map { case (v, ls) =>
        val lang = langOf(seed, v)
        val html = htmlOf(seed, v, ls, lang)
        Page(
          url = urlOf(v),
          warc_ts = new Timestamp(Epoch + v * 1000L),
          html = html.getBytes("UTF-8"),
          text = LinkExtractor.extractText(html),
          lang = lang)
      }
  }

  /** Ground-truth directed url edge list (duplicates kept), for tests. */
  def edgeUrls(seed: Long, scale: Int, edgeFactor: Int): Seq[(String, String)] =
    Rmat.edges(seed, scale, edgeFactor)
      .map { case (s, d) => (urlOf(s), urlOf(d)) }

  /** Write the corpus as an Iceberg-style table (parquet + manifest). */
  def write(ds: Dataset[Page], dir: String): Unit = {
    ds.write.mode("overwrite").parquet(s"$dir/data")
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data")
}
