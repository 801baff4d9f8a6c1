package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.corpus.PagesCorpus
import graft.extract.{LinkExtractor, WebGraph}

/**
 * The north-rule web pipeline as driver-contract queries: synthesize
 * the deterministic Common-Crawl-style corpus (url, warc_ts, html,
 * text, lang), run the pinned extractor, build the renumbered link
 * graph, run the algorithms, unrenumber back to urls.
 *
 * These have no DuckDB oracle (the corpus is not part of the shared
 * parquet input), so the round driver records rows-only checks;
 * correctness is pinned by the sbt suite, which compares the same
 * pipeline against the ported reference oracles
 * (WebGraphPipelineSpec / ExtractorSpec).
 */
object WebQueries {

  // Small deterministic corpus for the verify path; Bench scales up.
  private val Seed = 42L
  private val Scale = 9
  private val EdgeFactor = 8

  // Memoize corpus + built graph per session: the driver's Verify/Bench
  // run every query independently, and without this each q_web_* would
  // regenerate pages and re-extract the graph.
  private val corpusCache =
    new java.util.WeakHashMap[SparkSession, (DataFrame, WebGraph.Built)]

  private def corpus(s: SparkSession): DataFrame = built(s)._1

  private def built(s: SparkSession): (DataFrame, WebGraph.Built) =
    corpusCache.synchronized {
      Option(corpusCache.get(s)).getOrElse {
        import s.implicits._
        val pages = PagesCorpus.pages(s, Seed, Scale, EdgeFactor).toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b0 = WebGraph.fromPages(pages, parts(s))
        val b = WebGraph.Built(
          graft.core.Lineage.materialize(b0.urlMap).df,
          b0.graph.cached())
        val v = (pages, b)
        corpusCache.put(s, v)
        v
      }
    }

  private def parts(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_web_extract" -> ((s, _) => {
      // Per-lang corpus stats through the pinned extractor.
      val pages = corpus(s)
      pages
        .select(col("lang"), length(LinkExtractor.textCol(col("html")))
            .as("text_len"),
          size(LinkExtractor.linksCol(col("html"))).as("n_links"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_pages"),
          sum("text_len").as("total_text_len"),
          sum("n_links").as("total_links"))
    }),

    "q_web_pagerank_top10" -> ((s, _) => {
      val built = WebGraph.fromPages(corpus(s), parts(s))
      val r = PageRank.run(built.graph, PageRank.Config(tol = 1e-6))
      WebGraph.withUrls(
          r.ranks.select(col("id"),
            round(col("pagerank") * 1e6, 0).cast("long").as("pr_micro")),
          built.urlMap)
        .select("url", "pr_micro")
        .orderBy(col("pr_micro").desc, col("url"))
        .limit(10)
    }),

    "q_web_wcc" -> ((s, _) => {
      val built = WebGraph.fromPages(corpus(s), parts(s))
      val comps = ConnectedComponents.run(built.graph.symmetrize).components
      comps.groupBy("component").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("component"))
    }),

    "q_web_lpa" -> ((s, _) => {
      val built = WebGraph.fromPages(corpus(s), parts(s))
      val labels = LabelPropagation
        .run(built.graph.symmetrize, LabelPropagation.Config(maxIter = 5))
        .labels
      labels.groupBy("label").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("label"))
    }),

    "q_web_triangles" -> ((s, _) => {
      val built = WebGraph.fromPages(corpus(s), parts(s))
      val per = TriangleCount.run(built.graph.symmetrize)
      WebGraph.withUrls(per, built.urlMap)
        .select("url", "triangles")
        .orderBy(col("triangles").desc, col("url"))
        .limit(20)
    })
  )
}
