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
 * DuckDB oracles: [[graft.Verify]] dumps the corpus itself (input
 * data, not engine output) to [[CorpusDumpDir]]; each oracle reads it
 * back with read_parquet, re-extracts the links with the same pinned
 * regexes (RE2 lacks backreferences, so the script|style alternation
 * is expanded — equivalent for these patterns), re-renumbers
 * (degree-descending, ties by url — [[graft.core.Renumber]]), and
 * recomputes the algorithm as a recursive CTE. The extract oracle
 * reads text lengths from the corpus' precomputed `text` column,
 * which equals the engine's Catalyst extraction by the pinned
 * byte-identical invariant (property-tested in ExtractorSpec).
 */
object WebQueries {

  // Small deterministic corpus for the verify path; Bench scales up.
  // EdgeFactor 2 keeps the RMAT graph sparse enough to have several
  // weak components, so the WCC/LPA oracles check real structure
  // instead of one giant blob.
  private val Seed = 42L
  private val Scale = 9
  private val EdgeFactor = 2

  /** Where Verify dumps the corpus parquet for the DuckDB oracles.
   * Absolute path (inside the repo's target dir) because the oracle
   * SQL is static text executed by the driver's DuckDB process. */
  val CorpusDumpDir = "/root/repo/target/verify_corpus/pages"

  /** PageRank iterations for q_web_pagerank_top10: fixed count (tol=0)
   * so the recursive-CTE oracle runs the identical computation. 10
   * iterations (round 2 pinned 20; the convergence-mode run settles in
   * ~9, so 10 is just as valid a pinned computation at half the cost). */
  private val PrIters = 10
  private val LpaIters = 5

  // Memoize corpus + built graph + SYMMETRIZED graph per session: the
  // driver's Verify/Bench run every query independently, and without
  // this each q_web_* would regenerate pages and re-extract the graph —
  // and q_web_wcc/lpa/triangles would each re-shuffle + re-dedupe the
  // edge table through symmetrize (the round-2 3-7x q_web_* regression).
  private val corpusCache = new java.util.WeakHashMap[
    SparkSession, (DataFrame, WebGraph.Built, graft.core.LinkGraph)]

  private def corpus(s: SparkSession): DataFrame = built(s)._1

  private def symGraph(s: SparkSession): graft.core.LinkGraph = built(s)._3

  private def built(s: SparkSession)
      : (DataFrame, WebGraph.Built, graft.core.LinkGraph) =
    corpusCache.synchronized {
      Option(corpusCache.get(s)).getOrElse {
        import s.implicits._
        val pages = PagesCorpus.pages(s, Seed, Scale, EdgeFactor).toDF()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b0 = WebGraph.fromPages(pages, parts(s))
        val b = WebGraph.Built(
          graft.core.Lineage.materialize(b0.urlMap).df,
          b0.graph.cached())
        val v = (pages, b, b.graph.symmetrize.cached())
        corpusCache.put(s, v)
        v
      }
    }

  /** Write the synthesized corpus (INPUT data, not engine output) so
   * the DuckDB oracles can recompute the pipeline independently. */
  def dumpCorpus(s: SparkSession): Unit =
    corpus(s).coalesce(1).write.mode("overwrite").parquet(CorpusDumpDir)

  private def parts(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  // Host-contracted edge table (src_host, dst_host, weight) shared by
  // q_web_hostgraph and q_web_host_pagerank (GraphQueries'
  // publish-or-reuse convention: the hostgraph owner recomputes and
  // republishes every call so its timing stays honest; the PageRank
  // composite reuses the published frame, building it only when run
  // standalone).
  private val hedgesCache =
    new java.util.WeakHashMap[SparkSession, DataFrame]

  private def buildHostEdges(s: SparkSession): DataFrame = {
    val b = built(s)._2
    val hosts = b.urlMap.select(col("id"),
      regexp_extract(col("url"), HostRe, 1).as("host"))
    b.graph.edges
      .join(hosts.select(col("id").as("src"), col("host").as("src_host")),
        Seq("src"))
      .join(hosts.select(col("id").as("dst"), col("host").as("dst_host")),
        Seq("dst"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("weight"))
  }

  private def publishHostEdges(s: SparkSession): DataFrame =
    hedgesCache.synchronized {
      val df = buildHostEdges(s).cache()
      df.count()
      Option(hedgesCache.put(s, df)).filter(_ ne df).foreach(_.unpersist())
      df
    }

  private def hostEdges(s: SparkSession): DataFrame =
    hedgesCache.synchronized {
      Option(hedgesCache.get(s)).getOrElse(publishHostEdges(s))
    }

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
      val b = built(s)._2
      val r = PageRank.run(b.graph,
        PageRank.Config(alpha = 0.85, tol = 0.0, maxIter = PrIters))
      WebGraph.withUrls(
          r.ranks.select(col("id"),
            round(col("pagerank") * 1e6, 0).cast("long").as("pr_micro")),
          b.urlMap)
        .select("url", "pr_micro")
        .orderBy(col("pr_micro").desc, col("url"))
        .limit(10)
    }),

    "q_web_wcc" -> ((s, _) => {
      val b = built(s)._2
      val comps = ConnectedComponents.run(symGraph(s)).components
      comps.groupBy("component").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("component"))
    }),

    "q_web_lpa" -> ((s, _) => {
      val b = built(s)._2
      val labels = LabelPropagation
        .run(symGraph(s), LabelPropagation.Config(maxIter = LpaIters))
        .labels
      labels.groupBy("label").agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("label"))
    }),

    "q_web_hostgraph" -> ((s, _) => {
      // Host-level (domain) link graph: contract the url graph by the
      // url's host — the standard web-analytics coarsening (domain
      // PageRank input). Same shape as Coarsen.run (two label joins +
      // one map-side-combinable groupBy-sum) with the label computed
      // by a codegen'd regexp on the unrenumber map; at corpus scale
      // both joins are the engine's id-keyed unrenumber hash joins.
      // Publishes the contracted table for q_web_host_pagerank
      // (owner recomputes every call).
      publishHostEdges(s)
        .orderBy(col("weight").desc, col("src_host"), col("dst_host"))
    }),

    "q_web_host_pagerank" -> ((s, _) => {
      // Domain ranking: weighted PageRank over the host-contracted
      // graph (edge weight = page-level link count between the two
      // hosts, q_web_hostgraph's output). The contracted table is
      // re-renumbered with the SAME degree-descending dense-rank map
      // the url graph uses, so the whole composite — contract →
      // renumber → weighted PageRank → unrenumber — is the engine's
      // own scale path at every step.
      val hedges = hostEdges(s)
        .select(col("src_host"), col("dst_host"),
          col("weight").cast("double").as("w"))
      val hm = graft.core.Renumber.buildMap(
        hedges.select(col("src_host").as("src_url"),
          col("dst_host").as("dst_url")), parts(s))
      val enc = hedges
        .join(hm.select(col("url").as("src_host"), col("id").as("hsrc")),
          Seq("src_host"))
        .join(hm.select(col("url").as("dst_host"), col("id").as("hdst")),
          Seq("dst_host"))
        .select(col("hsrc"), col("hdst"), col("w"))
      val hg = graft.core.LinkGraph.fromEdges(
        enc, "hsrc", "hdst", Some("w"), directed = true, parts(s))
      val r = PageRank.run(hg,
        PageRank.Config(alpha = 0.85, tol = 0.0, maxIter = PrIters))
      r.ranks
        .join(hm.select(col("id"), col("url").as("host")), Seq("id"))
        .select(col("host"),
          round(col("pagerank") * 1e6, 0).cast("long").as("pr_micro"))
        .orderBy(col("pr_micro").desc, col("host"))
        .limit(10)
    }),

    "q_web_anchor_text" -> ((s, _) => {
      // Anchor-text aggregation per link TARGET — the classic web-corpus
      // op (anchor text describes the destination page; standard
      // retrieval / training-data augmentation signal). Whole <a>
      // elements are extracted with the pinned href pattern extended by
      // a non-greedy body, then href + inner text are pulled per
      // element — all codegen'd regexps — and aggregated by target url:
      // one explode + one map-side-combinable hash agg, no windows.
      val pages = corpus(s)
      pages
        .select(explode(regexp_extract_all(
          LinkExtractor.htmlStr(col("html")), lit(AnchorRe), lit(0)))
          .as("elem"))
        .select(
          regexp_extract(col("elem"), AnchorRe, 1).as("dst_url"),
          regexp_extract(col("elem"), AnchorRe, 2).as("anchor"))
        .groupBy("dst_url")
        .agg(count(lit(1)).as("n_anchors"),
          countDistinct(col("anchor")).as("n_texts"),
          min(col("anchor")).as("first_text"))
    }),

    "q_web_reciprocity" -> ((s, _) => {
      // Link reciprocity: fraction of distinct non-loop directed edges
      // whose reverse edge also exists — a standard link-graph health
      // metric. One self-join on the reversed key (id-keyed hash join
      // at corpus scale) + one scalar agg; no windows, no cross join.
      val b = built(s)._2
      val de = b.graph.edges.select("src", "dst")
        .where(col("src") =!= col("dst")).distinct()
      val rev = de.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("r", lit(1))
      de.join(rev, Seq("src", "dst"), "left")
        .agg(count(lit(1)).as("n_edges"),
          sum(coalesce(col("r"), lit(0))).cast("long").as("n_reciprocal"))
        .select(col("n_edges"), col("n_reciprocal"),
          round(lit(1e6) * col("n_reciprocal") / col("n_edges"), 0)
            .cast("long").as("reciprocity_micro"))
    }),

    "q_web_degree_dist" -> ((s, _) => {
      // Degree-frequency table (direction, degree, n_vertices) of the
      // url graph — the power-law sanity check every web-graph pipeline
      // runs. Two chained map-side-combinable hash aggs per direction;
      // exact integer output (no float bucketing), so the oracle is an
      // exact mirror. Vertices with zero in- (resp. out-) degree do not
      // appear under that direction, matching the SQL mirror.
      val b = built(s)._2
      val e = b.graph.edges
      def hist(keyCol: String, dir: String): DataFrame =
        e.groupBy(col(keyCol).as("v")).agg(count(lit(1)).as("degree"))
          .groupBy("degree").agg(count(lit(1)).as("n_vertices"))
          .select(lit(dir).as("direction"), col("degree"),
            col("n_vertices"))
      hist("src", "out").unionByName(hist("dst", "in"))
    }),

    "q_web_host_langmix" -> ((s, _) => {
      // Language mix per domain: page counts by (host, lang) plus the
      // host's majority language — the per-domain language profile a
      // multilingual crawl pipeline uses for routing and filtering.
      // Two map-side-combinable hash aggs; the majority pick is a
      // struct-max (greatest n_pages, ties to the greater lang code),
      // never a window, so a host with 10^9 pages costs one combiner
      // cell per (host, lang).
      val pages = corpus(s)
      val hl = pages.select(
          regexp_extract(col("url"), HostRe, 1).as("host"), col("lang"))
        .groupBy("host", "lang").agg(count(lit(1)).as("n_pages"))
      val top = hl.groupBy("host")
        .agg(max(struct(col("n_pages"), col("lang"))).as("m"))
        .select(col("host"), col("m.lang").as("top_lang"))
      hl.join(top, Seq("host"))
        .select("host", "lang", "n_pages", "top_lang")
    }),

    "q_web_crawl_depth" -> ((s, _) => {
      // Crawl-depth profile: directed BFS from the top-degree url
      // (id 0 after the degree-descending renumber) → page count per
      // link depth, the coverage curve a crawl scheduler consumes.
      // Reuses the engine's direction-optimizing BFS; pages the seed
      // cannot reach show up as one depth = -1 bucket via the
      // vertex-table left join (same co-partitioned id-keyed join
      // every unrenumber uses).
      val b = built(s)._2
      val d = graft.algos.Bfs.run(b.graph, Seq(0L))
        .select(col("id"), col("distance"))
      b.graph.vertices.join(d, Seq("id"), "left")
        .select(coalesce(col("distance"), lit(-1L)).as("depth"))
        .groupBy("depth")
        .agg(count(lit(1)).as("n_pages"))
    }),

    "q_web_triangles" -> ((s, _) => {
      val b = built(s)._2
      val per = TriangleCount.run(symGraph(s))
      WebGraph.withUrls(per, b.urlMap)
        .select("url", "triangles")
        .orderBy(col("triangles").desc, col("url"))
        .limit(20)
    })
  )

  // ---------------- DuckDB oracles ----------------

  // Pinned href pattern (LinkExtractor.HrefPattern) — RE2-compatible.
  private val HrefRe = """(?i)<a\s[^>]*href="([^"]*)"[^>]*>"""

  // Host component of a url — same pattern in Spark (Java regex) and
  // DuckDB (RE2): scheme-prefixed authority up to the first slash.
  private val HostRe = """^https?://([^/]+)"""

  // Whole anchor element with href + inner text — the pinned href
  // pattern extended by a non-greedy body. No backreferences, so the
  // same pattern runs under Java regex (Spark) and RE2 (DuckDB).
  private val AnchorRe =
    """(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>"""

  /** Shared prefix: corpus → extracted links → degree-descending
   * renumber → directed renumbered edge table (parallel edges kept,
   * exactly [[graft.extract.WebGraph.fromPages]]). */
  private val WEB =
    s"""WITH RECURSIVE pages AS (
      |  SELECT * FROM read_parquet('$CorpusDumpDir/*.parquet')
      |),
      |links AS (
      |  SELECT url AS src_url,
      |    unnest(regexp_extract_all(decode(html), '$HrefRe', 1)) AS dst_url
      |  FROM pages
      |),
      |occ AS (
      |  SELECT src_url AS url FROM links
      |  UNION ALL SELECT dst_url FROM links
      |),
      |urlmap AS (
      |  SELECT url, CAST(row_number() OVER (ORDER BY count(*) DESC, url) - 1
      |    AS BIGINT) AS id
      |  FROM occ GROUP BY url
      |),
      |dedges AS (
      |  SELECT ms.id AS src, md.id AS dst
      |  FROM links l
      |  JOIN urlmap ms ON ms.url = l.src_url
      |  JOIN urlmap md ON md.url = l.dst_url
      |)""".stripMargin

  /** Symmetrized, deduped view (LinkGraph.symmetrize on weight-1 edges
   * = DISTINCT of both directions). */
  private val SYM =
    """edges AS (
      |  SELECT DISTINCT src, dst FROM (
      |    SELECT src, dst FROM dedges
      |    UNION ALL SELECT dst AS src, src AS dst FROM dedges
      |  ) t
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_web_extract" ->
      s"""$WEB
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(length(text)) AS BIGINT) AS total_text_len,
        |  CAST(sum(len(regexp_extract_all(decode(html), '$HrefRe', 1)))
        |    AS BIGINT) AS total_links
        |FROM pages GROUP BY lang""".stripMargin,

    "q_web_pagerank_top10" ->
      s"""$WEB,
        |verts AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM dedges UNION ALL SELECT dst FROM dedges
        |  ) t
        |),
        |nv AS (SELECT count(*) AS n FROM verts),
        |outw AS (SELECT src AS v, CAST(count(*) AS DOUBLE) AS ow
        |         FROM dedges GROUP BY src),
        |eplus AS (
        |  SELECT src, dst, 1.0 AS w FROM dedges
        |  UNION ALL SELECT v, v, 0.0 FROM verts
        |),
        |pr(iter, v, p) AS (
        |  SELECT 0, v, 1.0 / (SELECT n FROM nv) FROM verts
        |  UNION ALL
        |  SELECT iter + 1, dst,
        |         0.85 * contrib +
        |         (0.85 * sum(dpart) OVER () + 0.15) / (SELECT n FROM nv)
        |  FROM (
        |    SELECT max(t.iter) AS iter, e.dst AS dst,
        |           sum(CASE WHEN e.w > 0 THEN t.p * (e.w / o.ow) ELSE 0 END)
        |             AS contrib,
        |           sum(CASE WHEN e.w = 0 AND coalesce(o.ow, 0) = 0
        |                    THEN t.p ELSE 0 END) AS dpart
        |    FROM pr t
        |    JOIN eplus e ON t.v = e.src
        |    LEFT JOIN outw o ON o.v = t.v
        |    WHERE t.iter < $PrIters
        |    GROUP BY e.dst
        |  ) s
        |)
        |SELECT u.url, CAST(round(p * 1e6, 0) AS BIGINT) AS pr_micro
        |FROM pr JOIN urlmap u ON u.id = pr.v
        |WHERE iter = $PrIters
        |ORDER BY pr_micro DESC, u.url LIMIT 10""".stripMargin,

    "q_web_wcc" ->
      s"""$WEB, $SYM,
        |verts AS (SELECT DISTINCT src AS v FROM edges),
        |cc(v, comp) AS (
        |  SELECT v, v FROM verts
        |  UNION
        |  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.v = e.src
        |  WHERE cc.comp < e.dst
        |),
        |comps AS (SELECT v, min(comp) AS component FROM cc GROUP BY v)
        |SELECT component, CAST(count(*) AS BIGINT) AS size
        |FROM comps GROUP BY component""".stripMargin,

    "q_web_lpa" ->
      s"""$WEB, $SYM,
        |verts AS (SELECT DISTINCT src AS v FROM edges),
        |eplus AS (
        |  SELECT src, dst, 1 AS w FROM edges
        |  UNION ALL SELECT v, v, 0 FROM verts
        |),
        |lp(iter, v, lbl) AS (
        |  SELECT 0, v, v FROM verts
        |  UNION ALL
        |  SELECT iter + 1, dst,
        |         2147483647 - (max(score) % 4294967296)
        |  FROM (
        |    SELECT t.iter AS iter, e.dst AS dst, t.lbl AS lbl,
        |           CAST(sum(e.w) AS BIGINT) * 4294967296
        |             + (2147483647 - t.lbl) AS score
        |    FROM lp t JOIN eplus e ON t.v = e.src
        |    WHERE t.iter < $LpaIters
        |    GROUP BY t.iter, e.dst, t.lbl
        |  ) s
        |  GROUP BY iter + 1, dst
        |)
        |SELECT lbl AS label, CAST(count(*) AS BIGINT) AS size
        |FROM lp WHERE iter = $LpaIters GROUP BY lbl""".stripMargin,

    "q_web_hostgraph" ->
      s"""$WEB,
        |hosts AS (
        |  SELECT id, regexp_extract(url, '$HostRe', 1) AS host FROM urlmap
        |)
        |SELECT hs.host AS src_host, hd.host AS dst_host,
        |  CAST(count(*) AS BIGINT) AS weight
        |FROM dedges e
        |JOIN hosts hs ON hs.id = e.src
        |JOIN hosts hd ON hd.id = e.dst
        |GROUP BY 1, 2""".stripMargin,

    "q_web_host_pagerank" ->
      s"""$WEB,
        |hosts AS (
        |  SELECT id, regexp_extract(url, '$HostRe', 1) AS host FROM urlmap
        |),
        |hedges AS (
        |  SELECT hs.host AS src, hd.host AS dst, CAST(count(*) AS DOUBLE) AS w
        |  FROM dedges e
        |  JOIN hosts hs ON hs.id = e.src
        |  JOIN hosts hd ON hd.id = e.dst
        |  GROUP BY 1, 2
        |),
        |verts AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM hedges UNION ALL SELECT dst FROM hedges
        |  ) t
        |),
        |nv AS (SELECT count(*) AS n FROM verts),
        |outw AS (SELECT src AS v, sum(w) AS ow FROM hedges GROUP BY src),
        |eplus AS (
        |  SELECT src, dst, w FROM hedges
        |  UNION ALL SELECT v, v, 0.0 FROM verts
        |),
        |pr(iter, v, p) AS (
        |  SELECT 0, v, 1.0 / (SELECT n FROM nv) FROM verts
        |  UNION ALL
        |  SELECT iter + 1, dst,
        |         0.85 * contrib +
        |         (0.85 * sum(dpart) OVER () + 0.15) / (SELECT n FROM nv)
        |  FROM (
        |    SELECT max(t.iter) AS iter, e.dst AS dst,
        |           sum(CASE WHEN e.w > 0 THEN t.p * (e.w / o.ow) ELSE 0 END)
        |             AS contrib,
        |           sum(CASE WHEN e.w = 0 AND coalesce(o.ow, 0) = 0
        |                    THEN t.p ELSE 0 END) AS dpart
        |    FROM pr t
        |    JOIN eplus e ON t.v = e.src
        |    LEFT JOIN outw o ON o.v = t.v
        |    WHERE t.iter < $PrIters
        |    GROUP BY e.dst
        |  ) s
        |)
        |SELECT v AS host, CAST(round(p * 1e6, 0) AS BIGINT) AS pr_micro
        |FROM pr WHERE iter = $PrIters
        |ORDER BY pr_micro DESC, host LIMIT 10""".stripMargin,

    "q_web_anchor_text" ->
      s"""$WEB,
        |elems AS (
        |  SELECT unnest(regexp_extract_all(decode(html), '$AnchorRe', 0))
        |    AS elem
        |  FROM pages
        |),
        |anchors AS (
        |  SELECT regexp_extract(elem, '$AnchorRe', 1) AS dst_url,
        |         regexp_extract(elem, '$AnchorRe', 2) AS anchor
        |  FROM elems
        |)
        |SELECT dst_url, CAST(count(*) AS BIGINT) AS n_anchors,
        |  CAST(count(DISTINCT anchor) AS BIGINT) AS n_texts,
        |  min(anchor) AS first_text
        |FROM anchors GROUP BY dst_url""".stripMargin,

    "q_web_reciprocity" ->
      s"""$WEB,
        |de AS (SELECT DISTINCT src, dst FROM dedges WHERE src <> dst)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(count(r.src) AS BIGINT) AS n_reciprocal,
        |  CAST(round(1e6 * count(r.src) / count(*), 0) AS BIGINT)
        |    AS reciprocity_micro
        |FROM de LEFT JOIN de r
        |  ON r.src = de.dst AND r.dst = de.src""".stripMargin,

    "q_web_degree_dist" ->
      s"""$WEB,
        |outd AS (
        |  SELECT src AS v, CAST(count(*) AS BIGINT) AS degree
        |  FROM dedges GROUP BY src
        |),
        |ind AS (
        |  SELECT dst AS v, CAST(count(*) AS BIGINT) AS degree
        |  FROM dedges GROUP BY dst
        |)
        |SELECT 'out' AS direction, degree,
        |  CAST(count(*) AS BIGINT) AS n_vertices
        |FROM outd GROUP BY degree
        |UNION ALL
        |SELECT 'in' AS direction, degree, CAST(count(*) AS BIGINT)
        |FROM ind GROUP BY degree""".stripMargin,

    "q_web_host_langmix" ->
      s"""WITH pages AS (
        |  SELECT * FROM read_parquet('$CorpusDumpDir/*.parquet')
        |),
        |hl AS (
        |  SELECT regexp_extract(url, '$HostRe', 1) AS host, lang,
        |    CAST(count(*) AS BIGINT) AS n_pages
        |  FROM pages GROUP BY 1, 2
        |),
        |top AS (
        |  SELECT host, lang AS top_lang FROM (
        |    SELECT host, lang, row_number() OVER (
        |      PARTITION BY host ORDER BY n_pages DESC, lang DESC
        |    ) AS rn
        |    FROM hl
        |  ) t WHERE rn = 1
        |)
        |SELECT hl.host, hl.lang, hl.n_pages, top.top_lang
        |FROM hl JOIN top ON top.host = hl.host""".stripMargin,

    // Invariant (ADVICE r5): the oracle's recursive CTE caps the BFS
    // at dist < 60 while the engine's Bfs.run is unbounded. Safe
    // because the Scale=9/EdgeFactor=2 RMAT corpus has directed
    // eccentricity << 60 from the renumbered root (measured depth <= 8
    // at the verify scale; the -1 bucket only ever holds UNREACHED
    // pages on both sides). If Scale/EdgeFactor grow, re-derive the
    // cap alongside them or a depth->60 page would land in the -1
    // bucket on the oracle side only.
    "q_web_crawl_depth" ->
      s"""$WEB,
        |verts AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM dedges UNION ALL SELECT dst FROM dedges
        |  ) t
        |),
        |d(v, dist) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, d.dist + 1 FROM d JOIN dedges e ON d.v = e.src
        |  WHERE d.dist < 60
        |),
        |dmin AS (SELECT v, min(dist) AS dist FROM d GROUP BY v)
        |SELECT CAST(coalesce(dm.dist, -1) AS BIGINT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_pages
        |FROM verts vv LEFT JOIN dmin dm ON dm.v = vv.v
        |GROUP BY 1""".stripMargin,

    "q_web_triangles" ->
      s"""$WEB, $SYM,
        |verts AS (SELECT DISTINCT src AS v FROM edges),
        |simple AS (SELECT src, dst FROM edges WHERE src <> dst),
        |deg AS (SELECT src AS v, count(*) AS d FROM simple GROUP BY src),
        |o AS (
        |  SELECT e.src AS u, e.dst AS v FROM simple e
        |  JOIN deg a ON a.v = e.src JOIN deg b ON b.v = e.dst
        |  WHERE a.d < b.d OR (a.d = b.d AND e.src < e.dst)
        |),
        |tri AS (
        |  SELECT o1.u AS a, o1.v AS b, o2.v AS c
        |  FROM o o1 JOIN o o2 ON o1.v = o2.u
        |  JOIN o o3 ON o3.u = o1.u AND o3.v = o2.v
        |),
        |credits AS (
        |  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri
        |),
        |cnt AS (SELECT v, count(*) AS c FROM credits GROUP BY v)
        |SELECT u.url, CAST(coalesce(c.c, 0) AS BIGINT) AS triangles
        |FROM verts vv
        |LEFT JOIN cnt c ON vv.v = c.v
        |JOIN urlmap u ON u.id = vv.v
        |ORDER BY triangles DESC, u.url LIMIT 20""".stripMargin
  )
}
