package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventQueries, GraphQueries, PropertyQueries, TextQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   * "Top-10 urls by PageRank over the web corpus" — the reference's own
   * showcase query (README.md:26-32) over the full pages→extract→
   * renumber→PageRank pipeline. */
  def entry(spark: SparkSession): DataFrame =
    WebQueries.queries("q_web_pagerank_top10")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraphQueries.queries ++ WebQueries.queries ++ TextQueries.queries ++
      EventQueries.queries ++ PropertyQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The q_web_* oracles read the corpus dump
    * Verify writes (input data, not engine output) and recompute the
    * whole extract→renumber→algorithm pipeline in SQL. */
  def oracleSql: Map[String, String] =
    GraphQueries.oracleSql ++ WebQueries.oracleSql ++
      TextQueries.oracleSql ++ EventQueries.oracleSql ++
      PropertyQueries.oracleSql
}
