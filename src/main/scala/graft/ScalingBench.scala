package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.PagesCorpus
import graft.extract.WebGraph

/**
 * North-rule scaling evidence: run the IDENTICAL PageRank job on the
 * IDENTICAL materialized input at two parallelism levels (local[N] and
 * local[4N], the sandbox stand-in for N vs 4N executors) and report
 * throughput at both plus efficiency = (T_N / T_4N) / 4.
 *
 * Usage: runMain graft.ScalingBench [scale] [lowCpus] [outDir]
 * Prints one JSON line; also used to fill BENCH.md.
 */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(16)
    val low = args.lift(1).map(_.toInt).getOrElse(8)
    val mode = args.lift(2).getOrElse("edges") // edges | pages
    val high = low * 4
    val tmp = java.nio.file.Files.createTempDirectory("graft-scaling").toString

    // Materialize the input ONCE so both runs read identical parquet.
    // "pages" mode exercises the full extract pipeline; "edges" mode
    // (default) generates the RMAT edge table directly, which lets the
    // scaling measurement target the PageRank job itself at scales
    // where html rendering would dominate generation time.
    locally {
      val s = Bench.newSession(high.toString)
      import s.implicits._
      if (mode == "pages") {
        PagesCorpus.pages(s, 42L, scale, 16).toDF()
          .write.mode("overwrite").parquet(s"$tmp/pages")
      } else {
        val numE = (1L << scale) * 16
        s.range(numE)
          .map(i => graft.corpus.Rmat.edge(42L, i, scale))
          .toDF("src", "dst")
          .write.mode("overwrite").parquet(s"$tmp/edges")
      }
      s.stop()
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Best-of-N timed runs per parallelism level: the sandbox host is
    // co-tenant noisy (the identical 8-thread job measured 175 s and
    // 315 s in back-to-back sessions), and best-of converges on the
    // uncontended time the north rule is about. One warmup first, like
    // the reference benchmark (benchmarks/python_e2e/main.py:34-47).
    val trials = args.lift(3).map(_.toInt).getOrElse(3)
    def timed(cpus: Int): (Double, Double, Int, Long) = {
      val s = Bench.newSession(cpus.toString)
      val g =
        if (mode == "pages")
          WebGraph.fromPages(s.read.parquet(s"$tmp/pages"), cpus).graph.cached()
        else
          graft.core.LinkGraph.fromEdges(
            s.read.parquet(s"$tmp/edges"), "src", "dst",
            numPartitions = cpus).cached()
      var best = Bench.pagerankGteps(g, warmup = true)
      for (_ <- 2 to trials) {
        val r = Bench.pagerankGteps(g, warmup = false)
        if (r._2 < best._2) best = r
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      best
    }

    val (gLow, secLow, _, edges) = timed(low)
    val (gHigh, secHigh, itersHigh, _) = timed(high)
    val eff = (secLow / secHigh) / (high.toDouble / low)
    println(
      f"""{"scale":$scale%d,"mode":"$mode%s","edges":$edges%d,""" +
      f""""low_cpus":$low%d,"high_cpus":$high%d,""" +
      f""""low_sec":$secLow%.3f,"high_sec":$secHigh%.3f,""" +
      f""""low_gteps":$gLow%.6f,"high_gteps":$gHigh%.6f,""" +
      f""""iters":$itersHigh%d,"scaling_efficiency":$eff%.3f}""")
  }
}
