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
 * Besides wall-clock, each level reports the summed executor TASK CPU
 * time of the timed run and the achieved parallelism (cpu_sec /
 * wall_sec). Wall-clock efficiency on a single socket is bounded by
 * the shared memory-bandwidth floor (local[32] has the same DRAM as
 * local[8], a real 4N cluster has 4x — BENCH.md footnotes); the
 * parallelism ratio (par_high / par_low) / 4 measures how much
 * concurrency the PLAN actually exposes, independent of that floor —
 * a serialization bottleneck (driver loop, global window, 1-partition
 * stage) would cap it regardless of memory.
 *
 * Usage: runMain graft.ScalingBench [scale] [lowCpus] [mode] [trials]
 * Prints one JSON line; also used to fill BENCH.md.
 */
object ScalingBench {

  /** Sums executor CPU/run time across finished tasks. Registered per
   * session; deltas are read around each timed run (listener events
   * are async — poll until the counter is stable). */
  private final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  /** Read the counter once it stops moving (drain the listener bus). */
  private def stableCpu(l: CpuListener): Long = {
    var prev = -1L
    var cur = l.cpuNs.get()
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (cur != prev && System.nanoTime() < deadline) {
      prev = cur
      Thread.sleep(200)
      cur = l.cpuNs.get()
    }
    cur
  }

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
    // (gteps, wallSec, iters, edges, cpuSecOfBestTrial)
    def timed(cpus: Int): (Double, Double, Int, Long, Double) = {
      val s = Bench.newSession(cpus.toString)
      val listener = new CpuListener
      s.sparkContext.addSparkListener(listener)
      val g =
        if (mode == "pages")
          WebGraph.fromPages(s.read.parquet(s"$tmp/pages"), cpus).graph.cached()
        else
          graft.core.LinkGraph.fromEdges(
            s.read.parquet(s"$tmp/edges"), "src", "dst",
            numPartitions = cpus).cached()
      def trial(warmup: Boolean): ((Double, Double, Int, Long), Double) = {
        val before = stableCpu(listener)
        val r = Bench.pagerankGteps(g, warmup)
        val cpuSec = (stableCpu(listener) - before) / 1e9
        (r, cpuSec)
      }
      // Warmup runs OUTSIDE any timed window so its CPU never leaks
      // into a trial's delta.
      Bench.pagerankGteps(g, warmup = true)
      var (best, bestCpu) = trial(warmup = false)
      for (_ <- 2 to trials) {
        val (r, c) = trial(warmup = false)
        if (r._2 < best._2) { best = r; bestCpu = c }
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (best._1, best._2, best._3, best._4, bestCpu)
    }

    val (gLow, secLow, _, edges, cpuLow) = timed(low)
    val (gHigh, secHigh, itersHigh, _, cpuHigh) = timed(high)
    val eff = (secLow / secHigh) / (high.toDouble / low)
    val parLow = cpuLow / secLow
    val parHigh = cpuHigh / secHigh
    val parEff = (parHigh / parLow) / (high.toDouble / low)
    println(
      f"""{"scale":$scale%d,"mode":"$mode%s","edges":$edges%d,""" +
      f""""low_cpus":$low%d,"high_cpus":$high%d,""" +
      f""""low_sec":$secLow%.3f,"high_sec":$secHigh%.3f,""" +
      f""""low_gteps":$gLow%.6f,"high_gteps":$gHigh%.6f,""" +
      f""""low_cpu_sec":$cpuLow%.3f,"high_cpu_sec":$cpuHigh%.3f,""" +
      f""""low_parallelism":$parLow%.2f,"high_parallelism":$parHigh%.2f,""" +
      f""""iters":$itersHigh%d,"scaling_efficiency":$eff%.3f,""" +
      f""""parallel_efficiency":$parEff%.3f}""")
  }
}
