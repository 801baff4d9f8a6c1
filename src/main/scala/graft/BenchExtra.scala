package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round instrumentation (guide §1): run named queries
 * one-off with a stage-metrics listener and print, per query,
 *
 *   - wall seconds (same count() action as Bench — NOT a replacement
 *     for Bench, which stays the frozen driver artifact);
 *   - stage count / task count / executor task time;
 *   - shuffle read+write bytes (the "shuffle fewer bytes" ledger);
 *   - the slowest stages with their call sites, so a regression can be
 *     attributed to an operator without the (disabled) UI.
 *
 * Usage: runMain graft.BenchExtra <sfDir> <q1>[,<q2>...] [reps]
 * Results are printed only — nothing is persisted across runs.
 */
object BenchExtra {

  final case class StageRow(
      id: Int, name: String, sec: Double, tasks: Int,
      taskSec: Double, shufRead: Long, shufWrite: Long, spill: Long)

  final class Collector extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[StageRow]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val i = e.stageInfo
        val m = i.taskMetrics
        val sec = (for {
          s <- i.submissionTime; c <- i.completionTime
        } yield (c - s) / 1e3).getOrElse(0.0)
        stages += StageRow(i.stageId, i.name, sec, i.numTasks,
          m.executorRunTime / 1e3,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled)
      }
    def reset(): Unit = synchronized { stages.clear() }
    def snapshot(): Seq[StageRow] = synchronized { stages.toVector }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Bench.newSession(cpus)
    val col = new Collector
    spark.sparkContext.addSparkListener(col)

    graft.queries.GraphQueries.warm(spark, sfDir)

    names.foreach { n =>
      (1 to reps).foreach { rep =>
        System.gc()
        col.reset()
        spark.sparkContext.setJobDescription(n)
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        // Let straggling listener events drain before snapshotting.
        Thread.sleep(300)
        val st = col.snapshot()
        val mb = 1024.0 * 1024.0
        println(f"XPROBE $n%s rep=$rep%d rows=$cnt%d wall=$wall%.2f " +
          f"stages=${st.size}%d tasks=${st.map(_.tasks).sum}%d " +
          f"taskSec=${st.map(_.taskSec).sum}%.1f " +
          f"shufReadMB=${st.map(_.shufRead).sum / mb}%.1f " +
          f"shufWriteMB=${st.map(_.shufWrite).sum / mb}%.1f " +
          f"spillMB=${st.map(_.spill).sum / mb}%.1f")
        st.sortBy(-_.sec).take(args.lift(3).map(_.toInt).getOrElse(8))
          .foreach { s =>
            println(f"  stage ${s.id}%5d ${s.sec}%6.2fs tasks=${s.tasks}%4d " +
              f"taskSec=${s.taskSec}%7.1f shufR=${s.shufRead / mb}%8.1fMB " +
              f"shufW=${s.shufWrite / mb}%8.1fMB  ${s.name.take(90)}%s")
          }
      }
    }
    spark.stop()
  }
}
