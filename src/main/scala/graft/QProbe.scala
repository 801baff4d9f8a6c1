package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing probe: run named queries once against a sf dir.
 * Usage: runMain graft.QProbe <sfDir> <query>[,<query>...] */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.newSession(cpus)
    graft.queries.GraphQueries.warm(spark, sfDir)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"QPROBE $n%s rows=$cnt%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
