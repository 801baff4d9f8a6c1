package graft

import graft.algos.Bicliques

class BicliquesSpec extends SparkSpec {

  // Machines 1..4 share features {10, 11, 14} completely; machine 5
  // adds {10, 12}; machine 6 only {13}. Machine 2 is flagged bad.
  private lazy val edges = {
    val s = spark
    import s.implicits._
    val pairs =
      (1 to 4).flatMap(m => Seq((m.toLong, 10L), (m.toLong, 11L), (m.toLong, 14L))) ++
        Seq((5L, 10L), (5L, 12L), (6L, 13L))
    pairs.map { case (src, dst) => (src, dst, if (src == 2L) 1 else 0) }
      .toDF("src", "dst", "flag")
  }

  test("support=1.0 finds the complete 4x3 biclique once (same-set skip)") {
    val r = Bicliques.findBicliques(edges, minFeatures = 1, minMachines = 3)
    val stats = r.stats.collect()
    assert(stats.length == 1)
    val s0 = stats.head
    assert(s0.getInt(0) == 0)
    assert(s0.getLong(1) == 7L, "total = 4 machines + 3 features")
    assert(s0.getLong(2) == 4L && s0.getLong(3) == 3L)
    // one flagged machine over total=7 (reference divides by total)
    assert(s0.getLong(4) == math.round(1e6 / 7))

    val members = r.members.collect()
      .map(x => (x.getInt(0), x.getString(1), x.getInt(2))).toSet
    val want = (1 to 4).map(m => (0, m.toString, 0)).toSet ++
      Set("10", "11", "14").map(f => (0, f, 1))
    assert(members == want)
    // feature 14 has the same machine set as 11 -> skipped, no id 1;
    // feature 10's own-machine-set candidate set is just {10} -> no emit
  }

  test("support<1 emits per surviving feature in degree order; k caps") {
    val r = Bicliques.findBicliques(edges, support = 0.75,
      minFeatures = 1, minMachines = 3)
    val stats = r.stats.collect().sortBy(_.getInt(0))
    assert(stats.length == 2)
    // id 0 = feature 10 (deg 5): goal int(5*0.75)=3 -> C={10,11,14}
    assert(stats(0).getLong(2) == 5L && stats(0).getLong(3) == 3L)
    // id 1 = feature 11 (deg 4): goal 3 -> same C; 14 skipped (same set)
    assert(stats(1).getLong(2) == 4L && stats(1).getLong(3) == 3L)
    val m0 = r.members.filter("id = 0 and type = 0").collect()
      .map(_.getString(1)).toSet
    assert(m0 == Set("1", "2", "3", "4", "5"))

    val capped = Bicliques.findBicliques(edges, k = 1, support = 0.75,
      minFeatures = 1, minMachines = 3)
    assert(capped.stats.collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("maxIter and minMachines prune features before co-occurrence") {
    // maxIter=1 only visits feature 10 (deg 5); its candidate set at
    // support=1 is just itself -> nothing emitted
    val r1 = Bicliques.findBicliques(edges, maxIter = 1,
      minFeatures = 1, minMachines = 3)
    assert(r1.stats.count() == 0)
    // minMachines above every degree -> nothing emitted
    val r2 = Bicliques.findBicliques(edges, minFeatures = 1, minMachines = 99)
    assert(r2.stats.count() == 0)
  }

  test("no global window anywhere in the biclique plans") {
    // The feature summary is vocabulary-sized at corpus scale: both
    // ranking stages must ride DenseRank's __pid-partitioned windows,
    // never a `over (order by …)` with an empty partition spec that
    // funnels every feature through one task. Capture EVERY plan
    // executed during the call (DenseRank materializes intermediates).
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val global = qe.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) plans.add("GLOBAL_WINDOW:\n" + global.head)
        plans.add("plan")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = Bicliques.findBicliques(edges, support = 0.75,
        minFeatures = 1, minMachines = 3)
      r.members.count(); r.stats.count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      Thread.sleep(500)
      val bad = plans.toArray.map(_.toString).filter(_.startsWith("GLOBAL_WINDOW"))
      assert(bad.isEmpty, bad.mkString("\n"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("maxMachineDegree caps the co-occurrence fanout") {
    // support=0.2 -> goal(10) = int(5*0.2) = 1, so feature 12 (shared
    // with 10 only through machine 5) makes it into C(10) uncapped.
    val exact = Bicliques.findBicliques(edges, support = 0.2,
      minFeatures = 1, minMachines = 3)
    val exactFeats = exact.members.filter("id = 0 and type = 1")
      .collect().map(_.getString(1)).toSet
    assert(exactFeats.contains("12"), "uncapped run sees 12 via machine 5")
    // cap=1 keeps only machine 6 (degree 1): machines 1-5 (degrees
    // 3,3,3,3,2) are dropped from the pair counts, so no kept feature
    // can reach its goal and nothing is emitted — the quadratic
    // fanout of the dropped machines never happens.
    val capped = Bicliques.findBicliques(edges, support = 0.2,
      minFeatures = 1, minMachines = 3, maxMachineDegree = 1)
    assert(capped.stats.count() == 0)
  }

  test("chunked co-occurrence is exact under an adversarial mega-machine") {
    // One machine (99) holding 60 features would put a 60^2 pair
    // fanout through a single join bucket; with coocChunkSize = 16 the
    // count runs over ceil(60/16) = 4 hash chunks per side (every
    // bucket bounded by 16^2 pair rows) and must produce EXACTLY the
    // same bicliques as the plain single-bucket plan.
    val s = spark
    import s.implicits._
    val mega = (0L until 60L).map(f => (99L, 100L + f, 0))
    // Features 100..104 are also shared by machines 1..3, so some
    // kept features genuinely straddle the mega machine's chunks.
    val sharedTail = for {
      m <- 1L to 3L; f <- 100L to 104L
    } yield (m, f, 0)
    val df = (mega ++ sharedTail).toDF("src", "dst", "flag")

    def rows(r: Bicliques.Result) = (
      r.stats.collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet,
      r.members.collect().map(x => (x.getInt(0), x.getString(1),
        x.getInt(2))).toSet)

    val plain = rows(Bicliques.findBicliques(df, support = 0.5,
      minFeatures = 1, minMachines = 2))
    val chunked = rows(Bicliques.findBicliques(df, support = 0.5,
      minFeatures = 1, minMachines = 2, coocChunkSize = 16))
    assert(chunked == plain, "chunked co-occurrence diverged from exact")
    assert(plain._1.nonEmpty, "fixture must emit at least one biclique")
  }
}
