package graft

import org.apache.spark.sql.functions._

import graft.corpus.PagesCorpus
import graft.pipeline.{Ann, Dedup, Packing}

/**
 * Scale probes for the round-5 LLM-pipeline operators (VERDICT r5 #7:
 * passage dedup, sequence packing and tf-idf had gate-SF oracles but
 * no large-input evidence) plus the IVF quantizer sizing probe
 * (VERDICT r5 #2). Inputs are the deterministic RMAT-backed synthetic
 * corpus (the same generator the bipartiteness probe rides) — nothing
 * is read from or written to /root/testdata, and nothing persists.
 *
 * Usage: runMain graft.PipelineProbe [corpusScale] [nVecs] [cpus]
 */
object PipelineProbe {

  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(17)
    val nVecs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = Bench.newSession(cpus.toString)
    val col0 = new BenchExtra.Collector
    spark.sparkContext.addSparkListener(col0)

    def timed[T](tag: String, rows: => Long): Unit = {
      col0.reset()
      System.gc()
      val t0 = System.nanoTime()
      val n = rows
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val st = col0.snapshot()
      val mb = 1024.0 * 1024.0
      println(f"PROBE $tag%s rows=$n%d sec=$sec%.2f " +
        f"rows_per_sec=${n / sec}%.0f " +
        f"shufWriteMB=${st.map(_.shufWrite).sum / mb}%.1f " +
        f"tasks=${st.map(_.tasks).sum}%d")
    }

    // ---- text corpus (scale 17 => 131k docs of extracted web text) --
    val docs = PagesCorpus.pages(spark, 42L, scale, 16).toDF()
      .select(col("url"), xxhash64(col("url")).as("doc_id"), col("text"))
      .persist()
    val nDocs = docs.count()
    println(s"PROBE corpus scale=$scale docs=$nDocs")

    timed("passage_dedup",
      Dedup.passageDedup(docs, "url", "text", window = 20).count())

    timed("packing",
      Packing.concatSplit(docs, "doc_id", "text", buckets = 64, ctx = 2048)
        .count())

    timed("tfidf_topk", {
      // The q_doc_tfidf_topk shape at corpus scale: rational idf,
      // per-doc-bounded rank window.
      import org.apache.spark.sql.expressions.Window
      val toks = docs.select(col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
          .as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, Seq("token"))
        .select(col("doc_id"), col("token"),
          round(lit(1e6) * col("tf") / col("df"), 0).cast("long")
            .as("score_micro"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("token").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3).count()
    })
    docs.unpersist()

    // ---- IVF quantizer sizing (VERDICT r5 #2) ----------------------
    // Deterministic synthetic embeddings; bucket occupancy IS the
    // per-probe candidate set size, so record it per quantizer size.
    val dim = 16
    val emb = spark.range(nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => (conv(substring(md5(concat_ws(":", col("id"), d)), 1, 6),
            16, 10).cast("long") % 1000L) / 500.0 - 1.0)
          .as("embedding"))
      .persist()
    emb.count()
    val queries = emb.filter(col("vec_id") < 20)

    Seq(16, 0).foreach { ncArg => // 16 = old fixed default; 0 = auto √N
      val nc = if (ncArg > 0) ncArg
        else math.ceil(math.sqrt(nVecs.toDouble)).toInt
      // Bucket occupancy under this quantizer (re-derives the pinned
      // md5 centroid sampling + nearest-centroid assignment).
      val cents = emb
        .withColumn("__h", md5(concat_ws(":", lit(42L), col("vec_id"))))
        .orderBy(col("__h"), col("vec_id")).limit(nc)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val occ = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          struct(
            round(Ann.cosine(col("embedding").cast("array<double>"),
              col("centroid").cast("array<double>")) * 1e6, 0)
              .cast("long").as("cm"),
            (-col("centroid_id")).as("nc")).as("key"))
        .groupBy("vec_id").agg(max("key").as("pick"))
        .groupBy(col("pick.nc")).agg(count(lit(1)).as("bucket"))
        .agg(max("bucket"), avg("bucket")).head()
      timed(s"ivf_nc=$nc",
        Ann.ivfCosineTopK(emb, queries, "vec_id", "embedding", k = 5,
          nCentroids = ncArg, probes = 2).count())
      println(f"PROBE ivf_nc=$nc%d bucket_max=${occ.getLong(0)}%d " +
        f"bucket_avg=${occ.getDouble(1)}%.1f " +
        f"candidates_per_query≈${2 * occ.getDouble(1)}%.0f")
    }
    emb.unpersist()
    spark.stop()
  }
}
