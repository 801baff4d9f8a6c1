package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Ann, Dedup, Multimodal, TextAnalysis}

class DedupSpec extends SparkSpec {
  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (3L, "completely different content with nothing shared at all here"),
      (4L, "the quick brown fox jumps over the lazy dog again and agaim"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under min id") {
    val got = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("minhash LSH finds near-identical pair, misses unrelated") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = Dedup.lshCandidates(sig, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical text => identical sig
    assert(pairs.contains((0L, 4L)) || pairs.contains((1L, 4L)),
      "one-char diff should collide in some band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not pair")
  }

  test("near-dup groups are the transitive closure of LSH candidates") {
    val got = Dedup.nearDupGroups(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc gets a group; the unrelated doc is its own group
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got(3L) == 3L)
    // the near-identical family collapses to min id 0 — including any
    // member that only reaches 0 THROUGH another member (closure)
    val pairs = Dedup.lshCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val family = Set(0L, 1L) ++
      Set(2L, 4L).filter(d => pairs.exists(p => p._1 == d || p._2 == d))
    family.foreach(d => assert(got(d) == 0L, s"doc $d group ${got(d)}"))
  }

  test("ngram jaccard: identical=1e6, disjoint=0") {
    val s = spark
    import s.implicits._
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("a", "b")
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(j((0L, 1L)) == 1000000L)
    assert(j((0L, 3L)) < 100000L)
  }

  test("contamination flags only corpus docs sharing n-grams with the benchmark") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"), // overlaps both
      (21L, "zzz 0123456789 unrelated corpus qqq xyz"),     // clean
      (22L, "the quick brown fox sat still"))               // overlaps bench 0 only
      .toDF("doc_id", "text")
    val bench = Seq(
      (0L, "the quick brown fox jumps far"),
      (1L, "jumps over the lazy dog daily"))
      .toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, "doc_id", "text",
        bench, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!got.contains(21L), "clean doc must produce no row")
    assert(got.contains(20L) && got(20L)._2 == 2L, s"doc 20: $got")
    assert(got.contains(22L) && got(22L)._2 == 1L, s"doc 22: $got")
    // dirty_grams counts DISTINCT shared grams: doc 20 shares the full
    // "the quick brown fox jumps" window with bench 0 (13 positions)
    // and "jumps over the lazy dog" with bench 1 (11 positions)
    assert(got(20L)._1 > got(22L)._1, s"doc 20 dirtier than 22: $got")
  }

  test("simhash: near-identical texts have small hamming distance") {
    val sim = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sim(0L), sim(1L)) == 0)
    assert(ham(sim(0L), sim(4L)) <= 8)
    assert(ham(sim(0L), sim(3L)) > 8)
  }

  test("banded simhash duplicates equal the naive within-block join") {
    val s = spark
    import s.implicits._
    // one block so the naive join is all-pairs; banded must match it
    val blocked = docs.withColumn("source", lit("x"))
    val sim = Dedup.simhash(blocked, "doc_id", "text")
    for (h <- Seq(0, 3, 6, 10)) {
      val got = Dedup.simhashDuplicates(sim, blocked, "doc_id", "source", h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sigs = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= h
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"maxHamming=$h")
    }
  }

  test("passage dedup: first (doc, idx) occurrence owns each chunk") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (0L, "a b c d e f g"), // chunks(3): "a b c" "d e f" "g"
      (1L, "a b c x y z"),   // "a b c" duplicates doc 0 idx 0
      (2L, ""),              // no tokens -> 0 passages
      (3L, "g"))             // duplicates doc 0 idx 2
      .toDF("doc_id", "text")
    val got = Dedup.passageDedup(d, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      0L -> ((3L, 3L)), 1L -> ((2L, 1L)), 2L -> ((0L, 0L)),
      3L -> ((1L, 0L))))
  }
}

class AnnSpec extends SparkSpec {
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("brute-force cosine topk is deterministic and self-consistent") {
    val q = emb.filter(col("vec_id") < 5)
    val r1 = Ann.cosineTopK(emb, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val r2 = Ann.cosineTopK(emb, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(r1 == r2)
    assert(r1.keySet.map(_._1).size == 5)
  }

  test("LSH ANN reaches >=40% recall@5 vs exact, with fewer candidates") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.cosineTopK(emb, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshCosineTopK(emb, q, "vec_id", "embedding", 5,
      tables = 12, planes = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("IVF ANN recall vs exact; determinism; probes bound candidates") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Ann.cosineTopK(emb, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def ivf(probes: Int): Set[(Long, Long)] =
      Ann.ivfCosineTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, probes = probes).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ivf(4)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall")
    // more probes -> recall monotonically non-decreasing (full probe =
    // exact, since every bucket is searched)
    val full = ivf(16)
    assert(full == exact, "probing all centroids must equal exact top-k")
    assert(ivf(4) == approx) // deterministic
  }

  test("cosineTopK refuses an oversized query set unless overridden") {
    val q = emb.filter(col("vec_id") < 20)
    val e = intercept[IllegalArgumentException] {
      Ann.cosineTopK(emb, q, "vec_id", "embedding", 3, maxQueries = 10)
        .count()
    }
    assert(e.getMessage.contains("lshCosineTopK"))
    // override works
    assert(Ann.cosineTopK(emb, q, "vec_id", "embedding", 3,
      maxQueries = -1).count() > 0)
  }

  test("ANN paths execute no rank window: bounded min-k only") {
    // The per-query re-rank must stay an O(k)-per-group aggregation:
    // a row_number() window partitioned by query_id puts a query's
    // ENTIRE candidate set (a probe/LSH bucket = corpus fraction at
    // scale) in one task. Pin every ANN variant window-free.
    val q = emb.filter(col("vec_id") < 5)
    val plans = Seq(
      Ann.cosineTopK(emb, q, "vec_id", "embedding", 5),
      Ann.lshCosineTopK(emb, q, "vec_id", "embedding", 5,
        tables = 2, planes = 4),
      Ann.ivfCosineTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 8, probes = 2))
    plans.foreach { df =>
      df.count() // finalize executedPlan (AQE)
      val windows = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty,
        s"rank window in ANN plan:\n${df.queryExecution.executedPlan}")
    }
  }

  test("nearDupPairs sub-bucketing keeps same-bucket exactness") {
    val all = Ann.nearDupPairs(emb, "vec_id", "embedding", "label", 800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sub = Ann.nearDupPairs(emb, "vec_id", "embedding", "label", 800000L,
      subPlanes = 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate path returns a subset of the exact pairs, and near
    // vectors mostly share sign buckets so it should find most of them
    assert(sub.subsetOf(all))
    if (all.nonEmpty) assert(sub.size.toDouble / all.size >= 0.5)
  }

  test("nearDupPairs mega-block guard: exact below bound, bounded above") {
    // Blocks at or under maxBlockRows must be bit-identical to the
    // unguarded plan (guard contributes sub = 0); a block past the
    // bound is sub-bucketed so no join bucket carries the whole block.
    val unguarded = Ann.nearDupPairs(emb, "vec_id", "embedding", "label",
        300000L, maxBlockRows = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Ann.nearDupPairs(emb, "vec_id", "embedding", "label",
        300000L, maxBlockRows = 1000L) // fixture blocks are far smaller
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == unguarded, "guard changed an under-bound block")

    // Adversarial mega-block: every vector in ONE block, bound 8 ->
    // ceil(log2(n/8)) sign bits split it; result is a subset (LSH
    // recall trade) and the per-bucket occupancy is bounded well under
    // the block size.
    val one = emb.withColumn("label", org.apache.spark.sql.functions.lit(0))
    val split = Ann.nearDupPairs(one, "vec_id", "embedding", "label",
      300000L, maxBlockRows = 8L)
    val splitPairs = split.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allOne = Ann.nearDupPairs(one, "vec_id", "embedding", "label",
      300000L, maxBlockRows = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(splitPairs.subsetOf(allOne))
    // Prove the fanout was actually split: with a threshold that keeps
    // EVERY compared pair, the guarded run emits fewer pairs than the
    // n(n-1)/2 all-pairs total — i.e. at least two sub-buckets exist
    // and no single join bucket carried the whole block.
    val n = one.count()
    assert(n > 8, "fixture must exceed the forced bound")
    val comparedGuarded = Ann.nearDupPairs(one, "vec_id", "embedding",
      "label", Long.MinValue, maxBlockRows = 8L).count()
    assert(comparedGuarded < n * (n - 1) / 2,
      s"guard did not split the mega-block ($comparedGuarded pairs)")
  }
}

class TextAnalysisSpec extends SparkSpec {
  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the cat and the dog, in a house."),
      (1L, "und der hund ist nicht die katze"),
      (2L, "le chat et la maison dans les bois"),
      (3L, "zzz qqq 123 456"))
      .toDF("doc_id", "text")
  }

  test("token count and quality features") {
    val q = TextAnalysis.quality(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(0L).getAs[Long]("n_tokens") == 8L)
    assert(q(3L).getAs[Long]("digit_micro") > 0L)
    assert(q(0L).getAs[Long]("stop_micro") > q(3L).getAs[Long]("stop_micro"))
  }

  test("langid votes match expected language, unk for gibberish") {
    val got = TextAnalysis.langId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "unk"))
  }

  test("repetition metrics: hand-computed n-gram fractions") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (0L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> top 3/5;
                           // trigrams: aba,bab,aba,bab -> dup 2/4
      (1L, "x y z"),       // 2 distinct bigrams, 1 trigram, no repeats
      (2L, "solo"),        // no bigrams/trigrams at all
      (3L, ""))            // empty text
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(0L) == (5L, 600000L, 4L, 500000L))
    assert(r(1L) == (2L, 500000L, 1L, 0L))
    assert(r(2L) == (0L, 0L, 0L, 0L))
    assert(r(3L) == (0L, 0L, 0L, 0L))
  }

  test("fingerprint collapses case and whitespace") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "Hello   World"), (1L, "hello world"), (2L, "other"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("scrub: whole-word case-insensitive hits; redaction fingerprint") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (0L, "a FOX runs"), (1L, "a dog runs"), (2L, "a cat runs"),
      (3L, "foxes run")) // 'fox' must NOT match inside 'foxes'
      .toDF("doc_id", "text")
    val got = TextAnalysis.scrub(d, "doc_id", "text", Seq("fox", "dog"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(0L)._1 == 1L && got(1L)._1 == 1L)
    assert(got(2L)._1 == 0L && got(3L)._1 == 0L)
    // both redact to "a [X] runs" -> same fingerprint; cat differs
    assert(got(0L)._2 == got(1L)._2)
    assert(got(0L)._2 != got(2L)._2)
    intercept[IllegalArgumentException] {
      TextAnalysis.scrub(d, "doc_id", "text", Seq("a.b"))
    }
  }

  test("vocab top-k: counts, tie-break by token, bounded take plan") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "b a a C c"), (1L, "a b z")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(d, "text", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // counts: a=3, b=2, c=2 (case folded), z=1; tie b<c
    assert(got.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 2L)))
    val plan = TextAnalysis.vocabTopK(d, "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mixing weights: uniform-target floor micros") {
    val s = spark
    import s.implicits._
    // 3 docs in x, 1 doc in y -> total=4, nsrc=2:
    // w(x) = floor(4e6 / (2*3)) = 666666, w(y) = floor(4e6/2) = 2000000
    val d = Seq(
      (0L, "t t", "x"), (1L, "t", "x"), (2L, "t", "x"), (3L, "t t t", "y"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.mixingWeights(d, "text", "source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("x") == ((3L, 4L, 666666L)))
    assert(got("y") == ((1L, 3L, 2000000L)))
  }
}

class PackingSpec extends SparkSpec {
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map("%02x".format(_)).mkString

  test("concat-and-split offsets equal the host prefix sums per shard") {
    val s = spark
    import s.implicits._
    val rows = (0L to 9L).map(i =>
      (i, Seq.fill(3 + (i % 4).toInt)("w").mkString(" "))) :+
      (10L, "") // token-less doc is excluded
    val d = rows.toDF("doc_id", "text")
    val got = graft.pipeline.Packing
      .concatSplit(d, "doc_id", "text", buckets = 2, ctx = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    // host mirror: same bucket, md5 order, running sums
    val want = (0L to 9L).map { i =>
      (i, i % 2, 3L + (i % 4), md5hex(s"pack:$i"))
    }.groupBy(_._2).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(x => (x._4, x._1)).map { case (id, b, n, _) =>
        val start = cum; cum += n
        id -> ((b, n, start, start / 5, (start + n - 1) / 5))
      }
    }
    assert(got.size == 10 && !got.contains(10L))
    want.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp")
    }
  }
}

class MultimodalSpec extends SparkSpec {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media plumbing: stable schema, deterministic stub decode") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val dec = Multimodal.stubDecode(media, "doc_id")
    assert(dec.columns.toSeq == Seq("doc_id", "media_type", "n_bytes",
      "width", "height", "duration_s", "content_hash"))
    val rows = dec.collect()
    assert(rows.forall { r =>
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      w >= 1 && w <= 1920 && h >= 1 && h <= 1080
    })
    // deterministic across runs
    val again = Multimodal.stubDecode(media, "doc_id").collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("frame sampling only videos, within duration") {
    val dec = Multimodal.stubDecode(
      Multimodal.asMediaTable(docs, "doc_id", "text"), "doc_id")
    val frames = Multimodal.sampleFrames(dec, "doc_id", stepS = 5)
    val joined = frames.join(dec, Seq("doc_id"))
    assert(joined.filter(col("media_type") =!= "video/mp4").count() == 0L)
    assert(joined.filter(col("frame_ts_s") >= col("duration_s")).count() == 0L)
  }

  test("stub features have requested dimension") {
    val dec = Multimodal.stubDecode(
      Multimodal.asMediaTable(docs, "doc_id", "text"), "doc_id")
    val f = Multimodal.stubFeatures(dec, "doc_id", d = 8)
    assert(f.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
  }
}
