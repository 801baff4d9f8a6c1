package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data curation: token counting, quality
 * scoring, language id, document fingerprinting. All expressions are
 * built-in (codegen'd, whole-stage) and have exact DuckDB oracle
 * equivalents — no UDFs anywhere.
 */
object TextAnalysis {

  /** Whitespace-token count (regex '\S+' occurrences). */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).cast("long")

  /**
   * Blocklist scrubbing (the bad-word / sensitive-term tagger of a
   * training pipeline): per document, the number of case-insensitive
   * whole-word blocklist hits and the md5 fingerprint of the redacted
   * lowercase text (hits replaced by `[X]`). Pure per-row expression
   * work — embarrassingly parallel, no shuffle at all; the pattern is
   * a plain alternation so Java regex and RE2 (DuckDB) agree exactly.
   * Terms are restricted to word characters so the compiled pattern
   * can never diverge between engines.
   */
  def scrub(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[A-Za-z0-9]+")),
      s"blocklist terms must be non-empty and alphanumeric, got $terms")
    val pat = "\\b(" + terms.mkString("|") + ")\\b"
    val low = lower(col(textCol))
    docs.select(col(idCol),
      regexp_count(low, lit(pat)).cast("long").as("n_hits"),
      md5(regexp_replace(low, pat, "[X]")).as("clean_fp"))
  }

  /** Per-doc token count frame: (id, n_tokens). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))

  /**
   * Corpus-wide top-k vocabulary: the k most frequent lowercase
   * tokens with their counts, ties broken by token ascending.
   * Scale shape: the token count is one hash aggregation with
   * map-side combine (the vocabulary frame is already tiny relative
   * to the corpus), and the global top-k compiles to
   * `TakeOrderedAndProject` — per-partition bounded top-k merged at
   * the driver, O(k) everywhere, never a window or a full sort.
   */
  def vocabTopK(
      docs: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        x => x =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
  }

  /**
   * Source mixing weights (the data-mixing step of a pretraining
   * pipeline): per source, document and token counts plus the
   * uniform-target upsampling weight
   * floor(total_docs * 1e6 / (n_sources * docs_in_source)) —
   * weight > 1e6 means the source is under-represented vs a uniform
   * mix. One map-side-combinable aggregation per source plus one
   * broadcast of the 1-row corpus totals.
   */
  def mixingWeights(
      docs: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val per = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).as("n_tokens"))
    val tot = per.agg(sum("n_docs").as("__total"),
      count(lit(1)).as("__nsrc"))
    val num = col("__total") * 1000000L
    val den = col("__nsrc") * col("n_docs")
    per.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        ((num - pmod(num, den)) / den).cast("long").as("weight_micro"))
  }

  /**
   * Quality features, all as integers (micro-ratios) for stable
   * comparison: character count, token count, mean token length,
   * punctuation ratio, digit ratio, stopword ratio, and a composite
   * quality_micro = stop_ratio-weighted length-normalized score.
   */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nToks = tokenCount(t)
    val punct = regexp_count(t, lit("[.,;:!?]")).cast("long")
    val digits = regexp_count(t, lit("[0-9]")).cast("long")
    val stops = regexp_count(t,
      lit("\\b(the|a|an|and|of|to|in|is|it|that)\\b")).cast("long")
    // Exact integer division (`/` on longs widens to double, whose
    // rounding could disagree with the oracle's integer `//`): subtract
    // the remainder first so the double division is exact.
    def microDiv(n: Column, d: Column): Column = {
      val num = n * 1000000L
      val den = greatest(d, lit(1L))
      ((num - pmod(num, den)) / den).cast("long")
    }
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      microDiv(nChars, nToks).as("mean_tok_len_micro"),
      microDiv(punct, nChars).as("punct_micro"),
      microDiv(digits, nChars).as("digit_micro"),
      microDiv(stops, nToks).as("stop_micro"))
  }

  /** Stopword lists per language for the n-gram/stopword-vote language
   * id heuristic. Deterministic; ties -> alphabetical first. */
  val LangStopwords: Seq[(String, String)] = Seq(
    "de" -> "\\b(und|der|die|das|mit|von|nicht|ist)\\b",
    "en" -> "\\b(the|a|and|of|to|in|is|that)\\b",
    "fr" -> "\\b(et|le|la|les|des|dans|avec|est)\\b")

  /** (id, lang_pred): argmax of stopword votes; 'unk' when all zero.
   * Alphabetical order breaks ties (de < en < fr). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val scored = docs.select(
      (col(idCol) +: LangStopwords.map { case (l, re) =>
        regexp_count(t, lit(re)).cast("long").as(s"s_$l")
      }): _*)
    val best = LangStopwords.map(_._1).foldLeft((lit(0L), lit("unk"))) {
      case ((bestScore, bestLang), l) =>
        val s = col(s"s_$l")
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lit(l)).otherwise(bestLang))
    }._2
    scored.select(col(idCol), best.as("lang_pred"))
  }

  /** Canonical fingerprint: md5 of lowercased, whitespace-collapsed,
   * trimmed text — the exact-dedup key robust to formatting noise. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " "))).as("fp"))

  /**
   * Repetition metrics (the Gopher/Dolma-style quality filters that
   * catch boilerplate and degenerate generations): per document, the
   * fraction of token BIGRAMS occupied by the single most frequent
   * bigram (`top_bigram_micro`) and the fraction of token TRIGRAMS
   * that are repeats of an earlier one (`dup_trigram_micro`), both as
   * exact integer micros. N-grams are built with slice/zip_with (pure
   * codegen'd expressions); the counting is two (id, gram) hash
   * aggregations — map-side combinable, no windows, no UDFs, so a
   * boilerplate-heavy shard costs one combine pass, not a sort.
   */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def microDiv(n: Column, d: Column): Column = {
      val num = n * 1000000L
      val den = greatest(d, lit(1L))
      ((num - pmod(num, den)) / den).cast("long")
    }
    def grams(k: Int): Column = {
      val ts = filter(split(lower(col(textCol)), "\\s+"), x => x =!= "")
      val m = size(ts) - (k - 1)
      val parts = (1 to k).map(i => slice(ts, lit(i), m))
      val joined = parts.reduceLeft((acc, nxt) =>
        zip_with(acc, nxt, (a, b) => concat(a, lit(" "), b)))
      when(m >= 1, joined).otherwise(array())
    }
    val base = docs.select(col(idCol).as("__id"),
      explode_outer(grams(2)).as("bg"))
    val bstat = base.groupBy("__id", "bg").count()
      .groupBy("__id").agg(
        sum(when(col("bg").isNotNull, col("count")).otherwise(0L))
          .as("n_bigrams"),
        max(when(col("bg").isNotNull, col("count")).otherwise(0L))
          .as("top_bg"))
    val tstat = docs.select(col(idCol).as("__id"),
        explode_outer(grams(3)).as("tg"))
      .groupBy("__id", "tg").count()
      .groupBy("__id").agg(
        sum(when(col("tg").isNotNull, col("count")).otherwise(0L))
          .as("n_trigrams"),
        sum(when(col("tg").isNotNull, col("count") - 1).otherwise(0L))
          .as("dup_tg"))
    bstat.join(tstat, Seq("__id"))
      .select(col("__id").as(idCol),
        col("n_bigrams"),
        microDiv(col("top_bg"), col("n_bigrams")).as("top_bigram_micro"),
        col("n_trigrams"),
        microDiv(col("dup_tg"), col("n_trigrams")).as("dup_trigram_micro"))
  }
}
