package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for pretraining-batch assembly: the standard
 * concat-and-split layout (concatenate documents in a deterministic
 * shuffled order, split the token stream at fixed context-length
 * boundaries). Output maps every document to its position in the
 * packed stream: which shard (bucket), its token offset, and the
 * first/last context bin it lands in — everything a downstream
 * batch writer needs to emit fixed-length rows.
 *
 * Scale shape: a token stream is SEQUENTIAL by definition — you
 * cannot assign offsets without an order — so the one intrinsic
 * sequential stage is a running-sum window. It is bounded by
 * sharding: documents hash into `buckets` independent streams and
 * the window partitions by bucket, so per-task state is
 * corpus_tokens / buckets. At 100 TB you pick buckets so a shard is
 * a few GB (exactly how real pretraining shards are laid out — the
 * shard count IS the parallelism of the packing pass, it is not an
 * artificial salt). Within a bucket the order is md5(doc id) — a
 * deterministic shuffle, as training order should be.
 */
object Packing {

  /** Exact floor division on non-negative longs (no double rounding —
   * token offsets at corpus scale exceed 2^53). */
  private def fdiv(n: org.apache.spark.sql.Column, d: Long) =
    ((n - pmod(n, lit(d))) / d).cast("long")

  /** (id, bucket, n_tokens, start_tok, bin_id, end_bin) per document
   * with at least one token; `ctx` is the context length in tokens. */
  def concatSplit(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4, ctx: Int = 64): DataFrame = {
    require(buckets >= 1 && ctx >= 1, s"bad buckets=$buckets ctx=$ctx")
    val base = docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
        pmod(col(idCol), lit(buckets.toLong)).as("bucket"),
        md5(concat_ws(":", lit("pack"), col(idCol))).as("__k"))
      .filter(col("n_tokens") > 0)
    val w = Window.partitionBy("bucket").orderBy(col("__k"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withStart = base.select(col(idCol), col("bucket"), col("n_tokens"),
      coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("start_tok"))
    withStart.select(col(idCol), col("bucket"), col("n_tokens"),
      col("start_tok"),
      fdiv(col("start_tok"), ctx.toLong).as("bin_id"),
      fdiv(col("start_tok") + col("n_tokens") - 1, ctx.toLong).as("end_bin"))
  }
}
