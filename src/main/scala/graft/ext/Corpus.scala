package graft.ext

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operations for training-data curation: reproducible
  * stratified sampling, token-budget shard packing, and corpus n-gram
  * statistics. All are deterministic — a re-run, a backfill, or a second
  * cluster produces the identical output, which is what makes them safe to
  * use as stages of a 100 TB pipeline (any partition can be recomputed
  * without global coordination).
  */
object Corpus {

  /** Deterministic stratified sampling: keep a row iff its key's md5 bucket
    * (unsigned mod `buckets`, see [[graft.functions.Md5Bucket]]) falls below
    * the stratum's threshold. rate=0.3 keeps ~30% of the stratum — the SAME
    * ~30% every run, because membership is a pure function of the key.
    * No shuffle: the filter composes with the scan (narrow, codegen'd).
    *
    * `rates` maps stratum value -> keep fraction; strata not listed use
    * `defaultRate`. Thresholds are rounded to whole buckets.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    def thr(rate: Double): Int = math.round(rate * buckets).toInt
    val threshold = rates.foldLeft(when(lit(false), lit(0))) {
      case (acc, (stratum, rate)) => acc.when(stratumCol === stratum, lit(thr(rate)))
    }.otherwise(lit(thr(defaultRate)))
    df.withColumn("bucket", HashFunctions.md5_bucket(keyCol, buckets))
      .filter(col("bucket") < threshold)
  }

  /** Pack documents into fixed token-budget shards in `orderCol` order:
    * shard_id = exclusive-prefix-tokens / capacity, shard_offset = the
    * position of the doc's first token within its shard. Contiguous packing
    * is the layout training-data loaders want (stable doc order, shard
    * boundaries by token budget, deterministic across runs).
    *
    * The prefix sum is the two-pass distributed scan
    * ([[graft.ops.PrefixSum]]), NOT a global window — no single-partition
    * bottleneck at scale.
    */
  def packTokenShards(docs: DataFrame, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counted = docs.select(col(idCol), TextStats.tokenCount(col(textCol)).as("n_tokens"))
    graft.ops.PrefixSum.exclusiveRunningTotal(counted, idCol, "n_tokens")
      .select(
        col(idCol),
        col("n_tokens"),
        expr(s"running_total div $capacity").as("shard_id"),
        (col("running_total") % capacity).as("shard_offset"))
  }

  /** Top-k word n-grams by document frequency (distinct per doc), ties
    * broken by the n-gram itself so the ranking is total and deterministic.
    *
    * The count is a plain hash aggregation; the top-k is `orderBy.limit`,
    * which Spark executes as TakeOrderedAndProject — per-partition heaps of
    * k, then a k-element driver merge. Nothing global ever materializes, so
    * k=20 over 100 TB of n-grams is still one pass. The rank column is
    * stamped after the limit (a window over k rows, not over the corpus).
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int,
      textCol: String = "text"): DataFrame = {
    val counts = graft.ops.Par.fanOut(docs)
      .select(explode(HashFunctions.word_shingles(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)
    counts.withColumn("rnk",
      row_number().over(Window.orderBy(col("doc_freq").desc, col("ngram"))))
      .select(col("rnk"), col("ngram"), col("doc_freq"))
  }
}
