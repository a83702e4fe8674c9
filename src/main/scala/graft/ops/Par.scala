package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-bound stages.
  *
  * Spark sizes scan parallelism by INPUT BYTES (`files.maxPartitionBytes`),
  * which is the right call for I/O-bound plans but starves compute-heavy
  * per-row operators: a few MB of documents or embeddings arrive as ONE
  * partition, and everything until the first shuffle — shingling, minhash
  * signatures, winnowing fingerprints, LSH hyperplane signatures, nested-loop
  * pair scoring — runs on one core. The reference's workloads hit this shape
  * constantly (small inputs, expensive per-row transforms).
  *
  * [[fanOut]] repartitions up to the session's default parallelism, and only
  * when the input is BELOW it — at 100 TB a scan already carries thousands of
  * partitions and this is a no-op (no shuffle inserted); on a small slice it
  * converts a single-threaded stage into a full-width one for the cost of
  * shuffling the small input once.
  */
object Par {

  /** Repartition `df` to the session default parallelism if (and only if)
    * its estimated input is too small to span that many scan splits.
    *
    * The gate reads LOGICAL-plan statistics (`optimizedPlan.stats`), not
    * `df.rdd.getNumPartitions` — the RDD probe forces a full physical
    * planning of the frame, and since the caller's query plans again when it
    * executes, every fanOut call used to pay planning twice. The stats
    * estimate answers the same question (would the scan parallelize?)
    * from size propagation alone: inputs under maxPartitionBytes x target
    * arrive as fewer than `target` splits and get spread; anything larger —
    * every at-scale scan — passes through with no shuffle and no planning.
    * Streaming frames pass through untouched (micro-batch sizing already
    * follows the source's file splits). */
  def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes < BigInt(splitBytes) * target) df.repartition(target) else df
  }
}
