package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed prefix sum (scan) — the two-pass algorithm, Spark-shaped.
  *
  * A global running total is the one aggregation shape a declarative plan
  * handles badly: `Window.orderBy(key)` with no partition key collapses to a
  * SINGLE partition, serializing the whole table through one task — fine at
  * 60k rows, fatal at 100 TB. The classic fix is the two-pass scan:
  *
  *   1. range-partition by the order key and sort within partitions, so
  *      partition i holds a contiguous key range and partitions are ordered;
  *   2. pass 1: reduce each partition to its local sum (P rows to the
  *      driver, one per partition — bytes, not data);
  *   3. exclusive-scan those P sums on the driver, broadcast the offsets;
  *   4. pass 2: one in-order pass per partition, seeded at its offset.
  *
  * Every stage is fully parallel; the only serial work is the P-element
  * driver scan. The partitioned input is pinned with localCheckpoint so both
  * passes see the identical partition layout.
  */
object PrefixSum {

  /** Exclusive running total of `valueCol` (long) in global `orderCol`
    * (long) order. Returns (orderCol, valueCol, outCol) where outCol is the
    * sum of all values with a strictly smaller order key. Keys must be
    * unique (they define the total order). */
  def exclusiveRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String = "running_total", numPartitions: Int = 0): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val sorted = df
      .select(col(orderCol).cast("long"), col(valueCol).cast("long"))
      .repartitionByRange(p, col(orderCol))
      .sortWithinPartitions(orderCol)
      .localCheckpoint()

    val partSums = sorted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col(valueCol)).as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (i <- 0 until nParts) {
      offsets(i) = acc
      acc += partSums.getOrElse(i, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // mapPartitionsWithIndex, NOT TaskContext.getPartitionId(): the index
    // must be the range partition's own id. A downstream coalesce() pipelines
    // several range partitions into one task, where TaskContext would return
    // the coalesced id (0) for all of them and zero out every offset.
    val scanned = sorted.as[(Long, Long)].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { case (k, v) => val r = run; run += v; (k, v, r) }
      }
    spark.createDataset(scanned).toDF(orderCol, valueCol, outCol)
  }

  /** [[exclusiveRunningTotal]] generalized to an arbitrary total order:
    * no unique-long-key encoding needed — the caller passes `orderCols`
    * (which MUST be a total order, e.g. ending in a unique id, or the scan
    * within equal keys is partition-nondeterministic) and keeps every input
    * column. Same two-pass shape: range partition on the order, per-
    * partition sums to the driver (P longs), broadcast offsets, one
    * in-order pass. `valueCol` must be a long column. */
  def exclusiveRunningTotalOrdered(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String, outCol: String = "running_total", numPartitions: Int = 0): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(p, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint()
    val partSums = sorted
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col(valueCol)).as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = sorted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (i <- 0 until nParts) {
      offsets(i) = acc
      acc += partSums.getOrElse(i, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType)
    val scanned = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { row =>
        val r = run
        run += row.getLong(vIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
      }
    }
    spark.createDataFrame(scanned, outSchema)
  }
}
