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
    // the in-order pass stays on InternalRow (queryExecution.toRdd — no
    // per-row conversion to external tuples and back through the encoder;
    // both columns are primitive longs, extracted before the buffer reuse)
    val internal = org.apache.spark.sql.GraftPlanBridge.internalRows(sorted)
    val nParts = internal.getNumPartitions
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
    val scanned = internal.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { row =>
        val k = row.getLong(0); val v = row.getLong(1)
        val r = run; run += v
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](k, v, r)): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(orderCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(valueCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.LongType)))
    org.apache.spark.sql.GraftPlanBridge.ofInternalRows(spark, scanned, schema)
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
    val internal = org.apache.spark.sql.GraftPlanBridge.internalRows(sorted)
    val nParts = internal.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (i <- 0 until nParts) {
      offsets(i) = acc
      acc += partSums.getOrElse(i, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val outSchema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType)
    // InternalRow pass-through: the input row is copied (UnsafeRow buffers
    // are reused across next() calls) and the running total appended via a
    // JoinedRow — no conversion of arbitrary caller columns to external
    // objects and back
    val scanned = internal.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { row =>
        val r = run
        run += row.getLong(vIdx)
        val tail = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](r))
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(row.copy(), tail):
          org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftPlanBridge.ofInternalRows(spark, scanned, outSchema)
  }
}
