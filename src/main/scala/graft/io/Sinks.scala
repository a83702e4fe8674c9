package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Writers for the report tables.
  *
  * The reference's idempotency story is delete-before-insert per slice
  * (trans_summary_5min.py:104-128 — S4). The Spark-native equivalent is
  * dynamic partition overwrite: report tables are parquet partitioned by
  * their slice keys (summary_date [, hours [, mins]]), and a rewrite of a
  * slice replaces exactly the partitions present in the incoming DataFrame.
  * Re-running a slice is therefore naturally idempotent, and concurrent
  * slices touch disjoint partitions.
  *
  * At 100 TB: partitioning by summary_date keeps partition counts bounded
  * (365/yr × ~few files); platform/site stay row-level (high cardinality ×
  * date would explode the partition count and kill the driver's listing).
  */
object Sinks {

  /** S4: idempotent slice overwrite (delete-before-insert). Only partitions
    * present in `df` are replaced. */
  def overwriteSlices(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      df.write
        .mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** S3: plain append (task publication, first write of a table). */
  def append(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed table write: pre-shuffles once at write time so every later
    * join/aggregation on `bucketCols` is co-located — no exchange in the
    * plan. The 100 TB pattern for the rollup cascade: the 5min/1h/1d tiers
    * all key on the same player columns, so bucketing the materialized tiers
    * makes every re-aggregation and every risk-report join shuffle-free.
    * (Bucketing needs the catalog, hence saveAsTable rather than a path.) */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Compact the small files a micro-batched cascade accumulates: rewrite
    * the named partitions of a slice-partitioned table into `filesPerPartition`
    * right-sized files each, preserving rows exactly.
    *
    * Why this exists: the 5-min tier commits every trigger, so one day of one
    * table is up to 288 commits — at 100 TB that is millions of KB-sized
    * files, and scan planning (footer reads, task scheduling) starts to cost
    * more than the scan. Compaction reads ONLY the partitions named (pruned
    * scan), repartitions within each, and swaps them back in with the same
    * dynamic-partition overwrite the cascade itself uses, so a compaction is
    * idempotent and concurrent slices stay untouched. localCheckpoint
    * materializes the rows before the overwrite replaces the files being
    * read (same read-overwrite hazard as the rtp ledger merge).
    *
    * Run it behind the live writer (e.g. compact day D-1 while D streams in)
    * — partition-granular swaps mean readers never see a partial partition.
    */
  def compactSlices(spark: SparkSession, path: String, partitionCol: String,
      partitionValues: Seq[Any], filesPerPartition: Int = 1): Unit = {
    require(partitionValues.nonEmpty, "name the partitions to compact")
    import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}
    val df = spark.read.parquet(path)
      .filter(col(partitionCol).isin(partitionValues: _*))
    // content-derived salt splits a partition into filesPerPartition files
    // deterministically (constant 0 when filesPerPartition = 1)
    val salt = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(filesPerPartition))
    val slice = df
      .repartition(filesPerPartition * partitionValues.size, col(partitionCol), salt)
      .localCheckpoint()
    overwriteSlices(slice, path, Seq(partitionCol))
  }

  /** S6: existence probe — the reference's `SELECT 1 ... LIMIT 1` upsert
    * predicate (player_ranking…py:77-88). */
  def exists(df: DataFrame): Boolean = !df.limit(1).isEmpty

  /** S7: debug artifact sink — replaces the reference's stray
    * `to_excel('all_new_df.xlsx')` (risk_ctrl_rtp_1d.py:160) with a
    * header'd CSV dump. */
  def debugCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Read a report table back (empty-safe: a table that was never written
    * yet reads as an empty DataFrame with the given schema). */
  def readOrEmpty(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    try spark.read.parquet(path)
    catch { case _: org.apache.spark.sql.AnalysisException => spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema) }
}
