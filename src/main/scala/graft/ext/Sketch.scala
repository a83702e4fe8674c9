package graft.ext

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the fixed-size frequency summary for unbounded key
  * spaces (Cormode-Muthukrishnan). `depth` independent hash rows of `width`
  * counters; an item's estimate is the MIN over its `depth` buckets, an
  * overcount-only bound (est >= true count, with the overcount bounded by
  * collisions in the narrowest row).
  *
  * Why it earns a place next to the exact top-k aggregate (x24) and KMV
  * (s13): the counter table is depth x width REGARDLESS of corpus size —
  * at 100 TB the frequency state is still a few KiB per partial, the
  * aggregation is map-side-combinable addition, and the merged sketch is
  * broadcastable. Counter updates are pure addition, so build order,
  * partitioning, and micro-batch boundaries cannot change a single counter
  * bit — the same argument that makes the streaming twin's complete-mode
  * state exact.
  *
  * Buckets are md5-low-64 unsigned-mod (`HashFunctions.md5_bucket`), the
  * DuckDB `md5_number_lower(s) % width` arithmetic — an oracle replays
  * every counter and every estimate bitwise.
  */
object Sketch {

  /** Bucket column for hash row `j`: unsigned md5-low-64 of "cms<j>:<item>"
    * mod `width` — one compiled expression, no UDF. */
  private def cmsBucket(j: Column, item: Column, width: Int): Column =
    HashFunctions.md5_bucket(
      concat(lit("cms"), j.cast("string"), lit(":"), item), width)

  /** CMS counter table (j, bucket, cnt) from raw item OCCURRENCES — the
    * streaming build shape: explode each occurrence into `depth` (row,
    * bucket) keys and count. State bounded by depth*width. */
  def cmsCounters(items: DataFrame, itemCol: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    items.select(itemCol.cast("string").as("item"))
      .select(col("item"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("item"), width))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Counter table built from pre-aggregated (item, cnt) WEIGHTS — addition
    * is associative, so this is bit-identical to [[cmsCounters]] over the
    * raw occurrences while shuffling |vocab|*depth rows instead of
    * |tokens|*depth (the batch build shape). */
  def cmsCountersWeighted(counts: DataFrame, itemCol: Column, cntCol: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    counts.select(itemCol.cast("string").as("item"), cntCol.cast("long").as("c"))
      .select(col("item"), col("c"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("item"), width))
      .groupBy("j", "bucket").agg(sum(col("c")).as("cnt"))
  }

  /** Heavy hitters by CMS estimate: every distinct item whose sketch
    * estimate (min over depth buckets) reaches total/`thresholdDenom`
    * occurrences, with the exact count alongside — the sketch-vs-truth
    * audit row. The probe joins the distinct-item table against the
    * BROADCAST counter table (depth*width rows, corpus-independent); the
    * only corpus-sized shuffle is the exact count itself.
    *
    * Returns (term, cms_est, exact_cnt); est >= exact always (overcount-
    * only), equality iff the item collided with nothing in some row. */
  def cmsHeavyHitters(items: DataFrame, itemCol: Column,
      depth: Int, width: Int, thresholdDenom: Int): DataFrame = {
    require(thresholdDenom >= 1, "thresholdDenom must be positive")
    val terms = items.select(itemCol.cast("string").as("item"))
      .groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val counters = cmsCountersWeighted(terms, col("item"), col("exact_cnt"),
      depth, width)
    val total = terms.agg(sum(col("exact_cnt")).as("total"))
    terms
      .select(col("item"), col("exact_cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("item"), width))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy("item", "exact_cnt").agg(min(col("cnt")).as("cms_est"))
      .crossJoin(broadcast(total))
      .filter(col("cms_est") >= expr("total div " + thresholdDenom))
      .select(col("item").as("term"), col("cms_est"), col("exact_cnt"))
  }
}
