package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Readers for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. Timestamps in the
  * fixtures are parquet `isAdjustedToUTC=false` (NTZ); we deliberately leave
  * `spark.sql.parquet.inferTimestampNTZ.enabled` at its default so the engine
  * sees the same naive-UTC wall-clock values the DuckDB oracle sees.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped under two physical parquet encodings depending on
    * the writer's arrow version: TIMESTAMP(NANOS,false) — which Spark's reader
    * rejects by default (PARQUET_TYPE_ILLEGAL) and we read as a raw LONG via
    * `nanosAsLong` — and TIMESTAMP(MICROS,false), which Spark reads natively as
    * TIMESTAMP_NTZ. A 100 TB lake has mixed writers; branch on the loaded
    * schema rather than assuming one encoding. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRanged(spark, dir, None)

  /** events with a half-open `[gte, lt)` wall-clock window applied BEFORE any
    * conversion, in the column's physical type. Filtering a converted column
    * defeats parquet pushdown (the scan would show only
    * `PushedFilters: [IsNotNull(ts)]` and read every row group); filtering the
    * raw long (nanos encoding) or the NTZ column with NTZ literals (micros
    * encoding) reaches the parquet row-group stats — at scale this is the
    * difference between pruning a month down to a day and a full scan. */
  def eventsInWindow(spark: SparkSession, dir: String, gte: String, lt: String): DataFrame =
    eventsRanged(spark, dir, Some((gte, lt)))

  private def nanosOf(s: String): Long = {
    val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
    inst.getEpochSecond * 1000000000L + inst.getNano
  }

  private def ntzOf(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  private def eventsRanged(spark: SparkSession, dir: String, window: Option[(String, String)]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos fixture: filter the raw ns long (pushes to row-group stats),
        // then convert with integer `div` so the ns->us truncation matches
        // DuckDB's cast exactly (no double rounding).
        val ranged = window.fold(raw) { case (gte, lt) =>
          raw.filter(col("ts") >= lit(nanosOf(gte)) && col("ts") < lit(nanosOf(lt)))
        }
        ranged.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case TimestampNTZType =>
        // micros fixture: already TIMESTAMP_NTZ; NTZ literals push down to the
        // parquet NTZ min/max stats, and no conversion is needed.
        window.fold(raw) { case (gte, lt) =>
          raw.filter(col("ts") >= lit(ntzOf(gte)) && col("ts") < lit(ntzOf(lt)))
        }
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other in $dir/events.parquet " +
            "(expected TIMESTAMP(NANOS) read as LongType via nanosAsLong, or " +
            "TIMESTAMP(MICROS) read as TimestampNTZType)")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
