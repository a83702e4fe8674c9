package graft.ext

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — consistent placement for a
  * growing corpus. Each key scores every shard with a deterministic hash
  * and lands on the argmax; when the shard count grows S -> S+1, a key
  * either STAYS PUT or moves to the NEW shard (its old scores are
  * unchanged, only one new score enters the race), so expected movement is
  * 1/(S+1) of the data instead of the (S-1)/S a mod-hash repartition would
  * reshuffle. That asymmetry is the whole point at 100 TB: growing
  * capacity costs one shard's worth of movement, not a full rewrite.
  *
  * Scale shape: scoring explodes each key into S rows (S is the shard
  * count, a small constant) and takes a per-key max — one narrow pass plus
  * one hash aggregation; nothing global. Hashes are md5-low-64 with DuckDB
  * `md5_number_lower` bit parity (unsigned-shifted to stay sign-stable), so
  * an oracle replays placement bitwise.
  */
object Sharding {

  /** (key, shard) assignment over `shards` shards by HRW argmax; ties
    * (vanishingly rare) break to the larger shard id, matching the struct
    * max ordering the oracle's (h DESC, shard DESC) rank replays. */
  def rendezvousAssign(df: DataFrame, keyCol: Column, shards: Int): DataFrame = {
    require(shards >= 1, "need at least one shard")
    df.select(keyCol.as("key"))
      .select(col("key"), explode(sequence(lit(0), lit(shards - 1))).as("shard"))
      .withColumn("h", shiftrightunsigned(
        HashFunctions.md5_lo64(
          concat(col("key").cast("string"), lit(":"), col("shard").cast("string"))), 1))
      .groupBy("key")
      .agg(max(struct(col("h"), col("shard"))).as("m"))
      .select(col("key"), col("m.shard").as("shard"))
  }

  /** Movement matrix for growing `fromShards` -> `toShards`: one row per
    * (old_shard, new_shard) with the key count — the audit that proves the
    * minimal-movement property before a real re-layout runs. */
  def movementMatrix(df: DataFrame, keyCol: Column,
      fromShards: Int, toShards: Int): DataFrame = {
    val a = rendezvousAssign(df, keyCol, fromShards).withColumnRenamed("shard", "old_shard")
    val b = rendezvousAssign(df, keyCol, toShards).withColumnRenamed("shard", "new_shard")
    a.join(b, "key")
      .groupBy("old_shard", "new_shard")
      .agg(count(lit(1)).as("docs"))
  }
}
