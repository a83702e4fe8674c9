package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: pair each left row with every right row
  * sharing its keys whose time falls in [leftTime - lookbackSec, leftTime).
  *
  * Spark plans a raw range-condition join as equi-join-on-keys with a
  * post-filter — fine — but when the keys are ABSENT or low-cardinality it
  * degrades to a broadcast-nested-loop/cartesian. The banded formulation
  * makes the time dimension part of the equi-join key: right rows land in
  * one `lookbackSec`-wide bucket; each left row probes the only two buckets
  * its window can overlap. The join is then a plain hash equi-join on
  * (keys, bucket) — ONE shuffle, no nested loop, and each candidate pair is
  * produced exactly once (buckets partition the right side). The exact
  * half-open range predicate is applied after the bucket match.
  *
  * This is the batch twin of the watermark-bounded stream-stream interval
  * join (graft.streaming.StreamingSummary.transNearRoundsStream): same
  * semantics, same band-the-time-axis trick Structured Streaming uses to
  * bound state.
  */
object RangeJoin {

  /** Returns left.* plus `payload` columns of each right row within
    * [leftTime - lookbackSec, leftTime). Inner semantics: left rows with no
    * match produce no output (aggregate and re-join to keep them). */
  def precedingPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, lookbackSec: Long,
      payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "banded range join needs at least one equality key")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val r = right.select(
      keys.map(col) ++ Seq(
        floor(unix_timestamp(col(rightTime).cast("timestamp")) / lookbackSec).as("_b"),
        col(rightTime).as("_rt")) ++ payload.map(col): _*)
    val bL = floor(unix_timestamp(col(leftTime).cast("timestamp")) / lookbackSec)
    // the half-open lookback window overlaps exactly the left row's own
    // bucket and the previous one
    val l = left.withColumn("_b", explode(array(bL - 1, bL)))
    l.join(r, keys :+ "_b")
      .filter(col("_rt") >= col(leftTime) - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col("_rt") < col(leftTime))
      .drop("_b", "_rt")
  }
}
