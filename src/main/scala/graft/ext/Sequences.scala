package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-model training-example construction from per-key ordered event
  * streams — the "behavioral LM" data prep stage: each position becomes a
  * (context window, next token) supervised pair.
  *
  * Scale shape: ONE shuffle, partitioned by the sequence key; every lag
  * comes from the same window frame, so Catalyst evaluates all of them in a
  * single Window operator over a single sort. Per-key data must fit a
  * partition — true for user event streams (bounded per user), and the same
  * constraint every sessionization carries. No global ordering anywhere.
  */
object Sequences {

  /** For each row with at least `ctx` predecessors in its key's
    * (orderCols)-ordered stream, emit the `ctx` preceding tokens as columns
    * `context_1..context_ctx` (oldest first) plus the current token as
    * `target`. `keep` selects the identifying columns to carry through. */
  def nextTokenPairs(df: DataFrame, keyCol: Column, orderCols: Seq[Column],
      tokenCol: Column, ctx: Int, keep: Seq[Column]): DataFrame = {
    require(ctx >= 1, "ctx must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val ctxCols = (1 to ctx).map(i =>
      lag(tokenCol, ctx - i + 1).over(w).as(s"context_$i"))
    df.select(keep ++ ctxCols :+ tokenCol.as("target"): _*)
      .filter(col("context_1").isNotNull)
  }
}
