package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Native sort-merge as-of join: the whole-operator Catalyst path (logical
  * node -> planner strategy -> physical exec), complementing the compositional
  * union+window formulation in [[graft.ops.AsOfJoin]].
  *
  * Spark itself has a logical `AsOfJoin` (pandas `merge_asof`) but no physical
  * operator — the optimizer REWRITES it into exactly the union+window plan
  * `AsOfJoin.asOfLeft` builds. This operator is the plan that rewrite can't
  * produce: both sides hash-clustered on the equality keys and sorted by
  * (keys, time), then a single forward merge scan per partition that carries
  * the latest eligible right row. Compared to the union+window plan it
  * shuffles the SAME one round on the keys but (a) never materializes the
  * union'd row-superset (no null-padded mirror columns), (b) keeps the
  * per-partition pass at two cursors and ONE buffered right row — no window
  * frame machinery, and (c) reports `outputPartitioning`/`outputOrdering`
  * (keys, time) so a downstream agg or as-of join on the same keys plans
  * zero additional exchanges. At 100 TB both formulations are
  * shuffle-bound and equivalent; the merge exec halves the bytes that cross
  * the shuffle (no mirrored null columns) and is the one to pick when the
  * output feeds further keyed stages.
  *
  * Semantics match `AsOfJoin.asOfLeft` bit for bit (verified in
  * AsOfMergeJoinSpec and by sharing q20's DuckDB oracle): each left row gets
  * the payload of the LATEST right row with equal keys and `rightTime <
  * leftTime` (strict) or `<=` (non-strict); ties among right rows at the
  * same instant resolve to the largest `tieBreak`; left rows with no
  * eligible right row keep null payload; right rows with null time are
  * dropped; left rows with null time match nothing (null sorts first).
  *
  * Reference behavior: the row-at-a-time "latest earlier row" lookups the
  * reference scripts do with correlated reads per row
  * (`/root/reference/task-executor/risk_ctrl/risk_ctrl_rtp_1d.py` ledger
  * probes) — here a single declarative operator.
  */
case class AsOfMergeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    strict: Boolean,
    tieBreak: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfMergeJoinPlan]] as [[AsOfMergeJoinExec]]. Injected per-session
  * (idempotently) by [[AsOfMergeJoin.ensurePlanned]] or at build time via
  * `GraftExtensions`. */
object AsOfMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoinPlan =>
      AsOfMergeJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.payload, j.strict, j.tieBreak, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Required layout (EnsureRequirements inserts the exchanges/sorts, and skips
  * them when a child is already clustered — e.g. bucketed tables or an
  * upstream agg on the same keys):
  *  - both children hash-clustered on their join keys (co-partitioned),
  *  - left sorted by (keys, time), right by (keys, time, tieBreak...).
  *
  * Per partition, a forward merge: the right cursor advances monotonically
  * (each right row is visited ONCE across the whole partition), and the last
  * eligible right row is kept in a single buffered copy. O(|L|+|R|) time,
  * O(1) state — no per-key buffering, so a key whose history spans years
  * costs the same memory as one with a single row.
  */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    strict: Boolean,
    tieBreak: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: tieBreak)).map(SortOrder(_, Ascending)))

  // Every left row passes through in its incoming order: the left child's
  // partitioning and (keys, time) sort survive, and declaring them lets the
  // planner elide exchanges/sorts in downstream keyed stages.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val strictLocal = strict
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // Bind against nullable-forced right attributes: unmatched left rows
      // substitute an all-null right row, so every right field read must
      // null-check even when the right child's schema says non-nullable.
      val resultProj = UnsafeProjection.create(
        out, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Lookahead right row not yet classified against the current left row.
        // Row objects coming off a shuffle/sort are reused by their iterator,
        // so the lookahead is safe only because the cursor never advances
        // while one is held; the buffered match is an explicit copy.
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeRow = lTimeProj(lRow)
          var done = false
          while (!done && (rHead != null || rIter.hasNext)) {
            if (rHead == null) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead).copy()
            }
            val kc = keyOrd.compare(rHeadKey, lKey)
            if (kc < 0) {
              rHead = null // right key fully behind every remaining left row
            } else if (kc > 0) {
              done = true // right cursor ahead; stop until left catches up
            } else {
              val tc = timeOrd.compare(rTimeProj(rHead), lTimeRow)
              if (if (strictLocal) tc < 0 else tc <= 0) {
                // Eligible: consume and remember. Later eligible rows
                // overwrite, so the LAST (latest time, largest tieBreak) wins.
                matched = rHead.copy()
                matchedKey = rHeadKey
                rHead = null
              } else done = true
            }
          }
          val result =
            if (matched != null && keyOrd.compare(matchedKey, lKey) == 0)
              resultProj(joined(lRow, matched))
            else resultProj(joined(lRow, nullRight))
          numOutputRows += 1
          result
        }
      }
    }
  }
}

/** DataFrame-level entry point mirroring [[graft.ops.AsOfJoin.asOfLeft]]'s
  * signature and semantics, planned through the native exec. */
object AsOfMergeJoin {

  /** Idempotently register the strategy + pushdown rule in a LIVE session
    * (extensions only apply to sessions built with them). */
  def ensurePlanned(spark: SparkSession): Unit = {
    GraftPlanBridge.addStrategy(spark, AsOfMergeJoinStrategy)
    GraftPlanBridge.addOptimization(spark, AsOfMergeJoinPushdown)
  }

  def asOfLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = true, tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(tieBreak.forall(payload.contains),
      "tieBreak columns must be part of the right-side payload")
    val spark = left.sparkSession
    ensurePlanned(spark)

    // Fresh ExprIds per side (self-join safety) via PlanResolve; the right
    // side is also pruned to keys+time+payload before the shuffle.
    import PlanResolve.attr
    val lPlan = PlanResolve.freshened(left, left.columns.toSeq)
    val rPlan = PlanResolve.freshened(
      right.filter(col(rightTime).isNotNull),
      (keys ++ Seq(rightTime) ++ payload).distinct)

    val lKeys = keys.map(attr(lPlan, _)); val rKeys = keys.map(attr(rPlan, _))
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    // the merge compares raw values across sides — mismatched types would
    // order garbage instead of failing
    require(lt.dataType == rt.dataType,
      s"as-of time columns must share a type: ${lt.dataType} vs ${rt.dataType}")
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key ${a.name} type mismatch: ${a.dataType} vs ${b.dataType}") }
    val node = AsOfMergeJoinPlan(
      lPlan, rPlan, lKeys, rKeys, lt, rt,
      payload.map(attr(rPlan, _)), strict, tieBreak.map(attr(rPlan, _)))
    GraftPlanBridge.ofRows(spark, node)
  }
}
