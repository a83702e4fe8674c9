package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.functions.col

/** Native banded range join (second whole-operator Catalyst path, sibling of
  * [[AsOfMergeJoin]]): pair each left row with every right row sharing its
  * keys whose time lies in `[leftTime - lookback, leftTime)`.
  *
  * The compositional form ([[graft.ops.RangeJoin]]) folds the time bucket
  * into the equi-join key — one shuffle, but the left side is EXPLODED into
  * two bucket probes (2x left rows through the shuffle) and every candidate
  * re-checks the range predicate. This exec shuffles each side once,
  * unexploded, and replaces bucket probing with a forward merge holding a
  * sliding window buffer per key: right rows enter the buffer when their
  * time passes below the current left row's time and are evicted once they
  * age out of the lookback. Each right row is visited exactly once per
  * partition; buffer memory is bounded by the window occupancy of one key —
  * the same bound Structured Streaming's watermark puts on the
  * stream-stream interval join state, and independent of total history
  * length.
  *
  * Time columns must be physically long-backed (timestamp, timestamp_ntz,
  * or long), `lookback` is in those physical units (microseconds for
  * timestamps). Inner semantics: left rows with no match emit nothing;
  * right rows with null time are dropped by the API; left rows with null
  * time match nothing.
  */
case class RangeMergeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    lookback: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object RangeMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: RangeMergeJoinPlan =>
      RangeMergeJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.payload, j.lookback, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class RangeMergeJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    lookback: Long,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

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
    val win = lookback
    val out = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val resultProj = UnsafeProjection.create(out, leftOut ++ rightOut)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        // sliding window: right rows of the current key, in time order
        private val bufRows = new java.util.ArrayDeque[InternalRow]()
        private val bufTimes = new java.util.ArrayDeque[Long]()
        private var bufKey: UnsafeRow = _
        // pending emissions for the current left row
        private var emitLeft: InternalRow = _
        private var emitIter: java.util.Iterator[InternalRow] = _

        private def advanceLeft(): Unit = {
          while (emitIter == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTimeRow = lTimeProj(lRow)
            if (!lTimeRow.isNullAt(0)) {
              val lt = lTimeRow.getLong(0)
              // new key: drop the previous key's window
              if (bufKey == null || keyOrd.compare(bufKey, lKey) != 0) {
                bufRows.clear(); bufTimes.clear()
                bufKey = lKey.copy()
              }
              // pull right rows of this key with time < lt into the window
              var pulling = true
              while (pulling && (rHead != null || rIter.hasNext)) {
                if (rHead == null) {
                  rHead = rIter.next()
                  rHeadKey = rKeyProj(rHead).copy()
                }
                val kc = keyOrd.compare(rHeadKey, lKey)
                if (kc < 0) rHead = null
                else if (kc > 0) pulling = false
                else {
                  val rt = rTimeProj(rHead).getLong(0)
                  if (rt < lt) {
                    if (rt >= lt - win) { // already-expired rows never enter
                      bufRows.addLast(rHead.copy())
                      bufTimes.addLast(rt)
                    }
                    rHead = null
                  } else pulling = false
                }
              }
              // evict rows that aged out of [lt - win, lt)
              while (!bufTimes.isEmpty && bufTimes.peekFirst() < lt - win) {
                bufTimes.removeFirst(); bufRows.removeFirst()
              }
              if (!bufRows.isEmpty) {
                emitLeft = lRow
                emitIter = bufRows.iterator()
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (emitIter == null) advanceLeft()
          emitIter != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = resultProj(joined(emitLeft, emitIter.next()))
          if (!emitIter.hasNext) { emitIter = null; emitLeft = null }
          numOutputRows += 1
          r
        }
      }
    }
  }
}

/** DataFrame-level entry point mirroring
  * [[graft.ops.RangeJoin.precedingPairs]], planned through the native exec. */
object RangeMergeJoin {

  def ensurePlanned(spark: SparkSession): Unit = {
    GraftPlanBridge.addStrategy(spark, RangeMergeJoinStrategy)
    GraftPlanBridge.addOptimization(spark, AsOfMergeJoinPushdown)
  }

  def precedingPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, lookbackSec: Long,
      payload: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    require(lookbackSec > 0, "lookbackSec must be positive")
    val spark = left.sparkSession
    ensurePlanned(spark)

    import PlanResolve.attr
    val lPlan = PlanResolve.freshened(left, left.columns.toSeq)
    val rPlan = PlanResolve.freshened(
      right.filter(col(rightTime).isNotNull),
      (keys ++ Seq(rightTime) ++ payload).distinct)

    val lKeys = keys.map(attr(lPlan, _)); val rKeys = keys.map(attr(rPlan, _))
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    // both sides are read as raw longs in one unit — a type (or unit)
    // mismatch must fail here, not order garbage
    require(lt.dataType == rt.dataType,
      s"range time columns must share a type: ${lt.dataType} vs ${rt.dataType}")
    lKeys.zip(rKeys).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"range key ${a.name} type mismatch: ${a.dataType} vs ${b.dataType}") }
    val lookback = lt.dataType match {
      case TimestampType | TimestampNTZType => lookbackSec * 1000000L
      case LongType => lookbackSec
      case other => throw new IllegalArgumentException(
        s"range-merge join needs a long-backed time column, got $other")
    }
    val node = RangeMergeJoinPlan(
      lPlan, rPlan, lKeys, rKeys, lt, rt,
      payload.map(attr(rPlan, _)), lookback)
    // output = left.* ++ payload, matching RangeJoin.precedingPairs
    GraftPlanBridge.ofRows(spark, node)
  }
}
