package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom aggregate functions (Catalyst `TypedImperativeAggregate`: real
  * partial aggregation — the buffer combines map-side, serializes across the
  * shuffle, and merges reduce-side).
  *
  * [[TopKPairs]] is the canonical scale case: exact per-group top-k WITHOUT
  * sorting the group. The naive formulation (`row_number()` over a window,
  * filter rank<=k) shuffles and sorts EVERY row of every group; the bounded
  * aggregate ships at most k pairs per group per map task — at 100 TB the
  * difference between sorting a terabyte-scale group history and merging
  * kilobyte-sized heaps. Determinism: ordering is (score DESC, item ASC),
  * so ties resolve identically on any partitioning — the result is
  * bit-stable and oracle-comparable (x24).
  */
object AggFunctions {

  /** exact top-k (score, item) pairs per group, largest score first, ties to
    * the smaller item id. Output: array<struct<score:bigint,item:bigint>>. */
  def topk_pairs(score: Column, item: Column, k: Int): Column =
    column(TopKPairs(expression(score), expression(item), k)
      .toAggregateExpression())

  /** KMV (k-minimum-values) distinct-count sketch over pre-hashed 63-bit
    * values: keeps the k smallest DISTINCT hashes per group; estimate =
    * (k-1) * 2^63 / kth_smallest once >= k distinct hashes exist, the exact
    * distinct count below that. O(k) state per group at every stage (map
    * partial, shuffle, merge) — the sketch an exact count(distinct) can't
    * be at 100 TB, where the dedup hash set for a hot group is the thing
    * that OOMs. Deterministic: a pure function of the input VALUE SET
    * (never of row order or partitioning), so the result is bit-stable and
    * oracle-replayable — which approx_count_distinct's HLL is not across
    * engines. Feed it `shiftrightunsigned(md5_lo64(key), 1)`. */
  def kmv_distinct(hash63: Column, k: Int): Column =
    column(KmvDistinct(expression(hash63), k).toAggregateExpression())

  /** collect_list with a hard per-group size cap: groups that exceed `cap`
    * elements evaluate to NULL instead of materializing the full list.
    *
    * This exists for document-frequency-capped aggregations (winnowing /
    * LSH postings): the hot keys — exactly the ones a doc-freq cap is there
    * to DROP — are the ones whose collect_list buffer would grow without
    * bound. The buffer here retains at most cap+1 elements (enough to prove
    * the group is over cap) at every stage, including map-side partials and
    * shuffle serialization, so a corpus-wide hot key costs O(cap) memory
    * instead of O(group size). Detection is sound under partial aggregation:
    * if the true group size is <= cap then no partial ever truncates (each
    * partial's count <= cap < cap+1) and the merged list is complete; if it
    * is > cap then either some partial hit cap+1 (merged size >= cap+1) or
    * no partial truncated and the merged size is the true size > cap —
    * either way the merged buffer exceeds cap and the group nulls out. */
  def collect_capped(value: Column, cap: Int): Column =
    column(CollectCappedLong(expression(value), cap).toAggregateExpression())
}

/** See [[AggFunctions.collect_capped]]. Long-typed values (ids). */
case class CollectCappedLong(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap > 0, "collect_capped needs cap > 0")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_capped expects an integral column, got $other")
    }

  private type Buf = scala.collection.mutable.ArrayBuffer[Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  // cap+1 retained elements prove "over cap" without holding the group
  override def update(buf: Buf, input: InternalRow): Buf = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Number].longValue
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < b.length && a.length <= cap) { a += b(i); i += 1 }
    a
  }

  override def eval(buf: Buf): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val n = math.min(buf.length, cap + 1)
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectCappedLong =
    copy(child = newChildren(0))
  override def prettyName: String = "collect_capped"
}

case class TopKPairs(
    scoreExpr: Expression,
    itemExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, Long)]] {

  require(k > 0, "topk_pairs needs k > 0")

  // any integral input is accepted (widened to long in update); anything
  // else fails analysis cleanly instead of ClassCastException-ing on
  // executors via the SQL-registered path
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_pairs expects integral (score, item) columns, got " +
        s"${scoreExpr.dataType} / ${itemExpr.dataType}")
  }

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]

  // (score desc, item asc): the pair that WINS sorts first
  private def winsOver(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def children: Seq[Expression] = Seq(scoreExpr, itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("item", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf

  // Amortized bound: accumulate to 4k, then compact to the best k. Each map
  // task therefore holds O(k) state per group and ships at most k pairs.
  private def compact(buf: Buf): Buf = {
    if (buf.length > k) {
      val top = buf.sortWith(winsOver).take(k)
      buf.clear(); buf ++= top
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val i = itemExpr.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Number].longValue, i.asInstanceOf[Number].longValue))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; compact(a) }

  override def eval(buf: Buf): Any = {
    val top = buf.sortWith(winsOver).take(k)
    new GenericArrayData(top.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)) }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val best = compact(buf)
    val bb = ByteBuffer.allocate(4 + best.length * 16)
    bb.putInt(best.length)
    best.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), itemExpr = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

/** See [[AggFunctions.kmv_distinct]]. Input must be non-negative longs
  * (63-bit hashes); the estimate divides by the kth smallest, so the hash
  * space must be [0, 2^63) for (k-1)*2^63/kth to be unbiased. */
case class KmvDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(k > 1, "kmv_distinct needs k > 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct expects an integral hash column, got $other")
    }

  private type Buf = scala.collection.mutable.ArrayBuffer[Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Buf = new Buf

  // k smallest DISTINCT hashes; amortized: grow to 4k, then sort-dedup-cut.
  // Keeping only distinct values is what makes the sketch a pure function
  // of the value set — duplicates must never displace a smaller hash.
  private def compact(buf: Buf): Buf = {
    if (buf.length > k) {
      val cut = buf.toArray.sorted.distinct.take(k)
      buf.clear(); buf ++= cut
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[Number].longValue
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; compact(a) }

  private val two63 = java.lang.Math.scalb(1.0, 63)

  override def eval(buf: Buf): Any = {
    val ds = buf.toArray.sorted.distinct
    if (ds.length < k) ds.length.toDouble
    else ((k - 1).toDouble * two63) / ds(k - 1).toDouble
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val best = compact(buf)
    val n = math.min(best.length, 4 * k)
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(best(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_distinct"
}
