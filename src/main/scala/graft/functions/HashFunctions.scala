package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled hashing kernels for the dedup operators.
  *
  * The SQL-lambda formulations (`transform(sequence(0,63), h -> array_min(
  * transform(sh, s -> xxhash64(h, s))))`) are interpreted per element — at
  * sf0.1 the minhash signature alone cost ~11 s. These expressions run one
  * compiled pass per row: hash each shingle ONCE (xxhash64 of its bytes),
  * then derive the k permutation values with splitmix64-style multiply-add
  * mixing — O(|shingles| * k) cheap ALU ops instead of k full rehashes, and
  * no intermediate array allocation.
  *
  * CodegenFallback is deliberate: the loop body is compiled Scala already;
  * the expression sits in a projection whose surrounding operators still
  * whole-stage-codegen.
  */
object HashKernels {
  /** Odd multipliers/addends per permutation, derived from splitmix64 so
    * they are deterministic and well mixed. */
  def mixers(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var i = 0
    while (i < k) { a(i) = next() | 1L; b(i) = next(); i += 1 }
    (a, b)
  }

  def hashString(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
}

/** MinHash signature: array<string> shingles -> array<long> of k minima. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val (mulA, addB) = HashKernels.mixers(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = HashKernels.hashString(arr.getUTF8String(i))
      var h = 0
      while (h < numHashes) {
        val v = base * mulA(h) + addB(h)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash: array<string> tokens -> 64-bit fingerprint (bit-vote). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = HashKernels.hashString(arr.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  /** Distinct word n-gram shingles of a text column (compiled single pass). */
  def word_shingles(text: Column, n: Int = 3): Column =
    GraftExpressionBridge.column(WordShingles(GraftExpressionBridge.expression(text), n))

  /** MinHash signature of an array<string> column. */
  def minhash_sig(shingles: Column, numHashes: Int = 64): Column =
    GraftExpressionBridge.column(MinHashSig(GraftExpressionBridge.expression(shingles), numHashes))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftExpressionBridge.column(SimHash64(GraftExpressionBridge.expression(tokens)))
}

/** Word n-gram shingle set: string -> array<string> of distinct n-grams.
  *
  * Replaces the SQL formulation (trim/split evaluated three times per row +
  * an interpreted transform + concat_ws + array_distinct) with one compiled
  * pass: split once, build n-grams into an insertion-ordered set. Semantics
  * match the SQL/DuckDB form exactly: single-space split (empty tokens
  * preserved), fewer than n tokens -> empty array, first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim()
    val parts = text.split(UTF8String.fromString(" "), -1)
    if (parts.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + n <= parts.length) {
      val paranddelim = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        paranddelim(2 * j) = parts(i + j)
        if (j < n - 1) paranddelim(2 * j + 1) = space
        j += 1
      }
      seen.add(UTF8String.concat(paranddelim: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
