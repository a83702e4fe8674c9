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

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of MD5 exactly as DuckDB's `md5_number_lower`: the LAST
    * 8 digest bytes interpreted little-endian. Slower than XXH64 but lets a
    * SQL oracle reproduce the identical bit pattern — used where the hash
    * BITS (not just collision structure) decide the result, e.g. SimHash
    * bit votes. */
  def md5Lo64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (digest(i) & 0xFFL); i -= 1 }
    h
  }
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

/** SimHash: array<string> tokens -> 64-bit fingerprint (bit-vote).
  *
  * `md5Bits = true` votes on the DuckDB-reproducible md5-low-64 token hash
  * (oracle parity: the fingerprint BITS decide which pairs land within the
  * hamming radius, so equality-only hash parity is not enough); `false`
  * keeps the faster XXH64 for pure engine-side use.
  */
case class SimHash64(child: Expression, md5Bits: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (md5Bits) HashKernels.md5Lo64(arr.getUTF8String(i))
        else HashKernels.hashString(arr.getUTF8String(i))
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

/** md5-low-64 of a string as a signed long — the same 64 bits DuckDB's
  * `md5_number_lower` yields (as UBIGINT). Used where a deterministic,
  * oracle-replayable hash ORDER is needed (e.g. IVF centroid sampling):
  * the oracle converts its UBIGINT to signed two's-complement and sorts the
  * same. */
case class Md5Lo64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.md5Lo64(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic sampling bucket: string -> md5-low-64 mod `buckets`
  * (UNSIGNED modulus, matching DuckDB `md5_number_lower(s) % buckets` on
  * UBIGINT bit for bit). The basis of reproducible stratified sampling:
  * membership depends only on the key, so a re-run, a backfill, or a second
  * cluster draws the SAME sample — no RNG state, no seed plumbing.
  */
case class Md5Bucket(child: Expression, buckets: Int)
    extends UnaryExpression with CodegenFallback {
  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.remainderUnsigned(
      HashKernels.md5Lo64(input.asInstanceOf[UTF8String]), buckets.toLong).toInt

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

  /** Winnowing fingerprints: rolling k-gram hashes -> window minima. */
  def winnowing_fp(text: Column, k: Int = 8, window: Int = 4): Column =
    GraftExpressionBridge.column(WinnowingFp(GraftExpressionBridge.expression(text), k, window))

  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column, md5Bits: Boolean = false): Column =
    GraftExpressionBridge.column(SimHash64(GraftExpressionBridge.expression(tokens), md5Bits))

  /** Deterministic sampling bucket in [0, buckets): md5-low-64 unsigned mod. */
  def md5_bucket(key: Column, buckets: Int): Column =
    GraftExpressionBridge.column(Md5Bucket(GraftExpressionBridge.expression(key), buckets))

  /** md5-low-64 as a signed long (DuckDB md5_number_lower bit parity). */
  def md5_lo64(key: Column): Column =
    GraftExpressionBridge.column(Md5Lo64(GraftExpressionBridge.expression(key)))
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

/** Winnowing document fingerprints (the canonical rolling-hash scheme):
  * Rabin-Karp rolling hashes over character k-grams, then the minimum hash
  * of every sliding window of `w` consecutive k-gram hashes (rightmost min
  * on ties), deduplicated. Robust to local edits: an edit only perturbs
  * fingerprints within w+k characters of the change, so two documents
  * sharing any sufficiently long run share fingerprints — the standard
  * local-similarity fingerprint for plagiarism/near-dup detection.
  *
  * One compiled pass per row: O(n) rolling updates + a monotone deque for
  * the window minima. Returns array<long>, empty when text is shorter
  * than k.
  */
case class WinnowingFp(child: Expression, k: Int, window: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 1315423911L

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // rolling k-gram hashes
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    grams(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * Base + s.charAt(i)
      grams(i - k + 1) = h
      i += 1
    }
    if (grams.length <= window) {
      var mn = grams(0); i = 1
      while (i < grams.length) { if (grams(i) <= mn) mn = grams(i); i += 1 }
      return new GenericArrayData(Array[Any](mn))
    }
    // sliding-window minima (rightmost on ties) via monotone deque
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < grams.length) {
      while (!deque.isEmpty && grams(deque.peekLast) >= grams(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - window) deque.pollFirst()
      if (i >= window - 1) out.add(grams(deque.peekFirst))
      i += 1
    }
    new GenericArrayData(out.toArray.map(_.asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
