package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy subword (BPE) tokenization with a FIXED, pinned merge table.
  *
  * Token budgets (shard packing, context-window chunking) are only as real
  * as the token counts behind them, and whitespace words systematically
  * under-count what a subword tokenizer produces. This is the standard
  * byte-pair-encoding inference loop (Sennrich et al. 2016; the same greedy
  * loop GPT-2's public encoder runs per word):
  *
  *   1. split text on whitespace into words;
  *   2. per word, start from single characters;
  *   3. repeatedly find the ADJACENT PAIR with the lowest merge rank and
  *      merge its LEFTMOST occurrence; stop when no adjacent pair is in the
  *      merge table.
  *
  * The merge table is a literal pinned in [[BpeVocab]] — deterministic,
  * versioned with the code, and small enough for a SQL oracle to replay the
  * identical loop (a recursive CTE merging one pair per step; see x18/x29/
  * x36 in ExtensionQueries). A production vocabulary (e.g. 50k merges from
  * a public tokenizer release) drops into the same expression unchanged —
  * rank lookup is a hash map, the loop is rank-count-agnostic.
  *
  * Merging one occurrence per iteration (rather than every occurrence of
  * the best pair per sweep) keeps the engine and the SQL replay trivially
  * in lockstep; the fixpoint is identical for non-self-overlapping merges
  * and the per-word cost is O(len^2) on a bounded word length either way.
  *
  * Unicode note: characters are UTF-16 units engine-side and codepoints in
  * the DuckDB replay — identical on BMP text (the fixtures are ASCII); a
  * byte-level production vocab would sidestep the distinction entirely.
  */
object BpeVocab {
  /** Rank-ordered merges; rank = 1-based position (lower merges first).
    * Chain merges (sc+a -> sca+n, ...) outrank the generic pairs so whole
    * frequent words cascade to single tokens — the same reachability
    * property a learned BPE vocabulary has by construction. */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
    ("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"),
    ("d", "a"), ("da", "ta"),
    ("m", "e"), ("me", "r"), ("mer", "g"), ("merg", "e"),
    ("j", "o"), ("jo", "in"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("r", "o"), ("ro", "w"),
    ("a", "n"), ("i", "n"), ("e", "r"), ("o", "r"), ("s", "t"))

  private[functions] val rank: Map[(String, String), Int] =
    Merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

  /** The merge loop for one word (exactly the algorithm documented above). */
  def tokenizeWord(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    val toks = scala.collection.mutable.ArrayBuffer.tabulate(w.length)(i => w.substring(i, i + 1))
    var go = toks.length > 1
    while (go) {
      var best = Int.MaxValue
      var bp = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), 0)
        if (r > 0 && r < best) { best = r; bp = i }
        i += 1
      }
      if (bp < 0) go = false
      else {
        toks(bp) = toks(bp) + toks(bp + 1)
        toks.remove(bp + 1)
        go = toks.length > 1
      }
    }
    toks.toArray
  }

  /** Tiny working vocabularies repeat words constantly (and real corpora
    * are Zipfian), so a bounded per-thread memo turns the per-word loop
    * into a lookup for the hot head of the distribution. */
  private val memo = new ThreadLocal[java.util.HashMap[String, Array[String]]] {
    override def initialValue() = new java.util.HashMap[String, Array[String]]()
  }
  private val MemoCap = 65536

  def tokenizeWordCached(w: String): Array[String] = {
    val m = memo.get()
    var r = m.get(w)
    if (r == null) {
      r = tokenizeWord(w)
      if (m.size >= MemoCap) m.clear()
      m.put(w, r)
    }
    r
  }
}

/** text -> array<string> of BPE subwords (whitespace words tokenized in
  * order, subword streams concatenated). Empty/blank text -> empty array. */
case class BpeTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim
    if (text.isEmpty) return new GenericArrayData(Array.empty[Any])
    val words = text.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      val sub = BpeVocab.tokenizeWordCached(words(i))
      var j = 0
      while (j < sub.length) { out += UTF8String.fromString(sub(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenizer {
  /** BPE subword stream of a text column (compiled single pass per row). */
  def bpe_tokens(text: Column): Column =
    GraftExpressionBridge.column(BpeTokens(GraftExpressionBridge.expression(text)))
}
