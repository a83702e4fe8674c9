package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the training half of the
  * tokenizer whose inference loop lives in [[BpeVocab]]/[[BpeTokens]]. With
  * this, the engine's subword surface is self-contained: learn the merges
  * from the corpus being curated, then budget shard packing / chunking with
  * the learned vocabulary.
  *
  * Scale split (the IVF-centroid pattern applied to tokenization): the only
  * corpus-sized step is the word-frequency table — ONE shuffle with map-side
  * partial aggregation, then `orderBy.limit(topV)` which Spark executes as
  * TakeOrderedAndProject (per-partition heaps of V, a V-element driver
  * merge; nothing global materializes). Training itself runs driver-side on
  * that bounded artifact — textbook BPE is a loop over the WEIGHTED WORD
  * VOCABULARY, never the corpus, and a 50k-word head is a few MB however
  * many petabytes produced it. Every step is deterministic: the vocab cut
  * orders by (count DESC, word ASC) and merge selection breaks count ties
  * lexicographically, so any two runs — any partitioning, any cluster —
  * learn the identical table.
  */
object BpeTrain {

  /** Corpus word-frequency head: top `topV` whitespace words by
    * (count DESC, word ASC) — the bounded driver artifact training runs on.
    * One shuffle (partial-aggregated), one TakeOrderedAndProject. */
  def wordFrequencies(docs: DataFrame, topV: Int = 50000,
      textCol: String = "text"): Seq[(String, Long)] = {
    require(topV > 0, "topV must be positive")
    graft.ops.Par.fanOut(
      docs.filter(length(trim(col(textCol))) > 0)
        .select(explode(split(trim(col(textCol)), "\\s+")).as("w")))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Merge every non-overlapping left-to-right (a,b) occurrence in `sym`. */
  private def mergePair(sym: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i < sym.length - 1 && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Textbook Sennrich training over a weighted word vocabulary: per round,
    * count adjacent symbol pairs weighted by word frequency, merge the most
    * frequent pair everywhere, repeat. Ties break lexicographically (count
    * DESC, then pair ASC) so the learned table is a pure function of the
    * vocabulary. Stops early when no adjacent pair remains. */
  def learnMerges(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var vocab: Vector[(Vector[String], Long)] = wordFreq.toVector
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      for ((sym, c) <- vocab; i <- 0 until sym.length - 1) {
        val p = (sym(i), sym(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head._1
        merges += ((a, b))
        vocab = vocab.map { case (sym, c) => mergePair(sym, a, b) -> c }
        round += 1
      }
    }
    merges.result()
  }

  /** End to end: distributed word-frequency head -> driver-side training. */
  def learnBpeMerges(docs: DataFrame, numMerges: Int, topV: Int = 50000,
      textCol: String = "text"): Seq[(String, String)] =
    learnMerges(wordFrequencies(docs, topV, textCol), numMerges)

  /** Greedy inference with an ARBITRARY learned table — the same
    * lowest-rank/leftmost loop as [[BpeVocab.tokenizeWord]], parameterized
    * so a just-learned vocabulary applies without re-pinning the literal. */
  def tokenizeWord(w: String, merges: Seq[(String, String)]): Array[String] = {
    if (w.isEmpty) return Array.empty
    val rank = merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
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
}
