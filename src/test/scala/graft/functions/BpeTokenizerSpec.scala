package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The greedy merge loop against hand-computed expectations — every rule of
  * the algorithm (rank priority, leftmost occurrence, stop condition) has a
  * word that exercises it. Corpus-level engine-vs-oracle parity is pinned by
  * the x36 gate query's fingerprint compare. */
class BpeTokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tok(w: String): Seq[String] = BpeVocab.tokenizeWord(w).toSeq

  test("multi-level merges reach the full word") {
    assert(tok("the") === Seq("the"))      // t+h -> th, th+e -> the
    assert(tok("table") === Seq("table"))  // t+a, l+e, ta+b, tab+le
    assert(tok("scan") === Seq("scan"))
    assert(tok("query") === Seq("query"))
    assert(tok("data") === Seq("data"))
    assert(tok("join") === Seq("join"))
    assert(tok("value") === Seq("value"))
    assert(tok("merge") === Seq("merge"))
    assert(tok("and") === Seq("an", "d"))
  }

  test("partial merges stop when no adjacent pair is in the table") {
    assert(tok("order") === Seq("or", "d", "er"))
    assert(tok("stream") === Seq("st", "r", "e", "a", "m"))
    assert(tok("xyz") === Seq("x", "y", "z"))
    assert(tok("a") === Seq("a"))
    assert(tok("") === Seq.empty)
  }

  test("rank priority beats position: the lowest-rank pair merges first") {
    // in "standing" the mid-word (t,a) chain head (rank 10) outranks both
    // the earlier (s,t) (rank 31) and the later (i,n) (rank 29), so ta
    // forms first and blocks st — position never overrides rank
    assert(tok("standing") === Seq("s", "ta", "n", "d", "in", "g"))
  }

  test("leftmost occurrence of the best pair merges first") {
    // t,h,t,h,e: rank-1 (t,h) occurs at 1 and 3 -> leftmost merges first;
    // then the remaining (t,h), then th+e
    assert(tok("ththe") === Seq("th", "the"))
  }

  test("the column expression flattens per-word streams in word order") {
    import spark.implicits._
    val df = Seq((1L, "the table  scan"), (2L, ""), (3L, "  "), (4L, "order by"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), BpeTokenizer.bpe_tokens(col("text")).as("sw"))
    val rows = df.orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(rows(0) === Seq("the", "table", "scan")) // multiple spaces collapse
    assert(rows(1) === Seq.empty)
    assert(rows(2) === Seq.empty)
    assert(rows(3) === Seq("or", "d", "er", "b", "y"))
  }

  test("memoized path equals the direct loop") {
    val words = Seq("the", "standing", "ththe", "xyz", "value", "order")
    words.foreach { w =>
      assert(BpeVocab.tokenizeWordCached(w).toSeq === tok(w))
      assert(BpeVocab.tokenizeWordCached(w).toSeq === tok(w)) // cache hit
    }
  }
}
