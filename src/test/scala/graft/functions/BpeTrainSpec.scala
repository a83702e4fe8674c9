package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // The classic Sennrich corpus: low x5, lower x2, newest x6, widest x3.
  val sennrich = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the textbook Sennrich sequence, ties broken lexicographically") {
    // round 1 pair counts: (e,s)=9 and (s,t)=9 tie -> lexicographic picks (e,s);
    // round 2: (es,t)=9 dominates; round 3: (est,?) exhausted -> (l,o)=7/(o,w)=7
    // tie -> (l,o); round 4: (lo,w)=7.
    val merges = BpeTrain.learnMerges(sennrich, 4)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("learned merges drive the greedy tokenizer to the expected segmentation") {
    val merges = BpeTrain.learnMerges(sennrich, 6)
    // round 5 counts: lower (low,e)=2,(e,r)=2; newest (n,e)=6,(e,w)=6,
    // (w,est)=6; widest (w,i)=3,(i,d)=3,(d,est)=3 — three-way tie at 6 ->
    // lexicographic picks (e,w); round 6: newest=[n,ew,est] gives (n,ew)=6
    // vs (ew,est)=6 -> (ew,est) ("ew" < "n")
    assert(merges.take(4) === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges(4) === (("e", "w")) && merges(5) === (("ew", "est")))
    assert(BpeTrain.tokenizeWord("low", merges).toSeq === Seq("low"))
    assert(BpeTrain.tokenizeWord("lowest", merges).toSeq === Seq("low", "est"))
    assert(BpeTrain.tokenizeWord("newest", merges).toSeq === Seq("n", "ewest"))
  }

  test("training stops early when every word collapses to one symbol") {
    val merges = BpeTrain.learnMerges(Seq(("ab", 3L), ("ab", 2L)), 10)
    assert(merges === Seq(("a", "b")), "nothing left to merge after round 1")
  }

  test("end-to-end learning from the fixture is layout-independent and feeds tokenization") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = BpeTrain.learnBpeMerges(docs, numMerges = 12, topV = 2000)
    val relaid = BpeTrain.learnBpeMerges(docs.repartition(7), numMerges = 12, topV = 2000)
    assert(base === relaid, "learned table must not depend on partitioning")
    assert(base.size === 12)
    // the learned table must actually compress the corpus head: the most
    // frequent multi-char word should tokenize to fewer symbols than chars
    val top = BpeTrain.wordFrequencies(docs, topV = 10).map(_._1).find(_.length >= 3).get
    assert(BpeTrain.tokenizeWord(top, base).length < top.length)
  }

  test("wordFrequencies head is deterministic: count desc, word asc") {
    val df = Seq("b b b a a c", "a c c", "").toDF("text")
    val wf = BpeTrain.wordFrequencies(df, topV = 10)
    assert(wf === Seq(("a", 3L), ("b", 3L), ("c", 3L)))
  }
}
