package graft.plans

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the scale-critical PHYSICAL plan shapes. These
  * queries are correct under any plan — what this spec pins down is the
  * plan property that makes each one survive a 100x scale-up: pushdown
  * reaching the scan, narrow stages staying shuffle-free, dimension/eval
  * sides broadcasting instead of shuffling the big side. A refactor that
  * silently breaks one of these still passes the value gate; it fails here.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def count(p: String, needle: String): Int = needle.r.findAllIn(p).size

  test("events time window is pushed into the parquet scan (q1)") {
    val p = plan("q1_trans_summary")
    // Tables.eventsInWindow pushes the raw-ns range predicate; an empty
    // PushedFilters here means every query re-reads the whole month
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), s"no filters reached the scan:\n$p")
  }

  test("context-window chunking is fully narrow — zero exchanges (x29)") {
    val p = plan("x29_chunks")
    assert(!p.contains("Exchange"), s"chunking must compose with the scan:\n$p")
  }

  test("bloom admission: the residual anti-join broadcasts the fingerprint side (x27)") {
    val p = plan("x27_bloom_admit")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), s"anti-join must not sort-merge at this size:\n$p")
  }

  test("contamination scan: eval side broadcasts, corpus side never pre-shuffles (x30)") {
    val p = plan("x30_contamination")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not shuffle for the join:\n$p")
    assert(count(p, "BroadcastExchange") >= 2, s"both eval-side joins should broadcast:\n$p")
    // the only hash-shuffles are the two aggregations (pair counts, eval sizes
    // pre-broadcast); anything more means a join started moving the corpus
    assert(count(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("star join: all three dims broadcast (q26)") {
    val p = plan("q26_star_join")
    assert(count(p, "BroadcastExchange") >= 3, s"supplier/nation/region must broadcast:\n$p")
  }

  test("salted aggregation is exactly two hash-shuffles — salt stage + merge stage (x31)") {
    val p = plan("x31_salted_agg")
    assert(count(p, "Exchange hashpartitioning") == 2, p)
  }

  test("repetition signals are doc-local — no hash exchange, single scan (x38)") {
    val p = plan("x38_repetition")
    // per-row sorted-run fold: the only allowed exchange is the round-robin
    // CPU fan-out; a hashpartitioning exchange means the explode+groupBy
    // formulation (two corpus-wide shuffles for a per-row statistic) crept back
    assert(count(p, "Exchange hashpartitioning") == 0, p)
    assert(count(p, "Scan parquet") == 1, s"doc spine re-scan crept back:\n$p")
  }

  test("BPE tokenization is fully narrow — zero exchanges (x36)") {
    val p = plan("x36_bpe_tokens")
    assert(!p.contains("Exchange"), s"the tokenizer must compose with the scan:\n$p")
  }

  test("shard packing never funnels through a single partition (x18)") {
    val p = plan("x18_token_shards")
    // the classic killer is a global running-total window (Exchange
    // SinglePartition); the two-pass prefix sum must keep the plan spread
    assert(!p.contains("Exchange SinglePartition"),
      s"prefix sum must not collapse to one partition:\n$p")
  }

  test("BM25 top-k is a heap merge, not a global sort (x37)") {
    val p = plan("x37_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy.limit must plan as per-partition heaps:\n$p")
    assert(!p.contains("Exchange SinglePartition") || p.contains("TakeOrdered"),
      s"scoring must not funnel through one partition:\n$p")
  }

  test("quantized IVF probe pushes the probed clusters into the postings scan (x35)") {
    val p = plan("x35_quantized_ivf")
    // the postings scan must carry a static cluster_id partition filter —
    // an unfiltered scan means every probe reads the whole inverted file
    assert(p.contains("PartitionFilters: [cluster_id"),
      s"postings scan must be partition-filtered on cluster_id:\n$p")
  }

  test("span dedup: no window over block hashes — groupBy + join only (x41)") {
    val p = plan("x41_dup_spans")
    // `count over (partition by h)` would buffer each hot block's whole
    // partition in WindowExec; the multiplicity must come from an aggregate
    // joined back (AQE can then split a skewed block key across reducers)
    assert(!p.contains("Window"), s"block multiplicity must not use a window:\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("DSIR weights: the per-term weight table broadcasts — no corpus-side shuffle join (x42)") {
    val p = plan("x42_dsir_weights")
    // token occurrences join the vocab-bounded weight table; that join must
    // be a broadcast (DSIR's hashed-feature space keeps the table small at
    // any corpus scale) — a sort-merge join on `term` re-shuffles every token.
    // (The doc-spine left join IS allowed to sort-merge: both sides arrive
    // hash-partitioned by doc_id, so it moves per-doc rows, never tokens.)
    assert("BroadcastHashJoin \\[term".r.findFirstIn(p).isDefined, p)
    assert("SortMergeJoin \\[term".r.findFirstIn(p).isEmpty,
      s"token->weight join must broadcast:\n$p")
  }
}
