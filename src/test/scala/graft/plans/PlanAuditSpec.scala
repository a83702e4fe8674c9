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

  /** The UNCACHED physical plan. Two guards against suite-order flakiness:
    * (a) clear the cache manager first, so a sibling suite's `.cache()` of a
    * shared subtree cannot splice an InMemoryRelation (whose string embeds
    * the cached plan's own "Final Plan"/"Initial Plan" AQE sections and
    * double-counts every pinned operator) into this plan; (b) defensively
    * slice off anything from "== Initial Plan ==" on, so even an embedded
    * AQE dump is counted once. */
  private def plan(name: String): String = {
    spark.sharedState.cacheManager.clearCache()
    val s = graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    s.split("== Initial Plan ==")(0)
  }

  private def count(p: String, needle: String): Int = needle.r.findAllIn(p).size

  test("events time window is pushed into the parquet scan (q1)") {
    val p = plan("q1_trans_summary")
    // Tables.eventsInWindow pushes the raw-ns range predicate; an empty
    // PushedFilters here means every query re-reads the whole month
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), s"no filters reached the scan:\n$p")
  }

  test("events loader adapts to BOTH physical ts encodings and pushes the window either way") {
    // The driver fixtures have shipped ts as TIMESTAMP(NANOS) (read as a raw
    // LONG via nanosAsLong) and as TIMESTAMP(MICROS) (read natively as
    // TIMESTAMP_NTZ) depending on the writer's arrow version. Write one tiny
    // fixture per encoding in-test so neither branch of Tables.eventsRanged
    // can rot: each must (a) load, (b) yield identical wall-clock rows, and
    // (c) push the window predicate into the parquet scan.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString
    val base = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "view", 1.5, "{}"),
      (2L, "2024-01-01 12:30:00", 11L, "purchase", 2.5, "{}"),
      (3L, "2024-01-02 00:00:00", 12L, "view", 3.5, "{}"),
      (4L, "2024-01-03 09:00:00", 13L, "error", 4.5, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
    // micros encoding: Spark writes TIMESTAMP_NTZ as TIMESTAMP(MICROS,false)
    base.select(col("event_id"), expr("cast(tss as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/us/events.parquet")
    // nanos encoding: under nanosAsLong=true Spark surfaces TIMESTAMP(NANOS)
    // as a plain INT64, which is exactly what a raw ns-long column is — so a
    // long column exercises the same LongType branch and the same pushdown
    base.select(col("event_id"),
        // unix_micros needs TIMESTAMP (session TZ is UTC, so wall == epoch)
        expr("unix_micros(cast(tss as timestamp)) * 1000").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/ns/events.parquet")

    val (gte, lt) = ("2024-01-01 06:00:00", "2024-01-02 12:00:00")
    val us = graft.Tables.eventsInWindow(spark, s"$tmp/us", gte, lt)
    val ns = graft.Tables.eventsInWindow(spark, s"$tmp/ns", gte, lt)
    for ((df, enc) <- Seq((us, "us"), (ns, "ns"))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
        s"$enc encoding: window did not reach the scan:\n$p")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType, enc)
    }
    val usRows = us.select("event_id", "ts").collect().map(_.toString).sorted
    val nsRows = ns.select("event_id", "ts").collect().map(_.toString).sorted
    assert(usRows.sameElements(nsRows), "encodings disagree on rows")
    assert(usRows.length == 2, usRows.mkString(","))
  }

  test("canonical selection aggregates the argmax — no WindowExec anywhere (x46)") {
    val p = plan("x46_canonical_docs")
    // the per-cluster winner must come from a map-side-combining max-of-
    // struct aggregation; a Window(row_number) formulation sorts every
    // cluster's rows just to read rank 1 and buffers hot clusters
    assert(!p.contains("Window"), s"argmax degraded to a window sort:\n$p")
  }

  test("frequency cap: the rate table broadcasts, the corpus never shuffles for it (x49)") {
    val p = plan("x49_frequency_cap")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"bounded rate table must broadcast, not shuffle the corpus:\n$p")
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

  test("indexed BM25 probe pushes the term IN filter into the postings scan (x37)") {
    val p = plan("x37_bm25")
    // the whole point of the staged inverted file: a probe reads the probe
    // terms' postings rows, not the corpus — the IN literal must reach the
    // parquet scan (row-group pruning via the term-sorted layout)
    assert("PushedFilters: \\[[^\\]]*In\\(term".r.findFirstIn(p).isDefined,
      s"term IN filter did not reach the postings scan:\n$p")
  }

  test("weighted sampling selects via the bounded aggregate — no window sort (x50)") {
    val p = plan("x50_weighted_sample")
    // a row_number window would shuffle and sort EVERY row of every stratum
    // (one language = most of a crawl = one sorting partition at 100 TB);
    // TopKPairs plans as ObjectHashAggregate with k-bounded buffers
    assert(!p.contains("Window"), s"selection degraded to a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("outlier scan: centroids broadcast, bottom-k is a heap merge (x51)") {
    val p = plan("x51_centroid_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"nlist centroids must broadcast, not shuffle the postings:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-k must plan as per-partition heaps:\n$p")
  }

  test("datacard: the dup-fingerprint join broadcasts the >=2 groups, not the corpus (x52)") {
    val p = plan("x52_datacard")
    // only hash groups with count >= 2 survive to the join side — tiny on a
    // mostly-unique corpus — so the join must be a broadcast; a sort-merge
    // join on the fingerprint re-shuffles every doc's hash
    assert("BroadcastHashJoin \\[_fp".r.findFirstIn(p).isDefined,
      s"dup-fingerprint join must broadcast:\n$p")
  }

  test("grouping sets plan as ONE Expand + one shuffle — not a union of re-scans (q31)") {
    val p = plan("q31_grouping_sets")
    assert(count(p, "Expand") == 1, p)
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(count(p, "Scan parquet") == 1, s"grouping sets must share one scan:\n$p")
  }

  test("running frames: three window specs share ONE exchange + sort (q34)") {
    val p = plan("q34_running_frames")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"rn/running_total/trail3_max must ride the same user_id shuffle:\n$p")
    assert(count(p, "Sort \\[") == 1, s"same order => one sort:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"global window crept in:\n$p")
  }

  test("ntile report: the tile agg reuses the window's partitioning — one exchange total (q33)") {
    val p = plan("q33_ntile")
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"groupBy(segment, tile) must reuse the segment partitioning:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("KMV sketch aggregates partially map-side — ObjectHashAggregate, filters pushed (q35)") {
    val p = plan("q35_approx_distinct")
    assert(p.contains("ObjectHashAggregate"), s"sketch must plan as object agg:\n$p")
    assert(!p.contains("PushedFilters: []"), s"window filter must reach the scan:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("chunk dedup is exactly two hash exchanges — fp survivorship + doc rollup (x55)") {
    val p = plan("x55_chunk_dedup")
    assert(count(p, "Exchange hashpartitioning") == 2, p)
    assert(count(p, "Scan parquet") == 1, s"chunking must stay fused with the scan:\n$p")
  }

  test("tf-idf: norm + top-k share one doc_id exchange; the scored subtree is not duplicated (x56)") {
    val p = plan("x56_tfidf_terms")
    assert(p.contains("BroadcastExchange"), s"the N row must broadcast:\n$p")
    // exactly one SinglePartition exchange is legitimate: the global count
    // that makes the one-row N (bytes). The df/top-k windows must NOT add
    // another — a second one means a corpus-wide window collapsed.
    assert(count(p, "Exchange SinglePartition") <= 1,
      s"df/top-k windows must stay key-partitioned:\n$p")
    // docs scan + the one-row N scan; a third means the norm branch
    // recomputed tf/df from scratch
    assert(count(p, "Scan parquet") <= 2, s"scored subtree duplicated:\n$p")
  }

  test("curriculum packing has NO window operator — the prefix sum is the two-pass scan (x57)") {
    val p = plan("x57_curriculum")
    assert(!p.contains("Window"), s"global running total degraded to a window:\n$p")
  }

  test("graph degree: LSH self-join stays bucket-keyed, no nested-loop fallback (x58)") {
    val p = plan("x58_graph_degree")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation degraded to all-pairs:\n$p")
  }

  test("seeded shuffle has NO window operator — global positions are the two-pass scan (x64)") {
    val p = plan("x64_seeded_shuffle")
    assert(!p.contains("Window"), s"global permutation degraded to a window:\n$p")
  }

  test("PMI pairs: the frequent-term df table broadcasts; k-cut is a heap merge (x65)") {
    val p = plan("x65_pmi_pairs")
    assert(p.contains("BroadcastHashJoin"), s"df table must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not be a global sort:\n$p")
  }

  test("prefix jaccard join: equi-joins only, no all-pairs fallback (x67)") {
    val p = plan("x67_ppjoin_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate generation degraded to all-pairs:\n$p")
  }

  test("column profile: no Expand — pruned per-column scans with partial aggs (x68)") {
    val p = plan("x68_column_profile")
    assert(!p.contains("Expand"), s"profiler regressed to the multi-distinct Expand:\n$p")
    // every per-column scan must read exactly one column
    val schemas = "ReadSchema: [^\\n]+".r.findAllIn(p).toSeq
    assert(schemas.nonEmpty && schemas.forall(s => s.count(_ == ':') <= 2),
      s"a profile scan reads more than its own column:\n${schemas.mkString("\n")}")
  }

  test("decayed activity: exact-integer shift aggregation, heap-merged top-20 (x71)") {
    val p = plan("x71_decayed_activity")
    assert(p.contains("TakeOrderedAndProject"), s"leaderboard cut must not be a global sort:\n$p")
    assert(p.contains("BroadcastExchange"), s"the one-row anchor must broadcast:\n$p")
  }

  test("funnel: no window buffering; step joins are key-hashed (q43)") {
    val p = plan("q43_funnel")
    assert(!p.contains("Window"), s"funnel must not buffer per-key event lists in a window:\n$p")
    // the only nested-loop is the 1-row conversion anchor; the per-step
    // event joins must be hash joins on the funnel key
    assert(count(p, "(?:Sort|Shuffled|Broadcast)HashJoin") >= 2,
      s"step joins degraded from hash joins:\n$p")
  }

  test("SCD2 window chain shares ONE natural-key exchange (q50)") {
    val p = plan("q50_scd2")
    // lag -> running segment sum -> lead: all three windows are partitioned
    // by user_id, so Catalyst must reuse a single hash exchange; a second
    // one means a window slipped off the shared (user_id [, ordering])
    // partitioning and the dimension build re-shuffles its biggest input
    assert(count(p, "Exchange hashpartitioning") == 1,
      s"the q50 window chain must share one user_id exchange:\n$p")
  }

  test("co-purchase top-k cuts with TakeOrderedAndProject, count tables broadcast (q47)") {
    val p = plan("q47_copurchase")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-100 cut must not materialize a global sort:\n$p")
    assert(count(p, "BroadcastExchange") >= 2,
      s"the per-part count tables must broadcast:\n$p")
  }

  test("MAD audit windows run over the value HISTOGRAM, not raw rows (q48)") {
    val p = plan("q48_mad_outliers")
    // both median windows must sit above a (type, value) hash aggregation —
    // window input domain-bounded by distinct cents. A WindowExec whose
    // child has no aggregate means the raw-row formulation crept back, and
    // plan/enforce medians join back via broadcast (tiny per-type tables).
    assert(count(p, "Window") >= 2 && count(p, "HashAggregate") >= 4, p)
    assert(count(p, "BroadcastExchange") >= 2,
      s"median/MAD plan tables must broadcast:\n$p")
  }

  test("dedup sweep rides the prefix-filtered pair path: equi-joins only (x83)") {
    val p = plan("x83_dedup_sweep")
    // the pair generator must be jaccardPairsPrefix (x67's scale path), not
    // the all-shingles self-join: no all-pairs fallback anywhere, and the
    // threshold fan-out is an explode over the pair table, never a re-scan
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"sweep pair generation degraded to all-pairs:\n$p")
  }

  test("triangle audit: degree-ordered node-iterator, hash joins, no window (x79)") {
    val p = plan("x79_triangles")
    // wedge generation and closure must be key-hashed joins over the
    // oriented edge set; a window/sort or nested-loop means the per-hub
    // wedge bound (lowest-degree corner) was lost
    assert(!p.contains("Window"), s"triangle counting buffered per-node lists:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"wedge/closure degraded to all-pairs:\n$p")
  }

  test("PSI drift stays histogram-level: marginals broadcast onto the bucket table (x81)") {
    val p = plan("x81_psi_drift")
    // after the one doc-level counter aggregation, the source/bucket/total
    // marginals are O(|sources| * log max_len) rows and must attach via
    // broadcast — a SortMergeJoin here means a marginal re-shuffled the
    // bucket table (or worse, joined back at doc granularity)
    assert(!p.contains("SortMergeJoin"), s"a PSI marginal join re-shuffles:\n$p")
    assert(count(p, "BroadcastExchange") >= 2,
      s"source/bucket marginals must broadcast:\n$p")
  }

  test("quantile calibration windows run over the level histogram (x82)") {
    val p = plan("x82_quantile_calib")
    // all three windows (per-source CDF, corpus CDF, inverse-CDF sweep)
    // take domain-bounded histogram rows; every join attaches a tiny
    // marginal via broadcast. A SortMergeJoin means a per-doc join crept in.
    assert(!p.contains("SortMergeJoin"), s"a calibration join re-shuffles:\n$p")
    assert(count(p, "Window") >= 3, s"a CDF window collapsed or was bypassed:\n$p")
  }

  test("streaming MAD enforcement joins the plan table via broadcast hint (s18)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s18-pin").toString
    Seq((1L, "view", 100L), (2L, "purchase", 250L))
      .toDF("event_id", "event_type", "cents")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val planTab = Seq(("view", 100L, 10L), ("purchase", 250L, 25L))
      .toDF("event_type", "median_cents", "mad_cents")
    val df = graft.queries.StreamingQueries.s18StreamFrame(stream, planTab)
    // analyzed (not optimized) plan: a streaming frame refuses batch
    // optimization, but the hint audit only needs the resolved tree
    val lp = df.queryExecution.analyzed.toString
    // the plan table must carry the broadcast hint into the stream-static
    // join (zero stream-side shuffle for the enrichment), and the only
    // stateful operator is the per-type counter aggregate
    assert(lp.contains("ResolvedHint") && lp.toLowerCase.contains("broadcast"),
      s"plan-table broadcast hint lost on the stream-static join:\n$lp")
    assert(df.isStreaming, "s18 frame must still be a streaming frame")
  }

  test("CMS heavy hitters: counter table broadcasts onto the probe, no global sort (x84)") {
    val p = plan("x84_cms_heavy")
    assert(p.contains("BroadcastHashJoin"),
      s"the depth*width counter table (and the 1-row total) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"nothing in the sketch probe justifies shuffling both sides:\n$p")
  }

  test("sorted neighborhood: NO window operator — rank is the two-pass scan; pairing is an equi-join (x85)") {
    val p = plan("x85_sorted_neighborhood")
    assert(!p.contains("Window"),
      s"global rank degraded to a single-partition ORDER BY window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"candidate pairing degraded to a non-equi join:\n$p")
  }

  test("fuzzy blocking joins variants hash-to-hash, never all pairs (x86)") {
    val p = plan("x86_fuzzy_block")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"deletion-variant blocking degraded to an all-pairs fuzzy join:\n$p")
  }

  test("silhouette: centroid table broadcasts; own+other from ONE agg, no self-join (x87)") {
    val p = plan("x87_silhouette")
    assert(p.contains("BroadcastExchange"),
      s"the nlist-row centroid table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"own-vs-other must come from one aggregation, not a corpus self-join:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the per-vector sort input must be limit-pruned to the top-2:\n$p")
  }

  test("streaming CMS keeps integer-only, depth*width-bounded state (s20)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s20-pin").toString
    Seq("a", "b", "a").toDF("item").write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s20CounterFrame(stream)
    assert(df.isStreaming, "s20 counters must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(Array("j", "bucket", "cnt")), df.schema.treeString)
    assert(df.schema("cnt").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(!lp.toLowerCase.contains("join"),
      s"s20's stream side must be a pure counter aggregation — probes stay batch-side:\n$lp")
  }

  test("containment pairs: equi-joins only, no window — prefix vs posting list (x88)") {
    val p = plan("x88_containment_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment candidates degraded to an all-pairs join:\n$p")
    assert(!p.contains("Window"),
      s"nothing in the containment path justifies a global window:\n$p")
  }

  test("novelty: reference membership is a shingle-keyed ANTI join, never doc x doc (x89)") {
    val p = plan("x89_novelty")
    assert(p.contains("LeftAnti"),
      s"novel counts must come from an anti join against the reference set:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"reference membership degraded to a non-equi join:\n$p")
  }

  test("k-anonymity ladder: pure aggregation — constant fan-out, no join anywhere (x90)") {
    val p = plan("x90_kanon_ladder")
    assert(!p.toLowerCase.contains("join"),
      s"the class census is two hash aggregations; a join means a wrong shape:\n$p")
    assert(p.contains("Generate"),
      s"the width ladder must be a constant explode fan-out:\n$p")
  }

  test("KS matrix sup scan: level-keyed equi self-join over the materialized ECDF (x91)") {
    // the ECDF table is localCheckpoint'd (domain-bounded), so the visible
    // plan is the pair sup scan itself: it must pair sources through the
    // level-keyed equi join — never a corpus-sized cross
    val p = plan("x91_ks_matrix")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the pair sup scan must ride the level-keyed equi join:\n$p")
    assert(p.contains("Join"),
      s"expected the ECDF self-join in the final plan:\n$p")
  }

  test("memorization audit: explode + two hash aggs, no join anywhere (x92)") {
    val p = plan("x92_memorization")
    assert(!p.toLowerCase.contains("join"),
      s"context stats are two aggregations; a join means a wrong shape:\n$p")
    assert(p.contains("Generate"),
      s"gram slots must come from one explode pass:\n$p")
    assert(!p.contains("Window"),
      s"nothing here justifies a window:\n$p")
  }

  test("k-center coreset result assembles from materialized picks — no shuffle, no join (x93)") {
    // each greedy round ran as a narrow broadcast pass + TakeOrdered(1),
    // localCheckpoint'd; the final plan must be a plain union of those k
    // 1-row scans — an Exchange or Join here means a round leaked a shuffle
    val p = plan("x93_kcenter_coreset")
    assert(!p.contains("Exchange"), s"coreset assembly must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("join"), s"coreset assembly must not join:\n$p")
  }

  test("entropy rate: ctx-keyed aggs + broadcast totals, no wide join (x94)") {
    val p = plan("x94_entropy_rate")
    assert(p.contains("Generate"), s"gram slots come from one explode pass:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 3-row totals table must broadcast onto the context rollup:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"nothing here justifies shuffling two corpus-sized sides together:\n$p")
  }

  test("bigram xent: explode + model equi-joins, never doc x doc (x95)") {
    val p = plan("x95_bigram_xent")
    assert(p.contains("Generate"), s"bigram slots come from one explode pass:\n$p")
    // The one permitted non-equi join is the 1-row vocabulary scalar
    // broadcast onto the scored rows (folding the former eager .count()
    // into the DAG saved a full explode pass); anything beyond that single
    // BuildRight scalar cross means a corpus-sized side leaked in.
    assert(!p.contains("CartesianProduct") &&
        count(p, "BroadcastNestedLoopJoin") <= 1,
      s"scoring joins doc-bigrams to the model on the bigram KEY:\n$p")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"model re-attach (pair + ctx totals) must stay equi-broadcast:\n$p")
    assert(!p.contains("Window"), s"nothing here justifies a window:\n$p")
  }

  test("benford audit: exact-cents digits, every join broadcast-sized (x96)") {
    // obs census is rows-sized; everything after (9-digit grid, group list,
    // 45-row window) is bounded — a SortMergeJoin would mean a corpus-sized
    // side leaked into the grid completion
    val p = plan("x96_benford")
    assert(!p.contains("SortMergeJoin"),
      s"grid completion joins bounded sides — they must broadcast:\n$p")
    assert(!p.toLowerCase.contains("log10"),
      s"no float log on the data path — digits come from exact cents:\n$p")
  }

  test("gini concentration: spectrum-level — no join, window input is the spectrum (x97)") {
    val p = plan("x97_gini")
    assert(!p.toLowerCase.contains("join"),
      s"the Lorenz mass is a closed form on the spectrum; a join means a wrong shape:\n$p")
    assert(p.contains("Generate"), s"terms come from one explode pass:\n$p")
    // the window runs over the per-source FREQUENCY SPECTRUM (O(sqrt tokens)
    // rows), after two hash aggregations — assert both aggs precede it
    assert(count(p, "HashAggregate") >= 4,
      s"term agg + spectrum agg (partial+final each) must precede the window:\n$p")
  }

  test("attribution: ONE user-keyed window pass, no join, no second sort (q53)") {
    val p = plan("q53_attribution")
    assert(!p.toLowerCase.contains("join"),
      s"the history walk is a window pass, not a self-join:\n$p")
    assert(count(p, "Window") == 1,
      s"both last-touch columns must share ONE window operator (one sort, one exchange):\n$p")
    assert(count(p, "Exchange hashpartitioning") <= 2,
      s"window + final channel rollup = at most two exchanges:\n$p")
  }

  test("neyman allocation: ONE corpus aggregation, scalar total broadcasts (x98)") {
    val p = plan("x98_neyman_alloc")
    assert(count(p, "Exchange hashpartitioning") <= 1,
      s"one stratum-keyed aggregation shuffle — the rest is |strata|-sized:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 1-row weight total must broadcast, never shuffle-join:\n$p")
    assert(!p.contains("Window"), s"nothing here justifies a window:\n$p")
  }

  test("streaks: window input is the per-user DAY CENSUS, not raw events (q54)") {
    val p = plan("q54_streaks")
    assert(!p.toLowerCase.contains("join"),
      s"islands are a window trick, not a self-join:\n$p")
    assert(count(p, "Window") == 1, s"one user-keyed window pass:\n$p")
    // the distinct (user, day) aggregation must run BEFORE the window sort —
    // on the plan string the first HashAggregate pair appears below Window
    val winAt = p.indexOf("Window")
    val aggAt = p.lastIndexOf("HashAggregate")
    assert(winAt >= 0 && aggAt > winAt,
      s"the day-census distinct must feed the window, not follow it:\n$p")
  }

  test("streaming benford census: stateless digit projection, 9x|types| counter state (s24)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s24-pin").toString
    Seq(("purchase", 12.34), ("view", 0.02))
      .toDF("event_type", "value").write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s24BenfordFrame(stream)
    assert(df.isStreaming, "s24's census must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(
      Array("event_type", "digit", "obs")), df.schema.treeString)
    assert(df.schema("obs").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(!lp.toLowerCase.contains("join"),
      s"s24's stream side must be a pure counter aggregation:\n$lp")
    assert(!lp.toUpperCase.contains("LOG10") && !lp.toUpperCase.contains("LOG("),
      s"digits come from exact cents, no float log on the stream:\n$lp")
  }

  test("winsorize audit: sweep runs on the cents CENSUS, thresholds broadcast back (x99)") {
    val p = plan("x99_winsorize")
    assert(!p.contains("SortMergeJoin"),
      s"the |groups|-row threshold table must broadcast onto the census probe:\n$p")
    assert(p.contains("Window"),
      s"the inverse-CDF sweep is a window over the value census:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unkeyed pairing anywhere:\n$p")
  }

  test("vocab growth: value-range buckets — no global sort, bounded joins (x100)") {
    val p = plan("x100_vocab_growth")
    assert(p.contains("Generate"), s"terms/shingles come from explode passes:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 10-row bucket tables must broadcast-join:\n$p")
    // the only window runs over the ten-row bucket rollup, so no
    // corpus-sized Sort may feed a Window (the global-rank formulation
    // would show exactly that)
    assert(count(p, "Window") == 1, s"one cumulative rollup window:\n$p")
  }

  test("streaming winsor enforcement: one stateless threshold join, |types| counter state (s25)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s25-pin").toString
    Seq(("purchase", 12.34), ("view", 0.02))
      .toDF("event_type", "value").write.mode("overwrite").parquet(s"$tmp/in")
    val thr = Seq(("purchase", 100L, 1000L), ("view", 1L, 500L))
      .toDF("event_type", "lo_cents", "hi_cents")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s25WinsorFrame(stream, thr)
    assert(df.isStreaming, "s25's audit must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(Array("event_type", "n",
      "lo_cents", "hi_cents", "clipped_lo", "clipped_hi", "moved_cents")),
      df.schema.treeString)
    assert(df.schema("moved_cents").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(lp.toLowerCase.split("join").length == 2,
      s"exactly ONE stream-static threshold join, nothing stateful-joined:\n$lp")
  }

  test("streaming xent scorer: two stateless model joins, |sources| counter state (s23)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s23-pin").toString
    Seq((1L, "web", "a b c d"), (2L, "books", "c d e f"))
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(s"$tmp/in")
    val pairs = Seq(("a", "b", 3L), ("b", "c", 2L)).toDF("ctx", "nxt", "cp")
    val ctxTotals = pairs.groupBy("ctx")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("cp")).as("cc"))
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s23XentFrame(stream, pairs, ctxTotals, 5L)
    assert(df.isStreaming, "s23's scorer must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(
      Array("source", "slots", "unseen_pairs", "xent")), df.schema.treeString)
    assert(df.schema("slots").dataType.typeName == "long" &&
      df.schema("unseen_pairs").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(lp.toLowerCase.split("join").length == 3,
      s"exactly TWO stream-static model joins, nothing stateful-joined:\n$lp")
  }

  test("streaming novelty meter: one stateless static probe, integer |sources| state (s22)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s22-pin").toString
    Seq((1L, "web", "a b c d"), (2L, "books", "c d e f"))
      .toDF("doc_id", "source", "text").write.mode("overwrite").parquet(s"$tmp/in")
    val ref = Seq("a b c").toDF("s").withColumn("hit",
      org.apache.spark.sql.functions.lit(1))
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s22NoveltyFrame(stream, ref)
    assert(df.isStreaming, "s22's meter must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(
      Array("source", "probed", "novel", "novelty_rate")), df.schema.treeString)
    assert(df.schema("probed").dataType.typeName == "long" &&
      df.schema("novel").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(lp.toLowerCase.split("join").length == 2,
      s"exactly ONE stream-static membership join, nothing stateful-joined:\n$lp")
  }

  test("streaming k-anonymity census keeps integer-only, QI-domain-bounded state (s21)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s21-pin").toString
    Seq((1L, "BUILDING", 123.45), (1L, "BUILDING", 234.56), (2L, "MACHINERY", -10.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s21CensusFrame(stream)
    assert(df.isStreaming, "s21's census must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(
      Array("c_nationkey", "c_mktsegment", "bucket", "class_size")), df.schema.treeString)
    assert(df.schema("class_size").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(!lp.toLowerCase.contains("join"),
      s"s21's stream side must be a pure class-count aggregation:\n$lp")
  }

  test("streaming PSI keeps integer-only, volume-independent state (s19)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s19-pin").toString
    Seq(("web", 5), ("web", 6), ("books", 5))
      .toDF("source", "bucket")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s19CounterFrame(stream)
    assert(df.isStreaming, "s19 counters must aggregate ON the stream")
    // state schema = grouping keys + one LongType counter: no float ever
    // enters the stream state, so complete-mode output is merge-order-proof
    assert(df.schema.fieldNames.sameElements(Array("source", "bucket", "c_sb")), df.schema.treeString)
    assert(df.schema("c_sb").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(!lp.toLowerCase.contains("join"),
      s"s19's stream side must be a pure counter aggregation — floats stay batch-side:\n$lp")
  }

  test("survival curve: one corpus shuffle, census-sized KM windows (x101)") {
    val p = plan("x101_survival")
    assert(!p.contains("SortMergeJoin"),
      s"the 1-row horizon must broadcast onto the user table:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unkeyed pairing:\n$p")
    // the at-risk rollup and the survival product share ONE census window
    // pass (two Window frames collapse into one Window node when they share
    // the ordering); a per-user or per-event window would be a second node
    assert(count(p, "Window") <= 2, s"windows must run on the lifetime census only:\n$p")
  }

  test("burstiness: lag window keyed by (user,type) — never a type-wide sort (x102)") {
    val p = plan("x102_burstiness")
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("user_id") && winLine.contains("event_type"),
      s"the lag window must partition by (user, type):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"one scan, one window, one rollup — no joins at all:\n$p")
  }

  test("RFM: three census sweeps broadcast, no user-sized sort (q55)") {
    val p = plan("q55_rfm")
    assert(!p.contains("SortMergeJoin"),
      s"the 1-row cut tables must broadcast onto the scoring scan:\n$p")
    // exactly three cumulative windows — one per metric census; a
    // user-sized ntile/percent_rank formulation would add more
    assert(count(p, "Window") == 3, s"three census windows only:\n$p")
    assert(!p.contains("CartesianProduct"), s"broadcast NLJ only for 1-row cuts:\n$p")
  }

  test("CUSUM: windows collapse onto ONE census pass, totals broadcast (x103)") {
    val p = plan("x103_cusum")
    assert(!p.contains("SortMergeJoin"),
      s"the |types|-row totals must broadcast onto the day census:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unkeyed pairing:\n$p")
    // the running sum feeds the running min/max, so the three land in TWO
    // pipelined Window nodes — but they share one partitioning and one
    // sort: exactly ONE Sort in the whole plan (the argmax SortAggregate
    // reuses the window order), never a per-window re-shuffle
    assert(count(p, "Window") == 2, s"two pipelined census window nodes:\n$p")
    assert(count(p, "Sort \\[") == 1,
      s"both windows and the argmax must share ONE census sort:\n$p")
  }

  test("ACF: no window at all — lag pairs are census equi-joins (x104)") {
    val p = plan("x104_acf")
    assert(count(p, "Window") == 0,
      s"the lag formulation must be a census self-join, not a per-type sort window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the pair join probes the checkpointed census broadcast-side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 7-row lag table broadcasts; pairs join on (type, day-k):\n$p")
  }

  test("rolling actives: sliding distinct via explode — no window, no range join (q56)") {
    val p = plan("q56_rolling_actives")
    assert(count(p, "Window") == 0,
      s"trailing-7d distinct must come from the coverage explode, not a window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the 7-row offsets and 1-row horizon broadcast; day tables hash-join:\n$p")
  }

  test("PIT feature join runs through the native as-of merge exec — no range join (q58)") {
    val p = plan("q58_pit_join")
    assert(p.contains("AsOfMergeJoin"),
      s"the point-in-time lookup must plan as the native merge exec:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"a range-predicate join would nest-loop; the as-of exec must replace it:\n$p")
  }

  test("conversion lag: percentile sweep on the lag census, one window (q59)") {
    val p = plan("q59_conversion_lag")
    assert(count(p, "Window") == 1,
      s"the inverse-CDF sweep runs once, on the |distinct lags| census:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total broadcasts onto the census:\n$p")
  }

  test("Hill tail: top-k via heap cut — no global sort, no shuffle of the corpus (x106)") {
    val p = plan("x106_hill_tail")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k cut must plan as per-partition heaps:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"a global ORDER BY would range-shuffle the corpus:\n$p")
    assert(!p.toLowerCase.contains("join") && count(p, "Window") == 0,
      s"estimator is one aggregate over k rows:\n$p")
  }

  test("ship delay: one key join, percentile sweep on the delay census (q60)") {
    val p = plan("q60_ship_delay")
    assert(count(p, "Window") == 1,
      s"the inverse-CDF sweep runs once, on the (priority, delay) census:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lineitem joins orders on the key; totals broadcast-hash onto the census:\n$p")
  }

  test("chi-square mix audit: marginals broadcast onto the contingency census (x107)") {
    val p = plan("x107_chi2_mix")
    assert(!p.contains("SortMergeJoin"),
      s"the |A|/|B| marginal tables must broadcast onto the census probe:\n$p")
    assert(count(p, "Window") == 0, s"closed-form statistic needs no window:\n$p")
  }

  test("kNN agreement probes the pruned IVF postings; sample cap is a heap cut (x108)") {
    val p = plan("x108_knn_agreement")
    // the round-6 scale fix: the audit sample is an absolute 256-row cap
    // (TakeOrdered heap, not a fraction) and scoring reads ONLY the probed
    // clusters' postings partitions — an unpruned scan or a resurrected
    // brute pairing would put the audit back on the n^2 path
    assert(p.contains("PartitionFilters: [cluster_id"),
      s"postings scan must be partition-filtered on the probed clusters:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the md5-ordered sample cap must plan as per-partition heaps:\n$p")
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("query_id"),
      s"the rank cut partitions per query — never a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast pairing:\n$p")
  }

  test("fuzzy summary joins DISTINCT names, never entity rows (x110)") {
    val p = plan("x110_fuzzy_summary")
    // the whole point of the serving form: the group-quadratic pair mass
    // (~3e9 true pairs at sf10) must never enter the plan — the variant
    // equi-join sits on the distinct-name collapse (groupBy name) and
    // multiplicities re-expand arithmetically afterwards
    assert(!p.contains("CartesianProduct"), s"no unbroadcast pairing:\n$p")
    assert(count(p, "keys=\\[name#") >= 2,
      s"the variant join must consume the DISTINCT-name collapse, not raw entities:\n$p")
    assert(count(p, "Window") == 0, s"aggregates only — no window sort:\n$p")
  }

  test("fuzzy top-k ranks through bounded heaps, never a window sort (x111)") {
    val p = plan("x111_fuzzy_topk")
    // per-name candidate ids come from the topk_pairs bounded aggregate
    // (O(k) state at every stage, map-side combinable); a window rank here
    // would sort every name group's rows just to read the head
    assert(count(p, "Window") == 0, s"ranking must be heap-bounded, no window:\n$p")
    assert(p.contains("topk_pairs"), s"the bounded top-k aggregate must plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast pairing:\n$p")
    assert(count(p, "keys=\\[name#") >= 2,
      s"the variant join must consume the DISTINCT-name collapse:\n$p")
  }

  test("brute agreement twin broadcasts the capped sample onto one corpus stream (x109)") {
    val p = plan("x109_knn_agreement_brute")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the capped query sample must broadcast; the corpus streams once:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast pairing:\n$p")
  }

  test("Wilson CI: two hash aggregations, no join, no window (q57)") {
    val p = plan("q57_wilson_ci")
    assert(!p.toLowerCase.contains("join"),
      s"one (user,dow) rollup then one dow rollup — nothing joins:\n$p")
    assert(count(p, "Window") == 0, s"closed-form interval needs no window:\n$p")
  }

  test("Zipf slope: regression runs on the frequency spectrum, one window (x105)") {
    val p = plan("x105_zipf_slope")
    assert(!p.toLowerCase.contains("join"), s"term -> spectrum -> rollup, no join:\n$p")
    assert(count(p, "Window") == 1,
      s"the descending-rank cumulative window runs once, on the spectrum:\n$p")
  }

  test("streaming CUSUM keeps integer-only, |types|x|days| counter state (s27)") {
    val spark0 = spark
    import spark0.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s27-pin").toString
    Seq(("purchase", 19723L), ("view", 19724L)).toDF("event_type", "day")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s27CounterFrame(stream)
    assert(df.isStreaming, "s27's census must count ON the stream")
    assert(df.schema.fieldNames.sameElements(Array("event_type", "day", "cnt")),
      df.schema.treeString)
    assert(df.schema("cnt").dataType.typeName == "long", df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(!lp.toLowerCase.contains("join"),
      s"pure counter aggregation — the CUSUM sweep (windows, argmax) stays batch-side:\n$lp")
    assert(!lp.contains("Window"), s"no window runs on the stream:\n$lp")
  }

  test("streaming PIT scorer: one stateless range-predicate join, |bands| counter state (s28)") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-s28-pin").toString
    Seq((1L, "2024-01-01 10:00:00", 123L), (2L, "2024-01-02 11:00:00", 50L))
      .toDF("user_id", "ts", "cents")
      .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"), col("cents"))
      .write.mode("overwrite").parquet(s"$tmp/in")
    val scd = Seq((1L, 7L, "2024-01-01 00:00:00", null.asInstanceOf[String]),
        (2L, 6L, "2024-01-01 00:00:00", "2024-01-03 00:00:00"))
      .toDF("s_user", "band", "vf", "vt")
      .select(col("s_user"), col("band"),
        col("vf").cast("timestamp_ntz").as("valid_from"),
        col("vt").cast("timestamp_ntz").as("valid_to"))
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s28PitFrame(stream, scd)
    assert(df.isStreaming, "s28's rollup must aggregate ON the stream")
    assert(df.schema.fieldNames.sameElements(Array("band", "purchases", "amount")),
      df.schema.treeString)
    val lp = df.queryExecution.analyzed.toString
    assert(lp.toLowerCase.split("join").length == 2,
      s"exactly ONE stream-static PIT join, nothing stream-stream:\n$lp")
    assert("Aggregate".r.findAllIn(lp).size == 1,
      s"per-band counters are the only stateful operator:\n$lp")
    assert(!lp.contains("Window"), s"no window runs on the stream:\n$lp")
  }

  test("streaming rollup chain: hourly tier consumes the 5-min windows, not raw events (s26)") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-s26-pin").toString
    Seq(("2024-01-01 00:01:00", "purchase", 100L), ("2024-01-01 00:59:00", "view", 5L))
      .toDF("ts", "event_type", "cents")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("cents"))
      .write.mode("overwrite").parquet(s"$tmp/in")
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
    val df = graft.queries.StreamingQueries.s26RollupFrame(stream,
      java.sql.Timestamp.valueOf("2024-01-01 04:00:00"))
    assert(df.isStreaming, "the rollup chain must run ON the stream")
    // (optimizedPlan is unavailable pre-start on a stream; the analyzed tree
    // pins the construction. The one optimizer property that matters — the
    // sentinel filter staying ABOVE EventTimeWatermark, which holds because
    // its predicate references the watermark attribute — is runtime-proven
    // by the s26 oracle: pushed below, the watermark would stop 10 min short
    // of the sentinel and the last hour of windows would never flush.)
    val lp = df.queryExecution.analyzed.toString
    assert("Aggregate".r.findAllIn(lp).size == 2,
      s"two chained stateful window aggregations:\n$lp")
    assert(lp.contains("EventTimeWatermark"), s"watermark must bound both tiers' state:\n$lp")
    val fi = lp.indexOf("Filter"); val wi = lp.indexOf("EventTimeWatermark")
    assert(fi >= 0 && fi < wi, s"sentinel filter must sit above the watermark:\n$lp")
    assert(!lp.toLowerCase.contains("join"), s"no join anywhere in the chain:\n$lp")
    // the hourly tier's grouping consumes the 5-minute WINDOW struct, not ts
    val hourly = lp.substring(0, lp.indexOf("Aggregate", lp.indexOf("Aggregate") + 1))
    assert(hourly.contains("window#") || hourly.contains("window("),
      s"hourly groupBy must key on the 5-min window column:\n$lp")
  }
}
