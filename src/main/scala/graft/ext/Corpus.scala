package graft.ext

import graft.functions.HashFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level operations for training-data curation: reproducible
  * stratified sampling, token-budget shard packing, and corpus n-gram
  * statistics. All are deterministic — a re-run, a backfill, or a second
  * cluster produces the identical output, which is what makes them safe to
  * use as stages of a 100 TB pipeline (any partition can be recomputed
  * without global coordination).
  */
object Corpus {

  /** Deterministic stratified sampling: keep a row iff its key's md5 bucket
    * (unsigned mod `buckets`, see [[graft.functions.Md5Bucket]]) falls below
    * the stratum's threshold. rate=0.3 keeps ~30% of the stratum — the SAME
    * ~30% every run, because membership is a pure function of the key.
    * No shuffle: the filter composes with the scan (narrow, codegen'd).
    *
    * `rates` maps stratum value -> keep fraction; strata not listed use
    * `defaultRate`. Thresholds are rounded to whole buckets.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      buckets: Int = 10000): DataFrame = {
    def thr(rate: Double): Int = math.round(rate * buckets).toInt
    val threshold = rates.foldLeft(when(lit(false), lit(0))) {
      case (acc, (stratum, rate)) => acc.when(stratumCol === stratum, lit(thr(rate)))
    }.otherwise(lit(thr(defaultRate)))
    df.withColumn("bucket", HashFunctions.md5_bucket(keyCol, buckets))
      .filter(col("bucket") < threshold)
  }

  /** Mixture planning: per-stratum token shares -> temperature-scaled
    * sampling weights, the data-recipe step that decides how much of each
    * source/domain a training run draws. T=1 reproduces natural shares; as
    * T grows the mixture flattens toward uniform (small domains upweighted)
    * — the standard knob in published pretraining recipes.
    *
    * Only T=2 (sqrt) is exposed: sqrt is IEEE-correctly-rounded in BOTH the
    * engine and any SQL replayer, while pow(x, 1/T) is not guaranteed to be,
    * so this is the temperature that keeps the op bitwise-verifiable. The
    * normalizing sum runs in DECIMAL (exact, order-independent — the money
    * trick), so weights are identical at any parallelism.
    *
    * Scale shape: one hash aggregation over the corpus (map-side combined),
    * then arithmetic on a |strata|-row table joined back by broadcast —
    * nothing global beyond the one agg. */
  def mixturePlanSqrt(docs: DataFrame, stratumCol: Column,
      tokenCount: Column, tokenBudget: Long): DataFrame = {
    val toks = docs.groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
    val totals = toks.agg(sum(col("n_tokens")).as("_total"))
    val shared = toks.crossJoin(broadcast(totals))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("_total").cast("double"))
      .withColumn("_w", sqrt(col("token_share")))
    // exact normalizer: round each sqrt to 12dp and sum as DECIMAL — no
    // float-reduction order anywhere
    val norm = shared.agg(
      sum(round(col("_w"), 12).cast("decimal(20,12)")).as("_z"))
    shared.crossJoin(broadcast(norm))
      .withColumn("mix_weight",
        round(col("_w"), 12).cast("decimal(20,12)")
          .cast("double") / col("_z").cast("double"))
      .withColumn("budget_tokens",
        round(col("mix_weight") * tokenBudget).cast("long"))
      .withColumn("epochs",
        round(col("budget_tokens").cast("double") / col("n_tokens").cast("double"), 6))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        col("token_share"), col("mix_weight"), col("budget_tokens"), col("epochs"))
  }

  /** Frequency-capped sampling: no stratum may exceed `maxShare` of the
    * corpus — the domain-balance cap of a crawl pipeline (one mega-site must
    * not dominate the mixture). Over-represented strata are thinned to
    * exactly the cap with the same md5-bucket membership as
    * [[stratifiedSample]] (pure function of the key: the same docs survive
    * every run); strata at or under the cap keep everything.
    *
    * Output is total over `df` with a 0/1 `kept` flag, so the drop set is
    * auditable — the caller filters `kept = 1`.
    *
    * Scale shape: per-stratum counts are one map-side-combined aggregation
    * bounded by |strata| rows; the rate table broadcasts back; membership
    * hashing is narrow. Nothing global beyond the one agg. */
  def frequencyCapSample(df: DataFrame, stratumCol: Column, keyCol: Column,
      maxShare: Double, buckets: Int = 10000): DataFrame =
    df.join(broadcast(frequencyCapRates(df, stratumCol, maxShare, buckets)),
        stratumCol === col("stratum"))
      .withColumn("bucket", HashFunctions.md5_bucket(keyCol, buckets))
      .withColumn("kept", (col("bucket") < col("keep_threshold")).cast("int"))
      .drop("stratum")

  /** The offline half of [[frequencyCapSample]]: the per-stratum keep
    * thresholds as a broadcastable (stratum, keep_threshold) table. Exposed
    * separately so a stream can ENFORCE rates a batch job planned (s11) —
    * the plan/enforce split of a production ingest pipeline. */
  def frequencyCapRates(df: DataFrame, stratumCol: Column,
      maxShare: Double, buckets: Int = 10000): DataFrame = {
    val counts = df.groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("n"))
      // pin the counts: they feed the total AND the rate table
      .localCheckpoint()
    // one bounded scalar to the driver (the lmFloor pattern) — a crossJoin
    // with an aggregate derived from `counts` itself trips the analyzer's
    // self-join ambiguity here
    val totalN = counts.agg(sum(col("n"))).head.getLong(0)
    counts
      .withColumn("keep_threshold",
        round(least(lit(1.0),
          lit(maxShare) * lit(totalN).cast("double") / col("n").cast("double"))
          * buckets).cast("int"))
      .select(col("stratum"), col("keep_threshold"))
  }

  /** Leakage-safe train/valid split: assign by near-dup CLUSTER, not by
    * document, so two near-duplicates can never straddle the split (the
    * classic eval-contamination bug — a doc in train and its 0.9-jaccard
    * twin in valid). Membership is the md5-bucket of the cluster id: pure
    * function, same split every run, no RNG state.
    *
    * `clusters` is [[Cluster.dupClusters]] output (doc_id, cluster_id,
    * cluster_size); `trainFrac` is rounded to whole buckets. The hash is
    * computed once per ROW but keyed per CLUSTER — identical for every
    * member, so the property "whole cluster on one side" holds by
    * construction (asserted in ExtSpec rather than trusted). */
  def leakageSafeSplit(clusters: DataFrame, trainFrac: Double,
      buckets: Int = 10000): DataFrame = {
    val thr = math.round(trainFrac * buckets).toInt
    clusters.withColumn("split_bucket",
        HashFunctions.md5_bucket(
          concat(lit("split:"), col("cluster_id").cast("string")), buckets))
      .withColumn("split",
        when(col("split_bucket") < thr, "train").otherwise("valid"))
  }

  /** Pack documents into fixed token-budget shards in `orderCol` order:
    * shard_id = exclusive-prefix-tokens / capacity, shard_offset = the
    * position of the doc's first token within its shard. Contiguous packing
    * is the layout training-data loaders want (stable doc order, shard
    * boundaries by token budget, deterministic across runs).
    *
    * The prefix sum is the two-pass distributed scan
    * ([[graft.ops.PrefixSum]]), NOT a global window — no single-partition
    * bottleneck at scale.
    */
  def packTokenShards(docs: DataFrame, capacity: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    val counted = docs.select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
    graft.ops.PrefixSum.exclusiveRunningTotal(counted, idCol, "n_tokens")
      .select(
        col(idCol),
        col("n_tokens"),
        expr(s"running_total div $capacity").as("shard_id"),
        (col("running_total") % capacity).as("shard_offset"))
  }

  /** Deterministic fractional upsampling — the corpus-MIXING stage that
    * turns per-source weights (epochs) into physical copies: weight 2.25
    * means every doc twice plus a reproducible 25% of docs a third time.
    * The fractional copy reuses the md5-bucket membership of
    * [[stratifiedSample]], so which docs get the extra copy is a pure
    * function of the key — re-runs, backfills, and a second cluster mint
    * the identical mixture. copy_id disambiguates the physical copies so a
    * downstream shuffle/pack stage can treat them as distinct rows.
    * Narrow end to end (bucket expr + explode, no shuffle). */
  def upsample(df: DataFrame, keyCol: Column, stratumCol: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      buckets: Int = 10000): DataFrame = {
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0), "weights must be >= 0")
    def base(w: Double): Int = math.floor(w).toInt
    def thr(w: Double): Int = math.round((w - math.floor(w)) * buckets).toInt
    val baseCol = weights.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, w)) => acc.when(stratumCol === s, lit(base(w)))
    }.otherwise(lit(base(defaultWeight)))
    val thrCol = weights.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, w)) => acc.when(stratumCol === s, lit(thr(w)))
    }.otherwise(lit(thr(defaultWeight)))
    df.withColumn("bucket", HashFunctions.md5_bucket(keyCol, buckets))
      .withColumn("n_copies", baseCol + when(col("bucket") < thrCol, 1).otherwise(0))
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(1), col("n_copies"))))
  }

  /** Chunk each document into overlapping fixed-size token windows — the
    * stage that turns variable-length documents into model-context-sized
    * training sequences. Chunk i covers tokens [i*stride, i*stride+window);
    * the last chunk is short rather than padded; a document shorter than one
    * window yields exactly one chunk. Number of chunks =
    * 1 + max(0, ceil((n - window) / stride)), so every token is covered and
    * consecutive chunks share (window - stride) tokens of context.
    *
    * Pure built-ins end to end (split -> sequence -> explode -> slice):
    * narrow, codegen'd, no shuffle — chunking composes with the scan. All
    * boundary arithmetic is integer, so an external engine replays the
    * chunking bit for bit. */
  def chunkDocs(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text",
      tokens: Column => Column = c => split(trim(c), "\\s+")): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("chunk_index",
        explode(sequence(lit(0),
          // div yields LONG; the chunk count fits an int by construction
          greatest(expr(s"(n_toks - $window + $stride - 1) div $stride"), lit(0L)).cast("int"))))
      .select(
        col("doc_id"),
        col("chunk_index"),
        (col("chunk_index").cast("long") * stride).as("chunk_start"),
        expr(s"slice(toks, chunk_index * $stride + 1, $window)").as("chunk_toks"))
      .select(
        col("doc_id"), col("chunk_index"), col("chunk_start"),
        size(col("chunk_toks")).as("chunk_tokens"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_fp"))
  }

  /** Sub-document (paragraph-granularity) exact dedup — the CCNet move:
    * instead of dropping whole near-duplicate documents, drop the REPEATED
    * paragraphs and keep the rest. The fixture corpus has no paragraph
    * markers, so the unit is the disjoint `window`-token chunk
    * ([[chunkDocs]] with stride == window); each chunk's fingerprint
    * competes corpus-wide and the FIRST occurrence in (doc_id, chunk_index)
    * order survives. Output is the per-document survivorship report a
    * curation funnel thresholds on: chunk counts, kept counts, kept token
    * mass, and the duplicated-chunk fraction.
    *
    * Shape: chunking is narrow (see chunkDocs); survivorship is ONE hash
    * shuffle on chunk_fp — the per-fp window sorts groups whose size is the
    * duplicate multiplicity (tiny), never the corpus; the per-doc rollup is
    * one more shuffle on doc_id. No driver state, no all-pairs anything —
    * the same two-exchange plan at any corpus size. Differs from the
    * Lee-et-al span pass ([[Dedup.duplicatedSpanStats]]) in granularity and
    * in semantics: spans measure repeated token runs at every offset;
    * chunk dedup makes a positional keep/drop decision per fixed block. */
  def chunkDedup(docs: DataFrame, window: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("chunk_fp").orderBy(col("doc_id"), col("chunk_index"))
    chunkDocs(docs, window, window, idCol, textCol)
      .withColumn("kept", (row_number().over(w) === 1).cast("int"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("kept").cast("long")).as("n_kept"),
        sum(when(col("kept") === 1, col("chunk_tokens").cast("long")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("dup_chunk_frac",
        lit(1.0) - col("n_kept").cast("double") / col("n_chunks").cast("double"))
  }

  /** Curriculum packing: documents ordered by DESCENDING quality score
    * (easy/clean first — the curriculum-learning schedule), then cut into
    * fixed token-budget stages by exclusive prefix sum, exactly like
    * [[packTokenShards]] but on a computed order. The order key
    * (quality desc, doc_id asc) is encoded into one long —
    * round((1-q)*1e6)*1e12 + doc_id — so the distributed two-pass scan
    * ([[graft.ops.PrefixSum]]) can range-partition on it; doc_id is
    * recovered arithmetically (key % 1e12), so nothing joins back.
    * Quality quantizes to 6dp (the engine-wide rounding convention; ties
    * beyond that break by doc_id on both engines). Requires doc_id < 1e12
    * and quality in [0,1] — 1e12 covers the sf1 id-stride layout with
    * room; shard first at larger id spaces.
    *
    * Scale: the prefix sum is the two-pass scan — range partition + per-
    * partition totals + broadcast offsets — NOT a single-partition global
    * window; every stage is fully parallel. */
  def curriculumStages(docs: DataFrame, quality: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tokenCount: Column => Column = TextStats.tokenCount): DataFrame = {
    val keyed = docs.select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
      .join(quality.select(col(idCol), col("quality_score")), Seq(idCol))
      .select(
        (round((lit(1.0) - col("quality_score")) * lit(1e6)).cast("long") * lit(1000000000000L)
          + col(idCol)).as("ckey"),
        col("n_tokens"))
    graft.ops.PrefixSum.exclusiveRunningTotal(keyed, "ckey", "n_tokens")
      .select(
        (col("ckey") % 1000000000000L).as("doc_id"),
        col("n_tokens"),
        expr(s"running_total div $budget").as("stage_id"),
        (col("running_total") % budget).as("stage_offset"))
  }

  /** Distribution-matched resampling: thin the corpus so a FEATURE's
    * distribution matches a target slice's (the DoReMi/DSIR idea applied to
    * a single observable feature — here any integer bucket column, e.g.
    * length buckets). Per bucket b the importance ratio is
    * r(b) = p_target(b) / p_corpus(b) (ratios of exact integer counts);
    * keep rates normalize by the max ratio so the best-matched bucket keeps
    * everything: rate(b) = r(b) / max_b r(b). Selection is the md5-bucket
    * membership of [[stratifiedSample]] — a pure function of the key, so
    * re-runs mint the identical sample. Buckets absent from the target keep
    * nothing (rate 0).
    *
    * Shape: two |buckets|-row aggregations (one scan — target counts ride a
    * conditional sum), a one-row max, and a broadcast of the rate table
    * back onto the corpus — the corpus itself never shuffles. Every rate is
    * integer-count arithmetic in a fixed order of IEEE ops and the
    * threshold is an integer, so membership replays bitwise. */
  /** The trained half of [[distributionMatch]]: the |buckets'|-row rate
    * table (bucket, counts, keep_rate, threshold). Exposed separately so a
    * STREAMING admission stage can enforce batch-planned rates on the
    * ingest path (the s11 plan/enforce split) — the table is the
    * broadcastable artifact; enforcement is a stateless join + filter. */
  def distributionMatchRates(df: DataFrame, bucketCol: Column, targetPred: Column,
      buckets: Int = 10000): DataFrame = {
    val counts = df
      .select(bucketCol.as("bucket"), targetPred.cast("int").as("is_target"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_corpus"), sum(col("is_target")).cast("long").as("n_target"))
    val totals = counts.agg(
      sum(col("n_corpus")).as("tot_corpus"), sum(col("n_target")).as("tot_target"))
    val ratios = counts.crossJoin(broadcast(totals))
      .withColumn("ratio",
        (col("n_target").cast("double") / col("tot_target").cast("double"))
          / (col("n_corpus").cast("double") / col("tot_corpus").cast("double")))
    val maxRatio = ratios.agg(max(col("ratio")).as("max_ratio"))
    ratios.crossJoin(broadcast(maxRatio))
      .withColumn("keep_rate", col("ratio") / col("max_ratio"))
      .withColumn("threshold", round(col("keep_rate") * buckets).cast("int"))
      .select("bucket", "n_corpus", "n_target", "keep_rate", "threshold")
  }

  def distributionMatch(df: DataFrame, bucketCol: Column, targetPred: Column,
      keyCol: Column, buckets: Int = 10000): DataFrame = {
    val rates = distributionMatchRates(df, bucketCol, targetPred, buckets)
    df.select(col("*"), bucketCol.as("bucket"),
        graft.functions.HashFunctions.md5_bucket(keyCol, buckets).as("mb"))
      .join(broadcast(rates), Seq("bucket"))
      .withColumn("kept", (col("mb") < col("threshold")).cast("int"))
      .drop("mb")
  }

  /** DSIR-style importance-resampling weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score every
    * raw document by how much more likely its features are under a TARGET
    * distribution (the high-quality slice you want more of) than under the
    * raw corpus — log w(d) = sum over token occurrences of
    * log p_target(t) - log p_raw(t), both bag-of-words models with add-1
    * smoothing over the shared vocabulary. Sampling proportional to w then
    * tilts the corpus mix toward the target domain; the weight itself is the
    * reusable artifact (any downstream recipe can threshold or resample it).
    *
    * Shape: one exploded pass over tokens feeds a single groupBy(term) that
    * computes BOTH models at once (raw count + conditional target count —
    * map-side partial, one shuffle); totals and vocab size fold to one row.
    * Per-term log-ratios are rounded to 6dp and summed as DECIMAL(18,6) —
    * exact, order-independent (the money trick from x40's LM scoring), so
    * the result is bit-identical on any plan shape or engine. The weight
    * table is one row per vocab term: DSIR hashes features into a bounded
    * space (10^4 buckets in the paper) precisely so this table stays
    * broadcastable at any corpus size — the join back to token occurrences
    * is a broadcast, never a corpus shuffle.
    *
    * `targetPred` marks the target slice (a Column over the doc row, e.g.
    * `col("lang") === "en"`). Output: doc spine with `n_terms`,
    * `log_weight` (sum), and `avg_log_weight` (length-normalized). */
  /** The trained half of [[dsirWeights]]: the per-term log-ratio weight
    * table (term, lw) under add-1-smoothed target/raw bag-of-words models.
    * Exposed separately so a STREAMING admission stage can score incoming
    * docs against a batch-trained model (the model is the broadcastable
    * artifact; scoring is a stateless join + per-doc sum). */
  def dsirTermWeights(docs: DataFrame, targetPred: Column,
      textCol: String = "text"): DataFrame = {
    val toks = graft.ops.Par.fanOut(
      docs.filter(length(trim(col(textCol))) > 0)
        .select(targetPred.cast("long").as("is_tgt"),
          explode(split(trim(col(textCol)), " ")).as("term")))
    val models = toks.groupBy("term")
      .agg(count(lit(1)).as("c_raw"), sum("is_tgt").as("c_tgt"))
    val totals = models.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"),
      count(lit(1)).as("v"))
    models.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + col("v")).cast("double"))
          - log((col("c_raw") + lit(1.0)) / (col("n_raw") + col("v")).cast("double")), 6)
          .cast("decimal(18,6)").as("lw"))
  }

  def dsirWeights(docs: DataFrame, targetPred: Column,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = graft.ops.Par.fanOut(
      docs.filter(length(trim(col(textCol))) > 0)
        .select(col(idCol).as("doc_id"),
          explode(split(trim(col(textCol)), " ")).as("term")))
    val weights = dsirTermWeights(docs, targetPred, textCol)
    val perDoc = toks.join(broadcast(weights), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("lw").as("w"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("w").cast("double"), lit(0.0)).as("log_weight"),
        when(coalesce(col("n_terms"), lit(0L)) > 0,
          col("w").cast("double") / col("n_terms").cast("double"))
          .otherwise(0.0).as("avg_log_weight"))
  }

  /** Top-k word n-grams by document frequency (distinct per doc), ties
    * broken by the n-gram itself so the ranking is total and deterministic.
    *
    * The count is a plain hash aggregation; the top-k is `orderBy.limit`,
    * which Spark executes as TakeOrderedAndProject — per-partition heaps of
    * k, then a k-element driver merge. Nothing global ever materializes, so
    * k=20 over 100 TB of n-grams is still one pass. The rank column is
    * stamped after the limit (a window over k rows, not over the corpus).
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int,
      textCol: String = "text"): DataFrame = {
    val counts = graft.ops.Par.fanOut(docs)
      .select(explode(HashFunctions.word_shingles(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)
    counts.withColumn("rnk",
      row_number().over(Window.orderBy(col("doc_freq").desc, col("ngram"))))
      .select(col("rnk"), col("ngram"), col("doc_freq"))
  }

  /** Weighted sampling WITHOUT replacement, n per stratum (Efraimidis &
    * Spirakis 2006 A-Res): rank every row by u^(1/w) — equivalently
    * ln(u)/w — and keep the top n of each stratum. High-weight rows win
    * proportionally more often, yet the draw is a pure function of the key:
    * the same rows survive every run, backfill, or cluster (the
    * [[stratifiedSample]] property extended to WEIGHTED selection — quality-
    * or length-proportional corpus subsampling with zero RNG state).
    *
    * The uniform u is the top 53 bits of md5-low-64 of `prefix || key`,
    * plus one, scaled by 2^-53: a 53-bit integer is exactly representable
    * as a double and the scale is a power of two, so u is IDENTICAL on any
    * engine (u in (0, 1], never 0 — no ln singularity). The rank key
    * ln(u)/w is rounded at the 6th decimal (stored as a scaled long), the
    * same libm-stability treatment as the BM25/cosine ranking paths.
    *
    * Scale shape: selection is [[graft.functions.AggFunctions.topk_pairs]]
    * — bounded map-side buffers, at most n pairs per stratum per map task
    * cross the shuffle. A window formulation would shuffle and sort EVERY
    * row of every stratum to read the top n; a hot stratum (most of a crawl
    * is one language) makes that a single-partition sort at 100 TB. */
  def weightedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      weightCol: Column, n: Int, prefix: String = "es:"): DataFrame = {
    val m53 = shiftrightunsigned(
      HashFunctions.md5_lo64(concat(lit(prefix), idCol.cast("string"))), 11) + lit(1L)
    val u = m53.cast("double") / lit(9007199254740992.0) // 2^53, exact scaling
    val esScaled = round(log(u) / weightCol.cast("double") * lit(1e6), 0).cast("long")
    df.groupBy(stratumCol.as("stratum"))
      .agg(graft.functions.AggFunctions.topk_pairs(esScaled, idCol, n).as("_top"))
      .select(col("stratum"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("stratum"), (col("_pos") + 1).cast("int").as("rank"),
        col("_t.item").as("doc_id"), col("_t.score").as("es_scaled"))
  }

  /** Corpus datacard: the per-source summary table a data team publishes
    * with a training corpus (Gebru et al. "Datasheets for Datasets" made
    * executable) — doc/token/empty counts, language spread and majority
    * language, exact-duplicate exposure, and mean quality, one row per
    * source.
    *
    * Determinism: counts and token sums are exact integers; mean quality
    * sums 6dp-rounded scores as DECIMAL (exact, order-independent) with ONE
    * final division; the majority language is (max count, ties to the
    * lexicographically smallest lang). Every column bit-replays.
    *
    * Scale shape: four map-side-combined aggregations — per source (|src|
    * rows), per (source, lang) (|src|x|langs|), per text-hash (corpus-wide
    * but hash-combined, and only the >=2 groups survive to the join, so the
    * dup join side is tiny and broadcasts), per (doc -> quality). Nothing
    * quadratic, nothing global beyond the bounded agg outputs. */
  def datacard(docs: DataFrame, tokenCount: Column, quality: DataFrame,
      stratumCol: Column = col("source"), textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val src = stratumCol.as("source")
    val base = docs.groupBy(src).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount).cast("long").as("n_tokens"),
      sum(when(length(trim(col(textCol))) === 0, 1L).otherwise(0L)).as("empty_docs"),
      countDistinct(col("lang")).as("n_langs"))
    val langCnt = docs.groupBy(src, col("lang")).agg(count(lit(1)).as("_c"))
    val topLang = langCnt
      .groupBy(col("source")).agg(max(col("_c")).as("_mx"))
      .join(langCnt, "source").filter(col("_c") === col("_mx"))
      .groupBy(col("source")).agg(min(col("lang")).as("top_lang"))
    val fps = docs.select(src, md5(col(textCol)).as("_fp"))
    val dupFps = fps.groupBy(col("_fp")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2).select("_fp")
    val dup = fps.join(broadcast(dupFps), "_fp")
      .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
    val mq = docs.select(col(idCol).as("doc_id"), src)
      .join(quality.select(col("doc_id"), col("quality_score")), "doc_id")
      .groupBy(col("source")).agg(
        sum(round(col("quality_score"), 6).cast("decimal(18,6)")).as("_qs"),
        count(lit(1)).as("_qn"))
      .select(col("source"),
        (col("_qs").cast("double") / col("_qn").cast("double")).as("mean_quality"))
    base.join(topLang, "source")
      .join(dup, Seq("source"), "left").na.fill(0L, Seq("dup_docs"))
      .join(mq, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("empty_docs"),
        col("n_langs"), col("top_lang"), col("dup_docs"), col("mean_quality"))
  }

  /** Snapshot diff — the dataset-versioning audit between two corpus
    * snapshots: per change class (added / removed / changed / unchanged),
    * how many documents. Content identity is a fingerprint column (md5 of
    * text here), so "changed" means same id, different content.
    *
    * Scale shape: ONE full-outer join on the id (both sides shuffle once on
    * the same key) carrying only (id, 16-byte fingerprint) — never document
    * bodies — then a 4-group aggregate. This is how a 100 TB corpus release
    * is reconciled against its predecessor without reading either corpus
    * twice. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      fingerprint: Column): DataFrame = {
    val fa = a.select(col(idCol).as("id"), fingerprint.as("fp_a"))
    val fb = b.select(col(idCol).as("id"), fingerprint.as("fp_b"))
    fa.join(fb, Seq("id"), "full_outer")
      .select(
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Seeded global training-order shuffle: every document gets a
    * deterministic position in a pseudo-random permutation of the corpus,
    * plus the training shard that position lands in. This is the "global
    * shuffle before training" stage of a data pipeline — at 100 TB it must
    * NOT be `orderBy(rand())` (non-reproducible, and a re-run of one failed
    * shard would need the whole sort again) nor a single-partition
    * `row_number()` window (serializes the corpus through one task).
    *
    * Design: a 20-bit mixed congruential hash of the id (exact in 64-bit
    * integer arithmetic even for ids up to 2^43, so the DuckDB oracle
    * replays it bitwise) gives the shuffle bucket; the total order is
    * (bucket, id) encoded into one long key `bucket * 2^43 + id`, and the
    * global position is a two-pass distributed prefix count over that key
    * ([[graft.ops.PrefixSum]]: range-partition + per-partition offsets, no
    * global window). Re-running any partition reproduces its exact rows.
    */
  def seededShuffle(df: DataFrame, seed: Long, shardSize: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    require(seed >= 0 && seed < Int.MaxValue, "seed must fit in [0, 2^31)")
    val idSlot = 8796093022208L // 2^43: id capacity per bucket; key fills Long exactly
    // the key encoding is exact ONLY for ids in [0, 2^43): a negative id
    // flips the sign-bearing % and a too-large id collides across buckets —
    // both corrupt the permutation SILENTLY. One comparison per row turns
    // that into a task failure instead (raise_error stays inside codegen)
    val id = when(col(idCol) >= 0L && col(idCol) < idSlot, col(idCol))
      .otherwise(raise_error(concat(
        lit(s"seededShuffle: $idCol out of [0, 2^43): "), col(idCol).cast("string"))))
    // seed folds in BEFORE the multiply: an additive post-multiply seed would
    // only rotate bucket values mod 2^20, leaving the permutation ORDER almost
    // unchanged; pre-multiply it reshuffles genuinely per seed. All terms stay
    // below 2^63 for ids < 2^43 and seeds < 2^31 (exact 64-bit arithmetic).
    val bucket = ((col(idCol) % 1048576L + lit(seed)) * 2654435761L
      + (expr(s"$idCol div 1048576") * 40503L)) % 1048576L
    val keyed = df.select((bucket * idSlot + id).as("skey"), lit(1L).as("one"))
    graft.ops.PrefixSum.exclusiveRunningTotal(keyed, "skey", "one", outCol = "position")
      .select(
        (col("skey") % idSlot).as(idCol),
        expr(s"skey div $idSlot").as("shuffle_bucket"),
        col("position"),
        expr(s"position div $shardSize").as("shard_id"))
  }

  /** Population Stability Index of the token-count distribution per source
    * vs the whole corpus — the drift audit run when a new crawl source
    * lands: psi < 0.1 reads "same length profile as the corpus", > 0.25
    * "this source will shift the mixture". Buckets are log2 length bands
    * (bit length of the token count — `length(bin(n))`, exact integer
    * arithmetic on any engine), so the bucket table is O(log max_len) rows
    * per source no matter the corpus size; everything after the one
    * doc-level pass is domain-bounded. Only buckets the source occupies
    * contribute (the one-sided convention; absent-bucket epsilon terms are
    * a smoothing choice this audit deliberately avoids — the oracle
    * replays the same convention). Each term is round((p-q)*ln(p/q), 6)
    * summed as DECIMAL — partition-order-invariant, bitwise-replayable. */
  def psiBySource(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val bucketed = docs.select(col(srcCol).as("source"),
      length(bin(TextStats.tokenCount(col(textCol)).cast("long"))).as("bucket"))
    val sb = bucketed.groupBy("source", "bucket").agg(count(lit(1)).as("c_sb"))
      .localCheckpoint()
    val s = sb.groupBy("source").agg(sum(col("c_sb")).as("c_s"))
    val bb = sb.groupBy("bucket").agg(sum(col("c_sb")).as("c_b"))
    val t = sb.agg(sum(col("c_sb")).as("c"))
    val p = col("c_sb").cast("double") / col("c_s").cast("double")
    val q = col("c_b").cast("double") / col("c").cast("double")
    sb.join(broadcast(s), "source").join(broadcast(bb), "bucket")
      .crossJoin(broadcast(t))
      .select(col("source"),
        round((p - q) * log(p / q), 6)
          .cast(org.apache.spark.sql.types.DecimalType(27, 6)).as("term"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bins"),
        sum(col("term")).cast("double").as("psi"))
  }

  /** Cross-source quantile calibration (quantile normalization): map each
    * source's score levels onto the CORPUS score at the same quantile, so a
    * source that grades itself generously stops flooding a global quality
    * cut — the score-calibration step run before thresholding a mixed-crawl
    * corpus with one number.
    *
    * Everything runs at the HISTOGRAM level (distinct 6dp score levels per
    * source), never per doc: a doc's within-source quantile is the midpoint
    * rank of its score level, p = (2*cum_excl + c) / (2*n) — one exact-int
    * division; the corpus inverse-CDF lookup ("smallest corpus level whose
    * cumulative share covers p") is a sort-merge sweep: union the
    * per-source levels with the corpus levels replicated per source, one
    * descending window per source carrying min(corpus level seen) — a
    * running min over domain-bounded rows, NOT a per-doc join, and the
    * per-source partition caps the window input at 2 x distinct-levels no
    * matter how many billion docs a hot source holds. Ties in the float p
    * axis are harmless: tied rows are contiguous and running-min is
    * insensitive to their internal order. The one unpartitioned window
    * (corpus CDF) runs over the corpus LEVEL histogram, hard-capped at
    * 1,000,001 rows by the 6dp rounding of a [0,1] score — domain-bounded,
    * not data-bounded, so the single-partition sort is trivial at any SF.
    *
    * Returns (source, quality_q, n_docs, corpus_q): score level, doc count
    * at that level, calibrated corpus-quantile score. */
  def quantileCalibrate(scored: DataFrame, scoreCol: String = "quality_score",
      srcCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val q = scored.select(col(srcCol).as("source"),
      round(col(scoreCol), 6).as("qk"))
    val sh = q.groupBy("source", "qk").agg(count(lit(1)).as("c_s"))
      .localCheckpoint()
    val sn = sh.groupBy("source").agg(sum(col("c_s")).as("n_s"))
    val sp = sh.join(broadcast(sn), "source")
      .withColumn("cum", sum(col("c_s")).over(
        w.partitionBy("source").orderBy("qk")))
      .select(col("source"), col("qk"), col("c_s"),
        ((lit(2) * (col("cum") - col("c_s")) + col("c_s")).cast("double")
          / (lit(2) * col("n_s")).cast("double")).as("p"),
        lit(0).as("tag"), lit(null).cast("double").as("qc"))
    val ch = sh.groupBy("qk").agg(sum(col("c_s")).as("c"))
    val cn = ch.agg(sum(col("c")).as("n"))
    val cp = ch.crossJoin(broadcast(cn))
      .withColumn("cum", sum(col("c")).over(w.orderBy("qk")))
      .select(col("qk").as("qc"),
        (col("cum").cast("double") / col("n").cast("double")).as("p"))
    val srcs = sh.select("source").distinct()
    val corpusPerSource = cp.crossJoin(broadcast(srcs))
      .select(col("source"), lit(null).cast("double").as("qk"),
        lit(null).cast("long").as("c_s"), col("p"), lit(1).as("tag"), col("qc"))
    val sweep = sp.unionByName(corpusPerSource)
      .withColumn("calib", min(col("qc")).over(
        w.partitionBy("source").orderBy(col("p").desc, col("tag").desc)
          .rowsBetween(w.unboundedPreceding, w.currentRow)))
    sweep.filter(col("tag") === 0)
      .select(col("source"), col("qk").as("quality_q"),
        col("c_s").as("n_docs"), col("calib").as("corpus_q"))
  }

  /** Per-document n-gram NOVELTY against a reference slice of the corpus:
    * the fraction of a document's distinct word n-grams absent from the
    * union of the reference docs' n-grams. The data-selection dual of the
    * contamination scan — contamination asks "how much of the EVAL set is in
    * my corpus", novelty asks "how much NEW material does each candidate doc
    * add over what I already trained on", the admission score an iterative
    * curation loop ranks by.
    *
    * Shape: the reference n-gram set is ONE distinct over the reference
    * slice's exploded shingles (linear, one shuffle keyed by shingle); each
    * probe doc's novel count is a left-anti join of its exploded shingles
    * against that set — a shingle-keyed shuffle join, never a doc×doc pair.
    * Reference membership is exact (no Bloom false positives biasing scores
    * down); at 100 TB the same plan holds because both sides shuffle on the
    * shingle hash and the reference side carries distinct shingles, not
    * occurrences. Novelty is an exact integer ratio — bitwise across
    * engines. Docs whose every shingle is referenced fall out of the anti
    * join entirely; the left join back to the probe roster restores them at
    * novel = 0 rather than silently dropping them. */
  def noveltyScores(docs: DataFrame, refMod: Int = 5, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(refMod >= 2, "refMod must leave both a reference and a probe slice")
    val sh = graft.ops.Par.fanOut(docs)
      .select(col(idCol).as("doc_id"), Dedup.shingles(textCol, n).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint() // one shingle pass feeds reference, probe, and roster
    val ref = sh.filter(col("doc_id") % refMod === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val probe = sh.filter(col("doc_id") % refMod =!= 0)
    val novelCnt = probe.select(col("doc_id"), explode(col("sh")).as("s"))
      .join(ref, Seq("s"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("novel"))
    probe.select(col("doc_id"), size(col("sh")).cast("long").as("ngrams"))
      .join(novelCnt, Seq("doc_id"), "left")
      .withColumn("novel", coalesce(col("novel"), lit(0L)))
      .withColumn("novelty", col("novel") / col("ngrams"))
      .select("doc_id", "ngrams", "novel", "novelty")
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between every pair of
    * sources over an integer-valued column (doc length here): the sharpest
    * of the drift statistics in the stack — PSI ([[psiBySource]]) coarsens
    * into log-width buckets, KS is the sup-norm of the raw ECDF gap at full
    * resolution. The matrix says WHICH ingest sources have diverged and by
    * how much, the trigger for re-mixing or re-weighting a training blend.
    *
    * Shape: everything happens on the VALUE HISTOGRAM (the q48/x82
    * discipline). One corpus-sized aggregation to (source, value) counts;
    * the (|sources| x |levels|) ECDF grid, the per-source running sums, and
    * the (|pairs| x |levels|) sup scan are all domain-bounded — their cost
    * never grows with row count, only with the value domain. The windowed
    * cumsum partitions by source over histogram rows, and the pair join is
    * level-keyed equi + source inequality — no row-level operation anywhere
    * after the first aggregation.
    *
    * Determinism: the sup is taken over INTEGER cross-products
    * `|cum_a * n_b - cum_b * n_a|` (exact in long up to ~3e9 rows/source;
    * swap the comparison column to DECIMAL(38,0) beyond that) and the
    * single division to a double happens once per pair on exact integers —
    * bitwise across engines. */
  def ksMatrix(docs: DataFrame, valueCol: String = "n_chars",
      srcCol: String = "source"): DataFrame = {
    val hist = docs.select(col(srcCol).as("source"), col(valueCol).as("x"))
      .groupBy("source", "x").agg(count(lit(1)).as("c"))
      .localCheckpoint() // one corpus pass feeds levels, sources, and the grid
    val levels = hist.select("x").distinct()
    val srcs = hist.select("source").distinct()
    val grid = srcs.crossJoin(broadcast(levels)) // |sources| x |levels|, domain-bounded
      .join(hist, Seq("source", "x"), "left")
      .na.fill(0L, Seq("c"))
    val cum = grid.withColumn("cum",
      sum(col("c")).over(Window.partitionBy("source").orderBy("x")))
    val n = hist.groupBy("source").agg(sum(col("c")).as("n"))
    // materialize the ECDF table (|sources| x |levels| rows) once: both
    // sides of the pair self-join read it, and without this the grid cross
    // and the windowed cumsum would each run twice
    val side = cum.join(broadcast(n), "source").localCheckpoint()
    side.alias("a").join(side.alias("b"),
        col("a.x") === col("b.x") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(max(abs(col("a.cum") * col("b.n") - col("b.cum") * col("a.n"))).as("num"))
      .select(col("src_a"), col("src_b"),
        (col("num").cast("double")
          / (col("na").cast("double") * col("nb").cast("double"))).as("ks"))
  }

  /** Neyman-optimal stratified sample design: allocate a fixed document
    * budget across strata proportionally to `N_h · S_h` (stratum size times
    * stratum standard deviation) — the allocation that minimizes the
    * variance of the stratified estimate for a given budget. This is the
    * design pass a curation pipeline runs BEFORE [[stratifiedSample]]:
    * big-and-heterogeneous sources earn proportionally more of the sample
    * than small-or-uniform ones.
    *
    * Shape: ONE hash aggregation over the corpus (count, Σx, Σx² — all
    * map-side-combinable exact integers), then everything is |strata|-sized:
    * the variance numerator `N·Σx² − (Σx)²` stays in exact BIGINTs, the sd
    * is one sqrt + one division then the house 6dp round into DECIMAL, the
    * weight is an exact DECIMAL·integer product, and the single total is a
    * broadcast scalar. Deterministic — the same corpus always prices the
    * same design. Floor allocation means Σ alloc ≤ budget (the remainder is
    * the caller's to assign; largest-remainder would need a sort by a
    * double, which is exactly the nondeterminism this avoids). */
  def neymanAllocation(docs: DataFrame, stratumCol: Column, valueCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "a sample design needs a positive budget")
    val stats = docs
      .groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(valueCol).as("s1"), sum(valueCol * valueCol).as("s2"))
      .withColumn("num", col("n_docs") * col("s2") - col("s1") * col("s1"))
      .withColumn("sd", round(
        sqrt(col("num").cast("double")) / col("n_docs").cast("double"), 6)
        .cast(org.apache.spark.sql.types.DecimalType(16, 6)))
      .withColumn("w", (col("sd") * col("n_docs"))
        .cast(org.apache.spark.sql.types.DecimalType(27, 6)))
      // |strata|-sized: materialize once so the weight total and the final
      // projection don't each re-run the corpus aggregation
      .localCheckpoint()
    val tot = stats.agg(sum(col("w")).as("tw"))
    // a fully degenerate corpus (every stratum zero-variance) gives tw = 0;
    // dividing through would silently emit null allocations — fail fast
    // with the actual condition instead (the pcaTopComponent discipline)
    stats.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_docs"),
        col("sd").cast("double").as("sd_chars"),
        floor(col("w").cast("double") * lit(budget.toDouble)
          / when(col("tw").cast("double") > 0d, col("tw").cast("double"))
            .otherwise(raise_error(lit(
              "neymanAllocation: total Neyman weight is zero — every stratum "
                + "has zero variance, so the variance-proportional design is "
                + "undefined (use proportional-to-N allocation instead)"))))
          .cast("long").as("alloc"))
  }
}
