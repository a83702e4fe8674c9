package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four tiers, cheapest first:
  *  1. exact (hash-groupBy) — one shuffle on a 128-bit digest
  *  2. MinHash + LSH — per-row signatures (no shuffle), banded bucket join
  *     for candidates, exact-jaccard verification on candidates only
  *  3. SimHash — 64-bit per-row fingerprint, hamming-band join
  *  4. exact n-gram Jaccard — the ground truth; quadratic in matching
  *     shingles, used to verify candidates and as the small-scale oracle
  *
  * Scale: signatures/fingerprints are one compiled pass per row
  * (graft.functions.MinHashSig / SimHash64 — no interpreted lambdas, no
  * shuffle, each shingle hashed once). The only shuffles are the final
  * candidate joins, which LSH keeps tiny. At 100 TB the exact-jaccard
  * all-pairs path is infeasible (that is the point of LSH); the engine
  * exposes it only for verification and test oracles.
  */
object Dedup {

  /** Word n-gram shingle set (distinct) from a text column — one compiled
    * pass (graft.functions.WordShingles); mirrors the DuckDB oracle's
    * `string_split` + list comprehension exactly. */
  def shingles(textColName: String, n: Int = 3): Column =
    graft.functions.HashFunctions.word_shingles(col(textColName), n)

  /** 1. Exact dedup groups: digest -> (count, representative = min doc_id).
    * One hash aggregation; the digest shuffle moves 16 bytes/row. */
  def exactDupGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("keep_doc_id"))

  /** Exact-dedup filter: keep one representative per identical text. */
  def dedupExact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature over a shingle-array column: one compiled pass per
    * row (graft.functions.MinHashSig) — each shingle hashed once, k
    * permutation minima via multiply-add mixing. No shuffle, no UDF. */
  def minHashSignature(shingleCol: Column, numHashes: Int = 64): Column =
    graft.functions.HashFunctions.minhash_sig(shingleCol, numHashes)

  /** 2. MinHash+LSH near-dup pairs.
    *
    * bands x rowsPerBand must equal the signature length. Candidates share at
    * least one band; each candidate pair is then verified with EXACT jaccard
    * on the shingle sets (array_intersect/array_union — in-row, no explode).
    * Emits (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard >= threshold.
    */
  def nearDupMinhash(docs: DataFrame, threshold: Double, numHashes: Int = 64,
      bands: Int = 16, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val banded = bandedSignatures(docs, numHashes, bands, textCol, idCol)

    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** [[nearDupMinhash]] with an EXACT-COLLAPSE pre-pass — the crawl-scale
    * form (see Cluster.dupClustersCollapsed for the clustering analogue):
    * byte-identical texts collapse to one representative before the LSH
    * pipeline, and the pair set is expanded back afterward. BITWISE equal
    * output, not an approximation:
    *  - cross-group pairs: the MinHash signature (hence every band hash)
    *    and the exact jaccard are pure functions of the TEXT, so rep pairs
    *    carry exactly the candidate recall and score of every member pair —
    *    expansion is the members' cross product stamped with the rep score;
    *  - intra-group pairs: identical texts are always candidates (all bands
    *    collide) with jaccard exactly 1.0 — enumerated combinatorially, no
    *    shingling, no verification;
    *  - groups whose text yields no shingles never pair in the raw path
    *    (size(sh) > 0 filter) and are excluded here the same way.
    * A g-way verbatim group costs the raw path g(g-1)/2 full array
    * verifications plus g x the band collisions; here it costs one rep.
    */
  def nearDupMinhashCollapsed(docs: DataFrame, threshold: Double,
      numHashes: Int = 64, bands: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"),
      md5(col(textCol)).as("_fp"))
    // min id per identical text; max(_text) of identical strings is that
    // string (deterministic). Shingle-less groups drop here, as in the raw
    // path. Pinned once: feeds the LSH pipeline and both expansions.
    val reps = keyed.groupBy(col("_fp"))
      .agg(min(col("doc_id")).as("doc_id"), max(col("_text")).as("_text"))
      .filter(size(shingles("_text")) > 0)
      .localCheckpoint()
    val members = keyed.select(col("doc_id"), col("_fp"))
      .join(reps.select(col("_fp"), col("doc_id").as("_rep")), "_fp")
      .select(col("_rep"), col("doc_id"))
    val repPairs = nearDupMinhash(reps, threshold, numHashes, bands, "_text", "doc_id")
    val cross = repPairs
      .join(members.select(col("_rep").as("doc_a"), col("doc_id").as("ma")), "doc_a")
      .join(members.select(col("_rep").as("doc_b"), col("doc_id").as("mb")), "doc_b")
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("jaccard"))
    val intra = members.as("x")
      .join(members.as("y"),
        col("x._rep") === col("y._rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(1.0).as("jaccard"))
    cross.unionByName(intra)
  }

  /** Shared LSH banding: (doc_id, shingle set, band_id, band_hash) — one
    * compiled MinHash pass per doc, one row per (doc, band). */
  private[ext] def bandedSignatures(docs: DataFrame, numHashes: Int, bands: Int,
      textCol: String, idCol: String): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    graft.ops.Par.fanOut(docs)
      .select(col(idCol).as("doc_id"), shingles(textCol).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(
        col("doc_id"), col("sh"),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
          .as(Seq("band_id", "band_hash")))
  }

  /** 3. INCREMENTAL dedup: build-once/probe-many against a persisted corpus
    * index — the shape a 100 TB ingestion pipeline actually runs (the corpus
    * is deduped once; every new batch is checked against it, not against
    * itself re-shingled).
    *
    * The index is the corpus's banded signatures BUCKETED by `band_key`
    * (band id folded into the hash so the join key is a single column):
    * probing shuffles ONLY the new batch into the index's bucketing — the
    * corpus side, the 100 TB side, is never reshuffled or rehashed. Matches
    * are exact-verified with true jaccard like the self-join path, so the
    * bands only prune.
    */
  def buildMinhashIndex(corpus: DataFrame, table: String, numHashes: Int = 64,
      bands: Int = 16, numBuckets: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): Unit =
    graft.io.Sinks.writeBucketed(
      bandedSignatures(corpus, numHashes, bands, textCol, idCol)
        .withColumn("band_key", xxhash64(col("band_id"), col("band_hash")))
        .select("band_key", "doc_id", "sh"),
      table, bucketCols = Seq("band_key"), numBuckets = numBuckets,
      sortCols = Seq("band_key"))

  /** Probe a persisted MinHash index: (doc_new, doc_corpus, jaccard) for
    * every new-batch doc whose true jaccard with an indexed doc reaches
    * `threshold`. Parameters must match the build. */
  def dedupAgainstIndex(spark: org.apache.spark.sql.SparkSession, table: String,
      newDocs: DataFrame, threshold: Double, numHashes: Int = 64, bands: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val probe = bandedSignatures(newDocs, numHashes, bands, textCol, idCol)
      .withColumn("band_key", xxhash64(col("band_id"), col("band_hash")))
      .select(col("band_key"), col("doc_id").as("doc_new"), col("sh").as("sh_new"))
    spark.table(table)
      .select(col("band_key"), col("doc_id").as("doc_corpus"), col("sh").as("sh_corpus"))
      .join(probe, Seq("band_key"))
      .select("doc_new", "doc_corpus", "sh_new", "sh_corpus")
      .dropDuplicates("doc_new", "doc_corpus")
      .withColumn("jaccard",
        size(array_intersect(col("sh_new"), col("sh_corpus"))).cast("double") /
          size(array_union(col("sh_new"), col("sh_corpus"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_new", "doc_corpus", "jaccard")
  }

  /** The admission decision: new-batch docs that matched NOTHING in the
    * index (these are safe to append to the corpus). */
  def dedupNewBatch(spark: org.apache.spark.sql.SparkSession, table: String,
      newDocs: DataFrame, threshold: Double, numHashes: Int = 64, bands: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    newDocs.join(
      dedupAgainstIndex(spark, table, newDocs, threshold, numHashes, bands, textCol, idCol)
        .select(col("doc_new").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** 0. Bloom-prefiltered exact admission: admit the new-batch docs whose
    * normalized fingerprint does NOT already exist in the corpus.
    *
    * The naive plan is a full anti-join of the batch against the corpus — at
    * 100 TB that shuffles the corpus's fingerprints every batch. Instead the
    * corpus fingerprints are folded ONCE into a Bloom filter (built with a
    * distributed tree aggregation — `stat.bloomFilter` merges per-partition
    * filters on the executors; only the final bitset reaches the driver) and
    * broadcast. The batch is then routed by a membership probe:
    *   - `mightContain == false` → definitively new (Bloom filters have no
    *     false negatives) — admitted with NO join at all;
    *   - `mightContain == true` → candidate duplicate (rate = real dups +
    *     fpp) — only this sliver pays the exact anti-join.
    * The union of both branches is bitwise equal to the plain anti-join, so
    * the approximation changes the PLAN, never the result.
    *
    * Sizing: ~1.2 GiB per 10^9 corpus keys at 1% fpp — broadcastable to
    * every executor up to corpus sizes where even the fingerprint anti-join
    * side would be prohibitive; beyond that, shard the filter by fingerprint
    * prefix and probe the matching shard. (Spark's runtime bloom-join
    * pruning — spark.sql.optimizer.runtime.bloomFilter.* — applies the same
    * idea automatically inside one query; this is the cross-query, persisted
    * form a curation pipeline needs.)
    */
  /** The normalized exact-dup fingerprint shared by the bloom build and every
    * probe (whitespace-collapsed, case-folded md5) — build and probe MUST
    * agree on this or false negatives appear. */
  private def normFp(textCol: String): Column =
    md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))

  /** Fold the corpus fingerprints into a Bloom filter ONCE. With
    * `expectedKeys` supplied (a real catalog has table stats) this is a
    * single corpus scan; otherwise the fingerprint frame is persisted across
    * the sizing count and the filter build, so the corpus is still scanned
    * only once (the second action reads the cache). Steady-state ingestion
    * should build this once and pass it to [[bloomAdmitWith]] for every
    * batch — zero corpus scans per batch on the bloom side. */
  def buildAdmissionBloom(corpus: DataFrame, fpp: Double = 0.01,
      expectedKeys: Long = -1L, textCol: String = "text")
      : org.apache.spark.util.sketch.BloomFilter = {
    // Spark sizes the filter as -n*ln(fpp)/ln(2)^2 bits, truncating: a loose
    // fpp over a tiny corpus truncates to ZERO bits and fails analysis
    require(fpp > 0 && fpp <= 0.1, s"fpp must be in (0, 0.1], got $fpp")
    val corpusFp = corpus.select(normFp(textCol).as("norm_fp"))
    if (expectedKeys > 0) corpusFp.stat.bloomFilter("norm_fp", expectedKeys, fpp)
    else {
      val cached = corpusFp.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = math.max(1L, cached.count())
        cached.stat.bloomFilter("norm_fp", n, fpp)
      } finally { cached.unpersist(blocking = false); () }
    }
  }

  def bloomAdmit(corpus: DataFrame, batch: DataFrame, fpp: Double = 0.01,
      expectedKeys: Long = -1L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bloomAdmitWith(corpus,
      buildAdmissionBloom(corpus, fpp, expectedKeys, textCol),
      batch, textCol, idCol)

  /** The admission probe against a prebuilt corpus bloom (see the class
    * Scaladoc above for the routing argument). The residual exact anti-join
    * still reads the corpus fingerprints, but only the mightContain sliver
    * of the BATCH pays it — the corpus is never shuffled. */
  def bloomAdmitWith(corpus: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val corpusFp = corpus.select(normFp(textCol).as("norm_fp"))
    val bloomB = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((fp: String) => fp != null && bloomB.value.mightContainString(fp))
    val batchFp = batch.select(col(idCol), normFp(textCol).as("norm_fp"))
    val fresh = batchFp.filter(!mightContain(col("norm_fp")))
    val candidates = batchFp.filter(mightContain(col("norm_fp")))
      .join(corpusFp, Seq("norm_fp"), "left_anti")
      .select(col(idCol), col("norm_fp"))
    fresh.unionByName(candidates)
  }

  /** Eval-set contamination scan: (eval doc, corpus doc) pairs sharing at
    * least `minShared` distinct word n-grams, with containment = shared /
    * |eval doc's n-gram set| (1.0 = the eval doc's n-grams all appear in
    * that corpus doc — verbatim leakage).
    *
    * Asymmetry is the scale lever: eval benchmarks are tiny next to a
    * 100 TB corpus, so the EVAL side's exploded n-grams are broadcast and
    * the corpus side stays a narrow scan — no corpus shuffle, no corpus
    * self-pairing, one aggregation over the (rare) matches. Long n-grams
    * (default 8) make coincidental sharing vanishingly unlikely, so the
    * match list is small enough to eyeball or join into a drop list. */
  def contaminationScan(corpus: DataFrame, evalDocs: DataFrame, n: Int = 8,
      minShared: Long = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evSh = evalDocs
      .select(col(idCol).as("eval_doc"), shingles(textCol, n).as("sh"))
      .filter(size(col("sh")) > 0)
    val evSizes = evSh.select(col("eval_doc"), size(col("sh")).as("eval_ngrams"))
    val evEx = evSh.select(col("eval_doc"), explode(col("sh")).as("s"))
    val coEx = graft.ops.Par.fanOut(corpus)
      .select(col(idCol).as("corpus_doc"), explode(shingles(textCol, n)).as("s"))
    coEx.join(broadcast(evEx), Seq("s"))
      .groupBy(col("eval_doc"), col("corpus_doc"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .join(broadcast(evSizes), "eval_doc")
      .withColumn("containment",
        col("shared_ngrams").cast("double") / col("eval_ngrams"))
      .select("eval_doc", "corpus_doc", "shared_ngrams", "containment")
  }

  /** 4. Exact n-gram Jaccard pairs (ground truth; small scale / verification
    * only). Explodes shingles and self-joins — mirrors the DuckDB oracle. */
  def jaccardPairs(docs: DataFrame, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = graft.ops.Par.fanOut(docs).select(col(idCol).as("doc_id"), shingles(textCol).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = ex.alias("a").join(ex.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n" -> "na")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n" -> "nb")), "doc_b")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 4b. Exact n-gram Jaccard pairs WITHOUT the all-shingles self-join:
    * prefix-filtered similarity join (the SSJoin/PPJoin family). Bitwise the
    * same output as [[jaccardPairs]], but candidate generation only explodes
    * each document's PREFIX — its `n - ceil(t*n) + 1` globally rarest
    * shingles under the total order (df asc, shingle asc).
    *
    * Completeness: if jaccard(A,B) >= t then `|A∩B| >= ceil(t*|A|)`, and by
    * pigeonhole the globally smallest common shingle cannot fit in A's
    * `ceil(t*|A|) - 1`-sized suffix, so it lies in A's prefix — and
    * symmetrically in B's — hence the prefix equijoin emits every
    * qualifying pair. Survivors are verified exactly on the full shingle
    * arrays (`array_intersect`), so false candidates only cost compute.
    *
    * Scale: [[jaccardPairs]] self-joins EVERY shingle occurrence — a
    * stop-shingle shared by 1M docs alone produces 5*10^11 joined rows.
    * Here the join key set is the rare prefix (~(1-t) of each doc), and
    * because tokens are prefix-eligible in rarity order, hot shingles are
    * exactly the ones that drop out first; the df table costs one extra
    * shuffle, the candidate join moves (1-t)-scaled data, and verification
    * is per-candidate. The size predicate `t*na <= nb <= na/t` prunes
    * cross-size candidates before the distinct. */
  def jaccardPairsPrefix(docs: DataFrame, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val sh = graft.ops.Par.fanOut(docs)
      .select(col(idCol).as("doc_id"), shingles(textCol).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint() // reused by df ranking, candidates, and verification
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfTab, "s")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
      .withColumn("n", size(col("ranked")))
      // alpha = ceil(t*n) exactly: t*n in doubles can land a hair above an
      // integer (5 * 0.8 = 4.0000000000000002) and a too-large alpha
      // BREAKS completeness; 6dp rounding restores the exact product for
      // any threshold with a short decimal expansion
      .withColumn("plen",
        (col("n") - ceil(round(col("n") * lit(threshold), 6)) + 1).cast("int"))
    val pref = ranked
      .select(col("doc_id"), col("n"), explode(expr("slice(ranked, 1, plen)")).as("p"))
      .select(col("doc_id"), col("n"), col("p.s").as("s"))
    val cand = pref.alias("a").join(pref.alias("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")
          // 6dp-rounded products: the raw double 5 * 0.8 = 4.0000000000000002
          // would wrongly prune the exactly-at-threshold contained pair
          && round(col("b.n") * lit(threshold), 6) <= col("a.n")
          && round(col("a.n") * lit(threshold), 6) <= col("b.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"), size(col("sh")).as("na")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb"), size(col("sh")).as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 3. SimHash: 64-bit fingerprint from token hashes — one compiled
    * bit-vote pass per row (graft.functions.SimHash64), no shuffle.
    * Votes on the md5-low-64 token hash so a DuckDB oracle can rebuild the
    * identical fingerprint (`md5_number_lower`); the hamming-radius result
    * depends on the hash BITS, not just its collision structure. */
  def simHash(textColName: String): Column =
    graft.functions.HashFunctions.simhash64(split(trim(col(textColName)), " "), md5Bits = true)

  /** Winnowing containment candidates: pairs whose shared winnowing
    * fingerprints (graft.functions.WinnowingFp — rolling k-gram hashes,
    * window minima) cover at least `minContainment` of the SMALLER set.
    * Normalizing by the smaller side catches shared RUNS (containment /
    * plagiarism / doc-inside-doc) that set-based jaccard dilutes when
    * documents differ in length; a raw shared count cannot separate true
    * containment from shared-vocabulary noise. */
  def winnowingPairs(docs: DataFrame, minContainment: Double = 0.7,
      maxDocFreq: Int = 25, minShared: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = graft.ops.Par.fanOut(docs).select(col(idCol).as("doc_id"),
      graft.functions.HashFunctions.winnowing_fp(col(textCol)).as("fps"))
      .filter(size(col("fps")) > 0)
    val ex = fp.select(col("doc_id"), explode(col("fps")).as("f"))
    // ONE aggregation keyed by fingerprint: the (distinct-by-construction)
    // doc list per fp. The document-frequency cap drops fingerprints shared
    // corpus-wide (common substrings of the domain vocabulary — no dedup
    // signal, quadratic fanout: at sf0.1 the uncapped pairing cost 38 s vs
    // ~1 s capped). Everything downstream derives from `groups`, so the
    // winnowing kernel runs ONCE and its shuffle is reused. The cap is
    // enforced INSIDE the aggregate (collect_capped nulls out any group
    // past maxDocFreq while retaining at most cap+1 elements per buffer):
    // a plain collect_list would materialize the full doc list of exactly
    // the corpus-wide hot fingerprints the cap exists to drop — an
    // executor-OOM shape at 100 TB.
    val groups = ex.groupBy(col("f"))
      .agg(graft.functions.AggFunctions.collect_capped(col("doc_id"), maxDocFreq).as("ds"))
      .filter(col("ds").isNotNull)
    // per-doc rare-fp counts AFTER the cap, so identical documents still
    // score containment 1.0 over their rare fingerprints
    val sizes = groups.select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // ordered pairs within each fp's doc list: the pair SET is independent
    // of collect_list's order (y > x membership test), so the result stays
    // deterministic at any parallelism
    val pairs = groups.select(explode(expr(
        "flatten(transform(ds, x -> transform(filter(ds, y -> y > x), y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared_fps"))
    pairs
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n" -> "na")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n" -> "nb")), "doc_b")
      .withColumn("containment", col("shared_fps") / least(col("na"), col("nb")))
      // the minShared floor guards against tiny rare-fingerprint sets where
      // a couple of coincidental collisions would read as high containment
      .filter(col("containment") >= minContainment && col("shared_fps") >= minShared)
      .select("doc_a", "doc_b", "shared_fps", "containment")
  }

  /** [[nearDupSimhash]] with the exact-collapse pre-pass (same equivalence
    * argument as [[nearDupMinhashCollapsed]], simpler still: the SimHash
    * fingerprint is a pure function of the text, identical texts are at
    * hamming 0 <= any radius, and SimHash has no shingle-emptiness filter to
    * mirror — every identical group pairs internally at distance 0 and
    * cross-group exactly as its representative does). */
  def nearDupSimhashCollapsed(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"),
      md5(col(textCol)).as("_fp"))
    val reps = keyed.groupBy(col("_fp"))
      .agg(min(col("doc_id")).as("doc_id"), max(col("_text")).as("_text"))
      .localCheckpoint()
    val members = keyed.select(col("doc_id"), col("_fp"))
      .join(reps.select(col("_fp"), col("doc_id").as("_rep")), "_fp")
      .select(col("_rep"), col("doc_id"))
    val repPairs = nearDupSimhash(reps, maxHamming, "_text", "doc_id")
    val cross = repPairs
      .join(members.select(col("_rep").as("doc_a"), col("doc_id").as("ma")), "doc_a")
      .join(members.select(col("_rep").as("doc_b"), col("doc_id").as("mb")), "doc_b")
      .select(least(col("ma"), col("mb")).as("doc_a"),
        greatest(col("ma"), col("mb")).as("doc_b"), col("hamming"))
    val intra = members.as("x")
      .join(members.as("y"),
        col("x._rep") === col("y._rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).as("hamming"))
    cross.unionByName(intra)
  }

  /** Duplicated-span statistics — the Spark-scale shape of exact SUBSTRING
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better": remove any 50-token span that occurs verbatim elsewhere
    * in the corpus). A distributed suffix array is the paper's tool; the
    * engine's approximation tiles each document into NON-OVERLAPPING
    * `blockTokens`-token blocks and marks a block duplicated when its content
    * occurs >= 2 times corpus-wide (same doc or not) — the block grid turns
    * "any duplicated span" into an equi-group problem with one shuffle.
    *
    * Shape: blocks shuffle by xxhash64(block) — 8 bytes per occurrence moves,
    * never the text. The multiplicity count is a groupBy (map-side partial:
    * the shuffled count frame is ONE row per distinct block) followed by a
    * hash join back to the occurrence frame on the same key — deliberately
    * NOT `count over (partition by hash)`: WindowExec buffers each partition
    * in memory, and at 100 TB a boilerplate block repeated millions of times
    * is exactly the partition that would spill. AQE splits the same hot key
    * across reducers in the join formulation. Output is per-document (spine
    * left-joined back, co-partitioned on doc_id), so hash collisions can only
    * nudge a count, and 64-bit collisions at even 10^10 blocks are ~1e-0/2^64
    * per pair — the oracle compares on block CONTENT and agrees.
    *
    * `dup_token_frac` = blockTokens * dup_blocks / n_tokens: the fraction of
    * the doc's tokens sitting inside corpus-duplicated blocks — a single
    * integer/integer division, bit-replayable on any engine. `tokens_kept` is
    * the doc's token budget after span removal (what Lee et al. trains on). */
  def dupSpans(docs: DataFrame, blockTokens: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    val spine = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), " ").as("_toks"))
    val blocks = graft.ops.Par.fanOut(spine)
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(_toks) >= $blockTokens
           |THEN transform(sequence(0, size(_toks) DIV $blockTokens - 1),
           |               i -> xxhash64(concat_ws(' ', slice(_toks, i * $blockTokens + 1, $blockTokens))))
           |ELSE array() END""".stripMargin)).as("h"))
    val mult = blocks.groupBy("h").agg(count(lit(1)).as("c"))
    val perDoc = blocks.join(mult, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_blocks"))
    spine.select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("dup_blocks"), lit(0L)).as("dup_blocks"),
        when(col("n_tokens") > 0,
          (lit(blockTokens.toLong) * coalesce(col("dup_blocks"), lit(0L))).cast("double")
            / col("n_tokens").cast("double")).otherwise(0.0).as("dup_token_frac"),
        (col("n_tokens") - lit(blockTokens.toLong) * coalesce(col("dup_blocks"), lit(0L)))
          .as("tokens_kept"))
  }

  /** The text-REWRITING half of Lee et al. substring dedup: [[dupSpans]]
    * measures how much of each doc sits in corpus-duplicated blocks; this
    * produces the cleaned corpus — every non-overlapping `blockTokens`-token
    * block occurring verbatim >= 2x corpus-wide is dropped from the text,
    * the tail tokens past the last full block are always kept, and the
    * survivors are re-joined in order. Output: (doc_id, n_tokens,
    * dup_blocks, tokens_kept, clean_text).
    *
    * Scale shape: same as [[dupSpans]] — one 8-byte-hash shuffle for the
    * multiplicity count (groupBy with map-side partials, NOT a window over
    * the hash: a boilerplate block repeated millions of times is the
    * partition that would spill), then the duplicated block INDICES (not
    * text) come back per doc as a sorted array bounded by the doc's own
    * block count, and the rewrite is a narrow per-row lambda over the
    * already-held token array. The corpus text never shuffles.
    *
    * Determinism: block membership is a pure function of the text; the
    * rewrite keeps tokens in original order; no floats anywhere. */
  def removeDupSpans(docs: DataFrame, blockTokens: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    val spine = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), " ").as("_toks"))
    val blocks = graft.ops.Par.fanOut(spine)
      .select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(_toks) >= $blockTokens
           |THEN transform(sequence(0, size(_toks) DIV $blockTokens - 1),
           |               i -> xxhash64(concat_ws(' ', slice(_toks, i * $blockTokens + 1, $blockTokens))))
           |ELSE array() END""".stripMargin)).as(Seq("i", "h")))
    val mult = blocks.groupBy("h").agg(count(lit(1)).as("c"))
    val dups = blocks.join(mult, Seq("h")).filter(col("c") > 1)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("i").cast("long"))).as("_dups"))
    spine.join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        when(col("_dups").isNull, 0L)
          .otherwise(size(col("_dups")).cast("long")).as("dup_blocks"),
        (size(col("_toks")).cast("long") - lit(blockTokens.toLong) *
          when(col("_dups").isNull, 0L)
            .otherwise(size(col("_dups")).cast("long"))).as("tokens_kept"),
        expr(
          s"""concat_ws(' ', filter(
             |  transform(_toks, (t, j) ->
             |    CASE WHEN _dups IS NOT NULL
             |              AND array_contains(_dups, CAST(j DIV $blockTokens AS BIGINT))
             |         THEN NULL ELSE t END),
             |  x -> x IS NOT NULL))""".stripMargin).as("clean_text"))
  }

  /** SimHash near-dup candidates at hamming distance <= maxHamming: split the
    * 64-bit fingerprint into 4 16-bit chunks; by pigeonhole any pair within
    * distance 3 agrees on >= 1 chunk -> equi-join per chunk, then the exact
    * hamming check via bit_count(xor). */
  def nearDupSimhash(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fp = graft.ops.Par.fanOut(docs).select(col(idCol).as("doc_id"), simHash(textCol).as("fp"))
    val chunked = fp.select(col("doc_id"), col("fp"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(fp, c * 16) & 65535)"))
        .as(Seq("chunk_id", "chunk")))
    val a = chunked.select(col("chunk_id"), col("chunk"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = chunked.select(col("chunk_id"), col("chunk"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "fp_a", "fp_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Sorted-neighborhood near-dup candidates (Hernandez-Stolfo merge/purge):
    * docs are ranked in one global sort-key order (here: the first 32 chars
    * of the text, doc_id tie-broken) and ONLY pairs within `window` rank
    * positions are compared — the classic blocking alternative to LSH,
    * strongest when near-dups share a prefix (crawl snapshots, versioned
    * records, boilerplate families). Survivors are verified with the exact
    * shingle Jaccard, so a candidate miss costs recall, never precision.
    *
    * The scale shape is the interesting part: the textbook formulation is
    * `row_number() OVER (ORDER BY key)` — a single-partition window that
    * serializes the corpus through one task. Here the global rank is the
    * two-pass distributed prefix scan ([[graft.ops.PrefixSum]], P driver
    * longs, every stage parallel), candidate pairing is an equi-join on
    * `rank + d` for d in 1..window (n*window rows, no range or theta
    * join), and verification is per-pair local arithmetic on the two
    * shingle arrays. Work is O(n * window) at any corpus size.
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= t. */
  def sortedNeighborhoodPairs(docs: DataFrame, window: Int, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .withColumn("skey", substring(trim(col("text")), 1, 32))
      .withColumn("one", lit(1L))
    val ranked = graft.ops.PrefixSum.exclusiveRunningTotalOrdered(
      keyed, Seq(col("skey"), col("doc_id")), "one", outCol = "rank")
      .select(col("doc_id"), col("rank"), shingles("text").as("sh"))
    val lhs = ranked
      .select(col("rank").as("ra"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .withColumn("rb", explode(sequence(col("ra") + 1, col("ra") + window)))
    val rhs = ranked
      .select(col("rank").as("rb"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    lhs.join(rhs, Seq("rb"))
      .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("jaccard"))
  }

  /** Entity pairs within edit distance 1 via deletion-neighborhood blocking
    * (FastSS, Bocek et al.): each string generates itself plus every
    * single-character deletion; any two strings within one edit (insert,
    * delete, or substitute) provably share a variant — a substitution at
    * position p matches the two p-deletions, an insert/delete matches the
    * inserted-char deletion against the shorter original. Candidates are
    * the variant equi-join; survivors are verified with the exact DP
    * `levenshtein` (integer — bitwise on any engine).
    *
    * The scale contract vs a pairwise fuzzy join: variant generation is
    * linear in total characters (len+1 variants per string), the join key
    * space is the variant dictionary, and a variant's group is bounded by
    * the strings one edit from each other at that position — no O(n^2)
    * name-by-name comparison ever forms. At 100 TB of entities this is the
    * standard blocking move; raising the radius to k re-derives the same
    * plan with k-deletion neighborhoods.
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, dist <= 1. */
  def editNeighborPairs(df: DataFrame,
      idCol: String = "id", strCol: String = "name"): DataFrame = {
    // Variant dedup is LOCAL by construction — a (id, variant) duplicate can
    // only come from deleting either of two equal adjacent characters in the
    // SAME name — so array_distinct before the explode replaces a global
    // distinct (one full shuffle of the variant table, the widest row set in
    // the plan, gone).
    val variants = graft.ops.Par.fanOut(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("name"))
      .select(col("id"), col("name"),
        explode(array_distinct(deletionVariants("name"))).as("variant"))
    val a = variants.select(col("variant"), col("id").as("id_a"), col("name").as("name_a"))
    val b = variants.select(col("variant"), col("id").as("id_b"), col("name").as("name_b"))
    // Verify BEFORE the pair-level distinct: the DP levenshtein is ~1 µs of
    // local arithmetic per candidate, while the distinct is a shuffle whose
    // width is the candidate fan-out — filtering first shuffles only true
    // pairs. dist is a function of (id_a, id_b) (ids name one string each),
    // so distinct-after-filter returns the identical set.
    a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "dist")
      .distinct()
  }

  /** All single-character deletions of column `c` plus the string itself
    * (the FastSS radius-1 neighborhood), as an array — position 0 is the
    * original, position i the deletion at i. */
  private def deletionVariants(c: String): org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, length($c)),
         |  i -> CASE WHEN i = 0 THEN $c
         |       ELSE concat(substring($c, 1, i - 1),
         |                   substring($c, i + 1, length($c))) END)""".stripMargin)

  /** Distance-1 neighbor pairs among DISTINCT names via single-deletion
    * variants (FastSS — the [[editNeighborPairs]] block run on the name
    * DICTIONARY): between distinct names a shared variant implies distance
    * EXACTLY 1, so the verify filter is an equality. The edge list is
    * localCheckpoint-pinned — consumers symmetrize it with mirrored
    * projections (which defeats exchange reuse) and it is bounded by the
    * dictionary's distance-1 pairs, never by entity volume.
    * Returns (name_a, name_b) with name_a < name_b. */
  private def nameEditNeighbors(names: DataFrame): DataFrame = {
    // Same two moves as [[editNeighborPairs]]: variant dedup is local to a
    // name (array_distinct, no global distinct shuffle), and the exact
    // levenshtein verify runs BEFORE the pair-level distinct so the shuffle
    // carries only true distance-1 pairs, not the whole candidate fan-out.
    // fanOut matters here: the name dictionary arrives AQE-coalesced to ~1
    // partition, and with the broadcast variant join there is no exchange
    // left to restore parallelism — without it the whole candidate
    // verification runs single-threaded.
    val variants = graft.ops.Par.fanOut(names)
      .select(col("name"),
        explode(array_distinct(deletionVariants("name"))).as("variant"))
    variants.select(col("variant"), col("name").as("name_a"))
      .join(variants.select(col("variant"), col("name").as("name_b")), Seq("variant"))
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) === 1)
      .select("name_a", "name_b").distinct()
      .localCheckpoint()
  }

  /** Per-entity TOP-K fuzzy matches — the ranked serving companion to
    * [[fuzzyMatchSummary]]: for every entity, its k best matches within
    * edit distance 1, ranked (distance ASC, match id ASC), one row per
    * (entity, rank). Entity resolution serving wants the short ranked
    * candidate list, not a count and not the pair enumeration.
    *
    * Same scale contract as the summary — the group-quadratic pair mass
    * never enters the plan:
    *   - per name, the k+1 smallest member ids come from the bounded
    *     [[graft.functions.AggFunctions.topk_pairs]] heap (map-side
    *     combinable, O(k) state per group at every stage — never a window
    *     sort, never a collected group; k+1 covers self-exclusion);
    *   - the FastSS variant join runs on distinct names only, and each
    *     name's k best NEAR ids are a second bounded top-k over its
    *     neighbors' id lists;
    *   - per entity, the final merge is array arithmetic over two <= k
    *     lists (exact matches rank before distance-1 matches, ids break
    *     ties) — output <= k rows per entity by construction.
    * All outputs are integers — bitwise on any engine.
    *
    * Returns (cust_id, rank, match_id, dist), rank 1..k. Assumes ids are
    * unique across the input (an id carries one name). */
  def fuzzyTopMatches(df: DataFrame, idCol: String = "id",
      strCol: String = "name", k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ents = graft.ops.Par.fanOut(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("name"))
    val tops = ents.groupBy("name")
      .agg(graft.functions.AggFunctions.topk_pairs(-col("id"), col("id"), k + 1).as("tp"))
      .select(col("name"), expr("transform(tp, e -> e.item)").as("own_ids"))
      .localCheckpoint() // name dictionary: consumed by edges, near stats, assembly
    val nbr = nameEditNeighbors(tops.select("name"))
    val sym = nbr.union(nbr.select(col("name_b"), col("name_a"))).toDF("name", "nname")
    val nearTop = sym
      .join(tops.select(col("name").as("nname"), col("own_ids").as("nids")), Seq("nname"))
      .select(col("name"), explode(col("nids")).as("nid"))
      .groupBy("name")
      .agg(graft.functions.AggFunctions.topk_pairs(-col("nid"), col("nid"), k).as("tp"))
      .select(col("name"), expr("transform(tp, e -> e.item)").as("near_ids"))
    ents.join(tops, Seq("name"))
      .join(nearTop, Seq("name"), "left")
      .withColumn("exact_ids", expr(s"slice(filter(own_ids, x -> x != id), 1, $k)"))
      .withColumn("cands", expr(
        s"""slice(array_sort(concat(
           |  transform(exact_ids, x -> named_struct('dist', 0, 'mid', x)),
           |  transform(coalesce(near_ids, cast(array() as array<bigint>)),
           |    x -> named_struct('dist', 1, 'mid', x)))), 1, $k)""".stripMargin))
      .select(col("id").as("cust_id"), posexplode(col("cands")))
      .select(col("cust_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.mid").as("match_id"), col("col.dist").cast("int").as("dist"))
  }

  /** Scale-safe SERVING summary of [[editNeighborPairs]]: per entity, how
    * many matches exist at distance 0 (identical string) and exactly 1,
    * plus the best match id (smallest id at the smallest distance) — one
    * row per entity that has any match, never the pair enumeration.
    *
    * Why this exists: the pair list is group-quadratic — a name shared by
    * g entities alone contributes g*(g-1)/2 pairs, and at 10x sf1 the TRUE
    * pair set is ~3e9 rows (census-measured), so ANY enumerating plan is
    * output-bound no matter how good the blocking is. The summary keeps
    * the quadratic mass out of the PLAN, not just the output, by
    * collapsing to DISTINCT names first:
    *   - exact matches are pure arithmetic on the name's multiplicity m
    *     (n_exact = m - 1; best = the group's min id, or its second-min
    *     for the min holder — two aggregates, never a collected group);
    *   - the FastSS deletion-variant join runs on distinct names only
    *     (between distinct names a shared variant implies distance
    *     EXACTLY 1, so the verify filter is an equality), and each name's
    *     neighbor multiplicities fold into (sum, min) — again aggregates.
    * Total cost: two groupBys on name + the distinct-name variant join;
    * per-entity output is bounded by construction. The full enumeration
    * stays available as the ground-truth twin (x86, the x2/x109
    * discipline) for audits at SFs where it is feasible.
    *
    * Returns (cust_id, n_exact, n_near, best_match) — all integers,
    * bitwise on any engine. */
  def fuzzyMatchSummary(df: DataFrame,
      idCol: String = "id", strCol: String = "name"): DataFrame = {
    val ents = graft.ops.Par.fanOut(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("name"))
    // per-name multiplicity + the two smallest member ids — enough to name
    // every member's best exact match without collecting a group. The
    // name-dictionary table is consumed FOUR times (variants, second-min,
    // neighbor stats, final assembly): pin one evaluation — it is bounded
    // by |distinct names| and localCheckpoint spills to disk, so the pin
    // never holds entity-table volume (measured 7.5 s -> ~3 s at sf0.1;
    // without it the groupBy re-aggregates the full entity scan each time)
    val g1 = ents.groupBy("name")
      .agg(count(lit(1)).as("m"), min(col("id")).as("m1"))
      .localCheckpoint()
    val g2 = ents.join(g1, Seq("name")).filter(col("id") > col("m1"))
      .groupBy("name").agg(min(col("id")).as("m2"))
    val groups = g1.join(g2, Seq("name"), "left")
    val nbr = nameEditNeighbors(g1.select("name"))
    val sym = nbr.union(nbr.select(col("name_b"), col("name_a"))).toDF("name", "nname")
    val nstats = sym
      .join(g1.select(col("name").as("nname"), col("m").as("nm"), col("m1").as("nm1")),
        Seq("nname"))
      .groupBy("name")
      .agg(sum(col("nm")).as("near_m"), min(col("nm1")).as("near_best"))
    ents.join(groups, Seq("name"))
      .join(nstats, Seq("name"), "left")
      .withColumn("n_exact", col("m") - 1)
      .withColumn("n_near", coalesce(col("near_m"), lit(0L)))
      .filter(col("n_exact") + col("n_near") > 0)
      .withColumn("best_match",
        when(col("n_exact") > 0,
          when(col("id") === col("m1"), col("m2")).otherwise(col("m1")))
          .otherwise(col("near_best")))
      .select(col("id").as("cust_id"), col("n_exact"), col("n_near"), col("best_match"))
  }

  /** Asymmetric containment pairs: every DIRECTED pair (doc_a, doc_b) with
    * `|sh(A) ∩ sh(B)| / |sh(A)| >= t` and doc_a != doc_b — "A is (mostly)
    * quoted inside B". Jaccard misses exactly this case: a short doc fully
    * embedded in a long one has tiny jaccard but containment 1.0, and at
    * training scale the embedded copies (quoted articles, boilerplate-wrapped
    * reposts) are the dominant leak the symmetric metric cannot see.
    *
    * Shape: prefix filter on the CONTAINED side only. If containment >= t
    * then `|A∩B| >= ceil(t*|A|)`, so by pigeonhole A's
    * `|A| - ceil(t*|A|) + 1` globally rarest shingles (df asc, shingle asc —
    * the [[jaccardPairsPrefix]] total order) must include a common shingle;
    * the container side gives no such bound (B may be arbitrarily larger
    * than the overlap), so B contributes its FULL posting list — the same
    * linear inverted file the BM25 tier stages, one explode + one shuffle.
    * Candidate fan-out is governed by the df of PREFIX shingles, and because
    * prefixes take the rarest shingles first, hot shingles enter a prefix
    * only for docs made almost entirely of hot shingles — docs that genuinely
    * are contained nearly everywhere, i.e. output-bound, not plan-bound.
    * The size prune `|B| >= ceil(t*|A|)` drops candidates that cannot hold
    * the overlap before the distinct; survivors are verified exactly on the
    * full shingle arrays, so false candidates only cost compute. */
  def containmentPairsPrefix(docs: DataFrame, threshold: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    val sh = graft.ops.Par.fanOut(docs)
      .select(col(idCol).as("doc_id"), shingles(textCol).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint() // reused by df ranking, postings, and verification
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = ex.join(dfTab, "s")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("ranked"))
      .withColumn("n", size(col("ranked")))
      // exact alpha = ceil(t*n): 6dp rounding keeps t*n from floating a hair
      // above the integer (5 * 0.8 = 4.0000000000000002) — the
      // jaccardPairsPrefix correctness note applies verbatim
      .withColumn("plen",
        (col("n") - ceil(round(col("n") * lit(threshold), 6)) + 1).cast("int"))
    val pref = ranked
      .select(col("doc_id"), col("n"), explode(expr("slice(ranked, 1, plen)")).as("p"))
      .select(col("doc_id").as("doc_a"), col("n").as("na"), col("p.s").as("s"))
    val post = sh.select(col("doc_id").as("doc_b"), size(col("sh")).as("nb"),
      explode(col("sh")).as("s"))
    val cand = pref.join(post,
        pref("s") === post("s") && col("doc_a") =!= col("doc_b")
          && ceil(round(col("na") * lit(threshold), 6)) <= col("nb"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"), size(col("sh")).as("na")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("containment", col("inter") / col("na"))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
  }
}
