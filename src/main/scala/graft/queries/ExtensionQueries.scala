package graft.queries

import graft.Tables
import graft.ext.{Cluster, Corpus, Dedup, Similarity, Sketch, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extension operators (training-data pipeline surface): deduplication,
  * similarity search, text analysis — each bound to the documents/embeddings
  * fixtures with a DuckDB oracle where SQL can express the semantics.
  *
  * Oracle strategy for hash-dependent ops: x3 shares x2's oracle because its
  * exact-jaccard VERIFICATION step makes the output equal to the exact pair
  * query (LSH miss probability at j>=0.8 with 16 bands of 4 is
  * (1-j^4)^16 < 4e-8); x4 votes on md5-low-64 (= DuckDB md5_number_lower);
  * x12/x14 replay the engine's integer hash arithmetic in HUGEINT mod-2^64
  * SQL; x9/x15 replay the hyperplane LCG (java.util.Random) in a recursive
  * CTE and rebuild every sign bit with order-preserving double sums; x13's
  * centroid sample is md5-low-64 ordered so the whole IVF path replays.
  * EVERY query is bitwise-oracled — approximation-defined candidate sets
  * included, because the approximations themselves are deterministic.
  */
object ExtensionQueries {

  // ---------------------------------------------------------------------------
  // x1 — exact dedup groups (QX1).
  // ---------------------------------------------------------------------------
  def x1ExactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(Tables.documents(spark, dir))

  private val x1Sql =
    """SELECT md5(text) AS text_hash, count(*) AS dup_count, min(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x2 — exact word-3gram Jaccard near-dup pairs (QX2 ground truth).
  // ---------------------------------------------------------------------------
  private val jaccardThreshold = 0.8

  def x2JaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), jaccardThreshold)

  private val x2Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh WHERE len(shset) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shset) AS n FROM sh)
       |SELECT doc_a, doc_b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= $jaccardThreshold""".stripMargin

  // ---------------------------------------------------------------------------
  // x3 — MinHash + LSH near-dup pairs, exact-verified (QX2 scale path).
  // Same oracle as x2: the band join only prunes candidates; survivors are
  // re-checked with exact jaccard.
  // ---------------------------------------------------------------------------
  def x3MinhashPairs(spark: SparkSession, dir: String): DataFrame =
    // exact-collapse pre-pass: bitwise equal to the raw banded pipeline
    // (Dedup.nearDupMinhashCollapsed equivalence note), quadratically
    // cheaper on verbatim-duplicate groups
    Dedup.nearDupMinhashCollapsed(Tables.documents(spark, dir), jaccardThreshold)

  // ---------------------------------------------------------------------------
  // x21 — INCREMENTAL dedup: the 90% of docs with doc_id % 10 != 0 play the
  // persisted corpus (banded MinHash index, bucketed by band_key so probes
  // never reshuffle the corpus side); the other 10% play the incoming batch.
  // Output: every (new, corpus) pair at true jaccard >= threshold. Oracle is
  // the exact cross-side jaccard — the band join only prunes, survivors are
  // exact-verified, and the band parameters are x3's, whose total recall at
  // fixture scale is established bitwise by x3 == x2.
  // ---------------------------------------------------------------------------
  /** Build (once per session+fixture) the corpus-side MinHash index over the
    * docs with doc_id % 10 != 0; returns the table name. Shared by x21 and
    * the streaming admission probe s6. */
  private[queries] def ensureMinhashIndex(spark: SparkSession, dir: String): String = {
    // key the table by (dir, fixture mtime) like the streaming stage dirs:
    // a regenerated fixture must invalidate the index, not silently probe
    // stale corpus signatures
    val srcMtime =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(dir, "documents.parquet")).toMillis
      catch { case _: Throwable => 0L }
    val table = "graft_minhash_idx_" +
      java.lang.Integer.toHexString(dir.hashCode) + "_" +
      java.lang.Long.toHexString(srcMtime)
    if (!spark.catalog.tableExists(table)) {
      // a previous JVM's warehouse dir may survive the in-memory catalog
      val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, table))
      Dedup.buildMinhashIndex(
        Tables.documents(spark, dir).filter(col("doc_id") % 10 =!= 0), table)
    }
    table
  }

  private[queries] val minhashThreshold = jaccardThreshold

  def x21IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val table = ensureMinhashIndex(spark, dir)
    Dedup.dedupAgainstIndex(spark, table,
      Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0),
      jaccardThreshold)
  }

  private[queries] val x21Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh WHERE len(shset) > 0),
       |pairs AS (
       |  SELECT b.doc_id AS doc_new, a.doc_id AS doc_corpus, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shset) AS n FROM sh)
       |SELECT doc_new, doc_corpus, inter * 1.0 / (sb.n + sa.n - inter) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON doc_corpus = sa.doc_id
       |JOIN sizes sb ON doc_new = sb.doc_id
       |WHERE inter * 1.0 / (sb.n + sa.n - inter) >= $jaccardThreshold""".stripMargin

  // ---------------------------------------------------------------------------
  // x25 — per-doc top-3 salient terms (keyword extraction). Salience is
  // tf/(df+1), division-only so the doubles match DuckDB bit for bit (ln
  // would differ in ulps across libm implementations); ties resolve
  // (salience desc, term asc).
  // ---------------------------------------------------------------------------
  def x25TopTerms(spark: SparkSession, dir: String): DataFrame =
    TextStats.topTerms(Tables.documents(spark, dir), k = 3)

  private val x25Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS salience
      |  FROM tf JOIN dfreq USING (term))
      |SELECT doc_id, term, tf, df, salience, rank FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY salience DESC, term ASC) AS rank
      |  FROM scored)
      |WHERE rank <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x4 — SimHash near-dup candidates at hamming <= 3. The token hash is
  // md5-low-64 (= DuckDB md5_number_lower) so the oracle rebuilds the exact
  // fingerprint: per-bit votes over token hashes, fp bit set when votes > 0,
  // then ALL pairs within hamming 3 (the engine's 16-bit-chunk pigeonhole
  // join is exact for radius 3, so both sides enumerate the same pair set).
  // ---------------------------------------------------------------------------
  def x4SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    // exact-collapse pre-pass (bitwise equal; Dedup.nearDupSimhashCollapsed)
    Dedup.nearDupSimhashCollapsed(Tables.documents(spark, dir))

  private val x4Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents),
      |hv AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
      |votes AS (
      |  SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM hv, range(64) r(i) GROUP BY 1, 2),
      |fp AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << i)::HUGEINT ELSE 0::HUGEINT END)
      |         AS UBIGINT) AS fp
      |  FROM votes GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
      |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x5 — text stats per language (QX4).
  // ---------------------------------------------------------------------------
  def x5TextStats(spark: SparkSession, dir: String): DataFrame =
    TextStats.qualityFeatures(Tables.documents(spark, dir))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        avg(col("n_chars_actual")).as("avg_chars"),
        sum(col("token_count")).cast("long").as("total_tokens"),
        avg(col("stopword_ratio")).as("avg_stopword_ratio"))

  private val x5Sql =
    """WITH f AS (
      |  SELECT lang, length(text) AS n_chars_actual,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count,
      |    CASE WHEN length(trim(text)) = 0 THEN 0.0
      |         ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
      |                w -> w IN ('the','a','and','of','to','in'))) * 1.0
      |              / len(string_split_regex(trim(text), '\s+')) END AS stopword_ratio
      |  FROM documents)
      |SELECT lang, count(*) AS docs, avg(n_chars_actual) AS avg_chars,
      |       CAST(sum(token_count) AS BIGINT) AS total_tokens,
      |       avg(stopword_ratio) AS avg_stopword_ratio
      |FROM f GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------------------
  // x6 — language-ID confusion matrix (QX4: n-gram/stopword heuristic).
  // ---------------------------------------------------------------------------
  def x6LangId(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Par.fanOut(Tables.documents(spark, dir))
      .withColumn("predicted", TextStats.langId(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("docs"))

  private val x6Sql =
    """WITH h AS (
      |  SELECT lang,
      |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) AS en_c,
      |    len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS de_c,
      |    len(regexp_extract_all(lower(text), '\b(el|la|los|que|es)\b')) AS es_c,
      |    len(regexp_extract_all(lower(text), '\b(le|les|et|une|est)\b')) AS fr_c,
      |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh_c
      |  FROM documents)
      |SELECT lang,
      |  CASE WHEN zh_c > 0 THEN 'zh'
      |       WHEN en_c >= de_c AND en_c >= es_c AND en_c >= fr_c AND en_c > 0 THEN 'en'
      |       WHEN de_c >= es_c AND de_c >= fr_c AND de_c > 0 THEN 'de'
      |       WHEN es_c >= fr_c AND es_c > 0 THEN 'es'
      |       WHEN fr_c > 0 THEN 'fr'
      |       ELSE 'und' END AS predicted,
      |  count(*) AS docs
      |FROM h GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------------
  // x7 — document fingerprints (QX4: rolling/normalized hashes).
  // ---------------------------------------------------------------------------
  def x7Fingerprints(spark: SparkSession, dir: String): DataFrame =
    TextStats.fingerprints(Tables.documents(spark, dir))

  private val x7Sql =
    """WITH sh AS (
      |  SELECT doc_id, text, list_distinct(
      |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
      |  FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS w FROM documents))
      |SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_fp,
      |  CASE WHEN len(shset) = 0 THEN NULL
      |       ELSE list_aggregate(list_transform(shset, s -> md5(s)), 'min') END AS min_shingle_fp
      |FROM sh""".stripMargin

  // ---------------------------------------------------------------------------
  // x8 — brute-force cosine top-5 for a fixed query set (QX3 baseline).
  // Cosine rounded to 6dp on BOTH sides before ranking so float noise cannot
  // flip ranks; ties broken by neighbor id in both.
  // ---------------------------------------------------------------------------
  def x8KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    // Round BEFORE the only top-k cut (mirroring the oracle exactly): ranking
    // unrounded and re-ranking the survivors could keep a different neighbor
    // when a rounded tie straddles the rank-k boundary.
    val emb = Tables.embeddings(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    Similarity.cosineScores(emb, emb.filter(col("vec_id") < 10))
      .withColumn("cosine", round(col("cosine"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
  }

  private val x8Sql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM q JOIN embeddings e ON q.vec_id <> e.vec_id)
      |SELECT query_id, neighbor_id, cosine,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // x9 — LSH ANN top-5 (QX3 scale path). Bitwise-oracled: the hyperplanes
  // come from a JVM LCG (java.util.Random via scala.util.Random), and the
  // oracle REPLAYS that LCG in a recursive CTE — seed scramble, two mod-2^48
  // steps per nextDouble, float32 rounding of 2d-1 — then rebuilds every
  // sign bit with an ORDER BY-ed double sum (the engine accumulates dims in
  // index order), so both sides enumerate the identical candidate set.
  // Scoring is rounded to 6dp before the rank cut on both sides (x8's
  // cross-engine-stable-ordering trick).
  // ---------------------------------------------------------------------------
  def x9KnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.cosineTopKLsh(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  /** The LSH plane + signature replay shared by x9/x15: java.util.Random
    * LCG per table (seed 0xC0FFEE + t*7919), 384 nextDouble draws -> 6
    * planes x 64 dims as float32, sign bits from in-order double dots. */
  private val lshSigsCte =
    """RECURSIVE lcg(t, step, seed) AS (
      |  SELECT t, 0, CAST(xor(CAST(12648430 + t*7919 AS BIGINT),
      |                        CAST(25214903917 AS BIGINT)) & 281474976710655 AS BIGINT)
      |  FROM range(16) r(t)
      |  UNION ALL
      |  SELECT t, step + 1,
      |    CAST((CAST(seed AS HUGEINT) * 25214903917 + 11) % 281474976710656 AS BIGINT)
      |  FROM lcg WHERE step < 768
      |),
      |pw AS (
      |  SELECT h.t, CAST((h.step - 1) / 2 AS INTEGER) // 64 AS b,
      |         CAST((h.step - 1) / 2 AS INTEGER) % 64 AS i,
      |    CAST((((h.seed >> 22) * 134217728 + (l.seed >> 21))
      |          / 9007199254740992.0) * 2 - 1 AS REAL) AS w
      |  FROM lcg h JOIN lcg l ON l.t = h.t AND l.step = h.step + 1
      |  WHERE h.step % 2 = 1
      |),
      |dots AS (
      |  SELECT e.vec_id, p.t, p.b,
      |    sum(CAST(e.embedding[p.i + 1] AS DOUBLE) * CAST(p.w AS DOUBLE) ORDER BY p.i) AS dot
      |  FROM embeddings e JOIN pw p ON true
      |  GROUP BY 1, 2, 3
      |),
      |sigs AS (
      |  SELECT vec_id, t,
      |    CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sig
      |  FROM dots GROUP BY 1, 2
      |)""".stripMargin

  private val x9Sql =
    s"""WITH $lshSigsCte,
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
       |                                 CAST(ce.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = query_id
       |  JOIN embeddings ce ON ce.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, cosine,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |FROM scored QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // x13 — IVF ANN top-5 (QX3 alternative scale path: coarse quantizer +
  // cluster-probed exact scoring). Bitwise-oracled: centroid sampling is
  // md5-low-64 ordered (the oracle sorts md5_number_lower as signed two's-
  // complement), assignment/probing replay the argmax-cosine with the same
  // (cosine DESC, centroid_id) tie order, scoring is rounded pre-rank.
  // ---------------------------------------------------------------------------
  def x13KnnIvf(spark: SparkSession, dir: String): DataFrame = {
    // Build-once/probe-many: the index (centroids + cluster-partitioned
    // postings) is persisted per (sf, fixture mtime) and probes run against
    // the files — the serving shape, with dynamic partition pruning doing
    // the inverted-file lookup. SimilaritySpec asserts index == inline.
    val emb = Tables.embeddings(spark, dir)
    val stage = Staging.stageDir("graft_ivf_index_v4", "ivf", dir,
      Seq("embeddings.parquet")) { tmp =>
      Similarity.buildIvfIndexAuto(emb, tmp.toString)
    }
    Similarity.cosineTopKIvfIndexed(spark, stage.toString,
      emb.filter(col("vec_id") < 10), k = 5)
  }

  /** Centroid-selection + nearest-centroid-assignment replay shared by
    * x13/x39: the engine's deterministic md5-low-64 'ivf:'||id sample and
    * the argmax-by-cosine assignment (ties to the lower centroid id).
    * `limitSql` is the centroid count — a literal for the fixed-nlist
    * probes, a count-derived subquery for the adaptive SemDeDup path. */
  private def ivfAssignCteWith(limitSql: String): String =
    s"""centroids AS (
      |  SELECT vec_id AS centroid_id, embedding AS centroid_vec
      |  FROM embeddings
      |  ORDER BY CASE WHEN md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR))
      |                     >= 9223372036854775808
      |            THEN CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |                 - 18446744073709551616
      |            ELSE CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |            END
      |  LIMIT $limitSql),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, embedding AS c_vec, centroid_id AS cluster_id
      |  FROM (
      |    SELECT e.vec_id, e.embedding, c.centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN centroids c)
      |  WHERE rn = 1)""".stripMargin

  private lazy val ivfAssignCte = ivfAssignCteWith("16")

  /** The engine's `Similarity.adaptiveNlist` restated in pure integer SQL:
    * ceil(n/500) via (n+499)//500, clamped [16, 4096]. */
  private val adaptiveNlistSql =
    "(SELECT greatest(16, least(4096, (count(*) + 499) // 500)) FROM embeddings)"

  private lazy val ivfAssignCteAdaptive = ivfAssignCteWith(adaptiveNlistSql)

  private lazy val x13Sql =
    s"""WITH $ivfAssignCteAdaptive,
      |probes AS (
      |  SELECT vec_id AS query_id, embedding AS q_vec, centroid_id AS cluster_id
      |  FROM (
      |    SELECT e.vec_id, e.embedding, c.centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN centroids c
      |    WHERE e.vec_id < 10)
      |  WHERE rn <= 4),
      |scored AS (
      |  SELECT DISTINCT p.query_id, a.neighbor_id,
      |    round(list_cosine_similarity(CAST(p.q_vec AS DOUBLE[]),
      |                                 CAST(a.c_vec AS DOUBLE[])), 6) AS cosine
      |  FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
      |  WHERE p.query_id <> a.neighbor_id)
      |SELECT query_id, neighbor_id, cosine,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |       ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      |FROM scored QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // x14 — winnowing containment pairs (rolling k-gram fingerprints, window
  // minima). Oracled with NO engine change: the Rabin-Karp polynomial hash
  // is linear, so the oracle rebuilds each k-gram hash as
  // sum(codepoint * Base^(k-1-j)) mod 2^64 with precomputed power constants,
  // converts to the signed-long bit pattern (the engine compares SIGNED
  // longs when picking window minima), and replays winnowing + DF-cap +
  // containment in SQL. Fixture text is BMP-only so charAt == codepoint.
  // ---------------------------------------------------------------------------
  def x14WinnowPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowingPairs(Tables.documents(spark, dir))

  // Base = 1315423911 (WinnowingFp); constants below are Base^k mod 2^64 for
  // k = 7..1. k-gram k=8, window w=4, maxDocFreq=25, minShared=3,
  // minContainment=0.7 — keep in sync with Dedup.winnowingPairs defaults.
  private val x14Sql =
    """WITH cs AS (
      |  SELECT doc_id, CAST([unicode(c) FOR c IN string_split(text, '')] AS HUGEINT[]) AS cps
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(cps) < 8 THEN []::BIGINT[]
      |    ELSE [
      |      CAST(CASE WHEN h >= 9223372036854775808::HUGEINT THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
      |      FOR h IN [
      |        (cps[i] * 7338767820243804503::HUGEINT + cps[i+1] * 10030938618205820369::HUGEINT
      |         + cps[i+2] * 3132446466301724359::HUGEINT + cps[i+3] * 9116066114394809057::HUGEINT
      |         + cps[i+4] * 5531498854692111159::HUGEINT + cps[i+5] * 1730340065630535921::HUGEINT
      |         + cps[i+6] * 1315423911::HUGEINT + cps[i+7]) % 18446744073709551616::HUGEINT
      |        FOR i IN range(1, len(cps) - 8 + 2)]
      |    ] END AS grams
      |  FROM cs),
      |fp AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(grams) <= 4 THEN [list_aggregate(grams, 'min')]
      |         ELSE [list_aggregate(grams[j:j+3], 'min') FOR j IN range(1, len(grams) - 4 + 2)]
      |    END) AS fps
      |  FROM g WHERE len(grams) > 0),
      |ex AS (SELECT doc_id, unnest(fps) AS f FROM fp WHERE len(fps) > 0),
      |rare AS (SELECT f FROM ex GROUP BY f HAVING count(DISTINCT doc_id) <= 25),
      |exr AS (SELECT ex.doc_id, ex.f FROM ex JOIN rare USING (f)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM exr GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
      |  FROM exr a JOIN exr b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, shared_fps,
      |  CAST(shared_fps AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
      |FROM pairs
      |JOIN sizes sa ON doc_a = sa.doc_id
      |JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(shared_fps AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.7
      |  AND shared_fps >= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x10 — embedding near-dup pairs above a cosine threshold.
  // ---------------------------------------------------------------------------
  def x10EmbeddingPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairs(Tables.embeddings(spark, dir), threshold = 0.0)
      .withColumn("cosine", round(col("cosine"), 6))
      .filter(col("cosine") >= 0.4)

  private val x10Sql =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4""".stripMargin

  // ---------------------------------------------------------------------------
  // x11 — multimodal metadata budget (payload bytes never read: column
  // pruning; the synthetic media table derives deterministically from
  // documents, mirrored in SQL).
  // ---------------------------------------------------------------------------
  def x11MediaBudget(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Multimodal.mediaBudget(
      graft.ext.Multimodal.syntheticMedia(spark, Tables.documents(spark, dir)))

  private val x11Sql =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    encode(text) AS payload, n_chars * 10 AS duration_ms
      |  FROM documents)
      |SELECT kind, count(*) AS n,
      |  CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
      |  avg(octet_length(payload)) AS avg_bytes,
      |  CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms
      |FROM media GROUP BY kind""".stripMargin

  // ---------------------------------------------------------------------------
  // x12 — multimodal decode stage (stub codec -> deterministic features).
  // Oracled with NO engine change: FakeCodec is a 31-base rolling hash of the
  // payload bytes seeding one xorshift64* step; the oracle replays both in
  // HUGEINT mod-2^64 arithmetic down to the same float divide, bit for bit.
  // Bytes are recovered SIGNED from hex(encode(text)) — Java bytes are
  // signed, so 0x80+ must fold negative and the mod must re-wrap — which
  // keeps the oracle valid even if the fixture ever grows non-ASCII text.
  // ---------------------------------------------------------------------------
  def x12MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Multimodal.decodeFeatures(
      graft.ext.Multimodal.syntheticMedia(spark, Tables.documents(spark, dir)))
      .select(col("media_id"), col("kind"), col("feature_dim"), col("decode_ok"),
        round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))

  // ---------------------------------------------------------------------------
  // x22 — video frame sampling: one row per evenly-strided pseudo-frame of
  // each video payload (the Spark-side plumbing of Multimodal.sampleVideoFrames
  // with the stub codec). Byte-exact oracle without blob surgery: frames are
  // compared as HEX STRINGS, so DuckDB replays the slicing as pure string
  // arithmetic on hex(encode(text)).
  // ---------------------------------------------------------------------------
  def x22FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.ext.Multimodal.syntheticMedia(spark, Tables.documents(spark, dir))
    graft.ext.Multimodal.sampleVideoFrames(media, n = 4).select(
      col("media_id"), col("source_doc_id"),
      length(col("payload")).as("frame_len"),
      hex(col("payload")).as("frame_hex"))
  }

  private val x22Sql =
    """WITH v AS (
      |  SELECT doc_id AS media_id, doc_id AS source_doc_id,
      |    hex(encode(text)) AS h, octet_length(encode(text)) AS len
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT media_id, source_doc_id, h, len, greatest(1, len // 4) AS stride,
      |    unnest(range(0, least(4, len))) AS i
      |  FROM v)
      |SELECT media_id, source_doc_id,
      |  CAST(least(i * stride + stride, len) - i * stride AS INTEGER) AS frame_len,
      |  substr(h, i * stride * 2 + 1,
      |    (least(i * stride + stride, len) - i * stride) * 2) AS frame_hex
      |FROM f""".stripMargin

  // ---------------------------------------------------------------------------
  // x23 — image resize stage (stub codec: content-bounded byte clamp standing
  // in for re-encoding; real plumbing — kind filter, payload rewrite, metadata
  // stamp). Same hex-string oracle technique as x22.
  // ---------------------------------------------------------------------------
  def x23Resize(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.ext.Multimodal.syntheticMedia(spark, Tables.documents(spark, dir))
    graft.ext.Multimodal.resizeImages(media, w = 32, h = 32).select(
      col("media_id"), col("width"), col("height"),
      length(col("payload")).as("resized_len"),
      hex(col("payload")).as("resized_hex"))
  }

  private val x23Sql =
    """WITH img AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS h,
      |    octet_length(encode(text)) AS len
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT media_id, CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height,
      |  CAST(least(len, 16) AS INTEGER) AS resized_len,
      |  substr(h, 1, least(len, 16) * 2) AS resized_hex
      |FROM img""".stripMargin

  // ---------------------------------------------------------------------------
  // x26 — audio segmentation: each audio payload cut into 1-second windows
  // (segment count = ceil(duration/1s); stub codec cuts proportional byte
  // ranges at integer-division boundaries). Byte-exact hex-string oracle
  // like x22/x23 — the boundaries are pure arithmetic DuckDB can replay.
  // ---------------------------------------------------------------------------
  def x26AudioSegments(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.ext.Multimodal.syntheticMedia(spark, Tables.documents(spark, dir))
    graft.ext.Multimodal.segmentAudio(media, segMs = 1000).select(
      col("media_id"), col("source_doc_id"), col("seg_index"),
      col("seg_start_ms"), col("seg_end_ms"),
      length(col("payload")).as("seg_len"),
      hex(col("payload")).as("seg_hex"))
  }

  private val x26Sql =
    """WITH a AS (
      |  SELECT doc_id AS media_id, doc_id AS source_doc_id,
      |    hex(encode(text)) AS h, octet_length(encode(text)) AS len,
      |    CAST(n_chars AS BIGINT) * 10 AS dur
      |  FROM documents WHERE doc_id % 3 = 1),
      |s AS (
      |  SELECT *, greatest(1, (dur + 999) // 1000) AS n FROM a WHERE len > 0),
      |e AS (
      |  SELECT media_id, source_doc_id, h, len, dur, n, unnest(range(0, n)) AS i
      |  FROM s)
      |SELECT media_id, source_doc_id, CAST(i AS INTEGER) AS seg_index,
      |  CAST(i * 1000 AS BIGINT) AS seg_start_ms,
      |  CAST(least((i + 1) * 1000, dur) AS BIGINT) AS seg_end_ms,
      |  CAST((len * (i + 1)) // n - (len * i) // n AS INTEGER) AS seg_len,
      |  substr(h, ((len * i) // n) * 2 + 1,
      |    ((len * (i + 1)) // n - (len * i) // n) * 2) AS seg_hex
      |FROM e""".stripMargin

  // ---------------------------------------------------------------------------
  // x27 — Bloom-prefiltered exact admission: new-batch docs (doc_id % 10 = 0)
  // whose normalized fingerprint is absent from the corpus (the other 90%).
  // The broadcast Bloom filter routes the batch — provably-new rows skip the
  // join entirely; only might-contain candidates pay the exact anti-join.
  // No false negatives means the union is bitwise equal to the plain
  // anti-join the oracle runs: the approximation changes the plan, not the
  // result.
  // ---------------------------------------------------------------------------
  def x27BloomAdmit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.bloomAdmit(
      corpus = docs.filter(col("doc_id") % 10 =!= 0),
      batch = docs.filter(col("doc_id") % 10 === 0))
  }

  private val x27Sql =
    """WITH fp AS (
      |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_fp
      |  FROM documents)
      |SELECT b.doc_id, b.norm_fp
      |FROM fp b
      |WHERE b.doc_id % 10 = 0
      |  AND NOT EXISTS (
      |    SELECT 1 FROM fp c WHERE c.doc_id % 10 <> 0 AND c.norm_fp = b.norm_fp)""".stripMargin

  // ---------------------------------------------------------------------------
  // x28 — PII scrubbing: emails -> <EMAIL>, IPv4 -> <IP>, 7+-digit runs ->
  // <NUM>, with per-class counts. RE2-compatible patterns and a fixed pass
  // order make the rewrite replayable byte for byte; the output carries the
  // md5 of the redacted text so the compare is sensitive to every byte
  // without shipping the full text.
  // ---------------------------------------------------------------------------
  def x28Redact(spark: SparkSession, dir: String): DataFrame =
    TextStats.redactPii(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_longnums"),
        length(col("text_redacted")).as("redacted_len"),
        md5(col("text_redacted")).as("redacted_fp"))

  private val x28Sql =
    """WITH r AS (
      |  SELECT doc_id, text,
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM documents),
      |r2 AS (
      |  SELECT *, regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2 FROM r),
      |r3 AS (
      |  SELECT *, regexp_replace(t2, '\b\d{7,}\b', '<NUM>', 'g') AS t3 FROM r2)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(t1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS n_ips,
      |  CAST(len(regexp_extract_all(t2, '\b\d{7,}\b')) AS INTEGER) AS n_longnums,
      |  CAST(length(t3) AS INTEGER) AS redacted_len,
      |  md5(t3) AS redacted_fp
      |FROM r3""".stripMargin

  // ---------------------------------------------------------------------------
  // x29 — context-window chunking over the REAL subword stream: every doc's
  // BPE tokens (pinned vocab — see x18) cut into overlapping 64-subword
  // windows at stride 48 (chunk i covers subwords [48i, 48i+64); last chunk
  // short, short docs yield one chunk). Boundary arithmetic is integer and
  // the chunk fingerprint is md5 of the re-joined window, so the compare
  // sees every subword decision the tokenizer made.
  // ---------------------------------------------------------------------------
  def x29Chunks(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.chunkDocs(Tables.documents(spark, dir), window = 64, stride = 48,
      tokens = TextStats.bpeTokens)

  private[queries] val x29Sql =
    s"""$bpeCte,
       |n AS (SELECT doc_id, sw AS toks, len(sw) AS n_toks FROM dstream),
       |e AS (
       |  SELECT doc_id, toks, n_toks,
       |    unnest(range(0, 1 + greatest((n_toks - 64 + 47) // 48, 0))) AS i
       |  FROM n)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
       |  CAST(i * 48 AS BIGINT) AS chunk_start,
       |  CAST(len(list_slice(toks, i * 48 + 1, i * 48 + 64)) AS INTEGER) AS chunk_tokens,
       |  md5(array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ')) AS chunk_fp
       |FROM e""".stripMargin

  // ---------------------------------------------------------------------------
  // x36 — the tokenizer itself through the gate: per-doc BPE subword count
  // plus the md5 of the space-joined subword stream. The fingerprint makes
  // the compare sensitive to EVERY merge decision on every word occurrence —
  // if the engine's greedy loop and the oracle's recursive replay disagree
  // on a single subword boundary anywhere in the corpus, this query fails.
  // ---------------------------------------------------------------------------
  def x36BpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextStats.bpeTokens(col("text")).as("sw"))
      .select(col("doc_id"),
        size(col("sw")).as("n_bpe_tokens"),
        md5(array_join(col("sw"), " ")).as("bpe_fp"))

  private val x36Sql =
    s"""$bpeCte
       |SELECT doc_id, CAST(len(sw) AS INTEGER) AS n_bpe_tokens,
       |  md5(array_to_string(sw, ' ')) AS bpe_fp
       |FROM dstream""".stripMargin

  // ---------------------------------------------------------------------------
  // x30 — eval-set contamination scan: docs with doc_id % 10 = 0 play the
  // eval benchmark; pairs sharing >= 3 distinct word 8-grams are flagged
  // with containment = shared / |eval doc's 8-gram set|. The eval side is
  // broadcast — the corpus side never shuffles (see Dedup.contaminationScan).
  // ---------------------------------------------------------------------------
  def x30Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.contaminationScan(
      corpus = docs.filter(col("doc_id") % 10 =!= 0),
      evalDocs = docs.filter(col("doc_id") % 10 === 0))
  }

  private val x30Sql =
    """WITH w0 AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(
      |    [array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS shset
      |  FROM w0 WHERE len(w) >= 8),
      |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh),
      |pairs AS (
      |  SELECT e.doc_id AS eval_doc, c.doc_id AS corpus_doc, count(*) AS shared_ngrams
      |  FROM ex e JOIN ex c ON e.s = c.s AND e.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
      |  GROUP BY 1, 2),
      |sz AS (SELECT doc_id, len(shset) AS n_ev FROM sh)
      |SELECT eval_doc, corpus_doc, shared_ngrams,
      |  shared_ngrams * 1.0 / n_ev AS containment
      |FROM pairs JOIN sz ON eval_doc = sz.doc_id
      |WHERE shared_ngrams >= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x31 — salted two-stage aggregation through the gate: the hot-key
  // mitigation (group on (key, salt), then merge partials on the key) must
  // be INVISIBLE in the result — and over exact decimals it is, bitwise,
  // because decimal addition is associative where float addition is not.
  // The oracle is the plain one-stage GROUP BY.
  // ---------------------------------------------------------------------------
  def x31SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("user_id"), graft.ops.Cols.money(col("value")).as("v"))
    graft.ops.Skew.saltedAgg(base, Seq("user_id"), buckets = 8)(
        sums = Seq("v"), counts = Seq(("v", "n")))
      .select(col("user_id"), col("v").cast("double").as("total_value"), col("n"))
  }

  private val x31Sql =
    """SELECT user_id,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      |  count(value) AS n
      |FROM events GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------------------
  // x33 — int8 embedding quantization: per-vector symmetric scale
  // (127/max|x|), every quantized coordinate replayed by the oracle (both
  // engines do the identical double-precision multiply+round), flattened to
  // a CSV string so the hash compare sees every value.
  // ---------------------------------------------------------------------------
  def x33QuantizeInt8(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Similarity.quantizeInt8(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("max_abs"), col("scale"),
        expr("array_join(transform(q, v -> cast(v as string)), ',')").as("q_csv"))

  private val x33Sql =
    """WITH d AS (
      |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vd
      |  FROM embeddings WHERE len(embedding) > 0),
      |m AS (
      |  SELECT vec_id, vd, list_max([abs(x) FOR x IN vd]) AS max_abs FROM d)
      |SELECT vec_id, max_abs, 127.0 / max_abs AS scale,
      |  array_to_string(
      |    [CAST(CAST(round(x * (127.0 / max_abs)) AS BIGINT) AS VARCHAR) FOR x IN vd],
      |    ',') AS q_csv
      |FROM m WHERE max_abs > 0""".stripMargin

  // ---------------------------------------------------------------------------
  // x34 — ANN search over the int8-quantized index: integer dot products
  // (exact in any order) normalized by one sqrt of the exact norm product.
  // No rounding anywhere — quantization makes the whole ranking bit-exact
  // across engines, where float cosine (x8) needs the round-to-6dp trick.
  // rank int to match the window output.
  // ---------------------------------------------------------------------------
  def x34QuantizedKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.ext.Similarity.cosineTopKQuantized(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  private val x34Sql =
    """WITH d AS (
      |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vd
      |  FROM embeddings WHERE len(embedding) > 0),
      |m AS (SELECT vec_id, vd, list_max([abs(x) FOR x IN vd]) AS mx FROM d),
      |qz AS (
      |  SELECT vec_id,
      |    [CAST(round(x * (127.0 / mx)) AS BIGINT) FOR x IN vd] AS q
      |  FROM m WHERE mx > 0),
      |nz AS (SELECT vec_id, q, list_sum([x * x FOR x IN q]) AS nrm FROM qz),
      |sc AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS DOUBLE)
      |      / sqrt(CAST(a.nrm * b.nrm AS DOUBLE)) AS score
      |  FROM nz a JOIN nz b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
      |SELECT query_id, neighbor_id, score,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |       ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
      |FROM sc
      |QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // x35 — quantized IVF ANN: the production composition of x13 (inverted
  // file, cluster-probed IO) with x33/x34 (int8 postings, bit-exact integer
  // scoring). Cluster pruning replays x13's float coarse quantizer; scoring
  // replays x34's quantized dot restricted to the probed clusters — so the
  // oracle is exactly "quantized brute force inside the probed clusters".
  // Serving shape: persisted index, probed clusters pushed into the postings
  // scan as a static partition filter (PlanAuditSpec pins PartitionCount).
  // ---------------------------------------------------------------------------
  def x35QuantizedIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val stage = Staging.stageDir("graft_ivf_index_v4", "ivfq", dir,
      Seq("embeddings.parquet")) { tmp =>
      Similarity.buildIvfIndexQuantizedAuto(emb, tmp.toString)
    }
    Similarity.cosineTopKIvfQuantizedIndexed(spark, stage.toString,
      emb.filter(col("vec_id") < 10), k = 5)
  }

  private lazy val x35Sql =
    s"""WITH centroids AS (
      |  SELECT vec_id AS centroid_id, embedding AS centroid_vec
      |  FROM embeddings
      |  ORDER BY CASE WHEN md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR))
      |                     >= 9223372036854775808
      |            THEN CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |                 - 18446744073709551616
      |            ELSE CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |            END
      |  LIMIT $adaptiveNlistSql),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, centroid_id AS cluster_id
      |  FROM (
      |    SELECT e.vec_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN centroids c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, centroid_id AS cluster_id
      |  FROM (
      |    SELECT e.vec_id, c.centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN centroids c
      |    WHERE e.vec_id < 10)
      |  WHERE rn <= 4),
      |qz AS (
      |  SELECT vec_id, q, list_sum([x * x FOR x IN q]) AS nrm FROM (
      |    SELECT vec_id, [CAST(round(x * (127.0 / mx)) AS BIGINT) FOR x IN vd] AS q
      |    FROM (
      |      SELECT vec_id, vd, list_max([abs(x) FOR x IN vd]) AS mx
      |      FROM (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vd
      |            FROM embeddings WHERE len(embedding) > 0))
      |    WHERE mx > 0)),
      |sc AS (
      |  SELECT p.query_id, a.neighbor_id,
      |    CAST(list_sum([qa.q[i] * qb.q[i] FOR i IN range(1, len(qa.q) + 1)]) AS DOUBLE)
      |      / sqrt(CAST(qa.nrm * qb.nrm AS DOUBLE)) AS score
      |  FROM probes p
      |  JOIN assigned a ON p.cluster_id = a.cluster_id AND p.query_id <> a.neighbor_id
      |  JOIN qz qa ON qa.vec_id = p.query_id
      |  JOIN qz qb ON qb.vec_id = a.neighbor_id)
      |SELECT query_id, neighbor_id, score,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |       ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
      |FROM sc QUALIFY rank <= 5""".stripMargin

  // ---------------------------------------------------------------------------
  // x37 — BM25 ranked retrieval (the data-selection operator): top-10 docs
  // for a fixed probe query. tf/df/dl/N are exact integers on both engines;
  // the idf ln is the only libm call and the score is rounded to 6dp BEFORE
  // the rank cut (ties to doc_id), the same cross-engine-stable-ordering
  // treatment as the cosine paths. The oracle states the scoring expression
  // with IDENTICAL association, so the hash compare pins every score.
  // ---------------------------------------------------------------------------
  /** The whitespace-token inverted file staged once per corpus content —
    * the build-once/consume-many pattern (IVF index, dup clusters) applied
    * to text retrieval: x37 and x43's BM25 leg both probe it instead of
    * re-tokenizing the corpus per query. Probes are bitwise-identical to
    * the inline formulation (same tf/df/dl/N integers, same scoring
    * expression — asserted in ExtSpec). */
  private[queries] def ensureTermIndex(spark: SparkSession, dir: String): String =
    Staging.stageDir("graft_text_index_v1", "terms", dir,
      Seq("documents.parquet")) { tmp =>
      graft.ext.Retrieval.buildTermIndex(Tables.documents(spark, dir), tmp.toString)
    }.toString

  private val bm25Terms = Seq("table", "query", "stream", "window")

  def x37Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Retrieval.bm25FromIndex(spark, ensureTermIndex(spark, dir),
      bm25Terms, k = 10)

  private val x37Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE length(trim(text)) > 0),
      |dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
      |  WHERE term IN ('table', 'query', 'stream', 'window')
      |  GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT doc_id,
      |    round(sum(
      |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) *
      |      ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
      |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
      |    ), 6) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |  GROUP BY doc_id)
      |SELECT doc_id, score,
      |  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
      |FROM sc
      |QUALIFY rank <= 10""".stripMargin

  // ---------------------------------------------------------------------------
  // x38 — Gopher-style repetition signals: top-2-gram token share and
  // duplicate-2/3-gram fractions per doc, with the keep flag under the
  // Gopher-inspired caps. One explode emits both gram sizes; every fraction
  // is a single integer/integer division (bit-replayable).
  // ---------------------------------------------------------------------------
  def x38Repetition(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.repetitionSignals(Tables.documents(spark, dir))

  private val x38Sql =
    """WITH b AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
      |g0 AS (
      |  SELECT doc_id, n, ts, unnest(range(len(ts) - n + 1)) AS i
      |  FROM b CROSS JOIN (VALUES (2), (3)) v(n)
      |  WHERE len(ts) >= n),
      |g AS (
      |  SELECT doc_id, n, array_to_string(list_slice(ts, i + 1, i + n), ' ') AS gram
      |  FROM g0),
      |c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT doc_id,
      |    max(CASE WHEN n = 2 THEN c END) AS top2,
      |    sum(CASE WHEN n = 2 THEN c ELSE 0 END) AS tot2,
      |    sum(CASE WHEN n = 2 AND c > 1 THEN c ELSE 0 END) AS dup2,
      |    sum(CASE WHEN n = 3 THEN c ELSE 0 END) AS tot3,
      |    sum(CASE WHEN n = 3 AND c > 1 THEN c ELSE 0 END) AS dup3
      |  FROM c GROUP BY 1)
      |SELECT b.doc_id, CAST(len(b.ts) AS BIGINT) AS n_tokens,
      |  CASE WHEN len(b.ts) > 0
      |       THEN CAST(2 * coalesce(s.top2, 0) AS DOUBLE) / CAST(len(b.ts) AS DOUBLE)
      |       ELSE 0.0 END AS top_2gram_frac,
      |  CASE WHEN coalesce(s.tot2, 0) > 0
      |       THEN CAST(s.dup2 AS DOUBLE) / CAST(s.tot2 AS DOUBLE)
      |       ELSE 0.0 END AS dup_2gram_frac,
      |  CASE WHEN coalesce(s.tot3, 0) > 0
      |       THEN CAST(s.dup3 AS DOUBLE) / CAST(s.tot3 AS DOUBLE)
      |       ELSE 0.0 END AS dup_3gram_frac,
      |  CAST(CASE WHEN
      |      (CASE WHEN len(b.ts) > 0
      |            THEN CAST(2 * coalesce(s.top2, 0) AS DOUBLE) / CAST(len(b.ts) AS DOUBLE)
      |            ELSE 0.0 END) <= 0.2
      |      AND (CASE WHEN coalesce(s.tot2, 0) > 0
      |                THEN CAST(s.dup2 AS DOUBLE) / CAST(s.tot2 AS DOUBLE)
      |                ELSE 0.0 END) <= 0.6
      |      AND (CASE WHEN coalesce(s.tot3, 0) > 0
      |                THEN CAST(s.dup3 AS DOUBLE) / CAST(s.tot3 AS DOUBLE)
      |                ELSE 0.0 END) <= 0.6
      |    THEN 1 ELSE 0 END AS INTEGER) AS repetition_keep
      |FROM b LEFT JOIN s USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x40 — CCNet-style LM quality score: char-trigram model self-trained on
  // the corpus, add-1 smoothed; per-trigram log-probs rounded to 6dp and
  // summed as DECIMAL (exact, order-independent — the money trick applied
  // to LM scoring). The model table is bounded by |charset|^3: broadcast at
  // any corpus size.
  // ---------------------------------------------------------------------------
  def x40LmQuality(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.lmQualityScore(Tables.documents(spark, dir))

  private val x40Sql =
    """WITH tg AS (
      |  SELECT doc_id,
      |    unnest(CASE WHEN length(text) >= 3
      |           THEN [substr(text, i, 3) FOR i IN range(1, length(text) - 1)]
      |           ELSE [] END) AS tg
      |  FROM documents),
      |c AS (SELECT tg, count(*) AS c FROM tg GROUP BY 1),
      |s AS (SELECT sum(c) AS n, count(*) AS v FROM c),
      |lp AS (
      |  SELECT t.doc_id,
      |    CAST(round(ln(CAST(c.c + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)), 6)
      |         AS DECIMAL(18,6)) AS lp
      |  FROM tg t JOIN c USING (tg) CROSS JOIN s),
      |pd AS (
      |  SELECT doc_id, sum(lp) AS lp_sum, count(*) AS n_trigrams
      |  FROM lp GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(pd.n_trigrams, 0) AS n_trigrams,
      |  coalesce(CAST(pd.lp_sum AS DOUBLE), 0.0) AS logprob,
      |  CASE WHEN coalesce(pd.n_trigrams, 0) > 0
      |       THEN CAST(pd.lp_sum AS DOUBLE) / CAST(pd.n_trigrams AS DOUBLE)
      |       ELSE 0.0 END AS avg_logprob
      |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x41 — duplicated-span statistics (Lee et al. substring dedup, block-grid
  // approximation): per doc, how many non-overlapping 8-token blocks occur
  // verbatim >= 2x corpus-wide, and the token budget left after removing
  // them. The engine shuffles 8-byte block hashes; the oracle groups on the
  // block TEXT — they agree because the output is per-doc counts and 64-bit
  // collisions are vanishing.
  // ---------------------------------------------------------------------------
  def x41DupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(Tables.documents(spark, dir), blockTokens = 8)

  private val x41Sql =
    """WITH b AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
      |bl AS (
      |  SELECT doc_id, array_to_string(list_slice(ts, i * 8 + 1, i * 8 + 8), ' ') AS blk
      |  FROM (SELECT doc_id, ts, unnest(range(len(ts) // 8)) AS i FROM b)),
      |c AS (
      |  SELECT doc_id, count(*) OVER (PARTITION BY blk) AS c FROM bl),
      |pd AS (
      |  SELECT doc_id, count(*) AS n_blocks,
      |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dup_blocks
      |  FROM c GROUP BY 1)
      |SELECT b.doc_id, CAST(len(b.ts) AS BIGINT) AS n_tokens,
      |  coalesce(pd.n_blocks, 0) AS n_blocks,
      |  CAST(coalesce(pd.dup_blocks, 0) AS BIGINT) AS dup_blocks,
      |  CASE WHEN len(b.ts) > 0
      |       THEN CAST(8 * coalesce(pd.dup_blocks, 0) AS DOUBLE) / CAST(len(b.ts) AS DOUBLE)
      |       ELSE 0.0 END AS dup_token_frac,
      |  CAST(len(b.ts) - 8 * coalesce(pd.dup_blocks, 0) AS BIGINT) AS tokens_kept
      |FROM b LEFT JOIN pd USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x42 — DSIR importance-resampling weights: target = the English slice,
  // raw = the whole corpus; per-doc log weight under add-1-smoothed
  // bag-of-words models, 6dp-rounded per-term log-ratios summed as DECIMAL
  // (exact, order-independent).
  // ---------------------------------------------------------------------------
  def x42DsirWeights(spark: SparkSession, dir: String): DataFrame =
    Corpus.dsirWeights(Tables.documents(spark, dir), col("lang") === "en")

  private[queries] val x42Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS term
      |  FROM documents WHERE length(trim(text)) > 0),
      |tc AS (
      |  SELECT term, count(*) AS c_raw,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
      |  FROM t GROUP BY 1),
      |tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt, count(*) AS v FROM tc),
      |lw AS (
      |  SELECT term,
      |    CAST(round(ln((CAST(c_tgt AS DOUBLE) + 1.0) / CAST(n_tgt + v AS DOUBLE))
      |             - ln((CAST(c_raw AS DOUBLE) + 1.0) / CAST(n_raw + v AS DOUBLE)), 6)
      |         AS DECIMAL(18,6)) AS lw
      |  FROM tc CROSS JOIN tot),
      |pd AS (
      |  SELECT t.doc_id, count(*) AS n_terms, sum(lw.lw) AS w
      |  FROM t JOIN lw USING (term) GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(pd.n_terms, 0) AS n_terms,
      |  coalesce(CAST(pd.w AS DOUBLE), 0.0) AS log_weight,
      |  CASE WHEN coalesce(pd.n_terms, 0) > 0
      |       THEN CAST(pd.w AS DOUBLE) / CAST(pd.n_terms AS DOUBLE)
      |       ELSE 0.0 END AS avg_log_weight
      |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x43 — hybrid retrieval with reciprocal-rank fusion: the BM25 leg (x37's
  // probe terms) and a dense cosine leg (vec 0 as the probe vector) each
  // produce a rounded-then-ranked top-20 pool; RRF fuses them as
  // 1/(60+rank) summed sparse-then-dense, rounded to 6dp before the final
  // top-10 cut with ties to doc_id. Every arithmetic step is exact-input
  // IEEE, so the oracle replays the fused ranking bit for bit.
  // ---------------------------------------------------------------------------
  def x43HybridRrf(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Retrieval.hybridRrfFromIndex(spark, ensureTermIndex(spark, dir),
      Tables.embeddings(spark, dir), bm25Terms, queryVecId = 0L, k = 10)

  private val x43Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE length(trim(text)) > 0 AND doc_id <> 0),
      |dd AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
      |tf AS (
      |  SELECT doc_id, dl, term, count(*) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
      |  WHERE term IN ('table', 'query', 'stream', 'window')
      |  GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |sc AS (
      |  SELECT doc_id,
      |    round(sum(
      |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) *
      |      ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
      |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
      |    ), 6) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |  GROUP BY doc_id),
      |sparse AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS sparse_rank
      |  FROM sc QUALIFY sparse_rank <= 20),
      |qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
      |dn AS (
      |  SELECT e.vec_id AS doc_id,
      |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                 CAST(qv.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
      |dense AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS INTEGER) AS dense_rank
      |  FROM dn QUALIFY dense_rank <= 20),
      |fused AS (
      |  SELECT doc_id, sparse_rank, dense_rank,
      |    round((CASE WHEN sparse_rank IS NOT NULL
      |                THEN CAST(1.0 AS DOUBLE) / CAST(60 + sparse_rank AS DOUBLE)
      |                ELSE CAST(0.0 AS DOUBLE) END)
      |        + (CASE WHEN dense_rank IS NOT NULL
      |                THEN CAST(1.0 AS DOUBLE) / CAST(60 + dense_rank AS DOUBLE)
      |                ELSE CAST(0.0 AS DOUBLE) END), 6) AS rrf_score
      |  FROM sparse FULL JOIN dense USING (doc_id))
      |SELECT doc_id, sparse_rank, dense_rank, rrf_score,
      |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INTEGER) AS rank
      |FROM fused QUALIFY rank <= 10""".stripMargin

  // ---------------------------------------------------------------------------
  // x44 — ANN recall@5: the IVF probe (x13's exact path, staged index)
  // evaluated against the brute-force ground truth (x8), per query. The
  // serving-quality metric a 100 TB index is tuned by: both inputs are
  // top-k frames (|queries| x 5 rows), so the eval itself is free — the
  // cost is the two searches it composes. hits is an exact integer count,
  // recall one exact-input division; the oracle replays both searches.
  // ---------------------------------------------------------------------------
  def x44AnnRecall(spark: SparkSession, dir: String): DataFrame =
    Similarity.recallAtK(x8KnnBrute(spark, dir), x13KnnIvf(spark, dir), k = 5)

  private lazy val x44Sql =
    s"""WITH $ivfAssignCteAdaptive,
      |probes AS (
      |  SELECT vec_id AS query_id, embedding AS q_vec, centroid_id AS cluster_id
      |  FROM (
      |    SELECT e.vec_id, e.embedding, c.centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM embeddings e CROSS JOIN centroids c
      |    WHERE e.vec_id < 10)
      |  WHERE rn <= 4),
      |ivf_scored AS (
      |  SELECT DISTINCT p.query_id, a.neighbor_id,
      |    round(list_cosine_similarity(CAST(p.q_vec AS DOUBLE[]),
      |                                 CAST(a.c_vec AS DOUBLE[])), 6) AS cosine
      |  FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
      |  WHERE p.query_id <> a.neighbor_id),
      |ivf AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |         ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |  FROM ivf_scored QUALIFY rank <= 5),
      |bq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |brute_scored AS (
      |  SELECT bq.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(bq.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM bq JOIN embeddings e ON bq.vec_id <> e.vec_id),
      |brute AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |         ORDER BY cosine DESC, neighbor_id ASC) AS rank
      |  FROM brute_scored QUALIFY rank <= 5)
      |SELECT b.query_id, count(i.neighbor_id) AS hits,
      |  CAST(count(i.neighbor_id) AS DOUBLE) / CAST(5.0 AS DOUBLE) AS recall
      |FROM brute b
      |LEFT JOIN ivf i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x45 — duplicated-span REMOVAL (the rewrite half of Lee et al. substring
  // dedup; x41 is the measurement half): drop every 8-token block occurring
  // verbatim >= 2x corpus-wide, keep the tail, re-join survivors in order.
  // The engine shuffles 8-byte block hashes and rewrites from per-doc index
  // arrays; the oracle groups on block TEXT and rebuilds the same string —
  // they agree on the hash compare because the rewrite is a pure function
  // of block multiplicity and 64-bit collisions are vanishing.
  // ---------------------------------------------------------------------------
  def x45SpanRemoval(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDupSpans(Tables.documents(spark, dir), blockTokens = 8)

  private val x45Sql =
    """WITH b AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
      |bl AS (
      |  SELECT doc_id, i, array_to_string(list_slice(ts, i * 8 + 1, i * 8 + 8), ' ') AS blk
      |  FROM (SELECT doc_id, ts, unnest(range(len(ts) // 8)) AS i FROM b)),
      |m AS (SELECT blk, count(*) AS c FROM bl GROUP BY 1),
      |dup AS (
      |  SELECT doc_id, list_sort(list(i)) AS dups
      |  FROM bl JOIN m USING (blk) WHERE c > 1 GROUP BY 1)
      |SELECT b.doc_id, CAST(len(b.ts) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(len(d.dups), 0) AS BIGINT) AS dup_blocks,
      |  CAST(len(b.ts) - 8 * coalesce(len(d.dups), 0) AS BIGINT) AS tokens_kept,
      |  coalesce(array_to_string([b.ts[j + 1] FOR j IN range(0, len(b.ts))
      |    IF d.dups IS NULL OR NOT list_contains(d.dups, j // 8)], ' '), '') AS clean_text
      |FROM b LEFT JOIN dup d USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x39 — SemDeDup: semantic near-dup pairs WITHIN coarse clusters (the IVF
  // quantizer's assignment bounds the candidate set — sum |c|^2, never
  // |corpus|^2). Shares x13's centroid/assignment replay; pairs crossing a
  // cluster boundary are unscored by design (the semantic-dedup recall
  // trade).
  // ---------------------------------------------------------------------------
  def x39SemanticDup(spark: SparkSession, dir: String): DataFrame =
    // adaptive nlist (~500 vectors/cluster): at the driver SFs this resolves
    // to the 16 floor (outputs unchanged); at sf1 it is what keeps the
    // within-cluster pair work linear in corpus size
    graft.ext.Similarity.semanticDupPairsAuto(
      Tables.embeddings(spark, dir), threshold = 0.4)

  private lazy val x39Sql =
    s"""WITH $ivfAssignCteAdaptive
       |SELECT a.cluster_id, a.neighbor_id AS vec_a, b.neighbor_id AS vec_b,
       |  round(list_cosine_similarity(CAST(a.c_vec AS DOUBLE[]),
       |                               CAST(b.c_vec AS DOUBLE[])), 6) AS cosine
       |FROM assigned a
       |JOIN assigned b ON a.cluster_id = b.cluster_id AND a.neighbor_id < b.neighbor_id
       |WHERE round(list_cosine_similarity(CAST(a.c_vec AS DOUBLE[]),
       |                                   CAST(b.c_vec AS DOUBLE[])), 6) >= 0.4""".stripMargin

  // ---------------------------------------------------------------------------
  // x24 — exact per-group top-k via the custom TypedImperativeAggregate
  // (graft.functions.TopKPairs): bounded partial aggregation instead of a
  // whole-group window sort. Deterministic ties (score DESC, item ASC) make
  // it oracle-comparable against the window formulation.
  // ---------------------------------------------------------------------------
  def x24TopkAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(graft.functions.AggFunctions.topk_pairs(
        col("n_chars").cast("long"), col("doc_id"), 3).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.score").as("n_chars"), col("t.item").as("doc_id"))

  private[queries] val x24Sql =
    """SELECT lang, n_chars, doc_id FROM (
      |  SELECT lang, CAST(n_chars AS BIGINT) AS n_chars, doc_id,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
      |  FROM documents) WHERE rn <= 3""".stripMargin

  private val x12Sql =
    """WITH hx AS (
      |  SELECT doc_id, hex(encode(text)) AS h FROM documents),
      |bs AS (
      |  SELECT doc_id, [
      |    CASE WHEN v >= 128 THEN v - 256 ELSE v END
      |    FOR v IN [ (strpos('0123456789ABCDEF', h[2*i-1]) - 1) * 16
      |               + (strpos('0123456789ABCDEF', h[2*i]) - 1)
      |               FOR i IN range(1, length(h)//2 + 1)]
      |  ]::HUGEINT[] AS bytes
      |  FROM hx),
      |sd AS (
      |  SELECT doc_id, len(bytes) > 0 AS ok,
      |    list_reduce(list_prepend(1125899906842597::HUGEINT, bytes),
      |      (a, c) -> ((a * 31 + c) % 18446744073709551616::HUGEINT
      |                 + 18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT
      |    )::UBIGINT AS seed
      |  FROM bs),
      |x1 AS (SELECT doc_id, ok, xor(seed, seed >> 12) AS x FROM sd),
      |x2 AS (SELECT doc_id, ok, xor(x, ((x::HUGEINT * 33554432) % 18446744073709551616::HUGEINT)::UBIGINT) AS x FROM x1),
      |x3 AS (SELECT doc_id, ok, xor(x, x >> 27) AS x FROM x2),
      |f AS (SELECT doc_id, ok,
      |  ((x::HUGEINT * 2685821657736338717) % 18446744073709551616::HUGEINT)::UBIGINT >> 11 AS v
      |  FROM x3)
      |SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(64 AS INTEGER) AS feature_dim,
      |  ok AS decode_ok,
      |  CASE WHEN ok THEN round(CAST(CAST(v AS FLOAT) / CAST(9007199254740992 AS FLOAT)
      |                               - CAST(0.5 AS FLOAT) AS DOUBLE), 6) END AS f0
      |FROM f""".stripMargin

  // ---------------------------------------------------------------------------
  // x15 — embedding near-dup pairs via hyperplane LSH (the scale path for
  // x10's exact quadratic scan). Bitwise-oracled via the same LCG plane
  // replay as x9: candidates are (a < b) pairs sharing a signature in any
  // table, scored rounded, thresholded at 0.4.
  // ---------------------------------------------------------------------------
  def x15EmbeddingPairsLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPairsLsh(Tables.embeddings(spark, dir), threshold = 0.0)
      .withColumn("cosine", round(col("cosine"), 6))
      .filter(col("cosine") >= 0.4)

  private val x15Sql =
    s"""WITH $lshSigsCte,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b,
       |  round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                               CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
       |FROM cand
       |JOIN embeddings ea ON ea.vec_id = vec_a
       |JOIN embeddings eb ON eb.vec_id = vec_b
       |WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                   CAST(eb.embedding AS DOUBLE[])), 6) >= 0.4""".stripMargin

  // ---------------------------------------------------------------------------
  // x16 — near-dup CLUSTERS: connected components over the minhash pair set
  // (x3's edges). Pairs alone can't drive keep/drop decisions — a~b, b~c
  // must collapse to one cluster even when a~c never scored. The engine runs
  // min-label propagation + pointer jumping (O(log n) shuffle rounds,
  // graft.ext.Cluster); the oracle computes the same fixpoint with a
  // recursive transitive-closure CTE. Total over all docs: singletons
  // cluster with themselves.
  // ---------------------------------------------------------------------------
  /** Clusters materialized ONCE per corpus content — the steady-state
    * design: the cluster assignment is a batch artifact that several
    * downstream consumers read (x16 emits it, x46 resolves canonicals
    * against it, x48 derives the leakage-safe split from it), and
    * recomputing the LSH+connected-components chain per consumer triples
    * the most expensive stage of the curation pipeline. Content-keyed and
    * published race-free ([[Staging.stageDir]]); the clustering is fully
    * deterministic, so a rebuild is bit-identical and consumers stay
    * bitwise-oracled. */
  private[queries] def ensureDupClusters(spark: SparkSession, dir: String): String = {
    val staged = Staging.stageDir(
      "graft_cluster_stage_v1", "dupclusters", dir, Seq("documents.parquet")) { tmp =>
      // exact-collapse pre-pass + LSH over representatives — bitwise equal
      // to clustering the raw pipeline's pairs (see dupClustersCollapsed's
      // equivalence argument), quadratically cheaper on verbatim-dup groups
      Cluster.dupClustersCollapsed(Tables.documents(spark, dir), jaccardThreshold)
        .write.mode("overwrite").parquet(tmp.resolve("clusters").toString)
    }
    staged.resolve("clusters").toString
  }

  def x16DupClusters(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ensureDupClusters(spark, dir))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))

  private val x16Sql =
    s"""WITH RECURSIVE pairs AS ($x2Sql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1)
       |SELECT id AS doc_id, lbl.cluster_id, sz.cluster_size
       |FROM lbl JOIN sz USING (cluster_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x46 — canonical-document selection: x16's clusters resolved to one kept
  // doc each by x20's quality score (ties to the lowest doc_id). The engine
  // computes the per-cluster argmax as a map-side-combining max-of-struct
  // aggregation (no window sort); the oracle replays the same choice with a
  // rank-1 window over the identical score arithmetic. quality_score is the
  // same double per doc on both sides (proven bitwise by x20), so the
  // argmax — and therefore every kept flag — compares bitwise.
  // ---------------------------------------------------------------------------
  def x46CanonicalDocs(spark: SparkSession, dir: String): DataFrame =
    Cluster.canonicalDocs(
      spark.read.parquet(ensureDupClusters(spark, dir)),
      TextStats.qualityScore(Tables.documents(spark, dir))
        .select(col("doc_id"), col("quality_score")))

  private lazy val x46Sql =
    s"""WITH RECURSIVE pairs AS ($x2Sql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1),
       |q AS (
       |  SELECT doc_id,
       |    least(CAST(token_count AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - digit_ratio) * 0.3
       |      + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score
       |  FROM (
       |    SELECT doc_id, token_count,
       |      CASE WHEN length(text) = 0 THEN 0.0
       |           ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
       |           END AS digit_ratio,
       |      CASE WHEN token_count = 0 THEN 0.0
       |           ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                  w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
       |           END AS stopword_ratio
       |    FROM (
       |      SELECT doc_id, text,
       |        CASE WHEN length(trim(text)) = 0 THEN 0
       |             ELSE len(string_split_regex(trim(text), '\\s+')) END AS token_count
       |      FROM documents))),
       |sc AS (
       |  SELECT lbl.id AS doc_id, lbl.cluster_id, sz.cluster_size, q.quality_score
       |  FROM lbl JOIN sz USING (cluster_id) JOIN q ON q.doc_id = lbl.id)
       |SELECT doc_id, cluster_id, cluster_size, quality_score,
       |  CAST(CASE WHEN row_number() OVER (
       |         PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id) = 1
       |       THEN 1 ELSE 0 END AS INTEGER) AS kept
       |FROM sc""".stripMargin

  // ---------------------------------------------------------------------------
  // x47 — mixture planning: per-source token shares -> temperature-scaled
  // (T=2) sampling weights + token budgets + epoch counts. sqrt is IEEE-
  // correctly-rounded in both engines (pow is not — that is WHY only T=2 is
  // exposed), the normalizer sums 12dp-rounded sqrts in DECIMAL (exact,
  // order-free), and every remaining step is a single correctly-rounded
  // IEEE op — so a data-recipe table of doubles still compares bitwise.
  // ---------------------------------------------------------------------------
  private val mixBudget = 1000000L

  def x47MixturePlan(spark: SparkSession, dir: String): DataFrame =
    Corpus.mixturePlanSqrt(Tables.documents(spark, dir), col("source"),
      TextStats.tokenCount(col("text")), mixBudget)

  private val x47Sql =
    s"""WITH t AS (
       |  SELECT source AS stratum, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |s AS (
       |  SELECT *, CAST(n_tokens AS DOUBLE)
       |    / CAST((SELECT sum(n_tokens) FROM t) AS DOUBLE) AS token_share
       |  FROM t),
       |w AS (
       |  SELECT *, CAST(round(sqrt(token_share), 12) AS DECIMAL(20,12)) AS wd
       |  FROM s),
       |m AS (
       |  SELECT stratum, n_docs, n_tokens, token_share,
       |    CAST(wd AS DOUBLE) / CAST((SELECT sum(wd) FROM w) AS DOUBLE) AS mix_weight
       |  FROM w),
       |b AS (
       |  SELECT *, CAST(round(mix_weight * $mixBudget) AS BIGINT) AS budget_tokens
       |  FROM m)
       |SELECT stratum, n_docs, n_tokens, token_share, mix_weight, budget_tokens,
       |  round(CAST(budget_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs
       |FROM b""".stripMargin

  // ---------------------------------------------------------------------------
  // x49 — frequency-capped sampling (domain-balance cap): no source may
  // exceed maxShare of the corpus; over-cap sources are thinned to exactly
  // the cap by md5-bucket membership. Counts are exact longs, the keep rate
  // is two IEEE ops in a fixed order, and the threshold is an integer — so
  // the oracle replays it bitwise.
  // ---------------------------------------------------------------------------
  private[queries] val capShare = 0.03

  def x49FrequencyCap(spark: SparkSession, dir: String): DataFrame =
    Corpus.frequencyCapSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      col("source"), concat(lit("cap:"), col("doc_id").cast("string")), capShare)

  private[queries] val x49Sql =
    s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |t AS (SELECT sum(n) AS total_n FROM c),
       |r AS (
       |  SELECT source, CAST(round(least(1.0,
       |    $capShare * CAST(total_n AS DOUBLE) / CAST(n AS DOUBLE)) * 10000) AS INTEGER)
       |    AS keep_threshold
       |  FROM c, t),
       |b AS (
       |  SELECT d.doc_id, d.source, r.keep_threshold,
       |    CAST(md5_number_lower('cap:' || CAST(d.doc_id AS VARCHAR)) % 10000
       |      AS INTEGER) AS bucket
       |  FROM documents d JOIN r USING (source))
       |SELECT doc_id, source, keep_threshold, bucket,
       |  CAST(CASE WHEN bucket < keep_threshold THEN 1 ELSE 0 END AS INTEGER) AS kept
       |FROM b""".stripMargin

  // ---------------------------------------------------------------------------
  // x48 — leakage-safe train/valid split: membership is a pure function of
  // the near-dup CLUSTER id (x16's components), so two near-duplicates can
  // never straddle the split — the eval-contamination bug this op exists to
  // kill. The oracle replays the cluster fixpoint and the md5-bucket
  // arithmetic (md5_number_lower % buckets = the engine's unsigned modulus).
  // ---------------------------------------------------------------------------
  private val trainFrac = 0.9

  def x48LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame =
    Corpus.leakageSafeSplit(
      spark.read.parquet(ensureDupClusters(spark, dir)), trainFrac)

  private lazy val x48Sql =
    s"""WITH RECURSIVE pairs AS ($x2Sql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1)
       |SELECT id AS doc_id, lbl.cluster_id, sz.cluster_size,
       |  CAST(md5_number_lower('split:' || CAST(lbl.cluster_id AS VARCHAR)) % 10000
       |    AS INTEGER) AS split_bucket,
       |  CASE WHEN CAST(md5_number_lower('split:' || CAST(lbl.cluster_id AS VARCHAR)) % 10000
       |    AS INTEGER) < ${math.round(trainFrac * 10000).toInt} THEN 'train'
       |    ELSE 'valid' END AS split
       |FROM lbl JOIN sz USING (cluster_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x50 — weighted sampling without replacement, n per stratum (Efraimidis-
  // Spirakis A-Res): rank by ln(u)/w with u the top-53-md5 uniform (exact
  // double on both engines), w = character length. Selection runs on the
  // bounded TopKPairs aggregate, not a stratum-wide window sort. The rank
  // key is rounded at the 6th decimal into a scaled long, so the oracle's
  // window formulation replays the identical ranking.
  // ---------------------------------------------------------------------------
  private val wsampleN = 10

  def x50WeightedSample(spark: SparkSession, dir: String): DataFrame =
    Corpus.weightedSample(Tables.documents(spark, dir),
      stratumCol = col("lang"), idCol = col("doc_id"),
      weightCol = greatest(col("n_chars"), lit(1L)), n = wsampleN)

  private val x50Sql =
    s"""WITH k AS (
       |  SELECT lang, doc_id,
       |    CAST(round((ln(CAST((md5_number_lower('es:' || CAST(doc_id AS VARCHAR)) >> 11) + 1
       |                        AS DOUBLE) / 9007199254740992.0)
       |                / CAST(greatest(n_chars, 1) AS DOUBLE)) * 1000000.0, 0)
       |         AS BIGINT) AS es_scaled
       |  FROM documents)
       |SELECT lang AS stratum, rank, doc_id, es_scaled FROM (
       |  SELECT lang, doc_id, es_scaled,
       |    CAST(row_number() OVER (PARTITION BY lang
       |         ORDER BY es_scaled DESC, doc_id ASC) AS INTEGER) AS rank
       |  FROM k)
       |WHERE rank <= $wsampleN""".stripMargin

  // ---------------------------------------------------------------------------
  // x51 — embedding-space outlier scan: every vector's cosine to its OWN
  // IVF centroid (the persisted x13 index — assignment already paid),
  // global bottom-20. Shares x13's centroid/assignment replay; the cosine
  // is rounded pre-rank (ties to vec_id), so the oracle replays the scan
  // bit for bit.
  // ---------------------------------------------------------------------------
  private val outlierK = 20

  def x51CentroidOutliers(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val stage = Staging.stageDir("graft_ivf_index_v4", "ivf", dir,
      Seq("embeddings.parquet")) { tmp =>
      Similarity.buildIvfIndexAuto(emb, tmp.toString)
    }
    Similarity.centroidOutliers(spark, stage.toString, k = outlierK)
  }

  private lazy val x51Sql =
    s"""WITH $ivfAssignCteAdaptive,
       |sc AS (
       |  SELECT a.neighbor_id AS vec_id, a.cluster_id,
       |    round(list_cosine_similarity(CAST(a.c_vec AS DOUBLE[]),
       |                                 CAST(c.centroid_vec AS DOUBLE[])), 6) AS centroid_cos
       |  FROM assigned a JOIN centroids c ON a.cluster_id = c.centroid_id)
       |SELECT vec_id, cluster_id, centroid_cos,
       |  CAST(row_number() OVER (ORDER BY centroid_cos ASC, vec_id ASC) AS INTEGER) AS rank
       |FROM sc QUALIFY rank <= $outlierK""".stripMargin

  // ---------------------------------------------------------------------------
  // x52 — corpus datacard: the per-source summary a data team publishes
  // with a corpus (doc/token/empty counts, language spread + majority
  // language, exact-dup exposure, mean quality). Counts are exact integers,
  // mean quality is the DECIMAL-sum-of-rounded-scores trick with one final
  // division, majority language ties to the smallest lang — every column
  // replays bitwise.
  // ---------------------------------------------------------------------------
  def x52Datacard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Corpus.datacard(docs, TextStats.tokenCount(col("text")),
      TextStats.qualityScore(docs).select(col("doc_id"), col("quality_score")))
  }

  private val x52Sql =
    """WITH q AS (
      |  SELECT doc_id,
      |    least(CAST(token_count AS DOUBLE) / 100.0, 1.0) * 0.4
      |      + (1.0 - digit_ratio) * 0.3
      |      + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score
      |  FROM (
      |    SELECT doc_id, token_count,
      |      CASE WHEN length(text) = 0 THEN 0.0
      |           ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
      |           END AS digit_ratio,
      |      CASE WHEN token_count = 0 THEN 0.0
      |           ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
      |                  w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
      |           END AS stopword_ratio
      |    FROM (
      |      SELECT doc_id, text,
      |        CASE WHEN length(trim(text)) = 0 THEN 0
      |             ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count
      |      FROM documents))),
      |tok AS (
      |  SELECT doc_id, source, lang, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tc
      |  FROM documents),
      |base AS (
      |  SELECT source, count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_docs,
      |    count(DISTINCT lang) AS n_langs
      |  FROM tok GROUP BY 1),
      |lc AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |tl AS (
      |  SELECT source, min(lang) AS top_lang
      |  FROM lc JOIN (SELECT source, max(c) AS mx FROM lc GROUP BY 1) USING (source)
      |  WHERE c = mx GROUP BY source),
      |fp AS (SELECT source, md5(text) AS f FROM documents),
      |dfp AS (SELECT f FROM fp GROUP BY f HAVING count(*) >= 2),
      |dup AS (SELECT source, count(*) AS dup_docs FROM fp JOIN dfp USING (f) GROUP BY 1),
      |mq AS (
      |  SELECT d.source,
      |    CAST(sum(CAST(round(q.quality_score, 6) AS DECIMAL(18,6))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS mean_quality
      |  FROM documents d JOIN q USING (doc_id) GROUP BY 1)
      |SELECT base.source, n_docs, n_tokens, empty_docs, n_langs, top_lang,
      |  CAST(coalesce(dup.dup_docs, 0) AS BIGINT) AS dup_docs, mean_quality
      |FROM base JOIN tl USING (source) LEFT JOIN dup USING (source)
      |JOIN mq USING (source)""".stripMargin

  // ---------------------------------------------------------------------------
  // x53 — cross-source duplication leakage: for every source pair, how many
  // near-dup clusters (x16's components, read from the staged artifact)
  // have a member in BOTH — the audit that says where document-level
  // splitting would have leaked. The oracle replays the cluster fixpoint
  // and counts the same distinct (cluster, source) incidences.
  // ---------------------------------------------------------------------------
  def x53CrossSourceLeakage(spark: SparkSession, dir: String): DataFrame =
    Cluster.crossStratumLeakage(
      spark.read.parquet(ensureDupClusters(spark, dir)),
      Tables.documents(spark, dir).select(col("doc_id"), col("source").as("stratum")))

  private lazy val x53Sql =
    s"""WITH RECURSIVE pairs AS ($x2Sql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |cs AS (
       |  SELECT DISTINCT lbl.cluster_id, d.source
       |  FROM lbl JOIN documents d ON d.doc_id = lbl.id)
       |SELECT a.source AS stratum_a, b.source AS stratum_b,
       |  CAST(count(*) AS BIGINT) AS shared_clusters
       |FROM cs a JOIN cs b ON a.cluster_id = b.cluster_id AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------------
  // x54 — Lloyd (k-means) refinement of the coarse quantizer: one
  // assign-then-recenter round from the md5-ordered seed centroids, output
  // the assignment against the refined codebook. The oracle unrolls the
  // identical iteration: the seed + first assignment are x13's replay, the
  // per-(cluster, dim) mean sums DECIMAL of 6dp-rounded coordinates (exact,
  // order-free), one division, one float32 cast — then re-assigns with the
  // same argmax-cosine window. Every fit cosine compares bitwise.
  // ---------------------------------------------------------------------------
  def x54KmeansRefine(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansRefine(Tables.embeddings(spark, dir), nlist = 16, iters = 1)

  private lazy val x54Sql =
    s"""WITH $ivfAssignCte,
       |m AS (
       |  SELECT cluster_id, j,
       |    CAST(sum(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(27,6))) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE) AS mv
       |  FROM (
       |    SELECT cluster_id, generate_subscripts(c_vec, 1) AS j, unnest(c_vec) AS x
       |    FROM assigned)
       |  GROUP BY 1, 2),
       |c1 AS (
       |  SELECT cluster_id AS centroid_id,
       |    list(CAST(mv AS FLOAT) ORDER BY j) AS cv
       |  FROM m GROUP BY 1),
       |a2 AS (
       |  SELECT vec_id, cluster_id FROM (
       |    SELECT e.vec_id, c.centroid_id AS cluster_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                        CAST(c.cv AS DOUBLE[])) DESC,
       |                 c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN c1 c)
       |  WHERE rn = 1),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM a2 GROUP BY 1)
       |SELECT a2.vec_id, a2.cluster_id, sz.cluster_size,
       |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                               CAST(c.cv AS DOUBLE[])), 6) AS fit
       |FROM a2
       |JOIN embeddings e ON e.vec_id = a2.vec_id
       |JOIN c1 c ON c.centroid_id = a2.cluster_id
       |JOIN sz ON sz.cluster_id = a2.cluster_id""".stripMargin

  // ---------------------------------------------------------------------------
  // x17 — reproducible stratified sampling: per-language keep rates applied
  // via md5-bucket membership (pure function of the doc key — the same
  // sample on every run/cluster/backfill, no RNG state). The oracle replays
  // the identical arithmetic: md5_number_lower is the same 64 bits as the
  // engine's md5Lo64, and % on UBIGINT is the engine's unsigned modulus.
  // ---------------------------------------------------------------------------
  private val sampleRates = Seq("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2, "es" -> 0.1)

  def x17StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Corpus.stratifiedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      keyCol = concat(lit("smpl:"), col("doc_id").cast("string")),
      stratumCol = col("lang"),
      rates = sampleRates.toMap, defaultRate = 0.05)

  // ---------------------------------------------------------------------------
  // x32 — corpus mixing (fractional upsampling): per-language weights become
  // physical copies — floor(w) guaranteed + one reproducible md5-bucket
  // fractional copy. The oracle replays the bucket arithmetic
  // (md5_number_lower % buckets) and the per-stratum (base, threshold) pair.
  // ---------------------------------------------------------------------------
  private val mixWeights = Seq("en" -> 1.5, "de" -> 2.0, "fr" -> 0.25)
  private val mixDefault = 1.0

  def x32CorpusMix(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.upsample(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      keyCol = concat(lit("mix:"), col("doc_id").cast("string")),
      stratumCol = col("lang"),
      weights = mixWeights.toMap, defaultWeight = mixDefault)

  private val x32Sql = {
    def base(w: Double) = math.floor(w).toInt
    def thr(w: Double) = math.round((w - math.floor(w)) * 10000).toInt
    val baseCase = s"CASE ${mixWeights.map { case (l, w) =>
      s"WHEN lang = '$l' THEN ${base(w)}" }.mkString(" ")} ELSE ${base(mixDefault)} END"
    val thrCase = s"CASE ${mixWeights.map { case (l, w) =>
      s"WHEN lang = '$l' THEN ${thr(w)}" }.mkString(" ")} ELSE ${thr(mixDefault)} END"
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |    CAST(md5_number_lower('mix:' || CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER) AS bucket
       |  FROM documents),
       |c AS (
       |  SELECT *, CAST($baseCase + CASE WHEN bucket < $thrCase THEN 1 ELSE 0 END AS INTEGER) AS n_copies
       |  FROM b)
       |SELECT doc_id, lang, bucket, n_copies,
       |  CAST(unnest(range(1, n_copies + 1)) AS INTEGER) AS copy_id
       |FROM c WHERE n_copies > 0""".stripMargin
  }

  private val x17Sql =
    s"""SELECT doc_id, lang, bucket FROM (
       |  SELECT doc_id, lang,
       |    CAST(md5_number_lower('smpl:' || CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER) AS bucket
       |  FROM documents)
       |WHERE bucket < CASE ${sampleRates.map { case (l, r) =>
             s"WHEN lang = '$l' THEN ${math.round(r * 10000)}" }.mkString(" ")}
       |  ELSE 500 END""".stripMargin

  // ---------------------------------------------------------------------------
  // x18 — token-budget shard packing: contiguous doc_id order, shard_id =
  // exclusive-prefix-tokens div capacity. The engine computes the prefix sum
  // with the two-pass distributed scan (graft.ops.PrefixSum — NO global
  // single-partition window); the oracle is the window formulation, which is
  // fine at oracle scale and bitwise-identical (integer arithmetic).
  // ---------------------------------------------------------------------------
  private val shardCapacity = 2000L

  // Shared DuckDB replay of the engine's pinned-vocab BPE tokenizer
  // (graft.functions.BpeVocab/BpeTokens): the recursive CTE runs the SAME
  // greedy loop — rank = 1-based position in the merge list, merge the
  // LEFTMOST occurrence of the best-ranked adjacent pair, one merge per
  // recursion step — over the DISTINCT words (token counts are a pure
  // function of the word), then reassembles per-doc subword streams in word
  // order. The merge-key literal is generated from BpeVocab.Merges, so the
  // oracle can never drift from the engine's vocabulary.
  // lazy: referenced by SQL vals that appear EARLIER in declaration order
  // (x29Sql) — eager init order would embed a null into their text
  private lazy val bpeMergeKeys: String =
    graft.functions.BpeVocab.Merges
      .map { case (a, b) => s"'$a|$b'" }.mkString("[", ", ", "]")

  private lazy val bpeCte: String =
    s"""WITH RECURSIVE
       |wl(w) AS (
       |  SELECT DISTINCT unnest(string_split_regex(trim(text), '\\s+')) AS w
       |  FROM documents WHERE length(trim(text)) > 0),
       |bpe AS (
       |  SELECT w, [c FOR c IN string_split(w, '')]::VARCHAR[] AS toks FROM wl
       |  UNION ALL
       |  SELECT w, toks[1:bp-1] || [toks[bp] || toks[bp+1]] || toks[bp+2:] AS toks
       |  FROM (
       |    SELECT w, toks, list_position(ranks, list_min([r FOR r IN ranks IF r > 0])) AS bp
       |    FROM (
       |      SELECT w, toks,
       |        [list_position($bpeMergeKeys, toks[i] || '|' || toks[i+1])
       |         FOR i IN range(1, len(toks))] AS ranks
       |      FROM bpe WHERE len(toks) > 1)
       |    WHERE len([r FOR r IN ranks IF r > 0]) > 0)),
       |wfinal AS (
       |  SELECT w, arg_min(toks, len(toks)) AS toks FROM bpe GROUP BY w),
       |dstream AS (
       |  SELECT doc_id, flatten(list(f.toks ORDER BY pos)) AS sw
       |  FROM (
       |    SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
       |    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
       |          FROM documents WHERE length(trim(text)) > 0)) dw
       |  JOIN wfinal f USING (w)
       |  GROUP BY doc_id)""".stripMargin

  def x18TokenShards(spark: SparkSession, dir: String): DataFrame =
    Corpus.packTokenShards(Tables.documents(spark, dir), shardCapacity,
      tokenCount = TextStats.bpeTokenCount)

  private val x18Sql =
    s"""$bpeCte,
       |t AS (
       |  SELECT d.doc_id, CAST(coalesce(len(s.sw), 0) AS INTEGER) AS n_tokens
       |  FROM documents d LEFT JOIN dstream s USING (doc_id)),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM t)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum // $shardCapacity AS BIGINT) AS shard_id,
       |  CAST(cum % $shardCapacity AS BIGINT) AS shard_offset
       |FROM c""".stripMargin

  // ---------------------------------------------------------------------------
  // x19 — corpus top-20 bigrams by document frequency (distinct per doc),
  // ties broken by the n-gram so the ranking is total. Engine: hash agg +
  // TakeOrderedAndProject (per-partition heaps, k-element driver merge —
  // nothing global materializes); rank stamped over the k survivors only.
  // ---------------------------------------------------------------------------
  def x19NgramTopk(spark: SparkSession, dir: String): DataFrame =
    Corpus.topNgrams(Tables.documents(spark, dir), n = 2, k = 20)

  private val x19Sql =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(
      |    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS shset
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
      |cnt AS (
      |  SELECT ngram, count(*) AS doc_freq
      |  FROM (SELECT unnest(shset) AS ngram FROM sh) GROUP BY 1),
      |r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY doc_freq DESC, ngram) AS INTEGER) AS rnk,
      |         ngram, doc_freq
      |  FROM cnt)
      |SELECT rnk, ngram, doc_freq FROM r WHERE rnk <= 20""".stripMargin

  // ---------------------------------------------------------------------------
  // x20 — quality filter (the C4/Gopher-style keep/drop pass): per-doc
  // features -> weighted score -> keep flag with ordered overrides (the F1
  // masked-assignment cascade applied to curation). Pure double arithmetic
  // in a fixed order on both sides, so the gate compares bitwise.
  // ---------------------------------------------------------------------------
  def x20QualityFilter(spark: SparkSession, dir: String): DataFrame =
    TextStats.qualityScore(Tables.documents(spark, dir))
      .select(
        col("doc_id"), col("token_count"),
        TextStats.subwordCount(col("text")).as("subword_count"),
        col("avg_token_len"), col("digit_ratio"), col("stopword_ratio"),
        col("quality_score"), col("keep"))

  private val x20Sql =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, token_count,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
      |                w -> CAST(ceil(length(w) / 4.0) AS INTEGER))) AS INTEGER)
      |         END AS subword_count,
      |    CASE WHEN token_count = 0 THEN 0.0
      |         ELSE length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0 / token_count
      |         END AS avg_token_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
      |         END AS digit_ratio,
      |    CASE WHEN token_count = 0 THEN 0.0
      |         ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
      |                w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
      |         END AS stopword_ratio
      |  FROM f),
      |s AS (
      |  SELECT *,
      |    least(CAST(token_count AS DOUBLE) / 100.0, 1.0) * 0.4
      |      + (1.0 - digit_ratio) * 0.3
      |      + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score
      |  FROM g)
      |SELECT doc_id, CAST(token_count AS INTEGER) AS token_count,
      |  subword_count, avg_token_len, digit_ratio,
      |  stopword_ratio, quality_score,
      |  CASE WHEN token_count < 10 THEN 0
      |       WHEN avg_token_len > 12.0 THEN 0
      |       WHEN quality_score >= 0.5 THEN 1
      |       ELSE 0 END AS keep
      |FROM s""".stripMargin

  // ---------------------------------------------------------------------------
  // x55 — sub-document (chunk/paragraph) exact dedup: disjoint 32-token
  // blocks compete corpus-wide, first occurrence in (doc_id, chunk_index)
  // order survives, per-doc survivorship report (CCNet's paragraph-hash
  // dedup mapped to the marker-less fixture corpus). Every number is
  // integer except dup_chunk_frac — ONE IEEE division per row, replayed in
  // the same order by the oracle, so the gate compares bitwise.
  // ---------------------------------------------------------------------------
  def x55ChunkDedup(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.chunkDedup(Tables.documents(spark, dir), window = 32)

  private val x55Sql =
    """WITH c AS (
      |  SELECT doc_id, i AS chunk_index,
      |    len(list_slice(toks, i * 32 + 1, i * 32 + 32)) AS chunk_tokens,
      |    md5(array_to_string(list_slice(toks, i * 32 + 1, i * 32 + 32), ' ')) AS chunk_fp
      |  FROM (
      |    SELECT doc_id, toks, unnest(range(0, 1 + greatest((len(toks) - 32 + 31) // 32, 0))) AS i
      |    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |          FROM documents WHERE length(trim(text)) > 0))),
      |k AS (
      |  SELECT doc_id, chunk_tokens,
      |    CASE WHEN row_number() OVER (PARTITION BY chunk_fp ORDER BY doc_id, chunk_index) = 1
      |         THEN 1 ELSE 0 END AS kept
      |  FROM c)
      |SELECT doc_id, count(*) AS n_chunks,
      |  CAST(sum(kept) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN kept = 1 THEN chunk_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
      |  1.0 - CAST(sum(kept) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_chunk_frac
      |FROM k GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // x56 — tf-idf top-3 terms per doc with the smoothed log idf
  // (ln((N+1)/(df+1)) + 1) and the per-doc tf-idf L2 norm — the real
  // weighting behind x25's cheap salience. N rides a one-row broadcast
  // join; scores round to 6dp before the (tfidf desc, term asc) cut; the
  // norm sums 6dp-rounded squares as DECIMAL then takes one sqrt. ln on
  // identical doubles agrees across engines (the x37 BM25 precedent), so
  // the whole row compares bitwise.
  // ---------------------------------------------------------------------------
  def x56TfidfTerms(spark: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTopTerms(Tables.documents(spark, dir), k = 3)

  private val x56Sql =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
      |n AS (SELECT count(*) AS n_docs FROM d),
      |tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM d),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      |sc AS (
      |  SELECT doc_id, term, tf,
      |    count(*) OVER (PARTITION BY term) AS df,
      |    round(CAST(tf AS DOUBLE) *
      |      (ln((CAST((SELECT n_docs FROM n) AS DOUBLE) + 1.0)
      |         / (CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) + 1.0)) + 1.0), 6) AS tfidf
      |  FROM tf),
      |nm AS (
      |  SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(tfidf * tfidf, 6) AS DECIMAL(27,6))) AS DOUBLE)) AS doc_norm
      |  FROM sc GROUP BY 1),
      |r AS (
      |  SELECT doc_id, term, tf, df, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      |  FROM sc)
      |SELECT r.doc_id, r.term, r.tf, r.df, r.tfidf, nm.doc_norm,
      |  CAST(r.rnk AS INTEGER) AS rank
      |FROM r JOIN nm ON nm.doc_id = r.doc_id
      |WHERE r.rnk <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x57 — curriculum packing: docs ordered easy-first (quality_score desc,
  // doc_id asc — x20's exact score arithmetic), cut into 5000-token stages
  // by exclusive prefix sum. The engine runs the two-pass distributed scan
  // on the encoded long key round((1-q)*1e9)*1e7 + doc_id (no global
  // window); the oracle replays the identical key then uses the window
  // formulation — bitwise-equal integers either way.
  // ---------------------------------------------------------------------------
  private val curriculumBudget = 5000L

  def x57Curriculum(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.curriculumStages(
      Tables.documents(spark, dir),
      TextStats.qualityScore(Tables.documents(spark, dir))
        .select(col("doc_id"), col("quality_score")),
      budget = curriculumBudget)

  private val x57Sql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS token_count
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, token_count,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
       |         END AS digit_ratio,
       |    CASE WHEN token_count = 0 THEN 0.0
       |         ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
       |         END AS stopword_ratio
       |  FROM f),
       |s AS (
       |  SELECT doc_id, token_count,
       |    least(CAST(token_count AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (1.0 - digit_ratio) * 0.3
       |      + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score
       |  FROM g),
       |t AS (
       |  SELECT doc_id, token_count AS n_tokens,
       |    CAST(round((1.0 - quality_score) * 1000000.0) AS BIGINT) * 1000000000000
       |      + doc_id AS ckey
       |  FROM s),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY ckey
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM t)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum // $curriculumBudget AS BIGINT) AS stage_id,
       |  CAST(cum % $curriculumBudget AS BIGINT) AS stage_offset
       |FROM c""".stripMargin

  // ---------------------------------------------------------------------------
  // x58 — cosine-threshold graph degree per vector: how dense is each
  // vector's near-dup neighborhood at >= 0.4 (degree, strongest neighbor,
  // mean neighbor cosine; isolated vectors at degree 0 via the corpus
  // spine). Edges are x15's exact LSH pair set (same plane replay, same
  // rounding), so the oracle reuses x15's SQL verbatim as its edge CTE.
  // ---------------------------------------------------------------------------
  def x58GraphDegree(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineGraphDegree(Tables.embeddings(spark, dir), threshold = 0.4)

  // x15's CTE chain FLATTENED to top level rather than nested as
  // `p AS (WITH ...)`: the nested form made DuckDB materialize the whole
  // signature pipeline a second time and OOM at sf0.1; flat, the peak
  // matches x15's own oracle (which passes there).
  private lazy val x58Sql =
    s"""WITH $lshSigsCte,
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
       |p AS (
       |  SELECT vec_a, vec_b,
       |    round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                 CAST(eb.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM cand
       |  JOIN embeddings ea ON ea.vec_id = vec_a
       |  JOIN embeddings eb ON eb.vec_id = vec_b
       |  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
       |                                     CAST(eb.embedding AS DOUBLE[])), 6) >= 0.4),
       |sym AS (
       |  -- single reference to p (a double reference makes DuckDB
       |  -- materialize the whole LSH pipeline; at sf0.1 that was the OOM)
       |  SELECT unnest([vec_a, vec_b]) AS vec_id, cosine FROM p),
       |d AS (
       |  SELECT vec_id, count(*) AS degree, max(cosine) AS max_cosine,
       |    CAST(sum(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE) AS cs
       |  FROM sym GROUP BY 1)
       |SELECT e.vec_id, e.label,
       |  coalesce(d.degree, 0) AS degree,
       |  coalesce(d.max_cosine, 0.0) AS max_cosine,
       |  CASE WHEN d.degree IS NULL THEN 0.0
       |       ELSE d.cs / CAST(d.degree AS DOUBLE) END AS avg_cosine
       |FROM embeddings e LEFT JOIN d USING (vec_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x59 — MMR diversity re-ranking (Carbonell & Goldstein 1998): greedy
  // lambda-tradeoff selection of 5 from each query's brute top-12 pool —
  // relevance wants near-duplicates, diversity penalizes them by the max
  // cosine to the already-selected set. The oracle replays the greedy loop
  // with a recursive CTE carrying the selected-id array; every score is
  // 6dp-rounded before its argmax with ties to the smaller id, and the
  // lambda pair (0.7, 0.3) ships as two literals (1-0.7 is a DIFFERENT
  // double than 0.3), so each of the 5 picks compares bitwise.
  // ---------------------------------------------------------------------------
  def x59MmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 4),
      poolK = 12, k = 5, lambdaRel = 0.7, lambdaDiv = 0.3)
  }

  private val x59Sql =
    """WITH RECURSIVE
      |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS rel
      |  FROM q JOIN embeddings e ON q.vec_id <> e.vec_id),
      |pool AS (
      |  SELECT query_id, cand_id, rel FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY rel DESC, cand_id) AS rn FROM scored)
      |  WHERE rn <= 12),
      |pv AS (
      |  SELECT p.query_id, p.cand_id, p.rel, e.embedding
      |  FROM pool p JOIN embeddings e ON e.vec_id = p.cand_id),
      |pr AS (
      |  SELECT a.query_id, a.cand_id AS a, b.cand_id AS b,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                 CAST(b.embedding AS DOUBLE[])), 6) AS sim
      |  FROM pv a JOIN pv b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
      |sel AS (
      |  SELECT query_id, cand_id, rel, rel AS mmr_score, 1 AS rank,
      |    [cand_id] AS sel_ids
      |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |          ORDER BY rel DESC, cand_id) AS rn FROM pool)
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT s.query_id, pick.cand_id, pick.rel, pick.mmr_score, s.rank + 1,
      |    list_append(s.sel_ids, pick.cand_id)
      |  FROM sel s JOIN LATERAL (
      |    SELECT c.cand_id, c.rel,
      |      round(0.7 * c.rel - 0.3 * max(p.sim), 6) AS mmr_score
      |    FROM pool c JOIN pr p
      |      ON p.query_id = c.query_id AND p.a = c.cand_id
      |    WHERE c.query_id = s.query_id
      |      AND NOT list_contains(s.sel_ids, c.cand_id)
      |      AND list_contains(s.sel_ids, p.b)
      |    GROUP BY c.cand_id, c.rel
      |    ORDER BY mmr_score DESC, c.cand_id
      |    LIMIT 1) pick ON true
      |  WHERE s.rank < 5)
      |SELECT query_id, cand_id, rel, mmr_score, CAST(rank AS INTEGER) AS rank
      |FROM sel""".stripMargin

  // ---------------------------------------------------------------------------
  // x60 — tokenizer efficiency report: per-language compression of the REAL
  // BPE subword stream (pinned vocab, same greedy loop the x36 gate pins) —
  // chars-per-token and the merged-token rate, the two numbers a tokenizer
  // upgrade is judged by. All counts are integers off one narrow pass
  // (tokenize -> per-doc fold, no shuffle until the |langs|-group rollup);
  // the two ratios are single fixed-order IEEE divisions, so the gate
  // compares bitwise. The oracle re-derives the identical subword stream
  // through the recursive-CTE BPE replay.
  // ---------------------------------------------------------------------------
  def x60TokenizerStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("lang"), TextStats.bpeTokens(col("text")).as("sw"))
      .select(col("lang"),
        size(col("sw")).as("n_sw"),
        aggregate(col("sw"), lit(0), (a, t) => a + length(t)).as("n_chars"),
        size(filter(col("sw"), t => length(t) > 1)).as("n_multi"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_sw").cast("long")).as("subwords"),
        sum(col("n_chars").cast("long")).as("chars"),
        sum(col("n_multi").cast("long")).as("multi_subwords"))
      .withColumn("chars_per_token",
        col("chars").cast("double") / col("subwords").cast("double"))
      .withColumn("merge_rate",
        col("multi_subwords").cast("double") / col("subwords").cast("double"))

  private lazy val x60Sql =
    s"""$bpeCte
       |SELECT d.lang, count(*) AS docs,
       |  CAST(sum(len(s.sw)) AS BIGINT) AS subwords,
       |  CAST(sum(list_sum(list_transform(s.sw, t -> length(t)))) AS BIGINT) AS chars,
       |  CAST(sum(len(list_filter(s.sw, t -> length(t) > 1))) AS BIGINT) AS multi_subwords,
       |  CAST(sum(list_sum(list_transform(s.sw, t -> length(t)))) AS DOUBLE)
       |    / CAST(sum(len(s.sw)) AS DOUBLE) AS chars_per_token,
       |  CAST(sum(len(list_filter(s.sw, t -> length(t) > 1))) AS DOUBLE)
       |    / CAST(sum(len(s.sw)) AS DOUBLE) AS merge_rate
       |FROM dstream s JOIN documents d USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  // ---------------------------------------------------------------------------
  // x61 — nDCG@5 of the IVF probe against the brute ideal: the GRADED
  // companion to x44's set recall — a near-miss neighbor with almost the
  // ideal cosine scores nearly 1.0 where recall charges a full miss. Gain
  // is the (6dp-rounded) true cosine; each DCG term gain/ln(rank+1) is
  // rounded to 6dp and summed as DECIMAL (order-free, exact), and the
  // final nDCG is one division — bitwise on any engine. ln over log2 so
  // both engines use the libm ln already proven stable by the BM25 gate.
  // ---------------------------------------------------------------------------
  def x61NdcgIvf(spark: SparkSession, dir: String): DataFrame = {
    def dcg(df: DataFrame, out: String) = df
      .withColumn("term",
        round(round(col("cosine"), 6) / log(col("rank").cast("double") + lit(1.0)), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .groupBy("query_id").agg(sum(col("term")).cast("double").as(out))
    dcg(x8KnnBrute(spark, dir), "idcg")
      .join(dcg(x13KnnIvf(spark, dir), "dcg"), Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("dcg"), lit(0.0)).as("dcg"), col("idcg"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  private lazy val x61Sql =
    s"""WITH $ivfAssignCteAdaptive,
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS q_vec, centroid_id AS cluster_id
       |  FROM (
       |    SELECT e.vec_id, e.embedding, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
       |                 c.centroid_id ASC) AS rn
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 10)
       |  WHERE rn <= 4),
       |ivf_scored AS (
       |  SELECT DISTINCT p.query_id, a.neighbor_id,
       |    round(list_cosine_similarity(CAST(p.q_vec AS DOUBLE[]),
       |                                 CAST(a.c_vec AS DOUBLE[])), 6) AS cosine
       |  FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
       |  WHERE p.query_id <> a.neighbor_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM ivf_scored QUALIFY rank <= 5),
       |bq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
       |brute_scored AS (
       |  SELECT bq.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(CAST(bq.embedding AS DOUBLE[]),
       |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
       |  FROM bq JOIN embeddings e ON bq.vec_id <> e.vec_id),
       |brute AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM brute_scored QUALIFY rank <= 5),
       |d AS (
       |  SELECT query_id, CAST(sum(CAST(round(cosine / ln(rank + 1.0), 6)
       |    AS DECIMAL(18,6))) AS DOUBLE) AS dcg
       |  FROM ivf GROUP BY 1),
       |i AS (
       |  SELECT query_id, CAST(sum(CAST(round(cosine / ln(rank + 1.0), 6)
       |    AS DECIMAL(18,6))) AS DOUBLE) AS idcg
       |  FROM brute GROUP BY 1)
       |SELECT i.query_id, coalesce(d.dcg, 0.0) AS dcg, i.idcg,
       |  coalesce(d.dcg, 0.0) / i.idcg AS ndcg
       |FROM i LEFT JOIN d USING (query_id)""".stripMargin

  // ---------------------------------------------------------------------------
  // x62 — distribution-matched resampling: thin the corpus so its LENGTH
  // distribution matches the English slice's (importance ratio of exact
  // integer bucket counts, normalized by the max ratio, enforced by
  // md5-bucket membership — the DoReMi/DSIR idea on one observable
  // feature). The corpus never shuffles: two 20-row aggregations and a
  // broadcast rate table. All rates are fixed-order IEEE over integer
  // counts and the threshold is an integer, so every kept flag replays.
  // ---------------------------------------------------------------------------
  def x62LengthMatch(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.distributionMatch(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
        TextStats.tokenCount(col("text")).as("token_count")),
      bucketCol = least(expr("token_count div 10"), lit(19)).cast("int"),
      targetPred = col("lang") === "en",
      keyCol = concat(lit("lm:"), col("doc_id").cast("string")))
      .select(col("doc_id"), col("lang"), col("bucket"), col("n_corpus"),
        col("n_target"), col("keep_rate"), col("threshold"), col("kept"))

  private val x62Sql =
    """WITH f AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count
      |  FROM documents),
      |b AS (SELECT doc_id, lang,
      |        CAST(least(token_count // 10, 19) AS INTEGER) AS bucket FROM f),
      |c AS (
      |  SELECT bucket, count(*) AS n_corpus,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_target
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(sum(n_corpus) AS BIGINT) AS tot_corpus,
      |             CAST(sum(n_target) AS BIGINT) AS tot_target FROM c),
      |r AS (
      |  SELECT bucket, n_corpus, n_target,
      |    (CAST(n_target AS DOUBLE) / CAST(t.tot_target AS DOUBLE))
      |      / (CAST(n_corpus AS DOUBLE) / CAST(t.tot_corpus AS DOUBLE)) AS ratio
      |  FROM c, t),
      |m AS (SELECT max(ratio) AS max_ratio FROM r),
      |k AS (
      |  SELECT bucket, n_corpus, n_target,
      |    ratio / m.max_ratio AS keep_rate,
      |    CAST(round(ratio / m.max_ratio * 10000) AS INTEGER) AS threshold
      |  FROM r, m)
      |SELECT b.doc_id, b.lang, b.bucket, k.n_corpus, k.n_target,
      |  k.keep_rate, k.threshold,
      |  CASE WHEN CAST(md5_number_lower('lm:' || CAST(b.doc_id AS VARCHAR)) % 10000
      |            AS INTEGER) < k.threshold THEN 1 ELSE 0 END AS kept
      |FROM b JOIN k USING (bucket)""".stripMargin

  // ---------------------------------------------------------------------------
  // x63 — embedding drift monitor: per label, the cosine between the mean
  // vector of slice A (even vec_ids) and slice B (odd vec_ids) — the
  // production check for upstream embedding-model or source drift. Means
  // use x54's exact-decimal trick (6dp-rounded coords summed as DECIMAL,
  // one division, float32 cast); the final cosine runs in the compiled
  // kernel and rounds to 6dp, so the whole monitor replays bitwise.
  // ---------------------------------------------------------------------------
  def x63CentroidDrift(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidDrift(Tables.embeddings(spark, dir),
      slicePred = col("vec_id") % 2 === 1)

  private[queries] val x63Sql =
    """WITH e AS (
      |  SELECT label, CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END AS in_b, embedding
      |  FROM embeddings),
      |d AS (
      |  SELECT label, in_b, generate_subscripts(embedding, 1) AS j,
      |    unnest(embedding) AS x
      |  FROM e),
      |m AS (
      |  SELECT label, in_b, j,
      |    CAST(sum(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(27,6))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS mv
      |  FROM d GROUP BY 1, 2, 3),
      |v AS (
      |  SELECT label, in_b, list(CAST(mv AS FLOAT) ORDER BY j) AS mean_vec
      |  FROM m GROUP BY 1, 2),
      |c AS (
      |  SELECT label, count(*) AS n_total,
      |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM embeddings GROUP BY 1)
      |SELECT c.label, c.n_total, c.n_b,
      |  round(list_cosine_similarity(CAST(a.mean_vec AS DOUBLE[]),
      |                               CAST(b.mean_vec AS DOUBLE[])), 6) AS drift_cosine
      |FROM v a
      |JOIN v b ON a.label = b.label AND a.in_b = 0 AND b.in_b = 1
      |JOIN c ON c.label = a.label""".stripMargin

  // ---------------------------------------------------------------------------
  // x64 — seeded global training-order shuffle: deterministic pseudo-random
  // permutation of the corpus + shard assignment. The engine computes the
  // exact-integer 20-bit mixed hash, encodes (bucket, doc_id) into one long
  // key, and derives the global position with the two-pass distributed
  // prefix count (no single-partition window, no rand()); the oracle replays
  // the identical integer hash and uses the window formulation — bitwise-
  // equal integers either way.
  // ---------------------------------------------------------------------------
  private val shuffleSeed = 17L
  private val shuffleShard = 64L

  def x64SeededShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.seededShuffle(
      Tables.documents(spark, dir), seed = shuffleSeed, shardSize = shuffleShard)

  private[queries] val x64Sql =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    ((doc_id % 1048576 + $shuffleSeed) * 2654435761
       |      + (doc_id // 1048576) * 40503) % 1048576 AS shuffle_bucket
       |  FROM documents)
       |SELECT doc_id, shuffle_bucket,
       |  row_number() OVER (ORDER BY shuffle_bucket, doc_id) - 1 AS position,
       |  (row_number() OVER (ORDER BY shuffle_bucket, doc_id) - 1) // $shuffleShard
       |    AS shard_id
       |FROM k""".stripMargin

  // ---------------------------------------------------------------------------
  // x65 — PMI collocation mining: top-50 term pairs by document-level
  // pointwise mutual information over the distinct-terms-per-doc table
  // (df >= 5, co-occurrence >= 3). The engine broadcasts the frequent-term
  // table and self-joins on doc_id (co-partitioned, map-side combined);
  // the oracle replays the identical exact-integer arithmetic.
  // ---------------------------------------------------------------------------
  def x65PmiPairs(spark: SparkSession, dir: String): DataFrame =
    TextStats.pmiPairs(Tables.documents(spark, dir), minDf = 5, minPair = 3, k = 50)

  private[queries] val x65Sql =
    """WITH d AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
      |n AS (SELECT count(*) AS n_docs FROM d),
      |t AS (SELECT DISTINCT doc_id, term FROM (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM d)),
      |f AS (SELECT term, count(*) AS df FROM t GROUP BY 1 HAVING count(*) >= 5),
      |ft AS (SELECT t.doc_id, t.term, f.df FROM t JOIN f USING (term)),
      |p AS (
      |  SELECT a.term AS term_a, b.term AS term_b, count(*) AS co_docs,
      |    min(a.df) AS df_a, min(b.df) AS df_b
      |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.term < b.term
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT term_a, term_b, co_docs, df_a, df_b,
      |  round(ln(CAST(co_docs AS DOUBLE) * CAST((SELECT n_docs FROM n) AS DOUBLE)
      |    / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE))), 6) AS pmi
      |FROM p
      |ORDER BY pmi DESC, term_a, term_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------------
  // x66 — Z-order layout audit: events mapped onto a 256x256 (user, minute)
  // grid, Morton-interleaved, cut into 64 fixed-width z-ranges (= aligned
  // 32x32 rectangles). Per range: row count + the (u, m) bounding box — the
  // stats a parquet row group written in this order would carry, i.e. the
  // pruning power a predicate on EITHER dimension gets. The interleave is a
  // pure integer Catalyst expression; the oracle replays it from the same
  // generated SQL (Layout.zValueSql).
  // ---------------------------------------------------------------------------
  def x66ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val minute = floor((unix_timestamp(col("ts").cast("timestamp")) - lit(1704067200L))
      / lit(60)).cast("long")
    val cells = ev.select(
      (col("user_id") % 256L).as("uc"),
      graft.ext.Layout.gridCell(minute, cap = 44639L, bits = 8).as("mc"))
    cells
      .withColumn("zval", graft.ext.Layout.zValue(col("uc"), col("mc"), bits = 8))
      .groupBy(expr("zval div 1024").as("z_bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("uc")).as("min_u"), max(col("uc")).as("max_u"),
        min(col("mc")).as("min_m"), max(col("mc")).as("max_m"))
  }

  private[queries] val x66Sql = {
    val z = graft.ext.Layout.zValueSql("uc", "mc", bits = 8)
    s"""WITH e AS (
       |  SELECT user_id % 256 AS uc,
       |    least((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) // 60, 44639)
       |      * 256 // 44640 AS mc
       |  FROM events),
       |z AS (SELECT uc, mc, ($z) AS zval FROM e)
       |SELECT zval // 1024 AS z_bucket, count(*) AS n_events,
       |  min(uc) AS min_u, max(uc) AS max_u, min(mc) AS min_m, max(mc) AS max_m
       |FROM z GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // x67 — prefix-filtered EXACT Jaccard join (SSJoin/PPJoin family): the
  // scalable plan for x2's semantics. Candidates come only from each doc's
  // rarest (df asc, shingle asc) prefix of length n - ceil(t*n) + 1 —
  // provably complete by the pigeonhole bound — then exact array-intersect
  // verification. Same oracle as x2: the results must be identical; only
  // the plan differs (no all-shingle self-join, hot shingles drop out of
  // prefixes first).
  // ---------------------------------------------------------------------------
  def x67PpjoinPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairsPrefix(Tables.documents(spark, dir), jaccardThreshold)

  // ---------------------------------------------------------------------------
  // x68 — single-scan column profiler over lineitem (ANALYZE-style): null
  // count, exact distinct count, canonical min/max per column, long format.
  // One Expand+aggregate pipeline for all columns (constant shuffles in the
  // column count); numeric extremes canonicalized through DECIMAL(27,6) so
  // the stringified profile is engine-portable. Oracle: per-column UNION ALL.
  // ---------------------------------------------------------------------------
  private val profileCols =
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")

  def x68ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.profile(Tables.lineitem(spark, dir), profileCols)

  private[queries] val x68Sql = {
    val numeric = Set("l_orderkey", "l_linenumber", "l_quantity")
    profileCols.map { c =>
      val mn =
        if (numeric(c)) s"CAST(CAST(min($c) AS DECIMAL(27,6)) AS VARCHAR)"
        else s"CAST(min($c) AS VARCHAR)"
      val mx =
        if (numeric(c)) s"CAST(CAST(max($c) AS DECIMAL(27,6)) AS VARCHAR)"
        else s"CAST(max($c) AS VARCHAR)"
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct, $mn AS min_value, $mx AS max_value
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------------------
  // x69 — next-event training pairs: per-user event streams become
  // (3-event context, next event) supervised examples — the behavioral-LM
  // data-prep stage. One shuffle on user_id; all lags share one Window sort.
  // ---------------------------------------------------------------------------
  def x69NextEventPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Sequences.nextTokenPairs(
      Tables.events(spark, dir),
      keyCol = col("user_id"),
      orderCols = Seq(col("ts"), col("event_id")),
      tokenCol = col("event_type"),
      ctx = 3,
      keep = Seq(col("user_id"), col("event_id")))

  private[queries] val x69Sql =
    """WITH s AS (
      |  SELECT user_id, event_id, event_type,
      |    lag(event_type, 3) OVER w AS context_1,
      |    lag(event_type, 2) OVER w AS context_2,
      |    lag(event_type, 1) OVER w AS context_3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id, context_1, context_2, context_3,
      |  event_type AS target
      |FROM s WHERE context_1 IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------------------
  // x70 — weighted PageRank (3 damped power iterations) over the event-type
  // transition graph. Edge extraction is the distributed-heavy stage (one
  // window pass + groupBy over all events); each iteration is the generic
  // two-shuffle Pregel-by-joins step, size-independent of the node count.
  // Per-edge contributions round to 6dp and sum as DECIMAL(27,6), so the
  // oracle's unrolled CTEs replay every float op bitwise.
  // ---------------------------------------------------------------------------
  private val prIters = 3
  private val prDamping = 0.85

  def x70PageRank(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val edges = Tables.events(spark, dir)
      .select(col("event_type"), lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("weight"))
    Cluster.pageRank(edges, iters = prIters, damping = prDamping)
  }

  private[queries] val x70Sql = {
    val d = s"CAST($prDamping AS DOUBLE)"
    val n = "CAST((SELECT n FROM cnt) AS DOUBLE)"
    def iter(k: Int): String =
      s"""r$k AS (
         |  SELECT nd.node,
         |    round((1.0 - $d) / $n + $d * coalesce(CAST(s.in_rank AS DOUBLE), 0.0), 6) AS rank
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum(CAST(round(r.rank * e.w / ow.out_w, 6) AS DECIMAL(27,6))) AS in_rank
         |    FROM e JOIN ow ON ow.src = e.src JOIN r${k - 1} r ON r.node = e.src
         |    GROUP BY 1) s ON s.node = nd.node)"""
    s"""WITH tr AS (
       |  SELECT event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |e AS (SELECT prev AS src, event_type AS dst, CAST(count(*) AS DOUBLE) AS w
       |      FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
       |nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |cnt AS (SELECT count(*) AS n FROM nd),
       |ow AS (SELECT src, sum(w) AS out_w FROM e GROUP BY 1),
       |r0 AS (SELECT node, round(1.0 / $n, 6) AS rank FROM nd),
       |${(1 to prIters).map(iter).mkString(",\n")}
       |SELECT node, rank FROM r$prIters""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // x71 — time-decayed activity leaderboard: per-user sum of value weighted
  // by 2^(-age_days), top 20. NO per-contribution float rounding (a
  // round(x,6)-per-row variant disagreed with the oracle on 3/60k boundary
  // rows — Spark rounds the exact binary value, DuckDB rounds a scaled
  // product): instead each 2dp amount is scaled by the exact integer
  // 2^(62-age) and summed as DECIMAL — fully exact — then ONE double cast
  // and ONE exact power-of-two division produce the score. Global cut is
  // TakeOrderedAndProject.
  // ---------------------------------------------------------------------------
  def x71DecayedActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val secs = unix_timestamp(col("ts").cast("timestamp"))
    val tmax = ev.agg(max(secs).as("tmax"))
    ev.select(col("user_id"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("amt"),
        secs.as("es"))
      .crossJoin(broadcast(tmax))
      .withColumn("age_days", least(expr("(tmax - es) div 86400"), lit(62L)))
      .withColumn("shift", expr("shiftleft(cast(1 as bigint), cast(62 - age_days as int))"))
      .groupBy("user_id")
      .agg(sum(col("amt") * col("shift")).as("scaled"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"),
        (col("scaled").cast("double") / lit(4611686018427387904.0)).as("decayed_score"),
        col("n_events"))
      .orderBy(col("decayed_score").desc, col("user_id"))
      .limit(20)
  }

  private[queries] val x71Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(value AS DECIMAL(12,2)) AS amt,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      |t AS (SELECT max(es) AS tmax FROM e),
      |d AS (
      |  SELECT user_id, amt,
      |    least(((SELECT tmax FROM t) - es) // 86400, 62) AS age_days
      |  FROM e)
      |SELECT user_id,
      |  CAST(sum(amt * (CAST(1 AS BIGINT) << (62 - age_days))) AS DOUBLE)
      |    / CAST(4611686018427387904 AS DOUBLE) AS decayed_score,
      |  count(*) AS n_events
      |FROM d GROUP BY 1
      |ORDER BY decayed_score DESC, user_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------------
  // x72 — rendezvous-sharding movement audit: HRW placement of documents at
  // 8 shards vs 9, aggregated into the (old_shard, new_shard) movement
  // matrix. The HRW invariant — a key either stays or moves to the NEW
  // shard, expected movement 1/(S+1) — is what makes growing a 100 TB
  // corpus cost one shard of movement, not a full mod-hash reshuffle.
  // ---------------------------------------------------------------------------
  def x72RendezvousShards(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Sharding.movementMatrix(
      Tables.documents(spark, dir), col("doc_id"), fromShards = 8, toShards = 9)

  private[queries] val x72Sql = {
    def assign(s: Int) =
      s"""SELECT doc_id, shard FROM (
         |    SELECT doc_id, shard,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn
         |    FROM (
         |      SELECT d.doc_id, s.shard,
         |        CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR) || ':'
         |          || CAST(s.shard AS VARCHAR)) >> 1 AS BIGINT) AS h
         |      FROM documents d, (SELECT unnest(range($s)) AS shard) s))
         |  WHERE rn = 1"""
    s"""WITH a8 AS (
       |  ${assign(8)}),
       |a9 AS (
       |  ${assign(9)})
       |SELECT a8.shard AS old_shard, a9.shard AS new_shard, count(*) AS docs
       |FROM a8 JOIN a9 USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // x73 — PCA top principal component of the embedding corpus by power
  // iteration. The covariance matrix is ONE distributed pass (d^2 cells,
  // map-side combined); each iteration then joins the 64x64 matrix —
  // corpus-size-independent. All float reductions are 6dp-round +
  // DECIMAL-sum; v0 = 1/64 is exact; sign pinned by the all-positive start.
  // ---------------------------------------------------------------------------
  private val pcaIters = 3

  def x73PcaComponent(spark: SparkSession, dir: String): DataFrame =
    Similarity.pcaTopComponent(Tables.embeddings(spark, dir), iters = pcaIters)

  private[queries] val x73Sql = {
    val nD = "CAST((SELECT n FROM nn) AS DOUBLE)"
    def iter(k: Int): String =
      s"""w$k AS (
         |  SELECT cov.j,
         |    round(CAST(sum(CAST(round(c * v.v, 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS w
         |  FROM cov JOIN v${k - 1} v ON v.j = cov.k GROUP BY 1),
         |nm$k AS (
         |  SELECT sqrt(CAST(sum(CAST(round(w * w, 12) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
         |  FROM w$k),
         |v$k AS (SELECT j, round(w / (SELECT nrm FROM nm$k), 6) AS v FROM w$k)"""
    s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
       |c1 AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
       |    CAST(unnest(embedding) AS DOUBLE) AS xj
       |  FROM embeddings),
       |m AS (
       |  SELECT j, CAST(sum(CAST(round(xj, 12) AS DECIMAL(38,12))) AS DOUBLE) / $nD AS m
       |  FROM c1 GROUP BY 1),
       |s AS (
       |  SELECT a.j AS j, b.j AS k,
       |    sum(CAST(round(a.xj * b.xj, 12) AS DECIMAL(38,12))) AS sxx
       |  FROM c1 a JOIN c1 b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |cov AS (
       |  SELECT s.j, s.k,
       |    round(CAST(sxx AS DOUBLE) / $nD - mj.m * mk.m, 12) AS c
       |  FROM s JOIN m mj ON mj.j = s.j JOIN m mk ON mk.j = s.k),
       |v0 AS (SELECT DISTINCT j, CAST(0.015625 AS DOUBLE) AS v FROM cov),
       |${(1 to pcaIters).map(iter).mkString(",\n")}
       |SELECT v$pcaIters.j, v$pcaIters.v AS loading,
       |  round((SELECT nrm FROM nm$pcaIters), 6) AS eigenvalue
       |FROM v$pcaIters""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // x74 — Johnson-Lindenstrauss random projection 64 -> 16 dims with the
  // md5-parity Rademacher matrix (data-independent, plan-literal, oracle-
  // rebuildable). 6dp-rounded signed coordinates DECIMAL-sum exactly;
  // k = 16 makes 1/sqrt(k) = 0.25 an exact dyadic scale — no float
  // rounding anywhere in the projection.
  // ---------------------------------------------------------------------------
  def x74RandomProjection(spark: SparkSession, dir: String): DataFrame =
    Similarity.randomProject(Tables.embeddings(spark, dir), k = 16)
      .select(col("vec_id"), col("out_dim").cast("long").as("out_dim"), col("y"))

  private[queries] val x74Sql =
    """WITH sg AS (
      |  SELECT o.out_dim, i.i,
      |    CASE WHEN md5_number_lower(CAST(o.out_dim AS VARCHAR) || ':'
      |           || CAST(i.i AS VARCHAR)) % 2 = 0 THEN 1 ELSE -1 END AS s
      |  FROM (SELECT unnest(range(16)) AS out_dim) o,
      |       (SELECT unnest(range(64)) AS i) i),
      |c AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings)
      |SELECT c.vec_id, sg.out_dim,
      |  CAST(sum(CAST(sg.s * round(c.x, 6) AS DECIMAL(38,6))) AS DOUBLE)
      |    * CAST(0.25 AS DOUBLE) AS y
      |FROM c JOIN sg ON sg.i = c.i
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------------
  // x75 — snapshot diff: reconcile the corpus against a simulated next
  // release (docs with id%13==3 dropped, id%11==5 rewritten, id%17==2
  // duplicated in under new ids). One fingerprint-only full-outer join on
  // doc_id + a 4-group count — corpus bodies are never moved twice.
  // ---------------------------------------------------------------------------
  def x75SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir)
    val v2 = v1.filter(col("doc_id") % 13 =!= 3)
      .withColumn("text",
        when(col("doc_id") % 11 === 5, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") % 17 === 2)
        .withColumn("doc_id", col("doc_id") + lit(100000000L)))
    graft.ext.Corpus.snapshotDiff(v1, v2, "doc_id", md5(col("text")))
  }

  private[queries] val x75Sql =
    """WITH v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 5 THEN text || ' [rev2]' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 != 3
      |  UNION ALL
      |  SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 17 = 2),
      |j AS (
      |  SELECT
      |    CASE WHEN a.doc_id IS NULL THEN 'added'
      |         WHEN b.doc_id IS NULL THEN 'removed'
      |         WHEN md5(a.text) != md5(b.text) THEN 'changed'
      |         ELSE 'unchanged' END AS change_type
      |  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
      |SELECT change_type, count(*) AS n_docs FROM j GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x76 — recall@5 of brute-force ANN over the x74 JL projections vs the
  // exact 64-dim top-5 (x8): the measured answer to "how much ranking
  // quality does 4x dimension compression cost?". The approx leg searches
  // 16-dim vectors (4x cheaper dot products + memory); both legs round to
  // 6dp before their rank cuts (x8's cross-engine-stable-ordering trick).
  // ---------------------------------------------------------------------------
  def x76ProjectedRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val proj = Similarity.randomProjectVectors(Tables.embeddings(spark, dir), k = 16)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val approx = Similarity.cosineScores(proj, proj.filter(col("vec_id") < 10))
      .withColumn("cosine", round(col("cosine"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    Similarity.recallAtK(x8KnnBrute(spark, dir), approx, k = 5)
  }

  private[queries] val x76Sql =
    s"""WITH sg AS (
      |  SELECT o.out_dim, i.i,
      |    CASE WHEN md5_number_lower(CAST(o.out_dim AS VARCHAR) || ':'
      |           || CAST(i.i AS VARCHAR)) % 2 = 0 THEN 1 ELSE -1 END AS s
      |  FROM (SELECT unnest(range(16)) AS out_dim) o,
      |       (SELECT unnest(range(64)) AS i) i),
      |co AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |py AS (
      |  SELECT co.vec_id, sg.out_dim,
      |    CAST(sum(CAST(sg.s * round(co.x, 6) AS DECIMAL(38,6))) AS DOUBLE)
      |      * CAST(0.25 AS DOUBLE) AS y
      |  FROM co JOIN sg ON sg.i = co.i GROUP BY 1, 2),
      |prj AS (
      |  SELECT vec_id, list(CAST(y AS FLOAT) ORDER BY out_dim) AS embedding
      |  FROM py GROUP BY 1),
      |ascored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM (SELECT * FROM prj WHERE vec_id < 10) q
      |  JOIN prj e ON q.vec_id <> e.vec_id),
      |approx AS (
      |  SELECT query_id, neighbor_id FROM ascored
      |  QUALIFY row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id ASC) <= 5),
      |qx AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |escored AS (
      |  SELECT qx.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(qx.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM qx JOIN embeddings e ON qx.vec_id <> e.vec_id),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM escored
      |  QUALIFY row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id ASC) <= 5)
      |SELECT x.query_id,
      |  CAST(count(a.neighbor_id) AS BIGINT) AS hits,
      |  CAST(count(a.neighbor_id) AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM exact x
      |LEFT JOIN approx a
      |  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x77 — multi-vector max-sim retrieval (late-interaction pooling): each
  // label is a multi-vector "document"; score(query, label) = max cosine
  // over the label's vectors, top-3 labels per query. The per-(query,
  // label) max is map-side combinable — the shuffle carries one row per
  // (query, label), never the vectors.
  // ---------------------------------------------------------------------------
  def x77MaxsimRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, dir)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("label").asc)
    Similarity.cosineScores(emb, emb.filter(col("vec_id") < 5))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .groupBy(col("query_id"), col("label"))
      .agg(max(round(col("cosine"), 6)).as("maxsim"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
  }

  private[queries] val x77Sql =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.label,
      |    max(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                     CAST(e.embedding AS DOUBLE[])), 6)) AS maxsim
      |  FROM q JOIN embeddings e ON q.vec_id <> e.vec_id
      |  GROUP BY 1, 2)
      |SELECT query_id, label, maxsim,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY maxsim DESC, label ASC) AS INTEGER) AS rank
      |FROM scored
      |QUALIFY rank <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x78 — curation filter kill-matrix: the corpus grouped by every
  // combination of four independent quality-filter verdicts (length, token
  // shape, digit load, stopword floor) with doc and token mass per cell.
  // This is how a pipeline diagnoses filter OVERLAP before adding one —
  // a filter whose kills are a subset of another's is free to drop. One
  // narrow feature pass + one 16-cell aggregate; nothing shuffles but the
  // 4-bit key.
  // ---------------------------------------------------------------------------
  def x78FilterMatrix(spark: SparkSession, dir: String): DataFrame =
    TextStats.qualityFeatures(Tables.documents(spark, dir))
      .select(
        when(col("token_count") >= 10, 1).otherwise(0).as("len_ok"),
        when(col("avg_token_len") <= 12.0, 1).otherwise(0).as("shape_ok"),
        when(col("digit_ratio") <= 0.2, 1).otherwise(0).as("digit_ok"),
        when(col("stopword_ratio") >= 0.02, 1).otherwise(0).as("stop_ok"),
        col("token_count"))
      .groupBy("len_ok", "shape_ok", "digit_ok", "stop_ok")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_count").cast("long")).as("n_tokens"))

  private[queries] val x78Sql =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, token_count,
      |    CASE WHEN token_count = 0 THEN 0.0
      |         ELSE length(regexp_replace(trim(text), '\s+', '', 'g')) * 1.0 / token_count
      |         END AS avg_token_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
      |         END AS digit_ratio,
      |    CASE WHEN token_count = 0 THEN 0.0
      |         ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
      |                w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
      |         END AS stopword_ratio
      |  FROM f)
      |SELECT
      |  CASE WHEN token_count >= 10 THEN 1 ELSE 0 END AS len_ok,
      |  CASE WHEN avg_token_len <= CAST(12.0 AS DOUBLE) THEN 1 ELSE 0 END AS shape_ok,
      |  CASE WHEN digit_ratio <= CAST(0.2 AS DOUBLE) THEN 1 ELSE 0 END AS digit_ok,
      |  CASE WHEN stopword_ratio >= CAST(0.02 AS DOUBLE) THEN 1 ELSE 0 END AS stop_ok,
      |  count(*) AS n_docs,
      |  CAST(sum(token_count) AS BIGINT) AS n_tokens
      |FROM g GROUP BY 1, 2, 3, 4""".stripMargin

  // ---------------------------------------------------------------------------
  // x79 — per-document triangle counts over the near-dup graph: pairs alone
  // can be LSH fringe; a pair inside a triangle is corroborated by a third
  // document (the transitivity audit run before trusting cluster-level
  // keep/drop decisions). Edges come from the collapsed MinHash scale path
  // (bitwise equal to the exact pair set); counting is the degree-ordered
  // node-iterator in Cluster.triangleCounts — wedge fan-out bounded at the
  // lowest-degree corner, so a hub-heavy dup graph can't explode one key.
  // The oracle enumerates each id-ordered triangle once from the exact
  // pair CTE and unnests its three corners: the triangle SET is
  // orientation-invariant, so both plans count identical corners.
  // ---------------------------------------------------------------------------
  def x79Triangles(spark: SparkSession, dir: String): DataFrame =
    Cluster.triangleCounts(
      Dedup.nearDupMinhashCollapsed(Tables.documents(spark, dir), jaccardThreshold))

  private[queries] val x79Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh WHERE len(shset) > 0),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shset) AS n FROM sh),
       |e AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pr
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= $jaccardThreshold),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
       |SELECT node, count(*) AS n_triangles FROM (
       |  SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri
       |  UNION ALL SELECT z FROM tri)
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x80 — vocabulary frequency spectrum + Good-Turing adjusted counts: the
  // frequency-of-frequencies table S(f) with gt_freq = (f+1)*S(f+1)/S(f).
  // S(1)/N is the unseen-token mass — the number a tokenizer-vocab cut or
  // LM-coverage decision consumes. Spectrum keys are DISTINCT frequencies
  // (O(sqrt(tokens)) of them), so everything after the one standard
  // term-shuffle is vanishingly small at any corpus size.
  // ---------------------------------------------------------------------------
  def x80VocabSpectrum(spark: SparkSession, dir: String): DataFrame =
    TextStats.vocabularySpectrum(Tables.documents(spark, dir))

  private[queries] val x80Sql =
    """WITH t AS (
      |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
      |f AS (SELECT term, count(*) AS n FROM t GROUP BY 1),
      |s AS (SELECT n AS freq, count(*) AS n_types FROM f GROUP BY 1)
      |SELECT s.freq, s.n_types,
      |  CAST((s.freq + 1) * s2.n_types AS DOUBLE) / CAST(s.n_types AS DOUBLE)
      |    AS gt_freq
      |FROM s LEFT JOIN s s2 ON s2.freq = s.freq + 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x81 — source-vs-corpus PSI drift audit: Population Stability Index of
  // the token-count distribution per source against the whole corpus, over
  // log2 length bands (bit-length buckets — exact integer arithmetic).
  // The gate a mixture planner runs before admitting a new crawl source.
  // One doc-level pass; the bucket table is O(|sources| * log max_len).
  // ---------------------------------------------------------------------------
  def x81PsiDrift(spark: SparkSession, dir: String): DataFrame =
    Corpus.psiBySource(Tables.documents(spark, dir))

  private[queries] val x81Sql =
    """WITH f AS (
      |  SELECT source,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tc
      |  FROM documents),
      |b AS (SELECT source, length(bin(CAST(tc AS BIGINT))) AS bucket FROM f),
      |sb AS (SELECT source, bucket, count(*) AS c_sb FROM b GROUP BY 1, 2),
      |s AS (SELECT source, sum(c_sb) AS c_s FROM sb GROUP BY 1),
      |bb AS (SELECT bucket, sum(c_sb) AS c_b FROM sb GROUP BY 1),
      |t AS (SELECT sum(c_sb) AS c FROM sb),
      |terms AS (
      |  SELECT sb.source,
      |    round((CAST(c_sb AS DOUBLE) / CAST(c_s AS DOUBLE)
      |           - CAST(c_b AS DOUBLE) / CAST(c AS DOUBLE))
      |      * ln((CAST(c_sb AS DOUBLE) / CAST(c_s AS DOUBLE))
      |            / (CAST(c_b AS DOUBLE) / CAST(c AS DOUBLE))), 6) AS term
      |  FROM sb JOIN s USING (source) JOIN bb USING (bucket) CROSS JOIN t)
      |SELECT source, count(*) AS n_bins,
      |  CAST(sum(CAST(term AS DECIMAL(27,6))) AS DOUBLE) AS psi
      |FROM terms GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x82 — cross-source quantile calibration of quality scores: each
  // source's 6dp score levels mapped to the corpus score at the same
  // midpoint-rank quantile (quantile normalization), so a generously
  // self-graded source stops flooding a single global quality cut.
  // Histogram-level only — the inverse-CDF lookup is a per-source
  // descending sweep over (source levels + replicated corpus levels),
  // never a per-doc join; a hot source costs its distinct-level count,
  // not its row count. The oracle replays the identical midpoint-rank
  // arithmetic and running-min sweep.
  // ---------------------------------------------------------------------------
  def x82QuantileCalib(spark: SparkSession, dir: String): DataFrame =
    Corpus.quantileCalibrate(
      TextStats.qualityScore(Tables.documents(spark, dir))
        .select(col("source"), col("quality_score")))

  private[queries] val x82Sql =
    """WITH f AS (
      |  SELECT doc_id, source, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS token_count
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source, token_count,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text)
      |         END AS digit_ratio,
      |    CASE WHEN token_count = 0 THEN 0.0
      |         ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
      |                w -> w IN ('the','a','and','of','to','in'))) * 1.0 / token_count
      |         END AS stopword_ratio
      |  FROM f),
      |q AS (
      |  SELECT source,
      |    round(least(CAST(token_count AS DOUBLE) / 100.0, 1.0) * 0.4
      |      + (1.0 - digit_ratio) * 0.3
      |      + least(stopword_ratio * 5.0, 1.0) * 0.3, 6) AS qk
      |  FROM g),
      |sh AS (SELECT source, qk, count(*) AS c_s FROM q GROUP BY 1, 2),
      |sn AS (SELECT source, sum(c_s) AS n_s FROM sh GROUP BY 1),
      |sp AS (
      |  SELECT sh.source, qk, c_s,
      |    CAST(2 * (sum(c_s) OVER (PARTITION BY sh.source ORDER BY qk) - c_s)
      |         + c_s AS DOUBLE) / CAST(2 * n_s AS DOUBLE) AS p,
      |    0 AS tag, CAST(NULL AS DOUBLE) AS qc
      |  FROM sh JOIN sn USING (source)),
      |ch AS (SELECT qk, sum(c_s) AS c FROM sh GROUP BY 1),
      |cn AS (SELECT sum(c) AS n FROM ch),
      |cp AS (
      |  SELECT qk AS qc,
      |    CAST(sum(c) OVER (ORDER BY qk) AS DOUBLE)
      |      / CAST((SELECT n FROM cn) AS DOUBLE) AS p
      |  FROM ch),
      |u AS (
      |  SELECT source, qk, c_s, p, tag, qc FROM sp
      |  UNION ALL
      |  SELECT s.source, CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), cp.p, 1, cp.qc
      |  FROM cp CROSS JOIN (SELECT DISTINCT source FROM sh) s),
      |m AS (
      |  SELECT source, qk, c_s, tag,
      |    min(qc) OVER (PARTITION BY source ORDER BY p DESC, tag DESC
      |      ROWS UNBOUNDED PRECEDING) AS calib
      |  FROM u)
      |SELECT source, qk AS quality_q, CAST(c_s AS BIGINT) AS n_docs,
      |  calib AS corpus_q
      |FROM m WHERE tag = 0""".stripMargin

  // ---------------------------------------------------------------------------
  // x83 — dedup threshold sweep (cost curve): near-dup pair mass, dominated
  // docs, and dominated token mass at jaccard thresholds {0.7, 0.8, 0.9}
  // from ONE pair pass at the loosest threshold — how a pipeline prices a
  // threshold change before committing to a re-dedup of the whole corpus.
  // "Dominated" = appears as the larger id of at least one pair at that
  // threshold (the upper bound on removable mass; exact removal needs the
  // per-threshold cluster pass the curve is deciding whether to pay).
  // The pair set is the prefix-filtered exact-pair computation (PPJoin,
  // x67's scale path — bitwise-equal to the x2 all-shingles self-join but
  // only explodes each doc's rare prefix) at 0.7; thresholds fan out as a
  // 3-row explode over the pair table, never a re-scan.
  // ---------------------------------------------------------------------------
  private val sweepThresholds = Seq(0.7, 0.8, 0.9)

  def x83DedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.jaccardPairsPrefix(docs, sweepThresholds.min)
    val toks = docs.select(col("doc_id"),
      TextStats.tokenCount(col("text")).cast("long").as("tc"))
    val pt = pairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(array(sweepThresholds.map(lit): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
      .localCheckpoint()
    val nPairs = pt.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val dominated = pt.select(col("threshold"), col("doc_b")).distinct()
      .join(toks, col("doc_b") === col("doc_id"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_dominated_docs"),
        sum(col("tc")).as("dominated_tokens"))
    nPairs.join(dominated, "threshold")
  }

  private[queries] val x83Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh WHERE len(shset) > 0),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shset) AS n FROM sh),
       |j AS (
       |  SELECT doc_a, doc_b, inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
       |  FROM pr
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE inter * 1.0 / (sa.n + sb.n - inter) >= CAST(0.7 AS DOUBLE)),
       |tk AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS tc
       |  FROM documents),
       |t AS (SELECT unnest([CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE),
       |                     CAST(0.9 AS DOUBLE)]) AS threshold),
       |pt AS (
       |  SELECT threshold, doc_a, doc_b
       |  FROM j CROSS JOIN t WHERE jaccard >= threshold),
       |np AS (SELECT threshold, count(*) AS n_pairs FROM pt GROUP BY 1),
       |d AS (SELECT DISTINCT threshold, doc_b FROM pt),
       |dm AS (
       |  SELECT threshold, count(*) AS n_dominated_docs,
       |    CAST(sum(tc) AS BIGINT) AS dominated_tokens
       |  FROM d JOIN tk ON d.doc_b = tk.doc_id GROUP BY 1)
       |SELECT np.threshold, n_pairs, n_dominated_docs, dominated_tokens
       |FROM np JOIN dm USING (threshold)""".stripMargin

  // ---------------------------------------------------------------------------
  // x84 — Count-Min-sketch heavy hitters: every term whose CMS estimate
  // (min over 4 md5 hash rows of 64 counters) reaches 1% of total token
  // occurrences, with the exact count alongside — the sketch-vs-truth audit.
  // The counter table is depth*width rows REGARDLESS of corpus size, built
  // map-side-combinable and broadcast for the probe; the only corpus-sized
  // shuffle is the exact count the audit itself demands. Counters and
  // estimates are pure integer addition/min over md5-low-64 unsigned-mod
  // buckets — the oracle replays every counter bitwise.
  // ---------------------------------------------------------------------------
  private val cmsDepth = 4
  private val cmsWidth = 64

  def x84CmsHeavy(spark: SparkSession, dir: String): DataFrame =
    Sketch.cmsHeavyHitters(
      Tables.documents(spark, dir)
        .filter(trim(col("text")) =!= "")
        .select(explode(split(trim(col("text")), " ")).as("term")),
      col("term"), depth = cmsDepth, width = cmsWidth, thresholdDenom = 100)

  private[queries] val x84Sql =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS term
       |  FROM documents WHERE trim(text) <> ''),
       |cnt AS (SELECT term, count(*) AS exact_cnt FROM tok GROUP BY 1),
       |tot AS (SELECT count(*) AS total FROM tok),
       |bk AS (
       |  SELECT term, j,
       |    CAST(md5_number_lower('cms' || CAST(j AS VARCHAR) || ':' || term)
       |         % $cmsWidth AS INTEGER) AS bucket
       |  FROM cnt CROSS JOIN (SELECT unnest(range($cmsDepth)) AS j) js),
       |ctr AS (
       |  SELECT j, bucket, CAST(sum(c.exact_cnt) AS BIGINT) AS cnt
       |  FROM bk JOIN cnt c USING (term) GROUP BY 1, 2),
       |est AS (
       |  SELECT bk.term, min(ctr.cnt) AS cms_est
       |  FROM bk JOIN ctr USING (j, bucket) GROUP BY 1)
       |SELECT c.term, e.cms_est, c.exact_cnt
       |FROM cnt c JOIN est e USING (term) CROSS JOIN tot
       |WHERE e.cms_est >= tot.total // 100""".stripMargin

  // ---------------------------------------------------------------------------
  // x85 — sorted-neighborhood near-dup pairs (merge/purge blocking): global
  // prefix-sort-key rank via the distributed two-pass prefix scan (the
  // textbook single-partition ORDER BY window is exactly what dies at
  // 100 TB), candidates = rank distance <= 5 as an equi-join on rank+d,
  // exact shingle-Jaccard verification per candidate. Finds the prefix-
  // adjacent subset of x2's pairs at O(n * window) cost — the blocking
  // regime LSH doesn't cover (version chains, boilerplate families).
  // ---------------------------------------------------------------------------
  def x85SortedNeighborhood(spark: SparkSession, dir: String): DataFrame =
    Dedup.sortedNeighborhoodPairs(Tables.documents(spark, dir),
      window = 5, threshold = jaccardThreshold)

  private[queries] val x85Sql =
    s"""WITH d AS (
       |  SELECT doc_id, text, substr(trim(text), 1, 32) AS skey FROM documents),
       |r AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) - 1 AS rnk
       |  FROM d),
       |sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |cand AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib
       |  FROM r a JOIN r b ON b.rnk >= a.rnk + 1 AND b.rnk <= a.rnk + 5),
       |p AS (SELECT least(ia, ib) AS doc_a, greatest(ia, ib) AS doc_b FROM cand),
       |j AS (
       |  SELECT doc_a, doc_b,
       |    len(list_intersect(sa.shset, sb.shset)) AS inter,
       |    len(sa.shset) AS na, len(sb.shset) AS nb
       |  FROM p
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id
       |  WHERE len(sa.shset) > 0 AND len(sb.shset) > 0)
       |SELECT doc_a, doc_b, inter * 1.0 / (na + nb - inter) AS jaccard
       |FROM j WHERE inter * 1.0 / (na + nb - inter) >= $jaccardThreshold""".stripMargin

  // ---------------------------------------------------------------------------
  // x86 — fuzzy entity matching via deletion-neighborhood blocking (FastSS):
  // customer-name pairs within ONE edit, found by equi-joining single-
  // deletion variants instead of comparing names pairwise. Variant
  // generation is linear in total characters and the exact Levenshtein DP
  // runs only on candidates that provably share a variant — the blocking
  // shape entity resolution needs at 100 TB, where an all-pairs fuzzy join
  // is n^2 by definition. Distances are integers — bitwise.
  // ---------------------------------------------------------------------------
  def x86FuzzyBlock(spark: SparkSession, dir: String): DataFrame =
    Dedup.editNeighborPairs(Tables.customer(spark, dir), "c_custkey", "c_name")
      .select(col("id_a").as("cust_a"), col("id_b").as("cust_b"), col("dist"))

  private[queries] val x86Sql =
    """WITH v AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |    CASE WHEN i = 0 THEN c_name
      |         ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS variant
      |  FROM (SELECT c_custkey, c_name,
      |          unnest(range(0, len(c_name) + 1)) AS i FROM customer)),
      |vd AS (SELECT DISTINCT id, name, variant FROM v),
      |cand AS (
      |  SELECT DISTINCT a.id AS ia, a.name AS na, b.id AS ib, b.name AS nb
      |  FROM vd a JOIN vd b ON a.variant = b.variant AND a.id < b.id)
      |SELECT ia AS cust_a, ib AS cust_b,
      |  CAST(levenshtein(na, nb) AS INTEGER) AS dist
      |FROM cand WHERE levenshtein(na, nb) <= 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x110 — the SERVING form of x86: per-entity fuzzy-match summary
  // (n_exact identical-name matches, n_near edit-distance-1 matches,
  // best_match = smallest id at the smallest distance). x86's pair list is
  // group-quadratic (~3e9 true pairs at sf10, census-measured) — output-
  // bound no matter the blocking — so the serving default collapses to
  // DISTINCT names before the FastSS variant join and re-expands
  // multiplicities arithmetically: per-entity output bounded by
  // construction, quadratic mass out of the PLAN. x86 stays registered as
  // the enumerating ground-truth twin (x2/x109 discipline). The oracle
  // states the same semantics declaratively by aggregating the enumerated
  // pairs — feasible at oracle SFs, which is exactly the twin split.
  // All outputs are integers — bitwise.
  // ---------------------------------------------------------------------------
  def x110FuzzySummary(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyMatchSummary(Tables.customer(spark, dir), "c_custkey", "c_name")

  private[queries] val x110Sql =
    """WITH v AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |    CASE WHEN i = 0 THEN c_name
      |         ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS variant
      |  FROM (SELECT c_custkey, c_name,
      |          unnest(range(0, len(c_name) + 1)) AS i FROM customer)),
      |vd AS (SELECT DISTINCT id, name, variant FROM v),
      |cand AS (
      |  SELECT DISTINCT a.id AS ia, a.name AS na, b.id AS ib, b.name AS nb
      |  FROM vd a JOIN vd b ON a.variant = b.variant AND a.id <> b.id),
      |p AS (
      |  SELECT ia AS cust_id, ib AS other_id, levenshtein(na, nb) AS dist
      |  FROM cand WHERE levenshtein(na, nb) <= 1)
      |SELECT cust_id,
      |  CAST(count(*) FILTER (WHERE dist = 0) AS BIGINT) AS n_exact,
      |  CAST(count(*) FILTER (WHERE dist = 1) AS BIGINT) AS n_near,
      |  COALESCE(min(other_id) FILTER (WHERE dist = 0),
      |           min(other_id) FILTER (WHERE dist = 1)) AS best_match
      |FROM p GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x111 — per-entity TOP-K fuzzy matches, the ranked serving companion to
  // x110: every entity's 3 best matches within edit distance 1, ranked
  // (distance ASC, match id ASC). The k+1 smallest member ids per name come
  // from the bounded topk_pairs heap (x24's aggregate — O(k) state per
  // group at every stage, never a window sort), the near side is a second
  // bounded top-k over the FastSS distinct-name neighbors, and the final
  // per-entity merge is array arithmetic over two <= k lists — output <= k
  // rows per entity by construction, pair enumeration never planned. The
  // oracle states the same ranking declaratively over the enumerated pairs
  // (feasible at oracle SFs — the twin split again). Integers — bitwise.
  // ---------------------------------------------------------------------------
  def x111FuzzyTopk(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyTopMatches(Tables.customer(spark, dir), "c_custkey", "c_name", k = 3)

  private[queries] val x111Sql =
    """WITH v AS (
      |  SELECT c_custkey AS id, c_name AS name,
      |    CASE WHEN i = 0 THEN c_name
      |         ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END AS variant
      |  FROM (SELECT c_custkey, c_name,
      |          unnest(range(0, len(c_name) + 1)) AS i FROM customer)),
      |vd AS (SELECT DISTINCT id, name, variant FROM v),
      |cand AS (
      |  SELECT DISTINCT a.id AS ia, a.name AS na, b.id AS ib, b.name AS nb
      |  FROM vd a JOIN vd b ON a.variant = b.variant AND a.id <> b.id),
      |p AS (
      |  SELECT ia AS cust_id, ib AS other_id, levenshtein(na, nb) AS dist
      |  FROM cand WHERE levenshtein(na, nb) <= 1),
      |r AS (
      |  SELECT cust_id, other_id, dist,
      |    row_number() OVER (PARTITION BY cust_id ORDER BY dist, other_id) AS rank
      |  FROM p)
      |SELECT cust_id, CAST(rank AS INTEGER) AS rank, other_id AS match_id,
      |  CAST(dist AS INTEGER) AS dist
      |FROM r WHERE rank <= 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x87 — simplified-silhouette cluster quality: per-cluster mean of
  // s = (b - a)/max(a,b) with a = cosine distance to the OWN centroid and
  // b = distance to the nearest OTHER centroid — the audit that says
  // whether the coarse quantizer's clusters are tight, overlapping, or
  // mis-assigned (the full silhouette is O(n^2); the centroid form is the
  // one that scales: n*nlist cosines vs a broadcast centroid table).
  // Assignment replays the x13/x54-proven unrounded argmax ordering; all
  // silhouette arithmetic runs on 6dp-pre-rounded cosines and the mean is
  // a DECIMAL sum — bitwise.
  // ---------------------------------------------------------------------------
  def x87Silhouette(spark: SparkSession, dir: String): DataFrame =
    Similarity.silhouetteSimplified(Tables.embeddings(spark, dir), nlist = 16)

  private[queries] val x87Sql =
    """WITH centroids AS (
      |  SELECT vec_id AS centroid_id, embedding AS centroid_vec
      |  FROM embeddings
      |  ORDER BY CASE WHEN md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR))
      |                     >= 9223372036854775808
      |            THEN CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |                 - 18446744073709551616
      |            ELSE CAST(md5_number_lower('ivf:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |            END
      |  LIMIT 16),
      |sc AS (
      |  SELECT e.vec_id, c.centroid_id,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                           CAST(c.centroid_vec AS DOUBLE[])) AS rawcos,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                      CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |               c.centroid_id ASC) AS rn
      |  FROM embeddings e CROSS JOIN centroids c),
      |own AS (
      |  SELECT vec_id, centroid_id AS cluster_id, round(rawcos, 6) AS own_cos
      |  FROM sc WHERE rn = 1),
      |oth AS (
      |  SELECT vec_id, max(round(rawcos, 6)) AS other_cos
      |  FROM sc WHERE rn > 1 GROUP BY 1),
      |per AS (
      |  SELECT own.cluster_id,
      |    CASE WHEN greatest(CAST(1.0 AS DOUBLE) - own_cos,
      |                       CAST(1.0 AS DOUBLE) - other_cos) = 0
      |         THEN CAST(0.0 AS DOUBLE)
      |         ELSE round(((CAST(1.0 AS DOUBLE) - other_cos)
      |                      - (CAST(1.0 AS DOUBLE) - own_cos))
      |           / greatest(CAST(1.0 AS DOUBLE) - own_cos,
      |                      CAST(1.0 AS DOUBLE) - other_cos), 6) END AS s
      |  FROM own JOIN oth USING (vec_id))
      |SELECT cluster_id, count(*) AS n_vectors,
      |  CAST(sum(CAST(s AS DECIMAL(27,6))) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS silhouette
      |FROM per GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x88 — asymmetric containment pairs: directed (contained, container) doc
  // pairs at >= 90% shingle containment — the embedded-copy leak jaccard
  // dilutes away (a short doc quoted inside a long one). Prefix filter on
  // the contained side only (pigeonhole over the df-asc rarest shingles);
  // the container side is the full linear inverted file, so the plan is
  // explode + equi-join + exact verify — never doc x doc. Containment is an
  // exact integer ratio — bitwise.
  // ---------------------------------------------------------------------------
  private val containmentThreshold = 0.9

  def x88ContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairsPrefix(Tables.documents(spark, dir), containmentThreshold)

  private[queries] val x88Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
       |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh WHERE len(shset) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id != b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(shset) AS n FROM sh WHERE len(shset) > 0)
       |SELECT doc_a, doc_b, inter * 1.0 / sa.n AS containment
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
       |WHERE inter * 1.0 / sa.n >= $containmentThreshold""".stripMargin

  // ---------------------------------------------------------------------------
  // x89 — per-doc n-gram novelty vs a reference slice (doc_id % 5 = 0 plays
  // the already-trained corpus): the admission score of an iterative
  // curation loop. Reference set = ONE distinct over exploded shingles;
  // novel counts = shingle-keyed anti join — linear, never doc x doc.
  // ---------------------------------------------------------------------------
  def x89Novelty(spark: SparkSession, dir: String): DataFrame =
    Corpus.noveltyScores(Tables.documents(spark, dir))

  private[queries] val x89Sql =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(
      |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)]) AS shset
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)),
      |nz AS (SELECT doc_id, shset FROM sh WHERE len(shset) > 0),
      |ref AS (SELECT DISTINCT unnest(shset) AS s FROM nz WHERE doc_id % 5 = 0),
      |probe AS (SELECT doc_id, unnest(shset) AS s FROM nz WHERE doc_id % 5 != 0),
      |novel AS (
      |  SELECT doc_id, count(*) AS novel FROM probe p
      |  WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.s = p.s)
      |  GROUP BY 1)
      |SELECT nz.doc_id, CAST(len(shset) AS BIGINT) AS ngrams,
      |  CAST(coalesce(novel.novel, 0) AS BIGINT) AS novel,
      |  CAST(coalesce(novel.novel, 0) AS BIGINT) * 1.0 / len(shset) AS novelty
      |FROM nz LEFT JOIN novel ON nz.doc_id = novel.doc_id
      |WHERE nz.doc_id % 5 != 0""".stripMargin

  // ---------------------------------------------------------------------------
  // x90 — k-anonymity generalization ladder over customer quasi-identifiers
  // (nation, market segment, account-balance bucket): the equivalence-class
  // census at each candidate bucket width, with the rows re-identifiable at
  // k < 5 counted per level — the audit a user-derived data release runs to
  // pick its minimal generalization. One hash aggregation over a constant
  // 3x fan-out, then a class-census rollup; exact integer counts — bitwise.
  // ---------------------------------------------------------------------------
  private val kanonK = 5
  private val kanonWidths = Seq(100, 1000, 10000)

  def x90KanonLadder(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.kAnonymityLadder(Tables.customer(spark, dir),
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", kanonWidths, kanonK)

  private[queries] val x90Sql =
    s"""WITH w AS (SELECT unnest([${kanonWidths.mkString(", ")}]) AS width),
       |cl AS (
       |  SELECT width, c_nationkey, c_mktsegment,
       |    CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / (width * 100.0))
       |         AS BIGINT) AS bucket,
       |    count(*) AS class_size
       |  FROM customer CROSS JOIN w
       |  GROUP BY 1, 2, 3, 4)
       |SELECT width, count(*) AS classes,
       |  CAST(coalesce(sum(CASE WHEN class_size < $kanonK THEN 1 END), 0)
       |       AS BIGINT) AS risky_classes,
       |  CAST(coalesce(sum(CASE WHEN class_size < $kanonK THEN class_size END), 0)
       |       AS BIGINT) AS risky_rows,
       |  CASE WHEN coalesce(sum(CASE WHEN class_size < $kanonK THEN 1 END), 0) = 0
       |       THEN 1 ELSE 0 END AS meets_k
       |FROM cl GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x91 — exact two-sample KS drift matrix: the sup-norm ECDF gap between
  // every source pair over the doc-length distribution. PSI (x81) coarsens
  // into log buckets; KS is the full-resolution statistic. Everything after
  // one corpus aggregation is histogram-level (|sources| x |levels| grid,
  // |pairs| x |levels| sup scan); the sup is an integer cross-product max
  // and the one division happens on exact integers — bitwise.
  // ---------------------------------------------------------------------------
  def x91KsMatrix(spark: SparkSession, dir: String): DataFrame =
    Corpus.ksMatrix(Tables.documents(spark, dir))

  private[queries] val x91Sql =
    """WITH h AS (
      |  SELECT source, n_chars AS x, count(*) AS c FROM documents GROUP BY 1, 2),
      |lv AS (SELECT DISTINCT x FROM h),
      |sr AS (SELECT DISTINCT source FROM h),
      |g AS (
      |  SELECT sr.source, lv.x, coalesce(h.c, 0) AS c
      |  FROM sr CROSS JOIN lv
      |  LEFT JOIN h ON h.source = sr.source AND h.x = lv.x),
      |cu AS (
      |  SELECT source, x,
      |    CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT) AS cum
      |  FROM g),
      |n AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |p AS (
      |  SELECT a.source AS src_a, b.source AS src_b, na.n AS na, nb.n AS nb,
      |    max(abs(a.cum * nb.n - b.cum * na.n)) AS num
      |  FROM cu a JOIN cu b ON a.x = b.x AND a.source < b.source
      |  JOIN n na ON na.source = a.source
      |  JOIN n nb ON nb.source = b.source
      |  GROUP BY 1, 2, 3, 4)
      |SELECT src_a, src_b,
      |  CAST(num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks
      |FROM p""".stripMargin

  // ---------------------------------------------------------------------------
  // x92 — memorization-risk audit: every 4-word context seen >= 3 times
  // corpus-wide with exactly one continuation — the phrases a trained model
  // will reproduce verbatim; the output is the drop/decontamination list
  // itself. One explode pass + two hash aggregations; integer counts.
  // ---------------------------------------------------------------------------
  def x92Memorization(spark: SparkSession, dir: String): DataFrame =
    TextStats.memorizedContexts(Tables.documents(spark, dir))

  private[queries] val x92Sql =
    """WITH w AS (
      |  SELECT string_split(trim(text), ' ') AS w FROM documents
      |  WHERE trim(text) <> ''),
      |g AS (
      |  SELECT array_to_string(w[i:i+3], ' ') AS ctx, w[i + 4] AS nxt
      |  FROM (SELECT w, unnest(range(1, len(w) - 3)) AS i
      |        FROM w WHERE len(w) >= 5)),
      |cn AS (SELECT ctx, nxt, count(*) AS c FROM g GROUP BY 1, 2),
      |ag AS (
      |  SELECT ctx, CAST(sum(c) AS BIGINT) AS occ, count(*) AS n_next,
      |    min(nxt) AS next_tok
      |  FROM cn GROUP BY 1)
      |SELECT ctx, occ, next_tok FROM ag WHERE occ >= 3 AND n_next = 1""".stripMargin

  // ---------------------------------------------------------------------------
  // x93 — farthest-first k-center coreset (Gonzalez greedy): the min-id seed
  // plus 7 rounds of "farthest from everything selected", on 6dp-rounded
  // cosine distances with vec_id tie-break. Each round is one narrow
  // broadcast pass + one TakeOrdered(1) — no shuffle; the oracle unrolls the
  // identical 8 steps and replays bitwise.
  // ---------------------------------------------------------------------------
  private val kCoresetK = 8

  def x93KcenterCoreset(spark: SparkSession, dir: String): DataFrame =
    Similarity.kCenterCoreset(Tables.embeddings(spark, dir), kCoresetK)

  private[queries] val x93Sql = {
    val steps = (2 to kCoresetK).map { i =>
      val p = i - 1
      s"""s$i AS (SELECT vec_id, v, mind FROM d$p ORDER BY mind DESC, vec_id LIMIT 1),
         |d$i AS (
         |  SELECT d$p.vec_id, d$p.v,
         |    least(d$p.mind, CAST(1.0 AS DOUBLE)
         |      - round(list_cosine_similarity(d$p.v, s$i.v), 6)) AS mind
         |  FROM d$p CROSS JOIN s$i)""".stripMargin
    }.mkString(",\n")
    val union = (2 to kCoresetK).map { i =>
      s"SELECT $i AS sel_rank, vec_id, mind AS radius FROM s$i"
    }.mkString("\nUNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS (
       |  SELECT e.vec_id, e.v,
       |    CAST(1.0 AS DOUBLE)
       |      - round(list_cosine_similarity(e.v, s1.v), 6) AS mind
       |  FROM e CROSS JOIN s1),
       |$steps
       |SELECT 1 AS sel_rank, vec_id, CAST(2.0 AS DOUBLE) AS radius FROM s1
       |UNION ALL $union""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // x94 — conditional next-token entropy rate per context length 1..3: the
  // corpus predictability curve (x92's aggregate view — template-dominated
  // corpora fall steeply). One explode pass for all three lengths, two
  // ctx-keyed aggregations, |contexts|-level rollup; every float step is a
  // 6dp-rounded single IEEE op summed as DECIMAL (the x81 discipline).
  // ---------------------------------------------------------------------------
  def x94EntropyRate(spark: SparkSession, dir: String): DataFrame =
    TextStats.entropyRate(Tables.documents(spark, dir))

  private[queries] val x94Sql =
    """WITH w AS (
      |  SELECT string_split(trim(text), ' ') AS w FROM documents
      |  WHERE trim(text) <> ''),
      |g AS (
      |  SELECT n, array_to_string(w[i:i+n-1], ' ') AS ctx, w[i + n] AS nxt
      |  FROM (SELECT w, n, unnest(range(1, len(w) - n + 1)) AS i
      |        FROM w CROSS JOIN (SELECT unnest(range(1, 4)) AS n) ns
      |        WHERE len(w) >= n + 1)),
      |cn AS (SELECT n, ctx, nxt, count(*) AS c FROM g GROUP BY 1, 2, 3),
      |tc AS (
      |  SELECT n, ctx, c,
      |    CAST(sum(c) OVER (PARTITION BY n, ctx) AS BIGINT) AS occ
      |  FROM cn),
      |pc AS (
      |  SELECT n, ctx, occ,
      |    CAST(sum(CAST(round((CAST(c AS DOUBLE) / CAST(occ AS DOUBLE))
      |      * ln(CAST(occ AS DOUBLE) / CAST(c AS DOUBLE)), 6)
      |      AS DECIMAL(27,6))) AS DOUBLE) AS h_ctx
      |  FROM tc GROUP BY 1, 2, 3),
      |tot AS (SELECT n, CAST(sum(occ) AS BIGINT) AS slots FROM pc GROUP BY 1)
      |SELECT CAST(pc.n AS INTEGER) AS n, count(*) AS contexts, tot.slots,
      |  CAST(sum(CAST(round(h_ctx * CAST(occ AS DOUBLE)
      |    / CAST(slots AS DOUBLE), 6) AS DECIMAL(27,6))) AS DOUBLE)
      |    AS entropy_rate
      |FROM pc JOIN tot ON pc.n = tot.n GROUP BY 1, 3""".stripMargin

  // ---------------------------------------------------------------------------
  // x95 — per-document bigram cross-entropy under the corpus's own add-one-
  // smoothed bigram model: the cheap LM quality score (garbled/wrong-language
  // text scores high, boilerplate low). Model = two hash aggregations over
  // one explode pass; scoring joins each doc's DISTINCT bigrams (not every
  // slot) to the model. One IEEE div + ln per distinct bigram, 6dp-rounded,
  // integer-multiplied, DECIMAL-summed — bitwise.
  // ---------------------------------------------------------------------------
  def x95BigramXent(spark: SparkSession, dir: String): DataFrame =
    TextStats.bigramCrossEntropy(Tables.documents(spark, dir))

  private[queries] val x95Sql =
    """WITH w AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
      |  WHERE trim(text) <> ''),
      |g AS (
      |  SELECT doc_id, w[i] AS ctx, w[i + 1] AS nxt
      |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
      |        FROM w WHERE len(w) >= 2)),
      |pc AS (SELECT ctx, nxt, count(*) AS cp FROM g GROUP BY 1, 2),
      |cc AS (SELECT ctx, CAST(sum(cp) AS BIGINT) AS cc FROM pc GROUP BY 1),
      |v AS (SELECT count(DISTINCT nxt) AS v FROM g),
      |dm AS (SELECT doc_id, ctx, nxt, count(*) AS m FROM g GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT dm.doc_id, dm.m,
      |    CAST(CAST(round(ln(CAST(cc.cc + v.v AS DOUBLE) / CAST(pc.cp + 1 AS DOUBLE)), 6)
      |      AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS tmicro
      |  FROM dm JOIN pc ON dm.ctx = pc.ctx AND dm.nxt = pc.nxt
      |  JOIN cc ON dm.ctx = cc.ctx CROSS JOIN v),
      |a AS (
      |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS slots,
      |    CAST(sum(tmicro * m) AS BIGINT) AS nmicro
      |  FROM sc GROUP BY 1)
      |SELECT doc_id, slots,
      |  CAST((2 * nmicro + slots) // (2 * slots) AS DOUBLE)
      |    / CAST(1000000 AS DOUBLE) AS xent
      |FROM a""".stripMargin

  // ---------------------------------------------------------------------------
  // x96 — Benford first-digit conformance audit on order totals per priority
  // class: the fabricated-data / broken-generator detector. Digit extraction
  // is string-on-exact-cents (no float log10 on the data path); expected
  // probabilities are 6dp literals; chi terms are IEEE ops on exact inputs,
  // DECIMAL-summed per group — bitwise.
  // ---------------------------------------------------------------------------
  def x96Benford(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.benfordAudit(Tables.orders(spark, dir),
      "o_totalprice", "o_orderpriority")
      .withColumnRenamed("grp", "o_orderpriority")

  private[queries] val x96Sql =
    """WITH d AS (
      |  SELECT o_orderpriority AS grp,
      |    CASE WHEN abs(CAST(round(o_totalprice * 100) AS BIGINT)) = 0 THEN NULL
      |      ELSE CAST(substring(CAST(abs(CAST(round(o_totalprice * 100) AS BIGINT))
      |        AS VARCHAR), 1, 1) AS INTEGER) END AS digit
      |  FROM orders),
      |o AS (SELECT grp, digit, count(*) AS obs FROM d
      |      WHERE digit IS NOT NULL GROUP BY 1, 2),
      |ex AS (SELECT grp, CAST(sum(CASE WHEN digit IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS excluded FROM d GROUP BY 1),
      |grps AS (SELECT grp FROM ex),
      |p AS (
      |  SELECT digit, CAST(CASE digit
      |    WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939
      |    WHEN 4 THEN 0.096910 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
      |    WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 WHEN 9 THEN 0.045757
      |    END AS DECIMAL(8,6)) AS p
      |  FROM (SELECT unnest(range(1, 10)) AS digit)),
      |f AS (
      |  SELECT grps.grp, p.digit, coalesce(o.obs, 0) AS obs, p.p
      |  FROM grps CROSS JOIN p
      |  LEFT JOIN o ON o.grp = grps.grp AND o.digit = p.digit),
      |w AS (
      |  SELECT grp, digit, obs, p,
      |    CAST(sum(obs) OVER (PARTITION BY grp) AS BIGINT) AS n
      |  FROM f),
      |t AS (
      |  SELECT grp, digit, CAST(obs AS BIGINT) AS obs,
      |    CAST(p * n AS DECIMAL(27,6)) AS exp_cnt,
      |    CASE WHEN n = 0 THEN CAST(0.0 AS DECIMAL(27,6)) ELSE CAST(round(
      |      (CAST(obs AS DOUBLE) - CAST(CAST(p * n AS DECIMAL(27,6)) AS DOUBLE))
      |      * (CAST(obs AS DOUBLE) - CAST(CAST(p * n AS DECIMAL(27,6)) AS DOUBLE))
      |      / CAST(CAST(p * n AS DECIMAL(27,6)) AS DOUBLE), 6)
      |      AS DECIMAL(27,6)) END AS chi_term
      |  FROM w)
      |SELECT grp AS o_orderpriority, digit, obs,
      |  CAST(exp_cnt AS DOUBLE) AS exp_cnt,
      |  CAST(chi_term AS DOUBLE) AS chi_term,
      |  CAST(sum(chi_term) OVER (PARTITION BY grp) AS DOUBLE) AS chi2,
      |  ex.excluded AS excluded
      |FROM t JOIN ex USING (grp)""".stripMargin

  // ---------------------------------------------------------------------------
  // x97 — Gini token-mass concentration per source (Lorenz curve on the term
  // frequency distribution). Everything after the term aggregation runs on
  // the FREQUENCY SPECTRUM (x80's trick): tie blocks make the rank-weighted
  // mass a closed form, so the textbook global sort never materializes.
  // Exact BIGINTs until one final division — bitwise.
  // ---------------------------------------------------------------------------
  def x97Gini(spark: SparkSession, dir: String): DataFrame =
    TextStats.giniConcentration(Tables.documents(spark, dir))

  private[queries] val x97Sql =
    """WITH t AS (
      |  SELECT source, unnest(string_split(trim(text), ' ')) AS term
      |  FROM documents WHERE trim(text) <> ''),
      |f AS (SELECT source, term, count(*) AS freq FROM t GROUP BY 1, 2),
      |sp AS (SELECT source, freq, count(*) AS m FROM f GROUP BY 1, 2),
      |o AS (
      |  SELECT source, freq, m,
      |    coalesce(CAST(sum(m) OVER (PARTITION BY source ORDER BY freq
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS r
      |  FROM sp),
      |a AS (
      |  SELECT source, CAST(sum(m) AS BIGINT) AS n_types,
      |    CAST(sum(freq * m) AS BIGINT) AS total_tokens,
      |    CAST(sum(freq * (2 * m * r + m * (m + 1))) AS BIGINT) AS s2
      |  FROM o GROUP BY 1)
      |SELECT source, n_types, total_tokens,
      |  round(CAST(s2 - (n_types + 1) * total_tokens AS DOUBLE)
      |    / CAST(n_types * total_tokens AS DOUBLE), 6) AS gini
      |FROM a""".stripMargin

  // ---------------------------------------------------------------------------
  // x98 — Neyman-optimal sample design: allocate a 1000-doc budget across
  // sources proportional to N_h * sd(n_chars) — the variance-minimizing
  // stratified design, priced before sampling. One corpus aggregation
  // (exact integer count/Σx/Σx²), then |sources|-sized arithmetic; floor
  // allocation so Σ alloc <= budget without a nondeterministic remainder
  // sort — bitwise.
  // ---------------------------------------------------------------------------
  private val neymanBudget = 1000L

  def x98Neyman(spark: SparkSession, dir: String): DataFrame =
    Corpus.neymanAllocation(Tables.documents(spark, dir),
      col("source"), col("n_chars"), neymanBudget)
      .withColumnRenamed("stratum", "source")

  private[queries] val x98Sql =
    s"""WITH s AS (
       |  SELECT source AS stratum, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS s1,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
       |  FROM documents GROUP BY 1),
       |t AS (
       |  SELECT stratum, n_docs,
       |    CAST(round(sqrt(CAST(n_docs * s2 - s1 * s1 AS DOUBLE))
       |      / CAST(n_docs AS DOUBLE), 6) AS DECIMAL(16,6)) AS sd
       |  FROM s),
       |w AS (
       |  SELECT stratum, n_docs, sd,
       |    CAST(sd * n_docs AS DECIMAL(27,6)) AS w
       |  FROM t),
       |tw AS (SELECT CAST(sum(w) AS DECIMAL(38,6)) AS tw FROM w)
       |SELECT stratum AS source, n_docs, CAST(sd AS DOUBLE) AS sd_chars,
       |  CAST(floor(CAST(w AS DOUBLE) * CAST($neymanBudget AS DOUBLE)
       |    / CAST(tw AS DOUBLE)) AS BIGINT) AS alloc
       |FROM w CROSS JOIN tw""".stripMargin

  // ---------------------------------------------------------------------------
  // x99 — winsorization audit: exact p5/p95 clip thresholds of the value
  // stream per event type (integer inverse-CDF over the cents census) plus
  // the clip's blast radius (rows clipped each side, total mass moved).
  // Everything after the census is |distinct values|-sized; all outputs are
  // exact integers — bitwise by construction.
  // ---------------------------------------------------------------------------
  def x99Winsorize(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.winsorizeAudit(Tables.events(spark, dir), "value", "event_type")
      .withColumnRenamed("grp", "event_type")

  private[queries] val x99Sql =
    """WITH c AS (
      |  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS cents,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
      |cu AS (
      |  SELECT c.grp, cents, c, n,
      |    CAST(sum(c) OVER (PARTITION BY c.grp ORDER BY cents) AS BIGINT) AS cum
      |  FROM c JOIN n ON c.grp = n.grp),
      |t AS (
      |  SELECT grp, n,
      |    min(CASE WHEN cum * 100 >= n * 5 THEN cents END) AS lo,
      |    min(CASE WHEN cum * 100 >= n * 95 THEN cents END) AS hi
      |  FROM cu GROUP BY 1, 2)
      |SELECT c.grp AS event_type, t.n, t.lo AS lo_cents, t.hi AS hi_cents,
      |  CAST(coalesce(sum(CASE WHEN cents < lo THEN c END), 0) AS BIGINT)
      |    AS clipped_lo,
      |  CAST(coalesce(sum(CASE WHEN cents > hi THEN c END), 0) AS BIGINT)
      |    AS clipped_hi,
      |  CAST(coalesce(sum(CASE WHEN cents < lo THEN (lo - cents) * c END), 0)
      |     + coalesce(sum(CASE WHEN cents > hi THEN (cents - hi) * c END), 0)
      |    AS BIGINT) AS moved_cents
      |FROM c JOIN t ON c.grp = t.grp
      |GROUP BY 1, 2, 3, 4""".stripMargin

  // ---------------------------------------------------------------------------
  // x100 — vocabulary growth curve (Heaps'-law census): cumulative distinct
  // types vs cumulative tokens at ten doc_id-range checkpoints. Buckets are
  // integer VALUE ranges (one scalar max), first appearance is min(bucket)
  // per term — no global sort, no corpus-sized window; the cumulative
  // rollup runs over the ten-row bucket table. Exact integers — bitwise.
  // ---------------------------------------------------------------------------
  def x100VocabGrowth(spark: SparkSession, dir: String): DataFrame =
    TextStats.vocabularyGrowth(Tables.documents(spark, dir))

  private[queries] val x100Sql =
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
      |d AS (
      |  SELECT (doc_id * 10) // (m + 1) AS bucket,
      |    string_split(trim(text), ' ') AS ws
      |  FROM documents CROSS JOIN mx WHERE trim(text) <> ''),
      |pb AS (
      |  SELECT bucket, count(*) AS docs, CAST(sum(len(ws)) AS BIGINT) AS tokens
      |  FROM d GROUP BY 1),
      |fs AS (
      |  SELECT bucket, count(*) AS new_types FROM (
      |    SELECT term, min(bucket) AS bucket
      |    FROM (SELECT bucket, unnest(ws) AS term FROM d) GROUP BY 1)
      |  GROUP BY 1),
      |sh AS (
      |  SELECT bucket, count(*) AS new_shingles FROM (
      |    SELECT s, min(bucket) AS bucket FROM (
      |      SELECT bucket,
      |        unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                FOR i IN range(1, len(ws) - 1)]) AS s
      |      FROM d WHERE len(ws) >= 3) GROUP BY 1)
      |  GROUP BY 1)
      |SELECT pb.bucket,
      |  CAST(sum(docs) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_docs,
      |  CAST(sum(tokens) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
      |  CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY pb.bucket) AS BIGINT)
      |    AS cum_types,
      |  CAST(sum(coalesce(new_shingles, 0)) OVER (ORDER BY pb.bucket) AS BIGINT)
      |    AS cum_shingles
      |FROM pb LEFT JOIN fs ON pb.bucket = fs.bucket
      |LEFT JOIN sh ON pb.bucket = sh.bucket""".stripMargin

  // ---------------------------------------------------------------------------
  // x101 — Kaplan–Meier user-survival curve from the activity log: lifetimes
  // run first→last active day; churn = inactive for ≥8 days before the
  // observation end, else right-censored. ONE user-keyed agg is the only
  // corpus shuffle; the at-risk rollup and the survival product are windows
  // over the |distinct lifetimes| census, and the product is a DECIMAL sum
  // of 6dp-rounded ln terms (the x94 discipline) — bitwise.
  // ---------------------------------------------------------------------------
  def x101Survival(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.survivalCurve(Tables.events(spark, dir))

  private[queries] val x101Sql =
    """WITH d AS (
      |  SELECT user_id AS u, (CAST(ts AS DATE) - DATE '1970-01-01') AS d
      |  FROM events),
      |u AS (SELECT u, min(d) AS fd, max(d) AS ld FROM d GROUP BY 1),
      |h AS (SELECT max(ld) AS m, count(*) AS total FROM u),
      |lab AS (
      |  SELECT total, (ld <= m - 8) AS is_churn,
      |    CASE WHEN ld <= m - 8 THEN ld - fd ELSE m - fd END AS t
      |  FROM u CROSS JOIN h),
      |c AS (
      |  SELECT CAST(t AS BIGINT) AS t, total,
      |    CAST(coalesce(sum(CASE WHEN is_churn THEN 1 END), 0) AS BIGINT) AS churned,
      |    CAST(coalesce(sum(CASE WHEN NOT is_churn THEN 1 END), 0) AS BIGINT)
      |      AS censored
      |  FROM lab GROUP BY 1, 2),
      |r AS (
      |  SELECT t, churned, censored,
      |    total - CAST(coalesce(sum(churned + censored) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS at_risk
      |  FROM c)
      |SELECT t, at_risk, churned, censored,
      |  CAST(sum(CAST(CASE WHEN churned > 0 AND at_risk > churned
      |      THEN round(ln(CAST(at_risk - churned AS DOUBLE)
      |        / CAST(at_risk AS DOUBLE)), 6) ELSE 0.0 END AS DECIMAL(27,6)))
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS log_surv
      |FROM r""".stripMargin

  // ---------------------------------------------------------------------------
  // x102 — inter-arrival burstiness per event type (Goh–Barabási
  // B = (σ−μ)/(σ+μ) over same-(user,type) gaps): the traffic-shape profile
  // behind batch sizing and rate limits. The lag window is keyed by
  // (user, type) — millions of small partitions, never a type-wide sort —
  // and the rollup carries exact BIGINT Σx / DECIMAL Σx², with B one final
  // 6dp-rounded step from those exact sums.
  // ---------------------------------------------------------------------------
  def x102Burstiness(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.burstiness(Tables.events(spark, dir))

  private[queries] val x102Sql =
    """WITH e AS (
      |  SELECT event_type, user_id, event_id, epoch_us(ts) AS us FROM events),
      |g AS (
      |  SELECT event_type,
      |    (us - lag(us) OVER (PARTITION BY user_id, event_type
      |       ORDER BY us, event_id)) // 1000000 AS gap_s
      |  FROM e),
      |a AS (
      |  SELECT event_type, count(*) AS n_gaps,
      |    CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
      |    CAST(sum(CAST(gap_s AS HUGEINT) * gap_s) AS DOUBLE) AS ssq
      |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_gaps, sum_gap_s, ssq AS sum_gap_sq,
      |  CASE WHEN sqrt(ssq * n_gaps - CAST(sum_gap_s AS DOUBLE)
      |         * CAST(sum_gap_s AS DOUBLE)) + CAST(sum_gap_s AS DOUBLE) = 0
      |       THEN 0.0
      |       ELSE round((sqrt(ssq * n_gaps - CAST(sum_gap_s AS DOUBLE)
      |           * CAST(sum_gap_s AS DOUBLE)) - CAST(sum_gap_s AS DOUBLE))
      |         / (sqrt(ssq * n_gaps - CAST(sum_gap_s AS DOUBLE)
      |           * CAST(sum_gap_s AS DOUBLE)) + CAST(sum_gap_s AS DOUBLE)), 6)
      |  END AS burstiness
      |FROM a""".stripMargin

  // ---------------------------------------------------------------------------
  // x103 — CUSUM change-point detection on daily volume per event type: the
  // "did traffic shift, and when" audit. Deviations scaled by n_days keep
  // everything exact BIGINT; the max(0, S+d) recursions run as prefix
  // identities (two windows + argmax) over the |types|·|days| census — ONE
  // corpus-sized counting agg, nothing else scales with rows.
  // ---------------------------------------------------------------------------
  def x103Cusum(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.cusumChangePoint(Tables.events(spark, dir))

  private[queries] val x103Sql =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(cnt) AS BIGINT) AS total
      |  FROM c GROUP BY 1),
      |p AS (
      |  SELECT c.event_type, day, n_days, total,
      |    CAST(sum(cnt * n_days - total) OVER (PARTITION BY c.event_type
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS p
      |  FROM c JOIN t USING (event_type)),
      |s AS (
      |  SELECT event_type, day, n_days, total,
      |    p - least(CAST(0 AS BIGINT), CAST(min(p) OVER (PARTITION BY event_type
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT)) AS pos,
      |    greatest(CAST(0 AS BIGINT), CAST(max(p) OVER (PARTITION BY event_type
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT)) - p AS neg
      |  FROM p),
      |m AS (
      |  SELECT event_type, max(n_days) AS n_days, max(total) AS total_events,
      |    max(pos) AS peak_pos, max(neg) AS peak_neg
      |  FROM s GROUP BY 1)
      |SELECT m.event_type, n_days, total_events, peak_pos,
      |  (SELECT min(day) FROM s
      |   WHERE s.event_type = m.event_type AND s.pos = m.peak_pos) AS peak_pos_day,
      |  peak_neg,
      |  (SELECT min(day) FROM s
      |   WHERE s.event_type = m.event_type AND s.neg = m.peak_neg) AS peak_neg_day
      |FROM m""".stripMargin

  // ---------------------------------------------------------------------------
  // x104 — daily-volume ACF per event type (lags 1..7): the seasonality
  // detector. Series = ZERO-FILLED day census; lagged pairs via a census
  // self-join at day−k (identical semantics on the oracle side); exact
  // BIGINT/DECIMAL carriers, Pearson r as ONE final rounded double step.
  // ---------------------------------------------------------------------------
  def x104Acf(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.autocorrelation(Tables.events(spark, dir))

  private[queries] val x104Sql =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |sp AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM c GROUP BY 1),
      |dd AS (SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM sp),
      |dense AS (
      |  SELECT dd.event_type, dd.day, coalesce(c.cnt, 0) AS cnt
      |  FROM dd LEFT JOIN c ON c.event_type = dd.event_type AND c.day = dd.day),
      |ks AS (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag),
      |pr AS (
      |  SELECT a.event_type, k.lag, a.cnt AS x, b.cnt AS y
      |  FROM dense a CROSS JOIN ks k
      |  JOIN dense b ON b.event_type = a.event_type AND b.day = a.day - k.lag),
      |ag AS (
      |  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
      |  FROM pr GROUP BY 1, 2)
      |SELECT event_type, lag, n_pairs,
      |  CASE WHEN (sxx * n_pairs - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (syy * n_pairs - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
      |    THEN 0.0
      |    ELSE round((sxy * n_pairs - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt((sxx * n_pairs - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * (syy * n_pairs - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |  END AS acf
      |FROM ag""".stripMargin

  // ---------------------------------------------------------------------------
  // x105 — Zipf rank–frequency slope: OLS over (ln rank_hi, ln freq) at the
  // SPECTRUM level (rank_hi = #types with freq ≥ f, so ties are one point) —
  // the "is this corpus natural-language-shaped" diagnostic. One term
  // shuffle; the window and regression run on the O(√tokens) spectrum; ln
  // terms 6dp-rounded into DECIMAL sums (x94 discipline) — bitwise.
  // ---------------------------------------------------------------------------
  def x105ZipfSlope(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextStats.zipfSlope(Tables.documents(spark, dir))

  private[queries] val x105Sql =
    """WITH tok AS (
      |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
      |f AS (SELECT term, count(*) AS freq FROM tok GROUP BY 1),
      |s AS (SELECT freq, CAST(count(*) AS BIGINT) AS n_types FROM f GROUP BY 1),
      |r AS (
      |  SELECT CAST(sum(n_types) OVER (ORDER BY freq DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS rank_hi, freq
      |  FROM s),
      |pts AS (
      |  SELECT round(ln(CAST(rank_hi AS DOUBLE)), 6) AS x,
      |    round(ln(CAST(freq AS DOUBLE)), 6) AS y
      |  FROM r),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS m,
      |    sum(CAST(x AS DECIMAL(27,6))) AS sx,
      |    sum(CAST(y AS DECIMAL(27,6))) AS sy,
      |    sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS sxy,
      |    sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS sxx
      |  FROM pts),
      |d AS (
      |  SELECT m, CAST(m AS DOUBLE) AS md,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(sxy AS DOUBLE) * CAST(m AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    CAST(sxx AS DOUBLE) * CAST(m AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den
      |  FROM ag)
      |SELECT m AS n_points,
      |  CASE WHEN den = 0.0 THEN 0.0 ELSE round(num / den, 6) END AS zipf_slope,
      |  CASE WHEN den = 0.0 THEN round(syd / md, 6)
      |       ELSE round((syd - (num / den) * sxd) / md, 6) END AS intercept
      |FROM d""".stripMargin

  // ---------------------------------------------------------------------------
  // x106 — Hill tail-index of document length: the heavy-tail diagnostic
  // behind shard sizing and straggler risk (α ≤ 2 = infinite variance —
  // uniform sharding breaks). The only corpus-wide stage is the top-k cut
  // (TakeOrderedAndProject heaps, no global sort); the estimator runs on k
  // rows with 6dp-rounded ln terms in a DECIMAL sum — bitwise.
  // ---------------------------------------------------------------------------
  def x106HillTail(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.hillTail(Tables.documents(spark, dir), "n_chars")

  private[queries] val x106Sql =
    """WITH top AS (
      |  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
      |  WHERE n_chars > 0 ORDER BY x DESC LIMIT 500),
      |ag AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k, min(x) AS x_k,
      |    sum(CAST(round(ln(CAST(x AS DOUBLE)), 6) AS DECIMAL(27,6))) AS slnx
      |  FROM top),
      |h AS (
      |  SELECT k, x_k,
      |    (CAST(slnx AS DOUBLE) - CAST(k AS DOUBLE)
      |       * round(ln(CAST(x_k AS DOUBLE)), 6)) / CAST(k AS DOUBLE) AS hraw
      |  FROM ag)
      |SELECT k, x_k, round(hraw, 6) AS hill_h,
      |  CASE WHEN hraw = 0.0 THEN 0.0
      |       ELSE round(CAST(1.0 AS DOUBLE) / hraw, 6) END AS tail_alpha
      |FROM h""".stripMargin

  // ---------------------------------------------------------------------------
  // x107 — language × source chi-square independence: the "is my corpus mix
  // confounded" audit (large V ⇒ language balance can't be tuned by
  // sampling sources independently). ONE (lang, source) counting agg is the
  // only corpus stage; marginals broadcast onto the contingency census and
  // each cell's (O−E)²/E is 12dp-rounded into a DECIMAL sum — bitwise.
  // ---------------------------------------------------------------------------
  def x107Chi2(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Profile.chiSquareIndependence(
      Tables.documents(spark, dir), "lang", "source")

  private[queries] val x107Sql =
    """WITH o AS (
      |  SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM o GROUP BY 1),
      |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM o GROUP BY 1),
      |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
      |grid AS (
      |  SELECT ra.a, cb.b, CAST(coalesce(o.o, 0) AS BIGINT) AS o
      |  FROM ra CROSS JOIN cb LEFT JOIN o ON o.a = ra.a AND o.b = cb.b),
      |tm AS (
      |  SELECT n, a, b,
      |    CAST(round((CAST(o.o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
      |        / CAST(n AS DOUBLE))
      |      * (CAST(o.o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
      |        / CAST(n AS DOUBLE))
      |      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)), 12)
      |      AS DECIMAL(38,12)) AS term
      |  FROM grid o JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nt),
      |ag AS (
      |  SELECT max(n) AS n_rows, CAST(count(DISTINCT a) AS BIGINT) AS n_a,
      |    CAST(count(DISTINCT b) AS BIGINT) AS n_b, sum(term) AS chi2d
      |  FROM tm)
      |SELECT n_rows, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof,
      |  round(CAST(chi2d AS DOUBLE), 6) AS chi2,
      |  round(sqrt(CAST(chi2d AS DOUBLE)
      |    / (CAST(n_rows AS DOUBLE) * CAST(least(n_a - 1, n_b - 1) AS DOUBLE))), 6)
      |    AS cramers_v
      |FROM ag""".stripMargin

  // ---------------------------------------------------------------------------
  // x108 — kNN label agreement: for a deterministic bounded query sample, do
  // the 5 nearest neighbors vote the vector's own label? The standard
  // embedding-quality probe (low agreement = the space doesn't separate the
  // classes; per-label rates localize which class bleeds).
  //
  // Scale shape (the round-6 fix): the sample is an ABSOLUTE 256-row cap —
  // the 256 corpus rows with the smallest signed md5-low-64 of 'knn:'||id
  // (one TakeOrdered over a narrow scan, not a fraction that keeps the
  // audit quadratic) — and scoring probes the PERSISTED IVF index shared
  // with x13 (partition-pruned postings: 256 · |corpus| · nprobe / nlist
  // cosines instead of 256 · |corpus|). Both stages are bit-replayed by the
  // oracle: the md5 sample order, the x13 centroid/assignment CTE, and the
  // round-before-rank neighbor cut. Votes are integer counts, the majority
  // is max(count, then min label), the rate one rounded division. x109
  // keeps the brute-scored form as the ground-truth twin (x67-vs-x2
  // discipline); AnnAgreementSpec holds the two within tolerance.
  // ---------------------------------------------------------------------------
  private val knnSampleCap = 256

  /** The audit's query sample: `knnSampleCap` rows by signed md5-low-64 of
    * 'knn:'||vec_id (ties to vec_id) — deterministic, uniform, and O(n scan
    * + cap·log(cap) driver merge) at any corpus size. */
  private def knnAuditSample(emb: DataFrame): DataFrame =
    emb
      .withColumn("_h", graft.functions.HashFunctions.md5_lo64(
        concat(lit("knn:"), col("vec_id").cast("string"))))
      .orderBy(col("_h").asc, col("vec_id").asc)
      .limit(knnSampleCap)
      .drop("_h")

  /** Majority-vote agreement over a (query_id, neighbor_id) top-k set:
    * per-label query counts, agreements, and the agreement rate. */
  private def knnAgreement(topk: DataFrame, emb: DataFrame,
      sample: DataFrame): DataFrame = {
    val votes = topk
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("n_label")),
        "neighbor_id")
      .groupBy("query_id", "n_label").agg(count(lit(1)).as("c"))
    val best = votes.groupBy("query_id")
      .agg(max(struct(col("c"), (-col("n_label")).as("nl"))).as("m"))
      .select(col("query_id"), (-col("m.nl")).as("voted"))
    best
      .join(sample.select(col("vec_id").as("query_id"), col("label").as("q_label")),
        "query_id")
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("voted") === col("q_label"), 1L).otherwise(0L)).as("agree"))
      .select(col("label"), col("n_queries"), col("agree"),
        round(col("agree").cast("double") / col("n_queries").cast("double"), 6)
          .as("agree_rate"))
  }

  def x108KnnAgreement(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // same staged index as x13 — build-once/probe-many, the serving shape
    val stage = Staging.stageDir("graft_ivf_index_v4", "ivf", dir,
      Seq("embeddings.parquet")) { tmp =>
      Similarity.buildIvfIndexAuto(emb, tmp.toString)
    }
    val sample = knnAuditSample(emb)
    val topk = Similarity.cosineTopKIvfIndexed(spark, stage.toString, sample, k = 5)
    knnAgreement(topk, emb, sample)
  }

  /** x109 — the brute-scored ground-truth twin of x108 (same capped sample,
    * x8's exact plan): verification-only at driver SFs, like x2 for x67 —
    * its cost is cap·|corpus| by construction, so the IVF-probed x108 is
    * the scale path. */
  def x109KnnAgreementBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val sample = knnAuditSample(emb)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val topk = Similarity.cosineScores(emb, sample)
      .withColumn("cosine", round(col("cosine"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    knnAgreement(topk, emb, sample)
  }

  /** The md5-capped sample CTE shared by the x108/x109 oracles — the
    * engine's signed-low-64 ordering restated (md5_number_lower is unsigned
    * HUGEINT; two's-complement fold makes it the JVM long). */
  private val knnSampleCte =
    s"""samp AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  ORDER BY CASE WHEN md5_number_lower('knn:' || CAST(vec_id AS VARCHAR))
      |                     >= 9223372036854775808
      |            THEN CAST(md5_number_lower('knn:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |                 - 18446744073709551616
      |            ELSE CAST(md5_number_lower('knn:' || CAST(vec_id AS VARCHAR)) AS HUGEINT)
      |            END ASC, vec_id ASC
      |  LIMIT $knnSampleCap)""".stripMargin

  /** Vote/majority/agreement tail shared by both oracles (expects `topk` =
    * (query_id, neighbor_id) and `samp` in scope). */
  private val knnAgreementTailSql =
    """votes AS (
      |  SELECT t.query_id, e.label AS n_label, count(*) AS c
      |  FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id GROUP BY 1, 2),
      |best AS (
      |  SELECT query_id, n_label AS voted FROM (
      |    SELECT query_id, n_label, row_number() OVER (PARTITION BY query_id
      |      ORDER BY c DESC, n_label ASC) AS rn FROM votes)
      |  WHERE rn = 1),
      |ag AS (
      |  SELECT s.label AS label, CAST(count(*) AS BIGINT) AS n_queries,
      |    CAST(sum(CASE WHEN b.voted = s.label THEN 1 ELSE 0 END) AS BIGINT) AS agree
      |  FROM best b JOIN samp s ON s.vec_id = b.query_id GROUP BY 1)
      |SELECT label, n_queries, agree,
      |  round(CAST(agree AS DOUBLE) / CAST(n_queries AS DOUBLE), 6) AS agree_rate
      |FROM ag""".stripMargin

  private[queries] lazy val x108Sql =
    s"""WITH $ivfAssignCteAdaptive,
      |$knnSampleCte,
      |probes AS (
      |  SELECT vec_id AS query_id, embedding AS q_vec, centroid_id AS cluster_id
      |  FROM (
      |    SELECT s.vec_id, s.embedding, c.centroid_id,
      |      row_number() OVER (PARTITION BY s.vec_id
      |        ORDER BY list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
      |                                        CAST(c.centroid_vec AS DOUBLE[])) DESC,
      |                 c.centroid_id ASC) AS rn
      |    FROM samp s CROSS JOIN centroids c)
      |  WHERE rn <= 4),
      |scored AS (
      |  SELECT DISTINCT p.query_id, a.neighbor_id,
      |    round(list_cosine_similarity(CAST(p.q_vec AS DOUBLE[]),
      |                                 CAST(a.c_vec AS DOUBLE[])), 6) AS cosine
      |  FROM probes p JOIN assigned a ON p.cluster_id = a.cluster_id
      |  WHERE p.query_id <> a.neighbor_id),
      |topk AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
      |  WHERE rank <= 5),
      |$knnAgreementTailSql""".stripMargin

  private[queries] lazy val x109Sql =
    s"""WITH $knnSampleCte,
      |scored AS (
      |  SELECT s.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
      |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cosine
      |  FROM samp s JOIN embeddings e ON s.vec_id <> e.vec_id),
      |topk AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
      |  WHERE rank <= 5),
      |$knnAgreementTailSql""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x101_survival" -> (x101Survival _),
    "x102_burstiness" -> (x102Burstiness _),
    "x103_cusum" -> (x103Cusum _),
    "x104_acf" -> (x104Acf _),
    "x105_zipf_slope" -> (x105ZipfSlope _),
    "x106_hill_tail" -> (x106HillTail _),
    "x107_chi2_mix" -> (x107Chi2 _),
    "x108_knn_agreement" -> (x108KnnAgreement _),
    "x109_knn_agreement_brute" -> (x109KnnAgreementBrute _),
    "x99_winsorize" -> (x99Winsorize _),
    "x100_vocab_growth" -> (x100VocabGrowth _),
    "x98_neyman_alloc" -> (x98Neyman _),
    "x95_bigram_xent" -> (x95BigramXent _),
    "x96_benford" -> (x96Benford _),
    "x97_gini" -> (x97Gini _),
    "x85_sorted_neighborhood" -> (x85SortedNeighborhood _),
    "x87_silhouette" -> (x87Silhouette _),
    "x86_fuzzy_block" -> (x86FuzzyBlock _),
    "x110_fuzzy_summary" -> (x110FuzzySummary _),
    "x111_fuzzy_topk" -> (x111FuzzyTopk _),
    "x84_cms_heavy" -> (x84CmsHeavy _),
    "x88_containment_pairs" -> (x88ContainmentPairs _),
    "x89_novelty" -> (x89Novelty _),
    "x90_kanon_ladder" -> (x90KanonLadder _),
    "x91_ks_matrix" -> (x91KsMatrix _),
    "x92_memorization" -> (x92Memorization _),
    "x93_kcenter_coreset" -> (x93KcenterCoreset _),
    "x94_entropy_rate" -> (x94EntropyRate _),
    "x79_triangles" -> (x79Triangles _),
    "x80_vocab_spectrum" -> (x80VocabSpectrum _),
    "x81_psi_drift" -> (x81PsiDrift _),
    "x82_quantile_calib" -> (x82QuantileCalib _),
    "x83_dedup_sweep" -> (x83DedupSweep _),
    "x64_seeded_shuffle" -> (x64SeededShuffle _),
    "x68_column_profile" -> (x68ColumnProfile _),
    "x73_pca_component" -> (x73PcaComponent _),
    "x77_maxsim_retrieval" -> (x77MaxsimRetrieval _),
    "x78_filter_matrix" -> (x78FilterMatrix _),
    "x74_random_projection" -> (x74RandomProjection _),
    "x75_snapshot_diff" -> (x75SnapshotDiff _),
    "x76_projected_recall" -> (x76ProjectedRecall _),
    "x69_next_event_pairs" -> (x69NextEventPairs _),
    "x70_pagerank" -> (x70PageRank _),
    "x71_decayed_activity" -> (x71DecayedActivity _),
    "x72_rendezvous_shards" -> (x72RendezvousShards _),
    "x65_pmi_pairs" -> (x65PmiPairs _),
    "x66_zorder_layout" -> (x66ZorderLayout _),
    "x67_ppjoin_pairs" -> (x67PpjoinPairs _),
    "x20_quality_filter" -> (x20QualityFilter _),
    "x16_dup_clusters" -> (x16DupClusters _),
    "x46_canonical_docs" -> (x46CanonicalDocs _),
    "x47_mixture_plan" -> (x47MixturePlan _),
    "x48_leakage_split" -> (x48LeakageSafeSplit _),
    "x49_frequency_cap" -> (x49FrequencyCap _),
    "x50_weighted_sample" -> (x50WeightedSample _),
    "x51_centroid_outliers" -> (x51CentroidOutliers _),
    "x52_datacard" -> (x52Datacard _),
    "x53_cross_source_leakage" -> (x53CrossSourceLeakage _),
    "x54_kmeans_refine" -> (x54KmeansRefine _),
    "x55_chunk_dedup" -> (x55ChunkDedup _),
    "x56_tfidf_terms" -> (x56TfidfTerms _),
    "x57_curriculum" -> (x57Curriculum _),
    "x58_graph_degree" -> (x58GraphDegree _),
    "x59_mmr_rerank" -> (x59MmrRerank _),
    "x60_tokenizer_stats" -> (x60TokenizerStats _),
    "x61_ndcg_ivf" -> (x61NdcgIvf _),
    "x62_length_match" -> (x62LengthMatch _),
    "x63_centroid_drift" -> (x63CentroidDrift _),
    "x17_stratified_sample" -> (x17StratifiedSample _),
    "x18_token_shards" -> (x18TokenShards _),
    "x19_ngram_topk" -> (x19NgramTopk _),
    "x11_media_budget" -> (x11MediaBudget _),
    "x15_embedding_pairs_lsh" -> (x15EmbeddingPairsLsh _),
    "x12_media_features" -> (x12MediaFeatures _),
    "x22_frame_sample" -> (x22FrameSample _),
    "x23_resize" -> (x23Resize _),
    "x26_audio_segments" -> (x26AudioSegments _),
    "x27_bloom_admit" -> (x27BloomAdmit _),
    "x28_redact" -> (x28Redact _),
    "x29_chunks" -> (x29Chunks _),
    "x30_contamination" -> (x30Contamination _),
    "x31_salted_agg" -> (x31SaltedAgg _),
    "x32_corpus_mix" -> (x32CorpusMix _),
    "x33_quantize_int8" -> (x33QuantizeInt8 _),
    "x34_quantized_knn" -> (x34QuantizedKnn _),
    "x35_quantized_ivf" -> (x35QuantizedIvf _),
    "x36_bpe_tokens" -> (x36BpeTokens _),
    "x37_bm25" -> (x37Bm25 _),
    "x38_repetition" -> (x38Repetition _),
    "x39_semantic_dup" -> (x39SemanticDup _),
    "x40_lm_quality" -> (x40LmQuality _),
    "x41_dup_spans" -> (x41DupSpans _),
    "x42_dsir_weights" -> (x42DsirWeights _),
    "x43_hybrid_rrf" -> (x43HybridRrf _),
    "x44_ann_recall" -> (x44AnnRecall _),
    "x45_span_removal" -> (x45SpanRemoval _),
    "x24_topk_agg" -> (x24TopkAgg _),
    "x25_top_terms" -> (x25TopTerms _),
    "x1_exact_dedup" -> (x1ExactDedup _),
    "x2_jaccard_pairs" -> (x2JaccardPairs _),
    "x3_minhash_pairs" -> (x3MinhashPairs _),
    "x21_incremental_dedup" -> (x21IncrementalDedup _),
    "x4_simhash_pairs" -> (x4SimhashPairs _),
    "x5_text_stats" -> (x5TextStats _),
    "x6_lang_id" -> (x6LangId _),
    "x7_fingerprints" -> (x7Fingerprints _),
    "x8_knn_brute" -> (x8KnnBrute _),
    "x9_knn_lsh" -> (x9KnnLsh _),
    "x13_knn_ivf" -> (x13KnnIvf _),
    "x14_winnow_pairs" -> (x14WinnowPairs _),
    "x10_embedding_pairs" -> (x10EmbeddingPairs _))

  val oracleSql: Map[String, String] = Map(
    "x64_seeded_shuffle" -> x64Sql,
    "x65_pmi_pairs" -> x65Sql,
    "x66_zorder_layout" -> x66Sql,
    "x67_ppjoin_pairs" -> x2Sql,
    "x68_column_profile" -> x68Sql,
    "x69_next_event_pairs" -> x69Sql,
    "x70_pagerank" -> x70Sql,
    "x71_decayed_activity" -> x71Sql,
    "x72_rendezvous_shards" -> x72Sql,
    "x73_pca_component" -> x73Sql,
    "x74_random_projection" -> x74Sql,
    "x75_snapshot_diff" -> x75Sql,
    "x76_projected_recall" -> x76Sql,
    "x77_maxsim_retrieval" -> x77Sql,
    "x78_filter_matrix" -> x78Sql,
    "x79_triangles" -> x79Sql,
    "x80_vocab_spectrum" -> x80Sql,
    "x81_psi_drift" -> x81Sql,
    "x82_quantile_calib" -> x82Sql,
    "x83_dedup_sweep" -> x83Sql,
    "x84_cms_heavy" -> x84Sql,
    "x85_sorted_neighborhood" -> x85Sql,
    "x87_silhouette" -> x87Sql,
    "x86_fuzzy_block" -> x86Sql,
    "x110_fuzzy_summary" -> x110Sql,
    "x111_fuzzy_topk" -> x111Sql,
    "x88_containment_pairs" -> x88Sql,
    "x89_novelty" -> x89Sql,
    "x90_kanon_ladder" -> x90Sql,
    "x91_ks_matrix" -> x91Sql,
    "x92_memorization" -> x92Sql,
    "x93_kcenter_coreset" -> x93Sql,
    "x94_entropy_rate" -> x94Sql,
    "x95_bigram_xent" -> x95Sql,
    "x96_benford" -> x96Sql,
    "x97_gini" -> x97Sql,
    "x98_neyman_alloc" -> x98Sql,
    "x99_winsorize" -> x99Sql,
    "x100_vocab_growth" -> x100Sql,
    "x101_survival" -> x101Sql,
    "x102_burstiness" -> x102Sql,
    "x103_cusum" -> x103Sql,
    "x104_acf" -> x104Sql,
    "x105_zipf_slope" -> x105Sql,
    "x106_hill_tail" -> x106Sql,
    "x107_chi2_mix" -> x107Sql,
    "x108_knn_agreement" -> x108Sql,
    "x109_knn_agreement_brute" -> x109Sql,
    "x9_knn_lsh" -> x9Sql,
    "x13_knn_ivf" -> x13Sql,
    "x15_embedding_pairs_lsh" -> x15Sql,
    "x20_quality_filter" -> x20Sql,
    "x16_dup_clusters" -> x16Sql,
    "x46_canonical_docs" -> x46Sql,
    "x47_mixture_plan" -> x47Sql,
    "x48_leakage_split" -> x48Sql,
    "x49_frequency_cap" -> x49Sql,
    "x50_weighted_sample" -> x50Sql,
    "x51_centroid_outliers" -> x51Sql,
    "x52_datacard" -> x52Sql,
    "x53_cross_source_leakage" -> x53Sql,
    "x54_kmeans_refine" -> x54Sql,
    "x55_chunk_dedup" -> x55Sql,
    "x56_tfidf_terms" -> x56Sql,
    "x57_curriculum" -> x57Sql,
    "x58_graph_degree" -> x58Sql,
    "x59_mmr_rerank" -> x59Sql,
    "x60_tokenizer_stats" -> x60Sql,
    "x61_ndcg_ivf" -> x61Sql,
    "x62_length_match" -> x62Sql,
    "x63_centroid_drift" -> x63Sql,
    "x17_stratified_sample" -> x17Sql,
    "x18_token_shards" -> x18Sql,
    "x19_ngram_topk" -> x19Sql,
    "x11_media_budget" -> x11Sql,
    "x12_media_features" -> x12Sql,
    "x22_frame_sample" -> x22Sql,
    "x23_resize" -> x23Sql,
    "x26_audio_segments" -> x26Sql,
    "x27_bloom_admit" -> x27Sql,
    "x28_redact" -> x28Sql,
    "x29_chunks" -> x29Sql,
    "x30_contamination" -> x30Sql,
    "x31_salted_agg" -> x31Sql,
    "x32_corpus_mix" -> x32Sql,
    "x33_quantize_int8" -> x33Sql,
    "x34_quantized_knn" -> x34Sql,
    "x35_quantized_ivf" -> x35Sql,
    "x36_bpe_tokens" -> x36Sql,
    "x37_bm25" -> x37Sql,
    "x38_repetition" -> x38Sql,
    "x39_semantic_dup" -> x39Sql,
    "x40_lm_quality" -> x40Sql,
    "x41_dup_spans" -> x41Sql,
    "x42_dsir_weights" -> x42Sql,
    "x43_hybrid_rrf" -> x43Sql,
    "x44_ann_recall" -> x44Sql,
    "x45_span_removal" -> x45Sql,
    "x24_topk_agg" -> x24Sql,
    "x25_top_terms" -> x25Sql,
    "x1_exact_dedup" -> x1Sql,
    "x2_jaccard_pairs" -> x2Sql,
    "x3_minhash_pairs" -> x2Sql, // identical by construction (exact verify step)
    "x21_incremental_dedup" -> x21Sql,
    "x4_simhash_pairs" -> x4Sql,
    "x5_text_stats" -> x5Sql,
    "x6_lang_id" -> x6Sql,
    "x7_fingerprints" -> x7Sql,
    "x8_knn_brute" -> x8Sql,
    "x14_winnow_pairs" -> x14Sql,
    "x10_embedding_pairs" -> x10Sql)
}
