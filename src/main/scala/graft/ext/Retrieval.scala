package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the documents table — the data-SELECTION side of a
  * training pipeline (pull the documents most relevant to a target domain /
  * eval task; score corpora against probe queries; build retrieval-augmented
  * training sets).
  *
  * [[bm25]] is the standard Okapi BM25 ranking function (Robertson et al.):
  *
  *   score(d, Q) = sum over t in Q of
  *     idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl))
  *   idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)
  *
  * Scale shape: the query term set is tiny and lives in the plan as an IN
  * literal, so the token explode is filtered AT THE SCAN side before any
  * shuffle — the corpus pays one narrow pass plus aggregations over only the
  * matching (doc, term) pairs. Corpus-level constants (N, total length) are
  * a one-row aggregate broadcast into the scorer; document frequencies are a
  * |Q|-row aggregate. Nothing global materializes.
  *
  * Determinism: tf/df/dl/N are exact integers; avgdl is one exact-integer
  * division; the only libm call is the idf ln. Like the cosine paths (x9/
  * x13), the final score is rounded to 6dp BEFORE the rank cut with ties to
  * doc_id, so sub-ulp libm variation between engines cannot flip ranks and
  * the DuckDB oracle replays the ranking bit for bit.
  */
object Retrieval {

  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val d = graft.ops.Par.fanOut(docs)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")))
    // corpus constants: one-row aggregate, broadcast into the scorer
    val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = d
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    scoreAndRank(tf, stats, k, k1, b)
  }

  /** Build and PERSIST the term index behind [[bm25FromIndex]]:
    * `path/doclens` (doc_id, dl) and `path/postings` (doc_id, dl, term, tf)
    * — the classical inverted file, the structure every production retrieval
    * stack pays ONCE so that probes touch |query terms| postings lists
    * instead of re-tokenizing the corpus per query. Postings are
    * range-partitioned and sorted by term so a probe's IN-literal filter
    * prunes at row-group granularity (min/max stats), the parquet stand-in
    * for a postings-list seek. */
  def buildTermIndex(docs: DataFrame, path: String,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val d = graft.ops.Par.fanOut(docs)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("toks"))
      .withColumn("dl", size(col("toks")))
    d.select(col("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(s"$path/doclens")
    d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/postings")
  }

  /** [[bm25]] served from a persisted [[buildTermIndex]]: same integers
    * (tf/df/dl/N), same scoring expression, bit-identical ranking — but a
    * probe reads the probe terms' postings rows plus the doclens spine
    * instead of tokenizing the corpus. `filterDocs` restricts the corpus
    * (e.g. excluding the probe document) — applied to BOTH postings and
    * doclens, exactly like filtering the docs frame before [[bm25]]. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      filterDocs: Column = lit(true)): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val doclens = spark.read.parquet(s"$path/doclens").filter(filterDocs)
    val stats = doclens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(queryTerms: _*) && filterDocs)
    scoreAndRank(tf, stats, k, k1, b)
  }

  /** Shared BM25 scoring tail: `tf` is (doc_id, dl, term, tf), `stats` the
    * one-row (n_docs, sum_dl). Expression association mirrors the oracle
    * SQL verbatim: idf * ((tf * (k1+1)) / (tf + k1 * (1 - b + b * (dl /
    * avgdl)))). Top-k via orderBy.limit = TakeOrderedAndProject (per-
    * partition heaps, k-row driver merge — nothing global materializes);
    * the rank window runs AFTER the limit, over k rows, never the corpus. */
  private def scoreAndRank(tf: DataFrame, stats: DataFrame,
      k: Int, k1: Double, b: Double): DataFrame = {
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf").cast("double") * lit(k1 + 1)) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfn)
      .groupBy("doc_id")
      .agg(round(sum(col("term_score")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)))
      .select("doc_id", "score", "rank")
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.): fuse the
    * BM25 ranking with a dense cosine ranking of the same corpus, score
    * 1/(kRrf + rank) summed over the lists a document appears in. The probe
    * is a (term set, query vector) pair; `queryVecId` names the corpus row
    * whose embedding is the dense probe (excluded from both pools).
    *
    * Scale shape: each leg ends in an orderBy.limit(poolK) =
    * TakeOrderedAndProject (per-partition heaps, poolK-row driver merge), so
    * the fusion join, the rank windows, and the final top-k all run over at
    * most 2*poolK rows — nothing global materializes after the two scans.
    * The two legs share no shuffle; at cluster scale they are independent
    * stages over the corpus (one text pass, one vector pass).
    *
    * Determinism: both leg scores are rounded to 6dp before their rank cut
    * (the cross-engine-stable-ordering trick), the RRF terms are exact-input
    * IEEE divisions summed in a fixed order (sparse + dense), and the fused
    * score is rounded to 6dp before the final cut with ties to doc_id — the
    * oracle replays the ranking bit for bit. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
      queryVecId: Long, k: Int = 10, poolK: Int = 20, kRrf: Int = 60,
      textCol: String = "text", docIdCol: String = "doc_id",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sparse = bm25(docs.filter(col(docIdCol) =!= queryVecId), queryTerms,
        k = poolK, textCol = textCol, idCol = docIdCol)
      .select(col("doc_id"), col("rank").as("sparse_rank"))
    fuseRrf(sparse, denseLeg(emb, queryVecId, poolK, vecIdCol, vecCol), k, kRrf)
  }

  /** [[hybridRrf]] with the BM25 leg served from a persisted
    * [[buildTermIndex]] — bit-identical fusion, but the text pass is a
    * postings probe instead of a corpus re-tokenization. */
  def hybridRrfFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      emb: DataFrame, queryTerms: Seq[String], queryVecId: Long,
      k: Int = 10, poolK: Int = 20, kRrf: Int = 60,
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sparse = bm25FromIndex(spark, path, queryTerms, k = poolK,
        filterDocs = col("doc_id") =!= queryVecId)
      .select(col("doc_id"), col("rank").as("sparse_rank"))
    fuseRrf(sparse, denseLeg(emb, queryVecId, poolK, vecIdCol, vecCol), k, kRrf)
  }

  /** Dense leg: brute cosine vs the probe vector, rounded, TakeOrdered top
    * poolK; the rank window runs AFTER the limit, over poolK rows. */
  private def denseLeg(emb: DataFrame, queryVecId: Long, poolK: Int,
      vecIdCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Similarity.cosineScores(
        emb.filter(col(vecIdCol) =!= queryVecId),
        emb.filter(col(vecIdCol) === queryVecId), vecIdCol, vecCol)
      .withColumn("cosine", round(col("cosine"), 6))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
      .limit(poolK)
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .select(col("neighbor_id").as("doc_id"), col("dense_rank"))
  }

  private def fuseRrf(sparse: DataFrame, dense: DataFrame,
      k: Int, kRrf: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rrfTerm = (r: Column) =>
      when(r.isNotNull, lit(1.0) / (lit(kRrf) + r).cast("double")).otherwise(lit(0.0))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        round(rrfTerm(col("sparse_rank")) + rrfTerm(col("dense_rank")), 6))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
    fused.withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("doc_id").asc)))
      .select("doc_id", "sparse_rank", "dense_rank", "rrf_score", "rank")
  }
}
