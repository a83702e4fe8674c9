package graft.ext

import graft.functions.VectorFunctions.{cosine_sim, dot_product}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the query set against the corpus, score
  *    with the codegen'd CosineSim expression, per-query window top-k. Exact;
  *    cost = |queries| x |corpus| — the baseline and the verification oracle.
  *  - LSH (random hyperplane) ANN: per-row signatures, multi-table bucket
  *    join for candidates, exact re-score on candidates, top-k. At 100 TB the
  *    corpus side stays partitioned by bucket and only candidate buckets are
  *    scored (|candidates| << |corpus|).
  *
  * Hyperplanes are generated deterministically from xxhash64(table, plane,
  * dim) — no RNG state, identical across executors, reproducible run-to-run.
  */
object Similarity {

  /** Brute-force exact top-k: for each query row, the k nearest corpus rows
    * by cosine (self-match excluded). Queries are broadcast — the corpus is
    * never shuffled, and the window partitions by query id only. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Random-hyperplane signature for one LSH table: `bits` sign bits packed
    * into a long. Per-row arithmetic only. */
  def hyperplaneSignature(vecColName: String, table: Int, bits: Int = 16): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint), (acc, p) ->
       |  acc + shiftleft(CASE WHEN aggregate(
       |    sequence(0, size($vecColName) - 1), cast(0.0 as double),
       |    (s, d) -> s + $vecColName[d] * (cast(xxhash64($table, p, d) as double) / 9.223372036854776e18)
       |  ) >= 0 THEN cast(1 as bigint) ELSE cast(0 as bigint) END, p))""".stripMargin)

  /** ANN top-k via multi-table hyperplane LSH: rows sharing a signature in
    * any table are candidates; candidates are re-scored exactly and top-k'd.
    * Recall grows with `tables`; cost with bucket collision rate (2^-bits). */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {

    def signed(df: DataFrame, id: String, vec: String): DataFrame = {
      val withSigs = (0 until tables).foldLeft(
        df.select(col(idCol).as(id), col(vecCol).as(vec)))(
        (d, t) => d.withColumn(s"_sig$t", hyperplaneSignature(vec, t, bits)))
      withSigs.select(col(id), col(vec),
        posexplode(array((0 until tables).map(t => col(s"_sig$t")): _*)).as(Seq("table_id", "sig")))
    }

    val qs = signed(queries, "query_id", "q_vec")
    val cs = signed(corpus, "neighbor_id", "c_vec")
    val candidates = qs.join(cs, Seq("table_id", "sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_vec", "neighbor_id", "c_vec")
      .dropDuplicates("query_id", "neighbor_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("cosine", cosine_sim(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine >= the
    * threshold. Exact quadratic form — verification/small-scale; the LSH
    * bucket join above is the scale path for the same predicate. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = embeddings.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = embeddings.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine_sim(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }
}
