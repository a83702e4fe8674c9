package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for optimization rounds — times labeled
  * sub-pipelines of a query in one warm session. Not part of any gate. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32, "graft-profile")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.Tables.embeddings(spark, dir).count() // warm

    time("x59 full warm1")(noop(graft.queries.ExtensionQueries.x59MmrRerank(spark, dir)))
    time("x59 full warm2")(noop(graft.queries.ExtensionQueries.x59MmrRerank(spark, dir)))

    // x59 pieces
    val emb = graft.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 4)
    val scored = time("cosineScores+pool") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("rel").desc, col("cand_id").asc)
      val p = graft.ext.Similarity.cosineScores(emb, queries)
        .withColumn("rel", round(col("cosine"), 6))
        .select(col("query_id"), col("neighbor_id").as("cand_id"), col("rel"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 12).drop("rn")
        .localCheckpoint()
      println("[profile] pool rows = " + p.count()); p
    }

    time("x54 full warm1")(noop(graft.queries.ExtensionQueries.x54KmeansRefine(spark, dir)))
    time("x54 full warm2")(noop(graft.queries.ExtensionQueries.x54KmeansRefine(spark, dir)))
    time("x57 full warm1")(noop(graft.queries.ExtensionQueries.x57Curriculum(spark, dir)))
    time("x57 full warm2")(noop(graft.queries.ExtensionQueries.x57Curriculum(spark, dir)))

    // x57 pieces
    val docs = graft.Tables.documents(spark, dir)
    val q = graft.ext.TextStats.qualityScore(docs).select(col("doc_id"), col("quality_score"))
    time("x57 quality alone")(noop(q))

    // x94 pieces
    time("x94 full warm1")(noop(graft.queries.ExtensionQueries.x94EntropyRate(spark, dir)))
    time("x94 full warm2")(noop(graft.queries.ExtensionQueries.x94EntropyRate(spark, dir)))
    spark.stop()
  }
}
