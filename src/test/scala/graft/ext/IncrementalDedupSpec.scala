package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup (new batch vs persisted corpus index): results must
  * equal the exact cross-side jaccard ground truth, the admission anti-join
  * must drop exactly the matched docs, and the bucketed index must save the
  * corpus-side shuffle a plain parquet index pays. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val wh = new java.net.URI(
    SparkTestSession.spark.conf.get("spark.sql.warehouse.dir")).getPath
  private def freshTable(name: String): String = {
    if (spark.catalog.tableExists(name)) spark.sql(s"DROP TABLE $name")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, name))
    name
  }

  // docs 1/2 near-dup, 3 unique, 4 exact-dup of 2, 5 unique
  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tomorrow"),
    (3L, "completely different text about spark physical planning"),
    (4L, "the quick brown fox jumps over the lazy dog tomorrow"),
    (5L, "yet another unrelated document concerning parquet files")
  ).toDF("doc_id", "text")

  test("probe against the index equals the exact cross-side jaccard ground truth") {
    val corpus = docs.filter($"doc_id" <= 2) // 1, 2 indexed
    val batch = docs.filter($"doc_id" >= 3) // 3, 4, 5 incoming
    val t = freshTable("graft_test_mh_idx")
    Dedup.buildMinhashIndex(corpus, t)
    val got = Dedup.dedupAgainstIndex(spark, t, batch, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // ground truth from the exact all-pairs path, restricted to cross-side
    val truth = Dedup.jaccardPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      .filter { case ((a, b), _) => (a <= 2) != (b <= 2) }
      .map { case ((a, b), j) => // orient as (new, corpus)
        (if (a >= 3) (a, b) else (b, a)) -> j }
    assert(got === truth)
    assert(got.contains((4L, 2L)), "exact dup of an indexed doc must match")
  }

  test("dedupNewBatch admits exactly the unmatched docs") {
    val t = freshTable("graft_test_mh_idx2")
    Dedup.buildMinhashIndex(docs.filter($"doc_id" <= 2), t)
    val admitted = Dedup.dedupNewBatch(spark, t, docs.filter($"doc_id" >= 3), 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(admitted === Seq(3L, 5L)) // 4 is a dup of indexed 2
  }

  test("bloom-prefiltered admission equals the plain anti-join bitwise") {
    val corpus = docs.filter($"doc_id" <= 2)
    val batch = docs.filter($"doc_id" >= 3)
    val got = Dedup.bloomAdmit(corpus, batch)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    def fp(d: org.apache.spark.sql.DataFrame) = d.withColumn("norm_fp",
      md5(regexp_replace(lower(trim($"text")), "\\s+", " ")))
    val want = fp(batch).join(fp(corpus).select("norm_fp"), Seq("norm_fp"), "left_anti")
      .select("doc_id", "norm_fp")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === want)
    // doc 4 is an exact dup of corpus doc 2 — the filter must catch it
    assert(!got.map(_._1).contains(4L))
    assert(got.map(_._1).toSeq === Seq(3L, 5L))
  }

  test("bloom admission result is independent of fpp (false positives only re-route)") {
    val corpus = docs.filter($"doc_id" <= 2)
    val batch = docs.filter($"doc_id" >= 3)
    // loose fpp pushes more rows down the candidate/anti-join branch; tight
    // fpp sends true-new rows down the no-join branch — the admitted SET
    // must not move
    val loose = Dedup.bloomAdmit(corpus, batch, fpp = 0.1)
      .select("doc_id").as[Long].collect().sorted
    val tight = Dedup.bloomAdmit(corpus, batch, fpp = 0.0001)
      .select("doc_id").as[Long].collect().sorted
    assert(loose === tight)
    assert(loose === Seq(3L, 5L))
  }

  test("bucketed index: the probe join does not reshuffle the corpus side") {
    // force the sort-merge shape (at scale BOTH sides exceed any broadcast
    // threshold — a tiny test batch would broadcast and hide the bucketing)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val t = freshTable("graft_test_mh_idx3")
      Dedup.buildMinhashIndex(docs, t)
      val bucketedPlan = Dedup.dedupAgainstIndex(spark, t, docs, 0.5)
        .queryExecution.executedPlan.toString

      // twin with the same data as a PLAIN parquet table (no bucketing)
      val plain = freshTable("graft_test_mh_plain")
      spark.table(t).write.format("parquet").saveAsTable(plain)
      val plainPlan = Dedup.dedupAgainstIndex(spark, plain, docs, 0.5)
        .queryExecution.executedPlan.toString

      def exchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges(bucketedPlan) === exchanges(plainPlan) - 1,
        s"bucketed:\n$bucketedPlan\nplain:\n$plainPlan")
      assert(bucketedPlan.contains("Bucketed: true"), bucketedPlan)
    } finally spark.conf.set(key, prev)
  }
}
