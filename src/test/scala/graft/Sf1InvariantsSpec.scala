package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side 10x correctness for the oracle-excluded quadratic-twin set
  * (x67/x76/x79/x83/x108): their DuckDB replays are the quadratic side at
  * sf1, so the gate covers them only at the driver SFs — these invariants
  * close the gap by checking the ENGINE output at sf1 against structure we
  * know independently:
  *   - ScaleUp copies document text VERBATIM with doc_id strides, so every
  *     base doc plants C(copies,2) exact-duplicate pairs — a ground-truth
  *     completeness probe for the prefix-filtered Jaccard join;
  *   - pair soundness re-verifies reported jaccards from raw text in plain
  *     Scala (no engine code shared with the path under test);
  *   - triangle counts are re-derived from the same edge set via the
  *     a<b<c enumeration (a different join shape than the degree-ordered
  *     wedge plan) and must match bitwise;
  *   - the x83 sweep must be monotone and its 0.8 row must equal the
  *     direct x67 run at 0.8 (generate-at-0.7-then-filter == generate-at-
  *     0.8, a cross-plan pigeonhole identity);
  *   - x108's IVF-probed agreement must track the x109 brute twin on the
  *     identical 256-cap sample.
  *
  * Gated on SPARK_GRAFT_SF1_DIR (tools/sf1_invariants.sh sets it): absent
  * -> every test cancels, so plain `sbt test` stays sf1-independent. */
class Sf1InvariantsSpec extends AnyFunSuite {

  private val dirOpt = sys.env.get("SPARK_GRAFT_SF1_DIR")
    .filter(d => new java.io.File(s"$d/documents.parquet").exists)
  private def dir = dirOpt.get
  private val Stride = 1000000000L // ScaleUp's copy stride
  private val Copies = 10

  // standalone runs (tools/sf1_invariants.sh) get a 10x-sized session; if
  // another suite already built the local[4] test session in this JVM,
  // getOrCreate reuses it — config differs, semantics don't
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${math.min(Runtime.getRuntime.availableProcessors, 32)}]")
      .appName("graft-sf1-invariants")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** The engine's shingle definition, reimplemented flat in Scala for the
    * independent soundness replay (3-gram word shingles on space-split
    * trimmed text, distinct). */
  private def shingleSet(text: String): Set[String] = {
    val w = text.trim.split(" ", -1)
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("x67 at sf1: planted 10-way clone pairs all present at jaccard 1.0") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val pairs = q("x67_ppjoin_pairs").select("doc_a", "doc_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // canonical orientation, no duplicates
    assert(pairs.keys.forall { case (a, b) => a < b }, "pairs must be a<b")
    // sample base docs (copy 0) with a non-empty shingle set: every cross-
    // copy pair of their verbatim clones MUST be found (jaccard exactly 1)
    val bases = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < Stride)
      .select("doc_id", "text").collect()
      .filter(r => shingleSet(r.getString(1)).nonEmpty)
      .map(_.getLong(0)).sorted.take(20)
    assert(bases.length == 20, s"need 20 shingled base docs, got ${bases.length}")
    bases.foreach { d =>
      for (i <- 0 until Copies; j <- (i + 1) until Copies) {
        val key = (d + i * Stride, d + j * Stride)
        assert(pairs.contains(key), s"planted clone pair $key missing from x67")
        assert(pairs(key) == 1.0, s"clone pair $key must score exactly 1.0")
      }
    }
    // soundness: re-verify 50 reported pairs from raw text in plain Scala
    val probe = pairs.keys.toSeq.sortBy(identity).take(50)
    val ids = probe.flatMap(p => Seq(p._1, p._2)).distinct
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isInCollection(ids))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    probe.foreach { case (a, b) =>
      val sa = shingleSet(texts(a)); val sb = shingleSet(texts(b))
      val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
      assert(jac >= 0.8, s"reported pair ($a,$b) fails the exact recheck: $jac")
      assert(math.abs(jac - pairs((a, b))) < 1e-12,
        s"reported jaccard drifts from the text recheck at ($a,$b)")
    }
  }

  test("x83 at sf1: sweep is monotone and its 0.8 row equals a direct x67 run") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val sweep = q("x83_dedup_sweep")
      .select("threshold", "n_pairs", "n_dominated_docs", "dominated_tokens")
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sweep.keySet == Set(0.7, 0.8, 0.9), s"threshold grid: ${sweep.keySet}")
    Seq((0.7, 0.8), (0.8, 0.9)).foreach { case (lo, hi) =>
      assert(sweep(lo)._1 >= sweep(hi)._1, s"n_pairs must fall $lo->$hi: $sweep")
      assert(sweep(lo)._2 >= sweep(hi)._2, s"dominated docs must fall: $sweep")
      assert(sweep(lo)._3 >= sweep(hi)._3, s"dominated tokens must fall: $sweep")
    }
    // cross-plan identity: generate-at-0.7-then-filter(>=0.8) must equal
    // generate-at-0.8 (both pigeonhole-complete + exact-verified)
    val direct = q("x67_ppjoin_pairs").count()
    assert(sweep(0.8)._1 == direct,
      s"sweep 0.8 row (${sweep(0.8)._1}) != direct x67 run ($direct)")
  }

  test("x79 at sf1: degree-ordered wedge counts equal the a<b<c enumeration") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val docs = Tables.documents(spark, dir)
    val edges = graft.ext.Dedup.nearDupMinhashCollapsed(docs, 0.8)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .distinct().localCheckpoint()
    // independent formulation: enumerate each triangle once as a<b<c via
    // two joins on the canonical edge list, then count corners
    val e = edges
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("u"), col("e1.b").as("v"), col("e2.b").as("w"))
    val expect = tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = q("x79_triangles")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect,
      s"triangle census mismatch: ${got.size} vs ${expect.size} nodes; " +
        s"sample diff ${(got.toSet diff expect.toSet).take(3)}")
    assert(got.values.sum % 3 == 0, "handshake parity: corner sum = 3*|triangles|")
  }

  test("x76 at sf1: projected recall deterministic, bounded, 10 query rows") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val a = q("x76_projected_recall").collect().map(_.toString).sorted.toSeq
    val b = q("x76_projected_recall").collect().map(_.toString).sorted.toSeq
    assert(a == b, "projected recall must be bitwise deterministic at 10x")
    val rows = q("x76_projected_recall")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10, s"copy-0 preserves the 10 query vectors: ${rows.length}")
    assert(rows.forall(r => r._2 >= 0L && r._2 <= 5L), s"hits in [0,5]: ${rows.toSeq}")
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0), s"recall in [0,1]: ${rows.toSeq}")
  }

  test("x108 at sf1: IVF-probed agreement tracks the x109 brute twin") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val ivf = q("x108_knn_agreement")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val brute = q("x109_knn_agreement_brute")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(ivf.keySet == brute.keySet, s"label partition: $ivf vs $brute")
    assert(ivf.keySet.forall(l => ivf(l)._1 == brute(l)._1),
      "the md5-capped sample must be identical on both paths")
    assert(ivf.values.map(_._1).sum == 256L, "sample is the absolute 256 cap")
    ivf.keySet.foreach { l =>
      assert(math.abs(ivf(l)._3 - brute(l)._3) <= 0.34,
        s"IVF agreement must track brute within recall tolerance at $l: " +
          s"${ivf(l)} vs ${brute(l)}")
    }
  }
}
