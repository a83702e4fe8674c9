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

  test("x16 at sf1: min-id labeling census; planted 10-way clone groups never fragment") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val cl = q("x16_dup_clusters").localCheckpoint()
    val docsN = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(cl.count() == docsN, "x16 must be total over documents")
    // per-cluster identities, checked for EVERY cluster distributed: the
    // label is the min member id, the size column is constant within the
    // cluster and equals the member count
    val bad = cl.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("mn"), count(lit(1)).as("n"),
        min(col("cluster_size")).as("s1"), max(col("cluster_size")).as("s2"))
      .filter(col("cluster_id") =!= col("mn") || col("n") =!= col("s1")
        || col("s1") =!= col("s2"))
      .count()
    assert(bad == 0, s"$bad clusters violate min-id/size identities")
    // planted cohesion: ScaleUp clones shingled base docs verbatim, so all
    // 10 copies of every shingled base MUST land in one cluster — checked
    // for every base, not a sample
    val shingledBases = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < Stride &&
        size(split(trim(col("text")), " ")) >= 3)
      .select(col("doc_id").as("base"))
    val frag = cl.withColumn("base", col("doc_id") % Stride)
      .join(shingledBases, "base")
      .groupBy("base").agg(countDistinct(col("cluster_id")).as("nc"))
      .filter(col("nc") =!= 1).count()
    assert(frag == 0, s"$frag planted clone groups fragment across clusters")
  }

  test("x46 at sf1: exactly one kept doc per cluster and it is the (score, -id) argmax") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val cd = q("x46_canonical_docs").localCheckpoint()
    val docsN = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(cd.count() == docsN, "x46 must be total over documents")
    val multi = cd.groupBy("cluster_id").agg(sum(col("kept")).as("k"))
      .filter(col("k") =!= 1).count()
    assert(multi == 0, s"$multi clusters do not keep exactly one doc")
    // the kept doc is the exact argmax of (quality_score DESC, doc_id ASC)
    // over its cluster — verified for EVERY cluster from the output itself
    val winner = cd.groupBy("cluster_id")
      .agg(max(struct(col("quality_score"), (-col("doc_id")).as("ni"))).as("w"))
      .select(col("cluster_id"), (-col("w.ni")).as("argmax_id"))
    val wrong = cd.filter(col("kept") === 1)
      .join(winner, "cluster_id")
      .filter(col("doc_id") =!= col("argmax_id")).count()
    assert(wrong == 0, s"$wrong clusters keep a non-argmax doc")
  }

  test("x48 at sf1: no cluster straddles the split; bucket rule and hash replayed") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val sp = q("x48_leakage_split").localCheckpoint()
    val straddle = sp.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") =!= 1).count()
    assert(straddle == 0, s"$straddle clusters straddle train/valid — the bug this op kills")
    // the split is the stated pure function of the bucket, every row
    val ruleBreak = sp.filter(
      (col("split_bucket") < 9000 && col("split") =!= "train") ||
      (col("split_bucket") >= 9000 && col("split") =!= "valid")).count()
    assert(ruleBreak == 0, s"$ruleBreak rows break the bucket<9000=train rule")
    // hash replay in plain Scala (no engine code) on 50 clusters: bucket =
    // unsigned md5-low-64 of "split:<cluster_id>" mod 10000
    val probe = sp.select("cluster_id", "split_bucket").distinct()
      .orderBy("cluster_id").limit(50).collect()
    probe.foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:${r.getLong(0)}".getBytes("UTF-8"))
      // md5-low-64 = bytes 8..15 read little-endian (DuckDB
      // md5_number_lower bit parity — the engine's convention)
      var low = 0L
      var i = 15
      while (i >= 8) { low = (low << 8) | (md(i) & 0xFFL); i -= 1 }
      val bucket = java.lang.Long.remainderUnsigned(low, 10000L).toInt
      assert(bucket == r.getInt(1),
        s"cluster ${r.getLong(0)}: engine bucket ${r.getInt(1)} != md5 replay $bucket")
    }
    // 90/10 by clusters within loose tolerance (hash uniformity, not exact)
    val byCluster = sp.select("cluster_id", "split").distinct()
    val frac = byCluster.filter(col("split") === "train").count().toDouble /
      byCluster.count().toDouble
    assert(frac > 0.85 && frac < 0.95, s"train cluster fraction $frac implausible for 0.9")
  }

  test("x53 at sf1: census equals an independent collect_set replay of (cluster, source)") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val got = q("x53_cross_source_leakage").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // independent shape: per-cluster source SETS collected, pairs expanded
    // in plain Scala — no self-join shared with the path under test
    val sets = q("x16_dup_clusters").select("doc_id", "cluster_id")
      .join(spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "source"), "doc_id")
      .groupBy("cluster_id").agg(collect_set(col("source")).as("ss"))
      .select("ss").collect().map(_.getSeq[String](0).sorted)
    val expect = scala.collection.mutable.Map[(String, String), Long]()
    sets.foreach { ss =>
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        expect((ss(i), ss(j))) = expect.getOrElse((ss(i), ss(j)), 0L) + 1L
    }
    assert(got == expect.toMap,
      s"cross-source census mismatch: $got vs ${expect.toMap}")
    assert(got.keys.forall { case (a, b) => a < b }, "canonical a<b orientation")
  }

  test("x88 at sf1: planted clone containment complete at exactly 1.0; raw-text recheck") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    import spark.implicits._
    val out = q("x88_containment_pairs").localCheckpoint()
    // completeness: verbatim clones contain each other in BOTH directions —
    // all 90 directed pairs for each of 20 sampled shingled bases
    val bases = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < Stride)
      .select("doc_id", "text").collect()
      .filter(r => shingleSet(r.getString(1)).nonEmpty)
      .map(_.getLong(0)).sorted.take(20)
    val expectPairs = (for {
      b <- bases.toSeq; i <- 0 until Copies; j <- 0 until Copies if i != j
    } yield (b + i * Stride, b + j * Stride)).toDF("doc_a", "doc_b")
    val found = out.join(expectPairs, Seq("doc_a", "doc_b"))
    assert(found.count() == 20L * Copies * (Copies - 1),
      "every directed clone pair must be reported")
    assert(found.filter(col("containment") =!= 1.0).count() == 0,
      "verbatim clones must score containment exactly 1.0")
    // soundness: 50 reported pairs rechecked from raw text in plain Scala
    val probe = out.orderBy("doc_a", "doc_b").limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = probe.flatMap(p => Seq(p._1, p._2)).distinct
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isInCollection(ids))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    probe.foreach { case (a, b, c) =>
      val sa = shingleSet(texts(a)); val sb = shingleSet(texts(b))
      val cont = sa.intersect(sb).size.toDouble / sa.size.toDouble
      assert(cont >= 0.9 && math.abs(cont - c) < 1e-12,
        s"reported containment ($a,$b,$c) fails the text recheck: $cont")
    }
  }

  test("x21 at sf1: equals x67's exact pair set restricted to the batch/corpus partition") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    // the incremental index path must lose nothing vs the one-shot exact
    // join: reorient x67's canonical a<b pairs to (new, corpus) and demand
    // set equality including the jaccard values
    val inc = q("x21_incremental_dedup")
      .select("doc_new", "doc_corpus", "jaccard").localCheckpoint()
    val full = q("x67_ppjoin_pairs")
      .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
      .select(
        when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b")).as("doc_new"),
        when(col("doc_a") % 10 === 0, col("doc_b")).otherwise(col("doc_a")).as("doc_corpus"),
        col("jaccard"))
      .localCheckpoint()
    assert(inc.count() == full.count(),
      s"pair count drift: incremental ${inc.count()} vs one-shot ${full.count()}")
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0,
      "incremental-index pairs must equal the one-shot exact join bitwise")
  }

  test("x27 at sf1: bloom-routed admission equals a spec-side exact anti-join") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val adm = q("x27_bloom_admit").localCheckpoint()
    val fp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("norm_fp"))
    val expect = fp.filter(col("doc_id") % 10 === 0)
      .join(fp.filter(col("doc_id") % 10 =!= 0).select("norm_fp").distinct(),
        Seq("norm_fp"), "left_anti")
      .select("doc_id", "norm_fp")
    assert(adm.count() == expect.count(),
      s"admission count drift: ${adm.count()} vs exact ${expect.count()}")
    assert(adm.exceptAll(expect).count() == 0 && expect.exceptAll(adm).count() == 0,
      "bloom routing must be result-invisible (no false negatives by law)")
  }

  test("x30 at sf1: orientation invariants hold everywhere; raw-text 8-gram recheck") {
    assume(dirOpt.isDefined, "SPARK_GRAFT_SF1_DIR not set — sf1 data absent")
    val out = q("x30_contamination").localCheckpoint()
    val badSide = out.filter(col("eval_doc") % 10 =!= 0 ||
      col("corpus_doc") % 10 === 0 || col("shared_ngrams") < 3).count()
    assert(badSide == 0, s"$badSide rows break eval/corpus orientation or the >=3 floor")
    // 50 reported rows rechecked from raw text in plain Scala (independent
    // 8-gram construction, exact shared count, exact IEEE ratio)
    val probe = out.orderBy("eval_doc", "corpus_doc").limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ids = probe.flatMap(p => Seq(p._1, p._2)).distinct
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isInCollection(ids))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams8(t: String): Set[String] = {
      val w = t.trim.split(" ", -1)
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    probe.foreach { case (e, c, shared, cont) =>
      val se = grams8(texts(e)); val sc = grams8(texts(c))
      val inter = se.intersect(sc).size.toLong
      assert(inter == shared && cont == inter.toDouble / se.size.toDouble,
        s"($e,$c): engine ($shared,$cont) vs recheck ($inter,${inter.toDouble / se.size})")
    }
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
