package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times.
  *
  * Two passes over the query set: an untimed warm-up (JIT, codegen cache,
  * parquet footer cache, broadcast warm) and a timed pass in sorted name
  * order. Without the warm-up the first query absorbs ~10 s of JVM/session
  * startup and the numbers are noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = Sessions.local(cpus.toInt, "graft-bench")

    // name fixture drift up front (warn, don't abort — unaffected queries
    // should still record; the failed list carries the blast radius)
    SchemaGuard.violations(spark, sfDir)
      .foreach(v => System.err.println(s"[bench] SCHEMA DRIFT: $v"))

    // SPARK_GRAFT_ONLY=q1_x,q2_y runs a subset (hotspot iteration)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warm-up pass (untimed)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // two timed passes; report the min per query (noise on a shared host is
    // one-sided — a slow pass means interference, never a faster engine).
    // A query that throws is reported as -1 and listed in "failed" — a broken
    // query must never masquerade as a fast one.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          false
        }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    def timedPass(ns: Seq[String]): Map[String, Double] =
      ns.map(n => n -> timeOne(n)).toMap
    // the control is data-independent pure CPU (no IO, no shuffle skew):
    // its ratio across boots is the host-noise factor a cross-round
    // comparison should divide out before blaming a plan change
    def control(): Double = {
      val t0 = System.nanoTime()
      // per-term mod keeps every partial sum under 2e8 * 1e9 = 2e17 << 2^63
      // (ANSI mode makes a long-overflowing sum a task failure, not a wrap)
      spark.range(200L * 1000 * 1000)
        .selectExpr("sum((id * 2654435761) % 1000000007)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val c1 = control()
    val (p1, p2) = (timedPass(names), timedPass(names))
    val c2 = control()
    // tie-break pass: a host stall can span one whole pass, leaving both
    // measurements of a query slow-and-disagreeing. Re-measure any query
    // whose two passes differ by >1.5x (and >0.25 s absolute) so a one-boot
    // stall can't masquerade as a plan regression in the recorded artifact.
    val unstable = names.filter { n =>
      !failed.contains(n) && {
        val (a, b) = (p1(n), p2(n))
        math.max(a, b) > 1.5 * math.min(a, b) && math.max(a, b) - math.min(a, b) > 0.25
      }
    }
    if (unstable.nonEmpty)
      System.err.println(s"[bench] tie-break pass for: ${unstable.mkString(",")}")
    val p3 = timedPass(unstable)
    val c3 = control()
    // a query is healthy only if ALL its passes succeeded
    val results = names.map { n =>
      n -> (if (failed.contains(n)) -1.0
            else math.min(math.min(p1(n), p2(n)), p3.getOrElse(n, Double.MaxValue)))
    }
    val controlSec = Seq(c1, c2, c3).sorted.apply(1) // median of three probes
    // 3 decimals (ms resolution): full double repr made the line ~1 KB
    // longer than a tail-bounded capture window and the HEAD of the line —
    // "metric"/"value" and the first queries — was what got cut (r3's
    // recorded artifact had parsed:null). Wall-clock noise is >1 ms anyway.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"control_sec":${fmt(controlSec)},"sf":"$sfDir"}"""
    // belt and braces: persist the full JSON as a file artifact too, so the
    // recorded number is self-contained even if a stdout capture truncates
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // stop BEFORE printing: the JSON line must be the last thing on the
    // merged stdout/stderr so a line-oriented parser can't trip over a
    // stop-time warning trailing it
    spark.stop()
    println(line)
    if (failed.nonEmpty) sys.exit(1)
  }
}
