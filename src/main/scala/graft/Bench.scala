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

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up pass (untimed)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // two timed passes; report the min per query (noise on a shared host is
    // one-sided — a slow pass means interference, never a faster engine)
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val (p1, p2) = (timedPass(), timedPass())
    val results = names.map(n => n -> math.min(p1(n), p2(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
