package graft.tools

import graft.Sessions
import graft.queries.FixtureQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measure what actually differs between the two as-of formulations at a
  * given SF: wall time AND shuffle bytes written (the number that scales).
  * `runMain graft.tools.CompareAsOf [sfDir]`. */
object CompareAsOf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(
      math.min(Runtime.getRuntime.availableProcessors, 32), "graft-compare-asof")

    @volatile var shuffleWrite = 0L
    @volatile var records = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          records += m.shuffleWriteMetrics.recordsWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def measure(name: String, body: => Long): Unit = {
      // warm-up (scan caches, codegen); sleeps let the listener bus drain —
      // task-end events are delivered asynchronously
      body
      Thread.sleep(1000)
      shuffleWrite = 0L; records = 0L
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[compare] $name%-16s rows=$rows%7d  wall=$sec%6.3fs  " +
        f"shuffleWrite=${shuffleWrite / 1024.0 / 1024.0}%8.2f MiB  shuffleRecords=$records%9d")
    }

    // Hash-materialize EVERY output column: under a bare count() the
    // optimizer prunes the union+window's Window operator away entirely
    // (nothing references its outputs), which would compare a no-op against
    // the real merge. The hash forces both plans to produce the payload.
    def fullWork(name: String): Long = {
      val df = FixtureQueries.queries(name)(spark, sfDir)
      import org.apache.spark.sql.functions.{expr, struct, xxhash64}
      df.select(xxhash64(struct(df.columns.map(org.apache.spark.sql.functions.col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
    }
    measure("union+window", fullWork("q20_asof"))
    measure("native merge", fullWork("q27_asof_native"))
    measure("banded range", fullWork("q21_range_join"))
    measure("native range", fullWork("q28_range_native"))
    spark.stop()
  }
}
