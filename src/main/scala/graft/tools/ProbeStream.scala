package graft.tools

/** Streaming-state diagnostic: run one registered streaming query cold and
  * dump per-micro-batch StreamingQueryProgress state-operator metrics
  * (update/removal/commit task-time, shuffle partitions) plus total wall —
  * the view that locates WHERE a streaming slope comes from (input growth,
  * state eviction, commit path) instead of guessing from end-to-end wall.
  *
  * Usage: sbt "runMain graft.tools.ProbeStream <query_name> [sfDir]"
  * e.g.   sbt "runMain graft.tools.ProbeStream s3_stream_dedup /root/repo/localdata/sf3"
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("s3_stream_dedup")
    val dir = args.lift(1).getOrElse("/root/repo/localdata/sf1")
    // the memory sink collects complete-mode results to the driver — a
    // HARNESS shape (serving writes to files); at sf10 s1's result tops the
    // 1 GiB maxResultSize default and fails the probe on sink capacity, not
    // state cost. A diagnostic on a 128 GiB box can afford the headroom;
    // it's a static conf, so it goes through the builder, not conf.set.
    val spark = graft.Sessions.tuned(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").appName("graft-probe"), 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val ops = p.stateOperators.map { so =>
          s"${so.operatorName}: upd=${so.allUpdatesTimeMs}ms " +
            s"rm=${so.allRemovalsTimeMs}ms commit=${so.commitTimeMs}ms " +
            s"shuffleParts=${so.numShufflePartitions}"
        }.mkString(" | ")
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durMs=${p.durationMs}\n  $ops")
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    println(s"PROBE done query=$name rows=$n wallSec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
