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
    val spark = graft.Sessions.local(32, "graft-probe")
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
