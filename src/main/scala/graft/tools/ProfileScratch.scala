package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for optimization rounds — times labeled
  * sub-pipelines of a query in one warm session. Not part of any gate. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val spark = graft.Sessions.local(32, "graft-profile")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    graft.Tables.lineitem(spark, dir).count() // warm
    val q47 = graft.queries.FixtureQueries.q47CoPurchase(spark, dir)
    time("q47 count")(q47.count())
    val p = q47.queryExecution.executedPlan.toString
    println("[profile] ReusedExchange nodes = " +
      "ReusedExchange".r.findAllIn(p).size)
    println("[profile] ObjectHashAggregate nodes = " +
      "ObjectHashAggregate".r.findAllIn(p).size)
    println("[profile] Exchange nodes = " + "Exchange".r.findAllIn(p).size)
    println(p.split("== Initial Plan ==")(0).take(4000))
    spark.stop()
  }
}
