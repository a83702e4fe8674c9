package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's entry check: builds a session the
  * same way the driver does, runs SparkEntry.entry, asserts rows > 0, and
  * checks the queries/oracleSql key sets line up. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5)
    val qk = graft.SparkEntry.queries.keySet
    val ok = graft.SparkEntry.oracleSql.keySet
    // every oracle must have a query; queries without an oracle are the
    // rows-only ops (engine-specific hashing) and are expected
    println(s"QUERIES=${qk.size} ORACLES=${ok.size} ORACLES_SUBSET=${ok.subsetOf(qk)} ROWS_ONLY=${(qk -- ok).toSeq.sorted.mkString(",")}")
    require(n > 0, "entry returned 0 rows")
    require(ok.subsetOf(qk), "oracle declared for a missing query")
    // every query needs an sf1 story: a gate replay entry or a documented
    // exclusion (the round-6 late-landing-operator failure mode)
    val uncovered = Sf1Coverage.uncovered(qk)
    val stale = Sf1Coverage.stale(qk)
    println(s"SF1_UNCOVERED=${uncovered.toSeq.sorted.mkString(",")}")
    println(s"SF1_STALE=${stale.toSeq.sorted.mkString(",")}")
    require(uncovered.isEmpty,
      s"queries with neither an sf1 gate entry nor a documented exclusion: " +
        s"${uncovered.toSeq.sorted.mkString(", ")}")
    require(stale.isEmpty,
      s"sf1 gate/exclusion rows for unregistered or doubly-listed queries: " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
