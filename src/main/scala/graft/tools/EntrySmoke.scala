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
    spark.stop()
  }
}
