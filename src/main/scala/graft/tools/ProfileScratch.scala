package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for optimization rounds — times labeled
  * sub-pipelines of a query in one warm session. Not part of any gate. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32, "graft-profile")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    graft.Tables.customer(spark, dir).count()

    val ents = graft.ops.Par.fanOut(graft.Tables.customer(spark, dir))
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"))
    val g1 = ents.groupBy("name").agg(count(lit(1)).as("m"), min(col("id")).as("m1")).localCheckpoint()
    val names = g1.select("name")

    def oldNbr() = {
      val variants = names
        .select(col("name"), explode(sequence(lit(0), length(col("name")))).as("i"))
        .select(col("name"),
          when(col("i") === 0, col("name"))
            .otherwise(concat(
              col("name").substr(lit(1), col("i") - 1),
              col("name").substr(col("i") + 1, length(col("name")))))
            .as("variant"))
        .distinct()
      variants.select(col("variant"), col("name").as("name_a"))
        .join(variants.select(col("variant"), col("name").as("name_b")), Seq("variant"))
        .filter(col("name_a") < col("name_b"))
        .select("name_a", "name_b").distinct()
        .filter(levenshtein(col("name_a"), col("name_b")) === 1)
    }
    def newNbr() = {
      val dv = expr(
        """transform(sequence(0, length(name)),
          |  i -> CASE WHEN i = 0 THEN name
          |       ELSE concat(substring(name, 1, i - 1),
          |                   substring(name, i + 1, length(name))) END)""".stripMargin)
      val variants = names.select(col("name"), explode(array_distinct(dv)).as("variant"))
      variants.select(col("variant"), col("name").as("name_a"))
        .join(variants.select(col("variant"), col("name").as("name_b")), Seq("variant"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) === 1)
        .select("name_a", "name_b").distinct()
    }
    time("old nbr x2a")(oldNbr().count()); time("old nbr x2b")(oldNbr().count())
    time("new nbr x2a")(newNbr().count()); time("new nbr x2b")(newNbr().count())
    println("===== old plan ====="); oldNbr().explain("formatted")
    println("===== new plan ====="); newNbr().explain("formatted")
    time("x110 warm1")(graft.queries.ExtensionQueries.x110FuzzySummary(spark, dir).count())
    time("x110 warm2")(graft.queries.ExtensionQueries.x110FuzzySummary(spark, dir).count())
    spark.stop()
  }
}
