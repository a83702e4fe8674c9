package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Lake-format parity: one write/read seam over the formats this Spark
  * build carries natively, so a pipeline can target whichever container a
  * downstream system demands without touching query code. (Columnar
  * formats carry their own schema; the text formats are read back under
  * the WRITER's schema — never inference, which would silently widen
  * integers and re-type timestamps.)
  *
  * Format notes, encoded as guards rather than prose:
  * - `csv` is flat-only (no arrays/structs/maps) — writing a nested schema
  *   through it would corrupt silently on some engines, so it's rejected.
  * - `csv` writes NULL as an explicit `\N` sentinel (and reads it back as
  *   NULL) so SQL NULL and the empty string survive as distinct values —
  *   the default empty-string-for-both convention silently collapses them
  *   on read. Reads are `multiLine`, so a quoted field containing a line
  *   separator stays one row instead of corrupting the ones after it.
  *   Known residual (spec-pinned): a LITERAL `\N` string value collapses
  *   to NULL on read — the parser matches the sentinel post-unquoting.
  * - `json`/`csv` round-trip timestamps through an explicit ISO pattern;
  *   parquet/orc keep their native logical types.
  * - `avro` needs the spark-avro connector, which this build does not
  *   ship — rejected with a clear message instead of a classpath error.
  *
  * Scale shape: both directions are plain distributed scans/writes — no
  * driver materialization, partitioning preserved by Spark's writer. */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  private val tsPattern = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  // NULL sentinel for csv: anything that cannot collide with real data once
  // quoted — the MySQL/Hive convention. Written for NULL, parsed back to
  // NULL; a genuine "\N" string value is quoted by the writer and therefore
  // NOT matched by the reader's unquoted-null rule.
  private val csvNull = "\\N"

  private def isFlat(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: StructType => false
      case _ => true
    })

  def write(df: DataFrame, dir: String, format: String): Unit = {
    require(supported.contains(format),
      s"unsupported format '$format' (this build carries: ${supported.mkString(", ")})")
    require(format != "csv" || isFlat(df.schema),
      "csv is flat-only: arrays/structs/maps would not survive the round trip")
    val w = df.write.mode("overwrite")
    format match {
      case "csv" => w.option("header", "true")
        .option("timestampFormat", tsPattern)
        .option("nullValue", csvNull)   // NULL → \N, not ""
        .option("emptyValue", "\"\"")   // "" → quoted empty, not nothing
        .csv(dir)
      case "json" => w.option("timestampFormat", tsPattern).json(dir)
      case "orc" => w.orc(dir)
      case _ => w.parquet(dir)
    }
  }

  /** Read back under the writer's schema — text formats never infer. */
  def read(spark: SparkSession, dir: String, format: String,
      schema: StructType): DataFrame = {
    require(supported.contains(format),
      s"unsupported format '$format' (this build carries: ${supported.mkString(", ")})")
    format match {
      case "csv" =>
        // multiLine makes every part file NON-SPLITTABLE (one task per
        // file, however large) — the price of quoted embedded newlines.
        // Only string columns can carry an embedded line separator, so a
        // string-free schema keeps the default splittable line-record
        // reader and loses nothing; schemas WITH strings pay the
        // serial-per-file cost for correctness. At scale the writer side
        // already bounds the damage: Spark emits many part files, so
        // parallelism degrades to #files, not 1.
        val hasStrings = schema.fields.exists(
          _.dataType == org.apache.spark.sql.types.StringType)
        spark.read.schema(schema).option("header", "true")
        .option("timestampFormat", tsPattern)
        .option("nullValue", csvNull)
        .option("emptyValue", "")       // quoted empty parses back to ""
        .option("multiLine", hasStrings.toString) // embedded \n stays inside its row
        .csv(dir)
      case "json" => spark.read.schema(schema)
        .option("timestampFormat", tsPattern).json(dir)
      case "orc" => spark.read.schema(schema).orc(dir)
      case _ => spark.read.schema(schema).parquet(dir)
    }
  }
}
