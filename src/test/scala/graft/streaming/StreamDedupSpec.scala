package graft.streaming

import graft.SparkTestSession
import graft.queries.StreamingQueries
import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("s3 (doubled input + watermark dedup) equals s1 exactly") {
    val s3 = StreamingQueries.s3StreamDedup(spark, sf)
    val s1 = StreamingQueries.s1StreamFiveMin(spark, sf)
    assert(s3.schema == s1.schema)
    val a = s3.collect().toSet
    val b = s1.collect().toSet
    assert(a == b, s"s3 minus s1: ${(a -- b).take(3)}; s1 minus s3: ${(b -- a).take(3)}")
  }
}
