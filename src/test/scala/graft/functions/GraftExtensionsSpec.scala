package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  // The shared JVM session: extensions can't be installed post-hoc via
  // builder.withExtensions (getOrCreate reuses), so the live-session path
  // is GraftFunctions.registerAll — which is exactly what we test here.
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.registerAll(s)
    s
  }

  test("custom expressions are callable from plain SQL") {
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS self_cos,
        |  dot_product(array(cast(2.0 as float), cast(3.0 as float)),
        |              array(cast(4.0 as float), cast(5.0 as float))) AS dot,
        |  size(minhash_sig(array('a b c', 'b c d'), 16)) AS sig_len,
        |  simhash64(array('x', 'y')) IS NOT NULL AS sim_ok,
        |  word_shingles('a b c d', 3) AS sh,
        |  md5_bucket('smpl:3') AS bkt
        |""".stripMargin).head
    assert(math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("dot") - 23.0) < 1e-12)
    assert(r.getAs[Int]("sig_len") === 16)
    assert(r.getAs[Boolean]("sim_ok"))
    assert(r.getAs[collection.Seq[String]]("sh") === Seq("a b c", "b c d"))
    // 3415 = DuckDB md5_number_lower('smpl:3') % 10000 (oracle parity pin)
    assert(r.getAs[Int]("bkt") === 3415)
  }

  test("the build-time extensions class wires every function builder") {
    // Apply to a fresh SparkSessionExtensions and check it accepts every
    // injection (the SQL behavior of the builders is covered above).
    val ext = new SparkSessionExtensions
    (new GraftExtensions)(ext)
    assert(GraftFunctions.all.map(_._1).distinct.size === 10)
  }
}
