package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's custom Catalyst expressions, so
  * `spark.sql` users get the compiled kernels too.
  *
  * Two entry points for the two session lifecycles:
  *  - build time: `SparkSession.builder().withExtensions(new GraftExtensions)`
  *    or `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - live session: `GraftFunctions.registerAll(spark)` (extensions only
  *    apply to sessions created AFTER they are installed — getOrCreate on an
  *    existing session silently ignores withExtensions).
  *
  * Registered: cosine_sim, dot_product, minhash_sig(arr[, k]),
  * simhash64(tokens), word_shingles(text[, n]).
  */
object GraftFunctions {

  private def intArg(exprs: Seq[Expression], i: Int, default: Int): Int =
    if (exprs.length > i) exprs(i).eval().asInstanceOf[Number].intValue else default

  /** (name, usage, builder) for every engine function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays",
      exprs => CosineSim(exprs(0), exprs(1))),
    ("dot_product", "dot_product(a, b) - dot product of two float arrays",
      exprs => DotProduct(exprs(0), exprs(1))),
    ("minhash_sig", "minhash_sig(shingles[, k]) - k-permutation MinHash signature",
      exprs => MinHashSig(exprs.head, intArg(exprs, 1, 64))),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint",
      exprs => SimHash64(exprs.head)),
    ("word_shingles", "word_shingles(text[, n]) - distinct word n-grams",
      exprs => WordShingles(exprs.head, intArg(exprs, 1, 3))),
    ("winnowing_fp", "winnowing_fp(text[, k[, w]]) - winnowing fingerprint set",
      exprs => WinnowingFp(exprs.head, intArg(exprs, 1, 8), intArg(exprs, 2, 4))),
    ("hyperplane_sigs", "hyperplane_sigs(vec[, tables[, bits[, dim]]]) - all LSH table signatures",
      exprs => HyperplaneSigs(exprs.head,
        intArg(exprs, 1, 16), intArg(exprs, 2, 6), intArg(exprs, 3, 64))),
    ("md5_bucket", "md5_bucket(key[, buckets]) - deterministic sampling bucket (md5-low-64 unsigned mod)",
      exprs => Md5Bucket(exprs.head, intArg(exprs, 1, 10000))),
    ("md5_lo64", "md5_lo64(key) - md5-low-64 as signed long (DuckDB md5_number_lower bit parity)",
      exprs => Md5Lo64(exprs.head)),
    ("topk_pairs", "topk_pairs(score, item[, k]) - exact per-group top-k pairs without a group sort",
      exprs => TopKPairs(exprs(0), exprs(1), intArg(exprs, 2, 10))))

  /** Register into a LIVE session's function registry. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Build-time SparkSessionExtensions wrapper: [[GraftFunctions]] plus the
  * engine's planner strategies (the native as-of merge join). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfMergeJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeMergeJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfMergeJoinPushdown)
  }
}
