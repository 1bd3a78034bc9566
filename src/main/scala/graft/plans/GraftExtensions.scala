package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension surface: exposes the custom kernels as SQL functions
 * (`dot_f32`, `jaccard_sorted`, `sig_match`) so `spark.sql(...)` users get
 * them too, not only the Column API in [[VectorExprs]].
 *
 * Two registration paths:
 *  - config-time: `spark.sql.extensions=graft.plans.GraftExtensions`
 *    (standard SparkSessionExtensions injection);
 *  - runtime: [[GraftExtensions.register]] on an existing session (used by
 *    the test harness, whose session is built before our code runs).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Whole-operator similarity join: expands CosineSelfJoin nodes
    // (cost-based exact vs LSH — see SimilarityRewrite.scala). The runtime
    // path self-registers via SimilarityJoin.ensureRegistered.
    ext.injectOptimizerRule(_ => SimilarityJoinRewrite)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_f32",
      info("dot_f32", "dot_f32(a, b) - double dot product of two float arrays"),
      (args: Seq[Expression]) => DotF32(args(0), args(1))),
    ("jaccard_sorted",
      info("jaccard_sorted", "jaccard_sorted(a, b) - Jaccard of sorted bigint arrays"),
      (args: Seq[Expression]) => JaccardSortedLong(args(0), args(1))),
    ("sig_match",
      info("sig_match", "sig_match(a, b) - positionwise match count of bigint arrays"),
      (args: Seq[Expression]) => SigMatchCount(args(0), args(1))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(tokens, k) - k-long MinHash signature (xxhash64(i, tok) family); k must be a literal"),
      (args: Seq[Expression]) => {
        require(args(1).foldable, "minhash_sig: k must be a literal")
        MinHashSig(args(0), args(1).eval().asInstanceOf[Number].intValue)
      }),
    ("token_hashes_sorted",
      info("token_hashes_sorted", "token_hashes_sorted(tokens) - sorted xxhash64 of each token (jaccard_sorted feed)"),
      (args: Seq[Expression]) => TokenHashesSorted(args(0))))

  /** Runtime registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
