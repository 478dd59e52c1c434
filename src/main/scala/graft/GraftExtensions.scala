package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{HyperplaneSig, NGramHashes, RollingHash, VecDot}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so a plain SQL user gets them
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`):
  *
  *   SELECT rolling_hash(text),                -- codegen'd fingerprint
  *          ngram_hashes(text, 3),             -- hashed shingle set
  *          vec_dot(a, b),                     -- double-fold dot product
  *          hyperplane_sig(vec, 8)             -- LSH bucket signature
  *
  * This is the injection-point pattern from SURVEY §2.9/§4 — no custom
  * Rule/Strategy is REQUIRED for parity (the reference has no optimizer),
  * so the extension surface is exactly the function registry.
  */
object GraftExtensions {
  /** Register the same functions on an ALREADY-RUNNING session (the
    * builder-time extension can't retrofit an existing one). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("rolling_hash",
      args => RollingHash(args.head), "built-in")
    r.createOrReplaceTempFunction("ngram_hashes",
      args => NGramHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    r.createOrReplaceTempFunction("vec_dot",
      args => VecDot(args.head, args(1)), "built-in")
    r.createOrReplaceTempFunction("hyperplane_sig",
      args => HyperplaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        if (args.length > 2) args(2).eval().asInstanceOf[Number].intValue()
        else 0), "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    e.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(str, n) - distinct hashed word n-gram set"),
      (args: Seq[Expression]) => NGramHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of numeric arrays in double"),
      (args: Seq[Expression]) => VecDot(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(vec, nPlanes[, offset]) - LSH signature"),
      (args: Seq[Expression]) => HyperplaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        if (args.length > 2) args(2).eval().asInstanceOf[Number].intValue()
        else 0)))
  }
}
