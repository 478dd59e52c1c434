package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** SplitMix64 finalizer (Steele, Lea & Flood, "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA'14; the `java.util.SplittableRandom`
  * mix function): a full-avalanche 64→64 bit mixer. Used as the seeded
  * permutation key for deterministic corpus shuffling — every replica of a
  * training run must order the corpus identically, so the "shuffle" has to
  * be a pure function of (id, seed), never `rand()`.
  *
  * Native Catalyst `Expression` WITH `doGenCode` (preference order (b)):
  * three xor-shift-multiply rounds inline in the generated stage — the
  * same cost class as Spark's own `xxhash64`, but bit-reproducible by the
  * DuckDB oracle through HUGEINT mod-2^64 arithmetic.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"splitmix64 needs BIGINT, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SplitMix64.compute(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $c + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object SplitMix64 {
  /** Column API: `splitmix64(col)`. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(SplitMix64(GraftColumnBridge.expression(c)))

  /** SQL registration: `SELECT splitmix64(doc_id) FROM docs`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "splitmix64", exprs => SplitMix64(exprs.head), "built-in")

  /** Reference implementation for tests (and the Scala-side contract the
    * DuckDB oracle reproduces). */
  def compute(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
