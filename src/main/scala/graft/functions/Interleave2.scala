package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge

/** Morton (Z-order) bit interleave of two 31-bit ranks: bit i of the
  * left operand lands at position 2i, of the right at 2i+1, giving the
  * space-filling-curve key behind multi-dimensional data clustering
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting by the interleaved key
  * keeps rows close in BOTH dimensions close in the file order, so
  * per-file [min,max] stats become selective for every clustered
  * column, not just the leading sort key.
  *
  * Native Catalyst `Expression` WITH `doGenCode` — the interleave is a
  * 31-step shift/mask loop inlined into the generated stage. Inputs are
  * clamped to [0, 2^31): callers rank-scale their columns first
  * ([[graft.sinks.GraftTable.clusterBy]]).
  */
case class Interleave2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"interleave2 needs (BIGINT, BIGINT), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      Interleave2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $x = java.lang.Math.min(java.lang.Math.max($a, 0L), 2147483647L);
         |long $y = java.lang.Math.min(java.lang.Math.max($b, 0L), 2147483647L);
         |long $z = 0L;
         |for (int $i = 0; $i < 31; $i++) {
         |  $z |= (($x >>> $i) & 1L) << (2 * $i);
         |  $z |= (($y >>> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Interleave2 = copy(newLeft, newRight)
}

object Interleave2 {
  /** Column API: `interleave2(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(Interleave2(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Reference implementation for tests. */
  def compute(a0: Long, b0: Long): Long = {
    val a = math.min(math.max(a0, 0L), Int.MaxValue.toLong)
    val b = math.min(math.max(b0, 0L), Int.MaxValue.toLong)
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
