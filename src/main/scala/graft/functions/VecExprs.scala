package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators. Like NGramHashes,
  * these replace interpreted higher-order-function pipelines
  * (zip_with + aggregate ≈ ms/row on 64-dim vectors) with tight loops.
  * The fold order is left-to-right in double, identical to the
  * `aggregate(zip_with(...))` formulation they replace, so scores are
  * unchanged. */
private object VecExprs {
  def toDouble(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType   => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"bad element type $other")
  }
}

/** dot(a, b) over two numeric-array columns, accumulated in double. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = a.numElements()
    // reject-not-corrupt: a ragged vector must fail loudly, not produce a
    // plausible prefix dot product
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot length mismatch: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += VecExprs.toDouble(a, ta, i) * VecExprs.toDouble(b, tb, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Random-hyperplane LSH signature: bit p (p < nPlanes) is the sign of
  * v · plane_(planeOffset+p), where plane component j is a fixed hash of
  * (plane index, j) mapped to [-1, 1) — replicating the column formula
  * `(pmod(xxhash64(lit(p), j), 1e6) / 5e5) - 1` bit-for-bit (xxhash64
  * chains int inputs through seed 42). Deterministic on any cluster; no
  * trained quantizer needed. */
case class HyperplaneSig(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def component(p: Int, j: Int): Double = {
    val h = XXH64.hashInt(j, XXH64.hashInt(p, 42L))
    val m = ((h % 1000000L) + 1000000L) % 1000000L
    m.toDouble / 500000.0 - 1.0
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = elemType
    val n = v.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += VecExprs.toDouble(v, et, j) * component(planeOffset + p, j)
        j += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(c: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    GraftColumnBridge.column(HyperplaneSig(
      GraftColumnBridge.expression(c), nPlanes, planeOffset))
}

/** The `n` nearest IVF lists for a vector: cosine against every centroid,
  * top-n ids by (cosine desc, id asc). The centroid matrix rides in the
  * expression as PLAIN OBJECT DATA (serialized once per task with the
  * closure), not as plan literals — the round-3 `typedLit` formulation
  * put k×d doubles into the Catalyst plan and codegen constant pool,
  * which stops scaling around k ≈ 1024; this kernel is O(k·d) per row
  * with zero plan bloat, so nLists can follow the √N rule at 100 TB.
  * Math is bit-identical to the literal formulation: left-to-right
  * double folds for dot and norms (VecDot semantics), score =
  * dot/(normC·normV), ties prefer the smaller list id. */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val d = v.numElements()
    val k = centroids.length
    // reject-not-corrupt: ragged vectors must fail loudly
    if (k > 0 && centroids(0).length != d)
      throw new IllegalArgumentException(
        s"nearest_centroids dim mismatch: vector $d vs centroid " +
          s"${centroids(0).length}")
    var normV = 0.0
    var jj = 0
    while (jj < d) {
      val x = VecExprs.toDouble(v, et, jj); normV += x * x; jj += 1 }
    normV = math.sqrt(normV)
    val scores = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += VecExprs.toDouble(v, et, j) * c(j); j += 1 }
      scores(i) = acc / (norms(i) * normV)
      i += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < m) {
      var best = -1
      var i2 = 0
      while (i2 < k) {
        if (!used(i2) && (best < 0 || scores(i2) > scores(best))) best = i2
        i2 += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroids = copy(child = newChild)
}

object NearestCentroids {
  def apply(c: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(c), centroids, n))
}
