package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators. Like NGramHashes,
  * these replace interpreted higher-order-function pipelines
  * (zip_with + aggregate ≈ ms/row on 64-dim vectors) with tight loops.
  * The fold order is left-to-right in double, identical to the
  * `aggregate(zip_with(...))` formulation they replace, so scores are
  * unchanged.
  *
  * Codegen: the two pair-wise hot kernels ([[VecDot]], [[PqAdc]]) emit
  * real generated loops via `doGenCode`; the object-data kernels (whose
  * centroid/codebook matrices ride as task objects, not plan literals)
  * generate a direct call to a typed `kernel` method on the expression
  * instance (`ctx.addReferenceObj`) — no `CodegenFallback`, so the
  * surrounding stage stays inside whole-stage codegen and pays one
  * monomorphic call per row instead of a boxed `eval(InternalRow)`. */
private object VecExprs {
  def toDouble(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType   => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"bad element type $other")
  }

  /** Copy to a double[] with the element-type dispatch done ONCE per
    * call, not once per element — the kernels' load loop. */
  def toDoubles(a: ArrayData, et: DataType): Array[Double] = et match {
    case FloatType =>
      val n = a.numElements(); val out = new Array[Double](n)
      var i = 0; while (i < n) { out(i) = a.getFloat(i).toDouble; i += 1 }; out
    case DoubleType => a.toDoubleArray()
    case LongType =>
      val n = a.numElements(); val out = new Array[Double](n)
      var i = 0; while (i < n) { out(i) = a.getLong(i).toDouble; i += 1 }; out
    case IntegerType =>
      val n = a.numElements(); val out = new Array[Double](n)
      var i = 0; while (i < n) { out(i) = a.getInt(i).toDouble; i += 1 }; out
    case other => throw new IllegalArgumentException(s"bad element type $other")
  }
}

/** dot(a, b) over two numeric-array columns, accumulated in double. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
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

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vec_dot length mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double)($getA)) * ((double)($getB));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

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
  * trained quantizer needed. The plane matrix is derived lazily from the
  * first vector's dimensionality and cached on the instance — one
  * nPlanes×d hash sweep per task, not per row. */
case class HyperplaneSig(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def component(p: Int, j: Int): Double = {
    val h = XXH64.hashInt(j, XXH64.hashInt(p, 42L))
    val m = ((h % 1000000L) + 1000000L) % 1000000L
    m.toDouble / 500000.0 - 1.0
  }

  // flat [p * d + j]; keyed by d so a ragged corpus still computes
  // correct (if slow) signatures instead of reading stale planes
  @transient private var cachedPlanes: Array[Double] = _
  @transient private var cachedD: Int = -1

  private def planesFor(d: Int): Array[Double] = synchronized {
    if (cachedD != d) {
      val arr = new Array[Double](nPlanes * d)
      var p = 0
      while (p < nPlanes) {
        var j = 0
        while (j < d) { arr(p * d + j) = component(planeOffset + p, j); j += 1 }
        p += 1
      }
      cachedPlanes = arr
      cachedD = d
    }
    cachedPlanes
  }

  def kernel(input: ArrayData): Long = {
    val v = VecExprs.toDoubles(input, elemType)
    val d = v.length
    val planes = planesFor(d)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var j = 0
      val base = p * d
      while (j < d) { acc += v(j) * planes(base + j); j += 1 }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(kernel(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this,
      classOf[HyperplaneSig].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
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
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))

  def kernel(input: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val v = VecExprs.toDoubles(input, et)
    val d = v.length
    val k = centroids.length
    // reject-not-corrupt: ragged vectors must fail loudly
    if (k > 0 && centroids(0).length != d)
      throw new IllegalArgumentException(
        s"nearest_centroids dim mismatch: vector $d vs centroid " +
          s"${centroids(0).length}")
    var normV = 0.0
    var jj = 0
    while (jj < d) { val x = v(jj); normV += x * x; jj += 1 }
    normV = math.sqrt(normV)
    val scores = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += v(j) * c(j); j += 1 }
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

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroids = copy(child = newChild)
}

object NearestCentroids {
  def apply(c: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(c), centroids, n))
}

/** Product-quantization encode of the RESIDUAL against the row's coarse
  * centroid (classic IVF-PQ, Jégou et al. 2011 §III: quantizing
  * `v − C_list` concentrates the codebooks on the much smaller residual
  * distribution, so the same m×ks budget reconstructs tighter): the
  * residual splits into `m` contiguous subvectors; each maps to its
  * nearest codebook entry by SQUARED L2 (ties → smaller code). Inputs
  * are (vector, list_id). Returns `struct(codes: array<int>, rnorm:
  * double)` where `rnorm` is the norm of the FULL reconstruction
  * `C_list + concat(codewords)` — the denominator ADC cosine scoring
  * needs. Codebooks and centroids ride as plain object data (see
  * [[NearestCentroids]] — no plan/constant-pool bloat at any m·ks). */
case class PqEncode(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]],
    centroids: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))

  def kernel(input: ArrayData,
      listId: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val v = VecExprs.toDoubles(input, et)
    val cl = centroids(listId)
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (v.length != m * dsub || cl.length != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode dim mismatch: vector ${v.length} / centroid " +
          s"${cl.length} vs $m×$dsub")
    val codes = new Array[Int](m)
    var rnorm2 = 0.0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val r = v(base + i) - cl(base + i)
          val diff = r - w(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(j) = best
      val w = cb(best)
      var i = 0
      while (i < dsub) {
        val x = cl(base + i) + w(i)
        rnorm2 += x * x
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(codes),
      java.lang.Double.valueOf(math.sqrt(rnorm2)))
  }

  override def nullSafeEval(input: Any, listId: Any): Any =
    kernel(input.asInstanceOf[ArrayData], listId.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, (v, l) => s"$ref.kernel($v, $l)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncode = copy(left = newLeft, right = newRight)
}

object PqEncode {
  def apply(c: Column, listId: Column,
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(c), GraftColumnBridge.expression(listId),
      codebooks, centroids))
}

/** dot(vector, centroids[list_id]) — the per-(query, probed-list) term of
  * residual ADC scoring: dot(q, v̂) = dot(q, C_list) + dot(q, recon(r)).
  * Computed once per probe row (not per candidate); centroids ride as
  * plain object data. Left-to-right double fold (VecDot semantics). */
case class CentroidDot(left: Expression, right: Expression,
    centroids: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  def kernel(input: ArrayData, listId: Int): Double = {
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val cl = centroids(listId)
    if (input.numElements() != cl.length)
      throw new IllegalArgumentException(
        s"centroid_dot dim mismatch: vector ${input.numElements()} vs " +
          s"centroid ${cl.length}")
    val v = VecExprs.toDoubles(input, et)
    var acc = 0.0
    var i = 0
    while (i < cl.length) { acc += v(i) * cl(i); i += 1 }
    acc
  }

  override def nullSafeEval(input: Any, listId: Any): Any =
    java.lang.Double.valueOf(
      kernel(input.asInstanceOf[ArrayData], listId.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidDot", this,
      classOf[CentroidDot].getName)
    defineCodeGen(ctx, ev, (v, l) => s"$ref.kernel($v, $l)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CentroidDot =
    copy(left = newLeft, right = newRight)
}

object CentroidDot {
  def apply(c: Column, listId: Column,
      centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidDot(
      GraftColumnBridge.expression(c), GraftColumnBridge.expression(listId),
      centroids))
}

/** ADC lookup table for one query vector: flat array of m·ks doubles,
  * entry [j·ks + c] = dot(q_subvector_j, codebook_j[c]) — computed once
  * per query row, then every candidate scores in O(m) via [[PqAdc]]
  * instead of O(d) (the asymmetric-distance-computation speedup). */
case class PqLut(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  def kernel(input: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val v = VecExprs.toDoubles(input, et)
    val m = codebooks.length
    val ks = codebooks(0).length
    val dsub = codebooks(0)(0).length
    if (v.length != m * dsub)
      throw new IllegalArgumentException(
        s"pq_lut dim mismatch: vector ${v.length} vs $m×$dsub")
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * dsub
      var c = 0
      while (c < ks) {
        val w = cb(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) { acc += v(base + i) * w(i); i += 1 }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  def apply(c: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqLut(
      GraftColumnBridge.expression(c), codebooks))
}

/** ADC score: Σ_j lut[j·ks + codes[j]] ≈ dot(query, reconstructed
  * candidate). O(m) per (query, candidate) pair. */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * ks)
      throw new IllegalArgumentException(
        s"pq_adc size mismatch: ${lut.numElements()} lut entries for " +
          s"$m codes × $ks")
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ks + codes.getInt(j))
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $ks) {
         |  throw new IllegalArgumentException(
         |    "pq_adc size mismatch: " + $lut.numElements() +
         |    " lut entries for " + $m + " codes × " + $ks);
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $lut.getDouble($j * $ks + $codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(codes: Column, lut: Column, ks: Int): Column =
    GraftColumnBridge.column(PqAdc(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(lut), ks))
}
