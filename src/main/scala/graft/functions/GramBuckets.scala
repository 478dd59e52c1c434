package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared hashed-n-gram feature kernel for importance weighting
  * ([[graft.operators.Select]], DSIR — Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): one byte-level pass
  * over a document computing, per word n-gram OCCURRENCE (multiplicity
  * kept — these are bag-of-features counts, unlike the distinct shingle
  * SETS of [[NGramHashes]]), the feature bucket
  *
  *   bucket(g) = unsigned(h(g)) mod B,
  *   h(g)      = polynomial-31 rolling hash ([[RollingHash]]) over the
  *               UTF-8 bytes of the gram's tokens joined by ' '
  *
  * with the same tokenizer contract as [[NGramHashes]] / the DuckDB
  * oracle (`string_split_regex(lower(text), '\s+')`, empties dropped,
  * ASCII lowercase). The polynomial hash — not xxhash64 — is what makes
  * the whole feature map REPLAYABLE in the oracle: DuckDB reproduces
  * h(g) with the fingerprint gate's HUGEINT mod-2^64 fold and the
  * unsigned mod directly on the HUGEINT value.
  *
  * Both expressions run the gram scan in a tight per-byte loop (the
  * [[NGramHashes]] lesson: the equivalent Catalyst HOF pipeline evals
  * interpreted per element at ~5 ms/doc) and stay inside whole-stage
  * codegen via the [[VecExprs]] object-data pattern: `doGenCode` emits
  * a direct monomorphic `kernel()` call on the expression instance
  * (`ctx.addReferenceObj`), so surrounding stages never fall back to
  * boxed `eval(InternalRow)` per row.
  */
object GramKernel {

  /** Token boundaries (offsets into a lowercased copy) — shared scan. */
  private[functions] def tokenize(bytes: Array[Byte])
      : (Array[Byte], Array[Int], Array[Int], Int) = {
    val buf = new Array[Byte](bytes.length)
    var starts = new Array[Int](math.max(8, bytes.length / 5))
    var lens = new Array[Int](starts.length)
    var tokCount = 0
    var pos = 0
    var i = 0
    var tokLen = 0
    def flush(): Unit = if (tokLen > 0) {
      if (tokCount == starts.length) {
        starts = java.util.Arrays.copyOf(starts, tokCount * 2)
        lens = java.util.Arrays.copyOf(lens, tokCount * 2)
      }
      starts(tokCount) = pos - tokLen
      lens(tokCount) = tokLen
      tokCount += 1
      tokLen = 0
    }
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
        b == '\f' || b == 0x0b
      if (isWs) flush()
      else {
        buf(pos) = if (b >= 'A' && b <= 'Z') (b | 0x20).toByte else b
        pos += 1
        tokLen += 1
      }
      i += 1
    }
    flush()
    (buf, starts, lens, tokCount)
  }

  /** Per-occurrence gram buckets, in document order. */
  private[functions] def buckets(input: UTF8String, n: Int, b: Int)
      : Array[Int] = {
    val (buf, starts, lens, tokCount) = tokenize(input.getBytes)
    if (tokCount < n) return Array.empty[Int]
    val out = new Array[Int](tokCount - n + 1)
    var g = 0
    while (g <= tokCount - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = h * 31L + 32L // the ' ' joiner byte
        var j = starts(g + k)
        val end = j + lens(g + k)
        while (j < end) { h = h * 31L + (buf(j) & 0xffL); j += 1 }
        k += 1
      }
      out(g) = java.lang.Long.remainderUnsigned(h, b.toLong).toInt
      g += 1
    }
    out
  }
}

/** `gram_buckets(text)`: ARRAY<INT> of hashed-n-gram feature buckets,
  * one per gram occurrence, document order. Feeds the corpus-level
  * bucket-count aggregation (explode → B-row hash agg, map-side
  * combined — the only shuffle in distribution fitting, and it carries
  * B-bounded rows). */
case class GramBuckets(child: Expression, n: Int, numBuckets: Int)
    extends UnaryExpression {
  require(n >= 1 && numBuckets >= 1)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def kernel(input: UTF8String): ArrayData =
    new GenericArrayData(GramKernel.buckets(input, n, numBuckets))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBuckets", this,
      classOf[GramBuckets].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

object GramBuckets {
  def apply(c: Column, n: Int, numBuckets: Int): Column =
    GraftColumnBridge.column(
      GramBuckets(GraftColumnBridge.expression(c), n, numBuckets))
}

/** `word_ngrams(text)`: ARRAY<STRING> of the word n-grams themselves
  * (tokens joined by ' '), multiplicity kept, document order — the
  * string-materializing sibling of [[GramBuckets]] for operators that
  * aggregate BY gram (heavy hitters, contamination): one byte-level
  * pass instead of the interpreted split→sequence→transform→slice→join
  * higher-order pipeline (the [[NGramHashes]] ~5 ms/doc lesson again,
  * measured: the HOF construction dominated the heavy-hitters gate). */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  def kernel(input: UTF8String): ArrayData = {
    val (buf, starts, lens, tokCount) = GramKernel.tokenize(input.getBytes)
    if (tokCount < n)
      return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](tokCount - n + 1)
    var g = 0
    while (g <= tokCount - n) {
      var len = n - 1 // the ' ' joiners
      var k = 0
      while (k < n) { len += lens(g + k); k += 1 }
      val bytes = new Array[Byte](len)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { bytes(p) = ' '; p += 1 }
        System.arraycopy(buf, starts(g + k), bytes, p, lens(g + k))
        p += lens(g + k)
        k += 1
      }
      out(g) = UTF8String.fromBytes(bytes)
      g += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNGrams", this,
      classOf[WordNGrams].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordNGrams(GraftColumnBridge.expression(c), n))
}

/** `gram_weight_micros(text)`: Σ over gram occurrences of
  * `lrMicros(bucket(g))` — the document's DSIR importance log-weight in
  * EXACT micro-nat integer units. The fitted per-bucket log-ratio table
  * rides as expression object data (the [[VecExprs]] centroid pattern:
  * a B-sized array serialized once per task, never a plan literal), and
  * the sum is LONG arithmetic, so the result is order-independent and
  * bit-reproducible by the oracle's integer sum — no cross-engine
  * floating-point summation anywhere in the gate. One corpus pass,
  * zero shuffle: the 100 TB scoring path is a scan. */
case class GramWeightMicros(child: Expression, n: Int,
    lrMicros: Array[Long]) extends UnaryExpression {
  require(n >= 1 && lrMicros.nonEmpty)

  override def dataType: DataType = LongType

  def kernel(input: UTF8String): Long = {
    val bs = GramKernel.buckets(input, n, lrMicros.length)
    var acc = 0L
    var i = 0
    while (i < bs.length) { acc += lrMicros(bs(i)); i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(kernel(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramWeightMicros", this,
      classOf[GramWeightMicros].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GramWeightMicros = copy(child = newChild)
}

object GramWeightMicros {
  def apply(c: Column, n: Int, lrMicros: Array[Long]): Column =
    GraftColumnBridge.column(
      GramWeightMicros(GraftColumnBridge.expression(c), n, lrMicros))
}
