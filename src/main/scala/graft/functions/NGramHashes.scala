package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-n-gram shingle set of a text column, as one
  * byte-level pass: lowercase → whitespace tokenize → xxhash64 each token
  * → combine n consecutive token hashes → distinct, sorted.
  *
  * Exists because the equivalent Catalyst array-expression pipeline
  * (split + filter + nested transform + sequence + array_distinct) runs
  * on the INTERPRETED higher-order-function path at ~5 ms/document —
  * measured 23 s for 5,000 docs at sf0.1. This expression does the same
  * work in a tight loop (~µs/doc), which is what a 100 TB dedup scan
  * needs. Token boundaries (whitespace, empties dropped, ASCII lowercase)
  * match TextFunctions.tokens / the DuckDB oracle tokenizer, so Jaccard
  * cardinalities are identical.
  *
  * Stays inside whole-stage codegen via the [[VecExprs]] object-data
  * pattern: `doGenCode` emits a direct monomorphic `kernel()` call on
  * the expression instance (`ctx.addReferenceObj`) — the per-byte loop
  * is the cost either way, but the fallback wrapper's boxed
  * `eval(InternalRow)` used to break the surrounding stage.
  */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def kernel(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    // 1. token hashes: scan for ASCII-whitespace-separated runs,
    //    lowercasing ASCII letters in place (copy)
    val buf = new Array[Byte](bytes.length)
    var tokCount = 0
    var tokHashes = new Array[Long](math.max(8, bytes.length / 5))
    var i = 0
    var tokLen = 0
    def flushToken(): Unit = if (tokLen > 0) {
      if (tokCount == tokHashes.length)
        tokHashes = java.util.Arrays.copyOf(tokHashes, tokCount * 2)
      tokHashes(tokCount) =
        XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, tokLen, 42L)
      tokCount += 1
      tokLen = 0
    }
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
        b == '\f' || b == 0x0b
      if (isWs) flushToken()
      else {
        buf(tokLen) = if (b >= 'A' && b <= 'Z') (b | 0x20).toByte else b
        tokLen += 1
      }
      i += 1
    }
    flushToken()
    // 2. n-gram combine + distinct
    if (tokCount < n) return new GenericArrayData(Array.empty[Long])
    val set = new java.util.HashSet[java.lang.Long](tokCount * 2)
    val out = new Array[Long](tokCount - n + 1)
    var outLen = 0
    var g = 0
    while (g <= tokCount - n) {
      var h = 42L
      var k = n - 1
      while (k >= 0) { h = XXH64.hashLong(tokHashes(g + k), h); k -= 1 }
      if (set.add(h)) { out(outLen) = h; outLen += 1 }
      g += 1
    }
    val res = java.util.Arrays.copyOf(out, outLen)
    java.util.Arrays.sort(res)
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nGramHashes", this,
      classOf[NGramHashes].getName)
    defineCodeGen(ctx, ev, v => s"$ref.kernel($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashes =
    copy(child = newChild)
}

object NGramHashes {
  def apply(c: Column, n: Int): Column =
    GraftColumnBridge.column(NGramHashes(GraftColumnBridge.expression(c), n))
}
