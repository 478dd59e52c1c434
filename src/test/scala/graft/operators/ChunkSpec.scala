package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("tokenWindows covers every token, respects window/stride") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks → 4 chunks
      (2L, "a b c"),                                   // short → 1 chunk
      (3L, "  one   two\tthree  "),                    // messy whitespace
      (4L, ""),                                        // empty → no chunks
      (5L, (1 to 33).map(i => s"w$i").mkString(" "))   // n = window+1 → 2
    ).toDF("doc_id", "text")
    val out = Chunk.tokenWindows(docs, "doc_id", "text", window = 32,
      stride = 24).orderBy("doc_id", "chunk_id").collect()

    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.toSeq).toMap
    assert(!byDoc.contains(4L), "empty doc emits nothing")
    assert(byDoc(2L).size == 1 && byDoc(2L).head.getAs[String]("chunk_text")
      == "a b c")
    assert(byDoc(3L).head.getAs[String]("chunk_text") == "one two three")
    // doc 1: 100 tokens, starts 0,24,48 then the snap-back tail at 68
    assert(byDoc(1L).map(_.getAs[Long]("start")) == Seq(0L, 24L, 48L, 68L))
    assert(byDoc(1L).map(_.getAs[Long]("n_tokens")) == Seq(32L, 32L, 32L, 32L))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = byDoc(1L).flatMap { r =>
      val s = r.getAs[Long]("start")
      s until (s + r.getAs[Long]("n_tokens"))
    }.toSet
    assert(covered == (0L until 100L).toSet)
    // doc 5: 33 tokens → two windows, the second is a full window ending at 33
    assert(byDoc(5L).map(_.getAs[Long]("start")) == Seq(0L, 1L))
    assert(byDoc(5L).map(_.getAs[Long]("n_tokens")) == Seq(32L, 32L))
  }

  test("chunk reassembly of non-overlapping windows rebuilds the doc") {
    val docs = Seq((7L, (1 to 48).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunk.tokenWindows(docs, "doc_id", "text", window = 16,
      stride = 16).orderBy("chunk_id")
      .agg(concat_ws(" ", collect_list("chunk_text")))
      .as[String].head()
    assert(out == (1 to 48).map(i => s"x$i").mkString(" "))
  }

  test("plan is a single codegen'd project — no shuffle, no UDF") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunk.tokenWindows(docs, "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
