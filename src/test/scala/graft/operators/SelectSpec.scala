package graft.operators

import graft.SparkSpec
import graft.functions.{GramBuckets, GramWeightMicros}
import org.apache.spark.sql.functions._

/** DSIR importance resampling: the gram-bucket kernel against a plain
  * Scala reference, exactness of the integer weight path, and the
  * selection semantics (target-looking docs win; deterministic under a
  * fixed seed; k without replacement). */
class SelectSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bucketer: tokenize like the oracle, hash the joined gram
    * string with the polynomial-31 fold, unsigned mod. */
  private def refBuckets(text: String, n: Int, b: Int): Seq[Int] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    toks.sliding(n).filter(_.length == n).map { g =>
      val s = g.mkString(" ")
      var h = 0L
      s.getBytes("UTF-8").foreach(c => h = h * 31L + (c & 0xffL))
      java.lang.Long.remainderUnsigned(h, b.toLong).toInt
    }.toSeq
  }

  test("GramBuckets matches the reference tokenizer/hash, with " +
      "multiplicity and order") {
    val texts = Seq(
      "The quick  Brown fox\tjumps over the quick brown fox",
      "single",
      "",
      "  \t \n ",
      "a b a b a b",
      "MiXeD CaSe MiXeD CaSe")
    val got = texts.toDF("t")
      .select(GramBuckets(col("t"), 2, 64).as("b"))
      .as[Seq[Int]].collect().toSeq
    val want = texts.map(refBuckets(_, 2, 64))
    assert(got == want)
  }

  test("WordNGrams materializes the same grams the reference builds, " +
      "with multiplicity and order") {
    val texts = Seq(
      "The quick  Brown fox\tjumps over the quick brown fox",
      "single", "", "a b a b a b", "X y Z")
    val got = texts.toDF("t")
      .select(graft.functions.WordNGrams(col("t"), 2).as("g"))
      .as[Seq[String]].collect().toSeq
    val want = texts.map { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    assert(got == want)
    // trigram variant
    val g3 = texts.toDF("t")
      .select(graft.functions.WordNGrams(col("t"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    val w3 = texts.map { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    }
    assert(g3 == w3)
  }

  test("GramWeightMicros == exact integer sum of per-gram ratios") {
    val lr = Array.tabulate(64L.toInt)(i => (i * 13L) - 400L)
    val texts = Seq("alpha beta gamma delta", "x y", "solo")
    val got = texts.toDF("t")
      .select(GramWeightMicros(col("t"), 2, lr).as("w"))
      .as[Long].collect().toSeq
    val want = texts.map(t => refBuckets(t, 2, 64).map(b => lr(b)).sum)
    assert(got == want)
  }

  test("importance scoring runs on a STREAM: the ratio table is task " +
      "object data, so ingest-time quality gating needs no joins/state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = Select.Config(buckets = 256)
    val raw = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val target = Seq("alpha beta alpha beta").toDF("text")
    val lr = Select.fitLogRatioMicros(raw, target, "text", cfg)

    val in = MemoryStream[(Long, String)]
    val scored = Select.importanceWeights(
      in.toDF().toDF("doc_id", "text"), "text", lr, cfg.n)
    val q = scored.writeStream.format("memory")
      .queryName("dsir_stream").outputMode("append").start()
    in.addData((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT doc_id, logw_micros FROM dsir_stream")
      .as[(Long, Long)].collect().toMap
    val want = Select.importanceWeights(raw, "text", lr, cfg.n)
      .select(col("doc_id"), col("logw_micros"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got(1L) > got(2L), "target-like doc must outscore")
  }

  test("dsir prefers target-looking documents and is deterministic") {
    val tgtish = (1L to 30L).map(i =>
      (i, s"spark shuffle partition codegen catalyst plan stage $i"))
    val offish = (31L to 60L).map(i =>
      (i, s"weather rain cloud storm sunshine valley river lake $i"))
    val raw = (tgtish ++ offish).toDF("doc_id", "text")
    val target = Seq("spark shuffle partition codegen catalyst tungsten",
      "catalyst plan stage shuffle partition spark")
      .toDF("text")
    val cfg = Select.Config(buckets = 512)
    val picked = Select.dsir(raw, target, "doc_id", "text",
      k = 20, seed = 7L, cfg)
    val rows = picked.select("doc_id").as[Long].collect().toSet
    assert(rows.size == 20, "k without replacement")
    assert(rows.count(_ <= 30L) >= 15,
      s"target-like docs must dominate the sample: $rows")
    // weights separate the two populations
    val lr = Select.fitLogRatioMicros(raw, target, "text", cfg)
    val w = Select.importanceWeights(raw, "text", lr, cfg.n)
      .select(col("doc_id"), col("logw_micros")).as[(Long, Long)]
      .collect().toMap
    val avgT = tgtish.map(d => w(d._1)).sum / 30.0
    val avgO = offish.map(d => w(d._1)).sum / 30.0
    assert(avgT > avgO, s"target-like avg weight $avgT <= off $avgO")
    // same seed → identical sample; different seed → different sample
    val again = Select.dsir(raw, target, "doc_id", "text",
      k = 20, seed = 7L, cfg).select("doc_id").as[Long].collect().toSet
    assert(again == rows)
    val other = Select.dsir(raw, target, "doc_id", "text",
      k = 20, seed = 8L, cfg).select("doc_id").as[Long].collect().toSet
    assert(other != rows)
  }
}
