package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag corpus documents
  * sharing at least one word n-gram with a held-out benchmark/eval set —
  * the standard n-gram-overlap contamination check LLM data pipelines
  * run before training (published practice: GPT-3 appendix C / Gopher
  * appendix A.3-style n-gram collision tests; exact variant, no
  * hashing, so results are oracle-checkable).
  *
  * Scale design (100 TB corpus, small benchmark): per-document n-gram
  * sets dedupe MAP-SIDE (`array_distinct` before the explode — no
  * global distinct over the corpus gram stream), the join is an
  * equijoin on the gram string against the benchmark's (small) distinct
  * gram set — AQE broadcasts it when it fits — and the count needs no
  * distinct aggregation because both join inputs are already unique per
  * key. The corpus is read once; nothing quadratic anywhere.
  */
object Contamination {

  /** Per-document DISTINCT word n-grams, tokenized on whitespace after
    * lowercasing (the same tokenization the dedup family uses). */
  private def docGrams(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        expr(s"transform(sequence(0, size(tk) - $n), " +
          s"i -> array_join(slice(tk, i + 1, $n), ' '))"))).as("gram"))

  /** (doc_id, n_shared): corpus documents that share ≥1 word `n`-gram
    * with ANY benchmark document, with the count of distinct shared
    * grams — the contamination report to filter or audit against. */
  def sharedNgrams(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    val cg = docGrams(corpus, textCol, idCol, n)
    val bg = docGrams(benchmark, textCol, idCol, n)
      .select("gram").distinct()
    // both sides unique per (doc_id, gram) / gram → plain count is the
    // distinct shared-gram count, no distinct agg needed
    cg.join(bg, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** FUZZY decontamination by benchmark containment — the
    * high-n-gram-overlap test of the PaLM / Llama-2 eval-contamination
    * methodology (and Brown et al.'s 13-gram filter generalized to a
    * fraction): flag (corpus doc, benchmark doc) pairs where at least
    * `threshold` of the benchmark document's distinct word n-grams
    * appear in the corpus document,
    *
    *   containment(c, b) = |grams(b) ∩ grams(c)| / |grams(b)| ≥ τ.
    *
    * Containment — not Jaccard — is the right asymmetric metric here: a
    * long training document that embeds a short eval question whole is
    * maximal contamination but near-zero Jaccard.
    *
    * Same scale shape as [[sharedNgrams]]: corpus grams dedupe map-side
    * and meet the small benchmark gram set in an equijoin (AQE
    * broadcasts it), so only corpus grams that actually occur in the
    * benchmark survive past the join; the (doc, bench) pair aggregation
    * is bounded by shared-gram pairs, never corpus×benchmark. */
  def benchmarkContainment(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int,
      threshold: Double): DataFrame = {
    val cg = docGrams(corpus, textCol, idCol, n)
    val bg = docGrams(benchmark, textCol, idCol, n)
      .withColumnRenamed("doc_id", "bench_id")
    val bSizes = bg.groupBy("bench_id").agg(count(lit(1)).as("sz_b"))
    cg.join(bg, "gram")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(bSizes, "bench_id")
      .filter(col("inter").cast("double") / col("sz_b") >= threshold)
      .withColumn("containment",
        round(col("inter").cast("double") / col("sz_b"), 6))
      .select("doc_id", "bench_id", "containment")
  }
}
