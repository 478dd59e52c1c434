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
}
