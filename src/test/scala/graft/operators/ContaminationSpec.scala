package graft.operators

import graft.SparkSpec

/** Benchmark decontamination: planted n-gram overlaps are found with
  * exact shared-gram counts; clean documents stay unflagged. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("sharedNgrams flags planted overlaps with exact distinct counts") {
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains "the quick brown fox" and "quick brown fox jumps" → 2
      (1L, "once the quick brown fox jumps away"),
      // benchmark 4-gram repeated twice → still ONE distinct shared gram
      (2L, "pack my box with junk pack my box with junk"),
      // same tokens, different order → no shared 4-gram
      (3L, "fox brown quick the dog lazy the over"),
      (4L, "completely unrelated words nothing here matches at all")
    ).toDF("doc_id", "text")
    val got = Contamination.sharedNgrams(corpus, benchmark,
      "text", "doc_id", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L), got)
  }

  test("tokenization matches the dedup family (case + whitespace folding)") {
    val benchmark = Seq((9L, "Alpha  Beta\tGamma Delta")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = Contamination.sharedNgrams(corpus, benchmark,
      "text", "doc_id", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L), got)
  }
}
