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

  test("benchmarkContainment: an embedded eval question is maximal " +
      "containment even where Jaccard is near zero") {
    val eval = "what is the capital of france"
    val benchmark = Seq((100L, eval)).toDF("doc_id", "text")
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $eval $filler"), // embeds the whole question
      (2L, s"what is the capital city"), // partial overlap
      (3L, filler) // none
    ).toDF("doc_id", "text")
    val got = Contamination.benchmarkContainment(corpus, benchmark,
        "text", "doc_id", n = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._3)).toMap
    assert(got(1L) == 1.0, s"full embed must hit 1.0: $got")
    assert(got(2L) == 0.5, s"2 of 4 eval 3-grams shared: $got")
    assert(!got.contains(3L))
    // Jaccard of doc 1 vs the eval text is tiny — containment is the
    // metric that still fires
    val j = Dedup.ngramJaccardPairs(
      corpus.filter($"doc_id" === 1L).unionByName(
        benchmark.withColumnRenamed("doc_id", "doc_id")),
      "text", "doc_id", n = 3, threshold = 0.3)
    assert(j.isEmpty, "Jaccard must NOT fire on the embedded question")
    // threshold filters
    val thr = Contamination.benchmarkContainment(corpus, benchmark,
        "text", "doc_id", n = 3, threshold = 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(thr == Set(1L))
  }
}
