package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the IncrementalIndex invariant: after EVERY sync, querying the
  * maintained index equals the from-scratch [[Retrieval.bm25TopK]]
  * over the current corpus — inserts, updates (including ones that
  * leave some term frequencies unchanged), deletes, and replayed
  * deltas all included. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def toksDf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))

  private def corpusDf(state: Map[Long, String]): DataFrame =
    toksDf(state.toSeq.toDF("doc_id", "text"))

  test("index query equals from-scratch BM25 through mutations + replay") {
    val postings = IncrementalIndex.postingsTable(tmp("ii-post"), 8)
    val docs = IncrementalIndex.docTable(tmp("ii-docs"), 4)
    val stats = IncrementalIndex.statsTable(tmp("ii-stats"))
    var state = (1L to 12L).map(i =>
      i -> s"doc $i talks about topic${i % 4} and theme${i % 3} stuff")
      .toMap

    def changes(prev: Map[Long, String], next: Map[Long, String]) = {
      val ins = (next.keySet -- prev.keySet).toSeq
        .map(id => (id, next(id), "insert"))
      val del = (prev.keySet -- next.keySet).toSeq
        .map(id => (id, prev(id), "delete"))
      val upd = (next.keySet & prev.keySet).toSeq
        .filter(id => prev(id) != next(id))
        .flatMap(id => Seq((id, prev(id), "update_preimage"),
          (id, next(id), "update_postimage")))
      (ins ++ del ++ upd).toDF("doc_id", "text", "_change_type")
        .select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("toks"),
          col("_change_type"))
    }

    def queries = Seq((100L, "topic1 theme2 stuff"),
        (101L, "doc 3 talks")).toDF("q_id", "qtext")
      .select(col("q_id"), TextFunctions.tokens(col("qtext")).as("q_toks"))

    def check(label: String): Unit = {
      val got = IncrementalIndex.bm25TopK(spark, postings, docs, stats,
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = Retrieval.bm25TopK(corpusDf(state), "doc_id", "toks",
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want, s"$label: index $got vs batch $want")
      // stats row must equal the corpus aggregate exactly
      val (n, total) = {
        val r = stats.read(spark).select("n", "total").head()
        (r.getLong(0), r.getLong(1))
      }
      val wantN = state.size.toLong
      val wantTotal = corpusDf(state)
        .agg(sum(size(col("toks")))).head().getLong(0)
      assert((n, total) == (wantN, wantTotal),
        s"$label stats ($n,$total) != ($wantN,$wantTotal)")
    }

    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      changes(Map.empty, state), "doc_id", "toks", "0000000000000001/0")
    check("bootstrap")

    // mixed delta: one insert, one delete, one update that keeps some
    // term frequencies identical (only "theme" terms move)
    val next = state - 5L +
      (13L -> "doc 13 talks about topic9 and theme9 stuff") +
      (3L -> "doc 3 talks about topic3 and theme9 stuff")
    val delta2 = changes(state, next)
    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      delta2, "doc_id", "toks", "0000000000000002/0")
    state = next
    check("mixed delta")

    // replay of the same delta (same seq) must be a no-op
    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      delta2, "doc_id", "toks", "0000000000000002/0")
    check("replayed delta")
  }

  test("indexed phrase search equals the batch operator through deltas") {
    val postings = IncrementalIndex.postingsTable(tmp("ii-ph-post"), 8)
    val docs = IncrementalIndex.docTable(tmp("ii-ph-docs"), 4)
    val stats = IncrementalIndex.statsTable(tmp("ii-ph-stats"))
    var state = Map(
      1L -> "the model talks about data and talks about scale",
      2L -> "talks about nothing else",
      3L -> "about talks reversed here",
      4L -> "unrelated words entirely")
    def delta(prev: Map[Long, String], next: Map[Long, String]) = {
      val ins = (next.keySet -- prev.keySet).toSeq
        .map(id => (id, next(id), "insert"))
      val del = (prev.keySet -- next.keySet).toSeq
        .map(id => (id, prev(id), "delete"))
      val upd = (next.keySet & prev.keySet).toSeq
        .filter(id => prev(id) != next(id))
        .flatMap(id => Seq((id, prev(id), "update_preimage"),
          (id, next(id), "update_postimage")))
      (ins ++ del ++ upd).toDF("doc_id", "text", "_change_type")
        .select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("toks"),
          col("_change_type"))
    }
    val phrase = Seq((0, "talks"), (1, "about")).toDF("slot", "term")
    def check(label: String): Unit = {
      val got = IncrementalIndex.phraseSearch(spark, postings, phrase)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      val want = Retrieval.phraseSearch(corpusDf(state), "doc_id", "toks",
          phrase).orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(got == want, s"$label: index $got vs batch $want")
      assert(want.nonEmpty, s"$label: degenerate fixture")
    }
    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      delta(Map.empty, state), "doc_id", "toks", "0000000000000001/0")
    check("bootstrap") // docs 1 (×2 hits) and 2 match; 3 reversed no
    val next = state - 2L +
      (4L -> "now it also talks about things") + // phrase appears
      (1L -> "the model talks mostly of scale")  // phrase disappears
    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      delta(state, next), "doc_id", "toks", "0000000000000002/0")
    state = next
    check("after mutations")
  }

  test("applyFeedBatch keeps the index live over the graft-row-follow " +
      "stream (checkpointed, replay-guarded)") {
    import graft.sinks.GraftTable
    val dir = tmp("ii-feed")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("doc_id"), nBuckets = 4,
      retainVersions = 10)
    val postings = IncrementalIndex.postingsTable(s"$dir/post", 8)
    val dlens = IncrementalIndex.docTable(s"$dir/docs", 4)
    val stats = IncrementalIndex.statsTable(s"$dir/stats")
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalIndex.applyFeedBatch(df, root, postings, dlens,
            stats, "doc_id", "text")
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def queries = Seq((50L, "data plans"), (51L, "spark catalyst"))
      .toDF("q_id", "qtext")
      .select(col("q_id"), TextFunctions.tokens(col("qtext")).as("q_toks"))
    def check(label: String): Unit = {
      val corpus = toksDf(leader.read(spark).select("doc_id", "text"))
      val got = IncrementalIndex.bm25TopK(spark, postings, dlens, stats,
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = Retrieval.bm25TopK(corpus, "doc_id", "toks",
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want, s"$label: index $got vs from-scratch $want")
    }

    leader.overwrite(Seq(
      (1L, "spark shuffles data across partitions"),
      (2L, "catalyst plans queries"),
      (3L, "data skew hurts throughput")).toDF("doc_id", "text"))
    pass(); check("bootstrap")

    // real CDC-shaped commits: update, delete (preimage text rides the
    // feed), and an insert — each commit applies as its own sync
    leader.merge(Seq(
        (2L, "catalyst rewrites plans with rules", "U",
          "0000000000000010/0000000000000000"),
        (3L, "", "D", "0000000000000011/0000000000000000"))
      .toDF("doc_id", "text", "_op", "_seq"))
    leader.append(Seq((9L, "adaptive execution replans shuffles"))
      .toDF("doc_id", "text"))
    pass(); check("cdc delta")

    // no new commits → the replayed pass must be a no-op
    pass(); check("replay no-op")
  }

  test("applyFeedBatch tracks a MERGE-ON-READ leader: layered commits " +
      "feed exact O(delta) CDF rows; maintenance collapse is a no-op") {
    import graft.sinks.GraftTable
    val dir = tmp("ii-feed-mor")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("doc_id"), nBuckets = 4,
      retainVersions = 10, mergeOnRead = true, morMinAffectedBytes = 0L)
    val postings = IncrementalIndex.postingsTable(s"$dir/post", 8)
    val dlens = IncrementalIndex.docTable(s"$dir/docs", 4)
    val stats = IncrementalIndex.statsTable(s"$dir/stats")
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalIndex.applyFeedBatch(df, root, postings, dlens,
            stats, "doc_id", "text")
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def queries = Seq((50L, "data plans"), (51L, "spark catalyst"))
      .toDF("q_id", "qtext")
      .select(col("q_id"), TextFunctions.tokens(col("qtext")).as("q_toks"))
    def check(label: String): Unit = {
      val corpus = toksDf(leader.read(spark).select("doc_id", "text"))
      val got = IncrementalIndex.bm25TopK(spark, postings, dlens, stats,
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = Retrieval.bm25TopK(corpus, "doc_id", "toks",
          queries, "q_id", "q_toks", k = 5)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want, s"$label: index $got vs from-scratch $want")
    }

    leader.overwrite(Seq(
      (1L, "spark shuffles data across partitions"),
      (2L, "catalyst plans queries"),
      (3L, "data skew hurts throughput")).toDF("doc_id", "text"))
    pass(); check("bootstrap")

    // layered commits: the merges land as delta layers (base untouched)
    // and the row feed must still deliver the exact CDF per commit
    leader.merge(Seq(
        (2L, "catalyst rewrites plans with rules", "U",
          "0000000000000010/0000000000000000"),
        (3L, "", "D", "0000000000000011/0000000000000000"))
      .toDF("doc_id", "text", "_op", "_seq"))
    assert(leader.hasLayers, "precondition: merge must commit as a layer")
    leader.merge(Seq((9L, "adaptive execution replans shuffles", "I",
        "0000000000000012/0000000000000000"))
      .toDF("doc_id", "text", "_op", "_seq"))
    pass(); check("layered cdc deltas")

    // a maintenance collapse mid-stream (sameData commit) must feed
    // NOTHING — the index stays untouched and still matches
    leader.collapseLayers(spark)
    assert(!leader.hasLayers)
    pass(); check("after collapse (empty feed)")

    // and the next layered commit keeps flowing
    leader.merge(Seq((1L, "spark shuffles fewer rows now", "U",
        "0000000000000013/0000000000000000"))
      .toDF("doc_id", "text", "_op", "_seq"))
    pass(); check("post-collapse delta")
  }

  test("applyFeedBatch: expired checkpoint resets and re-bootstraps " +
      "the index from the full-refresh feed") {
    import graft.sinks.GraftTable
    val dir = tmp("ii-feed-exp")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("doc_id"), nBuckets = 4,
      retainVersions = 2)
    val postings = IncrementalIndex.postingsTable(s"$dir/post", 8)
    val dlens = IncrementalIndex.docTable(s"$dir/docs", 4)
    val stats = IncrementalIndex.statsTable(s"$dir/stats")
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalIndex.applyFeedBatch(df, root, postings, dlens,
            stats, "doc_id", "text")
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def check(label: String): Unit = {
      val corpus = toksDf(leader.read(spark).select("doc_id", "text"))
      val queries = Seq((50L, "spark data rules"))
        .toDF("q_id", "qtext").select(col("q_id"),
          TextFunctions.tokens(col("qtext")).as("q_toks"))
      val got = IncrementalIndex.bm25TopK(spark, postings, dlens, stats,
          queries, "q_id", "q_toks", k = 8)
        .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
      val want = Retrieval.bm25TopK(corpus, "doc_id", "toks",
          queries, "q_id", "q_toks", k = 8)
        .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want, s"$label: index $got vs from-scratch $want")
    }

    leader.overwrite(Seq((1L, "spark shuffles data"),
      (2L, "catalyst plans rules")).toDF("doc_id", "text"))
    pass(); check("bootstrap")
    // churn far past retention (keep 2): the checkpointed version
    // expires, so the next pass opens with a full-refresh feed and the
    // index must reset instead of double-counting
    leader.merge(Seq((3L, "rules for spark data", "I", "03"))
      .toDF("doc_id", "text", "_op", "_seq"))
    leader.merge(Seq((1L, "spark shuffles fewer data rows", "U", "04"))
      .toDF("doc_id", "text", "_op", "_seq"))
    leader.merge(Seq((2L, "", "D", "05"))
      .toDF("doc_id", "text", "_op", "_seq"))
    pass(); check("after expiry full-refresh")
  }

  test("maintain compacts sync-accumulated files; data identical") {
    val postings = IncrementalIndex.postingsTable(tmp("ii-post3"), 4,
      morMinAffectedBytes = 0L)
    val docs = IncrementalIndex.docTable(tmp("ii-docs3"), 2)
    val stats = IncrementalIndex.statsTable(tmp("ii-stats3"))
    var state = Map.empty[Long, String]
    // 6 syncs, each touching every bucket → files pile up per bucket
    (1L to 6L).foreach { i =>
      val next = (1L to 8L).map(d =>
        d -> s"doc $d version $i common words w${d % 3}").toMap
      val post = toksDf(next.toSeq.toDF("doc_id", "text"))
        .withColumn("_change_type",
          lit(if (state.isEmpty) "insert" else "update_postimage"))
      val changes =
        if (state.isEmpty) post
        else post.unionByName(toksDf(state.toSeq.toDF("doc_id", "text"))
          .withColumn("_change_type", lit("update_preimage")))
      IncrementalIndex.applyDelta(spark, postings, docs, stats,
        changes, "doc_id", "toks", f"$i%016x/0")
      state = next
    }
    // the postings table is merge-on-read: syncs pile up LIVE delta
    // layers (plus retired snapshots' files) until maintenance collapses
    // them back to one clean base and vacuum reclaims the rest
    def diskFiles(t: graft.sinks.GraftTable): Int = {
      val root = java.nio.file.Paths.get(t.root)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    assert(postings.readManifest(postings.currentVersion.get)
      .layers.nonEmpty, "syncs must have accumulated delta layers")
    val diskBefore = diskFiles(postings)
    val baseBuckets = postings.readManifest(postings.currentVersion.get)
      .files.size
    assert(diskBefore > baseBuckets,
      s"layer files expected on disk: $diskBefore vs $baseBuckets buckets")
    val rowsBefore = postings.read(spark)
      .orderBy("term", "id").collect().toSeq
    IncrementalIndex.maintain(spark, postings, docs, stats,
      maxFilesPerBucket = 1, keepVersions = 1)
    assert(postings.readManifest(postings.currentVersion.get)
      .layers.isEmpty, "maintenance must collapse the layers")
    val diskAfter = diskFiles(postings)
    assert(diskAfter < diskBefore,
      s"vacuum must reclaim dead files: $diskBefore -> $diskAfter")
    assert(postings.read(spark).orderBy("term", "id").collect().toSeq
      == rowsBefore, "maintenance must be data-identical")
  }

  test("postings are a real secondary index: term probes prune buckets") {
    val postings = IncrementalIndex.postingsTable(tmp("ii-post2"), 16)
    val docs = IncrementalIndex.docTable(tmp("ii-docs2"), 4)
    val stats = IncrementalIndex.statsTable(tmp("ii-stats2"))
    val state = (1L to 40L).map(i =>
      i -> s"shared filler words plus unique u$i v${i * 7} w${i * 13}")
      .toMap
    IncrementalIndex.applyDelta(spark, postings, docs, stats,
      corpusDf(state).withColumn("_change_type", lit("insert")),
      "doc_id", "toks", "0000000000000001/0")
    val allFiles = postings.read(spark).inputFiles.length
    assert(allFiles > 4, s"want many bucket files: $allFiles")
    val probed = postings.readForProbe(spark,
      Seq("u7").toDF("term")).inputFiles.length
    assert(probed > 0 && probed < allFiles,
      s"term probe must scan a strict subset: $probed of $allFiles")
  }
}
