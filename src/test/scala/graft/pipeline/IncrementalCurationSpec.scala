package graft.pipeline

import graft.SparkSpec
import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
import graft.operators.Dedup
import graft.sinks.{CurrentStateSink, GraftTable}
import graft.sources.CdcLogSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** The CDC → training-corpus composition the engine exists for: a
  * replicated `docs` table lands through the streaming pipeline into a
  * GraftTable, and a DERIVED curation table (exact-dedup clusters keyed
  * by content fingerprint) is maintained INCREMENTALLY from the row
  * CDF — each sync re-curates only content groups a changed row
  * touches, never the whole corpus. At 100 TB this is the difference
  * between an O(delta) maintenance pass and an O(corpus) rebuild per
  * sync; correctness is pinned by comparing against the from-scratch
  * rebuild after every step. */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val docsSchema = TableSchemaV(1L, "docs", 0L, IndexedSeq(
    ColumnSpec("doc_id", "int8", nullable = false, pkOrdinal = 1),
    ColumnSpec("text", "text")))

  private def appendLog(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def packed(id: Long, text: String) =
    graft.core.PackedRow.render(Seq(Some(id.toString), Some(text)))
  private def ins(lsn: Long, ord: Long, id: Long, text: String) =
    CdcLogSource.renderLine("I", 1L, lsn, lsn, ord, 0L, None,
      Some(packed(id, text)))
  private def upd(lsn: Long, ord: Long, id: Long, text: String) =
    CdcLogSource.renderLine("U", 1L, lsn, lsn, ord, 0L,
      Some(packed(id, "")), Some(packed(id, text)))
  private def del(lsn: Long, ord: Long, id: Long, text: String) =
    CdcLogSource.renderLine("D", 1L, lsn, lsn, ord, 0L,
      Some(packed(id, text)), None)

  /** Re-curate ONLY the content groups touched by `changes` (a row-CDF
    * feed with `_change_type`): recompute those groups from the current
    * corpus and MERGE the result into the derived table — upserts for
    * groups that still have members, deletes for emptied ones. */
  private def applyCurationDelta(curated: GraftTable, corpus: DataFrame,
      changes: DataFrame, version: Long): Unit = {
    val touched = changes
      .select(Dedup.normText(col("text")).as("content_key")).distinct()
    val groups = corpus
      .withColumn("content_key", Dedup.normText(col("text")))
      .join(touched, "content_key")
      .groupBy("content_key")
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
    val gone = touched.join(groups, Seq("content_key"), "left_anti")
    val seq = f"$version%016x/0000000000000000"
    val delta = groups.withColumn("_op", lit("I"))
      .unionByName(gone.select(col("content_key"),
        lit(null).cast("long").as("rep_id"),
        lit(null).cast("long").as("n_dups"), lit("D").as("_op")))
      .withColumn("_seq", lit(seq))
    curated.merge(delta)
  }

  private def fullRebuild(corpus: DataFrame): Set[(String, Long, Long)] =
    corpus.groupBy(Dedup.normText(col("text")).as("content_key"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
      .as[(String, Long, Long)].collect().toSet

  test("derived dedup table tracks the replicated corpus via O(delta) CDF passes") {
    val dir = tmp("cdc-curation")
    val log = s"$dir/wal.log"
    val sink = new CurrentStateSink(s"$dir/tables", _ => Seq("doc_id"), 4)
    val registry = new SchemaRegistry
    registry.put(docsSchema)
    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 100, maxFillMs = 50,
        checkpointDir = s"$dir/ckpt", stateDir = s"$dir/state"),
      registry, sink, CdcPipeline.jsonDecode)
    pipeline.stateStore.force(1L, TableState.Ready)

    // sync 1: five docs, 1 and 4 exact dupes (modulo whitespace/case)
    appendLog(log, Seq(
      ins(1L, 0L, 1L, "The quick  brown fox"),
      ins(1L, 1L, 2L, "jumps over the lazy dog"),
      ins(1L, 2L, 3L, "entirely novel content"),
      ins(1L, 3L, 4L, "the QUICK brown fox"),
      ins(1L, 4L, 5L, "another unique text")))
    val q = pipeline.startStream(log)
    q.processAllAvailable()

    val docs = sink.tableFor("docs")
    val curated = new GraftTable(s"$dir/curated", Seq("content_key"), 4)
    def corpus = docs.read(spark).select("doc_id", "text")

    // bootstrap = "everything changed": full-refresh CDF feed
    var cursor = -1L
    val boot = docs.rowChangesSince(spark, cursor)
    applyCurationDelta(curated, corpus, boot.rows, 1L)
    cursor = boot.version
    def curatedSet = curated.read(spark)
      .select("content_key", "rep_id", "n_dups")
      .as[(String, Long, Long)].collect().toSet
    assert(curatedSet == fullRebuild(corpus))
    assert(curatedSet.find(_._2 == 1L).get._3 == 2L) // {1,4} clustered

    // sync 2: doc 2 becomes a dupe of 3; doc 6 arrives; doc 5 deleted
    appendLog(log, Seq(
      upd(2L, 0L, 2L, "Entirely novel CONTENT"),
      ins(2L, 1L, 6L, "fresh sixth document"),
      del(2L, 2L, 5L, "another unique text")))
    q.processAllAvailable()
    q.stop()

    val delta = docs.rowChangesSince(spark, cursor)
    assert(!delta.fullRefresh, "retained cursor must give a delta feed")
    applyCurationDelta(curated, corpus, delta.rows, 2L)
    cursor = delta.version

    val after = curatedSet
    assert(after == fullRebuild(corpus), s"incremental diverged: $after")
    // doc 2 joined 3's cluster (rep = min id = 2); its old singleton
    // group is GONE (merge delete path)
    assert(after.find(_._1 == "entirely novel content")
      .contains(("entirely novel content", 2L, 2L)), after)
    assert(!after.exists(_._1 == "jumps over the lazy dog"))
  }

  test("search index tracks the replicated corpus via O(delta) CDF passes") {
    import graft.functions.TextFunctions
    import graft.operators.{IncrementalIndex, Retrieval}
    val dir = tmp("cdc-searchindex")
    val log = s"$dir/wal.log"
    val sink = new CurrentStateSink(s"$dir/tables", _ => Seq("doc_id"), 4)
    val registry = new SchemaRegistry
    registry.put(docsSchema)
    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 100, maxFillMs = 50,
        checkpointDir = s"$dir/ckpt", stateDir = s"$dir/state"),
      registry, sink, CdcPipeline.jsonDecode)
    pipeline.stateStore.force(1L, TableState.Ready)

    appendLog(log, Seq(
      ins(1L, 0L, 1L, "spark shuffles data across partitions"),
      ins(1L, 1L, 2L, "catalyst optimizes the logical plan"),
      ins(1L, 2L, 3L, "data partitions and data skew"),
      ins(1L, 3L, 4L, "broadcast joins avoid the shuffle")))
    val q = pipeline.startStream(log)
    q.processAllAvailable()

    val docs = sink.tableFor("docs")
    val postings = IncrementalIndex.postingsTable(s"$dir/postings", 8)
    val dlens = IncrementalIndex.docTable(s"$dir/doclens", 4)
    val stats = IncrementalIndex.statsTable(s"$dir/istats")
    def toksOf(df: DataFrame, extra: String*): DataFrame =
      df.select((col("doc_id") +:
        TextFunctions.tokens(col("text")).as("toks") +:
        extra.map(col)): _*)
    def corpus = toksOf(docs.read(spark).select("doc_id", "text"))
    def queries = Seq((50L, "data partitions"), (51L, "spark broadcast"))
      .toDF("q_id", "qtext")
      .select(col("q_id"), TextFunctions.tokens(col("qtext")).as("q_toks"))
    def check(label: String): Unit = {
      val got = IncrementalIndex.bm25TopK(spark, postings, dlens, stats,
          queries, "q_id", "q_toks", k = 4)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      val want = Retrieval.bm25TopK(corpus, "doc_id", "toks",
          queries, "q_id", "q_toks", k = 4)
        .orderBy("q_id", "rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
      assert(got == want, s"$label: index $got vs from-scratch $want")
    }

    // bootstrap: full-refresh feed (all rows arrive as inserts)
    var cursor = -1L
    val boot = docs.rowChangesSince(spark, cursor)
    IncrementalIndex.applyDelta(spark, postings, dlens, stats,
      toksOf(boot.rows, "_change_type"), "doc_id", "toks",
      f"${1L}%016x/0")
    cursor = boot.version
    check("bootstrap")

    // sync 2: doc 2 rewritten, doc 5 arrives, doc 3 deleted — the
    // same replicated WAL drives both the table and the index
    appendLog(log, Seq(
      upd(2L, 0L, 2L, "catalyst rewrites plans with rules"),
      ins(2L, 1L, 5L, "adaptive execution re-plans shuffles"),
      del(2L, 2L, 3L, "data partitions and data skew")))
    q.processAllAvailable()
    q.stop()
    val delta = docs.rowChangesSince(spark, cursor)
    assert(!delta.fullRefresh, "retained cursor must give a delta feed")
    IncrementalIndex.applyDelta(spark, postings, dlens, stats,
      toksOf(delta.rows, "_change_type"), "doc_id", "toks",
      f"${2L}%016x/0")
    check("after CDC delta")
  }
}
