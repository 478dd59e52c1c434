package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.functions.{GramBuckets, HyperplaneSig, Interleave2, NGramHashes,
  RollingHash, SplitMix64, VecDot, WordNGrams}
import graft.sinks.{ChangelogSink, GraftTable}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions AND its storage as SQL
  * table-valued functions, so a plain SQL user gets the whole surface
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`):
  *
  *   SELECT rolling_hash(text),                -- codegen'd fingerprint
  *          ngram_hashes(text, 3),             -- hashed shingle set
  *          vec_dot(a, b),                     -- double-fold dot product
  *          hyperplane_sig(vec, 8),            -- LSH bucket signature
  *          splitmix64(id),                    -- deterministic shuffle key
  *          interleave2(rx, ry)                -- Morton (Z-order) key
  *
  *   SELECT * FROM graft_table('/path/t')      -- current snapshot
  *   SELECT * FROM graft_table_version('/path/t', 3)   -- time travel
  *   SELECT * FROM graft_changelog('/sink', 'users')   -- raw changelog
  *   SELECT * FROM graft_changelog_latest('/sink', 'users', 'id')
  *
  * This is the injection-point pattern from SURVEY §2.9/§4: the
  * reference has no optimizer, so the extension surface is the function
  * + table-function registry (the SQL analog of the reference's
  * destination "views": BigQuery CDC tables, ClickHouse FINAL views).
  * The TVFs return the ANALYZED plan of the engine's own readers, so
  * manifest pruning / mergeSchema behavior is identical to the
  * programmatic API.
  */
object GraftExtensions {
  /** Register the same functions on an ALREADY-RUNNING session (the
    * builder-time extension can't retrofit an existing one). Analyzer
    * rules are fixed at session construction, so the composite-key SPJ
    * auto-injection ([[graft.plans.GraftSpjInjectRule]]) is available
    * only through the builder path (`spark.sql.extensions=
    * graft.GraftExtensions`); install() still sets the session conf the
    * hand-written `_bucket` workaround needs. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    // only the DEFAULT is overridden — an explicit user choice wins
    // (same guard as the rule's constructor)
    if (!spark.sessionState.conf.contains(
        "spark.sql.requireAllClusterKeysForCoPartition"))
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        "false")
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("rolling_hash",
      args => RollingHash(args.head), "built-in")
    r.createOrReplaceTempFunction("ngram_hashes",
      args => NGramHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    r.createOrReplaceTempFunction("vec_dot",
      args => VecDot(args.head, args(1)), "built-in")
    r.createOrReplaceTempFunction("hyperplane_sig",
      args => HyperplaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        if (args.length > 2) args(2).eval().asInstanceOf[Number].intValue()
        else 0), "built-in")
    r.createOrReplaceTempFunction("splitmix64",
      args => SplitMix64(args.head), "built-in")
    r.createOrReplaceTempFunction("interleave2",
      args => Interleave2(args.head, args(1)), "built-in")
    r.createOrReplaceTempFunction("gram_buckets",
      args => GramBuckets(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()), "built-in")
    r.createOrReplaceTempFunction("word_ngrams",
      args => WordNGrams(args.head,
        args(1).eval().asInstanceOf[Number].intValue()), "built-in")
    val t = spark.sessionState.tableFunctionRegistry
    t.createOrReplaceTempFunction("graft_table",
      args => tableBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_table_version",
      args => tableVersionBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_changelog",
      args => changelogBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_changelog_latest",
      args => changelogLatestBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_table_changes",
      args => tableChangesBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_search",
      args => searchBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_chunks",
      args => chunksBuilder(args), "built-in")
    t.createOrReplaceTempFunction("graft_ann",
      args => annBuilder(args), "built-in")
  }

  // ------------------------------------------------- table-function bodies
  private def str(e: Expression, what: String): String = {
    val v = e.eval()
    require(v != null, s"$what must be a literal string")
    v.toString
  }
  private def long(e: Expression, what: String): Long = {
    val v = e.eval()
    require(v != null, s"$what must be a literal integer")
    v.asInstanceOf[Number].longValue()
  }
  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  private[graft] def tableBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    plan(GraftTable.open(str(args.head, "root path")).read(spark))
  }
  private[graft] def tableVersionBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    plan(GraftTable.open(str(args.head, "root path"))
      .readVersion(spark, long(args(1), "version")))
  }
  private[graft] def changelogBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    plan(new ChangelogSink(str(args.head, "sink dir"))
      .read(spark, str(args(1), "table")))
  }
  private[graft] def tableChangesBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val t = GraftTable.open(str(args.head, "root path"))
    val from = long(args(1), "from version")
    plan(
      if (args.length >= 3)
        t.rowChangesBetween(spark, from, long(args(2), "to version")).rows
      else t.rowChangesSince(spark, from).rows)
  }
  /** `graft_search(indexRoot, 'query text'[, k])` — BM25 top-k against
    * a maintained [[graft.operators.IncrementalIndex]] whose three
    * tables live under `indexRoot/{postings,docs,stats}` (the layout
    * the bm25_incremental gate and IncrementalCurationSpec use). The
    * tables reopen through their persisted identity (keys/buckets), so
    * the probe is bucket-pruned exactly like the programmatic API. */
  private[graft] def searchBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val root = str(args.head, "index root")
    val query = str(args(1), "query text")
    val k = if (args.length > 2) long(args(2), "k").toInt else 10
    import org.apache.spark.sql.functions.lit
    val q = spark.range(1).select(lit(0L).as("q_id"),
      graft.functions.TextFunctions.tokens(lit(query)).as("q_toks"))
    plan(graft.operators.IncrementalIndex.bm25TopK(spark,
        GraftTable.open(s"$root/postings"), GraftTable.open(s"$root/docs"),
        GraftTable.open(s"$root/stats"), q, "q_id", "q_toks", k)
      .drop("q_id"))
  }

  /** `graft_ann(indexRoot, 'v1,v2,...'[, k[, nProbe]])` — IVF top-k
    * against a maintained [[graft.operators.IncrementalAnn]] index
    * whose tables live under `indexRoot/{lists,cents}`. The query
    * vector is a comma-separated float literal; the probe reads only
    * the nProbe nearest lists' buckets, exactly like the programmatic
    * API. */
  private[graft] def annBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val root = str(args.head, "index root")
    val vec = str(args(1), "query vector")
      .split(",").map(_.trim.toFloat).toSeq
    val k = if (args.length > 2) long(args(2), "k").toInt else 10
    val nProbe = if (args.length > 3) long(args(3), "nProbe").toInt else 2
    import org.apache.spark.sql.functions.{lit, typedLit}
    val q = spark.range(1).select(lit(0L).as("q_id"),
      typedLit(vec).as("q_vec"))
    plan(graft.operators.IncrementalAnn.search(spark,
        GraftTable.open(s"$root/lists"), GraftTable.open(s"$root/cents"),
        q, k, nProbe)
      .drop("q_id"))
  }

  /** `graft_chunks(root, idCol, textCol[, window[, stride]])` — the RAG
    * chunking pass over a graft table as a SQL table: one row per
    * overlapping token window ([[graft.operators.Chunk.tokenWindows]]
    * semantics — snap-back final window, full coverage). */
  private[graft] def chunksBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val root = str(args.head, "root path")
    val idCol = str(args(1), "id column")
    val textCol = str(args(2), "text column")
    val w = if (args.length > 3) long(args(3), "window").toInt else 256
    val s = if (args.length > 4) long(args(4), "stride").toInt else w * 3 / 4
    plan(graft.operators.Chunk.tokenWindows(
      GraftTable.open(root).read(spark), idCol, textCol, w, s))
  }

  private[graft] def changelogLatestBuilder(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    plan(new ChangelogSink(str(args.head, "sink dir"))
      .latest(spark, str(args(1), "table"),
        str(args(2), "key columns").split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(e: SparkSessionExtensions): Unit = {
    // composite-key SPJ: inject the implied `_bucket = _bucket` join
    // term so co-bucketed multi-key graft tables plan shuffle-free
    // without the user hand-writing the workaround (see the rule's
    // scaladoc for the stand-down conditions)
    e.injectResolutionRule(spark => new graft.plans.GraftSpjInjectRule(spark))
    // fail-loud physical guard: a `_bucket = _bucket` join across graft
    // scans whose CAPTURED layouts differ (hand-written across
    // mismatched tables, or a rebucket landing between analysis and
    // planning) would silently drop rows — refuse to execute it instead
    e.injectQueryStagePrepRule(spark => new graft.plans.GraftSpjGuardRule(spark))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    e.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(str, n) - distinct hashed word n-gram set"),
      (args: Seq[Expression]) => NGramHashes(args.head,
        args(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of numeric arrays in double"),
      (args: Seq[Expression]) => VecDot(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(vec, nPlanes[, offset]) - LSH signature"),
      (args: Seq[Expression]) => HyperplaneSig(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        if (args.length > 2) args(2).eval().asInstanceOf[Number].intValue()
        else 0)))
    e.injectTableFunction((
      FunctionIdentifier("graft_table"),
      info("graft_table", "graft_table(root) - current snapshot of a graft table"),
      (args: Seq[Expression]) => GraftExtensions.tableBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_table_version"),
      info("graft_table_version",
        "graft_table_version(root, v) - time travel to snapshot v"),
      (args: Seq[Expression]) => GraftExtensions.tableVersionBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_changelog"),
      info("graft_changelog",
        "graft_changelog(dir, table) - append-only change stream"),
      (args: Seq[Expression]) => GraftExtensions.changelogBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_changelog_latest"),
      info("graft_changelog_latest",
        "graft_changelog_latest(dir, table, keys) - current-state view"),
      (args: Seq[Expression]) => GraftExtensions.changelogLatestBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      info("graft_table_changes",
        "graft_table_changes(root, fromVersion[, toVersion]) - row-level " +
          "change feed (insert | delete | update_preimage | " +
          "update_postimage)"),
      (args: Seq[Expression]) => GraftExtensions.tableChangesBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_search"),
      info("graft_search",
        "graft_search(indexRoot, query[, k]) - BM25 top-k against a " +
          "maintained incremental search index"),
      (args: Seq[Expression]) => GraftExtensions.searchBuilder(args)))
    e.injectFunction((
      FunctionIdentifier("splitmix64"),
      info("splitmix64", "splitmix64(x) - full-avalanche 64-bit mixer " +
        "(deterministic shuffle keys)"),
      (args: Seq[Expression]) => SplitMix64(args.head)))
    e.injectFunction((
      FunctionIdentifier("interleave2"),
      info("interleave2", "interleave2(a, b) - Morton (Z-order) bit " +
        "interleave of two 31-bit ranks"),
      (args: Seq[Expression]) => Interleave2(args.head, args(1))))
    e.injectTableFunction((
      FunctionIdentifier("graft_ann"),
      info("graft_ann",
        "graft_ann(indexRoot, 'v1,v2,..'[, k[, nProbe]]) - IVF top-k " +
          "against a maintained incremental ANN index"),
      (args: Seq[Expression]) => GraftExtensions.annBuilder(args)))
    e.injectTableFunction((
      FunctionIdentifier("graft_chunks"),
      info("graft_chunks",
        "graft_chunks(root, idCol, textCol[, window[, stride]]) - " +
          "overlapping token-window chunks of a graft table"),
      (args: Seq[Expression]) => GraftExtensions.chunksBuilder(args)))
  }
}
