package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.GraftTable

/** Incremental MATERIALIZED AGGREGATES: per-key corpus statistics
  * (document count, token sum — the `corpus_stats` profile) maintained
  * O(delta) from the row CDF. A different maintenance class from the
  * index/dedup/ANN/cluster families: aggregates here are SUBTRACTABLE
  * (count and sum form a group under ±), so a delta needs no probe of
  * anything except the touched keys' current rows — inserts add,
  * deletes subtract, updates contribute their post−pre difference, and
  * the per-key netting happens in one delta-scale aggregation before a
  * single key-level merge. (Non-subtractable stats — min/max/quantiles
  * — would need the touched keys' rows rescanned; that's the
  * `corpus_stats` batch gate's job, and the documented trade.)
  *
  * State is one [[graft.sinks.GraftTable]] keyed and bucketed by `key`,
  * so readers prune to probed keys and every sync commits
  * snapshot-atomically with `_seq` replay idempotence — the same
  * contract as every derived table in the continuous-curation chain.
  * Keys whose count nets to zero are DELETED, keeping the table equal
  * to the from-scratch aggregate after every sync (spec-pinned). */
object IncrementalStats {

  /** Create (or reopen) the per-key stats table (adaptive
    * merge-on-read: layers only past the affected-bytes floor). */
  def statsTable(root: String, nBuckets: Int = 4): GraftTable =
    new GraftTable(root, Seq("key"), nBuckets, mergeOnRead = true)

  /** The operator result: `(key, n_docs, n_tokens)`, equal to the
    * batch aggregate over the current corpus. */
  def read(spark: SparkSession, stats: GraftTable): DataFrame = {
    val df = stats.read(spark)
    if (df.columns.isEmpty) df
    else df.select("key", "n_docs", "n_tokens")
  }

  /** One incremental sync. `changes` is the row CDF with
    * `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage, carrying `keyCol` and `valueCol` (a per-row
    * LONG measure, e.g. token count). `seq` must increase per sync;
    * replays no-op. */
  def applyDelta(spark: SparkSession, stats: GraftTable,
      changes: DataFrame, keyCol: String, valueCol: String,
      seq: String): Unit = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes.select(col(keyCol).as("key"),
        col(valueCol).cast("long").as("_v"), sign.as("_s"))
      .groupBy("key")
      .agg(sum(col("_s")).as("_dn"),
        sum(col("_s") * col("_v")).as("_dsum"))
      .filter(col("_dn") =!= 0L || col("_dsum") =!= 0L)
      .localCheckpoint(eager = false)
    // current rows for the touched keys only (bucket-pruned probe)
    val currentRead = stats.readForProbe(spark, delta.select("key"))
    val current =
      if (currentRead.columns.isEmpty)
        delta.select(col("key"), lit(0L).as("n_docs"),
          lit(0L).as("n_tokens")).limit(0)
      else currentRead.join(delta.select("key"), "key", "left_semi")
        .select("key", "n_docs", "n_tokens")
    val next = delta.join(current, Seq("key"), "left_outer")
      .select(col("key"),
        (coalesce(col("n_docs"), lit(0L)) + col("_dn")).as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) + col("_dsum")).as("n_tokens"))
    val ups = next.filter(col("n_docs") > 0L).withColumn("_op", lit("I"))
    val dels = next.filter(col("n_docs") <= 0L)
      .select(col("key"), lit(null).cast("long").as("n_docs"),
        lit(null).cast("long").as("n_tokens"))
      .withColumn("_op", lit("D"))
    stats.merge(ups.unionByName(dels).withColumn("_seq", lit(seq)))
  }

  /** CONTINUOUS stats maintenance — a `graft-row-follow` consumer in
    * the same shape as [[IncrementalIndex.applyFeedBatch]]: per leader
    * commit, one [[applyDelta]] keyed by the commit version
    * (exactly-once; expired checkpoints full-refresh). `valueExpr` maps
    * the document columns to the LONG measure (e.g. a token count over
    * the text column). */
  def applyFeedBatch(batch: DataFrame, root: String, stats: GraftTable,
      keyCol: String, textCol: String,
      valueExpr: org.apache.spark.sql.Column): Unit =
    IncrementalDedup.feedSync(batch, root, Seq(stats),
      Seq(keyCol, textCol)) { (spark, _, changes, seq) =>
      applyDelta(spark, stats,
        changes.withColumn("_v", valueExpr), keyCol, "_v", seq)
    }
}
