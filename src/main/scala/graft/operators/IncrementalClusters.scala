package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.GraftTable

/** Incremental duplicate-CLUSTER maintenance: keep the connected-
  * components view of [[IncrementalDedup]]'s near-dup pair table in
  * sync delta-by-delta — the final stage of the continuous-dedup
  * pipeline (corpus CDF → pair syncs → CLUSTER syncs), recomputing
  * only the components a delta touches, never the whole graph.
  *
  * Why not rerun CC per sync: at 100 TB the pair graph is output-scale
  * but still enormous; a delta that edits one document must not pay a
  * full O(pairs) label propagation. A changed document can only affect
  * the components its old and new neighbors belong to — components
  * MERGE when a new pair bridges two of them, SPLIT when a deleted
  * document/pair was a cut vertex/edge — so the sync re-runs CC on the
  * CLOSED affected subgraph only: O(touched components' pairs).
  *
  * State lives in two [[graft.sinks.GraftTable]]s (same replay-
  * idempotence contract as every derived-state operator here):
  *
  *  - '''idRep''' — one row per clustered id: `(id, rep)`, keyed and
  *    bucketed by `id`, so "which component is X in" prunes to X's
  *    bucket. CONTRACT: only ids appearing in ≥1 pair are present
  *    (everything else is an implicit singleton) — so the table equals
  *    `Dedup.connectedComponents(readPairs(pairs))` after every sync.
  *  - '''members''' — the reverse index: `(rep, id, one)`, keyed
  *    `(rep, id)` but BUCKETED by `rep`, so "all members of component
  *    R" prunes to R's bucket (the [[IncrementalAnn]] list-table
  *    pattern; `one` is a constant payload — merges delete by key).
  *
  * Per delta, with `changedIds` = the ids the corpus delta touched
  * (inserted, deleted, and updated — the same id set the pair sync
  * consumed): current NEW neighbors come from the pair index
  * (bucket-pruned probe — the orientation mirror shows both sides);
  * OLD co-members come from the cluster state itself (ids → reps via
  * an idRep probe, reps → members via a members probe, both
  * bucket-pruned — this is how splits find the rest of a component
  * whose connecting pairs no longer exist; the member rows double as
  * the stored-rep lookup, so no further probe is needed).
  * The member closure needs no iteration: an unchanged pair can only
  * connect ids that were ALREADY co-members (same rep), and every
  * changed pair touches a changed id by construction of the pair sync,
  * so `changed ∪ new-neighbors ∪ their components` is closed under the
  * current edge set. CC runs on that subgraph's pairs; the result nets
  * against the stored rows into two key-level merges. */
object IncrementalClusters {

  /** Create (or reopen) the id → component-representative table.
    * Adaptive merge-on-read like the band/pair tables: layers engage
    * only past the affected-bytes floor (small buckets stay CoW — the
    * measured-faster regime at local SF). */
  def idRepTable(root: String, nBuckets: Int = 8): GraftTable =
    new GraftTable(root, Seq("id"), nBuckets, mergeOnRead = true)

  /** Create (or reopen) the component-membership reverse index
    * (adaptive merge-on-read, see [[idRepTable]]). */
  def membersTable(root: String, nBuckets: Int = 8): GraftTable =
    new GraftTable(root, Seq("rep", "id"), nBuckets,
      bucketCols0 = Seq("rep"), mergeOnRead = true)

  /** The operator result: `(id, rep)` for every id in ≥1 pair —
    * identical to `Dedup.connectedComponents` over the pair table. */
  def readClusters(spark: SparkSession, idRep: GraftTable): DataFrame = {
    val df = idRep.read(spark)
    if (df.columns.isEmpty) df else df.select("id", "rep")
  }

  /** Affected subgraphs are delta-scale by design, so CC on them runs
    * on the DRIVER (one bounded collect + union-find) below this edge
    * count, falling back to the distributed
    * [[Dedup.connectedComponents]] above it (bootstraps, full
    * refreshes). A steady-state sync thus pays one job for its CC
    * instead of O(log chain) shuffle rounds. */
  val maxLocalEdges: Int = 1 << 17

  /** One incremental sync, AFTER the pair table's own sync for the same
    * delta. `changedIds` carries one column `idCol` (the delta's
    * distinct ids — deletes included). `seq` must increase per sync;
    * replays no-op on both tables.
    *
    * `touchingPairs`: the pair sync's returned verified set
    * ([[IncrementalDedup.applyDelta]]) — exactly the post-sync pairs
    * touching a changed id, already materialized. When provided, the
    * seed set derives from it directly and the first pair-table probe
    * is skipped (one fewer bucket read per sync in the chained
    * corpus→pairs→clusters consumer). */
  def applyDelta(spark: SparkSession, idRep: GraftTable,
      members: GraftTable, pairs: GraftTable, changedIds: DataFrame,
      idCol: String, seq: String, maxRounds: Int = 50,
      localEdgeCap: Int = maxLocalEdges,
      touchingPairs: Option[DataFrame] = None): Unit = {
    val changed = changedIds.select(col(idCol).cast("long").as("id"))
      .distinct().localCheckpoint()
    // NEW neighbors: pairs touching a changed id — from the pair sync's
    // verified set when chained, else read from the changed ids'
    // buckets only (the mirror makes one-sided probing complete)
    val nbrs = touchingPairs match {
      case Some(v) =>
        v.select(col("id_a").cast("long").as("id"))
          .union(v.select(col("id_b").cast("long").as("id")))
      case None => probeJoin(pairs.readForProbe(spark,
          changed.select(col("id").as("id_a"))),
        changed.select(col("id").as("id_a")), "id_a")
        .map(_.select(col("id_b").as("id"))).getOrElse(emptyIds(spark))
    }
    val seeds = changed.union(nbrs).distinct().localCheckpoint()
    // OLD co-members: seeds → their stored reps → those reps' members.
    // The member rows carry (rep, id), so they double as the stored-rep
    // lookup for every non-seed member — no second idRep probe needed.
    val seedRows = probeJoin(idRep.readForProbe(spark, seeds), seeds, "id")
      .map(_.select(col("id"), col("rep")).localCheckpoint())
    val seedReps = seedRows.map(_.select("rep").distinct())
      .getOrElse(emptyIds(spark).select(col("id").as("rep")))
    val memberRows = probeJoin(members.readForProbe(spark, seedReps),
        seedReps, "rep")
      .map(_.select(col("id"), col("rep")).localCheckpoint())
    val oldMembers = memberRows.map(_.select("id")).getOrElse(emptyIds(spark))
    val memberIds = seeds.union(oldMembers).distinct().localCheckpoint()
    // the affected subgraph's edges (canonical orientation)
    val edges = probeJoin(pairs.readForProbe(spark,
        memberIds.select(col("id").as("id_a"))),
      memberIds.select(col("id").as("id_a")), "id_a")
      .map(_.filter(col("id_a") < col("id_b")).select("id_a", "id_b"))
      .getOrElse(emptyIds(spark).select(col("id").as("id_a"),
        col("id").as("id_b")))
    val fresh = components(spark, edges, maxRounds, localEdgeCap)
    // net against stored rows for the member set: seeds' reps from the
    // idRep probe, every other member's rep from the members probe
    val oldRows = (seedRows.toSeq ++ memberRows.toSeq)
      .reduceOption(_.unionByName(_))
      .map(_.distinct().select(col("id"), col("rep").as("_oldRep")))
      .getOrElse(emptyIds(spark).select(col("id"),
        col("id").as("_oldRep")).limit(0))
    // both merges consume `joined` — materialize once (eager), then
    // commit the two independent state tables CONCURRENTLY (the
    // IncrementalIndex pattern: halves the per-sync fixed commit cost)
    val joined = fresh.join(oldRows, Seq("id"), "full_outer")
      .localCheckpoint()
    val moved = col("rep").isNotNull &&
      (col("_oldRep").isNull || col("_oldRep") =!= col("rep"))
    val dropped = col("rep").isNull && col("_oldRep").isNotNull
    val repUps = joined.filter(moved)
      .select(col("id"), col("rep")).withColumn("_op", lit("I"))
    val repDels = joined.filter(dropped)
      .select(col("id"), lit(null).cast("long").as("rep"))
      .withColumn("_op", lit("D"))
    val memUps = joined.filter(moved)
      .select(col("rep"), col("id"), lit(1).as("one"))
      .withColumn("_op", lit("I"))
    // a moved id leaves its OLD component's bucket; a dropped id too
    val memDels = joined.filter(dropped ||
        (moved && col("_oldRep").isNotNull))
      .select(col("_oldRep").as("rep"), col("id"),
        lit(null).cast("int").as("one"))
      .withColumn("_op", lit("D"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fRep = Future { idRep.merge(
      repUps.unionByName(repDels).withColumn("_seq", lit(seq))) }
    val fMem = Future { members.merge(
      memUps.unionByName(memDels).withColumn("_seq", lit(seq))) }
    Await.result(Future.sequence(Seq(fRep, fMem)), Duration.Inf)
  }

  /** CONTINUOUS cluster maintenance — the final stage of the live
    * dedup chain: one `graft-row-follow` consumer that, per leader
    * commit, runs the near-dup pair sync ([[IncrementalDedup.applyDelta]])
    * and then this operator's cluster sync on the fresh pair state, both
    * under the same `_seq`, so the whole corpus→pairs→clusters chain is
    * exactly-once per commit and resets together on an expired-checkpoint
    * full refresh.
    *
    * {{{
    * spark.readStream.format("graft-row-follow").option("path", root)
    *   .load().writeStream.option("checkpointLocation", ckpt)
    *   .foreachBatch { (df, _) => IncrementalClusters.applyFeedBatch(
    *     df, root, bands, pairs, idRep, members, "doc_id", "text") }
    *   .start()
    * }}}
    */
  def applyFeedBatch(batch: DataFrame, root: String, bands: GraftTable,
      pairs: GraftTable, idRep: GraftTable, members: GraftTable,
      idCol: String, textCol: String,
      cfg: IncrementalDedup.Config = IncrementalDedup.Config()): Unit =
    IncrementalDedup.feedSync(batch, root,
      Seq(bands, pairs, idRep, members), Seq(idCol, textCol)) {
      (spark, corpus, changes, seq) =>
        val verified = IncrementalDedup.applyDelta(spark, bands, pairs,
          corpus, changes, idCol, textCol, seq, cfg)
        applyDelta(spark, idRep, members, pairs,
          changes.select(col(idCol).cast("long").as("id")).distinct(),
          "id", seq, touchingPairs = Some(verified))
    }

  /** CC over the affected subgraph: a bounded collect + driver
    * union-find when the edge set is delta-scale (the steady-state
    * case — one job), the distributed operator otherwise. Both yield
    * rep = smallest id of the component. */
  private def components(spark: SparkSession, edges: DataFrame,
      maxRounds: Int, localEdgeCap: Int): DataFrame = {
    import spark.implicits._
    val head = edges.select(col("id_a").cast("long"),
      col("id_b").cast("long")).limit(localEdgeCap + 1)
      .as[(Long, Long)].collect()
    if (head.length > localEdgeCap)
      Dedup.connectedComponentsStats(edges, "id_a", "id_b", maxRounds)._1
    else Dedup.localComponents(spark, head)
  }

  private def emptyIds(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id"))

  /** `readForProbe` returns an EMPTY (schema-less) frame for a
    * never-written table; callers treat that as "no rows". The join
    * back onto the probe drops same-bucket strangers. */
  private def probeJoin(read: DataFrame, probe: DataFrame,
      key: String): Option[DataFrame] =
    if (read.columns.isEmpty) None else Some(read.join(probe, key))
}
