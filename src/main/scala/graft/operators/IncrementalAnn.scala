package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.GraftTable

/** Incremental ANN index maintenance: a PERSISTENT IVF index (coarse
  * centroids + inverted lists) kept in sync with a mutating vector
  * corpus by applying only change deltas — the similarity-search member
  * of the derived-state family ([[IncrementalIndex]] maintains the BM25
  * index, [[IncrementalDedup]] the near-dup pair state; this serves
  * nearest-neighbor queries from durable state that follows the corpus
  * O(delta) per sync, never an O(corpus) re-index).
  *
  * State lives in two [[graft.sinks.GraftTable]]s:
  *
  *  - '''lists''' — the inverted file: one row per vector,
  *    `(list_id, id, vec)`, keyed `(list_id, id)` but BUCKETED by
  *    `list_id` alone, so a query wave reads only the buckets its
  *    probed lists hash into ([[GraftTable.readForProbe]]) — work per
  *    wave is O(probed lists), independent of corpus size.
  *  - '''centroids''' — the coarse quantizer, `(list_id, centroid)`,
  *    metadata-scale (k rows, single bucket). FROZEN after bootstrap:
  *    retraining would reassign every list at once (an O(corpus)
  *    rewrite); the standard IVF deployment trains once on a sample
  *    and re-bootstraps offline when drift warrants it. Kept as table
  *    state so the index is self-contained on disk — a fresh session
  *    opens both tables and serves.
  *
  * Per delta: postimage rows assign to their list with the SAME kernel
  * the batch operator uses ([[graft.functions.NearestCentroids]] —
  * one broadcast-free projection); OLD `(list_id, id)` keys derive
  * from the CDF preimages (assign the preimage vector — no index read
  * at all, the [[IncrementalIndex]] preimage trick). Netting old
  * against new yields one merge: an update that moves a vector between
  * lists deletes the old key and upserts the new; an update that
  * leaves the vector bit-identical writes nothing. Writes touch only
  * the changed lists' buckets.
  *
  * The invariant (pinned in IncrementalAnnSpec and the
  * `ann_incremental` oracle): after every sync, [[search]] ==
  * IVF-Flat over the current corpus with the same centroids. */
object IncrementalAnn {

  /** Create (or reopen) the inverted-lists table. Merge-on-read:
    * per-sync vector moves commit as layers instead of rewriting every
    * touched list bucket — O(delta) writes against a corpus-scale
    * index; probe reads stay pruned to the probed lists' buckets. */
  def listsTable(root: String, nBuckets: Int = 16,
      morMinAffectedBytes: Long =
        GraftTable.MorMinAffectedBytesDefault): GraftTable =
    new GraftTable(root, Seq("list_id", "id"), nBuckets,
      bucketCols0 = Seq("list_id"), mergeOnRead = true,
      morMinAffectedBytes = morMinAffectedBytes)

  /** Create (or reopen) the centroids table. */
  def centroidsTable(root: String): GraftTable =
    new GraftTable(root, Seq("list_id"), 1)

  /** The frozen quantizer, ordered by list id (row i = list i — the
    * index space [[graft.functions.NearestCentroids]] scores over). */
  def loadCentroids(spark: SparkSession, cents: GraftTable)
      : Array[Array[Double]] =
    cents.read(spark).orderBy("list_id")
      .select(transform(col("centroid"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)

  /** Bootstrap with EXPLICIT centroids (callers wanting trained ones
    * pass [[Similarity.trainCoarse]]'s output — the spec pins that
    * path's equality with the batch operator). Persists the quantizer,
    * then loads the corpus as one all-insert delta. */
  def bootstrap(spark: SparkSession, lists: GraftTable,
      cents: GraftTable, corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], seq: String): Unit = {
    import spark.implicits._
    cents.merge(centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .withColumn("_op", lit("I")).withColumn("_seq", lit(seq)))
    applyDelta(spark, lists, cents,
      corpus.select(col(idCol), col(vecCol))
        .withColumn("_change_type", lit("insert")),
      idCol, vecCol, seq)
  }

  /** One incremental sync. `changes` carries the row CDF:
    * (idCol, vecCol, _change_type ∈ insert | delete | update_preimage |
    * update_postimage). `seq` must be strictly increasing across syncs
    * (replay-idempotence key — a replayed delta filters to a no-op). */
  def applyDelta(spark: SparkSession, lists: GraftTable,
      cents: GraftTable, changes: DataFrame, idCol: String,
      vecCol: String, seq: String): Unit = {
    val centroids = loadCentroids(spark, cents)
    require(centroids.nonEmpty, "bootstrap must persist centroids first")
    val ch = changes.select(col(idCol).as("id"), col(vecCol).as("vec"),
      col("_change_type")).cache()
    try {
      def assigned(df: DataFrame): DataFrame = df.withColumn("list_id",
        element_at(
          graft.functions.NearestCentroids(col("vec"), centroids, 1), 1))
      val after = assigned(ch.filter(col("_change_type")
        .isin("insert", "update_postimage")).select("id", "vec"))
      val before = assigned(ch.filter(col("_change_type")
        .isin("delete", "update_preimage")).select("id", "vec"))
      val vecType = ch.schema("vec").dataType
      // upsert only where the stored vector actually changes; delete
      // keys that vanished (true deletes + list-crossing updates).
      // OLD nets against NEW in ONE (list_id, id) aggregation over the
      // tagged union (the CDF carries at most one pre- and one
      // post-image per id, so first() per side is exact) — the
      // round-15 shape reconciled the two sides with a join + an
      // anti-join, two extra exchanges of the delta per sync.
      val net = after.withColumn("_side", lit(1))
        .unionByName(before.withColumn("_side", lit(2)))
        .groupBy("list_id", "id").agg(
          first(when(col("_side") === 1, col("vec")), ignoreNulls = true)
            .as("_vNew"),
          first(when(col("_side") === 2, col("vec")), ignoreNulls = true)
            .as("_vOld"))
      val ins = net
        .filter(col("_vNew").isNotNull &&
          (col("_vOld").isNull || col("_vOld") =!= col("_vNew")))
        .select(col("list_id"), col("id"), col("_vNew").as("vec"))
        .withColumn("_op", lit("I"))
      val del = net
        .filter(col("_vNew").isNull && col("_vOld").isNotNull)
        .select(col("list_id"), col("id"),
          lit(null).cast(vecType).as("vec"))
        .withColumn("_op", lit("D"))
      lists.merge(ins.unionByName(del).withColumn("_seq", lit(seq)))
    } finally ch.unpersist()
  }

  /** IVF top-k against the maintained index — same contract, scoring,
    * and tie-breaks as [[Similarity.ivfTopK]]'s search phase, but the
    * corpus side is the index: query vectors pick their nProbe nearest
    * lists, ONLY those lists' buckets are read, and candidates score
    * exactly. Work per query wave is O(probed lists' vectors). */
  def search(spark: SparkSession, lists: GraftTable, cents: GraftTable,
      queries: DataFrame, k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = loadCentroids(spark, cents)
    val probed = queries.select(col(qId), col(qVec),
        Similarity.norm(col(qVec)).as("_qn"))
      .withColumn("list_id", explode(
        graft.functions.NearestCentroids(col(qVec), centroids, nProbe)))
    val cands = lists.readForProbe(spark,
      probed.select("list_id").distinct())
    // candidate norms once per row, not per (query, candidate) pair
    val scored = cands.withColumn("_cn", Similarity.norm(col("vec")))
      .join(broadcast(probed), "list_id")
      .withColumn("sim", round(Similarity.cosinePre(col(qVec), col("vec"),
        col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col("id").as("c_id"), col("sim"), col("rank"))
  }

  /** CONTINUOUS maintenance: consume one micro-batch of the
    * `graft-row-follow` stream of a replicated vector table — the
    * [[IncrementalIndex.applyFeedBatch]] composition for similarity
    * search. Each leader commit applies as its own [[applyDelta]] with
    * `_seq` = the commit version (exactly-once across restarts). An
    * expired checkpoint (full-refresh feed) truncates the LISTS only —
    * the frozen quantizer survives, so re-bootstrap is one all-insert
    * delta, not a retrain. */
  def applyFeedBatch(batch: DataFrame, root: String, lists: GraftTable,
      cents: GraftTable, idCol: String, vecCol: String): Unit = {
    val feeds = graft.sources.GraftRowFeed
      .transitionFeeds(batch, GraftTable.open(root))
    feeds.foreach { case (v, fullRefresh, rows) =>
      val seq = f"$v%016x/${0L}%016x"
      if (fullRefresh) lists.truncate()
      val delta = rows
        .filter(if (fullRefresh) col("_change_type") === "insert"
                else lit(true))
        .select(col(idCol), col(vecCol), col("_change_type"))
      applyDelta(rows.sparkSession, lists, cents, delta, idCol, vecCol, seq)
    }
  }

  /** Periodic maintenance — compaction + snapshot expiry, the
    * [[IncrementalIndex.maintain]] contract. Data-identical. */
  def maintain(spark: SparkSession, lists: GraftTable, cents: GraftTable,
      maxFilesPerBucket: Int = 4, keepVersions: Int = 2): Unit =
    Seq(lists, cents).foreach { t =>
      t.compact(spark, maxFilesPerBucket)
      t.vacuum(keepVersions)
    }
}
