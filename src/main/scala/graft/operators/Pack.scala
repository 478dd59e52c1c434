package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget packs
  * (context windows) — the batching step between curation and training.
  * Greedy first-fit in a FIXED document order: a pack closes when the
  * next document would overflow the budget; documents longer than the
  * budget get singleton packs.
  *
  * Scale design: packing is inherently SEQUENTIAL (each decision depends
  * on the running total), so parallelism comes from sharding — documents
  * hash to `shard`, packing runs independently per shard, and pack ids
  * are (shard, local pack) pairs. One shuffle (repartition by shard) +
  * one sorted sequential pass per partition; the per-row state is two
  * longs, so a shard of any size streams. This is the documented
  * mapPartitions case: genuinely per-row sequential state no Catalyst
  * expression can carry. At 100 TB, nShards ≈ cluster cores keeps every
  * core on its own shard stream. Deterministic: (shard, id) total order.
  */
object Pack {

  /** Pack `df` greedily: returns (id, shard, pack_id) with `pack_id`
    * local to the shard, both assigned in ascending id order. */
  def greedy(df: DataFrame, idCol: String, ntokCol: String,
      shardCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(budget > 0, s"budget must be positive: $budget")
    val prepared = df.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(ntokCol).cast("long").as("ntok"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
    // a partition may hold several shards (hash collisions): counters
    // reset on the shard boundary, which the sort puts first
    prepared.as[(Long, Long, Long)].mapPartitions { it =>
      var curShard = Long.MinValue
      var pack = 0L
      var acc = 0L
      var first = true
      it.map { case (shard, id, ntok) =>
        if (first || shard != curShard) {
          curShard = shard; pack = 0L; acc = ntok; first = false
        } else if (acc + ntok <= budget) {
          acc += ntok
        } else {
          pack += 1L; acc = ntok
        }
        (id, shard, pack)
      }
    }.toDF("id", "shard", "pack_id")
  }

  /** Skew-resistant two-level packing: each shard splits
    * into `fanout` deterministic hash sub-shards, packing runs
    * independently per sub-shard (so one hot shard parallelizes across
    * `fanout` streams), and pack ids renumber densely per original
    * shard: sub-shard `s` starts at the sum of earlier sub-shards' pack
    * counts. Trades exact single-stream first-fit order for balance —
    * packs still respect the budget (each is built within one
    * sub-shard) and ids stay contiguous per shard. The offset table is
    * (shards × fanout) rows — metadata-scale at any data size — so the
    * renumbering is one broadcast join + a projection, never a
    * data-sized shuffle. */
  def greedyBalanced(df: DataFrame, idCol: String, ntokCol: String,
      shardCol: String, budget: Long, fanout: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fanout > 0, s"fanout must be positive: $fanout")
    val composite = df.withColumn("_cshard",
      col(shardCol).cast("long") * fanout +
        pmod(xxhash64(col(idCol)), lit(fanout)))
    val packed = greedy(composite, idCol, ntokCol, "_cshard", budget)
      .withColumnsRenamed(Map("shard" -> "_cshard", "pack_id" -> "_lpack"))
    // packs per sub-shard (map-side combined agg over shards×fanout
    // groups), then a prefix-sum offset per original shard
    // FLOOR division (not truncate-toward-zero) so negative shard ids
    // reconstruct correctly: (c − pmod(c, f)) is exactly divisible
    val counts = packed.groupBy(col("_cshard"))
      .agg((max(col("_lpack")) + 1).as("_n"))
      .withColumn("shard",
        ((col("_cshard") - pmod(col("_cshard"), lit(fanout))) / fanout)
          .cast("long"))
      .withColumn("_sub", pmod(col("_cshard"), lit(fanout)))
    val w = Window.partitionBy(col("shard")).orderBy(col("_sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      .select(col("_cshard"), col("shard"), col("_off"))
    packed.join(broadcast(offsets), "_cshard")
      .select(col("id"), col("shard"),
        (col("_off") + col("_lpack")).as("pack_id"))
  }
}
