package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SplitMix64

/** Deterministic corpus shuffle-sharding — the training-data ordering
  * pass: every example gets a pseudorandom 64-bit sort key that is a pure
  * function of (id, seed), the keyspace is split into `shards` output
  * streams, and each shard is densely position-numbered. Re-running with
  * the same seed reproduces the byte-identical order — which is the whole
  * point: training jobs need resumable, replica-consistent data order, so
  * `rand()` (per-task, per-retry nondeterministic) is banned here.
  *
  * Scale shape: one shuffle (hash on `shard`) + a shard-local sort — the
  * window's partition key IS the shard, so Catalyst plans exactly
  * repartition + sortWithinPartitions, never a global sort. At 100 TB you
  * size `shards` so one shard ≈ one output file (e.g. 2^17 shards for
  * ~1 GB shards); the mixer's avalanche guarantees balanced shards for
  * any id distribution, including dense sequential ids.
  */
object Shard {

  /** Assign (sort_key, shard, pos) to every row. `shards` must be a power
    * of two: the shard is the key's low bits, which keeps the oracle
    * reproducible (bitwise AND is sign-independent) and at scale lets a
    * reader re-split or coalesce shards without reshuffling (shard id
    * prefixes nest). */
  def deterministic(df: DataFrame, idCol: String, seed: Long,
      shards: Int): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two, got $shards")
    val w = Window.partitionBy("shard").orderBy(col("sort_key"), col(idCol))
    df.withColumn("sort_key", SplitMix64(col(idCol).bitwiseXOR(lit(seed))))
      .withColumn("shard",
        col("sort_key").bitwiseAND(lit((shards - 1).toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  // ---- DuckDB oracle: SplitMix64 via HUGEINT mod-2^64 arithmetic ----
  // DuckDB BIGINT +/* error on overflow, so the adds and multiplies run
  // in HUGEINT with explicit mod 2^64; xor runs on BIGINT (two's
  // complement, same bits as Java) with sign-recentering either side.
  private val M = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val H = "CAST('9223372036854775808' AS HUGEINT)" // 2^63
  private def toU(signed: String) =
    s"(CASE WHEN ($signed) < 0 THEN CAST(($signed) AS HUGEINT) + $M " +
      s"ELSE CAST(($signed) AS HUGEINT) END)"
  private def toS(unsigned: String) =
    s"CAST(CASE WHEN ($unsigned) >= $H THEN ($unsigned) - $M " +
      s"ELSE ($unsigned) END AS BIGINT)"
  /** (u ^ (u >>> k)) on an unsigned HUGEINT in [0, 2^64). The shifted
    * value is < 2^(64-k), so it casts to BIGINT directly. */
  private def xorShift(u: String, k: Int) =
    toU(s"xor(${toS(u)}, CAST(($u) // ${1L << k} AS BIGINT))")
  /** (u * c) mod 2^64 with u < 2^64: split c into 32-bit halves so no
    * intermediate exceeds 2^96 (HUGEINT holds 2^127). */
  private def mulMod(u: String, c: BigInt) = {
    val lo = c & 0xffffffffL
    val hi = c >> 32
    s"((($u) * $lo + ((($u) * $hi) % 4294967296) * 4294967296) % $M)"
  }
  private val C1 = BigInt("9E3779B97F4A7C15", 16)
  private val K1 = BigInt("BF58476D1CE4E5B9", 16)
  private val K2 = BigInt("94D049BB133111EB", 16)

  /** CTE chain computing `sort_key` = SplitMix64(idExpr ^ seed) as signed
    * BIGINT for each row of `table` — stage-per-step so the expression
    * tree stays linear. Exposes all of `table`'s columns plus `sort_key`
    * via the final `${prefix}sk` CTE. Pass a distinct `prefix` to use
    * the chain more than once in one query (composed oracles). */
  def sortKeySql(table: String, idExpr: String, seed: Long,
      prefix: String = "_"): String = s"""
    ${prefix}u0 AS (SELECT *, ${toU(s"xor($idExpr, $seed)")} AS u FROM $table),
    ${prefix}z1 AS (SELECT * EXCLUDE (u), ((u + $C1) % $M) AS u FROM ${prefix}u0),
    ${prefix}x1 AS (SELECT * EXCLUDE (u), ${xorShift("u", 30)} AS u FROM ${prefix}z1),
    ${prefix}m1 AS (SELECT * EXCLUDE (u), ${mulMod("u", K1)} AS u FROM ${prefix}x1),
    ${prefix}x2 AS (SELECT * EXCLUDE (u), ${xorShift("u", 27)} AS u FROM ${prefix}m1),
    ${prefix}m2 AS (SELECT * EXCLUDE (u), ${mulMod("u", K2)} AS u FROM ${prefix}x2),
    ${prefix}sk AS (SELECT * EXCLUDE (u), ${toS(xorShift("u", 31))} AS sort_key
            FROM ${prefix}m2)"""
}
