package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal / range join queries — the two classic joins Spark's
  * optimizer has no native operator for (a naive formulation plans as a
  * BroadcastNestedLoopJoin that is quadratic and broadcast-bound at
  * scale). Both are gated bit-exactly: DuckDB has a native ASOF JOIN
  * with the same inclusive-`>=` tie rule as [[AsOfJoin]], and the range
  * join's binned equijoin must reproduce the plain BETWEEN join. */
object JoinQueries {

  /** Each event enriched with the same user's most recent purchase at
    * or before the event (point-in-time lookup). The gate runs the
    * BUCKETED two-pass form — the skew-immune 100 TB path — against
    * DuckDB's native ASOF JOIN. Times compare as epoch micros (exact:
    * source timestamps are µs-aligned; both engines see identical
    * longs). Purchases pre-deduped per (user, µs) with `max_by` so the
    * as-of pick is deterministic under ties. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val probe = ev.select(col("event_id"), col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("t_us"), col("value"))
    val state = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("p_us"))
      .agg(max_by(col("value"), col("event_id")).as("p_value"))
    // one-day buckets: a month of events → ~30-way parallelism per hot
    // user; small keys pay one extra metadata-scale shuffle
    AsOfJoin.joinBucketed(probe, state, Seq("user_id"), "t_us", "p_us",
        bucketWidth = 86400L * 1000000L)
      .orderBy("event_id")
  }

  val asofJoinSql: String = """
    WITH probe AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us, value
      FROM events),
    state AS (
      SELECT user_id, epoch_us(ts) AS p_us, max_by(value, event_id) AS p_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT p.event_id, p.user_id, p.event_type, p.t_us, p.value,
           s.p_us, s.p_value
    FROM probe p ASOF LEFT JOIN state s
      ON p.user_id = s.user_id AND p.t_us >= s.p_us
    ORDER BY p.event_id"""

  /** Band join with NO equality key: lineitems whose unit price falls
    * within ±0.05 of a part's retail price, aggregated per part. The
    * binned equijoin must reproduce DuckDB's plain BETWEEN join
    * bit-exactly (IEEE division/comparison are deterministic). Bin
    * width 0.1 = the interval width → ≤2 bins per interval. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select((col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        col("l_quantity"))
    val parts = Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        (col("p_retailprice") - lit(0.05)).as("lo"),
        (col("p_retailprice") + lit(0.05)).as("hi"))
    RangeJoin.pointInInterval(li, parts, "unit_price", "lo", "hi",
        binWidth = 0.1)
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_matches"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("p_partkey")
  }

  val rangeJoinSql: String = """
    SELECT p.p_partkey, count(*) AS n_matches,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM part p JOIN lineitem l
      ON l.l_extendedprice / l.l_quantity
         BETWEEN p.p_retailprice - 0.05 AND p.p_retailprice + 0.05
    GROUP BY 1 ORDER BY 1"""
}
