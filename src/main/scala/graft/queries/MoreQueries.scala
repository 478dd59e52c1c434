package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Sessionize

/** Additional analytics + behavioral queries: deeper join trees (Catalyst
  * join ordering / broadcast at scale) and sessionization. */
object MoreQueries {
  private def dec92(c: String) = col(c).cast(DecimalType(9, 2))
  private def dec32(c: String) = col(c).cast(DecimalType(3, 2))
  private val one = lit(1).cast(DecimalType(3, 2))

  /** TPC-H Q5 shape: 6-way join, revenue per nation. region/nation are
    * fixed-cardinality (5/25 rows) so a broadcast hint is safe at any SF;
    * customer/supplier grow linearly with SF, so they carry no hint — AQE
    * broadcasts them while small and falls back to shuffled joins past the
    * broadcast limit instead of OOMing at 100x scale. */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val supplier = Tables.load(spark, dir, "supplier")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
        col("o_orderdate") < lit("1998-01-01 00:00:00"))
    val li = Tables.load(spark, dir, "lineitem")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec92("l_extendedprice") * (one - dec32("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  /** TPC-H Q18 shape: large-order customers — aggregate, semi-join on the
    * aggregate result (HAVING pushed through), re-aggregate. */
  def q18TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    // ONE lineitem pass: the per-order quantity sum the HAVING filter
    // needs IS the output aggregate (each surviving order joins exactly
    // one orders/customer row), so re-joining lineitem and re-aggregating
    // — the textbook formulation — would scan and shuffle the fact table
    // twice for nothing
    val big = li.groupBy("l_orderkey")
      .agg(sum(dec92("l_quantity")).as("qty"))
      .filter(col("qty") > 150)
    big.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).cast(DoubleType)
          .as("totalprice"),
        col("qty").cast(DoubleType).as("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Sql: String = """
    SELECT c_name, c_custkey, o_orderkey,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(9,2))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2))
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20"""

  /** Gap-based sessionization over the events stream (30-minute
    * inactivity): per-session start/end/count/value rollup via the
    * Sessionize operator. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("user_id", "ts_ms", "value")
    Sessionize.sessions(ev, "user_id", "ts_ms", "value", gapMs = 1800000L)
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String = """
    WITH g AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, value,
        CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), value) IS NULL
               OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), value) > 1800000
             THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts_ms, value,
        CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, value
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id,
      MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id"""
}
