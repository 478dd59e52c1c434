package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Window-function and set-operation coverage (SURVEY §2.5 — absent in
  * the reference, Spark built-ins in this engine; declared here so the
  * inventory check sees them exercised against oracles). */
object AnalyticQueries {
  private def dec92(c: String) = col(c).cast(DecimalType(9, 2))

  /** Ranking + lag + running sum per supplier over the shipment timeline.
    * Ordering carries a full unique tie-break (shipdate, orderkey,
    * linenumber) so every window value is deterministic. */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 45) // keep output bounded
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        lag(col("l_orderkey"), 1).over(w).as("prev_order"),
        sum(dec92("l_quantity")).over(running).cast(DoubleType)
          .as("running_qty"))
      .orderBy("l_suppkey", "rn")
  }

  val windowAnalyticsSql: String = """
    SELECT l_suppkey, l_orderkey, l_linenumber,
      ROW_NUMBER() OVER w AS rn,
      LAG(l_orderkey, 1) OVER w AS prev_order,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_qty
    FROM lineitem
    WHERE l_quantity >= 45
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ORDER BY l_suppkey, rn"""

  /** Multi-level ROLLUP aggregation (the Expand-based grouping-sets
    * physical path): per-(flag,status) stats plus per-flag and grand
    * totals in one pass. NULL grouping rows are COALESCEd to a sentinel
    * on BOTH sides so ordering is total and null-order conventions can't
    * diverge between engines. */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(9, 2)))
          .cast(DoubleType).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("qty"))
      .orderBy("flag", "status")

  val rollupStatsSql: String = """
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
      COALESCE(l_linestatus, 'ALL') AS status,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY flag, status"""

  /** UNION / INTERSECT / EXCEPT with set semantics: order keys that have
    * lineitems vs. orders in a status slice. All three set operations come
    * out of ONE pass: tag each side, aggregate membership flags per key
    * (map-side combine), then count flag combinations — one shuffle total
    * instead of three separate distinct/intersect/except jobs each
    * rescanning lineitem. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val liKeys = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), lit(1).as("in_li"), lit(0).as("in_ord"))
    val orderKeys = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("k"), lit(0).as("in_li"), lit(1).as("in_ord"))
    liKeys.unionAll(orderKeys)
      .groupBy("k")
      .agg(max("in_li").as("in_li"), max("in_ord").as("in_ord"))
      .agg(count(lit(1)).as("n_union"),
        count(when(col("in_li") === 1 && col("in_ord") === 1, 1))
          .as("n_intersect"),
        count(when(col("in_li") === 0 && col("in_ord") === 1, 1))
          .as("n_except"))
  }

  val setOpsSql: String = """
    SELECT
      (SELECT COUNT(*) FROM (
        SELECT l_orderkey AS k FROM lineitem
        UNION
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')) AS n_union,
      (SELECT COUNT(*) FROM (
        SELECT l_orderkey AS k FROM lineitem
        INTERSECT
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')) AS n_intersect,
      (SELECT COUNT(*) FROM (
        SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT l_orderkey FROM lineitem)) AS n_except"""

  /** EXISTS / NOT EXISTS as left-semi + left-anti joins (§2.3's
    * remaining join family): customers with a finished order but no
    * half-million-dollar one. Both subquery filters push into the
    * orders scan BEFORE the join; AQE broadcasts the filtered sides at
    * small SF and falls back to shuffles at 100× — same no-hint policy
    * as q3/q5/q18. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    cust
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(orders.filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val semiAntiSql: String = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_totalprice > 450000)
    ORDER BY c_custkey"""
}
