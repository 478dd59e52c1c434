package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Batch analytics queries over the snapshot path. These exercise the
  * capabilities SURVEY §2.3-§2.5 marks as "Spark built-ins" (joins, aggs,
  * windows) — declared as plan-level DataFrame code so Catalyst does
  * pushdown/pruning/broadcast, which is the 100 TB story.
  *
  * Oracle-parity note: double aggregation order is nondeterministic under
  * shuffle, so every SUM over a float column first casts to an exact
  * DECIMAL (values in the testdata have <= 2 fraction digits), aggregates
  * exactly, and casts the final result to double — bit-identical to DuckDB
  * evaluating the same SQL.
  */
object CoreQueries {
  private def dec92(c: String) = col(c).cast(DecimalType(9, 2))
  private def dec32(c: String) = col(c).cast(DecimalType(3, 2))
  private val one = lit(1).cast(DecimalType(3, 2))

  /** TPC-H Q1 shape: scan + filter + hash aggregate. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    // predicate on the raw timestamp column (not a cast) so it pushes to
    // the parquet scan; ts < next-midnight ≡ date(ts) <= 1998-09-02
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-03 00:00:00"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec92("l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(dec92("l_extendedprice")).cast(DoubleType).as("sum_base_price"),
        sum(dec92("l_extendedprice") * (one - dec32("l_discount")))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec92("l_extendedprice") * (one - dec32("l_discount")) *
            (one + dec32("l_tax"))).cast(DoubleType).as("sum_charge"),
        (sum(dec92("l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec92("l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec32("l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  /** TPC-H Q3 shape: 3-way join with a broadcast-able dimension.
    * `customer` is proportionally small but grows linearly with SF, so no
    * forced broadcast hint: AQE picks BroadcastHashJoin while the build
    * side fits (PlanSpec asserts it does at test SF) and degrades to a
    * shuffled join past the broadcast limit instead of failing — the same
    * policy GraftTable.merge uses for its anti-join. */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-02 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast(DateType).as("orderdate"),
        col("o_orderpriority"))
      .agg(sum(dec92("l_extendedprice") * (one - dec32("l_discount")))
        .cast(DoubleType).as("revenue"))
      .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String = """
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      AND CAST(l_shipdate AS DATE) > DATE '1996-01-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  /** Snapshot scan with projection + filter pushdown (S1/P1/P2): the
    * publication column list becomes `.select`, the publication row filter
    * becomes `.filter`, and Catalyst pushes both into the parquet scan
    * (verify with .explain: PushedFilters + ReadSchema). */
  def snapshotScan(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .filter(col("l_quantity") < 10 && col("l_returnflag") =!= "N")
      .orderBy("l_orderkey", "l_linenumber")

  val snapshotScanSql: String = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity < 10 AND l_returnflag <> 'N'
    ORDER BY l_orderkey, l_linenumber"""

  /** Event-time windowed aggregation (ST5 — absent in the reference, noted
    * as "available via window()"; here as the batch-equivalent of the
    * streaming tumbling window — the same expression runs under
    * readStream + withWatermark, see StreamingSpec). */
  def windowHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec92("value")).cast(DoubleType).as("total"))
      .orderBy("hour_ms", "event_type")

  val windowHourlySql: String = """
    SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_ms, event_type"""
}
