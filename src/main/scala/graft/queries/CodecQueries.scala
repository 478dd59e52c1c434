package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.core.PgText

/** S3 codec gate: render every value to Postgres text form with the
  * engine's renderers, parse it back with the engine's parsers, and emit
  * the result — the oracle is the identity projection, so any asymmetry in
  * the codec pair (graft.core.PgText) shows up as a hash mismatch over the
  * full table. This is the DataFrame-scale version of the reference's
  * value_roundtrip property suite (crates/etl/tests/value_roundtrip.rs),
  * with DuckDB as the oracle instead of Postgres.
  *
  * The codecs run here as UDFs for SQL-visibility; in the engine proper
  * they run as plain Scala inside source partition readers (S3's
  * deployment shape), so UDF overhead is not on the hot path.
  */
object CodecQueries {

  def codecRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val rtLong = udf((s: String) => s.toLong)
    val rtDouble = udf((s: String) => s.toDouble)
    val rtNumeric = udf((s: String) =>
      PgText.numericToDecimal38(PgText.PgNumeric.parse(s))
        .map(_.toPlainString).orNull)
    val rtBool = udf((b: Boolean) => PgText.parseBool(PgText.renderBool(b)))
    val rtDate = udf((d: java.sql.Date) =>
      java.sql.Date.valueOf(PgText.parseDate(
        PgText.renderDate(d.toLocalDate))))
    val rtText = udf((s: String) => {
      val row = PgText.parseCopyRow(PgText.renderCopyRow(Seq(Option(s))))
      row.head.orNull
    })
    val rtArray = udf((xs: Seq[String]) => {
      val parsed = PgText.parseArray(PgText.renderArray(xs.map(Option(_))))
      parsed.map(_.orNull)
    })

    val li = Tables.load(spark, dir, "lineitem")
    li.select(
        rtLong(col("l_orderkey").cast(StringType)).as("l_orderkey"),
        col("l_linenumber"),
        rtDouble(col("l_extendedprice").cast(StringType)).as("price"),
        rtNumeric(format_string("%.2f", col("l_quantity"))).cast(DoubleType).as("qty"),
        rtBool(col("l_returnflag") === "R").as("returned"),
        rtDate(col("l_shipdate").cast(DateType)).as("shipdate"),
        rtText(col("l_returnflag")).as("flag"),
        rtArray(array(col("l_returnflag"), col("l_linestatus"))).as("flags"))
      .withColumn("flags", concat_ws("|", col("flags")))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val codecRoundtripSql: String = """
    SELECT l_orderkey, l_linenumber,
      l_extendedprice AS price,
      CAST(CAST(l_quantity AS DECIMAL(9,2)) AS DOUBLE) AS qty,
      l_returnflag = 'R' AS returned,
      CAST(l_shipdate AS DATE) AS shipdate,
      l_returnflag AS flag,
      l_returnflag || '|' || l_linestatus AS flags
    FROM lineitem ORDER BY l_orderkey, l_linenumber"""
}
