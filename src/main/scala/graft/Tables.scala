package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table loader (TESTDATA.md: one parquet per table). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize `events.ts` to session-zoned TimestampType whatever the
    * generator wrote. Early test-data drops used parquet TIMESTAMP(NANOS)
    * — unreadable by the vectorized reader, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the nano count
    * surfaces as a long (integer division keeps full precision; the nano
    * count exceeds 2^53). Round-7 data switched to TIMESTAMP(MICROS),
    * which Spark reads as TIMESTAMP_NTZ — cast to TimestampType (session
    * zone is UTC everywhere here, so the wall-clock reading is the same
    * instant DuckDB's naive read gives the oracle). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }
    else df
  }
}
