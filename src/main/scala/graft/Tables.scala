package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table loader (TESTDATA.md: one parquet per table). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet TIMESTAMP(NANOS) (the `events.ts` column) is unreadable by
    * Spark's vectorized reader; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts
    * the nano count to a proper TimestampType column (micros, UTC).
    * Integer division keeps full precision (the nano count exceeds 2^53). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
