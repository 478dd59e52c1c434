package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe for the op_dedup_incremental_{cow,mor} pair state:
  * prints base bytes, layer engagement and per-sync timings. */
object ProbeIncMor {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("probe-incmor").getOrCreate()
    try {
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      Seq("cow" -> 1, "mor" -> 2).foreach { case (name, _) =>
        val df = time(s"$name sync1")(
          if (name == "cow")
            graft.queries.SimQueries.opDedupIncrementalCow(spark, dir)
          else graft.queries.SimQueries.opDedupIncrementalMor(spark, dir))
        println(s"$name result: ${df.collect().mkString}")
      }
      // second sync each (steady state)
      Seq("cow", "mor").foreach { name =>
        val df = time(s"$name sync2")(
          if (name == "cow")
            graft.queries.SimQueries.opDedupIncrementalCow(spark, dir)
          else graft.queries.SimQueries.opDedupIncrementalMor(spark, dir))
        println(s"$name result: ${df.collect().mkString}")
      }
    } finally spark.stop()
  }
}
