package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run a subset of SparkEntry queries (comma-separated names in
  * SPARK_GRAFT_ONLY) with a job listener that prints per-Spark-job wall
  * time and call site — pins down whether a slow query spends its time in
  * scheduling (many small jobs), shuffle, or one hot stage. Not part of
  * the driver contract (Bench stays the reporting surface).
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // callSite.short is absent on some submission paths — the last
        // stage's name carries the action call site instead
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val nanos = System.nanoTime() - t0
          val ms = nanos / 1e6
          jobCount.incrementAndGet()
          jobNanos.addAndGet(nanos)
          if (ms >= 20) println(f"    job ${je.jobId}%4d ${ms}%8.0f ms  $site")
        }
      }
    })

    val selected = (SparkEntry.queries ++ SparkEntry.benchOnly)
      .filter { case (n, _) => only.isEmpty || only(n) }
    // one warmup pass at the smallest SF so JIT/codegen noise drops out
    selected.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    println("=== profiled runs ===")
    selected.foreach { case (name, fn) =>
      println(s"--- $name")
      jobCount.set(0); jobNanos.set(0L)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      // jobTime sums per-job wall durations, so concurrent jobs overlap
      // and the sum can exceed wall; offJob clamps at 0 for that case
      println(f"  total $wall%.2f s  ($n rows)  jobs=${jobCount.get}  " +
        f"jobTimeSum=${jobNanos.get / 1e9}%.2f s  " +
        f"offJob=${math.max(0.0, wall - jobNanos.get / 1e9)}%.2f s")
    }
    spark.stop()
  }
}
