package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: phase timing for one IncrementalDedup delta
  * sync (bootstrap excluded), to attribute the op_dedup_incremental
  * bench cost. Not part of the driver contract. */
object IncDedupProbe {
  @volatile var logJobs = false
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.Config()
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-incdedup-probe").toString
    val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
    val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          if (IncDedupProbe.logJobs)
            println(f"ACTION $funcName%-16s ${durationNs / 1e9}%6.2f s  " +
              qe.analyzed.getClass.getSimpleName + "  " +
              qe.analyzed.toString.linesIterator.take(1).mkString.take(110))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    def t[A](label: String)(f: => A): A = {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
      r
    }
    t("bootstrap") {
      IncrementalDedup.applyDelta(spark, bands, pairs, docs,
        docs.withColumn("_change_type", lit("insert")),
        "doc_id", "text", f"${1L}%016x/0", cfg)
    }
    var seq = 1L
    (1 to 4).foreach { i =>
      seq += 1
      val toAppended = seq % 2 == 0
      val updCond = col("doc_id") % 89 === 0
      val appended = concat(col("text"), lit(" qq zz extra"))
      val (preT, postT) =
        if (toAppended) (col("text"), appended) else (appended, col("text"))
      val changes = docs.filter(updCond)
        .withColumn("text", preT)
        .withColumn("_change_type", lit("update_preimage"))
        .unionByName(docs.filter(updCond)
          .withColumn("text", postT)
          .withColumn("_change_type", lit("update_postimage")))
      val corpus = docs
        .withColumn("text", when(updCond, postT).otherwise(col("text")))
      if (i == 3) logJobs = true
      t(s"delta sync $i") {
        IncrementalDedup.applyDelta(spark, bands, pairs, corpus,
          changes, "doc_id", "text", f"$seq%016x/0", cfg)
      }
      logJobs = false
      t(s"readPairs count $i") {
        IncrementalDedup.readPairs(spark, pairs)
          .agg(count(lit(1))).head()
      }
    }
    spark.stop()
  }
}
