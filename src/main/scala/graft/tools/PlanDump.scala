package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` for named SparkEntry queries
  * (gate + bench-only) to files — the plan evidence the optimization
  * rounds commit under plans/rNN/. Usage:
  *   SPARK_GRAFT_ONLY=q1,q2 SPARK_GRAFT_PLAN_DIR=plans/r16 \
  *   SPARK_GRAFT_PLAN_SUFFIX=before sbt "runMain graft.tools.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/tmp")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "plan")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // extra session confs, e.g. to force a scale-adaptive lane:
    // SPARK_GRAFT_PLAN_CONF=spark.graft.bm25.probeScaleThresholdBytes=0
    sys.env.getOrElse("SPARK_GRAFT_PLAN_CONF", "").split(",")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = (graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly)
      .filter { case (n, _) => only.isEmpty || only(n) }
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        java.nio.file.Files.write(p,
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"wrote $p")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
