package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway attribution probe for the dedup_incremental_embed GATE:
  * times its three phases (bootstrap sync, mixed delta sync, exact
  * brute-force oracle comparison) separately, so the gate median's
  * composition is known rather than guessed. */
object ProfEmbedGate {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("prof-embed-gate").getOrCreate()
    try {
      import graft.operators.IncrementalDedup
      val cfg = IncrementalDedup.EmbedConfig()
      def time[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val emb = graft.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val root = java.nio.file.Files
        .createTempDirectory("graft-profembed").toString
      val bands = IncrementalDedup.bandTable(s"$root/bands", nBuckets = 8)
      val pairs = IncrementalDedup.pairTable(s"$root/pairs", nBuckets = 4)
      def seq(v: Long) = f"$v%016x/0"
      time("bootstrap sync") {
        IncrementalDedup.applyEmbedDelta(spark, bands, pairs, emb,
          emb.withColumn("_change_type", lit("insert")),
          "vec_id", "embedding", seq(1), cfg)
      }
      val delCond = col("vec_id") % 17 === 0
      val clones = emb.filter(col("vec_id") % 23 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val changes = clones.withColumn("_change_type", lit("insert"))
        .unionByName(emb.filter(delCond)
          .withColumn("_change_type", lit("delete")))
      val corpus2 = emb.filter(!delCond).unionByName(clones)
      time("mixed delta sync") {
        IncrementalDedup.applyEmbedDelta(spark, bands, pairs, corpus2,
          changes, "vec_id", "embedding", seq(2), cfg)
      }
      time("exact brute-force oracle comparison") {
        val a = corpus2.select(col("vec_id").as("id_a"),
          col("embedding").as("va"))
        val b = corpus2.select(col("vec_id").as("id_b"),
          col("embedding").as("vb"))
        val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
          .withColumn("sim", round(
            graft.operators.Similarity.cosine(col("va"), col("vb")), 6))
          .filter(col("sim") >= cfg.threshold)
          .select("id_a", "id_b").withColumn("_e", lit(1))
        val approx = IncrementalDedup.readPairs(spark, pairs)
          .select("id_a", "id_b").withColumn("_a", lit(1))
        println("rows: " +
          exact.join(approx, Seq("id_a", "id_b"), "full_outer").count())
      }
    } finally spark.stop()
  }
}
