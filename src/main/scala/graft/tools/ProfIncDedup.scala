package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for the incremental-dedup sync phases (not part of
  * the library surface; used to attribute op_dedup_incremental time). */
object ProfIncDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, IncrementalDedup}
    val cfg = IncrementalDedup.Config()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("prof-incdedup").toString
    val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
    val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    timed("bootstrap") {
      IncrementalDedup.applyDelta(spark, bands, pairs, docs,
        docs.withColumn("_change_type", lit("insert")),
        "doc_id", "text", f"${1L}%016x/0", cfg)
    }
    // one steady-state delta, phase-by-phase (mirrors sync())
    val updCond = col("doc_id") % 89 === 0
    val appended = concat(col("text"), lit(" qq zz extra"))
    val changes = docs.filter(updCond)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(docs.filter(updCond).withColumn("text", appended)
        .withColumn("_change_type", lit("update_postimage")))
    val corpus = docs.withColumn("text",
      when(updCond, appended).otherwise(col("text")))
    val ch = changes.select(col("doc_id").as("id"),
      col("text").as("payload"), col("_change_type"))
    val after = ch.filter(col("_change_type")
      .isin("insert", "update_postimage")).select("id", "payload")
    val before = ch.filter(col("_change_type")
      .isin("delete", "update_preimage")).select("id", "payload")
    val newBands = timed("newBands build+cache") {
      val b = Dedup.bandRows(after, "payload", "id",
        cfg.n, cfg.numHashes, cfg.bands).cache()
      b.count(); b
    }
    val oldBands = Dedup.bandRows(before, "payload", "id",
      cfg.n, cfg.numHashes, cfg.bands)
    val key = Seq("band", "bh", "id")
    val ins = newBands.join(oldBands, key, "left_anti")
      .withColumn("_op", lit("I"))
    val del = oldBands.join(newBands, key, "left_anti")
      .withColumn("_op", lit("D"))
    println("PROF insCount=" + ins.count() + " delCount=" + del.count())
    timed("bands.merge") {
      bands.merge(ins.unionByName(del).withColumn("_seq", lit("0000000000000002/0")))
    }
    val probe = newBands.select(col("band"), col("bh"), col("id").as("_pid"))
    val hits = timed("probe+hits") {
      val index = bands.readForProbe(spark, probe)
        .select("band", "bh", "id")
        .unionByName(newBands.select("band", "bh", "id"))
      val h = index.join(probe, Seq("band", "bh"))
        .filter(col("id") =!= col("_pid"))
        .select(least(col("id"), col("_pid")).as("id_a"),
          greatest(col("id"), col("_pid")).as("id_b"))
        .distinct().localCheckpoint()
      println("hits=" + h.count()); h
    }
    val verified = timed("verify") {
      val candIds = hits.select(col("id_a").as("id"))
        .union(hits.select(col("id_b"))).distinct()
      val dd = corpus.select(col("doc_id").as("id"), col("text").as("_t"))
        .join(candIds, "id")
        .select(col("id"), Dedup.shingleHashes(col("_t"), cfg.n).as("sh"))
        .localCheckpoint(eager = false)
      val v = hits
        .join(dd.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(dd.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
        .filter(col("jaccard") >= cfg.threshold)
        .select("id_a", "id_b", "jaccard").localCheckpoint()
      println("verified=" + v.count()); v
    }
    timed("stale+pairs.merge") {
      val changed = ch.select(col("id")).distinct()
      val stale = pairs.readForProbe(spark, changed.select(col("id").as("id_a")))
        .join(changed, col("id_a") === col("id"), "left_semi")
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
      val delPairs = stale.join(verified, Seq("id_a", "id_b"), "left_anti")
        .withColumn("jaccard", lit(null).cast("double"))
      def mirror(df: org.apache.spark.sql.DataFrame) = {
        df.select(col("id_a"), col("id_b"), col("jaccard"))
          .union(df.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
            col("jaccard")))
      }
      val pairBatch = mirror(verified).withColumn("_op", lit("I"))
        .unionByName(mirror(delPairs).withColumn("_op", lit("D")))
        .withColumn("_seq", lit("0000000000000002/0"))
      pairs.merge(pairBatch)
    }
    newBands.unpersist()
    spark.stop()
  }
}
