package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** A minimal keyed copy-on-write table with MERGE semantics — the storage
  * half of the reference's "current state" destinations (BigQuery CDC
  * upsert/delete, DuckLake SQL mutations; reference
  * crates/etl-destinations/src/bigquery/core.rs:956-1101 and
  * ducklake/core.rs). No Delta/Iceberg is available in this environment, so
  * the table format itself is part of the engine:
  *
  *   root/
  *     _meta.json                  — key columns, bucket count, seq high-water
  *     data/_bucket=&lt;i&gt;/part-....parquet  — hash-bucketed by key
  *
  * Scale design: a merge touches ONLY the buckets that contain batch keys —
  * at 100 TB with (say) 8192 buckets, a CDC batch touching 0.1% of keys
  * rewrites ~a handful of buckets, pruned at scan time via the `_bucket`
  * partition column. The join per bucket is current ⨝ batch on the key,
  * with the (small) deduped batch broadcast.
  *
  * Idempotent replay (reference DuckLake `retain_mutations_after_sequence_key`,
  * crates/etl-destinations/src/ducklake/replay_epoch.rs): `_meta.json` keeps
  * a sequence high-water mark; merges filter their batch to seq > highWater
  * and advance it atomically with the data commit (write-temp-then-rename).
  */
final class GraftTable(val root: String, val keyCols: Seq[String],
    val nBuckets: Int = 32) {

  private def dataDir = s"$root/data"
  private def metaPath = Paths.get(root, "_meta.json")

  def exists: Boolean = Files.exists(metaPath)

  // ------------------------------------------------------------------ meta
  final case class Meta(highWater: String)

  def readMeta(): Meta = {
    if (!exists) return Meta("")
    val s = new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8)
    val hw = "\"highWater\"\\s*:\\s*\"([^\"]*)\"".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    Meta(hw)
  }

  private def writeMeta(m: Meta): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_meta.json.tmp")
    Files.write(tmp,
      s"""{"keyCols":${keyCols.mkString("[\"", "\",\"", "\"]")},"nBuckets":$nBuckets,"highWater":"${m.highWater}"}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def bucketExpr = pmod(hash(keyCols.map(col): _*), lit(nBuckets))

  /** Files.list/walk return streams holding an open fd — close them
    * (recovery runs on EVERY data access; leaking here exhausts fds in a
    * long-running stream). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
    } finally st.close()
  }
  private def walkDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val st = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.toVector
    } finally st.close()
  }

  /** Crash recovery for interrupted bucket swaps (merge/compact move the
    * live dir to .old-<b> before installing the replacement): a .old
    * whose live bucket is missing holds the only copy — restore it.
    * Called before EVERY data access, not just maintenance, so a merge
    * racing a crashed compact cannot rebuild the bucket from nothing. */
  private def recoverOrphanedBuckets(): Unit = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return
    listDir(rootPath)
      .filter(_.getFileName.toString.startsWith(".old-"))
      .foreach { old =>
        val b = old.getFileName.toString.stripPrefix(".old-")
        val live = Paths.get(dataDir, s"_bucket=$b")
        if (!Files.exists(live)) Files.move(old, live)
        else deleteRecursively(old)
      }
  }

  // ------------------------------------------------------------------ read
  def read(spark: SparkSession): DataFrame = {
    recoverOrphanedBuckets()
    if (!exists || !Files.exists(Paths.get(dataDir))) spark.emptyDataFrame
    else spark.read.option("mergeSchema", "true").parquet(dataDir)
      .drop("_bucket")
  }

  private def readBuckets(spark: SparkSession, buckets: Seq[Int]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dataDir)
      .filter(col("_bucket").isin(buckets.map(Integer.valueOf): _*))

  /** Point lookup: rows for one key, scanning ONLY the key's bucket
    * (1/nBuckets of the table via partition pruning — the read-side
    * payoff of the bucket layout; at 8192 buckets a key fetch touches
    * one directory). `keyValues` aligns with `keyCols`. */
  def lookup(spark: SparkSession, keyValues: Seq[Any]): DataFrame = {
    require(keyValues.length == keyCols.length,
      s"expected ${keyCols.length} key values, got ${keyValues.length}")
    recoverOrphanedBuckets()
    if (!exists || !Files.exists(Paths.get(dataDir)))
      return spark.emptyDataFrame
    // same hash the writer used → same bucket id; lit() must be CAST to
    // the STORED column type (hash(42L: long) != hash(42: int))
    val base = spark.read.option("mergeSchema", "true").parquet(dataDir)
    val types = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val typedLits = keyCols.zip(keyValues).map { case (c, v) =>
      lit(v).cast(types(c)) }
    val bucket = spark.range(1)
      .select(pmod(hash(typedLits: _*), lit(nBuckets)).cast("int"))
      .head().getInt(0)
    keyCols.zip(typedLits).foldLeft(base.filter(col("_bucket") === bucket)) {
        case (df, (c, v)) => df.filter(col(c) === v)
      }
      .drop("_bucket")
  }

  // ----------------------------------------------------------------- write
  /** Full (re)load — snapshot backfill path (drop_table_for_copy + copy,
    * reference table_sync). */
  def overwrite(df: DataFrame): Unit = {
    // repartition on _bucket → one task (one file) per bucket dir instead
    // of nInputPartitions × nBuckets small files per write
    df.withColumn("_bucket", bucketExpr)
      .repartition(nBuckets, col("_bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(dataDir)
    writeMeta(Meta(""))
  }

  /** MERGE a deduped CDC batch. `batch` must contain the table's payload
    * columns plus `_op` (I/U/D) and `_seq` (packed sortable sequence string,
    * SequenceKey.packedHex) and at most one row per key (run
    * ApplyOps.lastWriterWins first). Partition-pruned copy-on-write:
    * only buckets containing batch keys are rewritten.
    */
  def merge(batch: DataFrame): Unit = merge(batch, Seq.empty)

  /** Like [[merge]], with TOAST-partial handling (ST6, reference
    * table_row.rs:68-143 + SURVEY §7.5.4): a NULL in a `coalesceCols`
    * column of an UPDATE means "unchanged" — the merged row keeps the
    * current stored value (`coalesce(new, old)`), the column-pruned
    * `UPDATE SET` the DuckLake destination performs. Costs one extra
    * left join of the batch against the affected buckets. */
  def merge(batch: DataFrame, coalesceCols: Seq[String]): Unit =
    merge(batch, coalesceCols, skipReplayFilter = false)

  /** `skipReplayFilter = true` is for callers that already applied the
    * high-water filter themselves (e.g. a sink splitting one deduped
    * batch into per-missing-mask groups: the groups' sequence ranges
    * interleave, so filtering group N against group N-1's advanced mark
    * would wrongly drop disjoint keys). */
  def merge(batch: DataFrame, coalesceCols: Seq[String],
      skipReplayFilter: Boolean): Unit =
    merge(batch, coalesceCols, skipReplayFilter, advanceHw = true)

  /** `advanceHw = false` defers the high-water advance to the caller
    * (see [[advanceHighWater]]): a sink applying one batch as several
    * merge groups must move the mark only after ALL groups are durable,
    * or a crash between groups + checkpoint replay would filter the
    * unapplied groups out forever. */
  def merge(batch: DataFrame, coalesceCols: Seq[String],
      skipReplayFilter: Boolean, advanceHw: Boolean): Unit = {
    val spark = batch.sparkSession
    recoverOrphanedBuckets()
    val meta = readMeta()
    // Idempotent-replay guard: drop events at or below the high-water mark.
    val fresh0 = if (skipReplayFilter || meta.highWater.isEmpty) batch
                 else batch.filter(col("_seq") > lit(meta.highWater))
    val fresh = fresh0.withColumn("_bucket", bucketExpr).cache()
    try {
      // one job computes emptiness + high-water + affected buckets
      val stats = fresh.agg(max(col("_seq")).as("hw"),
        collect_set(col("_bucket")).as("buckets")).collect()(0)
      if (stats.isNullAt(0)) return // empty batch (full replay)
      val newHigh = stats.getString(0)
      val buckets = stats.getSeq[Int](1)

      if (!exists || !Files.exists(Paths.get(dataDir))) {
        fresh.filter(col("_op") =!= "D").drop("_op", "_seq")
          .repartition(nBuckets, col("_bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("_bucket")
          .parquet(dataDir)
        if (advanceHw) writeMeta(Meta(newHigh)) else writeMeta(meta)
        return
      }

      val current = readBuckets(spark, buckets)
      // survivors: current rows whose key is NOT in the batch
      val keys = fresh.select(keyCols.map(col): _*)
      val survivors = current.join(broadcast(keys), keyCols, "left_anti")
      val upserts0 = fresh.filter(col("_op") =!= "D").drop("_seq")
      val upserts =
        if (coalesceCols.isEmpty) upserts0.drop("_op")
        else {
          // TOAST coalesce: null update columns inherit the stored value
          val cur = current.select(
            (keyCols.map(col) ++ coalesceCols.map(c => col(c).as(s"_cur_$c")))
              .toIndexedSeq: _*)
          val joined = upserts0.join(cur, keyCols, "left")
          coalesceCols.foldLeft(joined) { (acc, c) =>
            acc.withColumn(c, when(col("_op") === "U",
              coalesce(col(c), col(s"_cur_$c"))).otherwise(col(c)))
          }.drop(coalesceCols.map(c => s"_cur_$c"): _*).drop("_op")
        }
      // allowMissingColumns = online schema evolution (the ALTER TABLE
      // analog, reference SchemaDiff → destination ALTER): an added column
      // is null for pre-DDL rows, a dropped column stays null for new rows
      val merged = survivors.unionByName(upserts, allowMissingColumns = true)

      // copy-on-write: stage affected buckets, then swap directories
      val stage = s"$root/.stage-${java.util.UUID.randomUUID()}"
      merged.repartition(math.min(nBuckets, buckets.size), col("_bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("_bucket")
        .parquet(stage)
      // swap order: live aside → replacement in → old deleted LAST, so
      // no window leaves a bucket's only copy in a vacuum-eligible dir;
      // crashes recover via recoverOrphanedBuckets + hw-gated replay
      buckets.foreach { b =>
        val dst = Paths.get(dataDir, s"_bucket=$b")
        val src = Paths.get(stage, s"_bucket=$b")
        val old = Paths.get(root, s".old-$b")
        if (Files.exists(dst))
          Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
        if (Files.exists(src))
          Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
      }
      deleteRecursively(Paths.get(stage))
      if (advanceHw) {
        val hw = if (meta.highWater.isEmpty || newHigh > meta.highWater) newHigh
                 else meta.highWater
        writeMeta(Meta(hw))
      }
    } finally fresh.unpersist()
  }

  /** Monotonically advance the replay high-water mark (used with
    * `merge(..., advanceHw = false)` once every group of a batch is
    * durable). */
  def advanceHighWater(seq: String): Unit = {
    val meta = readMeta()
    if (meta.highWater.isEmpty || seq > meta.highWater)
      writeMeta(Meta(seq))
  }

  /** Maintenance: compact buckets whose file count exceeds `maxFiles`
    * into a single file each, and vacuum orphaned stage directories —
    * the analog of the reference's DuckLake snapshot maintenance
    * (expire/compact, crates/etl-destinations/src/ducklake/
    * external_maintenance.rs). Runs as a periodic batch job at scale;
    * returns the bucket ids compacted. */
  def compact(spark: SparkSession, maxFiles: Int = 4): Seq[Int] = {
    recoverOrphanedBuckets()
    val rootPath = Paths.get(root)
    if (Files.exists(rootPath)) {
      // vacuum crashed stage dirs (never the sole copy: a live bucket is
      // sidelined to .old-<b> before its replacement is installed, and
      // recoverOrphanedBuckets has just restored any orphans)
      listDir(rootPath)
        .filter(_.getFileName.toString.startsWith(".stage-"))
        .foreach(deleteRecursively)
    }
    if (!Files.exists(Paths.get(dataDir))) return Seq.empty
    val crowded = listDir(Paths.get(dataDir))
      .filter(_.getFileName.toString.startsWith("_bucket="))
      .filter { d =>
        listDir(d).count(_.getFileName.toString.endsWith(".parquet")) > maxFiles
      }
      .map(_.getFileName.toString.stripPrefix("_bucket=").toInt)
      .sorted
    crowded.foreach { b =>
      val dir = Paths.get(dataDir, s"_bucket=$b")
      val df = spark.read.option("mergeSchema", "true").parquet(dir.toString)
      val stage = Paths.get(root, s".stage-compact-$b")
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage.toString)
      // strip non-data files from the stage, then SWAP: old dir aside,
      // stage in, old dir deleted last — no window where the data exists
      // only in a vacuum-eligible location
      listDir(stage)
        .filterNot(_.getFileName.toString.endsWith(".parquet"))
        .foreach(Files.deleteIfExists(_))
      val old = Paths.get(root, s".old-$b")
      Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(stage, dir, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
    }
    crowded
  }

  /** Truncate: drop all data, keep identity — the reference's cheap
    * truncate is a versioned-table swap (bigquery/core.rs:1110-1160);
    * with a directory-backed table, clearing data/ is the same O(1) shape. */
  def truncate(): Unit = {
    deleteRecursively(Paths.get(dataDir))
    writeMeta(readMeta()) // keep high-water: truncate does not rewind replay
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) walkDir(p).reverse.foreach(Files.deleteIfExists(_))
}
