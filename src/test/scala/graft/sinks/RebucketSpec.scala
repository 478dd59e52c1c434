package graft.sinks

import graft.SparkSpec
import graft.sources.GraftFollower
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucket-count evolution ([[GraftTable.rebucket]]): the count is
  * versioned in the manifest, so writes/probes after a rebucket hash
  * with the new layout while retained pre-rebucket snapshots keep
  * theirs; the commit is `sameData` maintenance for the CDF; followers
  * and fresh instances pick the evolved count up from the manifest,
  * never the stale creation-time constructor value. */
class RebucketSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def batch(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "v", "_op", "lsn")
      .withColumn("_seq", format_string("%016x/%016x", col("lsn"), lit(0L)))
      .drop("lsn")

  private def state(t: GraftTable): Set[(Long, String)] =
    t.read(spark).select("id", "v").as[(Long, String)].collect().toSet

  private def bucketIds(t: GraftTable): Set[Int] =
    t.currentFilesByBucket.filter(_._2.nonEmpty).keySet

  test("up-rebucket: state, high-water and time travel survive; " +
      "writes and point lookups use the new layout") {
    val t = new GraftTable(tmp("rb-up"), Seq("id"), nBuckets = 4,
      retainVersions = 10)
    t.overwrite((1L to 200L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.merge(batch((1L, "v1b", "U", 10L), (201L, "new", "I", 10L)))
    val before = state(t)
    val preVersion = t.currentVersion.get

    t.rebucket(spark, 16)
    assert(t.currentNBuckets == 16)
    assert(state(t) == before, "rebucket must be data-identical")
    assert(t.readMeta().highWater.nonEmpty &&
      t.readMeta().highWater == f"${10L}%016x/${0L}%016x",
      "replay mark must survive a rebucket")
    // 200 keys over 16 buckets: the new layout is actually in use
    assert(bucketIds(t).exists(_ >= 4),
      s"expected buckets beyond the old count, got ${bucketIds(t)}")
    // time travel to the pre-rebucket snapshot still reads the old layout
    assert(t.readVersion(spark, preVersion).select("id", "v")
      .as[(Long, String)].collect().toSet == before)

    // a point lookup hashes with the NEW count and scans ONE bucket
    val hit = t.lookup(spark, Seq(7L))
    assert(hit.as[(Long, String)].collect().toSeq == Seq((7L, "v7")))
    val dirs = hit.inputFiles.map(f =>
      f.replaceAll(".*/_bucket=", "").replaceAll("/.*", "")).toSet
    assert(dirs.size == 1, s"lookup read ${dirs.size} buckets: $dirs")

    // merges keep working against the evolved layout; replay guard intact
    t.merge(batch((7L, "v7b", "U", 20L), (150L, "", "D", 20L)))
    assert(state(t) == before - ((7L, "v7")) - ((150L, "v150")) + ((7L, "v7b")))
    t.merge(batch((7L, "stale", "U", 5L))) // below high-water: no-op
    assert(t.lookup(spark, Seq(7L)).as[(Long, String)].collect().toSeq ==
      Seq((7L, "v7b")))

    // a probe set prunes to the probed keys' buckets under the new count
    val probe = Seq(7L, 42L).toDF("id")
    val got = t.readForProbe(spark, probe)
      .join(probe, "id").select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((7L, "v7b"), (42L, "v42")))
  }

  test("down-rebucket collapses the layout; a fresh instance built with " +
      "the stale creation-time count still probes correctly") {
    val root = tmp("rb-down")
    val t = new GraftTable(root, Seq("id"), nBuckets = 16)
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    val before = state(t)
    t.rebucket(spark, 2)
    assert(t.currentNBuckets == 2)
    assert(bucketIds(t).forall(_ < 2), s"stray buckets: ${bucketIds(t)}")
    assert(state(t) == before)

    // a NEW instance (constructor says 16) must hash with the manifest's 2
    val t2 = new GraftTable(root, Seq("id"), nBuckets = 16)
    assert(t2.currentNBuckets == 2)
    assert(t2.lookup(spark, Seq(55L)).as[(Long, String)].collect().toSeq ==
      Seq((55L, "v55")))
    t2.merge(batch((55L, "v55b", "U", 30L)))
    assert(t2.lookup(spark, Seq(55L)).as[(Long, String)].collect().toSeq ==
      Seq((55L, "v55b")))
    assert(bucketIds(t2).forall(_ < 2))
  }

  test("row CDF: a rebucket-only window feeds nothing; a mixed window " +
      "feeds exactly the data commits' rows") {
    val t = new GraftTable(tmp("rb-cdf"), Seq("id"), nBuckets = 4,
      retainVersions = 20)
    t.overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    val v0 = t.currentVersion.get
    t.rebucket(spark, 8)
    val v1 = t.currentVersion.get
    val only = t.rowChangesBetween(spark, v0, v1)
    assert(!only.fullRefresh && only.rows.isEmpty,
      "rebucket-only window must be an empty feed")

    t.merge(batch((3L, "v3b", "U", 40L), (51L, "new", "I", 40L)))
    val v2 = t.currentVersion.get
    val mixed = t.rowChangesBetween(spark, v0, v2).rows
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(mixed == Set(
      (3L, "v3", "update_preimage"), (3L, "v3b", "update_postimage"),
      (51L, "new", "insert")),
      s"mixed window fed $mixed")
  }

  test("merge-on-read table: rebucket collapses layers first and the " +
      "evolved table keeps absorbing layered merges") {
    val t = new GraftTable(tmp("rb-mor"), Seq("id"), nBuckets = 4,
      retainVersions = 10, mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 80L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.merge(batch((2L, "v2b", "U", 10L), (5L, "", "D", 10L)))
    assert(t.hasLayers)
    val before = state(t)
    t.rebucket(spark, 16)
    assert(!t.hasLayers && state(t) == before)
    t.merge(batch((9L, "v9b", "U", 20L)))
    assert(t.hasLayers, "post-rebucket merges take the layered path again")
    assert(t.lookup(spark, Seq(9L)).as[(Long, String)].collect().toSeq ==
      Seq((9L, "v9b")))
  }

  test("guards: open group refuses rebucket; same-count is a no-op; " +
      "empty table records the count for its first write") {
    val t = new GraftTable(tmp("rb-guard"), Seq("id"), nBuckets = 4)
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.beginGroup()
    intercept[IllegalArgumentException](t.rebucket(spark, 8))
    t.abortGroup()
    val v = t.currentVersion.get
    t.rebucket(spark, 4)
    assert(t.currentVersion.get == v, "same-count rebucket must not commit")

    val e = new GraftTable(tmp("rb-empty"), Seq("id"), nBuckets = 4)
    e.rebucket(spark, 32)
    assert(e.currentNBuckets == 32)
    e.overwrite((1L to 300L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(bucketIds(e).exists(_ >= 4),
      "first write after an empty-table rebucket must use the new count")
    assert(e.lookup(spark, Seq(123L)).as[(Long, String)].collect().toSeq ==
      Seq((123L, "v123")))
  }

  test("follower full-refresh spans the evolved layout (buckets beyond " +
      "the creation-time count are delivered and stale ones tombstoned)") {
    val dir = tmp("rb-follow")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 2,
      retainVersions = 10)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 2)
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-follow")
        .option("path", s"$dir/leader").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          GraftFollower.applyBatch(df, follower)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    leader.overwrite((1L to 60L).map(i => (i, s"v$i")).toDF("id", "v"))
    pass()
    assert(state(follower) == state(leader))

    // rebucket far beyond the creation-time count, mutate, and follow:
    // incremental batches replace every bucket (all file sets changed)
    leader.rebucket(spark, 12)
    leader.merge(batch((1L, "v1b", "U", 50L), (30L, "", "D", 50L)))
    pass()
    assert(state(follower) == state(leader))

    // fresh checkpoint = full-refresh planning path: occupied buckets
    // >= the creation-time count must still be emitted
    val f2 = new GraftTable(s"$dir/f2", Seq("id"), nBuckets = 2)
    val q2 = spark.readStream.format("graft-follow")
      .option("path", s"$dir/leader").load()
      .writeStream.option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        GraftFollower.applyBatch(df, f2)
      }
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(state(f2) == state(leader))
  }
}
