package graft.sources

import graft.SparkSpec
import graft.sinks.GraftTable
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming consumption of graft tables (`graft-follow`): a follower
  * table maintained ONLY through checkpointed micro-batches must track
  * the leader across merges/deletes/truncates, survive kill/restart on
  * the same checkpoint, and full-refresh after the leader expires the
  * checkpointed version (slot-invalidation analog). */
class GraftFollowSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def contents(t: GraftTable): Set[(Long, String)] =
    t.read(spark).select("id", "v").as[(Long, String)].collect().toSet

  private def runOnePass(leaderRoot: String, follower: GraftTable,
      ckpt: String): Unit = {
    val q = spark.readStream.format("graft-follow")
      .option("path", leaderRoot).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        GraftFollower.applyBatch(df, follower)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("follower stream tracks leader; kill/restart resumes from version") {
    val dir = tmp("follow")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 8,
      retainVersions = 10)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 8)
    val ckpt = s"$dir/ckpt"

    leader.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // merge + delete, then a SECOND pass on the SAME checkpoint (restart):
    // only the diff is consumed
    leader.merge(Seq((2L, "b2", "U", "0002"), (3L, "", "D", "0003"))
      .toDF("id", "v", "_op", "_seq"))
    leader.deleteWhere(spark, col("id") === 1L)
    leader.append(Seq((9L, "z")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == Set((2L, "b2"), (9L, "z")))
    assert(contents(follower) == contents(leader))

    // truncate propagates as tombstones
    leader.truncate()
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower).isEmpty)
  }

  test("follower converges on a MERGE-ON-READ leader (layered commits, " +
      "collapse, maintenance)") {
    val dir = tmp("follow-mor")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 8,
      retainVersions = 10, mergeOnRead = true, morMinAffectedBytes = 0L)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 8)
    val ckpt = s"$dir/ckpt"
    leader.overwrite((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == contents(leader))
    // layered commits: upserts + deletes land as delta layers (base
    // files untouched) — the follower must fold them
    leader.merge(Seq((1L, "u1", "U", "0001"), (5L, "", "D", "0002"),
      (40L, "n40", "I", "0003")).toDF("id", "v", "_op", "_seq"))
    assert(leader.readManifest(leader.currentVersion.get).layers.nonEmpty,
      "precondition: the merge must have committed as a layer")
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == contents(leader))
    // a second layer stacks; delete-then-reinsert crosses layers
    leader.merge(Seq((5L, "back5", "I", "0004"), (2L, "", "D", "0005"))
      .toDF("id", "v", "_op", "_seq"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == contents(leader))
    assert(contents(follower).contains((5L, "back5")))
    // collapse + compact (maintenance) keep the follower identical
    leader.compact(spark, maxFiles = 1)
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == contents(leader))
  }

  test("fresh follower of an empty/truncated leader survives a tombstone-only batch") {
    val dir = tmp("follow-empty")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 4)
    // leader gets data then truncates BEFORE the follower's first batch:
    // the follower (no schema yet) sees only tombstones — must no-op,
    // not crash resolving bucket keys on an empty frame
    leader.overwrite(Seq((1L, "a")).toDF("id", "v"))
    leader.truncate()
    runOnePass(s"$dir/leader", follower, s"$dir/ckpt")
    assert(follower.currentSchema.isEmpty ||
      contents(follower).isEmpty)
    // and once the leader has data again the follower converges normally
    leader.overwrite(Seq((5L, "e")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, s"$dir/ckpt")
    assert(contents(follower) == Set((5L, "e")))
  }

  test("leader RENAME COLUMN propagates through the control row") {
    val dir = tmp("follow-rename")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 4)
    val ckpt = s"$dir/ckpt"

    leader.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(follower.currentSchema.get.fieldNames.toSeq == Seq("id", "v"))

    // METADATA-ONLY commit: rename with data, no file changes — the
    // control row alone must carry the new logical name
    leader.renameColumn("v", "val")
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(follower.currentSchema.get.fieldNames.toSeq == Seq("id", "val"))
    assert(follower.read(spark).select("id", "val").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))

    // post-rename data writes keep converging under the new name (the
    // leader's files mix physical 'v' and — for followers — logical
    // translation must hold on both old and new files)
    leader.merge(Seq((3L, "c", "I", "0001"), (1L, "a2", "U", "0002"))
      .toDF("id", "val", "_op", "_seq"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(follower.read(spark).select("id", "val").as[(Long, String)]
      .collect().toSet == Set((1L, "a2"), (2L, "b"), (3L, "c")))
    assert(follower.read(spark).select("id", "val").as[(Long, String)]
      .collect().toSet ==
      leader.read(spark).select("id", "val").as[(Long, String)]
        .collect().toSet)
  }

  test("maxVersionsPerTrigger caps the bucket-diff stream's batch span") {
    val dir = tmp("follow-cap")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 4)
    leader.overwrite(Seq((1L, "a")).toDF("id", "v"))
    (2 to 4).foreach(i =>
      leader.merge(Seq((i.toLong, s"v$i", "I", f"$i%016x/${0L}%016x"))
        .toDF("id", "v", "_op", "_seq")))
    var batches = 0
    val q = spark.readStream.format("graft-follow")
      .option("path", s"$dir/leader")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (df.count() > 0) batches += 1
        GraftFollower.applyBatch(df, follower)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // 4 commits, 1 version per trigger → 4 applied batches, converged
    assert(batches == 4, batches)
    assert(contents(follower) == contents(leader))
  }

  test("replayed batch with a vacuumed end offset degrades, not crashes") {
    val dir = tmp("follow-expend")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 2)
    leader.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val expired = leader.currentVersion.get
    (2 to 6).foreach(i =>
      leader.merge(Seq((i.toLong, s"v$i", "I", f"$i%016x/${0L}%016x"))
        .toDF("id", "v", "_op", "_seq")))
    assert(!leader.versions.contains(expired))
    // a crash after the offset WAL write replays planInputPartitions with
    // the ORIGINAL (start, end); both follow streams must resolve the
    // vacuumed end to a retained full refresh instead of crash-looping
    val parts = new GraftFollowStream(s"$dir/leader")
      .planInputPartitions(VersionOffset(-1L), VersionOffset(expired))
    assert(parts.nonEmpty) // full refresh at the oldest retained version
    val rowParts = new GraftRowFollowStream(s"$dir/leader")
      .planInputPartitions(VersionOffset(-1L), VersionOffset(expired))
    val transitions = rowParts.head
      .asInstanceOf[GraftRowFollowPartition].transitions
    assert(transitions.forall { case (_, t) => leader.versions.contains(t) },
      transitions)
  }

  test("follower mini-fuzz: random merges/renames/deletes/truncates converge") {
    val rnd = new scala.util.Random(11)
    val dir = tmp("follow-fuzz")
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 8)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 4)
    val ckpt = s"$dir/ckpt"
    var vCol = "v"
    var lsn = 0L
    (1 to 25).foreach { step =>
      rnd.nextInt(10) match {
        case i if i <= 4 => // merge
          lsn += 1
          val rows = (1 to rnd.nextInt(4) + 1).map { _ =>
            val id = rnd.nextInt(10).toLong
            (id, s"v$lsn-$id", if (rnd.nextInt(5) == 0) "D" else "U",
              f"$lsn%016x/${0L}%016x")
          }.groupBy(_._1).values.map(_.head).toSeq
          leader.merge(rows.toDF("id", vCol, "_op", "_seq"))
        case 5 | 6 => // rename the payload column back and forth
          if (leader.currentSchema.exists(_.fieldNames.contains(vCol))) {
            val to = if (vCol == "v") "val" else "v"
            leader.renameColumn(vCol, to)
            vCol = to
          }
        case 7 => // bucket-pruned SQL delete
          leader.deleteWhere(spark, col("id") < rnd.nextInt(6).toLong)
        case 8 => // truncate
          leader.truncate()
        case 9 => // overwrite (replay mark resets)
          lsn += 1
          leader.overwrite(
            (1 to rnd.nextInt(4) + 1).map(_ => rnd.nextInt(10).toLong)
              .distinct.map(id => (id, s"bf$lsn")).toDF("id", vCol))
      }
      // stream pass on a RANDOM cadence: batches span several commits,
      // sometimes past retention
      if (rnd.nextInt(3) == 0 || step == 25) {
        runOnePass(s"$dir/leader", follower, ckpt)
        val want =
          if (leader.read(spark).columns.isEmpty) Set.empty
          else leader.read(spark).select(col("id"), col(vCol))
            .as[(Long, String)].collect().toSet
        val got =
          if (follower.read(spark).columns.isEmpty) Set.empty
          else follower.read(spark).select(col("id"), col(vCol))
            .as[(Long, String)].collect().toSet
        assert(got == want, s"step $step: got=$got want=$want")
      }
    }
  }

  test("expired checkpoint version degrades to one full-refresh batch") {
    val dir = tmp("follow-exp")
    // retainVersions=2: history expires fast
    val leader = new GraftTable(s"$dir/leader", Seq("id"), nBuckets = 4,
      retainVersions = 2)
    val follower = new GraftTable(s"$dir/follower", Seq("id"), nBuckets = 4)
    val ckpt = s"$dir/ckpt"

    leader.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == Set((1L, "a"), (2L, "b")))

    // churn far past retention: the checkpointed version is vacuumed away;
    // id=2's bucket never changes again, so ONLY a full refresh can
    // surface the delete of id=1 happening in an expired diff
    leader.deleteWhere(spark, col("id") === 1L)
    leader.merge(Seq((4L, "d", "I", "0004")).toDF("id", "v", "_op", "_seq"))
    leader.merge(Seq((5L, "e", "I", "0005")).toDF("id", "v", "_op", "_seq"))
    leader.merge(Seq((6L, "f", "I", "0006")).toDF("id", "v", "_op", "_seq"))
    runOnePass(s"$dir/leader", follower, ckpt)
    assert(contents(follower) == contents(leader))
    assert(contents(follower).contains((2L, "b")) &&
      !contents(follower).exists(_._1 == 1L))
  }
}
