package graft.sources

import graft.SparkSpec
import graft.sinks.GraftTable
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Checkpointed streaming consumption of the ROW-LEVEL change feed
  * (`graft-row-follow`): per-commit attribution, kill/restart resume,
  * and full-refresh degradation after the checkpointed version expires
  * — plus a differential consumer maintaining a replica map purely from
  * the feed. */
class GraftRowFollowSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** (_commit_version, _change_type, id, v, _full_refresh) rows collected
    * across every micro-batch of one stream pass. */
  private def runOnePass(root: String, ckpt: String,
      sink: scala.collection.mutable.Buffer[(Long, String, Long, String, Boolean)])
      : Unit = {
    val q = spark.readStream.format("graft-row-follow")
      .option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val feed = GraftRowFeed.changes(df, root)
        if (feed.columns.nonEmpty) {
          sink ++= feed
            .select(col("_commit_version"), col("_change_type"), col("id"),
              col("v"), col("_full_refresh"))
            .as[(Long, String, Long, String, Boolean)].collect()
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("row feed streams per-commit changes; restart consumes only the diff") {
    val dir = tmp("rowfollow")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 8,
      retainVersions = 10)
    val ckpt = s"$dir/ckpt"
    val got = scala.collection.mutable.Buffer
      .empty[(Long, String, Long, String, Boolean)]

    leader.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    runOnePass(root, ckpt, got)
    // first batch from the initial offset is a full-refresh insert feed
    assert(got.toSet == Set(
      (0L, "insert", 1L, "a", true),
      (0L, "insert", 2L, "b", true),
      (0L, "insert", 3L, "c", true)))

    // two commits, one restart: each change row is attributed to ITS
    // commit (update images at v1, the append insert at v2)
    got.clear()
    leader.merge(Seq((2L, "b2", "U", "0002"), (3L, "", "D", "0003"))
      .toDF("id", "v", "_op", "_seq"))
    leader.append(Seq((9L, "z")).toDF("id", "v"))
    runOnePass(root, ckpt, got)
    assert(got.toSet == Set(
      (1L, "update_preimage", 2L, "b", false),
      (1L, "update_postimage", 2L, "b2", false),
      (1L, "delete", 3L, "c", false),
      (2L, "insert", 9L, "z", false)))

    // no new commits → a pass yields nothing
    got.clear()
    runOnePass(root, ckpt, got)
    assert(got.isEmpty)
  }

  test("differential consumer reconstructs state from the feed alone") {
    val dir = tmp("rowfollow-diff")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val got = scala.collection.mutable.Buffer
      .empty[(Long, String, Long, String, Boolean)]

    leader.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    runOnePass(root, s"$dir/ckpt", got)
    leader.merge(Seq((1L, "a2", "U", "01"), (5L, "e", "I", "02"))
      .toDF("id", "v", "_op", "_seq"))
    leader.deleteWhere(spark, col("id") === 2L)
    runOnePass(root, s"$dir/ckpt", got)

    // replay the tagged rows in commit order into a key→value map
    val replica = scala.collection.mutable.Map.empty[Long, String]
    got.sortBy(_._1).foreach {
      case (_, _, id, v, true)                   => replica(id) = v
      case (_, "insert", id, v, _)               => replica(id) = v
      case (_, "update_postimage", id, v, _)     => replica(id) = v
      case (_, "delete", id, _, _)               => replica.remove(id)
      case (_, "update_preimage", _, _, _)       => ()
      case other => fail(s"unexpected feed row $other")
    }
    val expect = leader.read(spark).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(replica.toMap == expect)
  }

  test("feed spanning a RENAME COLUMN aligns every commit onto the final name") {
    val dir = tmp("rowfollow-ren")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val got = scala.collection.mutable.Buffer
      .empty[(Long, String, Long, String)]
    val gotCols = scala.collection.mutable.Buffer.empty[Seq[String]]

    leader.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // one stream batch spans: update under 'v' → rename v→val → insert
    // under 'val'; the expanded feed must come out under ONE column
    // ('val'), pre-rename commits aligned through the physical identity
    leader.merge(Seq((1L, "a2", "U", "0000000000000010/0000000000000000"))
      .toDF("id", "v", "_op", "_seq"))
    leader.renameColumn("v", "val")
    leader.merge(Seq((5L, "e", "I", "0000000000000020/0000000000000000"))
      .toDF("id", "val", "_op", "_seq"))

    val q = spark.readStream.format("graft-row-follow")
      .option("path", root).load()
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val feed = GraftRowFeed.changes(df, root)
        if (feed.columns.nonEmpty) {
          gotCols += feed.columns.toSeq
          got ++= feed
            .select(col("_commit_version"), col("_change_type"), col("id"),
              col("val"))
            .as[(Long, String, Long, String)].collect()
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    // one logical payload column only — no split v/val pair
    assert(gotCols.forall(cs => cs.contains("val") && !cs.contains("v")),
      gotCols)
    assert(got.toSet == Set(
      (0L, "insert", 1L, "a"),
      (0L, "insert", 2L, "b"),
      (1L, "update_preimage", 1L, "a"),
      (1L, "update_postimage", 1L, "a2"),
      (3L, "insert", 5L, "e")), got)
  }

  test("maxVersionsPerTrigger drains a backlog in bounded per-trigger chunks") {
    val dir = tmp("rowfollow-cap")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 10)
    leader.overwrite(Seq((1L, "a")).toDF("id", "v"))
    (2 to 4).foreach(i =>
      leader.merge(Seq((i.toLong, s"v$i", "I", f"$i%016x/${0L}%016x"))
        .toDF("id", "v", "_op", "_seq")))
    // 4 commits pending; cap = 1 version per trigger → 4 micro-batches,
    // each spanning exactly one transition
    val perBatch = scala.collection.mutable.Buffer.empty[Seq[(Long, Long)]]
    val q = spark.readStream.format("graft-row-follow")
      .option("path", root).option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ts = df.select("from_version", "to_version")
          .as[(Long, Long)].collect().toSeq
        if (ts.nonEmpty) perBatch += ts
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(perBatch.size == 4 && perBatch.forall(_.size == 1), perBatch)
    assert(perBatch.map(_.head._2) == Seq(0L, 1L, 2L, 3L), perBatch)
  }

  test("applyBatch replicates row-level feeds into a keyed table") {
    val dir = tmp("rowfollow-apply")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 10)
    val replica = new GraftTable(s"$dir/replica", Seq("id"), nBuckets = 8)
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          GraftRowFeed.applyBatch(df, root, replica)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def same(): Unit = {
      val want = leader.read(spark).select("id", "v")
        .as[(Long, String)].collect().toSet
      val got =
        if (replica.read(spark).columns.isEmpty) Set.empty[(Long, String)]
        else replica.read(spark).select("id", "v")
          .as[(Long, String)].collect().toSet
      assert(got == want, s"got=$got want=$want")
    }

    leader.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    pass(); same()
    leader.merge(Seq((1L, "a2", "U", "0000000000000010/0000000000000000"),
        (3L, "", "D", "0000000000000011/0000000000000000"))
      .toDF("id", "v", "_op", "_seq"))
    leader.append(Seq((9L, "z")).toDF("id", "v"))
    pass(); same()
    // no new commits → replay-guarded no-op
    pass(); same()
    leader.truncate()
    pass(); same()
    leader.overwrite(Seq((5L, "e")).toDF("id", "v"))
    pass(); same()
    // leader RENAME mid-stream: the replica must mirror it (untouched
    // keys serve the new name too, not a null-widened extra column)
    leader.append(Seq((6L, "f")).toDF("id", "v"))
    leader.renameColumn("v", "val")
    leader.merge(Seq((7L, "g", "I", "00000000000000f0/0000000000000000"))
      .toDF("id", "val", "_op", "_seq"))
    pass()
    assert(replica.currentSchema.get.fieldNames.toSeq == Seq("id", "val"))
    assert(replica.read(spark).select("id", "val").as[(Long, String)]
      .collect().toSet ==
      leader.read(spark).select("id", "val").as[(Long, String)]
        .collect().toSet)
  }

  test("expired checkpoint version degrades to one full-refresh insert feed") {
    val dir = tmp("rowfollow-exp")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 2)
    val ckpt = s"$dir/ckpt"
    val got = scala.collection.mutable.Buffer
      .empty[(Long, String, Long, String, Boolean)]

    leader.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    runOnePass(root, ckpt, got)
    got.clear()

    // churn far past retention: the checkpointed version no longer
    // exists, so the pass must open with a full-refresh feed (deletions
    // inside the expired window are unobservable row-by-row)
    leader.deleteWhere(spark, col("id") === 1L)
    leader.merge(Seq((4L, "d", "I", "04")).toDF("id", "v", "_op", "_seq"))
    leader.merge(Seq((5L, "e", "I", "05")).toDF("id", "v", "_op", "_seq"))
    leader.merge(Seq((6L, "f", "I", "06")).toDF("id", "v", "_op", "_seq"))
    runOnePass(root, ckpt, got)

    val refresh = got.filter(_._5)
    assert(refresh.nonEmpty && refresh.forall(_._2 == "insert"))
    // full refresh + later per-commit diffs reconstruct the leader
    val replica = scala.collection.mutable.Map.empty[Long, String]
    got.sortBy(_._1).foreach {
      case (_, _, id, v, true)               => replica(id) = v
      case (_, "insert", id, v, _)           => replica(id) = v
      case (_, "update_postimage", id, v, _) => replica(id) = v
      case (_, "delete", id, _, _)           => replica.remove(id)
      case _                                 => ()
    }
    val expect = leader.read(spark).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(replica.toMap == expect)
  }
}
