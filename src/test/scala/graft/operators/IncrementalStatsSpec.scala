package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the IncrementalStats invariant: after every sync the table
  * equals the from-scratch per-key (count, sum) aggregate — inserts,
  * value-changing updates, deletes that empty a key, and replays. */
class IncrementalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def changesDf(prev: Map[Long, (String, Long)],
      next: Map[Long, (String, Long)]): DataFrame = {
    val ins = (next.keySet -- prev.keySet).toSeq
      .map(id => (id, next(id)._1, next(id)._2, "insert"))
    val del = (prev.keySet -- next.keySet).toSeq
      .map(id => (id, prev(id)._1, prev(id)._2, "delete"))
    val upd = (next.keySet & prev.keySet).toSeq
      .filter(id => prev(id) != next(id))
      .flatMap(id => Seq(
        (id, prev(id)._1, prev(id)._2, "update_preimage"),
        (id, next(id)._1, next(id)._2, "update_postimage")))
    (ins ++ del ++ upd).toDF("id", "key", "v", "_change_type")
  }

  private def check(label: String, stats: graft.sinks.GraftTable,
      state: Map[Long, (String, Long)]): Unit = {
    val got = IncrementalStats.read(spark, stats)
      .as[(String, Long, Long)].collect().toSet
    val want = state.values.groupBy(_._1).map { case (k, vs) =>
      (k, vs.size.toLong, vs.map(_._2).sum)
    }.toSet
    assert(got == want, s"$label:\n got  $got\n want $want")
  }

  test("stats table == from-scratch aggregate through insert/update/" +
      "delete/key-emptying/replay") {
    val stats = IncrementalStats.statsTable(tmp("is"), 4)
    def sync(prev: Map[Long, (String, Long)],
        next: Map[Long, (String, Long)], seq: String): Unit =
      IncrementalStats.applyDelta(spark, stats,
        changesDf(prev, next), "key", "v", seq)

    val s1 = Map(1L -> ("a", 10L), 2L -> ("a", 20L), 3L -> ("b", 5L))
    sync(Map.empty, s1, "01"); check("bootstrap", stats, s1)
    // update moves 2's value; 4 inserts under a new key
    val s2 = s1 + (2L -> ("a", 25L)) + (4L -> ("c", 7L))
    sync(s1, s2, "02"); check("update+insert", stats, s2)
    // delete 3 empties key b entirely — its row must vanish
    val s3 = s2 - 3L
    sync(s2, s3, "03"); check("key emptied", stats, s3)
    assert(!IncrementalStats.read(spark, stats)
      .as[(String, Long, Long)].collect().exists(_._1 == "b"))
    // replay no-ops
    val v = stats.currentVersion
    sync(s2, s3, "03")
    assert(stats.currentVersion == v)
    check("replay", stats, s3)
    // a key that nets to zero within ONE delta (insert+delete pair
    // across keys): move every a-doc to key d
    val s4 = s3.map { case (id, (k, v0)) =>
      (id, (if (k == "a") "d" else k, v0)) }
    sync(s3, s4, "04"); check("key migration", stats, s4)
  }

  test("sync reads only the touched keys' buckets (strict file subset)") {
    val stats = IncrementalStats.statsTable(tmp("is-probe"), 8)
    val s1 = (0L until 256L).map(i => (i, (s"k${i % 64}", i))).toMap
    IncrementalStats.applyDelta(spark, stats, changesDf(Map.empty, s1),
      "key", "v", "01")
    val all = stats.read(spark).inputFiles.length
    val probed = stats.readForProbe(spark,
      Seq("k7").toDF("key")).inputFiles.length
    assert(probed > 0 && probed < all, s"$probed of $all")
  }

  test("applyFeedBatch maintains the profile from the row-follow stream") {
    val dir = tmp("is-feed")
    val root = s"$dir/leader"
    val leader = new graft.sinks.GraftTable(root, Seq("doc_id"),
      nBuckets = 4, retainVersions = 10)
    val stats = IncrementalStats.statsTable(s"$dir/stats", 4)
    val ckpt = s"$dir/ckpt"
    val vExpr = size(graft.functions.TextFunctions.tokens(col("text")))
      .cast("long")
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalStats.applyFeedBatch(df, root, stats,
            "src", "text", vExpr)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def got() = IncrementalStats.read(spark, stats)
      .as[(String, Long, Long)].collect().toSet
    leader.overwrite(Seq(
      (1L, "a", "one two three"), (2L, "a", "four five"),
      (3L, "b", "six")).toDF("doc_id", "src", "text"))
    pass()
    assert(got() == Set(("a", 2L, 5L), ("b", 1L, 1L)), got())
    leader.merge(Seq(
        (2L, "a", "four five six seven", "U", "10"),
        (4L, "b", "eight nine", "I", "11"),
        (1L, "", "", "D", "12"))
      .toDF("doc_id", "src", "text", "_op", "_seq"))
    pass()
    assert(got() == Set(("a", 1L, 4L), ("b", 2L, 3L)), got())
    // replay no-op
    val v = stats.currentVersion
    pass()
    assert(stats.currentVersion == v)
  }
}
