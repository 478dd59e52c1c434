package graft.operators

import graft.SparkSpec
import graft.functions.SplitMix64
import org.apache.spark.sql.functions._

class ShardSpec extends SparkSpec {
  import spark.implicits._

  test("splitmix64 expression matches the reference under codegen") {
    val ids = Seq(-5L, 0L, 1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val out = ids.toDF("id").select(col("id"), SplitMix64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach(i => assert(out(i) == SplitMix64.compute(i), s"id=$i"))
  }

  test("deterministic: same seed → identical permutation; new seed differs") {
    val df = (0L until 1000L).toDF("id")
    val a = Shard.deterministic(df, "id", seed = 7L, shards = 8)
      .select("id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Shard.deterministic(df, "id", seed = 7L, shards = 8)
      .select("id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b, "same seed must reproduce the identical order")
    val c = Shard.deterministic(df, "id", seed = 8L, shards = 8)
      .select("id", "shard", "pos").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a != c, "a different seed must permute differently")
  }

  test("shards are dense, balanced, and positions are gapless per shard") {
    val n = 4096L
    val out = Shard.deterministic((0L until n).toDF("id"), "id", 2026L, 16)
      .select("shard", "pos").collect().map(r => (r.getInt(0), r.getLong(1)))
    val byShard = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byShard.keySet == (0 until 16).toSet, "all shards populated")
    byShard.foreach { case (s, ps) =>
      assert(ps == (0L until ps.size.toLong), s"shard $s positions gapless")
    }
    // avalanche balance: sequential ids spread within 3x of uniform
    val sizes = byShard.values.map(_.size).toSeq
    assert(sizes.max < 3 * (n / 16), s"skewed shards: $sizes")
  }

  test("plan: one exchange on shard, sort within shard, codegen'd mixer") {
    val df = Shard.deterministic((0L until 100L).toDF("id"), "id", 1L, 4)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"must not plan a global sort:\n$plan")
  }
}
