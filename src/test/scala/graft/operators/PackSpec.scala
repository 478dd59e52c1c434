package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy sequence packing invariants: budget respected (singleton
  * overflow excepted), pack ids contiguous and monotone in id order per
  * shard, deterministic across runs, and bit-equal to a driver-side
  * replay of the greedy rule. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (1L to n.toLong).map(i =>
    (i, i % 4, 50L + (i * 37) % 400)).toDF("doc_id", "shard", "ntok")

  test("greedy packing matches a driver-side sequential replay") {
    val input = docs(200)
    val got = Pack.greedy(input, "doc_id", "ntok", "shard", budget = 512L)
      .as[(Long, Long, Long)].collect().toSet
    val expected = input.as[(Long, Long, Long)].collect()
      .groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
        var pack = 0L
        var acc = 0L
        rows.sortBy(_._1).zipWithIndex.map { case ((id, _, ntok), i) =>
          if (i == 0) { acc = ntok }
          else if (acc + ntok <= 512L) { acc += ntok }
          else { pack += 1L; acc = ntok }
          (id, shard, pack)
        }
      }.toSet
    assert(got == expected)
    // deterministic
    assert(got == Pack.greedy(input, "doc_id", "ntok", "shard", 512L)
      .as[(Long, Long, Long)].collect().toSet)
  }

  test("packs respect the budget except singleton overflows") {
    val input = (1L to 100L).map(i =>
      (i, i % 3, if (i % 17 == 0) 900L else 100L + i % 200))
      .toDF("doc_id", "shard", "ntok")
    val sums = Pack.greedy(input, "doc_id", "ntok", "shard", 512L)
      .join(input.withColumnRenamed("doc_id", "id"), Seq("id", "shard"))
      .groupBy("shard", "pack_id")
      .agg(sum("ntok").as("total"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    sums.foreach { case (shard, pack, total, n) =>
      assert(total <= 512L || n == 1L, s"pack ($shard,$pack): $total over budget with $n docs")
    }
    // pack ids contiguous from 0 per shard
    val perShard = sums.groupBy(_._1)
    perShard.foreach { case (_, packs) =>
      val ids = packs.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length.toLong).toSeq)
    }
  }

  test("greedyBalanced: budget + contiguity hold, hot shard splits across sub-streams") {
    // ONE hot shard: all 300 docs land on shard 0
    val input = (1L to 300L).map(i => (i, 0L, 60L + i % 40))
      .toDF("doc_id", "shard", "ntok")
    val packed = Pack.greedyBalanced(input, "doc_id", "ntok", "shard",
      budget = 512L, fanout = 8)
    val rows = packed.as[(Long, Long, Long)].collect()
    assert(rows.length == 300 && rows.forall(_._2 == 0L))
    // budget respected (multi-doc packs), ids contiguous from 0
    val byPack = rows.groupBy(_._3)
    val ntok = input.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    byPack.foreach { case (p, ds) =>
      val tot = ds.map(d => ntok(d._1)).sum
      assert(tot <= 512L || ds.length == 1, s"pack $p: $tot")
    }
    val ids = byPack.keys.toSeq.sorted
    assert(ids == (0L until ids.length.toLong))
    // deterministic
    val again = Pack.greedyBalanced(input, "doc_id", "ntok", "shard",
      512L, 8).as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // the hot shard actually split: more than one sub-stream contributed
    // (pack count exceeds what one greedy stream yields isn't guaranteed,
    // so check the sub-shard hash spreads docs instead)
    import org.apache.spark.sql.functions.{pmod, xxhash64}
    val subs = input.select(pmod(xxhash64(col("doc_id")), lit(8)))
      .distinct().count()
    assert(subs > 1)
  }

  test("greedyBalanced: negative shard ids reconstruct without collisions") {
    val input = (1L to 120L).map(i => (i, (i % 3) - 1, 100L + i % 50))
      .toDF("doc_id", "shard", "ntok") // shards -1, 0, 1
    val rows = Pack.greedyBalanced(input, "doc_id", "ntok", "shard",
      budget = 512L, fanout = 4).as[(Long, Long, Long)].collect()
    assert(rows.length == 120)
    assert(rows.map(_._2).toSet == Set(-1L, 0L, 1L))
    // shard assignment preserved exactly (floor division, not truncate)
    val want = input.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    rows.foreach { case (id, shard, _) => assert(shard == want(id), id) }
    // contiguous non-overlapping pack ids per shard
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val ids = rs.map(_._3).distinct.sorted
      assert(ids.toSeq == (0L until ids.length.toLong).toSeq, ids.toSeq)
    }
  }
}
