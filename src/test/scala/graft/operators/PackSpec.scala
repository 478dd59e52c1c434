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
}
