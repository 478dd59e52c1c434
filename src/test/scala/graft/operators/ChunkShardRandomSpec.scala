package graft.operators

import graft.SparkSpec
import graft.functions.SplitMix64
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized driver-reference tests: Chunk and Shard replayed against
  * plain-Scala reference implementations over random corpora, windows,
  * strides, and seeds — the same methodology as the BM25 / segment-dedup
  * randomized suites. */
class ChunkShardRandomSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of [[Chunk.tokenWindows]]. */
  private def refChunks(toks: Vector[String], w: Int, s: Int)
      : Seq[(Int, Long, Long, String)] = {
    val n = toks.size
    if (n == 0) Seq.empty
    else {
      val m = if (n <= w) 1 else math.ceil((n - w).toDouble / s).toInt + 1
      (0 until m).map { k =>
        val start = if (k == m - 1 && n > w) (n - w).toLong else k.toLong * s
        (k, start, math.min(w, n).toLong,
          toks.slice(start.toInt, start.toInt + w).mkString(" "))
      }
    }
  }

  test("tokenWindows == driver reference over random docs/windows/strides") {
    val rnd = new Random(20260814L)
    (1 to 6).foreach { round =>
      val w = 1 + rnd.nextInt(40)
      val s = 1 + rnd.nextInt(w)
      val docs = (0 until 40).map { id =>
        val n = rnd.nextInt(150) // 0 tokens included
        (id.toLong, Vector.fill(n)(s"t${rnd.nextInt(30)}"))
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Chunk.tokenWindows(df, "doc_id", "text", w, s)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3),
          r.getString(4))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      docs.foreach { case (id, ts) =>
        val want = refChunks(ts, w, s)
        assert(got.getOrElse(id, Seq.empty) == want,
          s"round=$round w=$w s=$s doc=$id n=${ts.size}")
      }
      // coverage invariant: every token index lands in >= 1 chunk
      docs.filter(_._2.nonEmpty).foreach { case (id, ts) =>
        val covered = got(id).flatMap { case (_, st, nt, _) =>
          st until (st + nt) }.toSet
        assert(covered == (0L until ts.size.toLong).toSet,
          s"round=$round w=$w s=$s doc=$id coverage")
      }
    }
  }

  test("deterministic shard == driver reference over random ids/seeds") {
    val rnd = new Random(8L)
    (1 to 4).foreach { round =>
      val seed = rnd.nextLong()
      val shards = 1 << (2 + rnd.nextInt(4)) // 4..32
      val ids = (0 until 3000).map(_ =>
        rnd.nextLong()).distinct // arbitrary longs incl. negatives
      val want = ids
        .map(id => (id, SplitMix64.compute(id ^ seed)))
        .groupBy { case (_, k) => (k & (shards - 1)).toInt }
        .flatMap { case (sh, rows) =>
          rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
            .map { case ((id, k), pos) => (id, k, sh, pos.toLong) }
        }.toSet
      val got = Shard.deterministic(ids.toDF("id"), "id", seed, shards)
        .select("id", "sort_key", "shard", "pos")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(got == want, s"round=$round seed=$seed shards=$shards")
    }
  }
}
