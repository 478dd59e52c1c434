package graft.sinks

import graft.SparkSpec
import graft.functions.{Interleave2, SplitMix64}
import org.apache.spark.sql.GraftFileSkipping
import org.apache.spark.sql.functions._
import scala.util.Random

/** Z-order clustering maintenance: after `clusterBy(x, y)` the per-file
  * [min,max] stats must become selective in BOTH dimensions — the whole
  * point of the rewrite — while the data stays byte-identical. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("interleave2 matches the reference under codegen") {
    val rnd = new Random(7)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L),
      (Int.MaxValue.toLong, Int.MaxValue.toLong), (-5L, 99L)) ++
      Seq.fill(50)((rnd.nextLong() & 0x7fffffffL, rnd.nextLong() & 0x7fffffffL))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Interleave2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs.foreach(p =>
      assert(got(p) == Interleave2.compute(p._1, p._2), p.toString))
    // the curve property that makes clustering work: interleave is
    // monotone per dimension when the other is fixed
    assert(Interleave2.compute(3, 9) < Interleave2.compute(4, 9))
    assert(Interleave2.compute(3, 9) < Interleave2.compute(3, 10))
  }

  test("clusterBy makes file stats selective in both dimensions, " +
      "data-identical") {
    val t = new GraftTable(tmp("zorder"), Seq("id"), nBuckets = 2,
      statsCols0 = Seq("x", "y"))
    // append-ordered ingest: x and y pseudo-random per row, so every
    // file's [min,max] covers ~the full square in both dims — the
    // layout where NOTHING prunes
    val n = 4000
    (0 until 8).foreach { k =>
      val rows = (k * (n / 8) until (k + 1) * (n / 8)).map { i =>
        (i.toLong, SplitMix64.compute(i.toLong) & 0xfffL,
          SplitMix64.compute(i * 7L + 1L) & 0xfffL)
      }
      t.append(rows.toDF("id", "x", "y"))
    }
    val m0 = t.currentManifest().get
    val allBefore = m0.allFiles.size
    assert(allBefore >= 16, s"want many files, got $allBefore")
    def surviving(m: GraftTable#Manifest,
        box: Map[String, (Long, Long)]): Int =
      m.allFiles.count(f =>
        GraftFileSkipping.survives(m.fileStats.get(f), box))
    val box = Map("x" -> ((1024L, 1151L)), "y" -> ((2048L, 2175L)))
    val yband = Map("y" -> ((0L, 255L)))
    assert(surviving(m0, box) == allBefore,
      "append-ordered layout must be unprunable (the premise)")
    val before = t.read(spark).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq

    t.clusterBy(spark, "x", "y", filesPerBucket = 8)

    val m1 = t.currentManifest().get
    val allAfter = m1.allFiles.size
    assert(allAfter >= 8, s"want multiple files per bucket, got $allAfter")
    // a small 2-D box now opens a small fraction of the files
    val sBox = surviving(m1, box)
    assert(sBox <= allAfter / 2,
      s"2-D box survives $sBox of $allAfter files after clustering")
    // and a single-dimension band prunes too (y was never the sort key)
    val sBand = surviving(m1, yband)
    assert(sBand < allAfter,
      s"y-band survives $sBand of $allAfter files after clustering")
    // data identical, keys intact
    val after = t.read(spark).orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(after == before, "clusterBy must be data-identical")
    // merge/point-lookup paths still work on the clustered layout
    t.merge(Seq((17L, 9999L, 9999L, "U", "zz/0"))
      .toDF("id", "x", "y", "_op", "_seq"))
    assert(t.read(spark).filter(col("id") === 17L)
      .as[(Long, Long, Long)].head() == ((17L, 9999L, 9999L)))
  }
}
