package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Adaptive merge-on-read admission at index-table scale (round-10
  * verdict item 4): with a base whose touched-bucket bytes exceed
  * `morMinAffectedBytes`, a delta-scale merge must commit as a layer
  * (O(delta) write) while the identical merge against a table whose
  * threshold is not crossed rewrites copy-on-write — with identical
  * data either way, and bucket-pruned probes reading ONLY the probed
  * buckets' files over the layered inflated base. The bench pair
  * `op_dedup_incremental_{cow,mor}` measures the same mechanism's cost
  * gap under the production default threshold. */
class MorIndexScaleSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-morscale").toString

  test("index-scale adaptive admission: above-threshold merges layer, " +
      "non-crossed merges rewrite, probes stay bucket-pruned, data " +
      "identical") {
    val n = 8
    def mk(root: String, thr: Long) =
      new GraftTable(root, Seq("band", "bh", "id"), n,
        bucketCols0 = Seq("band", "bh"), mergeOnRead = true,
        morMinAffectedBytes = thr)
    // a band-index-shaped base big enough to cross a 256 KiB floor:
    // (band, bh) spread over every bucket, ids dense
    val base = spark.range(300000).select(
      (col("id") % 16).cast("int").as("band"),
      (col("id") % 1024).cast("int").as("bh"),
      col("id").as("id"))
    val thr = 256L << 10
    val root = tmp()
    val mor = mk(s"$root/mor", thr)
    val cow = mk(s"$root/cow", Long.MaxValue)
    mor.overwrite(base)
    cow.overwrite(base)
    assert(mor.basePressure.bytes >= thr,
      s"premise broken: base ${mor.basePressure.bytes}B below $thr")

    // delta-scale netted I/D merge spanning many (band, bh) groups —
    // the incremental-dedup band sync shape
    def delta(seq: Long) = spark.range(400).select(
        (col("id") % 16).cast("int").as("band"),
        (col("id") % 1024).cast("int").as("bh"),
        (col("id") + 7000000L * seq).as("id"))
      .withColumn("_op", when(col("id") % 5 === 0, "D").otherwise("U"))
      .withColumn("_seq", lit(f"$seq%016x/0"))
    Seq(mor, cow).foreach(_.merge(delta(2)))
    assert(mor.hasLayers,
      "affected bytes cross the threshold — the merge must layer")
    assert(!cow.hasLayers,
      "Long.MaxValue threshold is never crossed — the merge must rewrite")

    // identical data through either write mode
    val a = mor.read(spark).orderBy("band", "bh", "id").collect()
    val b = cow.read(spark).orderBy("band", "bh", "id").collect()
    assert(a.length == b.length && a.sameElements(b),
      "layered and rewritten tables must hold identical rows")

    // probe bucket-pruning over the LAYERED table: a probe for two
    // (band, bh) groups reads only their buckets' files (base + layer
    // files both live under _bucket=N dirs)
    val probe = Seq((3, 3), (7, 7)).toDF("band", "bh")
    val probedBuckets = probe
      .select(pmod(hash(col("band"), col("bh")), lit(n)).cast("int"))
      .distinct().as[Int].collect().toSet
    val got = mor.readForProbe(spark, probe)
    assert(got.count() > 0)
    val read = got.inputFiles
    assert(read.nonEmpty)
    val foreign = read.filterNot(f =>
      probedBuckets.exists(bk => f.contains(s"_bucket=$bk")))
    assert(foreign.isEmpty,
      s"probe read foreign buckets: ${foreign.take(3).mkString(", ")}")
    val m = mor.readManifest(mor.currentVersion.get)
    assert(read.length < m.allFiles.size +
      m.layers.map(l => l.ups.valuesIterator.flatten.size +
        l.del.valuesIterator.flatten.size).sum,
      "probe must read strictly fewer files than the table holds")

    // a second above-threshold delta stacks another layer; collapse
    // then folds back to a clean base with the same rows
    mor.merge(delta(3))
    cow.merge(delta(3))
    assert(mor.readManifest(mor.currentVersion.get).layers.size == 2)
    mor.collapseLayers(spark)
    assert(!mor.hasLayers)
    val a2 = mor.read(spark).orderBy("band", "bh", "id").collect()
    val b2 = cow.read(spark).orderBy("band", "bh", "id").collect()
    assert(a2.sameElements(b2), "collapse must be data-identical")
  }
}
