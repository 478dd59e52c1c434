package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Merge-on-read depth soak (round-9 verdict item 8): at
  * [[GraftTable.MorMaxLayers]] layer depth over an inflated base,
  *  - the layered-read PLAN must stay the fixed three-delta-step fold
  *    (one window, one anti-join) — per-layer plan growth would make
  *    read cost O(layers) and sink the mode at its own workload;
  *  - point lookups must read only the probed key's bucket (base +
  *    that bucket's layer files), never foreign buckets;
  *  - collapse must restore a clean one-file-per-touched-bucket base.
  */
class MorDepthSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-mor-soak").toString

  private def planCounts(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val plan = df.queryExecution.optimizedPlan
    var windows = 0; var joins = 0
    plan.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.Window =>
        windows += 1
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => joins += 1
      case _ => ()
    }
    (windows, joins)
  }

  test("read plan is depth-independent; lookups stay one-bucket; " +
      "collapse restores a clean base") {
    val n = 8
    val t = new GraftTable(tmp(), Seq("id"), nBuckets = n,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    // inflated base: 200k rows so layer cost would show if reads ever
    // re-scanned per layer
    t.overwrite(spark.range(200000L)
      .select(col("id"), concat(lit("v"), col("id")).as("v")))

    def mergeDelta(lsn: Long): Unit =
      t.merge(spark.range(40)
        .select((col("id") * 977L % 200000L).as("id"),
          concat(lit(s"u$lsn-"), col("id")).as("v"),
          lit("U").as("_op"),
          format_string("%016x/%016x", lit(lsn), lit(0L)).as("_seq"))
        .dropDuplicates("id"))

    mergeDelta(1L); mergeDelta(2L)
    val m2 = t.readManifest(t.currentVersion.get)
    assert(m2.layers.size == 2)
    val (w2, j2) = planCounts(t.read(spark))

    (3L to GraftTable.MorMaxLayers).foreach(mergeDelta)
    val m8 = t.readManifest(t.currentVersion.get)
    assert(m8.layers.size == GraftTable.MorMaxLayers,
      s"expected full depth, got ${m8.layers.size}")

    // 1. fixed-step fold: window/join counts identical at depth 2 and 8
    val (w8, j8) = planCounts(t.read(spark))
    assert(w8 == w2 && j8 == j2,
      s"plan grew with layer depth: ($w2,$j2) -> ($w8,$j8)")
    assert(w8 == 1, s"layered LWW should be ONE window, got $w8")
    assert(j8 == 1, s"layered fold should be ONE anti-join, got $j8")

    // 2. point lookup reads only the key's bucket
    val key = 12345L
    val bucket = spark.range(1)
      .select(pmod(hash(lit(key)), lit(n)).cast("int")).head().getInt(0)
    val lk = t.lookup(spark, Seq(key))
    assert(lk.collect().length == 1)
    val read = lk.inputFiles
    assert(read.nonEmpty && read.forall(_.contains(s"_bucket=$bucket")),
      s"lookup read foreign buckets: ${read.filterNot(
        _.contains(s"_bucket=$bucket")).take(3).mkString(", ")}")
    // and strictly fewer files than the table holds in total
    assert(read.length < m8.allFiles.size,
      s"lookup read ${read.length} of ${m8.allFiles.size} files")

    // 3. collapse: layer-free manifest, one file per touched bucket,
    //    data identical
    val before = t.read(spark).orderBy("id").collect()
    val touched = m8.layers
      .flatMap(l => l.ups.keySet ++ l.del.keySet).toSet
    t.collapseLayers(spark)
    val mc = t.readManifest(t.currentVersion.get)
    assert(mc.layers.isEmpty)
    touched.foreach(b => assert(mc.files(b).size == 1,
      s"bucket $b not collapsed to one file: ${mc.files(b).size}"))
    // untouched buckets' base files carried over verbatim
    (0 until n).filterNot(touched).foreach(b =>
      assert(mc.files.get(b) == m8.files.get(b),
        s"untouched bucket $b was rewritten by collapse"))
    assert(t.read(spark).orderBy("id").collect().sameElements(before),
      "collapse must be data-identical")

    // 4. at full depth the NEXT merge takes the collapse-then-CoW or
    //    fresh-layer path and the table keeps serving: one more delta
    mergeDelta(99L)
    assert(t.lookup(spark, Seq(key)).collect().length == 1)
  }
}
