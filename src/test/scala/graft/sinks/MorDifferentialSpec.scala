package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.util.Random

/** Differential fuzz of the merge-on-read write mode: the SAME random
  * operation sequence drives a copy-on-write twin and a merge-on-read
  * twin; visible state must match after EVERY operation, and every
  * per-merge snapshot must time-travel identically. The CoW path is the
  * long-standing, independently-gated implementation, so agreement here
  * pins the layered read fold, collapse, and all maintenance
  * interactions (compact, vacuum, deleteWhere, append, schema widen,
  * high-water replay) to known-good semantics — the same
  * model-differential shape as JdbcSinkModelSpec. */
class MorDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-mor-fuzz").toString

  /** Normalized visible state regardless of schema width: one string
    * per row, columns in name order, nulls marked. */
  private def state(t: GraftTable): Set[String] = {
    val df = t.read(spark)
    if (df.columns.isEmpty) return Set.empty
    val cols = df.columns.sorted.toSeq
    df.select(concat_ws("|",
        cols.map(c => coalesce(col(c).cast("string"), lit("␀"))): _*))
      .as[String].collect().toSet
  }

  private def snapshot(t: GraftTable, v: Long): Set[String] = {
    val df = t.readVersion(spark, v)
    if (df.columns.isEmpty) return Set.empty
    val cols = df.columns.sorted.toSeq
    df.select(concat_ws("|",
        cols.map(c => coalesce(col(c).cast("string"), lit("␀"))): _*))
      .as[String].collect().toSet
  }

  private def mkBatch(rnd: Random, lsn: Long, wide: Boolean): DataFrame = {
    val n = 1 + rnd.nextInt(12)
    val rows = (0 until n).map { _ =>
      val k = rnd.nextInt(200).toLong
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "D"
        case 2     => "I"
        case _     => "U"
      }
      (k, s"v$lsn-$k", op, if (wide) Some(s"w$k") else None)
    }.distinct.groupBy(_._1).map(_._2.head).toSeq // one op per key per batch
    val base = rows.map(r => (r._1, r._2, r._3, r._4))
      .toDF("id", "v", "_op", "extra")
      .withColumn("_seq", format_string("%016x/%016x", lit(lsn), lit(0L)))
    if (wide) base else base.drop("extra")
  }

  // seed 7 initializes only 3 of the 200 key values, leaving most
  // buckets EMPTY: deletes routed to never-written buckets write
  // delete-layer-only buckets, and later inserts into those buckets
  // must NOT take the bootstrap path (the shadowing bug class — see the
  // directed test below).
  for (seed <- Seq(7, 11, 42, 77)) {
    test(s"CoW and MoR twins agree under a random op mix (seed $seed)") {
      val rnd = new Random(seed)
      val cow = new GraftTable(tmp(), Seq("id"), nBuckets = 4)
      val mor = new GraftTable(tmp(), Seq("id"), nBuckets = 4,
        mergeOnRead = true, morMinAffectedBytes = 0L)
      val initN = if (seed == 7) 3L else 60L
      val init = (0L until initN).map(i => (i, s"v0-$i")).toDF("id", "v")
      cow.overwrite(init); mor.overwrite(init)
      // per-merge snapshot versions for time-travel agreement
      val snaps = Seq.newBuilder[(Long, Long)]
      var lsn = 0L
      var lastBatch: Option[DataFrame] = None
      for (step <- 1 to 35) {
        rnd.nextInt(10) match {
          case 0 => // maintenance: compact (collapses MoR layers first)
            cow.compact(spark, maxFiles = 2)
            mor.compact(spark, maxFiles = 2)
          case 1 => // vacuum old versions (keeps layered snapshots valid)
            cow.vacuum(2); mor.vacuum(2)
          case 2 if lastBatch.nonEmpty => // exact replay: must no-op
            lastBatch.foreach { b => cow.merge(b); mor.merge(b) }
          case 3 => // predicate delete (MoR collapses first by guard)
            val cut = rnd.nextInt(200)
            val nCow = cow.deleteWhere(spark, col("id") === lit(cut))
            val nMor = mor.deleteWhere(spark, col("id") === lit(cut))
            assert(nCow == nMor, s"step $step: deleteWhere $nCow vs $nMor")
          case 4 => // append path (MoR collapses first by guard)
            lsn += 1
            val extra = Seq((1000L + rnd.nextInt(50), s"a$lsn"))
              .toDF("id", "v")
            cow.append(extra); mor.append(extra)
          case _ => // the hot path: a small mixed merge
            lsn += 1
            val b = mkBatch(rnd, lsn, wide = step > 25)
            cow.merge(b); mor.merge(b)
            lastBatch = Some(b)
            snaps += ((cow.currentVersion.get, mor.currentVersion.get))
        }
        assert(state(mor) == state(cow), s"step $step diverged")
        assert(mor.readMeta().highWater == cow.readMeta().highWater,
          s"step $step high-water diverged")
        // point lookups agree on a random probe
        val k = rnd.nextInt(200).toLong
        assert(mor.lookup(spark, Seq(k)).collect().length ==
          cow.lookup(spark, Seq(k)).collect().length,
          s"step $step lookup($k) diverged")
      }
      // one final merge AFTER all maintenance so at least one recorded
      // pair is guaranteed retained: the MoR twin commits extra manifest
      // versions (each pre-maintenance collapse is its own commit), so
      // under vacuum(2) the twins' retention windows can end up disjoint
      // and every earlier recorded pair may legitimately expire.
      lsn += 1
      val closing = mkBatch(rnd, lsn, wide = true)
      cow.merge(closing); mor.merge(closing)
      snaps += ((cow.currentVersion.get, mor.currentVersion.get))
      assert(state(mor) == state(cow), "closing merge diverged")
      // every RETAINED per-merge snapshot pair time-travels identically
      // (retention checked per side at compare time)
      val retainedCow = cow.versions.toSet
      val retainedMor = mor.versions.toSet
      val checked = snaps.result().filter { case (cv, mv) =>
        retainedCow.contains(cv) && retainedMor.contains(mv) }
      assert(checked.nonEmpty, "no retained snapshot pairs to compare")
      checked.foreach { case (cv, mv) =>
        assert(snapshot(cow, cv) == snapshot(mor, mv),
          s"snapshot pair ($cv,$mv) diverged")
      }
      // read through a probe: bucket-pruned index read agrees
      val probe = (0L until 200L by 7L).toDF("id")
      assert(mor.readForProbe(spark, probe).collect().toSet.size ==
        cow.readForProbe(spark, probe).collect().toSet.size)
      // final collapse leaves identical state and a layer-free manifest
      val before = state(mor)
      mor.collapseLayers(spark)
      assert(state(mor) == before)
    }
  }

  test("oversized batch takes the CoW fallback on a layered table " +
      "(collapse-then-merge) with identical results") {
    val cow = new GraftTable(tmp(), Seq("id"), nBuckets = 4)
    val mor = new GraftTable(tmp(), Seq("id"), nBuckets = 4,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    val init = (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v")
    cow.overwrite(init); mor.overwrite(init)
    // a small merge first so the MoR table holds a layer
    val small = Seq((1L, "s", "U"), (2L, "", "D")).toDF("id", "v", "_op")
      .withColumn("_seq", lit(f"${1L}%016x/${0L}%016x"))
    cow.merge(small); mor.merge(small)
    assert(mor.currentManifest().exists(_.layers.nonEmpty))
    // past MorDeltaMaxRows the batch is no longer "small": the MoR table
    // must collapse and take the copy-on-write path. range ids are
    // already distinct — no modulo (an earlier draft's % 100000 deduped
    // the batch BELOW the cap, so the MoR path was correctly taken and
    // this test failed for the wrong reason).
    val morVerBefore = mor.currentVersion.get
    val big = spark.range(GraftTable.MorDeltaMaxRows + 1)
      .select(col("id"),
        concat(lit("b"), col("id")).as("v"), lit("U").as("_op"),
        lit(f"${2L}%016x/${0L}%016x").as("_seq"))
      .dropDuplicates("id")
    cow.merge(big); mor.merge(big)
    assert(mor.currentManifest().exists(_.layers.isEmpty),
      "oversized merge must leave a collapsed, layer-free table")
    // the fallback branch really ran: collapse is its OWN commit, then
    // the recursive CoW merge commits — two new versions, and the
    // intermediate one is the layer-free collapsed base
    assert(mor.currentVersion.get == morVerBefore + 2,
      s"expected collapse+merge commits, versions ${mor.versions}")
    val collapsed = mor.readManifest(morVerBefore + 1)
    assert(collapsed.layers.isEmpty, "intermediate commit must be the collapse")
    def st(t: GraftTable) = t.read(spark).as[(Long, String)].collect().toSet
    assert(st(mor) == st(cow))
  }

  test("insert into a bucket holding only a delete-layer file survives " +
      "(bootstrap-shadowing regression)") {
    def bucketOf(k: Long, n: Int): Int = spark.range(1)
      .select(pmod(hash(lit(k)), lit(n)).cast("int")).head().getInt(0)
    val n = 4
    // init keys all in one bucket; K lands in a DIFFERENT, empty bucket
    val keys = (0L until 400L).groupBy(bucketOf(_, n))
    val homeBucket = keys.keys.head
    val initKeys = keys(homeBucket).take(5)
    val otherBucket = keys.keys.find(_ != homeBucket).get
    val kOut = keys(otherBucket).head
    val cow = new GraftTable(tmp(), Seq("id"), nBuckets = n)
    val mor = new GraftTable(tmp(), Seq("id"), nBuckets = n,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    val init = initKeys.map(i => (i, s"v$i")).toDF("id", "v")
    cow.overwrite(init); mor.overwrite(init)
    // batch 1: delete of kOut (empty bucket → delete-layer-only bucket
    // on the MoR twin) alongside a live-bucket update so the MoR path
    // is taken (not bootstrap)
    val b1 = Seq((initKeys.head, "u1", "U"), (kOut, "", "D"))
      .toDF("id", "v", "_op")
      .withColumn("_seq", lit(f"${1L}%016x/${0L}%016x"))
    cow.merge(b1); mor.merge(b1)
    assert(mor.currentManifest()
      .exists(_.layers.exists(_.del.contains(otherBucket))),
      "precondition: MoR twin must hold a delete-layer file in the bucket")
    // batch 2: INSERT kOut — its bucket holds no base/upsert files, only
    // the stale delete layer; bootstrapping here would publish a base
    // file the delete layer then anti-joins back out
    val b2 = Seq((kOut, "back", "I")).toDF("id", "v", "_op")
      .withColumn("_seq", lit(f"${2L}%016x/${0L}%016x"))
    cow.merge(b2); mor.merge(b2)
    assert(mor.lookup(spark, Seq(kOut)).collect().map(_.getString(1)).toSeq
      == Seq("back"), "re-inserted key must survive the stale delete layer")
    def st(t: GraftTable) = t.read(spark).as[(Long, String)].collect().toSet
    assert(st(mor) == st(cow))
  }
}
