package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Policy-driven maintenance — the reference DuckLake runner's knobs
  * (etl-maintenance src/materialization.rs:14-43,
  * src/ducklake/runner.rs:1544-1672) expressed against GraftTable:
  * delete-threshold / min-layer-bytes collapse triggers, layer-safe
  * bounded adjacent-file merge, min-active-files gate, per-run table
  * cap, per-table interval spacing, auto bucket-count evolution. */
class MaintenancePolicySpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-maint").toString

  private def batch(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "v", "_op", "lsn")
      .withColumn("_seq", format_string("%016x/%016x", col("lsn"), lit(0L)))
      .drop("lsn")

  private def state(t: GraftTable) =
    t.read(spark).as[(Long, String)].collect().toSet

  test("mergeAdjacentFiles: merges only sub-target files, bounded by " +
      "maxCompactedFiles, gated by minActiveDataFiles, data-identical") {
    val t = new GraftTable(tmp(), Seq("id"), nBuckets = 2)
    // 4 appends → 4 small files per occupied bucket
    (0 until 4).foreach { i =>
      t.append((1L to 10L).map(k => (i * 100L + k, s"v$i-$k"))
        .toDF("id", "v"))
    }
    val before = state(t)
    val files0 = t.basePressure.files
    assert(files0 >= 4)
    // gate: not enough active files → untouched
    assert(t.mergeAdjacentFiles(spark, targetBytes = 1L << 20,
      minActiveDataFiles = files0 + 1).isEmpty)
    assert(t.basePressure.files == files0)
    // budget of 2 source files → exactly one 2-file group merges
    val ran = t.mergeAdjacentFiles(spark, targetBytes = 1L << 20,
      maxCompactedFiles = 2)
    assert(ran.size == 1)
    assert(t.basePressure.files == files0 - 1)
    // unbounded run collapses each bucket's small files to one
    t.mergeAdjacentFiles(spark, targetBytes = 1L << 20)
    assert(t.basePressure.files == t.basePressure.occupiedBuckets)
    assert(state(t) == before)
    // at-target files are never rewritten: tiny target → nothing merges
    assert(t.mergeAdjacentFiles(spark, targetBytes = 1L).isEmpty)
    // data-identical commits: the whole run is maintenance
    val m = t.readManifest(t.currentVersion.get)
    assert(m.sameData)
  }

  test("mergeAdjacentFiles is layer-safe: layers survive, folded state " +
      "and point lookups unchanged") {
    val t = new GraftTable(tmp(), Seq("id"), nBuckets = 2,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.append((21L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    // delta layer on top: upsert + delete
    t.merge(batch((1L, "u1", "U", 10L), (2L, "", "D", 10L)))
    val layers0 = t.layerPressure.layers
    assert(layers0 == 1)
    val before = state(t)
    val ran = t.mergeAdjacentFiles(spark, targetBytes = 1L << 20)
    assert(ran.nonEmpty)
    // layers untouched — no forced collapse (unlike compact)
    assert(t.layerPressure.layers == layers0)
    assert(state(t) == before)
    assert(t.lookup(spark, Seq(1L)).as[(Long, String)].collect().toSeq ==
      Seq((1L, "u1")))
    assert(t.lookup(spark, Seq(2L)).isEmpty)
  }

  test("layerPressure: bytes grow with layers; delete fraction counts " +
      "delete rows over touched-bucket base rows") {
    val t = new GraftTable(tmp(), Seq("id"), nBuckets = 1,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(t.layerPressure == GraftTable.LayerPressure(0, 0L, 0.0))
    // all-upsert layer: no dead base rows → fraction 0
    t.merge(batch((1L, "u1", "U", 10L)))
    val p1 = t.layerPressure
    assert(p1.layers == 1 && p1.bytes > 0L && p1.deleteFraction == 0.0)
    // 50 deletes over a 100-row bucket → fraction ≈ 0.5
    t.merge(batch((1L to 50L).map(i => (i, "", "D", 20L)): _*))
    val p2 = t.layerPressure
    assert(p2.layers == 2 && p2.bytes > p1.bytes)
    assert(math.abs(p2.deleteFraction - 0.5) < 0.01)
  }

  test("policy: deleteThreshold and minLayerBytes trigger collapse; " +
      "untriggered layers stay") {
    def morSink(policy: MaintenancePolicy) =
      new CurrentStateSink(tmp(), _ => Seq("id"), nBuckets = 1,
        maintenance = policy, mergeOnRead = true,
        morMinAffectedBytes = 0L)
    def seed(s: CurrentStateSink) =
      s.tableFor("t").overwrite(
        (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    def ev(rows: (Long, String, String, Long)*) =
      rows.toDF("id", "v", "_op", "_commit_lsn")
        .withColumn("_tx_ordinal", lit(0L))

    // (a) big minLayerBytes + high threshold: layers survive maintenance
    val s1 = morSink(MaintenancePolicy(everyBatches = 1,
      minLayerBytes = 1L << 30, deleteThreshold = 0.9))
    seed(s1)
    s1.writeEvents("t", ev((1L, "u1", "U", 10L)))
    assert(s1.tableFor("t").layerPressure.layers == 1,
      "untriggered layers must survive the maintenance turn")

    // (b) default policy (minLayerBytes = 0): any layers collapse
    val s2 = morSink(MaintenancePolicy(everyBatches = 1))
    seed(s2)
    s2.writeEvents("t", ev((1L, "u1", "U", 10L)))
    assert(s2.tableFor("t").layerPressure.layers == 0)

    // (c) deleteThreshold crossing forces collapse though bytes don't
    val s3 = morSink(MaintenancePolicy(everyBatches = 1,
      minLayerBytes = 1L << 30, deleteThreshold = 0.4))
    seed(s3)
    s3.writeEvents("t", ev((1L to 50L).map(i => (i, "", "D", 10L)): _*))
    val t3 = s3.tableFor("t")
    assert(t3.layerPressure.layers == 0,
      "crossing deleteThreshold must collapse")
    assert(t3.read(spark).count() == 50L)
  }

  test("policy: auto-rebucket doubles the bucket count past " +
      "rebucketAboveBytes; state converges") {
    val root = tmp()
    val s = new CurrentStateSink(root, _ => Seq("id"), nBuckets = 2,
      maintenance = MaintenancePolicy(everyBatches = 1,
        rebucketAboveBytes = 1L)) // any occupied bucket trips it
    val ev = (1L to 200L).map(i => (i, s"v$i", "I", 1L))
      .toDF("id", "v", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))
    s.writeEvents("t", ev)
    val t = s.tableFor("t")
    assert(t.currentNBuckets == 4, "one maintenance turn doubles buckets")
    assert(t.read(spark).count() == 200L)
    // follow-up merge hashes with the evolved count — state stays right
    s.writeEvents("t", Seq((1L, "u1", "U", 2L))
      .toDF("id", "v", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L)))
    assert(t.lookup(spark, Seq(1L)).as[(Long, String)].collect().toSeq ==
      Seq((1L, "u1")))
  }

  test("maintenanceSweep: at most maxTablesPerRun tables per call, " +
      "round-robin across calls; foreign lease skips without losing turn") {
    val root = tmp()
    val s = new CurrentStateSink(root, _ => Seq("id"), nBuckets = 1,
      maintenance = MaintenancePolicy(everyBatches = 0, // timer off:
        maxTablesPerRun = 2))                           // external only
    val names = Seq("a", "b", "c")
    names.foreach { n =>
      s.tableFor(n).overwrite(Seq((1L, "x")).toDF("id", "v"))
    }
    val first = s.maintenanceSweep(spark)
    assert(first == Seq("a", "b"))
    val second = s.maintenanceSweep(spark)
    assert(second == Seq("c", "a"), "cursor must resume past tables run")
    // "b" is next in line — a foreign lease skips it without consuming
    // its turn (the cursor only advances past tables actually run)
    val tb = s.tableFor("b")
    assert(tb.tryAcquireMaintenanceLease("foreign", ttlMs = 60000L))
    val third = s.maintenanceSweep(spark)
    assert(third == Seq("c", "a"), "leased table skipped, budget intact")
    tb.releaseMaintenanceLease("foreign")
    assert(s.maintenanceSweep(spark).head == "b",
      "a skipped table keeps its sweep turn")
  }

  test("policy: minIntervalMs spaces per-table runs") {
    val s = new CurrentStateSink(tmp(), _ => Seq("id"), nBuckets = 1,
      maintenance = MaintenancePolicy(everyBatches = 1,
        minIntervalMs = 3600L * 1000L),
      mergeOnRead = true, morMinAffectedBytes = 0L)
    val t = s.tableFor("t")
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    def ev(lsn: Long, v: String) = Seq((1L, v, "U", lsn))
      .toDF("id", "v", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))
    // first turn runs (nothing recorded yet): default policy collapses
    s.writeEvents("t", ev(1L, "a"))
    assert(t.layerPressure.layers == 0, "first maintenance turn runs")
    // second turn is inside the interval: the fresh layer survives
    s.writeEvents("t", ev(2L, "b"))
    assert(t.layerPressure.layers == 1,
      "maintenance must not run again inside minIntervalMs")
  }
}
