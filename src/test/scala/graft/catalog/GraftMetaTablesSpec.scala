package graft.catalog

import graft.SparkSpec
import graft.sinks.GraftTable
import org.apache.spark.sql.functions._

/** Metadata tables: manifest observability from SQL — snapshots /
  * files / layers, all driver-side manifest reads (no data scan). */
class GraftMetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-meta").toString
    spark.conf.set("spark.sql.catalog.mc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mc.root", r)
    r
  }

  test("snapshots / files expose retained versions and the live file " +
      "inventory; layers shows the MoR chain; vacuum shrinks snapshots") {
    spark.sql("CREATE NAMESPACE mc.db")
    spark.sql("""CREATE TABLE mc.db.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(2, id))""")
    spark.sql("INSERT INTO mc.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO mc.db.t VALUES (3, 'c')")

    val snaps = spark.sql(
      "SELECT version, files, layers, same_data FROM mc.db.t.snapshots " +
      "ORDER BY version")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(snaps.map(_._1) == Seq(1L, 2L), "retained versions only")
    assert(snaps.forall(s => s._3 == 0 && !s._4))
    assert(snaps.last._2 > snaps.head._2, "second append added files")
    // committed_at populated and non-decreasing
    val ts = spark.sql(
      "SELECT unix_millis(committed_at) FROM mc.db.t.snapshots " +
      "ORDER BY version").as[Long].collect()
    assert(ts.forall(_ > 0L) && ts.sorted.sameElements(ts))

    val files = spark.sql(
      "SELECT bucket, kind, bytes FROM mc.db.t.files")
      .as[(Int, String, Long)].collect().toSeq
    assert(files.nonEmpty && files.forall(f =>
      f._2 == "base" && f._3 > 0L))
    assert(files.map(_._1).toSet.subsetOf(Set(0, 1)))

    // a MoR table surfaces its layer chain in files + layers
    val dir = s"$root/db/m"
    val t = new GraftTable(dir, Seq("id"), nBuckets = 2,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.merge(Seq((1L, "u1", "U"), (2L, "", "D"))
      .toDF("id", "v", "_op").withColumn("_seq", lit("01")))
    val kinds = spark.sql("SELECT kind FROM mc.db.m.files")
      .as[String].collect().toSet
    assert(kinds == Set("base", "layer-upsert", "layer-delete"))
    val layers = spark.sql(
      "SELECT version, upsert_files, delete_files FROM mc.db.m.layers")
      .as[(Long, Int, Int)].collect().toSeq
    assert(layers.size == 1 && layers.head._2 >= 1 && layers.head._3 >= 1)

    // partitions: per-bucket footprint, base vs layer split
    val parts = spark.sql(
      "SELECT bucket, files, bytes, layer_files, layer_bytes " +
      "FROM mc.db.m.partitions ORDER BY bucket")
      .as[(Int, Int, Long, Int, Long)].collect().toSeq
    assert(parts.map(_._1) == Seq(0, 1))
    assert(parts.forall(p => p._2 >= 1 && p._3 > 0L))
    assert(parts.map(_._4).sum >= 2 && parts.map(_._5).sum > 0L,
      "layer files must attribute to their buckets")

    // vacuum: snapshots reflects expiry; a real table named like a meta
    // view still resolves as data (existence wins over the meta suffix)
    GraftTable.open(s"$root/db/t").vacuum(1)
    assert(spark.sql("SELECT * FROM mc.db.t.snapshots").count() == 1L)
    spark.sql("""CREATE TABLE mc.db.snapshots (id BIGINT, x STRING)
                 PARTITIONED BY (bucket(2, id))""")
    spark.sql("INSERT INTO mc.db.snapshots VALUES (7, 'y')")
    assert(spark.sql("SELECT id, x FROM mc.db.snapshots")
      .as[(Long, String)].collect().toSeq == Seq((7L, "y")))
    // unknown meta suffix on a real table refuses cleanly
    intercept[Exception] {
      spark.sql("SELECT * FROM mc.db.t.nope").collect() }
  }
}
