package graft.catalog

import graft.SparkSpec
import graft.sinks.GraftTable
import org.apache.spark.sql.functions._

/** SQL-invocable maintenance: DSv2 stored procedures (the Iceberg
  * `CALL catalog.system.*` shape) — each takes the maintenance lease,
  * so a CALL beside a live pipeline serializes like an external
  * maintenance run. */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.pc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pc.root", r)
    r
  }

  test("CALL compact / merge_adjacent_files / vacuum: maintenance from " +
      "SQL, data-identical, defaults applied") {
    spark.sql("CREATE NAMESPACE pc.db")
    spark.sql("""CREATE TABLE pc.db.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(2, id))""")
    (1 to 6).foreach { i =>
      spark.sql(s"INSERT INTO pc.db.t VALUES ($i, 'v$i')")
    }
    val t = GraftTable.open(s"$root/db/t")
    val before = spark.sql("SELECT * FROM pc.db.t")
      .as[(Long, String)].collect().toSet
    assert(t.basePressure.files > 2)

    // bounded adjacent merge via CALL (named args, defaults for the rest)
    val m = spark.sql(
      s"CALL pc.system.merge_adjacent_files(`table` => 'db.t', " +
        "target_bytes => 1048576)").collect()(0)
    assert(m.getBoolean(0), "lease must be acquired")
    assert(m.getInt(1) >= 1)
    assert(t.basePressure.files == t.basePressure.occupiedBuckets)

    // compact with the default max_files: nothing crowded now → 0
    val c = spark.sql("CALL pc.system.compact('db.t')").collect()(0)
    assert(c.getBoolean(0) && c.getInt(1) == 0)

    val v = spark.sql("CALL pc.system.vacuum('db.t', 1)").collect()(0)
    assert(v.getBoolean(0) && v.getInt(1) == 1)
    assert(t.versions.size == 1)
    assert(spark.sql("SELECT * FROM pc.db.t")
      .as[(Long, String)].collect().toSet == before)
  }

  test("CALL collapse_layers + rebucket; a held lease returns " +
      "acquired=false and does nothing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pc.db2")
    val dir = s"$root/db2/m"
    val t = new GraftTable(dir, Seq("id"), nBuckets = 2,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.merge(Seq((1L, "u1", "U"))
      .toDF("id", "v", "_op").withColumn("_seq", lit("01")))
    assert(t.layerPressure.layers == 1)

    // foreign lease: the CALL must skip, layers stay
    assert(t.tryAcquireMaintenanceLease("foreign", ttlMs = 60000L))
    val skipped = spark.sql("CALL pc.system.collapse_layers('db2.m')")
      .collect()(0)
    assert(!skipped.getBoolean(0) && t.layerPressure.layers == 1)
    t.releaseMaintenanceLease("foreign")

    val ran = spark.sql("CALL pc.system.collapse_layers('db2.m')")
      .collect()(0)
    assert(ran.getBoolean(0) && ran.getInt(1) == 1)
    assert(t.layerPressure.layers == 0)

    val rb = spark.sql("CALL pc.system.rebucket('db2.m', 8)").collect()(0)
    assert(rb.getBoolean(0) && rb.getInt(1) == 8)
    assert(t.read(spark).count() == 40L)
    assert(t.lookup(spark, Seq(1L)).as[(Long, String)].collect().toSeq ==
      Seq((1L, "u1")))
  }

  test("CALL zorder clusters from SQL; SHOW PROCEDURES-style listing " +
      "via the catalog API") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pc.db3")
    spark.sql("""CREATE TABLE pc.db3.z (id BIGINT, a BIGINT, b BIGINT)
                 PARTITIONED BY (bucket(2, id))""")
    spark.sql("""INSERT INTO pc.db3.z
                 SELECT id, id % 100, id DIV 100 FROM range(1000)""")
    val before = spark.sql("SELECT sum(a), sum(b) FROM pc.db3.z")
      .as[(Long, Long)].head()
    val z = spark.sql("CALL pc.system.zorder('db3.z', 'a', 'b', 2)")
      .collect()(0)
    assert(z.getBoolean(0))
    assert(spark.sql("SELECT sum(a), sum(b) FROM pc.db3.z")
      .as[(Long, Long)].head() == before)

    val cat = spark.sessionState.catalogManager.catalog("pc")
      .asInstanceOf[GraftCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name()).toSet ==
      GraftProcedures.names.toSet)
    intercept[Exception] {
      cat.loadProcedure(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("system"), "nope"))
    }
  }
}
