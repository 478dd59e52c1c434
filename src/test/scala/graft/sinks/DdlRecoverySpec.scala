package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Interrupted-DDL recovery (round-10 verdict item 5; reference
  * crates/etl-destinations/src/recovery.rs:12-33 — reconstruct enough
  * previous-schema state that an IDEMPOTENT DDL planner can re-apply a
  * crashed destination schema change): a widen + rename + add change is
  * two manifest commits on a GraftTable (name-mapping rename, then the
  * evolve). A crash between them must be repaired by re-running the
  * SAME plan — already-applied steps skip, missing steps apply, and a
  * full replay is a version-less no-op. The JDBC destination covers the
  * same contract with its live-column diff + single ALTER+MERGE+cursor
  * transaction. */
class DdlRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ddlrec").toString

  private def freshTable(): GraftTable = {
    val t = new GraftTable(tmp(), Seq("id"), nBuckets = 4)
    t.overwrite(Seq((1L, 7, "x1"), (2L, 8, "x2"), (3L, 9, "x3"))
      .toDF("id", "n", "note"))
    t
  }

  // the change under test: widen n INT -> BIGINT, rename note -> comment,
  // add flag BOOLEAN
  private val target = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("n", LongType),
    StructField("comment", StringType),
    StructField("flag", BooleanType)))
  private val renames = Map("note" -> "comment")

  private def assertConverged(t: GraftTable): Unit = {
    val s = t.currentSchema.get
    assert(s.fieldNames.toSeq == Seq("id", "n", "comment", "flag"),
      s"schema not converged: ${s.toDDL}")
    assert(s("n").dataType == LongType, "widen lost")
    // renamed column still reads the old files' values through the
    // name mapping; the added column reads null
    val rows = t.read(spark).select("id", "n", "comment", "flag")
      .as[(Long, Long, String, Option[Boolean])].collect().toSet
    assert(rows == Set((1L, 7L, "x1", None), (2L, 8L, "x2", None),
      (3L, 9L, "x3", None)), s"data not converged: $rows")
  }

  test("applyDdlPlan from scratch, replayed, and from every crash point " +
      "converges to the same schema and data") {
    // clean run + full replay (idempotent: no new version)
    val a = freshTable()
    a.applyDdlPlan(target, renames)
    assertConverged(a)
    val v = a.currentVersion.get
    a.applyDdlPlan(target, renames)
    assert(a.currentVersion.get == v, "a replayed plan must not commit")
    assertConverged(a)

    // crash AFTER the rename commit, BEFORE the evolve (the window the
    // round-10 verdict named): the recovery replay skips the rename and
    // applies the evolve
    val b = freshTable()
    b.renameColumn("note", "comment") // the half the crashed run applied
    b.applyDdlPlan(target, renames)
    assertConverged(b)

    // crash BEFORE anything committed: plain re-run
    val c = freshTable()
    c.applyDdlPlan(target, renames)
    assertConverged(c)
  }

  test("applyDdlPlan refuses ambiguous/unresolvable renames and key " +
      "mutations instead of guessing") {
    val t = freshTable()
    // both old and new name exist -> ambiguous
    t.evolveSchema(s => s.add(StructField("comment", StringType)))
    intercept[IllegalStateException] { t.applyDdlPlan(target, renames) }
    val t2 = freshTable()
    t2.evolveSchema(s => StructType(s.fields.filterNot(_.name == "note")))
    intercept[IllegalStateException] { // neither `note` nor `comment`
      t2.applyDdlPlan(target, renames)
    }
    val t3 = freshTable()
    intercept[IllegalArgumentException] { // dropped bucket key
      t3.applyDdlPlan(StructType(Seq(StructField("n", IntegerType))))
    }
  }

  test("catalog ALTER replay over a half-applied table converges " +
      "(programmatic recovery path)") {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val root = tmp()
    spark.conf.set("spark.sql.catalog.rec",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rec.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rec.db")
    spark.sql("""CREATE TABLE rec.db.t (id BIGINT, n INT, note STRING)
                 PARTITIONED BY (bucket(4, id))""")
    Seq((1L, 7, "x1"), (2L, 8, "x2")).toDF("id", "n", "note")
      .createOrReplaceTempView("rec_src")
    spark.sql("INSERT INTO rec.db.t SELECT * FROM rec_src")
    // the crashed first run applied only the rename
    GraftTable.open(s"$root/db/t").renameColumn("note", "comment")
    // recovery re-issues the FULL original change set through the
    // catalog API (the analyzer would reject the half-applied SQL;
    // recovery drives the catalog directly, like the reference's
    // destination-internal planner)
    val cat = spark.sessionState.catalogManager.catalog("rec")
      .asInstanceOf[graft.catalog.GraftCatalog]
    cat.alterTable(Identifier.of(Array("db"), "t"),
      TableChange.renameColumn(Array("note"), "comment"),
      TableChange.updateColumnType(Array("n"), LongType),
      TableChange.addColumn(Array("flag"), BooleanType))
    val got = spark.sql("SELECT id, n, comment, flag FROM rec.db.t")
      .as[(Long, Long, String, Option[Boolean])].collect().toSet
    assert(got == Set((1L, 7L, "x1", None), (2L, 8L, "x2", None)))
    // and replaying the SAME change set once more stays a no-op
    val v = GraftTable.open(s"$root/db/t").currentVersion.get
    cat.alterTable(Identifier.of(Array("db"), "t"),
      TableChange.renameColumn(Array("note"), "comment"),
      TableChange.updateColumnType(Array("n"), LongType),
      TableChange.addColumn(Array("flag"), BooleanType))
    assert(GraftTable.open(s"$root/db/t").currentVersion.get == v)
  }

  test("JDBC destination: a widen slice replays idempotently, and a " +
      "slice whose ALTER already landed out-of-band converges (the " +
      "live-column diff is the recovery planner)") {
    val dir = Files.createTempDirectory("jdbcrec").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    def ev(rows: (Long, Double, String, Long)*) =
      rows.toDF("key", "val", "_op", "_commit_lsn")
        .withColumn("_tx_ordinal", lit(0L))
    sink.writeEvents("state", ev((1L, 1.0, "U", 1L), (2L, 2.0, "U", 1L)))
    // the widened slice (new column `extra`) — applied, then REPLAYED
    // verbatim (a restart whose checkpoint did not advance)
    def widened(lsn: Long) = Seq((1L, 10.0, "w1", "U", lsn))
      .toDF("key", "val", "extra", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))
    sink.writeEvents("state", widened(2L))
    sink.writeEvents("state", widened(2L)) // replay: cursor no-ops it
    // a SECOND widen whose ALTER already landed (simulating a crashed
    // run that committed DDL elsewhere / a recovered engine): the
    // live-column diff must skip the ADD instead of failing on a
    // duplicate column
    locally {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          """ALTER TABLE "state" ADD COLUMN "extra2" VARCHAR(32672)""")
        finally st.close()
      } finally conn.close()
    }
    val wider = Seq((2L, 20.0, "w2", "e2", "U", 3L))
      .toDF("key", "val", "extra", "extra2", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))
    sink.writeEvents("state", wider)
    val got = sink.read(spark, "state")
      .select("key", "val", "extra", "extra2")
      .as[(Long, Double, Option[String], Option[String])].collect().toSet
    assert(got == Set((1L, 10.0, Some("w1"), None),
      (2L, 20.0, Some("w2"), Some("e2"))), s"not converged: $got")
  }
}
