package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** External-engine sink contract (reference destination/base.rs:27-213
  * delivery semantics, ducklake replay_epoch.rs cursor rotation), proven
  * against a genuinely external SQL engine: embedded Derby executes the
  * INSERT / MERGE / DELETE statements, holds the replay cursor, and
  * survives an engine shutdown + reboot with both intact. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  /** Engine-dialect matrix: embedded Derby for real-engine execution,
    * plus the PostgreSQL-emulating shim at two reported versions —
    * 16 (standard MERGE passes through; PG-only column DDL transpiled
    * and executed, Derby-only forms REFUSED like a real server) and
    * 14 (exercises the pre-MERGE `INSERT … ON CONFLICT` +
    * `DELETE … USING` arm end-to-end through the shim's transpiler). */
  private val kinds = Seq("derby", "pg16", "pg14")

  private def freshDb(kind: String): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("jdbcsink").toString
    val prefix = kind match {
      case "derby" => "jdbc:derby:"
      case "pg16" => PgEmulatingJdbc.register(); PgEmulatingJdbc.Prefix
      case "pg14" => PgEmulatingJdbc.register(); PgEmulatingJdbc.Prefix14
    }
    (dir, s"$prefix$dir/db;create=true")
  }

  private def ev(rows: (Long, Double, String, Long)*) =
    rows.toDF("key", "val", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))

  kinds.foreach { kind =>

  test(s"[$kind] backfill + MERGE apply + replay converge to LWW state") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))
      .toDF("key", "val"))

    val b1 = ev((1L, 10.0, "U", 5L), (2L, 0.0, "D", 6L), (4L, 4.0, "U", 7L))
    val b2 = ev((4L, 44.0, "U", 8L), (5L, 5.0, "U", 9L), (9L, 0.0, "D", 10L))
    sink.writeEvents("state", b1)
    val hwAfterB1 = sink.highWater("state")
    assert(hwAfterB1.nonEmpty)
    sink.writeEvents("state", b2)
    sink.writeEvents("state", b1) // replay: engine cursor must no-op it
    assert(sink.highWater("state") > hwAfterB1)

    val got = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double)].collect().toSeq
    // 1 updated, 2 deleted, 3 untouched, 4 LWW-updated twice, 5 inserted,
    // 9 delete-of-absent no-op
    assert(got == Seq((1L, 10.0), (3L, 3.0), (4L, 44.0), (5L, 5.0)))
  }

  test(s"[$kind] partial stage from a crashed attempt cannot double-apply") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0)).toDF("key", "val"))
    sink.writeEvents("state", ev((2L, 2.0, "U", 5L))) // creates the stage
    // simulate a crash AFTER staging, BEFORE merge: rows sit in the
    // stage, the offsets row still points before them
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """INSERT INTO "state__stage" VALUES (99, 99.0, 'U', 'zzzz', '')""")
    finally conn.close()
    // the retry clears the stage before re-staging: the orphan must die
    sink.writeEvents("state", ev((3L, 3.0, "U", 6L)))
    val got = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test(s"[$kind] engine shutdown + reboot keeps state and replay cursor") {
    val (dir, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0)).toDF("key", "val"))
    sink.writeEvents("state", ev((1L, 11.0, "U", 5L)))
    val hw = sink.highWater("state")
    // clean engine shutdown (Derby signals success via SQLState 08006)
    try DriverManager.getConnection(s"jdbc:derby:$dir/db;shutdown=true")
    catch { case e: java.sql.SQLException => assert(e.getSQLState == "08006") }
    // reboot: a new sink over the rebooted engine sees durable state
    val sink2 = new JdbcSink(url, _ => Seq("key"))
    assert(sink2.highWater("state") == hw)
    sink2.writeEvents("state", ev((1L, 11.0, "U", 5L))) // replay → no-op
    assert(sink2.highWater("state") == hw)
    val got = sink2.read(spark, "state").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 11.0)))
  }

  test(s"[$kind] truncate rotates the replay cursor with the data") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    val batch = ev((1L, 1.0, "U", 5L))
    sink.writeEvents("state", batch)
    assert(sink.highWater("state").nonEmpty)
    sink.truncateTable("state")
    assert(sink.highWater("state").isEmpty)
    // post-truncate redelivery of the same sequences must apply again
    sink.writeEvents("state", batch)
    val got = sink.read(spark, "state").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0)))
  }

  test(s"[$kind] TOAST-masked update keeps engine-stored values for masked columns") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state",
      Seq((1L, 1.0, "big"), (2L, 2.0, "toast")).toDF("key", "val", "blob"))
    val events = Seq(
      (1L, 10.0, null.asInstanceOf[String], "U", 5L, "blob"),
      (2L, 20.0, "fresh", "U", 6L, null.asInstanceOf[String]))
      .toDF("key", "val", "blob", "_op", "_commit_lsn", "_missing")
      .withColumn("_tx_ordinal", lit(0L))
    sink.writeEvents("state", events, maskHint = Some(true))
    val got = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double, String)].collect().toSeq
    // key 1: blob masked → engine keeps "big"; key 2: full update
    assert(got == Seq((1L, 10.0, "big"), (2L, 20.0, "fresh")))
  }

  test(s"[$kind] mid-stream ADD COLUMN: widen-only ALTER inside the batch " +
      "transaction, pre-DDL rows read NULL") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0), (2L, 2.0)).toDF("key", "val"))
    sink.writeEvents("state", ev((2L, 20.0, "U", 5L), (3L, 3.0, "U", 6L)))
    // post-DDL slice: the pipeline splits batches at schema-version
    // boundaries, so the new column arrives as a wider frame
    val wide = Seq((3L, 30.0, "active", "U", 7L), (4L, 4.0, "new", "U", 8L))
      .toDF("key", "val", "status", "_op", "_commit_lsn")
      .withColumn("_tx_ordinal", lit(0L))
    sink.writeEvents("state", wide)
    val got = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double, Option[String])].collect().toSeq
    // pre-DDL rows keep NULL in the added column; post-DDL rows carry it
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, None),
      (3L, 30.0, Some("active")), (4L, 4.0, Some("new"))))
    // a NARROWER slice after the DDL must not drop the column (widen-
    // only): the old-shape MERGE never sets `status`, so the engine-
    // stored value persists through the update
    sink.writeEvents("state", ev((3L, 33.0, "U", 9L)))
    val got2 = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double, Option[String])].collect().toSeq
    assert(got2 == Seq((1L, 1.0, None), (2L, 20.0, None),
      (3L, 33.0, Some("active")), (4L, 4.0, Some("new"))))
    // replaying the pre-DDL batch after evolution stays a no-op
    sink.writeEvents("state", ev((2L, 20.0, "U", 5L), (3L, 3.0, "U", 6L)))
    assert(sink.read(spark, "state").orderBy("key")
      .as[(Long, Double, Option[String])].collect().toSeq == got2)
  }

  test(s"[$kind] partitioned JDBC read-back returns the full row set") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state",
      (1L to 100L).map(k => (k, k * 1.5)).toDF("key", "val"))
    val one = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double)].collect().toSeq
    val par = sink.read(spark, "state", Some("key"), partitions = 4)
    assert(par.rdd.getNumPartitions == 4)
    assert(par.orderBy("key").as[(Long, Double)].collect().toSeq == one)
    assert(one.size == 100)
  }

  test(s"[$kind] backoff policy: transient SQLStates retry with exponential " +
      "delay, non-transient fail fast (reference retry.rs:12-25)") {
    import JdbcSink.{Backoff, isTransient, withBackoffRetry}
    // classification: class-40 (deadlock/serialization/lock timeout),
    // class-08 (connection), SQLTransientException, wrapped causes
    assert(isTransient(new java.sql.SQLException("deadlock", "40001")))
    assert(isTransient(new java.sql.SQLException("derby lock", "40XL1")))
    assert(isTransient(new java.sql.SQLException("conn reset", "08006")))
    assert(isTransient(new RuntimeException("wrap",
      new java.sql.SQLTransientConnectionException("x"))))
    assert(!isTransient(new java.sql.SQLException("syntax", "42X01")))
    assert(!isTransient(new java.sql.SQLIntegrityConstraintViolationException(
      "dup", "23505")))
    // converges after transient failures, with growing capped delays
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = withBackoffRetry(Backoff(maxRetries = 4,
        initialDelayMs = 100, maxDelayMs = 350), delays += _) {
      calls += 1
      if (calls <= 3) throw new java.sql.SQLException("deadlock", "40001")
      "ok"
    }
    assert(out == "ok" && calls == 4)
    assert(delays.toSeq == Seq(100L, 200L, 350L), s"got $delays")
    // exhausted retries rethrow the transient error
    intercept[java.sql.SQLException] {
      withBackoffRetry(Backoff(maxRetries = 2, initialDelayMs = 1), _ => ())(
        throw new java.sql.SQLException("deadlock", "40001"))
    }
    // non-transient: no retry at all
    var once = 0
    intercept[java.sql.SQLException] {
      withBackoffRetry(Backoff(), _ => fail("must not sleep")) {
        once += 1; throw new java.sql.SQLException("syntax", "42X01")
      }
    }
    assert(once == 1)
  }

  test(s"[$kind] a lock-timeout on the engine transaction retries with backoff " +
      "and converges once the rival releases") {
    val (dir, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"),
      backoff = JdbcSink.Backoff(maxRetries = 6, initialDelayMs = 200,
        maxDelayMs = 1000))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0)).toDF("key", "val"))
    // per-DATABASE lock timeout (not engine-wide): the merge must hit
    // 40XL1 fast instead of Derby's 60 s default
    val admin = DriverManager.getConnection(url)
    try admin.createStatement().execute(
      "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(" +
        "'derby.locks.waitTimeout', '1')")
    finally admin.close()
    // a rival transaction holds the target table exclusively, then
    // releases while the sink is mid-backoff
    val rival = DriverManager.getConnection(url)
    rival.setAutoCommit(false)
    rival.createStatement().execute("LOCK TABLE \"state\" IN EXCLUSIVE MODE")
    val releaser = new Thread(() => {
      Thread.sleep(2500); rival.commit(); rival.close()
    })
    releaser.setDaemon(true); releaser.start()
    // without the backoff this throws 40XL1 out of writeEvents
    sink.writeEvents("state", ev((1L, 10.0, "U", 5L)))
    releaser.join(5000)
    val got = sink.read(spark, "state").orderBy("key")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 10.0)),
      s"the retried engine transaction must have applied: $got")
    val _ = dir
  }

  test(s"[$kind] composite keys merge on the full key") {
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("k1", "k2"))
    sink.startup(spark)
    sink.writeTableRows("state",
      Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "val"))
    sink.writeEvents("state",
      Seq((1L, "a", 10.0, "U", 5L), (1L, "b", 0.0, "D", 6L),
        (2L, "a", 3.0, "U", 7L))
        .toDF("k1", "k2", "val", "_op", "_commit_lsn")
        .withColumn("_tx_ordinal", lit(0L)))
    val got = sink.read(spark, "state").orderBy("k1", "k2")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "a", 3.0)))
  }

  test(s"[$kind] applySchemaDiff: RENAME keeps the logical column " +
      "aligned (pre-rename rows readable under the NEW name — the old " +
      "name-keyed widen forked the column instead), DROP retires, ADD " +
      "lands with its portable default; one engine transaction; " +
      "idempotent under Relation-record replay") {
    import graft.core.{ColumnSpec, SchemaDiff, TableSchemaV}
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state",
      Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("key", "val", "note"))
    def cs(n: String, t: String, ord: Int, pk: Int = 0,
        default: Option[String] = None) =
      ColumnSpec(n, t, nullable = pk == 0, pkOrdinal = pk, ordinal = ord,
        default = default)
    val v1 = TableSchemaV(7L, "state", 10L, IndexedSeq(
      cs("key", "int8", 1, pk = 1), cs("val", "float8", 2),
      cs("note", "text", 3)))
    // DDL: RENAME val→amount (same attnum), DROP note, ADD status
    // (new attnum) with a portable default
    val v2 = TableSchemaV(7L, "state", 20L, IndexedSeq(
      cs("key", "int8", 1, pk = 1), cs("amount", "float8", 2),
      cs("status", "text", 4, default = Some("'new'"))))
    val diff = SchemaDiff.between(v1, v2)
    assert(diff.renames == Seq(("val", "amount")))
    sink.applySchemaDiff("state", diff)
    // post-DDL slice merges under the NEW names
    sink.writeEvents("state",
      Seq((2L, 20.0, "upd", "U", 5L))
        .toDF("key", "amount", "status", "_op", "_commit_lsn")
        .withColumn("_tx_ordinal", lit(0L)))
    val got = sink.read(spark, "state").orderBy("key")
      .select("key", "amount", "status")
      .as[(Long, Double, Option[String])].collect().toSeq
    // key 1's PRE-rename value 1.0 reads under `amount` — the add+drop
    // fork would have left it stranded under a dead `val` column
    assert(got == Seq((1L, 1.0, None), (2L, 20.0, Some("upd"))), got)
    assert(!sink.read(spark, "state").columns.contains("val"))
    assert(!sink.read(spark, "state").columns.contains("note"))
    // ADD COLUMN's default is live in the engine: an insert that omits
    // `status` fills 'new'
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """INSERT INTO "state" ("key", "amount", "_gseq") """ +
          "VALUES (9, 9.0, 'zz')")
      val rs = conn.createStatement().executeQuery(
        """SELECT "status" FROM "state" WHERE "key" = 9""")
      assert(rs.next() && rs.getString(1) == "new")
    } finally conn.close()
    // replayed Relation record → identical diff re-applied → no-op
    sink.applySchemaDiff("state", diff)
    assert(sink.read(spark, "state").orderBy("key")
      .select("key", "amount", "status")
      .as[(Long, Double, Option[String])].collect().toSeq ==
      got :+ ((9L, 9.0, Some("new"))))
  }

  test(s"[$kind] applySchemaDiff: nullability relax (NOT NULL → NULL) " +
      "executes at the engine; a non-portable source default CLEARS " +
      "the destination default instead of mis-evaluating it") {
    import graft.core.{ColumnSpec, SchemaDiff, TableSchemaV}
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    // hand-built target with a NOT NULL payload column + a default
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      """CREATE TABLE "state" ("key" BIGINT NOT NULL, """ +
        """"v" INTEGER NOT NULL DEFAULT 5, """ +
        """"_gseq" VARCHAR(64) NOT NULL, PRIMARY KEY ("key"))""")
    finally conn.close()
    def cs(n: String, t: String, ord: Int, pk: Int = 0,
        nullable: Boolean = true, default: Option[String] = None) =
      ColumnSpec(n, t, nullable = nullable, pkOrdinal = pk,
        ordinal = ord, default = default)
    val v1 = TableSchemaV(7L, "state", 10L, IndexedSeq(
      cs("key", "int8", 1, pk = 1, nullable = false),
      cs("v", "int4", 2, nullable = false, default = Some("5"))))
    val v2 = TableSchemaV(7L, "state", 20L, IndexedSeq(
      cs("key", "int8", 1, pk = 1, nullable = false),
      // relaxed + the default became non-portable (source-evaluated)
      cs("v", "int4", 2, default = Some("nextval('s'::regclass)"))))
    sink.applySchemaDiff("state", SchemaDiff.between(v1, v2))
    val c2 = DriverManager.getConnection(url)
    try {
      // NULL now accepted (the relax executed)…
      c2.createStatement().executeUpdate(
        """INSERT INTO "state" ("key", "v", "_gseq") """ +
          "VALUES (1, NULL, 'a')")
      // …and the old default is GONE (cleared, not re-pointed at an
      // expression this engine would evaluate differently)
      c2.createStatement().executeUpdate(
        """INSERT INTO "state" ("key", "_gseq") VALUES (2, 'b')""")
      val rs = c2.createStatement().executeQuery(
        """SELECT "v" FROM "state" WHERE "key" = 2""")
      assert(rs.next() && { rs.getInt(1); rs.wasNull() },
        "non-portable default must clear, not keep filling 5")
    } finally c2.close()
  }

  test(s"[$kind] a niladic datetime default (now() → CURRENT_TIMESTAMP) " +
      "survives the portability cut and EXECUTES at the engine — an " +
      "engine-side insert that omits the column gets the engine clock") {
    import graft.core.{ColumnSpec, SchemaDiff, TableSchemaV}
    val (_, url) = freshDb(kind)
    val sink = new JdbcSink(url, _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Seq((1L, 1.0)).toDF("key", "val"))
    def cs(n: String, t: String, ord: Int, pk: Int = 0,
        default: Option[String] = None) =
      ColumnSpec(n, t, nullable = pk == 0, pkOrdinal = pk, ordinal = ord,
        default = default)
    val v1 = TableSchemaV(7L, "state", 10L, IndexedSeq(
      cs("key", "int8", 1, pk = 1), cs("val", "float8", 2)))
    // the source spells it now(); the portable form both engines accept
    // is the SQL-standard keyword
    val v2 = TableSchemaV(7L, "state", 20L, IndexedSeq(
      cs("key", "int8", 1, pk = 1), cs("val", "float8", 2),
      cs("seen", "timestamp", 3, default = Some("now()"))))
    sink.applySchemaDiff("state", SchemaDiff.between(v1, v2))
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """INSERT INTO "state" ("key", "val", "_gseq") """ +
          "VALUES (2, 2.0, 'a')")
      val rs = conn.createStatement().executeQuery(
        """SELECT "seen" FROM "state" WHERE "key" = 2""")
      assert(rs.next() && rs.getTimestamp(1) != null,
        "CURRENT_TIMESTAMP default must fill at the engine")
    } finally conn.close()
  }
  }

  test("dialect arm selection: PostgreSQL <15 takes the ON-CONFLICT " +
      "pair, PostgreSQL 15+ and Derby take standard MERGE; PG type " +
      "spellings differ where they must") {
    import JdbcSink.{DerbyDialect, PostgresDialect}
    val sink = new JdbcSink("jdbc:derby:memory:armsel;create=true",
      _ => Seq("k"))
    val pair = sink.applyGroupSql(PostgresDialect(14), "t", Seq("k"),
      Seq("v"), "")
    assert(pair.size == 2, pair)
    assert(pair(0).contains("DELETE FROM \"t\" USING \"t__stage\""))
    assert(pair(1).contains("ON CONFLICT (\"k\") DO UPDATE SET"))
    assert(pair(1).contains("EXCLUDED.\"_gseq\" > \"t\".\"_gseq\""))
    Seq(PostgresDialect(15), PostgresDialect(16)).foreach { d =>
      val one = sink.applyGroupSql(d, "t", Seq("k"), Seq("v"), "")
      assert(one.size == 1 && one.head.contains("MERGE INTO"), one)
    }
    assert(sink.applyGroupSql(DerbyDialect, "t", Seq("k"), Seq("v"), "")
      .head.contains("MERGE INTO"))
    import org.apache.spark.sql.types._
    assert(PostgresDialect(16).typeSql(BinaryType) == "BYTEA")
    assert(PostgresDialect(16).typeSql(DoubleType) == "DOUBLE PRECISION")
    assert(PostgresDialect(16).typeSql(StringType) == "TEXT")
    assert(DerbyDialect.typeSql(BinaryType) == "BLOB")
    // portable defaults: literals (with cast suffix stripped) and the
    // niladic datetime keywords pass (normalized to the standard
    // spelling Derby also accepts); source-evaluated expressions do not
    assert(JdbcSink.portableDefault("42").contains("42"))
    assert(JdbcSink.portableDefault("'x'::text").contains("'x'"))
    assert(JdbcSink.portableDefault("TRUE").contains("TRUE"))
    assert(JdbcSink.portableDefault("now()").contains("CURRENT_TIMESTAMP"))
    assert(JdbcSink.portableDefault("CURRENT_TIMESTAMP")
      .contains("CURRENT_TIMESTAMP"))
    assert(JdbcSink.portableDefault("current_date").contains("CURRENT_DATE"))
    assert(JdbcSink.portableDefault("nextval('s'::regclass)").isEmpty)
    assert(JdbcSink.portableDefault("upper('x')").isEmpty)
  }
}
