package graft.pipeline

import graft.SparkSpec
import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
import graft.sinks.{CurrentStateSink, GraftTable, MaintenancePolicy}
import graft.sources.CdcLogSource
import org.apache.spark.sql.DataFrame
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Maintenance-lease coordination (round-9 verdict item 7): the
  * data-plane core of the reference's external-maintenance coordination
  * (crates/etl-maintenance/src/coordination.rs — cross-instance
  * maintenance serialized through a shared store, live pipeline paused
  * around it) without the k8s parts: an expiring lease file per table,
  * the in-process MaintenancePolicy timer skipping its turn under a
  * foreign lease, the apply path pausing at its quiesce point, and an
  * external compact/vacuum loop running CONCURRENTLY with a live
  * CurrentStateSink stream with zero failed commits. */
class MaintenanceLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  /** The store matrix: every mechanics/hammer test runs against ALL
    * lease stores — the filesystem default, the JDBC (embedded Derby)
    * one (the reference's coordination/postgres.rs analog), and the
    * JDBC store under the PostgreSQL-emulating shim engine
    * ([[graft.sinks.PgEmulatingJdbc]]) that exercises the PG dialect's
    * `make_interval` expiry end-to-end and REFUSES the FRAC_SECOND
    * escape exactly as pgjdbc does. */
  private def storeKinds: Seq[(String, GraftTable => GraftTable)] = Seq(
    "fs" -> identity[GraftTable] _,
    "jdbc" -> { (t: GraftTable) =>
      val db = tmp("leasedb")
      t.maintenanceLeaseStore = new graft.sinks.JdbcLeaseStore(
        s"jdbc:derby:$db/leases;create=true", t.root)
      t
    },
    "jdbc-pg" -> { (t: GraftTable) =>
      graft.sinks.PgEmulatingJdbc.register()
      val db = tmp("leasedb-pg")
      t.maintenanceLeaseStore = new graft.sinks.JdbcLeaseStore(
        s"${graft.sinks.PgEmulatingJdbc.Prefix}$db/leases;create=true",
        t.root)
      t
    })

  storeKinds.foreach { case (kind, wire) =>
    test(s"[$kind] lease mechanics: exclusive acquire, renewal, expiry " +
        "break, release") {
      val t = wire(new GraftTable(tmp("lease"), Seq("id"), nBuckets = 2))
      assert(t.maintenanceLeaseHolder.isEmpty)
      assert(t.tryAcquireMaintenanceLease("a", ttlMs = 60000))
      assert(t.maintenanceLeaseHolder.exists(_._1 == "a"))
      // a second owner cannot take a live lease
      assert(!t.tryAcquireMaintenanceLease("b", ttlMs = 60000))
      // the holder renews (expiry moves forward)
      val exp1 = t.maintenanceLeaseHolder.get._2
      Thread.sleep(5)
      assert(t.tryAcquireMaintenanceLease("a", ttlMs = 60000))
      assert(t.maintenanceLeaseHolder.get._2 >= exp1)
      // a foreign release is a no-op; the holder's release frees it
      t.releaseMaintenanceLease("b")
      assert(t.maintenanceLeaseHolder.exists(_._1 == "a"))
      t.releaseMaintenanceLease("a")
      assert(t.maintenanceLeaseHolder.isEmpty)
      // an EXPIRED lease is broken by the next acquirer
      assert(t.tryAcquireMaintenanceLease("stale", ttlMs = 1))
      Thread.sleep(10)
      assert(t.maintenanceLeaseHolder.isEmpty, "ttl must lapse")
      assert(t.tryAcquireMaintenanceLease("c", ttlMs = 60000))
      assert(t.maintenanceLeaseHolder.exists(_._1 == "c"))
      t.releaseMaintenanceLease("c")
    }

    test(s"[$kind] a lapsed holder's renewal LOSES to the rival that " +
        "legitimately broke the lease — and never clobbers it") {
      val t = wire(new GraftTable(tmp("lease-renew"), Seq("id"),
        nBuckets = 2))
      assert(t.tryAcquireMaintenanceLease("a", ttlMs = 1))
      Thread.sleep(10) // a's lease lapses
      assert(t.tryAcquireMaintenanceLease("b", ttlMs = 60000),
        "rival must break the expired lease")
      // a still believes it holds; its renewal must fail closed
      assert(!t.tryAcquireMaintenanceLease("a", ttlMs = 60000))
      assert(t.maintenanceLeaseHolder.exists(_._1 == "b"),
        "the rival's fresh lease must survive the stale renewal")
      // and a's release must not destroy b's lease either
      t.releaseMaintenanceLease("a")
      assert(t.maintenanceLeaseHolder.exists(_._1 == "b"))
      t.releaseMaintenanceLease("b")
    }

    test(s"[$kind] acquire hammer: racing acquirers never observe two " +
        "live owners") {
      val t = wire(new GraftTable(tmp("lease-hammer"), Seq("id"),
        nBuckets = 2))
      val held = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxHeld = new java.util.concurrent.atomic.AtomicInteger(0)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      @volatile var running = true
      val threads = (0 until 6).map { i =>
        val th = new Thread(() => {
          // each contender gets its own table handle (separate-process
          // shape); the jdbc store is shared via the same db path
          val mine = new GraftTable(t.root, Seq("id"), nBuckets = 2)
          mine.maintenanceLeaseStore = t.maintenanceLeaseStore
          while (running) {
            try {
              if (mine.tryAcquireMaintenanceLease(s"w$i", ttlMs = 5000)) {
                val n = held.incrementAndGet()
                maxHeld.updateAndGet(m => math.max(m, n))
                Thread.sleep(2)
                held.decrementAndGet()
                mine.releaseMaintenanceLease(s"w$i")
              }
            } catch { case e: Throwable => errors.add(e); running = false }
            Thread.sleep(1)
          }
        }, s"lease-hammer-$i")
        th.setDaemon(true); th.start(); th
      }
      Thread.sleep(1500)
      running = false
      threads.foreach(_.join(3000))
      assert(errors.isEmpty, s"hammer raced into: ${errors.toArray.toSeq}")
      assert(maxHeld.get() == 1,
        s"mutual exclusion violated: ${maxHeld.get()} concurrent holders")
    }
  }

  // ------------- JDBC store: engine-clock liveness (round-12 verdict #1)
  private def jdbcStore(): (graft.sinks.JdbcLeaseStore, String) = {
    val db = tmp("leasedb")
    val url = s"jdbc:derby:$db/leases;create=true"
    (new graft.sinks.JdbcLeaseStore(url, "t"), url)
  }

  // --------- JDBC store: engine dialects (round-13 verdict #1) — the
  // FRAC_SECOND JDBC escape is driver-translated and pgjdbc lacks it
  // entirely; the store must pick engine-native interval arithmetic.
  test("[jdbc-pg] dialect: under a PostgreSQL-reporting engine the " +
      "store uses make_interval (works end-to-end, ms-precise); the " +
      "old FRAC_SECOND escape is RED under the same engine") {
    graft.sinks.PgEmulatingJdbc.register()
    val db = tmp("leasedb-dialect")
    val url = s"${graft.sinks.PgEmulatingJdbc.Prefix}$db/leases;create=true"

    // the pre-dialect (Derby-only) statement: refused at prepare, the
    // way pgjdbc refuses FRAC_SECOND — proving the dialect split is
    // load-bearing, not cosmetic
    val raw = java.sql.DriverManager.getConnection(url)
    try {
      val e = intercept[java.sql.SQLException] {
        raw.prepareStatement(
          "VALUES {fn TIMESTAMPADD(SQL_TSI_FRAC_SECOND, " +
            "CAST(? AS INTEGER), CURRENT_TIMESTAMP)}")
      }
      assert(e.getMessage.contains("FRAC_SECOND"))
    } finally raw.close()

    // the store itself: full acquire/renew/expire/release cycle through
    // the PG dialect (make_interval), against the real engine clock
    val store = new graft.sinks.JdbcLeaseStore(url, "t")
    assert(store.tryAcquire("a", ttlMs = 60000))
    assert(!store.tryAcquire("b", ttlMs = 60000))
    assert(store.holder.exists(_._1 == "a"))
    // engine-side expiry lands ~60 s out (double-seconds bind intact)
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT {fn TIMESTAMPDIFF(SQL_TSI_SECOND, CURRENT_TIMESTAMP, " +
          "expires_at)} FROM graft_lease WHERE name = 't'")
      assert(rs.next())
      val remain = rs.getLong(1)
      assert(remain >= 50 && remain <= 61,
        s"engine-side expiry should be ~60s out, was ${remain}s")
    } finally c.close()
    store.release("a")
    // sub-second TTLs stay sub-second (the fractional part of the
    // double survives — a whole-second floor would make this 0 ≈ forever
    // or 1 s; the lapse below proves it expires)
    assert(store.tryAcquire("quick", ttlMs = 400))
    Thread.sleep(900)
    assert(store.holder.isEmpty, "400ms lease must lapse within 900ms")
    assert(store.tryAcquire("c", ttlMs = 60000))
    store.release("c")
    store.close()
  }

  test("[jdbc] unknown-engine fallback: whole-second expiry CEILs the " +
      "TTL (a lease never expires early under a live holder)") {
    // exercised directly on Derby through the WholeSecond expression
    // shape the store emits for unrecognized engines
    val db = tmp("leasedb-ws")
    val c = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$db/leases;create=true")
    try {
      val ps = c.prepareStatement(
        "VALUES {fn TIMESTAMPDIFF(SQL_TSI_SECOND, CURRENT_TIMESTAMP, " +
          "{fn TIMESTAMPADD(SQL_TSI_SECOND, CAST(? AS INTEGER), " +
          "CURRENT_TIMESTAMP)})}")
      val ceilSec = ((1500L + 999L) / 1000L).toInt // the store's ceil
      ps.setInt(1, ceilSec)
      val rs = ps.executeQuery()
      assert(rs.next() && rs.getLong(1) >= 1L,
        "1500ms must round UP to 2s, never down to 1s")
      assert(ceilSec == 2)
    } finally c.close()
  }

  test("[jdbc] lease liveness is decided by the ENGINE clock: a live " +
      "engine-relative lease is unbreakable, an engine-expired one " +
      "breaks — no client clock enters the CAS") {
    val (store, url) = jdbcStore()
    assert(store.holder.isEmpty) // also ensures the table
    def plant(offsetSeconds: Int): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val st = c.createStatement()
        try {
          st.executeUpdate("DELETE FROM graft_lease")
          // a holder on ANOTHER HOST wrote this row; its client clock
          // is irrelevant — the expiry is engine-relative
          st.executeUpdate(
            "INSERT INTO graft_lease (name, lease_owner, expires_at) " +
              "VALUES ('t', 'remote-holder', {fn TIMESTAMPADD(" +
              s"SQL_TSI_SECOND, $offsetSeconds, CURRENT_TIMESTAMP)})")
        } finally st.close()
      } finally c.close()
    }
    // engine-live for another 60 s: a rival must NOT break it (the old
    // BIGINT client-clock CAS let a rival 60 s ahead break a live lease)
    plant(60)
    assert(!store.tryAcquire("rival", ttlMs = 60000),
      "rival broke an engine-live lease")
    assert(store.holder.exists(_._1 == "remote-holder"))
    // engine-expired 5 s ago: the break must go through
    plant(-5)
    assert(store.holder.isEmpty)
    assert(store.tryAcquire("rival", ttlMs = 60000))
    assert(store.holder.exists(_._1 == "rival"))
    // and the freshly-written expiry is itself engine-relative ≈ ttl
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT {fn TIMESTAMPDIFF(SQL_TSI_SECOND, CURRENT_TIMESTAMP, " +
          "expires_at)} FROM graft_lease WHERE name = 't'")
      assert(rs.next())
      val remain = rs.getLong(1)
      assert(remain >= 50 && remain <= 61,
        s"engine-side expiry should be ~60s out, was ${remain}s")
    } finally c.close()
    store.close()
  }

  test("[jdbc] a misconfigured lease table fails LOUD, not as " +
      "lease-never-acquirable (round-12 advice: ensureTable must not " +
      "swallow the whole 42 class)") {
    val db = tmp("leasedb-bad")
    val store = new graft.sinks.JdbcLeaseStore(
      s"jdbc:derby:$db/leases;create=true", "t",
      table = "graft lease (bad name)")
    intercept[java.sql.SQLException] {
      store.tryAcquire("a", ttlMs = 60000)
    }
    // and it keeps surfacing (tableEnsured never latched on failure)
    intercept[java.sql.SQLException] { store.holder }
    store.close()
  }

  test("[jdbc] the store caches its connection: a heartbeat hammer " +
      "does not open one per call (round-12 verdict item 6)") {
    val (store, _) = jdbcStore()
    (1 to 200).foreach { _ =>
      assert(store.tryAcquire("beat", ttlMs = 60000)) // renew path
      store.holder
    }
    store.release("beat")
    assert(store.connectionsOpened.get() <= 2,
      s"expected a cached connection, opened ${store.connectionsOpened.get()}")
    store.close()
    // usable after close: reconnects once
    assert(store.tryAcquire("post-close", ttlMs = 60000))
    store.release("post-close")
    store.close()
  }

  test("apply path pauses at the quiesce point while a foreign lease is " +
      "held and resumes on expiry") {
    val dir = tmp("lease-pause")
    val sink = new CurrentStateSink(s"$dir/tables", _ => Seq("id"), 4)
    // seed the table so the lease has something to attach to
    sink.writeEvents("users", Seq((1L, "a", "I", 1L, 0L))
      .toDF("id", "v", "_op", "_commit_lsn", "_tx_ordinal"))
    val t = new GraftTable(s"$dir/tables/users", Seq("id"), 4)
    assert(t.tryAcquireMaintenanceLease("external", ttlMs = 700))
    val t0 = System.currentTimeMillis()
    // the merge must WAIT out the foreign lease, then apply normally
    sink.writeEvents("users", Seq((1L, "b", "U", 2L, 0L))
      .toDF("id", "v", "_op", "_commit_lsn", "_tx_ordinal"))
    val waited = System.currentTimeMillis() - t0
    assert(waited >= 500, s"apply should have paused (~700ms ttl), " +
      s"waited only ${waited}ms")
    assert(sink.read(spark, "users").select("v").as[String].collect()
      .toSeq == Seq("b"))
  }

  storeKinds.foreach { case (kind, wire) =>
  test(s"[$kind] heartbeat renewal: a maintenance body LONGER than the " +
      "TTL keeps the lease — a rival acquirer never breaks in mid-body " +
      "(round-10 verdict item 1a)") {
    val t = wire(new GraftTable(tmp("lease-beat"), Seq("id"), nBuckets = 2))
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val rivalWonMidBody = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var inBody = false
    @volatile var running = true
    val rival = new Thread(() => {
      while (running) {
        if (t.tryAcquireMaintenanceLease("rival", ttlMs = 60000)) {
          if (inBody) rivalWonMidBody.incrementAndGet()
          t.releaseMaintenanceLease("rival")
        }
        Thread.sleep(10)
      }
    }, "lease-rival")
    rival.setDaemon(true); rival.start()
    // ttl 1s, body 3s: without the ttl/3 heartbeat the rival would
    // break the lapsed lease ~2s before the body finishes. The rival
    // may momentarily hold the free lease, so acquisition retries
    // (the skip-your-turn contract every production caller follows).
    var ran = false
    val acqDeadline = System.currentTimeMillis() + 10000
    while (!ran && System.currentTimeMillis() < acqDeadline) {
      ran = t.runMaintenanceUnderLease("holder", ttlMs = 1000) {
        inBody = true
        val deadline = System.currentTimeMillis() + 3000
        while (System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(t.maintenanceLeaseHolder.exists(_._1 == "holder"),
          "lease lost mid-body despite heartbeat renewal")
        inBody = false
      }
      if (!ran) Thread.sleep(5)
    }
    running = false; rival.join(2000)
    assert(ran, "the holder never acquired the lease in 10s")
    assert(rivalWonMidBody.get() == 0,
      s"rival broke the live lease ${rivalWonMidBody.get()} times while " +
        "the heartbeat should have kept it fresh")
    assert(t.maintenanceLeaseHolder.isEmpty, "lease must be freed after")
  }
  }

  test("manifest reads tolerate a concurrent vacuum: two vacuum loops + " +
      "live merges + snapshot readers race with zero NoSuchFileException " +
      "(round-10 verdict item 1b)") {
    val dir = tmp("lease-vac-race")
    def seqStr = org.apache.spark.sql.functions.format_string(
      "%016x/%016x", org.apache.spark.sql.functions.col("lsn"),
      org.apache.spark.sql.functions.lit(0L))
    val t0 = new GraftTable(dir, Seq("id"), nBuckets = 2)
    t0.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var running = true
    // two DELIBERATELY unleased vacuums (the broken-lease residual the
    // tolerance exists for) plus metadata readers, all over private
    // handles like separate processes
    def loop(name: String)(body: GraftTable => Unit): Thread = {
      val th = new Thread(() => {
        val t = new GraftTable(dir, Seq("id"), nBuckets = 2)
        while (running) {
          try body(t)
          catch { case e: Throwable => errors.add(e); running = false }
          Thread.sleep(3)
        }
      }, name)
      th.setDaemon(true); th.start(); th
    }
    val threads = Seq(
      loop("vac-2")(_.vacuum(keep = 2)),
      loop("vac-3")(_.vacuum(keep = 3)),
      loop("reader") { t =>
        t.currentVersion; t.currentFiles
        t.versionAsOfTimestamp(Long.MaxValue); () })
    val writer = new GraftTable(dir, Seq("id"), nBuckets = 2)
    try {
      (1 to 25).foreach { i =>
        writer.merge((1L to 10L).map(k => (k, s"v$k-r$i", "U", i.toLong))
          .toDF("id", "v", "_op", "lsn")
          .withColumn("_seq", seqStr).drop("lsn"))
        if (!running) fail(s"raced into: ${errors.toArray.toSeq}")
      }
    } finally { running = false; threads.foreach(_.join(3000)) }
    assert(errors.isEmpty,
      s"concurrent vacuum/read raced into: ${errors.toArray.toSeq}")
    // converged: the last round's values are all present
    val got = writer.read(spark).select("id", "v")
      .as[(Long, String)].collect().toMap
    assert(got.size == 10)
    (1L to 10L).foreach(k => assert(got(k) == s"v$k-r25"))
  }

  private val usersSchema = TableSchemaV(1L, "users", 0L, IndexedSeq(
    ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
    ColumnSpec("name", "text"),
    ColumnSpec("age", "int4")))

  private def appendLog(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def ins(lsn: Long, ord: Long, id: Long, name: String, age: Int) =
    CdcLogSource.renderLine("I", 1L, lsn, lsn, ord, 0L, None,
      Some(s"""{"id":$id,"name":"$name","age":$age}"""))
  private def upd(lsn: Long, ord: Long, id: Long, name: String, age: Int) =
    CdcLogSource.renderLine("U", 1L, lsn, lsn, ord, 0L,
      Some(s"""{"id":$id}"""),
      Some(s"""{"id":$id,"name":"$name","age":$age}"""))

  test("external compact/vacuum loop runs concurrently with a live " +
      "stream under the lease: zero failed commits, converged state") {
    val dir = tmp("lease-e2e")
    val log = s"$dir/wal.log"
    appendLog(log, (1L to 20L).map(i => ins(i, 0, i, s"u$i", 20)))
    // in-process policy ACTIVE too: both maintainers contend for the lease
    val sink = new CurrentStateSink(s"$dir/tables", _ => Seq("id"), 4,
      maintenance = MaintenancePolicy(everyBatches = 3,
        maxFilesPerBucket = 2, keepVersions = 3))
    val registry = new SchemaRegistry
    registry.put(usersSchema)
    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 4, maxFillMs = 50,
        checkpointDir = s"$dir/ckpt", stateDir = s"$dir/state"),
      registry, sink, (df: DataFrame, s: TableSchemaV) =>
        CdcPipeline.jsonDecode(df, s))
    pipeline.stateStore.force(1L, TableState.Ready)

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val maintRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var streaming = true
    val ext = new Thread(() => {
      val t = new GraftTable(s"$dir/tables/users", Seq("id"), 4)
      while (streaming) {
        try {
          if (t.exists && t.runMaintenanceUnderLease("external-maint",
              ttlMs = 5000, graceMs = 30) {
                t.compact(spark, maxFiles = 1)
                t.vacuum(keep = 2)
              }) maintRuns.incrementAndGet()
        } catch { case e: Throwable => errors.add(e) }
        Thread.sleep(60)
      }
    }, "external-maintenance")
    ext.setDaemon(true)

    val q = pipeline.startStream(log)
    try {
      q.processAllAvailable() // bootstrap before maintenance contends
      ext.start()
      // live churn: interleave appended commits with maintenance loops
      (1 to 6).foreach { round =>
        appendLog(log, (1L to 10L).map(i =>
          upd(100L * round + i, 0, i, s"u$i-r$round", 20 + round)))
        q.processAllAvailable()
        Thread.sleep(80) // give the external loop a window to win the lease
      }
    } finally {
      streaming = false
      q.stop()
      ext.join(5000)
    }
    assert(errors.isEmpty,
      s"maintenance/apply raced into failures: ${errors.toArray.toSeq}")
    assert(maintRuns.get() >= 1,
      "the external loop never won the lease — the test proved nothing")
    // converged: every key carries its LAST update
    val got = sink.read(spark, "users").select("id", "name")
      .as[(Long, String)].collect().toMap
    assert(got.size == 20)
    (1L to 10L).foreach(i => assert(got(i) == s"u$i-r6", s"key $i: ${got(i)}"))
    (11L to 20L).foreach(i => assert(got(i) == s"u$i"))
    // and the lease is free afterwards
    val t = new GraftTable(s"$dir/tables/users", Seq("id"), 4)
    assert(t.maintenanceLeaseHolder.isEmpty)
  }
}
