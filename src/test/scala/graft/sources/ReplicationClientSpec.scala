package graft.sources

import graft.SparkSpec
import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
import graft.pipeline.{CdcPipeline, PipelineConfig}
import graft.sinks.CurrentStateSink
import java.nio.file.Files

/** Live-socket intake e2e, mirroring the reference's pipeline tests
  * against a real replication stream (crates/etl/tests/pipeline.rs) with
  * an in-process fake Postgres speaking the wire protocol over loopback:
  * binary pgoutput frames → [[ReplicationSocketClient]] → envelope spool
  * → DSv2 streaming pipeline → current-state table vs the memory oracle;
  * keepalive replies + standby-status-update cadence asserted against
  * the reference's policy (replication_message.rs, apply.rs:1493). */
class ReplicationClientSpec extends SparkSpec {
  import PgOutput._
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val usersSchema = TableSchemaV(1L, "users", 0L, IndexedSeq(
    ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
    ColumnSpec("name", "text"),
    ColumnSpec("age", "int4")))

  private val usersRelation = Relation(1, "public", "users", 'd', IndexedSeq(
    RelCol(1, "id", 20, -1), RelCol(0, "name", 25, -1),
    RelCol(0, "age", 23, -1)))

  private def row(vals: String*): TupleData =
    vals.map(v => if (v == null) TNull else TText(v)).toIndexedSeq

  private def waitUntil(timeoutMs: Long = 15000, msg: => String = "")(
      cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs)
      Thread.sleep(20)
    assert(cond, s"condition not met within ${timeoutMs}ms $msg")
  }

  test("e2e: fake server → socket client → pipeline → table matches oracle") {
    val dir = tmp("repl-e2e")
    val log = s"$dir/wal.log"
    val server = new FakePgServer(walSenderTimeout = "1s")
    val port = server.start()
    @volatile var durableLsn = 0L
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "graft_slot", "graft_pub", log, flushLsn = () => durableLsn)
    try {
      client.start()
      waitUntil()(server.startedStreaming)
      // the client asked for the sender timeout and started the slot
      assert(server.queries.toArray.exists(
        _.toString.contains("wal_sender_timeout")))
      assert(server.queries.toArray.exists { q =>
        val s = q.toString
        s.startsWith("START_REPLICATION") && s.contains("graft_slot") &&
          s.contains("publication_names 'graft_pub'") &&
          s.contains("proto_version '1'")
      })

      // tx1: insert ann/bob/cat at commit LSN 100
      server.enqueue(
        server.Frame(encode(usersRelation), 90, 90),
        server.Frame(encode(Begin(100, 0, 7)), 91, 91),
        server.Frame(encode(Insert(1, row("1", "ann", "30"))), 92, 92),
        server.Frame(encode(Insert(1, row("2", "bob", "40"))), 93, 93),
        server.Frame(encode(Insert(1, row("3", "cat", "50"))), 94, 94),
        server.Frame(encode(Commit(0, 100, 101, 0)), 100, 100),
        server.Keepalive(150, replyRequested = true))
      waitUntil()(client.framesReceived.get() == 6 &&
        client.keepalivesReceived.get() == 1)

      // keepalive with reply-requested → forced status update, write LSN
      // carried to the keepalive's walEnd, no reply echo requested
      waitUntil()(server.statusUpdates.toArray.exists { u =>
        val s = u.asInstanceOf[server.StatusUpdate]
        s.writeLsn >= 150 && !s.replyRequested && s.tsMicros > 0
      })

      // tx2: update ann, delete bob at commit LSN 200
      server.enqueue(
        server.Frame(encode(Begin(200, 0, 8)), 191, 191),
        // key images carry FULL relation arity with NULL non-identity
        // columns (PG proto.c logicalrep_write_tuple writes natts cells;
        // the decoder REJECTS short tuples as corrupt)
        server.Frame(encode(Update(1, Some('K'), Some(row("1", null, null)),
          row("1", "ann2", "31"))), 192, 192),
        server.Frame(encode(Delete(1, 'K', row("2", null, null))), 193, 193),
        server.Frame(encode(Commit(0, 200, 201, 0)), 200, 200))
      waitUntil()(client.framesReceived.get() == 10)

      // spool → DSv2 streaming pipeline → current-state table
      val registry = new SchemaRegistry
      registry.put(usersSchema)
      val sink = new CurrentStateSink(s"$dir/tables", _ => Seq("id"), 4)
      val pipeline = new CdcPipeline(spark,
        PipelineConfig(maxRowsPerTrigger = 100, maxFillMs = 50,
          checkpointDir = s"$dir/ckpt", stateDir = s"$dir/state"),
        registry, sink, CdcPipeline.jsonDecode)
      pipeline.stateStore.force(1L, graft.pipeline.TableState.Ready)
      val q = pipeline.startStream(log)
      q.processAllAvailable()
      q.stop()
      val state = sink.read(spark, "users")
        .select("id", "name", "age").as[(Long, String, Int)].collect().toSet
      assert(state == Set((1L, "ann2", 31), (3L, "cat", 50)))

      // durable progress → flush LSN reported (monotonically) within the
      // keepalive deadline (1 s sender timeout → 600 ms heartbeat)
      durableLsn = 200L
      waitUntil()(server.statusUpdates.toArray.exists { u =>
        val s = u.asInstanceOf[server.StatusUpdate]
        s.flushLsn == 200L && s.applyLsn == 200L
      })
      // write/flush monotonic across every update received
      val ups = server.statusUpdates.toArray.map(
        _.asInstanceOf[server.StatusUpdate])
      assert(ups.sliding(2).forall {
        case Array(a, b) => b.writeLsn >= a.writeLsn && b.flushLsn >= a.flushLsn
        case _ => true
      })
    } finally {
      client.stop(); server.stop()
    }
  }

  test("slot auto-creation: a missing slot is created before " +
      "START_REPLICATION (TWO_PHASE under proto v3), an existing one " +
      "is left alone; the duplicate-object SQLSTATE parses for the " +
      "creation-race tolerance") {
    // ErrorResponse field parsing for the 42710 race path
    val err = {
      val bos = new java.io.ByteArrayOutputStream()
      def f(code: Char, v: String): Unit = {
        bos.write(code); bos.write(v.getBytes("UTF-8")); bos.write(0)
      }
      f('S', "ERROR"); f('C', "42710")
      f('M', "replication slot \"x\" already exists"); bos.write(0)
      bos.toByteArray
    }
    assert(ReplicationSocketClient.errorSqlState(err).contains("42710"))
    assert(ReplicationSocketClient.errorMessage(err).contains("already"))
    // missing slot, proto v3 → probe, CREATE with TWO_PHASE, stream
    val server = new FakePgServer(walSenderTimeout = "1s")
    @volatile var slotExists = false
    server.queryHandler = sql =>
      if (sql.contains("pg_replication_slots"))
        Some(if (slotExists) Seq(Seq("s3_slot")) else Seq.empty)
      else if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        slotExists = true
        Some(Seq(Seq("s3_slot", "0/500", null, "pgoutput")))
      } else None
    val port = server.start()
    val log = tmp("slot-create") + "/wal.log"
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s3_slot", "pub", log, protoVersion = 3,
      createSlotIfMissing = true)
    try {
      client.start()
      waitUntil()(server.startedStreaming)
      val qs = server.queries.toArray.map(_.toString)
      val create = qs.filter(_.startsWith("CREATE_REPLICATION_SLOT"))
      assert(create.length == 1 &&
        create.head.contains("\"s3_slot\"") &&
        create.head.contains("LOGICAL pgoutput") &&
        create.head.contains("TWO_PHASE"), create.mkString("\n"))
      // probe precedes create precedes START_REPLICATION
      val probeIdx = qs.indexWhere(_.contains("pg_replication_slots"))
      val createIdx = qs.indexWhere(_.startsWith("CREATE_REPLICATION_SLOT"))
      val startIdx = qs.indexWhere(_.startsWith("START_REPLICATION"))
      assert(probeIdx >= 0 && probeIdx < createIdx && createIdx < startIdx)
    } finally { client.stop(); server.stop() }

    // existing slot → probed, NOT recreated; proto v1 default opts
    val server2 = new FakePgServer(walSenderTimeout = "1s")
    server2.queryHandler = sql =>
      if (sql.contains("pg_replication_slots")) Some(Seq(Seq("v1_slot")))
      else None
    val port2 = server2.start()
    val client2 = new ReplicationSocketClient("127.0.0.1", port2,
      "v1_slot", "pub", tmp("slot-exists") + "/wal.log",
      createSlotIfMissing = true)
    try {
      client2.start()
      waitUntil()(server2.startedStreaming)
      assert(!server2.queries.toArray.map(_.toString)
        .exists(_.startsWith("CREATE_REPLICATION_SLOT")))
    } finally { client2.stop(); server2.stop() }
  }

  test("SlotBootstrap: creating the slot exports ITS snapshot for the " +
      "backfill; a pre-existing slot skips creation") {
    val server = new FakePgServer(walSenderTimeout = "1s")
    @volatile var exists = false
    server.queryHandler = sql =>
      if (sql.contains("pg_replication_slots"))
        Some(if (exists) Seq(Seq("boot_slot")) else Seq.empty)
      else if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        exists = true
        Some(Seq(Seq("boot_slot", "0/900", "00000004-00000011-1",
          "pgoutput")))
      } else None
    val port = server.start()
    try {
      val s = ReplicationSocketClient.SlotBootstrap.ensureWithSnapshot(
        "127.0.0.1", port, "graft", "postgres", "", "boot_slot",
        protoVersion = 1)
      try {
        assert(s.created && s.snapshotName.contains("00000004-00000011-1")
          && s.consistentPoint.contains("0/900"))
        val qs = server.queries.toArray.map(_.toString)
        val create = qs.filter(_.startsWith("CREATE_REPLICATION_SLOT"))
        assert(create.length == 1 &&
          create.head.contains("EXPORT_SNAPSHOT") &&
          !create.head.contains("TWO_PHASE"), create.mkString("\n"))
      } finally s.close()
      // second call: the slot now exists — probed, not recreated
      val s2 = ReplicationSocketClient.SlotBootstrap.ensureWithSnapshot(
        "127.0.0.1", port, "graft", "postgres", "", "boot_slot",
        protoVersion = 1)
      try {
        assert(!s2.created && s2.snapshotName.isEmpty)
        assert(server.queries.toArray.map(_.toString)
          .count(_.startsWith("CREATE_REPLICATION_SLOT")) == 1)
      } finally s2.close()
    } finally server.stop()
  }

  test("idle stream heartbeats inside the keepalive deadline") {
    val dir = tmp("repl-idle")
    val server = new FakePgServer(walSenderTimeout = "1s") // deadline 600ms
    val port = server.start()
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s", "p", s"$dir/wal.log")
    try {
      client.start()
      waitUntil()(server.startedStreaming)
      val n0 = server.statusUpdates.size()
      Thread.sleep(1500) // ≥ 2 deadlines, zero traffic
      val periodic = server.statusUpdates.toArray.drop(n0)
        .map(_.asInstanceOf[server.StatusUpdate])
      assert(periodic.count(_.replyRequested) >= 2,
        s"want ≥2 periodic heartbeats, got ${periodic.mkString(",")}")
    } finally {
      client.stop(); server.stop()
    }
  }

  test("pre-14 source: `messages` option dropped from START_REPLICATION " +
      "(option does not exist before PG 14); modern source keeps it") {
    // PG 13 source: the walsender would error the whole START_REPLICATION
    // on an unrecognized `messages` option — v1 must keep streaming
    val dir = tmp("repl-pg13")
    val server = new FakePgServer(walSenderTimeout = "1s")
    server.serverVersionNum = "130011"
    val port = server.start()
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s", "p", s"$dir/wal.log")
    try {
      client.start()
      waitUntil()(server.startedStreaming)
      val start = server.queries.toArray.map(_.toString)
        .find(_.startsWith("START_REPLICATION")).get
      assert(!start.contains("messages"),
        s"PG 13 must not be sent the `messages` option: $start")
      assert(server.queries.toArray.map(_.toString)
        .exists(_.startsWith("SHOW server_version_num")))
    } finally { client.stop(); server.stop() }

    // PG 14+ (default fake): messages 'true' present (reference
    // raw.rs:634 sends it unconditionally — it only supports PG 14+)
    val dir2 = tmp("repl-pg17")
    val server2 = new FakePgServer(walSenderTimeout = "1s")
    val port2 = server2.start()
    val client2 = new ReplicationSocketClient("127.0.0.1", port2,
      "s", "p", s"$dir2/wal.log")
    try {
      client2.start()
      waitUntil()(server2.startedStreaming)
      val start = server2.queries.toArray.map(_.toString)
        .find(_.startsWith("START_REPLICATION")).get
      assert(start.contains("messages 'true'"), start)
    } finally { client2.stop(); server2.stop() }
  }

  test("dropped connection: supervisor reconnects from durable progress") {
    val dir = tmp("repl-drop")
    val log = s"$dir/wal.log"
    val server = new FakePgServer(walSenderTimeout = "1s")
    val port = server.start()
    @volatile var durableLsn = 0L
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s", "p", log, flushLsn = () => durableLsn)
    try {
      client.start(reconnectBackoffMs = 100)
      waitUntil(msg = "no streaming")(server.startedStreaming)
      server.enqueue(
        server.Frame(encode(usersRelation), 90, 90),
        server.Frame(encode(Begin(100, 0, 1)), 91, 91),
        server.Frame(encode(Insert(1, row("1", "ann", "30"))), 92, 92),
        server.Frame(encode(Commit(0, 100, 101, 0)), 100, 100))
      waitUntil(msg = s"frames=${client.framesReceived.get()} " +
        s"err=${client.lastError}")(client.framesReceived.get() == 4)
      durableLsn = 100L

      // network blip: the wal sender drops the session
      server.dropConnection()
      waitUntil(msg = s"reconnects=${client.reconnects.get()} " +
          s"connections=${server.connections.get()} err=${client.lastError}")(
        client.reconnects.get() == 1 && server.connections.get() == 2)
      // reconnect asked the slot to resume from the durable position
      assert(server.queries.toArray.map(_.toString)
        .count(_.startsWith("START_REPLICATION")) == 2)
      assert(server.queries.toArray.map(_.toString).exists(q =>
        q.startsWith("START_REPLICATION") && q.contains("0/64"))) // 100

      // the new session continues: server re-announces the relation
      // (fresh wal sender session), then delivers the next tx
      server.enqueue(
        server.Frame(encode(usersRelation), 190, 190),
        server.Frame(encode(Begin(200, 0, 2)), 191, 191),
        server.Frame(encode(Insert(1, row("2", "bob", "40"))), 192, 192),
        server.Frame(encode(Commit(0, 200, 201, 0)), 200, 200))
      waitUntil(msg = s"frames=${client.framesReceived.get()} " +
        s"err=${client.lastError}")(client.framesReceived.get() == 8)
      val lines = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(log)), java.nio.charset.StandardCharsets.UTF_8)
      // packed payloads: cells are 0x1F-separated raw text values
      assert(lines.contains("ann") && lines.contains("bob"), lines)
    } finally { client.stop(); server.stop() }
  }

  test("SCRAM-SHA-256 auth: mutual verification succeeds; wrong password refused") {
    val dir = tmp("repl-scram")
    val server = new FakePgServer(walSenderTimeout = "1s",
      password = "s3cret")
    val port = server.start()
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s", "p", s"$dir/wal.log", password = "s3cret")
    try {
      client.start() // throws unless the full SCRAM exchange verified
      waitUntil()(server.startedStreaming)
    } finally { client.stop(); server.stop() }

    val server2 = new FakePgServer(password = "s3cret")
    val port2 = server2.start()
    val bad = new ReplicationSocketClient("127.0.0.1", port2,
      "s", "p", s"$dir/wal2.log", password = "wrong")
    try {
      val e = intercept[Exception] { bad.start() }
      assert(e.getMessage.contains("authentication failed") ||
        e.isInstanceOf[java.io.EOFException], e.toString)
    } finally { bad.stop(); server2.stop() }
  }

  test("snapshot COPY over the wire: per-unit connections, CTID predicates, NULLs") {
    import SnapshotScan._
    val server = new FakePgServer(password = "pw")
    // two leaves → per-leaf CTID ranges; serve rows by matching the
    // predicate the planner generated (COPY TEXT: \N = NULL, tab-sep)
    server.copyHandler = sql => {
      if (sql.contains("public.users_p0")) Seq("1\tann\t30", "2\t\\N\t40")
      else if (sql.contains("public.users_p1")) Seq("3\tcat\t\\N")
      else fail(s"unexpected COPY: $sql")
    }
    val port = server.start()
    val units = planTable(Seq(
      LeafStats("public.users_p0", relpages = 10, reltuples = 2),
      LeafStats("public.users_p1", relpages = 5, reltuples = 1)), workers = 2)
    // leaves planned separately, each with ctid predicates
    assert(units.map(_.table).distinct.sorted ==
      Seq("public.users_p0", "public.users_p1"))
    try {
      val df = PgCopy.copyTable(spark, "127.0.0.1", port, "graft",
        "postgres", "pw", units.take(2).distinctBy(_.table),
        Seq("id", "name", "age"))
      val got = df.collect().map(r =>
        (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
        .toSet
      assert(got == Set(
        ("1", Some("ann"), Some("30")),
        ("2", None, Some("40")),
        ("3", Some("cat"), None)))
      // each unit ran its own COPY with its own ctid window, and every
      // connection authenticated (SCRAM ran per connection)
      val copies = server.queries.toArray.map(_.toString)
        .filter(_.startsWith("COPY"))
      assert(copies.length == 2 && copies.forall(_.contains("ctid")))
    } finally server.stop()
  }

  test("snapshot COPY (FORMAT binary) over the wire: negotiated per " +
      "unit, spec-assembled PGCOPY bytes decode to canonical text " +
      "across hostile frame boundaries, NULLs and the typed decode " +
      "preserved") {
    import graft.core.{ColumnSpec, TableSchemaV}
    // spec-assembled payload (tools/gen_pg_fixtures.py, COPY docs
    // "Binary Format"): 3 rows of (id int8, name text, score float8,
    // born date) incl. a 4-byte header extension and NULL fields
    val in = getClass.getResourceAsStream("/copy_binary.txt")
    require(in != null, "missing copy_binary.txt fixture")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val payload = text.linesIterator
      .filterNot(l => l.startsWith("#") || l.isBlank)
      .map(_.split("\t", 2)(1)).next()
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

    val schema = TableSchemaV(11L, "bin", 0L, IndexedSeq(
      ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
      ColumnSpec("name", "text"),
      ColumnSpec("score", "float8"),
      ColumnSpec("born", "date")))
    val server = new FakePgServer()
    server.copyBinaryHandler = sql =>
      if (sql.contains("FORMAT binary")) Some(payload) else None
    server.copyFrameBytes = 5 // rows reassemble across frame boundaries
    val port = server.start()
    try {
      val unit = SnapshotScan.ScanUnit("public.bin",
        SnapshotScan.CtidRange(0, Long.MaxValue))
      val df = PgCopy.copyTableBinary(spark, "127.0.0.1", port, "graft",
        "postgres", "", Seq(unit), schema)
      val got = df.collect().map(r => (0 until 4).map(i =>
        Option(r.getString(i))).toList).toSet
      assert(got == Set(
        List(Some("1"), Some("ann"), Some("-2.25"), Some("2022-10-16")),
        List(Some("2"), None, Some("40.5"), None),
        List(Some("3"), Some("héllo"), None, Some("2000-01-01"))))
      // the negotiated statement asked for the binary wire
      assert(server.queries.toArray.map(_.toString)
        .exists(q => q.startsWith("COPY") && q.contains("FORMAT binary")))
      // the text-path typed decode applies unchanged (format-agnostic)
      val typed = PgCopy.decodeTyped(df, schema).orderBy("id").collect()
      assert(typed(0).getLong(0) == 1L &&
        typed(0).getDouble(2) == -2.25 &&
        typed(0).getDate(3).toString == "2022-10-16")
      assert(typed(1).isNullAt(1) && typed(1).isNullAt(3))
      assert(typed(2).getString(1) == "héllo" && typed(2).isNullAt(2))
    } finally server.stop()
    // a table with a column lacking a binary conversion refuses loud
    // (1-D arrays of supported scalars ARE supported; geometry is not)
    val geoSchema = TableSchemaV(12L, "geo", 0L, IndexedSeq(
      ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
      ColumnSpec("loc", "point")))
    val e = intercept[IllegalArgumentException] {
      PgCopy.copyTableBinary(spark, "127.0.0.1", 1, "g", "p", "",
        Seq.empty, geoSchema)
    }
    assert(e.getMessage.contains("point"))
  }

  test("binary COPY reassembly: random rows × random CopyData frame " +
      "sizes round-trip cell-exact (framing built independently here)") {
    val rnd = new scala.util.Random(4242)
    val server = new FakePgServer()
    val port = server.start()
    try {
      (1 to 15).foreach { _ =>
        val nCols = 1 + rnd.nextInt(4)
        val rows = Vector.fill(rnd.nextInt(6)) {
          Vector.fill(nCols)(
            if (rnd.nextInt(4) == 0) None
            else Some(Array.fill(rnd.nextInt(9))(rnd.nextInt().toByte)))
        }
        val bos = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(bos)
        d.write("PGCOPY\n".getBytes("ISO-8859-1"))
        d.writeByte(0xff); d.write('\r'); d.write('\n'); d.writeByte(0)
        d.writeInt(0); d.writeInt(0) // flags, no header extension
        rows.foreach { r =>
          d.writeShort(r.size)
          r.foreach {
            case None => d.writeInt(-1)
            case Some(a) => d.writeInt(a.length); d.write(a)
          }
        }
        d.writeShort(-1)
        val payload = bos.toByteArray
        server.copyBinaryHandler =
          sql => if (sql.contains("FORMAT binary")) Some(payload) else None
        server.copyFrameBytes = 1 + rnd.nextInt(13)
        val conn = new PgWireConnection("127.0.0.1", port, "graft",
          "postgres", "")
        conn.connect()
        try {
          val it = PgCopy.copyBinaryRows(conn,
            "COPY (SELECT 1) TO STDOUT (FORMAT binary)", nCols)
          val got = it.toVector
          assert(got.size == rows.size,
            s"rows=${rows.size} frame=${server.copyFrameBytes}")
          // wire-size accounting is exact even when rows span CopyData
          // frames (buffer compaction must not corrupt the byte count)
          val expectBytes = rows.map(r =>
            2L + r.map(c => 4L + c.map(_.length.toLong).getOrElse(0L)).sum).sum
          assert(it.asInstanceOf[PgCopy.CopyBinaryRowIterator]
            .wireBytesSeen == expectBytes,
            s"wire bytes off at frame=${server.copyFrameBytes}")
          got.zip(rows).foreach { case (g, e) =>
            g.zip(e).foreach {
              case (None, None) => ()
              case (Some(a), Some(b)) => assert(a.sameElements(b))
              case other => fail(s"cell mismatch: $other")
            }
          }
        } finally conn.close()
      }
    } finally server.stop()
  }

  test("COPY TEXT → typed decode: PG semantics, not bare casts") {
    import graft.core.{ColumnSpec, PgTypeMap, TableSchemaV}
    val schema = TableSchemaV(9L, "typed", 0L, IndexedSeq(
      ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
      ColumnSpec("ok", "bool"),
      ColumnSpec("f", "float8"),
      ColumnSpec("amount", "numeric",
        modifier = PgTypeMap.packNumericModifier(10, 2)),
      ColumnSpec("d", "date"),
      ColumnSpec("ts", "timestamptz"),
      ColumnSpec("tod", "time"),
      ColumnSpec("payload", "bytea"),
      ColumnSpec("tags", "_text"),
      ColumnSpec("ns", "_int4")))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("1", "t", "NaN", "12.50", "2024-02-29",
          "2024-01-02 03:04:05.123456+00", "01:02:03.000004",
          "\\x4869", """{a,"b c",NULL}""", "{1,2,NULL}"),
        org.apache.spark.sql.Row("2", "f", "-Infinity", null, null,
          null, null, null, "{}", null)),
      org.apache.spark.sql.types.StructType(schema.columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name,
          org.apache.spark.sql.types.StringType))))
    val out = PgCopy.decodeTyped(df, schema).orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getLong(0) == 1L && r1.getBoolean(1))
    assert(r1.getDouble(2).isNaN)
    assert(r1.getDecimal(3).toString == "12.50")
    assert(r1.getDate(4).toString == "2024-02-29")
    assert(r1.getTimestamp(5).toInstant.toString ==
      "2024-01-02T03:04:05.123456Z")
    assert(r1.getLong(6) == (1L * 3600 + 2 * 60 + 3) * 1000000L + 4)
    assert(new String(r1.getAs[Array[Byte]](7)) == "Hi")
    assert(r1.getSeq[String](8) == Seq("a", "b c", null))
    assert(r1.getSeq[Integer](9) == Seq(1, 2, null))
    val r2 = out(1)
    assert(r2.getLong(0) == 2L && !r2.getBoolean(1))
    assert(r2.getDouble(2).isNegInfinity)
    assert(r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(5) &&
      r2.isNullAt(6) && r2.isNullAt(7) && r2.isNullAt(9))
    assert(r2.getSeq[String](8) == Seq.empty)
  }

  /** Self-signed server identity via the JDK's own keytool: PKCS12
    * keystore for the fake server, PEM export as the client's trust
    * anchor. Returns (keystorePath, pemPath). */
  private def genServerCert(dir: String, alias: String): (String, String) = {
    import scala.sys.process._
    val ks = s"$dir/$alias.p12"
    val pem = s"$dir/$alias.pem"
    assert(Seq("keytool", "-genkeypair", "-alias", alias, "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-keystore", ks,
      "-storetype", "PKCS12", "-storepass", "changeit",
      "-dname", "CN=127.0.0.1",
      "-ext", "san=ip:127.0.0.1").! == 0, "keytool genkeypair failed")
    assert(Seq("keytool", "-exportcert", "-rfc", "-alias", alias,
      "-keystore", ks, "-storepass", "changeit",
      "-file", pem).! == 0, "keytool exportcert failed")
    (ks, pem)
  }

  test("TLS e2e: verify-ca + SCRAM-SHA-256-PLUS channel binding; COPY over TLS") {
    val dir = tmp("repl-tls")
    val (ks, pem) = genServerCert(dir, "pg")
    val server = new FakePgServer(walSenderTimeout = "1s",
      password = "s3cret", tlsKeystore = Some((ks, "changeit")))
    server.copyHandler = _ => Seq("1\tsecure", "2\t\\N")
    val port = server.start()
    val client = new ReplicationSocketClient("127.0.0.1", port,
      "s", "p", s"$dir/wal.log", password = "s3cret",
      sslMode = "verify-ca", sslRootCert = Some(pem))
    try {
      client.start() // SSLRequest → TLS → SCRAM-PLUS → START_REPLICATION
      waitUntil()(server.startedStreaming)
      // the client picked the channel-bound mechanism and the server
      // verified the tls-server-end-point binding in the proof
      assert(server.sawMechanism == "SCRAM-SHA-256-PLUS",
        server.sawMechanism)
      // snapshot COPY rides the same TLS + SCRAM-PLUS path
      val conn = new PgWireConnection("127.0.0.1", port, "u", "db",
        "s3cret", sslMode = "verify-ca", sslRootCert = Some(pem))
      conn.connect()
      try assert(PgCopy.copyText(conn, "COPY (SELECT 1) TO STDOUT") ==
        Vector("1\tsecure", "2\t\\N"))
      finally conn.close()
    } finally { client.stop(); server.stop() }
  }

  test("TLS + SCRAM-PLUS channel-binding mismatch: server offers PLUS, " +
      "binding data disagrees (TLS-terminating middlebox shape) → " +
      "CLEAN named auth failure, no hang, no fallback to unbound SCRAM") {
    val dir = tmp("repl-tls-cbind")
    val (ks, pem) = genServerCert(dir, "pg")
    val server = new FakePgServer(walSenderTimeout = "1s",
      password = "s3cret", tlsKeystore = Some((ks, "changeit")))
    server.corruptChannelBinding = true
    val port = server.start()
    try {
      val conn = new PgWireConnection("127.0.0.1", port, "u", "db",
        "s3cret", sslMode = "verify-ca", sslRootCert = Some(pem))
      val e = intercept[java.io.IOException] { conn.connect() }
      assert(e.getMessage.toLowerCase.contains("authentication"),
        s"want a clean auth failure, got: ${e.getMessage}")
      // the client DID choose the channel-bound mechanism — a client
      // that silently fell back to unbound SCRAM under TLS would make
      // the middlebox invisible
      assert(server.sawMechanism == "SCRAM-SHA-256-PLUS",
        server.sawMechanism)
    } finally server.stop()
  }

  test("TLS: wrong trust anchor refused; require-mode against plaintext server refused") {
    val dir = tmp("repl-tls-bad")
    val (ks, _) = genServerCert(dir, "real")
    val (_, wrongPem) = genServerCert(dir, "imposter")
    val server = new FakePgServer(password = "s3cret",
      tlsKeystore = Some((ks, "changeit")))
    val port = server.start()
    try {
      // chain does not anchor at the imposter CA → handshake refused
      val bad = new PgWireConnection("127.0.0.1", port, "u", "db",
        "s3cret", sslMode = "verify-ca", sslRootCert = Some(wrongPem))
      intercept[Exception] { bad.connect() }
      // sslmode=require without a root cert: encrypts, skips verification
      val req = new PgWireConnection("127.0.0.1", port, "u", "db",
        "s3cret", sslMode = "require")
      req.connect()
      req.close()
    } finally server.stop()

    // a server that refuses TLS must not get a plaintext fallback
    val plain = new FakePgServer(password = "s3cret")
    val port2 = plain.start()
    try {
      val c = new PgWireConnection("127.0.0.1", port2, "u", "db",
        "s3cret", sslMode = "require")
      val e = intercept[java.io.IOException] { c.connect() }
      assert(e.getMessage.contains("refused TLS"), e.getMessage)
    } finally plain.stop()
  }

  test("TLS verify-full: hostname match accepted, SAN mismatch refused") {
    import scala.sys.process._
    val dir = tmp("repl-tls-full")
    val (ks, pem) = genServerCert(dir, "good") // SAN = ip:127.0.0.1
    val server = new FakePgServer(password = "pw",
      tlsKeystore = Some((ks, "changeit")))
    val port = server.start()
    try {
      val ok = new PgWireConnection("127.0.0.1", port, "u", "db", "pw",
        sslMode = "verify-full", sslRootCert = Some(pem))
      ok.connect(); ok.close()
    } finally server.stop()

    // identity for a DIFFERENT host: chain verifies, hostname must not
    val ksBad = s"$dir/other.p12"
    val pemBad = s"$dir/other.pem"
    assert(Seq("keytool", "-genkeypair", "-alias", "other", "-keyalg",
      "RSA", "-keysize", "2048", "-validity", "2", "-keystore", ksBad,
      "-storetype", "PKCS12", "-storepass", "changeit",
      "-dname", "CN=db.example.com",
      "-ext", "san=dns:db.example.com").! == 0)
    assert(Seq("keytool", "-exportcert", "-rfc", "-alias", "other",
      "-keystore", ksBad, "-storepass", "changeit",
      "-file", pemBad).! == 0)
    val server2 = new FakePgServer(password = "pw",
      tlsKeystore = Some((ksBad, "changeit")))
    val port2 = server2.start()
    try {
      // verify-ca accepts (trusted root, hostname not checked) …
      val ca = new PgWireConnection("127.0.0.1", port2, "u", "db", "pw",
        sslMode = "verify-ca", sslRootCert = Some(pemBad))
      ca.connect(); ca.close()
      // … verify-full refuses (SAN says db.example.com, we dialed an IP)
      val full = new PgWireConnection("127.0.0.1", port2, "u", "db", "pw",
        sslMode = "verify-full", sslRootCert = Some(pemBad))
      intercept[Exception] { full.connect() }
    } finally server2.stop()
  }

  test("COPY rows split across CopyData frames mid-UTF-8-character decode intact") {
    val server = new FakePgServer()
    // multi-byte chars (2-, 3- and 4-byte UTF-8) + frames of 3 bytes →
    // every row boundary AND most characters straddle frames
    val rows = Seq("1\tcafé", "2\t日本語テキスト", "3\t𝕊parkλ", "4\t\\N")
    server.copyHandler = _ => rows
    server.copyFrameBytes = 3
    val port = server.start()
    try {
      val conn = new PgWireConnection("127.0.0.1", port, "u", "db", "")
      conn.connect()
      try {
        val got = PgCopy.copyText(conn, "COPY (SELECT 1) TO STDOUT")
        assert(got == rows.toVector, got)
        // decoded cells survive byte-exact (no replacement characters)
        val cells = got.map(graft.core.PgText.parseCopyRow(_)(1))
        assert(cells == Vector(Some("café"), Some("日本語テキスト"),
          Some("𝕊parkλ"), None))
      } finally conn.close()
    } finally server.stop()
  }

  test("copyLines streams an oversized range lazily (O(1) client memory)") {
    val server = new FakePgServer()
    val n = 300000
    // LazyList: the server renders rows on demand too — nothing holds
    // the whole range on either side
    server.copyHandler = _ =>
      LazyList.range(0, n).map(i => s"$i\tpayload-$i-${"x" * 64}")
    val port = server.start()
    try {
      val conn = new PgWireConnection("127.0.0.1", port, "u", "db", "")
      conn.connect()
      val it = PgCopy.copyLines(conn, "COPY (SELECT 1) TO STDOUT",
        closeOnExhaust = true)
      // fold with O(1) retained state — no Vector materialization
      var count = 0
      var lastOk = true
      it.foreach { line =>
        lastOk &&= line.startsWith(s"$count\t")
        count += 1
      }
      assert(count == n && lastOk)
    } finally server.stop()
  }

  test("array literals with escaped quotes and backslashes decode exactly") {
    import graft.core.{ColumnSpec, TableSchemaV}
    val schema = TableSchemaV(10L, "arrs", 0L, IndexedSeq(
      ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
      ColumnSpec("tags", "_text")))
    // {"say \"hi\"", "back\\slash", "\\\"mix\\\"", plain} — the COPY TEXT
    // cell as it arrives after parseCopyRow (array-literal escapes only)
    val lit = """{"say \"hi\"","back\\slash","\\\"mix","a,b",NULL,""}"""
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("1", lit)),
      org.apache.spark.sql.types.StructType(schema.columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name,
          org.apache.spark.sql.types.StringType))))
    val out = PgCopy.decodeTyped(df, schema).collect()(0)
    assert(out.getSeq[String](1) == Seq(
      "say \"hi\"", "back\\slash", "\\\"mix", "a,b", null, ""))
    // matches the CDC-path tokenizer bit for bit
    assert(graft.core.PgText.parseArray(lit).map(_.orNull) ==
      Seq("say \"hi\"", "back\\slash", "\\\"mix", "a,b", null, ""))
  }

  test("status-update policy helpers (reference constants)") {
    import ReplicationSocketClient._
    assert(parsePgDurationMs("60s").contains(60000L))
    assert(parsePgDurationMs("1min").contains(60000L))
    assert(parsePgDurationMs("500ms").contains(500L))
    assert(parsePgDurationMs("2h").contains(7200000L))
    assert(parsePgDurationMs("750").contains(750L))
    assert(parsePgDurationMs("junk").isEmpty)
    // 0.6 × timeout, floored at 100ms; disabled → 60 s default → 36 s
    assert(keepAliveDeadlineMs(Some(60000L)) == 36000L)
    assert(keepAliveDeadlineMs(Some(100L)) == 100L)
    assert(keepAliveDeadlineMs(None) == 36000L)
    assert(formatLsn(0x100000002L) == "1/2")
  }
}
