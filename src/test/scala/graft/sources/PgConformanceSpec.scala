package graft.sources

import graft.core.PackedRow
import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Recorded-bytes protocol conformance (round-8 verdict item 5): the
  * FakePgServer-based tests speak frames our own encoder produced, so a
  * codec bug where encode and decode agree with each other but disagree
  * with the published protocol would slip through. The fixtures under
  * `src/test/resources/` are byte streams assembled INDEPENDENTLY from
  * the public PostgreSQL protocol documentation ("Logical Replication
  * Message Formats" / protocol 3.0 "Message Formats") by
  * `tools/gen_pg_fixtures.py` — a second implementation of the wire
  * layout. The reference consumes the same formats through its own stack
  * (crates/etl/src/postgres/stream/replication_message.rs:89-245).
  *
  * Three layers:
  *  1. per-frame: decode each fixture to the exact expected Message AND
  *     re-encode back to the identical bytes (the format has no encoding
  *     freedom for these shapes, so byte identity is well-defined);
  *  2. session: the frame sequence through [[PgOutput.DecodeSession]] →
  *     exact envelope lines (sequence keys, ordinals, packed images,
  *     TOAST masks);
  *  3. wire: a replay server that answers the protocol handshake with
  *     recorded byte blobs and streams recorded CopyData — the full
  *     [[ReplicationSocketClient]] intake must spool the expected log.
  */
class PgConformanceSpec extends AnyFunSuite {
  import PgOutput._

  private def fixtures(resource: String): Map[String, Array[Byte]] = {
    val in = getClass.getResourceAsStream(s"/$resource")
    require(in != null, s"missing test resource $resource")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    text.linesIterator.filterNot(l => l.startsWith("#") || l.isBlank).map {
      line =>
        val Array(name, hex) = line.split("\t", 2)
        name -> hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }.toMap
  }

  private lazy val frames = fixtures("pgoutput_frames.txt")
  private lazy val session = fixtures("copyboth_session.txt")

  /** Protocol timestamp used by the generator (µs since 2000-01-01). */
  private val Ts = 820292645000000L

  private val rel = Relation(16384, "public", "users", 'd', IndexedSeq(
    RelCol(1, "id", 23, -1), RelCol(0, "name", 25, -1),
    RelCol(0, "bio", 25, -1)))

  private def t(vs: TupleValue*): TupleData = vs.toIndexedSeq

  private val expected: Map[String, Message] = Map(
    "begin" -> Begin(0x16B3748L, Ts, 777),
    "commit" -> Commit(0, 0x16B3748L, 0x16B3800L, Ts),
    "origin" -> Origin(0x1111L, "region_a"),
    "relation" -> rel,
    "type" -> TypeMsg(3802, "pg_catalog", "jsonb"),
    "insert_text_null" ->
      Insert(16384, t(TText("1"), TText("alice"), TNull)),
    "insert_utf8" ->
      Insert(16384, t(TText("2"), TText("héllo→世界"),
        TText(new String(Character.toChars(0x1F600))))),
    "insert_binary" -> Insert(16384, t(
      TBinary(Vector(0, 0, 0, 42)),
      TBinary(java.nio.ByteBuffer.allocate(8).putDouble(2.5).array().toVector),
      TBinary(Vector(1, 2, 0xff.toByte)))),
    "update_key" -> Update(16384, Some('K'),
      Some(t(TText("1"), TNull, TNull)),
      t(TText("1"), TText("alicia"), TUnchangedToast)),
    "update_full" -> Update(16384, Some('O'),
      Some(t(TText("1"), TText("alice"), TNull)),
      t(TText("1"), TText("al"), TText("x"))),
    "update_no_old" -> Update(16384, None, None,
      t(TText("1"), TText("a2"), TNull)),
    "delete_key" -> Delete(16384, 'K', t(TText("1"), TNull, TNull)),
    "truncate" -> Truncate(1, IndexedSeq(16384, 16385)),
    "logical_msg" -> LogicalMsg(transactional = true, 0x2222L, "graft_ddl",
      """{"tableId":16384,"table":"users","cols":[]}"""
        .getBytes(StandardCharsets.UTF_8).toVector),
    "logical_msg_foreign" -> LogicalMsg(transactional = false, 0x2223L,
      "other_ext", "abc".getBytes(StandardCharsets.UTF_8).toVector),
    // the reference's OWN event-trigger message (supabase_etl_ddl,
    // pg_catalog-shaped payload): decoded + re-encoded byte-faithfully
    // like any logical message, and processed by the DDL channel
    "logical_msg_reference" -> LogicalMsg(transactional = true, 0x2224L,
      "supabase_etl_ddl",
      ("""{"command_tag":"ALTER TABLE","nspname":"public",""" +
        """"relname":"users","oid":16384,""" +
        """"identity":{"primary_key_attnums":[1],"relreplident":"d",""" +
        """"replica_identity_index_attnums":[]},""" +
        """"columns":[{"attname":"id","attnum":1,"typname":"int8",""" +
        """"atttypmod":-1,"attnotnull":true,"atthasdef":false,""" +
        """"default_expression":null}]}""")
        .getBytes(StandardCharsets.UTF_8).toVector),
    // round-9 verdict item 6: the decoder's highest-branching cases
    // (replication_message.rs:89-245 analogs)
    "update_toast_multi" -> Update(16384, None, None,
      t(TText("9"), TUnchangedToast, TUnchangedToast)),
    "delete_full" -> Delete(16384, 'O',
      t(TText("3"), TText("carol"), TText("hi"))),
    "truncate_single" -> Truncate(0, IndexedSeq(16384)),
    "truncate_cascade_restart" ->
      Truncate(3, IndexedSeq(16384, 16385, 16386)),
    "relation_widened" -> Relation(16384, "public", "users", 'f',
      IndexedSeq(RelCol(1, "id", 23, -1), RelCol(0, "name", 25, -1),
        RelCol(0, "bio", 25, -1), RelCol(0, "score", 701, -1))),
    "insert_after_ddl" -> Insert(16384,
      t(TText("7"), TText("gail"), TNull, TText("1.5"))),
    "origin_empty" -> Origin(0x3333L, ""),
    // zero-column table (CREATE TABLE t()): ncols=0 relation, empty
    // tuple insert — both legal on a live wire
    "relation_zero_cols" ->
      Relation(16390, "public", "zero", 'n', IndexedSeq()),
    "insert_zero_cols" -> Insert(16390, t()),
    // protocol v2: streamed in-progress transactions (PG 14+)
    "stream_start" -> StreamStart(777, firstSegment = true),
    "stream_start_next" -> StreamStart(777, firstSegment = false),
    "stream_stop" -> StreamStop,
    "stream_commit" -> StreamCommit(777, 0, 0x16B3748L, 0x16B3800L, Ts),
    "stream_abort" -> StreamAbort(777, 777),
    "stream_abort_sub" -> StreamAbort(777, 778),
    // protocol v4 (PG 16): extended Stream Abort (abort LSN + ts)
    "stream_abort_v4" -> StreamAbort(777, 778, Some(0x18FE0L), Some(Ts)),
    // protocol v3: two-phase commit (PG 15+)
    "begin_prepare" -> BeginPrepare(0x16B4000L, 0x16B4010L, Ts, 888,
      "gid-42"),
    "prepare" -> Prepare(0, 0x16B4000L, 0x16B4010L, Ts, 888, "gid-42"),
    "commit_prepared" -> CommitPrepared(0, 0x16B5000L, 0x16B5010L, Ts,
      888, "gid-42"),
    "rollback_prepared" -> RollbackPrepared(0, 0x16B4010L, 0x16B6000L,
      Ts, Ts + 1000L, 888, "gid-42"),
    "stream_prepare" -> StreamPrepare(0, 0x16B4000L, 0x16B4010L, Ts,
      888, "gid-42"))

  test("every spec-assembled frame decodes to the exact expected message") {
    assert(frames.keySet == expected.keySet,
      s"fixture/expectation drift: ${frames.keySet.diff(expected.keySet)} " +
        s"vs ${expected.keySet.diff(frames.keySet)}")
    expected.foreach { case (name, want) =>
      val got = decode(frames(name))
      assert(got == want, s"fixture '$name': decoded $got, expected $want")
    }
  }

  test("malformed frames REJECT instead of corrupting (reference fuzz "
      + "contract, fuzz/fuzz_targets/): truncated tuple, bad cell tag, "
      + "oversized length prefix, negative column count, tuple arity vs "
      + "Relation — and the session keeps decoding good frames after") {
    val s = new DecodeSession()
    s.onFrame(encode(Relation(1, "public", "t", 'd', IndexedSeq(
      RelCol(1, "id", 25, -1), RelCol(0, "v", 25, -1)))))
    s.onFrame(encode(Begin(0x100L, Ts, 1)))
    val good = encode(Insert(1, IndexedSeq(TText("1"), TText("x"))))
    // layout: 'I'(0) relId(1-4) 'N'(5) nCols(6-7) [tag(8) len(9-12) "1"(13)]
    //         [tag(14) len(15-18) "x"(19)]

    // truncated mid-cell: the buffer runs out cleanly, nothing emitted
    intercept[Exception] { s.onFrame(good.dropRight(1)) }

    // unknown cell tag
    val badTag = good.clone(); badTag(8) = 'q'.toByte
    val e1 = intercept[IllegalArgumentException] { s.onFrame(badTag) }
    assert(e1.getMessage.contains("unknown tuple-value kind"))

    // length prefix beyond the frame remainder: rejected BEFORE any
    // allocation (a hostile length must not OOM the decoder)
    val badLen = good.clone()
    badLen(9) = 0x7f.toByte; badLen(10) = -1; badLen(11) = -1; badLen(12) = -1
    val e2 = intercept[IllegalArgumentException] { s.onFrame(badLen) }
    assert(e2.getMessage.contains("exceeds frame remainder"))

    // negative column count
    val badN = good.clone(); badN(6) = -1; badN(7) = -1
    val e3 = intercept[IllegalArgumentException] { s.onFrame(badN) }
    assert(e3.getMessage.contains("negative tuple column count"))

    // tuple arity disagreeing with the Relation would silently DROP
    // cells (or columns) under a zip — it must reject on both sides
    val e4 = intercept[IllegalArgumentException] {
      s.onFrame(encode(Insert(1,
        IndexedSeq(TText("1"), TText("x"), TText("extra")))))
    }
    assert(e4.getMessage.contains("arity"))
    intercept[IllegalArgumentException] {
      s.onFrame(encode(Insert(1, IndexedSeq(TText("1")))))
    }

    // the session is NOT corrupted by the rejects: the same good frame
    // still decodes to a well-formed envelope line and the tx closes
    val lines = s.onFrame(good)
    assert(lines.size == 1)
    val f = lines.head.split("	", -1)
    assert(f(2) == "I" &&
      graft.core.PackedRow.parse(f(7)) == Vector(Some("1"), Some("x")),
      s"post-reject decode corrupted: ${lines.head}")
    assert(s.onFrame(encode(Commit(0, 0x100L, 0x100L, Ts))).isEmpty)
  }

  test("re-encoding each decoded frame reproduces the spec bytes exactly") {
    expected.foreach { case (name, msg) =>
      val enc = encode(msg)
      assert(enc.sameElements(frames(name)),
        s"fixture '$name': encoder produced ${enc.map("%02x".format(_))
          .mkString} but the protocol spec bytes are ${frames(name)
          .map("%02x".format(_)).mkString}")
    }
  }

  test("session: spec frames through DecodeSession yield exact envelope " +
      "lines (keys, ordinals, packed images, TOAST mask)") {
    val s = new DecodeSession()
    val lines =
      s.onFrame(frames("begin")) ++
        s.onFrame(frames("relation")) ++
        s.onFrame(frames("insert_text_null")) ++
        s.onFrame(frames("update_key")) ++
        s.onFrame(frames("delete_key")) ++
        s.onFrame(frames("commit"))
    assert(lines.size == 4)
    val lsn = 0x16B3748L.toString
    // R record at ordinal 0, schema versioned at the tx's final LSN
    val r = lines(0).split("\t", -1)
    assert(r(0) == lsn && r(1) == "0" && r(2) == "R" && r(3) == "16384" &&
      r(5) == lsn)
    assert(r(7).contains(""""table":"users"""") &&
      r(7).contains(""""name":"id","type":"int4""""))
    // insert: packed after-image, no before, no mask
    val i = lines(1).split("\t", -1)
    assert(i(0) == lsn && i(1) == "1" && i(2) == "I" && i(3) == "16384")
    assert(i(6) == "\\N" && i(8) == "\\N")
    assert(PackedRow.parse(i(7)) ==
      Vector(Some("1"), Some("alice"), None))
    // update: key-image before, TOASTed bio in the missing mask
    val u = lines(2).split("\t", -1)
    assert(u(1) == "2" && u(2) == "U")
    assert(PackedRow.parse(u(6)) == Vector(Some("1"), None, None))
    assert(PackedRow.parse(u(7)) == Vector(Some("1"), Some("alicia"), None))
    assert(u(8) == "bio")
    // delete: before-image only
    val d = lines(3).split("\t", -1)
    assert(d(1) == "3" && d(2) == "D" && d(7) == "\\N")
    assert(PackedRow.parse(d(6)) == Vector(Some("1"), None, None))
  }

  test("session: mid-transaction Relation, multi-TOAST update and Origin " +
      "frames decode through DecodeSession with exact schema re-versioning") {
    val s = new DecodeSession()
    val lines =
      s.onFrame(frames("begin")) ++
        s.onFrame(frames("origin")) ++      // origin inside the Begin bracket
        s.onFrame(frames("relation")) ++
        s.onFrame(frames("insert_text_null")) ++
        s.onFrame(frames("update_toast_multi")) ++ // 3-col shape
        s.onFrame(frames("relation_widened")) ++ // mid-tx ALTER TABLE shape
        s.onFrame(frames("insert_after_ddl")) ++
        s.onFrame(frames("commit"))
    assert(lines.size == 5, s"expected R,I,U,R,I got:\n${lines.mkString("\n")}")
    val lsn = 0x16B3748L.toString
    // first R: 3-col schema
    val r1 = lines(0).split("\t", -1)
    assert(r1(2) == "R" && r1(7).contains(""""name":"bio"""") &&
      !r1(7).contains("score"))
    // multi-TOAST update with NO old tuple: every unchanged-toast
    // column lands in the missing mask, no before-image
    val u = lines(2).split("\t", -1)
    assert(u(2) == "U" && u(6) == "\\N" && u(8) == "name,bio",
      s"update line: ${lines(2)}")
    assert(PackedRow.parse(u(7)) == Vector(Some("9"), None, None))
    // mid-tx R re-versions the SAME relid with the widened schema at the
    // same tx LSN, later ordinal
    val r2 = lines(3).split("\t", -1)
    assert(r2(2) == "R" && r2(3) == "16384" && r2(0) == lsn &&
      r2(1).toLong > r1(1).toLong &&
      r2(7).contains(""""name":"score"""), s"widened R: ${lines(3)}")
    // post-DDL insert decodes under the widened 4-col shape
    val i2 = lines(4).split("\t", -1)
    assert(i2(2) == "I" && PackedRow.parse(i2(7)) ==
      Vector(Some("7"), Some("gail"), None, Some("1.5")))
  }

  test("session: foreign-origin transactions drop data when " +
      "dropForeignOrigins is set, but schema records still register") {
    val s = new DecodeSession(dropForeignOrigins = true)
    val lines =
      s.onFrame(frames("begin")) ++
        s.onFrame(frames("origin_empty")) ++
        s.onFrame(frames("relation")) ++
        s.onFrame(frames("insert_text_null")) ++
        s.onFrame(frames("truncate")) ++
        s.onFrame(frames("commit"))
    // only the Relation record survives; inserts + truncate are dropped
    assert(lines.size == 1 && lines(0).split("\t", -1)(2) == "R",
      s"got:\n${lines.mkString("\n")}")
  }

  test("wire: TOAST/DDL-heavy recorded session (origin, mid-tx Relation, " +
      "multi-TOAST update, truncate) spools the exact envelope log") {
    val dir = Files.createTempDirectory("pg-conformance2").toString
    val log = s"$dir/wal.log"
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      val sbuf = new Array[Byte](slen - 4); in.readFully(sbuf)
      out.write(session("auth")); out.flush()
      var open = true
      var step = 0
      while (open && step < 10) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              val sql = new String(payload, 0, payload.length - 1,
                StandardCharsets.UTF_8)
              if (sql.startsWith("SHOW")) out.write(session("show"))
              else if (sql.startsWith("START_REPLICATION"))
                out.write(session("stream2"))
              out.flush()
              step += 1
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-replay-server-2")
    replay.setDaemon(true)
    replay.start()
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot2", "conf_pub2", log,
      flushLsn = () => 0x3008L)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 9 XLogData frames (B,O,R,I,U,R',I,T,C) + 1 keepalive
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 9)
      assert(client.keepalivesReceived.get() == 1)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").toSeq
    // R(3col), I, U(multi-TOAST), R(widened), I(4col), T — the Origin
    // frame produces no envelope line
    assert(lines.size == 6, s"expected 6 envelope lines, got:\n$lines")
    val l3 = 0x3000L.toString
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(0) == l3 && f(0)(2) == "R" && f(0)(3) == "16384")
    assert(!f(0)(7).contains("score"))
    assert(f(1)(2) == "I" &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("alice"), None))
    // multi-TOAST update against the 3-col schema: full missing mask
    assert(f(2)(2) == "U" && f(2)(8) == "name,bio" &&
      PackedRow.parse(f(2)(7)) == Vector(Some("1"), None, None))
    // mid-tx Relation re-versions the schema at the SAME commit LSN
    assert(f(3)(2) == "R" && f(3)(0) == l3 &&
      f(3)(7).contains(""""name":"score""""))
    assert(f(3)(1).toLong > f(0)(1).toLong, "ordinal must advance")
    // post-DDL insert decodes under the widened shape
    assert(f(4)(2) == "I" && PackedRow.parse(f(4)(7)) ==
      Vector(Some("7"), Some("gail"), None, Some("1.5")))
    assert(f(5)(2) == "T" && f(5)(3) == "16384")
  }

  test("wire: protocol v2 streamed-transaction session (interleaved " +
      "blocks, subxact + whole-tx aborts, a normal tx between blocks) " +
      "spools the exact envelope log via a proto_version '2' client") {
    val dir = Files.createTempDirectory("pg-conformance-v2").toString
    val log = s"$dir/wal.log"
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      val sbuf = new Array[Byte](slen - 4); in.readFully(sbuf)
      out.write(session("auth")); out.flush()
      var open = true
      var step = 0
      while (open && step < 10) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              val sql = new String(payload, 0, payload.length - 1,
                StandardCharsets.UTF_8)
              queries.add(sql)
              if (sql.startsWith("SHOW")) out.write(session("show"))
              else if (sql.startsWith("START_REPLICATION"))
                out.write(session("stream_v2"))
              out.flush()
              step += 1
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-replay-server-v2")
    replay.setDaemon(true)
    replay.start()
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot3", "conf_pub3", log,
      flushLsn = () => 0x5008L, protoVersion = 2)
    try {
      val t0 = System.currentTimeMillis()
      // 18 XLogData frames + 1 keepalive (see gen_pg_fixtures.py)
      client.start()
      while ((client.framesReceived.get() < 18 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 18,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
      // the v2 client asked for streaming
      assert(queries.toArray.map(_.toString).exists(q =>
        q.startsWith("START_REPLICATION") &&
          q.contains("proto_version '2'") && q.contains("streaming 'true'")))
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").toSeq
    // out-of-tx R, the normal tx's I, then the streamed commit's replay
    // (in-stream R + keep1 + keep2); tx 906 aborted whole → nothing;
    // subxact 910's drop1 truncated → nothing
    assert(lines.size == 5, s"expected 5 envelope lines, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(0)(3) == "16384")
    assert(f(1)(2) == "I" && f(1)(0) == 0x4000L.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("5"), Some("normal"), None))
    assert(f(2)(2) == "R" && f(2)(0) == 0x5000L.toString,
      "the streamed tx's own Relation replays at ITS commit lsn")
    assert(f(3)(2) == "I" && f(3)(0) == 0x5000L.toString &&
      PackedRow.parse(f(3)(7)) == Vector(Some("1"), Some("keep1"), None))
    assert(f(4)(2) == "I" && f(4)(0) == 0x5000L.toString &&
      PackedRow.parse(f(4)(7)) == Vector(Some("3"), Some("keep2"), None))
    assert(!lines.exists(l => l.contains("drop1") || l.contains("aborted")),
      s"aborted changes leaked into the envelope log:\n$lines")
    // ordinals dense across the replayed blocks
    assert(f(3)(1).toLong < f(4)(1).toLong)
  }

  test("wire: recorded COPY-BOTH session through ReplicationSocketClient " +
      "spools the expected envelope log") {
    val dir = Files.createTempDirectory("pg-conformance").toString
    val log = s"$dir/wal.log"
    @volatile var sawStartup: Option[String] = None
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // StartupMessage: len(4, incl itself) + payload (no type byte)
      val slen = in.readInt()
      val sbuf = new Array[Byte](slen - 4); in.readFully(sbuf)
      sawStartup = Some(new String(sbuf, StandardCharsets.ISO_8859_1))
      out.write(session("auth")); out.flush()
      // two simple queries: SHOW wal_sender_timeout, START_REPLICATION
      var step = 0
      var open = true
      while (open && step < 10) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              val sql = new String(payload, 0, payload.length - 1,
                StandardCharsets.UTF_8)
              queries.add(sql)
              if (sql.startsWith("SHOW")) out.write(session("show"))
              else if (sql.startsWith("START_REPLICATION"))
                out.write(session("stream"))
              out.flush()
              step += 1
            case 'X' => open = false // Terminate
            case _ => () // status updates ('d') etc.
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-replay-server")
    replay.setDaemon(true)
    replay.start()

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot", "conf_pub", log,
      flushLsn = () => 0x2008L)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 9 XLogData frames + 1 keepalive in the recorded stream
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 9)
      assert(client.keepalivesReceived.get() == 1)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // protocol-level expectations on what the client SENT
    assert(sawStartup.exists(s => s.contains("replication") &&
      s.contains("database")), "startup must request replication mode")
    val qs = queries.toArray.map(_.toString)
    assert(qs.exists(_.startsWith("SHOW wal_sender_timeout")))
    assert(qs.exists(q => q.startsWith("START_REPLICATION SLOT " +
      "\"conf_slot\"") && q.contains("publication_names 'conf_pub'") &&
      q.contains("messages 'true'")),
      "logical-message delivery must be requested (reference raw.rs:634)")

    // spooled envelope log: tx1 (R + 2 inserts) + tx2 (update + delete)
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").toSeq
    assert(lines.size == 5, s"expected 5 envelope lines, got:\n$lines")
    val l1 = 0x1000L.toString
    val l2 = 0x2000L.toString
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(0) == l1 && f(0)(2) == "R" && f(0)(3) == "16384")
    assert(f(1)(2) == "I" &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("alice"), None))
    assert(f(2)(2) == "I" &&
      PackedRow.parse(f(2)(7)) == Vector(Some("2"), Some("bob"),
        Some("héllo")))
    assert(f(3)(0) == l2 && f(3)(2) == "U" && f(3)(8) == "bio" &&
      PackedRow.parse(f(3)(7)) == Vector(Some("2"), Some("bob2"), None))
    assert(f(4)(2) == "D" &&
      PackedRow.parse(f(4)(6)) == Vector(Some("1"), None, None))
  }

  test("wire: protocol v3 two-phase session across a crash — status " +
      "updates never pass the undecided prepare, the restart REQUESTS " +
      "below it (durable floor), redelivery converges exactly-once at " +
      "COMMIT PREPARED") {
    val dir = Files.createTempDirectory("pg-conformance-v3").toString
    val log = s"$dir/wal.log"
    val P1 = 0x6000L; val T6 = 0x6800L; val C1 = 0x7000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // per-connection recorded status-update flush LSNs
    val flushes1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val flushes2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      def serveOne(streamStep: String, flushes:
          java.util.concurrent.ConcurrentLinkedQueue[Long],
          closeWhenFlushAt: Option[Long]): Unit = {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        val slen = in.readInt()
        in.readFully(new Array[Byte](slen - 4))
        out.write(session("auth")); out.flush()
        var open = true
        while (open) {
          val t = try in.readByte().toChar
                  catch { case _: Throwable => open = false; ' ' }
          if (open) {
            val len = in.readInt()
            val payload = new Array[Byte](len - 4); in.readFully(payload)
            t match {
              case 'Q' =>
                val sql = new String(payload, 0, payload.length - 1,
                  StandardCharsets.UTF_8)
                if (sql.startsWith("SHOW")) out.write(session("show"))
                else if (sql.startsWith("START_REPLICATION")) {
                  startQueries.add(sql)
                  out.write(session(streamStep))
                }
                out.flush()
              case 'd' if payload.nonEmpty && payload(0) == 'r' =>
                val b = java.nio.ByteBuffer.wrap(payload, 1,
                  payload.length - 1)
                b.getLong // write
                val flush = b.getLong
                flushes.add(flush)
                // "crash": the server drops the connection once the
                // capped flush arrives
                if (closeWhenFlushAt.contains(flush)) open = false
              case 'X' => open = false
              case _ => ()
            }
          }
        }
        try sock.close() catch { case _: Throwable => () }
      }
      // session A: prepare + unrelated commit, die at the capped flush;
      // session B: redelivery + COMMIT PREPARED
      serveOne("stream_v3a", flushes1, Some(P1 - 1))
      serveOne("stream_v3b", flushes2, None)
    }, "pg-replay-server-v3")
    replay.setDaemon(true)
    replay.start()

    // downstream durable progress = max commit LSN spooled so far (the
    // checkpoint shape) — it legitimately PASSES the prepare once the
    // unrelated transaction lands
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot4", "conf_pub4", log,
      flushLsn = () => durableProgress(), protoVersion = 3)
    try {
      val t0 = System.currentTimeMillis()
      client.start(reconnectBackoffMs = 100)
      // wait for the full story: reconnect happened and the decision's
      // flush (≥ C1) was reported on the second connection
      while (!flushes2.toArray.exists(
          _.asInstanceOf[Long] >= C1) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
      assert(client.lastError.isEmpty || client.reconnects.get() >= 1,
        s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 2, s"expected a reconnect, got $qs")
    assert(qs.forall(q => q.contains("two_phase 'true'") &&
      q.contains("streaming 'true'")), "v3 must request two_phase")
    // ON THE WIRE: no session-A status update ever passed the prepare,
    // even though durable progress reached T6 > P1
    val f1 = flushes1.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(f1.nonEmpty && f1.max == P1 - 1,
      s"session A must cap the flush at ${P1 - 1}: $f1")
    // ON THE WIRE: the restarted session REQUESTED a start position at
    // or below the floor — raw durable progress (T6) would have made a
    // real server skip the prepared transaction's redelivery
    val req2 = qs(1)
    assert(req2.contains(ReplicationSocketClient.formatLsn(P1 - 1)),
      s"restart must request the durable floor, got: $req2")
    // after COMMIT PREPARED the flush advances past the decision
    val f2 = flushes2.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(f2.exists(_ >= C1), s"decision must release the cap: $f2")
    // and the durable floor file is gone (no stale cap for a later run)
    assert(!Files.exists(Paths.get(log + ".prepare_floor")),
      "the floor file must clear at the decision")

    // envelope log: the prepared transaction applies EXACTLY ONCE (the
    // redelivered BeginPrepare reset the spool) at the commit LSN; the
    // redelivered unrelated transaction is the documented at-least-once
    // tail (byte-identical lines the downstream replay guards collapse)
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val pLines = lines.filter(l => l.contains("p1") || l.contains("p2"))
    assert(pLines.size == 2,
      s"prepared tx must apply exactly once:\n$lines")
    assert(pLines.forall(_.split("\t")(0) == C1.toString),
      "prepared rows must carry the COMMIT PREPARED lsn")
    val normal = lines.filter(_.contains("normal"))
    assert(normal.size == 2 && normal.distinct.size == 1,
      "the redelivered tail must be byte-identical (replay-collapsible)")
  }

  /** Replay server for multi-connection wire tests: serves the given
    * session steps to consecutive connections; each step optionally
    * drops the connection once a status update reports the given flush
    * LSN (the crash). Records START_REPLICATION SQL and per-connection
    * flush LSNs. */
  private def replayConnections(server: ServerSocket,
      steps: Seq[(String, Option[Long])],
      startQueries: java.util.concurrent.ConcurrentLinkedQueue[String],
      flushes: Seq[java.util.concurrent.ConcurrentLinkedQueue[Long]])
      : Thread = {
    val th = new Thread(() => {
      steps.zip(flushes).foreach { case ((streamStep, closeAt), fl) =>
        try {
          val sock = server.accept()
          sock.setTcpNoDelay(true)
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          val slen = in.readInt()
          in.readFully(new Array[Byte](slen - 4))
          out.write(session("auth")); out.flush()
          var open = true
          while (open) {
            val t = try in.readByte().toChar
                    catch { case _: Throwable => open = false; ' ' }
            if (open) {
              val len = in.readInt()
              val payload = new Array[Byte](len - 4); in.readFully(payload)
              t match {
                case 'Q' =>
                  val sql = new String(payload, 0, payload.length - 1,
                    StandardCharsets.UTF_8)
                  if (sql.startsWith("SHOW")) out.write(session("show"))
                  else if (sql.startsWith("START_REPLICATION")) {
                    startQueries.add(sql)
                    out.write(session(streamStep))
                  }
                  out.flush()
                case 'd' if payload.nonEmpty && payload(0) == 'r' =>
                  val b = java.nio.ByteBuffer.wrap(payload, 1,
                    payload.length - 1)
                  b.getLong
                  val flush = b.getLong
                  fl.add(flush)
                  if (closeAt.contains(flush)) open = false
                case 'X' => open = false
                case _ => ()
              }
            }
          }
          try sock.close() catch { case _: Throwable => () }
        } catch { case _: Throwable => () }
      }
    }, "pg-replay-multi")
    th.setDaemon(true)
    th.start()
    th
  }

  test("wire: an Origin inside the first stream segment filters the " +
      "FOREIGN streamed transaction through a dropForeignOrigins " +
      "proto-2 client; the interleaved native one applies") {
    val dir = Files.createTempDirectory("pg-conformance-v2o").toString
    val log = s"$dir/wal.log"
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v2_origin" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot5", "conf_pub5", log,
      flushLsn = () => 0x8108L, protoVersion = 2,
      dropForeignOrigins = true)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 10 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 10,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    // R + the native insert ONLY — the foreign streamed tx must filter
    assert(lines.size == 2, s"expected R + native line, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" && f(1)(0) == 0x8100L.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("2"), Some("native"), None))
    assert(!lines.exists(_.contains("foreign")),
      s"foreign-origin streamed data leaked:\n$lines")
  }

  test("wire: v3 + STREAMING across a crash — StreamPrepare holds the " +
      "flush cap and the durable floor; redelivery + COMMIT PREPARED " +
      "applies the streamed prepared tx exactly once") {
    val dir = Files.createTempDirectory("pg-conformance-v3s").toString
    val log = s"$dir/wal.log"
    val P2 = 0x9000L; val C2 = 0xA000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val fl2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server,
      Seq("stream_v3s_a" -> Some(P2 - 1), "stream_v3s_b" -> None),
      startQueries, Seq(fl1, fl2))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot6", "conf_pub6", log,
      flushLsn = () => durableProgress(), protoVersion = 3)
    try {
      val t0 = System.currentTimeMillis()
      client.start(reconnectBackoffMs = 100)
      while (!fl2.toArray.exists(_.asInstanceOf[Long] >= C2) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val f1 = fl1.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(f1.nonEmpty && f1.max == P2 - 1,
      s"session A must cap the flush below the streamed prepare: $f1")
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 2 &&
      qs(1).contains(ReplicationSocketClient.formatLsn(P2 - 1)),
      s"restart must request the durable floor: $qs")
    assert(fl2.toArray.exists(_.asInstanceOf[Long] >= C2))
    assert(!Files.exists(Paths.get(log + ".prepare_floor")))
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val sp = lines.filter(_.contains("sp1"))
    assert(sp.size == 1 && sp.head.split("\t")(0) == C2.toString,
      s"streamed prepared tx must apply exactly once at COMMIT " +
        s"PREPARED:\n$lines")
  }

  test("wire: a CASCADE truncate inside a stream block spools with the " +
      "block and replays at StreamCommit, in position, one line per " +
      "truncated relation") {
    val dir = Files.createTempDirectory("pg-conformance-v2t").toString
    val log = s"$dir/wal.log"
    val TA = 0xB000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v2_truncate" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot7", "conf_pub7", log,
      flushLsn = () => TA + 8, protoVersion = 2)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 7 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 7 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 7,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val f = lines.map(_.split("\t", -1))
    // R, insert(pre), truncate(users), truncate(16385), insert(post) —
    // all data lines at the StreamCommit LSN, ordinals preserving the
    // in-block position of the truncate BETWEEN the inserts
    assert(lines.size == 5, s"expected 5 lines, got:\n$lines")
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("pre"), None))
    assert(f(2)(2) == "T" && f(2)(3) == "16384")
    assert(f(3)(2) == "T" && f(3)(3) == "16385",
      "CASCADE must truncate every listed relation")
    assert(f(4)(2) == "I" &&
      PackedRow.parse(f(4)(7)) == Vector(Some("2"), Some("post"), None))
    assert(f.drop(1).forall(_(0) == TA.toString),
      "replayed lines must carry the StreamCommit LSN")
    // one Truncate message = ONE transaction position (its lines share
    // the ordinal); order across messages must survive the replay
    val ords = f.drop(1).map(_(1).toLong)
    assert(ords == ords.sorted && ords == Seq(0L, 1L, 1L, 2L),
      s"in-block order must survive the replay: $ords")
  }

  test("wire: a keepalive-ONLY idle session crossing wal_sender_timeout " +
      "stays alive — the client replies to reply-requested keepalives, " +
      "volunteers status updates inside the 0.6×timeout deadline, and " +
      "appends nothing") {
    val dir = Files.createTempDirectory("pg-conformance-idle").toString
    val log = s"$dir/wal.log"
    val statusUpdates = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        val slen = in.readInt()
        in.readFully(new Array[Byte](slen - 4))
        out.write(session("auth")); out.flush()
        var open = true
        while (open) {
          val t = try in.readByte().toChar
                  catch { case _: Throwable => open = false; ' ' }
          if (open) {
            val len = in.readInt()
            val payload = new Array[Byte](len - 4); in.readFully(payload)
            t match {
              case 'Q' =>
                val sql = new String(payload, 0, payload.length - 1,
                  StandardCharsets.UTF_8)
                // a ONE-SECOND sender timeout: the client must
                // heartbeat every ≤600 ms on its own
                if (sql.startsWith("SHOW")) out.write(session("show_1s"))
                else if (sql.startsWith("START_REPLICATION"))
                  out.write(session("stream_idle"))
                out.flush()
              case 'd' if payload.nonEmpty && payload(0) == 'r' =>
                statusUpdates.incrementAndGet()
              case 'X' => open = false
              case _ => ()
            }
          }
        }
        try sock.close() catch { case _: Throwable => () }
      } catch { case _: Throwable => () }
    }, "pg-replay-idle")
    replay.setDaemon(true); replay.start()
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot8", "conf_pub8", log,
      flushLsn = () => 0L)
    try {
      client.start()
      val t0 = System.currentTimeMillis()
      // idle ACROSS the 1s sender timeout: ~2.5s with no data frames
      while (System.currentTimeMillis() - t0 < 2500) Thread.sleep(50)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
      assert(client.reconnects.get() == 0,
        "idle session must not reconnect")
      assert(client.keepalivesReceived.get() >= 3,
        s"server keepalives lost: ${client.keepalivesReceived.get()}")
      // 2 reply-requested keepalives + at least 2 self-paced heartbeats
      // over 2.5s idle at a ≤600ms deadline
      assert(statusUpdates.get() >= 4,
        s"idle heartbeats missing: ${statusUpdates.get()} status updates")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // nothing was appended and no floor was persisted
    assert(!Files.exists(Paths.get(log)) ||
      Files.size(Paths.get(log)) == 0L, "idle session must append nothing")
    assert(!Files.exists(Paths.get(log + ".prepare_floor")))
  }

  test("wire: an EMPTY prepared transaction (no published rows) holds " +
      "the cap while undecided, releases it at its line-less COMMIT " +
      "PREPARED, and leaves no trace in the log") {
    val dir = Files.createTempDirectory("pg-conformance-v3e").toString
    val log = s"$dir/wal.log"
    val PE = 0xE000L; val TC = 0xE800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v3_empty" -> None),
      startQueries, Seq(fl))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot10", "conf_pub10", log,
      flushLsn = () => durableProgress(), protoVersion = 3)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // the trailing normal tx's flush confirms once the decision freed
      // the cap (while undecided the cap held every report below PE)
      while (!fl.toArray.exists(_.asInstanceOf[Long] >= TC) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    assert(fl.toArray.exists(_.asInstanceOf[Long] >= TC),
      s"the empty decision must release the cap: ${fl.toArray.toSeq}")
    // the floor file cleared at the decision
    assert(!Files.exists(Paths.get(log + ".prepare_floor")),
      "the floor file must clear at the (empty) decision")
    // the log holds ONLY the relation record and the trailing normal tx
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 2, s"expected R + trailing insert only:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" && f(1)(0) == TC.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("9"), Some("after"), None))
  }

  test("wire: a transactional logical message inside a stream block " +
      "spools with the block and replays at StreamCommit in position; " +
      "an unknown-prefix streamed message is discarded at replay") {
    val dir = Files.createTempDirectory("pg-conformance-v2m").toString
    val log = s"$dir/wal.log"
    val TD = 0xF000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v2_msg" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot12", "conf_pub12", log,
      flushLsn = () => TD + 8, protoVersion = 2)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 8 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 8 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 8,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val f = lines.map(_.split("\t", -1))
    // base R, then at the StreamCommit LSN: insert(pre), the graft_ddl
    // message as a schema record, insert(post) — the other_ext message
    // replays but the DDL channel discards it (reference
    // apply.rs:2160-2276 processes only the engine prefix)
    assert(lines.size == 4, s"expected 4 lines, got:\n$lines")
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("pre"), None))
    assert(f(2)(2) == "R" && f(2)(3) == "16384" &&
      f(2)(7).contains("\"tableId\":16384"),
      s"the streamed DDL message must replay as a schema record: $lines")
    // schema version keyed by the message's OWN LSN, sequence position
    // at the commit like every replayed line
    assert(f(2)(5) == 0xF100L.toString,
      s"DDL schema version must key by the message LSN: ${f(2).toSeq}")
    assert(f(3)(2) == "I" &&
      PackedRow.parse(f(3)(7)) == Vector(Some("2"), Some("post"), None))
    assert(f.drop(1).forall(_(0) == TD.toString),
      "replayed lines must carry the StreamCommit LSN")
    val ords = f.drop(1).map(_(1).toLong)
    assert(ords == ords.sorted && ords.distinct == ords,
      s"in-block order must survive the replay: $ords")
  }

  test("wire: an EMPTY stream block commits line-less — StreamStart/" +
      "StreamStop with no changes, then StreamCommit advances the " +
      "flush and the session stays healthy") {
    val dir = Files.createTempDirectory("pg-conformance-v2e").toString
    val log = s"$dir/wal.log"
    val TE = 0xF800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v2_empty" -> None),
      startQueries, Seq(fl))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot13", "conf_pub13", log,
      flushLsn = () => durableProgress(), protoVersion = 2)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while (!fl.toArray.exists(_.asInstanceOf[Long] >= TE + 0x18) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    assert(fl.toArray.exists(_.asInstanceOf[Long] >= TE + 0x18),
      s"flush must advance past the trailing commit: ${fl.toArray.toSeq}")
    // only the base relation record and the trailing normal insert —
    // the empty streamed transaction leaves no data lines and no spool
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 2,
      s"expected R + trailing insert only:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" && f(1)(0) == (TE + 0x18).toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("5"), Some("after"), None))
  }

  test("wire: TWO interleaved prepared transactions decided out of " +
      "order — the flush cap holds at the EARLIEST undecided prepare " +
      "through the later gid's commit, and releases at the earlier " +
      "gid's rollback") {
    val dir = Files.createTempDirectory("pg-conformance-v3two").toString
    val log = s"$dir/wal.log"
    val PA = 0x10000L; val CB = 0x13000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v3_two_gids" -> None),
      startQueries, Seq(fl))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot14", "conf_pub14", log,
      flushLsn = () => durableProgress(), protoVersion = 3)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while (!fl.toArray.exists(_.asInstanceOf[Long] >= CB) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val flushes = fl.toArray.map(_.asInstanceOf[Long]).toSeq
    // the cap sat exactly below the EARLIEST prepare while any gid was
    // undecided — including AFTER the later gid's COMMIT PREPARED
    // appended its lines (durable progress was already at gb's commit)
    assert(flushes.contains(PA - 1),
      s"the min-floor cap must report PA-1 while ga is undecided: $flushes")
    assert(flushes.exists(_ >= CB),
      s"the rollback of ga must release the cap: $flushes")
    assert(!flushes.exists(v => v > PA - 1 && v < CB),
      s"no flush may land between the cap and the release: $flushes")
    // the rollback cleared the floor file; the log holds the base R,
    // the normal insert, and gb's committed line — never ga's
    assert(!Files.exists(Paths.get(log + ".prepare_floor")))
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val f = lines.map(_.split("\t", -1))
    assert(lines.size == 3, s"expected R + normal + b1:\n$lines")
    assert(f(0)(2) == "R")
    assert(PackedRow.parse(f(1)(7)) ==
      Vector(Some("5"), Some("normal"), None))
    assert(f(2)(0) == CB.toString && PackedRow.parse(f(2)(7)) ==
      Vector(Some("2"), Some("b1"), None),
      s"gb applies exactly once at its COMMIT PREPARED: $lines")
    assert(!lines.exists(_.contains("a1")),
      "the rolled-back ga must leave no trace")
  }

  test("wire: SERVER-INITIATED CopyDone (wal sender shutdown) ends the " +
      "stream gracefully — no error, one reconnect, resume from the " +
      "durable flush, each transaction applied exactly once") {
    val dir = Files.createTempDirectory("pg-conformance-cd").toString
    val log = s"$dir/wal.log"
    val TG = 0x15000L; val TH = 0x15800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val fl2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server,
      Seq("stream_copydone_a" -> None, "stream_copydone_b" -> None),
      startQueries, Seq(fl1, fl2))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot15", "conf_pub15", log,
      flushLsn = () => durableProgress())
    try {
      val t0 = System.currentTimeMillis()
      client.start(reconnectBackoffMs = 100)
      while (!fl2.toArray.exists(_.asInstanceOf[Long] >= TH) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
      // a graceful sender shutdown is NOT an error — the only session
      // teardown the client may record is the reconnect itself
      assert(client.reconnects.get() == 1,
        s"expected exactly one reconnect: ${client.reconnects.get()}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    assert(fl2.toArray.exists(_.asInstanceOf[Long] >= TH),
      s"the second session must resume and confirm: ${fl2.toArray.toSeq}")
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 2, s"two START_REPLICATION requests: ${qs.toSeq}")
    // resume position: at least the durable flush of session A
    assert(qs(1).contains(ReplicationSocketClient.formatLsn(TG)),
      s"the restart must request the durable flush: ${qs(1)}")
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.count(_.contains("one")) == 1 &&
      lines.count(_.contains("two")) == 1,
      s"each transaction applies exactly once across the CopyDone:\n$lines")
  }

  test("wire: a SILENTLY dead server (no keepalives, socket held open) " +
      "trips the receive deadline and the client reconnects — the " +
      "wal_receiver_timeout analog") {
    val dir = Files.createTempDirectory("pg-conformance-dead").toString
    val log = s"$dir/wal.log"
    val connections = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      // two consecutive connections; each serves the idle step (with a
      // 1 s wal_sender_timeout → 10 s receive floor) then goes SILENT
      // with the socket held open — the first must be abandoned by the
      // client's receive deadline, not by any server action
      (1 to 2).foreach { _ =>
        try {
          val sock = server.accept()
          connections.incrementAndGet()
          sock.setTcpNoDelay(true)
          val in = new DataInputStream(sock.getInputStream)
          val out = new DataOutputStream(sock.getOutputStream)
          val slen = in.readInt()
          in.readFully(new Array[Byte](slen - 4))
          out.write(session("auth")); out.flush()
          var open = true
          while (open) {
            val t = try in.readByte().toChar
                    catch { case _: Throwable => open = false; ' ' }
            if (open) {
              val len = in.readInt()
              val payload = new Array[Byte](len - 4); in.readFully(payload)
              t match {
                case 'Q' =>
                  val sql = new String(payload, 0, payload.length - 1,
                    StandardCharsets.UTF_8)
                  if (sql.startsWith("SHOW")) out.write(session("show_1s"))
                  else if (sql.startsWith("START_REPLICATION"))
                    out.write(session("stream_idle"))
                  out.flush()
                case 'X' => open = false
                case _ => () // swallow status updates; NEVER reply
              }
            }
          }
          try sock.close() catch { case _: Throwable => () }
        } catch { case _: Throwable => () }
      }
    }, "pg-replay-dead")
    replay.setDaemon(true); replay.start()
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot11", "conf_pub11", log,
      flushLsn = () => 0L)
    try {
      client.start(reconnectBackoffMs = 100)
      val t0 = System.currentTimeMillis()
      // the receive deadline (10 s floor at a 1 s sender timeout) must
      // abandon the dead connection and dial the second
      while (connections.get() < 2 &&
        System.currentTimeMillis() - t0 < 30000) Thread.sleep(100)
      assert(connections.get() >= 2,
        "client never abandoned the silently dead connection")
      assert(client.reconnects.get() >= 1,
        s"expected a reconnect, got ${client.reconnects.get()}")
      // the reconnected session processes the redelivered keepalives
      val k0 = client.keepalivesReceived.get()
      val d1 = System.currentTimeMillis() + 10000
      while (client.keepalivesReceived.get() < k0 + 1 &&
        System.currentTimeMillis() < d1) Thread.sleep(50)
      assert(client.keepalivesReceived.get() >= 4,
        s"reconnected session silent: ${client.keepalivesReceived.get()}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
  }

  test("wire: v3 ROLLBACK PREPARED after a crash — the redelivered " +
      "prepare vanishes without a trace, the durable floor clears, and " +
      "the flush advances past the rollback") {
    val dir = Files.createTempDirectory("pg-conformance-v3r").toString
    val log = s"$dir/wal.log"
    val P3 = 0xC000L; val TB = 0xC800L; val R1 = 0xD000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val fl2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server,
      Seq("stream_v3r_a" -> Some(P3 - 1), "stream_v3r_b" -> None),
      startQueries, Seq(fl1, fl2))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot9", "conf_pub9", log,
      flushLsn = () => durableProgress(), protoVersion = 3)
    try {
      val t0 = System.currentTimeMillis()
      client.start(reconnectBackoffMs = 100)
      // the rollback releases the cap: the flush climbs to durable
      // progress (TB, the unrelated commit) on the second connection
      while (!fl2.toArray.exists(_.asInstanceOf[Long] >= TB) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // session A: capped below the undecided prepare despite durable
    // progress at TB > P3
    val f1 = fl1.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(f1.nonEmpty && f1.max == P3 - 1,
      s"session A must cap the flush at ${P3 - 1}: $f1")
    // the restart requested the durable floor
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 2 &&
      qs(1).contains(ReplicationSocketClient.formatLsn(P3 - 1)),
      s"restart must request the durable floor: $qs")
    // the rollback released the cap without any commit line for it
    val f2 = fl2.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(f2.exists(_ >= TB), s"rollback must release the cap: $f2")
    assert(!Files.exists(Paths.get(log + ".prepare_floor")),
      "the floor file must clear at the rollback decision")
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(!lines.exists(_.contains("doomed")),
      s"rolled-back prepared rows must never surface:\n$lines")
    val normal = lines.filter(_.contains("normal"))
    assert(normal.size == 2 && normal.distinct.size == 1,
      "the redelivered tail must be byte-identical (replay-collapsible)")
  }

  test("wire: BINARY tuple mode (`binary 'true'`) — a type-diverse " +
      "insert/update decodes to the same canonical text forms as text " +
      "mode, TOAST placeholders included") {
    val dir = Files.createTempDirectory("pg-conformance-bin").toString
    val log = s"$dir/wal.log"
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_binary" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_bin", "conf_pub_bin", log,
      flushLsn = () => 0x16008L, binaryMode = true)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 5 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 5 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 5,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // the client must NEGOTIATE binary mode on the wire
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 1 && qs(0).contains("binary 'true'"),
      s"START_REPLICATION must request binary mode: $qs")

    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 3, s"expected R + I + U, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(0)(3) == "16392")
    // the insert: every cell arrived binary, decodes to PG text forms
    assert(f(1)(2) == "I")
    assert(PackedRow.parse(f(1)(7)) == Vector(
      Some("7"), Some("t"), Some("3000000000"), Some("-2.25"),
      Some("héllo"), Some("""{"a":1}"""), Some("2022-10-16"),
      Some("2000-01-01 00:00:00+00"),
      Some("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"), Some("1234.5678")))
    // the update: binary key image, binary new values, TOAST mask
    assert(f(2)(2) == "U")
    assert(PackedRow.parse(f(2)(6)).head == Some("7"),
      "binary key image must decode")
    assert(PackedRow.parse(f(2)(7)) == Vector(
      Some("7"), Some("f"), None, None, Some("rené"), None, None, None,
      None, Some("-0.001")))
    assert(f(2)(8) == "cnt,ratio,born,at,uid",
      s"TOAST mask must name the unchanged columns, got '${f(2)(8)}'")
  }

  test("wire: BINARY cells inside a v2 STREAM block — the spool holds " +
      "raw binary frames and converts at StreamCommit replay through " +
      "a proto-2 binary-mode client") {
    val dir = Files.createTempDirectory("pg-conformance-v2bin").toString
    val log = s"$dir/wal.log"
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v2_binary" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_v2b", "conf_pub_v2b", log,
      flushLsn = () => 0x17808L, protoVersion = 2, binaryMode = true)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 5 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 5 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 5,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.size == 1 && qs(0).contains("streaming 'true'") &&
      qs(0).contains("binary 'true'"),
      s"both options must be negotiated together: $qs")
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 2, s"expected R + I at StreamCommit, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    // both lines carry the StreamCommit LSN (replayed whole)
    assert(f.forall(_(0) == 0x17800L.toString))
    assert(f(0)(2) == "R" && f(1)(2) == "I")
    assert(PackedRow.parse(f(1)(7)) == Vector(
      Some("7"), Some("t"), Some("3000000000"), Some("-2.25"),
      Some("héllo"), Some("""{"a":1}"""), Some("2022-10-16"),
      Some("2000-01-01 00:00:00+00"),
      Some("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"), Some("1234.5678")))
  }

  test("wire: protocol v4 (streaming 'parallel') — extended Stream " +
      "Abort decodes, the aborted subtransaction drops, replay parity " +
      "with v2 at StreamCommit") {
    val dir = Files.createTempDirectory("pg-conformance").toString
    val log = s"$dir/wal.log"
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      in.readFully(new Array[Byte](slen - 4))
      out.write(session("auth")); out.flush()
      var open = true
      while (open) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              val sql = new String(payload, 0, payload.length - 1,
                StandardCharsets.UTF_8)
              queries.add(sql)
              if (sql.startsWith("SHOW")) out.write(session("show"))
              else if (sql.startsWith("START_REPLICATION"))
                out.write(session("stream_v4"))
              out.flush()
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-v4-replay")
    replay.setDaemon(true)
    replay.start()

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot", "conf_pub", log,
      flushLsn = () => 0L, protoVersion = 4)
    try {
      client.start()
      val t0 = System.currentTimeMillis()
      // 12 XLogData frames + 1 keepalive in the recorded v4 stream
      while ((client.framesReceived.get() < 12 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 12,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // negotiation: v4 requests parallel streaming (two_phase rides
    // along at >= 3)
    val start = queries.toArray.map(_.toString)
      .find(_.startsWith("START_REPLICATION")).get
    assert(start.contains("proto_version '4'") &&
      start.contains("streaming 'parallel'") &&
      start.contains("two_phase 'true'"), start)
    // replay parity with v2: R + keep1 + keep2 at the commit LSN; the
    // v4-aborted subtransaction's row never reaches the envelope log
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 3, s"expected R + 2 inserts, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f.forall(_(0) == 0x18800L.toString),
      "all replayed lines carry the StreamCommit LSN")
    assert(f(0)(2) == "R" && f(1)(2) == "I" && f(2)(2) == "I")
    assert(PackedRow.parse(f(1)(7)) ==
      Vector(Some("1"), Some("keep1"), None))
    assert(PackedRow.parse(f(2)(7)) ==
      Vector(Some("3"), Some("keep2"), None))
    assert(!lines.exists(_.contains("drop1")),
      s"v4-aborted subtransaction leaked:\n$lines")
  }

  test("wire: NoticeResponse + BackendKeyData during startup/auth are " +
      "skipped; the session proceeds to a working simple-query surface") {
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      in.readFully(new Array[Byte](slen - 4))
      // notice BEFORE AuthenticationOk, ParameterStatus + BackendKeyData
      // after — all informational, all byte-pinned
      out.write(session("auth_notice")); out.flush()
      var open = true
      while (open) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' => out.write(session("show")); out.flush()
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-auth-notice-replay")
    replay.setDaemon(true)
    replay.start()

    val conn = new PgWireConnection("127.0.0.1", server.getLocalPort,
      "graft", "postgres", "")
    try {
      conn.connect() // must not trip on the pre-auth notice
      val rows = conn.queryRows("SHOW wal_sender_timeout")
      assert(rows == Seq(IndexedSeq(Some("60s"))), rows)
    } finally {
      try conn.close() catch { case _: Throwable => () }
      try server.close() catch { case _: Throwable => () }
    }
  }

  test("wire: async NoticeResponse + ParameterStatus between " +
      "START_REPLICATION and CopyBothResponse are skipped — a live " +
      "server interleaves these anywhere") {
    val dir = Files.createTempDirectory("pg-conformance").toString
    val log = s"$dir/wal.log"
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      in.readFully(new Array[Byte](slen - 4))
      out.write(session("auth")); out.flush()
      var open = true
      while (open) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              val sql = new String(payload, 0, payload.length - 1,
                StandardCharsets.UTF_8)
              if (sql.startsWith("SHOW")) out.write(session("show"))
              else if (sql.startsWith("START_REPLICATION")) {
                // NOTICE + ParameterStatus FIRST, then the stream
                out.write(session("notices"))
                out.write(session("stream"))
              }
              out.flush()
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-notice-replay")
    replay.setDaemon(true)
    replay.start()

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot", "conf_pub", log,
      flushLsn = () => 0L)
    try {
      client.start()
      val t0 = System.currentTimeMillis()
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 9,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    assert(lines.length == 5, s"expected 5 envelope lines:\n${lines.toSeq}")
  }

  test("wire: ErrorResponse MID-binary-COPY surfaces loudly through " +
      "the PGCOPY reassembler — no hang on the half row it was " +
      "waiting to complete") {
    val server = new ServerSocket(0)
    val replay = new Thread(() => {
      val sock = server.accept()
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val slen = in.readInt()
      in.readFully(new Array[Byte](slen - 4))
      out.write(session("auth")); out.flush()
      var open = true
      while (open) {
        val t = try in.readByte().toChar
                catch { case _: Throwable => open = false; ' ' }
        if (open) {
          val len = in.readInt()
          val payload = new Array[Byte](len - 4); in.readFully(payload)
          t match {
            case 'Q' =>
              // the recorded session: header + row1 + HALF of row2,
              // then ErrorResponse 57P01, then ReadyForQuery
              out.write(session("copy_binary_error")); out.flush()
            case 'X' => open = false
            case _ => ()
          }
        }
      }
      try sock.close() catch { case _: Throwable => () }
    }, "pg-copy-error-replay")
    replay.setDaemon(true)
    replay.start()

    val conn = new PgWireConnection("127.0.0.1", server.getLocalPort,
      "graft", "postgres", "")
    conn.connect()
    try {
      val it = PgCopy.copyBinaryRows(conn,
        "COPY public.t TO STDOUT (FORMAT binary)", nCols = 2)
      // the first (complete) row parses; pulling the second must FAIL
      // with the server's error, promptly — a reassembler that keeps
      // waiting for the missing 3 bytes of the half cell would hang
      // this test into its timeout
      val first = it.next()
      assert(new String(first(1).get, StandardCharsets.UTF_8) == "ann")
      val e = intercept[java.io.IOException] { it.hasNext }
      assert(e.getMessage.contains("COPY failed") &&
        e.getMessage.contains("administrator command"), e.getMessage)
    } finally {
      try conn.close() catch { case _: Throwable => () }
      try server.close() catch { case _: Throwable => () }
    }
  }

  test("wire: START_REPLICATION refused with SQLSTATE 55006 (slot held " +
      "by a rival worker) is NAMED and RETRYABLE — the client backs " +
      "off, retries, and streams once the rival releases") {
    val dir = Files.createTempDirectory("pg-conformance").toString
    val log = s"$dir/wal.log"
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val startAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = new ServerSocket(0)
    val accept = new Thread(() => {
      var live = true
      while (live) {
        val sock = try server.accept()
                   catch { case _: Throwable => live = false; null }
        if (sock != null) {
          val worker = new Thread(() => {
            sock.setTcpNoDelay(true)
            val in = new DataInputStream(sock.getInputStream)
            val out = new DataOutputStream(sock.getOutputStream)
            val slen = in.readInt()
            in.readFully(new Array[Byte](slen - 4))
            out.write(session("auth")); out.flush()
            var open = true
            while (open) {
              val t = try in.readByte().toChar
                      catch { case _: Throwable => open = false; ' ' }
              if (open) {
                val len = in.readInt()
                val payload = new Array[Byte](len - 4)
                in.readFully(payload)
                t match {
                  case 'Q' =>
                    val sql = new String(payload, 0, payload.length - 1,
                      StandardCharsets.UTF_8)
                    queries.add(sql)
                    if (sql.startsWith("SHOW")) out.write(session("show"))
                    else if (sql.startsWith("START_REPLICATION")) {
                      // first attempt: rival holds the slot (55006);
                      // the retry gets the recorded stream
                      if (startAttempts.incrementAndGet() == 1)
                        out.write(session("slot_busy"))
                      else out.write(session("stream"))
                    }
                    out.flush()
                  case 'X' => open = false
                  case _ => ()
                }
              }
            }
            try sock.close() catch { case _: Throwable => () }
          }, "pg-slot-busy-session")
          worker.setDaemon(true)
          worker.start()
        }
      }
    }, "pg-slot-busy-accept")
    accept.setDaemon(true)
    accept.start()

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot", "conf_pub", log,
      flushLsn = () => 0L)
    try {
      // must NOT throw: 55006 is a retryable handover condition
      client.start(reconnectBackoffMs = 100)
      val t0 = System.currentTimeMillis()
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 9,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.slotBusyRetries.get() == 1,
        "exactly one named slot-busy refusal expected")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    assert(startAttempts.get() == 2,
      s"one refused + one successful attempt, got ${startAttempts.get()}")
    // the spooled envelope log is the same as the clean session's
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    assert(lines.length == 5, s"expected 5 envelope lines:\n${lines.toSeq}")
  }

  test("wire: a RENAME-shaped Relation mid-stream (same relid, same " +
      "column count, one changed name) re-versions the schema — and the " +
      "ordinal-keyed diff of the two spooled R records is a RENAME, not " +
      "the add+drop that forked destination columns") {
    val dir = Files.createTempDirectory("pg-conformance-ren").toString
    val log = s"$dir/wal.log"
    val TB1 = 0x19000L; val TB2 = 0x19800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_rename" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_ren", "conf_pub_ren", log,
      flushLsn = () => TB2 + 8)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while ((client.framesReceived.get() < 8 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 8,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    // R(name), I, R(full_name), U — two schema versions on the wire
    assert(lines.size == 4, s"expected 4 envelope lines, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(0)(0) == TB1.toString &&
      f(0)(7).contains(""""name":"name""""))
    assert(f(1)(2) == "I" &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("alice"), None))
    assert(f(2)(2) == "R" && f(2)(0) == TB2.toString &&
      f(2)(7).contains(""""name":"full_name"""") &&
      !f(2)(7).contains(""""name":"name""""))
    assert(f(3)(2) == "U" && f(3)(0) == TB2.toString &&
      PackedRow.parse(f(3)(7)) == Vector(Some("1"), Some("ada"), None))
    // the CLIENT-side record chain must describe this DDL as a RENAME:
    // feed both R records through the same parse the pipeline uses and
    // diff them ordinally (wire Relations carry no attnum → positional)
    val v1 = graft.pipeline.CdcPipeline.parseRelation(16384L,
      f(0)(0).toLong, f(0)(7))
    val v2 = graft.pipeline.CdcPipeline.parseRelation(16384L,
      f(2)(0).toLong, f(2)(7))
    val diff = graft.core.SchemaDiff.between(v1, v2)
    assert(diff.renames == Seq(("name", "full_name")),
      s"expected a rename, got $diff")
    assert(diff.added.isEmpty && diff.dropped.isEmpty,
      s"a rename must NOT surface as add+drop: $diff")
  }

  test("wire: v4 streaming 'parallel' × two-phase — a parallel-streamed " +
      "tx with an extended-Stream-Abort subxact ends in StreamPrepare " +
      "(flush capped below the undecided prepare while a later commit " +
      "passes it), then COMMIT PREPARED replays the survivors") {
    val dir = Files.createTempDirectory("pg-conformance-v4p").toString
    val log = s"$dir/wal.log"
    val PB = 0x1A000L; val TC = 0x1A800L; val CB = 0x1B000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v4_2pc" -> None),
      startQueries, Seq(fl))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_v4p", "conf_pub_v4p", log,
      flushLsn = () => durableProgress(), protoVersion = 4)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while (!fl.toArray.exists(_.asInstanceOf[Long] >= CB) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // v4 negotiation on the wire
    val qs = startQueries.toArray.map(_.toString)
    assert(qs.nonEmpty && qs.head.contains("proto_version '4'") &&
      qs.head.contains("streaming 'parallel'") &&
      qs.head.contains("two_phase 'true'"), qs.toSeq)
    // the undecided StreamPrepare capped the flush below PB even while
    // the unrelated commit at TC advanced durable progress past it
    val reports = fl.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(reports.exists(_ == PB - 1),
      s"flush must cap at prepare-1 while undecided: $reports")
    assert(!reports.exists(r => r > PB - 1 && r < CB),
      s"no report may pass the undecided prepare: $reports")
    assert(reports.max >= CB)
    assert(!Files.exists(Paths.get(log + ".prepare_floor")),
      "the durable floor must clear at COMMIT PREPARED")
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val f = lines.map(_.split("\t", -1))
    // R, I(normal)@TC, then the prepared tx replays at CB: keepA, keepB
    assert(lines.size == 4, s"expected 4 lines, got:\n$lines")
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" && f(1)(0) == TC.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("5"), Some("normal"), None))
    assert(f(2)(0) == CB.toString && f(3)(0) == CB.toString)
    assert(PackedRow.parse(f(2)(7)) ==
      Vector(Some("1"), Some("keepA"), None))
    assert(PackedRow.parse(f(3)(7)) ==
      Vector(Some("3"), Some("keepB"), None))
    assert(!lines.exists(_.contains("dropA")),
      s"the extended-abort subxact leaked through COMMIT PREPARED:\n$lines")
  }

  test("wire: the ROLLBACK leg of v4 parallel-streaming × two-phase — " +
      "the same extended-abort prepared transaction decided by " +
      "ROLLBACK PREPARED vanishes without a trace, the floor clears, " +
      "the flush passes the rollback") {
    val dir = Files.createTempDirectory("pg-conformance-v4pr").toString
    val log = s"$dir/wal.log"
    val PB = 0x1A000L; val TC = 0x1A800L; val CR = 0x1B800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_v4_2pc_rollback" -> None),
      startQueries, Seq(fl))
    def durableProgress(): Long =
      try {
        val p = Paths.get(log)
        if (!Files.exists(p)) 0L
        else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty)
          .map(_.split("\t")(0).toLong).maxOption.getOrElse(0L)
      } catch { case _: Throwable => 0L }
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_v4r", "conf_pub_v4r", log,
      flushLsn = () => durableProgress(), protoVersion = 4)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // the rollback RELEASES the cap: the reported flush climbs from
      // PB-1 to durable downstream progress (TC, the unrelated commit
      // — the rollback itself appends nothing to advance past)
      while (!fl.toArray.exists(_.asInstanceOf[Long] >= TC) &&
        System.currentTimeMillis() - t0 < 20000) Thread.sleep(20)
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val reports = fl.toArray.map(_.asInstanceOf[Long]).toSeq
    assert(reports.exists(_ == PB - 1),
      s"flush must cap below the undecided prepare: $reports")
    assert(reports.max >= TC, s"rollback must release the cap: $reports")
    assert(!Files.exists(Paths.get(log + ".prepare_floor")),
      "the durable floor must clear at ROLLBACK PREPARED")
    val _ = CR // rollback end LSN: documented in the fixture, no line
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    val f = lines.map(_.split("\t", -1))
    // R + the unrelated committed tx ONLY — nothing of the rolled-back
    // parallel-streamed transaction survives
    assert(lines.size == 2, s"expected R + normal insert, got:\n$lines")
    assert(f(0)(2) == "R")
    assert(f(1)(2) == "I" && f(1)(0) == TC.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("5"), Some("normal"), None))
    assert(!lines.exists(l => l.contains("keepA") || l.contains("keepB")
      || l.contains("dropA")), s"rolled-back tx leaked:\n$lines")
  }

  test("wire: the reference's supabase_etl_ddl message between a " +
      "pre-DDL transaction and the renamed Relation re-announcement — " +
      "the client forwards the pg_catalog payload verbatim as a schema " +
      "record in transaction position, and it parses to attnum-keyed " +
      "columns") {
    val dir = Files.createTempDirectory("pg-conformance-refddl").toString
    val log = s"$dir/wal.log"
    val TE1 = 0x1D000L; val TE2 = 0x1D800L; val TE3 = 0x1E000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_ref_ddl" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_rd", "conf_pub_rd", log,
      flushLsn = () => TE3 + 8)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 11 XLogData frames + 1 keepalive
      while ((client.framesReceived.get() < 11 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 11,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    // R(wire REL), I, R(supabase payload), R(renamed REL), U
    assert(lines.size == 5, s"expected 5 envelope lines, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(1)(2) == "I")
    assert(f(2)(2) == "R" && f(2)(3) == "16384" &&
      f(2)(0) == TE2.toString &&
      f(2)(7).contains(""""command_tag":"ALTER TABLE"""") &&
      f(2)(7).contains(""""attnum":2"""), lines(2))
    // the DDL payload parses to attnum-keyed columns via the pipeline's
    // own relation parser — real ordinals, pk from the identity block
    val v = graft.pipeline.CdcPipeline.parseRelation(
      f(2)(3).toLong, f(2)(5).toLong, f(2)(7))
    assert(v.tableName == "users")
    assert(v.columns.map(c => (c.name, c.ordinal)) ==
      Seq(("id", 1), ("full_name", 2), ("bio", 3)))
    assert(v.primaryKey == Seq("id"))
    assert(f(3)(2) == "R" && f(3)(0) == TE3.toString &&
      f(3)(7).contains(""""name":"full_name""""))
    assert(f(4)(2) == "U" &&
      PackedRow.parse(f(4)(7)) == Vector(Some("1"), Some("ada"), None))
  }

  test("wire: async ParameterStatus + NoticeResponse arriving MID-stream " +
      "INSIDE COPY BOTH (between CopyData frames) are skipped without " +
      "tearing the framing or the transaction bracket") {
    val dir = Files.createTempDirectory("pg-conformance-ps").toString
    val log = s"$dir/wal.log"
    val TD = 0x1C000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_param_status" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_ps", "conf_pub_ps", log,
      flushLsn = () => TD + 8)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      // 4 XLogData frames (B, R, I, C) + 1 keepalive — the 'S'/'N'
      // frames are NOT CopyData and must not count or kill the session
      while ((client.framesReceived.get() < 4 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 4,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 2, s"expected R + I, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(0)(0) == TD.toString)
    assert(f(1)(2) == "I" && f(1)(0) == TD.toString &&
      PackedRow.parse(f(1)(7)) == Vector(Some("1"), Some("alice"), None))
  }

  test("wire: a rival that NEVER releases the slot (permanent " +
      "misconfiguration) escalates after the configured consecutive " +
      "55006 cap — the retry loop TERMINATES with a named error " +
      "carrying the rival's active_pid, instead of warning forever") {
    val dir = Files.createTempDirectory("pg-conformance").toString
    val log = s"$dir/wal.log"
    val startAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val pidQueries = new java.util.concurrent.atomic.AtomicInteger(0)
    def frame(t: Char, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.write(t); d.writeInt(4 + body.length); d.write(body)
      bos.toByteArray
    }
    // simple-query reply: one DataRow("4242") + CommandComplete + RFQ
    val activePidReply: Array[Byte] = {
      val row = {
        val bos = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(bos)
        d.writeShort(1); val v = "4242".getBytes(StandardCharsets.UTF_8)
        d.writeInt(v.length); d.write(v); bos.toByteArray
      }
      frame('D', row) ++
        frame('C',
          "SELECT 1".getBytes(StandardCharsets.UTF_8) :+ 0.toByte) ++
        frame('Z', Array('I'.toByte))
    }
    val server = new ServerSocket(0)
    val accept = new Thread(() => {
      var live = true
      while (live) {
        val sock = try server.accept()
                   catch { case _: Throwable => live = false; null }
        if (sock != null) {
          val worker = new Thread(() => {
            sock.setTcpNoDelay(true)
            val in = new DataInputStream(sock.getInputStream)
            val out = new DataOutputStream(sock.getOutputStream)
            val slen = in.readInt()
            in.readFully(new Array[Byte](slen - 4))
            out.write(session("auth")); out.flush()
            var open = true
            while (open) {
              val t = try in.readByte().toChar
                      catch { case _: Throwable => open = false; ' ' }
              if (open) {
                val len = in.readInt()
                val payload = new Array[Byte](len - 4)
                in.readFully(payload)
                t match {
                  case 'Q' =>
                    val sql = new String(payload, 0, payload.length - 1,
                      StandardCharsets.UTF_8)
                    if (sql.startsWith("SHOW")) out.write(session("show"))
                    else if (sql.startsWith("START_REPLICATION")) {
                      startAttempts.incrementAndGet()
                      out.write(session("slot_busy")) // rival never lets go
                    } else if (sql.startsWith("select active_pid")) {
                      pidQueries.incrementAndGet()
                      out.write(activePidReply)
                    }
                    out.flush()
                  case 'X' => open = false
                  case _ => ()
                }
              }
            }
            try sock.close() catch { case _: Throwable => () }
          }, "pg-slot-hog-session")
          worker.setDaemon(true)
          worker.start()
        }
      }
    }, "pg-slot-hog-accept")
    accept.setDaemon(true)
    accept.start()

    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot", "conf_pub", log,
      flushLsn = () => 0L, slotBusyMaxConsecutive = 3)
    try {
      client.start(reconnectBackoffMs = 50)
      val t0 = System.currentTimeMillis()
      while (!client.lastError.exists(
          _.isInstanceOf[SlotBusyEscalationException]) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      val err = client.lastError
      assert(err.exists(_.isInstanceOf[SlotBusyEscalationException]),
        s"expected terminal escalation, got $err")
      val msg = err.get.getMessage
      assert(msg.contains("active_pid=4242"), msg) // rival identified
      assert(msg.contains("3 consecutive retries"), msg)
      assert(client.slotBusyRetries.get() == 3)
      assert(startAttempts.get() == 3,
        s"cap=3 means exactly 3 attempts, got ${startAttempts.get()}")
      assert(pidQueries.get() == 1, "one enrichment query expected")
      // the loop truly TERMINATED — no further attempts trickle in
      Thread.sleep(400)
      assert(startAttempts.get() == 3, "retry loop kept running")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
  }
  test("wire: attnum-keyed DDL message, then a POSITIONAL Relation " +
      "carrying a CONCURRENT column add — alignOrdinals rebuilds the " +
      "Relation's ordinals from the stored attnums (gap at the " +
      "historical drop preserved) and mints a fresh ordinal for the " +
      "new column, so the diff reads as ONE add") {
    val dir = Files.createTempDirectory("pg-conformance-align").toString
    val log = s"$dir/wal.log"
    val TG2 = 0x1F800L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_attnum_align" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_aa", "conf_pub_aa", log,
      flushLsn = () => TG2 + 8)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while ((client.framesReceived.get() < 7 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.framesReceived.get() == 7,
        s"frames=${client.framesReceived.get()} err=${client.lastError}")
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    // R(supabase payload, attnums 1/2/4), R(wire REL, 4 positional
    // cols), I(4 cells)
    assert(lines.size == 3, s"expected 3 envelope lines, got:\n$lines")
    val f = lines.map(_.split("\t", -1))
    assert(f(0)(2) == "R" && f(0)(7).contains("\"attnum\":4"), lines(0))
    assert(f(1)(2) == "R" && f(1)(7).contains("\"score\""), lines(1))
    assert(f(2)(2) == "I")
    // the pipeline's own parsers: DDL version is attnum-keyed with the
    // historical gap; the wire Relation is positional; alignment
    // inherits 1/2/4 BY NAME and mints 5 (> stored max) for score
    val stored = graft.pipeline.CdcPipeline.parseRelation(
      f(0)(3).toLong, f(0)(5).toLong, f(0)(7))
    assert(stored.columns.map(c => (c.name, c.ordinal)) ==
      Seq(("id", 1), ("full_name", 2), ("bio", 4)))
    val wire = graft.pipeline.CdcPipeline.parseRelation(
      f(1)(3).toLong, f(1)(5).toLong, f(1)(7))
    assert(wire.columns.forall(_.ordinal == 0), "wire Relations are positional")
    val aligned = graft.pipeline.CdcPipeline.alignOrdinals(
      Some(stored), wire)
    assert(aligned.columns.map(c => (c.name, c.ordinal)) ==
      Seq(("id", 1), ("full_name", 2), ("bio", 4), ("score", 5)))
    // and therefore: ONE added column, zero renames/drops — the
    // positional view alone would have mis-diffed bio 4->3
    val diff = graft.core.SchemaDiff.between(stored, aligned)
    assert(diff.added.map(_.name) == Seq("score") &&
      diff.dropped.isEmpty && diff.renames.isEmpty, diff.toString)
  }

  test("wire: supabase_etl_ddl with a replica identity INDEX distinct " +
      "from the PK (relreplident 'i') — the identity mask follows " +
      "replica_identity_index_attnums, it does NOT fall back to the " +
      "primary key") {
    val dir = Files.createTempDirectory("pg-conformance-ident").toString
    val log = s"$dir/wal.log"
    val TH1 = 0x20000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fl = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = new ServerSocket(0)
    replayConnections(server, Seq("stream_ref_ddl_ident" -> None),
      startQueries, Seq(fl))
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_ri", "conf_pub_ri", log,
      flushLsn = () => TH1 + 8)
    try {
      val t0 = System.currentTimeMillis()
      client.start()
      while ((client.framesReceived.get() < 3 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      assert(client.lastError.isEmpty, s"client error: ${client.lastError}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
    assert(lines.size == 1, s"expected 1 schema record, got:\n$lines")
    val f = lines.head.split("\t", -1)
    assert(f(2) == "R" &&
      f(7).contains("\"replica_identity_index_attnums\":[2]"), lines.head)
    val v = graft.pipeline.CdcPipeline.parseRelation(
      f(3).toLong, f(5).toLong, f(7))
    // pk stays id; the IDENTITY mask is the index column full_name
    assert(v.primaryKey == Seq("id"))
    assert(v.identityColumns == Seq("full_name"),
      v.columns.map(c => (c.name, c.identity)).toString)
    assert(v.columns.map(c => (c.name, c.identity)) ==
      Seq(("id", false), ("full_name", true), ("bio", false)))
  }

  test("wire: a rival that releases the slot EXACTLY at the cap " +
      "boundary (cap-1 consecutive 55006s, then success) streams " +
      "normally — no escalation, streak resets, the off-by-one pins") {
    val dir = Files.createTempDirectory("pg-conformance-boundary").toString
    val log = s"$dir/wal.log"
    val T2 = 0x2000L
    val startQueries =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fls = Seq.fill(3)(
      new java.util.concurrent.ConcurrentLinkedQueue[Long]())
    val server = new ServerSocket(0)
    // connections 1 and 2 refuse with 55006; connection 3 streams
    replayConnections(server,
      Seq("slot_busy" -> None, "slot_busy" -> None, "stream" -> None),
      startQueries, fls)
    val client = new ReplicationSocketClient("127.0.0.1",
      server.getLocalPort, "conf_slot_bd", "conf_pub_bd", log,
      flushLsn = () => T2 + 8, slotBusyMaxConsecutive = 3)
    try {
      client.start(reconnectBackoffMs = 50)
      val t0 = System.currentTimeMillis()
      while ((client.framesReceived.get() < 9 ||
        client.keepalivesReceived.get() < 1) &&
        System.currentTimeMillis() - t0 < 15000) Thread.sleep(20)
      // the cap is 3 consecutive FAILURES: 2 failures + success must
      // never escalate (the boundary the hog test pins from the other
      // side with exactly 3 failures)
      assert(!client.lastError.exists(
          _.isInstanceOf[SlotBusyEscalationException]),
        s"boundary must not escalate: ${client.lastError}")
      assert(client.slotBusyRetries.get() == 2,
        s"exactly 2 busy refusals expected, got ${client.slotBusyRetries.get()}")
      assert(startQueries.size == 3,
        s"2 refusals + 1 success = 3 attempts, got ${startQueries.size}")
      assert(client.framesReceived.get() == 9,
        s"stream must flow after the boundary: ${client.framesReceived.get()}")
    } finally {
      client.stop()
      try server.close() catch { case _: Throwable => () }
    }
    // the recorded stream's envelope lines landed (data actually flowed)
    val lines = new String(Files.readAllBytes(Paths.get(log)),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    assert(lines.nonEmpty, "expected envelope lines after the handover")
  }
}
