package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Named retryable condition: START_REPLICATION refused with SQLSTATE
  * 55006 (object_in_use) — a rival wal receiver still holds the slot,
  * which is EXPECTED during failovers and worker handovers (the old
  * holder's socket lingers until the server notices). The client
  * retries with backoff instead of dying on a generic wire error. */
final class SlotInUseException(msg: String)
    extends java.io.IOException(msg)

/** Terminal escalation of [[SlotInUseException]]: the slot stayed busy
  * for the configured number of CONSECUTIVE retries — no failover
  * window lasts that long, so this is a permanent misconfiguration
  * (two replicators deployed against one slot). Named, carries the
  * rival's `active_pid` when the server would tell us, and STOPS the
  * retry loop: an infinite warning loop is not an operator signal. */
final class SlotBusyEscalationException(msg: String)
    extends java.io.IOException(msg)

/** Live Postgres logical-replication intake: the streaming-replication
  * sub-protocol (frontend/backend protocol v3 COPY BOTH mode) spoken
  * over a plain TCP socket — the layer the reference reaches through its
  * protocol stack (crates/etl/src/postgres/stream/replication_message.rs;
  * START_REPLICATION decode loop, keepalive replies, standby status
  * updates). Framing per the public PostgreSQL protocol documentation:
  * every backend message is `type(1) + len(4, incl itself) + payload`;
  * replication traffic rides inside CopyData ('d') with a sub-type byte
  * — 'w' XLogData (walStart, walEnd, sendTime, pgoutput frame) from the
  * server, 'k' Primary Keepalive (walEnd, sendTime, replyRequested), and
  * 'r' Standby Status Update (write/flush/apply LSNs, sendTime,
  * replyRequested) from the client. Timestamps are microseconds since
  * 2000-01-01.
  *
  * Architecture (Spark-first): Postgres replication is a single ordered
  * socket stream, so the client is a driver-side intake daemon that
  * decodes pgoutput frames through [[PgOutput.DecodeSession]] and spools
  * whole-commit envelope line batches to the change log the DSv2
  * [[CdcLogSource]] tails — network intake decoupled from the
  * distributed micro-batch reader, exactly the reference's
  * socket → apply-loop split (and the standard connector shape: the
  * cluster never talks to the replication slot directly).
  *
  * Status-update policy (replication_message.rs:111-226):
  *  - write/flush LSNs reported monotonically (never regress);
  *  - apply LSN = flush LSN (durable == applied for this engine);
  *  - non-forced updates are THROTTLED: skipped while the flush LSN is
  *    unchanged and the last update is younger than
  *    [[ReplicationSocketClient.StatusUpdateIntervalMs]];
  *  - a keepalive with reply-requested forces an immediate update;
  *  - an idle stream sends a periodic heartbeat (reply requested) every
  *    keepalive deadline = max(0.6 × wal_sender_timeout, 100 ms)
  *    (apply.rs:1493-1497; timeout read via `SHOW wal_sender_timeout`,
  *    defaulting to 60 s when disabled/unreadable, apply.rs:1106-1129).
  */
final class ReplicationSocketClient(
    host: String,
    port: Int,
    slotName: String,
    publication: String,
    logPath: String,
    user: String = "graft",
    database: String = "postgres",
    /** Password for SCRAM-SHA-256 (RFC 5802/7677, the modern Postgres
      * default auth); empty = trust-only targets. */
    password: String = "",
    startLsn: Long = 0L,
    /** Durable flush position to report (the source checkpoint's
      * progress — [[CdcLogSource]] commit writes `<log>.progress`). */
    flushLsn: () => Long = () => 0L,
    /** TLS: disable | require | verify-ca (see [[PgWireConnection]]). */
    sslMode: String = "disable",
    sslRootCert: Option[String] = None,
    /** Drop transactions stamped with a foreign replication origin —
      * the bidirectional-loop breaker (`origin = none` subscription
      * semantics, applied client-side in [[PgOutput.DecodeSession]]). */
    dropForeignOrigins: Boolean = false,
    /** pgoutput protocol version: 1 (the reference's choice — the
      * server buffers each transaction until commit) or 2 (PG 14+
      * streamed in-progress transactions: large transactions arrive as
      * interleavable blocks the decode session spools to disk and
      * emits whole at StreamCommit — bounded publisher memory, no
      * commit-sized latency cliff; see [[PgOutput.DecodeSession]]). */
    protoVersion: Int = 1,
    /** Request `binary 'true'` (PG 14+): tuple cells arrive in each
      * type's binary send format instead of its text output —
      * [[graft.core.PgBinary]] converts them back to canonical text, so
      * downstream is format-agnostic. Saves the server's per-value
      * output-function call on wide numeric/temporal tables. The
      * reference cannot enable this (its codec rejects binary cells,
      * codec/event.rs:979). */
    binaryMode: Boolean = false,
    /** Create the replication slot when it does not exist (the
      * reference's apply worker does this unconditionally,
      * worker.rs:385/query.rs:26; here opt-in so operators who manage
      * slots out-of-band keep today's fail-loud behavior). Proto v3
      * slots are created with TWO_PHASE — the property must be set at
      * slot creation for prepared-transaction decoding. */
    createSlotIfMissing: Boolean = false,
    /** CONSECUTIVE slot-busy (SQLSTATE 55006) refusals tolerated before
      * the retry loop escalates to a terminal
      * [[SlotBusyEscalationException]] (enriched with the rival's
      * `active_pid` from `pg_replication_slots` when readable). 0 =
      * retry forever (pure failover-handover deployments). The default
      * bounds a PERMANENT misconfiguration — two replicators on one
      * slot — at ~2 min of named warnings instead of an infinite loop,
      * while comfortably outlasting any real handover window (the old
      * holder's socket lingers seconds, not minutes). */
    slotBusyMaxConsecutive: Int = 120,
    /** Base directory for streamed/prepared-transaction spools. The
      * default sits NEXT TO THE CHANGE LOG — real disk, not the JVM
      * temp dir, which is often a size-limited tmpfs a 100 GB streamed
      * transaction would fill mid-stream. */
    spoolDir: Option[String] = None,
    /** Warn (and bump `etl_flush_cap_stalls_total`) when the reported
      * flush LSN is held this many bytes behind durable progress by an
      * undecided PREPARE — an undecided two-phase transaction pins
      * publisher WAL retention, which must be visible, not silent. */
    flushCapWarnLagBytes: Long = 64L << 20) {
  import ReplicationSocketClient._

  // observability for tests/metrics (reference ETL_STATUS_UPDATES_TOTAL)
  val statusUpdatesSent = new AtomicLong(0)
  val statusUpdatesSkipped = new AtomicLong(0)
  val keepalivesReceived = new AtomicLong(0)
  val framesReceived = new AtomicLong(0)
  val lastWriteLsn = new AtomicLong(0)
  @volatile var lastError: Option[Throwable] = None

  private val running = new AtomicBoolean(false)
  private val stopped = new AtomicBoolean(false)
  val reconnects = new AtomicLong(0)
  /** START_REPLICATION attempts refused with SQLSTATE 55006 (rival
    * worker holds the slot) — each is retried with backoff. */
  val slotBusyRetries = new AtomicLong(0)
  private var conn: PgWireConnection = _
  private def out: DataOutputStream = conn.out
  private var reader: Thread = _
  private var heartbeat: Thread = _
  private var supervisor: Thread = _

  // ----------------------------------------------------------- lifecycle
  /** Connect, handshake, START_REPLICATION, and spool until [[stop]].
    * Per session, two daemon threads: a BLOCKING reader (a read timeout
    * mid-message would tear the framing) and a heartbeat timer enforcing
    * the keepalive deadline. The FIRST connection is synchronous (auth/
    * config errors surface to the caller); after that a supervisor
    * RECONNECTS with backoff when the connection drops — resuming from
    * the durable flush position, which the server-side slot also
    * restarts from, so a drop costs at most a re-delivered tail that the
    * downstream replay guards absorb (at-least-once, the reference
    * replicator's restart-on-error loop). */
  def start(reconnectBackoffMs: Long = 1000L): Unit = {
    var slotBusyStreak = 0
    try connectSession()
    catch {
      case e: SlotInUseException =>
        // a rival holds the slot (failover/handover window): NAMED and
        // RETRYABLE — the supervisor below reconnects with backoff
        // until the rival releases. Every other first-connect failure
        // (auth, config, bad host) still surfaces to the caller.
        lastError = Some(e)
        slotBusyStreak = 1
        try conn.close() catch { case _: Throwable => () }
        java.util.logging.Logger.getLogger("graft.sources.replication")
          .warning(s"${e.getMessage} — retrying with backoff")
    }
    supervisor = new Thread(() => {
      // no early `return` in the lambda: a Scala non-local return after
      // start() has exited surfaces as NonLocalReturnControl on this
      // thread at every graceful stop
      while (!stopped.get()) {
        // a first connect refused on a busy slot leaves no session to
        // watch — go straight to the reconnect loop
        if (reader != null) {
          reader.join()
          heartbeat.interrupt(); heartbeat.join(5000)
          slotBusyStreak = 0 // a live session means the slot was ours
        }
        if (!stopped.get() && (reader == null || !running.get() ||
            !reader.isAlive)) {
          // session died underneath us → reconnect with backoff
          try conn.close() catch { case _: Throwable => () }
          var connected = false
          while (!connected && !stopped.get()) {
            Thread.sleep(reconnectBackoffMs)
            if (!stopped.get()) {
              try {
                connectSession()
                reconnects.incrementAndGet()
                connected = true
                slotBusyStreak = 0
              } catch {
                case e: Throwable =>
                  lastError = Some(e)
                  // a failed connectSession() can leave a FULLY
                  // AUTHENTICATED session half-open (START_REPLICATION
                  // refused 55006 arrives after auth) — close it before
                  // the next attempt, or each retry leaks a live
                  // walsender and exhausts max_wal_senders /
                  // max_connections during exactly the handover window
                  // the retry exists for (then blocks even the
                  // legitimate retry)
                  try conn.close() catch { case _: Throwable => () }
                  e match {
                    case _: SlotInUseException =>
                      slotBusyStreak += 1
                      if (slotBusyMaxConsecutive > 0 &&
                          slotBusyStreak >= slotBusyMaxConsecutive)
                        escalateSlotBusy(slotBusyStreak)
                    case _ => slotBusyStreak = 0
                  }
              }
            }
          }
        }
      }
    }, "graft-replication-supervisor")
    supervisor.setDaemon(true)
    supervisor.start()
  }

  /** Terminal slot-busy escalation (see [[slotBusyMaxConsecutive]]):
    * enrich with the rival holder's `active_pid` over a FRESH
    * simple-query session (best effort — the refusing server may also
    * be unreachable by now), record a terminal
    * [[SlotBusyEscalationException]] in [[lastError]], and stop the
    * supervisor: after this many consecutive 55006s the condition is a
    * permanent misconfiguration, not a handover window, and an
    * actionable failure beats an infinite warning loop. */
  private def escalateSlotBusy(streak: Int): Unit = {
    val rival: Option[String] =
      try {
        val c = new PgWireConnection(host, port, user, database,
          password, replication = true, sslMode = sslMode,
          sslRootCert = sslRootCert)
        try {
          c.connect()
          c.queryRows("select active_pid from pg_replication_slots " +
              s"where slot_name = '${slotName.replace("'", "''")}'")
            .headOption.flatMap(_.headOption.flatten)
        } finally c.close()
      } catch { case _: Throwable => None }
    val who = rival.fold("rival active_pid unreadable")(p =>
      s"rival active_pid=$p")
    val e = new SlotBusyEscalationException(
      s"replication slot '$slotName' still held after $streak " +
        s"consecutive retries (SQLSTATE 55006; $who): this is a " +
        "permanent conflict — most likely two replicators configured " +
        "against the same slot — not a failover handover; giving up. " +
        "Stop the rival worker (or point one of them at its own slot) " +
        "and restart.")
    lastError = Some(e)
    java.util.logging.Logger.getLogger("graft.sources.replication")
      .severe(e.getMessage)
    stopped.set(true)
    running.set(false)
  }

  private def connectSession(): Unit = {
    conn = new PgWireConnection(host, port, user, database, password,
      replication = true, sslMode = sslMode, sslRootCert = sslRootCert)
    conn.connect()
    val walSenderTimeoutMs = queryWalSenderTimeoutMs()
    serverVersionNum = queryServerVersionNum()
    val deadlineMs = keepAliveDeadlineMs(walSenderTimeoutMs)
    // receive deadline (PostgreSQL's own wal_receiver_timeout shape): a
    // server that goes SILENT — NAT drop, partition, half-open socket —
    // must surface as an error and reconnect, not block readMessage
    // forever. A healthy stream is never this quiet: the wal sender
    // keepalives when idle, and our own ≤0.6×timeout heartbeats request
    // replies even when wal_sender_timeout is disabled server-side.
    conn.setReadTimeoutMs(
      ReplicationSocketClient.receiveTimeoutMs(walSenderTimeoutMs))
    // resume from durable progress, CAPPED by the durable prepare
    // floor: the server starts at max(requested, confirmed_flush), so
    // requesting raw downstream progress — which legitimately passes an
    // undecided PREPARE once later transactions commit — would make the
    // server skip the prepared transaction's redelivery even though the
    // confirmed flush was held below it. The floor file is written at
    // prepare decode and cleared at the decision (see receiveLoop);
    // anything later than the requested position that was already
    // spooled re-arrives and is absorbed downstream (at-least-once).
    if (createSlotIfMissing) ensureSlot()
    val resume = math.max(startLsn, flushLsn())
    startReplication(readDurableFloor().fold(resume)(math.min(resume, _)))
    running.set(true)
    lastUpdateAtMs = nowMs()
    reader = new Thread(() => receiveLoop(), "graft-replication-reader")
    reader.setDaemon(true)
    reader.start()
    heartbeat = new Thread(() => {
      // idle heartbeat: the wal sender must hear from us inside its
      // timeout even when no durable progress happened
      // (PeriodicKeepAlive, reply requested — reference semantics)
      while (running.get()) {
        try {
          Thread.sleep(math.min(deadlineMs / 3 + 1, 100L))
          if (running.get() && nowMs() - lastUpdateAtMs >= deadlineMs)
            sendStatusUpdate(force = true, requestReply = true)
        } catch {
          case _: InterruptedException => ()
          case e: Throwable => lastError = Some(e); running.set(false)
        }
      }
    }, "graft-replication-heartbeat")
    heartbeat.setDaemon(true)
    heartbeat.start()
  }

  /** Graceful drain: a final forced status update with reply requested
    * (the reference's ShutdownFlush), then close. */
  def stop(): Unit = {
    stopped.set(true)
    running.set(false)
    try {
      if (conn != null) {
        sendStatusUpdate(force = true, requestReply = true)
        out.write('X'); writeInt(out, 4); out.flush() // Terminate
      }
    } catch { case _: Throwable => () }
    if (conn != null) conn.close() // unblocks the reader
    if (reader != null) reader.join(5000)
    if (heartbeat != null) { heartbeat.interrupt(); heartbeat.join(5000) }
    if (supervisor != null) supervisor.join(5000)
  }

  /** Create the replication slot when absent (reference
    * worker.rs:385, query.rs:26-75): probe `pg_replication_slots`
    * over this replication connection's simple-query surface, then
    * `CREATE_REPLICATION_SLOT <slot> LOGICAL pgoutput` — with
    * `TWO_PHASE` for proto v3 (the slot property must be set at
    * creation for prepared-transaction decoding; the parenthesized
    * option syntax is PG 15+, which v3 requires anyway) and no
    * exported snapshot (backfill consistency coordinates through the
    * SnapshotScan exporter connection, not the slot). A
    * duplicate-object (42710) race with a rival worker is benign —
    * the slot exists, which is the goal. */
  private def ensureSlot(): Unit = {
    val escSlot = slotName.replace("'", "''")
    simpleQuery("SELECT slot_name FROM pg_replication_slots " +
      s"WHERE slot_name = '$escSlot'")
    var exists = false
    var ready = false
    while (!ready) {
      val (t, payload) = readMessage()
      t match {
        case 'D' => exists = true
        case 'Z' => ready = true
        case 'E' =>
          // cannot probe — fall through and let START_REPLICATION name
          // the real failure on this server
          drainUntilReady(); return
        case _ => ()
      }
    }
    if (exists) return
    // the reference's missed-changes guard (worker.rs:516): a missing
    // slot alongside EXISTING durable progress means the old slot —
    // and every change it retained past our flush position — is gone;
    // a fresh slot starts at the CURRENT wal position, so the gap is
    // unreplayable. Warn loud; the operator decides whether a
    // re-backfill is needed.
    val durable = math.max(startLsn, flushLsn())
    if (durable > 0L)
      java.util.logging.Logger.getLogger("graft.sources.replication")
        .warning(s"replication slot '$slotName' is GONE but durable " +
          s"progress exists at ${ReplicationSocketClient.formatLsn(durable)}" +
          " — changes between that position and the fresh slot's start " +
          "were not retained and cannot be replayed; tables may have " +
          "missed changes (consider re-running the backfill)")
    val opts =
      if (protoVersion >= 3) " (TWO_PHASE, SNAPSHOT 'nothing')"
      else " NOEXPORT_SNAPSHOT"
    simpleQuery(
      s"""CREATE_REPLICATION_SLOT "$slotName" LOGICAL pgoutput$opts""")
    var consistentPoint: Option[String] = None
    ready = false
    while (!ready) {
      val (t, payload) = readMessage()
      t match {
        case 'D' =>
          // columns: slot_name, consistent_point, snapshot_name, plugin
          val b = ByteBuffer.wrap(payload)
          val n = b.getShort.toInt
          val cells = (0 until n).map { _ =>
            val len = b.getInt
            if (len < 0) null
            else {
              val a = new Array[Byte](len); b.get(a)
              new String(a, StandardCharsets.UTF_8)
            }
          }
          if (cells.length >= 2) consistentPoint = Option(cells(1))
        case 'Z' => ready = true
        case 'E' =>
          val state = ReplicationSocketClient.errorSqlState(payload)
          val msg = ReplicationSocketClient.errorMessage(payload)
          drainUntilReady()
          if (!state.contains("42710")) // duplicate_object: rival won
            throw new java.io.IOException(
              s"CREATE_REPLICATION_SLOT failed: $msg")
          ready = true
        case _ => ()
      }
    }
    java.util.logging.Logger.getLogger("graft.sources.replication")
      .info(s"created replication slot '$slotName'" +
        consistentPoint.fold("")(p => s" at consistent point $p") +
        (if (protoVersion >= 3) " (two_phase)" else ""))
  }

  /** `SHOW wal_sender_timeout` via a simple query; None = disabled or
    * unreadable (reference falls back to 60 s, apply.rs:1113-1129). */
  private def queryWalSenderTimeoutMs(): Option[Long] = {
    try {
      simpleQuery("SHOW wal_sender_timeout")
      var value: Option[String] = None
      var ready = false
      while (!ready) {
        val (t, payload) = readMessage()
        t match {
          case 'D' => // DataRow: int16 ncols, (int32 len, bytes)*
            val buf = ByteBuffer.wrap(payload)
            if (buf.getShort >= 1) {
              val len = buf.getInt
              if (len >= 0) {
                val bytes = new Array[Byte](len); buf.get(bytes)
                value = Some(new String(bytes, StandardCharsets.UTF_8))
              }
            }
          case 'Z' => ready = true
          case 'E' => // unreadable → heuristic default; resync to ready
            value = None; drainUntilReady(); ready = true
          case _ => ()
        }
      }
      value.flatMap(parsePgDurationMs).filter(_ > 0)
    } catch { case _: Throwable => None }
  }

  /** `SHOW server_version_num` via a simple query (a GUC, so the
    * walsender answers it in replication mode); None = unreadable.
    * Probed once per session to gate version-dependent pgoutput
    * options ([[startReplication]]). */
  private def queryServerVersionNum(): Option[Int] = {
    try {
      simpleQuery("SHOW server_version_num")
      var value: Option[String] = None
      var ready = false
      while (!ready) {
        val (t, payload) = readMessage()
        t match {
          case 'D' =>
            val buf = ByteBuffer.wrap(payload)
            if (buf.getShort >= 1) {
              val len = buf.getInt
              if (len >= 0) {
                val bytes = new Array[Byte](len); buf.get(bytes)
                value = Some(new String(bytes, StandardCharsets.UTF_8))
              }
            }
          case 'Z' => ready = true
          case 'E' => value = None; drainUntilReady(); ready = true
          case _ => ()
        }
      }
      value.flatMap(v => scala.util.Try(v.trim.toInt).toOption)
    } catch { case _: Throwable => None }
  }

  /** Source server version from this session's probe; None until the
    * probe ran (or when the server would not answer it). */
  @volatile private var serverVersionNum: Option[Int] = None

  private def startReplication(fromLsn: Long): Unit = {
    val lsn = formatLsn(fromLsn)
    require(protoVersion >= 1 && protoVersion <= 4,
      s"unsupported proto_version $protoVersion")
    val streaming = // v2 must also request streaming, or v2 ≡ v1;
      // v4 (PG 16) negotiates `streaming 'parallel'` — the server may
      // then stream prepared/aborted subtransactions with the extended
      // Stream Abort frame (abort LSN + ts). Parallel APPLY is a
      // subscriber-side concern; our spool replay is already
      // transactional, so v4 maps onto the same replay path.
      if (protoVersion >= 4) ", streaming 'parallel'"
      else if (protoVersion >= 2) ", streaming 'true'" else ""
    val twoPhase = // v3: prepared transactions decode at PREPARE time
      if (protoVersion >= 3) ", two_phase 'true'" else ""
    val binary = // PG 14+: tuple cells in binary send format
      if (binaryMode) ", binary 'true'" else ""
    // messages 'true' is REQUIRED for 'M' logical-message frames (the
    // S5 DDL-capture channel, pg_logical_emit_message) — without it
    // pgoutput silently drops them; the reference sends it
    // unconditionally too (client/raw.rs:634). The option only EXISTS
    // on PG 14+, though: a pre-14 walsender errors the whole
    // START_REPLICATION with "unrecognized pgoutput option", so on a
    // CONFIRMED older server we drop it (v1 keeps streaming; DDL
    // capture is simply unavailable there) and log the degradation.
    // An unreadable probe keeps the option — modern servers must not
    // lose DDL capture to a transient SHOW failure.
    val messages =
      if (serverVersionNum.exists(_ < 140000)) {
        java.util.logging.Logger.getLogger("graft.sources.replication")
          .warning(s"source server is ${serverVersionNum.get} (< 14): " +
            "pgoutput `messages` option unavailable — logical-message " +
            "DDL capture disabled for this session")
        ""
      } else ", messages 'true'"
    simpleQuery(s"""START_REPLICATION SLOT "$slotName" LOGICAL $lsn """ +
      s"""(proto_version '$protoVersion', """ +
      s"""publication_names '$publication'""" +
      s"""$messages$streaming$twoPhase$binary)""")
    var decided = false
    while (!decided) {
      val (t, payload) = readMessage()
      t match {
        case 'W' => decided = true // CopyBothResponse — streaming begins
        case 'N' | 'S' =>
          // async NoticeResponse / ParameterStatus — a live server may
          // interleave these anywhere (e.g. a slot-creation NOTICE, a
          // reloaded GUC); they are not the answer, keep reading
          ()
        case 'E' =>
          val state = ReplicationSocketClient.errorSqlState(payload)
          val msg = errorMessage(payload)
          if (state.contains("55006")) {
            // object_in_use: a rival worker still holds the slot — a
            // NAMED retryable condition (failover handover), not a
            // generic refusal
            slotBusyRetries.incrementAndGet()
            throw new SlotInUseException(
              s"replication slot '$slotName' is held by a rival " +
                s"(SQLSTATE 55006): $msg")
          }
          throw new java.io.IOException(
            // slot gone/invalidated → ST10 onMissingOffset path upstream
            s"START_REPLICATION refused: $msg")
        case other => throw new java.io.IOException(
          s"expected CopyBothResponse, got '${other.toChar}'")
      }
    }
  }

  // --------------------------------------------------------- receive loop
  /** Live decode session — sendStatusUpdate acks its parked payload
    * meta at the reported flush position (processed-bytes accounting). */
  @volatile private var decodeSession: PgOutput.DecodeSession = null

  /** Undecided-prepare floor carried from a torn-down session into its
    * reconnect successor: the prepared spools are volatile, so between
    * a session's death and the publisher's redelivery the cap must
    * survive in the client or a keepalive-triggered status update
    * could confirm past the prepare and lose the transaction. */
  @volatile private var carriedPrepareFloor: Option[Long] = None

  private def receiveLoop(): Unit = {
    val session = new PgOutput.DecodeSession(
      dropForeignOrigins = dropForeignOrigins,
      spoolDir = Some(spoolDir.map(Paths.get(_)).getOrElse(
        Paths.get(logPath).toAbsolutePath.getParent.resolve("spools"))))
    session.inheritPrepareFloor(carriedPrepareFloor)
    decodeSession = session
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    var inTx = false
    try {
      while (running.get()) {
        readMessage() match {
          case ('d', payload) =>
            payload(0) match {
              case 'w' =>
                val buf = ByteBuffer.wrap(payload, 1, payload.length - 1)
                buf.getLong // walStart
                val walEnd = buf.getLong
                buf.getLong // sendTime
                val frame = new Array[Byte](buf.remaining()); buf.get(frame)
                framesReceived.incrementAndGet()
                monotonicMax(lastWriteLsn, walEnd)
                frame(0).toChar match {
                  case 'B' => inTx = true
                  case 'C' => inTx = false
                  // v2 stream blocks: lines only materialize at
                  // StreamCommit ('c'), which arrives OUTSIDE blocks —
                  // 'S'/'E' themselves emit nothing, so the whole-commit
                  // flush below still never tears a transaction
                  case _   => ()
                }
                pending ++= session.onFrame(frame)
                // two-phase bookkeeping is made DURABLE at decode time,
                // before any later commit can advance downstream
                // progress past the prepare: BeginPrepare/StreamPrepare
                // write the resume-floor file, CommitPrepared/
                // RollbackPrepared recompute (and usually clear) it
                frame(0).toChar match {
                  case 'b' | 'p' | 'K' | 'r' => persistPrepareFloor(session)
                  case _ => ()
                }
                // whole-commit appends only: the log's boundary bit and
                // the windowed reader both assume a flush never tears a
                // transaction
                if (!inTx && pending.nonEmpty) {
                  appendToLog(pending.toSeq); pending.clear()
                  // the replayed CommitPrepared lines are now durable
                  // in the log — release the replay floor BEFORE the
                  // status update (held any earlier, a heartbeat
                  // confirming past the prepare + a crash before this
                  // append would lose the transaction: the server
                  // starts at max(requested, confirmed_flush))
                  if (frame(0) == 'K') {
                    session.clearReplayFloor()
                    persistPrepareFloor(session)
                  }
                  sendStatusUpdate(force = false, requestReply = false)
                } else if (frame(0) == 'K') {
                  // empty prepared transaction: no lines to lose
                  session.clearReplayFloor()
                  persistPrepareFloor(session)
                }
              case 'k' =>
                val buf = ByteBuffer.wrap(payload, 1, payload.length - 1)
                val walEnd = buf.getLong
                buf.getLong // sendTime
                val replyRequested = buf.get() == 1
                keepalivesReceived.incrementAndGet()
                monotonicMax(lastWriteLsn, walEnd)
                if (replyRequested) // reference KeepAlive: reply, no echo
                  sendStatusUpdate(force = true, requestReply = false)
              case _ => () // unknown sub-message: ignore (fwd-compat)
            }
          case ('E', payload) =>
            throw new java.io.IOException(
              s"replication error: ${errorMessage(payload)}")
          case ('c', _) => // CopyDone — server ended the stream
            running.set(false)
          case _ => () // NoticeResponse etc.
        }
      }
    } catch {
      case e: EOFException => lastError = Some(e); running.set(false)
      case e: Throwable if running.get() =>
        lastError = Some(e); running.set(false)
      case _: Throwable => ()
    } finally {
      // release spools; the close() retains the undecided-prepare
      // floor on the session object (the final status update in
      // stop() may still consult it) and carries it to the successor
      carriedPrepareFloor = session.close()
    }
  }

  // ------------------------------------------------------- status updates
  @volatile private var lastUpdateAtMs = 0L
  private var reportedWrite = 0L
  private var reportedFlush = 0L
  private val lastStallWarnAtMs = new AtomicLong(0L)

  private def sendStatusUpdate(force: Boolean, requestReply: Boolean): Unit =
    synchronized {
      // monotonic: never report a regressing position. The flush is
      // additionally CAPPED below the earliest undecided PREPARE
      // (two-phase): the prepared spool is volatile, so a restarted
      // session must resume below the prepare to get it re-sent — the
      // cap can never regress in practice (a prepare's LSN is above
      // every previously-durable commit), but the max() guards the
      // monotonic contract regardless
      val write = math.max(lastWriteLsn.get(), reportedWrite)
      val rawFlush = flushLsn()
      val ds0 = decodeSession
      // a failed floor write retries here — every status update, not
      // just the next prepare-family frame
      if (floorDirty.get() && ds0 != null) persistPrepareFloor(ds0)
      val capped = if (ds0 != null) ds0.flushCap(rawFlush) else rawFlush
      val flush = math.max(capped, reportedFlush)
      // undecided-prepare visibility (before the throttle return, so
      // the gauges track even while updates are being skipped): an
      // undecided two-phase transaction pins publisher WAL retention
      // and freezes apparent progress — that must be observable
      if (ds0 != null)
        recordPrepareStall(ds0, rawFlush, capped, flushCapWarnLagBytes,
          lastStallWarnAtMs)
      if (!force && flush == reportedFlush &&
          nowMs() - lastUpdateAtMs < StatusUpdateIntervalMs) {
        statusUpdatesSkipped.incrementAndGet()
        return
      }
      val body = ByteBuffer.allocate(1 + 8 * 4 + 1)
      body.put('r'.toByte)
      body.putLong(write)
      body.putLong(flush)
      body.putLong(flush) // apply = flush: durable IS applied here
      body.putLong(pgEpochMicros())
      body.put(if (requestReply) 1.toByte else 0.toByte)
      out.write('d'); writeInt(out, 4 + body.capacity())
      out.write(body.array()); out.flush()
      statusUpdatesSent.incrementAndGet()
      lastUpdateAtMs = nowMs()
      reportedWrite = write
      reportedFlush = flush
      // the flush report IS the acknowledgement boundary: commits at or
      // below it are durable downstream — record their payload bytes as
      // processed (source_payload_metadata.rs record_processed semantics)
      val ds = decodeSession
      if (ds != null) ds.ackProcessed(flush)
    }

  // ----------------------------------------------- durable prepare floor
  /** Sidecar next to the change log holding the max LSN a restarted
    * session may REQUEST while a prepare is undecided (= floor − 1).
    * Present ⇔ undecided prepares exist. */
  private def floorPath = Paths.get(logPath + ".prepare_floor")

  /** Set when a floor write failed — retried at every status update
    * (not just the next prepare-family frame: a failed BeginPrepare
    * write otherwise leaves the file missing/stale for the whole
    * prepare window, and a crash then can request past the undecided
    * prepare once downstream progress ran ahead of the capped
    * confirm). */
  private val floorDirty = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val floorWriteLock = new Object

  private def persistPrepareFloor(ds: PgOutput.DecodeSession): Unit =
    floorWriteLock.synchronized {
      try {
        ds.prepareFloorLsn match {
          case Some(f) =>
            // unique temp name: the decode thread and a status-update
            // retry may both stage a write — a shared temp path lets
            // one move/delete the other's file mid-flight
            val tmp = Paths.get(logPath + ".prepare_floor.tmp." +
              Thread.currentThread().getId)
            Files.write(tmp,
              (f - 1).toString.getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, floorPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          case None => Files.deleteIfExists(floorPath)
        }
        floorDirty.set(false)
      } catch {
        case e: java.io.IOException =>
          floorDirty.set(true)
          java.util.logging.Logger.getLogger("graft.sources.replication")
            .warning("prepare-floor write failed (will retry at the " +
              s"next status update): ${e.getMessage}")
      }
    }

  private def readDurableFloor(): Option[Long] =
    try {
      if (Files.exists(floorPath))
        Some(new String(Files.readAllBytes(floorPath),
          StandardCharsets.UTF_8).trim.toLong)
      else None
    } catch {
      case _: java.io.IOException => None
      case _: NumberFormatException => None
    }

  // ------------------------------------------------------------ plumbing
  private def appendToLog(lines: Seq[String]): Unit =
    Files.write(Paths.get(logPath),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def simpleQuery(sql: String): Unit = conn.simpleQuery(sql)
  private def readMessage(): (Char, Array[Byte]) = conn.readMessage()
  private def drainUntilReady(): Unit = conn.drainUntilReady()
}

/** One authenticated protocol-v3 connection: startup (optionally in
  * replication mode), optional TLS (SSLRequest negotiation, certificate
  * verification, SCRAM channel binding), trust or SCRAM-SHA-256[-PLUS]
  * auth with server-signature verification, simple queries, raw message
  * frames. Shared by the replication intake above and the snapshot COPY
  * executor ([[PgCopy]]). The reference carries the same knob as
  * `TlsConfig {trusted_root_certs, enabled}` on both pipeline and store
  * connections (crates/etl-config/src/shared/connection.rs:194-221).
  *
  * `sslMode` follows libpq semantics for the supported subset:
  *   - `disable`  — plaintext, no SSLRequest;
  *   - `require`  — TLS mandatory, certificate NOT verified;
  *   - `verify-ca` — TLS mandatory, server chain must anchor at
  *     `sslRootCert` (PEM, one or more certificates);
  *   - `verify-full` — verify-ca + hostname verification (the server
  *     certificate's SAN/CN must match `host`, RFC 2818/6125 — JSSE
  *     endpoint identification).
  * Under TLS, auth upgrades to SCRAM-SHA-256-PLUS (tls-server-end-point
  * channel binding) whenever the server offers it. */
final class PgWireConnection(host: String, port: Int, user: String,
    database: String, password: String, replication: Boolean = false,
    sslMode: String = "disable", sslRootCert: Option[String] = None) {
  import ReplicationSocketClient.errorMessage
  require(Set("disable", "require", "verify-ca", "verify-full")
    .contains(sslMode),
    s"unsupported sslmode '$sslMode' (disable|require|verify-ca|verify-full)")
  require(!sslMode.startsWith("verify") || sslRootCert.nonEmpty,
    s"sslmode=$sslMode needs sslRootCert (PEM trust anchors)")

  private var socket: Socket = _
  private var _in: DataInputStream = _
  private var _out: DataOutputStream = _
  /** tls-server-end-point binding data (server cert SHA-256), when TLS. */
  private var certHash: Option[Array[Byte]] = None
  def out: DataOutputStream = _out

  def connect(): Unit = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), 10000)
    socket.setTcpNoDelay(true)
    _in = new DataInputStream(socket.getInputStream)
    _out = new DataOutputStream(socket.getOutputStream)
    if (sslMode != "disable") negotiateTls()
    handshake()
  }

  /** SSLRequest (len 8, code 80877103) → 'S' upgrade / 'N' refuse. */
  private def negotiateTls(): Unit = {
    _out.writeInt(8); _out.writeInt(80877103); _out.flush()
    _in.readByte().toChar match {
      case 'S' =>
        val ssl = tlsContext().getSocketFactory
          .createSocket(socket, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        if (sslMode == "verify-full") {
          // hostname verification: JSSE checks the cert's SAN/CN
          // against the host passed to createSocket (HTTPS rules)
          val p = ssl.getSSLParameters
          p.setEndpointIdentificationAlgorithm("HTTPS")
          ssl.setSSLParameters(p)
        }
        ssl.startHandshake()
        val cert = ssl.getSession.getPeerCertificates.head
        certHash = Some(Scram.sha256(cert.getEncoded))
        socket = ssl
        _in = new DataInputStream(ssl.getInputStream)
        _out = new DataOutputStream(ssl.getOutputStream)
      case 'N' => throw new java.io.IOException(
        s"server refused TLS but sslmode=$sslMode requires it")
      case other => throw new java.io.IOException(
        s"unexpected SSLRequest response '$other'")
    }
  }

  private def tlsContext(): javax.net.ssl.SSLContext = {
    import javax.net.ssl.{SSLContext, TrustManager, TrustManagerFactory, X509TrustManager}
    val ctx = SSLContext.getInstance("TLS")
    val tms: Array[TrustManager] = sslRootCert match {
      case Some(pem) => // verify-ca: anchor the chain at the given roots
        val cf = java.security.cert.CertificateFactory.getInstance("X.509")
        val in = Files.newInputStream(Paths.get(pem))
        val certs = try {
          import scala.jdk.CollectionConverters._
          cf.generateCertificates(in).asScala.toSeq
        } finally in.close()
        require(certs.nonEmpty, s"no certificates in $pem")
        val ks = java.security.KeyStore.getInstance(
          java.security.KeyStore.getDefaultType)
        ks.load(null, null)
        certs.zipWithIndex.foreach { case (c, i) =>
          ks.setCertificateEntry(s"root-$i", c) }
        val tmf = TrustManagerFactory.getInstance(
          TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        tmf.getTrustManagers
      case None => // sslmode=require: encrypt without verification (libpq)
        Array(new X509TrustManager {
          override def checkClientTrusted(
              c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def checkServerTrusted(
              c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
            Array.empty
        })
    }
    ctx.init(null, tms, null)
    ctx
  }

  def close(): Unit = if (socket != null) socket.close()

  /** SO_TIMEOUT on the live socket (TLS-upgraded when applicable) —
    * reads past the deadline throw SocketTimeoutException instead of
    * blocking forever on a silently dead peer. Replication intakes set
    * this AFTER the handshake; snapshot COPY connections leave reads
    * unbounded (a server-side scan may legitimately pause the stream). */
  def setReadTimeoutMs(ms: Int): Unit =
    if (socket != null) socket.setSoTimeout(ms)

  def simpleQuery(sql: String): Unit = {
    val bytes = sql.getBytes(StandardCharsets.UTF_8)
    _out.write('Q'); _out.writeInt(4 + bytes.length + 1)
    _out.write(bytes); _out.write(0); _out.flush()
  }

  def readMessage(): (Char, Array[Byte]) = {
    val t = _in.readByte().toChar
    val len = _in.readInt()
    val payload = new Array[Byte](len - 4)
    _in.readFully(payload)
    (t, payload)
  }

  def drainUntilReady(): Unit = {
    var done = false
    while (!done) { val (t, _) = readMessage(); if (t == 'Z') done = true }
  }

  /** Run a simple query and collect its DataRows as text values
    * (None = SQL NULL) — the metadata surface (pg_class stats,
    * SHOW …). */
  def queryRows(sql: String): Seq[IndexedSeq[Option[String]]] = {
    simpleQuery(sql)
    val out = Seq.newBuilder[IndexedSeq[Option[String]]]
    var done = false
    while (!done) {
      val (t, payload) = readMessage()
      t match {
        case 'D' =>
          val buf = ByteBuffer.wrap(payload)
          val n = buf.getShort
          out += (0 until n).map { _ =>
            val len = buf.getInt
            if (len < 0) None
            else {
              val bytes = new Array[Byte](len); buf.get(bytes)
              Some(new String(bytes, StandardCharsets.UTF_8))
            }
          }.toIndexedSeq
        case 'Z' => done = true
        case 'E' => throw new java.io.IOException(
          s"query failed: ${ReplicationSocketClient.errorMessage(payload)}")
        case _ => ()
      }
    }
    out.result()
  }

  // ----------------------------------------------------------- handshake
  private def handshake(): Unit = {
    // StartupMessage (no type byte): len, protocol 3.0, key\0value\0…\0
    val params = Seq("user" -> user, "database" -> database) ++
      (if (replication) Seq("replication" -> "database") else Nil)
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(3 << 16) // protocol 3.0
    params.foreach { case (k, v) =>
      b.write(k.getBytes(StandardCharsets.UTF_8)); b.write(0)
      b.write(v.getBytes(StandardCharsets.UTF_8)); b.write(0)
    }
    b.write(0)
    _out.writeInt(4 + body.size()); _out.write(body.toByteArray); _out.flush()
    // AuthenticationOk ('R', code 0) or SASL/SCRAM-SHA-256 (codes
    // 10/11/12, RFC 5802/7677 — Postgres's default auth since v14),
    // then ParameterStatus/BackendKeyData until ReadyForQuery ('Z').
    var scram: Option[ScramSession] = None
    var ready = false
    while (!ready) {
      val (t, payload) = readMessage()
      t match {
        case 'R' =>
          val buf = ByteBuffer.wrap(payload)
          buf.getInt match {
            case 0 => () // AuthenticationOk
            case 10 => // AuthenticationSASL: prefer channel binding on TLS
              val mechanisms = Iterator.continually(cstring(buf))
                .takeWhile(_.nonEmpty).toSeq
              val usePlus = certHash.isDefined &&
                mechanisms.contains("SCRAM-SHA-256-PLUS")
              require(usePlus || mechanisms.contains("SCRAM-SHA-256"),
                s"server offers no supported SASL mechanism " +
                  s"(${mechanisms.mkString(",")})")
              val s = new ScramSession(user, password,
                if (usePlus) certHash else None)
              scram = Some(s)
              val first = s.clientFirstMessage.getBytes(StandardCharsets.UTF_8)
              val mech = s.mechanism.getBytes(StandardCharsets.UTF_8)
              _out.write('p')
              _out.writeInt(4 + mech.length + 1 + 4 + first.length)
              _out.write(mech); _out.write(0)
              _out.writeInt(first.length); _out.write(first); _out.flush()
            case 11 => // AuthenticationSASLContinue: server-first-message
              val s = scram.getOrElse(throw new java.io.IOException(
                "SASLContinue without SASL start"))
              val serverFirst = new String(payload, 4, payload.length - 4,
                StandardCharsets.UTF_8)
              val fin = s.clientFinalMessage(serverFirst)
                .getBytes(StandardCharsets.UTF_8)
              _out.write('p'); _out.writeInt(4 + fin.length)
              _out.write(fin); _out.flush()
            case 12 => // AuthenticationSASLFinal: verify server signature
              val s = scram.getOrElse(throw new java.io.IOException(
                "SASLFinal without SASL start"))
              val serverFinal = new String(payload, 4, payload.length - 4,
                StandardCharsets.UTF_8)
              require(s.verifyServerFinal(serverFinal),
                "server signature mismatch (not the server that holds " +
                  "the credentials) — refusing to proceed")
            case code => throw new java.io.IOException(
              s"unsupported auth request code $code " +
                "(client supports trust + SCRAM-SHA-256)")
          }
        case 'Z' => ready = true
        case 'E' => throw new java.io.IOException(
          s"server error during handshake: ${errorMessage(payload)}")
        case _ => () // ParameterStatus / BackendKeyData — informational
      }
    }
  }

  private def cstring(buf: ByteBuffer): String = {
    val sb = new StringBuilder
    var b = buf.get()
    while (b != 0) { sb.append(b.toChar); b = buf.get() }
    sb.toString
  }
}

/** SCRAM-SHA-256 primitives (RFC 5802 §2.2/§3, RFC 7677) — used by the
  * client session below and by the in-process test server's verifier. */
object Scram {
  import javax.crypto.Mac
  import javax.crypto.spec.SecretKeySpec
  import java.security.MessageDigest

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }
  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)
  /** Hi(password, salt, i) = PBKDF2-HMAC-SHA256. */
  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)).getEncoded
  }
  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }
  def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
  def attrs(msg: String): Map[String, String] =
    msg.split(",").filter(_.length >= 2).map(kv =>
      kv.substring(0, 1) -> kv.substring(2)).toMap

  def clientKey(saltedPw: Array[Byte]): Array[Byte] = hmac(saltedPw, "Client Key")
  def serverKey(saltedPw: Array[Byte]): Array[Byte] = hmac(saltedPw, "Server Key")
}

/** Client side of one SCRAM-SHA-256[-PLUS] exchange. With
  * `channelBinding` (the TLS server certificate's tls-server-end-point
  * hash, RFC 5929) the session runs SCRAM-SHA-256-PLUS: the gs2 header
  * advertises the binding and the client-final `c=` attribute carries
  * header+cert-hash, so a MITM terminating TLS with its own certificate
  * fails the proof even with a stolen password hash. Without binding:
  * `n,,` / `c=biws` (plaintext or binding-less TLS). */
final class ScramSession(user: String, password: String,
    channelBinding: Option[Array[Byte]] = None) {
  import Scram._
  private val nonce = {
    val r = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(r)
    b64(r)
  }
  /** The SASL mechanism this session speaks. */
  def mechanism: String =
    if (channelBinding.isDefined) "SCRAM-SHA-256-PLUS" else "SCRAM-SHA-256"
  private val gs2Header =
    if (channelBinding.isDefined) "p=tls-server-end-point,," else "n,,"
  // Postgres ignores n= (the startup user wins); send it anyway per RFC
  private val clientFirstBare = s"n=$user,r=$nonce"
  def clientFirstMessage: String = gs2Header + clientFirstBare

  private var authMessage: String = _
  private var saltedPw: Array[Byte] = _

  def clientFinalMessage(serverFirst: String): String = {
    val a = attrs(serverFirst)
    val fullNonce = a("r")
    require(fullNonce.startsWith(nonce),
      "server nonce does not extend the client nonce (replay?)")
    saltedPw = saltedPassword(password, unb64(a("s")), a("i").toInt)
    val cbind = b64(gs2Header.getBytes(StandardCharsets.UTF_8) ++
      channelBinding.getOrElse(Array.emptyByteArray))
    val withoutProof = s"c=$cbind,r=$fullNonce"
    authMessage = clientFirstBare + "," + serverFirst + "," + withoutProof
    val ck = clientKey(saltedPw)
    val proof = xor(ck, hmac(sha256(ck), authMessage))
    withoutProof + ",p=" + b64(proof)
  }

  def verifyServerFinal(serverFinal: String): Boolean = {
    val v = attrs(serverFinal).getOrElse("v", return false)
    java.security.MessageDigest.isEqual(
      hmac(serverKey(saltedPw), authMessage), unb64(v))
  }
}

object ReplicationSocketClient {
  /** Min interval between non-forced updates (reference
    * STATUS_UPDATE_INTERVAL, replication_message.rs:34). */
  val StatusUpdateIntervalMs = 100L
  /** Min interval between repeated flush-cap stall warnings. */
  val StallWarnIntervalMs = 60000L

  /** Export the undecided-prepare gauges and, when the flush cap holds
    * the reported position more than `warnLagBytes` behind durable
    * progress, a throttled WARN + `etl_flush_cap_stalls_total` bump.
    * A prepared transaction can legitimately stay undecided for hours
    * (that is what two-phase commit is for); while it does, the
    * publisher retains WAL from the cap and the source's progress
    * appears frozen — silent only if nothing exports it. */
  private[sources] def recordPrepareStall(ds: PgOutput.DecodeSession,
      rawFlush: Long, cappedFlush: Long, warnLagBytes: Long,
      lastWarnAtMs: AtomicLong,
      nowMs: Long = System.currentTimeMillis()): Unit = {
    import graft.pipeline.Telemetry
    val ageSec = ds.oldestPrepareAgeMs(nowMs).fold(0.0)(_ / 1000.0)
    Telemetry.gauge(Telemetry.PreparedTransactions,
      "undecided PREPAREd transactions held by the decode session")
      .set(ds.preparedCount.toDouble)
    Telemetry.gauge(Telemetry.OldestPrepareAgeSeconds,
      "age of the oldest undecided PREPARE (0 when none)").set(ageSec)
    val lag = math.max(0L, rawFlush - cappedFlush)
    Telemetry.gauge(Telemetry.FlushCapLagBytes,
      "bytes the undecided-prepare cap holds the reported flush LSN " +
        "below durable progress").set(lag.toDouble)
    if (lag > warnLagBytes) {
      val last = lastWarnAtMs.get()
      if (nowMs - last >= StallWarnIntervalMs &&
          lastWarnAtMs.compareAndSet(last, nowMs)) {
        Telemetry.counter(Telemetry.FlushCapStallsTotal,
          "flush-cap stall warnings issued").increment()
        java.util.logging.Logger.getLogger("graft.sources.replication")
          .warning(s"flush LSN capped $lag bytes below durable progress " +
            s"by ${ds.preparedCount} undecided prepared transaction(s), " +
            f"oldest ${ageSec}%.0f s — publisher WAL retention grows " +
            "until COMMIT PREPARED / ROLLBACK PREPARED")
      }
    }
  }
  /** Deadline = max(fraction × wal_sender_timeout, floor) — stay well
    * inside the sender timeout (reference apply.rs:98-116,1493-1497). */
  val DefaultWalSenderTimeoutMs = 60000L
  val KeepAliveDeadlineFraction = 0.6
  val MinKeepAliveDeadlineMs = 100L

  /** Receive deadline = max(2 × wal_sender_timeout, floor) — the
    * client-side `wal_receiver_timeout` analog: a healthy wal sender
    * keepalives at least every timeout/2 when idle, and our own
    * heartbeats request replies, so double the sender timeout of pure
    * silence means the connection is dead. */
  val MinReceiveTimeoutMs = 10000L
  def receiveTimeoutMs(walSenderTimeoutMs: Option[Long]): Int =
    math.min(Int.MaxValue.toLong, math.max(
      walSenderTimeoutMs.getOrElse(DefaultWalSenderTimeoutMs) * 2L,
      MinReceiveTimeoutMs)).toInt

  def keepAliveDeadlineMs(walSenderTimeoutMs: Option[Long]): Long =
    math.max(
      (walSenderTimeoutMs.getOrElse(DefaultWalSenderTimeoutMs) *
        KeepAliveDeadlineFraction).toLong,
      MinKeepAliveDeadlineMs)

  /** Postgres GUC duration ("60s", "1min", "500ms", bare ms). */
  def parsePgDurationMs(s: String): Option[Long] = {
    val t = s.trim
    try {
      if (t.endsWith("ms")) Some(t.dropRight(2).trim.toLong)
      else if (t.endsWith("min")) Some(t.dropRight(3).trim.toLong * 60000L)
      else if (t.endsWith("s")) Some(t.dropRight(1).trim.toLong * 1000L)
      else if (t.endsWith("h")) Some(t.dropRight(1).trim.toLong * 3600000L)
      else Some(t.toLong)
    } catch { case _: NumberFormatException => None }
  }

  /** XXXXXXXX/XXXXXXXX textual LSN. */
  def formatLsn(lsn: Long): String =
    f"${(lsn >>> 32).toInt}%X/${lsn.toInt}%X"

  /** Microseconds since 2000-01-01 (the Postgres epoch). */
  def pgEpochMicros(): Long =
    (System.currentTimeMillis() - 946684800000L) * 1000L

  private def nowMs(): Long = System.currentTimeMillis()

  private def monotonicMax(a: AtomicLong, v: Long): Unit = {
    var cur = a.get()
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
  }

  private def writeInt(out: DataOutputStream, v: Int): Unit = out.writeInt(v)

  private[sources] def errorMessage(payload: Array[Byte]): String = {
    // ErrorResponse: (code-byte, cstring)* terminated by 0; 'M' = message
    val buf = ByteBuffer.wrap(payload)
    val sb = new StringBuilder
    var done = false
    while (!done && buf.hasRemaining) {
      val code = buf.get()
      if (code == 0) done = true
      else {
        val start = buf.position()
        while (buf.get() != 0) {}
        val strBytes = new Array[Byte](buf.position() - start - 1)
        val save = buf.position()
        buf.position(start); buf.get(strBytes); buf.position(save)
        if (code == 'M')
          sb.append(new String(strBytes, StandardCharsets.UTF_8))
      }
    }
    if (sb.isEmpty) "unknown error" else sb.toString
  }

  /** Slot-aligned backfill bootstrap — the reference's
    * create-slot-then-use-its-snapshot pattern (raw.rs:419
    * `create_slot_with_transaction`, worker.rs:385) adapted to the
    * multi-connection Spark backfill: create the slot with an EXPORTED
    * snapshot and hand the snapshot name to every CTID-range COPY
    * worker (`SET TRANSACTION SNAPSHOT`), so the backfill reads
    * EXACTLY the slot's consistent point and the stream then resumes
    * from `confirmed_flush` with zero gap and zero overlap. Creating
    * the slot AFTER exporting an unrelated snapshot (the naive
    * ordering) loses every change between the export and the
    * creation — the slot only retains WAL from its own consistent
    * point.
    *
    * The exported snapshot stays importable only while this
    * replication connection is open and runs no further command (PG
    * docs, CREATE_REPLICATION_SLOT) — [[Session.close]] only after the
    * backfill has materialized. */
  object SlotBootstrap {
    final case class Session(conn: PgWireConnection, created: Boolean,
        consistentPoint: Option[String], snapshotName: Option[String]) {
      def close(): Unit = conn.close()
    }

    def ensureWithSnapshot(host: String, port: Int, user: String,
        database: String, password: String, slotName: String,
        protoVersion: Int, sslMode: String = "disable",
        sslRootCert: Option[String] = None): Session = {
      def open(): PgWireConnection = {
        val c = new PgWireConnection(host, port, user, database,
          password, replication = true, sslMode = sslMode,
          sslRootCert = sslRootCert)
        c.connect(); c
      }
      val escSlot = slotName.replace("'", "''")
      def probe(c: PgWireConnection): Boolean =
        c.queryRows("SELECT slot_name FROM pg_replication_slots " +
          s"WHERE slot_name = '$escSlot'").nonEmpty
      val conn = open()
      try {
        if (probe(conn)) return Session(conn, created = false, None, None)
        // v3 slots need the two_phase property at creation; the
        // parenthesized option syntax is PG 15+, which v3 requires
        val opts =
          if (protoVersion >= 3) " (TWO_PHASE, SNAPSHOT 'export')"
          else " EXPORT_SNAPSHOT"
        val row = conn.queryRows(
          s"""CREATE_REPLICATION_SLOT "$slotName" LOGICAL pgoutput$opts""")
          .headOption.getOrElse(IndexedSeq.empty)
        // columns: slot_name, consistent_point, snapshot_name, plugin
        Session(conn, created = true,
          consistentPoint = row.lift(1).flatten,
          snapshotName = row.lift(2).flatten)
      } catch {
        case e: java.io.IOException =>
          // a rival worker may have won the creation race; reprobe on
          // a fresh connection — slot present = goal achieved
          conn.close()
          val retry = open()
          val present =
            try probe(retry)
            catch { case _: Throwable => retry.close(); throw e }
          if (present) Session(retry, created = false, None, None)
          else { retry.close(); throw e }
      }
    }
  }

  /** The SQLSTATE ('C') field of an ErrorResponse payload. */
  private[sources] def errorSqlState(payload: Array[Byte]): Option[String] = {
    val buf = ByteBuffer.wrap(payload)
    while (buf.hasRemaining) {
      val code = buf.get()
      if (code == 0) return None
      val start = buf.position()
      while (buf.get() != 0) {}
      if (code == 'C') {
        val strBytes = new Array[Byte](buf.position() - start - 1)
        val save = buf.position()
        buf.position(start); buf.get(strBytes); buf.position(save)
        return Some(new String(strBytes, StandardCharsets.UTF_8))
      }
    }
    None
  }
}
