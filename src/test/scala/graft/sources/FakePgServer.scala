package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CopyOnWriteArrayList, LinkedBlockingDeque}

/** In-process fake Postgres speaking just enough of the frontend/backend
  * protocol (v3) to exercise [[ReplicationSocketClient]] end-to-end over
  * a loopback socket: startup/auth, `SHOW wal_sender_timeout`,
  * `START_REPLICATION` → COPY BOTH, scripted XLogData/keepalive frames
  * out, standby status updates recorded in. Protocol layout per the
  * public PostgreSQL documentation (the same wire format the reference
  * consumes through its stack, replication_message.rs:89-245). */
final class FakePgServer(walSenderTimeout: String = "60s",
    /** Non-empty → require SCRAM-SHA-256 (RFC 5802/7677 server side). */
    password: String = "",
    /** (PKCS12 keystore path, storepass) → answer SSLRequest with 'S'
      * and upgrade the session to TLS; also advertises and verifies
      * SCRAM-SHA-256-PLUS (tls-server-end-point channel binding). */
    tlsKeystore: Option[(String, String)] = None) {

  private lazy val sslContext: javax.net.ssl.SSLContext = {
    val (path, storepass) = tlsKeystore.get
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try ks.load(in, storepass.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storepass.toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
  /** tls-server-end-point binding data of our own certificate. */
  private lazy val serverCertHash: Array[Byte] = {
    val (path, storepass) = tlsKeystore.get
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try ks.load(in, storepass.toCharArray) finally in.close()
    import scala.jdk.CollectionConverters._
    val alias = ks.aliases().asScala.find(ks.isKeyEntry).get
    Scram.sha256(ks.getCertificate(alias).getEncoded)
  }

  sealed trait Action
  /** One pgoutput frame wrapped in XLogData at the given WAL position. */
  final case class Frame(bytes: Array[Byte], walStart: Long, walEnd: Long)
      extends Action
  final case class Keepalive(walEnd: Long, replyRequested: Boolean)
      extends Action

  final case class StatusUpdate(writeLsn: Long, flushLsn: Long,
      applyLsn: Long, tsMicros: Long, replyRequested: Boolean,
      atNanos: Long)

  private val script = new LinkedBlockingDeque[Action]()
  val statusUpdates = new CopyOnWriteArrayList[StatusUpdate]()
  val queries = new CopyOnWriteArrayList[String]()
  @volatile var startedStreaming = false
  /** Last SASL mechanism a client selected (test observability). */
  @volatile var sawMechanism: String = ""
  val connections = new java.util.concurrent.atomic.AtomicInteger(0)

  private var server: ServerSocket = _
  private var acceptThread: Thread = _
  @volatile private var running = true
  @volatile private var current: Socket = _

  def enqueue(a: Action*): Unit = a.foreach(script.put)

  /** `COPY … (FORMAT binary)` handler: Some(complete PGCOPY payload)
    * routes the statement to the binary branch; None falls through to
    * the TEXT handler below. */
  @volatile var copyBinaryHandler: String => Option[Array[Byte]] = _ => None
  /** COPY … TO STDOUT handler: maps the COPY statement to the TEXT rows
    * it should stream (tests install per-scan-unit data here). */
  @volatile var copyHandler: String => Seq[String] = _ => Nil
  /** When >0, COPY OUT rows are re-framed into CopyData chunks of exactly
    * this many bytes — the wire permits arbitrary frame boundaries, so
    * this exercises mid-row and mid-UTF-8-character splits. */
  @volatile var copyFrameBytes: Int = 0
  /** SELECT handler: rows (as text cells) for matching queries; None →
    * the generic empty CommandComplete reply. */
  @volatile var queryHandler: String => Option[Seq[Seq[String]]] = _ => None
  /** Answer to `SHOW server_version_num` (tests pin pre-14 servers). */
  @volatile var serverVersionNum: String = "170000"
  /** Verify the client's SCRAM-PLUS channel binding against a WRONG
    * cert hash — emulates a TLS-terminating middlebox between client
    * and backend: the honest client binds to the certificate it SAW,
    * the backend's tls-server-end-point check fails, auth is refused. */
  @volatile var corruptChannelBinding: Boolean = false

  /** Kill the live connection (wal sender restart / network blip). */
  def dropConnection(): Unit =
    if (current != null) { try current.close() catch { case _: Throwable => () } }

  def start(): Int = {
    // generous backlog: concurrent COPY tasks queue while sessions are
    // served sequentially
    server = new ServerSocket(0, 32,
      java.net.InetAddress.getLoopbackAddress)
    acceptThread = new Thread(() => {
      // CONCURRENT sessions: a snapshot exporter holds its transaction
      // open while per-range copy workers connect alongside it (and a
      // reconnecting replication client gets a fresh session)
      var live = true
      while (running && live) {
        try {
          val sock = server.accept()
          current = sock
          connections.incrementAndGet()
          val t = new Thread(() => {
            try serve(sock)
            catch { case _: Throwable => () }
          }, s"fake-pg-session-${connections.get()}")
          t.setDaemon(true)
          t.start()
        } catch { case _: Throwable => if (!running) live = false }
      }
    }, "fake-pg-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running = false
    if (current != null) { try current.close() catch { case _: Throwable => () } }
    if (server != null) server.close()
  }

  // -------------------------------------------------------------- serving
  private def serve(sock: Socket): Unit = {
    var writer: Thread = null
    try serve0(sock, w => writer = w)
    finally if (writer != null) writer.interrupt() // die without consuming
  }

  private def serve0(sock0: Socket, onWriter: Thread => Unit): Unit = {
    sock0.setTcpNoDelay(true)
    var sock = sock0
    var in = new DataInputStream(sock.getInputStream)
    var out = new DataOutputStream(sock.getOutputStream)

    // startup (untyped): len, protocol, params. An SSLRequest (80877103)
    // gets 'S' + TLS upgrade when a keystore is configured, else 'N';
    // the real startup follows on the (possibly wrapped) stream.
    var len = in.readInt()
    var proto = in.readInt()
    if (proto == 80877103) {
      if (tlsKeystore.isDefined) {
        out.write('S'); out.flush()
        val ssl = sslContext.getSocketFactory
          .createSocket(sock, null, sock.getPort, false)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(false)
        ssl.startHandshake()
        sock = ssl
        current = ssl
        in = new DataInputStream(ssl.getInputStream)
        out = new DataOutputStream(ssl.getOutputStream)
      } else { out.write('N'); out.flush() }
      len = in.readInt(); proto = in.readInt()
    }
    in.readFully(new Array[Byte](len - 8)) // parameters (ignored)
    val tlsActive = sock.isInstanceOf[javax.net.ssl.SSLSocket]
    if (password.nonEmpty && !scramExchange(in, out, tlsActive)) {
      sendMsg(out, 'E', { b =>
        b.put('S'.toByte)
        b.put("FATAL".getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
        b.put('M'.toByte)
        b.put("password authentication failed"
          .getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
        b.put(0.toByte)
      })
      sock.close(); return
    }
    sendMsg(out, 'R', b => b.putInt(0)) // AuthenticationOk
    sendMsg(out, 'Z', b => b.put('I'.toByte)) // ReadyForQuery

    while (running) {
      val t = in.readByte().toChar
      val mlen = in.readInt()
      val payload = new Array[Byte](mlen - 4)
      in.readFully(payload)
      t match {
        case 'Q' =>
          val sql = new String(payload, 0, payload.length - 1,
            StandardCharsets.UTF_8)
          queries.add(sql)
          if (sql.toLowerCase.startsWith("show server_version_num")) {
            sendMsg(out, 'T', { b =>
              b.putShort(1)
              b.put("server_version_num".getBytes(StandardCharsets.UTF_8))
              b.put(0.toByte)
              b.putInt(0); b.putShort(0); b.putInt(25)
              b.putShort(-1); b.putInt(-1); b.putShort(0)
            })
            sendMsg(out, 'D', { b =>
              val v = serverVersionNum.getBytes(StandardCharsets.UTF_8)
              b.putShort(1); b.putInt(v.length); b.put(v)
            })
            sendMsg(out, 'C', { b =>
              b.put("SHOW".getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
            })
            sendMsg(out, 'Z', b => b.put('I'.toByte))
          } else if (sql.toLowerCase.contains("wal_sender_timeout")) {
            // RowDescription + DataRow + CommandComplete + ReadyForQuery
            sendMsg(out, 'T', { b =>
              b.putShort(1)
              b.put("wal_sender_timeout".getBytes(StandardCharsets.UTF_8))
              b.put(0.toByte)
              b.putInt(0); b.putShort(0); b.putInt(25) // text
              b.putShort(-1); b.putInt(-1); b.putShort(0)
            })
            sendMsg(out, 'D', { b =>
              val v = walSenderTimeout.getBytes(StandardCharsets.UTF_8)
              b.putShort(1); b.putInt(v.length); b.put(v)
            })
            sendMsg(out, 'C', { b =>
              b.put("SHOW".getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
            })
            sendMsg(out, 'Z', b => b.put('I'.toByte))
          } else if (sql.toUpperCase.startsWith("COPY") &&
              copyBinaryHandler(sql).isDefined) {
            // binary COPY OUT: the handler provides the COMPLETE PGCOPY
            // payload (header + rows + trailer); re-framed into
            // copyFrameBytes-sized CopyData chunks when set
            val all = copyBinaryHandler(sql).get
            sendMsg(out, 'H', b => { b.put(1.toByte); b.putShort(0) })
            val step = if (copyFrameBytes > 0) copyFrameBytes else all.length
            var boff = 0
            while (boff < all.length) {
              val n = math.min(step, all.length - boff)
              val chunk = java.util.Arrays.copyOfRange(all, boff, boff + n)
              sendMsg(out, 'd', b => b.put(chunk))
              boff += n
            }
            sendMsg(out, 'c', _ => ())
            sendMsg(out, 'C', { b =>
              b.put("COPY".getBytes(StandardCharsets.UTF_8))
              b.put(0.toByte)
            })
            sendMsg(out, 'Z', b => b.put('I'.toByte))
          } else if (sql.toUpperCase.startsWith("COPY")) {
            // COPY OUT: CopyOutResponse, one CopyData per row, CopyDone,
            // CommandComplete, ReadyForQuery
            val rows = copyHandler(sql)
            sendMsg(out, 'H', b => { b.put(0.toByte); b.putShort(0) })
            if (copyFrameBytes > 0) {
              val all = rows.map(_ + "\n").mkString
                .getBytes(StandardCharsets.UTF_8)
              var off = 0
              while (off < all.length) {
                val n = math.min(copyFrameBytes, all.length - off)
                val chunk = java.util.Arrays.copyOfRange(all, off, off + n)
                sendMsg(out, 'd', b => b.put(chunk))
                off += n
              }
            } else rows.foreach { r =>
              sendMsg(out, 'd', b =>
                b.put((r + "\n").getBytes(StandardCharsets.UTF_8)))
            }
            sendMsg(out, 'c', _ => ())
            sendMsg(out, 'C', { b =>
              b.put(s"COPY ${rows.size}".getBytes(StandardCharsets.UTF_8))
              b.put(0.toByte)
            })
            sendMsg(out, 'Z', b => b.put('I'.toByte))
          } else if (sql.toUpperCase.startsWith("START_REPLICATION")) {
            sendMsg(out, 'W', b => { b.put(0.toByte); b.putShort(0) })
            startedStreaming = true
            // writer: drain the script queue onto the socket. A dead
            // session must not swallow actions: on write failure the
            // consumed action goes BACK to the head so the next
            // connection's writer delivers it in order.
            val writer = new Thread(() => {
              var live = true
              while (running && live) {
                val a =
                  try script.take()
                  catch { case _: InterruptedException => live = false; null }
                if (a != null) try {
                  a match {
                    case Frame(bytes, walStart, walEnd) =>
                      sendMsg(out, 'd', { b =>
                        b.put('w'.toByte)
                        b.putLong(walStart); b.putLong(walEnd)
                        b.putLong(nowPgMicros())
                        b.put(bytes)
                      })
                    case Keepalive(walEnd, reply) =>
                      sendMsg(out, 'd', { b =>
                        b.put('k'.toByte)
                        b.putLong(walEnd); b.putLong(nowPgMicros())
                        b.put(if (reply) 1.toByte else 0.toByte)
                      })
                  }
                } catch {
                  case _: Throwable => script.putFirst(a); live = false
                }
              }
            }, "fake-pg-writer")
            writer.setDaemon(true)
            onWriter(writer)
            writer.start()
          } else queryHandler(sql) match {
            case Some(rows) =>
              val nCols = rows.headOption.map(_.size).getOrElse(1)
              sendMsg(out, 'T', { b =>
                b.putShort(nCols.toShort)
                (0 until nCols).foreach { i =>
                  b.put(s"c$i".getBytes(StandardCharsets.UTF_8))
                  b.put(0.toByte)
                  b.putInt(0); b.putShort(0); b.putInt(25)
                  b.putShort(-1); b.putInt(-1); b.putShort(0)
                }
              })
              rows.foreach { r =>
                sendMsg(out, 'D', { b =>
                  b.putShort(r.size.toShort)
                  r.foreach { v =>
                    if (v == null) b.putInt(-1)
                    else {
                      val bytes = v.getBytes(StandardCharsets.UTF_8)
                      b.putInt(bytes.length); b.put(bytes)
                    }
                  }
                })
              }
              sendMsg(out, 'C', { b =>
                b.put(s"SELECT ${rows.size}".getBytes(StandardCharsets.UTF_8))
                b.put(0.toByte)
              })
              sendMsg(out, 'Z', b => b.put('I'.toByte))
            case None =>
              sendMsg(out, 'C', { b =>
                b.put("SELECT 0".getBytes(StandardCharsets.UTF_8))
                b.put(0.toByte)
              })
              sendMsg(out, 'Z', b => b.put('I'.toByte))
          }
        case 'd' if payload.nonEmpty && payload(0) == 'r' =>
          val b = ByteBuffer.wrap(payload, 1, payload.length - 1)
          statusUpdates.add(StatusUpdate(b.getLong, b.getLong, b.getLong,
            b.getLong, b.get() == 1, System.nanoTime()))
        case 'X' => return // Terminate
        case _ => ()
      }
    }
  }

  /** RFC 5802 server side: SASL request → client-first → server-first
    * (fresh salt/nonce, i=4096) → client-final proof verified against
    * the stored key → server signature. Under TLS also advertises
    * SCRAM-SHA-256-PLUS and verifies the tls-server-end-point channel
    * binding in the client-final `c=` attribute (RFC 5802 §5.1: the
    * gs2 header + cbind-data must round-trip exactly). Returns false on
    * a bad proof or binding. */
  private def scramExchange(in: DataInputStream,
      out: DataOutputStream, tlsActive: Boolean): Boolean = {
    import Scram._
    sendMsg(out, 'R', { b =>
      b.putInt(10) // AuthenticationSASL
      if (tlsActive) {
        b.put("SCRAM-SHA-256-PLUS".getBytes(StandardCharsets.UTF_8))
        b.put(0.toByte)
      }
      b.put("SCRAM-SHA-256".getBytes(StandardCharsets.UTF_8))
      b.put(0.toByte); b.put(0.toByte)
    })
    def readP(): Array[Byte] = {
      val t = in.readByte().toChar
      require(t == 'p', s"expected SASL response, got '$t'")
      val len = in.readInt()
      val payload = new Array[Byte](len - 4); in.readFully(payload)
      payload
    }
    // SASLInitialResponse: mechanism\0 + int32 + client-first-message
    val init = ByteBuffer.wrap(readP())
    val mech = {
      val sb = new StringBuilder
      var c = init.get()
      while (c != 0) { sb.append(c.toChar); c = init.get() }
      sb.toString
    }
    sawMechanism = mech
    val plus = mech == "SCRAM-SHA-256-PLUS"
    if (plus && !tlsActive) return false
    val cfLen = init.getInt
    val cfBytes = new Array[Byte](cfLen); init.get(cfBytes)
    val clientFirst = new String(cfBytes, StandardCharsets.UTF_8)
    val gs2Header = clientFirst.substring(0,
      clientFirst.length - clientFirst.split(",", 3)(2).length)
    if (plus && gs2Header != "p=tls-server-end-point,,") return false
    val clientFirstBare = clientFirst.split(",", 3)(2)
    val cNonce = attrs(clientFirstBare)("r")

    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val sNonce = cNonce + b64({
      val r = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(r); r
    })
    val iterations = 4096
    val serverFirst = s"r=$sNonce,s=${b64(salt)},i=$iterations"
    sendMsg(out, 'R', { b =>
      b.putInt(11) // AuthenticationSASLContinue
      b.put(serverFirst.getBytes(StandardCharsets.UTF_8))
    })

    val clientFinal = new String(readP(), StandardCharsets.UTF_8)
    val fa = attrs(clientFinal)
    if (fa.get("r") != Some(sNonce)) return false
    // channel binding: c = b64(gs2-header ++ cbind-data)
    val bindData =
      if (!plus) Array.emptyByteArray
      else if (corruptChannelBinding)
        Scram.sha256("not-the-cert-the-client-saw".getBytes(
          StandardCharsets.UTF_8))
      else serverCertHash
    val expectedC = b64(gs2Header.getBytes(StandardCharsets.UTF_8) ++
      bindData)
    if (fa.get("c") != Some(expectedC)) return false
    val withoutProof = clientFinal.substring(0, clientFinal.indexOf(",p="))
    val authMessage = clientFirstBare + "," + serverFirst + "," + withoutProof
    val saltedPw = saltedPassword(password, salt, iterations)
    val storedKey = sha256(clientKey(saltedPw))
    // recover ClientKey from the proof; SHA256 of it must equal StoredKey
    val recovered = xor(unb64(fa("p")), hmac(storedKey, authMessage))
    if (!java.security.MessageDigest.isEqual(sha256(recovered), storedKey))
      return false
    sendMsg(out, 'R', { b =>
      b.putInt(12) // AuthenticationSASLFinal
      b.put(s"v=${b64(hmac(serverKey(saltedPw), authMessage))}"
        .getBytes(StandardCharsets.UTF_8))
    })
    true
  }

  private def sendMsg(out: DataOutputStream, t: Char,
      fill: ByteBuffer => Unit): Unit = out.synchronized {
    val buf = ByteBuffer.allocate(1 << 16)
    fill(buf)
    out.write(t)
    out.writeInt(4 + buf.position())
    out.write(buf.array(), 0, buf.position())
    out.flush()
  }

  private def nowPgMicros(): Long =
    (System.currentTimeMillis() - 946684800000L) * 1000L
}
