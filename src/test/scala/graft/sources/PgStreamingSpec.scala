package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.core.PackedRow
import scala.jdk.CollectionConverters._

/** pgoutput protocol v2 — streamed in-progress transactions (PG 14+,
  * public "Logical Replication Message Formats" docs; BEYOND the
  * reference, which pins proto_version '1' at client/raw.rs:634 and so
  * makes the publisher buffer whole transactions): stream blocks spool
  * to disk, interleave across transactions, truncate on (sub)abort,
  * and replay through the regular decode path at StreamCommit —
  * producing exactly the envelope a v1 commit would have. */
class PgStreamingSpec extends AnyFunSuite {
  import PgOutput._

  private val rel = Relation(1, "public", "users", 'd', IndexedSeq(
    RelCol(1, "id", 20, -1), RelCol(0, "v", 25, -1)))

  private def row(id: String, v: String): TupleData =
    IndexedSeq(TText(id), if (v == null) TNull else TText(v))

  test("v2 control messages and in-stream frames round-trip the codec") {
    Seq[Message](StreamStart(77, firstSegment = true), StreamStop,
      StreamCommit(77, 0, 0x5000L, 0x5100L, 123456789L),
      StreamAbort(77, 78)).foreach { m =>
      assert(decode(encode(m)) == m, s"round trip failed for $m")
    }
    val ins = Insert(1, row("9", "x"))
    val (xid, v1) = stripStreamedXid(encodeStreamed(42, ins))
    assert(xid == 42 && decode(v1) == ins)
    intercept[IllegalArgumentException] {
      encodeStreamed(1, Begin(1L, 2L, 3)) // Begin never streams
    }
  }

  test("interleaved streamed transactions + a normal transaction: " +
      "lines materialize only at each StreamCommit, whole and ordered, " +
      "with the commit's LSN") {
    val s = new DecodeSession()
    def f(ms: Message*): Seq[String] =
      ms.flatMap(m => s.onFrame(encode(m)))
    def fs(xid: Int, ms: Message*): Seq[String] =
      ms.flatMap(m => s.onFrame(encodeStreamed(xid, m)))

    assert(f(rel).size == 1) // base relation announcement (R line)

    // tx A block 1, then tx B block 1 (interleaved), then a NORMAL tx
    // commits in between, then B commits, then A commits
    assert(f(StreamStart(100, firstSegment = true)).isEmpty)
    assert(fs(100, Insert(1, row("1", "a1"))).isEmpty)
    assert(f(StreamStop).isEmpty)
    assert(f(StreamStart(200, firstSegment = true)).isEmpty)
    assert(fs(200, Insert(1, row("2", "b1"))).isEmpty)
    assert(f(StreamStop).isEmpty)
    assert(s.openStreamCount == 2)

    val normal = f(Begin(0x300L, 0L, 5),
      Insert(1, row("3", "n1")), Commit(0, 0x300L, 0x301L, 0L))
    assert(normal.size == 1 && normal.head.split("\t")(0) == 0x300L.toString)

    // a second block for A
    assert(f(StreamStart(100, firstSegment = false)).isEmpty)
    assert(fs(100, Insert(1, row("4", "a2")),
      Update(1, Some('K'), Some(row("1", null)), row("1", "a1x"))).isEmpty)
    assert(f(StreamStop).isEmpty)

    val bLines = f(StreamCommit(200, 0, 0x400L, 0x401L, 0L))
    assert(bLines.size == 1)
    assert(bLines.head.split("\t")(0) == 0x400L.toString)
    assert(PackedRow.parse(bLines.head.split("\t", -1)(7)) ==
      Vector(Some("2"), Some("b1")))

    val aLines = f(StreamCommit(100, 0, 0x500L, 0x501L, 0L))
    assert(aLines.size == 3, s"tx A must replay whole: $aLines")
    val fields = aLines.map(_.split("\t", -1))
    assert(fields.forall(_(0) == 0x500L.toString),
      "every line carries the COMMIT lsn, not block-arrival positions")
    assert(fields.map(_(2)) == Seq("I", "I", "U"))
    // tx ordinals dense in replay order across blocks
    assert(fields.map(_(1)) == Seq("0", "1", "2"))
    assert(s.openStreamCount == 0, "spools must drain at commit")
  }

  test("StreamAbort: whole-transaction abort drops everything; a " +
      "subtransaction abort truncates exactly the subxid's tail") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    def fs(xid: Int, ms: Message*): Seq[String] =
      ms.flatMap(m => s.onFrame(encodeStreamed(xid, m)))

    // whole abort
    f(StreamStart(50, firstSegment = true))
    fs(50, Insert(1, row("1", "gone")))
    f(StreamStop, StreamAbort(50, 50))
    assert(s.openStreamCount == 0)
    // PG never commits an aborted stream; if a corrupt stream does, the
    // session rejects instead of emitting a phantom transaction
    intercept[IllegalStateException] {
      f(StreamCommit(50, 0, 0x600L, 0x601L, 0L))
    }

    val s2 = new DecodeSession()
    s2.onFrame(encode(rel))
    def f2(ms: Message*): Seq[String] =
      ms.flatMap(m => s2.onFrame(encode(m)))
    def fs2(xid: Int, ms: Message*): Seq[String] =
      ms.flatMap(m => s2.onFrame(encodeStreamed(xid, m)))
    // parent change (subxid = top xid), then subxact 61 changes, then
    // rollback-to-savepoint aborts 61, then more parent changes
    f2(StreamStart(60, firstSegment = true))
    fs2(60, Insert(1, row("1", "keep1")))
    fs2(61, Insert(1, row("2", "drop1")),
      Insert(1, row("3", "drop2")))
    f2(StreamStop, StreamAbort(60, 61))
    f2(StreamStart(60, firstSegment = false))
    fs2(60, Insert(1, row("4", "keep2")))
    f2(StreamStop)
    val lines = f2(StreamCommit(60, 0, 0x700L, 0x701L, 0L))
    val vals = lines.map(l => PackedRow.parse(l.split("\t", -1)(7))(1).get)
    assert(vals == Seq("keep1", "keep2"),
      s"subabort must cut exactly the subxid tail: $vals")
  }

  test("an in-stream Relation applies at REPLAY, not at arrival: a " +
      "concurrent normal transaction keeps decoding under the old " +
      "schema until the streamed commit lands") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    val rel3 = Relation(1, "public", "users", 'd', IndexedSeq(
      RelCol(1, "id", 20, -1), RelCol(0, "v", 25, -1),
      RelCol(0, "extra", 25, -1)))
    // the streamed tx announces a WIDER relation + a 3-col insert
    f(StreamStart(70, firstSegment = true))
    s.onFrame(encodeStreamed(70, rel3))
    s.onFrame(encodeStreamed(70,
      Insert(1, IndexedSeq(TText("7"), TText("w"), TText("e")))))
    f(StreamStop)
    // a normal 2-col tx decodes fine meanwhile — the global relation
    // cache is untouched by the spooled announcement
    val normal = f(Begin(0x800L, 0L, 9), Insert(1, row("8", "old")),
      Commit(0, 0x800L, 0x801L, 0L))
    assert(normal.size == 1 &&
      PackedRow.parse(normal.head.split("\t", -1)(7)) ==
        Vector(Some("8"), Some("old")))
    // the streamed commit replays R + the 3-col insert in order
    val lines = f(StreamCommit(70, 0, 0x900L, 0x901L, 0L))
    assert(lines.size == 2 && lines.head.split("\t")(2) == "R")
    assert(PackedRow.parse(lines(1).split("\t", -1)(7)) ==
      Vector(Some("7"), Some("w"), Some("e")))
  }

  test("a non-streamable control frame inside a stream block rejects " +
      "instead of corrupting session state") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    s.onFrame(encode(StreamStart(40, firstSegment = true)))
    val e = intercept[IllegalArgumentException] {
      s.onFrame(encode(Begin(0x100L, 0L, 1))) // Begin cannot nest here
    }
    assert(e.getMessage.contains("illegal inside a stream block"))
    // the block still closes and the stream still commits normally
    s.onFrame(encodeStreamed(40, Insert(1, row("1", "ok"))))
    s.onFrame(encode(StreamStop))
    assert(s.onFrame(encode(
      StreamCommit(40, 0, 0x200L, 0x201L, 0L))).size == 1)
  }

  test("two-phase commit round trips + session: changes spool at " +
      "PREPARE, apply whole at COMMIT PREPARED, vanish at ROLLBACK " +
      "PREPARED, and the flush cap holds below undecided prepares") {
    Seq[Message](
      BeginPrepare(0x10L, 0x20L, 5L, 31, "gid-a"),
      Prepare(0, 0x10L, 0x20L, 5L, 31, "gid-a"),
      CommitPrepared(0, 0x30L, 0x40L, 6L, 31, "gid-a"),
      RollbackPrepared(0, 0x20L, 0x50L, 5L, 7L, 31, "gid-a"),
      StreamPrepare(0, 0x10L, 0x20L, 5L, 31, "gid-a")).foreach { m =>
      assert(decode(encode(m)) == m, s"round trip failed for $m")
    }

    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))

    // prepared tx: nothing emits at PREPARE; the flush cap drops below
    // the prepare LSN while it is undecided
    assert(f(BeginPrepare(0x1000L, 0x1010L, 0L, 21, "g1"),
      Insert(1, row("1", "p1")), Insert(1, row("2", "p2")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 21, "g1")).isEmpty)
    assert(s.preparedCount == 1)
    assert(s.flushCap(0x5000L) == 0x1000L - 1,
      "flush must hold below the undecided prepare")
    assert(s.flushCap(0x500L) == 0x500L, "a lower flush passes through")

    // an unrelated normal tx commits while g1 is pending
    val n = f(Begin(0x1100L, 0L, 22), Insert(1, row("3", "n")),
      Commit(0, 0x1100L, 0x1101L, 0L))
    assert(n.size == 1)

    // COMMIT PREPARED applies the whole prepared tx at ITS commit LSN
    val lines = f(CommitPrepared(0, 0x2000L, 0x2001L, 0L, 21, "g1"))
    assert(lines.size == 2 &&
      lines.forall(_.split("	")(0) == 0x2000L.toString))
    assert(PackedRow.parse(lines.head.split("	", -1)(7)) ==
      Vector(Some("1"), Some("p1")))
    assert(s.preparedCount == 0)
    // the cap HOLDS past onFrame's return: the replayed lines are not
    // yet durable, and a heartbeat confirming past the prepare before
    // the caller appends them + a crash would lose the transaction
    // (the durable floor file only caps the restart REQUEST; the
    // server starts at max(requested, confirmed_flush))
    assert(s.flushCap(0x5000L) == 0x1000L - 1,
      "replay floor must hold until the replayed lines are appended")
    s.clearReplayFloor() // the client appended the lines durably
    assert(s.flushCap(0x5000L) == 0x5000L)

    // ROLLBACK PREPARED discards without a trace
    f(BeginPrepare(0x3000L, 0x3010L, 0L, 23, "g2"),
      Insert(1, row("9", "doomed")),
      Prepare(0, 0x3000L, 0x3010L, 0L, 23, "g2"))
    assert(f(RollbackPrepared(0, 0x3010L, 0x3020L, 0L, 0L, 23, "g2"))
      .isEmpty)
    assert(s.preparedCount == 0)
    intercept[IllegalStateException] { // committing the rolled-back gid
      f(CommitPrepared(0, 0x4000L, 0x4001L, 0L, 23, "g2"))
    }

    // a REDELIVERED BeginPrepare (post-restart replay) resets the spool
    // instead of doubling it
    f(BeginPrepare(0x6000L, 0x6010L, 0L, 24, "g3"),
      Insert(1, row("4", "v1")),
      Prepare(0, 0x6000L, 0x6010L, 0L, 24, "g3"))
    f(BeginPrepare(0x6000L, 0x6010L, 0L, 24, "g3"), // redelivery
      Insert(1, row("4", "v1")),
      Prepare(0, 0x6000L, 0x6010L, 0L, 24, "g3"))
    val rd = f(CommitPrepared(0, 0x7000L, 0x7001L, 0L, 24, "g3"))
    assert(rd.size == 1, s"redelivered prepare must not double: $rd")
    // the replay floor also drops DEFENSIVELY at the next frame (a
    // same-thread caller has consumed the previous lines by then)
    assert(s.flushCap(0x9000L) == 0x6000L - 1)
    f(Begin(0x8000L, 0L, 25), Commit(0, 0x8000L, 0x8001L, 0L))
    assert(s.flushCap(0x9000L) == 0x9000L,
      "the next frame must retire a stale replay floor")
  }

  test("streamed + prepared: StreamPrepare moves the stream spool to " +
      "the prepared set; CommitPrepared replays it") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    f(StreamStart(90, firstSegment = true))
    s.onFrame(encodeStreamed(90, Insert(1, row("1", "sp1"))))
    s.onFrame(encodeStreamed(90, Insert(1, row("2", "sp2"))))
    f(StreamStop)
    assert(f(StreamPrepare(0, 0x8000L, 0x8010L, 0L, 90, "g9")).isEmpty)
    assert(s.openStreamCount == 0 && s.preparedCount == 1)
    assert(s.flushCap(0x9000L) == 0x8000L - 1)
    val lines = f(CommitPrepared(0, 0x9000L, 0x9001L, 0L, 90, "g9"))
    assert(lines.size == 2 &&
      lines.forall(_.split("	")(0) == 0x9000L.toString))
    assert(s.preparedCount == 0)
  }

  test("an Origin frame inside the first stream segment marks the " +
      "streamed transaction foreign: dropForeignOrigins filters its " +
      "data at StreamCommit (Relation records still register)") {
    // pgoutput writes the transaction's Origin message right after the
    // first Stream Start when the tx carries one — it is a protocol
    // message (no leading subxid) and must be ACCEPTED inside the block
    def run(drop: Boolean): Seq[String] = {
      val s = new DecodeSession(dropForeignOrigins = drop)
      s.onFrame(encode(rel))
      def f(ms: Message*): Seq[String] =
        ms.flatMap(m => s.onFrame(encode(m)))
      f(StreamStart(300, firstSegment = true))
      f(Origin(0x42L, "upstream-node"))
      s.onFrame(encodeStreamed(300, Insert(1, row("1", "foreign"))))
      f(StreamStop)
      // interleave a NATIVE streamed tx — no origin — to prove the
      // stamp is per-xid, not session-global
      f(StreamStart(301, firstSegment = true))
      s.onFrame(encodeStreamed(301, Insert(1, row("2", "native"))))
      f(StreamStop)
      f(StreamCommit(300, 0, 0xB00L, 0xB01L, 0L)) ++
        f(StreamCommit(301, 0, 0xC00L, 0xC01L, 0L))
    }
    val kept = run(drop = false)
    assert(kept.size == 2, s"default keeps foreign data: $kept")
    val dropped = run(drop = true)
    assert(dropped.size == 1 &&
      PackedRow.parse(dropped.head.split("\t", -1)(7)) ==
        Vector(Some("2"), Some("native")),
      s"foreign streamed tx must filter, native must survive: $dropped")
    // after a foreign StreamCommit the session decodes normally again
    val s = new DecodeSession(dropForeignOrigins = true)
    s.onFrame(encode(rel))
    s.onFrame(encode(StreamStart(310, firstSegment = true)))
    s.onFrame(encode(Origin(0x42L, "upstream-node")))
    s.onFrame(encodeStreamed(310, Insert(1, row("3", "f"))))
    s.onFrame(encode(StreamStop))
    assert(s.onFrame(encode(StreamCommit(310, 0, 0xD00L, 0xD01L, 0L)))
      .isEmpty)
    val native = Seq(Begin(0xE00L, 0L, 7), Insert(1, row("4", "n")),
      Commit(0, 0xE00L, 0xE01L, 0L)).flatMap(m => s.onFrame(encode(m)))
    assert(native.size == 1, "the foreign stamp must not leak forward")
  }

  test("a foreign-origin PREPARED transaction filters at CommitPrepared " +
      "(the stamp survives the prepare bracket); StreamPrepare " +
      "transfers the streamed stamp to the gid") {
    val s = new DecodeSession(dropForeignOrigins = true)
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    // plain two-phase: Origin arrives inside the BeginPrepare bracket
    f(BeginPrepare(0x1000L, 0x1010L, 0L, 41, "fg1"),
      Origin(0x42L, "upstream-node"),
      Insert(1, row("1", "foreign")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 41, "fg1"))
    assert(f(CommitPrepared(0, 0x2000L, 0x2001L, 0L, 41, "fg1")).isEmpty,
      "prepared foreign data must not re-emit (loop breaker)")
    // a NATIVE prepared tx still applies
    f(BeginPrepare(0x3000L, 0x3010L, 0L, 42, "ng1"),
      Insert(1, row("2", "native")),
      Prepare(0, 0x3000L, 0x3010L, 0L, 42, "ng1"))
    assert(f(CommitPrepared(0, 0x4000L, 0x4001L, 0L, 42, "ng1")).size == 1)
    // streamed + prepared: stamp recorded at the stream's Origin frame
    // transfers through StreamPrepare to the gid
    f(StreamStart(43, firstSegment = true), Origin(0x42L, "upstream-node"))
    s.onFrame(encodeStreamed(43, Insert(1, row("3", "foreign"))))
    f(StreamStop, StreamPrepare(0, 0x5000L, 0x5010L, 0L, 43, "fg2"))
    assert(f(CommitPrepared(0, 0x6000L, 0x6001L, 0L, 43, "fg2")).isEmpty)
    // RollbackPrepared clears the foreign stamp with the spool
    f(BeginPrepare(0x7000L, 0x7010L, 0L, 44, "fg3"),
      Origin(0x42L, "x"), Insert(1, row("4", "f")),
      Prepare(0, 0x7000L, 0x7010L, 0L, 44, "fg3"),
      RollbackPrepared(0, 0x7010L, 0x7020L, 0L, 0L, 44, "fg3"))
    // same gid reused natively: must NOT inherit the stale stamp
    f(BeginPrepare(0x8000L, 0x8010L, 0L, 45, "fg3"),
      Insert(1, row("5", "native")),
      Prepare(0, 0x8000L, 0x8010L, 0L, 45, "fg3"))
    assert(f(CommitPrepared(0, 0x9000L, 0x9001L, 0L, 45, "fg3")).size == 1)
  }

  test("spool lifecycle: files live in ONE session directory, vanish " +
      "at commit/close, and no per-file deleteOnExit entries accrue") {
    val deleteOnExitFiles: java.util.LinkedHashSet[String] = {
      val cls = Class.forName("java.io.DeleteOnExitHook")
      val fld = cls.getDeclaredField("files")
      fld.setAccessible(true)
      fld.get(null).asInstanceOf[java.util.LinkedHashSet[String]]
    }
    val hookBefore = deleteOnExitFiles.size
    val base = java.nio.file.Files.createTempDirectory("spool-spec-")
    val dirsBefore = PgOutput.SpoolDirs.liveCount
    val s = new DecodeSession(spoolDir = Some(base))
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    (0 until 20).foreach { i =>
      f(StreamStart(1000 + i, firstSegment = true))
      s.onFrame(encodeStreamed(1000 + i, Insert(1, row(i.toString, "v"))))
      f(StreamStop)
      f(StreamCommit(1000 + i, 0, 0x1000L + i, 0x1001L + i, 0L))
    }
    assert(deleteOnExitFiles.size == hookBefore,
      "decoding streamed transactions must not grow DeleteOnExitHook")
    assert(PgOutput.SpoolDirs.liveCount == dirsBefore + 1,
      "one session = one spool directory")
    // the session dir exists under base and is EMPTY (spools deleted
    // at each commit)
    val sessionDirs = {
      val l = java.nio.file.Files.list(base)
      try l.iterator().asScala.toList finally l.close()
    }
    assert(sessionDirs.size == 1)
    val inDir = {
      val l = java.nio.file.Files.list(sessionDirs.head)
      try l.iterator().asScala.toList finally l.close()
    }
    assert(inDir.isEmpty, s"spool files must vanish at commit: $inDir")
    // an OPEN spool holds a file; close() releases it with the dir
    f(StreamStart(2000, firstSegment = true))
    s.onFrame(encodeStreamed(2000, Insert(1, row("9", "open"))))
    f(StreamStop)
    assert({
      val l = java.nio.file.Files.list(sessionDirs.head)
      try l.iterator().asScala.nonEmpty finally l.close()
    })
    s.close()
    assert(PgOutput.SpoolDirs.liveCount == dirsBefore)
    assert(!java.nio.file.Files.exists(sessionDirs.head),
      "close() must remove the session spool directory")
    assert(deleteOnExitFiles.size == hookBefore)
  }

  test("close() retains the undecided-prepare floor and a successor " +
      "session inherits it until redelivery re-establishes a live cap") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    f(BeginPrepare(0x1000L, 0x1010L, 0L, 51, "gf"),
      Insert(1, row("1", "p")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 51, "gf"))
    assert(s.oldestPrepareAgeMs(System.currentTimeMillis() + 50)
      .exists(_ >= 50L), "age gauge must see the undecided prepare")
    val floor = s.close()
    assert(floor.contains(0x1000L))
    // the CLOSED session still caps (stop()'s final status update)
    assert(s.flushCap(0x5000L) == 0x1000L - 1)
    // a successor session inherits the floor...
    val s2 = new DecodeSession()
    s2.inheritPrepareFloor(floor)
    assert(s2.flushCap(0x5000L) == 0x1000L - 1)
    assert(s2.oldestPrepareAgeMs().isEmpty, "inherited floor has no age")
    // ...until the publisher redelivers the prepare, which replaces the
    // inherited floor with a live cap at the same LSN
    s2.onFrame(encode(rel))
    Seq(BeginPrepare(0x1000L, 0x1010L, 0L, 51, "gf"),
      Insert(1, row("1", "p")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 51, "gf"))
      .foreach(m => s2.onFrame(encode(m)))
    assert(s2.flushCap(0x5000L) == 0x1000L - 1, "live cap holds")
    val lines = s2.onFrame(encode(
      CommitPrepared(0, 0x2000L, 0x2001L, 0L, 51, "gf")))
    assert(lines.size == 1)
    s2.clearReplayFloor() // the replayed lines are appended
    assert(s2.flushCap(0x5000L) == 0x5000L,
      "the inherited floor must retire with the decision, not pin " +
        "the flush forever")
    s2.close(); s.close()
  }

  test("DDL inside a prepare bracket spools WITH the transaction: " +
      "ROLLBACK PREPARED drops the schema change entirely; a " +
      "redelivered bracket + COMMIT PREPARED applies it at the commit " +
      "position") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    val relWide = Relation(1, "public", "users", 'd', IndexedSeq(
      RelCol(1, "id", 20, -1), RelCol(0, "v", 25, -1),
      RelCol(0, "w", 25, -1)))
    def bracket(): Unit = {
      f(BeginPrepare(0x1000L, 0x1010L, 0L, 81, "gddl"))
      s.onFrame(encode(relWide)) // ALTER TABLE inside the prepared tx
      s.onFrame(encode(Insert(1,
        IndexedSeq(TText("1"), TText("a"), TText("b")))))
      f(Prepare(0, 0x1000L, 0x1010L, 0L, 81, "gddl"))
    }
    bracket()
    // nothing emitted, nothing applied: the base schema still decodes
    // a concurrent 2-column transaction
    val n = f(Begin(0x1100L, 0L, 82), Insert(1, row("5", "plain")),
      Commit(0, 0x1100L, 0x1101L, 0L))
    assert(n.size == 1 &&
      PackedRow.parse(n.head.split("\t", -1)(7)) ==
        Vector(Some("5"), Some("plain")))
    // the rollback drops the spool — the widened schema NEVER lands
    f(RollbackPrepared(0, 0x1010L, 0x1200L, 0L, 0L, 81, "gddl"))
    val n2 = f(Begin(0x1300L, 0L, 83), Insert(1, row("6", "still2col")),
      Commit(0, 0x1300L, 0x1301L, 0L))
    assert(n2.size == 1 &&
      PackedRow.parse(n2.head.split("\t", -1)(7)) ==
        Vector(Some("6"), Some("still2col")),
      "a rolled-back prepared DDL must leave the schema untouched")
    // redelivered bracket decided by COMMIT PREPARED: the R record and
    // the 3-column insert land together at the commit LSN
    bracket()
    val lines = f(CommitPrepared(0, 0x2000L, 0x2001L, 0L, 81, "gddl"))
    s.clearReplayFloor()
    assert(lines.size == 2, s"expected R + insert, got:\n$lines")
    val lf = lines.map(_.split("\t", -1))
    assert(lf(0)(2) == "R" && lf(0)(0) == 0x2000L.toString)
    assert(lf(1)(2) == "I" &&
      PackedRow.parse(lf(1)(7)) ==
        Vector(Some("1"), Some("a"), Some("b")))
    s.close()
  }

  test("a session closed MID-REPLAY (CommitPrepared decoded, lines not " +
      "yet appended) carries the replay floor to its successor") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    f(BeginPrepare(0x1000L, 0x1010L, 0L, 55, "gc"),
      Insert(1, row("1", "p")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 55, "gc"))
    val lines = f(CommitPrepared(0, 0x2000L, 0x2001L, 0L, 55, "gc"))
    assert(lines.size == 1)
    // crash here: the lines never reach the log — the carried floor
    // must still protect the prepare so the redelivery happens
    val floor = s.close()
    assert(floor.contains(0x1000L),
      "a close mid-replay must carry the undecided-prepare floor")
    assert(s.flushCap(0x5000L) == 0x1000L - 1,
      "the closed session's final status update stays capped")
  }

  test("prepare-stall telemetry: gauges track prepared count/age and " +
      "the stall counter fires throttled once the lag crosses the " +
      "threshold") {
    graft.pipeline.Telemetry.resetForTest()
    import graft.pipeline.Telemetry
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    def f(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    f(BeginPrepare(0x1000L, 0x1010L, 0L, 61, "tg"),
      Insert(1, row("1", "p")),
      Prepare(0, 0x1000L, 0x1010L, 0L, 61, "tg"))
    val warnAt = new java.util.concurrent.atomic.AtomicLong(0L)
    val now = System.currentTimeMillis() + 30000
    val raw = 0x1000L + (100L << 20) // durable progress 100 MiB past cap
    ReplicationSocketClient.recordPrepareStall(
      s, raw, s.flushCap(raw), 64L << 20, warnAt, now)
    assert(Telemetry.gauge(Telemetry.PreparedTransactions).value() == 1.0)
    assert(Telemetry.gauge(Telemetry.OldestPrepareAgeSeconds).value()
      >= 29.0)
    assert(Telemetry.gauge(Telemetry.FlushCapLagBytes).value()
      >= (100L << 20).toDouble - 1)
    assert(Telemetry.counter(Telemetry.FlushCapStallsTotal).value() == 1.0)
    // throttled: an immediate second call does not re-warn
    ReplicationSocketClient.recordPrepareStall(
      s, raw, s.flushCap(raw), 64L << 20, warnAt, now + 1000)
    assert(Telemetry.counter(Telemetry.FlushCapStallsTotal).value() == 1.0)
    // after the decision the gauges return to rest
    f(CommitPrepared(0, 0x2000L, 0x2001L, 0L, 61, "tg"))
    s.clearReplayFloor() // the replayed lines are appended
    ReplicationSocketClient.recordPrepareStall(
      s, raw, s.flushCap(raw), 64L << 20, warnAt, now + 2000)
    assert(Telemetry.gauge(Telemetry.PreparedTransactions).value() == 0.0)
    assert(Telemetry.gauge(Telemetry.OldestPrepareAgeSeconds).value() == 0.0)
    assert(Telemetry.gauge(Telemetry.FlushCapLagBytes).value() == 0.0)
    s.close()
  }

  test("flushCap hammer: a status thread racing prepare redeliveries " +
      "never reads PAST the undecided prepare and never crashes " +
      "(decode/status threads share the prepared-state lock)") {
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    val P = 0x1000L
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var stop = false
    val prober = new Thread(() => {
      while (!stop) {
        try {
          // the cap must hold for EVERY interleaving of the
          // redelivery's remove+reinsert — a missed entry here would
          // confirm the flush past the prepare and lose the tx
          val f = s.flushCap(0x5000L)
          if (f != P - 1) errors.add(new AssertionError(
            s"cap leaked mid-redelivery: $f"))
          s.preparedCount; s.oldestPrepareAgeMs(); s.prepareFloorLsn
        } catch { case e: Throwable => errors.add(e); stop = true }
      }
    }, "flushcap-prober")
    // an undecided prepare exists for the whole hammer window
    Seq(BeginPrepare(P, P + 0x10, 0L, 71, "gh"),
      Insert(1, row("1", "p")),
      Prepare(0, P, P + 0x10, 0L, 71, "gh"))
      .foreach(m => s.onFrame(encode(m)))
    prober.setDaemon(true); prober.start()
    val deadline = System.currentTimeMillis() + 1000
    while (System.currentTimeMillis() < deadline) {
      // redeliver the SAME prepare over and over (remove + reinsert)
      Seq(BeginPrepare(P, P + 0x10, 0L, 71, "gh"),
        Insert(1, row("1", "p")),
        Prepare(0, P, P + 0x10, 0L, 71, "gh"))
        .foreach(m => s.onFrame(encode(m)))
    }
    stop = true
    prober.join(2000)
    assert(errors.isEmpty, s"raced into: ${errors.toArray.toSeq.take(3)}")
    val lines = s.onFrame(encode(CommitPrepared(0, 0x2000L, 0x2001L, 0L,
      71, "gh")))
    assert(lines.size == 1 && s.flushCap(0x5000L) == P - 1,
      "the cap must hold through the replay window")
    s.clearReplayFloor()
    assert(s.flushCap(0x5000L) == 0x5000L)
    s.close()
  }

  test("byte accounting: streamed tuple-value bytes park at StreamCommit " +
      "and record processed at the flushed ack") {
    graft.pipeline.Telemetry.resetForTest()
    val s = new DecodeSession()
    s.onFrame(encode(rel))
    s.onFrame(encode(StreamStart(80, firstSegment = true)))
    s.onFrame(encodeStreamed(80, Insert(1, row("1", "abcd")))) // 1+4=5
    s.onFrame(encode(StreamStop))
    s.onFrame(encode(StreamCommit(80, 0, 0xA00L, 0xA01L, 0L)))
    def processed = graft.pipeline.Telemetry
      .counter(graft.pipeline.Telemetry.BytesProcessedTotal)
      .value(Seq("event_type" -> "insert"))
    assert(processed == 0.0)
    s.ackProcessed(0xA00L)
    assert(processed == 5.0)
  }

  test("BINARY tuple cells inside a stream block survive the disk spool " +
      "and convert at replay — binary mode and v2 streaming compose") {
    val relBin = Relation(2, "public", "bins", 'd', IndexedSeq(
      RelCol(1, "id", 23, -1), RelCol(0, "born", 1082, -1),
      RelCol(0, "price", 1700, -1)))
    def be32(v: Int) =
      java.nio.ByteBuffer.allocate(4).putInt(v).array().toVector
    val numeric = java.nio.ByteBuffer.allocate(12).putShort(2).putShort(0)
      .putShort(0).putShort(4).putShort(1234).putShort(5678)
      .array().toVector
    val s = new DecodeSession()
    s.onFrame(encode(relBin))
    s.onFrame(encode(StreamStart(90, firstSegment = true)))
    assert(s.onFrame(encodeStreamed(90, Insert(2, IndexedSeq(
      TBinary(be32(7)), TBinary(be32(8324)), TBinary(numeric))))).isEmpty)
    s.onFrame(encode(StreamStop))
    val lines = s.onFrame(encode(StreamCommit(90, 0, 0xB00L, 0xB01L, 0L)))
    assert(lines.size == 1)
    assert(PackedRow.parse(lines.head.split("\t", -1)(7)) ==
      Vector(Some("7"), Some("2022-10-16"), Some("1234.5678")))
    s.close()
  }
}
