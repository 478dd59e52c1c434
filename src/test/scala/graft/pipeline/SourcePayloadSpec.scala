package graft.pipeline

import graft.sources.{FakePgServer, PgCopy, PgOutput, PgWireConnection}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Source-payload byte accounting (round-10 verdict item 6; reference
  * crates/etl/src/source_payload_metadata.rs + egress.rs): pgoutput
  * tuple VALUE bytes and COPY row BODY bytes measured at the decode
  * boundary, received/row-size at ingestion, processed only after the
  * downstream acknowledgement, zero-byte rows tracked as present, and
  * the billing trace emitted for non-zero acknowledged totals only. */
class SourcePayloadSpec extends AnyFunSuite {
  import PgOutput._

  private def rel(id: Int) = Relation(id, "public", s"t$id", 'd',
    IndexedSeq(RelCol(1, "id", 25, -1), RelCol(0, "v", 25, -1)))

  private def recv(name: String, et: String): Double =
    Telemetry.counter(name).value(Seq("event_type" -> et))
  private def rowCount(et: String): Long =
    Telemetry.histogram(SourcePayload.RowSizeBytes)
      .count(Seq("event_type" -> et))

  test("streaming tuple-value bytes: measured at decode, processed only " +
      "at the flushed ack, zero-byte rows present, NULL/TOAST excluded") {
    Telemetry.resetForTest()
    SourcePayload.resetEgressForTest()
    val s = new DecodeSession()
    def frames(ms: Message*): Unit = ms.foreach(m => s.onFrame(encode(m)))

    frames(rel(1),
      Begin(100L, 0L, 1),
      // insert: "hello" (5) + NULL (0) = 5
      Insert(1, IndexedSeq(TText("hello"), TNull)),
      // update: old key "k" (1) + new ("hello!" 6 + 3 binary) = 10
      Update(1, Some('K'), Some(IndexedSeq(TText("k"), TNull)),
        IndexedSeq(TText("hello!"), TBinary(Vector[Byte](1, 2, 3)))),
      // delete: key "k" (1); unchanged-TOAST in a tuple counts 0
      Delete(1, 'K', IndexedSeq(TText("k"), TUnchangedToast)),
      Commit(0, 100L, 100L, 0L))

    // received at ingestion, exact to the measurement contract
    assert(recv(SourcePayload.BytesReceivedTotal, "insert") == 5.0)
    assert(recv(SourcePayload.BytesReceivedTotal, "update") == 10.0)
    assert(recv(SourcePayload.BytesReceivedTotal, "delete") == 1.0)
    assert(rowCount("insert") == 1 && rowCount("update") == 1 &&
      rowCount("delete") == 1)
    // NOT processed yet — no acknowledgement
    assert(recv(Telemetry.BytesProcessedTotal, "insert") == 0.0)

    // an ack below the commit releases nothing; at the commit, all of it
    s.ackProcessed(99L)
    assert(recv(Telemetry.BytesProcessedTotal, "insert") == 0.0)
    s.ackProcessed(100L)
    assert(recv(Telemetry.BytesProcessedTotal, "insert") == 5.0)
    assert(recv(Telemetry.BytesProcessedTotal, "update") == 10.0)
    assert(recv(Telemetry.BytesProcessedTotal, "delete") == 1.0)
    // a replayed ack is a no-op (pending meta drained)
    s.ackProcessed(100L)
    assert(recv(Telemetry.BytesProcessedTotal, "insert") == 5.0)

    // a zero-byte row is an observation, not an absence: the delete of
    // an all-NULL key adds 0 bytes but one row-size observation
    frames(Begin(200L, 0L, 2),
      Delete(1, 'K', IndexedSeq(TNull, TNull)),
      Commit(0, 200L, 200L, 0L))
    assert(recv(SourcePayload.BytesReceivedTotal, "delete") == 1.0)
    assert(rowCount("delete") == 2, "zero-byte delete must still observe")
    s.ackProcessed(200L)
    assert(recv(Telemetry.BytesProcessedTotal, "delete") == 1.0)
  }

  test("billing trace: non-zero acknowledged totals emit " +
      "etl_processed_bytes; zero-byte acknowledgements do not") {
    Telemetry.resetForTest()
    val dir = Files.createTempDirectory("graft-egress").toString
    val log = s"$dir/egress.jsonl"
    SourcePayload.installEgressTrace(
      new Telemetry.TraceLog(log, "proj", 7L))
    try {
      val s = new DecodeSession()
      def frames(ms: Message*): Unit = ms.foreach(m => s.onFrame(encode(m)))
      frames(rel(1),
        Begin(10L, 0L, 1),
        Delete(1, 'K', IndexedSeq(TNull, TNull)), // zero bytes
        Commit(0, 10L, 10L, 0L),
        Begin(20L, 0L, 2),
        Insert(1, IndexedSeq(TText("abc"), TNull)), // 3 bytes
        Commit(0, 20L, 20L, 0L))
      s.ackProcessed(10L) // zero-byte tx: presence counted, no billing
      s.ackProcessed(20L)
      val lines = new String(Files.readAllBytes(
        java.nio.file.Paths.get(log)), StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty)
      assert(lines.length == 1, s"expected ONE billing line: ${lines.toSeq}")
      assert(lines(0).contains("\"etl_processed_bytes\"") &&
        lines(0).contains("\"bytes_sent\":\"3\"") &&
        lines(0).contains("\"processing_type\":\"streaming\"") &&
        lines(0).contains("\"destination_type\":\"graft-log\""))
    } finally SourcePayload.resetEgressForTest()
  }

  test("COPY row-body bytes: each CopyData row counts its body incl. the " +
      "newline; the total records processed when the consumer drains " +
      "the stream") {
    Telemetry.resetForTest()
    SourcePayload.resetEgressForTest()
    val server = new FakePgServer()
    val rows = Vector("1\talpha", "2\t\\N", "3\tlong-value-€")
    server.copyHandler = _ => rows
    val port = server.start()
    try {
      val conn = new PgWireConnection("127.0.0.1", port, "u", "db", "")
      conn.connect()
      val got = PgCopy.copyText(conn, "COPY (SELECT 1) TO STDOUT")
      conn.close()
      assert(got == rows)
      val want = rows.map(_.getBytes(StandardCharsets.UTF_8).length + 1L).sum
      assert(recv(SourcePayload.BytesReceivedTotal, "copy") == want.toDouble)
      assert(rowCount("copy") == rows.length)
      assert(recv(Telemetry.BytesProcessedTotal, "copy") == want.toDouble,
        "stream exhaustion is the COPY acknowledgement boundary")
    } finally server.stop()
  }
}
