package graft.pipeline

import graft.sources.PgOutput

/** Source-side payload byte accounting — the reference's measurement
  * contract (crates/etl/src/source_payload_metadata.rs:1-150 and
  * egress.rs:1-20, billing-grade semantics):
  *
  *  - Initial-copy metadata measures the BODY of each backend COPY
  *    text row: the row including delimiters and escaping plus its
  *    terminating newline. PostgreSQL message framing, TCP/TLS
  *    overhead, engine metadata, and destination encoding are excluded.
  *  - Streaming metadata measures the text/binary VALUE bytes inside
  *    pgoutput tuples (an update counts its new tuple plus its old
  *    identity tuple); NULL and unchanged-TOAST cells carry no value
  *    data. Framing bytes are excluded.
  *  - Operation PRESENCE is tracked apart from the byte count: a
  *    zero-byte row event is an observation (`Some(0)`), never an
  *    absence (`None`) — its metric series exists at 0 and its
  *    row-size histogram still counts the row.
  *  - `recordReceived`/`recordRowSize` fire at ingestion;
  *    `recordProcessed` fires only after the downstream acknowledges
  *    the payload (streaming: the flushed-LSN status update; copy: the
  *    consuming write exhausted the stream), and additionally emits the
  *    reference's billing trace line (`etl_processed_bytes`) when a
  *    trace log is installed and the count is non-zero.
  */
object SourcePayload {
  val BytesReceivedTotal = "etl_bytes_received_total"
  val RowSizeBytes = "etl_row_size_bytes"
  val EventTypeLabel = "event_type"

  /** Byte-scale histogram buckets (the default seconds-scale buckets
    * would collapse every row into +Inf). */
  private val ByteBuckets: Seq[Double] =
    Seq(64, 256, 1024, 4096, 16384, 65536, 262144, 1048576, 8388608)

  private def received = Telemetry.counter(BytesReceivedTotal,
    "Source payload bytes received, by event type")
  private def processed = Telemetry.counter(Telemetry.BytesProcessedTotal,
    "Source payload bytes acknowledged by the destination, by event type")
  private def rowSize = Telemetry.histogram(RowSizeBytes,
    "Per-row source payload size in bytes", ByteBuckets)

  private def lbl(eventType: String) = Seq(EventTypeLabel -> eventType)

  /** Metadata for COPY row-body bytes (TableCopyPayloadMetadata). */
  final case class CopyMeta(copyBytes: Long) {
    def recordReceived(): Unit = received.increment(copyBytes, lbl("copy"))
    /** Only before merging — when this still represents ONE row. */
    def recordRowSize(): Unit = rowSize.observe(copyBytes, lbl("copy"))
    def recordProcessed(destinationType: String): Unit = {
      processed.increment(copyBytes, lbl("copy"))
      logProcessedBytes(destinationType, "table_copy", copyBytes)
    }
    def merge(o: CopyMeta): CopyMeta = CopyMeta(copyBytes + o.copyBytes)
  }

  /** Metadata for logical-replication tuple-value bytes. `None` = the
    * operation is absent; `Some(0)` = present with zero value bytes. */
  final case class StreamingMeta(
      insertBytes: Option[Long] = None,
      updateBytes: Option[Long] = None,
      deleteBytes: Option[Long] = None) {
    private def byEventType: Seq[(String, Long)] =
      Seq("insert" -> insertBytes, "update" -> updateBytes,
        "delete" -> deleteBytes)
        .collect { case (t, Some(b)) => t -> b }
    def totalBytes: Long = byEventType.map(_._2).sum
    def recordReceived(): Unit =
      byEventType.foreach { case (t, b) => received.increment(b, lbl(t)) }
    /** Only before merging — when this still represents ONE event. */
    def recordRowSize(): Unit =
      byEventType.foreach { case (t, b) => rowSize.observe(b, lbl(t)) }
    def recordProcessed(destinationType: String): Unit = {
      byEventType.foreach { case (t, b) => processed.increment(b, lbl(t)) }
      logProcessedBytes(destinationType, "streaming", totalBytes)
    }
    def merge(o: StreamingMeta): StreamingMeta = {
      def m(a: Option[Long], b: Option[Long]) = (a, b) match {
        case (Some(x), Some(y)) => Some(x + y)
        case (x, y) => x.orElse(y)
      }
      StreamingMeta(m(insertBytes, o.insertBytes),
        m(updateBytes, o.updateBytes), m(deleteBytes, o.deleteBytes))
    }
  }
  object StreamingMeta {
    val empty: StreamingMeta = StreamingMeta()
    def insert(b: Long): StreamingMeta = StreamingMeta(insertBytes = Some(b))
    def update(b: Long): StreamingMeta = StreamingMeta(updateBytes = Some(b))
    def delete(b: Long): StreamingMeta = StreamingMeta(deleteBytes = Some(b))
  }

  /** VALUE bytes of one pgoutput tuple: text cells as UTF-8 octets,
    * binary cells verbatim; NULL / unchanged-TOAST contribute nothing
    * (the reference's tuple-value measurement boundary). */
  def tupleValueBytes(t: PgOutput.TupleData): Long =
    t.iterator.map {
      case PgOutput.TText(v) =>
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
      case PgOutput.TBinary(b) => b.length.toLong
      case _ => 0L
    }.sum

  /** Measurement of one decoded data message (None = not a row event). */
  def of(msg: PgOutput.Message): Option[StreamingMeta] = msg match {
    case PgOutput.Insert(_, t) =>
      Some(StreamingMeta.insert(tupleValueBytes(t)))
    case PgOutput.Update(_, _, old, t) =>
      Some(StreamingMeta.update(tupleValueBytes(t) +
        old.map(tupleValueBytes).getOrElse(0L)))
    case PgOutput.Delete(_, _, t) =>
      Some(StreamingMeta.delete(tupleValueBytes(t)))
    case _ => None
  }

  // ------------------------------------------------------- billing trace
  /** Optional billing trace target (the reference's `egress` feature:
    * tracing lines a billing pipeline scrapes). */
  @volatile private var egressTrace: Option[Telemetry.TraceLog] = None
  def installEgressTrace(t: Telemetry.TraceLog): Unit = egressTrace = Some(t)
  private[graft] def resetEgressForTest(): Unit = egressTrace = None

  /** egress.rs:log_processed_bytes — acknowledged source payload bytes;
    * zero-byte acknowledgements are not billed (but their counters above
    * still record presence). */
  def logProcessedBytes(destinationType: String, processingType: String,
      bytesSent: Long): Unit =
    if (bytesSent > 0) egressTrace.foreach(_.event("INFO", "etl.egress",
      "etl_processed_bytes", Map(
        "egress_metric" -> "true",
        "destination_type" -> destinationType,
        "processing_type" -> processingType,
        "bytes_sent" -> bytesSent.toString)))
}
