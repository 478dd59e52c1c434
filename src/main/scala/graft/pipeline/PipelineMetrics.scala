package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming metrics reporter — the analog of the reference benchmark
  * harness's per-run JSON reports (etl-benchmarks: producer/end_to_end
  * events_per_second, sample summaries). Attaches a
  * StreamingQueryListener, accumulates per-batch rows/durations for the
  * pipeline's query, and writes one JSON report on demand:
  *
  *   {"query":"...","batches":N,"rows":N,"wallMs":N,
  *    "eventsPerSecond":X,"maxBatchMs":N,"lastProgress":{...}}
  */
final class PipelineMetrics(spark: SparkSession,
    queryName: String = "graft-cdc-apply") {

  @volatile private var batches = 0L
  @volatile private var rows = 0L
  @volatile private var totalMs = 0L
  @volatile private var maxMs = 0L
  @volatile private var firstNs = -1L
  @volatile private var lastNs = -1L

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name == queryName && p.numInputRows > 0) {
        synchronized {
          if (firstNs < 0) firstNs = System.nanoTime()
          lastNs = System.nanoTime()
          batches += 1
          rows += p.numInputRows
          val dur = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue()).getOrElse(0L)
          totalMs += dur
          if (dur > maxMs) maxMs = dur
        }
        // reference-named counters (observability.rs) so dashboards
        // written for the reference read unchanged
        Telemetry.counter(Telemetry.EventsReceivedTotal,
          "Events admitted into micro-batches")
          .increment(p.numInputRows.toDouble)
        Telemetry.counter(Telemetry.EventsProcessedTotal,
          "Events through the apply path")
          .increment(p.numInputRows.toDouble)
      }
    }
  }

  spark.streams.addListener(listener)

  def detach(): Unit = spark.streams.removeListener(listener)

  def snapshot: (Long, Long, Long, Long) = (batches, rows, totalMs, maxMs)

  /** Write the JSON report (atomic rename), mirroring the reference's
    * report-file shape. Passing the pipeline folds its per-table apply
    * timings and copy-progress accumulators into the report — the full
    * per-run picture the reference's benchmark JSON carries (stream
    * throughput + per-table copy rows). */
  def report(path: String, pipeline: Option[CdcPipeline] = None): Unit = {
    val wallMs =
      if (firstNs < 0) 0L else math.max(1L, (lastNs - firstNs) / 1000000L)
    val eps = if (wallMs == 0) 0.0 else rows * 1000.0 / wallMs
    val perTable = pipeline.map { pl =>
      val apply = pl.applyTimings.toSeq.sortBy(_._1).map {
        case (id, (ms, n)) =>
          s""""$id":{"applyMs":$ms,"batches":$n}"""
      }.mkString("{", ",", "}")
      val copied = pl.copyProgress.toSeq.sortBy(_._1).map {
        case (name, acc) => s""""$name":${acc.value}"""
      }.mkString("{", ",", "}")
      s""","applyByTable":$apply,"copiedRows":$copied"""
    }.getOrElse("")
    val body =
      s"""{"query":"$queryName","batches":$batches,"rows":$rows,""" +
        s""""wallMs":$wallMs,"processingMs":$totalMs,"maxBatchMs":$maxMs,""" +
        """"eventsPerSecond":""" + String.format(java.util.Locale.ROOT,
          "%.1f", Double.box(eps)) + perTable + "}"
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
