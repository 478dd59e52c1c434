package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.collection.concurrent.TrieMap

/** Telemetry export — the analog of the reference's `etl-telemetry`
  * crate (crates/etl-telemetry/src/metrics.rs: a process-global metrics
  * recorder rendered in Prometheus exposition format;
  * crates/etl-telemetry/src/tracing.rs: structured JSON log lines to a
  * rolling file, every line enriched with `project` + `pipeline_id`).
  * Zero-egress: metrics render on demand to a string/file (the
  * `PrometheusHandle::render` shape — callers mount it wherever they
  * serve `/metrics`), traces append as JSON lines.
  *
  * Metric names follow the reference's catalog
  * (crates/etl/src/observability.rs: `etl_events_processed_total`,
  * `etl_transaction_duration_seconds`, ...) so dashboards written for
  * the reference read unchanged against this engine.
  */
object Telemetry {

  // ------------------------------------------------------------- metrics
  /** One metric family: name, type, help, and labeled series. Counters
    * and gauges hold a double per label set; histograms hold cumulative
    * bucket counts + sum + count (the Prometheus histogram contract). */
  sealed trait Metric {
    def name: String
    def help: String
    def render(sb: StringBuilder): Unit
    protected def fmt(d: Double): String =
      if (d == d.toLong.toDouble) d.toLong.toString
      else String.format(java.util.Locale.ROOT, "%s", Double.box(d))
    protected def labelStr(labels: Seq[(String, String)]): String =
      if (labels.isEmpty) ""
      else labels.map { case (k, v) =>
        s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
      }.mkString("{", ",", "}")
  }

  final class Counter(val name: String, val help: String) extends Metric {
    private val series = TrieMap.empty[Seq[(String, String)], java.util.concurrent.atomic.DoubleAdder]
    def increment(by: Double = 1.0, labels: Seq[(String, String)] = Nil): Unit =
      series.getOrElseUpdate(labels.sortBy(_._1),
        new java.util.concurrent.atomic.DoubleAdder).add(by)
    def value(labels: Seq[(String, String)] = Nil): Double =
      series.get(labels.sortBy(_._1)).map(_.sum()).getOrElse(0.0)
    def render(sb: StringBuilder): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name counter\n")
      series.toSeq.sortBy(_._1.toString).foreach { case (ls, v) =>
        sb.append(s"$name${labelStr(ls)} ${fmt(v.sum())}\n") }
    }
  }

  final class Gauge(val name: String, val help: String) extends Metric {
    private val series = TrieMap.empty[Seq[(String, String)], java.util.concurrent.atomic.AtomicLong]
    def set(v: Double, labels: Seq[(String, String)] = Nil): Unit =
      series.getOrElseUpdate(labels.sortBy(_._1),
        new java.util.concurrent.atomic.AtomicLong)
        .set(java.lang.Double.doubleToRawLongBits(v))
    def value(labels: Seq[(String, String)] = Nil): Double =
      series.get(labels.sortBy(_._1))
        .map(a => java.lang.Double.longBitsToDouble(a.get())).getOrElse(0.0)
    def render(sb: StringBuilder): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name gauge\n")
      series.toSeq.sortBy(_._1.toString).foreach { case (ls, v) =>
        sb.append(s"$name${labelStr(ls)} ${fmt(
          java.lang.Double.longBitsToDouble(v.get()))}\n") }
    }
  }

  /** Prometheus histogram: cumulative `_bucket{le=...}` series plus
    * `_sum`/`_count`. Default buckets match the metrics-exporter
    * defaults the reference installs (exponential seconds). */
  final class Histogram(val name: String, val help: String,
      val buckets: Seq[Double] = Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25,
        0.5, 1.0, 2.5, 5.0, 10.0)) extends Metric {
    private final class Series {
      val counts = Array.fill(buckets.length + 1)(
        new java.util.concurrent.atomic.LongAdder)
      val sum = new java.util.concurrent.atomic.DoubleAdder
      val n = new java.util.concurrent.atomic.LongAdder
    }
    private val series = TrieMap.empty[Seq[(String, String)], Series]
    def observe(v: Double, labels: Seq[(String, String)] = Nil): Unit = {
      val s = series.getOrElseUpdate(labels.sortBy(_._1), new Series)
      val i = buckets.indexWhere(v <= _)
      s.counts(if (i < 0) buckets.length else i).increment()
      s.sum.add(v); s.n.increment()
    }
    def count(labels: Seq[(String, String)] = Nil): Long =
      series.get(labels.sortBy(_._1)).map(_.n.sum()).getOrElse(0L)
    def sum(labels: Seq[(String, String)] = Nil): Double =
      series.get(labels.sortBy(_._1)).map(_.sum.sum()).getOrElse(0.0)
    def render(sb: StringBuilder): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name histogram\n")
      series.toSeq.sortBy(_._1.toString).foreach { case (ls, s) =>
        var cum = 0L
        buckets.indices.foreach { i =>
          cum += s.counts(i).sum()
          val le = ("le" -> fmt(buckets(i)))
          sb.append(s"${name}_bucket${labelStr(ls :+ le)} $cum\n")
        }
        cum += s.counts(buckets.length).sum()
        sb.append(s"${name}_bucket${labelStr(ls :+ ("le" -> "+Inf"))} $cum\n")
        sb.append(s"${name}_sum${labelStr(ls)} ${fmt(s.sum.sum())}\n")
        sb.append(s"${name}_count${labelStr(ls)} ${s.n.sum()}\n")
      }
    }
  }

  /** Process-global registry (the reference's global recorder shape —
    * metrics.rs installs one global Prometheus recorder per process). */
  private val registry = TrieMap.empty[String, Metric]
  private def reg[M <: Metric](m: M): M =
    registry.getOrElseUpdate(m.name, m).asInstanceOf[M]

  def counter(name: String, help: String = ""): Counter =
    reg(new Counter(name, help))
  def gauge(name: String, help: String = ""): Gauge =
    reg(new Gauge(name, help))
  def histogram(name: String, help: String = "",
      buckets: Seq[Double] = Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5,
        1.0, 2.5, 5.0, 10.0)): Histogram =
    reg(new Histogram(name, help, buckets))

  /** Render every registered family in Prometheus text exposition
    * format 0.0.4 — the `PrometheusHandle::render` analog. */
  def renderPrometheus(): String = {
    val sb = new StringBuilder
    registry.toSeq.sortBy(_._1).foreach(_._2.render(sb))
    sb.toString
  }

  /** Render to a file (atomic rename) — for scrapers that read a
    * textfile-collector path instead of an HTTP endpoint. The staging
    * temp name is UNIQUE per call: a periodic ticker racing the final
    * shutdown write through one shared temp path could move/delete the
    * other's file mid-flight and throw at exit. */
  def writePrometheus(path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(
      s"$path.tmp.${Thread.currentThread().getId}")
    Files.write(tmp, renderPrometheus().getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Minimal live `/metrics` HTTP endpoint — the reference serves
    * Prometheus exposition continuously over HTTP
    * (crates/etl-telemetry/src/metrics.rs:82-103,
    * `PrometheusBuilder::with_http_listener` on port 9000); an operator
    * with plain Prometheus cannot scrape a textfile path. Off by
    * default (callers only start it when a port is configured);
    * `refresh` runs before each render so poll-style gauges (spool
    * volume) are current. Port 0 binds an ephemeral port (tests);
    * returns the server — `stop(0)` on shutdown. */
  def serveHttp(port: Int, refresh: () => Unit = () => ())
      : com.sun.net.httpserver.HttpServer = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    srv.createContext("/metrics",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        try {
          try refresh() catch { case scala.util.control.NonFatal(_) => () }
          val body = renderPrometheus().getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type",
            "text/plain; version=0.0.4; charset=utf-8")
          ex.sendResponseHeaders(200, body.length.toLong)
          val os = ex.getResponseBody
          try os.write(body) finally os.close()
        } finally ex.close())
    srv.setExecutor(null)
    srv.start()
    srv
  }

  /** TEST-ONLY: drop every registered family. */
  private[graft] def resetForTest(): Unit = registry.clear()

  // ---------------------------------- reference metric catalog (subset)
  // observability.rs names, restricted to what this engine measures —
  // keeping the names identical means reference dashboards read as-is.
  val EventsProcessedTotal = "etl_events_processed_total"
  val EventsReceivedTotal = "etl_events_received_total"
  val TablesTotal = "etl_tables_total"
  val TableCopyRowsTotal = "etl_table_copy_rows_total"
  val TransactionDurationSeconds = "etl_transaction_duration_seconds"
  val TransactionsTotal = "etl_transactions_total"
  val BytesProcessedTotal = "etl_bytes_processed_total"
  val MemoryBackpressureActive = "etl_memory_backpressure_active"
  val SlotInvalidationsTotal = "etl_slot_invalidations_total"
  val WorkerErrorsTotal = "etl_worker_errors_total"
  // two-phase (pgoutput v3) visibility — beyond the reference's catalog:
  // an undecided PREPARE pins publisher WAL retention via the flush cap
  val PreparedTransactions = "etl_prepared_transactions"
  val OldestPrepareAgeSeconds = "etl_oldest_prepare_age_seconds"
  val FlushCapLagBytes = "etl_flush_cap_lag_bytes"
  val FlushCapStallsTotal = "etl_flush_cap_stalls_total"
  // streamed/prepared-transaction spool volume (disk analog of ST7's
  // memory backpressure signal — a wedged StreamCommit grows it)
  val SpoolBytes = "etl_spool_bytes"
  val SpoolFiles = "etl_spool_files"

  // ------------------------------------------------------------- tracing
  /** Structured JSON tracing to an append-only file — the
    * tracing.rs analog: one JSON object per line, every line enriched
    * with `project` and `pipeline_id` (PROJECT_KEY_IN_LOG /
    * PIPELINE_KEY_IN_LOG), `timestamp` in millis, `level`, `target`,
    * `message`, plus free-form fields. `span` brackets a unit of work
    * and records its `elapsed_ms` on exit (enter lines are elided —
    * the reference's JSON formatter also emits closed spans only). */
  final class TraceLog(path: String, project: String, pipelineId: Long) {
    private val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    private val lock = new Object

    private def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    def event(level: String, target: String, message: String,
        fields: Map[String, String] = Map.empty): Unit = {
      val extra = fields.toSeq.sortBy(_._1).map { case (k, v) =>
        s""","${esc(k)}":"${esc(v)}"""" }.mkString
      val line =
        s"""{"timestamp":${System.currentTimeMillis()},""" +
          s""""level":"${esc(level)}","target":"${esc(target)}",""" +
          s""""project":"${esc(project)}","pipeline_id":$pipelineId,""" +
          s""""message":"${esc(message)}"$extra}""" + "\n"
      lock.synchronized {
        Files.write(p, line.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }

    def info(target: String, message: String,
        fields: Map[String, String] = Map.empty): Unit =
      event("INFO", target, message, fields)
    def warn(target: String, message: String,
        fields: Map[String, String] = Map.empty): Unit =
      event("WARN", target, message, fields)
    def error(target: String, message: String,
        fields: Map[String, String] = Map.empty): Unit =
      event("ERROR", target, message, fields)

    /** Bracket `body` as a span: on exit one line with `span` name,
      * `elapsed_ms`, and `outcome` (ok | error); errors rethrow. */
    def span[T](target: String, name: String,
        fields: Map[String, String] = Map.empty)(body: => T): T = {
      val t0 = System.nanoTime()
      try {
        val r = body
        event("INFO", target, s"$name done", fields +
          ("span" -> name) +
          ("elapsed_ms" -> ((System.nanoTime() - t0) / 1000000L).toString) +
          ("outcome" -> "ok"))
        r
      } catch {
        case e: Throwable =>
          event("ERROR", target, s"$name failed: ${e.getMessage}", fields +
            ("span" -> name) +
            ("elapsed_ms" -> ((System.nanoTime() - t0) / 1000000L).toString) +
            ("outcome" -> "error"))
          throw e
      }
    }
  }
}
