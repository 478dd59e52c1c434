package graft.pipeline

/** Per-table replication state machine — a faithful model of the
  * reference's table lifecycle (reference
  * crates/etl/src/replication/state/lifecycle.rs:22-95,196-213):
  *
  *   Init → DataSync → FinishedCopy → SyncWait(lsn) → Catchup(lsn)
  *        → SyncDone(lsn) → Ready
  *
  * plus Errored{retryPolicy} and Skipped. The apply worker pauses at commit
  * boundaries for SyncWait tables, the sync worker streams its own slot to
  * the catchup LSN, then hands over (ST4; apply.rs:2836-3047). In our
  * engine the states gate which events a table receives
  * (ApplyOps.snapshotGate) and whether backfill jobs run.
  */
sealed trait TableState { def name: String }
object TableState {
  case object Init extends TableState { val name = "init" }
  case object DataSync extends TableState { val name = "data_sync" }
  case object FinishedCopy extends TableState { val name = "finished_copy" }
  final case class SyncWait(lsn: Long) extends TableState { val name = "sync_wait" }
  final case class Catchup(lsn: Long) extends TableState { val name = "catchup" }
  final case class SyncDone(lsn: Long) extends TableState { val name = "sync_done" }
  case object Ready extends TableState { val name = "ready" }
  final case class Errored(reason: String, policy: RetryPolicy)
      extends TableState { val name = "errored" }
  case object Skipped extends TableState { val name = "skipped" }

  /** Legal transitions (lifecycle.rs validates these; restarts may also
    * roll DataSync/FinishedCopy back to Init — re-copy on crash,
    * table_sync/mod.rs:168-180). */
  def canTransition(from: TableState, to: TableState): Boolean = (from, to) match {
    case (_, Errored(_, _)) | (_, Skipped)              => true
    case (Errored(_, _), Init)                          => true // retry restarts copy
    case (Init, DataSync)                               => true
    case (DataSync, FinishedCopy)                       => true
    case (DataSync, Init) | (FinishedCopy, Init)        => true // crash rollback
    case (FinishedCopy, SyncWait(_))                    => true
    case (SyncWait(_), Catchup(_))                      => true
    case (Catchup(_), SyncDone(_))                      => true
    case (SyncDone(_), Ready)                           => true
    case _                                              => false
  }
}

/** Retry policies (reference crates/etl/src/replication/state/retry_policy.rs;
  * defaults from etl-config/shared/pipeline.rs:272-281: 10 s delay, 5
  * attempts). */
sealed trait RetryPolicy
object RetryPolicy {
  case object NoRetry extends RetryPolicy
  case object ManualRetry extends RetryPolicy
  final case class TimedRetry(delayMs: Long = 10000L, maxAttempts: Int = 5)
      extends RetryPolicy
}

/** Driver-side table-state store: the StateStore analog
  * (reference store/state/base.rs:25-120) with monotonic replication
  * progress (upsert_replication_progress never moves the flush LSN
  * backward, base.rs:82-95). Thread-safe; persisted as a JSON file per
  * pipeline so restarts resume (K1/K4).
  */
final class TableStateStore(persistPath: Option[String] = None) {
  import scala.collection.concurrent.TrieMap
  private val states = TrieMap.empty[Long, TableState]
  private val attempts = TrieMap.empty[Long, Int]
  @volatile private var flushLsn: Long = 0L

  // restart recovery: reload the persisted states so a new process
  // resumes where the old one stopped (K1/K4 — without this, every
  // table would restart at Init and the apply gates would silently drop
  // all events while the Spark checkpoint kept advancing)
  persistPath.foreach { p =>
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path)) {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(path), "UTF-8"))
      flushLsn = (j \ "flushLsn").extractOrElse[Long](0L)
      (j \ "tables").extract[List[JValue]].foreach { t =>
        val id = (t \ "table").extract[Long]
        def lsn = (t \ "lsn").extract[Long]
        val st = (t \ "state").extract[String] match {
          case "init"          => TableState.Init
          // crash rollback: an interrupted copy restarts from scratch
          // (reference table_sync/mod.rs:168-180)
          case "data_sync"     => TableState.Init
          case "finished_copy" => TableState.Init
          // pre-handoff states also roll back: the handoff is lost with
          // the process, and no post-restart path advances them
          case "sync_wait"     => TableState.Init
          case "catchup"       => TableState.Init
          case "sync_done"     => TableState.SyncDone(lsn)
          case "ready"         => TableState.Ready
          case "skipped"       => TableState.Skipped
          case "errored" => TableState.Errored(
            (t \ "reason").extractOrElse[String]("persisted"),
            RetryPolicy.ManualRetry) // retry budget does not survive restart
          case other => throw new IllegalStateException(s"bad state $other")
        }
        states.update(id, st)
      }
    }
  }

  def get(tableId: Long): TableState = states.getOrElse(tableId, TableState.Init)

  /** Atomic check-and-set: two concurrent backfills of the same table
    * (e.g. a timer-driven retry racing an in-flight copy) must not both
    * win the Init→DataSync transition — copies are mutually exclusive. */
  def transition(tableId: Long, to: TableState): Boolean = synchronized {
    val from = get(tableId)
    if (TableState.canTransition(from, to)) {
      states.update(tableId, to); persist(); true
    } else false
  }

  def force(tableId: Long, s: TableState): Unit = synchronized {
    states.update(tableId, s); persist()
  }

  /** Tables the apply stream may deliver to, with their snapshot gates:
    * Ready → ungated; SyncDone(lsn) → gated at lsn (apply.rs:2626-2639). */
  def applyGates: (Set[Long], Map[Long, Long]) = {
    val snapshot = states.readOnlySnapshot().toMap
    val ready = snapshot.collect { case (id, TableState.Ready) => id }.toSet
    val gated = snapshot.collect {
      case (id, TableState.SyncDone(lsn)) => id -> lsn }.toMap
    (ready ++ gated.keySet, gated)
  }

  /** Monotonic progress (A4): returns the stored LSN after the upsert. */
  def upsertFlushLsn(lsn: Long): Long = synchronized {
    if (lsn > flushLsn) { flushLsn = lsn; persist() }
    flushLsn
  }
  def lastFlushLsn: Long = flushLsn

  /** Error bookkeeping with retry budget (ST8). Returns true if a retry
    * should be scheduled. */
  def recordError(tableId: Long, reason: String, policy: RetryPolicy): Boolean = {
    states.update(tableId, TableState.Errored(reason, policy))
    persist()
    policy match {
      case RetryPolicy.TimedRetry(_, maxA) =>
        val n = attempts.updateWith(tableId) {
          c => Some(c.getOrElse(0) + 1) }.get
        n <= maxA
      case _ => false
    }
  }
  def clearAttempts(tableId: Long): Unit = attempts.remove(tableId)

  /** Whether an automatic retry is permitted: TimedRetry within its
    * attempt budget only — ManualRetry/NoRetry tables need an operator
    * (force the retry via backfill after transitioning to Init). */
  def canAutoRetry(tableId: Long): Boolean = get(tableId) match {
    case TableState.Errored(_, RetryPolicy.TimedRetry(_, maxA)) =>
      attempts.getOrElse(tableId, 0) <= maxA
    case _ => false
  }

  /** Remove all state for a table no longer in the publication (S6 purge,
    * reference pipeline.rs:354-421). */
  def purge(tableId: Long): Unit = {
    states.remove(tableId); attempts.remove(tableId); persist()
  }

  def all: Map[Long, TableState] = states.readOnlySnapshot().toMap

  // ------------------------------------------------------------ persistence
  private def persist(): Unit = synchronized { persistPath.foreach { p =>
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tables = states.readOnlySnapshot().toSeq.sortBy(_._1).map {
      case (id, s) =>
        val extra = s match {
          case TableState.SyncWait(l) => s""","lsn":$l"""
          case TableState.Catchup(l)  => s""","lsn":$l"""
          case TableState.SyncDone(l) => s""","lsn":$l"""
          case TableState.Errored(r, _) =>
            val safe = r.map(c =>
              if (c == '\\' || c == '"' || c < ' ') ' ' else c)
            s""","reason":"$safe""""
          case _ => ""
        }
        s"""{"table":$id,"state":"${s.name}"$extra}"""
    }.mkString("[", ",", "]")
    val body = s"""{"flushLsn":$flushLsn,"tables":$tables}"""
    val tmp = Paths.get(p + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes)
    Files.move(tmp, Paths.get(p), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  } }
}
