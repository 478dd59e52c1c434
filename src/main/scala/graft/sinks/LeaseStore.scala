package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Pluggable cross-process maintenance-lease store — the contract behind
  * [[GraftTable]]'s maintenance coordination. The reference coordinates
  * external maintenance through exchangeable stores (crates/
  * etl-maintenance/src/coordination/postgres.rs — a Postgres-table CAS —
  * and coordination/kubernetes.rs); this trait is the same seam:
  * [[FsLeaseStore]] (default) leases through an atomic file next to the
  * table on shared POSIX-ish storage, [[JdbcLeaseStore]] through a
  * single-row compare-and-set in any JDBC database, for deployments whose
  * table storage (object stores) has no atomic rename/link.
  *
  * Contract (all operations atomic with respect to rival processes):
  *  - at most one LIVE (unexpired) lease per store scope;
  *  - `tryAcquire` succeeds iff the lease is free, expired, or already
  *    held by `owner` (renewal — expiry moves forward);
  *  - a rival's live lease is NEVER destroyed, not by acquire, renew,
  *    or release (the TOCTOU family the round-10/11 reviews closed);
  *  - a crashed holder never wedges the table: the TTL lapses and the
  *    next acquirer breaks the stale lease.
  */
trait MaintenanceLeaseStore {
  /** Take or renew the lease for `owner`; false = a rival holds it. */
  def tryAcquire(owner: String, ttlMs: Long): Boolean
  /** Release `owner`'s lease; a no-op when not held by `owner`. */
  def release(owner: String): Unit
  /** (owner, expiresAtMs) of a LIVE lease; None = free or expired. */
  def holder: Option[(String, Long)]
}

/** Lease file in `root` published with the same atomic create-exclusive
  * (hard link) the manifest commit uses. Invariant: a LIVE lease is
  * never moved aside or blind-replaced by anyone but its own holder —
  * see [[tryAcquire]] for the per-state protocol. Expired leases break
  * via sweep-aside + verify-content-unchanged + restore-on-mismatch, so
  * even in the expiry domain a renewal/claim that landed concurrently
  * survives.
  *
  * CLOCK ASSUMPTION (by design): expiry compares the file's client-
  * written epoch millis against the reader's `System.currentTimeMillis`
  * — sound because a shared-POSIX deployment is ONE NTP domain by
  * construction (the processes mount the same filesystem). Multi-host
  * deployments whose clocks can skew belong on [[JdbcLeaseStore]],
  * where the DATABASE engine's clock decides liveness. */
final class FsLeaseStore(root: String) extends MaintenanceLeaseStore {
  private def leasePath = Paths.get(root, "_maintenance.lease")

  def holder: Option[(String, Long)] =
    parseLease(leasePath).filter(_._2 >= System.currentTimeMillis())

  /** (owner, expiresAtMs) as written, live or not; None = absent. */
  private def parseLease(p: Path): Option[(String, Long)] =
    try {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val i = s.indexOf('\t')
      if (i <= 0) None else Some(s.substring(0, i) -> s.trim
        .substring(i + 1).toLong)
    } catch {
      case _: java.io.IOException => None
      case _: NumberFormatException => None // torn/foreign file ≠ a lease
    }

  /** Restore a swept lease (we tombed a rival's fresh lease — put it
    * back untouched). If the link-back loses to yet another acquirer,
    * the displaced holder's next renewal/holder-check sees the loss;
    * the residual window is microseconds and reads stay safe via the
    * table's withManifestRetry + commit CAS. */
  private def restore(tomb: Path): Unit = {
    try Files.createLink(leasePath, tomb)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => ()
      case _: java.nio.file.FileSystemException =>
        if (!Files.exists(leasePath))
          Files.move(tomb, leasePath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    Files.deleteIfExists(tomb)
  }

  /** Claim a free path via create-exclusive hard link; a lost race
    * surfaces as FileAlreadyExists → false. */
  private def claimViaLink(owner: String, ttlMs: Long): Boolean = {
    val tmp = Paths.get(root,
      s".lease-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, s"$owner\t${System.currentTimeMillis() + ttlMs}"
      .getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(leasePath, tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: UnsupportedOperationException |
           _: java.nio.file.FileSystemException =>
        // no-hard-link filesystems: exists pre-check + move (the
        // manifest commit's documented weaker fallback)
        if (Files.exists(leasePath)) false
        else { Files.move(tmp, leasePath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
    } finally Files.deleteIfExists(tmp)
  }

  /** A LIVE lease is never moved aside, not even to verify it — a
    * sweep-verify-restore on a live lease opens a window where the
    * path looks free and a third acquirer claims it while the
    * verifier still intends to restore (two holders). The protocol
    * therefore splits by what a fresh READ shows:
    *  - live rival → lose, touch nothing;
    *  - live MINE → renew via atomic in-place replace (the lease stays
    *    continuously visible; no correct rival ever claims over a live
    *    lease, so the replace clobbers nothing);
    *  - expired (any owner, mine included) → break via sweep, then
    *    verify the swept bytes are EXACTLY the expired lease we read —
    *    anything else means a renewal/claim landed in between: restore
    *    it and lose;
    *  - absent → claim via create-exclusive link.
    * Residual windows all require a lease ALREADY past its TTL plus a
    * microsecond-level race — i.e. exclusion was already forfeited by
    * the expired holder; among correctly-renewing processes (heartbeat
    * at ttl/3) live leases are never destroyed or shadowed. */
  def tryAcquire(owner: String, ttlMs: Long): Boolean = {
    Files.createDirectories(Paths.get(root))
    val now = System.currentTimeMillis()
    parseLease(leasePath) match {
      case Some((h, exp)) if exp >= now && h != owner => false
      case Some((h, exp)) if exp >= now =>
        // renew own live lease: atomic replace, never an in-place
        // truncate+write — a concurrent holder-check must read either
        // the old or the new lease, never a partial one
        val tmp = Paths.get(root,
          s".lease-${java.util.UUID.randomUUID()}.tmp")
        Files.write(tmp, s"$owner\t${now + ttlMs}"
          .getBytes(StandardCharsets.UTF_8))
        try {
          Files.move(tmp, leasePath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        } finally Files.deleteIfExists(tmp)
      case Some(expired) =>
        // break an EXPIRED lease (a lapsed own lease goes through the
        // same verified break — a blind replace could clobber the
        // rival that legitimately broke it, the round-11 advice item)
        val tomb = Paths.get(root,
          s".lease-tomb-${java.util.UUID.randomUUID()}.tmp")
        val swept =
          try { Files.move(leasePath, tomb,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
          catch { case _: java.nio.file.NoSuchFileException => false }
        if (swept) {
          if (!parseLease(tomb).contains(expired)) {
            // the content CHANGED between our read and the sweep — a
            // renewal or fresh claim landed; put it back and lose
            restore(tomb); return false
          }
          Files.deleteIfExists(tomb)
        }
        claimViaLink(owner, ttlMs)
      case None => claimViaLink(owner, ttlMs)
    }
  }

  def release(owner: String): Unit = {
    if (!holder.exists(_._1 == owner)) return
    val tomb = Paths.get(root,
      s".lease-tomb-${java.util.UUID.randomUUID()}.tmp")
    val swept =
      try { Files.move(leasePath, tomb,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
      catch { case _: java.nio.file.NoSuchFileException => false }
    if (!swept) return
    if (!parseLease(tomb).exists(_._1 == owner)) restore(tomb)
    else Files.deleteIfExists(tomb)
  }
}

/** Lease through a single row in a JDBC database — the analog of the
  * reference's Postgres coordination store (crates/etl-maintenance/src/
  * coordination/postgres.rs: cross-instance maintenance serialized
  * through a table the replicas CAS against). For deployments whose
  * table storage cannot host the file lease (object stores without
  * atomic rename), or that already coordinate through the SQL engine
  * the [[JdbcSink]] writes to.
  *
  * Atomicity comes from single-statement row CAS, not transactions:
  *  - acquire/renew/break is ONE `UPDATE … WHERE owner = me OR
  *    expires_at < CURRENT_TIMESTAMP` (the database serializes racing
  *    updates on the row lock; exactly one wins);
  *  - first-time claim is an INSERT whose duplicate-key failure IS the
  *    lost race;
  *  - release is `DELETE … WHERE owner = me` — a rival's row never
  *    matches, so it is never destroyed.
  *
  * Clock discipline: this store exists precisely for MULTI-HOST
  * deployments, so expiry is decided by the DATABASE ENGINE's clock —
  * `expires_at` is a TIMESTAMP compared against, and computed from,
  * the engine's `CURRENT_TIMESTAMP` inside the statement (the
  * reference's Postgres coordination likewise compares against the
  * database's `now()`, coordination/postgres.rs:118,305). A client
  * clock NEVER enters the liveness decision: with a client-side `now`,
  * a rival whose clock ran ahead by more than the holder's remaining
  * TTL would break a LIVE lease — two concurrent maintainers. (The
  * [[FsLeaseStore]] keeps the client clock: shared-POSIX deployments
  * are one NTP domain by construction.) The TTL is applied engine-side
  * through per-engine interval arithmetic chosen from the connection's
  * `DatabaseMetaData` (PostgreSQL `make_interval`, Derby chained
  * `{fn TIMESTAMPADD}`, whole-second fallback elsewhere — see
  * `Dialect`).
  *
  * One cached connection per store instance, re-opened on a connection
  * failure (heartbeats at ttl/3 per table across many tables made a
  * fresh DriverManager connection per call needless engine churn; the
  * reference holds a sqlx pool).
  */
final class JdbcLeaseStore(url: String, leaseName: String,
    table: String = "graft_lease") extends MaintenanceLeaseStore {
  import java.sql.{Connection, DriverManager, SQLException, Timestamp}

  // Derby writes derby.log into user.dir unless told otherwise (same
  // guard as JdbcSink)
  if (System.getProperty("derby.stream.error.file") == null)
    System.setProperty("derby.stream.error.file", "/dev/null")

  /** Set only after the lease table has been VERIFIED usable (created,
    * or already present, and probed with a SELECT) — a CREATE failing
    * for a non-already-exists reason (insufficient privilege 42501,
    * syntax/qualifier errors) must propagate, not silently disable all
    * maintenance coordination. */
  @volatile private var tableEnsured = false

  /** Connections opened over this store's lifetime (tests assert the
    * cache holds: a heartbeat hammer must not open one per call). */
  private[graft] val connectionsOpened =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private val connLock = new Object
  private var cached: Connection = null

  private def freshConn(): Connection = {
    val c = DriverManager.getConnection(url)
    connectionsOpened.incrementAndGet()
    if (dialect == null) dialect = Dialect.detect(c)
    if (!tableEnsured) { ensureTable(c); tableEnsured = true }
    c
  }

  /** SQLState class 08 = connection exception (also Derby 40XD0 "dead
    * connection", XJ040/XJ041 boot failures are NOT retried — a broken
    * URL should surface, not loop). */
  private def isConnectionFailure(e: SQLException): Boolean =
    Option(e.getSQLState).exists(s => s.startsWith("08") || s == "40XD0")

  /** Run `f` on the cached connection; one retry on a fresh connection
    * when the cached one died. Every statement here is an idempotent
    * CAS/point-read, so the single retry is safe (an acquire whose
    * INSERT landed before the failure renews itself via the retried
    * UPDATE's `owner = me` arm). */
  private def withConn[T](f: Connection => T): T = connLock.synchronized {
    if (cached == null) cached = freshConn()
    try f(cached)
    catch {
      case e: SQLException if isConnectionFailure(e) =>
        try cached.close() catch { case _: SQLException => () }
        cached = null
        cached = freshConn()
        f(cached)
    }
  }

  /** Close the cached connection (idempotent; the store stays usable —
    * the next call reconnects). */
  def close(): Unit = connLock.synchronized {
    if (cached != null) {
      try cached.close() catch { case _: SQLException => () }
      cached = null
    }
  }

  /** Duplicate-key SQLStates ONLY: standard 23505 plus the bare 23000
    * some engines report for it. The REST of the integrity class
    * (23502 NOT NULL, 23514 CHECK, …) must propagate — swallowing it
    * as "lost the INSERT race" turns a schema misconfiguration into
    * "lease never acquirable" with no error anywhere. */
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).exists(s => s == "23505" || s == "23000")

  /** Engine dialect for `CURRENT_TIMESTAMP + ttl` — the JDBC
    * `{fn TIMESTAMPADD}` escape is DRIVER-translated and drivers
    * disagree on (or lack) SQL_TSI_FRAC_SECOND: Derby reads its count
    * as nanoseconds, some drivers as milliseconds, and the PostgreSQL
    * JDBC driver — the engine this store's own scaladoc points
    * multi-host deployments at — does not implement the FRAC_SECOND
    * interval at all and errors every statement carrying it. So the
    * expiry arithmetic is chosen per engine from
    * `DatabaseMetaData.getDatabaseProductName`:
    *  - PostgreSQL: native `make_interval(secs => ?)` (fractional
    *    seconds as one double — the reference's own coordination
    *    engine, coordination/postgres.rs);
    *  - Apache Derby: the chained FRAC_SECOND(nanos)+SECOND escape
    *    (verified ms-precise by this repo's suite);
    *  - anything else: whole-second `SQL_TSI_SECOND` with the TTL
    *    CEILed — every driver implements SECOND, and rounding UP keeps
    *    the safety direction (a lease may live ≤1 s longer; it never
    *    expires early under a holder that believes it is live). */
  private sealed trait Dialect {
    def expiryExpr: String
    /** Bind the TTL at `at`; returns the number of params consumed. */
    def bindTtl(ps: java.sql.PreparedStatement, at: Int, ttlMs: Long): Int
  }
  private object Dialect {
    case object Postgres extends Dialect {
      val expiryExpr = "CURRENT_TIMESTAMP + make_interval(secs => ?)"
      def bindTtl(ps: java.sql.PreparedStatement, at: Int,
          ttlMs: Long): Int = {
        ps.setDouble(at, ttlMs / 1000.0); 1
      }
    }
    case object Derby extends Dialect {
      /** Binds (1) sub-second remainder in NANOseconds — Derby's
        * FRAC_SECOND unit; a single frac-second term would overflow
        * its INT count past 2.1 s — then (2) whole seconds. */
      val expiryExpr =
        "{fn TIMESTAMPADD(SQL_TSI_FRAC_SECOND, CAST(? AS INTEGER), " +
          "{fn TIMESTAMPADD(SQL_TSI_SECOND, CAST(? AS INTEGER), " +
          "CURRENT_TIMESTAMP)})}"
      def bindTtl(ps: java.sql.PreparedStatement, at: Int,
          ttlMs: Long): Int = {
        ps.setInt(at, ((ttlMs % 1000L) * 1000000L).toInt)
        ps.setInt(at + 1,
          math.min(ttlMs / 1000L, Int.MaxValue.toLong).toInt)
        2
      }
    }
    case object WholeSecond extends Dialect {
      val expiryExpr =
        "{fn TIMESTAMPADD(SQL_TSI_SECOND, CAST(? AS INTEGER), " +
          "CURRENT_TIMESTAMP)}"
      def bindTtl(ps: java.sql.PreparedStatement, at: Int,
          ttlMs: Long): Int = {
        val ceilSec = (ttlMs + 999L) / 1000L
        ps.setInt(at, math.min(ceilSec, Int.MaxValue.toLong).toInt); 1
      }
    }
    def detect(c: Connection): Dialect = {
      val name =
        try Option(c.getMetaData.getDatabaseProductName).getOrElse("")
        catch { case _: SQLException => "" }
      val n = name.toLowerCase
      if (n.contains("postgres")) Postgres
      else if (n.contains("derby")) Derby
      else WholeSecond
    }
  }

  /** Set from the first connection's metadata; immutable afterwards
    * (a store talks to ONE engine for its lifetime). */
  @volatile private var dialect: Dialect = null

  private def expiryExpr: String = dialect.expiryExpr
  private def bindTtl(ps: java.sql.PreparedStatement, at: Int,
      ttlMs: Long): Int = dialect.bindTtl(ps, at, ttlMs)

  private def ensureTable(conn: Connection): Unit = {
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  name VARCHAR(512) PRIMARY KEY,
           |  lease_owner VARCHAR(256) NOT NULL,
           |  expires_at TIMESTAMP NOT NULL)""".stripMargin)
      finally st.close()
    } catch {
      // ONLY the "already exists" states: X0Y32 (Derby), 42S01
      // (SQL-standard/MySQL), 42P07 (Postgres). Anything else (42501
      // insufficient privilege, 42000 syntax, a bad qualifier)
      // propagates — the probe below never runs and tableEnsured
      // stays false, so the misconfiguration surfaces on EVERY call
      // instead of silently disabling maintenance coordination.
      case e: SQLException
        if Option(e.getSQLState).exists(s =>
          s == "X0Y32" || s == "42S01" || s == "42P07") => ()
    }
    // verify the table is actually usable before trusting it
    val probe = conn.prepareStatement(
      s"SELECT name, lease_owner, expires_at FROM $table WHERE 1 = 0")
    try { probe.executeQuery().close() } finally probe.close()
  }

  def tryAcquire(owner: String, ttlMs: Long): Boolean = withConn { conn =>
    // one-statement CAS: renew-if-mine OR break-if-expired; liveness
    // and the new expiry BOTH come from the engine clock
    val upd = conn.prepareStatement(
      s"UPDATE $table SET lease_owner = ?, expires_at = $expiryExpr " +
        "WHERE name = ? AND (lease_owner = ? " +
        "OR expires_at < CURRENT_TIMESTAMP)")
    val updated =
      try {
        upd.setString(1, owner)
        val n = bindTtl(upd, 2, ttlMs)
        upd.setString(2 + n, leaseName); upd.setString(3 + n, owner)
        upd.executeUpdate()
      } finally upd.close()
    if (updated == 1) return true
    // no row matched: either a rival holds a live lease (lose), or the
    // row does not exist yet (claim by INSERT; duplicate key = lost race)
    val ins = conn.prepareStatement(
      s"INSERT INTO $table (name, lease_owner, expires_at) " +
        s"VALUES (?, ?, $expiryExpr)")
    try {
      ins.setString(1, leaseName); ins.setString(2, owner)
      bindTtl(ins, 3, ttlMs): Unit
      ins.executeUpdate() == 1
    } catch {
      case e: SQLException if isDuplicateKey(e) => false
    } finally ins.close()
  }

  def release(owner: String): Unit = withConn { conn =>
    val del = conn.prepareStatement(
      s"DELETE FROM $table WHERE name = ? AND lease_owner = ?")
    try { del.setString(1, leaseName); del.setString(2, owner)
      del.executeUpdate(); () }
    finally del.close()
  }

  def holder: Option[(String, Long)] = withConn { conn =>
    // liveness decided ENGINE-side; the returned expiresAtMs is the
    // engine expiry translated onto this client's clock (reporting
    // only — no liveness decision ever reads it)
    val sel = conn.prepareStatement(
      s"SELECT lease_owner, expires_at, CURRENT_TIMESTAMP FROM $table " +
        "WHERE name = ? AND expires_at >= CURRENT_TIMESTAMP")
    try {
      sel.setString(1, leaseName)
      val rs = sel.executeQuery()
      try {
        if (rs.next()) {
          val exp: Timestamp = rs.getTimestamp(2)
          val dbNow: Timestamp = rs.getTimestamp(3)
          Some((rs.getString(1),
            System.currentTimeMillis() + (exp.getTime - dbNow.getTime)))
        } else None
      } finally rs.close()
    } finally sel.close()
  }
}
