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
  * survives. */
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
  *    expires_at < now` (the database serializes racing updates on the
  *    row lock; exactly one wins);
  *  - first-time claim is an INSERT whose duplicate-key failure IS the
  *    lost race;
  *  - release is `DELETE … WHERE owner = me` — a rival's row never
  *    matches, so it is never destroyed.
  */
final class JdbcLeaseStore(url: String, leaseName: String,
    table: String = "graft_lease") extends MaintenanceLeaseStore {
  import java.sql.{Connection, DriverManager}

  // Derby writes derby.log into user.dir unless told otherwise (same
  // guard as JdbcSink)
  if (System.getProperty("derby.stream.error.file") == null)
    System.setProperty("derby.stream.error.file", "/dev/null")

  /** ensureTable is idempotent but chatty (a CREATE + catch per call);
    * once it has succeeded on this store instance, skip it. */
  @volatile private var tableEnsured = false

  private def withConn[T](f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try {
      if (!tableEnsured) { ensureTable(conn); tableEnsured = true }
      f(conn)
    } finally conn.close()
  }

  /** Duplicate-key SQLStates: standard 23505 plus the 23000 class some
    * engines report. */
  private def isDuplicateKey(e: java.sql.SQLException): Boolean =
    Option(e.getSQLState).exists(s => s == "23505" || s.startsWith("23"))

  private def ensureTable(conn: Connection): Unit =
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  name VARCHAR(512) PRIMARY KEY,
           |  lease_owner VARCHAR(256) NOT NULL,
           |  expires_at BIGINT NOT NULL)""".stripMargin)
      finally st.close()
    } catch {
      // X0Y32 = Derby "already exists"; 42S01 = SQL-standard variant
      case e: java.sql.SQLException
        if Option(e.getSQLState).exists(s =>
          s == "X0Y32" || s == "42S01" || s.startsWith("42")) => ()
    }

  def tryAcquire(owner: String, ttlMs: Long): Boolean = withConn { conn =>
    val now = System.currentTimeMillis()
    // one-statement CAS: renew-if-mine OR break-if-expired
    val upd = conn.prepareStatement(
      s"UPDATE $table SET lease_owner = ?, expires_at = ? " +
        "WHERE name = ? AND (lease_owner = ? OR expires_at < ?)")
    val updated =
      try {
        upd.setString(1, owner); upd.setLong(2, now + ttlMs)
        upd.setString(3, leaseName); upd.setString(4, owner)
        upd.setLong(5, now)
        upd.executeUpdate()
      } finally upd.close()
    if (updated == 1) return true
    // no row matched: either a rival holds a live lease (lose), or the
    // row does not exist yet (claim by INSERT; duplicate key = lost race)
    val ins = conn.prepareStatement(
      s"INSERT INTO $table (name, lease_owner, expires_at) VALUES (?, ?, ?)")
    try {
      ins.setString(1, leaseName); ins.setString(2, owner)
      ins.setLong(3, now + ttlMs)
      ins.executeUpdate() == 1
    } catch {
      case e: java.sql.SQLException if isDuplicateKey(e) => false
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
    val sel = conn.prepareStatement(
      s"SELECT lease_owner, expires_at FROM $table WHERE name = ?")
    try {
      sel.setString(1, leaseName)
      val rs = sel.executeQuery()
      try {
        if (rs.next()) {
          val h = (rs.getString(1), rs.getLong(2))
          if (h._2 >= System.currentTimeMillis()) Some(h) else None
        } else None
      } finally rs.close()
    } finally sel.close()
  }
}
