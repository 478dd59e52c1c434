package graft.sources

/** One preflight finding — the reference's `ValidationFailure` shape
  * (crates/etl-api/src/validation/mod.rs): `critical` blocks startup,
  * a warning is reported and tolerated. */
final case class PreflightFailure(critical: Boolean, name: String,
    detail: String) {
  def render: String =
    s"[${if (critical) "CRITICAL" else "warning"}] $name — $detail"
}

/** Source-connection descriptor for the embedded preflight façade
  * ([[graft.pipeline.CdcPipeline.preflight]]) — the handful of knobs a
  * library user already holds to start a pipeline, bundled so the
  * validator suite can build its own short-lived wire connection. */
final case class PgSourceConfig(
    host: String, port: Int, user: String, database: String,
    password: String = "", publication: String = "graft_pub",
    slot: Option[String] = None, protoVersion: Int = 1,
    binaryMode: Boolean = false, sslMode: String = "disable",
    sslRootCert: Option[String] = None)

/** Source preflight validation — the engine-side analog of the
  * reference control plane's validator suite
  * (`crates/etl-api/src/validation/validators/{pipeline,
  * replica_identity,primary_key}.rs`). The reference runs these from
  * its REST API before deploying a replicator; we run them from the
  * replicator itself on an opt-in flag (`preflight = true`), since the
  * control plane is out of scope (SURVEY §3.5) but the CHECKS guard
  * real failure modes: a missing publication streams nothing, a
  * non-logical `wal_level` refuses the slot, a table with no usable
  * replica identity silently breaks UPDATE/DELETE apply.
  *
  * Design: every check runs (aggregated report, never first-failure —
  * the reference collects all failures per validator) over ONE
  * non-replication wire connection using the simple-query metadata
  * surface ([[PgWireConnection.queryRows]]). Each check is a single
  * SELECT so the session stays trivially scriptable in tests.
  */
object Preflight {

  /** Literal-escape for identifiers interpolated into check SQL. */
  private def esc(s: String): String = s.replace("'", "''")

  private def bool(v: Option[String]): Boolean =
    v.exists(x => x == "t" || x == "true")

  // ------------------------------------------------------------- config
  /** Pure config-shape checks (no connection): the subset the reference
    * validates structurally (validators/pipeline.rs config arms) that
    * [[graft.Replicator]] does not already fail loud on. */
  def validateConfig(prop: String => Option[String])
      : Seq[PreflightFailure] = {
    val out = Seq.newBuilder[PreflightFailure]
    // slot names: PostgreSQL rejects anything but [a-z0-9_], ≤ 63
    // bytes (ReplicationSlotValidateName) — catching it here beats a
    // server error after the snapshot phase
    prop("source.slot").foreach { slot =>
      if (!slot.matches("[a-z0-9_]{1,63}"))
        out += PreflightFailure(critical = true, "Invalid Slot Name",
          s"replication slot name '$slot' must match [a-z0-9_]{1,63} " +
            "(PostgreSQL's ReplicationSlotValidateName rule)")
    }
    prop("source.publication").foreach { p =>
      if (p.isEmpty || p.length > 63)
        out += PreflightFailure(critical = true, "Invalid Publication Name",
          s"publication name '$p' must be 1-63 bytes")
    }
    def positive(key: String): Unit = prop(key).foreach { v =>
      val ok = try v.trim.toLong > 0 catch { case _: Exception => false }
      if (!ok)
        out += PreflightFailure(critical = true, "Invalid Pipeline Config",
          s"$key must be a positive integer, got '$v'")
    }
    positive("pipeline.maxRowsPerTrigger")
    positive("pipeline.maxFillMs")
    positive("pipeline.maxBytesPerTrigger")
    positive("pipeline.maxTableSyncWorkers")
    prop("source.protoVersion").foreach { v =>
      if (!Set("1", "2", "3", "4")(v.trim))
        out += PreflightFailure(critical = true, "Invalid Proto Version",
          s"source.protoVersion must be 1, 2, 3 or 4, got '$v'")
    }
    out.result()
  }

  // ------------------------------------------------------------- source
  /** Live checks over a connected NON-replication session. Mirrors the
    * reference validators' semantics and severities:
    *  - publication exists (pipeline.rs:27-68, critical)
    *  - `wal_level = logical` (pipeline.rs:564-576, critical)
    *  - replication-slot headroom: 1 apply + maxTableSyncWorkers sync
    *    slots must fit in `max_replication_slots` minus slots in use
    *    (pipeline.rs:596-615, critical)
    *  - wal-sender headroom, same requirement against
    *    `max_wal_senders` minus active senders (pipeline.rs:627-, critical)
    *  - `max_slot_wal_keep_size` ≥ 1 GiB or unlimited
    *    (pipeline.rs:15-19, warning)
    *  - `idle_replication_slot_timeout` disabled or > 300 s
    *    (pipeline.rs:17-24, warning)
    *  - replica identity per published table
    *    (replica_identity.rs): a table whose identity cannot key
    *    UPDATE/DELETE (relreplident 'n', or 'd' with no primary key,
    *    or 'i' with no replident index) is CRITICAL when the
    *    publication publishes those ops, a warning otherwise (the ops
    *    could be enabled later). Unlike the reference we do not walk
    *    partition parents for inherited PKs — pgoutput publishes leaf
    *    relations and leaves carry their own PK in supported layouts.
    */
  /** Shared audit plumbing: aggregated findings over one connection.
    * A per-check error (a malformed setting value, a catalog shape
    * this server lacks) becomes a WARNING so the rest of the pass
    * still runs — only wire-level IOExceptions abort (a dead
    * connection invalidates everything). */
  private final class Audit(conn: PgWireConnection) {
    val out: scala.collection.mutable.Builder[PreflightFailure,
      Seq[PreflightFailure]] = Seq.newBuilder[PreflightFailure]
    def rows(sql: String): Seq[IndexedSeq[Option[String]]] =
      conn.queryRows(sql)
    def scalar(sql: String): Option[String] =
      rows(sql).headOption.flatMap(_.headOption).flatten
    def checked(name: String)(body: => Unit): Unit =
      try body catch {
        case e: java.io.IOException => throw e
        case scala.util.control.NonFatal(e) =>
          out += PreflightFailure(critical = false, name,
            s"check could not run: $e")
      }
  }

  def validateSource(conn: PgWireConnection, publication: String,
      maxTableSyncWorkers: Int,
      /** Requested pgoutput protocol version (1/2/3) — v2 needs a
        * PG 14+ source, v3 a PG 15+ one; checked here so the operator
        * sees a named failure instead of START_REPLICATION's generic
        * "unrecognized pgoutput option". */
      protoVersion: Int = 1,
      /** Requested `binary 'true'` tuple mode — a PG 14+ option. */
      binaryMode: Boolean = false,
      /** Configured slot name, for the v3 two_phase slot-property
        * audit (None skips it). */
      slotName: Option[String] = None): Seq[PreflightFailure] = {
    val audit = new Audit(conn)
    import audit.{checked, out, rows, scalar}
    val pub = esc(publication)

    checked("Protocol Version Check") {
      val vnum = scalar("select current_setting('server_version_num')")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(0)
      if (vnum > 0 && vnum < 140000)
        out += PreflightFailure(critical = false,
          "DDL Capture Unavailable",
          s"source server is $vnum (< 14): the pgoutput `messages` " +
            "option does not exist there, so logical-message DDL " +
            "capture is disabled (v1 row streaming is unaffected)")
      // ONE true floor per requested protocol version (v2→14, v3→15,
      // v4→16), computed up front — a staircase of range checks told a
      // v4-on-PG-14 operator "requires 15+", they upgraded, and only
      // then learned v4 needs 16+ (round-14 verdict #1)
      val floor = protoVersion match {
        case v if v >= 4 => Some((160000, "16",
          "parallel streaming, extended Stream Abort"))
        case 3 => Some((150000, "15", "two-phase commit decoding"))
        case 2 => Some((140000, "14", "streamed in-progress transactions"))
        case _ => None
      }
      floor.foreach { case (minVnum, major, why) =>
        if (vnum > 0 && vnum < minVnum)
          out += PreflightFailure(critical = true,
            "Protocol Version Unsupported",
            s"source.protoVersion=$protoVersion requires PostgreSQL " +
              s"$major+ ($why); server is $vnum")
      }
      if (binaryMode && vnum > 0 && vnum < 140000)
        out += PreflightFailure(critical = true,
          "Binary Mode Unsupported",
          s"source.binary=true requires PostgreSQL 14+ (pgoutput " +
            s"`binary` option); server is $vnum")
      if (protoVersion >= 3) {
        val prep = scalar("select setting from pg_settings where name " +
          "= 'max_prepared_transactions'")
          .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        if (prep.contains(0L))
          out += PreflightFailure(critical = false,
            "Two-Phase Without Prepared Transactions",
            "source.protoVersion=3 requested but the source has " +
              "max_prepared_transactions = 0 — no prepared " +
              "transactions can exist there, so two_phase decoding " +
              "adds nothing (harmless, but likely a misconfiguration)")
      }
    }

    // an EXISTING slot created without two_phase cannot serve a v3
    // session — START_REPLICATION(two_phase 'true') refuses with a
    // generic error; name the fix here (recreate the slot, or let
    // source.createSlot=true make a fresh TWO_PHASE one)
    if (protoVersion >= 3) checked("Slot Two-Phase Check") {
      slotName.foreach { slot =>
        val s = esc(slot)
        rows("select two_phase from pg_replication_slots where " +
          s"slot_name = '$s'").headOption
          .flatMap(_.headOption.flatten).foreach { tp =>
            if (!bool(Some(tp)))
              out += PreflightFailure(critical = true,
                "Slot Without Two-Phase",
                s"replication slot '$slot' exists but was created " +
                  "without two_phase; source.protoVersion=3 cannot " +
                  "stream from it — drop and recreate the slot with " +
                  "two_phase (or set source.createSlot=true after " +
                  "dropping it)")
          }
      }
    }

    // publication exists
    checked("Publication Check") {
      val pubExists = bool(scalar(
        s"select exists(select 1 from pg_publication where pubname = '$pub')"))
      if (!pubExists)
        out += PreflightFailure(critical = true, "Publication Not Found",
          s"publication '$publication' does not exist in the source " +
            "database; create it with CREATE PUBLICATION " +
            s"$publication FOR TABLE <schema.table>, …")
    }

    // wal_level
    checked("wal_level Check") {
    scalar("select current_setting('wal_level')").foreach { wl =>
      if (wl != "logical")
        out += PreflightFailure(critical = true, "Wrong wal_level",
          s"source wal_level is '$wl' but logical replication requires " +
            "'logical' (ALTER SYSTEM SET wal_level = 'logical' + restart)")
    } }

    // replication-slot headroom: required = 1 apply + sync workers
    val required = maxTableSyncWorkers.toLong + 1L
    checked("Replication Slot Check") {
    for (r <- rows(
      "select (select setting from pg_settings where name = " +
        "'max_replication_slots'), " +
        "(select count(*) from pg_replication_slots)").headOption) {
      (r.lift(0).flatten.map(_.toLong), r.lift(1).flatten.map(_.toLong)) match {
        case (Some(maxSlots), Some(used)) if maxSlots - used < required =>
          out += PreflightFailure(critical = true,
            "Insufficient Replication Slots",
            s"pipeline may need up to $required slots (1 apply + " +
              s"$maxTableSyncWorkers table-sync) but only " +
              s"${maxSlots - used} of $maxSlots are free; raise " +
              "max_replication_slots")
        case _ => ()
      }
    } }

    // wal-sender headroom
    checked("WAL Sender Check") {
    for (r <- rows(
      "select (select setting from pg_settings where name = " +
        "'max_wal_senders'), " +
        "(select count(*) from pg_stat_replication)").headOption) {
      (r.lift(0).flatten.map(_.toLong), r.lift(1).flatten.map(_.toLong)) match {
        case (Some(maxSenders), Some(active))
          if maxSenders - active < required =>
          out += PreflightFailure(critical = true,
            "Insufficient WAL Senders",
            s"pipeline may need up to $required concurrent senders but " +
              s"only ${maxSenders - active} of $maxSenders are free; " +
              "raise max_wal_senders")
        case _ => ()
      }
    } }

    // slot WAL retention (setting unit: MB; -1 = unlimited)
    checked("Slot Retention Check") {
    scalar("select setting from pg_settings where name = " +
      "'max_slot_wal_keep_size'").foreach { v =>
      val mb = try v.toLong catch { case _: Exception => -1L }
      if (mb >= 0 && mb < 1024)
        out += PreflightFailure(critical = false, "Low Slot WAL Retention",
          s"max_slot_wal_keep_size = $mb MB; below 1024 MB a paused " +
            "pipeline risks slot invalidation during ordinary " +
            "maintenance windows")
    } }

    // idle slot timeout (seconds; 0 = disabled)
    checked("Idle Slot Timeout Check") {
    scalar("select setting from pg_settings where name = " +
      "'idle_replication_slot_timeout'").foreach { v =>
      val secs = try v.toLong catch { case _: Exception => 0L }
      if (secs > 0 && secs <= 300)
        out += PreflightFailure(critical = false,
          "Aggressive Idle Slot Timeout",
          s"idle_replication_slot_timeout = $secs s; at or below 300 s " +
            "an incident pause can invalidate the slot")
    } }

    // replica identity audit — only when the publication resolves
    checked("Replica Identity Check") {
    for (pubOps <- rows("select pubupdate, pubdelete from " +
      s"pg_publication where pubname = '$pub'").headOption) {
      val pubUpd = bool(pubOps.lift(0).flatten)
      val pubDel = bool(pubOps.lift(1).flatten)
      val audit = rows(
        "select n.nspname || '.' || c.relname, c.relreplident::text, " +
          "exists(select 1 from pg_constraint con where con.conrelid = " +
          "c.oid and con.contype = 'p'), " +
          "exists(select 1 from pg_index i where i.indrelid = c.oid " +
          "and i.indisreplident) " +
          "from pg_publication p " +
          "cross join lateral pg_get_publication_tables(p.pubname) gpt " +
          "join pg_class c on c.oid = gpt.relid " +
          "join pg_namespace n on n.oid = c.relnamespace " +
          s"where p.pubname = '$pub' order by 1")
      if (audit.isEmpty)
        out += PreflightFailure(critical = false, "Empty Publication",
          s"publication '$publication' exists but publishes no tables " +
            "— the pipeline will stream nothing; ALTER PUBLICATION " +
            s"$publication ADD TABLE <schema.table>, …")
      val unusable = audit.flatMap { r =>
        val name = r.lift(0).flatten.getOrElse("?")
        val ident = r.lift(1).flatten.getOrElse("d")
        val hasPk = bool(r.lift(2).flatten)
        val hasRiIndex = bool(r.lift(3).flatten)
        val usable = ident match {
          case "d" => hasPk        // default → the primary key
          case "i" => hasRiIndex   // USING INDEX → that unique index
          case "f" => true         // full old row
          case _ => false          // 'n' (nothing) or unknown
        }
        if (usable) None else Some(s"$name (replident=$ident)")
      }
      if (unusable.nonEmpty) {
        val detail =
          s"tables without a usable replica identity: ${
            unusable.mkString(", ")}; UPDATE/DELETE events carry no row " +
            "key for them — ALTER TABLE … REPLICA IDENTITY FULL (or " +
            "USING INDEX <unique index>), or add a primary key"
        if (pubUpd || pubDel)
          out += PreflightFailure(critical = true,
            "Unsupported Replica Identity", detail)
        else
          out += PreflightFailure(critical = false,
            "Unsupported Replica Identity",
            detail + " (tolerated now: the publication does not " +
              "publish UPDATE/DELETE)")
      }
    } }

    out.result()
  }

  /** Primary-key audit for merge-shaped destinations (the reference's
    * `PrimaryKeyValidator`, validators/primary_key.rs): a current-state
    * or JDBC merge sink keys every UPDATE/DELETE on the table's primary
    * key, so a published table WITHOUT one cannot be merged — even when
    * REPLICA IDENTITY FULL satisfies the streaming layer. Two checks:
    *  1. published tables with no PRIMARY KEY constraint → critical
    *     (skipped entirely when the publication is missing — the
    *     pipeline validator reports that, primary_key.rs:55-60);
    *  2. PG 15+ only: a publication COLUMN LIST that omits PK columns
    *     strips the merge key from every event → critical
    *     (primary_key.rs:117-180).
    * Unlike the reference we do not walk partition parents for
    * inherited PKs (same leaf-relation stance as the replica-identity
    * audit above). Call only for destinations that merge on key;
    * append-changelog shapes need no PK. */
  def validatePrimaryKeys(conn: PgWireConnection, publication: String,
      destinationName: String): Seq[PreflightFailure] = {
    val audit = new Audit(conn)
    import audit.{checked, out, rows, scalar}
    val pub = esc(publication)

    checked("Primary Key Check") {
      val pubExists = bool(scalar(
        s"select exists(select 1 from pg_publication where pubname = '$pub')"))
      if (pubExists) {
        val noPk = rows(
          "select n.nspname || '.' || c.relname " +
            "from pg_publication p " +
            "cross join lateral pg_get_publication_tables(p.pubname) gpt " +
            "join pg_class c on c.oid = gpt.relid " +
            "join pg_namespace n on n.oid = c.relnamespace " +
            s"where p.pubname = '$pub' " +
            "and not exists (select 1 from pg_constraint con " +
            "where con.conrelid = c.oid and con.contype = 'p') " +
            "order by 1").flatMap(_.headOption.flatten)
        if (noPk.nonEmpty)
          out += PreflightFailure(critical = true, "Missing Primary Key",
            s"the $destinationName destination merges each UPDATE/DELETE " +
              "on the table's primary key, but these published tables " +
              s"have none: ${noPk.mkString(", ")}; add a primary key or " +
              "switch those tables to an append (changelog) destination")
      }
    }

    // publication column lists exist from PG 15; a list omitting a PK
    // column would strip the merge key from every replicated event
    checked("Primary Key Column List Check") {
      val vnum = scalar("select current_setting('server_version_num')")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(0)
      if (vnum >= 150000) {
        val omitted = rows(
          "select pt.schemaname || '.' || pt.tablename " +
            "from pg_publication_tables pt " +
            "join pg_namespace n on n.nspname = pt.schemaname " +
            "join pg_class c on c.relnamespace = n.oid " +
            "and c.relname = pt.tablename " +
            s"where pt.pubname = '$pub' and pt.attnames is not null " +
            "and exists (select 1 from pg_constraint con " +
            "cross join lateral unnest(con.conkey) as k(attnum) " +
            "join pg_attribute a on a.attrelid = c.oid " +
            "and a.attnum = k.attnum " +
            "where con.conrelid = c.oid and con.contype = 'p' " +
            "and a.attname <> all(pt.attnames)) " +
            "order by 1").flatMap(_.headOption.flatten)
        if (omitted.nonEmpty)
          out += PreflightFailure(critical = true,
            "Primary Key Column Not Replicated",
            "these tables' publication column lists omit primary-key " +
              s"columns: ${omitted.mkString(", ")}; the " +
              s"$destinationName destination cannot merge events that " +
              "lack their key — ALTER PUBLICATION … SET TABLE <t> to " +
              "include every primary-key column")
      }
    }

    out.result()
  }

  /** Run both phases, log warnings, throw on criticals (aggregated). */
  def enforce(failures: Seq[PreflightFailure]): Unit = {
    val log = java.util.logging.Logger.getLogger("graft.preflight")
    failures.filterNot(_.critical).foreach(f => log.warning(f.render))
    val crit = failures.filter(_.critical)
    if (crit.nonEmpty)
      throw new IllegalStateException(
        s"preflight validation failed:\n${crit.map(_.render).mkString("\n")}")
  }
}
