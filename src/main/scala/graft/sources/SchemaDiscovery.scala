package graft.sources

import graft.core.{SchemaRegistry, TableSchemaV}

/** Catalog-seeded schema ordinals — the analog of the reference's
  * bootstrap schema fetch (crates/etl/src/postgres/client/
  * transaction.rs:563-605 runs `etl.describe_table_schema(oid)` inside
  * the snapshot transaction; the function body is `pg_attribute`
  * filtered to `attnum > 0 AND NOT attisdropped`, ordered by attnum —
  * so every schema version the reference ever stores carries REAL
  * physical attnums from birth).
  *
  * Why this exists: a registry seeded from a config file carries
  * positional ordinals (`ColumnSpec.ordinal = 0` → [[graft.core.SchemaDiff]]
  * falls back to 1-based list position). For a table whose history
  * includes a mid-table DROP COLUMN, position ≠ attnum, and the first
  * diff against an attnum-carrying `supabase_etl_ddl` message mis-keys:
  * the seeded column at position i lines up with whatever later column
  * happens to hold attnum i, so a plain rename can read as an unrelated
  * drop+add (or worse, a rename of the WRONG column). Stamping live
  * attnums onto the seeded version at bootstrap closes that window for
  * good — afterwards both diff sides key by attnum.
  */
object SchemaDiscovery {

  /** The catalog text for one table's live attnums + default
    * expressions. Single-line deterministic text (wire fixtures match
    * on it); same filters as the reference's `describe_table_schema`:
    * user columns only (`attnum > 0`), dropped slots excluded, ordered
    * by attnum. Defaults ride along because the catalog has them and
    * destination DDL wants them (reference ColumnSchemaMessage
    * `default_expression`). */
  def attnumQuery(tableId: Long): String =
    s"select a.attname, a.attnum, pg_catalog.pg_get_expr(d.adbin, d.adrelid) " +
      "from pg_attribute a " +
      "left join pg_attrdef d on d.adrelid = a.attrelid and d.adnum = a.attnum " +
      s"where a.attrelid = $tableId and a.attnum > 0 and not a.attisdropped " +
      "order by a.attnum"

  /** Live (column name → (attnum, default expression)) for `tableId`.
    * Empty when the server answers nothing — a catalog that doesn't
    * know the oid, or a test double without a handler; callers treat
    * both as "nothing to stamp". */
  def fetchAttnums(conn: PgWireConnection, tableId: Long)
      : Map[String, (Int, Option[String])] =
    conn.queryRows(attnumQuery(tableId)).flatMap { r =>
      for {
        name <- r.headOption.flatten
        num <- r.lift(1).flatten.flatMap(s =>
          scala.util.Try(s.trim.toInt).toOption)
      } yield name -> (num, r.lift(2).flatten.filter(_.nonEmpty))
    }.toMap

  /** Stamp live attnums (and missing defaults) onto the LATEST version
    * of every table whose seed lacks them, matching columns by name.
    * Only a FULLY keyed result commits: if any column fails to match
    * the live catalog (renamed since the seed was written), the version
    * keeps its uniform positional fallback — a half-stamped version
    * would mix attnum keys and positional keys in one diff side, which
    * is strictly worse. Historical versions are left untouched (they
    * describe a PAST shape; today's catalog can't key them). Returns
    * the stamped tableIds. */
  def stampOrdinals(conn: PgWireConnection, reg: SchemaRegistry): Seq[Long] =
    reg.tables.flatMap { tid =>
      reg.latest(tid).flatMap { v =>
        if (!v.columns.exists(_.ordinal <= 0)) None
        else {
          val live = fetchAttnums(conn, tid)
          val cols = v.columns.map { c =>
            live.get(c.name) match {
              case Some((ord, dflt)) if c.ordinal <= 0 =>
                c.copy(ordinal = ord, default = c.default.orElse(dflt))
              case _ => c
            }
          }
          if (live.nonEmpty && cols.forall(_.ordinal > 0)) {
            reg.put(v.copy(columns = cols)) // same snapshotLsn → replaces
            Some(tid)
          } else None
        }
      }
    }

  /** Convenience for [[graft.Replicator]]: one short-lived non-replication
    * session just for the stamping pass. Failures are non-fatal — the
    * positional fallback remains correct for every history without a
    * mid-table drop, and refusing to start over a bootstrap nicety
    * would be the wrong trade. */
  def stampOrdinalsVia(host: String, port: Int, user: String, db: String,
      password: String, reg: SchemaRegistry, sslMode: String = "disable",
      sslRootCert: Option[String] = None): Seq[Long] =
    try {
      val conn = new PgWireConnection(host, port, user, db, password,
        replication = false, sslMode = sslMode, sslRootCert = sslRootCert)
      conn.connect()
      try stampOrdinals(conn, reg)
      finally { try conn.close() catch { case _: Throwable => () } }
    } catch {
      case e: Exception =>
        System.err.println(s"schema ordinal stamping skipped: $e")
        Nil
    }
}
