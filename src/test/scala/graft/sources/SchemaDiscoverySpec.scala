package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}

/** Catalog attnum stamping over the simple-query wire — the bootstrap
  * leg of the reference's schema fetch (transaction.rs:563-605): a
  * positionally-seeded registry version gains the live catalog's
  * attnums so its first diff against an attnum-carrying DDL message
  * keys correctly even after a historical mid-table drop. */
final class SchemaDiscoverySpec extends AnyFunSuite {

  private def withServer(handler: String => Option[Seq[Seq[String]]])
      (body: PgWireConnection => Unit): Unit = {
    val server = new FakePgServer()
    server.queryHandler = handler
    val port = server.start()
    val conn = new PgWireConnection("127.0.0.1", port, "graft",
      "postgres", "", replication = false)
    conn.connect()
    try body(conn)
    finally {
      try conn.close() catch { case _: Throwable => () }
      server.stop()
    }
  }

  /** Catalog rows for the mid-table-drop table: a(1), c(3), d(4) —
    * attnum 2 was dropped before bootstrap, d has a default. */
  private val catalog42: Seq[Seq[String]] = Seq(
    Seq("a", "1", null), Seq("c", "3", null), Seq("d", "4", "0"))

  private def seedReg(): SchemaRegistry = {
    val reg = new SchemaRegistry
    reg.put(TableSchemaV(42L, "t", 10L, IndexedSeq(
      ColumnSpec("a", "text", pkOrdinal = 1), ColumnSpec("c", "text"),
      ColumnSpec("d", "int4"))))
    reg
  }

  test("stampOrdinals re-keys the seeded latest version from the live " +
      "catalog (attnums + defaults), and the stamp closes the " +
      "positional→attnum mis-key window") {
    val reg = seedReg()
    withServer(sql =>
        if (sql.contains("attrelid = 42")) Some(catalog42) else None) {
      conn =>
        val stamped = SchemaDiscovery.stampOrdinals(conn, reg)
        assert(stamped == Seq(42L))
    }
    val v = reg.latest(42L).get
    assert(v.snapshotLsn == 10L) // replaced in place, not a new version
    assert(v.columns.map(c => c.name -> c.ordinal) ==
      IndexedSeq("a" -> 1, "c" -> 3, "d" -> 4))
    assert(v.columns.find(_.name == "d").get.default.contains("0"))
    assert(v.primaryKey == Seq("a")) // everything else untouched
    // the window itself: a wire DDL version carrying attnums (rename
    // c→c2 at attnum 3) now diffs as the plain rename it is
    val ddl = TableSchemaV(42L, "t", 20L, IndexedSeq(
      ColumnSpec("a", "text", pkOrdinal = 1, ordinal = 1),
      ColumnSpec("c2", "text", ordinal = 3),
      ColumnSpec("d", "int4", ordinal = 4)))
    val diff = graft.core.SchemaDiff.between(v, ddl)
    assert(diff.added.isEmpty && diff.dropped.isEmpty)
    assert(diff.renames == Seq(("c", "c2")))
  }

  test("an unanswerable catalog (no handler) stamps nothing and is " +
      "not an error — the positional fallback stays in force") {
    val reg = seedReg()
    withServer(_ => None) { conn =>
      assert(SchemaDiscovery.stampOrdinals(conn, reg).isEmpty)
    }
    assert(reg.latest(42L).get.columns.forall(_.ordinal == 0))
  }

  test("a PARTIAL name match (column renamed since the seed) refuses " +
      "to stamp — mixed attnum/positional keys in one version would " +
      "be worse than the uniform fallback") {
    val reg = seedReg()
    // live catalog says the 'c' of the seed is now 'c_renamed'
    val moved = Seq(Seq("a", "1", null), Seq("c_renamed", "3", null),
      Seq("d", "4", null))
    withServer(sql =>
        if (sql.contains("attrelid = 42")) Some(moved) else None) { conn =>
      assert(SchemaDiscovery.stampOrdinals(conn, reg).isEmpty)
    }
    assert(reg.latest(42L).get.columns.forall(_.ordinal == 0))
  }

  test("an already-keyed version is left alone") {
    val reg = new SchemaRegistry
    val keyed = TableSchemaV(7L, "k", 5L, IndexedSeq(
      ColumnSpec("x", "int8", pkOrdinal = 1, ordinal = 1),
      ColumnSpec("y", "text", ordinal = 3)))
    reg.put(keyed)
    withServer(_ => Some(Seq(Seq("x", "9", null), Seq("y", "9", null)))) {
      conn => assert(SchemaDiscovery.stampOrdinals(conn, reg).isEmpty)
    }
    assert(reg.latest(7L).get == keyed)
  }

  test("a stamped bootstrap version aligns the FIRST positional wire " +
      "Relation: ordinals inherit by name through alignOrdinals, so a " +
      "concurrent column add diffs as ONE add, never a rename chain") {
    val reg = seedReg()
    withServer(sql =>
        if (sql.contains("attrelid = 42")) Some(catalog42) else None) {
      conn => assert(SchemaDiscovery.stampOrdinals(conn, reg) == Seq(42L))
    }
    val stamped = reg.latest(42L).get // a(1), c(3), d(4)
    // the first pgoutput Relation after bootstrap: positional, and the
    // source ALSO added a column since the catalog fetch
    val wire = graft.pipeline.CdcPipeline.parseRelation(42L, 20L,
      """{"table":"t","cols":[{"name":"a","type":"text"},""" +
        """{"name":"c","type":"text"},{"name":"d","type":"int4"},""" +
        """{"name":"e","type":"text"}]}""")
    assert(wire.columns.forall(_.ordinal == 0))
    val aligned = graft.pipeline.CdcPipeline.alignOrdinals(
      Some(stamped), wire)
    assert(aligned.columns.map(c => (c.name, c.ordinal)) ==
      IndexedSeq(("a", 1), ("c", 3), ("d", 4), ("e", 5)))
    val diff = graft.core.SchemaDiff.between(stamped, aligned)
    assert(diff.added.map(_.name) == Seq("e") &&
      diff.dropped.isEmpty && diff.renames.isEmpty, diff.toString)
  }

  test("only the LATEST version stamps; history keeps its shape") {
    val reg = seedReg()
    reg.put(TableSchemaV(42L, "t", 20L, IndexedSeq(
      ColumnSpec("a", "text", pkOrdinal = 1), ColumnSpec("c", "text"),
      ColumnSpec("d", "int4"))))
    withServer(sql =>
        if (sql.contains("attrelid = 42")) Some(catalog42) else None) {
      conn => assert(SchemaDiscovery.stampOrdinals(conn, reg) == Seq(42L))
    }
    assert(reg.lookup(42L, 10L).get.columns.forall(_.ordinal == 0))
    assert(reg.latest(42L).get.columns.map(_.ordinal) == IndexedSeq(1, 3, 4))
  }
}
