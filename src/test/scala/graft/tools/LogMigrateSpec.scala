package graft.tools

import graft.SparkSpec
import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
import graft.pipeline.CdcPipeline
import graft.sources.PgOutput._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Legacy-JSON → packed log migration: the rewritten log must decode to
  * the SAME typed rows as the original (via the dual-format envelope
  * decode), with control lines byte-identical and fidelity IMPROVING
  * for the shapes JSON degraded (NaN floats). */
class LogMigrateSpec extends SparkSpec {

  private val rel = Relation(1, "public", "users", 'd', IndexedSeq(
    RelCol(1, "id", 20, -1), RelCol(0, "name", 25, -1),
    RelCol(0, "score", 701, -1)))
  private val schema = TableSchemaV(1L, "users", 0L, IndexedSeq(
    ColumnSpec("id", "int8", nullable = false, pkOrdinal = 1),
    ColumnSpec("name", "text"),
    ColumnSpec("score", "float8")))

  private def jsonLog(dir: String): String = {
    // legacy producer: JSON payloads
    val s = new DecodeSession(packedPayloads = false)
    def frames(ms: Message*): Seq[String] = ms.flatMap(m => s.onFrame(encode(m)))
    val lines =
      frames(rel) ++
      frames(Begin(100, 0, 1),
        Insert(1, IndexedSeq(TText("1"), TText("tab\there"), TText("1.5"))),
        Insert(1, IndexedSeq(TText("2"), TNull, TText("NaN"))),
        Update(1, Some('K'),
          Some(IndexedSeq(TText("1"), TNull, TNull)),
          IndexedSeq(TText("1"), TText("ann"), TText("42"))),
        Delete(1, 'K', IndexedSeq(TText("2"), TNull, TNull)),
        Commit(0, 100, 101, 0)) ++
      frames(Begin(200, 0, 2), Truncate(0, Vector(1)), Commit(0, 200, 201, 0))
    val p = s"$dir/wal.log"
    Files.write(Paths.get(p),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    p
  }

  test("migrated log decodes to the same typed rows; control lines untouched") {
    val dir = Files.createTempDirectory("log-migrate").toString
    val in = jsonLog(dir)
    val out = s"$dir/wal.packed.log"
    val (converted, kept) = LogMigrate.migrate(in, out)
    assert(converted == 4, s"converted=$converted") // I, I, U, D
    // R + T pass through byte-identical
    val inLines = Files.readAllLines(Paths.get(in))
    val outLines = Files.readAllLines(Paths.get(out))
    assert(outLines.size == inLines.size)
    assert(outLines.get(0) == inLines.get(0)) // R record
    assert(outLines.get(outLines.size - 1) == inLines.get(inLines.size - 1))
    // converted payloads are packed, not JSON
    assert(!outLines.get(1).contains("{\""), outLines.get(1))

    def decode(path: String) = {
      val df = spark.read.format("graft-cdc").option("path", path).load()
        .filter(org.apache.spark.sql.functions.col("_op").isin("I", "U", "D"))
      CdcPipeline.jsonDecode(df, schema)
        .select("id", "name", "score", "_op")
    }
    import spark.implicits._
    val legacy = decode(in).as[(Long, Option[String], Option[Double], String)]
      .collect().toSet
    val packed = decode(out).as[(Long, Option[String], Option[Double], String)]
      .collect().toSet
    // identical EXCEPT the known JSON degradation: quoted NaN nulled via
    // from_json, decodes as a real NaN packed — strictly more faithful
    def scrubNaN(s: Set[(Long, Option[String], Option[Double], String)]) =
      s.map { case (id, n, v, op) =>
        (id, n, v.filterNot(_.isNaN), op) }
    assert(scrubNaN(packed) == scrubNaN(legacy), s"$packed vs $legacy")
    assert(packed.exists { case (id, _, v, _) =>
      id == 2L && v.exists(_.isNaN) }, "NaN fidelity not restored")
    // tab/escape-carrying strings survive the conversion exactly
    assert(packed.exists(_._2.contains("tab\there")))
  }

  test("lines without a known schema pass through unchanged") {
    val dir = Files.createTempDirectory("log-migrate2").toString
    val line = graft.sources.CdcLogSource.renderLine("I", 99L, 5L, 5L, 0L,
      0L, None, Some("""{"id":1}"""))
    val in = s"$dir/orphan.log"
    Files.write(Paths.get(in), (line + "\n").getBytes(StandardCharsets.UTF_8))
    val out = s"$dir/orphan.out"
    val (converted, kept) = LogMigrate.migrate(in, out)
    assert(converted == 0 && kept == 1)
    assert(Files.readAllLines(Paths.get(out)).get(0) == line)
  }
}
