package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.core.{PackedRow, SchemaRegistry, TableSchemaV}
import graft.pipeline.CdcPipeline

/** One-off change-log migration: rewrite legacy JSON payloads to the
  * packed format ([[PackedRow]]) so a pre-upgrade log stops paying the
  * envelope decode's `from_json` fallback branch (ROADMAP). Control
  * lines ('R' schema records, 'T' truncates) and already-packed lines
  * pass through byte-identical; schema versions resolve from the log's
  * own in-stream 'R' records (optionally seeded from a schemas.json),
  * each payload converting under the version at its `_schema_lsn` —
  * exactly the floor-lookup the decoder applies.
  *
  * Value fidelity: JSON strings carry the Postgres text form already
  * (arrays/bytea/temporals), numbers and booleans map to their text
  * forms, so decoded values are equal — or better: quoted `NaN` /
  * `Infinity` floats and `{…}` array literals decode correctly packed,
  * where `from_json` yielded null.
  *
  * Usage: `runMain graft.tools.LogMigrate <in.log> <out.log>
  * [schemas.json]`; the caller swaps the file in after verification
  * (the reader's layout stamp detects the rewrite and re-indexes).
  */
object LogMigrate {

  /** Convert one JSON image to a packed payload under `schema`. */
  private[tools] def jsonToPacked(json: String,
      schema: TableSchemaV): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fields = JsonMethods.parse(json) match {
      case JObject(kvs) => kvs.toMap
      case other => throw new IllegalArgumentException(
        s"payload is not a JSON object: ${other.getClass.getSimpleName}")
    }
    val cells = schema.replicatedColumns.map { c =>
      fields.get(c.name) match {
        case None | Some(JNull) => None
        case Some(JString(s))   => Some(s)
        case Some(JBool(b))     => Some(if (b) "t" else "f")
        case Some(JInt(i))      => Some(i.toString)
        case Some(JLong(l))     => Some(l.toString)
        case Some(JDecimal(d))  => Some(d.bigDecimal.toPlainString)
        case Some(JDouble(d)) =>
          // integral doubles render without the trailing .0 only when
          // json carried them that way — both cast identically, so the
          // shortest faithful form is fine
          Some(if (d == d.longValue.toDouble && math.abs(d) < 1e15)
            d.longValue.toString else d.toString)
        case Some(other) => Some(JsonMethods.compact(JsonMethods.render(other)))
      }
    }
    PackedRow.render(cells)
  }

  /** Migrate `in` → `out`; returns (converted, passedThrough) line
    * counts. Lines whose table has no known schema version pass through
    * unchanged (they keep decoding via the JSON branch). */
  def migrate(in: String, out: String,
      registry: SchemaRegistry = new SchemaRegistry): (Long, Long) = {
    var converted = 0L
    var kept = 0L
    val tmp = Paths.get(out + ".tmp")
    val reader = Files.newBufferedReader(Paths.get(in), StandardCharsets.UTF_8)
    val writer = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try {
      var line = reader.readLine()
      while (line != null) {
        val f = line.split("\t", -1)
        val outLine =
          if (f.length < 9) { kept += 1; line }
          else f(2) match {
            case "R" =>
              // schema record: versions the registry for later payloads
              try registry.put(CdcPipeline.parseRelation(
                f(3).toLong, f(5).toLong, f(7)))
              catch { case _: Throwable => () }
              kept += 1; line
            case "I" | "U" | "D" =>
              registry.lookup(f(3).toLong, f(5).toLong) match {
                case Some(schema) =>
                  var changed = false
                  def conv(cell: String): String =
                    if (cell.nonEmpty && cell.charAt(0) == '{') {
                      changed = true; jsonToPacked(cell, schema)
                    } else cell
                  val nf = f.clone()
                  nf(6) = conv(f(6))
                  nf(7) = conv(f(7))
                  if (changed) { converted += 1; nf.mkString("\t") }
                  else { kept += 1; line }
                case None => kept += 1; line
              }
            case _ => kept += 1; line
          }
        writer.write(outLine); writer.newLine()
        line = reader.readLine()
      }
    } finally { reader.close(); writer.close() }
    Files.move(tmp, Paths.get(out), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    (converted, kept)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LogMigrate <in.log> <out.log> [schemas.json]")
    val registry =
      if (args.length >= 3) SchemaRegistry.load(args(2))
      else new SchemaRegistry
    val (converted, kept) = migrate(args(0), args(1), registry)
    println(s"""{"converted":$converted,"passed_through":$kept}""")
  }
}
