package graft.core

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.time.LocalDate

/** Postgres BINARY wire format → the type's TEXT form.
  *
  * pgoutput's optional `binary 'true'` mode sends tuple cells in each
  * type's binary send format instead of its text output. The reference
  * refuses such cells outright ("Binary format not supported",
  * crates/etl/src/postgres/codec/event.rs:979), which forces text mode
  * and its parse/print cost on every row; we accept them and convert to
  * the SAME text form the rest of the decode path already speaks, so a
  * binary-mode stream is indistinguishable downstream from a text-mode
  * one (one canonical value representation, verified cell-for-cell by
  * the `stream_binary` conformance session).
  *
  * Formats are from the public PostgreSQL source's send functions
  * (`utils/adt/{bool,int,float,date,timestamp,uuid,numeric,varlena}.c`):
  * network byte order throughout; temporal types count from the
  * Postgres epoch 2000-01-01; `numeric` is base-10000 digit groups.
  * Types without an implemented conversion fall back to bytea-style hex
  * (`\x…`) — the same representation text mode uses for raw bytes — so
  * an exotic type degrades to an opaque-but-lossless value rather than
  * an error.
  */
object PgBinary {

  /** Microseconds from the Postgres epoch (2000-01-01) to the Unix
    * epoch; days likewise. */
  private val PgEpochMicros = 946684800000000L
  private val PgEpochDays = 10957L

  /** Scalar type-name → OID for the COPY BINARY decode path (inverse
    * of [[graft.sources.PgOutput.oidToName]] restricted to types with
    * an implemented binary conversion; bytea included — its hex
    * fallback IS its text form). */
  private val nameToOid: Map[String, Int] = Map(
    "bool" -> 16, "boolean" -> 16, "bytea" -> 17, "int8" -> 20,
    "bigint" -> 20, "int2" -> 21, "smallint" -> 21, "int4" -> 23,
    "int" -> 23, "integer" -> 23, "text" -> 25, "name" -> 19,
    "oid" -> 26, "json" -> 114, "xml" -> 142, "float4" -> 700,
    "real" -> 700, "float8" -> 701, "double precision" -> 701,
    "bpchar" -> 1042, "char" -> 1042, "varchar" -> 1043,
    "date" -> 1082, "time" -> 1083, "timestamp" -> 1114,
    "timestamptz" -> 1184, "numeric" -> 1700, "decimal" -> 1700,
    "uuid" -> 2950, "jsonb" -> 3802,
    // 1-D arrays of the above (underscore names, the registry's form)
    "_bool" -> 1000, "_bytea" -> 1001, "_int2" -> 1005, "_int4" -> 1007,
    "_int8" -> 1016, "_text" -> 1009, "_float4" -> 1021,
    "_float8" -> 1022, "_json" -> 199, "_bpchar" -> 1014,
    "_varchar" -> 1015, "_date" -> 1182, "_time" -> 1183,
    "_timestamp" -> 1115, "_timestamptz" -> 1185, "_numeric" -> 1231,
    "_uuid" -> 2951, "_jsonb" -> 3807)

  private def canon(pgType: String): String =
    pgType.toLowerCase.stripPrefix("pg_catalog.")

  /** Whether a binary `COPY` of this column type converts losslessly
    * to its text form here (arrays and exotic types do not — callers
    * fall back to text-mode COPY for such tables). */
  def copySupported(pgType: String): Boolean = nameToOid.contains(canon(pgType))

  /** [[text]] keyed by type NAME (the schema registry's vocabulary —
    * COPY has no Relation message to carry OIDs). Unknown names render
    * as bytea hex, same as unknown OIDs. */
  def textByName(pgType: String, arr: Array[Byte]): String =
    nameToOid.get(canon(pgType)) match {
      case Some(oid) => text(oid, arr)
      case None => "\\x" + arr.map("%02x".format(_)).mkString
    }

  /** Text-output types whose binary send format IS their UTF-8 text:
    * text, name, bpchar, varchar, json, xml (varlena.c / json.c —
    * `textsend` is just the bytes). Treating these as bytea (the old
    * fallback) published hex instead of the string — the one case
    * where the fallback was WRONG rather than merely opaque. */
  private val Utf8Oids = Set(25, 19, 1042, 1043, 114, 142)

  def text(typeOid: Int, arr: Array[Byte]): String = {
    def bb = ByteBuffer.wrap(arr)
    (typeOid, arr.length) match {
      case (16, 1) => if (arr(0) != 0) "t" else "f"
      case (21, 2) => bb.getShort.toString
      case (23, 4) => bb.getInt.toString
      case (20, 8) => bb.getLong.toString
      case (26, 4) => (bb.getInt.toLong & 0xffffffffL).toString
      case (700, 4) => bb.getFloat.toString // NaN/Infinity match PG text
      case (701, 8) => bb.getDouble.toString
      case (oid, _) if Utf8Oids(oid) =>
        new String(arr, StandardCharsets.UTF_8)
      case (3802, n) if n >= 1 && arr(0) == 1 =>
        // jsonb: 1-byte version header (always 1) + the JSON text
        new String(arr, 1, n - 1, StandardCharsets.UTF_8)
      case (1082, 4) => dateText(bb.getInt)
      case (1083, 8) => PgText.renderTimeMicros(bb.getLong)
      case (1114, 8) => timestampText(bb.getLong, tz = false)
      case (1184, 8) => timestampText(bb.getLong, tz = true)
      case (2950, 16) => uuidText(arr)
      case (1700, n) if n >= 8 => numericText(bb)
      case (oid, n) if arrayElemOid.contains(oid) && n >= 12 =>
        arrayText(bb)
      case _ => "\\x" + arr.map("%02x".format(_)).mkString
    }
  }

  /** 1-D array OIDs with convertible element types (the array half of
    * [[graft.sources.PgOutput.oidToName]]). The element OID also rides
    * IN the wire value (array_send) — [[arrayText]] trusts that one,
    * this set only gates which array types claim support. */
  private val arrayElemOid: Map[Int, Int] = Map(
    1000 -> 16, 1001 -> 17, 1005 -> 21, 1007 -> 23, 1016 -> 20,
    1009 -> 25, 1021 -> 700, 1022 -> 701, 199 -> 114, 1014 -> 1042,
    1015 -> 1043, 1182 -> 1082, 1183 -> 1083, 1115 -> 1114,
    1185 -> 1184, 1231 -> 1700, 2951 -> 2950, 3807 -> 3802)

  /** `array_send` (arrayfuncs.c): Int32 ndim, Int32 has-nulls flag,
    * Int32 element OID, per dimension {Int32 length, Int32 lower
    * bound}, then per element Int32 byte length (-1 = NULL) + the
    * element's binary send format. Rendered as the PG array literal
    * `{…}` with array_out's quoting rules, so the existing text-side
    * array tokenizer ([[PgText.parseArray]]) decodes it unchanged.
    * Multidimensional arrays reject — the same 1-D stance as the text
    * parser (and the reference, text.rs:163). */
  private def arrayText(b: ByteBuffer): String = {
    val ndim = b.getInt
    b.getInt // has-nulls flag (redundant with per-element -1 lengths)
    val elemOid = b.getInt
    require(ndim >= 0 && ndim <= 1,
      s"multidimensional arrays unsupported: ndim=$ndim")
    if (ndim == 0) return "{}"
    val len = b.getInt
    b.getInt // lower bound
    require(len >= 0 && len <= b.remaining,
      s"hostile binary array length $len (${b.remaining} bytes left)")
    val sb = new StringBuilder("{")
    var i = 0
    while (i < len) {
      if (i > 0) sb += ','
      val l = b.getInt
      if (l == -1) sb.append("NULL")
      else {
        require(l >= 0 && l <= b.remaining,
          s"hostile binary array element length $l")
        val a = new Array[Byte](l); b.get(a)
        sb.append(quoteArrayElem(text(elemOid, a)))
      }
      i += 1
    }
    sb += '}'
    sb.toString
  }

  /** array_out's quoting rule: quote when the element is empty, spells
    * NULL (any case), or contains a brace, comma, quote, backslash or
    * whitespace; escape `"` and `\` inside. */
  private def quoteArrayElem(s: String): String = {
    val needs = s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == '{' || c == '}' || c == ',' || c == '"' ||
        c == '\\' || c.isWhitespace)
    if (!needs) s
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** `date`: int32 days since 2000-01-01; ±Int.MaxValue are the
    * infinity sentinels (datatype/timestamp.h) — rendered as their text
    * forms so binary mode rejects them exactly where text mode does. */
  private def dateText(days: Int): String =
    if (days == Int.MaxValue) "infinity"
    else if (days == Int.MinValue) "-infinity"
    else PgText.renderDate(LocalDate.ofEpochDay(days.toLong + PgEpochDays))

  /** `timestamp[tz]`: int64 microseconds since 2000-01-01 (UTC for
    * timestamptz); ±Long.MaxValue are the infinity sentinels. */
  private def timestampText(pgMicros: Long, tz: Boolean): String =
    if (pgMicros == Long.MaxValue) "infinity"
    else if (pgMicros == Long.MinValue) "-infinity"
    else {
      val unixMicros = pgMicros + PgEpochMicros
      if (tz) PgText.renderTimestampTzMicros(unixMicros)
      else PgText.renderTimestampMicros(unixMicros)
    }

  private def uuidText(arr: Array[Byte]): String = {
    val h = arr.map("%02x".format(_)).mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20)}"
  }

  /** `numeric` (numeric.c `numeric_send`): ndigits(u16), weight(i16,
    * exponent of the FIRST base-10000 group), sign(u16), dscale(u16),
    * then ndigits base-10000 groups. Sign 0xC000/0xD000/0xF000 are
    * NaN/+Inf/-Inf (PG 14+). Text form: exactly `dscale` fractional
    * digits, groups beyond the transmitted ones are zero (PG strips
    * leading/trailing zero groups on send). */
  private def numericText(b: ByteBuffer): String = {
    val nd = b.getShort.toInt
    val weight = b.getShort.toInt
    val sign = b.getShort & 0xffff
    val dscale = b.getShort & 0x3fff
    require(nd >= 0 && b.remaining >= 2 * nd,
      s"malformed binary numeric: ndigits=$nd, ${b.remaining} bytes left")
    sign match {
      case 0xC000 => "NaN"
      case 0xD000 => "Infinity"
      case 0xF000 => "-Infinity"
      case s if s == 0 || s == 0x4000 =>
        val digits = Array.fill(nd)(b.getShort.toInt)
        def group(i: Int): Int = if (i >= 0 && i < nd) digits(i) else 0
        val sb = new StringBuilder
        if (s == 0x4000) sb += '-'
        if (weight < 0) sb += '0'
        else {
          var i = 0
          while (i <= weight) {
            if (i == 0) sb.append(group(0).toString)
            else sb.append(f"${group(i)}%04d")
            i += 1
          }
        }
        if (dscale > 0) {
          sb += '.'
          val frac = new StringBuilder
          var i = weight + 1
          while (frac.length < dscale) { frac.append(f"${group(i)}%04d"); i += 1 }
          sb.append(frac.substring(0, dscale))
        }
        sb.toString
      case other =>
        throw new IllegalArgumentException(
          f"unknown binary numeric sign 0x$other%04x")
    }
  }
}
