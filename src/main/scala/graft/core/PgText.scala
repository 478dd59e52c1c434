package graft.core

import java.math.{BigDecimal => JBigDecimal}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.time.{LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}

/** Postgres text-format codecs (parse + render), the Spark-side analog of the
  * reference's text codec family:
  *   - reference: crates/etl/src/postgres/codec/text.rs:32-160 (cell parse)
  *   - reference: crates/etl/src/postgres/codec/hex.rs (bytea hex)
  *   - reference: crates/etl/src/postgres/codec/bool.rs, time.rs
  *
  * These are plain Scala functions used inside source partition readers and
  * sinks; `graft.functions.PgFunctions` exposes a subset as Catalyst
  * expressions / SQL functions. Unrecognized types keep their text form
  * (the reference's "preserve as text" escape hatch, text.rs:146-157).
  *
  * All parsers REJECT rather than corrupt on unsupported shapes
  * (multidimensional arrays, temporal infinity), matching the pinned gaps in
  * reference tests (crates/etl/tests/value_roundtrip.rs:14-18).
  */
object PgText {

  // ---------------------------------------------------------------- booleans
  /** bool text: Postgres emits 't'/'f' but accepts more on input
    * (reference codec/bool.rs). */
  def parseBool(s: String): Boolean = s.trim.toLowerCase match {
    case "t" | "true" | "y" | "yes" | "on" | "1"  => true
    case "f" | "false" | "n" | "no" | "off" | "0" => false
    case other => throw new IllegalArgumentException(s"invalid bool: '$other'")
  }
  def renderBool(b: Boolean): String = if (b) "t" else "f"

  // ------------------------------------------------------------------- bytea
  /** bytea hex codec `\xDEADBEEF` (reference codec/hex.rs). */
  def parseBytea(s: String): Array[Byte] = {
    require(s.length >= 2 && s.startsWith("\\x"), s"bytea must start with \\x")
    require((s.length & 1) == 0, "odd-length bytea hex")
    val out = new Array[Byte]((s.length - 2) / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(s.charAt(2 + 2 * i), 16)
      val lo = Character.digit(s.charAt(3 + 2 * i), 16)
      require(hi >= 0 && lo >= 0, s"invalid hex digit in bytea at byte $i")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }
  def renderBytea(b: Array[Byte]): String = {
    val sb = new StringBuilder(2 + b.length * 2)
    sb.append("\\x")
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  // ----------------------------------------------------------------- numeric
  /** Parsed `numeric` value. Postgres numeric admits NaN / ±Infinity and
    * arbitrary precision (reference crates/etl-postgres/src/numeric.rs:75-160).
    * Spark `DecimalType` caps at precision 38, so values that don't fit keep
    * their text form (the documented loss boundary, SURVEY §1.2).
    */
  sealed trait PgNumeric
  object PgNumeric {
    case object NaN extends PgNumeric
    case object PositiveInfinity extends PgNumeric
    case object NegativeInfinity extends PgNumeric
    final case class Value(v: JBigDecimal) extends PgNumeric

    def parse(s: String): PgNumeric = s.trim match {
      case "NaN"                      => NaN
      case "Infinity" | "+Infinity"   => PositiveInfinity
      case "-Infinity"                => NegativeInfinity
      case t                          => Value(new JBigDecimal(t))
    }
    def render(n: PgNumeric): String = n match {
      case NaN              => "NaN"
      case PositiveInfinity => "Infinity"
      case NegativeInfinity => "-Infinity"
      case Value(v)         => v.toPlainString
    }
  }

  /** numeric → Spark Decimal(38, s) when it fits, else None (caller falls
    * back to StringType — SURVEY §1.2 loss boundary). */
  def numericToDecimal38(n: PgNumeric): Option[JBigDecimal] = n match {
    case PgNumeric.Value(v) if v.precision <= 38 && v.scale >= 0 && v.scale <= 38 =>
      Some(v)
    case _ => None
  }

  // ---------------------------------------------------------------- temporal
  // Postgres text formats (ISO datestyle): `2024-01-02`,
  // `12:34:56[.ffffff]`, `2024-01-02 12:34:56[.ffffff]`, with tz `+HH[:MM]`.
  private val timeFmt: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendPattern("HH:mm:ss")
    .optionalStart().appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true).optionalEnd()
    .toFormatter
  private val tsFmt: DateTimeFormatter = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart().appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true).optionalEnd()
    .toFormatter
  private val tstzFmt: DateTimeFormatter = new DateTimeFormatterBuilder()
    .append(tsFmt)
    .appendOffset("+HH:mm", "+00")
    .toFormatter

  private def rejectInfinite(s: String): Unit = {
    val t = s.trim
    if (t == "infinity" || t == "-infinity")
      throw new IllegalArgumentException(s"temporal infinity unsupported: $s")
  }

  def parseDate(s: String): LocalDate = {
    rejectInfinite(s)
    require(!s.endsWith(" BC"), s"BC dates unsupported: $s")
    LocalDate.parse(s.trim, DateTimeFormatter.ISO_LOCAL_DATE)
  }
  def renderDate(d: LocalDate): String = d.format(DateTimeFormatter.ISO_LOCAL_DATE)

  /** `time` → micros-of-day (Spark has no TimeType; SURVEY §1.2 maps to LongType). */
  def parseTimeMicros(s: String): Long = {
    val t = LocalTime.parse(s.trim, timeFmt)
    t.toNanoOfDay / 1000L
  }
  def renderTimeMicros(micros: Long): String =
    LocalTime.ofNanoOfDay(micros * 1000L).format(timeFmt)

  /** `timestamp` (no tz) → micros since epoch, NTZ semantics. */
  def parseTimestampMicros(s: String): Long = {
    rejectInfinite(s)
    val ldt = LocalDateTime.parse(s.trim, tsFmt)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }
  def renderTimestampMicros(micros: Long): String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    LocalDateTime.ofEpochSecond(secs, frac.toInt * 1000, ZoneOffset.UTC).format(tsFmt)
  }

  /** `timestamptz` → UTC micros since epoch (Postgres renders with offset). */
  def parseTimestampTzMicros(s: String): Long = {
    rejectInfinite(s)
    val odt = OffsetDateTime.parse(s.trim, tstzFmt)
    odt.toEpochSecond * 1000000L + odt.getNano / 1000L
  }
  def renderTimestampTzMicros(micros: Long): String =
    renderTimestampMicros(micros) + "+00"

  // ------------------------------------------------------------------ arrays
  /** Parse a 1-D Postgres array literal `{a,b,NULL,"c d"}` into elements
    * (None = NULL element). Multidimensional arrays are rejected, matching
    * the reference (text.rs:163, test text.rs:389). Element parsing is the
    * caller's job (pass the raw text through `parse*` above).
    */
  def parseArray(s: String): IndexedSeq[Option[String]] = {
    val t = s.trim
    require(t.length >= 2 && t.head == '{' && t.last == '}',
      s"malformed array literal: $s")
    val body = t.substring(1, t.length - 1)
    if (body.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Option[String]]
    val cur = new StringBuilder
    var quoted = false        // inside "..."
    var wasQuoted = false     // current element used quotes
    var i = 0
    def flush(): Unit = {
      val v = cur.toString
      out += (if (!wasQuoted && v == "NULL") None else Some(v))
      cur.clear(); wasQuoted = false
    }
    while (i < body.length) {
      val c = body.charAt(i)
      if (quoted) c match {
        case '\\' => require(i + 1 < body.length, "dangling escape")
                     cur.append(body.charAt(i + 1)); i += 1
        case '"'  => quoted = false
        case x    => cur.append(x)
      } else c match {
        case '"'  => quoted = true; wasQuoted = true
        case ','  => flush()
        case '{'  => throw new IllegalArgumentException(
                       "multidimensional arrays unsupported")
        case '\\' => require(i + 1 < body.length, "dangling escape")
                     cur.append(body.charAt(i + 1)); i += 1
        case x    => cur.append(x)
      }
      i += 1
    }
    require(!quoted, "unterminated quote in array literal")
    flush()
    out.result()
  }

  /** Render a 1-D array literal (inverse of [[parseArray]]). */
  def renderArray(elems: Seq[Option[String]]): String =
    elems.map {
      case None => "NULL"
      case Some(v) =>
        val needsQuote = v.isEmpty || v == "NULL" ||
          v.exists(c => c == ',' || c == '{' || c == '}' || c == '"' ||
                        c == '\\' || Character.isWhitespace(c))
        if (needsQuote)
          "\"" + v.flatMap {
            case '"'  => "\\\""
            case '\\' => "\\\\"
            case c    => c.toString
          } + "\""
        else v
    }.mkString("{", ",", "}")

  // -------------------------------------------------------- COPY TEXT rows
  /** Split one `COPY ... TO STDOUT (FORMAT TEXT)` line into column values
    * (None = `\N` NULL), un-escaping the COPY TEXT escapes
    * (reference codec/table_row.rs). */
  def parseCopyRow(line: String): IndexedSeq[Option[String]] = {
    val out = Vector.newBuilder[Option[String]]
    val cur = new StringBuilder
    var isNull = false
    var sawEscape = false
    var i = 0
    def flush(): Unit = {
      out += (if (isNull && !sawEscape && cur.isEmpty) None else Some(cur.toString))
      cur.clear(); isNull = false; sawEscape = false
    }
    while (i < line.length) {
      line.charAt(i) match {
        case '\t' => flush()
        case '\\' =>
          require(i + 1 < line.length, "dangling escape in COPY row")
          sawEscape = true
          line.charAt(i + 1) match {
            case 'N'  => if (cur.isEmpty) { isNull = true; sawEscape = false }
                         else cur.append('N')
            case 'n'  => cur.append('\n')
            case 't'  => cur.append('\t')
            case 'r'  => cur.append('\r')
            case 'b'  => cur.append('\b')
            case 'f'  => cur.append('\f')
            case 'v'  => cur.append(11.toChar)
            case '\\' => cur.append('\\')
            case c    => cur.append(c)
          }
          i += 1
        case c => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  /** Render one COPY TEXT line. */
  def renderCopyRow(values: Seq[Option[String]]): String =
    values.map {
      case None => "\\N"
      case Some(v) => v.flatMap {
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c    => c.toString
      }
    }.mkString("\t")
}
