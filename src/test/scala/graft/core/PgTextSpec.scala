package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropSpec
import java.time.{LocalDate, LocalTime}

/** Codec unit + property tests, mirroring the reference's layered codec
  * coverage (crates/etl/src/postgres/codec/text.rs:300-930 and
  * tests/value_roundtrip.rs): render→parse roundtrips plus pinned
  * reject-not-corrupt cases. */
class PgTextSpec extends AnyFunSuite with PropSpec {

  // ------------------------------------------------------------------ bool
  test("bool accepts postgres forms") {
    assert(PgText.parseBool("t") && PgText.parseBool("true") &&
      PgText.parseBool("on") && PgText.parseBool("1"))
    assert(!PgText.parseBool("f") && !PgText.parseBool("off"))
    intercept[IllegalArgumentException](PgText.parseBool("maybe"))
    assert(PgText.renderBool(true) == "t" && PgText.renderBool(false) == "f")
  }

  // ----------------------------------------------------------------- bytea
  test("bytea hex roundtrip") {
    checkProp(Prop.forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes => PgText.parseBytea(PgText.renderBytea(bytes)).sameElements(bytes)
    })
    assert(PgText.renderBytea(Array[Byte](0, -1, 16)) == "\\x00ff10")
    intercept[IllegalArgumentException](PgText.parseBytea("00ff"))
    intercept[IllegalArgumentException](PgText.parseBytea("\\x0g"))
  }

  // --------------------------------------------------------------- numeric
  test("numeric parses NaN, infinities, arbitrary precision") {
    import PgText.PgNumeric._
    assert(PgText.PgNumeric.parse("NaN") == NaN)
    assert(PgText.PgNumeric.parse("Infinity") == PositiveInfinity)
    assert(PgText.PgNumeric.parse("-Infinity") == NegativeInfinity)
    val big = "123456789012345678901234567890.123456789"
    PgText.PgNumeric.parse(big) match {
      case Value(v) => assert(v.toPlainString == big)
      case other    => fail(s"unexpected: $other")
    }
    assert(PgText.PgNumeric.render(PgText.PgNumeric.parse("-42.10")) == "-42.10")
  }

  test("numeric → Decimal(38) fallback boundary (SURVEY §1.2)") {
    val fits = PgText.PgNumeric.parse("1234.5678")
    assert(PgText.numericToDecimal38(fits).isDefined)
    val tooWide = PgText.PgNumeric.parse("1" * 39)
    assert(PgText.numericToDecimal38(tooWide).isEmpty)
    assert(PgText.numericToDecimal38(PgText.PgNumeric.NaN).isEmpty)
  }

  test("numeric roundtrip property") {
    checkProp(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.choose(0, 10)) {
      (unscaled: Long, scale: Int) =>
        val v = new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
        PgText.PgNumeric.parse(v.toPlainString) match {
          case PgText.PgNumeric.Value(p) => p.compareTo(v) == 0
          case _                         => false
        }
    })
  }

  // -------------------------------------------------------------- temporal
  test("date/time/timestamp roundtrips") {
    assert(PgText.parseDate("2024-02-29") == LocalDate.of(2024, 2, 29))
    assert(PgText.renderDate(LocalDate.of(1999, 12, 31)) == "1999-12-31")
    assert(PgText.parseTimeMicros("13:14:15.123456") ==
      LocalTime.of(13, 14, 15, 123456000).toNanoOfDay / 1000)
    assert(PgText.renderTimeMicros(PgText.parseTimeMicros("23:59:59.999999")) ==
      "23:59:59.999999")
    val ts = PgText.parseTimestampMicros("2024-01-02 03:04:05.678901")
    assert(PgText.renderTimestampMicros(ts) == "2024-01-02 03:04:05.678901")
    val tstz = PgText.parseTimestampTzMicros("2024-01-02 03:04:05.5+02:00")
    assert(tstz == PgText.parseTimestampMicros("2024-01-02 01:04:05.5"))
  }

  test("temporal rejects pinned gaps (infinity, BC) — reference value_roundtrip.rs:14-18") {
    intercept[IllegalArgumentException](PgText.parseDate("infinity"))
    intercept[IllegalArgumentException](PgText.parseTimestampMicros("-infinity"))
    intercept[IllegalArgumentException](PgText.parseDate("0100-01-01 BC"))
  }

  // ---------------------------------------------------------------- arrays
  test("array literal roundtrip incl. quoting, nulls, empties") {
    val cases = Seq(
      Seq(Some("a"), None, Some("c")),
      Seq(Some(""), Some("NULL"), Some("with space"), Some("com,ma")),
      Seq(Some("quo\"te"), Some("back\\slash"), Some("{brace}")),
      Seq.empty[Option[String]])
    cases.foreach { c =>
      assert(PgText.parseArray(PgText.renderArray(c)) == c.toVector)
    }
    assert(PgText.parseArray("{1,2,NULL,3}") ==
      Vector(Some("1"), Some("2"), None, Some("3")))
  }

  test("array property roundtrip") {
    val elem = Gen.option(Gen.asciiPrintableStr)
    checkProp(Prop.forAll(Gen.listOf(elem)) { elems =>
      PgText.parseArray(PgText.renderArray(elems)) == elems.toVector
    })
  }

  test("multidimensional arrays rejected, not corrupted (text.rs:163)") {
    intercept[IllegalArgumentException](PgText.parseArray("{{1,2},{3,4}}"))
  }

  test("exotic types round-trip as text through COPY + array codecs (text.rs:146-157)") {
    // ranges / intervals / enums / money / inet have NO dedicated codec:
    // the preserve-as-text escape hatch must carry their literal forms
    // byte-identically, including the delimiter-heavy ones
    val literals = Seq(
      "[1,10)",                    // int4range
      "(,2026-01-01]",             // daterange, open lower bound
      "empty",                     // empty range literal
      "1 year 2 mons 3 days 04:05:06.789", // interval
      "-P1Y2M3DT4H5M6S",           // ISO-8601 interval form
      "happy",                     // enum label
      "$1,234.50", "-$0.99",       // money (comma + symbol)
      "192.168.0.0/24", "::1/128", // inet/cidr
      "10:20:30:40:50:60",         // macaddr
      "(1.5,-2.25)",               // point
      "<(0,0),5>",                 // circle
      "101 DALMATIANS")            // citext-ish arbitrary text
    // COPY row: all values in one row, round-trip exact
    val row = literals.map(Option(_))
    assert(PgText.parseCopyRow(PgText.renderCopyRow(row)) == row.toVector)
    // array of exotic literals (quoting covers commas/braces/quotes)
    val arr = literals.map(Option(_))
    assert(PgText.parseArray(PgText.renderArray(arr)) == arr.toVector)
    // and the schema layer maps them all to StringType (no silent cast)
    Seq("int4range", "daterange", "interval", "money", "inet", "cidr",
      "macaddr", "point", "circle", "mood").foreach { t =>
      assert(PgTypeMap.toSpark(t) ==
        org.apache.spark.sql.types.StringType, s"type $t")
      assert(PgTypeMap.toSpark(s"_$t") ==
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true),
        s"array of $t")
    }
  }

  // ------------------------------------------------------------- COPY rows
  test("COPY TEXT row roundtrip incl. NULL vs literal \\N, escapes") {
    val cases = Seq(
      Seq(Some("a"), None, Some("c")),
      Seq(Some("tab\there"), Some("new\nline"), Some("back\\slash")),
      Seq(Some(""), None, Some("\\N-ish")))
    cases.foreach { c =>
      assert(PgText.parseCopyRow(PgText.renderCopyRow(c)) == c.toVector)
    }
  }

  // -------------------------------------------------- fuzz-analog (§5.4)
  // The reference fuzzes its text codecs (fuzz/fuzz_targets); here random
  // garbage must parse-or-reject, never corrupt or crash with anything
  // other than a validation error.
  test("parsers reject-or-parse arbitrary input, never crash (fuzz analog)") {
    val junk = Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    def survives(f: String => Any): Prop = Prop.forAll(junk) { s =>
      try { f(s); true } catch {
        case _: IllegalArgumentException => true
        case _: java.time.format.DateTimeParseException => true
        case _: NumberFormatException => true
        case _: StringIndexOutOfBoundsException => false
        case _: NullPointerException => false
      }
    }
    checkProp(survives(PgText.parseBool), 200)
    checkProp(survives(PgText.parseBytea), 200)
    checkProp(survives(PgText.PgNumeric.parse), 200)
    checkProp(survives(PgText.parseDate), 200)
    checkProp(survives(PgText.parseTimestampMicros), 200)
    checkProp(survives(PgText.parseArray), 200)
    checkProp(survives(PgText.parseCopyRow), 200)
  }

  test("COPY row property roundtrip") {
    val cell = Gen.option(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\t', '\n', '\\', ' ', ','))).map(_.mkString))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(cell)) { cells =>
      PgText.parseCopyRow(PgText.renderCopyRow(cells)) == cells.toVector
    })
  }

  test("packed envelope payload property roundtrip (incl separator/control chars)") {
    // cells draw from the full hazard set: the escape characters, the
    // 0x1F cell separator itself, tabs/newlines (envelope framing), and
    // the literal strings N / \N that could masquerade as NULL
    val hazard = Gen.oneOf('\t', '\n', '\r', '\\', PackedRow.Sep, 'N', '=')
    val cell = Gen.option(Gen.listOf(
      Gen.oneOf(Gen.alphaNumChar, hazard)).map(_.mkString))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(cell)) { cells =>
      PackedRow.parse(PackedRow.render(cells)) == cells.toVector
    }, 200)
    // rendered payloads never contain envelope-hostile raw characters
    checkProp(Prop.forAll(Gen.nonEmptyListOf(cell)) { cells =>
      val r = PackedRow.render(cells)
      !r.exists(c => c == '\t' || c == '\n' || c == '\r')
    }, 200)
    // fuzz analog: arbitrary garbage parses or rejects, never crashes
    val junk = Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)
    checkProp(Prop.forAll(junk) { s =>
      try { PackedRow.parse(s); true } catch {
        case _: IllegalArgumentException => true
      }
    }, 200)
  }
}
