package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.PropSpec
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Binary-wire-format → text conversion (the pgoutput `binary 'true'`
  * mode the reference refuses, codec/event.rs:979). Each case pins the
  * PG send format from the public source (`utils/adt`) against the
  * text form [[PgText]] parses — the two wire modes must be
  * indistinguishable downstream. */
class PgBinarySpec extends AnyFunSuite with PropSpec {

  private def be16(v: Int) =
    ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def be32(v: Int) = ByteBuffer.allocate(4).putInt(v).array()
  private def be64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()

  test("fixed-width numerics and bool") {
    assert(PgBinary.text(16, Array[Byte](1)) == "t")
    assert(PgBinary.text(16, Array[Byte](0)) == "f")
    assert(PgBinary.text(21, be16(-42)) == "-42")
    assert(PgBinary.text(23, be32(123456)) == "123456")
    assert(PgBinary.text(20, be64(-9007199254740993L)) == "-9007199254740993")
    // oid is unsigned int32
    assert(PgBinary.text(26, be32(-1)) == "4294967295")
    assert(PgBinary.text(700,
      ByteBuffer.allocate(4).putFloat(1.5f).array()) == "1.5")
    assert(PgBinary.text(701,
      ByteBuffer.allocate(8).putDouble(-2.25).array()) == "-2.25")
    assert(PgBinary.text(701,
      ByteBuffer.allocate(8).putDouble(Double.NaN).array()) == "NaN")
    assert(PgBinary.text(700, ByteBuffer.allocate(4)
      .putFloat(Float.NegativeInfinity).array()) == "-Infinity")
  }

  test("text-ish types pass through as UTF-8, not hex") {
    val s = "héllo — ünïcode"
    for (oid <- Seq(25, 19, 1042, 1043, 114, 142))
      assert(PgBinary.text(oid, s.getBytes(StandardCharsets.UTF_8)) == s)
    // jsonb strips its 1-byte version header
    val jb = Array[Byte](1) ++ """{"a":1}""".getBytes(StandardCharsets.UTF_8)
    assert(PgBinary.text(3802, jb) == """{"a":1}""")
  }

  test("bytea and unknown types render as hex (lossless fallback)") {
    assert(PgBinary.text(17, Array[Byte](0, -1, 16)) == "\\x00ff10")
    assert(PgBinary.text(600 /* point */, be64(0L)) == "\\x0000000000000000")
    // a TEXT oid with impossible layout still passes through (any length)
    assert(PgBinary.text(25, Array.emptyByteArray) == "")
  }

  test("date: days since 2000-01-01, infinity sentinels") {
    assert(PgBinary.text(1082, be32(0)) == "2000-01-01")
    assert(PgBinary.text(1082, be32(8324)) == "2022-10-16")
    assert(PgBinary.text(1082, be32(-10957)) == "1970-01-01")
    assert(PgBinary.text(1082, be32(Int.MaxValue)) == "infinity")
    assert(PgBinary.text(1082, be32(Int.MinValue)) == "-infinity")
    // the rendered form parses back to the same day (text-mode parity)
    assert(PgText.parseDate(PgBinary.text(1082, be32(8324)))
      .toEpochDay == 8324L + 10957L)
  }

  test("time: microseconds of day") {
    assert(PgBinary.text(1083, be64(0L)) == "00:00:00")
    assert(PgBinary.text(1083, be64(45296123456L)) == "12:34:56.123456")
    assert(PgText.parseTimeMicros(
      PgBinary.text(1083, be64(45296123456L))) == 45296123456L)
  }

  test("timestamp/timestamptz: PG-epoch micros, tz renders +00") {
    // 2000-01-01 00:00:00 PG epoch
    assert(PgBinary.text(1114, be64(0L)) == "2000-01-01 00:00:00")
    assert(PgBinary.text(1184, be64(0L)) == "2000-01-01 00:00:00+00")
    val micros = 719528400000001L // 2022-10-19 21:00:00.000001 PG epoch
    val t = PgBinary.text(1114, be64(micros))
    assert(PgText.parseTimestampMicros(t) == micros + 946684800000000L)
    val tz = PgBinary.text(1184, be64(micros))
    assert(PgText.parseTimestampTzMicros(tz) == micros + 946684800000000L)
    assert(PgBinary.text(1114, be64(Long.MaxValue)) == "infinity")
    assert(PgBinary.text(1184, be64(Long.MinValue)) == "-infinity")
  }

  test("timestamp roundtrip property: binary == render of unix micros") {
    val gen = Gen.choose(-30610224000000000L, 9214646400000000L) // ±broad
    checkProp(Prop.forAll(gen) { pgMicros =>
      PgBinary.text(1114, be64(pgMicros)) ==
        PgText.renderTimestampMicros(pgMicros + 946684800000000L)
    })
  }

  test("uuid: 16 bytes, hyphenated") {
    val u = java.util.UUID.fromString("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
    val bytes = ByteBuffer.allocate(16)
      .putLong(u.getMostSignificantBits)
      .putLong(u.getLeastSignificantBits).array()
    assert(PgBinary.text(2950, bytes) == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
  }

  /** numeric_send layout: ndigits, weight, sign, dscale, base-10000
    * digit groups. */
  private def numeric(weight: Int, sign: Int, dscale: Int,
      digits: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 2 * digits.length)
    b.putShort(digits.length.toShort).putShort(weight.toShort)
      .putShort(sign.toShort).putShort(dscale.toShort)
    digits.foreach(d => b.putShort(d.toShort))
    b.array()
  }

  test("numeric: digits, scale, sign, specials") {
    assert(PgBinary.text(1700, numeric(0, 0, 0)) == "0")
    assert(PgBinary.text(1700, numeric(0, 0, 2)) == "0.00")
    assert(PgBinary.text(1700, numeric(0, 0, 4, 1234, 5678)) == "1234.5678")
    assert(PgBinary.text(1700, numeric(0, 0x4000, 4, 1234, 5678)) == "-1234.5678")
    // trailing zero groups stripped on send: 5.00 is nd=1
    assert(PgBinary.text(1700, numeric(0, 0, 2, 5)) == "5.00")
    // leading stripped: 1e8 is digit 1 at weight 2
    assert(PgBinary.text(1700, numeric(2, 0, 0, 1)) == "100000000")
    // small fraction: -0.001 is digit 10 at weight -1, dscale 3
    assert(PgBinary.text(1700, numeric(-1, 0x4000, 3, 10)) == "-0.001")
    // deep fraction with a zero leading group: 0.00000001 = digit 1 @ w=-2
    assert(PgBinary.text(1700, numeric(-2, 0, 8, 1)) == "0.00000001")
    assert(PgBinary.text(1700, numeric(0, 0xC000, 0)) == "NaN")
    assert(PgBinary.text(1700, numeric(0, 0xD000, 0)) == "Infinity")
    assert(PgBinary.text(1700, numeric(0, 0xF000, 0)) == "-Infinity")
    intercept[IllegalArgumentException](
      PgBinary.text(1700, numeric(0, 0x1234, 0)))
    // truncated digit payload rejects, never reads past the buffer
    intercept[IllegalArgumentException](
      PgBinary.text(1700, numeric(0, 0, 0, 1, 2).dropRight(2)))
  }

  /** array_send layout: ndim, has-nulls, element oid, {len, lbound}
    * per dim, then per element Int32 length (-1 NULL) + data. */
  private def arrayBytes(elemOid: Int,
      elems: Seq[Option[Array[Byte]]]): Array[Byte] = {
    val payload = elems.map {
      case None => be32(-1)
      case Some(a) => be32(a.length) ++ a
    }.fold(Array.emptyByteArray)(_ ++ _)
    be32(1) ++ be32(if (elems.contains(None)) 1 else 0) ++
      be32(elemOid) ++ be32(elems.size) ++ be32(1) ++ payload
  }

  test("1-D binary arrays render as PG array literals with array_out " +
      "quoting; the text-side tokenizer decodes them back") {
    // int4[] with a NULL
    val ints = arrayBytes(23, Seq(Some(be32(1)), None, Some(be32(-7))))
    assert(PgBinary.text(1007, ints) == "{1,NULL,-7}")
    // text[] exercising every quoting rule: empty, NULL-spelling,
    // comma, quote, backslash, whitespace, plain unicode unquoted
    def t(s: String) = Some(s.getBytes(StandardCharsets.UTF_8))
    val texts = arrayBytes(25, Seq(t(""), t("null"), t("a,b"),
      t("say \"hi\""), t("""back\slash"""), t("two words"), t("plainé")))
    val lit = PgBinary.text(1009, texts)
    assert(lit == """{"","null","a,b","say \"hi\"","back\\slash","two words",plainé}""")
    assert(PgText.parseArray(lit) == Vector(Some(""), Some("null"),
      Some("a,b"), Some("say \"hi\""), Some("""back\slash"""),
      Some("two words"), Some("plainé")))
    // empty array (ndim=0 — array_send emits no dims)
    assert(PgBinary.text(1007,
      be32(0) ++ be32(0) ++ be32(23)) == "{}")
    // date[] converts elements through the scalar path
    assert(PgBinary.text(1182,
      arrayBytes(1082, Seq(Some(be32(0))))) == "{2000-01-01}")
    // name-keyed entry point covers the underscore registry names
    assert(PgBinary.textByName("_int4", ints) == "{1,NULL,-7}")
    assert(PgBinary.copySupported("_numeric") &&
      !PgBinary.copySupported("point"))
    // multidimensional rejects (same 1-D stance as the text parser)
    intercept[IllegalArgumentException] {
      PgBinary.text(1007, be32(2) ++ be32(0) ++ be32(23) ++
        be32(1) ++ be32(1) ++ be32(1) ++ be32(1) ++ be32(4) ++ be32(9))
    }
  }

  test("array property: arbitrary unicode text[] elements round-trip " +
      "through the literal rendering and the text-side tokenizer") {
    val genElem: Gen[Option[String]] = Gen.frequency(
      1 -> Gen.const(None),
      2 -> Gen.const(Some("")),
      2 -> Gen.const(Some("NULL")),
      8 -> Gen.listOf(Gen.frequency(
        6 -> Gen.alphaNumChar,
        3 -> Gen.oneOf('{', '}', ',', '"', '\\', ' ', '\t', 'é', '世'),
        1 -> Gen.const('\n'))).map(cs => Some(cs.mkString)))
    checkProp(Prop.forAll(Gen.listOf(genElem)) { elems =>
      val bytes = arrayBytes(25, elems.map(_.map(
        _.getBytes(StandardCharsets.UTF_8))))
      val lit = PgBinary.text(1009, bytes)
      PgText.parseArray(lit).toList == elems
    })
  }

  test("numeric property: rendered text equals BigDecimal rendering") {
    val gen = for {
      unscaled <- Gen.choose(-999999999999999L, 999999999999999L)
      scale <- Gen.choose(0, 8)
    } yield new java.math.BigDecimal(java.math.BigInteger.valueOf(unscaled), scale)
    checkProp(Prop.forAll(gen) { bd =>
      PgBinary.text(1700, encodeNumeric(bd)) == bd.toPlainString
    })
  }

  /** Test-side numeric encoder (the inverse of numeric_send): scale the
    * value to whole base-10000 groups aligned on the decimal point. */
  private def encodeNumeric(bd: java.math.BigDecimal): Array[Byte] = {
    val sign = if (bd.signum < 0) 0x4000 else 0
    val dscale = math.max(bd.scale, 0)
    val abs = bd.abs.stripTrailingZeros
    if (abs.unscaledValue.signum == 0) return numeric(0, sign, dscale)
    // pad the fraction to a multiple of 4 digits, the integer likewise
    val plain = abs.toPlainString
    val (intPart, fracPart) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    val fracPadded = fracPart.padTo(((fracPart.length + 3) / 4) * 4, '0')
    val intPadded = "0" * ((4 - intPart.length % 4) % 4) + intPart
    val groups = (intPadded + fracPadded).grouped(4).map(_.toInt).toVector
    val weight = intPadded.length / 4 - 1
    // strip leading/trailing zero groups like numeric_send does
    val lead = groups.indexWhere(_ != 0)
    val tail = groups.lastIndexWhere(_ != 0)
    numeric(weight - lead, sign, dscale, groups.slice(lead, tail + 1): _*)
  }
}
