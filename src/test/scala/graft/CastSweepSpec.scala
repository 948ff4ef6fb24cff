package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.surql._
import graft.surql.ast.Kind
import graft.surql.ast.Kind._

/** r20 cast sweep: `Cast for i64/f64/Decimal/Number/Uuid/Bytes/Array/
  * Set/Range/Regex/Table/File` (convert/cast.rs) arm by arm. The loose
  * arms the sweep removed — bool→int, datetime→int, fractional
  * truncation, Java's whitespace-trimming/suffixed number parsing — and
  * the arms it added — array→range, std-IpAddr-style string grammars,
  * flexible uuid forms, byte truncation, table-from-anything — each get
  * a vector here. */
class CastSweepSpec extends AnyFunSuite {

  private def cast(k: Kind, v: V): V = Coerce.cast(k, v)
  private def fails(k: Kind, v: V): String =
    intercept[SqlError](Coerce.cast(k, v)).msg

  test("int: no bool/datetime arms, no fractional truncation, Rust string grammar") {
    assert(cast(KInt, VFloat(2.0)) == VInt(2))
    assert(fails(KInt, VFloat(2.5)) == "Could not cast into `int` using input `2.5f`")
    assert(fails(KInt, VFloat(Double.NaN)).startsWith("Could not cast into `int`"))
    // Rust `as i64` saturates for integral out-of-range floats
    assert(cast(KInt, VFloat(1e300)) == VInt(Long.MaxValue))
    assert(fails(KInt, VBool(true)) == "Could not cast into `int` using input `true`")
    assert(fails(KInt, VDec(BigDecimal("2.5"))).startsWith("Could not cast into `int`"))
    assert(cast(KInt, VDec(BigDecimal("7"))) == VInt(7))
    assert(cast(KInt, VStr("+42")) == VInt(42))
    assert(fails(KInt, VStr(" 42")).nonEmpty)  // no trim
    assert(fails(KInt, VStr("2.0")).nonEmpty)  // i64 parse only
    assert(fails(KInt, VStr("42f")).nonEmpty)
  }

  test("float: Rust f64 grammar incl. inf/nan, no Java suffixes") {
    assert(cast(KFloat, VStr("2.5")) == VFloat(2.5))
    assert(cast(KFloat, VStr("iNf")) == VFloat(Double.PositiveInfinity))
    assert(cast(KFloat, VStr("-Infinity")) == VFloat(Double.NegativeInfinity))
    assert(cast(KFloat, VStr("nan")).asInstanceOf[VFloat].d.isNaN)
    assert(cast(KFloat, VStr("5.")) == VFloat(5.0))
    assert(cast(KFloat, VStr(".5e1")) == VFloat(5.0))
    assert(fails(KFloat, VStr("2.5f")).nonEmpty)   // Java-ism
    assert(fails(KFloat, VStr("0x1p3")).nonEmpty)  // hex float
    assert(fails(KFloat, VStr(" 2.5")).nonEmpty)   // no trim
    assert(fails(KFloat, VBool(true)).nonEmpty)    // no bool arm
  }

  test("decimal: rust_decimal bounds, underscores, no exponent") {
    assert(cast(KDecimal, VStr("1_000.5")) == VDec(BigDecimal("1000.5")))
    assert(fails(KDecimal, VStr("1e2")).nonEmpty)
    assert(fails(KDecimal, VStr("1.5dec")).nonEmpty)
    // 96-bit mantissa bound ~7.92e28
    assert(fails(KDecimal, VStr("99228162514264337593543950335")).nonEmpty)
    assert(fails(KDecimal, VFloat(1e300)).startsWith("Could not cast into `decimal`"))
    assert(fails(KDecimal, VBool(true)).nonEmpty)
  }

  test("number: Number::from_str is i64-then-f64, no SurrealQL suffixes") {
    assert(cast(KNumber, VStr("42")) == VInt(42))
    assert(cast(KNumber, VStr("2.5")) == VFloat(2.5))
    assert(cast(KNumber, VStr("inf")) == VFloat(Double.PositiveInfinity))
    assert(fails(KNumber, VStr("1.5dec")).nonEmpty)
    assert(fails(KNumber, VStr("2f")).nonEmpty)
    assert(fails(KNumber, VBool(true)).nonEmpty)
  }

  test("uuid: simple, braced, urn forms (uuid crate parse_str)") {
    val canonical = "936da01f-9abd-4d9d-80c7-02af85c822a8"
    val u = VUuid(java.util.UUID.fromString(canonical))
    assert(cast(KUuid, VStr("936DA01F9ABD4D9D80C702AF85C822A8")) == u)
    assert(cast(KUuid, VStr(s"{$canonical}")) == u)
    assert(cast(KUuid, VStr(s"urn:uuid:$canonical")) == u)
    assert(fails(KUuid, VStr("not-a-uuid")).nonEmpty)
  }

  test("bytes: array elements cast-to-i64 then truncate as u8") {
    assert(cast(KBytes, VArr(Vector(VInt(321), VInt(-1), VStr("65"), VFloat(66.0)))) ==
      VBytes(Vector(65.toByte, 255.toByte, 65.toByte, 66.toByte)))
    assert(fails(KBytes, VArr(Vector(VStr("x")))).nonEmpty)
  }

  test("range: two-element array casts to beg..end") {
    assert(cast(KRange, VArr(Vector(VInt(1), VInt(5)))) ==
      VRng(Some((VInt(1), true)), Some((VInt(5), false))))
    assert(cast(KRange, VArr(Vector(VStr("a"), VStr("b")))) ==
      VRng(Some((VStr("a"), true)), Some((VStr("b"), false))))
    assert(fails(KRange, VArr(Vector(VInt(1)))).nonEmpty)
  }

  test("array from range: GENERATION_ALLOCATION_LIMIT with the reference text") {
    assert(cast(KArray(Some(KInt), None), VRng(Some((VInt(1), true)), Some((VInt(3), true)))) ==
      VArr(Vector(VInt(1), VInt(2), VInt(3))))
    val e = fails(KArray(None, None),
      VRng(Some((VInt(0), true)), Some((VInt(2000000), false))))
    assert(e == "Casting range `0..2000000` to an array would create " +
      "an array larger then the max allocation limit.")
  }

  test("element failures tag the enclosing kind (with_element_of)") {
    val e = fails(KArray(Some(KInt), None), VArr(Vector(VInt(1), VStr("x"))))
    assert(e.endsWith("when coercing an element of `array<int>`"), e)
    val s = fails(KSet(Some(KInt), None), VArr(Vector(VStr("x"))))
    assert(s.endsWith("when coercing an element of `set<int>`"), s)
  }

  test("either dispatch skips the string arm for NONE/NULL (can_cast)") {
    assert(cast(KString, VNone) == VStr("NONE"))
    assert(fails(KEither(Seq(KString, KInt)), VNone).nonEmpty)
    assert(cast(KEither(Seq(KString, KInt)), VInt(3)) == VStr("3"))
  }

  test("duration strings are literals only; regex validates at cast time") {
    assert(cast(KDuration, VStr("1h30m")) == Coerce.cast(KDuration, VStr("1h30m")))
    assert(fails(KDuration, VStr("1h + 30m")).nonEmpty)
    assert(fails(KDuration, VStr(" 1h")).nonEmpty)
    assert(fails(KRegex, VStr("[")).nonEmpty)
    assert(cast(KRegex, VStr("a+")) == VRegex("a+"))
  }

  test("table casts anything stringly; file passes files through") {
    assert(cast(KTable(Nil), VInt(123)) == VTable("123"))
    assert(cast(KTable(Nil), VFloat(2.5)) == VTable("2.5f"))
    assert(cast(KFile, VFile("b", "k")) == VFile("b", "k"))
    assert(fails(KFile, VStr("x")).nonEmpty)
  }
}
