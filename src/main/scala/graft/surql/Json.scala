package graft.surql

import scala.collection.immutable.TreeMap

/** JSON encode/decode for `encoding::json::*` (surrealdb: fnc/encoding.rs
  * json module → rpc/format/json.rs encode_str → types/src/value/
  * into_json.rs + serde_json): compact output, object keys in BTreeMap
  * (sorted) order, floats in serde_json's ryu "pretty" form (`2.0`,
  * `1e16`), DECIMALS AS QUOTED STRINGS, geometries as GeoJSON objects,
  * bytes as number arrays, NaN/±inf and NONE/NULL → null. */
object Json {

  def encode(v: V): String = {
    val sb = new StringBuilder
    write(sb, v)
    sb.toString
  }

  /** serde_json's float rendering (the ryu crate's pretty format):
    * shortest digits, positional iff the scientific exponent k is in
    * [-6, 15] — `0.000001` but `1e-7`, `1000000000000000.0` but `1e16` —
    * positional integral floats keep `.0`, scientific mantissas drop it. */
  def ryuFloat(d: Double): String = {
    if (d == 0.0)
      return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val s = java.lang.Double.toString(Math.abs(d))
    val (mant, exp) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i  => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val dot = mant.indexOf('.')
    val rawDigits = mant.substring(0, dot) + mant.substring(dot + 1)
    var lead = 0
    while (lead < rawDigits.length - 1 && rawDigits.charAt(lead) == '0') lead += 1
    var digits = rawDigits.substring(lead)
    var k = dot - 1 - lead + exp // value = digits[0].digits[1..] × 10^k
    val trimmed = digits.reverse.dropWhile(_ == '0').reverse
    digits = if (trimmed.isEmpty) "0" else trimmed
    val sb = new StringBuilder(if (neg) "-" else "")
    if (k >= -6 && k <= 15) {
      val kk = k + 1 // digits before the decimal point
      if (kk <= 0) {
        sb.append("0.")
        (0 until -kk).foreach(_ => sb.append('0'))
        sb.append(digits)
      } else if (kk >= digits.length) {
        sb.append(digits)
        (digits.length until kk).foreach(_ => sb.append('0'))
        sb.append(".0")
      } else {
        sb.append(digits.substring(0, kk)).append('.').append(digits.substring(kk))
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e').append(k)
    }
    sb.toString
  }

  private def write(sb: StringBuilder, v: V): Unit = v match {
    case VNone | VNull => sb.append("null")
    case VBool(b)      => sb.append(if (b) "true" else "false")
    case VInt(i)       => sb.append(i)
    case VFloat(d)     =>
      // JsonNumber::from_f64 is None for NaN/±inf → null (into_json.rs:29)
      if (d.isNaN || d.isInfinity) sb.append("null")
      else sb.append(ryuFloat(d))
    // Decimal serializes as a STRING (into_json.rs:35 decimal.to_string →
    // JsonValue::String), keeping arbitrary precision JSON-safe
    case VDec(d)       => writeString(sb, Render.decStr(d))
    case VStr(s)       => writeString(sb, s)
    case VArr(items)   =>
      sb.append('[')
      var first = true
      items.foreach { it => if (!first) sb.append(','); first = false; write(sb, it) }
      sb.append(']')
    case VSet(items)   => write(sb, VArr(items))
    case VObj(fields)  =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(','); first = false
        writeString(sb, k); sb.append(':'); write(sb, fv)
      }
      sb.append('}')
    // geometries are GeoJSON OBJECTS (into_json.rs geometry_into_json_value;
    // key order is serde_json's default BTreeMap = alphabetical, which the
    // sorted-TreeMap object writer reproduces); coordinates are f64s
    case VGeom(kind, coords) =>
      val key = if (kind == "GeometryCollection") "geometries" else "coordinates"
      write(sb, V.obj(key -> floatify(coords), "type" -> VStr(kind)))
    // bytes serialize as an ARRAY of numbers (into_json.rs:63)
    case VBytes(bs)    =>
      sb.append('[')
      var first = true
      bs.foreach { b => if (!first) sb.append(','); first = false; sb.append(b & 0xff) }
      sb.append(']')
    // table name is the RAW string (Table::to_string), not the escaped ident
    case VTable(name)  => writeString(sb, name)
    case other => writeString(sb, other.renderRaw)
  }

  /** Geometry coordinates are f64 in GeoJSON — ints inside stored
    * coordinate arrays render as floats (`1.0`). */
  private def floatify(v: V): V = v match {
    case VInt(i)     => VFloat(i.toDouble)
    case VDec(d)     => VFloat(d.toDouble)
    case VArr(items) => VArr(items.map(floatify))
    case g: VGeom    =>
      // GeometryCollection members are full GeoJSON objects themselves
      g
    case other       => other
  }

  private def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def decode(s: String): V = {
    val p = new JsonParser(s)
    p.ws()
    val v = p.value()
    p.ws()
    if (!p.eof) throw SqlError("Failed to decode JSON: trailing characters")
    v
  }

  private final class JsonParser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = if (eof) '\u0000' else s.charAt(pos)
    def ws(): Unit = while (!eof && Character.isWhitespace(peek)) pos += 1
    def fail(): Nothing = throw SqlError(s"Failed to decode JSON at position $pos")

    def value(): V = {
      ws()
      peek match {
        case '{' =>
          pos += 1
          var fields = TreeMap.empty[String, V]
          ws()
          if (peek == '}') { pos += 1; return VObj(fields) }
          var go = true
          while (go) {
            ws()
            if (peek != '"') fail()
            val k = string()
            ws()
            if (peek != ':') fail()
            pos += 1
            fields = fields.updated(k, value())
            ws()
            if (peek == ',') pos += 1 else go = false
          }
          if (peek != '}') fail()
          pos += 1
          VObj(fields)
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[V]
          ws()
          if (peek == ']') { pos += 1; return VArr(items.result()) }
          var go = true
          while (go) {
            items += value()
            ws()
            if (peek == ',') pos += 1 else go = false
          }
          if (peek != ']') fail()
          pos += 1
          VArr(items.result())
        case '"' => VStr(string())
        case 't' => expect("true"); VBool(true)
        case 'f' => expect("false"); VBool(false)
        case 'n' => expect("null"); VNull
        case c if c == '-' || c.isDigit => number()
        case _ => fail()
      }
    }

    private def expect(word: String): Unit = {
      if (!s.startsWith(word, pos)) fail()
      pos += word.length
    }

    private def string(): String = {
      pos += 1 // opening quote
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\\') {
          pos += 1
          peek match {
            case 'n' => sb.append('\n'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 'b' => sb.append('\u0008'); pos += 1
            case 'f' => sb.append('\u000C'); pos += 1
            case '/' => sb.append('/'); pos += 1
            case '"' => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case 'u' =>
              pos += 1
              val hex = s.substring(pos, Math.min(s.length, pos + 4))
              sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
              pos += 4
            case _ => fail()
          }
        } else { sb.append(peek); pos += 1 }
      }
      if (eof) fail()
      pos += 1
      sb.toString
    }

    private def number(): V = {
      val start = pos
      if (peek == '-') pos += 1
      while (!eof && peek.isDigit) pos += 1
      var isFloat = false
      if (!eof && peek == '.') { isFloat = true; pos += 1; while (!eof && peek.isDigit) pos += 1 }
      if (!eof && (peek == 'e' || peek == 'E')) {
        isFloat = true; pos += 1
        if (peek == '+' || peek == '-') pos += 1
        while (!eof && peek.isDigit) pos += 1
      }
      val text = s.substring(start, pos)
      if (isFloat) VFloat(text.toDouble)
      else try VInt(text.toLong) catch {
        case _: NumberFormatException =>
          // beyond i64 but within u64 → DECIMAL (json_to_value:41-42
          // `n.as_u64` → PublicNumber::Decimal); beyond u64 → f64
          val big = BigInt(text)
          if (big >= 0 && big <= BigInt("18446744073709551615")) VDec(BigDecimal(big))
          else VFloat(text.toDouble)
      }
    }
  }
}
