package graft.surql

import scala.collection.immutable.TreeMap

/** JSON encode/decode for `encoding::json::*` (surrealdb: fnc/encoding.rs,
  * serde_json semantics): compact output, object keys in map order, floats
  * shortest-digits, NONE/NULL → null. */
object Json {

  def encode(v: V): String = {
    val sb = new StringBuilder
    write(sb, v)
    sb.toString
  }

  private def write(sb: StringBuilder, v: V): Unit = v match {
    case VNone | VNull => sb.append("null")
    case VBool(b)      => sb.append(if (b) "true" else "false")
    case VInt(i)       => sb.append(i)
    case VFloat(d)     =>
      if (d.isNaN || d.isInfinity) sb.append("null")
      else sb.append(Render.floatDigits(d))
    case VDec(d)       => sb.append(Render.decStr(d))
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
    case other => writeString(sb, other.renderRaw)
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
      else try VInt(text.toLong) catch { case _: NumberFormatException => VFloat(text.toDouble) }
    }
  }
}
