package graft.surql

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** SurrealQL value rendering — matches the reference's `ToSql`/`fmt_sql`
  * output byte-for-byte (types/src/value fmt_sql impls, escaping rules
  * types/src/utils/escape.rs); the golden corpus compares rendered strings. */
object Render {

  def sql(v: V): String = { val sb = new StringBuilder; write(sb, v); sb.toString }

  private def write(f: StringBuilder, v: V): Unit = v match {
    case VNone        => f.append("NONE")
    case VNull        => f.append("NULL")
    case VBool(b)     => f.append(if (b) "true" else "false")
    case VInt(i)      => f.append(i.toString)
    case VFloat(d)    => writeFloat(f, d)
    case VDec(d)      => f.append(decStr(d)).append("dec")
    case VStr(s)      => quoteStr(f, s)
    case VDur(s, n)   => writeDuration(f, s, n)
    case VDt(t)       =>
      f.append("d'").append(rfc3339(t)).append('\'')
    case VUuid(u)     => f.append("u'").append(u.toString).append('\'')
    case VArr(items)  =>
      f.append('[')
      var first = true
      items.foreach { it => if (!first) f.append(", "); first = false; write(f, it) }
      f.append(']')
    case VSet(items)  =>
      // Python-style set literal: {,} / {v,} / {a, b} (set.rs fmt_sql)
      if (items.isEmpty) f.append("{,}")
      else if (items.length == 1) { f.append('{'); write(f, items.head); f.append(",}") }
      else {
        f.append('{')
        var first = true
        items.foreach { it => if (!first) f.append(", "); first = false; write(f, it) }
        f.append('}')
      }
    case VObj(fields) =>
      if (fields.isEmpty) f.append("{  }")
      else {
        f.append("{ ")
        var first = true
        fields.foreach { case (k, fv) =>
          if (!first) f.append(", "); first = false
          escapeObjectKey(f, k); f.append(": "); write(f, fv)
        }
        f.append(" }")
      }
    case VBytes(bs)   =>
      f.append("b\"")
      bs.foreach(b => f.append(f"${b & 0xff}%02X"))
      f.append('"')
    case VTable(name) => escapeIdent(f, name)
    case VRid(tb, key) =>
      escapeIdent(f, tb); f.append(':'); writeRidKey(f, key)
    case VFile(b, k)  => f.append("f\"").append(b).append(":/").append(k).append('"')
    case VRng(lo, hi) =>
      lo.foreach { case (bv, incl) => write(f, bv); if (!incl) f.append('>') }
      f.append("..")
      hi.foreach { case (bv, incl) => if (incl) f.append('='); write(f, bv) }
    case VRegex(p)    => f.append('/').append(p).append('/')
    case c: VClosure  =>
      // closures render canonically: |$a: any| {  } (expr/closure.rs fmt)
      f.append('|')
      f.append(c.params.map { case (n, k) =>
        "$" + n + ": " + k.map(Explain.kindSql).getOrElse("any")
      }.mkString(", "))
      f.append("| ")
      f.append(c.body match {
        case ast.BlockExpr(Seq()) => "{  }"
        case b => try Explain.exprSql(b) catch { case _: Exception => "{  }" }
      })
    case VGeom("Point", VArr(Vector(x, y))) =>
      // points display as a coordinate tuple of bare f64s (Rust Display —
      // no `f` suffix, integral values show as integers): (0, 0)
      def coord(v: V): Unit = v match {
        case n: VNum => f.append(floatDigits(n.toDouble))
        case other   => write(f, other)
      }
      f.append('('); coord(x); f.append(", "); coord(y); f.append(')')
    case VGeom(kind, coords) =>
      // other geometries: GeoJSON-shaped rendering, `type` first
      val key = if (kind == "GeometryCollection") "geometries" else "coordinates"
      f.append("{ type: '").append(kind).append("', ").append(key).append(": ")
      write(f, coords)
      f.append(" }")
  }

  private def toF(v: V): V = v match {
    case VInt(i) => VFloat(i.toDouble)
    case VDec(d) => VFloat(d.toDouble)
    case other   => other
  }

  private def writeRidKey(f: StringBuilder, key: V): Unit = key match {
    case VStr(s)  => escapeRecordKey(f, s)
    case other    => write(f, other)
  }

  /** Float display: Rust `f64::to_string()` + 'f' — shortest round-trip
    * digits, ALWAYS positional (never scientific). We take Java's shortest
    * digits and re-expand the exponent positionally. */
  def writeFloat(f: StringBuilder, d: Double): Unit = {
    if (d.isNaN) { f.append("NaN"); return }
    if (d == Double.PositiveInfinity) { f.append("Infinity"); return }
    if (d == Double.NegativeInfinity) { f.append("-Infinity"); return }
    f.append(floatDigits(d)).append('f')
  }

  def floatDigits(d: Double): String = {
    val s = java.lang.Double.toString(d) // shortest-ish, may be sci notation
    val plain = if (s.contains('E') || s.contains('e'))
      new java.math.BigDecimal(s).toPlainString
    else s
    // Rust prints integral floats without ".0"
    if (plain.contains('.')) {
      val trimmed = plain.reverse.dropWhile(_ == '0').reverse
      if (trimmed.endsWith(".")) trimmed.dropRight(1) else trimmed
    } else plain
  }

  def decStr(d: BigDecimal): String = {
    val stripped = d.underlying.stripTrailingZeros
    // avoid 1E+2 form
    stripped.toPlainString
  }

  private val Rfc3339Sec = DateTimeFormatter.ofPattern("uuuu-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  /** chrono `to_rfc3339_opts(SecondsFormat::AutoSi, true)`: subseconds in
    * groups of 3 digits, only as many groups as needed, 'Z' suffix. */
  def rfc3339(t: java.time.Instant): String = {
    val base = Rfc3339Sec.format(t)
    val n = t.getNano
    val frac =
      if (n == 0) ""
      else if (n % 1000000 == 0) f".${n / 1000000}%03d"
      else if (n % 1000 == 0) f".${n / 1000}%06d"
      else f".$n%09d"
    base + frac + "Z"
  }

  def quoteStr(f: StringBuilder, s: String): Unit = {
    val quote = if (s.contains('\'')) '"' else '\''
    f.append(quote)
    escapeInto(f, s, quote)
    f.append(quote)
  }

  private def escapeInto(f: StringBuilder, s: String, escapeChar: Char,
      escapeNewline: Boolean = false): Unit =
    s.foreach {
      case '\u0000' => f.append("\\0")
      case '\r'     => f.append("\\r")
      case '\t'     => f.append("\\t")
      // pretty SqlFormat preserves newlines in STRINGS (escape.rs:57) but
      // object KEYS and idents escape them (escape_sequences goldens)
      case '\n'     => f.append(if (escapeNewline) "\\n" else "\n")
      case '\u0008' => f.append("\\u{8}")
      case '\u000C' => f.append("\\f")
      case '\\'     => f.append("\\\\")
      case c if c == escapeChar => f.append('\\').append(c)
      case c        => f.append(c)
    }

  private def isPlainIdent(s: String): Boolean =
    s.nonEmpty && !s.head.isDigit && s.forall(c => c.isLetterOrDigit && c < 128 || c == '_')

  /** EscapeSqonIdent: backticks unless plain. */
  def escapeIdent(f: StringBuilder, s: String): Unit =
    if (isPlainIdent(s)) f.append(s)
    else { f.append('`'); escapeInto(f, s, '`', escapeNewline = true); f.append('`') }

  /** EscapeObjectKey: double quotes unless plain. */
  def escapeObjectKey(f: StringBuilder, s: String): Unit =
    if (isPlainIdent(s)) f.append(s)
    else { f.append('"'); escapeInto(f, s, '"', escapeNewline = true); f.append('"') }

  /** EscapeRecordKey: backticks if empty, non-word chars, or all-digits. */
  def escapeRecordKey(f: StringBuilder, s: String): Unit = {
    val needsEscape = s.isEmpty ||
      s.exists(c => !(c.isLetterOrDigit && c < 128 || c == '_')) ||
      s.forall(c => c.isDigit || c == '_')
    if (needsEscape) { f.append('`'); escapeInto(f, s, '`'); f.append('`') }
    else f.append(s)
  }

  // Duration display constants (reference duration.rs: year = 365 days)
  private val SecsPerYear = 365L * 86400
  private val SecsPerWeek = 7L * 86400

  def writeDuration(f: StringBuilder, secsIn: Long, nanosIn: Int): Unit = {
    if (secsIn == 0 && nanosIn == 0) { f.append("0ns"); return }
    // secs is u64 (unsigned) — decompose via BigInt
    var secs = BigInt(java.lang.Long.toUnsignedString(secsIn))
    val year = secs / SecsPerYear; secs %= SecsPerYear
    val week = secs / SecsPerWeek; secs %= SecsPerWeek
    val days = secs / 86400; secs %= 86400
    val hour = secs / 3600; secs %= 3600
    val mins = secs / 60; secs %= 60
    var nano = nanosIn
    val msec = nano / 1000000; nano %= 1000000
    val usec = nano / 1000; nano %= 1000
    if (year > 0) f.append(year).append('y')
    if (week > 0) f.append(week).append('w')
    if (days > 0) f.append(days).append('d')
    if (hour > 0) f.append(hour).append('h')
    if (mins > 0) f.append(mins).append('m')
    if (secs > 0) f.append(secs).append('s')
    if (msec > 0) f.append(msec).append("ms")
    if (usec > 0) f.append(usec).append("µs")
    if (nano > 0) f.append(nano).append("ns")
  }
}
