package graft.surql

/** chrono-exact strftime over a UTC datetime (reference: fnc/time.rs:77
  * `val.format(&format)` — Datetime derefs to chrono `DateTime<Utc>`, so
  * time::format carries chrono's FULL specifier table, not a subset).
  *
  * The r18 sweep found the previous implementation validated a dozen
  * specifiers (%F %D %T %C %e %k %I %l %p %P %w %u %U %W %G %g %V %v %x
  * %X %r %R %z) and then rendered them LITERALLY ("%F" in the output
  * instead of the date). This formatter renders every chrono specifier,
  * including pad-override flags (%-d %0e %_m), the fractional-seconds
  * family (%f %.f %.3f %3f …), the %z colon variants, and %c/%+ composed
  * forms; an unknown specifier or a trailing '%' raises the reference's
  * InvalidMethodArguments error text, exactly as chrono's StrftimeItems
  * yields an error item that fails the reference's `write!`. */
object Strftime {

  private val shortMonths = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val fullMonths = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val shortDays = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val fullDays = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  private def err(fmt: String): Nothing =
    throw SqlError("Incorrect arguments for method time::format(). " +
      s"`$fmt` is not a valid time formatting string")

  /** flag: 0 = spec default, '-' = no pad, '0' = zero, '_' = space.
    * Zero-padding keeps the sign outside the zeros (chrono: year -43 at
    * %Y is "-0043"); space-padding fills before the signed number. */
  private def pad(v: Long, width: Int, defPad: Char, flag: Char): String = {
    val p = if (flag == 0) defPad else flag
    if (p == '-') return v.toString
    val neg = v < 0
    val digits = math.abs(v).toString
    if (p == '_') {
      val signed = digits.length + (if (neg) 1 else 0)
      if (signed >= width) v.toString else " " * (width - signed) + v.toString
    } else if (digits.length >= width) v.toString
    else (if (neg) "-" else "") + "0" * (width - digits.length) + digits
  }

  def format(t: java.time.ZonedDateTime, fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch != '%') { sb.append(ch); i += 1 }
      else {
        i += 1
        if (i >= fmt.length) err(fmt)
        // one optional pad-override flag (chrono: -, 0, _)
        var flag: Char = 0
        fmt.charAt(i) match {
          case f @ ('-' | '0' | '_') if i + 1 < fmt.length =>
            flag = f; i += 1
          case _ =>
        }
        val c = fmt.charAt(i)
        // fractional-seconds family and %:z variants need lookahead
        c match {
          case '.' =>
            // %.f / %.3f / %.6f / %.9f
            if (i + 1 >= fmt.length) err(fmt)
            fmt.charAt(i + 1) match {
              case 'f' => sb.append(autoFrac(t.getNano)); i += 2
              case d @ ('3' | '6' | '9') if i + 2 < fmt.length &&
                  fmt.charAt(i + 2) == 'f' =>
                sb.append('.').append(fixedFrac(t.getNano, d - '0')); i += 3
              case _ => err(fmt)
            }
          case d @ ('3' | '6' | '9') if i + 1 < fmt.length &&
              fmt.charAt(i + 1) == 'f' && flag == 0 =>
            sb.append(fixedFrac(t.getNano, d - '0')); i += 2
          case ':' =>
            // %:z / %::z / %:::z
            val rest = fmt.substring(i)
            if (rest.startsWith(":::z")) { sb.append("+00"); i += 4 }
            else if (rest.startsWith("::z")) { sb.append("+00:00:00"); i += 3 }
            else if (rest.startsWith(":z")) { sb.append("+00:00"); i += 2 }
            else err(fmt)
          case _ =>
            sb.append(one(t, c, flag, fmt)); i += 1
        }
      }
    }
    sb.toString
  }

  /** %.f: nothing when zero; .3 when a whole ms; .6 when a whole µs;
    * else .9 (chrono SecondsFormat::AutoSi). */
  private def autoFrac(nanos: Int): String =
    if (nanos == 0) ""
    else if (nanos % 1000000 == 0) "." + fixedFrac(nanos, 3)
    else if (nanos % 1000 == 0) "." + fixedFrac(nanos, 6)
    else "." + fixedFrac(nanos, 9)

  private def fixedFrac(nanos: Int, digits: Int): String = {
    val full = f"$nanos%09d"
    full.substring(0, digits)
  }

  private def one(t: java.time.ZonedDateTime, c: Char, flag: Char,
      fmt: String): String = {
    def month = t.getMonthValue
    def dowMon1 = t.getDayOfWeek.getValue // Mon=1..Sun=7
    def hour12 = { val h = t.getHour % 12; if (h == 0) 12 else h }
    c match {
      case 'Y' => pad(t.getYear, 4, '0', flag)
      case 'C' => pad(Math.floorDiv(t.getYear, 100), 2, '0', flag)
      case 'y' => pad(Math.floorMod(t.getYear, 100), 2, '0', flag)
      case 'm' => pad(month, 2, '0', flag)
      case 'b' | 'h' => shortMonths(month - 1)
      case 'B' => fullMonths(month - 1)
      case 'd' => pad(t.getDayOfMonth, 2, '0', flag)
      case 'e' => pad(t.getDayOfMonth, 2, '_', flag)
      case 'a' => shortDays(dowMon1 - 1)
      case 'A' => fullDays(dowMon1 - 1)
      case 'w' => pad(dowMon1 % 7, 1, '0', flag) // Sunday = 0
      case 'u' => pad(dowMon1, 1, '0', flag)     // ISO Monday = 1
      case 'U' => // Sunday-first week number, 00..53 (C strftime formula)
        pad((t.getDayOfYear - 1 + 7 - dowMon1 % 7) / 7, 2, '0', flag)
      case 'W' => // Monday-first week number
        pad((t.getDayOfYear - 1 + 7 - (dowMon1 - 1)) / 7, 2, '0', flag)
      case 'G' => pad(t.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR), 4, '0', flag)
      case 'g' => pad(Math.floorMod(
        t.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR), 100), 2, '0', flag)
      case 'V' => pad(t.get(
        java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR), 2, '0', flag)
      case 'j' => pad(t.getDayOfYear, 3, '0', flag)
      case 'D' | 'x' => format(t, "%m/%d/%y")
      case 'F' => format(t, "%Y-%m-%d")
      case 'v' => format(t, "%e-%b-%Y")
      case 'H' => pad(t.getHour, 2, '0', flag)
      case 'k' => pad(t.getHour, 2, '_', flag)
      case 'I' => pad(hour12, 2, '0', flag)
      case 'l' => pad(hour12, 2, '_', flag)
      case 'P' => if (t.getHour < 12) "am" else "pm"
      case 'p' => if (t.getHour < 12) "AM" else "PM"
      case 'M' => pad(t.getMinute, 2, '0', flag)
      case 'S' => pad(t.getSecond, 2, '0', flag)
      case 'f' => fixedFrac(t.getNano, 9)
      case 'R' => format(t, "%H:%M")
      case 'T' | 'X' => format(t, "%H:%M:%S")
      case 'r' => format(t, "%I:%M:%S %p")
      case 'Z' => "UTC"
      case 'z' => "+0000"
      case 'c' => format(t, "%a %b %e %H:%M:%S %Y")
      case '+' => format(t, "%Y-%m-%dT%H:%M:%S") + autoFrac(t.getNano) + "+00:00"
      case 's' => t.toInstant.getEpochSecond.toString
      case 't' => "\t"
      case 'n' => "\n"
      case '%' => "%"
      case _ => err(fmt)
    }
  }
}
