package graft.functions

/** RFC 3492 Punycode, implemented from the published algorithm (the
  * pseudocode in RFC 3492 §6). Used by [[StrCheck.isDomain]] to validate
  * IDN labels the way the reference's `addr::parse_domain_name` does
  * (surrealdb core/src/fnc/string.rs:449): `xn--` labels must decode, and
  * Unicode labels must encode within the 63-octet label budget.
  *
  * Overflow handling follows the RFC: all arithmetic is on Int with the
  * prescribed maxint guards, so crafted digit strings (e.g. "xn--99999999")
  * are rejected rather than wrapping.
  */
object Punycode {
  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128
  private final val MaxInt = Int.MaxValue

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitValue(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Decode the part AFTER the "xn--" prefix. None on any malformation
    * (bad digit, overflow, basic code point in the extended section). */
  def decode(input: String): Option[String] = {
    val out = new java.lang.StringBuilder
    val lastDelim = input.lastIndexOf('-')
    var pos = 0
    if (lastDelim > 0) {
      var j = 0
      while (j < lastDelim) {
        val c = input.charAt(j)
        if (c >= 128) return None
        out.append(c)
        j += 1
      }
      pos = lastDelim + 1
    } else if (lastDelim == 0) {
      // "-abc": empty basic section with an explicit delimiter
      pos = 1
    }
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length) return None
        val digit = digitValue(input.charAt(pos)); pos += 1
        if (digit < 0) return None
        if (digit > (MaxInt - i) / w) return None
        i += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          if (w > MaxInt / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      val outLen = out.codePointCount(0, out.length) + 1
      bias = adapt(i - oldi, outLen, oldi == 0)
      if (i / outLen > MaxInt - n) return None
      n += i / outLen
      i %= outLen
      if (n < InitialN || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF)) return None
      // insert code point n at (code point) position i
      val insertAt = out.offsetByCodePoints(0, i)
      out.insert(insertAt, Character.toChars(n))
      i += 1
    }
    Some(out.toString)
  }

  /** Encode a Unicode string to its Punycode form (without the "xn--"
    * prefix). None on overflow or unpaired surrogates. */
  def encode(input: String): Option[String] = {
    val cps: Array[Int] = {
      val b = Array.newBuilder[Int]
      var j = 0
      while (j < input.length) {
        val cp = input.codePointAt(j)
        if (cp >= 0xD800 && cp <= 0xDFFF) return None // unpaired surrogate
        b += cp
        j += Character.charCount(cp)
      }
      b.result()
    }
    val out = new java.lang.StringBuilder
    cps.foreach(cp => if (cp < 128) out.append(cp.toChar))
    val basicLen = out.length
    if (basicLen > 0 && basicLen < cps.length) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = basicLen
    while (handled < cps.length) {
      var m = MaxInt
      cps.foreach(cp => if (cp >= n && cp < m) m = cp)
      if (m - n > (MaxInt - delta) / (handled + 1)) return None
      delta += (m - n) * (handled + 1)
      n = m
      var idx = 0
      while (idx < cps.length) {
        val cp = cps(idx)
        if (cp < n) {
          delta += 1
          if (delta == 0) return None // overflow wrapped
        }
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              val d = t + (q - t) % (Base - t)
              out.append(digitChar(d))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, handled + 1, handled == basicLen)
          delta = 0
          handled += 1
        }
        idx += 1
      }
      delta += 1
      n += 1
    }
    Some(out.toString)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar
}
