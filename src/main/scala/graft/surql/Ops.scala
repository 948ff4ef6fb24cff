package graft.surql

/** Value-level operator semantics — ports the behavioral contract of
  * surrealdb: core/src/fnc/operate.rs and core/src/val/number.rs:
  *
  *  - Int⊕Int stays Int with CHECKED arithmetic (overflow / ÷0 → error
  *    "Cannot perform <op> with '<a>' and '<b>'")
  *  - Int/Float mixes → Float (IEEE, unchecked); Decimal mixes → Decimal
  *  - `/` converts arithmetic failures to NaN (operate.rs `div`)
  *  - string + string concatenates; datetime ± duration; array + array
  *  - `=` loose equality, `==` exact; comparisons use the total order */
object Ops {

  private def err(op: String, a: V, b: V): Nothing =
    throw SqlError(s"Cannot perform $op with '${a.renderRaw}' and '${b.renderRaw}'")

  // ---- numeric helpers -------------------------------------------------

  private def intOp(op: String, a: Long, b: Long)(f: (Long, Long) => Long): VNum =
    try VInt(f(a, b))
    catch { case _: ArithmeticException => throw SqlError(s"Cannot perform $op with '$a' and '$b'") }

  private def decOp(op: String, a: BigDecimal, b: BigDecimal, av: V, bv: V)(
      f: (BigDecimal, BigDecimal) => BigDecimal): VNum =
    try VDec(f(a, b))
    catch { case _: ArithmeticException => err(op, av, bv) }

  private val DecCtx = new java.math.MathContext(28) // rust_decimal ~28-29 digits

  def numBinary(op: String, a: VNum, b: VNum): VNum = (a, b) match {
    case (VInt(x), VInt(y)) => op match {
      case "addition"       => intOp(op, x, y)(Math.addExact)
      case "subtraction"    => intOp(op, x, y)(Math.subtractExact)
      case "multiplication" => intOp(op, x, y)(Math.multiplyExact)
      case "division"       =>
        if (y == 0) throw SqlError(s"Cannot perform division with '$x' and '$y'")
        else intOp(op, x, y)((m, n) => if (m == Long.MinValue && n == -1) throw new ArithmeticException else m / n)
      case "remainder"      =>
        if (y == 0) throw SqlError(s"Cannot perform remainder with '$x' and '$y'")
        else intOp(op, x, y)((m, n) => if (m == Long.MinValue && n == -1) throw new ArithmeticException else m % n)
    }
    case (VFloat(x), VFloat(y)) => VFloat(floatOp(op, x, y))
    case (VInt(x), VFloat(y))   => VFloat(floatOp(op, x.toDouble, y))
    case (VFloat(x), VInt(y))   => VFloat(floatOp(op, x, y.toDouble))
    case (x, y) => // at least one decimal → decimal arithmetic
      val (dx, dy) = (x.toBig, y.toBig)
      op match {
        case "addition"       => decOp(op, dx, dy, x, y)(_ + _)
        case "subtraction"    => decOp(op, dx, dy, x, y)(_ - _)
        case "multiplication" => decOp(op, dx, dy, x, y)(_ * _)
        case "division"       =>
          if (dy.signum == 0) err(op, x, y)
          else decOp(op, dx, dy, x, y)((m, n) => m(DecCtx) / n)
        case "remainder"      =>
          if (dy.signum == 0) err(op, x, y) else decOp(op, dx, dy, x, y)(_ % _)
      }
  }

  private def floatOp(op: String, x: Double, y: Double): Double = op match {
    case "addition"       => x + y
    case "subtraction"    => x - y
    case "multiplication" => x * y
    case "division"       => x / y
    case "remainder"      => x % y
  }

  def numPow(a: VNum, p: VNum): VNum = (a, p) match {
    case (VInt(v), VInt(e)) =>
      def fail() = throw SqlError(s"Cannot raise the value '$v' with '$e'")
      v match {
        case 0L => if (e < 0) fail() else if (e == 0) VInt(1) else VInt(0)
        case 1L => VInt(1)
        case -1L => VInt(if (e % 2 == 0) 1 else -1)
        case _ =>
          if (e < 0 || e > Int.MaxValue) fail()
          var result = 1L; var base = v; var exp = e
          try {
            while (exp > 0) {
              if ((exp & 1) == 1) result = Math.multiplyExact(result, base)
              exp >>= 1
              if (exp > 0) base = Math.multiplyExact(base, base)
            }
            VInt(result)
          } catch { case _: ArithmeticException => fail() }
      }
    case (VDec(v), VInt(e)) =>
      try VDec(v.pow(e.toInt))
      catch { case _: Exception => throw SqlError(s"Cannot raise the value '$v' with '$e'") }
    case (x, y) => VFloat(Math.pow(x.toDouble, y.toDouble))
  }

  // ---- value-level binary ops -----------------------------------------

  def add(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum)   => numBinary("addition", x, y)
    case (VStr(x), VStr(y))   => VStr(x + y)
    case (VDt(t), d: VDur)    => VDt(plusDur(t, d, neg = false, a, b))
    case (d: VDur, VDt(t))    => VDt(plusDur(t, d, neg = false, a, b))
    case (x: VDur, y: VDur)   =>
      val total = x.totalNanos + y.totalNanos
      durFromNanosOr(total, s"""Failed to compute: "${a.renderRaw} + ${b.renderRaw}", as the operation results in an arithmetic overflow.""")
    case (VArr(x), VArr(y))   => VArr(x ++ y)
    case (VArr(x), VSet(y))   => VArr(x ++ y)
    case (VSet(x), VSet(y))   => V.set(x ++ y)
    case (VSet(x), VArr(y))   => V.set(x ++ y)
    case (VObj(x), VObj(y))   => VObj(x ++ y)
    case _ => err("addition", a, b)
  }

  def sub(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum)   => numBinary("subtraction", x, y)
    case (VDt(t), d: VDur)    => VDt(plusDur(t, d, neg = true, a, b))
    case (VDt(x), VDt(y))     =>
      val nanos = BigInt(x.getEpochSecond - y.getEpochSecond) * 1000000000L + (x.getNano - y.getNano)
      durFromNanos(nanos, "subtraction", a, b)
    case (x: VDur, y: VDur)   =>
      val total = x.totalNanos - y.totalNanos
      if (total < 0)
        throw SqlError(s"""Failed to compute: "${a.renderRaw} - ${b.renderRaw}", as the operation results in a negative value.""")
      durFromNanosOr(total, s"""Failed to compute: "${a.renderRaw} - ${b.renderRaw}", as the operation results in an arithmetic overflow.""")
    case (VArr(x), VArr(y))   => VArr(x.filterNot(e => y.exists(V.looseEq(_, e))))
    case (VArr(x), VSet(y))   => VArr(x.filterNot(e => y.exists(V.looseEq(_, e))))
    case (VSet(x), VArr(y))   => V.set(x.filterNot(e => y.exists(V.looseEq(_, e))))
    case (VSet(x), VSet(y))   => V.set(x.filterNot(e => y.exists(V.looseEq(_, e))))
    case _ => err("subtraction", a, b)
  }

  /** chrono `DateTime<Utc>` bounds (reference val/datetime.rs
    * MIN_UTC/MAX_UTC): results outside them overflow. */
  private val DtMaxUtc = java.time.Instant.parse("+262142-12-31T23:59:59.999999999Z")
  private val DtMinUtc = java.time.Instant.parse("-262143-01-01T00:00:00Z")

  private def plusDur(t: java.time.Instant, d: VDur, neg: Boolean, a: V, b: V): java.time.Instant = {
    // the reference routes dt±dur through Duration's TryAdd/TrySub
    // (val/mod.rs:610,643), so the overflow error renders the DURATION
    // first; chrono::Duration::from_std rejects durations past i64 range
    // and checked_add_signed rejects results past the DateTime bounds —
    // both raise ArithmeticOverflow (r17 sweep: the interp used to accept
    // any java.time.Instant, i.e. ±1e9 years)
    val (dv, tv) = if (a.isInstanceOf[VDur]) (a, b) else (b, a)
    def overflow(): Nothing =
      throw SqlError(s"""Failed to compute: "${dv.renderRaw} ${if (neg) "-" else "+"} ${tv.renderRaw}", as the operation results in an arithmetic overflow.""")
    if (d.secs < 0) overflow() // u64 seconds beyond Long range
    val r =
      try {
        if (neg) t.minusSeconds(d.secs).minusNanos(d.nanos.toLong)
        else t.plusSeconds(d.secs).plusNanos(d.nanos.toLong)
      } catch { case _: Exception => overflow() }
    if (r.isAfter(DtMaxUtc) || r.isBefore(DtMinUtc)) overflow()
    r
  }

  private val MaxDurNanos = (BigInt(2).pow(64) - 1) * 1000000000L + 999999999L

  def durFromNanos(nanos: BigInt, op: String, a: V, b: V): VDur = {
    if (nanos < 0 || nanos > MaxDurNanos) err(op, a, b)
    VDur((nanos / 1000000000L).toLong, (nanos % 1000000000L).toInt)
  }

  def durFromNanosOr(nanos: BigInt, msg: String): VDur = {
    if (nanos < 0 || nanos > MaxDurNanos) throw SqlError(msg)
    VDur((nanos / 1000000000L).toLong, (nanos % 1000000000L).toInt)
  }

  def mul(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum) => numBinary("multiplication", x, y)
    case (x: VDur, y: VNum) => durScale(x, y, a, b)
    case (x: VNum, y: VDur) => durScale(y, x, a, b)
    case _ => err("multiplication", a, b)
  }

  private def durScale(d: VDur, n: VNum, a: V, b: V): VDur = {
    val overflowMsg =
      s"""Failed to compute: "${a.renderRaw} * ${b.renderRaw}", as the operation results in an arithmetic overflow."""
    n match {
      case VInt(i) if i >= 0 =>
        durFromNanosOr(d.totalNanos * i, overflowMsg)
      case VFloat(f) if f >= 0 && java.lang.Double.isFinite(f) =>
        durFromNanosOr((BigDecimal(d.totalNanos) * BigDecimal(f)).toBigInt, overflowMsg)
      case VDec(dec) if dec.signum >= 0 =>
        durFromNanosOr((BigDecimal(d.totalNanos) * dec).toBigInt, overflowMsg)
      case _ => err("multiplication", a, b)
    }
  }

  /** `/`: try_div with failures → NaN (operate.rs div). */
  def div(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum) =>
      try numBinary("division", x, y)
      catch { case _: SqlError => VFloat(Double.NaN) }
    case (x: VDur, y: VNum) =>
      val nanos = y match {
        case VInt(i) if i > 0 => d2(x.totalNanos / i)
        case VFloat(f) if f > 0 && java.lang.Double.isFinite(f) =>
          d2((BigDecimal(x.totalNanos) / BigDecimal(f)).toBigInt)
        case VDec(d) if d.signum > 0 => d2((BigDecimal(x.totalNanos) / d).toBigInt)
        case _ => throw SqlError("A duration can only be divided by a value greater than 0.")
      }
      nanos
    case _ => VFloat(Double.NaN)
  }
  private def d2(nanos: BigInt): VDur =
    VDur((nanos / 1000000000L).toLong, (nanos % 1000000000L).toInt)

  def rem(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum) => numBinary("remainder", x, y)
    case _ => err("remainder", a, b)
  }

  def pow(a: V, b: V): V = (a, b) match {
    case (x: VNum, y: VNum) => numPow(x, y)
    case _ => throw SqlError(s"Cannot raise the value '${a.renderRaw}' with '${b.renderRaw}'")
  }

  def neg(a: V): V = a match {
    case VInt(i) =>
      if (i == Long.MinValue) throw SqlError(s"Cannot negate the value '$i'")
      VInt(-i)
    case VFloat(d) => VFloat(-d)
    case VDec(d)   => VDec(-d)
    case _ => throw SqlError(s"Cannot negate the value '${a.renderRaw}'")
  }

  // ---- comparisons / logic --------------------------------------------

  def cmpBool(op: String, a: V, b: V): VBool = {
    val c = V.cmp(a, b)
    VBool(op match {
      case "<"  => c < 0
      case "<=" => c <= 0
      case ">"  => c > 0
      case ">=" => c >= 0
    })
  }

  def looseEq(a: V, b: V): VBool = VBool(V.looseEq(a, b))
  def exactEq(a: V, b: V): VBool = VBool(V.exactEq(a, b))

  /** `?=` ANY equal / `*=` ALL equal (operate.rs any_equal/all_equal). */
  def anyEq(a: V, b: V): VBool = a match {
    case VArr(items) => VBool(items.exists(V.looseEq(_, b)))
    case VSet(items) => VBool(items.exists(V.looseEq(_, b)))
    case v           => VBool(V.looseEq(v, b))
  }
  def allEq(a: V, b: V): VBool = a match {
    case VArr(items) => VBool(items.forall(V.looseEq(_, b)))
    case VSet(items) => VBool(items.forall(V.looseEq(_, b)))
    case v           => VBool(V.looseEq(v, b))
  }

  // ---- containment family (expr/operator.rs:46-127) -------------------

  def contains(a: V, b: V): Boolean = a match {
    case VArr(items) => items.exists(V.looseEq(_, b))
    case VSet(items) => items.exists(V.looseEq(_, b))
    case VStr(s)     => b match { case VStr(t) => s.contains(t); case _ => false }
    case VObj(o)     => b match { case VStr(k) => o.contains(k); case _ => false }
    case VRng(lo, hi) =>
      val okLo = lo.forall { case (v, incl) => val c = V.cmp(b, v); if (incl) c >= 0 else c > 0 }
      val okHi = hi.forall { case (v, incl) => val c = V.cmp(b, v); if (incl) c <= 0 else c < 0 }
      okLo && okHi
    case _ => false
  }

  def containsAll(a: V, b: V): Boolean = (a, b) match {
    case (_, VArr(items)) => items.forall(contains(a, _))
    case (_, VSet(items)) => items.forall(contains(a, _))
    case _                => false
  }
  def containsAny(a: V, b: V): Boolean = (a, b) match {
    case (_, VArr(items)) => items.exists(contains(a, _))
    case (_, VSet(items)) => items.exists(contains(a, _))
    case _                => false
  }
  def containsNone(a: V, b: V): Boolean = (a, b) match {
    case (_, VArr(items)) => !items.exists(contains(a, _))
    case (_, VSet(items)) => !items.exists(contains(a, _))
    case _                => true
  }
  def allInside(a: V, b: V): Boolean = a match {
    case VArr(items) => items.forall(contains(b, _))
    case VSet(items) => items.forall(contains(b, _))
    // a scalar ALLINSIDE falls back to plain containment ("in" in "inout")
    case other       => contains(b, other)
  }
  def anyInside(a: V, b: V): Boolean = a match {
    case VArr(items) => items.exists(contains(b, _))
    case VSet(items) => items.exists(contains(b, _))
    case other       => contains(b, other)
  }
  def noneInside(a: V, b: V): Boolean = a match {
    case VArr(items) => !items.exists(contains(b, _))
    case VSet(items) => !items.exists(contains(b, _))
    case _           => true
  }
}
