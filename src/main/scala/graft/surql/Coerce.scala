package graft.surql

import graft.surql.ast.Kind
import graft.surql.ast.Kind._
import scala.collection.immutable.TreeMap

/** Cast (`<kind> expr`) and coercion semantics — mirrors the reference's
  * conversion rules (surrealdb: core/src/val/value/cast + types Kind).
  * Cast failures use the canonical message
  * "Could not cast into `<kind>` using input `<value>`". */
object Coerce {

  def kindName(k: Kind): String = k match {
    case KAny => "any"
    case KNone => "none"
    case KNull => "null"
    case KBool => "bool"
    case KInt => "int"
    case KFloat => "float"
    case KDecimal => "decimal"
    case KNumber => "number"
    case KString => "string"
    case KDuration => "duration"
    case KDatetime => "datetime"
    case KUuid => "uuid"
    case KBytes => "bytes"
    case KObject => "object"
    case KRegex => "regex"
    case KRange => "range"
    case KFunction => "function"
    case KFile => "file"
    case KArray(_, _) => "array"
    case KSet(_, _) => "array"
    case KRecord(ts) => if (ts.isEmpty) "record" else s"record<${ts.mkString(" | ")}>"
    case KGeometry(_) => "geometry"
    case KEither(ks) => ks.map(kindName).mkString(" | ")
    case KOption(inner) => s"none | ${kindName(inner)}"
    case KLiteral(v) => v.render
    case KLiteralArr(items) => items.map(kindName).mkString("[", ", ", "]")
    case KLiteralObj(fields) =>
      if (fields.isEmpty) "{  }"
      else fields.sortBy(_._1).map { case (k, kk) => s"$k: ${kindName(kk)}" }.mkString("{ ", ", ", " }")
    case KTable(names) => if (names.isEmpty) "table" else s"table<${names.mkString("|")}>"
  }

  private def err(k: Kind, v: V): Nothing =
    throw SqlError(s"Could not cast into `${kindName(k)}` using input `${v.render}`")

  def cast(k: Kind, v: V): V = k match {
    case KAny => v
    case KOption(inner) => if (v == VNone || v == VNull) v else cast(inner, v)
    case KEither(ks) =>
      // Either dispatches on can_cast (cast.rs:930), which for String
      // EXCLUDES None/Null — even though the direct string cast maps them
      // to "NONE"/"NULL". So `<string | int> NONE` errors while
      // `<string> NONE` succeeds.
      def arms = ks.view.filterNot(ki =>
        ki == KString && (v == VNone || v == VNull))
      arms.flatMap(ki => try Some(cast(ki, v)) catch { case _: SqlError => scala.None })
        .headOption.getOrElse(err(k, v))
    case KBool => v match {
      case b: VBool => b
      case VStr("true") => VBool(true)
      case VStr("false") => VBool(false)
      case _ => err(k, v)
    }
    // the numeric casts follow `Cast for i64/f64/Decimal/Number`
    // (convert/cast.rs:186-334) — r20 sweep: there is NO bool arm and NO
    // datetime arm (`<int>true` errors); a fractional float/decimal does
    // NOT truncate; strings parse with the RUST grammars, which neither
    // trim whitespace nor accept Java's trailing d/f suffixes, and f64
    // accepts "inf"/"infinity"/"nan" case-insensitively
    case KInt => v match {
      case i: VInt => i
      case VFloat(d) =>
        // `v as i64` (Rust) saturates, but only INTEGRAL floats get there
        if (d.isNaN || d.isInfinity || d != Math.rint(d)) err(k, v)
        else VInt(d.toLong) // toLong saturates like Rust `as`
      case VDec(d) =>
        if (!d.isWhole) err(k, v)
        else try VInt(d.toLongExact) catch { case _: ArithmeticException => err(k, v) }
      case VStr(s) => rustParseI64(s).map(VInt(_)).getOrElse(err(k, v))
      case _ => err(k, v)
    }
    case KFloat => v match {
      case f: VFloat => f
      case VInt(i) => VFloat(i.toDouble)
      case VDec(d) => VFloat(d.toDouble)
      case VStr(s) => rustParseF64(s).map(VFloat(_)).getOrElse(err(k, v))
      case _ => err(k, v)
    }
    case KDecimal => v match {
      case d: VDec => d
      case VInt(i) => VDec(BigDecimal(i))
      case VFloat(d) =>
        // Decimal::try_from(f64): NaN/±inf and out-of-96-bit-range error
        if (d.isNaN || d.isInfinity) err(k, v)
        else decimalFit(BigDecimal(Render.floatDigits(d))).map(VDec(_)).getOrElse(err(k, v))
      case VStr(s) => rustParseDecimal(s).getOrElse(err(k, v))
      case _ => err(k, v)
    }
    case KNumber => v match {
      case n: VNum => n
      case VStr(s) => parseNumberString(s).getOrElse(err(k, v))
      case _ => err(k, v)
    }
    case KString => v match {
      case s: VStr => s
      case VBytes(bs) => VStr(new String(bs.toArray, "UTF-8"))
      case VNone => VStr("NONE")
      case VNull => VStr("NULL")
      // the String cast special-cases Decimal as PLAIN (convert/cast.rs:360
      // `Number::Decimal(x) => x.to_string()`) — unlike to_raw_string,
      // which suffixes it `dec`; finite floats keep the to_sql `f` suffix
      // on BOTH (cast.rs:361 falls to to_sql)
      case VDec(d) => VStr(Render.decStr(d))
      case other => VStr(other.renderRaw)
    }
    case KLiteralArr(kinds) => v match {
      case VArr(items) if items.length == kinds.length =>
        try VArr(kinds.zip(items).map { case (ik, iv) => cast(ik, iv) }.toVector)
        catch { case _: SqlError => err(k, v) }
      case _ => err(k, v)
    }
    case KLiteralObj(fields) => v match {
      case VObj(fs) if fs.keySet == fields.map(_._1).toSet =>
        try VObj(scala.collection.immutable.TreeMap(
          fields.map { case (key, ik) => key -> cast(ik, fs(key)) }: _*))
        catch { case _: SqlError => err(k, v) }
      case _ => err(k, v)
    }
    case KDuration => v match {
      case d: VDur => d
      case VStr(s) =>
        // Duration::from_str parses a LITERAL only — "1h30m" yes,
        // "1h + 30m" no (the old lowering evaluated a whole expression)
        if (s != s.trim) err(k, v) // from_str does not skip whitespace
        val p = new Parser(s)
        try {
          val e = p.expr()
          if (!p.eof) err(k, v)
          e match {
            case ast.Lit(d: VDur) => d
            case _ => err(k, v)
          }
        } catch { case _: Exception => err(k, v) }
      case _ => err(k, v)
    }
    case KDatetime => v match {
      case d: VDt => d
      case VStr(s) => try {
        new Parser("").parseDatetime(s)
      } catch { case _: Exception => err(k, v) }
      case _ => err(k, v)
    }
    case KUuid => v match {
      case u: VUuid => u
      // the uuid crate's parse_str accepts hyphenated, SIMPLE (32 hex),
      // braced, and urn:uuid: forms — java.util.UUID only the first
      case VStr(s) => parseUuidFlexible(s).map(VUuid(_)).getOrElse(err(k, v))
      case _ => err(k, v)
    }
    case KBytes => v match {
      case b: VBytes => b
      case VStr(s) => VBytes(s.getBytes("UTF-8").toVector)
      // any array whose elements CAST to i64 (so "65", 2.0, 3dec all
      // qualify), then `x as u8` TRUNCATES — 300 → 44, -1 → 255
      // (cast.rs:443-478, truncation marked TODO in the reference but
      // shipping, so reproduced)
      case VArr(items) =>
        val longs = items.map(castableI64)
        if (longs.exists(_.isEmpty)) err(k, v)
        else VBytes(longs.map(l => l.get.toByte))
      case _ => err(k, v)
    }
    case KObject => v match {
      case o: VObj => o
      case g: VGeom => V.obj("type" -> VStr(g.kind), "coordinates" -> g.coords)
      case _ => err(k, v)
    }
    case KRegex => v match {
      case r: VRegex => r
      // Regex::from_str VALIDATES at cast time (cast.rs:546) — an invalid
      // pattern is a cast error, not a deferred compile crash
      case VStr(s) =>
        val r = VRegex(s)
        try { r.compiled; r } catch { case _: Exception => err(k, v) }
      case _ => err(k, v)
    }
    case KRange => v match {
      case r: VRng => r
      // a two-element array casts to `beg..end` — start included, end
      // excluded, ANY value types (cast.rs:573-610)
      case VArr(Vector(beg, end)) =>
        VRng(Some((beg, true)), Some((end, false)))
      case _ => err(k, v)
    }
    case KArray(inner, max) =>
      def elems(items: Vector[V]): VArr = {
        max.filter(_ != items.length).foreach { m =>
          throw SqlError(s"Expected `array<${inner.map(kindName).getOrElse("any")},$m>`" +
            s" but found a collection of length `${items.length}`") }
        VArr(inner.map(ik => items.map(castElem(ik, _, "array"))).getOrElse(items))
      }
      v match {
        case VArr(items) => elems(items)
        case VSet(items) => elems(items)
        case r: VRng => elems(castRangeToArray(r).items)
        // bytes → array of byte values (primitive/bytes: <array> b"…")
        case VBytes(bs) => elems(bs.map(b => VInt((b & 0xff).toLong): V))
        case _ => err(k, v)
      }
    case KSet(inner, max) =>
      // length bound applies AFTER dedup (type/set: <set<int,5>>[1,2,1])
      def bounded(s: V): V = s match {
        case VSet(items) =>
          max.filter(_ != items.length).foreach { m =>
            throw SqlError(s"Expected `set<${inner.map(kindName).getOrElse("any")},$m>`" +
              s" but found a collection of length `${items.length}`") }
          s
        case other => other
      }
      def build(items: Vector[V]): V =
        bounded(V.set(inner.map(ik => items.map(castElem(ik, _, "set"))).getOrElse(items)))
      v match {
        case VSet(items) => build(items)
        case VArr(items) => build(items)
        case r: VRng => build(castRangeToArray(r).items)
        case VBytes(bs) => build(bs.map(b => VInt((b & 0xff).toLong): V))
        case _ => err(k, v)
      }
    case KRecord(tables) => v match {
      case r: VRid if tables.isEmpty || tables.contains(r.table) => r
      case VStr(s) =>
        try {
          val p = new Parser(s)
          p.ws()
          val e = p.expr(); p.ws()
          if (!p.eof) err(k, v)
          Eval.evalConst(e) match {
            case r: VRid if tables.isEmpty || tables.contains(r.table) => r
            case _ => err(k, v)
          }
        } catch { case _: SqlError | _: ParseError => err(k, v) }
      case _ => err(k, v)
    }
    case KGeometry(kinds) => v match {
      case g: VGeom => g
      case VObj(fs) =>
        (fs.get("type"), fs.get("coordinates")) match {
          case (Some(VStr(t)), Some(c)) => VGeom(t, c)
          case _ => err(k, v)
        }
      // a two-number array casts to a POINT only under the point subtype
      // (<point> / <geometry<point>>; bare <geometry> rejects arrays)
      case VArr(Vector(x: VNum, y: VNum)) if kinds.exists(_.equalsIgnoreCase("point")) =>
        VGeom("Point", VArr(Vector(VFloat(x.toDouble), VFloat(y.toDouble))))
      case _ => err(k, v)
    }
    case KLiteral(lit) => if (V.looseEq(lit, v)) v else err(k, v)
    case KNone => if (v == VNone) v else err(k, v)
    case KNull => if (v == VNull) v else err(k, v)
    case KFunction => v match { case c: VClosure => c; case _ => err(k, v) }
    case KFile => v match { case f: VFile => f; case _ => err(k, v) }
    case KTable(names) => v match {
      case t: VTable if names.isEmpty || names.contains(t.name) => t
      case VStr(s) if names.isEmpty || names.contains(s) => VTable(s)
      // bare `<table>` routes through the STRING cast (cast_to_kind:
      // Kind::Table empty → cast_to::<String>), so `<table>123` is the
      // table `123` and even NONE becomes the table `NONE` (quirky, but
      // it is the shipped dispatch)
      case other if names.isEmpty =>
        (try Some(cast(KString, other)) catch { case _: SqlError => scala.None }) match {
          case Some(VStr(s)) => VTable(s)
          case _ => err(k, v)
        }
      case _ => err(k, v)
    }
  }

  /** Number::from_str (val/number.rs:117-133): try i64, then f64 — the
    * RUST grammars. No whitespace trim, no `f`/`dec` suffixes (those are
    * SurrealQL literal syntax, not Number parsing), but "inf"/"nan" parse
    * as floats. */
  def parseNumberString(s: String): Option[VNum] =
    rustParseI64(s).map(VInt(_): VNum)
      .orElse(rustParseF64(s).map(VFloat(_): VNum))

  /** Rust `i64::from_str`: optional sign then decimal digits, nothing
    * else; overflow errors. */
  def rustParseI64(s: String): Option[Long] =
    if (!s.matches("[+-]?[0-9]+")) scala.None
    else try Some(java.lang.Long.parseLong(s))
    catch { case _: NumberFormatException => scala.None }

  /** Rust `f64::from_str`: optional sign; "inf" | "infinity" | "nan"
    * case-insensitive; else decimal mantissa with optional exponent. NO
    * whitespace, NO trailing d/f suffix, NO hex floats (all of which
    * Java's parseDouble accepts). */
  def rustParseF64(s: String): Option[Double] = {
    if (s.isEmpty) return scala.None
    val neg = s.charAt(0) == '-'
    val body = if (s.charAt(0) == '+' || neg) s.substring(1) else s
    val bl = body.toLowerCase(java.util.Locale.ROOT)
    if (bl == "inf" || bl == "infinity")
      return Some(if (neg) Double.NegativeInfinity else Double.PositiveInfinity)
    if (bl == "nan") return Some(Double.NaN)
    if (!body.matches("([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?")) return scala.None
    try Some(s.toDouble) catch { case _: NumberFormatException => scala.None }
  }

  /** rust_decimal 96-bit bounds: |unscaled| ≤ 2^96−1 at scale ≤ 28. */
  private val DecimalMax = BigDecimal(BigInt(2).pow(96) - 1)

  /** Fit into rust_decimal's range: excess fractional digits round
    * half-away-from-zero (the crate's from_str behavior), out-of-range
    * magnitudes fail. */
  def decimalFit(d0: BigDecimal): Option[BigDecimal] = {
    val d = if (d0.scale > 28)
      d0.setScale(28, scala.math.BigDecimal.RoundingMode.HALF_UP)
    else d0
    if (d.abs > DecimalMax) scala.None else Some(d)
  }

  /** Decimal::from_str_normalized (rust_decimal from_str + normalize):
    * sign, digits with optional underscores, one optional point — NO
    * exponent, NO whitespace, NO suffix. */
  def rustParseDecimal(s: String): Option[VDec] = {
    if (!s.matches("[+-]?[0-9_]*\\.?[0-9_]*") || !s.exists(_.isDigit)) return scala.None
    val clean = s.filterNot(_ == '_')
    try decimalFit(BigDecimal(clean)).map(VDec(_))
    catch { case _: NumberFormatException => scala.None }
  }

  /** uuid::Uuid::parse_str: hyphenated, simple (32 hex), braced, or
    * urn:uuid: forms, case-insensitive. */
  def parseUuidFlexible(s0: String): Option[java.util.UUID] = {
    var s = s0
    if (s.length >= 9 && s.substring(0, 9).equalsIgnoreCase("urn:uuid:"))
      s = s.substring(9)
    if (s.length >= 2 && s.charAt(0) == '{' && s.charAt(s.length - 1) == '}')
      s = s.substring(1, s.length - 1)
    val hyphenated =
      if (s.length == 32 && s.forall(c => Character.digit(c, 16) >= 0))
        s.substring(0, 8) + "-" + s.substring(8, 12) + "-" + s.substring(12, 16) +
          "-" + s.substring(16, 20) + "-" + s.substring(20)
      else s
    if (!hyphenated.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
      scala.None
    else try Some(java.util.UUID.fromString(hyphenated))
    catch { case _: Exception => scala.None }
  }

  /** `can_cast_to::<i64>` + `cast_to::<i64>` for bytes-from-array
    * elements: ints, integral floats/decimals, strict-i64 strings. */
  private def castableI64(v: V): Option[Long] = v match {
    case VInt(i) => Some(i)
    case VFloat(d) if !d.isNaN && !d.isInfinity && d == Math.rint(d) => Some(d.toLong)
    case VDec(d) if d.isWhole =>
      try Some(d.toLongExact) catch { case _: ArithmeticException => scala.None }
    case VStr(s) => rustParseI64(s)
    case _ => scala.None
  }

  /** Element cast inside `array<T>` / `set<T>` tags failures with the
    * enclosing kind (CastError::with_element_of). */
  private def castElem(ik: Kind, el: V, outer: String): V =
    try cast(ik, el)
    catch {
      case e: SqlError if !e.msg.contains("when coercing an element") =>
        throw SqlError(s"${e.msg} when coercing an element of `$outer<${kindName(ik)}>`")
    }

  /** `Cast for Array` on a Range: both bounds must be ints; a result
    * larger than GENERATION_ALLOCATION_LIMIT (2^20) raises the dedicated
    * RangeSizeLimit error (cast.rs:497-513, "then" typo preserved). */
  def castRangeToArray(r: VRng): VArr = (r.lo, r.hi) match {
    case (Some((VInt(lo), loIncl)), Some((VInt(hi), hiIncl))) =>
      val start = if (loIncl) lo else lo + 1
      val end = if (hiIncl) hi else hi - 1
      val len = math.max(0L, end - start + 1)
      if (len > 1048576L)
        throw SqlError(s"Casting range `${r.render}` to an array would create " +
          "an array larger then the max allocation limit.")
      VArr((start to end).map(VInt(_)).toVector)
    case _ =>
      throw SqlError(s"Could not cast into `array` using input `${r.render}`")
  }

  def rangeToArray(r: VRng): Option[VArr] = (r.lo, r.hi) match {
    case (Some((VInt(lo), loIncl)), Some((VInt(hi), hiIncl))) =>
      val start = if (loIncl) lo else lo + 1
      val end = if (hiIncl) hi else hi - 1
      if (end - start > 10000000L) scala.None
      else Some(VArr((start to end).map(VInt(_)).toVector))
    case _ => scala.None
  }

  def dedup(items: Vector[V]): Vector[V] = {
    val seen = scala.collection.mutable.LinkedHashSet[V]()
    items.foreach { it => if (!seen.exists(V.looseEq(_, it))) seen += it }
    seen.toVector
  }

  /** Implicit coercion for typed LET / field pipelines — stricter than cast:
    * only lossless conversions (int→float/decimal widening, etc.). Error
    * format: "Expected a <kind> but found <value>". */
  def coerce(k: Kind, v: V): V = k match {
    case KAny => v
    // option<T> admits NONE and whatever T admits — NULL only if T does
    // (types/field_none_null: `option<string>` + NULL errors as
    // `none | string`, `option<string | null>` accepts NULL)
    case KOption(inner) =>
      if (v == VNone) v
      else try coerce(inner, v) catch { case _: SqlError => coerceErr(k, v) }
    case KEither(ks) =>
      ks.view.flatMap(ki => try Some(coerce(ki, v)) catch { case _: SqlError => scala.None })
        .headOption.getOrElse(coerceErr(k, v))
    case KBool => v match { case b: VBool => b; case _ => coerceErr(k, v) }
    case KInt => v match {
      case i: VInt => i
      case VFloat(d) if d == Math.rint(d) && !d.isInfinity => VInt(d.toLong)
      // out-of-i64-range whole decimals ERROR (coerce.rs:163 try_into),
      // they do not truncate
      case VDec(d) if d.isWhole =>
        try VInt(d.toLongExact)
        catch { case _: ArithmeticException => coerceErr(k, v) }
      case _ => coerceErr(k, v)
    }
    case KFloat => v match {
      case f: VFloat => f
      case VInt(i) => VFloat(i.toDouble)
      case VDec(d) => VFloat(d.toDouble)
      case _ => coerceErr(k, v)
    }
    case KDecimal => v match {
      case d: VDec => d
      case VInt(i) => VDec(BigDecimal(i))
      // Decimal::try_from(f64) bounds apply on coercion too (coerce.rs:238)
      case VFloat(d) if !d.isNaN && !d.isInfinity =>
        decimalFit(BigDecimal(Render.floatDigits(d))).map(VDec(_))
          .getOrElse(coerceErr(k, v))
      case _ => coerceErr(k, v)
    }
    case KNumber => v match { case n: VNum => n; case _ => coerceErr(k, v) }
    case KString => v match { case s: VStr => s; case _ => coerceErr(k, v) }
    case KArray(inner, len) => v match {
      case VArr(items) =>
        // fixed-length arrays enforce EXACT length on coercion too
        // (reproductions/5677: array<number, 2> rejects [])
        len.filter(_ != items.length).foreach { m =>
          throw SqlError(s"Expected `array<${inner.map(kindName).getOrElse("any")},$m>`" +
            s" but found a collection of length `${items.length}`") }
        VArr(inner.map(ik => items.map(el => coerceElem(ik, el))).getOrElse(items))
      case VSet(items) =>
        len.filter(_ != items.length).foreach { m =>
          throw SqlError(s"Expected `array<${inner.map(kindName).getOrElse("any")},$m>`" +
            s" but found a collection of length `${items.length}`") }
        VArr(inner.map(ik => items.map(el => coerceElem(ik, el))).getOrElse(items))
      case _ => coerceErr(k, v)
    }
    case KSet(inner, _) => v match {
      case VSet(items) => V.set(inner.map(ik => items.map(coerce(ik, _))).getOrElse(items))
      case VArr(items) => V.set(inner.map(ik => items.map(coerce(ik, _))).getOrElse(items))
      case _ => coerceErr(k, v)
    }
    case KObject => v match { case o: VObj => o; case _ => coerceErr(k, v) }
    case KDuration => v match { case d: VDur => d; case _ => coerceErr(k, v) }
    case KDatetime => v match { case d: VDt => d; case _ => coerceErr(k, v) }
    case KUuid => v match { case u: VUuid => u; case _ => coerceErr(k, v) }
    case KRecord(tables) => v match {
      case r: VRid if tables.isEmpty || tables.contains(r.table) => r
      case _ => coerceErr(k, v)
    }
    case KLiteral(lit) => if (V.looseEq(lit, v)) v else coerceErr(k, v)
    case KLiteralObj(fields) => v match {
      case VObj(fs) if fs.keySet == fields.map(_._1).toSet =>
        try VObj(TreeMap(fields.map { case (key, ik) => key -> coerce(ik, fs(key)) }: _*))
        catch { case _: SqlError => coerceErr(k, v) }
      case VObj(fs) =>
        // allow missing keys covered by option kinds
        val names = fields.map(_._1).toSet
        val optional = fields.collect { case (n, KOption(_)) => n }.toSet
        val missing = names -- fs.keySet
        if (fs.keySet.subsetOf(names) && missing.subsetOf(optional))
          try VObj(TreeMap(fields.flatMap { case (key, ik) =>
            fs.get(key).map(key -> coerce(ik, _))
          }: _*))
          catch { case _: SqlError => coerceErr(k, v) }
        else coerceErr(k, v)
      case _ => coerceErr(k, v)
    }
    case KLiteralArr(kinds) => v match {
      case VArr(items) if items.length == kinds.length =>
        try VArr(kinds.zip(items).map { case (ik, iv) => coerce(ik, iv) }.toVector)
        catch { case _: SqlError => coerceErr(k, v) }
      case _ => coerceErr(k, v)
    }
    case KTable(names) => v match {
      case t: VTable if names.isEmpty || names.contains(t.name) => t
      // a string naming an allowed table coerces to it (let/typed_table)
      case VStr(s) if names.isEmpty || names.contains(s) => VTable(s)
      case _ => coerceErr(k, v)
    }
    // coercion does NOT compile strings into regexes — only `<regex>` casts
    // do (coerce/regex: fn arg `'a'` → "Expected `regex` but found `'a'`")
    case KRegex => v match { case r: VRegex => r; case _ => coerceErr(k, v) }
    case _ => cast(k, v)
  }

  private def coerceErr(k: Kind, v: V): Nothing =
    throw SqlError(s"Expected `${kindName(k)}` but found `${v.render}`")

  /** Element coercion inside `array<T>` tags failures with the enclosing
    * array kind (CoercionError::ElementOf; reproductions/5677). */
  private def coerceElem(ik: Kind, el: V): V =
    try coerce(ik, el)
    catch {
      case e: SqlError if !e.msg.contains("when coercing an element") =>
        throw SqlError(s"${e.msg} when coercing an element of `array<${kindName(ik)}>`")
    }
}
