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
      ks.view.flatMap(ki => try Some(cast(ki, v)) catch { case _: SqlError => scala.None })
        .headOption.getOrElse(err(k, v))
    case KBool => v match {
      case b: VBool => b
      case VStr("true") => VBool(true)
      case VStr("false") => VBool(false)
      case _ => err(k, v)
    }
    case KInt => v match {
      case i: VInt => i
      case VFloat(d) =>
        if (d.isNaN || d.isInfinity || d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble) err(k, v)
        else if (d == Math.rint(d)) VInt(d.toLong)
        else VInt(d.toLong)
      case VDec(d) => try VInt(d.toLongExact) catch { case _: ArithmeticException =>
        if (d.isWhole) err(k, v) else VInt(d.toLong) }
      case VStr(s) => try VInt(java.lang.Long.parseLong(s.trim)) catch {
        case _: NumberFormatException =>
          try {
            val d = BigDecimal(s.trim)
            if (d.isWhole) VInt(d.toLongExact) else err(k, v)
          } catch { case _: Exception => err(k, v) }
      }
      case VBool(b) => VInt(if (b) 1 else 0)
      case VDt(t) => VInt(t.getEpochSecond)
      case _ => err(k, v)
    }
    case KFloat => v match {
      case f: VFloat => f
      case VInt(i) => VFloat(i.toDouble)
      case VDec(d) => VFloat(d.toDouble)
      case VStr(s) => try VFloat(s.trim.toDouble) catch { case _: NumberFormatException => err(k, v) }
      case VBool(b) => VFloat(if (b) 1.0 else 0.0)
      case _ => err(k, v)
    }
    case KDecimal => v match {
      case d: VDec => d
      case VInt(i) => VDec(BigDecimal(i))
      case VFloat(d) =>
        if (d.isNaN || d.isInfinity) err(k, v)
        else VDec(BigDecimal(Render.floatDigits(d)))
      case VStr(s) => try VDec(BigDecimal(s.trim)) catch { case _: NumberFormatException => err(k, v) }
      case VBool(b) => VDec(BigDecimal(if (b) 1 else 0))
      case _ => err(k, v)
    }
    case KNumber => v match {
      case n: VNum => n
      case VStr(s) => parseNumberString(s).getOrElse(err(k, v))
      case VBool(b) => VInt(if (b) 1 else 0)
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
        val p = new Parser(s)
        try {
          p.ws()
          val e = p.expr(); p.ws()
          if (!p.eof) err(k, v)
          Eval.evalConst(e) match { case d: VDur => d; case _ => err(k, v) }
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
      case VStr(s) => try VUuid(java.util.UUID.fromString(s)) catch { case _: Exception => err(k, v) }
      case _ => err(k, v)
    }
    case KBytes => v match {
      case b: VBytes => b
      case VStr(s) => VBytes(s.getBytes("UTF-8").toVector)
      case VArr(items) if items.forall {
        case VInt(n) => n >= 0 && n <= 255
        case _       => false
      } => VBytes(items.map { case VInt(n) => n.toByte; case _ => 0.toByte })
      case _ => err(k, v)
    }
    case KObject => v match {
      case o: VObj => o
      case g: VGeom => V.obj("type" -> VStr(g.kind), "coordinates" -> g.coords)
      case _ => err(k, v)
    }
    case KRegex => v match {
      case r: VRegex => r
      case VStr(s) => VRegex(s)
      case _ => err(k, v)
    }
    case KRange => v match {
      case r: VRng => r
      case _ => err(k, v)
    }
    case KArray(inner, max) => v match {
      case VArr(items) =>
        max.filter(_ != items.length).foreach { m =>
          throw SqlError(s"Expected `array<${inner.map(kindName).getOrElse("any")},$m>`" +
            s" but found a collection of length `${items.length}`") }
        VArr(inner.map(ik => items.map(cast(ik, _))).getOrElse(items))
      case VSet(items) =>
        max.filter(_ != items.length).foreach { m =>
          throw SqlError(s"Expected `array<${inner.map(kindName).getOrElse("any")},$m>`" +
            s" but found a collection of length `${items.length}`") }
        VArr(inner.map(ik => items.map(cast(ik, _))).getOrElse(items))
      case r: VRng => rangeToArray(r).getOrElse(err(k, v))
      // bytes → array of byte values (primitive/bytes: <array> b"…")
      case VBytes(bs) => VArr(bs.map(b => VInt((b & 0xff).toLong): V))
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
      v match {
        case VSet(items) => bounded(V.set(inner.map(ik => items.map(cast(ik, _))).getOrElse(items)))
        case VArr(items) => bounded(V.set(inner.map(ik => items.map(cast(ik, _))).getOrElse(items)))
        case r: VRng => rangeToArray(r).map(a => bounded(V.set(a.items))).getOrElse(err(k, v))
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
    case KFile => err(k, v)
    case KTable(names) => v match {
      case t: VTable if names.isEmpty || names.contains(t.name) => t
      case VStr(s) if names.isEmpty || names.contains(s) => VTable(s)
      case _ => err(k, v)
    }
  }

  def parseNumberString(s: String): Option[VNum] = {
    val t = s.trim
    try Some(VInt(java.lang.Long.parseLong(t)))
    catch { case _: NumberFormatException =>
      if (t.endsWith("dec")) try Some(VDec(BigDecimal(t.dropRight(3)))) catch { case _: Exception => scala.None }
      else if (t.endsWith("f")) try Some(VFloat(t.dropRight(1).toDouble)) catch { case _: Exception => scala.None }
      else try Some(VFloat(t.toDouble)) catch { case _: Exception => scala.None }
    }
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
      case VDec(d) if d.isWhole => VInt(d.toLong)
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
      case VFloat(d) if !d.isNaN && !d.isInfinity => VDec(BigDecimal(Render.floatDigits(d)))
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
