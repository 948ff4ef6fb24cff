package graft.surql

import java.time.Instant
import scala.collection.immutable.TreeMap

/** Evaluation error carrying a SurrealQL-style message (the golden corpus
  * asserts on these strings). */
final case class SqlError(msg: String) extends Exception(msg)

/** The universal SurrealQL value — mirrors the reference's `enum Value`
  * (surrealdb: types/src/value/mod.rs:84-122): None, Null, Bool, Number
  * (Int|Float|Decimal), String, Bytes, Duration, Datetime, Uuid, Table,
  * RecordId, Range, Regex, Array, Object (+ Closure for HOF arguments).
  * Geometry/File/Set are carried as tagged objects where needed.
  *
  * A TOTAL order exists across all variants (mod.rs:132+): values of
  * different types order by type tag — None < Null < Bool < Number < String
  * < Duration < Datetime < Uuid < Array < Set < Object < Geometry < Bytes <
  * Table < RecordId < File < Range < Regex — so ORDER BY over heterogeneous
  * columns is well-defined. */
sealed abstract class V {
  def typeTag: Int = this match {
    case VNone        => 0
    case VNull        => 1
    case _: VBool     => 2
    case _: VNum      => 3
    case _: VStr      => 4
    case _: VDur      => 5
    case _: VDt       => 6
    case _: VUuid     => 7
    case _: VArr      => 8
    case _: VSet      => 9
    case _: VObj      => 10
    case _: VGeom     => 11
    case _: VBytes    => 12
    case _: VTable    => 13
    case _: VRid      => 14
    case _: VFile     => 15
    case _: VRegex    => 16
    case _: VRng      => 17
    case _: VClosure  => 18
  }

  /** Type name as reported by `type::of` / error messages. */
  def typeName: String = this match {
    case VNone       => "none"
    case VNull       => "null"
    case _: VBool    => "bool"
    case VInt(_)     => "int"
    case VFloat(_)   => "float"
    case VDec(_)     => "decimal"
    case _: VStr     => "string"
    case _: VDur     => "duration"
    case _: VDt      => "datetime"
    case _: VUuid    => "uuid"
    case _: VArr     => "array"
    case _: VSet     => "set"
    case o: VObj if V.geomSubtype(o).isDefined =>
      "geometry<" + V.geomSubtype(o).get + ">"
    case _: VObj     => "object"
    case g: VGeom    => "geometry<" + V.geomName(g.kind) + ">"
    case _: VBytes   => "bytes"
    case _: VTable   => "table"
    case _: VRid     => "record"
    case _: VFile    => "file"
    case _: VRng     => "range"
    case _: VRegex   => "regex"
    case _: VClosure => "function"
  }

  /** Truthiness (val/mod.rs `is_truthy`): numbers nonzero, strings/arrays/
    * objects/bytes nonempty, durations > 0; record ids, uuids, datetimes,
    * geometries always true; None/Null false. */
  def truthy: Boolean = this match {
    case VBool(b)   => b
    case VInt(i)    => i != 0L
    case VFloat(d)  => d != 0.0 && !d.isNaN
    case VDec(d)    => d.signum != 0
    case VStr(s)    => s.nonEmpty
    case VArr(a)    => a.nonEmpty
    case VSet(s)    => s.nonEmpty
    case VObj(o)    => o.nonEmpty
    case VBytes(b)  => b.nonEmpty
    case VDur(s, n) => s != 0 || n > 0
    case _: VUuid | _: VRid | _: VGeom | _: VDt => true
    case _          => false
  }

  def render: String = Render.sql(this)
  /** Raw rendering — the reference's `Value::to_raw_string`
    * (core/src/val/mod.rs:225-232): strings unquoted, datetimes/uuids
    * without their literal prefixes, and EVERYTHING ELSE falls through to
    * `to_sql` — so finite floats carry the `f` suffix (`2f`, val/number.rs
    * ToSql) and decimals the `dec` suffix (`1.5dec`, types/src/sql.rs:238).
    * NaN/±Infinity stay bare (fmt_non_finite_f64). The `<string>` cast is
    * DIFFERENT: it special-cases Decimal as plain (convert/cast.rs:360) —
    * see Coerce. */
  def renderRaw: String = this match {
    case VStr(s)   => s
    case VDt(t)    => Render.rfc3339(t)
    case VUuid(u)  => u.toString
    case other     => Render.sql(other)
  }
}

case object VNone extends V
case object VNull extends V
final case class VBool(b: Boolean) extends V

sealed abstract class VNum extends V {
  def toDouble: Double = this match {
    case VInt(i)   => i.toDouble
    case VFloat(d) => d
    case VDec(d)   => d.toDouble
  }
  def toBig: BigDecimal = this match {
    case VInt(i)   => BigDecimal(i)
    case VFloat(d) => if (d.isNaN || d.isInfinity) BigDecimal(0) else BigDecimal(d)
    case VDec(d)   => d
  }
}
final case class VInt(i: Long) extends VNum
final case class VFloat(d: Double) extends VNum
final case class VDec(d: BigDecimal) extends VNum

final case class VStr(s: String) extends V
/** Duration: (secs, nanos) like std::time::Duration — secs is a u64 carried
  * in a Long with UNSIGNED semantics (max ≈ 5.8e11 years). */
final case class VDur(secs: Long, nanos: Int) extends V {
  def secsU: BigInt = BigInt(java.lang.Long.toUnsignedString(secs))
  def totalNanos: BigInt = secsU * 1000000000L + nanos
}
final case class VDt(t: Instant) extends V
final case class VUuid(u: java.util.UUID) extends V
final case class VArr(items: Vector[V]) extends V
/** Set: sorted dedup collection, BTreeSet-backed in the reference
  * (types/src/value/set.rs:17). Construct via [[V.set]] to keep the
  * sorted-unique invariant. */
final case class VSet(items: Vector[V]) extends V
/** Object: key-sorted, like the reference's BTreeMap-backed Object. */
final case class VObj(fields: TreeMap[String, V]) extends V
final case class VBytes(bytes: Vector[Byte]) extends V
final case class VTable(name: String) extends V
final case class VRid(table: String, key: V) extends V
final case class VFile(bucket: String, key: String) extends V
/** Range with optional bounds; `inclusive` applies to the bound value. */
final case class VRng(lo: Option[(V, Boolean)], hi: Option[(V, Boolean)]) extends V
final case class VRegex(pattern: String) extends V {
  // the reference's regexes are the Rust regex crate, whose \d \w \s
  // character classes are UNICODE by default (Java's are ASCII without
  // this flag — the r17 regex sweep caught '\d' missing Arabic-Indic
  // digits on both engines)
  lazy val compiled: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    pattern, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
}
/** Closure `|$x| expr` — carries its defining environment. */
final case class VClosure(params: Seq[(String, Option[ast.Kind])], body: ast.Expr,
    ret: Option[ast.Kind] = scala.None,
    env: Map[String, V]) extends V
/** Geometry (minimal): GeoJSON-ish tagged representation. */
final case class VGeom(kind: String, coords: V) extends V

object V {
  private val geomNames = Map(
    "Point" -> "point", "LineString" -> "line", "Polygon" -> "polygon",
    "MultiPoint" -> "multipoint", "MultiLineString" -> "multiline",
    "MultiPolygon" -> "multipolygon", "GeometryCollection" -> "collection")
  def geomName(t: String): String = geomNames.getOrElse(t, t.toLowerCase)
  private val geomRanks = Map("Point" -> 1, "LineString" -> 2, "Polygon" -> 3,
    "MultiPoint" -> 4, "MultiLineString" -> 5, "MultiPolygon" -> 6,
    "GeometryCollection" -> 7)
  def geomRank(t: String): Int = geomRanks.getOrElse(t, 8)
  /** Convert a GeoJSON-shaped object into a geometry value, if it is one. */
  def asGeom(o: VObj): Option[VGeom] = o.fields.get("type") match {
    case Some(VStr(t)) if geomRanks.contains(t) && o.fields.size == 2 =>
      def deepF(v: V): V = v match {
        case n: VNum => VFloat(n.toDouble) // geo coordinates are f64
        case VArr(items) => VArr(items.map(deepF))
        case other => other
      }
      // polygon rings auto-close on construction (geo crate LineString::close)
      def closeRing(v: V): V = v match {
        case VArr(pts) if pts.length >= 3 && pts.headOption != pts.lastOption =>
          VArr(pts :+ pts.head)
        case other => other
      }
      def closed(kind: String, c: V): V = (kind, c) match {
        case ("Polygon", VArr(rings)) => VArr(rings.map(closeRing))
        case ("MultiPolygon", VArr(polys)) => VArr(polys.map {
          case VArr(rings) => VArr(rings.map(closeRing)): V
          case other => other
        })
        case _ => c
      }
      // only a STRUCTURALLY VALID GeoJSON shape converts — `{ type: 'Point',
      // coordinates: [NONE, NONE] }` stays a plain object
      // (parsing/basic/geometry; reference TryFrom<Object> for Geometry)
      def validPt(v: V): Boolean = v match {
        case VArr(Vector(_: VNum, _: VNum)) => true
        case _ => false
      }
      def valid(kind: String, c: V): Boolean = (kind, c) match {
        case ("Point", p) => validPt(p)
        case ("LineString" | "MultiPoint", VArr(pts)) => pts.forall(validPt)
        case ("Polygon" | "MultiLineString", VArr(ls)) => ls.forall {
          case VArr(pts) => pts.forall(validPt); case _ => false
        }
        case ("MultiPolygon", VArr(polys)) => polys.forall {
          case VArr(rings) => rings.forall {
            case VArr(pts) => pts.forall(validPt); case _ => false
          }
          case _ => false
        }
        case _ => false
      }
      if (t == "GeometryCollection") o.fields.get("geometries").collect {
        case g @ VArr(items) if items.forall(_.isInstanceOf[VGeom]) => VGeom(t, g)
      }
      else o.fields.get("coordinates").filter(valid(t, _)).map(c => VGeom(t, closed(t, deepF(c))))
    case _ => scala.None
  }
  /** A GeoJSON-shaped object's geometry subtype, if it is one. */
  def geomSubtype(o: VObj): Option[String] = o.fields.get("type") match {
    case Some(VStr(t)) if geomNames.contains(t) &&
        (o.fields.contains("coordinates") || o.fields.contains("geometries")) &&
        o.fields.size == 2 =>
      Some(geomNames(t))
    case _ => scala.None
  }
  def obj(kvs: (String, V)*): VObj = VObj(TreeMap(kvs: _*))
  def arr(vs: V*): VArr = VArr(vs.toVector)
  /** Sorted-unique set constructor (BTreeSet semantics). */
  def set(vs: Iterable[V]): VSet = {
    val sorted = vs.toVector.sorted(ordering)
    val out = scala.collection.mutable.ArrayBuffer[V]()
    sorted.foreach { v => if (out.isEmpty || cmp(out.last, v) != 0) out += v }
    VSet(out.toVector)
  }
  def num(l: Long): VInt = VInt(l)
  def bool(b: Boolean): VBool = VBool(b)

  /** Total order across all values (types/src/value/mod.rs:132+). */
  val ordering: Ordering[V] = new Ordering[V] {
    def compare(a: V, b: V): Int = cmp(a, b)
  }

  def cmp(a: V, b: V): Int = (a, b) match {
    case (x: VNum, y: VNum)     => cmpNum(x, y)
    case (VStr(x), VStr(y))     => x.compareTo(y)
    case (VBool(x), VBool(y))   => java.lang.Boolean.compare(x, y)
    case (x: VDur, y: VDur)     => x.totalNanos.compare(y.totalNanos)
    case (VDt(x), VDt(y))       => x.compareTo(y)
    case (VUuid(x), VUuid(y))   =>
      // Rust Uuid orders by bytes (unsigned); Java compareTo is signed — do
      // an unsigned 128-bit comparison to match.
      val c = java.lang.Long.compareUnsigned(x.getMostSignificantBits, y.getMostSignificantBits)
      if (c != 0) c else java.lang.Long.compareUnsigned(x.getLeastSignificantBits, y.getLeastSignificantBits)
    case (VArr(x), VArr(y)) =>
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) { val (xa, ya) = it.next(); val c = cmp(xa, ya); if (c != 0) return c }
      x.length.compareTo(y.length)
    case (VSet(x), VSet(y)) =>
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) { val (xa, ya) = it.next(); val c = cmp(xa, ya); if (c != 0) return c }
      x.length.compareTo(y.length)
    case (VObj(x), VObj(y)) =>
      // BTreeMap lexicographic compare over (key, value) pairs
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) {
        val ((kx, vx), (ky, vy)) = it.next()
        val ck = kx.compareTo(ky); if (ck != 0) return ck
        val cv = cmp(vx, vy); if (cv != 0) return cv
      }
      x.size.compareTo(y.size)
    case (VBytes(x), VBytes(y)) =>
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) { val (xa, ya) = it.next()
        val c = java.lang.Integer.compare(xa & 0xff, ya & 0xff); if (c != 0) return c }
      x.length.compareTo(y.length)
    case (VTable(x), VTable(y)) => x.compareTo(y)
    case (VRid(tx, kx), VRid(ty, ky)) =>
      val c = tx.compareTo(ty); if (c != 0) c else cmp(kx, ky)
    case (VFile(bx, kx), VFile(by, ky)) =>
      val c = bx.compareTo(by); if (c != 0) c else kx.compareTo(ky)
    case (x: VRng, y: VRng) => cmpRange(x, y)
    case (VRegex(x), VRegex(y)) => x.compareTo(y)
    case (x: VGeom, y: VGeom) =>
      val r = Integer.compare(geomRank(x.kind), geomRank(y.kind))
      if (r != 0) r else cmp(x.coords, y.coords)
    case _ => a.typeTag.compareTo(b.typeTag)
  }

  private def cmpRange(a: VRng, b: VRng): Int = {
    // Bound ordering follows Rust's Bound<T> Ord: for the start bound,
    // Unbounded < Included(v) < Excluded(v); approximate with tuple compare.
    def boundKey(o: Option[(V, Boolean)], excludedRank: Int): (Int, V, Int) = o match {
      case scala.None => (0, VNone, 0)
      case Some((v, incl)) => (1, v, if (incl) 0 else excludedRank)
    }
    val (l1, v1, e1) = boundKey(a.lo, 1); val (l2, v2, e2) = boundKey(b.lo, 1)
    var c = l1.compareTo(l2); if (c != 0) return c
    c = cmp(v1, v2); if (c != 0) return c
    c = e1.compareTo(e2); if (c != 0) return c
    val (h1, w1, f1) = boundKey(a.hi, 1); val (h2, w2, f2) = boundKey(b.hi, 1)
    c = h1.compareTo(h2); if (c != 0) return c
    c = cmp(w1, w2); if (c != 0) return c
    f1.compareTo(f2)
  }

  /** Numeric total order across Int/Float/Decimal (number.rs:148+):
    * exact value comparison; NaN via IEEE total order (NaN > +Inf). */
  def cmpNum(a: VNum, b: VNum): Int = (a, b) match {
    case (VInt(x), VInt(y))     => java.lang.Long.compare(x, y)
    case (VFloat(x), VFloat(y)) => totalCmpF64(x, y)
    case (VDec(x), VDec(y))     => x.compare(y)
    case (x, y) =>
      // mixed: handle non-finite floats, else exact BigDecimal compare
      val xf = x match { case VFloat(d) if !java.lang.Double.isFinite(d) => Some(d); case _ => scala.None }
      val yf = y match { case VFloat(d) if !java.lang.Double.isFinite(d) => Some(d); case _ => scala.None }
      (xf, yf) match {
        case (Some(d), _) => if (d.isNaN || d > 0) 1 else -1
        case (_, Some(d)) => if (d.isNaN || d > 0) -1 else 1
        case _            => x.toBig.compare(y.toBig)
      }
  }

  private def totalCmpF64(a: Double, b: Double): Int =
    if (a == 0.0 && b == 0.0) 0
    else {
      // IEEE-754 totalOrder, as f64::total_cmp
      var x = java.lang.Double.doubleToRawLongBits(a)
      var y = java.lang.Double.doubleToRawLongBits(b)
      x = x ^ ((x >> 63) >>> 1)
      y = y ^ ((y >> 63) >>> 1)
      java.lang.Long.compare(x, y)
    }

  /** Loose equality `=` (val/mod.rs `equal`): same-type structural equality,
    * numbers compare by value across representations, string~regex matches. */
  def looseEq(a: V, b: V): Boolean = (a, b) match {
    case (VNone, VNone) => true
    case (VNull, VNull) => true
    case (x: VNum, y: VNum) => numEq(x, y)
    case (VStr(s), r: VRegex) => r.compiled.matcher(s).find()
    case (r: VRegex, VStr(s)) => r.compiled.matcher(s).find()
    case (VArr(x), VArr(y)) =>
      x.length == y.length && x.iterator.zip(y.iterator).forall { case (m, n) => looseEq(m, n) }
    case (VSet(x), VSet(y)) =>
      x.length == y.length && x.iterator.zip(y.iterator).forall { case (m, n) => looseEq(m, n) }
    case (VObj(x), VObj(y)) =>
      x.size == y.size && x.iterator.zip(y.iterator).forall {
        case ((kx, vx), (ky, vy)) => kx == ky && looseEq(vx, vy) }
    case (x, y) => x == y
  }

  /** Exact equality `==`: Rust PartialEq — like loose equality but without
    * the string~regex special case. */
  def exactEq(a: V, b: V): Boolean = (a, b) match {
    case (VStr(_), _: VRegex) | (_: VRegex, VStr(_)) => false
    case _ => looseEq(a, b)
  }

  /** Number equality across representations (number.rs PartialEq):
    * -0.0 == 0.0, NaN == NaN (total semantics within float). */
  def numEq(a: VNum, b: VNum): Boolean = (a, b) match {
    case (VInt(x), VInt(y))     => x == y
    case (VFloat(x), VFloat(y)) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y) ||
        (x == 0.0 && y == 0.0)
    case (VDec(x), VDec(y))     => x == y
    case (x, y)                 => cmpNum(x, y) == 0
  }
}
