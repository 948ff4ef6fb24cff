package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap

/** Scalar function registry — the Spark-independent twin of the reference's
  * `fnc/` dispatch (surrealdb: fnc/mod.rs:148-660). Each entry evaluates on
  * [[V]] values; the planner maps the same names onto Catalyst Columns where
  * queries run at table scale. Method-call syntax (`value.method()`)
  * dispatches per receiver type like fnc/mod.rs:666+. */
object Functions {

  /** Bridge into the shared UTF8String-based kernels ([[graft.functions]]). */
  private def u8(s: String): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  def call(name: String, argEs: Seq[Expr], env: Env): V = {
    // closure-taking functions evaluate args themselves
    name match {
      case "array::map" | "array::filter" | "array::filter_index" | "array::find" |
           "array::find_index" | "array::index_of" | "array::fold" | "array::reduce" |
           "array::any" | "array::includes" | "array::all" | "array::some" | "array::every" | "array::sort_by" =>
        return higherOrder(name, argEs.map(Eval.eval(_, env)), env)
      case n if n.startsWith("set::") && hofNames.contains("array::" + n.stripPrefix("set::")) =>
        return setHigherOrder(n.stripPrefix("set::"), argEs.map(Eval.eval(_, env)), env)
      case _ =>
    }
    val args = argEs.map(Eval.eval(_, env))
    apply(name, args, env)
  }

  def method(recv: V, name: String, argEs: Seq[Expr], env: Env): V = {
    // closure-valued object fields act as methods — built-in object methods
    // take priority (expr/part.rs Method)
    recv match {
      case VObj(fs) if !arity.contains("object::" + name) =>
        fs.get(name) match {
          case Some(c: VClosure) =>
            return applyClosure(c, argEs.map(Eval.eval(_, env)), env)
          case Some(_) if !arity.contains("type::" + name) && !name.startsWith("is_") && !name.startsWith("to_") =>
            throw SqlError(s"There was a problem running the $name() function. no such method found for the object type")
          case _ => ()
        }
      case _ => ()
    }
    val ns = recv match {
      case _: VArr   => "array"
      case _: VSet   => "set"
      case _: VStr   => "string"
      case _: VObj   => "object"
      case _: VNum   => "math"
      case _: VDur   => "duration"
      case _: VDt    => "time"
      case _: VRid   => "record"
      case _: VUuid  => "string"
      case _: VFile  => "file"
      case _: VBytes => "bytes"
      case _: VGeom  => "geo"
      case _         => "type"
    }
    val args = argEs.map(Eval.eval(_, env))
    val full = s"$ns::$name"
    if (hofNames.contains(full)) return higherOrder(full, recv +: args, env)
    if (ns == "set" && hofNames.contains("array::" + name))
      return setHigherOrder(name, recv +: args, env)
    try apply(full, recv +: args, env)
    catch {
      case e: SqlError if e.msg.startsWith("Unknown function") =>
        // GeoJSON-shaped objects answer geo:: methods (.area/.distance/…)
        val geoShaped = recv match {
          case _: VGeom => true
          case VObj(fs) => fs.contains("type") &&
            (fs.contains("coordinates") || fs.contains("geometries"))
          case _ => false
        }
        val geoName =
          if (name.startsWith("hash_")) "geo::hash::" + name.stripPrefix("hash_")
          else s"geo::$name"
        def typeFallback() =
          if (name.startsWith("is_"))
            // ns-local is:: family first (time::is::leap_year), then type::
            try apply(s"$ns::is::${name.drop(3)}", recv +: args, env)
            catch { case e3: SqlError if e3.msg.startsWith("Unknown function") =>
              apply(s"type::is::${name.drop(3)}", recv +: args, env) }
          else if (name.startsWith("to_")) apply(s"type::${name.drop(3)}", recv +: args, env)
          else apply(s"type::$name", recv +: args, env)
        if (geoShaped)
          try apply(geoName, recv +: args, env)
          catch { case e2: SqlError if e2.msg.startsWith("Unknown function") => typeFallback() }
        else typeFallback()
    }
  }

  private val hofNames = Set("array::map", "array::filter", "array::filter_index",
    "array::find", "array::find_index", "array::index_of", "array::fold", "array::reduce",
    "array::any", "array::includes", "array::all", "array::some", "array::every", "array::sort_by")

  /** set:: closure-taking functions: the array HOF over the set's items,
    * with set-shaped results re-sorted/deduped. */
  private def setHigherOrder(op: String, args: Seq[V], env: Env): V = {
    val items = args.head match {
      case VSet(i) => i
      case VArr(i) => V.set(i).items
      case other => throw SqlError(
        s"Incorrect arguments for function set::$op(). Argument 1 was the wrong type. " +
          s"Expected `set` but found `${other.render}`")
    }
    val res = higherOrder("array::" + op, VArr(items) +: args.tail, env)
    op match {
      case "map" | "filter" | "filter_index" | "sort_by" => res match {
        case VArr(i) => V.set(i)
        case x => x
      }
      case _ => res
    }
  }

  private def applyClosure(c: V, args: Seq[V], env: Env): V = c match {
    case VClosure(params, body, retK, captured) =>
      var e = env.copy(params = env.params ++ captured)
      params.zipWithIndex.foreach { case ((pname, pk), i) =>
        val av = if (i < args.length) args(i) else VNone
        val coerced = pk.map { k =>
          try Coerce.coerce(k, av)
          catch {
            case _: SqlError => throw SqlError(
              s"Incorrect arguments for function ANONYMOUS(). Expected a value of type '${Explain.kindSql(k)}' for argument $$$pname")
          }
        }.getOrElse(av)
        e = e.bind(pname, coerced)
      }
      val out =
        try Eval.eval(body, e)
        catch {
          // a closure is a control-flow boundary: break/continue cannot escape
          case BreakSignal | ContinueSignal =>
            throw SqlError("Invalid control flow statement, break or continue statement found outside of loop.")
        }
      retK match {
        case Some(k) =>
          try Coerce.coerce(k, out)
          catch {
            case e2: SqlError => throw SqlError(
              s"Couldn't coerce return value from function `ANONYMOUS`: ${e2.msg}")
          }
        case scala.None => out
      }
    case _ => throw SqlError("Expected a function argument")
  }

  /** Public closure application (IIFE `(|| …)()`, `$fn(args)`). */
  def callClosure(c: V, args: Seq[V], env: Env): V = applyClosure(c, args, env)

  private val hofArity: Map[String, (Int, Int)] = Map(
    "array::map" -> (2, 2), "array::filter" -> (2, 2), "array::filter_index" -> (2, 2),
    "array::find" -> (2, 2), "array::find_index" -> (2, 2), "array::index_of" -> (2, 2),
    "array::fold" -> (3, 3), "array::reduce" -> (2, 2),
    "array::any" -> (1, 2), "array::includes" -> (1, 2), "array::all" -> (1, 2),
    "array::some" -> (2, 2), "array::every" -> (2, 2), "array::sort_by" -> (2, 2))

  private def higherOrder(name: String, args: Seq[V], env: Env): V = {
    hofArity.get(name).foreach { case (lo, hi) =>
      if (args.length < lo || args.length > hi) {
        val msg = if (hi == lo) { if (hi == 1) "Expected 1 argument" else s"Expected $hi arguments" }
          else s"Expected $lo to $hi arguments"
        throw SqlError(s"Incorrect arguments for function $name(). $msg")
      }
    }
    def arr = args.head match {
      case VArr(items) => items
      case VSet(items) => items
      case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 1 was the wrong type. Expected `array` but found `${other.render}`")
    }
    name match {
      case "array::map" =>
        VArr(arr.zipWithIndex.map { case (el, i) => applyClosure(args(1), Seq(el, VInt(i)), env) })
      case "array::filter" =>
        VArr(arr.filter(el => matchesFilter(args(1), el, env)))
      case "array::filter_index" =>
        VArr(arr.zipWithIndex.collect { case (el, i) if matchesFilter(args(1), el, env) => VInt(i) })
      case "array::find" =>
        arr.find(el => matchesFilter(args(1), el, env)).getOrElse(VNone)
      case "array::find_index" | "array::index_of" =>
        arr.zipWithIndex.find { case (el, _) => matchesFilter(args(1), el, env) }
          .map(p => VInt(p._2)).getOrElse(VNone)
      case "array::fold" =>
        var acc = args(1)
        arr.zipWithIndex.foreach { case (el, i) => acc = applyClosure(args(2), Seq(acc, el, VInt(i)), env) }
        acc
      case "array::reduce" =>
        if (arr.isEmpty) VNone
        else {
          var acc = arr.head
          arr.tail.zipWithIndex.foreach { case (el, i) => acc = applyClosure(args(1), Seq(acc, el, VInt(i)), env) }
          acc
        }
      case "array::any" | "array::includes" | "array::some" =>
        if (args.length < 2) VBool(arr.exists(_.truthy))
        else VBool(arr.exists(el => matchesFilter(args(1), el, env)))
      case "array::all" | "array::every" =>
        if (args.length < 2) VBool(arr.forall(_.truthy))
        else VBool(arr.forall(el => matchesFilter(args(1), el, env)))
      case "array::sort_by" =>
        VArr(arr.sortBy(el => applyClosure(args(1), Seq(el), env))(V.ordering))
      case _ => throw SqlError(s"Unknown function $name")
    }
  }

  /** array::any/all value-argument check: Rust `*v == value` — EXACT
    * equality, not the loose `=` operator (fnc/array.rs:71,95), so a regex
    * value only matches a regex element, never a matching string. */
  private def matchesFilter(f: V, el: V, env: Env): Boolean = f match {
    case c: VClosure => applyClosure(c, Seq(el), env).truthy
    case value       => V.exactEq(value, el)
  }

  // ---- main dispatch ---------------------------------------------------

  /** Arity table: name → (min, max); max = -1 is unbounded. Mirrors the
    * reference's FromArgs arity checks (fnc/args.rs:150-225). */
  private val arity: Map[String, (Int, Int)] = Map(
    "count" -> (0, 1), "not" -> (1, 1), "sleep" -> (1, 1),
    "array::add" -> (2, 2), "array::append" -> (2, 2), "array::push" -> (2, 2),
    "array::prepend" -> (2, 2), "array::at" -> (2, 2),
    "array::boolean_and" -> (2, 2), "array::boolean_or" -> (2, 2),
    "array::boolean_xor" -> (2, 2), "array::boolean_not" -> (1, 1),
    "array::logical_and" -> (2, 2), "array::logical_or" -> (2, 2),
    "array::logical_xor" -> (2, 2),
    "array::combine" -> (2, 2), "array::complement" -> (2, 2),
    "array::clump" -> (2, 2), "array::difference" -> (2, 2),
    "array::distinct" -> (1, 1), "array::fill" -> (2, 4),
    "array::first" -> (1, 1), "array::flatten" -> (1, 1),
    "array::group" -> (1, 1), "array::insert" -> (2, 3),
    "array::intersect" -> (2, 2), "array::is_empty" -> (1, 1),
    "array::join" -> (2, 2), "array::last" -> (1, 1), "array::len" -> (1, 1),
    "array::max" -> (1, 1), "array::min" -> (1, 1), "array::matches" -> (2, 2),
    "array::pop" -> (1, 1), "array::range" -> (1, 2), "array::remove" -> (2, 2),
    "array::repeat" -> (2, 2), "array::reverse" -> (1, 1),
    "array::sequence" -> (1, 2), "array::shuffle" -> (1, 1),
    "array::slice" -> (1, 3), "array::sort" -> (1, 2),
    "array::sort::asc" -> (1, 1), "array::sort::desc" -> (1, 1),
    "array::sort_natural" -> (1, 2), "array::sort_lexical" -> (1, 2),
    "array::sort_natural_lexical" -> (1, 2),
    "array::swap" -> (3, 3), "array::transpose" -> (1, 1),
    "array::union" -> (2, 2), "array::windows" -> (2, 2),
    "bytes::len" -> (1, 1),
    "object::entries" -> (1, 1), "object::from_entries" -> (1, 1),
    "object::keys" -> (1, 1), "object::values" -> (1, 1), "object::len" -> (1, 1),
    "object::is_empty" -> (1, 1), "object::extend" -> (2, 2), "object::remove" -> (2, 2),
    "string::concat" -> (0, -1), "string::contains" -> (2, 2),
    "string::ends_with" -> (2, 2), "string::starts_with" -> (2, 2),
    "string::join" -> (1, -1), "string::len" -> (1, 1),
    "string::lowercase" -> (1, 1), "string::uppercase" -> (1, 1),
    "string::capitalize" -> (1, 1), "string::repeat" -> (2, 2),
    "string::replace" -> (3, 3), "string::reverse" -> (1, 1),
    "string::slice" -> (1, 3), "string::split" -> (2, 2),
    "string::trim" -> (1, 1), "string::words" -> (1, 1),
    "string::matches" -> (2, 2), "string::slug" -> (1, 1),
    "math::abs" -> (1, 1), "math::ceil" -> (1, 1), "math::floor" -> (1, 1),
    "math::round" -> (1, 1), "math::sqrt" -> (1, 1), "math::pow" -> (2, 2),
    "math::clamp" -> (3, 3), "math::fixed" -> (2, 2), "math::lerp" -> (3, 3),
    "math::max" -> (1, 1), "math::min" -> (1, 1), "math::sum" -> (1, 1),
    "math::product" -> (1, 1), "math::mean" -> (1, 1), "math::median" -> (1, 1),
    "math::mode" -> (1, 1), "math::stddev" -> (1, 1), "math::variance" -> (1, 1),
    "math::spread" -> (1, 1), "math::top" -> (2, 2), "math::bottom" -> (2, 2),
    "math::percentile" -> (2, 2), "math::nearestrank" -> (2, 2),
    "duration::days" -> (1, 1), "duration::hours" -> (1, 1), "duration::mins" -> (1, 1),
    "duration::secs" -> (1, 1), "duration::weeks" -> (1, 1), "duration::years" -> (1, 1),
    "duration::millis" -> (1, 1), "duration::micros" -> (1, 1), "duration::nanos" -> (1, 1),
    "time::day" -> (1, 1), "time::month" -> (1, 1), "time::year" -> (1, 1),
    "time::hour" -> (1, 1), "time::minute" -> (1, 1), "time::second" -> (1, 1),
    "time::unix" -> (1, 1), "time::floor" -> (2, 2), "time::ceil" -> (2, 2),
    "time::round" -> (2, 2), "time::group" -> (2, 2), "time::format" -> (2, 2),
    "type::of" -> (1, 1), "type::type_of" -> (1, 1), "type::file" -> (2, 2),
    "record::is_edge" -> (1, 1), "schema::table::exists" -> (1, 1),
    "rand::id" -> (0, 2), "sequence::nextval" -> (1, 1),
    "type::string" -> (1, 1), "type::int" -> (1, 1),
    "type::float" -> (1, 1), "type::decimal" -> (1, 1), "type::number" -> (1, 1),
    "type::bool" -> (1, 1), "type::bytes" -> (1, 1),
    "record::id" -> (1, 1), "record::tb" -> (1, 1), "record::table" -> (1, 1),
    "vector::add" -> (2, 2), "vector::subtract" -> (2, 2), "vector::multiply" -> (2, 2),
    "vector::divide" -> (2, 2), "vector::dot" -> (2, 2), "vector::magnitude" -> (1, 1),
    "vector::normalize" -> (1, 1), "vector::angle" -> (2, 2), "vector::cross" -> (2, 2),
    "vector::project" -> (2, 2), "vector::scale" -> (2, 2),
    "value::diff" -> (2, 2), "value::patch" -> (2, 2))

  private def checkArity(name: String, n: Int): Unit =
    arity.get(name).foreach { case (lo, hi) =>
      if (n < lo || (hi >= 0 && n > hi)) {
        val msg =
          if (hi == lo) {
            if (hi == 0) "Expected no arguments"
            else if (hi == 1) "Expected 1 argument"
            else s"Expected $hi arguments"
          } else if (hi < 0) {
            if (lo == 0) "Expected zero or more arguments"
            else s"Expected $lo or more arguments"
          } else s"Expected $lo to $hi arguments"
        throw SqlError(s"Incorrect arguments for function $name(). $msg")
      }
    }

  /** Flat-alias canonicalization: string::is_alphanum → string::is::alphanum,
    * string::semver_inc_major → string::semver::inc::major, … (fnc/mod.rs
    * flat-name table). Shared by the interpreter's dispatch AND the Spark
    * path's fnCol so both engines accept the same surface. */
  def normalize(name0: String): String =
    if (name0.startsWith("string::is_")) "string::is::" + name0.stripPrefix("string::is_")
    else if (name0.startsWith("string::distance_")) "string::distance::" + name0.stripPrefix("string::distance_")
    else if (name0.startsWith("string::similarity_")) "string::similarity::" + name0.stripPrefix("string::similarity_")
    else if (name0.startsWith("string::html_")) "string::html::" + name0.stripPrefix("string::html_")
    else if (name0.startsWith("string::semver_inc_")) "string::semver::inc::" + name0.stripPrefix("string::semver_inc_")
    else if (name0.startsWith("string::semver_set_")) "string::semver::set::" + name0.stripPrefix("string::semver_set_")
    else if (name0.startsWith("string::semver_")) "string::semver::" + name0.stripPrefix("string::semver_")
    else if (name0.startsWith("array::vector_distance_")) "vector::distance::" + name0.stripPrefix("array::vector_distance_")
    else if (name0.startsWith("array::vector_similarity_")) "vector::similarity::" + name0.stripPrefix("array::vector_similarity_")
    else if (name0.startsWith("array::vector_")) "vector::" + name0.stripPrefix("array::vector_")
    else if (name0 == "array::sort_asc") "array::sort::asc"
    else if (name0 == "array::sort_desc") "array::sort::desc"
    else if (name0 == "geo::is::valid") "geo::is_valid"
    // flat time::from_* aliases (syn/parser/builtin.rs:395-401)
    else if (name0.startsWith("time::from_")) "time::from::" + name0.stripPrefix("time::from_")
    else name0

  def apply(name0: String, a: Seq[V], env: Env): V = {
    val name = normalize(name0)
    // capability gate: [env.capabilities] deny-functions
    // (iam: Capabilities::allows_function)
    env.interp.foreach { in =>
      if (in.capDenyFunctions.contains(name) || in.capDenyFunctions.contains(name0))
        throw SqlError(s"Function '$name0' is not allowed to be executed")
    }
    checkArity(name, a.length)
    def arg(i: Int): V = if (i < a.length) a(i) else VNone
    def typeErr(i: Int, expected: String, found: V): Nothing =
      throw SqlError(s"Incorrect arguments for function $name(). Argument ${i + 1} was the wrong type. " +
        s"Expected `$expected` but found `${found.render}`")
    def str(i: Int): String = arg(i) match {
      case VStr(s) => s
      case other => typeErr(i, "string", other)
    }
    def num(i: Int): VNum = arg(i) match {
      case n: VNum => n
      case other => typeErr(i, "number", other)
    }
    def int(i: Int): Long = arg(i) match {
      case VInt(v) => v
      case VFloat(d) if d == Math.rint(d) && !d.isInfinity => d.toLong
      case VDec(d) if d.isWhole => d.toLong
      case other => typeErr(i, "int", other)
    }
    def dbl(i: Int): Double = num(i).toDouble
    def arr(i: Int): Vector[V] = arg(i) match {
      case VArr(items) => items
      case VSet(items) => items
      case other => typeErr(i, "array", other)
    }
    def obj(i: Int): TreeMap[String, V] = arg(i) match {
      case VObj(fs) => fs
      case other => typeErr(i, "object", other)
    }
    // GeoJSON objects coerce to geometry in geo:: argument positions
    def geom(i: Int): VGeom = arg(i) match {
      case g: VGeom => g
      case VObj(fs) if fs.contains("type") && fs.contains("coordinates") =>
        fs("type") match {
          case VStr(t) => VGeom(t, fs("coordinates"))
          case _ => typeErr(i, "geometry", arg(i))
        }
      case other => typeErr(i, "geometry", other)
    }
    def nums(i: Int): Vector[Double] = arr(i).map {
      case n: VNum => n.toDouble
      case other => typeErr(i, "number", other) // element-level mismatch (fnc args Vec<Number>)
    }
    // typed variant, same suffix-free error text: the aggregate/view
    // evaluation path pins "Expected `number` but found `x`" WITHOUT the
    // ElementOf suffix (golden view/all_rolling), since the reference's
    // aggregators coerce per value rather than through Vec<Number>
    def numsV(i: Int): Vector[VNum] = arr(i).map {
      case n: VNum => n
      case other => typeErr(i, "number", other)
    }

    // ---- file:: object-store namespace (fnc/file.rs over buc/) ----------
    if (name.startsWith("file::")) return fileFn(name, a, env)
    name match {
      // ---- top-level ---------------------------------------------------
      case "__set__" => V.set(a)
      case "__point__" =>
        // geometry coordinates are always f64 (geo-types)
        VGeom("Point", VArr(Vector(VFloat(num(0).toDouble), VFloat(num(1).toDouble))))
      case "__explain__" => VArr(Vector.empty) // plan output is engine-specific
      case "__mock__" =>
        val tb = str(0)
        arg(2) match {
          case VInt(hi) => VArr((int(1) to hi).map(i => VRid(tb, VInt(i))).toVector)
          case _ =>
            VArr((1L to int(1)).map(_ => VRid(tb, VStr(Interp.randomId()))).toVector)
        }
      case "__mock_range__" =>
        val tb = str(0)
        arg(1) match {
          case VRng(lo, hi) =>
            val start = lo match {
              case Some((VInt(l), incl)) => if (incl) l else l + 1
              case _ => Long.MinValue
            }
            val end = hi match {
              case Some((VInt(h), incl)) => if (incl) h else h - 1
              case _ => Long.MaxValue
            }
            val count = BigInt(end) - BigInt(start) + 1
            if (count > 1000000)
              throw SqlError("Mock range exceeds allocation limit")
            VArr((start to end).map(i => VRid(tb, VInt(i))).toVector)
          case other => typeErr(1, "range", other)
        }
      case "count" =>
        if (a.isEmpty) VInt(1)
        else arg(0) match {
          case VArr(items) => VInt(items.count(_.truthy))
          case VSet(items) => VInt(items.count(_.truthy))
          case v => VInt(if (v.truthy) 1 else 0)
        }
      case "not" => VBool(!arg(0).truthy)
      case "sleep" =>
        // real wall-clock sleep (capped) — VERSION tests separate writes in
        // time; under an api::timeout deadline the sleep is cancelled at the
        // deadline ("deadline has elapsed", fnc/api timeout semantics)
        arg(0) match {
          case VDur(s, n) =>
            val ms = Math.min(s * 1000L + n / 1000000L, 2000L)
            env.interp.flatMap(_.apiDeadline) match {
              case Some((dl, _)) =>
                val remain = java.time.Duration.between(java.time.Instant.now(), dl).toMillis
                if (remain <= 0 || ms > remain) {
                  if (remain > 0) Thread.sleep(remain)
                  throw Api.ApiErr("deadline has elapsed")
                } else if (ms > 0) Thread.sleep(ms)
              case scala.None => if (ms > 0) Thread.sleep(ms)
            }
          case _ => ()
        }
        VNone

      // ---- math --------------------------------------------------------
      case "math::abs" => num(0) match {
        case VInt(v) =>
          if (v == Long.MinValue)
            throw SqlError("Failed to compute: \"math::abs(-9223372036854775808)\", as the operation results in an arithmetic overflow.")
          VInt(Math.abs(v))
        case VFloat(d) => VFloat(Math.abs(d))
        case VDec(d) => VDec(d.abs)
      }
      case "math::acos" => VFloat(Math.acos(dbl(0)))
      case "math::asin" => VFloat(Math.asin(dbl(0)))
      case "math::atan" => VFloat(Math.atan(dbl(0)))
      // acot = PI/2 - atan(x) (val/number.rs:464) — NOT atan(1/x), which
      // lands in the wrong quadrant for negative inputs (r19 sweep)
      case "math::acot" => VFloat(Math.PI / 2.0 - Math.atan(dbl(0)))
      case "math::cos" => VFloat(Math.cos(dbl(0)))
      case "math::sin" => VFloat(Math.sin(dbl(0)))
      case "math::tan" => VFloat(Math.tan(dbl(0)))
      case "math::cot" => VFloat(1.0 / Math.tan(dbl(0)))
      case "math::deg2rad" => VFloat(Math.toRadians(dbl(0)))
      case "math::rad2deg" => VFloat(Math.toDegrees(dbl(0)))
      case "math::ceil" => num(0) match {
        case i: VInt => i
        case VFloat(d) => VFloat(Math.ceil(d))
        case VDec(d) => VDec(d.setScale(0, BigDecimal.RoundingMode.CEILING))
      }
      case "math::floor" => num(0) match {
        case i: VInt => i
        case VFloat(d) => VFloat(Math.floor(d))
        case VDec(d) => VDec(d.setScale(0, BigDecimal.RoundingMode.FLOOR))
      }
      case "math::round" => num(0) match {
        case i: VInt => i
        // Rust f64::round (val/number.rs:578): half AWAY from zero (Java
        // Math.round is half toward +inf: round(-2.5) = -2, Rust = -3) and
        // sign-of-zero preserving (round(-0.2) = -0.0).
        case VFloat(d) => VFloat(graft.functions.RoundRs.round(d))
        // rust_decimal round() = round_dp(0) = BANKER'S rounding
        // (MidpointNearestEven), NOT half-up: 2.5dec → 2dec (r18 sweep)
        case VDec(d) => VDec(d.setScale(0, BigDecimal.RoundingMode.HALF_EVEN))
      }
      case "math::clamp" =>
        val v = num(0); val lo = num(1); val hi = num(2)
        if (V.cmpNum(lo, hi) > 0)
          throw SqlError("Incorrect arguments for function math::clamp(). Lowerbound for clamp must be smaller than the upperbound")
        // typed per val/number.rs:475-482: all-int stays int, a decimal
        // SELF computes in decimal, everything else (incl. an int self
        // with float bounds, even in range) promotes to FLOAT (r19 sweep)
        (v, lo, hi) match {
          case (VInt(n), VInt(l), VInt(h)) => VInt(Math.min(Math.max(n, l), h))
          case (VDec(n), _, _) =>
            VDec(n.max(lo.toBig).min(hi.toBig))
          case _ =>
            VFloat(Math.min(Math.max(v.toDouble, lo.toDouble), hi.toDouble))
        }
      case "math::fixed" =>
        if (int(1) <= 0)
          throw SqlError("Incorrect arguments for function math::fixed(). The second argument must be an integer greater than 0.")
        val places = int(1).toInt
        // val/number.rs:583-588 ("this is so cursed"): Int/Float format
        // through "{v:.p}" and PARSE BACK — so an Int becomes a FLOAT
        // ("5.00" fails i64, parses f64), rounding is on the EXACT binary
        // value with Rust float formatting's ties-to-even (2.675 at p=2 is
        // exactly 2.67499…, so "2.67" — canonical-string BigDecimal would
        // say 2.68), and NaN/inf round-trip through "NaN"/"inf". Decimals
        // use rust_decimal round_dp: banker's rounding, and a scale
        // SHORTER than p stays unchanged (no zero-padding).
        num(0) match {
          case i: VInt => VFloat(i.i.toDouble)
          case VFloat(d) =>
            if (d.isNaN || d.isInfinite) VFloat(d)
            else VFloat(BigDecimal(new java.math.BigDecimal(d))
              .setScale(places, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
          case VDec(d) =>
            VDec(if (d.scale > places)
              d.setScale(places, BigDecimal.RoundingMode.HALF_EVEN) else d)
        }
      case "math::lerp" => num(2) match {
        // a DECIMAL factor computes in decimal (val/number.rs:512-521)
        case VDec(f) =>
          val (fr, to) = (num(0).toBig, num(1).toBig)
          VDec(fr + f * (to - fr))
        case f => VFloat(dbl(0) + (dbl(1) - dbl(0)) * f.toDouble)
      }
      case "math::lerpangle" =>
        // val/number.rs:531-553: dt = repeat(to-from, 360) in [0,360]; if
        // dt > 180 it becomes 360-dt but keeps its POSITIVE sign — so the
        // interpolation always walks counterclockwise from `from`, even
        // when the short way is down (reference quirk, kept; r19 sweep)
        val (from, to, t) = (dbl(0), dbl(1), dbl(2))
        def repeat(x: Double, m: Double) =
          Math.min(Math.max(x - Math.floor(x / m) * m, 0.0), m)
        var dt = repeat(to - from, 360.0)
        if (dt > 180.0) dt = 360.0 - dt
        num(2) match {
          case VDec(f) =>
            val frD = num(0).toBig
            VDec(frD + f * (VFloat(from + dt).toBig - frD))
          case _ => VFloat(from + dt * t)
        }
      case "math::ln" => VFloat(Math.log(dbl(0)))
      case "math::log" => VFloat(Math.log(dbl(0)) / Math.log(dbl(1)))
      case "math::log10" => VFloat(Math.log10(dbl(0)))
      case "math::log2" => VFloat(Math.log(dbl(0)) / Math.log(2.0))
      case "math::sign" => num(0) match {
        case VInt(v) => VInt(java.lang.Long.signum(v))
        // Rust f64::signum (val/number.rs:596, golden math/sign.surql):
        // FLOAT result; ±1.0 even for ±0.0 (copysign), NaN passes through —
        // Java Math.signum would return ±0.0 for zeros
        case VFloat(d) => VFloat(if (d.isNaN) d else Math.copySign(1.0, d))
        case VDec(d) => VDec(BigDecimal(d.signum))
      }
      case "math::sqrt" => num(0) match {
        // a decimal sqrt STAYS decimal (val/number.rs:608-613 rust_decimal
        // sqrt; negative decimals hit fnc/math.rs's NaN arm first)
        case VDec(d) if d.signum >= 0 =>
          VDec(BigDecimal(d.underlying.sqrt(new java.math.MathContext(28))))
        case n => VFloat(Math.sqrt(n.toDouble))
      }
      case "math::pow" => Ops.numPow(num(0), num(1))
      case "math::max" =>
        val items = arr(0)
        // empty input yields -inf (fnc/math.rs:124-128)
        if (items.isEmpty) VFloat(Double.NegativeInfinity) else items.max(V.ordering)
      case "math::min" =>
        val items = arr(0)
        // empty input yields +inf (fnc/math.rs:147-151)
        if (items.isEmpty) VFloat(Double.PositiveInfinity) else items.min(V.ordering)
      case "math::sum" =>
        // Vec<Number> coercion: a non-number element ERRORS (it never
        // silently skips — r19 sweep)
        numsV(0).foldLeft[V](VInt(0))(Ops.add)
      case "math::product" =>
        numsV(0).foldLeft[V](VInt(1))(Ops.mul)
      case "math::mean" =>
        // util/math/mod.rs:53-67: the sum starts as FLOAT 0.0 and promotes
        // through Number addition — any decimal in the array promotes the
        // whole mean to decimal (r19 sweep)
        val items = numsV(0)
        if (items.isEmpty) VFloat(Double.NaN)
        else if (items.exists(_.isInstanceOf[VDec]))
          VDec(items.map(_.toBig).reduce(_ + _) / BigDecimal(items.length))
        else {
          val ns = items.map(_.toDouble)
          VFloat(ns.sum / ns.length)
        }
      case "math::median" =>
        val ns = nums(0).sorted
        if (ns.isEmpty) VNone
        else if (ns.length % 2 == 1) VFloat(ns(ns.length / 2))
        else VFloat((ns(ns.length / 2 - 1) + ns(ns.length / 2)) / 2.0)
      case "math::mode" =>
        // util/math/mode.rs: BTreeMap frequencies + max_by_key — the
        // result keeps the NUMBER TYPE of the first-seen key form, and a
        // frequency tie picks the LARGEST value (last max in key order)
        val items = numsV(0)
        if (items.isEmpty) VFloat(Double.NaN)
        else {
          val buf = scala.collection.mutable.ArrayBuffer[(VNum, Int)]()
          items.foreach { n =>
            val i = buf.indexWhere(p => V.cmpNum(p._1, n) == 0)
            if (i < 0) buf += ((n, 1)) else buf(i) = (buf(i)._1, buf(i)._2 + 1)
          }
          val sorted = buf.sortWith((x, y) => V.cmpNum(x._1, y._1) < 0)
          var best = sorted.head
          sorted.foreach { p => if (p._2 >= best._2) best = p }
          best._1
        }
      case "math::stddev" =>
        // len 0 → NaN, len 1 → 0 (fnc/util/math/mod.rs variance). View
        // maintenance uses the ROLLING sum/sum-of-squares formula, whose
        // float cancellation artifacts are part of the observable result
        // (catalog/aggregation.rs:454 — view/stddev_variance_rolling).
        val ns = nums(0)
        if (ns.isEmpty) VFloat(Double.NaN)
        else if (ns.length == 1) VFloat(0.0)
        else if (env.interp.exists(_.viewAggMode)) {
          val v = rollingVariance(ns)
          VFloat(if (v == 0.0) 0.0 else Math.sqrt(v))
        } else {
          val m = ns.sum / ns.length
          VFloat(Math.sqrt(ns.map(x => (x - m) * (x - m)).sum / (ns.length - 1)))
        }
      case "math::variance" =>
        val ns = nums(0)
        if (ns.isEmpty) VFloat(Double.NaN)
        else if (ns.length == 1) VFloat(0.0)
        else if (env.interp.exists(_.viewAggMode)) VFloat(rollingVariance(ns))
        else { val m = ns.sum / ns.length; VFloat(ns.map(x => (x - m) * (x - m)).sum / (ns.length - 1)) }
      case "math::spread" =>
        // util/math/spread.rs: TYPED max - min (ints stay int)
        val items = numsV(0)
        if (items.isEmpty) VFloat(Double.NaN)
        else Ops.sub(items.max(V.ordering), items.min(V.ordering))
      case "math::midhinge" =>
        val ns = nums(0)
        if (ns.isEmpty) VFloat(Double.NaN)
        else VFloat((percentile(ns, 25) + percentile(ns, 75)) / 2.0)
      case "math::trimean" =>
        val ns = nums(0)
        if (ns.isEmpty) VFloat(Double.NaN)
        else VFloat((percentile(ns, 25) + 2 * percentile(ns, 50) + percentile(ns, 75)) / 4.0)
      case "math::percentile" =>
        val ns = nums(0)
        val p0 = dbl(1)
        if (ns.isEmpty || p0 < 0.0 || p0 > 100.0) VFloat(Double.NaN)
        else VFloat(percentile(ns, p0))
      case "math::nearestrank" =>
        // util/math/nearestrank.rs: idx = trunc(len * p/100) clamped to
        // len-1, returning the TYPED element; p outside 0..=100 is NaN
        val items = numsV(0).sorted(V.ordering)
        val p0 = dbl(1)
        if (items.isEmpty || p0 < 0.0 || p0 > 100.0) VFloat(Double.NaN)
        else items(Math.min((items.length * (p0 / 100.0)).toInt, items.length - 1))
      case "math::top" =>
        if (int(1) <= 0) throw SqlError("Incorrect arguments for function math::top(). The second argument must be an integer greater than 0.")
        heapSelect(nums2(arr(0), name), int(1).toInt, smallestOut = true)
      case "math::bottom" =>
        if (int(1) <= 0) throw SqlError("Incorrect arguments for function math::bottom(). The second argument must be an integer greater than 0.")
        heapSelect(nums2(arr(0), name), int(1).toInt, smallestOut = false)
      case "math::interquartile" =>
        val ns = nums(0)
        if (ns.isEmpty) VFloat(Double.NaN)
        else VFloat(percentile(ns, 75) - percentile(ns, 25))

      // ---- string ------------------------------------------------------
      case "string::concat" => VStr(a.map(_.renderRaw).mkString)
      case "string::contains" => VBool(str(0).contains(str(1)))
      case "string::ends_with" | "string::endsWith" => VBool(str(0).endsWith(str(1)))
      case "string::starts_with" | "string::startsWith" => VBool(str(0).startsWith(str(1)))
      case "string::join" =>
        val sep = str(0)
        VStr(a.drop(1).flatMap {
          case VArr(items) => items.map(_.renderRaw)
          case v => Seq(v.renderRaw)
        }.mkString(sep))
      case "string::len" => VInt(str(0).codePointCount(0, str(0).length))
      case "string::lowercase" => VStr(str(0).toLowerCase)
      case "string::uppercase" => VStr(str(0).toUpperCase)
      case "string::capitalize" =>
        // title-case (string.rs capitalize) — shared kernel, so the Spark
        // column lowering is definitionally identical
        VStr(graft.functions.StrCheck.capitalize(
          org.apache.spark.unsafe.types.UTF8String.fromString(str(0))).toString)
      case "string::repeat" => VStr(str(0) * int(1).toInt)
      case "string::replace" =>
        val limit = 1048576
        def sizeCheck(n: Int): Unit =
          if (n > limit) throw SqlError(
            s"Incorrect arguments for function string::replace(). Output must not exceed $limit bytes.")
        arg(1) match {
          case r: VRegex =>
            val v = str(0); val rep = str(2)
            val sb = new StringBuilder
            val m = r.compiled.matcher(v)
            var last = 0
            while (m.find()) {
              // (substring, not append(v, i, j) — Scala auto-tuples the
              // 3-arg call into appending a tuple render; r17 sweep catch)
              sb.append(v.substring(last, m.start())).append(rep)
              sizeCheck(sb.length)
              last = m.end()
              if (m.end() == m.start()) { // zero-width: advance to avoid stalls
                if (last < v.length) sb.append(v.charAt(last))
                last += 1
                if (last > v.length) last = v.length
              }
            }
            sb.append(v.substring(last, v.length))
            sizeCheck(sb.length)
            VStr(sb.toString)
          case _ =>
            val (v, search, rep) = (str(0), str(1), str(2))
            if (rep.length > search.length && search.nonEmpty) {
              val count = v.sliding(search.length).count(_ == search)
              sizeCheck(v.length + count * (rep.length - search.length))
            }
            VStr(v.replace(search, rep))
        }
      case "string::reverse" => VStr(str(0).reverse)
      case "string::slice" =>
        // fnc/string.rs:171: [start, END) INDEX semantics — the same
        // TypedRange resolve as array::slice — negatives wrap on both
        // bounds (the r17 sweep caught the old 2.x-era LENGTH third arg)
        val s = str(0)
        val cps = s.codePoints().toArray
        val len = cps.length.toLong
        var from = if (a.length > 1) int(1) else 0L
        if (from < 0) from += len
        var until = if (a.length > 2) int(2) else len
        if (until < 0) until += len
        from = Math.max(0, Math.min(len, from))
        until = Math.max(0, Math.min(len, until))
        if (from >= until) VStr("")
        else {
          val out = cps.slice(from.toInt, until.toInt)
          VStr(new String(out, 0, out.length))
        }
      case "string::split" =>
        VArr(str(0).split(java.util.regex.Pattern.quote(str(1)), -1).toVector.map(VStr(_)))
      case "string::trim" => VStr(str(0).trim)
      // split_whitespace splits on the UNICODE White_Space set (r20 sweep:
      // Java's \s is ASCII-only — NBSP/ideographic spaces didn't split)
      case "string::words" =>
        VArr(graft.functions.StrSim.wordsList(str(0)).map(VStr(_): V))
      case "string::matches" => arg(1) match {
        case r: VRegex => VBool(r.compiled.matcher(str(0)).find())
        case _         => VBool(VRegex(str(1)).compiled.matcher(str(0)).find())
      }
      // the reference's slug deunicodes FIRST and keeps underscores
      // (fnc/util/string/slug.rs; r20 sweep — "café" must slug to "cafe",
      // not "caf", and "a_b" stays "a_b"); shared kernel with Spark
      case "string::slug" => VStr(graft.functions.StrSim.slugStr(str(0)))
      // the whole distance/similarity family delegates to the SHARED
      // StrSim statics — the exact code the Spark kernels codegen into —
      // so both engines agree definitionally: Unicode-scalar iteration,
      // strsim-crate semantics, and the reference's STRING_SIMILARITY_LIMIT
      // DoS guard (fnc/string.rs:28, r18)
      case "string::distance::levenshtein" =>
        VInt(graft.functions.StrSim.levenshtein(u8(str(0)), u8(str(1))))
      // optimal string alignment — Damerau RESTRICTED to non-overlapping
      // adjacent transpositions (strsim::osa_distance; fnc/string.rs:372)
      case "string::distance::osa" | "string::distance::osa_distance" =>
        VInt(graft.functions.StrSim.osa(u8(str(0)), u8(str(1))))
      case "string::distance::damerau_levenshtein" =>
        VInt(graft.functions.StrSim.damerauLevenshtein(u8(str(0)), u8(str(1))))
      case "string::distance::normalized_levenshtein" =>
        VFloat(graft.functions.StrSim.normalizedLevenshtein(u8(str(0)), u8(str(1))))
      case "string::distance::normalized_damerau_levenshtein" =>
        VFloat(graft.functions.StrSim.normalizedDamerau(u8(str(0)), u8(str(1))))
      case "string::similarity::sorensen_dice" =>
        // strsim::sorensen_dice EXACTLY (fnc/string.rs:597): whitespace is
        // removed from the STRINGS first (not filtered per-bigram — the r17
        // sweep caught the old per-bigram filter diverging: 'ab cd' vs
        // 'abcd' must be 1.0), bigram multiset intersection, denominator
        // len(a)+len(b)-2 over the whitespace-stripped lengths
        VFloat(graft.functions.StrSim.sorensenDice(u8(str(0)), u8(str(1))))
      case "string::distance::hamming" =>
        VInt(graft.functions.StrSim.hamming(u8(str(0)), u8(str(1))))
      case "string::similarity::jaro" =>
        VFloat(graft.functions.StrSim.jaro(u8(str(0)), u8(str(1))))
      case "string::similarity::jaro_winkler" =>
        // strsim 0.11 generic_jaro_winkler: UNBOUNDED common-prefix boost
        // (no classic 4-char cap), clamped to 1.0
        VFloat(graft.functions.StrSim.jaroWinkler(u8(str(0)), u8(str(1))))
      case "string::similarity::fuzzy" | "string::similarity::smithwaterman" =>
        VInt(graft.functions.StrSim.fuzzy(u8(str(0)), u8(str(1))))
      case "type::type_of" => VStr(arg(0).typeName)
      // validator family — shared kernel (graft.functions.StrCheck), the
      // same static the Spark column lowering codegens into. The parse-
      // shaped kinds (uuid/int/decimal/latitude/longitude) answer FALSE for
      // non-string receivers instead of a type error — u'…'.is_uuid() must
      // not abort (method_syntax.surql pins the whole block non-erroring).
      case n if n.startsWith("string::is::") &&
          graft.functions.StrCheck.kinds.contains(n.stripPrefix("string::is::")) =>
        val kind = n.stripPrefix("string::is::")
        arg(0) match {
          case VStr(s) => VBool(graft.functions.StrCheck.check(kind,
            org.apache.spark.unsafe.types.UTF8String.fromString(s)))
          case _ if Set("uuid", "int", "decimal", "number",
            "latitude", "longitude").contains(kind) => VBool(false)
          case other => typeErr(0, "string", other)
        }
      case "string::is::datetime" =>
        arg(1) match {
          case VStr(_) => VBool(true) // format-based check: lenient
          case _ => VBool(try { new Parser("").parseDatetime(str(0)); true } catch { case _: Exception => false })
        }
      case "string::is::record" =>
        VBool(try { Parser.parseValue(str(0)).isInstanceOf[VRid] } catch { case _: Exception => false })
      // ammonia 4.1 (fnc/string.rs:378-390) — shared kernel with the Spark
      // lowering: clean_text escape set for encode, the allowlist HTML
      // sanitizer for sanitize (r20 sweep: the old strip-all-tags regex
      // diverged on the reference's own `<div>` vector)
      case "string::html::encode" =>
        VStr(graft.functions.Ammonia.cleanText(str(0)))
      case "string::html::sanitize" =>
        VStr(graft.functions.Ammonia.clean(str(0)))
      // semver family via the shared graft.functions.Semver engine
      // (fnc/string.rs semver::* → the semver crate: STRICT parse with the
      // reference error texts; §11 precedence incl. pre-release ordering —
      // the r17 sweep caught both engines comparing only the numeric
      // triple; inc/set keep the pre-release/build tail)
      case "string::semver::major" | "string::semver::minor" | "string::semver::patch" =>
        val p = graft.functions.Semver.parseOr(str(0), name, "Invalid semantic version")
        VInt(name.split("::").last match {
          case "major" => p.major; case "minor" => p.minor; case _ => p.patch
        })
      case "string::semver::compare" =>
        VInt(graft.functions.Semver.cmp(
          graft.functions.Semver.parseOr(str(0), name,
            "Invalid semantic version string for left argument"),
          graft.functions.Semver.parseOr(str(1), name,
            "Invalid semantic version string for right argument")).sign.toLong)
      case "string::semver::inc::major" | "string::semver::inc::minor" |
           "string::semver::inc::patch" =>
        val p = graft.functions.Semver.parseOr(str(0), name, "Invalid semantic version")
        VStr((name.split("::").last match {
          case "major" => p.copy(major = p.major + 1, minor = 0, patch = 0)
          case "minor" => p.copy(minor = p.minor + 1, patch = 0)
          case _       => p.copy(patch = p.patch + 1)
        }).render)
      case "string::semver::set::major" | "string::semver::set::minor" |
           "string::semver::set::patch" =>
        val p = graft.functions.Semver.parseOr(str(0), name, "Invalid semantic version")
        val v = int(1)
        VStr((name.split("::").last match {
          case "major" => p.copy(major = v)
          case "minor" => p.copy(minor = v)
          case _       => p.copy(patch = v)
        }).render)

      // ---- array -------------------------------------------------------
      case "array::add" =>
        val toAdd = arg(1) match {
          case VArr(vs) => vs
          case VSet(vs) => vs
          case v => Vector(v)
        }
        VArr(toAdd.foldLeft(arr(0)) { (acc, v) =>
          if (acc.exists(V.looseEq(_, v))) acc else acc :+ v
        })
      case "array::append" | "array::push" => VArr(arr(0) :+ arg(1))
      case "array::prepend" => VArr(arg(1) +: arr(0))
      case "array::at" =>
        val items = arr(0); val i = int(1)
        val idx = if (i < 0) items.length + i else i
        if (idx >= 0 && idx < items.length) items(idx.toInt) else VNone
      case "array::boolean_and" =>
        val (x, y) = (arr(0), arr(1))
        VArr((0 until Math.max(x.length, y.length)).map { i =>
          VBool(x.lift(i).exists(_.truthy) && y.lift(i).exists(_.truthy))
        }.toVector)
      case "array::boolean_or" =>
        val (x, y) = (arr(0), arr(1))
        VArr((0 until Math.max(x.length, y.length)).map { i =>
          VBool(x.lift(i).exists(_.truthy) || y.lift(i).exists(_.truthy))
        }.toVector)
      case "array::boolean_xor" =>
        val (x, y) = (arr(0), arr(1))
        VArr((0 until Math.max(x.length, y.length)).map { i =>
          VBool(x.lift(i).exists(_.truthy) ^ y.lift(i).exists(_.truthy))
        }.toVector)
      case "array::boolean_not" => VArr(arr(0).map(v => VBool(!v.truthy)))
      case "array::combine" =>
        VArr(for { x <- arr(0); y <- arr(1) } yield VArr(Vector(x, y)))
      case "array::complement" =>
        VArr(arr(0).filterNot(x => arr(1).exists(V.looseEq(_, x))))
      case "array::concat" =>
        val total = a.indices.map(i => arr(i).length.toLong).sum
        if (total > 16384) // same allocation guard (fnc/array.rs:186-190)
          throw SqlError("Incorrect arguments for function array::concat(). Output must not exceed 1048576 bytes.")
        VArr(a.indices.flatMap(i => arr(i)).toVector)
      case "array::clump" =>
        val size = int(1).toInt
        if (size < 1) throw SqlError("Incorrect arguments for function array::clump(). The second argument must be an integer greater than 0")
        VArr(arr(0).grouped(size).map(g => VArr(g)).toVector)
      case "array::difference" =>
        // per-OCCURRENCE symmetric difference (val/array.rs Difference):
        // each match consumes one occurrence of the other side, so
        // duplicates survive up to the unmatched count — [1,1] vs [1] is
        // [1], not []. Coerce argument 1 BEFORE argument 2: the reference
        // reports the first wrong-typed argument.
        val self0 = arr(0)
        val other = scala.collection.mutable.ArrayBuffer.from(arr(1))
        val selfOut = self0.flatMap { v =>
          val i = other.indexWhere(V.looseEq(_, v))
          if (i >= 0) { other.remove(i); scala.None } else Some(v)
        }
        VArr(selfOut ++ other.toVector)
      case "array::distinct" => VArr(Coerce.dedup(arr(0)))
      case "array::fill" =>
        // fnc/array.rs:204-296 (r19): bounds come as (start, end-excl)
        // ints, a single start (to the end), or a RANGE value with its
        // own inclusivity flags; negative indices count from the back
        // with the reference's exact saturate/abort rules
        val items = arr(0)
        val v = arg(1)
        val len = items.length.toLong
        if (a.length <= 2) VArr(items.map(_ => v))
        else {
          // (loBound, hiBound): value + inclusive flag; None = unbounded
          val (lo, hi): (Option[(Long, Boolean)], Option[(Long, Boolean)]) =
            if (a.length > 3) (Some((int(2), true)), Some((int(3), false)))
            else arg(2) match {
              case VRng(l, h) =>
                def b(x: Option[(V, Boolean)]) = x.map {
                  case (VInt(n), incl) => (n, incl)
                  case (other, _) => typeErr(2, "int", other)
                }
                (b(l), b(h))
              case _ => (Some((int(2), true)), scala.None)
            }
          val start = lo match {
            case scala.None => 0L
            case Some((x, true))  => if (x < 0) Math.max(0L, len + x) else x
            case Some((x, false)) => if (x < 0) Math.max(0L, len + x + 1) else x + 1
          }
          // inclusive end; None aborts (array unchanged)
          val endOpt: Option[Long] =
            if (start >= len) scala.None
            else hi match {
              case scala.None => Some(len - 1)
              case Some((x, true)) =>
                // (the reference indexes start..=min(x,len), which can
                // point one past the end and panic — clamp instead)
                Some(if (x < 0) Math.min(Math.max(len + x, 0L), len - 1)
                  else Math.min(x, len - 1))
              case Some((x, false)) =>
                if (x < 0) {
                  val e = Math.min(len + x, len) - 1
                  if (e < start) scala.None else Some(e)
                } else if (x <= start) scala.None
                else Some(Math.min(x, len) - 1)
            }
          endOpt match {
            case Some(end) if end >= start =>
              VArr(items.zipWithIndex.map { case (el, i) =>
                if (i >= start && i <= end) v else el })
            case _ => VArr(items)
          }
        }
      case "array::first" => arr(0).headOption.getOrElse(VNone)
      case "array::flatten" =>
        VArr(arr(0).flatMap { case VArr(inner) => inner; case v => Vector(v) })
      case "array::group" =>
        VArr(Coerce.dedup(arr(0).flatMap { case VArr(inner) => inner; case v => Vector(v) }))
      case "array::insert" =>
        // fnc/array.rs:437: negative index counts from the back; an index
        // still out of range returns the array UNALTERED (no clamping)
        val items = arr(0); val v = arg(1)
        if (a.length <= 2) VArr(items :+ v)
        else {
          var i = int(2)
          if (i < 0) i += items.length
          if (i > items.length || i < 0) VArr(items)
          else VArr(items.take(i.toInt) ++ Vector(v) ++ items.drop(i.toInt))
        }
      case "array::intersect" =>
        // per-OCCURRENCE intersection (val/array.rs Intersect): each match
        // consumes one occurrence of the other side and duplicates are
        // KEPT up to the matched count — [1,1] ∩ [1,1] is [1,1]. Coerce
        // argument 1 first (error-order fidelity).
        val self0 = arr(0)
        val other = scala.collection.mutable.ArrayBuffer.from(arr(1))
        VArr(self0.flatMap { v =>
          val i = other.indexWhere(V.looseEq(_, v))
          if (i >= 0) { other.remove(i); Some(v) } else scala.None
        })
      case "array::is_empty" => VBool(arr(0).isEmpty)
      case "array::join" => VStr(arr(0).map(_.renderRaw).mkString(str(1)))
      case "array::last" => arr(0).lastOption.getOrElse(VNone)
      case "array::len" => VInt(arr(0).length)
      case "array::max" => if (arr(0).isEmpty) VNone else arr(0).max(V.ordering)
      case "array::min" => if (arr(0).isEmpty) VNone else arr(0).min(V.ordering)
      case "array::matches" => VArr(arr(0).map(e => VBool(V.looseEq(e, arg(1)))))
      case "array::pop" => arr(0).lastOption.getOrElse(VNone)
      case "array::range" =>
        // fnc/array.rs:617: (start, end-exclusive) or a single range
        // value. The allocation guard is GENERATION_ALLOCATION_LIMIT
        // (1 MiB) over 64-byte Values → 16384 elements (r19: Value's
        // size is pinned by the reference's own check_size test at 64);
        // an UNBOUNDED bound has effectively-infinite len and hits the
        // same limit error, it does NOT yield an empty array.
        def rangeLimit(): Nothing = throw SqlError(
          "Incorrect arguments for function array::range(). Output must not exceed 1048576 bytes.")
        val (start, endEx) =
          if (a.length >= 2) (int(0), int(1))
          else arg(0) match {
            case VRng(lo, hi) =>
              val s = lo.map { case (v, _) => v match {
                case VInt(n) => n
                case other => typeErr(0, "int", other)
              }}.getOrElse(rangeLimit())
              val e = hi.map { case (v, incl) => (v match {
                case VInt(n) => n
                case other => typeErr(0, "int", other)
              }) + (if (incl) 1L else 0L) }.getOrElse(rangeLimit())
              (s, e)
            case other => typeErr(0, "range", other)
          }
        val count = endEx - start
        if (count <= 0) VArr(Vector.empty)
        else if (count > 16384) rangeLimit()
        else VArr((start until endEx).map(VInt(_)).toVector)
      case "array::sequence" =>
        val (start, count) = if (a.length >= 2) (int(0), int(1)) else (0L, int(0))
        if (count <= 0) VArr(Vector.empty)
        else if (count > 16384) // 1 MiB over 64-byte Values (r19)
          throw SqlError("Incorrect arguments for function array::sequence(). Output must not exceed 1048576 bytes.")
        else {
          val endIncl = // saturating end (fnc/array.rs:664)
            if (start > Long.MaxValue - (count - 1)) Long.MaxValue
            else start + count - 1
          VArr((start to endIncl).map(VInt(_)).toVector)
        }
      // the value-keeping logical trio is ASYMMETRIC about which side is
      // longer (fnc/array.rs:484-590, r19 sweep): the shorter side is
      // consumed into the longer one, and each op treats the longer
      // side's tail differently — the branch structure below mirrors the
      // reference's two arms exactly (equal lengths take the lh arm)
      case "array::logical_and" =>
        val (lh, rh) = (arr(0), arr(1))
        if (lh.length < rh.length)
          // overlap: a falsy lh VALUE wins; rh's tail is all Null
          VArr(rh.zipWithIndex.map { case (rv, i) =>
            if (i < lh.length) { if (!lh(i).truthy) lh(i) else rv }
            else VNull
          })
        else
          // overlap: truthy lh takes the rh value; lh's tail keeps its
          // falsy values and nulls only the truthy ones
          VArr(lh.zipWithIndex.map { case (lv, i) =>
            if (i < rh.length) { if (lv.truthy) rh(i) else lv }
            else if (lv.truthy) VNull else lv
          })
      case "array::logical_or" =>
        val (lh, rh) = (arr(0), arr(1))
        if (lh.length < rh.length)
          // overlap: truthy lh wins; rh's tail is kept VERBATIM
          VArr(rh.zipWithIndex.map { case (rv, i) =>
            if (i < lh.length && lh(i).truthy) lh(i) else rv
          })
        else
          // overlap: falsy lh takes the rh value; lh's tail nulls only
          // the falsy entries
          VArr(lh.zipWithIndex.map { case (lv, i) =>
            if (i < rh.length) { if (!lv.truthy) rh(i) else lv }
            else if (!lv.truthy) VNull else lv
          })
      case "array::logical_xor" =>
        val (lh, rh) = (arr(0), arr(1))
        if (lh.length < rh.length)
          // overlap: prefer whichever VALUE carries the xor truthiness,
          // else a plain bool; rh's tail nulls falsy entries
          VArr(rh.zipWithIndex.map { case (rv, i) =>
            if (i < lh.length) {
              val b = lh(i); val v = b.truthy ^ rv.truthy
              if (b.truthy == v) b
              else if (rv.truthy != v) VBool(v)
              else rv
            } else if (!rv.truthy) VNull else rv
          })
        else
          // lh's tail is kept verbatim (no null pass — reference quirk)
          VArr(lh.zipWithIndex.map { case (lv, i) =>
            if (i < rh.length) {
              val b = rh(i); val v = b.truthy ^ lv.truthy
              if (lv.truthy == v) lv
              else if (b.truthy == v) b
              else VBool(v)
            } else lv
          })
      case "array::remove" =>
        val items = arr(0)
        var i = int(1)
        if (i < 0) i = items.length + i
        if (i >= 0 && i < items.length) VArr(items.patch(i.toInt, Nil, 1)) else VArr(items)
      case "array::repeat" =>
        val count = int(1)
        if (count < 0)
          throw SqlError("Incorrect arguments for function array::repeat(). Expected argument 2 to be a positive number")
        if (count > 16384) // 1 MiB over 64-byte Values (r19)
          throw SqlError("Incorrect arguments for function array::repeat(). Output must not exceed 1048576 bytes.")
        VArr(Vector.fill(count.toInt)(arg(0)))
      case "array::reverse" => VArr(arr(0).reverse)
      case "array::shuffle" => VArr(scala.util.Random.shuffle(arr(0)))
      case "array::slice" =>
        // fnc/array.rs:742: [start, end) index semantics; negatives count
        // from the back on BOTH bounds; empty when start >= end
        val items = arr(0)
        var from = if (a.length > 1) int(1) else 0L
        if (from < 0) from += items.length
        var until = if (a.length > 2) int(2) else items.length.toLong
        if (until < 0) until += items.length
        from = Math.max(0, Math.min(items.length.toLong, from))
        until = Math.max(0, Math.min(items.length.toLong, until))
        if (from >= until) VArr(Vector.empty)
        else VArr(items.slice(from.toInt, until.toInt))
      case "array::sort" =>
        val asc = !descArg(arg(1))
        val sorted = arr(0).sorted(V.ordering)
        VArr(if (asc) sorted else sorted.reverse)
      case "array::sort::asc" => VArr(arr(0).sorted(V.ordering))
      case "array::sort::desc" => VArr(arr(0).sorted(V.ordering).reverse)
      // the string-ish comparators apply to STRING PAIRS only; any other
      // pairing falls to the standard Value order (val/mod.rs:500-522
      // natural_cmp/lexical_cmp/natural_lexical_cmp `_ => partial_cmp`)
      case "array::sort_natural" =>
        val sorted = arr(0).sortWith {
          case (VStr(x), VStr(y)) => naturalCmp(x, y) < 0
          case (x, y)             => V.cmp(x, y) < 0
        }
        VArr(if (descArg(arg(1))) sorted.reverse else sorted)
      case "array::sort_lexical" =>
        val coll = java.text.Collator.getInstance(java.util.Locale.ROOT)
        val sorted = arr(0).sortWith {
          case (VStr(x), VStr(y)) => coll.compare(x, y) < 0
          case (x, y)             => V.cmp(x, y) < 0
        }
        VArr(if (descArg(arg(1))) sorted.reverse else sorted)
      case "array::sort_natural_lexical" =>
        val sorted = arr(0).sortWith {
          case (VStr(x), VStr(y)) => naturalLexicalCmp(x, y) < 0
          case (x, y)             => V.cmp(x, y) < 0
        }
        VArr(if (descArg(arg(1))) sorted.reverse else sorted)
      case "array::swap" =>
        val items = arr(0)
        def norm(argIdx: Int, x: Long): Int = {
          val i = if (x < 0) items.length + x else x
          if (i < 0 || i >= items.length)
            throw SqlError(s"Incorrect arguments for function array::swap(). Argument $argIdx is out of range. Expected a number between -${items.length} and ${items.length}")
          i.toInt
        }
        val (i, j) = (norm(1, int(1)), norm(2, int(2)))
        VArr(items.updated(i, items(j)).updated(j, items(i)))
      case "array::transpose" =>
        val rows = arr(0).map { case VArr(r) => r; case v => Vector(v) }
        if (rows.isEmpty) VArr(Vector.empty)
        else {
          val width = rows.map(_.length).max
          VArr((0 until width).map { i =>
            VArr(rows.map(_.lift(i).getOrElse(VNone)))
          }.toVector)
        }
      case "array::union" => VArr(Coerce.dedup(arr(0) ++ arr(1)))
      case "array::windows" =>
        val size = int(1).toInt
        if (size < 1) throw SqlError("Incorrect arguments for function array::windows(). The second argument must be an integer greater than 0")
        VArr(arr(0).sliding(size).filter(_.length == size).map(VArr(_)).toVector)

      // ---- object ------------------------------------------------------
      case "bytes::len" => arg(0) match {
        case VBytes(bs) => VInt(bs.length)
        case other => typeErr(0, "bytes", other)
      }
      case "object::entries" =>
        VArr(obj(0).map { case (k, v) => VArr(Vector(VStr(k), v)) }.toVector)
      case "object::from_entries" =>
        // fnc/object.rs:22-62: a non-[k, v] pair errors by KIND, a string
        // key stays raw, any other key renders via to_sql (so a datetime
        // key becomes "d'…'" — quirky but observable); r19 sweep
        VObj(TreeMap(arr(0).map {
          case VArr(entry) if entry.length == 2 =>
            val k = entry(0) match {
              case VStr(s) => s
              case other   => Render.sql(other)
            }
            k -> entry(1)
          // (wrong-LENGTH arrays take this arm too — "found array" — the
          // reference's "invalid entry" branch is unreachable behind its
          // len==2 guard)
          case other => throw SqlError(
            "Incorrect arguments for function object::from_entries(). " +
              s"Expected entries, found ${other.typeName}")
        }: _*))
      case "object::keys" => VArr(obj(0).keys.map(VStr(_)).toVector)
      case "object::values" => VArr(obj(0).values.toVector)
      case "object::len" => VInt(obj(0).size)
      case "object::is_empty" => VBool(obj(0).isEmpty)
      case "object::extend" => VObj(obj(0) ++ obj(1))
      case "object::remove" =>
        def keyOf(v: V): String = v match {
          case VStr(s) => s
          case other => throw SqlError(
            s"Incorrect arguments for function object::remove(). '${Render.sql(other)}' cannot be used as a key. Please use a string instead.")
        }
        val keys = arg(1) match {
          case VArr(ks) => ks.map(keyOf)
          case other    => Seq(keyOf(other))
        }
        VObj(obj(0) -- keys)

      // ---- set (sorted-unique BTreeSet semantics, fnc/mod.rs:351-367) --
      // most operations delegate to their array:: cousin with the first
      // argument checked as a set and set-shaped results re-wrapped
      case n if n.startsWith("set::") =>
        val op = n.stripPrefix("set::")
        def setArg(i: Int): Vector[V] = arg(i) match {
          case VSet(items) => items
          case VArr(items) => V.set(items).items
          case other => typeErr(i, "set", other)
        }
        def wrap(v: V): V = v match {
          case VArr(items) => V.set(items)
          case s: VSet     => V.set(s.items)
          case other       => other
        }
        op match {
          case "add" => arg(1) match {
            case VSet(more)  => V.set(setArg(0) ++ more)
            case VArr(more)  => V.set(setArg(0) ++ more)
            case v           => V.set(setArg(0) :+ v) // NONE is a member too
          }
          case "remove" => arg(1) match {
            case VSet(gone) => V.set(setArg(0).filterNot(e => gone.exists(V.looseEq(_, e))))
            case VArr(gone) => V.set(setArg(0).filterNot(e => gone.exists(V.looseEq(_, e))))
            case v          => V.set(setArg(0).filterNot(V.looseEq(_, v)))
          }
          case "slice" =>
            val items = setArg(0)
            def idx(v: V): Option[Int] = v match {
              case VInt(i) => Some(if (i < 0) (items.length + i).toInt else i.toInt)
              case _ => scala.None
            }
            arg(1) match {
              case r: VRng =>
                val lo = r.lo match {
                  case Some((VInt(i), incl)) => (if (incl) i else i + 1).toInt
                  case _ => 0
                }
                val hi = r.hi match {
                  case Some((VInt(i), incl)) => (if (incl) i + 1 else i).toInt
                  case _ => items.length
                }
                V.set(items.slice(Math.max(lo, 0), Math.min(Math.max(hi, 0), items.length)))
              case s =>
                val start = idx(s).getOrElse(0)
                val end = arg(2) match {
                  case VNone => items.length
                  case v     => idx(v).getOrElse(items.length)
                }
                V.set(items.slice(Math.max(start, 0), Math.min(Math.max(end, 0), items.length)))
            }
          case "union"      => V.set(setArg(0) ++ setArg(1))
          case "intersect"  => V.set(setArg(0).filter(e => setArg(1).exists(V.looseEq(_, e))))
          case "difference" =>
            V.set(setArg(0).filterNot(e => setArg(1).exists(V.looseEq(_, e))) ++
              setArg(1).filterNot(e => setArg(0).exists(V.looseEq(_, e))))
          case "complement" => V.set(setArg(0).filterNot(e => setArg(1).exists(V.looseEq(_, e))))
          case "len"        => VInt(setArg(0).length)
          case "contains"   => VBool(setArg(0).exists(V.looseEq(_, arg(1))))
          case "is_empty"   => VBool(setArg(0).isEmpty)
          case "distinct"   => V.set(setArg(0))
          case "flatten" =>
            V.set(setArg(0).flatMap {
              case VArr(inner) => inner
              case VSet(inner) => inner
              case el          => Vector(el)
            })
          case other =>
            // delegate to the array:: implementation over the set's items
            val delegated =
              try apply("array::" + other, VArr(setArg(0)) +: a.drop(1), env)
              catch {
                case e: SqlError if e.msg.startsWith("Unknown function") =>
                  throw SqlError(s"Unknown function set::$other()")
                case e: SqlError =>
                  throw SqlError(e.msg
                    .replace(s"array::$other(", s"set::$other(")
                    .replace("Expected `array`", "Expected `set`"))
              }
            other match {
              case "map" | "filter" | "slice" | "windows" | "clump" => wrap(delegated)
              case _ => delegated
            }
        }

      // ---- time --------------------------------------------------------
      case "time::now" => VDt(java.time.Instant.now())
      case "time::day" => VInt(utc(arg(0)).getDayOfMonth)
      case "time::month" => VInt(utc(arg(0)).getMonthValue)
      case "time::year" => VInt(utc(arg(0)).getYear)
      case "time::hour" => VInt(utc(arg(0)).getHour)
      case "time::minute" => VInt(utc(arg(0)).getMinute)
      case "time::second" => VInt(utc(arg(0)).getSecond)
      case "time::wday" => VInt(utc(arg(0)).getDayOfWeek.getValue)
      case "time::yday" => VInt(utc(arg(0)).getDayOfYear)
      case "time::week" => VInt(utc(arg(0)).get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear()))
      case "time::unix" => VInt(inst(arg(0)).getEpochSecond)
      case "time::millis" => VInt(inst(arg(0)).toEpochMilli)
      case "time::micros" => VInt(inst(arg(0)).getEpochSecond * 1000000L + inst(arg(0)).getNano / 1000)
      case "time::nano" => VInt(inst(arg(0)).getEpochSecond * 1000000000L + inst(arg(0)).getNano)
      case "time::floor" | "time::round" | "time::ceil" =>
        // chrono duration_trunc/duration_round EXACTLY, via the shared
        // TimeRound core (fnc/time.rs): floor toward -inf (pre-epoch
        // stamps floor DOWN — the r17 sweep caught the old toward-zero
        // BigInt division), ties round UP, zero duration = identity, and
        // chrono's i64-nanos range errors for out-of-range stamps/spans
        val t = inst(arg(0))
        val d = arg(1) match { case dd: VDur => dd; case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 2 was the wrong type. Expected a duration but found ${other.render}") }
        val mode = name.stripPrefix("time::")
        val dnB = d.totalNanos
        if (dnB > Long.MaxValue) graft.functions.TimeRound.refError(mode)
        val tnB = BigInt(t.getEpochSecond) * 1000000000L + t.getNano
        if (tnB > Long.MaxValue || tnB < Long.MinValue)
          graft.functions.TimeRound.refError(mode)
        val resN =
          try graft.functions.TimeRound.nanos(tnB.toLong, dnB.toLong, mode)
          catch { case _: ArithmeticException =>
            graft.functions.TimeRound.refError(mode) }
        VDt(java.time.Instant.ofEpochSecond(
          Math.floorDiv(resN, 1000000000L), Math.floorMod(resN, 1000000000L)))
      case "time::group" =>
        val t = utc(arg(0))
        val unit = str(1)
        val truncated = unit match {
          case "year" => t.withDayOfYear(1).toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
          case "month" => t.withDayOfMonth(1).toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
          case "day" => t.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
          case "hour" => t.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
          case "minute" => t.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
          case "second" => t.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
          case _ => throw SqlError("Incorrect arguments for function time::group(). " +
            "The second argument must be a string, and can be one of 'year', 'month', 'day', 'hour', 'minute', or 'second'.")
        }
        VDt(truncated.toInstant)
      case "time::format" =>
        // chrono's FULL strftime table (the reference derefs to
        // DateTime<Utc>::format) — parse + render + invalid-spec errors
        // all live in Strftime (r18: the old subset validated %F/%D/%T &c.
        // and then printed them literally)
        VStr(Strftime.format(utc(arg(0)), str(1)))
      case "time::max" | "time::min" =>
        // Vec<Datetime> coercion: non-datetime elements error (fnc/time.rs)
        val items = arr(0).map {
          case d: VDt => d
          case other  => typeErr(0, "datetime", other)
        }
        if (items.isEmpty) VNone
        else if (name == "time::max") items.maxBy(_.t)
        else items.minBy(_.t)
      case "time::timezone" => VStr("UTC")
      // time::from_* validate against chrono's representable datetimes
      // ([-262143-01-01, +262142-12-31]; fnc/time.rs from.rs arms) with
      // the reference's exact error text; nanos can never overflow (i64
      // nanoseconds span only ±292 years) and uses euclidean division
      case "time::from::unix" | "time::from::secs" |
           "time::from::millis" | "time::from::micros" =>
        val (minS, maxS) = (-8334601228800L, 8210266876799L)
        val unit = name.stripPrefix("time::from::")
        def rangeErr() = throw SqlError(
          s"Incorrect arguments for function time::from_$unit(). The argument must be a number of " +
            (unit match {
              case "millis" => "milliseconds"
              case "micros" => "microseconds"
              case _        => "seconds"
            }) +
            " relative to January 1, 1970 0:00:00 UTC that produces a datetime between -262143-01-01T00:00:00Z and +262142-12-31T23:59:59Z.")
        val v = int(0)
        unit match {
          case "millis" =>
            if (v < minS * 1000L || v > maxS * 1000L + 999L) rangeErr()
            VDt(java.time.Instant.ofEpochMilli(v))
          case "micros" =>
            if (v < minS * 1000000L || v > maxS * 1000000L + 999999L) rangeErr()
            VDt(java.time.Instant.ofEpochSecond(
              Math.floorDiv(v, 1000000L), Math.floorMod(v, 1000000L) * 1000L))
          case _ =>
            if (v < minS || v > maxS) rangeErr()
            VDt(java.time.Instant.ofEpochSecond(v))
        }
      case "time::from::nanos" =>
        val v = int(0)
        VDt(java.time.Instant.ofEpochSecond(
          Math.floorDiv(v, 1000000000L), Math.floorMod(v, 1000000000L)))
      case "time::from::ulid" =>
        // Crockford base32: chars 0-9 carry the 48-bit ms timestamp
        val s = str(0)
        val alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
        def ulidErr() = throw SqlError(
          "Incorrect arguments for function time::from_ulid(). The first argument must be a string, containing a valid ULID.")
        if (s.length != 26 || !s.forall(c => alphabet.indexOf(c.toUpper) >= 0))
          ulidErr()
        if (alphabet.indexOf(s(0).toUpper) > 7) ulidErr() // > 2^48-1 ms
        val ms = s.take(10).foldLeft(0L)((acc, c) =>
          (acc << 5) | alphabet.indexOf(c.toUpper))
        VDt(java.time.Instant.ofEpochMilli(ms))
      case "time::from::uuid" =>
        // v1/v6: 60-bit count of 100ns ticks since 1582-10-15; v7: 48-bit
        // unix ms in the top bits (uuid crate get_timestamp)
        val u = arg(0) match {
          case VUuid(x) => x
          case other => typeErr(0, "uuid", other)
        }
        val gregorianOffsetSecs = -12219292800L // 1582-10-15 in unix secs
        u.version match {
          case 1 | 6 =>
            val ticks =
              if (u.version == 1) u.timestamp()
              else { // v6 packs the timestamp big-endian across the fields
                val hi = u.getMostSignificantBits
                ((hi >>> 32) << 28) | (((hi >>> 16) & 0xffffL) << 12) | (hi & 0x0fffL)
              }
            val secs = ticks / 10000000L + gregorianOffsetSecs
            val nanos = (ticks % 10000000L) * 100L
            VDt(java.time.Instant.ofEpochSecond(secs, nanos))
          case 7 =>
            VDt(java.time.Instant.ofEpochMilli(u.getMostSignificantBits >>> 16))
          case _ => throw SqlError(
            "Incorrect arguments for function time::from_uuid(). The first argument must be a v1, v6 or v7 UUID.")
        }
      case "time::set_year" =>
        // chrono date range: [-262143, 262142] (val/datetime.rs)
        val y = int(1)
        if (y < -262143 || y > 262142)
          throw SqlError(s"Unable to set datetime to year $y")
        VDt(utc(arg(0)).withYear(y.toInt).toInstant)
      case "time::set_month" | "time::set_day" | "time::set_hour" |
           "time::set_minute" | "time::set_second" | "time::set_nanosecond" =>
        val v = int(1)
        if (v < 0 || v > Int.MaxValue)
          throw SqlError("out of range integral type conversion attempted")
        try {
          val z = utc(arg(0))
          val r = name match {
            case "time::set_month"      => z.withMonth(v.toInt)
            case "time::set_day"        => z.withDayOfMonth(v.toInt)
            case "time::set_hour"       => z.withHour(v.toInt)
            case "time::set_minute"     => z.withMinute(v.toInt)
            case "time::set_second"     => z.withSecond(v.toInt)
            case _                      => z.withNano(v.toInt)
          }
          VDt(r.toInstant)
        } catch {
          case e: java.time.DateTimeException =>
            val unit = name.stripPrefix("time::set_")
            throw SqlError(s"Unable to set datetime to $unit $v")
        }
      case "time::is::leap_year" =>
        VBool(java.time.Year.isLeap(utc(arg(0)).getYear))

      // ---- duration ----------------------------------------------------
      case "duration::days" => VInt((durOf(arg(0)).secsU / 86400).toLong)
      case "duration::hours" => VInt((durOf(arg(0)).secsU / 3600).toLong)
      case "duration::mins" => VInt((durOf(arg(0)).secsU / 60).toLong)
      case "duration::secs" => VInt(durOf(arg(0)).secsU.toLong)
      case "duration::weeks" => VInt((durOf(arg(0)).secsU / 604800).toLong)
      case "duration::years" => VInt((durOf(arg(0)).secsU / 31536000).toLong)
      case "duration::millis" => VInt((durOf(arg(0)).totalNanos / 1000000L).toLong)
      case "duration::micros" => VInt((durOf(arg(0)).totalNanos / 1000L).toLong)
      case "duration::nanos" => VInt(durOf(arg(0)).totalNanos.toLong)
      case "duration::from::days" | "duration::from_days" => durMul(arg(0), 86400, name)
      case "duration::from::hours" | "duration::from_hours" => durMul(arg(0), 3600, name)
      case "duration::from::mins" | "duration::from_mins" => durMul(arg(0), 60, name)
      case "duration::from::secs" | "duration::from_secs" => durMul(arg(0), 1, name)
      case "duration::from::weeks" | "duration::from_weeks" => durMul(arg(0), 604800, name)
      case "duration::from::millis" | "duration::from_millis" => durDiv(arg(0), 1000L, name)
      case "duration::from::micros" | "duration::from_micros" => durDiv(arg(0), 1000000L, name)
      case "duration::from::nanos" | "duration::from_nanos" => durDiv(arg(0), 1000000000L, name)

      // ---- type --------------------------------------------------------
      case "type::of" | "type::string_of" => VStr(arg(0).typeName)
      case "type::file" => VFile(str(0), str(1))
      case "type::bool" => Coerce.cast(Kind.KBool, arg(0))
      case "type::bytes" => Coerce.cast(Kind.KBytes, arg(0))
      case "type::int" => Coerce.cast(Kind.KInt, arg(0))
      case "type::float" => Coerce.cast(Kind.KFloat, arg(0))
      case "type::decimal" => Coerce.cast(Kind.KDecimal, arg(0))
      case "type::number" => Coerce.cast(Kind.KNumber, arg(0))
      // string_lossy replaces invalid UTF-8 in bytes; JVM strings are
      // already well-formed, so the conversion coincides with type::string
      case "type::string" | "type::string_lossy" => Coerce.cast(Kind.KString, arg(0))
      case "type::duration" => Coerce.cast(Kind.KDuration, arg(0))
      case "type::datetime" => Coerce.cast(Kind.KDatetime, arg(0))
      case "type::uuid" => Coerce.cast(Kind.KUuid, arg(0))
      case "type::array" => Coerce.cast(Kind.KArray(scala.None, scala.None), arg(0))
      case "type::set" => arg(0) match {
        case VSet(items) => V.set(items)
        case VArr(items) => V.set(items)
        case other => throw SqlError(s"Could not cast into `set` using input `${other.renderRaw}`")
      }
      case "type::is_set" | "type::is::set" => VBool(arg(0).isInstanceOf[VSet])
      case "type::range" if arg(0).isInstanceOf[VArr] => arg(0) match {
        case VArr(Vector(lo, hi)) => VRng(Some((lo, true)), Some((hi, false)))
        case VArr(Vector(lo)) => VRng(Some((lo, true)), scala.None)
        case other => throw SqlError(s"Could not cast into `range` using input `${other.renderRaw}`")
      }
      case "type::geometry" => Coerce.cast(Kind.KGeometry(Nil), arg(0))
      case "type::point" => arg(0) match {
        // a two-number array IS a point for type::point (fnc/type.rs point),
        // unlike the bare `<geometry>` cast which rejects arrays
        case VArr(Vector(x: VNum, y: VNum)) => VGeom("Point", VArr(Vector(x, y)))
        case other => Coerce.cast(Kind.KGeometry(Nil), other)
      }
      case "type::table" => VTable(arg(0).renderRaw)
      case "type::record" =>
        arg(1) match {
          case VNone => Coerce.cast(Kind.KRecord(Nil), arg(0))
          // a full record id keeps its own key (type/field/record)
          case VRid(_, k) => VRid(arg(0).renderRaw, k)
          case key => VRid(arg(0).renderRaw, ridKeyOf(key))
        }
      case "type::thing" =>
        arg(1) match {
          case VNone => Coerce.cast(Kind.KRecord(Nil), arg(0))
          case VRid(_, k) => VRid(arg(0).renderRaw, k)
          case key => VRid(arg(0).renderRaw, ridKeyOf(key))
        }
      case "type::range" => Coerce.cast(Kind.KRange, arg(0))
      case "value::diff" =>
        // JSON-patch operations turning arg0 into arg1 (val/value/diff.rs)
        VArr(Interp.valueDiff(arg(0), arg(1)))
      case "value::patch" =>
        // patches ANY value (val/value/patch.rs operates on Value);
        // malformed op lists error with the reference's InvalidPatch text
        JsonPatch.patch(arg(0), arg(1))
      case "type::field" =>
        // the path parses as a REAL idiom (builtin/type.rs:131 syn::idiom)
        // — record links traverse exactly like `friend.name.first` would
        // (reproductions/6980), `a[0]`/`a.*` index and splat; an
        // unparseable path errors with the reference's text (type.rs:132)
        Eval.eval(Functions.parseFieldPath(str(0)), env)
      case "type::fields" =>
        // each element parses as an idiom too (type.rs:177-179) — the old
        // dot-split lowering missed `a[0]`-style paths and record links
        VArr(arr(0).zipWithIndex.map {
          case (VStr(p), _) => Eval.eval(Functions.parseFieldPath(p), env)
          case (other, i)   => typeErr(i, "string", other)
        })
      case "type::is::array" => VBool(arg(0).isInstanceOf[VArr])
      case "type::is::bool" => VBool(arg(0).isInstanceOf[VBool])
      case "type::is::bytes" => VBool(arg(0).isInstanceOf[VBytes])
      case "type::is::datetime" => VBool(arg(0).isInstanceOf[VDt])
      case "type::is::decimal" => VBool(arg(0).isInstanceOf[VDec])
      case "type::is::duration" => VBool(arg(0).isInstanceOf[VDur])
      case "type::is::float" => VBool(arg(0).isInstanceOf[VFloat])
      case "type::is::int" => VBool(arg(0).isInstanceOf[VInt])
      case "type::is::none" => VBool(arg(0) == VNone)
      case "type::is::null" => VBool(arg(0) == VNull)
      case "type::is::number" => VBool(arg(0).isInstanceOf[VNum])
      case "type::is::object" => VBool(arg(0).isInstanceOf[VObj])
      case "type::is::record" =>
        arg(1) match {
          case VStr(tb) => VBool(arg(0) match { case r: VRid => r.table == tb; case _ => false })
          case _ => VBool(arg(0).isInstanceOf[VRid])
        }
      case "type::is::string" => VBool(arg(0).isInstanceOf[VStr])
      case "type::is::uuid" => VBool(arg(0).isInstanceOf[VUuid])
      case "type::is::geometry" => VBool(arg(0).isInstanceOf[VGeom])
      case "type::is::range" => VBool(arg(0).isInstanceOf[VRng])
      // geometry-kind predicates (fnc/type.rs is::point/line/…); GeoJSON
      // objects count as their declared kind, same as geo:: coercion
      case "type::is::point" | "type::is::line" | "type::is::polygon" |
           "type::is::multipoint" | "type::is::multiline" | "type::is::multipolygon" |
           "type::is::collection" =>
        val want = name.stripPrefix("type::is::") match {
          case "point" => "Point"; case "line" => "LineString"
          case "polygon" => "Polygon"; case "multipoint" => "MultiPoint"
          case "multiline" => "MultiLineString"; case "multipolygon" => "MultiPolygon"
          case _ => "GeometryCollection"
        }
        val gt = arg(0) match {
          case VGeom(t, _) => Some(t)
          case VObj(fs) if fs.contains("coordinates") || fs.contains("geometries") =>
            fs.get("type").collect { case VStr(t) => t }
          case _ => scala.None
        }
        VBool(gt.contains(want))

      // ---- record / meta ----------------------------------------------
      case "record::id" | "meta::id" => arg(0) match {
        case VRid(_, key) => key
        case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 1 was the wrong type. Expected a record but found ${other.render}")
      }
      case "record::tb" | "record::table" | "meta::tb" | "meta::table" => arg(0) match {
        case VRid(tb, _) => VStr(tb)
        case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 1 was the wrong type. Expected a record but found ${other.render}")
      }
      case "record::is_edge" => arg(0) match {
        case rid: VRid =>
          env.interp.flatMap(_.fetchRecord(rid)) match {
            case Some(doc) => VBool(doc.fields.get("in").exists(_.isInstanceOf[VRid]) &&
              doc.fields.get("out").exists(_.isInstanceOf[VRid]))
            case scala.None => VBool(false)
          }
        case VStr(txt) =>
          (try Some(Parser.parseValue(txt)) catch { case _: Exception => scala.None }) match {
            case Some(rid: VRid) => apply(name, Seq(rid), env)
            case _ => throw SqlError("Incorrect arguments for function record::is_edge(). Expected a record ID")
          }
        case _ => throw SqlError("Incorrect arguments for function record::is_edge(). Expected a record ID")
      }
      case "schema::table::exists" =>
        VBool(env.interp.exists(in => in.tables.contains(str(0)) || in.tableDefs.contains(str(0))))
      case "record::exists" => arg(0) match {
        case r: VRid => VBool(env.interp.exists(_.fetchRecord(r).isDefined))
        case _ => VBool(false)
      }

      // ---- parse -------------------------------------------------------
      case "parse::email::host" =>
        graft.functions.UrlParse.parseEmail(str(0))
          .map(p => VStr(p._2): V).getOrElse(VNone)
      case "parse::email::user" =>
        graft.functions.UrlParse.parseEmail(str(0))
          .map(p => VStr(p._1): V).getOrElse(VNone)
      // WHATWG parsing per the reference's url crate (r20 sweep) — the
      // same graft.functions.UrlParse statics the Spark lowering codegens:
      // IDNA'd lowercase domains, IPv4/IPv6 normalization, dot-segment
      // paths, per-component encode sets, domain() None on IP hosts,
      // port_or_known_default, >65535 ports failing the WHOLE parse
      case "parse::url::domain" | "parse::url::host" | "parse::url::path" |
           "parse::url::query" | "parse::url::scheme" | "parse::url::fragment" =>
        val r = graft.functions.UrlParse.part(
          org.apache.spark.unsafe.types.UTF8String.fromString(str(0)),
          org.apache.spark.unsafe.types.UTF8String.fromString(
            name.stripPrefix("parse::url::")))
        if (r == null) VNone else VStr(r.toString)
      case "parse::url::port" =>
        val p = graft.functions.UrlParse.port(
          org.apache.spark.unsafe.types.UTF8String.fromString(str(0)))
        if (p < 0) VNone else VInt(p)

      // internal: the lowered form of a THROW statement inside an inlined
      // fn:: body (SparkPlanner.blockToExpr) — the reference's Thrown
      // error text (expr/statements/throw.rs)
      case "graft::throw" =>
        throw SqlError(s"An error occurred: ${arg(0).renderRaw}")

      // ---- crypto ------------------------------------------------------
      case "crypto::md5" => VStr(digest("MD5", str(0)))
      case "crypto::sha1" => VStr(digest("SHA-1", str(0)))
      case "crypto::sha256" => VStr(digest("SHA-256", str(0)))
      case "crypto::sha512" => VStr(digest("SHA-512", str(0)))
      case "crypto::joaat" => VInt(graft.functions.StrCheck.joaat(
        org.apache.spark.unsafe.types.UTF8String.fromString(str(0))))
      case "crypto::blake3" => VStr(Blake3.hex(str(0).getBytes("UTF-8")))
      // password-hash families (fnc/crypto.rs): all four are REAL as of
      // r19 — each speaks its algorithm's PHC/MCF format, verifies
      // externally-generated hashes, and applies the reference's cost
      // allowances (argon2/pbkdf2 4x multiplicative, bcrypt +4 and
      // scrypt log_n +2 — exponential params get additive headroom).
      case "crypto::argon2::generate"  => VStr(Argon2.generate(str(0)))
      case "crypto::argon2::compare"   => VBool(Argon2.verify(str(0), str(1)))
      case "crypto::bcrypt::generate"  => VStr(Bcrypt.generate(str(0)))
      case "crypto::bcrypt::compare"   => VBool(Bcrypt.verify(str(0), str(1)))
      case "crypto::pbkdf2::generate"  => VStr(pwHash("pbkdf2-sha256", str(0)))
      case "crypto::pbkdf2::compare"   => VBool(pwCompare(str(0), str(1)))
      case "crypto::scrypt::generate"  => VStr(Scrypt.generate(str(0)))
      case "crypto::scrypt::compare"   => VBool(Scrypt.verify(str(0), str(1)))

      // ---- rand --------------------------------------------------------
      case n if n.startsWith("type::is_") && n != "type::is_set" =>
        apply("type::is::" + n.stripPrefix("type::is_"), a, env)
      // universal value methods land here via the method-dispatch fallback
      // (reference fnc: every Value has .chain/.diff/.patch)
      case "type::chain" => applyClosure(arg(1), Seq(arg(0)), env)
      case "type::diff"  => apply("value::diff", a, env)
      case "type::patch" => apply("value::patch", a, env)
      case "rand::duration" =>
        // EXACTLY two duration bounds, low/high in either order
        // (fnc/rand.rs duration takes (Duration, Duration); r19 sweep —
        // the old 0-arg arm was an invention, the reference has none)
        def durNs(v: V): BigInt = v match {
          case VDur(s2, n2) => BigInt(s2) * 1000000000L + n2
          case other => typeErr(0, "duration", other)
        }
        if (a.length != 2)
          throw SqlError("Incorrect arguments for function rand::duration(). Expected 2 arguments")
        val (lo, hi) = (durNs(arg(0)), durNs(arg(1)))
        val (mn, mx) = if (lo <= hi) (lo, hi) else (hi, lo)
        val span = mx - mn
        val pick = mn + (if (span == 0) BigInt(0)
          else BigInt(64, scala.util.Random).mod(span + 1))
        VDur((pick / 1000000000L).toLong, (pick % 1000000000L).toInt)
      case "rand" => VFloat(scala.util.Random.nextDouble())
      case "rand::id" | "rand::string" =>
        // fnc/rand.rs id/string: default lengths 20/32, a [lower, upper]
        // pair picks an inclusive random length, lower > upper and
        // over-LIMIT lengths error with the reference's texts (r19 sweep)
        val (limit, default, cs) =
          if (name == "rand::id")
            (64L, 20L, "0123456789abcdefghijklmnopqrstuvwxyz")
          else (65536L, 32L,
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
        def overLimit() = throw SqlError(
          s"Incorrect arguments for function $name(). To generate a string of X " +
            s"characters in length, the argument must be a positive number and no higher than $limit.")
        val lower = if (a.nonEmpty) int(0) else default
        val len = if (a.length >= 2) {
          val upper = int(1)
          if (lower > upper) throw SqlError(
            s"Incorrect arguments for function $name(). Lowerbound of number of " +
              "characters must be less then the upperbound.")
          if (upper > limit) overLimit()
          if (lower < 0) overLimit() // the reference would die on the usize wrap
          lower + Math.floorMod(scala.util.Random.nextLong(), upper - lower + 1)
        } else {
          if (lower > limit) overLimit()
          if (lower < 0) overLimit()
          lower
        }
        VStr(Vector.fill(len.toInt)(cs(scala.util.Random.nextInt(cs.length))).mkString)
      case "sequence::nextval" =>
        val in = env.interp.getOrElse(throw SqlError("The sequence does not exist"))
        // a non-string name has its OWN message (fnc/sequence.rs:18-21), not
        // the generic wrong-type form — and the reference passes the name
        // WITH parens into a template that appends "()", so the doubled
        // "()()"  is reproduced verbatim (err/mod.rs:154)
        val nm = arg(0) match {
          case VStr(s) => s
          case _ => throw SqlError(
            "Incorrect arguments for function sequence::nextval()(). Expect a sequence name")
        }
        val d = in.sequences.getOrElse(nm, throw SqlError(s"The sequence '$nm' does not exist"))
        // a TIMEOUT 0 sequence can never allocate a batch in time — the
        // reference's allocator wait deadline fires immediately (seq.rs)
        d.timeout.foreach { t =>
          val dur = try Coerce.cast(Kind.KDuration, VStr(t)) catch { case _: Exception => VNone }
          dur match {
            case vd: VDur if vd.secs == 0 && vd.nanos == 0 =>
              throw SqlError(s"The query was not executed because it exceeded the timeout: ${vd.render}")
            case _ => ()
          }
        }
        val cur = in.sequenceState.getOrElse(nm, d.start)
        in.sequenceState(nm) = cur + 1
        VInt(cur)
      case "rand::bool" => VBool(scala.util.Random.nextBoolean())
      // float/int/time take 0 or 2 bounds (NoneOrRange); bounds given
      // high-to-low swap (fnc/rand.rs — documented-inconsistent but
      // observable), and the ranges are INCLUSIVE
      case "rand::float" if a.length == 1 =>
        throw SqlError("Incorrect arguments for function rand::float(). Expected 0 or 2 arguments")
      case "rand::float" =>
        if (a.length >= 2) {
          val (x, y) = (dbl(0), dbl(1))
          val (mn, mx) = if (y < x) (y, x) else (x, y)
          VFloat(mn + scala.util.Random.nextDouble() * (mx - mn))
        } else VFloat(scala.util.Random.nextDouble())
      case "rand::int" if a.length == 1 =>
        throw SqlError("Incorrect arguments for function rand::int(). Expected 0 or 2 arguments")
      case "rand::int" =>
        if (a.length >= 2) {
          val (x, y) = (int(0), int(1))
          val (mn, mx) = if (y < x) (y, x) else (x, y)
          val span = mx - mn + 1 // inclusive; overflows only on full-range bounds
          VInt(if (span <= 0) scala.util.Random.nextLong()
            else mn + Math.floorMod(scala.util.Random.nextLong(), span))
        } else VInt(scala.util.Random.nextLong())
      case "rand::enum" =>
        // a single array argument picks from ITS elements (fnc/rand.rs)
        val pool = a match {
          case Seq(VArr(items)) => items
          case other => other
        }
        if (pool.isEmpty) VNone else pool(scala.util.Random.nextInt(pool.length))
      case "rand::guid" => VStr(java.util.UUID.randomUUID().toString.replace("-", "").take(20))
      case "rand::uuid" | "rand::uuid::v4" => VUuid(java.util.UUID.randomUUID())
      case "rand::uuid::v7" =>
        // 48-bit ms timestamp + ver 7 + random — time-ordered (RFC 9562);
        // an optional datetime pins the timestamp (rand/uuid_v7_from_datetime)
        val ms = a.headOption match {
          case Some(VDt(t)) => t.toEpochMilli
          case _ => System.currentTimeMillis()
        }
        val hi = (ms << 16) | 0x7000L | (scala.util.Random.nextLong() & 0x0FFFL)
        val lo = (scala.util.Random.nextLong() & 0x3FFFFFFFFFFFFFFFL) | 0x8000000000000000L
        VUuid(new java.util.UUID(hi, lo))
      case "rand::ulid" =>
        // Crockford base32: 10 chars of 48-bit ms time + 16 random chars —
        // lexically time-ordered (rand/ulid_from_datetime)
        val alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
        val ms = a.headOption match {
          case Some(VDt(t)) => t.toEpochMilli
          case _ => System.currentTimeMillis()
        }
        val time = (0 until 10).map(i => alphabet(((ms >>> (5 * (9 - i))) & 31).toInt)).mkString
        val rnd = (0 until 16).map(_ => alphabet(scala.util.Random.nextInt(32))).mkString
        VStr(time + rnd)
      case "rand::time" =>
        // fnc/rand.rs time (r19 sweep): bounds are INT seconds or
        // datetimes ONLY (floats error); both bounds validated against
        // chrono's representable seconds; no bounds → a datetime between
        // years 0000 and 9999
        def secOf(v: V): Long = v match {
          case VDt(t)  => t.getEpochSecond
          case VInt(i) => i
          case _ => throw SqlError(
            "Incorrect arguments for function rand::time(). Expected two arguments of type datetime or int")
        }
        if (a.length == 1)
          throw SqlError("Incorrect arguments for function rand::time(). Expected 0 or 2 arguments")
        val (minS, limS) = (-8334601228800L, 8210266876799L)
        def boundsErr() = throw SqlError(
          "Incorrect arguments for function rand::time(). To generate a random time, " +
            s"the 2 arguments must be numbers between $minS and $limS seconds from the " +
            "UNIX epoch or a 'datetime' within the range d'-262143-01-01T00:00:00Z' " +
            "and +262142-12-31T23:59:59Z'.")
        val (lo, hi) =
          if (a.length >= 2) {
            val (mn0, mx0) = (secOf(arg(0)), secOf(arg(1)))
            if (mn0 < minS || mn0 > limS) boundsErr()
            if (mx0 >= mn0 && mx0 <= limS) (mn0, mx0)
            else if (mx0 >= minS && mx0 <= mn0) (mx0, mn0)
            else boundsErr()
          } else (-62167219200L, 253402300799L)
        val span = hi - lo
        val pick = if (span == 0) lo else lo + Math.floorMod(scala.util.Random.nextLong(), span + 1)
        VDt(java.time.Instant.ofEpochSecond(pick))

      // ---- vector ------------------------------------------------------
      // elementwise ops are NUMBER-typed (util/math/vector.rs works on
      // Vec<Number> with Number arithmetic): int∘int stays int (wrapping
      // add/sub/mul like Rust release, TRUNCATING division), int∘float
      // promotes to float, any decimal promotes to decimal; divide and
      // normalize NaN-guard zero/NaN divisors (vector_div). The r20 float-
      // render sweep surfaced this: join(add([1,2,3],[4,5,6])) must be
      // "5,7,9", not "5f,7f,9f".
      case "vector::add" => vecZipN(numsV(0), numsV(1), name)(numAdd)
      case "vector::subtract" => vecZipN(numsV(0), numsV(1), name)(numSub)
      case "vector::multiply" => vecZipN(numsV(0), numsV(1), name)(numMul)
      case "vector::divide" => vecZipN(numsV(0), numsV(1), name)(vectorDiv)
      case "vector::scale" =>
        val s = num(1)
        VArr(numsV(0).map(x => numMul(x, s)))
      case "vector::dot" =>
        val (x, y) = (numsV(0), numsV(1))
        checkDimsN(x, y, name)
        numDot(x, y)
      case "vector::magnitude" => VFloat(Math.sqrt(nums(0).map(x => x * x).sum))
      case "vector::normalize" =>
        val v = numsV(0)
        val mag = VFloat(Math.sqrt(v.map(x => { val d = x.toDouble; d * d }).sum))
        VArr(v.map(x => vectorDiv(x, mag)))
      case "vector::angle" =>
        val (x, y) = (nums(0), nums(1))
        checkDims(x, y, name)
        val dot = x.zip(y).map { case (m, n) => m * n }.sum
        VFloat(Math.acos(dot / (Math.sqrt(x.map(t => t * t).sum) * Math.sqrt(y.map(t => t * t).sum))))
      case "vector::cross" =>
        val (x, y) = (numsV(0), numsV(1))
        if (x.length != 3 || y.length != 3) throw SqlError(s"Incorrect arguments for function vector::cross(). Both vectors must have a dimension of 3.")
        VArr(Vector(numSub(numMul(x(1), y(2)), numMul(x(2), y(1))),
                    numSub(numMul(x(2), y(0)), numMul(x(0), y(2))),
                    numSub(numMul(x(0), y(1)), numMul(x(1), y(0)))))
      case "vector::project" =>
        val (x, y) = (numsV(0), numsV(1))
        checkDimsN(x, y, name)
        val d = numDot(x, y)
        val m = VFloat(y.map(t => { val td = t.toDouble; td * td }).sum)
        val s = vectorDiv(d, m)
        VArr(y.map(t => numMul(s, t)))
      case "vector::distance::knn" => Search.knnDistance(env)
      case "search::score" => Search.score(env, int(0).toInt)
      case "search::highlight" =>
        val pre = arg(0) match { case VStr(s) => s; case o => o.renderRaw }
        val post = arg(1) match { case VStr(s) => s; case o => o.renderRaw }
        Search.highlight(env, pre, post, int(2).toInt,
          arg(3) match { case VBool(b) => b; case _ => false })
      case "search::offsets" => Search.offsets(env, int(0).toInt,
        arg(1) match { case VBool(b) => b; case _ => false })
      case "search::analyze" =>
        // NON-string analyzer or input yields NONE, not a coercion
        // (fnc/search.rs:22 `if let (… String(az), String(val))` else None)
        (arg(0), arg(1)) match {
          case (VStr(nm), VStr(tx)) => Search.analyzeFn(env, nm, tx)
          case _ => VNone
        }
      case "search::rrf" =>
        Search.rrf(arg(0), int(1), if (a.length > 2) Some(int(2)) else scala.None)
      case "search::linear" =>
        val nm = arg(3) match { case VStr(s) => s; case o => o.renderRaw }
        Search.linear(arg(0), arg(1), int(2), nm)
      case "vector::distance::euclidean" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        VFloat(Math.sqrt(x.zip(y).map { case (m, n) => (m - n) * (m - n) }.sum))
      case "vector::distance::manhattan" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        VFloat(x.zip(y).map { case (m, n) => Math.abs(m - n) }.sum)
      case "vector::distance::chebyshev" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        VFloat(x.zip(y).map { case (m, n) => Math.abs(m - n) }.max)
      case "vector::distance::minkowski" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        val p = dbl(2)
        VFloat(Math.pow(x.zip(y).map { case (m, n) => Math.pow(Math.abs(m - n), p) }.sum, 1.0 / p))
      case "vector::distance::hamming" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        VInt(x.zip(y).count { case (m, n) => m != n })
      case "vector::similarity::cosine" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        val dot = x.zip(y).map { case (m, n) => m * n }.sum
        VFloat(dot / (Math.sqrt(x.map(t => t * t).sum) * Math.sqrt(y.map(t => t * t).sum)))
      case "vector::similarity::jaccard" =>
        val (x, y) = (arr(0), arr(1))
        val inter = x.filter(e => y.exists(V.looseEq(_, e)))
        val union = Coerce.dedup(x ++ y)
        VFloat(if (union.isEmpty) 0 else Coerce.dedup(inter).length.toDouble / union.length)
      case "vector::similarity::pearson" =>
        val (x, y) = (nums(0), nums(1)); checkDims(x, y, name)
        val (mx, my) = (x.sum / x.length, y.sum / y.length)
        val cov = x.zip(y).map { case (m, n) => (m - mx) * (n - my) }.sum
        val sx = Math.sqrt(x.map(t => (t - mx) * (t - mx)).sum)
        val sy = Math.sqrt(y.map(t => (t - my) * (t - my)).sum)
        VFloat(cov / (sx * sy))

      // ---- geo ---------------------------------------------------------
      case "geo::area" =>
        def pts(v: V): Vector[(Double, Double)] = v match {
          case VArr(items) => items.collect {
            case VArr(Vector(x: VNum, y: VNum)) => (x.toDouble, y.toDouble)
            case VGeom("Point", VArr(Vector(x: VNum, y: VNum))) => (x.toDouble, y.toDouble)
          }
          case _ => Vector.empty
        }
        // Chamberlain–Duquette spherical ring area (geo crate, R = WGS84
        // equatorial radius 6378137)
        def ringArea(ring: Vector[(Double, Double)]): Double = {
          val n = ring.length
          if (n < 3) return 0.0
          var total = 0.0
          var i = 0
          while (i < n) {
            val p0 = ring((i + n - 1) % n)
            val p1 = ring(i)
            val p2 = ring((i + 1) % n)
            total += (Math.toRadians(p2._1) - Math.toRadians(p0._1)) * Math.sin(Math.toRadians(p1._2))
            i += 1
          }
          Math.abs(total * 6378137.0 * 6378137.0 / 2.0)
        }
        geom(0) match {
          case VGeom("Polygon", VArr(rings)) =>
            val outer = rings.headOption.map(pts).map(ringArea).getOrElse(0.0)
            val holes = rings.drop(1).map(pts).map(ringArea).sum
            VFloat(outer - holes)
          case VGeom("Point" | "MultiPoint" | "Line" | "LineString" | "MultiLine", _) => VFloat(0.0)
          case other => typeErr(0, "geometry", other)
        }
      case "geo::centroid" =>
        def ring(v: V): Vector[(Double, Double)] = v match {
          case VArr(items) => items.collect {
            case VArr(Vector(x: VNum, y: VNum)) => (x.toDouble, y.toDouble)
          }
          case _ => Vector.empty
        }
        geom(0) match {
          case p @ VGeom("Point", _) => p
          case VGeom("MultiPoint", VArr(items)) =>
            val ps = items.collect { case VGeom("Point", VArr(Vector(x: VNum, y: VNum))) => (x.toDouble, y.toDouble) }
            if (ps.isEmpty) VNone
            else VGeom("Point", VArr(Vector(VFloat(ps.map(_._1).sum / ps.length), VFloat(ps.map(_._2).sum / ps.length))))
          case VGeom("Polygon", VArr(rings)) =>
            val ps = rings.headOption.map(ring).getOrElse(Vector.empty)
            if (ps.length < 3) VNone
            else {
              // planar shoelace centroid, accumulated RELATIVE to the
              // first vertex — the geo crate's translation trick keeps the
              // cross products small so the quotient is exact for simple
              // shapes (geo/algorithm/centroid.rs)
              val (ox, oy) = ps.head
              var a = 0.0; var cx = 0.0; var cy = 0.0
              var i = 0
              val n = ps.length
              while (i < n) {
                val (x1, y1) = (ps(i)._1 - ox, ps(i)._2 - oy)
                val (x2, y2) = (ps((i + 1) % n)._1 - ox, ps((i + 1) % n)._2 - oy)
                val cross = x1 * y2 - x2 * y1
                a += cross; cx += (x1 + x2) * cross; cy += (y1 + y2) * cross
                i += 1
              }
              if (a == 0.0) VNone
              else VGeom("Point", VArr(Vector(
                VFloat(ox + cx / (3 * a)), VFloat(oy + cy / (3 * a)))))
            }
          case other => typeErr(0, "geometry", other)
        }
      case "geo::distance" =>
        (geom(0), geom(1)) match {
          case (VGeom("Point", VArr(Vector(x1: VNum, y1: VNum))), VGeom("Point", VArr(Vector(x2: VNum, y2: VNum)))) =>
            VFloat(haversine(y1.toDouble, x1.toDouble, y2.toDouble, x2.toDouble))
          case _ => VNone
        }
      case "geo::is_valid" =>
        arg(0) match {
          case VGeom("Point", VArr(Vector(x: VNum, y: VNum))) =>
            VBool(y.toDouble >= -90 && y.toDouble <= 90 && x.toDouble >= -180 && x.toDouble <= 180)
          case _: VGeom => VBool(true)
          case other => typeErr(0, "geometry", other)
        }
      case "geo::hash::encode" =>
        val g0 = arg(0) match {
          case o: VObj if o.fields.get("type").contains(VStr("Point")) =>
            o.fields.get("coordinates") match {
              case Some(VArr(Vector(x: VNum, y: VNum))) => VGeom("Point", VArr(Vector(x, y)))
              case _ => arg(0)
            }
          case other => other
        }
        g0 match {
          case VGeom("Point", VArr(Vector(x: VNum, y: VNum))) =>
            // length 1..=12, default 12; out of range → the reference's
            // error — named "geo::encode" in fnc/geo.rs:74, not hash::
            val len = if (a.length > 1) int(1).toInt else 12
            if (len < 1 || len > 12)
              throw SqlError("Incorrect arguments for function geo::encode(). " +
                "The second argument must be an integer greater than 0 and less than or equal to 12.")
            VStr(geohashEncode(y.toDouble, x.toDouble, len))
          case _: VGeom | _: VObj => VNone // non-point geometries hash to NONE (fnc/geo.rs)
          case other => typeErr(0, "geometry", other)
        }
      case "geo::hash::decode" => arg(0) match {
        case VStr(s) =>
          val (lat, lon) = geohashDecode(s)
          VGeom("Point", VArr(Vector(VFloat(lon), VFloat(lat))))
        case _ => VNone
      }
      case "geo::bearing" =>
        (geom(0), geom(1)) match {
          case (VGeom("Point", VArr(Vector(x1: VNum, y1: VNum))), VGeom("Point", VArr(Vector(x2: VNum, y2: VNum)))) =>
            val (lat1, lon1, lat2, lon2) = (Math.toRadians(y1.toDouble), Math.toRadians(x1.toDouble), Math.toRadians(y2.toDouble), Math.toRadians(x2.toDouble))
            val dl = lon2 - lon1
            val yy = Math.sin(dl) * Math.cos(lat2)
            val xx = Math.cos(lat1) * Math.sin(lat2) - Math.sin(lat1) * Math.cos(lat2) * Math.cos(dl)
            val brg = (Math.toDegrees(Math.atan2(yy, xx)) + 360) % 360
            VFloat(if (brg > 180.0) brg - 360.0 else brg)
          case _ => VNone
        }

      // ---- encoding ----------------------------------------------------
      case "encoding::base64::encode" =>
        val bytes = arg(0) match {
          case VBytes(bs) => bs.toArray
          case VStr(s) => s.getBytes("UTF-8")
          case other => other.renderRaw.getBytes("UTF-8")
        }
        // UNPADDED by default; a truthy second arg pads (fnc/encoding.rs)
        val enc = if (a.lift(1).exists(_.truthy)) java.util.Base64.getEncoder
                  else java.util.Base64.getEncoder.withoutPadding()
        VStr(enc.encodeToString(bytes))
      case "encoding::json::encode" | "json::encode" =>
        VStr(Json.encode(arg(0)))
      case "encoding::json::decode" | "json::decode" =>
        try Json.decode(str(0))
        catch {
          case _: Exception =>
            throw SqlError("Incorrect arguments for function encoding::json::decode(). Invalid JSON")
        }
      case "encoding::base64::decode" =>
        // padding-INDIFFERENT like the reference decoder (fnc/encoding.rs
        // DecodePaddingMode::Indifferent — Java's basic decoder accepts
        // canonical-or-absent padding and rejects malformed input), with
        // the reference's error text instead of a raw crash (r18)
        try VBytes(java.util.Base64.getDecoder.decode(str(0)).toVector)
        catch {
          case _: IllegalArgumentException => throw SqlError(
            "Incorrect arguments for function encoding::base64::decode(). invalid base64")
        }
      case "encoding::cbor::encode" =>
        VBytes(Cbor.encode(arg(0)).toVector)
      case "encoding::cbor::decode" =>
        arg(0) match {
          case VBytes(bs) =>
            try Cbor.decode(bs.toArray)
            catch {
              case _: Exception =>
                throw SqlError("Incorrect arguments for function encoding::cbor::decode(). invalid cbor")
            }
          case other => typeErr(0, "bytes", other)
        }

      // ---- session (static defaults) ----------------------------------
      case "session::db" =>
        env.interp.map(i => if (i.curDb.isEmpty && !i.sessionHasDb) VNone else VStr(i.curDb): V).getOrElse(VStr("test"))
      case "session::ns" =>
        env.interp.map(i => if (i.curNs.isEmpty && !i.sessionHasNs) VNone else VStr(i.curNs): V).getOrElse(VStr("test"))
      case "session::id" | "session::origin" | "session::ip" | "session::ac" |
           "session::rd" | "session::token" => VNone

      case "__fetch__" =>
        // RETURN … FETCH paths: replace record ids at the named paths
        val paths = a.drop(1).collect { case VStr(p) => p }
        def fetch(v: V): V = v match {
          case rid: VRid => env.interp.flatMap(_.fetchRecord(rid)).getOrElse(rid)
          case VArr(items) => VArr(items.map(fetch))
          case other => other
        }
        def applyPath(v: V, path: List[String]): V = (v, path) match {
          case (_, Nil) => fetch(v)
          case (VObj(fs), head :: rest) =>
            fs.get(head) match {
              case Some(inner) => VObj(fs.updated(head, applyPath(inner, rest)))
              case scala.None => v
            }
          case (VArr(items), _) => VArr(items.map(applyPath(_, path)))
          case _ => v
        }
        paths.foldLeft(arg(0)) { (acc, pth) => applyPath(acc, pth.split('.').toList) }
      case "api::invoke" =>
        val path = arg(0) match {
          case VStr(p) => p
          case other   => throw SqlError(s"Incorrect arguments for function api::invoke(). Argument 1 was the wrong type. Expected `string` but found `${other.render}`")
        }
        Api.invoke(path, a.lift(1).filter(_ != VNone), env)
      case custom if custom.startsWith("fn::") =>
        // function PERMISSIONS apply to record users (fnc custom dispatch:
        // reproductions/function_permissions_none_record)
        env.interp.filter(_.recordAuth).foreach { in =>
          in.functionDefs.get(custom).foreach { d =>
            val denied = d.perms match {
              case "NONE" => true
              case w if w.startsWith("WHERE ") =>
                !(try Eval.eval(Parser.parse("RETURN " + w.stripPrefix("WHERE ") + ";")
                    .stmts.collectFirst { case ReturnStmt(e) => e }.get,
                  Env(params = in.globals +
                    ("auth" -> in.authRid.map(identity[V]).getOrElse(VNone)),
                    interp = env.interp)).truthy
                catch { case _: Exception => false })
              case _ => false
            }
            if (denied)
              throw SqlError(s"You don't have permission to run the $custom function")
          }
        }
        env.interp.flatMap(_.customFns.get(custom.stripPrefix("fn::"))) match {
          case Some(cl) =>
            // custom functions enforce arity: trailing option<T>/any params
            // are optional (fnc script dispatch arg check)
            cl match {
              case VClosure(params, _, _, _) =>
                val max = params.length
                def optionalKind(k: Option[Kind]): Boolean = k match {
                  case Some(_: Kind.KOption) | Some(Kind.KAny) | scala.None => true
                  case _ => false
                }
                val min = max - params.reverseIterator.takeWhile(p => optionalKind(p._2)).length
                if (a.length < min || a.length > max) {
                  val what =
                    if (min == max) s"$max argument" + (if (max == 1) "" else "s")
                    else s"$min to $max arguments"
                  throw SqlError(s"Incorrect arguments for function $custom(). The function expects $what.")
                }
              case _ => ()
            }
            // named functions report per-argument coercion failures with the
            // fn:: path (coerce/regex golden), not the ANONYMOUS form
            // the body runs under the function's auth ceiling (ALTER by a
            // DB-level principal pins it; alter_auth_limit_escalation)
            val ceilIn = env.interp.filter(_.fnAuthCeiling.contains(custom))
            val savedCeil = ceilIn.map(_.activeFnCeiling)
            ceilIn.foreach(in => in.activeFnCeiling = in.fnAuthCeiling.get(custom))
            // depth budget: function frames cost 8 of the 120-unit budget
            // (err/mod.rs:381) — the 16th nested fn:: frame errors
            env.interp.foreach { in =>
              if (in.fnCallDepth >= 15)
                throw SqlError("Reached excessive computation depth due to functions, subqueries, or computed values")
              in.fnCallDepth += 1
            }
            try applyClosure(cl, a, env)
            catch {
              case e: SqlError if e.msg.startsWith("Incorrect arguments for function ANONYMOUS()") =>
                val m = "argument \\$(\\w+)$".r.findFirstMatchIn(e.msg)
                (m, cl) match {
                  case (Some(mm), VClosure(params, _, _, _)) =>
                    val pname = mm.group(1)
                    val idx = params.indexWhere(_._1 == pname)
                    val found = if (idx >= 0 && idx < a.length) a(idx) else VNone
                    val kTxt = params.lift(idx).flatMap(_._2).map(Explain.kindSql).getOrElse("any")
                    throw SqlError(s"Incorrect arguments for function $custom(). " +
                      s"Failed to coerce argument `$$$pname`: Expected `$kTxt` but found `${found.render}`")
                  case _ => throw e
                }
            } finally {
              env.interp.foreach(in => in.fnCallDepth -= 1)
              (ceilIn, savedCeil) match {
                case (Some(in), Some(c)) => in.activeFnCeiling = c
                case _ => ()
              }
            }
          case scala.None => throw SqlError(s"The function '$custom' does not exist")
        }
      case ml if ml.startsWith("ml::") =>
        // model invocation requires the ML capability (fnc/mod.rs)
        throw SqlError("Problem with machine learning computation. Machine learning computation is not enabled.")
      case mod if mod.startsWith("mod::") =>
        throw SqlError("Module functions are not enabled")
      case other => throw SqlError(s"Unknown function $other()")
    }
  }

  // ---- helpers ---------------------------------------------------------

  private def inst(v: V): java.time.Instant = v match {
    case VDt(t) => t
    case other => throw SqlError(s"Expected a datetime but found ${other.render}")
  }
  private def utc(v: V): java.time.ZonedDateTime =
    inst(v).atZone(java.time.ZoneOffset.UTC)
  private def durOf(v: V): VDur = v match {
    case d: VDur => d
    case other => throw SqlError(s"Expected a duration but found ${other.render}")
  }

  /** The reference's duration constructors take u64 counts: a negative i64
    * argument reinterprets as its unsigned value (so from_micros(-1) is a
    * VALID huge duration while from_days(-1) overflows u64 seconds, and the
    * overflow message renders the unsigned number — fnc/duration.rs). */
  private def durUnsignedArg(v: V, name: String): BigInt = v match {
    case VInt(i) =>
      if (i >= 0) BigInt(i) else BigInt(java.lang.Long.toUnsignedString(i))
    case VDec(d) if d.isWhole && d >= 0 => d.toBigInt
    case VFloat(d) if d == Math.rint(d) && d >= 0 => BigInt(d.toLong)
    case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 1 was the wrong type. Expected `int` but found `${other.render}`")
  }

  private val U64Max = BigInt(2).pow(64) - 1

  private def durMul(v: V, unitSecs: Long, name: String): VDur = {
    val n = durUnsignedArg(v, name)
    val secs = n * unitSecs
    // the reference's overflow text always prints the Rust fn path
    // (duration::from_days), whichever alias was called (fnc/duration.rs)
    if (secs > U64Max)
      throw SqlError(s"""Failed to compute: "${name.replace("from::", "from_")}($n)", as the operation results in an arithmetic overflow.""")
    VDur(secs.toLong, 0)
  }

  /** Sub-second constructors: u64 count of `perSec`-ths of a second. */
  private def durDiv(v: V, perSec: Long, name: String): VDur = {
    val n = durUnsignedArg(v, name)
    val secs = n / perSec
    val rem = (n % perSec).toLong
    VDur(secs.toLong, (rem * (1000000000L / perSec)).toInt)
  }

  /** RFC2822-ish email split: Some((local, host)) or None when invalid
    * (fnc/parse.rs email via addr crate; IPv6 literals are rejected). */
  /** RFC-ish IPv6 textual check (supports ::-compression). */
  /** Numbers-only array for math::top/bottom. */
  private def nums2(items: Vector[V], name: String): Vector[VNum] = items.map {
    case n: VNum => n
    case other => throw SqlError(s"Incorrect arguments for function $name(). Argument 1 was the wrong type. Expected `number` but found `${other.render}` when coercing an element of `array<number>`")
  }

  /** Rust BinaryHeap-faithful k-selection: replicates push/pop sift order so
    * the output order matches the reference's heap.into_vec(). */
  private def heapSelect(items: Vector[VNum], k: Int, smallestOut: Boolean): VArr = {
    // comparator: max-heap over (Reverse for top → min at root)
    val buf = scala.collection.mutable.ArrayBuffer[VNum]()
    def less(a: VNum, b: VNum): Boolean = {
      val c = V.cmpNum(a, b)
      if (smallestOut) c > 0 else c < 0 // Reverse() flips for top
    }
    def siftUp(start: Int): Unit = {
      var pos = start
      while (pos > 0) {
        val parent = (pos - 1) / 2
        if (less(buf(pos), buf(parent))) return
        val t = buf(pos); buf(pos) = buf(parent); buf(parent) = t
        pos = parent
      }
    }
    def siftDown(start: Int): Unit = {
      var pos = start
      var go = true
      while (go) {
        var child = 2 * pos + 1
        if (child >= buf.length) go = false
        else {
          if (child + 1 < buf.length && less(buf(child), buf(child + 1))) child += 1
          if (less(buf(pos), buf(child))) {
            val t = buf(pos); buf(pos) = buf(child); buf(child) = t
            pos = child
          } else go = false
        }
      }
    }
    items.zipWithIndex.foreach { case (v, i) =>
      buf += v
      siftUp(buf.length - 1)
      if (i >= k) { // pop root
        val last = buf.remove(buf.length - 1)
        if (buf.nonEmpty) { buf(0) = last; siftDown(0) }
      }
    }
    VArr(buf.toVector)
  }

  private def vecZip(x: Vector[Double], y: Vector[Double], name: String)(f: (Double, Double) => Double): VArr = {
    checkDims(x, y, name)
    VArr(x.zip(y).map { case (m, n) => VFloat(f(m, n)) })
  }

  // ---- unchecked Number arithmetic (val/number.rs ops::Add/Sub/Mul/Div:
  // int∘int wraps like Rust release and TRUNCATES on division, int∘float
  // promotes float, anything-with-decimal promotes decimal) — the vector
  // namespace uses these, NOT the checked try_* operators the `+` family
  // lowers to
  private val VecDecCtx = new java.math.MathContext(28)
  private def numAdd(a: VNum, b: VNum): VNum = (a, b) match {
    case (VInt(x), VInt(y))     => VInt(x + y)
    case (VFloat(x), VFloat(y)) => VFloat(x + y)
    case (VDec(x), VDec(y))     => VDec(x + y)
    case (VInt(x), VFloat(y))   => VFloat(x + y)
    case (VFloat(x), VInt(y))   => VFloat(x + y)
    case (x, y)                 => VDec(x.toBig + y.toBig)
  }
  private def numSub(a: VNum, b: VNum): VNum = (a, b) match {
    case (VInt(x), VInt(y))     => VInt(x - y)
    case (VFloat(x), VFloat(y)) => VFloat(x - y)
    case (VDec(x), VDec(y))     => VDec(x - y)
    case (VInt(x), VFloat(y))   => VFloat(x - y)
    case (VFloat(x), VInt(y))   => VFloat(x - y)
    case (x, y)                 => VDec(x.toBig - y.toBig)
  }
  private def numMul(a: VNum, b: VNum): VNum = (a, b) match {
    case (VInt(x), VInt(y))     => VInt(x * y)
    case (VFloat(x), VFloat(y)) => VFloat(x * y)
    case (VDec(x), VDec(y))     => VDec(x * y)
    case (VInt(x), VFloat(y))   => VFloat(x * y)
    case (VFloat(x), VInt(y))   => VFloat(x * y)
    case (x, y)                 => VDec(x.toBig * y.toBig)
  }
  private def numDiv(a: VNum, b: VNum): VNum = (a, b) match {
    case (VInt(x), VInt(y))     => VInt(x / y) // zero guarded by vectorDiv
    case (VFloat(x), VFloat(y)) => VFloat(x / y)
    case (VDec(x), VDec(y))     => VDec(x(VecDecCtx) / y)
    case (VInt(x), VFloat(y))   => VFloat(x / y)
    case (VFloat(x), VInt(y))   => VFloat(x / y)
    case (x, y)                 => VDec(x.toBig(VecDecCtx) / y.toBig)
  }
  private def numIsNaN(a: VNum): Boolean = a match {
    case VFloat(d) => d.isNaN; case _ => false
  }
  private def numIsZero(a: VNum): Boolean = a match {
    case VInt(i) => i == 0; case VFloat(d) => d == 0.0; case VDec(d) => d.signum == 0
  }
  /** vector_div (util/math/vector.rs:90): NaN when either side is NaN or
    * the divisor is zero; plain Number division otherwise. */
  private def vectorDiv(a: VNum, b: VNum): VNum =
    if (numIsNaN(a) || numIsNaN(b) || numIsZero(b)) VFloat(Double.NaN)
    else numDiv(a, b)
  /** Number-typed dot: Σ aᵢ·bᵢ with Number `sum()` — starts at Int(0), so
    * an int dot of int vectors stays int. */
  private def numDot(x: Vector[VNum], y: Vector[VNum]): VNum =
    x.zip(y).map { case (m, n) => numMul(m, n) }
      .foldLeft(VInt(0): VNum)(numAdd)
  private def vecZipN(x: Vector[VNum], y: Vector[VNum], name: String)(
      f: (VNum, VNum) => VNum): VArr = {
    checkDimsN(x, y, name)
    VArr(x.zip(y).map { case (m, n) => f(m, n) })
  }
  private def checkDimsN(x: Vector[VNum], y: Vector[VNum], name: String): Unit =
    if (x.length != y.length)
      throw SqlError(s"Incorrect arguments for function $name(). The two vectors must be of the same dimension.")
  private def checkDims(x: Vector[Double], y: Vector[Double], name: String): Unit =
    if (x.length != y.length)
      throw SqlError(s"Incorrect arguments for function $name(). The two vectors must be of the same dimension.")

  private def percentile(ns: Vector[Double], p: Double): Double = {
    val sorted = ns.sorted
    if (sorted.isEmpty) return Double.NaN
    val rank = p / 100.0 * (sorted.length - 1)
    val lo = Math.floor(rank).toInt
    val hi = Math.ceil(rank).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
  }

  /** Incremental-view variance: (sum_of_squares - sum·mean) / (n-1) over
    * running sums — the rolling formula's float artifacts are observable
    * (catalog/aggregation.rs:454). */
  private def rollingVariance(ns: Seq[Double]): Double = {
    val n = ns.length
    val sum = ns.sum
    val sumsq = ns.map(x => x * x).sum
    (sumsq - sum * (sum / n)) / (n - 1)
  }

  private def digest(algo: String, s: String): String =
    java.security.MessageDigest.getInstance(algo).digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** crypto::pbkdf2 (REAL since r18, reference-compatible): generate
    * emits the pbkdf2 crate 0.12's PHC string
    * (`$pbkdf2-sha256$i=600000,l=32$<salt>$<dk>`, unpadded standard B64,
    * crate-default 600k rounds), and compare verifies ANY PHC pbkdf2
    * hash — sha256/sha512/sha1 idents — with the reference's cost
    * allowance (rounds ≤ 4×600000, length ≤ 4×32; fnc/crypto.rs:49,
    * 157-187). argon2/bcrypt/scrypt live in [[Argon2]]/[[Bcrypt]]/
    * [[Scrypt]] (real since r19). Like every reference cmp, malformed
    * hashes compare false, never error. */
  /** Public faces for the Spark-path kernels ([[graft.functions.Pw]]). */
  def pbkdf2Generate(pass: String): String = pwHash("pbkdf2-sha256", pass)
  def pbkdf2Compare(hash: String, pass: String): Boolean = pwCompare(hash, pass)

  private def pwHash(scheme: String, pass: String): String = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    val b64 = java.util.Base64.getEncoder.withoutPadding
    val dk = pbkdf2Dk("PBKDF2WithHmacSHA256", pass, salt, 600000, 32)
    s"$$pbkdf2-sha256$$i=600000,l=32$$${b64.encodeToString(salt)}$$${b64.encodeToString(dk)}"
  }

  private def pbkdf2Dk(mac: String, pass: String, salt: Array[Byte],
      rounds: Int, lenBytes: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      pass.toCharArray, salt, rounds, lenBytes * 8)
    javax.crypto.SecretKeyFactory.getInstance(mac)
      .generateSecret(spec).getEncoded
  }

  /** PHC-format pbkdf2 verification (pbkdf2 crate cmp, fnc/crypto.rs:167):
    * parse `$<ident>$i=N,l=M$<salt>$<dk>`, bound the cost, constant-time
    * compare. Anything malformed or over-cost → false. */
  private def verifyPbkdf2Phc(alg: String, params: String, saltB64: String,
      dkB64: String, pass: String): Boolean = try {
    val mac = alg match {
      case "pbkdf2-sha256" => "PBKDF2WithHmacSHA256"
      case "pbkdf2-sha512" => "PBKDF2WithHmacSHA512"
      case "pbkdf2"        => "PBKDF2WithHmacSHA1"
      case _ => return false
    }
    val kv = params.split(',').flatMap(_.split('=') match {
      case Array(k, v) => Some(k -> v); case _ => scala.None
    }).toMap
    val dec = java.util.Base64.getDecoder
    val salt = dec.decode(saltB64)
    val expected = dec.decode(dkB64)
    val rounds = kv.get("i").map(_.toInt).getOrElse(600000)
    val l = kv.get("l").map(_.toInt).getOrElse(expected.length)
    // reference cost allowance: rounds ≤ default×4, output ≤ default×4
    if (rounds <= 0 || rounds > 600000 * 4 || l > 32 * 4 ||
        l != expected.length) return false
    java.security.MessageDigest.isEqual(
      pbkdf2Dk(mac, pass, salt, rounds, l), expected)
  } catch { case _: Exception => false }

  private def pwCompare(hash: String, pass: String): Boolean =
    hash.split('$') match {
      case Array("", alg, params, saltB64, dkB64) if alg.startsWith("pbkdf2") =>
        verifyPbkdf2Phc(alg, params, saltB64, dkB64, pass)
      case _ => false
    }


  private val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash encode, the reference's own bit loop EXACTLY
    * (fnc/util/geo/mod.rs:10-48): the boundary test is STRICT `>` — a
    * coordinate exactly on a grid midpoint takes the 0 bit, so encode of
    * (0, 0) is "7zzzzzzzzzzz", NOT the "s000…" every >=-based geohash
    * library produces (r18 sweep catch). */
  private def geohashEncode(lat: Double, lon: Double, len: Int): String = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var even = true
    while (sb.length < len) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon > mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat > mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(GeohashBase32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Geohash decode with the reference's exact char mapping
    * (fnc/util/geo/mod.rs:59-74): NO case folding, and a character
    * outside the base32 alphabet falls through as its RAW code point
    * (low 5 bits used) rather than erroring — quirky, but observable. */
  private def geohashDecode(hash: String): (Double, Double) = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    var even = true
    // iterate CODE POINTS like Rust `chars()` (util/geo/mod.rs:59) — the
    // invalid-char fall-through uses the raw scalar value, so a non-BMP
    // char must contribute ONE iteration, not two surrogate halves
    hash.codePoints.forEach { ord =>
      val cd =
        if (ord >= 48 && ord <= 57) ord - 48        // 0-9
        else if (ord >= 98 && ord <= 104) ord - 88  // b-h
        else if (ord >= 106 && ord <= 107) ord - 89 // j-k
        else if (ord >= 109 && ord <= 110) ord - 90 // m-n
        else if (ord >= 112 && ord <= 122) ord - 91 // p-z
        else ord                                    // raw fallthrough
      (4 to 0 by -1).foreach { i =>
        val bit = (cd >> i) & 1
        if (even) { val mid = (lonLo + lonHi) / 2; if (bit == 1) lonLo = mid else lonHi = mid }
        else { val mid = (latLo + latHi) / 2; if (bit == 1) latLo = mid else latHi = mid }
        even = !even
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /** Haversine distance, the georust `Haversine.distance` shape the
    * reference calls (fnc/geo.rs): a = sin²(Δθ/2) + cosθ1·cosθ2·sin²(Δλ/2),
    * d = R · (2 · asin(√a)) — the asin form with this exact association,
    * NOT the atan2(√a, √(1−a)) variant (same math, different ulps: an r17
    * geo sweep found the two engines disagreeing bit-level; the Spark
    * lowering mirrors this shape and DifferentialSpec pins bit-equality). */
  private def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val R = 6371008.8
    val t1 = Math.toRadians(lat1); val t2 = Math.toRadians(lat2)
    val sT = Math.sin(Math.toRadians(lat2 - lat1) / 2)
    val sL = Math.sin(Math.toRadians(lon2 - lon1) / 2)
    val aa = sT * sT + Math.cos(t1) * Math.cos(t2) * (sL * sL)
    R * (2 * Math.asin(Math.sqrt(aa)))
  }

  /** Natural sort: digit runs compare numerically ("2" < "11"). */
  /** Optional sort-direction argument: "desc"/false → descending. */
  /** Parse a type::field/type::fields path string as an idiom, with the
    * reference's error text on failure (builtin/type.rs:132
    * "Invalid field path '{path}': {e}"). */
  private[surql] def parseFieldPath(path: String): ast.Expr =
    try Parser.parseExpr(path)
    catch { case e: Exception =>
      throw SqlError(s"Invalid field path '$path': ${e.getMessage}") }

  /** Record-id key from a type::thing/type::record second argument
    * (fnc/type.rs record: Number::Int stays an int key; Float/Decimal
    * convert to their PLAIN Rust `to_string` as STRING keys — "2", not
    * "2f"; other values keep their own key form). */
  private def ridKeyOf(key: V): V = key match {
    case VFloat(d) =>
      VStr(if (d.isNaN) "NaN"
           else if (d == Double.PositiveInfinity) "inf"
           else if (d == Double.NegativeInfinity) "-inf"
           else Render.floatDigits(d))
    case VDec(d) => VStr(Render.decStr(d))
    case other   => other
  }

  private def descArg(v: V): Boolean = v match {
    case VStr(s)  => s.equalsIgnoreCase("desc")
    case VBool(b) => !b
    case _        => false
  }

  def naturalCmp(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i); val cb = b.charAt(j)
      if (ca.isDigit && cb.isDigit) {
        val si = i; val sj = j
        while (i < a.length && a.charAt(i).isDigit) i += 1
        while (j < b.length && b.charAt(j).isDigit) j += 1
        val na = BigInt(a.substring(si, i)); val nb = BigInt(b.substring(sj, j))
        val c = na.compare(nb)
        if (c != 0) return c
      } else {
        val c = ca.compareTo(cb)
        if (c != 0) return c
        i += 1; j += 1
      }
    }
    (a.length - i).compareTo(b.length - j)
  }

  def naturalLexicalCmp(a: String, b: String): Int = {
    var i = 0; var j = 0
    val coll = java.text.Collator.getInstance(java.util.Locale.ROOT)
    while (i < a.length && j < b.length) {
      val ca = a.charAt(i); val cb = b.charAt(j)
      if (ca.isDigit && cb.isDigit) {
        val si = i; val sj = j
        while (i < a.length && a.charAt(i).isDigit) i += 1
        while (j < b.length && b.charAt(j).isDigit) j += 1
        val c = BigInt(a.substring(si, i)).compare(BigInt(b.substring(sj, j)))
        if (c != 0) return c
      } else {
        val c = coll.compare(ca.toString, cb.toString)
        if (c != 0) return c
        i += 1; j += 1
      }
    }
    (a.length - i).compareTo(b.length - j)
  }

  // ---- file:: object-store namespace ------------------------------------
  // fnc/file.rs over the bucket controller (buc/controller.rs) with the
  // in-memory backend (buc/store/memory.rs). Keys normalize to a leading
  // '/' for display/errors; VFile.key stores the path without it.
  private def fileFn(name: String, a: Seq[V], env: Env): V = {
    def interp = env.interp.getOrElse(throw SqlError(s"Unknown function $name()"))
    def arg(i: Int): V = if (i < a.length) a(i) else VNone
    def asFile(i: Int): VFile = arg(i) match {
      case f: VFile => f
      case other => throw SqlError(
        s"Incorrect arguments for function $name(). Argument ${i + 1} was the wrong type. " +
          s"Expected `file` but found `${other.render}`")
    }
    def noSlash(k: String): String = if (k.startsWith("/")) k.substring(1) else k
    def disp(k: String): String = "/" + noSlash(k)
    def bucketOf(b: String): Interp#BucketRt =
      interp.buckets.getOrElse(b, throw SqlError(s"The bucket '$b' does not exist"))
    def writable(b: String): Interp#BucketRt = {
      val bk = bucketOf(b)
      if (bk.readonly)
        throw SqlError(s"Write operation is not supported, as bucket `$b` is in read-only mode")
      bk
    }
    def opFail(b: String, msg: String): Nothing =
      throw SqlError(s"Operation for bucket `$b` failed: $msg")
    def toBytes(v: V): Vector[Byte] = Coerce.cast(Kind.KBytes, v) match {
      case VBytes(bs) => bs
      case _ => Vector.empty
    }
    def meta(bucket: String, key: String, e: (Vector[Byte], java.time.Instant)): V =
      VObj(TreeMap(
        "file" -> VFile(bucket, noSlash(key)),
        "size" -> VInt(e._1.length.toLong),
        "updated" -> VDt(e._2)))
    def now() = java.time.Instant.now()
    // copy/copy_if_not_exists destination: string (same bucket) or file
    def dstOf(i: Int, srcBucket: String): (String, String) = arg(i) match {
      case VFile(b, k) => (b, disp(k))
      case VStr(s)     => (srcBucket, disp(s))
      case other => throw SqlError(
        s"Incorrect arguments for function $name(). Argument ${i + 1} was the wrong type. " +
          s"Expected `string` but found `${other.render}`")
    }

    name match {
      case "file::bucket" => VStr(asFile(0).bucket)
      case "file::key"    => VStr(disp(asFile(0).key))
      case "file::put" | "file::put_if_not_exists" =>
        val f = asFile(0)
        val bk = writable(f.bucket)
        val k = disp(f.key)
        if (name == "file::put" || !bk.objects.contains(k))
          bk.objects(k) = (toBytes(arg(1)), now())
        VNone
      case "file::get" =>
        bucketOf(asFile(0).bucket).objects.get(disp(asFile(0).key)) match {
          case Some((bs, _)) => VBytes(bs)
          case scala.None    => VNone
        }
      case "file::head" =>
        val f = asFile(0)
        bucketOf(f.bucket).objects.get(disp(f.key)) match {
          case Some(e)    => meta(f.bucket, disp(f.key), e)
          case scala.None => VNone
        }
      case "file::exists" =>
        VBool(bucketOf(asFile(0).bucket).objects.contains(disp(asFile(0).key)))
      case "file::delete" =>
        val f = asFile(0)
        writable(f.bucket).objects.remove(disp(f.key))
        VNone
      case "file::copy" | "file::copy_if_not_exists" =>
        val src = asFile(0)
        val (dstBucket, dstKey) = dstOf(1, src.bucket)
        val srcKey = disp(src.key)
        if (dstBucket == src.bucket) {
          val bk = writable(src.bucket)
          if (name == "file::copy_if_not_exists" && bk.objects.contains(dstKey)) return VNone
          bk.objects.get(srcKey) match {
            case Some(e) => bk.objects(dstKey) = e
            case scala.None =>
              if (name == "file::copy") opFail(src.bucket, s"Source key does not exist: $srcKey")
            // copy_if_not_exists with a missing source is idempotent-ok
          }
        } else {
          val srcBk = bucketOf(src.bucket)
          val dstBk = writable(dstBucket)
          srcBk.objects.get(srcKey) match {
            case Some(e) =>
              if (name == "file::copy" || !dstBk.objects.contains(dstKey))
                dstBk.objects(dstKey) = e
            case scala.None => throw SqlError("Source file does not exist")
          }
        }
        VNone
      case "file::rename" | "file::rename_if_not_exists" =>
        val f = asFile(0)
        val bk = writable(f.bucket)
        val srcKey = disp(f.key)
        val dstKey = arg(1) match {
          case VStr(s) => disp(s)
          case VFile(_, k) => disp(k)
          case other => throw SqlError(
            s"Incorrect arguments for function $name(). Argument 2 was the wrong type. " +
              s"Expected `string` but found `${other.render}`")
        }
        if (name == "file::rename_if_not_exists" && bk.objects.contains(dstKey)) return VNone
        bk.objects.remove(srcKey) match {
          case Some(e)    => bk.objects(dstKey) = e
          case scala.None => opFail(f.bucket, s"Source key does not exist: $srcKey")
        }
        VNone
      case "file::list" =>
        val bucket = arg(0) match {
          case VStr(s) => s
          case other => throw SqlError(
            s"Incorrect arguments for function $name(). Argument 1 was the wrong type. " +
              s"Expected `string` but found `${other.render}`")
        }
        val bk = bucketOf(bucket)
        var prefix = ""
        var start: Option[String] = scala.None
        var limit: Option[Int] = scala.None
        arg(1) match {
          case VObj(fs) =>
            fs.get("prefix").foreach { case VStr(p) => prefix = disp(p); case _ => () }
            fs.get("start").foreach { case VStr(s0) => start = Some(disp(s0)); case _ => () }
            fs.get("limit").foreach {
              case VInt(n) => limit = Some(n.toInt)
              case _       => ()
            }
          case _ => ()
        }
        var keys = bk.objects.keys.toVector
          .filter(_.startsWith(prefix))
          .filter(k => start.forall(k > _))
          .sorted
        limit.foreach(l => keys = keys.take(l))
        VArr(keys.map(k => meta(bucket, k, bk.objects(k))))
      case _ => throw SqlError(s"Unknown function $name()")
    }
  }
}
