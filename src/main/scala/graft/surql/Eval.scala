package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap

/** Control-flow signals (reference FlowResult: Break/Continue/Return/Throw). */
final case class ReturnSignal(v: V) extends Exception
case object BreakSignal extends Exception
case object ContinueSignal extends Exception

/** Evaluation environment: parameter bindings + the current document.
  * `repeat` carries the active RepeatRecurse (`.@`) expansion callback
  * during recursion-nest evaluation (exec/operators/recursion/repeat.rs). */
final case class Env(
    params: Map[String, V] = Map.empty,
    doc: Option[VObj] = scala.None,
    interp: Option[Interp] = scala.None,
    repeat: Option[V => V] = scala.None,
    /** Closure bodies run read-only: writes to missing tables fail. */
    readonly: Boolean = false) {
  def bind(name: String, v: V): Env = copy(params = params + (name -> v))
}

/** Tree-walking evaluator for SurrealQL expressions over [[V]] values —
  * the semantics mirror the reference's physical expressions
  * (surrealdb: exec/physical_expr/, fnc/operate.rs). The Spark planner
  * lowers the same AST to Columns for table-scale queries; this evaluator
  * is the scalar/procedural path (RETURN, params, control flow) and the
  * oracle for golden-corpus comparison. */
object Eval {

  def evalConst(e: Expr): V = eval(e, Env())

  def eval(e: Expr, env: Env): V = e match {
    case NativeExpr(f) => f(env)
    case Lit(v)        => v
    case ArrLit(items) => VArr(items.map(eval(_, env)).toVector)
    case ObjLit(fs)    =>
      val o = VObj(TreeMap(fs.map { case (k, fe) => k -> eval(fe, env) }: _*))
      // GeoJSON-shaped objects normalize to geometry values (val/geometry.rs)
      V.asGeom(o).getOrElse(o)
    case RidLit(tb, keyE) =>
      eval(keyE, env) match {
        case r: VRng => VRid(tb, r)
        case k       => VRid(tb, k)
      }
    case RangeLit(lo, hi) =>
      VRng(lo.map { case (be, i) => (eval(be, env), i) }, hi.map { case (be, i) => (eval(be, env), i) })
    case Param(name) =>
      // session variables (LET) shadow DEFINE PARAM values (param/shadowed)
      env.params.get(name)
        .orElse(env.interp.flatMap(_.versionedParam(name)))
        .orElse(builtinParam(name, env)).getOrElse {
          // a DB-param lookup needs a selected namespace+database: an
          // undefined param without one errors (param_no_namespace /
          // parameters/outside_database) — with both selected it is NONE
          env.interp.foreach { in =>
            if (!in.sessionHasNs) throw SqlError("Specify a namespace to use")
            if (!in.sessionHasDb) throw SqlError("Specify a database to use")
          }
          VNone
        }
    case Constant(name) => constant(name)
    case JsExpr(args, body) =>
      // capability gate first: with scripting denied the reference rejects
      // the function before evaluation (self_tests/no_scripting_capabilities)
      if (env.interp.exists(!_.capScripting))
        throw SqlError("Scripting functions are not allowed")
      val argVals = args.map(a => eval(a, env))
      Js.run(body, argVals, env)
    case TableRef(name) => VTable(name)
    case Closure(params, body, ret) => VClosure(params, body, ret, env.params)
    case Cast(k, inner) => Coerce.cast(k, eval(inner, env))
    case FnCall(name, args) => Functions.call(name, args, env)
    case Prefix(op, inner) =>
      val v = eval(inner, env)
      op match {
        case "!" => VBool(!v.truthy)
        case "-" => Ops.neg(v)
        case "+" => v match {
          case n: VNum => n
          case other   => other // unary plus is a no-op in the reference
        }
      }
    case Binary(op, l, r) => binary(op, l, r, env)
    case Idiom(parts)     => evalIdiom(parts, env)
    case IfExpr(branches, otherwise) =>
      // IF/ELSE branch blocks are transparent to RETURN — the signal
      // bubbles to the ENCLOSING block (reference FlowResult::Return)
      def evalBody(b: Expr): V = b match {
        case BlockExpr(stmts) => env.interp match {
          case Some(in) => in.runBlockOpen(stmts, env)
          case scala.None =>
            val in = new Interp()
            in.runBlockOpen(stmts, env.copy(interp = Some(in)))
        }
        case other => eval(other, env)
      }
      branches.find { case (c, _) => eval(c, env).truthy } match {
        case Some((_, body)) => evalBody(body)
        case scala.None      => otherwise.map(evalBody).getOrElse(VNone)
      }
    case BlockExpr(stmts) =>
      env.interp match {
        case Some(in) => in.runBlock(stmts, env)
        case scala.None =>
          val in = new Interp()
          in.runBlock(stmts, env.copy(interp = Some(in)))
      }
    case Subquery(stmt) =>
      // inside a subquery the outer document becomes $parent — using the
      // PINNED outer $this when a mutation pinned one, not the evolving doc
      // (exec/physical_expr/subquery.rs; define/param/parent)
      val subEnv = env.params.get("this").orElse(env.doc.map(identity[V])) match {
        case Some(d) => env.copy(
          // the subquery's document context is the PINNED outer $this, not
          // a mutation's evolving doc (define/param/parent)
          doc = d match { case o: VObj => Some(o); case _ => scala.None },
          params = env.params - "this" + ("parent" -> d))
        case scala.None => env
      }
      subEnv.interp match {
        case Some(in) => in.execStatement(stmt, subEnv)
        case scala.None =>
          val in = new Interp()
          in.execStatement(stmt, subEnv.copy(interp = Some(in)))
      }
  }

  private def builtinParam(name: String, env: Env): Option[V] = name match {
    case "this" | "self" => env.doc
    case "parent"        => env.params.get("parent")
    case "session"       => env.interp.map { i =>
      import scala.collection.immutable.TreeMap
      def opt(v: String, selected: Boolean): V = if (v.isEmpty && !selected) VNone else VStr(v)
      // the session object always carries ALL nine claims, absent ones as
      // NONE (dbs/session.rs values(); self_tests/auth_db_variables)
      VObj(TreeMap[String, V](
        "ac" -> i.sessionAccess.map(VStr(_): V).getOrElse(VNone),
        "db" -> opt(i.curDb, i.sessionHasDb),
        "exp" -> VNone,
        "id" -> VNone,
        "ip" -> VNone,
        "ns" -> opt(i.curNs, i.sessionHasNs),
        "or" -> VNone,
        "rd" -> i.sessionRd.map(identity[V]).getOrElse(VNone),
        "tk" -> i.sessionToken.getOrElse(VNone)))
    }
    case "auth"          => env.interp.flatMap(_.authRid).map(identity[V])
    case "access"        => env.interp.flatMap(_.sessionAccess).map(VStr(_): V)
    case "token"         => env.interp.flatMap(_.sessionToken)
    case _               => scala.None
  }

  def constant(name: String): V = name.toLowerCase match {
    case "math::pi"          => VFloat(Math.PI)
    case "math::e"           => VFloat(Math.E)
    case "math::tau"         => VFloat(Math.PI * 2)
    case "math::inf" | "math::infinity" => VFloat(Double.PositiveInfinity)
    case "math::neg_inf" | "math::neg_infinity" => VFloat(Double.NegativeInfinity)
    case "math::frac_1_pi"   => VFloat(1.0 / Math.PI)
    case "math::frac_1_sqrt_2" => VFloat(0.70710678118654752440084436210484903) // FRAC_1_SQRT_2
    case "math::frac_2_pi"   => VFloat(2.0 / Math.PI)
    case "math::frac_2_sqrt_pi" => VFloat(2.0 / Math.sqrt(Math.PI))
    case "math::frac_pi_2"   => VFloat(Math.PI / 2)
    case "math::frac_pi_3"   => VFloat(1.04719755119659774615421446109316763) // FRAC_PI_3
    case "math::frac_pi_4"   => VFloat(Math.PI / 4)
    case "math::frac_pi_6"   => VFloat(0.52359877559829887307710723054658381) // FRAC_PI_6
    case "math::frac_pi_8"   => VFloat(0.39269908169872415480783042290993786) // FRAC_PI_8
    case "math::ln_10"       => VFloat(2.30258509299404568401799145468436421) // LN_10
    case "math::ln_2"        => VFloat(0.69314718055994530941723212145817656) // LN_2
    case "math::log10_2"     => VFloat(0.30102999566398119521373889472449302) // LOG10_2
    case "math::log10_e"     => VFloat(0.43429448190325182765112891891660508) // LOG10_E
    case "math::log2_10"     => VFloat(3.32192809488736234787031942948939018) // LOG2_10
    case "math::log2_e"      => VFloat(1.44269504088896340735992468100189214) // LOG2_E
    case "math::sqrt_2"      => VFloat(1.41421356237309504880168872420969808) // SQRT_2
    case "time::epoch"       => VDt(java.time.Instant.EPOCH)
    case "time::minimum"     => VDt(java.time.Instant.parse("-262143-01-01T00:00:00Z"))
    case "time::maximum"     => VDt(java.time.Instant.parse("+262142-12-31T23:59:59Z"))
    case "duration::max"     => VDur(-1L, 999999999) // u64::MAX secs
    case other => throw SqlError(s"Unknown constant $other")
  }

  private def binary(op: String, le: Expr, re: Expr, env: Env): V = op match {
    case m if m.startsWith("MATCHES") => Search.evalMatches(m, le, re, env)
    case "&&" =>
      val l = eval(le, env)
      if (!l.truthy) l else eval(re, env)
    case "||" =>
      val l = eval(le, env)
      if (l.truthy) l else eval(re, env)
    case "??" =>
      val l = eval(le, env)
      if (l == VNone || l == VNull) eval(re, env) else l
    case "?:" =>
      val l = eval(le, env)
      if (l.truthy) l else eval(re, env)
    case _ =>
      val l = eval(le, env)
      val r = eval(re, env)
      op match {
        case "+"  => Ops.add(l, r)
        case "-"  => Ops.sub(l, r)
        case "*"  => Ops.mul(l, r)
        case "/"  => Ops.div(l, r)
        case "%"  => Ops.rem(l, r)
        case "**" => Ops.pow(l, r)
        case "="  => Ops.looseEq(l, r)
        case "==" => Ops.exactEq(l, r)
        case "!=" => VBool(!V.looseEq(l, r))
        case "*=" => Ops.allEq(l, r)
        case "?=" => Ops.anyEq(l, r)
        case "<" | "<=" | ">" | ">=" => Ops.cmpBool(op, l, r)
        case "CONTAINS"     => VBool(Ops.contains(l, r))
        case "CONTAINSNOT"  => VBool(!Ops.contains(l, r))
        case "CONTAINSALL"  => VBool(Ops.containsAll(l, r))
        case "CONTAINSANY"  => VBool(Ops.containsAny(l, r))
        case "CONTAINSNONE" => VBool(Ops.containsNone(l, r))
        case "INSIDE"       => VBool(Ops.contains(r, l))
        case "NOTINSIDE"    => VBool(!Ops.contains(r, l))
        case "ALLINSIDE"    => VBool(Ops.allInside(l, r))
        case "ANYINSIDE"    => VBool(Ops.anyInside(l, r))
        case "NONEINSIDE"   => VBool(Ops.noneInside(l, r))
        case "OUTSIDE"      => VBool(!Ops.contains(r, l))
        case "INTERSECTS"   => VBool(Ops.containsAny(l, r))
        case other => throw SqlError(s"Unsupported operator $other")
      }
  }

  // ---- idiom evaluation ------------------------------------------------

  def evalIdiom(parts: Seq[Part], env: Env): V = {
    val (start, rest): (V, Seq[Part]) = parts.head match {
      case PStart(e)    => (eval(e, env), parts.tail)
      case PField(name) =>
        // leading bare ident resolves against the current document
        env.doc match {
          case Some(d) => (d.fields.getOrElse(name, VNone), parts.tail)
          case scala.None => (VNone, parts.tail)
        }
      case PDoc => (env.doc.getOrElse(VNone), parts.tail)
      case _: PGraph =>
        env.doc match {
          case Some(d) => (d.fields.getOrElse("id", VNone), parts)
          case scala.None => (VNone, parts)
        }
      case _ => (env.doc.getOrElse(VNone), parts)
    }
    walk(start, rest, env)
  }

  def walk(v: V, parts: Seq[Part], env: Env): V = walk(v, parts, env, postHop = false)

  /** `postHop` marks a value produced by a graph hop: consecutive hops (and
    * hops after an interposed filter) flatten, while a hop applied to a
    * plain array value distributes per element WITHOUT flattening
    * (idiom/graph_filter_flattened: `[person:1]->likes->person` nests). */
  private def walk(v: V, parts: Seq[Part], env: Env, postHop: Boolean): V = {
    if (parts.isEmpty) return v
    val part = parts.head
    val rest = parts.tail
    part match {
      case POptional =>
        // only NONE short-circuits; NULL passes through (optional_passthrough)
        if (v == VNone) VNone else walk(v, rest, env)
      case PField(name) => v match {
        case VObj(fs)  => walk(fs.getOrElse(name, VNone), rest, env)
        case VArr(its) => VArr(its.map(el => walk(el, parts, env)))
        case rid: VRid =>
          env.interp.flatMap(_.fetchRecord(rid)) match {
            case Some(doc) => walk(doc, parts, env)
            case scala.None => walk(VNone, rest, env)
          }
        case VGeom(kind, coords) =>
          name match {
            case "type"        => walk(VStr(kind), rest, env)
            case "coordinates" => walk(coords, rest, env)
            case _             => walk(VNone, rest, env)
          }
        case _ => walk(VNone, rest, env)
      }
      case PAll => v match {
        // `.*` distributes ONE level over arrays: each element takes the
        // REST of the path (re-applying `.*` only to unwrap record ids —
        // relate/ported_create_select; nested arrays must NOT re-distribute,
        // idiom/array_range `.*[0..1].min()`)
        case VArr(its) => VArr(its.map {
          case rid: VRid => walk(rid, parts, env)
          case el => walk(el, rest, env)
        })
        // `.*` on an object yields the object itself (record.* = full doc)
        case obj: VObj => walk(obj, rest, env)
        case rid: VRid =>
          env.interp.flatMap(_.fetchRecord(rid)) match {
            case Some(doc) => walk(doc, parts, env)
            case scala.None => walk(VNone, rest, env)
          }
        case other => walk(other, rest, env)
      }
      case PFlatten => v match {
        case VArr(its) =>
          val flat = its.flatMap {
            case VArr(inner) => inner
            case el          => Vector(el)
          }
          walk(VArr(flat), rest, env)
        case other => walk(other, rest, env)
      }
      case PLast => v match {
        case VArr(its) => walk(its.lastOption.getOrElse(VNone), rest, env)
        case _         => walk(VNone, rest, env)
      }
      case PIndex(ie) =>
        val idx = eval(ie, env)
        (v, idx) match {
          case (VArr(its), n: VNum) =>
            val i = n.toDouble.toInt
            walk(if (i >= 0 && i < its.length) its(i) else VNone, rest, env)
          case (VSet(its), n: VNum) =>
            val i = n.toDouble.toInt
            walk(if (i >= 0 && i < its.length) its(i) else VNone, rest, env)
          case (VRid(_, VArr(its)), n: VNum) =>
            // record ids with array keys index into the key (t:[1, o:1])
            val i = n.toDouble.toInt
            walk(if (i >= 0 && i < its.length) its(i) else VNone, rest, env)
          case (VObj(fs), VStr(k)) => walk(fs.getOrElse(k, VNone), rest, env)
          case (VArr(its), r: VRng) =>
            walk(sliceRange(its, r), rest, env)
          case _ => walk(VNone, rest, env)
        }
      case PWhere(cond) => v match {
        case VArr(its) =>
          // `$parent` inside an idiom filter is the nearest enclosing
          // document (exec/parts/filter.rs; parent_in_where golden)
          val parentV = env.doc.map(identity[V]).orElse(env.params.get("this"))
          val baseEnv = parentV.map(p => env.bind("parent", p)).getOrElse(env)
          val filtered = its.filter { el =>
            // record-id elements filter against their fetched document
            val target = el match {
              case rid: VRid => env.interp.flatMap(_.fetchRecord(rid)).map(identity[V]).getOrElse(rid)
              case x         => x
            }
            target match {
              case o: VObj => eval(cond, baseEnv.copy(doc = Some(o))).truthy
              case x => eval(cond, baseEnv.copy(doc = scala.None, params = baseEnv.params + ("this" -> x))).truthy
            }
          }
          // a filter between hops preserves hop-flattening semantics
          walk(VArr(filtered), rest, env, postHop)
        case _ => walk(VNone, rest, env)
      }
      case PMethod("__call__", args) =>
        val result = Functions.callClosure(v, args.map(eval(_, env)), env)
        walk(result, rest, env)
      case PMethod(name, args) =>
        val result = Functions.method(v, name, args, env)
        walk(result, rest, env)
      case PDestructure(fields) => v match {
        case obj: VObj =>
          val denv = env.copy(doc = Some(obj))
          val out = fields.map {
            case (n, scala.None) => n -> obj.fields.getOrElse(n, VNone)
            case (n, Some(sub))  => n -> walk(v, sub, denv)
          }
          walk(VObj(TreeMap(out: _*)), rest, env)
        case VArr(its) => VArr(its.map(el => walk(el, parts, env)))
        case rid: VRid =>
          env.interp.flatMap(_.fetchRecord(rid)) match {
            case Some(doc)  => walk(doc, parts, env)
            case scala.None => walk(VNone, rest, env)
          }
        case _ => walk(VNone, rest, env)
      }
      case g: PGraph =>
        env.interp match {
          case Some(in) => v match {
            case VArr(its) if !postHop =>
              // plain-array source: the hop (and the remaining chain)
              // evaluates per element, results collect unflattened
              VArr(its.map(el => walk(el, parts, env, postHop = false)))
            case _ => walk(in.graphHop(v, g, env), rest, env, postHop = true)
          }
          case scala.None => walk(VNone, rest, env)
        }
      case PDoc => walk(env.doc.getOrElse(v), rest, env)
      case PRepeatRecurse =>
        env.repeat match {
          case Some(handler) => walk(handler(v), rest, env)
          case scala.None => throw SqlError(
            "Tried to use a `@` repeat recurse symbol in a position where it is not supported")
        }
      case PRecurse(mn, mx, _, nest, instr) =>
        val minD = mn.getOrElse(1L)
        if (minD < 1)
          throw SqlError(s"Found $minD for bound but expected at least 1.")
        mx.foreach { m =>
          if (m > RecursionLimit)
            throw SqlError(s"Found $m for bound but expected $RecursionLimit at most.")
        }
        val userMax = mx.isDefined
        val maxD = mx.getOrElse(RecursionLimit)
        val body = nest.getOrElse(rest)
        val after = if (nest.isDefined) rest else Nil
        val result =
          if (containsRepeat(body)) {
            if (instr != RDefault)
              throw SqlError("Cannot construct a recursion plan when an instruction is provided")
            // the recursion body ends at the top-level `@`; trailing parts
            // (`.{2}.contains.@.name`) apply ONCE to the final frontier
            val splitAt = body.indexOf(PRepeatRecurse)
            val (bodyCore, afterRepeat) =
              if (splitAt >= 0) (body.take(splitAt + 1), body.drop(splitAt + 1))
              else (body, Seq.empty[Part])
            walk(recurseRepeat(v, bodyCore, minD, maxD, userMax, env),
              afterRepeat, env)
          } else instr match {
            case RDefault          => recurseDefault(v, body, minD, maxD, userMax, env)
            case RCollect(incl)    => recurseCollect(v, body, minD, maxD, incl, env)
            case RPath(incl)       => recursePath(v, body, minD, maxD, incl, env)
            case RShortest(te, incl) =>
              recurseShortest(v, eval(te, env), body, minD, maxD, incl, env)
          }
        walk(result, after, env)
      case PStart(e) => walk(eval(e, env), rest, env)
    }
  }

  // ---- recursion strategies (exec/operators/recursion/) ----------------

  private val RecursionLimit = 256L

  private def checkInterrupt(): Unit =
    if (Thread.currentThread().isInterrupted)
      throw SqlError("query interrupted")

  private case object EliminatedSignal extends Exception

  /** expr/idiom/recursion.rs:42 — None/Null/empty-or-all-null arrays end a branch. */
  private def isFinalV(v: V): Boolean = v match {
    case VNone | VNull => true
    case VArr(its)     => its.isEmpty || its.forall(x => x == VNone || x == VNull)
    case _             => false
  }

  private def getFinalV(v: V): V = v match {
    case VArr(_) => VArr(Vector.empty)
    case VNull   => VNull
    case _       => VNone
  }

  /** Drop dead ends from an array result and flatten one nesting level
    * (expr/idiom/recursion.rs:59). */
  private def cleanIteration(v: V): V = v match {
    case VArr(its) =>
      val kept = its.filterNot(isFinalV)
      VArr(kept.flatMap { case VArr(inner) => inner; case x => Vector(x) })
    case other => other
  }

  /** Recursion targets must be record ids (recursion/common.rs:23). */
  private def isRecursionTarget(v: V): Boolean = v match {
    case _: VRid   => true
    case VArr(its) => its.exists(isRecursionTarget)
    case _         => false
  }

  private def badTarget(v: V): Nothing = throw SqlError(
    s"Expected a record ID during recursive graph traversal, but found `${v.render}`")

  private def containsRepeat(parts: Seq[Part]): Boolean = parts.exists {
    case PRepeatRecurse   => true
    case PDestructure(fs) => fs.exists(_._2.exists(containsRepeat))
    case _                => false
  }

  /** Default strategy: follow path, return the value at the final depth
    * (recursion/default.rs). */
  private def recurseDefault(start: V, body: Seq[Part], minD: Long, maxD: Long,
      userMax: Boolean, env: Env): V = {
    var current = start
    var depth = 0L
    while (depth < maxD) {
      checkInterrupt()
      val next = cleanIteration(walk(current, body, env))
      depth += 1
      if (isFinalV(next) || next == current) {
        return if (depth > minD) current else getFinalV(next)
      }
      if (!isRecursionTarget(next)) badTarget(next)
      current = next
    }
    if (!userMax && depth >= RecursionLimit)
      throw SqlError(s"Exceeded the idiom recursion limit of $RecursionLimit.")
    if (depth >= minD) current else VNone
  }

  /** Collect strategy: BFS gathering unique nodes (recursion/collect.rs). */
  private def recurseCollect(start: V, body: Seq[Part], minD: Long, maxD: Long,
      inclusive: Boolean, env: Env): V = {
    val collected = scala.collection.mutable.ArrayBuffer[V]()
    val seen = scala.collection.mutable.HashSet[V]()
    var frontier = Vector(start)
    if (inclusive) { collected += start; seen += start }
    var depth = 0L
    while (depth < maxD && frontier.nonEmpty) {
      checkInterrupt()
      val next = scala.collection.mutable.ArrayBuffer[V]()
      frontier.foreach { value =>
        val vals = walk(value, body, env) match {
          case VArr(its)     => its
          case VNone | VNull => Vector.empty[V]
          case other         => Vector(other)
        }
        vals.foreach { x =>
          if (!isFinalV(x)) {
            if (!isRecursionTarget(x)) badTarget(x)
            if (seen.add(x)) {
              if (depth + 1 >= minD) collected += x
              next += x
            }
          }
        }
      }
      frontier = next.toVector
      depth += 1
    }
    VArr(collected.toVector)
  }

  /** Path strategy: all root-to-leaf paths as arrays (recursion/path.rs). */
  private def recursePath(start: V, body: Seq[Part], minD: Long, maxD: Long,
      inclusive: Boolean, env: Env): V = {
    val completed = scala.collection.mutable.ArrayBuffer[V]()
    var active: Vector[Vector[V]] = Vector(if (inclusive) Vector(start) else Vector.empty)
    var depth = 0L
    while (depth < maxD && active.nonEmpty) {
      checkInterrupt()
      val next = scala.collection.mutable.ArrayBuffer[Vector[V]]()
      active.foreach { cur =>
        val tip = cur.lastOption.getOrElse(start)
        walk(tip, body, env) match {
          case VNone | VNull =>
            if (depth >= minD && cur.nonEmpty) completed += VArr(cur)
          case res =>
            val vals = res match { case VArr(its) => its; case other => Vector(other) }
            val targets = vals.filterNot(isFinalV)
            targets.foreach(x => if (!isRecursionTarget(x)) badTarget(x))
            if (targets.isEmpty) {
              if (depth >= minD && cur.nonEmpty) completed += VArr(cur)
            } else targets.foreach(t => next += (cur :+ t))
        }
      }
      active = next.toVector
      depth += 1
    }
    active.foreach(p => if (p.nonEmpty && depth >= minD) completed += VArr(p))
    VArr(completed.toVector)
  }

  /** Shortest strategy: BFS shortest path to a target (recursion/shortest.rs). */
  private def recurseShortest(start: V, target: V, body: Seq[Part], minD: Long,
      maxD: Long, inclusive: Boolean, env: Env): V = {
    val seen = scala.collection.mutable.HashSet[V](start)
    var queue: Vector[(V, Vector[V])] =
      Vector((start, if (inclusive) Vector(start) else Vector.empty))
    var depth = 0L
    while (depth < maxD && queue.nonEmpty) {
      val nextQ = scala.collection.mutable.ArrayBuffer[(V, Vector[V])]()
      for ((current, curPath) <- queue) {
        val vals = walk(current, body, env) match {
          case VArr(its)     => its
          case VNone | VNull => Vector.empty[V]
          case other         => Vector(other)
        }
        for (x <- vals) {
          if (!isFinalV(x)) {
            if (!isRecursionTarget(x)) badTarget(x)
            if (depth + 1 >= minD && x == target) return VArr(curPath :+ x)
            if (seen.add(x)) nextQ += ((x, curPath :+ x))
          }
        }
      }
      queue = nextQ.toVector
      depth += 1
    }
    val remaining = queue.collect { case (_, p) if p.nonEmpty => VArr(p) }
    if (remaining.isEmpty) VNone else VArr(remaining)
  }

  /** RepeatRecurse (`.@`) strategy: build nested trees by re-applying the
    * body at each `@` marker (recursion/repeat.rs — implemented with direct
    * recursion; depth is bounded by maxD ≤ 256 so the stack is safe). */
  private def recurseRepeat(start: V, body: Seq[Part], minD: Long, maxD: Long,
      userMax: Boolean, env: Env): V = {
    def go(value: V, depth: Long): V = {
      checkInterrupt()
      val handler: V => V = { input =>
        val vals = input match {
          case VArr(its)     => its
          case VNone | VNull => Vector.empty[V]
          case o             => Vector(o)
        }
        val clean = vals.filterNot(isFinalV)
        clean.foreach(t => if (!isRecursionTarget(t)) badTarget(t))
        if (clean.isEmpty) {
          if (depth + 1 < minD) throw EliminatedSignal
          getFinalV(input)
        } else if (depth + 1 >= maxD) {
          if (!userMax && depth + 1 >= RecursionLimit)
            throw SqlError(s"Exceeded the idiom recursion limit of $RecursionLimit.")
          VArr(clean)
        } else {
          // each iteration flattens one level (recursion.rs clean_iteration)
          // — `{2}.contains.@` yields a FLAT frontier, not per-parent arrays
          val expanded = clean.flatMap { t =>
            try go(t, depth + 1) match {
              case VArr(inner) => inner
              case x => Vector(x)
            }
            catch { case EliminatedSignal => Vector.empty[V] }
          }
          if (expanded.isEmpty && depth + 1 < minD) throw EliminatedSignal
          VArr(expanded)
        }
      }
      walk(value, body, env.copy(repeat = Some(handler)))
    }
    try go(start, 0)
    catch { case EliminatedSignal => VNone }
  }

  private def sliceRange(its: Vector[V], r: VRng): VArr = {
    val lo = r.lo match {
      case Some((n: VNum, incl)) => val i = n.toDouble.toInt; if (incl) i else i + 1
      case _ => 0
    }
    val hi = r.hi match {
      case Some((n: VNum, incl)) => val i = n.toDouble.toInt; if (incl) i + 1 else i
      case _ => its.length
    }
    VArr(its.slice(Math.max(lo, 0), Math.min(hi, its.length)))
  }

  /** Render an expression as its canonical output-field name (the reference
    * names unaliased SELECT expressions by their source text). */
  def fieldName(e: Expr): String = e match {
    case Idiom(parts) => parts.collect {
      case PField(n)  => n
      case PAll       => "*"
      case PMethod(n, _) => n
      case g: PGraph =>
        val arrow = g.dir match { case "out" => "->"; case "in" => "<-"; case "ref" => "<~"; case _ => "<->" }
        // the reference names unaliased lookups by their to_sql render,
        // which normalizes double-quoted strings to single quotes
        g.alias.getOrElse(arrow + g.raw.map(_.replace('"', '\''))
          .getOrElse(g.what.map(_.table).mkString(", ")))
    }.mkString(".").replace(".->", "->").replace(".<-", "<-")
    case Lit(VStr(s))  => s
    case Lit(v)        => v.render
    case Param(n)      => n
    case FnCall(n, _)  => n
    case Constant(n)   => n
    // expr/expression.rs:339 to_idiom: any other expression names its output
    // field by its canonical sql text
    case other =>
      try Explain.exprSql(other) catch { case _: MatchError => "value" }
  }
}
