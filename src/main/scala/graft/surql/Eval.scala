package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap

/** Control-flow signals (reference FlowResult: Break/Continue/Return/Throw). */
final case class ReturnSignal(v: V) extends Exception
case object BreakSignal extends Exception
case object ContinueSignal extends Exception

/** Evaluation environment: parameter bindings + the current document. */
final case class Env(
    params: Map[String, V] = Map.empty,
    doc: Option[VObj] = scala.None,
    interp: Option[Interp] = scala.None) {
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
    case Lit(v)        => v
    case ArrLit(items) => VArr(items.map(eval(_, env)).toVector)
    case ObjLit(fs)    => VObj(TreeMap(fs.map { case (k, fe) => k -> eval(fe, env) }: _*))
    case RidLit(tb, keyE) =>
      eval(keyE, env) match {
        case r: VRng => VRid(tb, r)
        case k       => VRid(tb, k)
      }
    case RangeLit(lo, hi) =>
      VRng(lo.map { case (be, i) => (eval(be, env), i) }, hi.map { case (be, i) => (eval(be, env), i) })
    case Param(name) =>
      env.params.get(name).orElse(builtinParam(name, env)).getOrElse(VNone)
    case Constant(name) => constant(name)
    case TableRef(name) => VTable(name)
    case Closure(params, body) => VClosure(params, body, env.params)
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
      branches.find { case (c, _) => eval(c, env).truthy } match {
        case Some((_, body)) => eval(body, env)
        case scala.None      => otherwise.map(eval(_, env)).getOrElse(VNone)
      }
    case BlockExpr(stmts) =>
      env.interp match {
        case Some(in) => in.runBlock(stmts, env)
        case scala.None =>
          val in = new Interp()
          in.runBlock(stmts, env.copy(interp = Some(in)))
      }
    case Subquery(stmt) =>
      // inside a subquery the outer document becomes $parent
      // (exec/physical_expr/subquery.rs; language/param/select_parent)
      val subEnv = env.doc match {
        case Some(d) => env.copy(params = env.params + ("parent" -> d))
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
    case "this"   => env.doc
    case "parent" => env.params.get("parent")
    case _        => scala.None
  }

  def constant(name: String): V = name.toLowerCase match {
    case "math::pi"          => VFloat(Math.PI)
    case "math::e"           => VFloat(Math.E)
    case "math::tau"         => VFloat(Math.PI * 2)
    case "math::inf"         => VFloat(Double.PositiveInfinity)
    case "math::neg_inf"     => VFloat(Double.NegativeInfinity)
    case "math::frac_1_pi"   => VFloat(1.0 / Math.PI)
    case "math::frac_1_sqrt_2" => VFloat(1.0 / Math.sqrt(2.0))
    case "math::frac_2_pi"   => VFloat(2.0 / Math.PI)
    case "math::frac_2_sqrt_pi" => VFloat(2.0 / Math.sqrt(Math.PI))
    case "math::frac_pi_2"   => VFloat(Math.PI / 2)
    case "math::frac_pi_3"   => VFloat(Math.PI / 3)
    case "math::frac_pi_4"   => VFloat(Math.PI / 4)
    case "math::frac_pi_6"   => VFloat(Math.PI / 6)
    case "math::frac_pi_8"   => VFloat(Math.PI / 8)
    case "math::ln_10"       => VFloat(Math.log(10.0))
    case "math::ln_2"        => VFloat(Math.log(2.0))
    case "math::log10_2"     => VFloat(Math.log10(2.0))
    case "math::log10_e"     => VFloat(Math.log10(Math.E))
    case "math::log2_10"     => VFloat(Math.log(10.0) / Math.log(2.0))
    case "math::log2_e"      => VFloat(1.0 / Math.log(2.0))
    case "math::sqrt_2"      => VFloat(Math.sqrt(2.0))
    case "time::epoch"       => VDt(java.time.Instant.EPOCH)
    case "time::minimum"     => VDt(java.time.Instant.parse("-262143-01-01T00:00:00Z"))
    case "time::maximum"     => VDt(java.time.Instant.parse("+262142-12-31T23:59:59Z"))
    case "duration::max"     => VDur(Long.MaxValue, 999999999)
    case other => throw SqlError(s"Unknown constant $other")
  }

  private def binary(op: String, le: Expr, re: Expr, env: Env): V = op match {
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
        case "MATCHES"      => l match {
          case VStr(s) => r match {
            case VStr(q) =>
              val terms = q.toLowerCase.split("\\s+").filter(_.nonEmpty)
              val toks = s.toLowerCase.split("\\s+").toSet
              VBool(terms.forall(toks.contains))
            case _ => VBool(false)
          }
          case _ => VBool(false)
        }
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
      case PGraph(_, _, _) =>
        env.doc match {
          case Some(d) => (d.fields.getOrElse("id", VNone), parts)
          case scala.None => (VNone, parts)
        }
      case _ => (env.doc.getOrElse(VNone), parts)
    }
    walk(start, rest, env)
  }

  def walk(v: V, parts: Seq[Part], env: Env): V = {
    if (parts.isEmpty) return v
    val part = parts.head
    val rest = parts.tail
    part match {
      case POptional =>
        if (v == VNone || v == VNull) VNone else walk(v, rest, env)
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
        case VArr(its) => VArr(its.map(el => walk(el, rest, env)))
        case VObj(fs)  => walk(VArr(fs.values.toVector), rest, env)
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
          case (VObj(fs), VStr(k)) => walk(fs.getOrElse(k, VNone), rest, env)
          case (VArr(its), r: VRng) =>
            walk(sliceRange(its, r), rest, env)
          case _ => walk(VNone, rest, env)
        }
      case PWhere(cond) => v match {
        case VArr(its) =>
          val filtered = its.filter {
            case o: VObj => eval(cond, env.copy(doc = Some(o))).truthy
            case el      => eval(cond, env.copy(doc = scala.None, params = env.params + ("this" -> el))).truthy
          }
          walk(VArr(filtered), rest, env)
        case _ => walk(VNone, rest, env)
      }
      case PMethod("__call__", args) =>
        val result = Functions.callClosure(v, args.map(eval(_, env)), env)
        walk(result, rest, env)
      case PMethod(name, args) =>
        val result = Functions.method(v, name, args, env)
        walk(result, rest, env)
      case PDestructure(fields) => v match {
        case VObj(fs) =>
          val out = fields.map {
            case (n, scala.None)      => n -> fs.getOrElse(n, VNone)
            case (n, Some(sub)) => n -> walk(v, sub, env)
          }
          walk(VObj(TreeMap(out: _*)), rest, env)
        case VArr(its) => VArr(its.map(el => walk(el, parts, env)))
        case _ => walk(VNone, rest, env)
      }
      case PGraph(dir, what, cond) =>
        env.interp match {
          case Some(in) => walk(in.graphHop(v, dir, what, cond, env), rest, env)
          case scala.None => walk(VNone, rest, env)
        }
      case PRecurse(mn, mx, _) =>
        // bounded recursion over the remaining path applied repeatedly
        val minD = mn.getOrElse(1L)
        val maxD = mx.orElse(mn).getOrElse(1L)
        var frontier: V = v
        var depth = 0L
        while (depth < maxD && frontier != VNone) {
          val next = walk(frontier, rest, env)
          val isEmpty = next match {
            case VNone | VNull => true
            case VArr(its) if its.isEmpty => true
            case _ => false
          }
          if (isEmpty) {
            return if (depth >= minD) frontier else VNone
          }
          frontier = next
          depth += 1
        }
        frontier
      case PStart(e) => walk(eval(e, env), rest, env)
    }
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
      case PGraph(dir, what, _) =>
        val arrow = dir match { case "out" => "->"; case "in" => "<-"; case _ => "<->" }
        arrow + what.mkString(", ")
    }.mkString(".").replace(".->", "->").replace(".<-", "<-")
    case Lit(v)        => v.render
    case Param(n)      => n
    case FnCall(n, _)  => n
    case Constant(n)   => n
    case Binary(_, _, _) | Prefix(_, _) | Cast(_, _) => "expr"
    case _ => "value"
  }
}
