package graft.surql

import graft.surql.ast._

/** Substitute `LET`-bound params into an AST as literals — the script
  * executor's binding step (the reference resolves params from the session
  * context at execution, exec/planner/source.rs param handling; on the
  * Spark path a bound param is a plan-time constant, so inlining keeps the
  * lowered plan fully static for Catalyst). Closure parameters shadow;
  * `$parent`/`$after`/`$before`/`$event`/`$this` are never in the binding
  * map and pass through untouched. */
object Subst {

  def expr(e: Expr, p: Map[String, V]): Expr = e match {
    case Param(n) if p.contains(n) => Lit(p(n))
    case _: Param | _: Lit | _: TableRef | _: Constant | _: JsExpr => e
    case ArrLit(items)   => ArrLit(items.map(expr(_, p)))
    case ObjLit(fields)  => ObjLit(fields.map { case (k, v) => (k, expr(v, p)) })
    case RidLit(t, k)    => RidLit(t, expr(k, p))
    case RangeLit(lo, hi) =>
      RangeLit(lo.map { case (x, i) => (expr(x, p), i) },
        hi.map { case (x, i) => (expr(x, p), i) })
    case Idiom(parts)    => Idiom(parts.map(part(_, p)))
    case Binary(op, l, r) => Binary(op, expr(l, p), expr(r, p))
    case Prefix(op, x)   => Prefix(op, expr(x, p))
    case Cast(k, x)      => Cast(k, expr(x, p))
    case FnCall(n, args) => FnCall(n, args.map(expr(_, p)))
    case c @ Closure(ps, body, _) =>
      // closure params shadow outer LET bindings
      c.copy(body = expr(body, p -- ps.map(_._1)))
    case Subquery(s)     => Subquery(stmt(s, p))
    case BlockExpr(ss)   => BlockExpr(ss.map(stmt(_, p)))
    case IfExpr(bs, o)   =>
      IfExpr(bs.map { case (c, v) => (expr(c, p), expr(v, p)) },
        o.map(expr(_, p)))
    case other => other
  }

  private def part(pt: Part, p: Map[String, V]): Part = pt match {
    case PStart(e) => PStart(expr(e, p))
    case PIndex(e) => PIndex(expr(e, p))
    case PWhere(e) => PWhere(expr(e, p))
    case g: PGraph => g.copy(cond = g.cond.map(expr(_, p)))
    case other => other
  }

  private def data(d: Data, p: Map[String, V]): Data = d match {
    case SetData(sets) => SetData(sets.map { case (i, op, e) =>
      (expr(i, p).asInstanceOf[Idiom], op, expr(e, p)) })
    case ContentData(e) => ContentData(expr(e, p))
    case MergeData(e)   => MergeData(expr(e, p))
    case ReplaceData(e) => ReplaceData(expr(e, p))
    case PatchData(e)   => PatchData(expr(e, p))
    case other => other
  }

  def stmt(s: Statement, p: Map[String, V]): Statement = s match {
    case sel: SelectStmt => sel.copy(
      fields = sel.fields.map(f => f.copy(expr = expr(f.expr, p))),
      what = sel.what.map(expr(_, p)),
      where = sel.where.map(expr(_, p)),
      groupBy = sel.groupBy.map(_.map(expr(_, p))),
      order = sel.order.map(o => o.copy(expr = expr(o.expr, p))),
      limit = sel.limit.map(expr(_, p)),
      start = sel.start.map(expr(_, p)))
    case u: UpdateStmt => u.copy(what = u.what.map(expr(_, p)),
      data = u.data.map(data(_, p)), where = u.where.map(expr(_, p)))
    case u: UpsertStmt => u.copy(what = u.what.map(expr(_, p)),
      data = u.data.map(data(_, p)), where = u.where.map(expr(_, p)))
    case d: DeleteStmt => d.copy(what = d.what.map(expr(_, p)),
      where = d.where.map(expr(_, p)))
    case c: CreateStmt => c.copy(what = c.what.map(expr(_, p)),
      data = c.data.map(data(_, p)))
    case i: InsertStmt => i.copy(into = i.into.map(expr(_, p)),
      values = expr(i.values, p),
      onDuplicate = i.onDuplicate.map(_.map { case (id, op, e) =>
        (expr(id, p).asInstanceOf[Idiom], op, expr(e, p)) }))
    case r: ReturnStmt => ReturnStmt(expr(r.e, p))
    case l: LetStmt    => l.copy(what = expr(l.what, p))
    case i: IfStmt => IfStmt(
      i.branches.map { case (c, v) => (expr(c, p), expr(v, p)) },
      i.otherwise.map(expr(_, p)))
    case f: ForStmt => f.copy(iterable = expr(f.iterable, p),
      // the loop param shadows an outer binding of the same name
      block = BlockExpr(f.block.stmts.map(stmt(_, p - f.param))))
    case other => other
  }
}
