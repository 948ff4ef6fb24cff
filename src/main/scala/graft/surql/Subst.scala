package graft.surql

import graft.surql.ast._

/** Substitute `LET`-bound params into an AST as literals — the script
  * executor's binding step (the reference resolves params from the session
  * context at execution, exec/planner/source.rs param handling; on the
  * Spark path a bound param is a plan-time constant, so inlining keeps the
  * lowered plan fully static for Catalyst). Closure parameters shadow;
  * `$parent`/`$after`/`$before`/`$event`/`$this` are never in the binding
  * map and pass through untouched.
  *
  * The `*E` variants substitute a param with an arbitrary EXPRESSION rather
  * than a constant — DEFINE FIELD clauses bind `$value`/`$input` to the
  * field's own column reference, which must stay a column, not a literal. */
object Subst {

  def expr(e: Expr, p: Map[String, V]): Expr = exprE(e, lits(p))
  def stmt(s: Statement, p: Map[String, V]): Statement = stmtE(s, lits(p))

  private def lits(p: Map[String, V]): Map[String, Expr] =
    p.map { case (k, v) => k -> (Lit(v): Expr) }

  def exprE(e: Expr, p: Map[String, Expr]): Expr = e match {
    case Param(n) if p.contains(n) => p(n)
    case _: Param | _: Lit | _: TableRef | _: Constant | _: JsExpr => e
    case ArrLit(items)   => ArrLit(items.map(exprE(_, p)))
    case ObjLit(fields)  => ObjLit(fields.map { case (k, v) => (k, exprE(v, p)) })
    case RidLit(t, k)    => RidLit(t, exprE(k, p))
    case RangeLit(lo, hi) =>
      RangeLit(lo.map { case (x, i) => (exprE(x, p), i) },
        hi.map { case (x, i) => (exprE(x, p), i) })
    case Idiom(parts)    => Idiom(parts.map(part(_, p)))
    case Binary(op, l, r) => Binary(op, exprE(l, p), exprE(r, p))
    case Prefix(op, x)   => Prefix(op, exprE(x, p))
    case Cast(k, x)      => Cast(k, exprE(x, p))
    case FnCall(n, args) => FnCall(n, args.map(exprE(_, p)))
    case c @ Closure(ps, body, _) =>
      // closure params shadow outer LET bindings
      c.copy(body = exprE(body, p -- ps.map(_._1)))
    case Subquery(s)     => Subquery(stmtE(s, p))
    case BlockExpr(ss)   => BlockExpr(ss.map(stmtE(_, p)))
    case IfExpr(bs, o)   =>
      IfExpr(bs.map { case (c, v) => (exprE(c, p), exprE(v, p)) },
        o.map(exprE(_, p)))
    case other => other
  }

  private def part(pt: Part, p: Map[String, Expr]): Part = pt match {
    case PStart(e) => PStart(exprE(e, p))
    case PIndex(e) => PIndex(exprE(e, p))
    case PWhere(e) => PWhere(exprE(e, p))
    case g: PGraph => g.copy(cond = g.cond.map(exprE(_, p)))
    case other => other
  }

  private def data(d: Data, p: Map[String, Expr]): Data = d match {
    case SetData(sets) => SetData(sets.map { case (i, op, e) =>
      (exprE(i, p).asInstanceOf[Idiom], op, exprE(e, p)) })
    case ContentData(e) => ContentData(exprE(e, p))
    case MergeData(e)   => MergeData(exprE(e, p))
    case ReplaceData(e) => ReplaceData(exprE(e, p))
    case PatchData(e)   => PatchData(exprE(e, p))
    case other => other
  }

  def stmtE(s: Statement, p: Map[String, Expr]): Statement = s match {
    case sel: SelectStmt => sel.copy(
      fields = sel.fields.map(f => f.copy(expr = exprE(f.expr, p))),
      what = sel.what.map(exprE(_, p)),
      where = sel.where.map(exprE(_, p)),
      groupBy = sel.groupBy.map(_.map(exprE(_, p))),
      order = sel.order.map(o => o.copy(expr = exprE(o.expr, p))),
      limit = sel.limit.map(exprE(_, p)),
      start = sel.start.map(exprE(_, p)))
    case u: UpdateStmt => u.copy(what = u.what.map(exprE(_, p)),
      data = u.data.map(data(_, p)), where = u.where.map(exprE(_, p)))
    case u: UpsertStmt => u.copy(what = u.what.map(exprE(_, p)),
      data = u.data.map(data(_, p)), where = u.where.map(exprE(_, p)))
    case d: DeleteStmt => d.copy(what = d.what.map(exprE(_, p)),
      where = d.where.map(exprE(_, p)))
    case c: CreateStmt => c.copy(what = c.what.map(exprE(_, p)),
      data = c.data.map(data(_, p)))
    case i: InsertStmt => i.copy(into = i.into.map(exprE(_, p)),
      values = exprE(i.values, p),
      onDuplicate = i.onDuplicate.map(_.map { case (id, op, e) =>
        (exprE(id, p).asInstanceOf[Idiom], op, exprE(e, p)) }))
    case r: ReturnStmt => ReturnStmt(exprE(r.e, p))
    case l: LetStmt    => l.copy(what = exprE(l.what, p))
    case i: IfStmt => IfStmt(
      i.branches.map { case (c, v) => (exprE(c, p), exprE(v, p)) },
      i.otherwise.map(exprE(_, p)))
    case f: ForStmt => f.copy(iterable = exprE(f.iterable, p),
      // the loop param shadows an outer binding of the same name
      block = BlockExpr(f.block.stmts.map(stmtE(_, p - f.param))))
    case other => other
  }
}
