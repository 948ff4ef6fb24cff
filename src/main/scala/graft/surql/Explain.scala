package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap

/** EXPLAIN plan rendering — mirrors the reference's operator-tree formatter
  * (exec/operators/explain.rs:213-264: 4-space child indent, embedded
  * operator expressions at prefix+2 with `role.embed:` labels) and its
  * planner's pipeline-assembly decisions (exec/planner/select.rs:195):
  * which operator appears for which clause, predicate/limit pushdown into
  * the scan, Sort vs SortByKey vs SortTopK[ByKey], Compute pre-pass,
  * SelectProject vs Project vs ProjectValue classification, CountScan
  * fast path, IndexScan access-path selection. */
object Explain {

  final case class PNode(name: String, ctx: String,
      attrs: Seq[(String, String)] = Nil,
      children: Seq[PNode] = Nil,
      embedded: Seq[(String, PNode)] = Nil,
      rows: Option[Long] = scala.None,
      exprs: Seq[(String, String)] = Nil)  // (role, sql) — JSON `expressions`

  private val Indent = 4

  def renderText(root: PNode, total: Option[Long]): String = {
    val sb = new StringBuilder
    format(root, sb, "")
    total.foreach(t => sb.append(s"\nTotal rows: $t"))
    sb.toString
  }

  private def format(n: PNode, sb: StringBuilder, prefix: String): Unit = {
    sb.append(n.name).append(" [ctx: ").append(n.ctx).append("]")
    if (n.attrs.nonEmpty)
      sb.append(n.attrs.map { case (k, v) => s"$k: $v" }.mkString(" [", ", ", "]"))
    n.rows.foreach(r => sb.append(s" {rows: $r}"))
    sb.append('\n')
    n.embedded.foreach { case (role, sub) =>
      sb.append(prefix).append("  ").append(role).append(": ")
      format(sub, sb, prefix + "  ")
    }
    if (n.children.nonEmpty) {
      val childPrefix = prefix + (" " * Indent)
      n.children.foreach { c =>
        sb.append(childPrefix)
        format(c, sb, childPrefix)
      }
    }
  }

  def renderJson(n: PNode, total: Option[Long]): V = {
    var m = TreeMap[String, V](
      "operator" -> VStr(n.name),
      "context" -> VStr(n.ctx))
    if (n.attrs.nonEmpty)
      m += "attributes" -> VObj(TreeMap(n.attrs.map { case (k, v) => k -> (VStr(v): V) }: _*))
    if (n.children.nonEmpty)
      m += "children" -> VArr(n.children.map(c => renderJson(c, scala.None)).toVector)
    if (n.exprs.nonEmpty)
      m += "expressions" -> VArr(n.exprs.map { case (role, sql) =>
        V.obj("role" -> VStr(role), "sql" -> VStr(sql)) }.toVector)
    n.rows.foreach(r => m += "metrics" -> V.obj("output_rows" -> VInt(r)))
    total.foreach(t => m += "total_rows" -> VInt(t))
    VObj(m)
  }

  // ---- expression rendering (sql to_sql canonical text) -----------------

  def kindSql(k: Kind): String = k match {
    case Kind.KAny => "any"
    case Kind.KNone => "none"
    case Kind.KNull => "null"
    case Kind.KBool => "bool"
    case Kind.KInt => "int"
    case Kind.KFloat => "float"
    case Kind.KDecimal => "decimal"
    case Kind.KNumber => "number"
    case Kind.KString => "string"
    case Kind.KDuration => "duration"
    case Kind.KDatetime => "datetime"
    case Kind.KUuid => "uuid"
    case Kind.KBytes => "bytes"
    case Kind.KObject => "object"
    case Kind.KRegex => "regex"
    case Kind.KRange => "range"
    case Kind.KFunction => "function"
    case Kind.KFile => "file"
    case Kind.KArray(inner, max) =>
      "array" + inner.map(i => "<" + kindSql(i) + max.map(m => s", $m").getOrElse("") + ">").getOrElse("")
    case Kind.KSet(inner, max) =>
      "set" + inner.map(i => "<" + kindSql(i) + max.map(m => s", $m").getOrElse("") + ">").getOrElse("")
    case Kind.KRecord(ts) => if (ts.isEmpty) "record" else "record<" + ts.mkString(" | ") + ">"
    case Kind.KGeometry(ks) => if (ks.isEmpty) "geometry" else "geometry<" + ks.mkString(" | ") + ">"
    case Kind.KEither(ks) => ks.map(kindSql).mkString(" | ")
    case Kind.KOption(i) => "option<" + kindSql(i) + ">"
    case Kind.KLiteral(v) => Render.sql(v)
    case Kind.KTable(ns) => ns.mkString(" | ")
    case Kind.KLiteralArr(items) => "[" + items.map(kindSql).mkString(", ") + "]"
    case Kind.KLiteralObj(fs) => "{ " + fs.map { case (n, kk) => s"$n: ${kindSql(kk)}" }.mkString(", ") + " }"
  }

  private def opSql(op: String): String = op match {
    case "&&" => "AND"
    case "||" => "OR"
    case "MATCHES" => "@@"
    case m if m.startsWith("MATCHES:") =>
      val ref = m.split(':').lift(1).getOrElse("")
      if (ref.nonEmpty) s"@$ref@" else "@@"
    case other => other
  }

  def exprSql(e: Expr): String = e match {
    case Lit(v) => Render.sql(v)
    case ArrLit(items) => "[" + items.map(exprSql).mkString(", ") + "]"
    case ObjLit(fs) =>
      if (fs.isEmpty) "{  }"
      else "{ " + fs.map { case (n, v) => s"$n: ${exprSql(v)}" }.mkString(", ") + " }"
    case RidLit(tb, key) => key match {
      case RangeLit(lo, hi) =>
        tb + ":" + lo.map(b => exprSql(b._1)).getOrElse("") + ".." +
          hi.map(b => (if (b._2) "=" else "") + exprSql(b._1)).getOrElse("")
      case Lit(v) => Render.sql(VRid(tb, v))
      case other  => s"$tb:${exprSql(other)}"
    }
    case RangeLit(lo, hi) =>
      lo.map(b => exprSql(b._1)).getOrElse("") + " .. " +
        hi.map(b => (if (b._2) "=" else "") + exprSql(b._1)).getOrElse("")
    case Param(n) => "$" + n
    case Constant(n) => n
    case TableRef(n) => n
    case Binary(op, l, r) => s"${exprSql(l)} ${opSql(op)} ${exprSql(r)}"
    case Prefix(op, inner) => op match {
      case "!" => "!" + exprSql(inner)
      case o   => o + exprSql(inner)
    }
    case Cast(k, inner) => inner match {
      case _: RangeLit => s"<${kindSql(k)}>  ${exprSql(inner)}"
      case _           => s"<${kindSql(k)}>${exprSql(inner)}"
    }
    case FnCall(name, args) => s"$name(${args.map(exprSql).mkString(", ")})"
    case Closure(params, body, ret) =>
      val ps = params.map { case (n, k) => s"$$$n: ${k.map(kindSql).getOrElse("any")}" }.mkString(", ")
      val retTxt = ret.map(k => s" -> ${kindSql(k)}").getOrElse("")
      val bodyTxt = body match {
        case b: BlockExpr if b.stmts.isEmpty => "{  }"
        case BlockExpr(Seq(ExprStmt(inner))) => s"{ ${exprSql(inner)} }"
        case b: BlockExpr => s"{ … }"
        case other => s"{ ${exprSql(other)} }"
      }
      s"|$ps|$retTxt $bodyTxt"
    case Idiom(parts) => idiomSql(parts)
    case IfExpr(_, _) => "IF …"
    case Subquery(_: SelectStmt) => "(SELECT …)"
    case Subquery(ThrowStmt(inner)) => s"THROW ${exprSql(inner)}"
    case Subquery(BreakStmt) => "BREAK"
    case Subquery(ContinueStmt) => "CONTINUE"
    case Subquery(ReturnStmt(inner)) => s"RETURN ${exprSql(inner)}"
    case Subquery(_) => "(…)"
    case BlockExpr(Seq(ExprStmt(inner))) => s"{ ${exprSql(inner)} }"
    case BlockExpr(_) => "{ … }"
  }

  /** Physical-expression rendering for new-executor plan attributes: like
    * [[exprSql]] but function calls elide their compiled argument
    * sub-expressions (`count(...)`) — except inside idioms, which compile
    * and render as one unit (`record::id(id).val`). */
  def physSql(e: Expr): String = e match {
    case FnCall(name, _) => s"$name(...)"
    case Binary(op, l, r) => s"${physSql(l)} ${opSql(op)} ${physSql(r)}"
    case Prefix(op, inner) => op match {
      // the physical-expr formatter puts a space after unary not
      // (`! boolean` — expression_value/noindex_unary new-executor renders)
      case "!" => "! " + physSql(inner)
      case o   => o + physSql(inner)
    }
    case Cast(k, inner) => s"<${kindSql(k)}>${physSql(inner)}"
    case other => exprSql(other)
  }

  /** Reserved-keyword-aware ident escape (fmt/escape.rs EscapeIdent +
    * syn/lexer/keywords.rs RESERVED_KEYWORD): used where a table name
    * renders as an expression (e.g. CountScan source). */
  private val ReservedKw: Set[String] = Set(
    "ALTER", "BEGIN", "BREAK", "CANCEL", "COMMIT", "CONTINUE", "CREATE",
    "DEFINE", "DELETE", "FOR", "IF", "INFO", "INSERT", "KILL", "LIVE",
    "OPTION", "REBUILD", "RETURN", "RELATE", "REMOVE", "SELECT", "LET",
    "SHOW", "SLEEP", "THROW", "UPDATE", "UPSERT", "USE", "DIFF", "RAND",
    "NONE", "NULL", "AFTER", "BEFORE", "VALUE", "BY", "ALL", "TRUE",
    "FALSE", "WHERE", "TABLE", "TB", "SEQUENCE", "FUNCTION")

  def escKwIdent(s: String): String =
    if (ReservedKw.contains(s.toUpperCase)) "`" + s + "`"
    else { val sb = new StringBuilder; Render.escapeIdent(sb, s); sb.toString }

  def idiomSql(parts: Seq[Part]): String = {
    val sb = new StringBuilder
    parts.zipWithIndex.foreach { case (p, i) =>
      p match {
        case PStart(e) =>
          // record-id starts followed by lookups render parenthesized
          val needsParens = parts.length > 1 && (e match {
            case _: RidLit | _: Subquery => true
            case _ => false
          })
          if (needsParens) sb.append('(').append(exprSql(e)).append(')')
          else sb.append(exprSql(e))
        case PField(n) => if (i == 0) sb.append(n) else sb.append('.').append(n)
        case PAll => if (i == 0) sb.append("*") else sb.append(".*")
        case PFlatten => sb.append("…")
        case PLast => sb.append("[$]")
        case PIndex(e) => sb.append('[').append(exprSql(e)).append(']')
        case PWhere(e) => sb.append("[WHERE ").append(exprSql(e)).append(']')
        case PMethod(n, args) => sb.append('.').append(n).append('(')
          .append(args.map(exprSql).mkString(", ")).append(')')
        case PDestructure(fs) =>
          sb.append(".{ ").append(fs.map {
            case (n, scala.None) => n
            case (n, Some(sub)) =>
              val subTxt = idiomSql(sub)
              if (subTxt == n) n else s"$n: $subTxt"
          }.mkString(", ")).append(" }")
        case POptional => sb.append('?')
        case PDoc => sb.append('@')
        case PRepeatRecurse => sb.append(".@")
        case g: PGraph =>
          val arrow = g.dir match {
            case "out" => "->"; case "in" => "<-"; case "ref" => "<~"; case _ => "<->"
          }
          sb.append(arrow)
          g.raw match {
            case Some(r) => sb.append(Defs.normRaw(r))
            case scala.None =>
              if (g.what.isEmpty) sb.append('?')
              else sb.append(g.what.map(_.table).mkString(", "))
          }
        case PRecurse(mn, mx, fixed, nest, _) =>
          sb.append(".{")
          if (fixed) sb.append(mn.getOrElse(1L))
          else sb.append(mn.map(_.toString).getOrElse("")).append("..")
            .append(mx.map(_.toString).getOrElse(""))
          sb.append('}')
          nest.foreach(np => sb.append('(').append(idiomSql(np)).append(')'))
      }
    }
    sb.toString
  }

  // ---- plan building -----------------------------------------------------

  /** Does an expression touch the database (lookups / subqueries)? */
  private def touchesDb(e: Expr): Boolean = e match {
    case Idiom(parts) => parts.exists {
      case _: PGraph | _: PRecurse | PRepeatRecurse => true
      case PStart(inner) => touchesDb(inner) || inner.isInstanceOf[RidLit]
      case _ => false
    }
    case Binary(_, l, r) => touchesDb(l) || touchesDb(r)
    case Prefix(_, i) => touchesDb(i)
    case Cast(_, i) => touchesDb(i)
    case FnCall(_, as) => as.exists(touchesDb)
    case _: Subquery => true
    case _ => false
  }

  /** Lookup chain → nested GraphEdgeScan tree (innermost CurrentValueSource). */
  private def lookupPlan(parts: Seq[Part]): Option[PNode] = {
    val hops = parts.collect { case g: PGraph => g }
    if (hops.isEmpty) return scala.None
    var node = PNode("CurrentValueSource", "Rt")
    hops.foreach { g =>
      val arrow = g.dir match {
        case "out" => "->"; case "in" => "<-"; case "ref" => "<~"; case _ => "<->"
      }
      val rich = g.fields.isDefined || g.cond.isDefined || g.groupBy.isDefined
      val output = if (rich) "FullEdge" else "TargetId"
      val tables = if (g.what.isEmpty) "" else g.what.map(_.table).mkString(", ")
      val attrs = Seq("direction" -> arrow) ++
        (if (tables.nonEmpty) Seq("tables" -> tables) else Nil) ++
        Seq("output" -> output)
      node = PNode("GraphEdgeScan", "Db", attrs, Seq(node))
      if (rich) {
        g.cond.foreach { c => node = PNode("Filter", "Db", Seq("predicate" -> exprSql(c)), Seq(node)) }
        g.groupBy.foreach {
          case Nil  => node = PNode("Aggregate", "Db", Nil, Seq(node))
          case keys => node = PNode("Aggregate", "Db",
            Seq("by" -> keys.map(exprSql).mkString(", ")), Seq(node))
        }
        if (g.groupBy.isEmpty) g.fields.foreach { fs =>
          val projs = fs.map(f => if (f.isAll) "*" else f.alias.getOrElse(Eval.fieldName(f.expr)))
          node = PNode("SelectProject", "Db", Seq("projections" -> projs.mkString(", ")), Seq(node))
        }
      }
    }
    Some(node)
  }

  /** Recursion part → Recurse node with its body chain. */
  private def recursePlan(parts: Seq[Part]): Option[(PNode, String)] = {
    parts.zipWithIndex.collectFirst { case (r: PRecurse, i) =>
      val body = r.nest.getOrElse(parts.drop(i + 1))
      val depth =
        if (r.fixed) r.min.getOrElse(1L).toString
        else r.min.getOrElse(1L).toString + ".." + r.max.map(_.toString).getOrElse("")
      val pattern = if (body.exists { case PRepeatRecurse => true
        case PDestructure(fs) => fs.exists(_._2.exists(_.contains(PRepeatRecurse)))
        case _ => false }) Seq("pattern" -> "tree") else Nil
      val instr = r.instr match {
        case RDefault => "default"
        case _: RPath => "path"
        case _: RCollect => "collect"
        case _: RShortest => "shortest"
      }
      val attrs = Seq("depth" -> depth, "instruction" -> instr) ++ pattern
      // a tree-pattern body (destructure with @ repeats) has no linear
      // lookup chain to render beneath the Recurse (explain/select_recursive)
      val children =
        if (pattern.nonEmpty) lookupPlan(body).toSeq
        else Seq(lookupPlan(body).getOrElse(PNode("CurrentValueSource", "Rt")))
      (PNode("Recurse", "Db", attrs, children), "recurse")
    }
  }

  /** Embedded-operator expressions for a projected/filtered expr. */
  private def embeds(e: Expr, role: String): Seq[(String, PNode)] = e match {
    case Idiom(parts) =>
      recursePlan(parts) match {
        case Some((node, kind)) => Seq(s"$role.$kind" -> node)
        case scala.None =>
          lookupPlan(parts).map(n => s"$role.lookup" -> n).toSeq
      }
    case _ => Nil
  }

  /** SELECT statement → plan tree (pipeline assembly, select.rs:195). */
  /** Set during EXPLAIN ANALYZE plan building: per-branch scans count
    * their own rows (dbs metrics). */
  private val analyzeModeTL = new ThreadLocal[Boolean] { override def initialValue = false }
  def analyzeMode: Boolean = analyzeModeTL.get
  def analyzeMode_=(b: Boolean): Unit = analyzeModeTL.set(b)

  private def branchRows(in: Interp, table: String, cond: Expr): Option[Long] = {
    if (!analyzeMode) return scala.None
    val sel = SelectStmt(
      fields = Seq(Field(Idiom(Seq(PAll)), scala.None, isAll = true)), value = false,
      omit = Nil, only = false, what = Seq(Idiom(Seq(PField(table)))), where = Some(cond),
      split = Nil, groupBy = scala.None, order = Nil, orderRand = false,
      limit = scala.None, start = scala.None, fetch = Nil,
      version = scala.None, timeout = scala.None, explain = false)
    try in.execStatement(sel, Env(params = in.globals, interp = Some(in))) match {
      case VArr(items) => Some(items.length.toLong)
      case _           => scala.None
    } catch { case _: Exception => scala.None }
  }

  def selectPlan(s0: SelectStmt, in: Interp): PNode = {
    // plan-time source resolution (planner/dynamic_scan_limit_pushdown):
    // a $param holding a table value and a constant-foldable type::table()
    // call plan exactly like the literal table
    def paramVal(n: String): Option[V] = in.globals.get(n).orElse(in.dbParams.get(n))
    def resolvePlanSource(e: Expr): Expr = e match {
      case Param(n) => paramVal(n) match {
        case Some(VTable(t)) => TableRef(t)
        case _ => e
      }
      case FnCall("type::table", Seq(a)) =>
        (a match {
          case Lit(VStr(t)) => Some(t)
          case Param(n) => paramVal(n).collect { case VStr(t) => t; case VTable(t) => t }
          case _ => scala.None
        }).map(TableRef(_): Expr).getOrElse(e)
      case _ => e
    }
    // the physical plan binds session params at plan time: predicate text
    // shows the VALUE (`name = { name: 'Tobie' }.name` — param_value_index)
    def substParams(e: Expr): Expr = e match {
      case Param(n) => paramVal(n) match {
        case Some(v) if !v.isInstanceOf[VTable] => Lit(v)
        case _ => e
      }
      // `type::record($p)` with a plan-time-resolvable argument folds to the
      // record id literal (planner resolve_source_exprs constant folding) —
      // an IN list over it can then probe an index per element
      case FnCall("type::record", Seq(a)) =>
        (substParams(a) match {
          case Lit(VStr(s)) if s.indexOf(':') > 0 =>
            val i = s.indexOf(':')
            val (tb, key) = (s.substring(0, i), s.substring(i + 1))
            val kv: V = if (key.nonEmpty && key.forall(_.isDigit)) VInt(key.toLong) else VStr(key)
            Some(Lit(VRid(tb, kv)))
          case _ => scala.None
        }).getOrElse(e)
      case Binary(op, l, r) => Binary(op, substParams(l), substParams(r))
      case Prefix(op, i)    => Prefix(op, substParams(i))
      case Cast(k, i)       => Cast(k, substParams(i))
      case Idiom(parts) => Idiom(parts.map {
        case PStart(i) => PStart(substParams(i))
        case PIndex(i) => PIndex(substParams(i))
        case PWhere(i) => PWhere(substParams(i))
        case p => p
      })
      case ArrLit(items) => ArrLit(items.map(substParams))
      case other => other
    }
    val sSub = s0.copy(what = s0.what.map(resolvePlanSource),
      where = s0.where.map(substParams))
    // ---- `<|k|>` KNN: stripped from WHERE and planned as its own operator
    // (exec/planner/util.rs:394 strip-and-subplan). The numeric-ef form over
    // an HNSW/MTREE index becomes a KnnScan SOURCE (scan/knn.rs:37); any
    // other form a KnnTopK above the filtered rows (knn_topk.rs:81).
    val knnConj = sSub.where.flatMap(w => conjunctList(w).collectFirst {
      case b @ Binary(op, Idiom(Seq(PField(f))), rhs) if op.startsWith("KNN:") =>
        (b, op, f, rhs)
    })
    val s = knnConj match {
      case Some((b, _, _, _)) =>
        sSub.copy(where = sSub.where.flatMap(w =>
          conjunctList(w).filterNot(_ eq b).reduceOption(Binary("&&", _, _))))
      case scala.None => sSub
    }
    // new-executor gap: @@ on a multi-part field path fails at plan time
    // (record_link_index_new_executor golden)
    if (!in.legacyPlanner) s.where.foreach { w =>
      def scanMatches(e: Expr): Unit = e match {
        case Binary(op, Idiom(parts), _) if op.startsWith("MATCHES") &&
            parts.count(_.isInstanceOf[PField]) > 1 =>
          throw SqlError("Invalid query: New executor does not support: MATCHES with multi-part field path not yet supported in streaming executor")
        case Binary(_, l, r) => scanMatches(l); scanMatches(r)
        case Prefix(_, i) => scanMatches(i)
        case _ => ()
      }
      scanMatches(w)
    }
    val singleTable: Option[String] = s.what match {
      case Seq(Idiom(Seq(PField(n)))) => Some(n)
      case Seq(TableRef(n))           => Some(n)
      case _                          => scala.None
    }

    // decoded KNN operator: k, raw arg, Capitalized metric, query dimension
    val knnInfo: Option[(String, String, String, String, String)] =
      knnConj.map { case (_, op, f, rhs) =>
        val parts = op.split(":", -1)
        val k = parts(1)
        val arg = parts.lift(2).getOrElse("")
        val metricCap = (if (arg.nonEmpty && !arg.forall(_.isDigit)) arg else "EUCLIDEAN")
          .toLowerCase.capitalize
        val dim = (try Search.vecOf(Eval.eval(rhs,
            Env(params = in.globals, interp = Some(in))))
          catch { case _: Exception => scala.None })
          .map(_.length).getOrElse(0).toString
        (f, k, arg, metricCap, dim)
      }
    // ef-form KNN served by an HNSW/MTREE vector index → KnnScan source
    val knnScanIdx: Option[Defs.IndexDef] = knnInfo.flatMap { case (f, _, arg, _, _) =>
      if (arg.isEmpty || !arg.forall(_.isDigit) || s.withIndex.contains(Nil)) scala.None
      else singleTable.flatMap { t =>
        in.indexDefs.collectFirst {
          case ((tt, _), d) if tt == t && d.fields.contains(f) &&
              s.withIndex.forall(_.contains(d.name)) &&
              (d.tail.toUpperCase.startsWith("HNSW") ||
               d.tail.toUpperCase.startsWith("MTREE")) => d
        }
      }
    }

    // CountScan fast path: GROUP ALL + count()-only projection on one table
    // or record-id range (exec/operators/scan/count.rs; source renders as an
    // expression so reserved table names backtick)
    val countSource: Option[String] = s.what match {
      case Seq(Idiom(Seq(PField(n)))) => Some(escKwIdent(n))
      case Seq(TableRef(n))           => Some(escKwIdent(n))
      case Seq(r @ RidLit(_, _: RangeLit)) => Some(exprSql(r))
      case _ => scala.None
    }
    val groupAllCount = s.groupBy.contains(Nil) && countAllOnly(s)
    if (groupAllCount && countSource.isDefined && s.where.isEmpty)
      return PNode("CountScan", "Db", Seq("source" -> countSource.get))
    // IndexCountScan: the count is served by an index probe plus the index
    // condition (exec/operators/scan/index_count.rs)
    if (groupAllCount && singleTable.isDefined && s.where.isDefined &&
        !s.withIndex.contains(Nil)) {
      indexAccess(in, singleTable.get, s.where.get, s.withIndex, newExec = true) match {
        case Some((_, _, scala.None, _, _)) =>
          return PNode("IndexCountScan", "Db", Seq(
            "source" -> countSource.getOrElse(singleTable.get),
            "condition" -> physSql(s.where.get)))
        case _ => ()
      }
    }

    // ---- source ----------------------------------------------------------
    val predicateTxt = s.where.map(physSql)
    // limit/offset pushdown into the scan: plain scan, no sort/group
    val limitConst = s.limit.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None })
    val startConst = s.start.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None })
    // ORDER BY id is the natural scan order: the sort is eliminated and the
    // scan direction flips for DESC (dbs/plan.rs scan-direction rule). Only
    // a SINGLE source preserves it — a multi-FROM Union interleaves rows
    // (explain/complex query 6 keeps its SortTopKByKey)
    val orderById = s.groupBy.isEmpty && !s.orderRand && s.order.length == 1 &&
      s.what.length == 1 &&
      (s.order.head.expr match { case Idiom(Seq(PField("id"))) => true; case _ => false })
    val pushLimit = (s.order.isEmpty || orderById) && s.groupBy.isEmpty && s.split.isEmpty && singleTable.isDefined
    var consumedPred = false
    var consumedLimit = false
    var orderConsumed = false
    var residualPred: Option[Expr] = scala.None
    def hints2(n: String): Boolean = s.withIndex.forall(_.contains(n))

    // analysis-only view of the WHERE: `type::field($p)` with a plan-time-
    // resolvable argument is the field idiom for INDEX SELECTION (the
    // parameterized-OData shape, reproductions/schemaless_parameterized) —
    // predicate TEXT keeps the original call form.
    def resolveFieldFns(e: Expr): Expr = e match {
      case FnCall("type::field", Seq(a)) =>
        (substParams(a) match {
          case Lit(VStr(f)) => Some(Idiom(Seq(PField(f))): Expr)
          case _ => scala.None
        }).getOrElse(e)
      case Binary(op, l, r) => Binary(op, resolveFieldFns(l), resolveFieldFns(r))
      case Prefix(op, i)    => Prefix(op, resolveFieldFns(i))
      case other => other
    }
    def containsFieldFn(e: Expr): Boolean = e match {
      case FnCall("type::field", _) => true
      case Binary(_, l, r) => containsFieldFn(l) || containsFieldFn(r)
      case Prefix(_, i)    => containsFieldFn(i)
      case _ => false
    }
    val wAna: Option[Expr] =
      s.where.map(w => if (containsFieldFn(w)) resolveFieldFns(w) else w)

    def sourceNode(e: Expr): PNode = e match {
      case Idiom(Seq(PField(_))) | TableRef(_) =>
        val name = e match { case Idiom(Seq(PField(x))) => x; case TableRef(x) => x; case _ => "" }
        // Inside a COMPUTED field body the planner has no plan-time catalog
        // context — table sources resolve their access path at runtime via
        // DynamicScan (planner/select.rs:2223 "FROM tablename fallback when
        // plan-time catalog context is unavailable"); predicate and limit
        // still push into the scan.
        if (in.planCatalogless) {
          var attrs = Seq("source" -> name)
          if (singleTable.isDefined && predicateTxt.isDefined) {
            attrs = attrs :+ ("predicate" -> predicateTxt.get)
            consumedPred = true
          }
          if (pushLimit && limitConst.isDefined) {
            attrs = attrs :+ ("limit" -> limitConst.get.toString)
            startConst.filter(_ > 0).foreach(o => attrs = attrs :+ ("offset" -> o.toString))
            consumedLimit = true
          }
          return PNode("DynamicScan", "Db", attrs)
        }
        // KnnScan source: the `<|k,ef|>` probe IS the scan; the remaining
        // WHERE stays a Filter above it (scan/knn.rs:37, HnswConditionChecker
        // pulls candidates until k pass, so the scan emits ≤ k rows)
        knnScanIdx.foreach { d =>
          val Some((_, k, arg, _, dim)) = knnInfo
          return PNode("KnnScan", "Db", Seq(
            "index" -> d.name, "k" -> k, "ef" -> arg, "dimension" -> dim))
        }
        // IndexScan access-path selection: equality conjuncts served by an
        // index; residual conjuncts become a Filter (exec/index/access_path.rs)
        // WHERE id = <rid> (any conjunct) → point lookup (planner record-id equality)
        s.where.foreach { w =>
          conjunctList(w).collectFirst {
            case Binary("=" | "==", Idiom(Seq(PField("id"))), r @ RidLit(tb, _)) if tb == name => r
            // flipped operands: `item:3 = id` is the same point access
            case Binary("=" | "==", r @ RidLit(tb, _), Idiom(Seq(PField("id")))) if tb == name => r
          }.foreach { r =>
            consumedPred = true
            return PNode("RecordIdScan", "Db",
              Seq("record_id" -> exprSql(r), "predicate" -> physSql(w)))
          }
        }
        // a UNIQUE-index equality access outranks full-text: at most one
        // row, so @@ and the rest become residual filters and the sort is
        // eliminated (multi_index_or_and_new_executor assert 14)
        val idxPre = wAna.flatMap(w => indexAccess(in, name, w, s.withIndex, newExec = true))
        val uniqueEq = idxPre.filter { case (idxName, access, _, idxFields, eqLen) =>
          eqLen == idxFields.length && access.startsWith("=") &&
            in.indexDefs.exists { case ((t, _), d) => t == name && d.name == idxName && d.unique }
        }
        if (uniqueEq.isDefined && s.order.nonEmpty) orderConsumed = true
        val fts = if (uniqueEq.isDefined) scala.None
          else wAna.flatMap(w => fulltextAccess(in, name, w))
        // a direct index candidate outranks IN/containment expansion —
        // expansions are fallbacks when no candidate exists
        // (in_operator_index assert 22: compound prefix beats IN union)
        val union = if (fts.isDefined || uniqueEq.isDefined || idxPre.isDefined) scala.None
          else wAna.flatMap(w => unionIndexAccess(in, name, w, s.withIndex, newExec = true))
        union.foreach { case (idxName, items, c) =>
          consumedPred = true
          residualPred = s.where
          // per-branch probe condition: CONTAINS for containment unions,
          // equality for IN-list unions (planner contains_operators)
          def branchCond(bi: Int): Option[Expr] = c match {
            case Binary(op, lhs, ArrLit(elems)) if bi < elems.length =>
              Some(if (op.startsWith("CONTAINS")) Binary("CONTAINS", lhs, elems(bi))
                   else Binary("=", lhs, elems(bi)))
            case _ => scala.None
          }
          val branches = items.zipWithIndex.map { case (v, bi) =>
            PNode("IndexScan", "Db",
              Seq("index" -> idxName, "access" -> v, "direction" -> "Forward"),
              rows = branchCond(bi).flatMap(branchRows(in, name, _)))
          }
          // a single-element IN list needs no union wrapper
          return if (branches.length == 1) branches.head
          else {
            // the union's own count: DISTINCT records across branches
            val unionRows = items.indices.flatMap(branchCond)
              .reduceOption(Binary("||", _, _)).flatMap(branchRows(in, name, _))
            PNode("UnionIndexScan", "Db",
              Seq("table" -> name, "branches" -> branches.length.toString),
              branches, rows = unionRows)
          }
        }
        // OR across per-disjunct indexes: UnionIndexScan with one branch per
        // disjunct. Each disjunct contributes its BEST single access — eq
        // probe first, then a single-element IN probe, then a range — with
        // every non-served conjunct left to the union-level residual Filter
        // (select_with_in_operator_multiple_indexes_new_executor 5/7; branch
        // rows reflect the access ALONE, pre-residual).
        wAna.map(disjunctList).filter(_.length > 1).foreach { ds =>
          def servedOf(d: Expr, residual: Option[Expr]): Option[Expr] = {
            val resSet = residual.map(conjunctList(_).toSet).getOrElse(Set.empty[Expr])
            conjunctList(d).filterNot(resSet.contains).reduceOption(Binary("&&", _, _))
          }
          // (branch node, served-access condition for union row counting)
          val branchOpts: Seq[Option[(PNode, Option[Expr])]] = ds.map { d =>
            val acc = indexAccess(in, name, d, s.withIndex, newExec = true)
            def accBranch(wantEq: Boolean): Option[(PNode, Option[Expr])] =
              acc.filter(a => (a._5 > 0) == wantEq).map {
                case (idxName, access, residual, _, _) =>
                  val served = servedOf(d, residual)
                  (PNode("IndexScan", "Db",
                    Seq("index" -> idxName, "access" -> access, "direction" -> "Forward"),
                    rows = served.flatMap(branchRows(in, name, _))), served)
              }
            def inProbe: Option[(PNode, Option[Expr])] =
              unionIndexAccess(in, name, d, s.withIndex, newExec = true)
                .filter(_._2.length == 1).map { case (idxName, items, c) =>
                  val served: Option[Expr] = c match {
                    case Binary(_, lhs, ArrLit(Seq(el))) => Some(Binary("=", lhs, el))
                    case _ => Some(c)
                  }
                  (PNode("IndexScan", "Db",
                    Seq("index" -> idxName, "access" -> items.head, "direction" -> "Forward"),
                    rows = served.flatMap(branchRows(in, name, _))), served)
                }
            def ftsBranch: Option[(PNode, Option[Expr])] =
              fulltextAccess(in, name, d) match {
                case Some((idxName, q, _)) =>
                  // branch rows reflect the @@ access alone; the disjunct's
                  // non-indexed conjuncts stay in the union-level residual
                  // Filter (matches_without_using_index_iterator)
                  val matchConj = conjunctList(d).collectFirst {
                    case c @ Binary(op, _, _) if op.startsWith("MATCHES") => c
                  }
                  Some((PNode("FullTextScan", "Db",
                    Seq("index" -> idxName, "query" -> q),
                    rows = matchConj.flatMap(branchRows(in, name, _))), matchConj))
                case _ => scala.None
              }
            accBranch(wantEq = true).orElse(inProbe)
              .orElse(accBranch(wantEq = false)).orElse(ftsBranch)
          }
          if (branchOpts.forall(_.isDefined)) {
            consumedPred = true
            residualPred = s.where
            val branches = branchOpts.flatten.map(_._1)
            // the union's own count: DISTINCT records across branch accesses
            val unionRows = branchOpts.flatten.flatMap(_._2)
              .reduceOption(Binary("||", _, _)).flatMap(branchRows(in, name, _))
            return PNode("UnionIndexScan", "Db",
              Seq("table" -> name, "branches" -> branches.length.toString),
              branches, rows = unionRows)
          }
        }
        val idx = if (fts.isDefined) scala.None
          else wAna.flatMap(w => indexAccess(in, name, w, s.withIndex, newExec = true))
        fts match {
          case Some((idxName, queryTxt, residual)) =>
            consumedPred = true
            residualPred = residual
            // ANALYZE rows on the scan reflect the @@ access alone,
            // before residual filtering (multi_index_or_and_new_executor)
            val ftsRows = s.where.flatMap(w => conjunctList(w).collectFirst {
              case c @ Binary(op, _, _) if op.startsWith("MATCHES") =>
                branchRows(in, name, c)
            }.flatten)
            PNode("FullTextScan", "Db", Seq("index" -> idxName, "query" -> queryTxt),
              rows = ftsRows)
          case scala.None =>
        idx match {
          case Some((idxName, access, residual, idxFields, eqLen)) =>
            consumedPred = true
            residualPred = residual
            // index-covered ordering: a single ORDER BY key on a matched
            // index field is served by scan direction (sort elimination,
            // planner util.rs:1243 index_covers_ordering)
            var direction = "Forward"
            if (s.order.length == 1 && s.groupBy.isEmpty) {
              s.order.head.expr match {
                case Idiom(Seq(PField(of))) if idxFields.take(eqLen + 1).contains(of) =>
                  orderConsumed = true
                  direction = if (s.order.head.desc) "Backward" else "Forward"
                case _ => ()
              }
            }
            var attrs = Seq("index" -> idxName, "access" -> access, "direction" -> direction)
            if ((orderConsumed || s.order.isEmpty) && residual.isEmpty &&
                limitConst.isDefined && s.groupBy.isEmpty && s.split.isEmpty) {
              attrs = attrs :+ ("limit" -> limitConst.get.toString)
              startConst.filter(_ > 0).foreach(o => attrs = attrs :+ ("offset" -> o.toString))
              consumedLimit = true
            }
            PNode("IndexScan", "Db", attrs)
          case scala.None =>
            // ORDER BY an indexed field without index-served WHERE: scan the
            // index in order with an empty access (sort elimination +
            // limit pushdown, planner index_limit_pushdown)
            if (s.order.length == 1 && s.groupBy.isEmpty && s.where.isEmpty &&
                !s.orderRand && !orderById) {
              val idxForOrder = s.order.head.expr match {
                case Idiom(Seq(PField(of))) =>
                  in.indexDefs.collectFirst {
                    case ((t, _), d) if t == name && d.fields.headOption.contains(of) &&
                        hints2(d.name) &&
                        !d.tail.toUpperCase.startsWith("FULLTEXT") &&
                        !d.tail.toUpperCase.startsWith("SEARCH") => d
                  }
                case _ => scala.None
              }
              idxForOrder match {
                case Some(d) =>
                  orderConsumed = true
                  val direction = if (s.order.head.desc) "Backward" else "Forward"
                  var attrs = Seq("index" -> d.name, "access" -> "", "direction" -> direction)
                  if (limitConst.isDefined && startConst.isEmpty && s.split.isEmpty) {
                    attrs = attrs :+ ("limit" -> limitConst.get.toString)
                    consumedLimit = true
                  }
                  return PNode("IndexScan", "Db", attrs)
                case scala.None => ()
              }
            }
            var direction = "Forward"
            if (orderById) {
              orderConsumed = true
              direction = if (s.order.head.desc) "Backward" else "Forward"
            }
            var attrs = Seq("table" -> name, "direction" -> direction)
            if (singleTable.isDefined && predicateTxt.isDefined) {
              attrs = attrs :+ ("predicate" -> predicateTxt.get)
              consumedPred = true
            }
            if (pushLimit && limitConst.isDefined) {
              attrs = attrs :+ ("limit" -> limitConst.get.toString)
              startConst.filter(_ > 0).foreach(o => attrs = attrs :+ ("offset" -> o.toString))
              consumedLimit = true
            }
            PNode("TableScan", "Db", attrs)
        }
        }
      case r: RidLit => PNode("RecordIdScan", "Db", Seq("record_id" -> exprSql(r)))
      // a sub-select FROM source inlines its own pipeline as the child plan
      // (explain/complex query 8)
      case Subquery(sub: SelectStmt) => selectPlan(sub, in)
      case other => PNode("SourceExpr", "Db", Seq("expr" -> exprSql(other)))
    }

    var node: PNode =
      if (s.what.length == 1) sourceNode(s.what.head)
      else PNode("Union", "Db", Nil, s.what.map { src =>
        // multi-FROM: a branch may still scan via an index, but the WHERE
        // stays a union-level Filter and order/limit cannot be consumed by
        // any single branch (explain/complex queries 6 and 8)
        val n = sourceNode(src)
        consumedPred = false; residualPred = scala.None
        orderConsumed = false; consumedLimit = false
        n
      })

    // ---- filter (residual) ----------------------------------------------
    if (!consumedPred) s.where.foreach { w =>
      node = PNode("Filter", "Db", Seq("predicate" -> physSql(w)), Seq(node))
    }
    residualPred.foreach { w =>
      node = PNode("Filter", "Db", Seq("predicate" -> physSql(w)), Seq(node),
        exprs = Seq("predicate" -> physSql(w)))
    }

    // ---- KnnTopK: brute-force top-k above the filtered source -------------
    // (exec/operators/knn_topk.rs:81 — ranks only rows that passed the plain
    // predicate, so the Filter/scan sits BELOW it in the tree)
    if (knnInfo.isDefined && knnScanIdx.isEmpty) {
      val Some((f, k, _, metricCap, dim)) = knnInfo
      if (analyzeMode) {
        // the source emits the rows passing the plain predicate — NOT the
        // post-KNN count the executed statement reports
        val tables = s.what.collect {
          case Idiom(Seq(PField(n))) => n
          case TableRef(n)           => n
        }
        val plainCond = s.where.getOrElse(Lit(VBool(true)))
        lazy val plainTotal = tables.flatMap(t => branchRows(in, t, plainCond))
          .reduceOption(_ + _)
        lazy val tableTotal = tables.flatMap(t => branchRows(in, t, Lit(VBool(true))))
          .reduceOption(_ + _)
        node = node.name match {
          case "TableScan" => node.copy(rows = plainTotal)
          case "Filter" => node.copy(rows = plainTotal,
            children = node.children.map {
              case u if u.name == "Union" => u.copy(rows = tableTotal,
                children = u.children.map {
                  case ts if ts.name == "TableScan" =>
                    ts.copy(rows = ts.attrs.collectFirst { case ("table", t) =>
                      branchRows(in, t, Lit(VBool(true))) }.flatten)
                  case c => c
                })
              case c => c
            })
          case _ => node
        }
      }
      node = PNode("KnnTopK", "Db", Seq(
        "field" -> f, "k" -> k, "distance" -> metricCap, "dimension" -> dim), Seq(node))
    }

    // ---- split -----------------------------------------------------------
    if (s.split.nonEmpty)
      node = PNode("Split", "Db", Seq("on" -> s.split.mkString(", ")), Seq(node))

    // ---- aggregate -------------------------------------------------------
    val grouped = s.groupBy.isDefined
    s.groupBy.foreach {
      case Nil  => node = PNode("Aggregate", "Db", Seq("mode" -> "GROUP ALL"), Seq(node))
      case keys => node = PNode("Aggregate", "Db",
        Seq("by" -> keys.map(exprSql).mkString(", ")), Seq(node))
    }

    // ---- sort / limit ----------------------------------------------------
    // Compute classification hoisted: a KNN plan ordering on a computed
    // alias runs the Compute pre-pass BEFORE the sort (SortByKey above
    // Compute — bruteforce_knn_with_filter_new_executor), so the sort key
    // resolves the computed field
    lazy val computedFields = s.fields.filterNot(_.isAll).filter(f => f.expr match {
      case Idiom(ps) => !ps.forall(_.isInstanceOf[PField])
      case _ => true
    })
    def computeNode(child: PNode): PNode = {
      val fieldsTxt = computedFields.map { f =>
        val nm = f.alias.getOrElse(Eval.fieldName(f.expr))
        s"$nm = ${physSql(f.expr)}"
      }.mkString(", ")
      val emb = computedFields.flatMap { f =>
        val nm = f.alias.getOrElse(Eval.fieldName(f.expr))
        embeds(f.expr, nm)
      }
      PNode("Compute", "Db", Seq("fields" -> fieldsTxt), Seq(child), embedded = emb)
    }
    var computePre = false
    if (knnInfo.isDefined && !grouped && s.order.nonEmpty && !orderConsumed &&
        computedFields.nonEmpty && s.order.exists(_.expr match {
          case Idiom(Seq(PField(n))) =>
            computedFields.exists(f => f.alias.getOrElse(Eval.fieldName(f.expr)) == n)
          case _ => false
        })) {
      node = computeNode(node)
      computePre = true
    }
    val orderTxt = s.order.map(k => physSql(k.expr) + (if (k.desc) " DESC" else " ASC")).mkString(", ")
    if (s.order.nonEmpty && !orderConsumed) {
      if (limitConst.isDefined) {
        val topn = limitConst.get + startConst.getOrElse(0L)
        val (nme, key) = if (grouped) ("SortTopK", "order_by") else ("SortTopKByKey", "sort_keys")
        node = PNode(nme, "Db", Seq(key -> orderTxt, "limit" -> topn.toString), Seq(node))
        var attrs = Seq("limit" -> limitConst.get.toString)
        startConst.foreach(o => attrs = attrs :+ ("offset" -> o.toString))
        node = PNode("Limit", "Db", attrs, Seq(node))
        consumedLimit = true
      } else {
        val (nme, key) = if (grouped) ("Sort", "order_by") else ("SortByKey", "sort_keys")
        node = PNode(nme, "Db", Seq(key -> orderTxt), Seq(node))
      }
    }
    if (!consumedLimit && (limitConst.isDefined || startConst.isDefined)) {
      var attrs = Seq.empty[(String, String)]
      limitConst.foreach(l => attrs = attrs :+ ("limit" -> l.toString))
      startConst.filter(_ > 0).foreach(o => attrs = attrs :+ ("offset" -> o.toString))
      node = PNode("Limit", "Db", attrs, Seq(node))
    }

    // ---- projection classification --------------------------------------
    // FETCH wraps the completed pipeline (exec fetch operator)
    def withFetch(n: PNode): PNode =
      if (s.fetch.isEmpty) n
      else PNode("Fetch", "Db", Seq("fields" -> s.fetch.map {
        case Lit(VStr(p)) => p
        case e => physSql(e)
      }.mkString(", ")), Seq(n))
    if (grouped) return withFetch(node)

    val isRid = s.what.exists { case _: RidLit => true; case _ => false }
    // `SELECT * FROM t:a` projects generically; a RANGE scan streams like a
    // table and keeps SelectProject (reverse_iterator_range_new_executor)
    val isRidPoint = s.what.exists {
      case RidLit(_, k) => !k.isInstanceOf[RangeLit]
      case _ => false
    }
    withFetch(if (s.value) {
      val fe = s.fields.head.expr
      PNode("ProjectValue", "Db", Seq("expr" -> physSql(fe)), Seq(node),
        embedded = embeds(fe, "expr"))
    } else if (s.fields.forall(_.isAll) && isRidPoint) {
      PNode("Project", "Db", Nil, Seq(node))
    } else if (s.fields.exists(f => !f.isAll && containsParam(f.expr))) {
      // parameterized projections (`type::field($p) AS x`) require the full
      // Project operator, not the fast SelectProject path (select.rs:708)
      PNode("Project", "Db", Nil, Seq(node))
    } else if (s.fields.exists(f => !f.isAll && touchesDb(f.expr) && f.alias.isEmpty)) {
      // UNALIASED db-touching projections keep the bare Project shape with
      // `field.*` embeds; aliased ones classify as Compute fields below
      // (explain/select_graph vs explain/select_recursive)
      val emb = s.fields.filterNot(_.isAll).flatMap(f => embeds(f.expr, "field"))
      PNode("Project", "Db", Nil, Seq(node), embedded = emb)
    } else {
      val simple = s.fields.forall(f => f.isAll || (f.expr match {
        case Idiom(ps) => ps.forall(_.isInstanceOf[PField])
        case _ => false
      }))
      val projs = s.fields.map(f =>
        if (f.isAll) "*" else f.alias.getOrElse(Eval.fieldName(f.expr))).mkString(", ")
      if (simple) PNode("SelectProject", "Db", Seq("projections" -> projs), Seq(node))
      // record-id sources project generically — no Compute pre-pass
      // (select/group/count_range_keys_only vs count_group_all)
      else if (isRid) PNode("Project", "Db", Nil, Seq(node))
      else if (computePre)
        PNode("SelectProject", "Db", Seq("projections" -> projs), Seq(node))
      else
        PNode("SelectProject", "Db", Seq("projections" -> projs), Seq(computeNode(node)))
    })
  }

  /** True when a projection expression references a `$param` (these require
    * the full Project operator, select.rs:708). */
  private def containsParam(e: Expr): Boolean = e match {
    case Param(_)        => true
    case Binary(_, l, r) => containsParam(l) || containsParam(r)
    case Prefix(_, i)    => containsParam(i)
    case Cast(_, i)      => containsParam(i)
    case FnCall(_, as)   => as.exists(containsParam)
    case ArrLit(xs)      => xs.exists(containsParam)
    case Idiom(ps)       => ps.exists {
      case PStart(i) => containsParam(i)
      case PIndex(i) => containsParam(i)
      case PWhere(i) => containsParam(i)
      case _ => false
    }
    case _ => false
  }

  private def conjunctList(e: Expr): Seq[Expr] = e match {
    case Binary("&&", l, r) => conjunctList(l) ++ conjunctList(r)
    case x => Seq(x)
  }

  private def disjunctList(e: Expr): Seq[Expr] = e match {
    case Binary("||", l, r) => disjunctList(l) ++ disjunctList(r)
    case x => Seq(x)
  }

  /** ORDER BY covered by an index: single key on the first field of a
    * non-fulltext index (idx/planner order selection). Returns
    * (index name, descending). */
  private def orderIndexInfo(in: Interp, table: String, s: SelectStmt,
      hints: Option[Seq[String]]): Option[(String, Boolean)] = {
    if (s.order.length != 1 || hints.contains(Nil)) return scala.None
    s.order.head.expr match {
      case Idiom(Seq(PField(f))) =>
        in.indexDefs.collectFirst {
          case ((t, _), d) if t == table && d.fields.headOption.contains(f) &&
              hints.forall(_.contains(d.name)) &&
              !d.tail.toUpperCase.startsWith("FULLTEXT") &&
              !d.tail.toUpperCase.startsWith("SEARCH") &&
              !d.tail.toUpperCase.startsWith("HNSW") &&
              !d.tail.toUpperCase.startsWith("COUNT") =>
            (d.name, s.order.head.desc)
        }
      case _ => scala.None
    }
  }

  /** Index access-path selection (exec/index/access_path.rs:209): an
    * equality prefix plus an optional range on the next index field.
    * Returns (index name, access text, residual predicate, index fields,
    * equality-prefix length). Unique indexes are preferred at equal
    * prefix length. */
  /** Dotted text of a pure field path (PField/PAll parts only). */
  private def fieldPathName(ps: Seq[Part]): Option[String] =
    if (ps.forall {
      case _: PField | PAll => true
      case PIndex(Lit(_: VInt)) => true
      case PMethod(_, Nil) => true // zero-arg method paths are indexable (id.id().r)
      case _ => false
    }) {
      val sb = new StringBuilder
      ps.foreach {
        case PField(n) => if (sb.nonEmpty) sb.append('.'); sb.append(n)
        case PIndex(Lit(VInt(i))) => sb.append('[').append(i).append(']')
        case PMethod(n, _) => sb.append('.').append(n).append("()")
        case _ => if (sb.nonEmpty) sb.append('.'); sb.append('*')
      }
      Some(sb.toString)
    }
    else scala.None

  private def indexAccess(in: Interp, table: String, where: Expr,
      hints: Option[Seq[String]] = scala.None,
      newExec: Boolean = false): Option[(String, String, Option[Expr], Seq[String], Int)] = {
    if (hints.contains(Nil)) return scala.None // WITH NOINDEX
    val cs = conjunctList(where)
    // access values fold with session params bound — the planner resolves
    // `>$p3 - math::max([0, $p1]) + $p1` to its value
    // (define/index/with_non_boolean_expression)
    def foldSql(e: Expr): String =
      try {
        (try Eval.eval(e, Env(params = in.globals, interp = Some(in)))
         catch { case _: Exception => Eval.evalConst(e) }) match {
          case VNone => exprSql(e)
          case v => Render.sql(v)
        }
      } catch { case _: Exception => exprSql(e) }
    val eqPairs: Map[String, (String, Expr)] = cs.collect {
      // the analyzer only matches literal/param values — a value-path rhs
      // (`{ name: 'Tobie' }.name`) stays a scan predicate (param_value_index)
      case c @ Binary("=" | "==", Idiom(ps), rhs)
          if (!touchesDb(rhs) || rhs.isInstanceOf[RidLit]) &&
            !(newExec && rhs.isInstanceOf[Idiom]) &&
            fieldPathName(ps).isDefined && !ps.contains(PAll) =>
        fieldPathName(ps).get -> ((foldSql(rhs), c))
      // CONTAINS probes an index only when the index is built over an ARRAY
      // path (`marks.*.subject`) — each element is an index entry. A plain
      // scalar-field index stores whole values and cannot serve CONTAINS
      // (planner contains_operators vs delete_select_std_index_…).
      case c @ Binary("CONTAINS", Idiom(ps), rhs)
          if !touchesDb(rhs) && fieldPathName(ps).isDefined && ps.contains(PAll) =>
        fieldPathName(ps).get -> ((exprSql(rhs), c))
      // field CONTAINS x / x INSIDE field probe an index declared over
      // field[*] (Part::All entries, one per element —
      // reproductions/array_containment_index)
      case c @ Binary("CONTAINS", Idiom(ps), rhs)
          if !touchesDb(rhs) && fieldPathName(ps).isDefined && !ps.contains(PAll) =>
        (fieldPathName(ps).get + "[*]") -> ((exprSql(rhs), c))
      // scalar INSIDE an array path probes the per-element index over that
      // path: `field[*]` for a plain field, the path itself when it already
      // fans out through `*` (marks.*.mark)
      case c @ Binary("INSIDE" | "IN", lhs, Idiom(ps))
          if !touchesDb(lhs) && fieldPathName(ps).isDefined =>
        val p = fieldPathName(ps).get
        (if (ps.contains(PAll)) p else p + "[*]") -> ((exprSql(lhs), c))
      // the LEGACY planner also serves `=` against a `*`-fanned path from
      // the per-element index (the new executor keeps it a scan predicate —
      // equality against the collected array, not its elements)
      case c @ Binary("=" | "==", Idiom(ps), rhs)
          if in.legacyPlanner && !touchesDb(rhs) && fieldPathName(ps).isDefined &&
            ps.contains(PAll) =>
        fieldPathName(ps).get -> ((foldSql(rhs), c))
    }.toMap
    val rangeOps: Map[String, Seq[(String, String, Expr)]] = cs.collect {
      case c @ Binary(op @ (">" | ">=" | "<" | "<="), Idiom(ps), rhs)
          if !touchesDb(rhs) && fieldPathName(ps).isDefined && !ps.contains(PAll) =>
        (fieldPathName(ps).get, (op, foldSql(rhs), c))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val candidates = in.indexDefs.collect {
      case ((t, _), d) if t == table && d.fields.nonEmpty &&
          hints.forall(h => h.contains(d.name)) &&
          !d.tail.toUpperCase.startsWith("FULLTEXT") && !d.tail.toUpperCase.startsWith("SEARCH") =>
        val matched = d.fields.takeWhile(f => eqPairs.contains(f))
        (d, matched)
    }.filter { case (d, m) => m.length == d.fields.length || m.nonEmpty }
      .filter(_._2.nonEmpty)
    if (candidates.isEmpty) {
      // range-only access: range conjuncts on the FIRST field of an index
      // (single-field compact render: `>15`, `>=2000 <2020`)
      val rangeCand = in.indexDefs.collectFirst {
        case ((t, _), d) if t == table && d.fields.nonEmpty &&
            hints.forall(h => h.contains(d.name)) &&
            !d.tail.toUpperCase.startsWith("FULLTEXT") && !d.tail.toUpperCase.startsWith("SEARCH") &&
            rangeOps.contains(d.fields.head) => d
      }
      return rangeCand.map { d =>
        val rs = rangeOps(d.fields.head)
        val served = rs.map(_._3).toSet
        val residual = cs.filterNot(served.contains).reduceOption((a, b) => Binary("&&", a, b))
        val access = rs.sortBy(r => if (r._1.startsWith(">")) 0 else 1)
          .map { case (op, v, _) => op + v }.mkString(" ")
        (d.name, access, residual, d.fields, 0)
      }
    }
    // candidate scoring mirrors exec/index/analysis.rs IndexCandidate::score:
    // single-column equality 500 (unique 1000), compound prefix 400+50/col
    // (+25 for a range on the next column); ties resolve to the FIRST
    // candidate in catalog order (explain/complex picks idx_category over
    // the fully-matching idx_cat_brand; compound_index_matching picks the
    // higher-scoring 3-column compound)
    def candScore(d: Defs.IndexDef, m: Seq[String]): Int = {
      val rangeNext = d.fields.lift(m.length).exists(rangeOps.contains)
      if (d.fields.length == 1) (if (d.unique) 1000 else 500)
      else 400 + 50 * m.length + (if (rangeNext) 25 else 0)
    }
    // legacy planner: longest equality match wins, ties resolve to the
    // LAST index in catalog order and uniqueness is NOT prized
    // (multi_index_or_and assert 11 picks idx_genre over uniq_name)
    val (idx, matched) =
      if (newExec) candidates.maxBy { case (d, m) => candScore(d, m) }
      else candidates.zipWithIndex.maxBy { case ((d, m), i) => (m.length, i) }._1
    val containsConjuncts: Set[Expr] = cs.collect {
      case c @ Binary("CONTAINS", _, _) => c
      case c @ Binary("INSIDE" | "IN", _, Idiom(_)) => c
    }.toSet
    var served = matched.map(f => eqPairs(f)._2).toSet -- containsConjuncts
    // range on the field right after the equality prefix
    val rangeTxt = idx.fields.lift(matched.length).flatMap(rangeOps.get) match {
      // several ranges on the post-prefix field: the access serves the
      // FIRST (conjunct order); the rest stay residual (compound_index [9])
      case Some(rs) if rs.nonEmpty =>
        val (op, vTxt, c) = rs.head
        served += c
        val opName = op match {
          case ">"  => "MoreThan"
          case ">=" => "MoreThanEqual"
          case "<"  => "LessThan"
          case "<=" => "LessThanEqual"
        }
        Some(s" $opName $vTxt")
      case _ => scala.None
    }
    val residual = cs.filterNot(served.contains)
    val residualExpr = residual.reduceOption((a, b) => Binary("&&", a, b))
    val access =
      (if (idx.fields.length == 1) "= " + eqPairs(matched.head)._1
       else "[" + matched.map(f => eqPairs(f)._1).mkString(", ") + "]") +
        rangeTxt.getOrElse("")
    Some((idx.name, access, residualExpr, idx.fields, matched.length))
  }

  /** Index fields of the single-index access that would serve this WHERE —
    * used by the interpreter to emulate index-scan RESULT ORDER (rows come
    * back in key order, not table order; composite_index_range assert 13).
    * None for union/containment accesses or fanned (`*`) paths. */
  def accessIndexFields(in: Interp, table: String, where: Expr,
      hints: Option[Seq[String]]): Option[Seq[String]] =
    indexAccess(in, table, where, hints).map(_._4)
      .filter(fs => fs.forall(f => !f.contains("[") && !f.contains("*")))

  /** Visiting order of a legacy multi-index union access: the single-field
    * leaf scans in plan order — point/union probes before ranges, discovery
    * order within each class — as (index field, leaf predicate). Rows stream
    * per scan in index key order, deduped first-wins, so an index-served OR
    * observably reorders output (select_with_in_operator_multiple_indexes
    * rows asserts). Some only for the covering trees the multi-leaf EXPLAIN
    * branch serves: every OR arm indexable, >1 distinct index, no MATCHES. */
  def unionVisitScans(in: Interp, table: String, where: Expr,
      hints: Option[Seq[String]]): Option[Seq[(String, Expr)]] = {
    if (hints.contains(Nil)) return scala.None
    def hasMatches(e: Expr): Boolean = e match {
      case Binary(op, _, _) if op.startsWith("MATCHES") || op.startsWith("KNN:") => true
      case Binary(_, l, r) => hasMatches(l) || hasMatches(r)
      case Prefix(_, i) => hasMatches(i)
      case _ => false
    }
    if (hasMatches(where)) return scala.None
    def idxOn(path: String): Option[String] = in.indexDefs.collectFirst {
      case ((t, _), d) if t == table && d.fields == Seq(path) &&
          hints.forall(_.contains(d.name)) &&
          !d.tail.toUpperCase.startsWith("FULLTEXT") &&
          !d.tail.toUpperCase.startsWith("SEARCH") => d.name
    }
    // (index name, field, leaf predicate, isRange)
    def leaf(c: Expr): Option[(String, String, Expr, Boolean)] = c match {
      case Binary("INSIDE" | "IN", Idiom(ps), ArrLit(items))
          if fieldPathName(ps).isDefined && items.length <= 32 &&
            items.forall(i => !touchesDb(i)) =>
        val p = fieldPathName(ps).get
        idxOn(p).map((_, p, c, false))
      case Binary("=" | "==", Idiom(ps), rhs)
          if fieldPathName(ps).isDefined && !touchesDb(rhs) =>
        val p = fieldPathName(ps).get
        idxOn(p).map((_, p, c, false))
      case Binary(">" | ">=" | "<" | "<=", Idiom(ps), rhs)
          if fieldPathName(ps).isDefined && !touchesDb(rhs) =>
        val p = fieldPathName(ps).get
        idxOn(p).map((_, p, c, true))
      case _ => scala.None
    }
    def walk(e: Expr): Option[Seq[(String, String, Expr, Boolean)]] = {
      val ds = disjunctList(e)
      if (ds.length > 1) {
        val each = ds.map(walk)
        if (each.forall(_.isDefined)) Some(each.flatten.flatten) else scala.None
      } else {
        val cs = conjunctList(e)
        if (cs.length > 1) {
          val each = cs.map(walk)
          if (each.exists(_.isDefined)) Some(each.flatten.flatten) else scala.None
        } else leaf(e).map(Seq(_))
      }
    }
    val cs = conjunctList(where)
    val trigger = disjunctList(where).length > 1 ||
      (cs.length > 1 && cs.exists(c => disjunctList(c).length > 1))
    if (!trigger) return scala.None
    walk(where).flatMap { ls =>
      val ordered = ls.filterNot(_._4) ++ ls.filter(_._4)
      if (ordered.map(_._1).distinct.length > 1)
        Some(ordered.map(t => (t._2, t._3)))
      else scala.None
    }
  }

  /** CONTAINSALL/CONTAINSANY over an indexed array path → per-element
    * index probes merged by UnionIndexScan (scan/union_index.rs). */
  private def unionIndexAccess(in: Interp, table: String, where: Expr,
      hints: Option[Seq[String]],
      newExec: Boolean = false): Option[(String, Seq[String], Expr)] = {
    if (hints.contains(Nil)) return scala.None
    def literalish(i: Expr): Boolean = !touchesDb(i) || i.isInstanceOf[RidLit]
    val cs = conjunctList(where)
    cs.collectFirst {
      // containment over a whole-array index: the LEGACY planner fans the
      // probe per element; the new executor requires a per-element (`*`)
      // index path (select_std_index_with_record_id vs its _new_executor)
      case c @ Binary("CONTAINSALL" | "CONTAINSANY", Idiom(ps), ArrLit(items))
          if fieldPathName(ps).isDefined && items.forall(literalish) &&
            (!newExec || ps.contains(PAll)) =>
        (fieldPathName(ps).get, items, c)
      // reversed containment: `[x] ANYINSIDE field` ≡ `field CONTAINSANY [x]`
      case c @ Binary("ANYINSIDE" | "ALLINSIDE", ArrLit(items), Idiom(ps))
          if fieldPathName(ps).isDefined && items.forall(literalish) &&
            (!newExec || ps.contains(PAll)) =>
        (fieldPathName(ps).get, items, c)
      // value IN [list] over an indexed field: one index probe per element
      // merged by a union; lists past 32 elements fall back to a scan
      // (planner in_operator_index, in_operator_large_array_fallback)
      case c @ Binary("INSIDE" | "IN", Idiom(ps), ArrLit(items))
          if fieldPathName(ps).isDefined && items.length <= 32 &&
            items.forall(i => !touchesDb(i)) =>
        (fieldPathName(ps).get, items, c)
    }.flatMap { case (path, items, c) =>
      in.indexDefs.collectFirst {
        case ((t, _), d) if t == table && d.fields == Seq(path) &&
            hints.forall(_.contains(d.name)) &&
            !d.tail.toUpperCase.startsWith("FULLTEXT") =>
          (d.name, items.map(i => "= " + exprSql(i)), c)
      }.orElse(in.indexDefs.collectFirst {
        // composite index whose FIRST field is the IN column: per-element
        // tuple-prefix probes, access rendered bracketed (in_operator_index)
        case ((t, _), d) if t == table && d.fields.length > 1 &&
            d.fields.headOption.contains(path) &&
            hints.forall(_.contains(d.name)) &&
            !d.tail.toUpperCase.startsWith("FULLTEXT") =>
          (d.name, items.map(i => "[" + exprSql(i) + "]"), c)
      })
    }
  }

  /** `field @@ 'query'` conjunct served by a FULLTEXT index. */
  private def fulltextAccess(in: Interp, table: String, where: Expr): Option[(String, String, Option[Expr])] =
    fulltextAccessOp(in, table, where).map { case (n, q, r, _) => (n, q, r) }

  /** Like fulltextAccess but also yields the written operator (`@@`/`@1@`). */
  private def fulltextAccessOp(in: Interp, table: String,
      where: Expr): Option[(String, String, Option[Expr], String)] = {
    val cs = conjunctList(where)
    val hit = cs.collectFirst {
      case c @ Binary(op, Idiom(Seq(PField(f))), Lit(VStr(q))) if op.startsWith("MATCHES") =>
        val ref = op.split(':').lift(1).getOrElse("")
        (f, q, c, if (ref.nonEmpty) s"@$ref@" else "@@")
    }
    hit.flatMap { case (f, q, c, opTxt) =>
      in.indexDefs.collectFirst {
        case ((t, _), d) if t == table && d.fields.contains(f) &&
            (d.tail.toUpperCase.startsWith("FULLTEXT") || d.tail.toUpperCase.startsWith("SEARCH")) =>
          val residual = cs.filterNot(_ == c).reduceOption((a, b) => Binary("&&", a, b))
          (d.name, q, residual, opTxt)
      }
    }
  }

  /** Legacy (compute-only) trailing-EXPLAIN output: the dbs/ executor's
    * Iterate/Collector operation array. */
  /** Mutation EXPLAIN (UPDATE/UPSERT/DELETE … EXPLAIN): the same legacy
    * plan array the old SELECT executor prints — Iterate Record for rid
    * targets, Iterate Table/Index otherwise (sql/statements/update.rs
    * explain passthrough). */
  def legacyMut(in: Interp, what: Seq[Expr], where: Option[Expr], env: Env,
      defer: Boolean = false): V = {
    val sel = SelectStmt(
      fields = Seq(Field(Idiom(Seq(PAll)), scala.None)), value = false,
      omit = Nil, only = false, what = what, where = where,
      split = Nil, groupBy = scala.None, order = Nil, orderRand = false,
      limit = scala.None, start = scala.None, fetch = Nil,
      version = scala.None, timeout = scala.None, explain = false)
    legacy(in, sel, env, defer, mutation = true)
  }

  /** Are the SELECT fields only `count()` (no args, not `*`)? */
  private def countAllOnly(s: SelectStmt): Boolean =
    !s.value && s.fields.nonEmpty && s.fields.forall(f =>
      !f.isAll && (f.expr match { case FnCall("count", Nil) => true; case _ => false }))

  /** RecordStrategy derivation (idx/planner/mod.rs:137 check_record_strategy):
    * mutations, uncovered WHERE, GROUP BY fields, ORDER fields, non-count
    * projections → KeysAndValues; count()-only + GROUP ALL → Count;
    * otherwise KeysOnly. */
  private def recordStrategy(s: SelectStmt, fullyIndexed: Boolean,
      mutation: Boolean): String = {
    if (mutation) "KeysAndValues"
    else if (s.where.isDefined && !fullyIndexed) "KeysAndValues"
    else if (s.groupBy.exists(_.nonEmpty)) "KeysAndValues"
    else if (s.order.nonEmpty) "KeysAndValues"
    else if (!countAllOnly(s)) "KeysAndValues"
    else if (s.groupBy.contains(Nil)) "Count"
    else "KeysOnly"
  }

  private def iterSuffix(rs: String): String = rs match {
    case "Count"    => " Count"
    case "KeysOnly" => " Keys"
    case _          => ""
  }

  /** Legacy `Group` collector detail (dbs/group.rs:68 GroupCollector::explain)
    * rendered from the aggregation analysis. */
  private def groupCollectorDetail(s: SelectStmt): V = {
    val an = AggAnalysis.analyze(s.fields, s.value, s.groupBy.getOrElse(Nil))
    def obj(pairs: Seq[(String, String)]): V =
      VObj(TreeMap(pairs.map { case (k, v) => k -> (VStr(v): V) }: _*))
    V.obj(
      "type" -> VStr("Group"),
      "Aggregate expressions" -> obj(an.aggregateArgs.zipWithIndex.map {
        case (e, i) => s"expr$i" -> exprSql(e) }),
      "Aggregations" -> obj(an.aggregations.zipWithIndex.map {
        case (a, i) => s"_a$i" -> a.label }),
      "Group expressions" -> obj(an.groupExprs.zipWithIndex.map {
        case (e, i) => s"_g$i" -> exprSql(e) }),
      "Select expression" -> (an.fields match {
        case Left(e)   => VStr(exprSql(e))
        case Right(fs) => obj(fs.map { case (n, e) => n -> exprSql(e) })
      }))
  }

  def legacy(in: Interp, s: SelectStmt, env: Env, defer: Boolean = false,
      full: Boolean = false, mutation: Boolean = false): V = {
    val table: Option[String] = s.what match {
      case Seq(Idiom(Seq(PField(n)))) => Some(n)
      case Seq(TableRef(n))           => Some(n)
      case _                          => scala.None
    }
    val entries = scala.collection.mutable.ArrayBuffer[V]()

    def collectorEntry(): V =
      if (s.groupBy.isDefined)
        V.obj("detail" -> groupCollectorDetail(s), "operation" -> VStr("Collector"))
      else {
        val limitN = s.limit.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None })
        val startN = s.start.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None }).getOrElse(0L)
        if (s.order.nonEmpty && limitN.isDefined)
          // ordered + limited results collect into a bounded heap
          // (dbs/store.rs MemoryOrderedLimit — limit covers START + LIMIT)
          V.obj(
            "detail" -> V.obj(
              "limit" -> VInt(limitN.get + startN),
              "type" -> VStr("MemoryOrderedLimit")),
            "operation" -> VStr("Collector"))
        else V.obj(
          "detail" -> V.obj("type" -> VStr(if (s.order.nonEmpty) "MemoryOrdered" else "Memory")),
          "operation" -> VStr("Collector"))
      }

    // EXPLAIN FULL appendix: RecordStrategy, StartLimitStrategy (when the
    // iterator can skip/cancel at the storage level), Fetch with the final
    // result count (dbs/iterator.rs:735,801,1165).
    def fullRows(rs: String, fullyIndexed: Boolean, orderCovered: Boolean = false): Unit = if (full) {
      entries += V.obj(
        "detail" -> V.obj("type" -> VStr(rs)),
        "operation" -> VStr("RecordStrategy"))
      // a MemoryOrderedLimit collector absorbs START itself (its bound is
      // START + LIMIT) — no storage-level skip (select_compound_order_limit)
      val orderedLimit = s.order.nonEmpty && s.limit.isDefined && !orderCovered
      val canSkip = s.groupBy.isEmpty && (s.where.isEmpty || fullyIndexed) && !orderedLimit
      val canCancel = s.groupBy.isEmpty && (s.order.isEmpty || orderCovered)
      val startN = s.start.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None }).getOrElse(0L)
      val limitN = s.limit.flatMap(e => Eval.evalConst(e) match { case VInt(i) => Some(i); case _ => scala.None })
      var slAttrs = Seq.empty[(String, V)]
      if (canSkip && startN > 0) slAttrs :+= ("SkipStart" -> (VInt(startN): V))
      if (canCancel && limitN.isDefined) slAttrs :+= ("CancelOnLimit" -> (VInt(limitN.get): V))
      if (slAttrs.nonEmpty)
        entries += V.obj(
          "detail" -> VObj(TreeMap(slAttrs: _*)),
          "operation" -> VStr("StartLimitStrategy"))
      val count: Long =
        // a MemoryOrderedLimit collector never reports fetched rows
        // (dbs/iterator.rs:1165 — the bounded heap consumes them)
        if (limitN.isDefined && s.order.nonEmpty && s.groupBy.isEmpty) 0L
        else try in.execStatement(s, env) match {
          case VArr(items) => items.length.toLong
          case VNone       => 0L
          case _           => 1L
        } catch { case _: SqlError => 0L }
      entries += V.obj(
        "detail" -> V.obj("count" -> VInt(count)),
        "operation" -> VStr("Fetch"))
    }

    // record-id targets: one Iterate Record entry per rid (plain keys only)
    val rids = s.what.collect { case r @ RidLit(_, key) if !key.isInstanceOf[RangeLit] => r }
    if (rids.nonEmpty && rids.length == s.what.length) {
      rids.foreach { r =>
        val ridV = try Eval.eval(r, env) match {
          case v: VRid => v: V
          case other   => other
        } catch { case _: SqlError => VNone }
        entries += V.obj(
          "detail" -> V.obj("record" -> ridV),
          "operation" -> VStr(if (defer) "Iterate Defer" else "Iterate Record"))
      }
      entries += collectorEntry()
      fullRows(recordStrategy(s, fullyIndexed = false, mutation), fullyIndexed = false)
      return VArr(entries.toVector)
    }
    // record-id RANGE targets: Iterate Range with the bounds as a range value
    val ranges = s.what.collect { case r @ RidLit(_, _: RangeLit) => r }
    if (ranges.nonEmpty && ranges.length == s.what.length) {
      val rs = recordStrategy(s, fullyIndexed = false, mutation)
      val idOrderDesc = s.order match {
        case Seq(k) if k.expr == Idiom(Seq(PField("id"))) => Some(k.desc)
        case _ => scala.None
      }
      ranges.foreach { case RidLit(tb, RangeLit(lo, hi)) =>
        def bound(b: Option[(Expr, Boolean)]): Option[(V, Boolean)] =
          b.map { case (e, incl) =>
            ((try Eval.eval(e, env) catch { case _: SqlError => VNone }), incl)
          }
        entries += V.obj(
          "detail" -> V.obj(
            "direction" -> VStr(if (idOrderDesc.contains(true)) "backward" else "forward"),
            "range" -> VRng(bound(lo), bound(hi)),
            "table" -> VStr(tb)),
          "operation" -> VStr("Iterate Range" + iterSuffix(rs)))
      case _ => ()
      }
      entries += collectorEntry()
      fullRows(rs, fullyIndexed = false)
      return VArr(entries.toVector)
    }

    // WITH NOINDEX: the planner records a Fallback reason and scans the table
    // (idx/planner/plan.rs:74)
    val noIndexHint = s.withIndex.contains(Nil) && (s.where.isDefined || s.order.nonEmpty)

    // equality prefix + IN on the trailing field of a composite index:
    // a union over composite-key tuples (planner in_operator_index 21-22)
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      val cs = conjunctList(s.where.get)
      val inC = cs.collectFirst {
        case c @ Binary("INSIDE" | "IN", Idiom(Seq(PField(f))), ArrLit(items))
            if items.forall(i => !touchesDb(i)) => (f, items, c)
      }
      inC.foreach { case (f, items, _) =>
        val eqs: Map[String, Expr] = cs.collect {
          case Binary("=" | "==", Idiom(Seq(PField(g))), rhs) if !touchesDb(rhs) => g -> rhs
        }.toMap
        in.indexDefs.collectFirst {
          case ((t, _), d) if t == table.get && d.fields.length >= 2 &&
              d.fields.last == f && d.fields.init.forall(eqs.contains) &&
              cs.length == d.fields.length &&
              s.withIndex.forall(_.contains(d.name)) &&
              !d.tail.toUpperCase.startsWith("FULLTEXT") => d
        }.foreach { d =>
          def ev(e: Expr): V = try Eval.eval(e, env) catch { case _: SqlError => VNone }
          val prefix = d.fields.init.map(g => ev(eqs(g)))
          val tuples: V = VArr(items.map(i => VArr((prefix :+ ev(i)).toVector): V).toVector)
          val rs = recordStrategy(s, fullyIndexed = true, mutation)
          entries += V.obj(
            "detail" -> V.obj(
              "plan" -> V.obj(
                "index" -> VStr(d.name),
                "operator" -> VStr("union"),
                "value" -> tuples),
              "table" -> VStr(table.get)),
            "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
          entries += collectorEntry()
          fullRows(rs, fullyIndexed = true)
          return VArr(entries.toVector)
        }
      }
    }

    val union = if (noIndexHint) scala.None else (for {
      t <- table
      w <- s.where
      r <- unionIndexAccess(in, t, w, s.withIndex)
    } yield r)
    union.foreach { case (idxName, _, c) =>
      def evalV(i: Expr): V = try Eval.eval(i, env) catch { case _: SqlError => VNone }
      val vals: V = c match {
        case Binary(_, _, ArrLit(items)) => VArr(items.map(evalV).toVector)
        // element-side probes (`a:2 IN links`, `[a:2] ANYINSIDE links`):
        // the probed values sit on the LEFT of the operator
        case Binary(_, ArrLit(items), _) => VArr(items.map(evalV).toVector)
        case Binary("INSIDE" | "IN", lhs, _) => VArr(Vector(evalV(lhs)))
        case _ => VNone
      }
      val rs = recordStrategy(s, fullyIndexed = true, mutation)
      entries += V.obj(
        "detail" -> V.obj(
          "plan" -> V.obj(
            "index" -> VStr(idxName),
            "operator" -> VStr("union"),
            "value" -> vals),
          "table" -> VStr(table.getOrElse(""))),
        "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
      entries += collectorEntry()
      fullRows(rs, fullyIndexed = true)
      return VArr(entries.toVector)
    }
    // top-level OR where EVERY disjunct resolves to an index access: one
    // Iterate Index per disjunct, result union (idx/planner multi-index)
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      val ds = disjunctList(s.where.get)
      if (ds.length > 1) {
        val accesses: Seq[Option[(String, String, V)]] = ds.map { d =>
          indexAccess(in, table.get, d, s.withIndex) match {
            case Some((idxName, _, residual, idxFields, eqLen)) if residual.isEmpty && eqLen > 0 =>
              val valueOf: Map[String, V] = conjunctList(d).collect {
                case Binary("=" | "==", Idiom(Seq(PField(f))), rhs) if !touchesDb(rhs) =>
                  f -> (try Eval.eval(rhs, env) catch { case _: SqlError => VNone })
              }.toMap
              val matched = idxFields.take(eqLen).flatMap(valueOf.get)
              val v: V = if (matched.length == 1) matched.head else VArr(matched.toVector)
              Some((idxName, "=", v))
            case _ =>
              fulltextAccess(in, table.get, d) match {
                case Some((idxName, q, scala.None)) => Some((idxName, "@@", VStr(q)))
                case _ => scala.None
              }
          }
        }
        if (accesses.forall(_.isDefined)) {
          val rs = recordStrategy(s, fullyIndexed = true, mutation)
          accesses.flatten.foreach { case (idxName, op, v) =>
            entries += V.obj(
              "detail" -> V.obj(
                "plan" -> V.obj(
                  "index" -> VStr(idxName),
                  "operator" -> VStr(op),
                  "value" -> v),
                "table" -> VStr(table.getOrElse(""))),
              "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
          }
          entries += collectorEntry()
          fullRows(rs, fullyIndexed = true)
          return VArr(entries.toVector)
        }
      }
    }
    // record-link join: WHERE link.field = v with an index over the link
    // field and an index over the target table's field (idx/planner joins)
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      conjunctList(s.where.get) match {
        case Seq(Binary(op, Idiom(Seq(PField(link), PField(fld))), rhs))
            if !touchesDb(rhs) &&
              (op == "=" || op == "==" || op == "INSIDE" || op.startsWith("MATCHES")) =>
          val t = table.get
          val wantFts = op.startsWith("MATCHES")
          def isFts(tail: String): Boolean = {
            val u = tail.toUpperCase
            u.startsWith("FULLTEXT") || u.startsWith("SEARCH")
          }
          val linkIdx = in.indexDefs.collectFirst {
            case ((tt, _), d) if tt == t && d.fields == Seq(link) &&
                s.withIndex.forall(_.contains(d.name)) => d.name
          }
          val targetTb = in.fieldDefs2.get((t, link)).flatMap(_.kindRaw).flatMap { kr =>
            val m = "record<\\s*([A-Za-z0-9_]+)".r.findFirstMatchIn(kr)
            m.map(_.group(1))
          }
          val tIdx = targetTb.flatMap(tt => in.indexDefs.collectFirst {
            case ((t2, _), d) if t2 == tt && d.fields == Seq(fld) &&
                isFts(d.tail) == wantFts => d.name
          })
          (linkIdx, tIdx) match {
            case (Some(li), Some(ti)) =>
              val rs = recordStrategy(s, fullyIndexed = true, mutation)
              val v = try Eval.eval(rhs, env) catch { case _: SqlError => VNone }
              // join operator mirrors the access kind: equality `=`,
              // IN-list `union`, full-text `@@` (idx/planner joins)
              val joinOp = if (wantFts) "@@" else if (op == "INSIDE") "union" else "="
              entries += V.obj(
                "detail" -> V.obj(
                  "plan" -> V.obj(
                    "index" -> VStr(li),
                    "joins" -> VArr(Vector(V.obj(
                      "index" -> VStr(ti), "operator" -> VStr(joinOp), "value" -> v))),
                    "operator" -> VStr("join")),
                  "table" -> VStr(t)),
                "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
              entries += collectorEntry()
              fullRows(rs, fullyIndexed = true)
              return VArr(entries.toVector)
            case _ => ()
          }
        case _ => ()
      }
    }
    // every AND conjunct individually index-served: one Iterate Index entry
    // per conjunct, intersected — the legacy planner only builds this
    // intersection when a MATCHES conjunct forces a specialized index into
    // the plan; plain equality ANDs pick ONE index and filter the rest
    // (multi_index_or_and asserts 11 vs 13)
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      val cs = conjunctList(s.where.get)
      if ((cs.length > 1 && cs.exists {
          case Binary(op, _, _) if op.startsWith("MATCHES") => true
          // an OR conjunct needs a UNION of index probes — no single index
          // can serve the whole AND chain (select_with_in_operator assert 1)
          case c => disjunctList(c).length > 1
          // OR-root trees the per-disjunct branch above could not serve
          // (AND-disjuncts, range disjuncts) union EVERY indexable leaf in
          // the tree (select_with_in_operator_multiple_indexes 5/7)
        }) || disjunctList(s.where.get).length > 1) {
        def entryFor(c: Expr): Option[V] = c match {
          case Binary("INSIDE" | "IN", Idiom(ps), ArrLit(items))
              if fieldPathName(ps).isDefined && items.forall(i => !touchesDb(i)) =>
            val path = fieldPathName(ps).get
            in.indexDefs.collectFirst {
              case ((t, _), d) if t == table.get && d.fields == Seq(path) &&
                  s.withIndex.forall(_.contains(d.name)) &&
                  !d.tail.toUpperCase.startsWith("FULLTEXT") =>
                V.obj(
                  "detail" -> V.obj(
                    "plan" -> V.obj(
                      "index" -> VStr(d.name),
                      "operator" -> VStr("union"),
                      "value" -> VArr(items.map(i =>
                        try Eval.eval(i, env) catch { case _: SqlError => VNone }).toVector)),
                    "table" -> VStr(table.get)),
                  "operation" -> VStr("Iterate Index")): V
            }
          case Binary("=" | "==", Idiom(ps), rhs)
              if fieldPathName(ps).isDefined && !touchesDb(rhs) =>
            val path = fieldPathName(ps).get
            in.indexDefs.collectFirst {
              case ((t, _), d) if t == table.get && d.fields == Seq(path) &&
                  s.withIndex.forall(_.contains(d.name)) &&
                  !d.tail.toUpperCase.startsWith("FULLTEXT") =>
                V.obj(
                  "detail" -> V.obj(
                    "plan" -> V.obj(
                      "index" -> VStr(d.name),
                      "operator" -> VStr("="),
                      "value" -> (try Eval.eval(rhs, env) catch { case _: SqlError => VNone })),
                    "table" -> VStr(table.get)),
                  "operation" -> VStr("Iterate Index")): V
            }
          case Binary(op @ (">" | ">=" | "<" | "<="), Idiom(ps), rhs)
              if fieldPathName(ps).isDefined && !touchesDb(rhs) =>
            val path = fieldPathName(ps).get
            in.indexDefs.collectFirst {
              case ((t, _), d) if t == table.get && d.fields == Seq(path) &&
                  s.withIndex.forall(_.contains(d.name)) &&
                  !d.tail.toUpperCase.startsWith("FULLTEXT") =>
                val v: V = try Eval.eval(rhs, env) catch { case _: SqlError => VNone }
                val from: (V, Boolean) = if (op.startsWith(">")) (v, op == ">=") else (VNone, false)
                val to: (V, Boolean) = if (op.startsWith("<")) (v, op == "<=") else (VNone, false)
                V.obj(
                  "detail" -> V.obj(
                    "plan" -> V.obj(
                      "direction" -> VStr("forward"),
                      "from" -> V.obj("inclusive" -> VBool(from._2), "value" -> from._1),
                      "index" -> VStr(d.name),
                      "to" -> V.obj("inclusive" -> VBool(to._2), "value" -> to._1)),
                    "table" -> VStr(table.get)),
                  "operation" -> VStr("Iterate Index")): V
            }
          case _ => scala.None
        }
        // covering walk: OR needs EVERY branch served (else the union misses
        // rows); AND needs at least one (the rest filter residually), but
        // emits scans for every indexable conjunct it does have
        def entriesFor(c: Expr): Option[Seq[V]] = {
          val ds = disjunctList(c)
          if (ds.length > 1) {
            val each = ds.map(entriesFor)
            if (each.forall(_.isDefined)) Some(each.flatten.flatten) else scala.None
          } else {
            val cs2 = conjunctList(c)
            if (cs2.length > 1) {
              val each = cs2.map(entriesFor)
              if (each.exists(_.isDefined)) Some(each.flatten.flatten) else scala.None
            } else entryFor(c).map(Seq(_))
          }
        }
        val perConjunct = cs.map(entriesFor)
        // only multi-index AND when >1 distinct indexes involved and ALL served
        if (perConjunct.forall(_.isDefined)) {
          // the planner schedules point/union probes before range scans
          val rendered0 = perConjunct.flatten.flatten
          def isRange(v: V): Boolean = v match {
            case VObj(fs) => fs.get("detail") match {
              case Some(VObj(dfs)) => dfs.get("plan") match {
                case Some(VObj(pfs)) => pfs.contains("from")
                case _ => false
              }
              case _ => false
            }
            case _ => false
          }
          val rendered = rendered0.filterNot(isRange) ++ rendered0.filter(isRange)
          val idxNames = rendered.flatMap {
            case VObj(fs) => fs.get("detail") match {
              case Some(VObj(dfs)) => dfs.get("plan") match {
                case Some(VObj(pfs)) => pfs.get("index").collect { case VStr(n) => n }
                case _ => scala.None
              }
              case _ => scala.None
            }
            case _ => scala.None
          }
          if (idxNames.distinct.length > 1) {
            rendered.foreach(entries += _)
            entries += collectorEntry()
            fullRows(recordStrategy(s, fullyIndexed = true, mutation), fullyIndexed = true)
            return VArr(entries.toVector)
          }
        }
      }
    }
    // full-text access: `field @ref@ 'query'` over a FULLTEXT/SEARCH index
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      fulltextAccessOp(in, table.get, s.where.get) match {
        case Some((idxName, q, residual, opTxt)) =>
          val rs = recordStrategy(s, residual.isEmpty, mutation)
          entries += V.obj(
            "detail" -> V.obj(
              "plan" -> V.obj(
                "index" -> VStr(idxName),
                "operator" -> VStr(opTxt),
                "value" -> VStr(q)),
              "table" -> VStr(table.getOrElse(""))),
            "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
          entries += collectorEntry()
          fullRows(rs, residual.isEmpty)
          return VArr(entries.toVector)
        case scala.None => ()
      }
    }
    // KNN access: `field <|k,ef|> $vec` over an HNSW/MTREE index
    if (!noIndexHint && table.isDefined && s.where.isDefined) {
      conjunctList(s.where.get).collectFirst {
        case Binary(op, Idiom(Seq(PField(f))), rhs) if op.startsWith("KNN:") => (op, f, rhs)
      }.foreach { case (op, f, rhs) =>
        in.indexDefs.collectFirst {
          case ((t, _), d) if t == table.get && d.fields.contains(f) &&
              (d.tail.toUpperCase.startsWith("HNSW") || d.tail.toUpperCase.startsWith("MTREE")) => d
        }.foreach { idxDef =>
          val idxName = idxDef.name
          val parts = op.split(':')
          val k = parts.lift(1).getOrElse("")
          val arg = parts.lift(2).filter(_.nonEmpty)
          // a metric/empty arg means the planner rewrote a brute-force KNN
          // onto the vector index: the plan renders the index's EFC as the
          // search width (idx/planner: Knn → Ann with ef = efc, default 150)
          val ef = arg.filter(_.forall(_.isDigit)).orElse(Some(
            "(?i)EFC\\s+(\\d+)".r.findFirstMatchIn(idxDef.tail)
              .map(_.group(1)).getOrElse("150")))
          val opTxt = "<|" + k + ef.map("," + _).getOrElse("") + "|>"
          val v = try Eval.eval(rhs, env) catch { case _: SqlError => VNone }
          val rs = recordStrategy(s, fullyIndexed = true, mutation)
          entries += V.obj(
            "detail" -> V.obj(
              "plan" -> V.obj(
                "index" -> VStr(idxName),
                "operator" -> VStr(opTxt),
                "value" -> v),
              "table" -> VStr(table.get)),
            "operation" -> VStr("Iterate Index" + iterSuffix(rs)))
          entries += collectorEntry()
          fullRows(rs, fullyIndexed = true)
          return VArr(entries.toVector)
        }
      }
    }
    // COUNT-index: `SELECT count() FROM t GROUP ALL` served by a COUNT index
    if (!noIndexHint && table.isDefined && s.where.isEmpty && countAllOnly(s)) {
      in.indexDefs.collectFirst {
        case ((t, _), d) if t == table.get && d.tail.toUpperCase.startsWith("COUNT") &&
            !d.prepareRemove && s.withIndex.forall(_.contains(d.name)) => d.name
      }.foreach { idxName =>
        entries += V.obj(
          "detail" -> V.obj(
            "plan" -> V.obj("index" -> VStr(idxName), "operator" -> VStr("Count")),
            "table" -> VStr(table.get)),
          "operation" -> VStr("Iterate Index Count"))
        entries += collectorEntry()
        fullRows(recordStrategy(s, fullyIndexed = true, mutation), fullyIndexed = true)
        return VArr(entries.toVector)
      }
    }
    val idx = if (noIndexHint) scala.None else (for {
      t <- table
      w <- s.where
      r <- indexAccess(in, t, w, s.withIndex)
    } yield r)
    var strategy = "KeysAndValues"
    var fullyIndexed = false
    var orderCovered = false
    idx match {
      case Some((idxName, _, residual, idxFields, 0)) =>
        // range-only index access: from/to bound detail (idx/planner explain)
        fullyIndexed = residual.isEmpty
        strategy = recordStrategy(s, fullyIndexed, mutation)
        val cs = conjunctList(s.where.get)
        var fromV: (V, Boolean) = (VNone, false)
        var toV: (V, Boolean) = (VNone, false)
        cs.foreach {
          case Binary(op @ (">" | ">="), Idiom(Seq(PField(f))), rhs) if f == idxFields.head =>
            fromV = ((try Eval.eval(rhs, env) catch { case _: SqlError => VNone }), op == ">=")
          case Binary(op @ ("<" | "<="), Idiom(Seq(PField(f))), rhs) if f == idxFields.head =>
            toV = ((try Eval.eval(rhs, env) catch { case _: SqlError => VNone }), op == "<=")
          case _ => ()
        }
        // a single ORDER BY on the range field rides the index order
        val ordered = s.order match {
          case Seq(k) => k.expr == Idiom(Seq(PField(idxFields.head)))
          case _ => false
        }
        orderCovered = ordered
        val direction = if (ordered && s.order.head.desc) "backward" else "forward"
        entries += V.obj(
          "detail" -> V.obj(
            "plan" -> V.obj(
              "direction" -> VStr(direction),
              "from" -> V.obj("inclusive" -> VBool(fromV._2), "value" -> fromV._1),
              "index" -> VStr(idxName),
              "to" -> V.obj("inclusive" -> VBool(toV._2), "value" -> toV._1)),
            "table" -> VStr(table.getOrElse(""))),
          "operation" -> VStr("Iterate Index" + iterSuffix(strategy)))
      case Some((idxName, _, residual, idxFields, eqLen)) =>
        fullyIndexed = residual.isEmpty
        strategy = recordStrategy(s, fullyIndexed, mutation)
        // evaluate the matched equality values for the plan detail
        val cs = conjunctList(s.where.get)
        val valueOf: Map[String, V] = cs.collect {
          case Binary("=" | "==", Idiom(ps), rhs)
              if !touchesDb(rhs) && fieldPathName(ps).isDefined =>
            fieldPathName(ps).get -> (try Eval.eval(rhs, env) catch { case _: SqlError => VNone })
          case Binary("CONTAINS", Idiom(ps), rhs) if fieldPathName(ps).isDefined =>
            // a plain-field CONTAINS probes the `field[*]` per-element index
            val p = fieldPathName(ps).get
            (if (ps.contains(PAll)) p else p + "[*]") ->
              (try Eval.eval(rhs, env) catch { case _: SqlError => VNone })
          case Binary("INSIDE" | "IN", lhs, Idiom(ps))
              if fieldPathName(ps).isDefined && !touchesDb(lhs) =>
            val p = fieldPathName(ps).get
            (if (ps.contains(PAll)) p else p + "[*]") ->
              (try Eval.eval(lhs, env) catch { case _: SqlError => VNone })
        }.toMap
        val matched = idxFields.take(eqLen).flatMap(valueOf.get)
        // equality prefix + range on the next field: prefix/ranges detail
        val nextRanges: Seq[(String, V)] =
          if (eqLen < idxFields.length)
            cs.collect {
              case Binary(op @ (">" | ">=" | "<" | "<="), Idiom(ps), rhs)
                  if fieldPathName(ps).contains(idxFields(eqLen)) && !touchesDb(rhs) =>
                (op, (try Eval.eval(rhs, env) catch { case _: SqlError => VNone }): V)
            }
          else Nil
        if (nextRanges.nonEmpty) {
          entries += V.obj(
            "detail" -> V.obj(
              "plan" -> V.obj(
                "index" -> VStr(idxName),
                "prefix" -> VArr(matched.toVector),
                "ranges" -> VArr(nextRanges.map { case (op, v) =>
                  V.obj("operator" -> VStr(op), "value" -> v): V
                }.toVector)),
              "table" -> VStr(table.getOrElse(""))),
            "operation" -> VStr("Iterate Index" + iterSuffix(strategy)))
        } else {
          val valueV: V =
            if (matched.length == 1) matched.headOption.getOrElse(VNone)
            else VArr(matched.toVector)
          entries += V.obj(
            "detail" -> V.obj(
              "plan" -> V.obj(
                "index" -> VStr(idxName),
                "operator" -> VStr("="),
                "value" -> valueV),
              "table" -> VStr(table.getOrElse(""))),
            "operation" -> VStr("Iterate Index" + iterSuffix(strategy)))
        }
      case scala.None =>
        strategy = recordStrategy(s, fullyIndexed = false, mutation)
        val orderIdx =
          if (noIndexHint || s.where.isDefined || defer) scala.None
          else table.flatMap(t => orderIndexInfo(in, t, s, s.withIndex))
        (orderIdx, table) match {
          case (Some((idxName, desc)), Some(t)) =>
            orderCovered = true
            entries += V.obj(
              "detail" -> V.obj(
                "plan" -> V.obj(
                  "index" -> VStr(idxName),
                  "operator" -> VStr(if (desc) "ReverseOrder" else "Order")),
                "table" -> VStr(t)),
              "operation" -> VStr("Iterate Index" + iterSuffix(strategy)))
          case _ =>
            // one Iterate entry per table-name source (multi-FROM unions:
            // select/explain_multi_table)
            val tables = s.what.collect {
              case Idiom(Seq(PField(n))) => n
              case TableRef(n)           => n
            }
            tables.foreach { t =>
              if (defer)
                entries += V.obj(
                  "detail" -> V.obj("table" -> VStr(t)),
                  "operation" -> VStr("Iterate Yield"))
              else
                entries += V.obj(
                  "detail" -> V.obj("direction" -> VStr("forward"), "table" -> VStr(t)),
                  "operation" -> VStr("Iterate Table" + iterSuffix(strategy)))
            }
        }
    }
    if (noIndexHint)
      entries += V.obj(
        "detail" -> V.obj("reason" -> VStr("WITH NOINDEX")),
        "operation" -> VStr("Fallback"))
    else s.where.foreach { w =>
      // a condition the index analyzer cannot express at all (unary not on
      // an idiom) records its Fallback reason (planner noindex_unary_operator)
      conjunctList(w).collectFirst {
        case Prefix("!", inner @ Idiom(_)) =>
          entries += V.obj(
            "detail" -> V.obj("reason" ->
              VStr("Unsupported expression: !" + exprSql(inner))),
            "operation" -> VStr("Fallback"))
      }
    }
    entries += collectorEntry()
    fullRows(strategy, fullyIndexed, orderCovered)
    VArr(entries.toVector)
  }

  /** Non-SELECT statements (control flow etc.). */
  def statementPlan(stmt: Statement, in: Interp): PNode = stmt match {
    case s: SelectStmt => selectPlan(s, in)
    case ReturnStmt(e) =>
      PNode("Return", "Rt", Nil, Seq(exprNode(e)))
    case ExprStmt(e) => exprNode(e)
    case IfStmt(branches, otherwise) =>
      val attrs = Seq("branches" -> branches.length.toString) ++
        (if (otherwise.isDefined) Seq("has_else" -> "true") else Nil)
      PNode("IfElse", "Rt", attrs)
    case ForStmt(param, _, block) =>
      PNode("Foreach", "Rt",
        Seq("param" -> param, "statements" -> block.stmts.length.toString))
    case ThrowStmt(e) =>
      PNode("Expr", "Rt", Seq("expr" -> s"THROW ${exprSql(e)}"))
    case BreakStmt => PNode("Expr", "Rt", Seq("expr" -> "BREAK"))
    case ContinueStmt => PNode("Expr", "Rt", Seq("expr" -> "CONTINUE"))
    case LetStmt(name, _, what) =>
      PNode("Let", "Rt", Seq("param" -> name), Seq(exprNode(what)))
    case other => PNode("Expr", "Rt", Seq("expr" -> "…"))
  }

  private def exprNode(e: Expr): PNode = e match {
    case FnCall("sleep", Seq(d)) =>
      PNode("Sleep", "Rt", Seq("duration" -> exprSql(d)))
    case IfExpr(branches, otherwise) =>
      val attrs = Seq("branches" -> branches.length.toString) ++
        (if (otherwise.isDefined) Seq("has_else" -> "true") else Nil)
      PNode("IfElse", "Rt", attrs)
    case _ =>
      val emb = embeds(e, "expr")
      val ctx = if (touchesDb(e)) "Db" else "Rt"
      PNode("Expr", ctx, Seq("expr" -> exprSql(e)), embedded = emb)
  }

  /** EXPLAIN [ANALYZE] execution (Interp side): build, optionally run for
    * row counts, render. */
  def run(in: Interp, analyze: Boolean, json: Boolean, inner: Statement, env: Env): V = {
    analyzeMode = analyze
    val plan = try statementPlan(inner, in) finally analyzeMode = false
    if (!analyze) {
      if (json) renderJson(plan, scala.None)
      else VStr(renderText(plan, scala.None))
    } else {
      // execute for metrics: result row count annotates the Db chain; a
      // RETURN flowing out of the inner statement is metrics input, not a
      // result (explain/literals ANALYZE RETURN IF)
      val result = try in.execStatement(inner, env)
        catch { case _: SqlError => VNone; case ReturnSignal(v) => v }
      val total: Long = inner match {
        case _: ReturnStmt => 0L
        case _ => result match {
          case VArr(items) => items.length.toLong
          case VNone       => 1L
          case _           => 1L
        }
      }
      // a scan beneath a residual Filter processed MORE rows than the final
      // result: re-count with only the index-served conjuncts applied
      val scanRows: Option[Long] = inner match {
        case sel: SelectStmt if sel.where.isDefined =>
          val table = sel.what match {
            case Seq(Idiom(Seq(PField(n)))) => Some(n)
            case Seq(TableRef(n))           => Some(n)
            case _                          => scala.None
          }
          val star = Seq(Field(Idiom(Seq(PAll)), scala.None, isAll = true))
          table.flatMap(t => indexAccess(in, t, sel.where.get, sel.withIndex,
              newExec = true)).flatMap {
            case (_, _, Some(residual), _, _) =>
              // CONTAINS/INSIDE conjuncts are index-SERVED yet re-checked as
              // residual — the scan's row count includes their selectivity
              // (planner contains_operators)
              val residualSet = conjunctList(residual).filterNot {
                case Binary("CONTAINS", _, _) => true
                case Binary("INSIDE" | "IN", _, Idiom(_)) => true
                case _ => false
              }.toSet
              val accessOnly = conjunctList(sel.where.get).filterNot(residualSet.contains)
                .reduceOption((a, b) => Binary("&&", a, b))
              val scanStmt = sel.copy(fields = star, value = false,
                groupBy = scala.None, where = accessOnly, order = Nil,
                limit = scala.None, start = scala.None)
              try in.execStatement(scanStmt, env) match {
                case VArr(items) => Some(items.length.toLong)
                case _           => scala.None
              } catch { case _: SqlError => scala.None }
            case _ => scala.None
          }
        case _ => scala.None
      }
      // rows flowing OUT of the filtered source (post-predicate,
      // pre-aggregate/sort/limit) — stamps residual Filters, pushed-
      // predicate scans, and record-id range scans
      val filterRows: Option[Long] = inner match {
        case sel: SelectStmt if sel.where.isDefined || sel.groupBy.isDefined ||
            sel.order.nonEmpty || sel.limit.isDefined =>
          val star = Seq(Field(Idiom(Seq(PAll)), scala.None, isAll = true))
          val flatStmt = sel.copy(fields = star, value = false,
            groupBy = scala.None, order = Nil,
            limit = scala.None, start = scala.None)
          try in.execStatement(flatStmt, env) match {
            case VArr(items) => Some(items.length.toLong)
            case _           => scala.None
          } catch { case _: SqlError => scala.None }
        case _ => scala.None
      }
      def annotate(n: PNode): PNode = {
        if (n.rows.isDefined) return n.copy(children = n.children.map(annotate))
        // a scan that CONSUMED the limit emits post-limit rows
        val limitPushed = n.attrs.exists(_._1 == "limit")
        val r =
          if (n.ctx != "Db") 0L
          else if (n.name.endsWith("CountScan")) total
          else if (n.name.endsWith("Scan") && limitPushed) total
          else if (n.name.endsWith("Scan") && scanRows.isDefined) scanRows.get
          else if ((n.name == "Filter" || n.name.endsWith("Scan")) && filterRows.isDefined)
            filterRows.get
          else total
        // each Union branch scan counts its OWN table's rows, not the
        // combined total (select/explain_multi_table_new_executor)
        if (n.name == "Union")
          return n.copy(rows = Some(r), children = n.children.map { c =>
            if (c.name == "TableScan" && c.rows.isEmpty)
              c.copy(rows = c.attrs.collectFirst { case ("table", t) =>
                (inner match {
                  case sel: SelectStmt =>
                    try in.execStatement(sel.copy(
                        what = Seq(TableRef(t)), order = Nil,
                        limit = scala.None, start = scala.None), env) match {
                      case VArr(items) => items.length.toLong
                      case _           => 0L
                    } catch { case _: SqlError => 0L }
                  case _ => 0L
                })
              }, children = c.children.map(annotate))
            else annotate(c)
          })
        n.copy(rows = Some(r), children = n.children.map(annotate))
      }
      val annotated = annotate(plan)
      if (json) renderJson(annotated, Some(total))
      else VStr(renderText(annotated, Some(total)))
    }
  }
}
