package graft.gql

import scala.collection.mutable

/** GraphQL front-end: a query-document subset translated source-to-source
  * onto SurrealQL, so both execution paths (the Interp semantics engine and
  * the SparkPlanner DataFrame lowering) serve GraphQL for free.
  *
  * Mirrors the reference's dynamic GraphQL schema behavior
  * (surrealdb: core/src/gql/tables.rs):
  *   - table root fields with `filter`/`where`, `order`, `limit`, `start`
  *     arguments compiling to one SELECT (tables.rs:291 build helpers);
  *   - filter operators eq/ne/gt/gte/lt/lte/in as binary ops and
  *     contains/startsWith/endsWith/regex as string:: function calls
  *     (tables.rs:1628-1651 parse_binary_op / parse_function_op);
  *   - and/or/not aggregation with implicit AND across multi-key filters
  *     (tables.rs:1578 val_from_filter);
  *   - the `order` linked-list input `{asc: f, then: {desc: g}}`
  *     (tables.rs:164 parse_order_arg);
  *   - `_get_<table>(id: "...")` point lookups → SELECT FROM ONLY rid
  *     (tables.rs:233 select_all_from_record);
  *   - selection sets as projections; nested selections on link fields
  *     become destructure idioms (`link.{a, b}`), resolved in ONE plan
  *     instead of the reference's per-record follow-up SELECTs — the
  *     Spark-first translation of tables.rs:110 record-link resolution.
  *
  * Mutations (gql/mutations.rs) translate too: `create{Cap}(data)` →
  * CREATE CONTENT, `update{Cap}(id, data)` → UPDATE MERGE,
  * `upsert{Cap}(data)` → UPSERT CONTENT, `delete{Cap}(id)` → DELETE
  * returning Boolean — the reference's field-naming scheme.
  *
  * Variables (`query($min: Int!) { … }` + a variables object, defaults,
  * non-null enforcement) and fragments (named `fragment F on T` + `...F`
  * spreads and inline `... on T` spreads) are supported: variables
  * substitute into argument values and fragment spreads splice their
  * selection sets before translation — both are client-surface document
  * transforms, so the SurrealQL lowering underneath is unchanged
  * (gql/schema.rs resolves them the same way before resolution).
  *
  * Out of scope (documented): auth/subscriptions (gql/auth.rs,
  * subscriptions.rs), directives, introspection. */
object Gql {

  final case class GqlError(msg: String) extends RuntimeException(msg)

  // ---- document model ----------------------------------------------------

  sealed trait GVal
  final case class GInt(v: Long) extends GVal
  final case class GFloat(v: Double) extends GVal
  final case class GStr(v: String) extends GVal
  final case class GBool(v: Boolean) extends GVal
  case object GNull extends GVal
  final case class GEnum(name: String) extends GVal
  final case class GList(items: Seq[GVal]) extends GVal
  final case class GObj(fields: Seq[(String, GVal)]) extends GVal {
    def get(k: String): Option[GVal] = fields.collectFirst { case (n, v) if n == k => v }
  }
  /** A `$variable` reference inside a value — resolved against the
    * operation's variable definitions before translation. */
  final case class GVar(name: String) extends GVal

  final case class GField(alias: Option[String], name: String,
      args: Seq[(String, GVal)], sel: Seq[GField],
      spread: Option[String] = scala.None,
      directives: Seq[(String, Seq[(String, GVal)])] = Nil) {
    def out: String = alias.getOrElse(name)
    def arg(k: String): Option[GVal] = args.collectFirst { case (n, v) if n == k => v }
  }

  /** `$name: Type[!] [= default]` from the operation header. */
  final case class VarDef(name: String, tpe: String, nonNull: Boolean,
      default: Option[GVal])

  /** `fragment Name on Type { … }`. */
  final case class FragDef(name: String, on: String, sel: Seq[GField])

  // ---- lexer/parser (GraphQL October 2021 executable-document subset) ----

  final class Parser(src: String) {
    private var pos = 0
    private def err(m: String): Nothing =
      throw GqlError(s"GraphQL parse error at offset $pos: $m")
    private def ws(): Unit = {
      while (pos < src.length && (src(pos).isWhitespace || src(pos) == ',' || src(pos) == '#')) {
        if (src(pos) == '#') while (pos < src.length && src(pos) != '\n') pos += 1
        else pos += 1
      }
    }
    private def peek: Char = if (pos < src.length) src(pos) else '\u0000'
    private def expect(c: Char): Unit = {
      ws(); if (peek != c) err(s"expected '$c'"); pos += 1
    }
    private def isNameStart(c: Char) = c == '_' || c.isLetter
    private def isNamePart(c: Char) = c == '_' || c.isLetterOrDigit
    private def name(): String = {
      ws()
      if (!isNameStart(peek)) err("expected a name")
      val b = new StringBuilder
      while (pos < src.length && isNamePart(src(pos))) { b += src(pos); pos += 1 }
      b.toString
    }

    def document(): Doc = {
      ws()
      // executable document: any number of fragment definitions around ONE
      // operation (`query|mutation [Name] [($vars)] { … }` or shorthand)
      var op = "query"
      var roots: Seq[GField] = Nil
      var varDefs: Seq[VarDef] = Nil
      val frags = mutable.LinkedHashMap[String, FragDef]()
      var sawOp = false
      while ({ ws(); pos < src.length }) {
        if (peek == '{') {
          if (sawOp) err("multiple operations in one document")
          roots = selectionSet(); sawOp = true
        } else {
          name() match {
            case "fragment" =>
              val fn = name()
              if (fn == "on") err("fragment name cannot be `on`")
              ws(); if (name() != "on") err("expected `on` in fragment definition")
              val tpe = name()
              frags(fn) = FragDef(fn, tpe, selectionSet())
            case o @ ("query" | "mutation") =>
              if (sawOp) err("multiple operations in one document")
              op = o
              ws(); if (isNameStart(peek)) name() // optional operation name
              ws(); if (peek == '(') varDefs = variableDefinitions()
              roots = selectionSet(); sawOp = true
            case other =>
              throw GqlError(s"GraphQL: unsupported operation `$other` " +
                "(queries and mutations only; subscriptions are out of scope)")
          }
        }
      }
      if (!sawOp) err("document has no operation")
      Doc(op, roots, varDefs, frags.toMap)
    }

    /** `($min: Int!, $tag: String = "x")`. */
    private def variableDefinitions(): Seq[VarDef] = {
      expect('(')
      val out = mutable.ArrayBuffer[VarDef]()
      ws()
      while (peek != ')') {
        if (peek != '$') err("expected a $variable definition")
        pos += 1
        val n = name()
        expect(':')
        ws()
        // type: Name, [Type], with optional ! wrappers — recorded as text
        val t0 = pos
        def typeRef(): Unit = {
          ws()
          if (peek == '[') { pos += 1; typeRef(); expect(']') } else name()
          ws(); if (peek == '!') pos += 1
        }
        typeRef()
        val tpeTxt = src.substring(t0, pos).trim
        val nonNull = tpeTxt.endsWith("!")
        ws()
        val dflt = if (peek == '=') { pos += 1; Some(value()) } else scala.None
        out += VarDef(n, tpeTxt.stripSuffix("!"), nonNull, dflt)
        ws()
      }
      pos += 1
      out.toSeq
    }

    private def selectionSet(): Seq[GField] = {
      expect('{')
      val out = mutable.ArrayBuffer[GField]()
      ws()
      while (peek != '}') {
        out += selection()
        ws()
      }
      pos += 1 // '}'
      out.toSeq
    }

    private def selection(): GField = {
      ws()
      // `...Fragment` or `... on Type { … }` spreads
      if (peek == '.') {
        if (pos + 2 >= src.length || src(pos + 1) != '.' || src(pos + 2) != '.')
          err("expected `...` spread")
        pos += 3
        ws()
        if (isNameStart(peek)) {
          val n = name()
          if (n == "on") {
            val tpe = name() // inline fragment's type condition
            return GField(scala.None, "...", Nil, selectionSet(), Some("on:" + tpe))
          }
          val ds = directives()
          return GField(scala.None, "...", Nil, Nil, Some(n), ds)
        }
        err("expected a fragment name or `on` after `...`")
      }
      val n1 = name()
      ws()
      val (alias, fname) =
        if (peek == ':') { pos += 1; (Some(n1), name()) } else (None, n1)
      ws()
      val args = if (peek == '(') arguments() else Nil
      val ds = directives()
      ws()
      val sel = if (peek == '{') selectionSet() else Nil
      GField(alias, fname, args, sel, scala.None, ds)
    }

    /** `@skip(if: …)` / `@include(if: …)` chains (spec §5.7; evaluated at
      * resolve time against the bound variables). */
    private def directives(): Seq[(String, Seq[(String, GVal)])] = {
      val out = mutable.ArrayBuffer[(String, Seq[(String, GVal)])]()
      ws()
      while (peek == '@') {
        pos += 1
        val dn = name()
        ws()
        val dargs = if (peek == '(') arguments() else Nil
        out += (dn -> dargs)
        ws()
      }
      out.toSeq
    }

    private def arguments(): Seq[(String, GVal)] = {
      expect('(')
      val out = mutable.ArrayBuffer[(String, GVal)]()
      ws()
      while (peek != ')') {
        val n = name()
        expect(':')
        out += (n -> value())
        ws()
      }
      pos += 1
      out.toSeq
    }

    private def value(): GVal = {
      ws()
      peek match {
        case '"' => GStr(stringLit())
        case '[' =>
          pos += 1
          val items = mutable.ArrayBuffer[GVal]()
          ws()
          while (peek != ']') { items += value(); ws() }
          pos += 1
          GList(items.toSeq)
        case '{' =>
          pos += 1
          val fs = mutable.ArrayBuffer[(String, GVal)]()
          ws()
          while (peek != '}') {
            val n = name(); expect(':'); fs += (n -> value()); ws()
          }
          pos += 1
          GObj(fs.toSeq)
        case '$' => pos += 1; GVar(name())
        case c if c == '-' || c.isDigit => numberLit()
        case c if isNameStart(c) =>
          name() match {
            case "true"  => GBool(true)
            case "false" => GBool(false)
            case "null"  => GNull
            case other   => GEnum(other)
          }
        case other => err(s"unexpected character '$other' in value")
      }
    }

    private def stringLit(): String = {
      pos += 1
      val b = new StringBuilder
      while (peek != '"') {
        if (pos >= src.length) err("unterminated string")
        if (peek == '\\') {
          pos += 1
          b += (peek match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\\' => '\\'; case '/' => '/'
            case 'u' =>
              val hex = src.substring(pos + 1, pos + 5); pos += 4
              Integer.parseInt(hex, 16).toChar
            case other => err(s"bad escape \\$other")
          })
          pos += 1
        } else { b += peek; pos += 1 }
      }
      pos += 1
      b.toString
    }

    private def numberLit(): GVal = {
      val start = pos
      if (peek == '-') pos += 1
      while (peek.isDigit) pos += 1
      var isFloat = false
      if (peek == '.') { isFloat = true; pos += 1; while (peek.isDigit) pos += 1 }
      if (peek == 'e' || peek == 'E') {
        isFloat = true; pos += 1
        if (peek == '+' || peek == '-') pos += 1
        while (peek.isDigit) pos += 1
      }
      val txt = src.substring(start, pos)
      if (isFloat) GFloat(txt.toDouble) else GInt(txt.toLong)
    }
  }

  /** A parsed executable document: operation type, root fields, variable
    * definitions, fragment definitions (both empty pre-resolution extras). */
  final case class Doc(op: String, roots: Seq[GField],
      varDefs: Seq[VarDef] = Nil, frags: Map[String, FragDef] = Map.empty)

  def parse(src: String): Seq[GField] = parseDoc(src).roots

  def parseDoc(src: String): Doc = resolve(new Parser(src).document(), Map.empty)

  def parseDoc(src: String, variables: Map[String, GVal]): Doc =
    resolve(new Parser(src).document(), variables)

  /** Parse a variables payload written as a GraphQL input object
    * (`{min: 3, tag: "x"}`) — the transport-level JSON body decodes to the
    * same shape. */
  def parseVariables(src: String): Map[String, GVal] =
    new Parser("{ __v(v: " + src + ") { f } }").document().roots.head
      .arg("v") match {
        case Some(o: GObj) => o.fields.toMap
        case _ => throw GqlError("variables must be an object")
      }

  /** Resolve a parsed document: bind variables (defaults applied, missing
    * non-null errors — gql/schema.rs variable coercion) and splice fragment
    * spreads (named + inline; cycles error). */
  private def resolve(d: Doc, vars: Map[String, GVal]): Doc = {
    val bound: Map[String, GVal] = d.varDefs.map { vd =>
      vars.get(vd.name).orElse(vd.default) match {
        case Some(v) => vd.name -> v
        case scala.None if vd.nonNull =>
          throw GqlError(s"Variable $$${vd.name}: ${vd.tpe}! has no value")
        case scala.None => vd.name -> GNull
      }
    }.toMap
    def subV(v: GVal): GVal = v match {
      case GVar(n) => bound.getOrElse(n,
        throw GqlError(s"Undefined variable $$$n"))
      case GList(items) => GList(items.map(subV))
      case GObj(fs) => GObj(fs.map { case (k, x) => (k, subV(x)) })
      case other => other
    }
    // @skip/@include: a field (or spread) is dropped when skip's `if` is
    // true or include's `if` is false — evaluated AFTER variable binding
    // (graphql spec §5.7.1-2; unknown directives error like gql/schema.rs)
    def kept(f: GField): Boolean = f.directives.forall { case (dn, dargs) =>
      val flag = dargs.collectFirst { case ("if", v) => subV(v) } match {
        case Some(GBool(b)) => b
        case Some(other) => throw GqlError(
          s"Directive @$dn expects a Boolean `if` argument, got $other")
        case scala.None => throw GqlError(s"Directive @$dn requires `if`")
      }
      dn match {
        case "skip"    => !flag
        case "include" => flag
        case other     => throw GqlError(s"Unknown directive @$other")
      }
    }
    def expand(sel: Seq[GField], seen: Set[String]): Seq[GField] =
      sel.filter(kept).flatMap { f =>
        f.spread match {
          case Some(s) if s.startsWith("on:") => // inline fragment
            expand(f.sel, seen)
          case Some(n) =>
            if (seen(n)) throw GqlError(s"Fragment cycle through `$n`")
            val fd = d.frags.getOrElse(n,
              throw GqlError(s"Unknown fragment `$n`"))
            expand(fd.sel, seen + n)
          case scala.None =>
            Seq(f.copy(args = f.args.map { case (k, v) => (k, subV(v)) },
              sel = expand(f.sel, seen)))
        }
      }
    d.copy(roots = expand(d.roots, Set.empty), varDefs = Nil, frags = Map.empty)
  }

  // ---- GraphQL → SurrealQL translation -----------------------------------

  private def escStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Record-id shaped string ("table:key") renders as a record id literal,
    * anything else as a plain string — mirrors the gql layer's id coercion
    * (gql/utils.rs value conversion). */
  private def ridOrStr(s: String): String = {
    val i = s.indexOf(':')
    val ridLike = i > 0 && s.substring(0, i).forall(c => c == '_' || c.isLetterOrDigit) &&
      s.length > i + 1 && s.substring(i + 1).forall(c => c == '_' || c.isLetterOrDigit)
    if (ridLike) s else escStr(s)
  }

  private def renderVal(v: GVal): String = v match {
    case GInt(i)      => i.toString
    case GFloat(d)    => if (d == d.floor && !d.isInfinite) s"${d.toLong}.0" else d.toString
    case GStr(s)      => escStr(s)
    case GBool(b)     => b.toString
    case GNull        => "NULL"
    case GEnum(n)     => n // enum values name fields (order keys) or idents
    case GList(items) => items.map(renderVal).mkString("[", ", ", "]")
    case GObj(fs)     => fs.map { case (k, x) => s"$k: ${renderVal(x)}" }.mkString("{ ", ", ", " }")
  }

  /** One filter entry → SurrealQL condition (tables.rs val_from_filter). */
  private def filterExpr(filter: GVal): String = filter match {
    case o: GObj =>
      if (o.fields.isEmpty) throw GqlError("Table filter must have at least one item")
      val parts = o.fields.map {
        case (k, v) if k.equalsIgnoreCase("and") => aggregateExpr(v, "AND")
        case (k, v) if k.equalsIgnoreCase("or")  => aggregateExpr(v, "OR")
        case (k, v) if k.equalsIgnoreCase("not") => s"!(${filterExpr(v)})"
        case (field, v)                          => fieldCond(field, v)
      }
      parts.mkString("(", " AND ", ")")
    case _ => throw GqlError("Value in cond doesn't fit schema")
  }

  private def aggregateExpr(v: GVal, op: String): String = v match {
    case GList(items) if items.nonEmpty =>
      items.map(filterExpr).mkString("(", s" $op ", ")")
    case _ => throw GqlError(s"Value of $op should be a non-empty list")
  }

  /** `{field: {op: value, …}}` — binary ops and string:: function ops
    * (tables.rs:1628 parse_binary_op, 1643 parse_function_op). */
  private def fieldCond(field: String, v: GVal): String = v match {
    case o: GObj =>
      if (o.fields.isEmpty) throw GqlError(s"Field filter for `$field` must have at least one operator")
      o.fields.map {
        case ("eq", x)  => s"$field = ${rv(x)}"
        case ("ne", x)  => s"$field != ${rv(x)}"
        case ("gt", x)  => s"$field > ${rv(x)}"
        case ("gte", x) => s"$field >= ${rv(x)}"
        case ("lt", x)  => s"$field < ${rv(x)}"
        case ("lte", x) => s"$field <= ${rv(x)}"
        case ("in", x)  => s"$field INSIDE ${rv(x)}"
        case ("contains", x)   => s"string::contains($field, ${rv(x)})"
        case ("startsWith", x) => s"string::starts_with($field, ${rv(x)})"
        case ("endsWith", x)   => s"string::ends_with($field, ${rv(x)})"
        case ("regex", x)      => s"string::matches($field, ${rv(x)})"
        case (op, _) => throw GqlError(s"Unsupported filter operator `$op` on `$field`")
      }.mkString("(", " AND ", ")")
    case _ => throw GqlError(s"Filter for field `$field` must be an object of operators")
  }

  private def rv(v: GVal): String = v match {
    case GStr(s) => ridOrStr(s)
    case other   => renderVal(other)
  }

  /** `{asc: f} / {desc: f, then: …}` linked list → ORDER BY keys
    * (tables.rs:164 parse_order_arg). */
  private def orderKeys(v: GVal): Seq[String] = v match {
    case o: GObj =>
      val here = (o.get("asc"), o.get("desc")) match {
        case (Some(_), Some(_)) => throw GqlError("Found both ASC and DESC in order")
        case (Some(GEnum(f)), None) => s"$f ASC"
        case (None, Some(GEnum(f))) => s"$f DESC"
        case _ => throw GqlError("Order node needs `asc` or `desc` as an enum value")
      }
      here +: o.get("then").map(orderKeys).getOrElse(Nil)
    case _ => throw GqlError("Order argument must be an object")
  }

  /** Selection set → SurrealQL projection list. Nested selections become
    * destructure idioms resolved in one plan (`link.{a, b}`). */
  private def projection(sel: Seq[GField]): String = {
    if (sel.isEmpty) return "*"
    sel.map { f =>
      if (f.args.nonEmpty)
        throw GqlError(s"Field arguments on `${f.name}` are only supported at the query root")
      val base =
        if (f.sel.isEmpty) f.name
        else s"${f.name}.{${f.sel.map(sub =>
          if (sub.sel.isEmpty) sub.name
          else throw GqlError("Nesting deeper than one level is not supported")).mkString(", ")}}"
      f.alias match {
        case Some(a) if a != f.name => s"$base AS $a"
        case _ => base
      }
    }.mkString(", ")
  }

  /** One GraphQL root field → one SurrealQL SELECT statement. The statement
    * may project MORE than the selection asked for (ORDER BY keys must be
    * selected in SurrealQL; the reference sidesteps this by always issuing
    * `SELECT *`, tables.rs:28) — [[execute]] strips the extras during
    * response shaping. */
  def toSurql(root: GField): String = {
    // _get_<table>(id:) / _get(id:) → point lookup on ONLY
    if (root.name == "_get" || root.name.startsWith("_get_")) {
      val id = root.arg("id") match {
        case Some(GStr(s)) => s
        case _ => throw GqlError(s"`${root.name}` needs an `id: \"table:key\"` argument")
      }
      return s"SELECT ${projection(root.sel)} FROM ONLY $id"
    }
    val oKeys = root.arg("order").map(orderKeys).getOrElse(Nil)
    val oFields = oKeys.map(_.split(' ').head)
    val selected = root.sel.filter(_.sel.isEmpty).map(_.name).toSet
    val extraOrd =
      if (root.sel.isEmpty) Nil else oFields.filterNot(selected.contains)
    val proj = projection(root.sel) +
      (if (extraOrd.nonEmpty) extraOrd.mkString(", ", ", ", "") else "")
    val where = root.arg("filter").orElse(root.arg("where"))
      .map(f => s" WHERE ${filterExpr(f)}").getOrElse("")
    val order = if (oKeys.isEmpty) "" else s" ORDER BY ${oKeys.mkString(", ")}"
    val limit = root.arg("limit").collect { case GInt(n) => s" LIMIT $n" }.getOrElse("")
    val start = root.arg("start").collect { case GInt(n) => s" START $n" }.getOrElse("")
    s"SELECT $proj FROM ${root.name}$where$order$limit$start"
  }

  /** Whole document → one SurrealQL statement per root field, in order. */
  def toSurqlAll(doc: String, variables: Map[String, GVal] = Map.empty): Seq[(String, String)] = {
    val d = parseDoc(doc, variables)
    d.roots.map(f => f.out ->
      (if (d.op == "mutation") mutationSurql(f)._1 else toSurql(f)))
  }

  // ---- mutations (gql/mutations.rs) ---------------------------------------

  /** Mutation root field → SurrealQL statement + whether it returns Boolean
    * (`delete<Table>` does; everything else returns the record —
    * mutations.rs add_create/update/upsert/delete_field). Field naming is
    * the reference's `create{CapName}` scheme. */
  def mutationSurql(root: GField): (String, Boolean) = {
    def tableOf(prefix: String): String = {
      val cap = root.name.stripPrefix(prefix)
      if (cap.isEmpty || !cap.head.isUpper)
        throw GqlError(s"Unknown mutation field `${root.name}`")
      cap.head.toLower + cap.tail
    }
    def dataObj: GObj = root.arg("data") match {
      case Some(o: GObj) => o
      case _ => throw GqlError(s"`${root.name}` needs a `data: {…}` input object")
    }
    def idKey(tb: String, s: String): String =
      if (s.startsWith(tb + ":")) s.substring(tb.length + 1) else s
    def requiredId(tb: String): String = root.arg("id") match {
      case Some(GStr(s)) => idKey(tb, s)
      case _ => throw GqlError(s"`${root.name}` needs an `id` argument")
    }
    def content(o: GObj): String =
      renderVal(GObj(o.fields.filterNot(_._1 == "id")))
    root.name match {
      case n if n.startsWith("create") =>
        val tb = tableOf("create")
        val d = dataObj
        val target = d.get("id") match {
          case Some(GStr(id)) => s"$tb:${idKey(tb, id)}"
          case _ => tb
        }
        (s"CREATE ONLY $target CONTENT ${content(d)}", false)
      case n if n.startsWith("update") =>
        val tb = tableOf("update")
        (s"UPDATE ONLY $tb:${requiredId(tb)} MERGE ${content(dataObj)}", false)
      case n if n.startsWith("upsert") =>
        val tb = tableOf("upsert")
        val d = dataObj
        val target = d.get("id") match {
          case Some(GStr(id)) => s"$tb:${idKey(tb, id)}"
          case _ => tb
        }
        (s"UPSERT ONLY $target CONTENT ${content(d)}", false)
      case n if n.startsWith("delete") =>
        val tb = tableOf("delete")
        (s"DELETE $tb:${requiredId(tb)}", true)
      case other => throw GqlError(s"Unknown mutation field `$other`")
    }
  }

  // ---- execution ---------------------------------------------------------

  /** Execute a GraphQL document against the semantics engine; the result is
    * the GraphQL response shape `{ data: { <field>: … } }`. Rows are shaped
    * to the SELECTION (extra ORDER-key projections are stripped here, the
    * GraphQL layer's field resolution step). */
  def execute(doc: String, interp: graft.surql.Interp,
      variables: Map[String, GVal] = Map.empty): graft.surql.V = {
    import graft.surql.{Parser => SqlParser, QOk, QErr, SqlError, V, VArr, VObj}
    import scala.collection.immutable.TreeMap
    def shape(v: V, sel: Seq[GField]): V =
      if (sel.isEmpty) v
      else v match {
        case VArr(items) => VArr(items.map(shape(_, sel)))
        case VObj(fs) =>
          val keep = sel.map(_.out).toSet
          VObj(fs.filter { case (k, _) => keep(k) })
        case other => other
      }
    var data = TreeMap[String, V]()
    val d = parseDoc(doc, variables)
    d.roots.foreach { root =>
      val (sql, boolResult) =
        if (d.op == "mutation") mutationSurql(root)
        else (toSurql(root), false)
      interp.run(SqlParser.parse(sql)).lastOption match {
        case Some(QOk(v)) =>
          data = data.updated(root.out,
            if (boolResult) graft.surql.VBool(true) else shape(v, root.sel))
        case Some(QErr(m)) => throw SqlError(m)
        case scala.None    => throw SqlError(s"GraphQL field `${root.out}` produced no result")
      }
    }
    VObj(TreeMap("data" -> (VObj(data): V)))
  }

  /** Execute a single-root GraphQL document on the Spark path: the
    * translated SELECT runs through the SurrealQL parser + SparkPlanner. */
  def query(spark: org.apache.spark.sql.SparkSession, dir: String,
      doc: String,
      variables: Map[String, GVal] = Map.empty): org.apache.spark.sql.DataFrame = {
    val roots = toSurqlAll(doc, variables)
    if (roots.length != 1)
      throw GqlError("Spark-path GraphQL execution expects exactly one root field")
    graft.surql.SparkPlanner.query(spark, dir, roots.head._2)
  }
}
