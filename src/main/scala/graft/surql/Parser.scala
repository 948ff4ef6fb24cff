package graft.surql

import graft.surql.ast._
import scala.collection.mutable.ArrayBuffer

final case class ParseError(msg: String, pos: Int) extends Exception(s"Parse error: $msg @ $pos")

/** Hand-rolled scannerless recursive-descent parser for the SurrealQL
  * surface — structured after the reference's `syn/parser/` (surrealdb:
  * syn/mod.rs:103-111, expression Pratt levels sql/operator.rs:535-549,
  * statement parsing syn/parser/stmt/). Scannerless because SurrealQL lexing
  * is context-dependent (record ids, durations, regex, casts). */
object Parser {
  /** `@[ref][,]?[AND|OR]@` — the fulltext match operator family. */
  private[surql] val MatchOpRe = "@(?:(\\d+))?(?:,?(AND|OR))?@".r
  /** `<|k[,ef-or-METRIC]|>` — the KNN operator. */
  private[surql] val KnnOpRe = "<\\|(\\d+)(?:,([A-Za-z0-9]+))?\\|>".r

  def parse(text: String): Ast = new Parser(text).parseAst()
  def parseExpr(text: String): Expr = {
    val p = new Parser(text)
    val e = p.expr()
    p.ws(); p.expectEof()
    e
  }
  /** Parse a kind annotation text (API path `:seg<kind>` segments). */
  def parseKind(text: String): Kind = {
    val p = new Parser(text)
    p.ws()
    val k = p.kind()
    p.ws(); p.expectEof()
    k
  }
  /** Parse a rendered value literal (used by the golden runner to compare
    * structurally rather than textually where needed). */
  def parseValue(text: String): V = {
    val p = new Parser(text)
    p.ws()
    val e = p.expr()
    Eval.evalConst(e)
  }
}

final class Parser(val src: String) {
  var pos = 0
  /** While set, idiom continuation does not consume graph arrows — used by
    * RELATE to keep `$a->edge->$b` separable. */
  private var noGraphIdiom = false
  /** While set, a `$a = …` expression-statement is NOT rejected as a
    * LET-less declaration (THEN branches; see reject_letless_let). */
  private var allowLetless = false

  // ---- low-level ------------------------------------------------------

  def eof: Boolean = pos >= src.length
  def peekc: Char = if (eof) '\u0000' else src.charAt(pos)
  def peekAt(off: Int): Char = if (pos + off >= src.length) '\u0000' else src.charAt(pos + off)
  def fail(msg: String): Nothing = throw ParseError(msg, pos)
  def expectEof(): Unit = if (!eof) fail(s"unexpected trailing input: '${src.substring(pos, Math.min(src.length, pos + 20))}'")

  def ws(): Unit = {
    var moving = true
    while (moving) {
      moving = false
      while (!eof && Character.isWhitespace(peekc)) { pos += 1; moving = true }
      if (!eof) {
        if (peekc == '/' && peekAt(1) == '/') { skipLine(); moving = true }
        else if (peekc == '-' && peekAt(1) == '-') { skipLine(); moving = true }
        else if (peekc == '#') { skipLine(); moving = true }
        else if (peekc == '/' && peekAt(1) == '*') {
          pos += 2
          while (!eof && !(peekc == '*' && peekAt(1) == '/')) pos += 1
          if (!eof) pos += 2
          moving = true
        }
      }
    }
  }
  private def skipLine(): Unit = { while (!eof && peekc != '\n') pos += 1 }

  def isIdentStart(c: Char): Boolean = c.isLetter || c == '_'
  def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Case-insensitive keyword match (consumes + surrounding ws before). */
  def kw(word: String): Boolean = {
    ws()
    val end = pos + word.length
    if (end > src.length) return false
    var i = 0
    while (i < word.length) {
      if (Character.toUpperCase(src.charAt(pos + i)) != word.charAt(i)) return false
      i += 1
    }
    if (end < src.length && isIdentChar(src.charAt(end))) return false
    pos = end
    true
  }
  def peekKw(word: String): Boolean = { val p0 = pos; val r = kw(word); pos = p0; r }
  def expectKw(word: String): Unit = if (!kw(word)) fail(s"expected $word")

  def sym(s: String): Boolean = {
    ws()
    if (src.startsWith(s, pos)) { pos += s.length; true } else false
  }
  def peekSym(s: String): Boolean = { ws(); src.startsWith(s, pos) }
  def expectSym(s: String): Unit = if (!sym(s)) fail(s"expected '$s'")

  def rawIdent(): String = {
    ws()
    if (eof) fail("expected identifier")
    if (peekc == '`') {
      pos += 1
      val sb = new StringBuilder
      while (!eof && peekc != '`') {
        if (peekc == '\\') identEscape(sb)
        else { sb.append(peekc); pos += 1 }
      }
      if (eof) fail("unterminated backtick ident")
      pos += 1
      sb.toString
    } else if (peekc == '⟨') { // ⟨ ... ⟩
      pos += 1
      val sb = new StringBuilder
      while (!eof && peekc != '⟩') {
        if (peekc == '\\') identEscape(sb)
        else { sb.append(peekc); pos += 1 }
      }
      if (eof) fail("unterminated angle ident")
      pos += 1
      sb.toString
    } else if (isIdentStart(peekc)) {
      val start = pos
      while (!eof && isIdentChar(peekc)) pos += 1
      src.substring(start, pos)
    } else fail(s"expected identifier, found '$peekc'")
  }

  /** Escaped-ident escape sequences (syn lexer ident escapes): \0 \t \n
    * \f \r \b \" \' \\ \` \⟩ S \u{55}. */
  private def identEscape(sb: StringBuilder): Unit = {
    pos += 1 // consume '\'
    if (eof) fail("unterminated escape")
    val c = peekc
    pos += 1
    c match {
      case '0' => sb.append('\u0000')
      case 't' => sb.append('\t')
      case 'n' => sb.append('\n')
      case 'f' => sb.append('\f')
      case 'r' => sb.append('\r')
      case 'b' => sb.append('\b')
      case 'u' =>
        if (peekc == '{') {
          pos += 1
          val h0 = pos
          while (!eof && peekc != '}') pos += 1
          val hex = src.substring(h0, pos)
          if (!eof) pos += 1
          sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
        } else {
          val hex = src.substring(pos, Math.min(pos + 4, src.length))
          pos += 4
          sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
        }
      case other => sb.append(other) // \" \' \\ \` \⟩ and any literal
    }
  }

  /** Strict 8-4-4-4-12 UUID literal (java's fromString accepts short
    * groups; the reference lexer does not — primitive/uuid goldens). */
  private def strictUuid(s: String): java.util.UUID = {
    if (!s.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
      fail("Unexpected end of string, expected UUID token to finish")
    java.util.UUID.fromString(s)
  }

  def tryIdent(): Option[String] = {
    ws()
    if (!eof && (isIdentStart(peekc) || peekc == '`' || peekc == '⟨')) Some(rawIdent())
    else scala.None
  }

  // ---- statements -----------------------------------------------------

  def parseAst(): Ast = {
    val stmts = ArrayBuffer[Statement]()
    ws()
    while (!eof) {
      if (sym(";")) { /* empty statement */ }
      else {
        stmts += statement()
        ws()
        if (!eof && !sym(";")) {
          ws()
          if (!eof) fail(s"expected ';' between statements near '${src.substring(pos, Math.min(src.length, pos + 25))}'")
        }
      }
      ws()
    }
    Ast(stmts.toSeq)
  }

  def statement(): Statement = {
    ws()
    if (peekKw("EXPLAIN") || peekKw("ANALYZE")) {
      kw("EXPLAIN")
      val analyze = kw("ANALYZE")
      kw("FULL")
      val json = if (kw("FORMAT")) { expectKw("JSON"); true } else false
      val inner = statement()
      return ExplainStmt(analyze, json, inner)
    }
    if (kw("SELECT")) selectStmt()
    else if (kw("LET")) letStmt()
    else if (kw("RETURN")) {
      val e = exprOrStatement()
      // RETURN ... FETCH path — fetch record links in the result
      if (kw("FETCH")) {
        val fs = ArrayBuffer[Expr](e)
        var g = true
        while (g) { fs += Lit(VStr(idiomName())); g = sym(",") }
        ReturnStmt(FnCall("__fetch__", fs.toSeq))
      } else ReturnStmt(e)
    }
    else if (peekKw("IF")) { kw("IF"); ifStmt() }
    else if (kw("FOR")) forStmt()
    else if (kw("CREATE")) createStmt()
    else if (kw("UPDATE")) UpdateStmt.tupled(updLike())
    else if (kw("UPSERT")) UpsertStmt.tupled(updLike())
    else if (kw("REBUILD")) {
      expectKw("INDEX")
      val ifExists = if (kw("IF")) { expectKw("EXISTS"); true } else false
      val name = defName()
      expectKw("ON"); kw("TABLE")
      RebuildIndexStmt(name, defName(), ifExists)
    }
    else if (kw("DELETE")) deleteStmt()
    else if (kw("INSERT")) insertStmt()
    else if (kw("RELATE")) relateStmt()
    else if (kw("LIVE")) liveStmt()
    else if (kw("KILL")) KillStmt(expr())
    else if (peekKw("SHOW")) {
      // speculative: `show` may also be a plain identifier expression
      val save = pos
      kw("SHOW")
      if (kw("CHANGES")) showChangesStmt()
      else { pos = save; ExprStmt(expr()) }
    }
    else if (kw("THROW")) ThrowStmt(expr())
    else if (kw("BREAK")) BreakStmt
    else if (kw("CONTINUE")) ContinueStmt
    else if (kw("BEGIN")) { kw("TRANSACTION"); BeginStmt }
    else if (kw("COMMIT")) { kw("TRANSACTION"); CommitStmt }
    else if (kw("CANCEL")) { kw("TRANSACTION"); CancelStmt }
    else if (kw("SLEEP")) ExprStmt(FnCall("sleep", Seq(expr())))
    else if (kw("USE")) useStmt()
    else if (kw("DEFINE")) defineStmt()
    else if (kw("REMOVE")) removeStmt()
    else if (kw("ALTER")) alterStmt()
    else if (peekKw("ACCESS")) {
      // speculative: `access` may also be a plain identifier expression
      val save = pos
      try { kw("ACCESS"); accessStmt() }
      catch { case _: ParseError => pos = save; ExprStmt(expr()) }
    }
    else if (kw("INFO")) infoStmt()
    else if (kw("OPTION")) {
      val name = rawIdent()
      val v = if (sym("=")) { if (kw("TRUE")) true else { kw("FALSE"); false } } else true
      OptionStmt(name, v)
    }
    else {
      // a bare `$a = …` statement is a deprecated LET-less param declaration,
      // REJECTED at parse time at top level and inside `{ }` blocks — but a
      // leading `(` covers it, and THEN-branch expressions are exempt
      // (syn/parser: reject_letless_let; parsing/deprecate/ommited_let*)
      val covered = pos < src.length && src.charAt(pos) == '('
      val e = expr()
      if (!covered && !allowLetless) e match {
        case Binary("=", Param(_), _) | Binary("=", Idiom(Seq(PStart(Param(_)))), _) =>
          throw ParseError("Parameter declarations without `let` are deprecated." +
            " Replace with `let $a = ...` to keep the previous behavior.", pos)
        case _ => ()
      }
      ExprStmt(e)
    }
  }

  /** LIVE SELECT ⟨fields⟩|DIFF FROM what [WHERE cond] [FETCH …]
    * (sql/statements/live.rs:45). */
  private def liveStmt(): Statement = {
    expectKw("SELECT")
    val diff = kw("DIFF")
    val (fields, value) =
      if (diff) (Seq.empty[Field], false) else fieldsClause()
    expectKw("FROM")
    val what = expr()
    val where = if (kw("WHERE")) Some(expr()) else scala.None
    val fetch = ArrayBuffer[String]()
    if (kw("FETCH")) {
      var g = true
      while (g) { fetch += idiomName(); g = sym(",") }
    }
    LiveStmt(fields, value, diff, what, where, fetch.toSeq)
  }

  /** SHOW CHANGES FOR TABLE t | DATABASE SINCE ⟨ts|versionstamp⟩ [LIMIT n]
    * (sql/statements/show.rs:44). */
  private def showChangesStmt(): Statement = {
    expectKw("FOR")
    val table =
      if (kw("TABLE")) Some(rawIdent())
      else { expectKw("DATABASE"); scala.None }
    expectKw("SINCE")
    val since = expr()
    val limit = if (kw("LIMIT")) Some(expr()) else scala.None
    ShowChangesStmt(table, since, limit)
  }

  /** ACCESS name [ON base] GRANT|SHOW|REVOKE|PURGE …
    * (sql/statements/access.rs). */
  private def accessStmt(): Statement = {
    val name = rawIdent()
    val level: Option[String] =
      if (kw("ON")) Some(
        if (kw("ROOT")) "ROOT"
        else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
        else { kw("DATABASE"); kw("DB"); "DATABASE" })
      else scala.None
    def selector(): (String, Option[Expr]) =
      if (kw("ALL")) ("ALL", scala.None)
      else if (kw("GRANT")) ("GRANT " + rawIdent(), scala.None)
      else { expectKw("WHERE"); val e = expr(); ("WHERE", Some(e)) }
    if (kw("GRANT")) {
      expectKw("FOR")
      if (kw("USER")) AccessStmt(name, level, "GRANT", "USER", rawIdent())
      else { expectKw("RECORD"); val (_, r) = exprWithRaw(); AccessStmt(name, level, "GRANT", "RECORD", r) }
    }
    else if (kw("SHOW")) {
      val (sel, e) = selector()
      AccessStmt(name, level, "SHOW", selector = sel, selectorExpr = e)
    }
    else if (kw("REVOKE")) {
      val (sel, e) = selector()
      AccessStmt(name, level, "REVOKE", selector = sel, selectorExpr = e)
    }
    else if (kw("PURGE")) {
      var expired = false
      var revoked = false
      var g = true
      while (g) {
        if (kw("EXPIRED")) expired = true
        else if (kw("REVOKED")) revoked = true
        else g = false
        if (!sym(",")) g = false else g = true
      }
      val dur = if (kw("FOR")) accessDurVal() else scala.None
      AccessStmt(name, level, "PURGE", purgeExpired = expired, purgeRevoked = revoked,
        purgeFor = dur)
    }
    else fail("expected GRANT, SHOW, REVOKE or PURGE")
  }

  private def letStmt(): Statement = {
    expectSym("$")
    val name = rawIdent()
    val kindAnn = if (sym(":")) Some(kind()) else scala.None
    expectSym("=")
    LetStmt(name, kindAnn, exprOrStatement())
  }

  /** RETURN / LET accept a bare statement (RETURN SELECT …). */
  private def exprOrStatement(): Expr = {
    if (peekKw("SELECT") || peekKw("CREATE") || peekKw("UPDATE") || peekKw("UPSERT") ||
        peekKw("DELETE") || peekKw("RELATE") || peekKw("INSERT") || peekKw("DEFINE") ||
        peekKw("REMOVE") || peekKw("INFO") || peekKw("EXPLAIN") || peekKw("ANALYZE") ||
        peekKw("THROW")) Subquery(statement())
    else expr()
  }

  /** IF — both `IF c { } ELSE { }` and `IF c THEN x ELSE y END` forms.
    * (The IF keyword has already been consumed.) */
  private def ifStmt(): IfStmt = {
    val e = ifExprBody()
    IfStmt(e.branches, e.otherwise)
  }

  def ifExprBody(): IfExpr = {
    val branches = ArrayBuffer[(Expr, Expr)]()
    var otherwise: Option[Expr] = scala.None
    var thenForm = false
    var continueLoop = true
    // THEN…END branches accept statement sequences (RETURN/UPSERT/CREATE/…)
    // up to the next ELSE/END; RETURN inside flows out of the ENCLOSING
    // block exactly like the brace form (6141_future_issue)
    def branchExpr(): Expr = {
      val stmts = ArrayBuffer[Statement]()
      ws()
      // THEN-branch expressions are exempt from the LET-less `$a = …`
      // rejection (reference rejects only top-level + brace blocks)
      val savedLetless = allowLetless
      allowLetless = true
      try {
        while (!eof && !peekKw("ELSE") && !peekKw("END")) {
          if (!sym(";")) { stmts += statement(); ws(); sym(";") }
          ws()
        }
      } finally allowLetless = savedLetless
      stmts.toSeq match {
        case Seq(ExprStmt(e)) => e // pure-expression THEN keeps value shape
        case ss => BlockExpr(ss)
      }
    }
    val cond0 = expr()
    if (kw("THEN")) { thenForm = true; branches += ((cond0, branchExpr())) }
    else { branches += ((cond0, blockExpr())) }
    while (continueLoop) {
      if (kw("ELSE")) {
        if (kw("IF")) {
          val c = expr()
          if (thenForm) { expectKw("THEN"); branches += ((c, branchExpr())) }
          else branches += ((c, blockExpr()))
        } else {
          otherwise = Some(if (thenForm) branchExpr() else blockExpr())
          continueLoop = false
        }
      } else continueLoop = false
    }
    if (thenForm) kw("END")
    IfExpr(branches.toSeq, otherwise)
  }

  private def forStmt(): Statement = {
    expectSym("$")
    val name = rawIdent()
    expectKw("IN")
    val iter = expr()
    val body = blockExpr() match {
      case b: BlockExpr => b
      case other        => BlockExpr(Seq(ExprStmt(other)))
    }
    ForStmt(name, iter, body)
  }

  def blockExpr(): Expr = {
    ws()
    if (peekc != '{') fail("expected block")
    pos += 1
    val stmts = ArrayBuffer[Statement]()
    ws()
    while (!eof && peekc != '}') {
      if (!sym(";")) { stmts += statement(); ws(); sym(";") }
      ws()
    }
    expectSym("}")
    BlockExpr(stmts.toSeq)
  }

  private def infoStmt(): Statement = {
    expectKw("FOR")
    val s =
      if (kw("ROOT") || kw("KV")) InfoStmt("ROOT")
      else if (kw("NAMESPACE") || kw("NS")) InfoStmt("NS")
      else if (kw("DATABASE") || kw("DB")) InfoStmt("DB")
      else if (kw("TABLE") || kw("TB")) InfoStmt("TABLE", defName())
      else if (kw("USER")) {
        val u = defName()
        val lvl =
          if (kw("ON")) {
            if (kw("ROOT")) "ROOT"
            else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
            else { kw("DATABASE"); kw("DB"); "DATABASE" }
          } else ""
        InfoStmt("USER", if (lvl.isEmpty) u else s"$u|$lvl")
      }
      else if (kw("INDEX")) {
        val i = defName(); expectKw("ON"); kw("TABLE")
        InfoStmt("INDEX", i + ":" + defName())
      }
      else fail("expected INFO target")
    val version = if (kw("VERSION")) Some(expr()) else scala.None
    val structure = kw("STRUCTURE")
    s.copy(structure = structure, version = version)
  }

  private def useStmt(): Statement = {
    var ns: Option[String] = scala.None
    var db: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("NS") || kw("NAMESPACE")) ns = Some(rawIdent())
      else if (kw("DB") || kw("DATABASE")) db = Some(rawIdent())
      else go = false
    }
    UseStmt(ns, db)
  }

  private val permActionSet = Set("select", "create", "update", "delete")

  /** PERMISSIONS clause (sql/permission.rs): NONE | FULL | FOR-groups. */
  private def permsClauses(defaults: Seq[(String, String)]): Seq[(String, String)] = {
    if (kw("NONE")) return defaults.map { case (a, _) => a -> "NONE" }
    if (kw("FULL")) return defaults.map { case (a, _) => a -> "FULL" }
    val m = scala.collection.mutable.LinkedHashMap[String, String](defaults: _*)
    while (kw("FOR")) {
      val as = ArrayBuffer[String]()
      var g = true
      while (g) {
        as += rawIdent().toLowerCase
        val save = pos
        if (sym(",")) {
          val save2 = pos
          tryIdent() match {
            case Some(id) if permActionSet(id.toLowerCase) => pos = save2
            case _ => pos = save; g = false
          }
        } else g = false
      }
      val v =
        if (kw("NONE")) "NONE"
        else if (kw("FULL")) "FULL"
        else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim }
      as.foreach { a =>
        if (m.contains(a)) m(a) = v
        // fields have no delete permission (permission_delete parse error)
        else if (a == "delete") fail("Can't define permission DELETE for fields")
      }
      sym(",")
    }
    defaults.map { case (a, _) => a -> m(a) }
  }

  /** Canonical float literal text — the reference's to_sql renders float
    * literals with an `f` suffix (`123.456f`). */
  private def floatRaw(e: Expr, raw: String): String = e match {
    case Lit(VFloat(f)) if !raw.toLowerCase.endsWith("f") && !f.isNaN && !f.isInfinite &&
        raw.forall(c => c.isDigit || c == '.' || c == '-' || c == '+') => raw + "f"
    case _ => raw
  }

  /** A definition name position: a plain ident or a `$param` reference
    * resolved at execution time (parameterized DDL). */
  private def defName(): String = {
    ws()
    if (peekc == '$') { pos += 1; "$" + rawIdent() } else rawIdent()
  }

  /** A COMMENT value: string literal or `$param` reference. */
  private def commentStr(): String = {
    ws()
    if (peekc == '$') { pos += 1; "$" + rawIdent() } else stringLit()._1
  }

  /** Capture an expression's source text alongside its parse. */
  private def exprWithRaw(): (Expr, String) = {
    ws()
    val p0 = pos
    val e = expr()
    (e, src.substring(p0, pos).trim)
  }

  /** Deterministic argon2id-shaped passhash for DEFINE USER — the corpus
    * matches it against an argon2id regex; real hashing is out of scope. */
  private def fakePasshash(seed: String): String = {
    val b64 = java.util.Base64.getEncoder.withoutPadding()
      .encodeToString(java.security.MessageDigest.getInstance("SHA-256")
        .digest(seed.getBytes("UTF-8"))).replace('+', 'A').replace('/', 'B')
    s"$$argon2id$$v=19$$m=19456,t=2,p=1$$${b64.take(22)}$$${b64.take(43)}"
  }

  private def defineStmt(): Statement = {
    val start = pos
    val what = rawIdent().toUpperCase
    val mode =
      if (kw("OVERWRITE")) "overwrite"
      else if (kw("IF")) { expectKw("NOT"); expectKw("EXISTS"); "ifnotexists" }
      else ""
    if (what == "TABLE") return defineTableStmt(mode)
    if (what == "EVENT") return defineEventStmt(mode)
    if (what == "USER") return defineUserStmt(mode)
    if (what == "NAMESPACE" || what == "NS") return defineNamespaceLike("NAMESPACE", mode)
    if (what == "DATABASE" || what == "DB") return defineNamespaceLike("DATABASE", mode)
    if (what == "ANALYZER") return defineAnalyzerStmt(mode)
    if (what == "BUCKET") return defineBucketStmt(mode)
    if (what == "SEQUENCE") return defineSequenceStmt(mode)
    if (what == "API") return defineApiStmt(mode)
    if (what == "CONFIG") {
      val which = rawIdent().toLowerCase
      if (which == "api") {
        var mws: Seq[(String, Seq[Expr], String)] = Nil
        var permsRaw: Option[String] = scala.None
        var go = true
        while (go) {
          if (kw("MIDDLEWARE")) mws = middlewareList()
          else if (kw("PERMISSIONS")) permsRaw = Some(permSpec())
          else go = false
        }
        return DefineApiConfigStmt(mws, permsRaw, mode)
      }
      if (which == "graphql") {
        // sql/statements/define/config/graphql.rs: TABLES/FUNCTIONS specs,
        // DEPTH/COMPLEXITY limits, INTROSPECTION; bare AUTO/NONE sets both.
        var tables = "NONE"
        var funcs = "NONE"
        var depthL: Option[String] = scala.None
        var complexityL: Option[String] = scala.None
        var introNone = false
        def intTok(): String = { ws(); val d0 = pos; while (!eof && peekc.isDigit) pos += 1; src.substring(d0, pos) }
        def tfSpec(): String =
          if (kw("AUTO")) "AUTO"
          else if (kw("NONE")) "NONE"
          else {
            val inc = kw("INCLUDE")
            if (inc || kw("EXCLUDE")) {
              val ts = ArrayBuffer[String]()
              var g = true
              while (g) { ts += rawIdent(); g = sym(",") }
              (if (inc) "INCLUDE " else "EXCLUDE ") + ts.mkString(", ")
            } else "NONE"
          }
        var go = true
        while (go) {
          if (kw("TABLES")) tables = tfSpec()
          else if (kw("FUNCTIONS")) funcs = tfSpec()
          else if (kw("AUTO")) { tables = "AUTO"; funcs = "AUTO" }
          else if (kw("NONE")) { tables = "NONE"; funcs = "NONE" }
          else if (kw("DEPTH")) depthL = Some(intTok())
          else if (kw("COMPLEXITY")) complexityL = Some(intTok())
          else if (kw("INTROSPECTION")) { if (kw("NONE")) introNone = true else kw("AUTO") }
          else go = false
        }
        val sb = new StringBuilder("GRAPHQL TABLES ").append(tables).append(" FUNCTIONS ").append(funcs)
        depthL.foreach(d => sb.append(" DEPTH ").append(d))
        complexityL.foreach(c => sb.append(" COMPLEXITY ").append(c))
        if (introNone) sb.append(" INTROSPECTION NONE")
        return DefineRawStmt("CONFIG", which, sb.toString, mode)
      }
      val tail0 = pos
      while (!eof && peekc != ';') pos += 1 // clause tail (PERMISSIONS / AUTO / …)
      return DefineRawStmt("CONFIG", which, src.substring(tail0, pos).trim, mode)
    }
    if (what == "ACCESS") {
      val name = defName()
      expectKw("ON")
      val level =
        if (kw("ROOT")) "ROOT"
        else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
        else { kw("DATABASE"); kw("DB"); "DATABASE" }
      return defineAccessTail(name, level, mode)
    }
    val name = if (peekSym("$")) { sym("$"); if (what == "PARAM") rawIdent() else "$" + rawIdent() }
      else if (what == "FUNCTION") ""
      else tryIdent().getOrElse("")
    if (what == "FUNCTION") {
      val nb = new StringBuilder(rawIdent())
      while (src.startsWith("::", pos)) { pos += 2; nb.append("::").append(rawIdent()) }
      ws()
      val pr0 = pos
      expectSym("(")
      val params = ArrayBuffer[(String, Option[Kind])]()
      ws()
      if (peekc != ')') {
        var g = true
        while (g) {
          expectSym("$"); val n = rawIdent()
          val k = if (sym(":")) Some(kind()) else scala.None
          params += ((n, k)); g = sym(",")
        }
      }
      expectSym(")")
      val paramsRaw = src.substring(pr0, pos)
      ws()
      var returnsRaw: Option[String] = scala.None
      if (sym("->")) { ws(); val r0 = pos; kind(); returnsRaw = Some(src.substring(r0, pos).trim) }
      ws()
      val b0 = pos
      val body = blockExpr()
      val bodyRaw = src.substring(b0, pos)
      var fnComment: Option[String] = scala.None
      var fnPerms = "FULL"
      var goT = true
      while (goT) {
        if (kw("COMMENT")) fnComment = Some(commentStr())
        else if (kw("PERMISSIONS")) {
          fnPerms =
            if (kw("FULL")) "FULL"
            else if (kw("NONE")) "NONE"
            else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim }
        }
        else goT = false
      }
      ws()
      while (!eof && peekc != ';') pos += 1
      return DefineFunctionStmt(nb.toString, params.toSeq, body, paramsRaw, bodyRaw, mode,
        fnComment, returnsRaw, fnPerms)
    }
    if (what == "FIELD") {
      val fn = new StringBuilder(name)  // name may be a $param reference
      var goFn = true
      while (goFn) {
        if (peekSym("[")) {
          sym("["); ws()
          if (peekc == '*') { pos += 1; expectSym("]"); fn.append(".*") }
          else if (peekc.isDigit) {
            val s0 = pos
            while (!eof && peekc.isDigit) pos += 1
            val ix = src.substring(s0, pos)
            expectSym("]"); fn.append('[').append(ix).append(']')
          }
          else { expectSym("]"); fn.append(".*") }
        }
        // flatten part canonicalizes to the unicode ellipsis (fmt_sql …)
        else if (peekSym("...")) { sym("..."); fn.append("…") }
        else if (peekSym("…")) { sym("…"); fn.append("…") }
        else if (peekSym(".") && !peekSym("..")) {
          sym(".")
          ws()
          if (peekc == '*') { pos += 1; fn.append(".*") }
          else fn.append('.').append(rawIdent())
        }
        else if (peekSym("?") && !peekSym("??")) { sym("?"); fn.append("?") }
        else goFn = false
      }
      val fieldName = fn.toString
      expectKw("ON"); kw("TABLE")
      val tbl = defName()
      var kindAnn: Option[Kind] = scala.None
      var kindRaw: Option[String] = scala.None
      var flexible = false
      var valueE: Option[Expr] = scala.None
      var valueRaw: Option[String] = scala.None
      var computedE: Option[Expr] = scala.None
      var computedRaw: Option[String] = scala.None
      var defaultE: Option[Expr] = scala.None
      var defaultRaw: Option[String] = scala.None
      var defaultAlways = false
      var assertE: Option[Expr] = scala.None
      var assertRaw = ""
      var readonly = false
      var referenceRaw: Option[String] = scala.None
      var comment: Option[String] = scala.None
      var perms = Defs.fieldPermsDefault
      var go = true
      while (go) {
        if (kw("FLEXIBLE")) {
          // FLEXIBLE is a TYPE suffix since 2.x (flexible_deprecated)
          if (peekKw("TYPE")) fail("FLEXIBLE must be specified after TYPE")
          flexible = true
        }
        else if (kw("TYPE")) {
          ws(); val p0 = pos; kindAnn = Some(kind()); kindRaw = Some(src.substring(p0, pos).trim)
          if (kw("FLEXIBLE")) {
            // only meaningful on types containing a schemaless object
            if (!kindAnn.exists(kindContainsObject))
              fail("FLEXIBLE can only be used with types containing object")
            flexible = true
          }
        }
        else if (kw("VALUE")) { val (e, r) = exprWithRaw(); valueE = Some(e); valueRaw = Some(floatRaw(e, r)) }
        else if (kw("COMPUTED")) { val (e, r) = exprWithRaw(); computedE = Some(e); computedRaw = Some(floatRaw(e, r)) }
        else if (kw("DEFAULT")) {
          defaultAlways = kw("ALWAYS")
          val (e, r) = exprWithRaw(); defaultE = Some(e); defaultRaw = Some(floatRaw(e, r))
        }
        else if (kw("ASSERT")) { val p0 = pos; assertE = Some(expr()); assertRaw = src.substring(p0, pos).trim }
        else if (kw("READONLY")) readonly = true
        else if (kw("REFERENCE")) {
          val p0 = pos
          while (!eof && peekc != ';' && !peekKw("PERMISSIONS") && !peekKw("COMMENT") &&
            !peekKw("TYPE") && !peekKw("VALUE") && !peekKw("DEFAULT") && !peekKw("ASSERT") &&
            !peekKw("READONLY") && !peekKw("COMPUTED") && !peekKw("FLEXIBLE")) pos += 1
          referenceRaw = Some(src.substring(p0, pos).trim)
        }
        else if (kw("PERMISSIONS")) perms = permsClauses(Defs.fieldPermsDefault)
        else if (kw("COMMENT")) comment = Some(commentStr())
        else go = false
      }
      val meta = Defs.FieldDef(fieldName, tbl, flexible, kindRaw, defaultRaw, defaultAlways,
        readonly, valueRaw, Some(assertRaw).filter(_.nonEmpty), computedRaw, referenceRaw,
        comment, perms)
      return DefineFieldStmt(fieldName, tbl, kindAnn, flexible, valueE, defaultE,
        defaultAlways, assertE, assertRaw, readonly, Some(meta), mode, computedE)
    }
    if (what == "INDEX") {
      val idxName = name
      expectKw("ON"); kw("TABLE")
      val tbl = defName()
      val fields = ArrayBuffer[String]()
      if (kw("FIELDS") || kw("COLUMNS")) {
        var g = true
        while (g) {
          var f = idiomName()
          // type::field($p) / type::fields($p) items evaluate at define
          // time — stored as markers the executor expands with the env
          // (parameterized/schema/index)
          ws()
          if (f == "type" && peekSym("::")) {
            sym("::")
            val which = rawIdent().toLowerCase
            ws(); expectSym("(")
            val e0 = pos
            var dep = 1
            while (!eof && dep > 0) {
              val c = peekc
              if (c == '(') dep += 1
              else if (c == ')') dep -= 1
              if (dep > 0) pos += 1
            }
            val inner = src.substring(e0, pos).trim
            expectSym(")")
            f = " " + which + ":" + inner
            fields += f
            g = sym(",")
          } else {
          while (peekc == '(' || peekc == '[') {
            if (peekc == '(') { pos += 1; ws(); expectSym(")"); f += "()" }
            else {
              pos += 1; ws()
              if (peekc == '*') { pos += 1; ws(); expectSym("]"); f += "[*]" }
              else {
                val d0 = pos
                while (!eof && peekc.isDigit) pos += 1
                val digits = src.substring(d0, pos)
                ws(); expectSym("]")
                f += s"[$digits]"
              }
            }
            if (peekSym(".") && !peekSym("..")) { sym("."); f += "." + idiomName() }
            ws()
          }
          // flatten marker: the index entry takes the flattened array as ONE
          // value instead of fanning per element (tags… / emails...)
          if (sym("…") || sym("...")) f += "…"
          fields += f
          g = sym(",")
          }
        }
      }
      ws()
      val t0 = pos
      var depth = 0
      while (!eof && !(depth == 0 && peekc == ';')) {
        val c = peekc
        if (c == '{' || c == '(' || c == '[') depth += 1
        if (c == '}' || c == ')' || c == ']') depth -= 1
        pos += 1
      }
      var tail = src.substring(t0, pos).trim.replaceAll("\\s+", " ")
      // canonical render: BM25 with no explicit params shows the reference's
      // defaults (k1=1.2, b=0.75 — catalog render of SearchParams)
      tail = tail.replaceAll("(?i)\\bBM25\\b(?!\\s*\\()", "BM25(1.2,0.75)")
      val tailU0 = tail.toUpperCase
      if (tailU0.startsWith("COUNT") && fields.nonEmpty)
        fail("COUNT indexes do not take FIELDS")
      if (fields.isEmpty && !tailU0.startsWith("COUNT"))
        fail("expected FIELDS")
      if (tailU0.startsWith("FULLTEXT") && fields.length > 1)
        fail("FULLTEXT indexes take exactly one field")
      val concurrently = tail.toUpperCase.contains("CONCURRENTLY")
      if (concurrently)
        tail = tail.replaceAll("(?i)\\s*\\bCONCURRENTLY\\b\\s*", " ").trim
      val unique = tail.toUpperCase.startsWith("UNIQUE")
      val meta = Defs.IndexDef(idxName, tbl, fields.toSeq, tail)
      return DefineIndexStmt(idxName, tbl, fields.toSeq, unique, Some(meta), mode, concurrently)
    }
    if (what == "PARAM") {
      // VALUE is optional — a bare DEFINE PARAM stores NONE
      // (upgrade/define/param: `DEFINE PARAM $comment COMMENT "…"`)
      val (v, raw) =
        if (kw("VALUE")) exprWithRaw()
        else (Lit(VNone): Expr, "NONE")
      var permTxt = "FULL"
      var pComment: Option[String] = scala.None
      var goP = true
      while (goP) {
        if (kw("PERMISSIONS")) {
          permTxt =
            if (kw("NONE")) "NONE"
            else if (kw("FULL")) "FULL"
            else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim }
        }
        else if (kw("COMMENT")) pComment = Some(commentStr())
        else goP = false
      }
      return DefineParamStmt(Defs.ParamDef(name, floatRaw(v, raw), pComment, permTxt), Some(v), mode)
    }
    // consume the remainder of the statement (balanced braces/parens)
    val sb = new StringBuilder
    var depth = 0
    while (!eof && !(depth == 0 && peekc == ';')) {
      val c = peekc
      if (c == '{' || c == '(' || c == '[') depth += 1
      if (c == '}' || c == ')' || c == ']') depth -= 1
      if (c == '\'' || c == '"') { // skip strings
        val q = c; sb.append(c); pos += 1
        while (!eof && peekc != q) { if (peekc == '\\') { sb.append(peekc); pos += 1 }; sb.append(peekc); pos += 1 }
      }
      sb.append(peekc); pos += 1
    }
    DefineStmt(what, name, Map.empty, src.substring(start, pos))
  }

  private def defineTableStmt(mode: String): Statement = {
    val name = defName()
    var d = Defs.TableDef(name)
    var typeSet = false
    var go = true
    while (go) {
      if (kw("DROP")) d = d.copy(drop = true)
      else if (kw("SCHEMALESS")) d = d.copy(full = false)
      else if (kw("SCHEMAFULL") || kw("SCHEMAFUL")) {
        // SCHEMAFULL without an explicit TYPE implies TYPE NORMAL
        // (syn/parser/stmt/define.rs t!("SCHEMAFULL"))
        d = d.copy(full = true)
        if (!typeSet) d = d.copy(ttype = "NORMAL")
      }
      else if (kw("TYPE")) {
        typeSet = true
        if (kw("ANY")) d = d.copy(ttype = "ANY")
        else if (kw("NORMAL")) d = d.copy(ttype = "NORMAL")
        else if (kw("RELATION")) {
          d = d.copy(ttype = "RELATION")
          var g2 = true
          while (g2) {
            if (kw("IN") || kw("FROM")) {
              val ts = ArrayBuffer[String]()
              var g = true
              while (g) { ts += rawIdent(); g = sym("|") }
              d = d.copy(relIn = ts.toSeq)
            } else if (kw("OUT") || kw("TO")) {
              val ts = ArrayBuffer[String]()
              var g = true
              while (g) { ts += rawIdent(); g = sym("|") }
              d = d.copy(relOut = ts.toSeq)
            } else if (kw("ENFORCED")) d = d.copy(enforced = true)
            else g2 = false
          }
        }
      }
      else if (peekKw("AS")) {
        kw("AS")
        ws()
        sym("(")
        ws()
        val p0 = pos
        expectKw("SELECT")
        val sel = selectStmt()
        // canonical view text: normalize whitespace + uppercase the AS keyword
        val raw = src.substring(p0, pos).trim.replaceAll("\\s+", " ").replaceAll("\\bas\\b", "AS")
        sym(")")
        d = d.copy(view = Some(raw), viewStmt = Some(sel))
      }
      else if (kw("CHANGEFEED")) {
        val p0 = pos
        expr()
        if (kw("INCLUDE")) kw("ORIGINAL")
        d = d.copy(changefeed = Some(src.substring(p0, pos).trim))
      }
      else if (kw("PERMISSIONS")) d = d.copy(perms = permsClauses(Defs.tablePermsDefault))
      else if (kw("COMMENT")) d = d.copy(comment = Some(commentStr()))
      else go = false
    }
    DefineTableStmt(d, mode)
  }

  private def defineEventStmt(mode: String): Statement = {
    val name = defName()
    expectKw("ON"); kw("TABLE")
    val tbl = defName()
    val async = kw("ASYNC")
    var retry: Option[Long] = scala.None
    var maxDepth: Option[Long] = scala.None
    var go2 = true
    while (go2) {
      if (peekKw("RETRY")) {
        if (!async) fail("RETRY must be set after ASYNC")
        kw("RETRY"); retry = Some(intLit())
      } else if (peekKw("MAXDEPTH")) {
        if (!async) fail("MAXDEPTH must be set after ASYNC")
        kw("MAXDEPTH"); maxDepth = Some(intLit())
      } else go2 = false
    }
    var whenRaw = "true"
    var whenE: Option[Expr] = scala.None
    if (kw("WHEN")) { val (e, r) = exprWithRaw(); whenE = Some(e); whenRaw = r }
    expectKw("THEN")
    ws()
    val t0 = pos
    val thenEs = ArrayBuffer[Expr]()
    thenEs += (if (peekc == '{') blockExpr() else exprOrStatement())
    while (sym(",")) thenEs += (if ({ ws(); peekc == '{' }) blockExpr() else exprOrStatement())
    val thenRaw = src.substring(t0, pos).trim
    val comment = if (kw("COMMENT")) Some(commentStr()) else scala.None
    DefineEventStmt(Defs.EventDef(name, tbl, whenRaw, thenRaw, whenE, thenEs.toSeq,
      async, retry, maxDepth, comment), mode)
  }

  private def defineUserStmt(mode: String): Statement = {
    val name = defName()
    expectKw("ON")
    val level =
      if (kw("ROOT")) "ROOT"
      else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
      else { kw("DATABASE"); kw("DB"); "DATABASE" }
    // no PASSWORD/PASSHASH clause leaves an empty passhash (the reference
    // only hashes when given a password — upgrade/define/user_base)
    var hash = ""
    var roles = Seq("VIEWER")
    var durToken = "1h"
    var durSession = "NONE"
    var uComment: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("PASSWORD")) { hash = fakePasshash(stringLit()._1) }
      else if (kw("PASSHASH")) { hash = stringLit()._1 }
      else if (kw("ROLES")) {
        val rs = ArrayBuffer[String]()
        var g = true
        while (g) { rs += rawIdent().toUpperCase; g = sym(",") }
        roles = rs.toSeq
      }
      else if (kw("DURATION")) {
        var g2 = true
        while (g2) {
          if (kw("FOR")) {
            if (kw("TOKEN")) durToken = accessDurVal().getOrElse("NONE")
            else if (kw("SESSION")) durSession = accessDurVal().getOrElse("NONE")
            sym(",")
          } else g2 = false
        }
      }
      else if (kw("COMMENT")) uComment = Some(commentStr())
      else go = false
    }
    DefineUserStmt(Defs.UserDef(name, level, hash, roles, durToken, durSession, uComment), mode)
  }

  private def defineNamespaceLike(what: String, mode: String): Statement = {
    val name = defName()
    var comment: Option[String] = scala.None
    var strict = false
    var go = true
    while (go) {
      if (kw("COMMENT")) comment = Some(commentStr())
      else if (kw("CHANGEFEED")) { expr(); if (kw("INCLUDE")) kw("ORIGINAL") }
      else if (kw("STRICT")) strict = true
      else go = false
    }
    DefineRawStmt(what, name, if (strict) "STRICT" else "", mode, scala.None, comment)
  }

  /** One FILTER spec, canonicalized: name uppercase, numeric args joined
    * with "," (no space), string args single-quoted, keyword args uppercase
    * (sql/filter.rs fmt_sql). */
  private def filterSpec(): String = {
    val nm = rawIdent().toUpperCase
    ws()
    if (peekc == '(') {
      pos += 1
      val args = ArrayBuffer[String]()
      ws()
      if (peekc != ')') {
        var g = true
        while (g) {
          ws()
          if (peekc == '\'' || peekc == '"') args += Render.sql(VStr(stringLit()._1))
          else if (peekc.isDigit) {
            val d0 = pos; while (!eof && peekc.isDigit) pos += 1
            args += src.substring(d0, pos)
          } else args += rawIdent().toUpperCase
          g = sym(",")
        }
      }
      ws(); if (peekc == ')') pos += 1
      s"$nm(${args.mkString(",")})"
    } else nm
  }

  /** A comma-separated middleware list: `fn::x(args), api::req::body('json')`.
    * Each entry keeps (full name, parsed args, canonical rendered call). */
  private def middlewareList(): Seq[(String, Seq[Expr], String)] = {
    val buf = ArrayBuffer[(String, Seq[Expr], String)]()
    var go = true
    while (go) {
      ws()
      val nb = new StringBuilder(rawIdent())
      while (src.startsWith("::", pos)) { pos += 2; nb.append("::").append(rawIdent()) }
      ws()
      val a0 = pos
      val argEs = ArrayBuffer[Expr]()
      expectSym("(")
      ws()
      if (peekc != ')') {
        var g = true
        while (g) { argEs += expr(); g = sym(",") }
      }
      expectSym(")")
      val rawArgs = Defs.normRaw(src.substring(a0, pos))
      buf += ((nb.toString, argEs.toSeq, nb.toString + rawArgs))
      go = sym(",")
    }
    buf.toSeq
  }

  /** PERMISSIONS value for API clauses: FULL | NONE | WHERE <cond>. */
  private def permSpec(): String =
    if (kw("FULL")) "FULL"
    else if (kw("NONE")) "NONE"
    else if (kw("WHERE")) { val (_, r) = exprWithRaw(); "WHERE " + Defs.normRaw(r) }
    else { val (_, r) = exprWithRaw(); "WHERE " + Defs.normRaw(r) }

  /** DEFINE API '<path>' (FOR methods [MIDDLEWARE …] [PERMISSIONS …] THEN
    * <block>)* [COMMENT …] — sql/statements/define/api.rs. */
  private def defineApiStmt(mode: String): Statement = {
    ws()
    val pathE = expr()
    val clauses = ArrayBuffer[ApiClause]()
    var comment: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("FOR")) {
        val ms = ArrayBuffer[String]()
        var g = true
        while (g) { ms += rawIdent().toLowerCase; g = sym(",") }
        var mws: Seq[(String, Seq[Expr], String)] = Nil
        var permsRaw: Option[String] = scala.None
        var g2 = true
        while (g2) {
          if (kw("MIDDLEWARE")) mws = middlewareList()
          else if (kw("PERMISSIONS")) permsRaw = Some(permSpec())
          else g2 = false
        }
        if (kw("THEN")) {
          ws()
          val b0 = pos
          val action = blockExpr()
          val actionRaw = src.substring(b0, pos)
          clauses += ApiClause(ms.toSeq, mws, permsRaw, Some(action), actionRaw)
        } else clauses += ApiClause(ms.toSeq, mws, permsRaw, scala.None, "")
      } else if (kw("COMMENT")) comment = Some(commentStr())
      else go = false
    }
    DefineApiStmt(pathE, clauses.toSeq, comment, mode)
  }

  private def defineAnalyzerStmt(mode: String): Statement = {
    val name = defName()
    var function: Option[String] = scala.None
    var tokenizers: Option[Seq[String]] = scala.None
    var filters: Option[Seq[String]] = scala.None
    var go = true
    while (go) {
      if (kw("FUNCTION")) {
        val nb = new StringBuilder(rawIdent())
        while (src.startsWith("::", pos)) { pos += 2; nb.append("::").append(rawIdent()) }
        function = Some(nb.toString)
      } else if (kw("TOKENIZERS")) {
        val ts = ArrayBuffer[String]()
        var g = true
        while (g) { ts += rawIdent().toUpperCase; g = sym(",") }
        tokenizers = Some(ts.toSeq)
      } else if (kw("FILTERS")) {
        val fs = ArrayBuffer[String]()
        var g = true
        while (g) { fs += filterSpec(); g = sym(",") }
        filters = Some(fs.toSeq)
      } else go = false
    }
    val comment = if (kw("COMMENT")) Some(commentStr()) else scala.None
    DefineAnalyzerStmt(Defs.AnalyzerDef(name, function, tokenizers, filters, comment), mode)
  }

  /** A KEY value: string literal or `$param` reference (kept as raw text —
    * keys are redacted in renders, only equality between clauses matters). */
  private def keyVal(): String = {
    ws()
    if (peekc == '$') { pos += 1; "$" + rawIdent() } else stringLit()._1
  }

  /** One access duration value: NONE or a canonicalized duration literal. */
  private def accessDurVal(): Option[String] = {
    if (kw("NONE")) scala.None
    else {
      ws()
      if (peekc == '$') { pos += 1; Some("$" + rawIdent()) }
      else expr() match {
        case Lit(d: VDur) => Some(Render.sql(d))
        case _            => fail("expected a duration"); scala.None
      }
    }
  }

  /** DEFINE ACCESS tail after `name ON level`: TYPE …, AUTHENTICATE,
    * DURATION, COMMENT (syn/parser/stmt/define.rs; access_type.rs ToSql). */
  private def defineAccessTail(name: String, level: String, mode: String): Statement = {
    var algorithm: Option[String] = scala.None
    var keyRaw: Option[String] = scala.None
    var issuerKeyRaw: Option[String] = scala.None
    var canTokens = true

    var issuerAlg: Option[String] = scala.None
    // ALGORITHM alg KEY key | URL url, then optional WITH ISSUER [ALGORITHM a] KEY key
    def issuerClause(sb: StringBuilder): Unit = {
      expectKw("ISSUER")
      if (kw("ALGORITHM")) issuerAlg = Some(rawIdent().toUpperCase)
      expectKw("KEY")
      issuerKeyRaw = Some(keyVal())
      sb.append(" WITH ISSUER KEY '[REDACTED]'")
    }
    def jwtTail(): String = {
      val sb = new StringBuilder
      if (kw("URL")) {
        val u = stringLit()._1
        sb.append("URL ").append(Render.sql(VStr(u)))
        canTokens = false
        if (kw("WITH")) { issuerClause(sb); canTokens = true }
      } else if (kw("ALGORITHM")) {
        val alg = rawIdent().toUpperCase
        algorithm = Some(alg)
        val key = if (kw("KEY")) keyVal() else ""
        keyRaw = Some(key)
        sb.append("ALGORITHM ").append(alg).append(" KEY '[REDACTED]'")
        val symmetric = alg.startsWith("HS")
        if (kw("WITH")) issuerClause(sb)
        else if (symmetric) {
          // symmetric algorithms can always issue with the verification key
          issuerKeyRaw = Some(key)
          sb.append(" WITH ISSUER KEY '[REDACTED]'")
        }
        canTokens = symmetric || issuerKeyRaw.isDefined
      } else {
        // defaults to HS512 with a generated key (access_type.rs JwtAccess::default)
        algorithm = Some("HS512")
        sb.append("ALGORITHM HS512 KEY '[REDACTED]' WITH ISSUER KEY '[REDACTED]'")
      }
      sb.toString
    }

    var kind = "RECORD"
    var typeRendered = ""
    var bearerSubject = ""
    var canGrants = false
    var signupR: Option[String] = scala.None
    var signinR: Option[String] = scala.None
    expectKw("TYPE")
    if (kw("JWT")) {
      kind = "JWT"
      typeRendered = "JWT " + jwtTail()
      canGrants = false
    } else if (kw("BEARER")) {
      kind = "BEARER"; canGrants = true; canTokens = true
      expectKw("FOR")
      bearerSubject = if (kw("RECORD")) "RECORD" else { expectKw("USER"); "USER" }
      typeRendered = s"BEARER FOR $bearerSubject"
    } else {
      expectKw("RECORD")
      kind = "RECORD"
      val sb = new StringBuilder("RECORD")
      var refresh = false
      var jwtR: Option[String] = scala.None
      var go = true
      while (go) {
        if (kw("SIGNUP")) { val (_, r) = exprWithRaw(); signupR = Some(r); sb.append(" SIGNUP ").append(Defs.normRaw(r)) }
        else if (kw("SIGNIN")) { val (_, r) = exprWithRaw(); signinR = Some(r); sb.append(" SIGNIN ").append(Defs.normRaw(r)) }
        else if (kw("WITH")) {
          if (kw("REFRESH")) refresh = true
          else { expectKw("JWT"); jwtR = Some(jwtTail()) }
        } else go = false
      }
      if (refresh) { sb.append(" WITH REFRESH"); canGrants = true }
      sb.append(" WITH JWT ").append(jwtR.getOrElse {
        algorithm = Some("HS512")
        "ALGORITHM HS512 KEY '[REDACTED]' WITH ISSUER KEY '[REDACTED]'"
      })
      canTokens = true
      typeRendered = sb.toString
    }
    var authRaw: Option[String] = scala.None
    var durGrant: Option[String] = Some("4w2d")
    var durToken: Option[String] = Some("1h")
    var durSession: Option[String] = scala.None
    var comment: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("AUTHENTICATE")) { val (_, r) = exprWithRaw(); authRaw = Some(Defs.normRaw(r)) }
      else if (kw("DURATION")) {
        while (kw("FOR")) {
          if (kw("GRANT")) durGrant = accessDurVal()
          else if (kw("TOKEN")) durToken = accessDurVal()
          else { expectKw("SESSION"); durSession = accessDurVal() }
          sym(",")
        }
      }
      else if (kw("COMMENT")) comment = Some(commentStr())
      else go = false
    }
    DefineAccessStmt(Defs.AccessDef(name, level, kind, typeRendered, bearerSubject,
      canGrants, canTokens, authRaw, durGrant, durToken, durSession, comment,
      signupR, signinR),
      mode, issuerKeyRaw, keyRaw, algorithm, issuerAlg)
  }

  /** DEFINE BUCKET name [READONLY] [BACKEND expr] [PERMISSIONS perm]
    * [COMMENT expr] — sql/statements/define/bucket.rs. */
  private def defineBucketStmt(mode: String): Statement = {
    val name = defName()
    var backend: Option[Expr] = scala.None
    var readonly = false
    var perm = "FULL"
    var comment: Option[Expr] = scala.None
    var go = true
    while (go) {
      if (kw("READONLY")) readonly = true
      else if (kw("BACKEND")) backend = Some(expr())
      else if (kw("PERMISSIONS")) perm = permSpec()
      else if (kw("COMMENT")) comment = Some(expr())
      else go = false
    }
    DefineBucketStmt(name, backend, readonly, perm, comment, mode)
  }

  private def defineSequenceStmt(mode: String): Statement = {
    val name = defName()
    val d = Defs.SequenceDef(name)
    // clause values evaluate at define time (params allowed —
    // parameterized/schema/sequence)
    var batchE, startE, timeoutE: Option[Expr] = scala.None
    var go = true
    while (go) {
      if (kw("BATCH")) batchE = Some(expr())
      else if (kw("START")) startE = Some(expr())
      else if (kw("TIMEOUT")) timeoutE = Some(expr())
      else go = false
    }
    DefineSequenceStmt(d, mode, batchE, startE, timeoutE)
  }

  private def removeStmt(): Statement = {
    val what = rawIdent().toUpperCase
    val ifExists = if (kw("IF")) { expectKw("EXISTS"); true } else false
    val name = if (peekSym("$")) {
        sym("$")
        if (what == "PARAM") rawIdent() else "$" + rawIdent()
      }
      else if (peekc == '"' || peekc == '\'') stringLit()._1 // REMOVE API "/path"
      else {
        val nb = new StringBuilder(tryIdent().getOrElse(""))
        while (src.startsWith("::", pos)) { pos += 2; nb.append("::").append(rawIdent()) }
        // REMOVE FIELD takes a full path (document.visible, tags[*], a.*.b)
        if (what == "FIELD") {
          var go2 = true
          while (go2) {
            if (peekc == '.') {
              pos += 1; ws()
              if (peekc == '*') { pos += 1; nb.append(".*") }
              else nb.append('.').append(rawIdent())
            } else if (peekc == '[') {
              val j = src.indexOf(']', pos)
              if (j > 0) { nb.append(src.substring(pos, j + 1)); pos = j + 1 }
              else go2 = false
            } else go2 = false
          }
        }
        nb.toString
      }
    var onTable: Option[String] = scala.None
    if (kw("ON")) {
      if (kw("ROOT")) onTable = Some("ROOT")
      else if (kw("NAMESPACE") || kw("NS")) onTable = Some("NAMESPACE")
      else if (kw("DATABASE") || kw("DB")) onTable = Some("DATABASE")
      else { kw("TABLE"); ws(); onTable = if (peekc == '$' || isIdentStart(peekc) || peekc == '`' || peekc == '\u27e8') Some(defName()) else scala.None }
    }
    while (!eof && peekc != ';') pos += 1
    RemoveStmt(what, name, onTable, ifExists)
  }

  private def alterStmt(): Statement = {
    val what = rawIdent().toUpperCase
    what match {
      case "TABLE"    => alterTableTail()
      case "FUNCTION" => alterFunctionTail()
      case "EVENT"    => alterEventTail()
      case "FIELD"    => alterFieldTail()
      case "INDEX"    => alterIndexTail()
      case "PARAM"    => alterParamTail()
      case "ANALYZER" => alterAnalyzerTail()
      case "ACCESS"   => alterAccessTail()
      case "BUCKET"   => alterBucketTail()
      case "API"      => alterApiTail()
      case "CONFIG"   => alterConfigTail()
      case "SYSTEM"   => alterSystemTail()
      case "USER"     => alterUserTail()
      case "NAMESPACE" | "NS" => expectKw("COMPACT"); AlterCompactStmt("NAMESPACE")
      case "DATABASE" | "DB"  => expectKw("COMPACT"); AlterCompactStmt("DATABASE")
      case "SEQUENCE" =>
        // ALTER SEQUENCE name TIMEOUT dur|NONE (alter/sequence.rs)
        val ifEx = alterIfExists()
        val name = defName()
        var timeout: Option[Option[String]] = scala.None
        if (kw("TIMEOUT")) {
          ws()
          if (kw("NONE")) timeout = Some(scala.None)
          else {
            val t0 = pos
            while (!eof && !peekc.isWhitespace && peekc != ';') pos += 1
            timeout = Some(Some(src.substring(t0, pos)))
          }
        }
        AlterSequenceStmt(name, ifEx, timeout)
      case other => fail(s"unexpected ALTER target $other"); null
    }
  }

  /** `COMMENT s` or (after a consumed DROP) drop marker helpers. */
  private def alterIfExists(): Boolean =
    if (kw("IF")) { expectKw("EXISTS"); true } else false

  private def alterTableTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    var drop: Option[Boolean] = scala.None
    var full: Option[Boolean] = scala.None
    var ttype: Option[(String, Seq[String], Seq[String], Boolean)] = scala.None
    var perms: Option[Seq[(String, String)]] = scala.None
    var comment: Option[Option[String]] = scala.None
    var changefeed: Option[Option[String]] = scala.None
    var compact = false
    var go = true
    while (go) {
      if (kw("COMPACT")) compact = true
      else if (kw("DROP")) {
        if (kw("COMMENT")) comment = Some(scala.None)
        else if (kw("CHANGEFEED")) changefeed = Some(scala.None)
        else if (kw("FALSE")) drop = Some(false)
        else { kw("TRUE"); drop = Some(true) }
      }
      else if (kw("SCHEMALESS")) full = Some(false)
      else if (kw("SCHEMAFULL")) full = Some(true)
      else if (kw("TYPE")) {
        if (kw("ANY")) ttype = Some(("ANY", Nil, Nil, false))
        else if (kw("NORMAL")) ttype = Some(("NORMAL", Nil, Nil, false))
        else if (kw("RELATION")) {
          var relIn = Seq.empty[String]
          var relOut = Seq.empty[String]
          var enforced = false
          var g2 = true
          while (g2) {
            if (kw("IN") || kw("FROM")) {
              val ts = ArrayBuffer[String]()
              var g = true
              while (g) { ts += rawIdent(); g = sym("|") }
              relIn = ts.toSeq
            } else if (kw("OUT") || kw("TO")) {
              val ts = ArrayBuffer[String]()
              var g = true
              while (g) { ts += rawIdent(); g = sym("|") }
              relOut = ts.toSeq
            } else if (kw("ENFORCED")) enforced = true
            else g2 = false
          }
          ttype = Some(("RELATION", relIn, relOut, enforced))
        }
      }
      else if (kw("PERMISSIONS")) perms = Some(permsClauses(Defs.tablePermsDefault))
      else if (kw("COMMENT")) {
        if (kw("NONE")) comment = Some(scala.None)
        else comment = Some(Some(stringLit()._1))
      }
      else if (kw("CHANGEFEED")) {
        if (kw("NONE")) changefeed = Some(scala.None)
        else { val (_, r) = exprWithRaw(); if (kw("INCLUDE")) kw("ORIGINAL"); changefeed = Some(Some(r)) }
      }
      else go = false
    }
    AlterTableStmt(name, ifExists, drop, full, ttype, perms, comment, changefeed, compact)
  }

  private def alterFunctionTail(): Statement = {
    val ifExists = alterIfExists()
    val nb = new StringBuilder(rawIdent())
    while (src.startsWith("::", pos)) { pos += 2; nb.append("::").append(rawIdent()) }
    val name = nb.toString
    var redefine: Option[DefineFunctionStmt] = scala.None
    ws()
    if (peekc == '(') {
      val pr0 = pos
      expectSym("(")
      val params = ArrayBuffer[(String, Option[Kind])]()
      ws()
      if (peekc != ')') {
        var g = true
        while (g) {
          expectSym("$"); val n = rawIdent()
          val k = if (sym(":")) Some(kind()) else scala.None
          params += ((n, k)); g = sym(",")
        }
      }
      expectSym(")")
      val paramsRaw = src.substring(pr0, pos)
      ws()
      var returnsRaw: Option[String] = scala.None
      if (sym("->")) { ws(); val r0 = pos; kind(); returnsRaw = Some(src.substring(r0, pos).trim) }
      ws()
      val b0 = pos
      val body = blockExpr()
      val bodyRaw = src.substring(b0, pos)
      redefine = Some(DefineFunctionStmt(name, params.toSeq, body, paramsRaw, bodyRaw,
        "overwrite", scala.None, returnsRaw))
    }
    var comment: Option[Option[String]] = scala.None
    var perms: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) { expectKw("COMMENT"); comment = Some(scala.None) }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else if (kw("PERMISSIONS")) {
        perms = Some(
          if (kw("FULL")) "FULL"
          else if (kw("NONE")) "NONE"
          else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim })
      }
      else go = false
    }
    AlterFunctionStmt(name, ifExists, redefine, comment, perms)
  }

  private def alterEventTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    expectKw("ON"); kw("TABLE")
    val tbl = defName()
    var when: Option[(Expr, String)] = scala.None
    var thenE: Option[(Seq[Expr], String)] = scala.None
    var comment: Option[Option[String]] = scala.None
    var async: Option[Boolean] = scala.None
    var retry: Option[Long] = scala.None
    var maxDepth: Option[Long] = scala.None
    var go = true
    while (go) {
      if (kw("WHEN")) { val (e, r) = exprWithRaw(); when = Some((e, r)) }
      else if (kw("THEN")) {
        ws()
        val t0 = pos
        val es = ArrayBuffer[Expr]()
        es += (if (peekc == '{') blockExpr() else exprOrStatement())
        while (sym(",")) es += (if ({ ws(); peekc == '{' }) blockExpr() else exprOrStatement())
        thenE = Some((es.toSeq, src.substring(t0, pos).trim))
      }
      else if (kw("DROP")) {
        if (kw("COMMENT")) comment = Some(scala.None)
        else { expectKw("ASYNC"); async = Some(false) }
      }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else if (kw("ASYNC")) async = Some(true)
      else if (kw("RETRY")) retry = Some(intLit())
      else if (kw("MAXDEPTH")) maxDepth = Some(intLit())
      else go = false
    }
    AlterEventStmt(name, tbl, ifExists, when, thenE, comment, async, retry, maxDepth)
  }

  private def alterFieldTail(): Statement = {
    val ifExists = alterIfExists()
    val name = idiomName()
    expectKw("ON"); kw("TABLE")
    val tbl = defName()
    var kindC: Option[Option[(Kind, String)]] = scala.None
    var flexible: Option[Boolean] = scala.None
    var value: Option[Option[(Expr, String)]] = scala.None
    var default: Option[Option[(Expr, String, Boolean)]] = scala.None
    var assertC: Option[Option[(Expr, String)]] = scala.None
    var readonly: Option[Boolean] = scala.None
    var reference: Option[Option[String]] = scala.None
    var comment: Option[Option[String]] = scala.None
    var perms: Option[Seq[(String, String)]] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) {
        if (kw("TYPE")) kindC = Some(scala.None)
        else if (kw("FLEXIBLE")) flexible = Some(false)
        else if (kw("VALUE")) value = Some(scala.None)
        else if (kw("DEFAULT")) default = Some(scala.None)
        else if (kw("ASSERT")) assertC = Some(scala.None)
        else if (kw("READONLY")) readonly = Some(false)
        else if (kw("REFERENCE")) reference = Some(scala.None)
        else { expectKw("COMMENT"); comment = Some(scala.None) }
      }
      else if (kw("FLEXIBLE")) flexible = Some(true)
      else if (kw("TYPE")) {
        ws(); val p0 = pos; val k = kind()
        kindC = Some(Some((k, src.substring(p0, pos).trim)))
      }
      else if (kw("VALUE")) { val (e, r) = exprWithRaw(); value = Some(Some((e, floatRaw(e, r)))) }
      else if (kw("DEFAULT")) {
        val always = kw("ALWAYS")
        val (e, r) = exprWithRaw(); default = Some(Some((e, floatRaw(e, r), always)))
      }
      else if (kw("ASSERT")) { val (e, r) = exprWithRaw(); assertC = Some(Some((e, r))) }
      else if (kw("READONLY")) readonly = Some(true)
      else if (kw("REFERENCE")) {
        val p0 = pos
        while (!eof && peekc != ';' && !peekKw("PERMISSIONS") && !peekKw("COMMENT") &&
          !peekKw("TYPE") && !peekKw("VALUE") && !peekKw("DEFAULT") && !peekKw("ASSERT") &&
          !peekKw("READONLY") && !peekKw("DROP") && !peekKw("FLEXIBLE")) pos += 1
        reference = Some(Some(src.substring(p0, pos).trim))
      }
      else if (kw("PERMISSIONS")) perms = Some(permsClauses(Defs.fieldPermsDefault))
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else go = false
    }
    AlterFieldStmt(name, tbl, ifExists, kindC, flexible, value, default, assertC,
      readonly, reference, comment, perms)
  }

  private def alterIndexTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    expectKw("ON"); kw("TABLE")
    val tbl = defName()
    var comment: Option[Option[String]] = scala.None
    var prepareRemove: Option[Boolean] = scala.None
    var any = false
    var go = true
    while (go) {
      if (kw("DROP")) { expectKw("COMMENT"); comment = Some(scala.None); any = true }
      else if (kw("COMMENT")) { comment = Some(Some(commentStr())); any = true }
      else if (kw("PREPARE")) { expectKw("REMOVE"); prepareRemove = Some(true); any = true }
      else if (kw("CONCURRENTLY")) any = true
      else go = false
    }
    if (!any) fail("Unexpected token `;`, expected `PREPARE`, `DROP` or `COMMENT`")
    AlterIndexStmt(name, tbl, ifExists, comment, prepareRemove)
  }

  private def alterParamTail(): Statement = {
    val ifExists = alterIfExists()
    expectSym("$")
    val name = rawIdent()
    var value: Option[(Expr, String)] = scala.None
    var comment: Option[Option[String]] = scala.None
    var perms: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) { expectKw("COMMENT"); comment = Some(scala.None) }
      else if (kw("VALUE")) { val (e, r) = exprWithRaw(); value = Some((e, floatRaw(e, r))) }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else if (kw("PERMISSIONS")) {
        perms = Some(
          if (kw("FULL")) "FULL"
          else if (kw("NONE")) "NONE"
          else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim })
      }
      else go = false
    }
    AlterParamStmt(name, ifExists, value, comment, perms)
  }

  private def alterAnalyzerTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    var tokenizers: Option[Option[Seq[String]]] = scala.None
    var filters: Option[Option[Seq[String]]] = scala.None
    var comment: Option[Option[String]] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) {
        if (kw("TOKENIZERS")) tokenizers = Some(scala.None)
        else if (kw("FILTERS")) filters = Some(scala.None)
        else { expectKw("COMMENT"); comment = Some(scala.None) }
      }
      else if (kw("TOKENIZERS")) {
        val ts = ArrayBuffer[String]()
        var g = true
        while (g) { ts += rawIdent().toUpperCase; g = sym(",") }
        tokenizers = Some(Some(ts.toSeq))
      }
      else if (kw("FILTERS")) {
        val fs = ArrayBuffer[String]()
        var g = true
        while (g) { fs += filterSpec(); g = sym(",") }
        filters = Some(Some(fs.toSeq))
      }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else go = false
    }
    AlterAnalyzerStmt(name, ifExists, tokenizers, filters, comment)
  }

  private def alterAccessTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    expectKw("ON")
    val level =
      if (kw("ROOT")) "ROOT"
      else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
      else { kw("DATABASE"); kw("DB"); "DATABASE" }
    var auth: Option[Option[String]] = scala.None
    var durGrant: Option[Option[String]] = scala.None
    var durToken: Option[Option[String]] = scala.None
    var durSession: Option[Option[String]] = scala.None
    var comment: Option[Option[String]] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) {
        if (kw("AUTHENTICATE")) auth = Some(scala.None)
        else { expectKw("COMMENT"); comment = Some(scala.None) }
      }
      else if (kw("AUTHENTICATE")) { val (_, r) = exprWithRaw(); auth = Some(Some(Defs.normRaw(r))) }
      else if (kw("DURATION")) {
        while (kw("FOR")) {
          if (kw("GRANT")) durGrant = Some(accessDurVal())
          else if (kw("TOKEN")) durToken = Some(accessDurVal())
          else { expectKw("SESSION"); durSession = Some(accessDurVal()) }
          sym(",")
        }
      }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else go = false
    }
    AlterAccessStmt(name, level, ifExists, auth, durGrant, durToken, durSession, comment)
  }

  private def alterUserTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    expectKw("ON")
    val level =
      if (kw("ROOT")) "ROOT"
      else if (kw("NAMESPACE") || kw("NS")) "NAMESPACE"
      else { kw("DATABASE"); kw("DB"); "DATABASE" }
    var passhash: Option[String] = scala.None
    var roles: Option[Seq[String]] = scala.None
    var durToken: Option[Option[String]] = scala.None
    var durSession: Option[Option[String]] = scala.None
    var comment: Option[Option[String]] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) { expectKw("COMMENT"); comment = Some(scala.None) }
      else if (kw("PASSWORD")) passhash = Some(fakePasshash(stringLit()._1))
      else if (kw("PASSHASH")) passhash = Some(stringLit()._1)
      else if (kw("ROLES")) {
        val rs = ArrayBuffer[String]()
        var g = true
        while (g) { rs += rawIdent().toUpperCase; g = sym(",") }
        roles = Some(rs.toSeq)
      }
      else if (kw("DURATION")) {
        while (kw("FOR")) {
          if (kw("TOKEN")) durToken = Some(accessDurVal())
          else { expectKw("SESSION"); durSession = Some(accessDurVal()) }
          sym(",")
        }
      }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else go = false
    }
    AlterUserStmt(name, level, ifExists, passhash, roles, durToken, durSession, comment)
  }

  private def alterBucketTail(): Statement = {
    val ifExists = alterIfExists()
    val name = defName()
    var readonly: Option[Boolean] = scala.None
    var comment: Option[Option[String]] = scala.None
    var perms: Option[String] = scala.None
    var go = true
    while (go) {
      if (kw("DROP")) {
        if (kw("READONLY")) readonly = Some(false)
        else { expectKw("COMMENT"); comment = Some(scala.None) }
      }
      else if (kw("READONLY")) readonly = Some(true)
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else if (kw("PERMISSIONS")) {
        perms = Some(
          if (kw("FULL")) "FULL"
          else if (kw("NONE")) "NONE"
          else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim })
      }
      else go = false
    }
    AlterBucketStmt(name, ifExists, readonly, comment, perms)
  }

  private def alterApiTail(): Statement = {
    val ifExists = alterIfExists()
    val path = expr()
    var comment: Option[Option[String]] = scala.None
    val clauses = ArrayBuffer[(Seq[String], Option[(Expr, String)])]()
    var go = true
    while (go) {
      if (kw("DROP")) { expectKw("COMMENT"); comment = Some(scala.None) }
      else if (kw("COMMENT")) comment = Some(Some(commentStr()))
      else if (kw("FOR")) {
        val methods = ArrayBuffer[String]()
        var g = true
        while (g) { methods += rawIdent().toLowerCase; g = sym(",") }
        if (kw("DROP")) { expectKw("THEN"); clauses += ((methods.toSeq, scala.None)) }
        else {
          expectKw("THEN")
          ws()
          val t0 = pos
          val e = blockExpr()
          clauses += ((methods.toSeq, Some((e, src.substring(t0, pos).trim))))
        }
      }
      else go = false
    }
    AlterApiStmt(path, ifExists, comment, clauses.toSeq)
  }

  private def alterConfigTail(): Statement = {
    val ifExists = alterIfExists()
    def tfSpec(): String =
      if (kw("AUTO")) "AUTO"
      else if (kw("NONE")) "NONE"
      else {
        val inc = kw("INCLUDE")
        if (inc || kw("EXCLUDE")) {
          val ts = ArrayBuffer[String]()
          var g = true
          while (g) { ts += rawIdent(); g = sym(",") }
          (if (inc) "INCLUDE " else "EXCLUDE ") + ts.mkString(", ")
        } else "NONE"
      }
    if (kw("GRAPHQL")) {
      // TABLES (AUTO|NONE|INCLUDE…) FUNCTIONS (AUTO|NONE|INCLUDE…)
      var tables = "AUTO"
      var functions = "AUTO"
      var go = true
      while (go) {
        if (kw("TABLES")) tables = tfSpec()
        else if (kw("FUNCTIONS")) functions = tfSpec()
        else if (kw("AUTO")) { tables = "AUTO"; functions = "AUTO" }
        else if (kw("NONE")) { tables = "NONE"; functions = "NONE" }
        else go = false
      }
      AlterConfigStmt("graphql", ifExists, s"GRAPHQL TABLES $tables FUNCTIONS $functions")
    } else if (kw("API")) {
      var permTxt = "FULL"
      var go = true
      while (go) {
        if (kw("PERMISSIONS")) {
          permTxt =
            if (kw("NONE")) "NONE"
            else if (kw("FULL")) "FULL"
            else { expectKw("WHERE"); val p0 = pos; expr(); "WHERE " + src.substring(p0, pos).trim }
        } else go = false
      }
      AlterConfigStmt("api", ifExists, s"API PERMISSIONS $permTxt")
    } else {
      expectKw("DEFAULT")
      var ns: Option[String] = scala.None
      var db: Option[String] = scala.None
      var go = true
      while (go) {
        if (kw("NAMESPACE")) ns = Some(rawIdent())
        else if (kw("DATABASE")) db = Some(rawIdent())
        else go = false
      }
      val parts = ns.map(n => s"NAMESPACE $n").toSeq ++ db.map(d => s"DATABASE $d").toSeq
      AlterConfigStmt("default", ifExists, ("DEFAULT" +: parts).mkString(" "))
    }
  }

  private def alterSystemTail(): Statement = {
    var compact = false
    var qt: Option[Option[(Long, Int)]] = scala.None
    var any = false
    var go = true
    while (go) {
      if (kw("COMPACT")) { compact = true; any = true }
      else if (kw("DROP")) { expectKw("QUERY_TIMEOUT"); qt = Some(scala.None); any = true }
      else if (kw("QUERY_TIMEOUT")) {
        expr() match {
          case Lit(VDur(s, n)) => qt = Some(Some((s, n)))
          case _               => fail("expected a duration")
        }
        any = true
      }
      else go = false
    }
    if (!any) fail("Unexpected token `;`, expected `COMPACT`, `DROP` or `QUERY_TIMEOUT`")
    AlterSystemStmt(compact, qt)
  }

  // ---- SELECT ---------------------------------------------------------

  /** SELECT field list (after SELECT, before FROM): returns (fields, isValue). */
  private def fieldsClause(): (Seq[Field], Boolean) = {
    var value = false
    val fields = ArrayBuffer[Field]()
    if (kw("VALUE")) {
      value = true
      val e = expr()
      val alias = if (kw("AS")) Some(rawIdent()) else scala.None
      fields += Field(e, alias)
    } else {
      var go = true
      while (go) {
        ws()
        if (peekc == '*' && !isIdentChar(peekAt(1))) { pos += 1; fields += Field(Idiom(Seq(PAll)), scala.None, isAll = true) }
        else {
          val e = expr()
          val alias = if (kw("AS")) Some(idiomName()) else scala.None
          fields += Field(e, alias)
        }
        go = sym(",")
      }
    }
    (fields.toSeq, value)
  }

  private def selectStmt(): SelectStmt = {
    val (fields0, value) = fieldsClause()
    val fields = ArrayBuffer[Field](fields0: _*)
    val omit = ArrayBuffer[String]()
    if (kw("OMIT")) {
      var go = true
      while (go) { omit ++= omitNames(); go = sym(",") }
    }
    expectKw("FROM")
    val only = kw("ONLY")
    val what = ArrayBuffer[Expr]()
    var goW = true
    while (goW) { what += expr(); goW = sym(",") }
    // WITH INDEX i[, j] / WITH NOINDEX — access-path hints (expr/with.rs)
    var withIndex: Option[Seq[String]] = scala.None
    if (kw("WITH")) {
      if (kw("NOINDEX")) withIndex = Some(Nil)
      else if (kw("NO")) { // WITH NO INDEX (two-token spelling, parts.rs:593)
        if (!kw("INDEX")) fail("expected INDEX after NO")
        withIndex = Some(Nil)
      }
      else if (kw("INDEX")) {
        val names = ArrayBuffer[String]()
        var g = true
        while (g) { names += rawIdent(); g = sym(",") }
        withIndex = Some(names.toSeq)
      }
    }
    val where = if (kw("WHERE")) Some(expr()) else scala.None
    val split = ArrayBuffer[String]()
    if (kw("SPLIT")) { kw("ON"); var g = true; while (g) { split += idiomName(); g = sym(",") } }
    var groupBy: Option[Seq[Expr]] = scala.None
    if (peekKw("GROUP") && split.nonEmpty)
      fail("SPLIT and GROUP are mutually exclusive")
    if (kw("GROUP")) {
      if (kw("ALL")) groupBy = Some(Nil)
      else { kw("BY"); val gs = ArrayBuffer[Expr](); var g = true; while (g) { gs += expr(); g = sym(",") }; groupBy = Some(gs.toSeq) }
    }
    val order = ArrayBuffer[OrderKey]()
    var orderRand = false
    if (kw("ORDER")) {
      kw("BY")
      if (kw("RAND")) { sym("("); sym(")"); orderRand = true }
      else {
        var g = true
        while (g) {
          val e = expr()
          val collate = kw("COLLATE")
          val numeric = kw("NUMERIC")
          val desc = if (kw("DESC")) true else { kw("ASC"); false }
          order += OrderKey(e, desc, collate, numeric)
          g = sym(",")
        }
      }
    }
    var limit: Option[Expr] = scala.None
    var start: Option[Expr] = scala.None
    if (peekKw("START")) {
      kw("START"); kw("AT"); start = Some(expr())
      if (kw("LIMIT")) { kw("BY"); limit = Some(expr()) }
    } else {
      if (kw("LIMIT")) { kw("BY"); limit = Some(expr()) }
      if (kw("START")) { kw("AT"); start = Some(expr()) }
    }
    val fetch = ArrayBuffer[Expr]()
    if (kw("FETCH")) {
      var g = true
      while (g) { fetch += fetchItem(); g = sym(",") }
    }
    val version = if (kw("VERSION")) Some(expr()) else scala.None
    val timeout = if (kw("TIMEOUT")) Some(expr()) else scala.None
    kw("PARALLEL")
    kw("TEMPFILES")
    val explain = kw("EXPLAIN")
    val explainFull = explain && kw("FULL")
    // every GROUP BY idiom must occur in the selection — as a field, inside
    // a field expression, or as an alias ("Missing group idiom `x` in
    // statement selection", parse-time in the reference)
    groupBy.foreach(_.foreach { k =>
      val kName = Eval.fieldName(k)
      val present = fields.exists(f => f.isAll || f.expr == k ||
        f.alias.contains(kName) || exprContains(f.expr, k))
      if (!present) fail(s"Missing group idiom `$kName` in statement selection")
    })
    // every ORDER BY idiom must occur in the selection — as a field, an
    // alias, or an expression's output name; SELECT VALUE orders run on the
    // full row before projection (syn/parser/stmt/parts.rs:166-176)
    if (!value) order.foreach { k =>
      k.expr match {
        case ord: Idiom =>
          val kName = Eval.fieldName(ord)
          val present = fields.exists(f => f.isAll || f.expr == ord ||
            f.alias.contains(kName) || Eval.fieldName(f.expr) == kName)
          if (!present) fail(s"Missing order idiom `$kName` in statement selection")
        case _ => ()
      }
    }
    SelectStmt(fields.toSeq, value, omit.toSeq, only, what.toSeq, where, split.toSeq,
      groupBy, order.toSeq, orderRand, limit, start, fetch.toSeq, version, timeout, explain,
      explainFull, withIndex)
  }

  /** Does the type contain a schemaless `object` anywhere (FLEXIBLE gate)? */
  private def kindContainsObject(k: Kind): Boolean = k match {
    case Kind.KObject           => true
    case Kind.KArray(inner, _)  => inner.exists(kindContainsObject)
    case Kind.KSet(inner, _)    => inner.exists(kindContainsObject)
    case Kind.KEither(kinds)    => kinds.exists(kindContainsObject)
    case Kind.KOption(inner)    => kindContainsObject(inner)
    case Kind.KLiteralArr(its)  => its.exists(kindContainsObject)
    case Kind.KLiteralObj(_)    => true
    case _ => false
  }

  /** Structural containment of a sub-expression (GROUP-idiom validation).
    * A group idiom also matches as a PREFIX of a selected path
    * (`SELECT in.name … GROUP BY in`, reproductions/group_by_in_edge_field). */
  private def exprContains(e: Expr, needle: Expr): Boolean = {
    if (e == needle) return true
    (e, needle) match {
      case (Idiom(parts), Idiom(nparts)) if parts.startsWith(nparts) => return true
      case _ => ()
    }
    e match {
      case Binary(_, l, r) => exprContains(l, needle) || exprContains(r, needle)
      case Prefix(_, i)    => exprContains(i, needle)
      case Cast(_, i)      => exprContains(i, needle)
      case FnCall(_, args) => args.exists(exprContains(_, needle))
      case ArrLit(items)   => items.exists(exprContains(_, needle))
      case ObjLit(fs)      => fs.exists { case (_, v) => exprContains(v, needle) }
      case IfExpr(bs, o)   => bs.exists { case (c, v) => exprContains(c, needle) || exprContains(v, needle) } || o.exists(exprContains(_, needle))
      case Idiom(parts)    => parts.exists {
        case PStart(i) => exprContains(i, needle)
        case PIndex(i) => exprContains(i, needle)
        case PWhere(i) => exprContains(i, needle)
        case _ => false
      }
      case _ => false
    }
  }

  /** OMIT entry: dotted idiom, optionally fanning out over a destructure
    * suffix (`obj.c.{d, f}` → obj.c.d, obj.c.f). */
  private def omitNames(): Seq[String] = {
    val base = new StringBuilder(rawIdent())
    // type::field($p) / type::fields($p) OMIT entries — same define-time
    // marker convention as DEFINE INDEX FIELDS (parameterized/select)
    ws()
    if (base.toString == "type" && peekSym("::")) {
      sym("::")
      val which = rawIdent().toLowerCase
      ws(); expectSym("(")
      val e0 = pos
      var dep = 1
      while (!eof && dep > 0) {
        val c = peekc
        if (c == '(') dep += 1
        else if (c == ')') dep -= 1
        if (dep > 0) pos += 1
      }
      val inner = src.substring(e0, pos).trim
      expectSym(")")
      return Seq(" " + which + ":" + inner)
    }
    var go = true
    while (go) {
      if (peekSym(".") && !peekSym("..")) {
        val save = pos
        sym(".")
        ws()
        if (peekc == '{') {
          pos += 1
          val out = ArrayBuffer[String]()
          var g = true
          while (g) {
            ws()
            if (peekc == '}') g = false
            else {
              out ++= omitNames().map(n => base.toString + "." + n)
              g = sym(",")
            }
          }
          expectSym("}")
          return out.toSeq
        } else if (peekc == '*') { pos += 1; base.append(".*") }
        else base.append('.').append(rawIdent())
      } else go = false
    }
    Seq(base.toString)
  }

  /** One FETCH clause item (sql/statements/select.rs fetch): a plain dotted
    * idiom becomes a string literal; params, string literals and function
    * calls (`type::field`/`type::fields`) stay exprs for runtime resolution. */
  private def fetchItem(): Expr = {
    ws()
    if (peekc == '$' || peekc == '\'' || peekc == '"') expr()
    else {
      val save = pos
      rawIdent()
      ws()
      val isCall = peekc == '(' || (peekc == ':' && pos + 1 < src.length && src.charAt(pos + 1) == ':')
      pos = save
      if (isCall) expr() else Lit(VStr(idiomName()))
    }
  }

  /** A dotted idiom name used in OMIT/SPLIT/FETCH/AS positions. */
  private def idiomName(): String = {
    val sb = new StringBuilder(rawIdent())
    while (peekSym(".") && !peekSym("..")) {
      sym(".")
      ws()
      if (peekc == '*') { pos += 1; sb.append(".*") }
      else sb.append('.').append(rawIdent())
    }
    sb.toString
  }

  // ---- mutations ------------------------------------------------------

  private def targets(): Seq[Expr] = {
    val what = ArrayBuffer[Expr]()
    var go = true
    while (go) { what += expr(); go = sym(",") }
    what.toSeq
  }

  private def dataClause(): Option[Data] = {
    if (kw("SET")) {
      val sets = ArrayBuffer[(Idiom, String, Expr)]()
      var go = true
      while (go) {
        val target = idiomForSet()
        val op =
          if (sym("+?=")) "+?=" else if (sym("+=")) "+=" else if (sym("-=")) "-=" else { expectSym("="); "=" }
        sets += ((target, op, expr()))
        go = sym(",")
      }
      Some(SetData(sets.toSeq))
    }
    else if (kw("UNSET")) {
      val fs = ArrayBuffer[Idiom]()
      var go = true
      while (go) { fs += idiomForSet(); go = sym(",") }
      Some(UnsetData(fs.toSeq))
    }
    else if (kw("CONTENT")) Some(ContentData(expr()))
    else if (kw("MERGE")) Some(MergeData(expr()))
    else if (kw("REPLACE")) Some(ReplaceData(expr()))
    else if (kw("PATCH")) Some(PatchData(expr()))
    else scala.None
  }

  private def idiomForSet(): Idiom = {
    val parts = ArrayBuffer[Part](PField(rawIdent()))
    var go = true
    while (go) {
      if (sym(".")) parts += PField(rawIdent())
      else if (peekSym("[")) { sym("["); val e = expr(); expectSym("]"); parts += PIndex(e) }
      else go = false
    }
    Idiom(parts.toSeq)
  }

  private def output(): Option[Output] = {
    if (kw("RETURN")) {
      if (kw("NONE")) Some(Output.ONone)
      else if (kw("NULL")) Some(Output.ONull)
      else if (kw("DIFF")) Some(Output.ODiff)
      else if (kw("BEFORE")) Some(Output.OBefore)
      else if (kw("AFTER")) Some(Output.OAfter)
      else if (kw("VALUE")) Some(Output.OValue(expr()))
      else {
        val fs = ArrayBuffer[Field]()
        var go = true
        while (go) {
          val e = expr()
          val alias = if (kw("AS")) Some(idiomName()) else scala.None
          fs += Field(e, alias)
          go = sym(",")
        }
        Some(Output.OFields(fs.toSeq))
      }
    } else scala.None
  }

  private def createStmt(): Statement = {
    val only = kw("ONLY")
    val what = targets()
    val data = dataClause()
    val out = output()
    val tmo = if (kw("TIMEOUT")) Some(expr()) else scala.None
    kw("PARALLEL")
    CreateStmt(only, what, data, out, tmo)
  }

  private def updLike(): (Boolean, Seq[Expr], Option[Data], Option[Expr], Option[Output], Boolean, Option[Expr]) = {
    val only = kw("ONLY")
    val what = targets()
    val data = dataClause()
    val where = if (kw("WHERE")) Some(expr()) else scala.None
    val out = output()
    val tmo = if (kw("TIMEOUT")) Some(expr()) else scala.None
    kw("PARALLEL")
    val explain = kw("EXPLAIN")
    kw("FULL")
    (only, what, data, where, out, explain, tmo)
  }

  private def deleteStmt(): Statement = {
    kw("FROM")
    val only = kw("ONLY")
    val what = targets()
    val where = if (kw("WHERE")) Some(expr()) else scala.None
    val out = output()
    val tmo = if (kw("TIMEOUT")) Some(expr()) else scala.None
    kw("PARALLEL")
    val explain = kw("EXPLAIN")
    kw("FULL")
    DeleteStmt(only, what, where, out, explain, tmo)
  }

  private def insertStmt(): Statement = {
    val relation = kw("RELATION")
    val ignore = kw("IGNORE")
    val into = if (kw("INTO")) Some[Expr] {
      ws()
      if (peekc == '$') { pos += 1; Param(rawIdent()) }
      else if (peekc == '(') { val e = primary(); e }
      else TableRef(rawIdent())
    } else scala.None
    val values: Expr =
      if (peekSym("(") && { val save = pos; sym("("); val isSel = peekKw("SELECT"); pos = save; isSel }) {
        // INSERT INTO t (SELECT …) — subquery source
        expectSym("(")
        val sel = Subquery(statement())
        expectSym(")")
        sel
      } else if (peekSym("(")) {
        // (col, col) VALUES (v, v), (v, v)
        expectSym("(")
        val cols = ArrayBuffer[String]()
        var g = true
        while (g) { cols += idiomName(); g = sym(",") }
        expectSym(")")
        expectKw("VALUES")
        val rows = ArrayBuffer[Expr]()
        var gr = true
        while (gr) {
          expectSym("(")
          val vals = ArrayBuffer[Expr]()
          var gv = true
          while (gv) { vals += expr(); gv = sym(",") }
          expectSym(")")
          rows += ObjLit(cols.toSeq.zip(vals.toSeq))
          gr = sym(",")
        }
        ArrLit(rows.toSeq)
      } else expr()
    val onDup = if (kw("ON")) {
      expectKw("DUPLICATE"); expectKw("KEY"); expectKw("UPDATE")
      val sets = ArrayBuffer[(Idiom, String, Expr)]()
      var g = true
      while (g) {
        val t = idiomForSet()
        val op = if (sym("+?=")) "+?=" else if (sym("+=")) "+=" else if (sym("-=")) "-=" else { expectSym("="); "=" }
        sets += ((t, op, expr()))
        g = sym(",")
      }
      Some(sets.toSeq)
    } else scala.None
    val out = output()
    InsertStmt(ignore, into, values, onDup, relation, out)
  }

  private def relateStmt(): Statement = {
    val only = kw("ONLY")
    noGraphIdiom = true
    val (from, edge, to) =
      try {
        val f = exprAtLevel(BpRelation + 1)
        expectSym("->")
        val e = exprAtLevel(BpRelation + 1)
        expectSym("->")
        val t = exprAtLevel(BpRelation + 1)
        (f, e, t)
      } finally { noGraphIdiom = false }
    val data = dataClause()
    val out = output()
    RelateStmt(only, from, edge, to, data, out)
  }

  // ---- expressions (Pratt; sql/operator.rs:535 BindingPower) ----------

  final val BpNullish = 1
  final val BpOr = 2
  final val BpAnd = 3
  final val BpEquality = 4
  final val BpRelation = 5
  final val BpRange = 6
  final val BpAddSub = 7
  final val BpMulDiv = 8
  final val BpPower = 9
  final val BpPrefix = 10

  def expr(): Expr = exprAtLevel(1)

  def exprAtLevel(minBp: Int): Expr = {
    var lhs = prefix()
    var go = true
    while (go) {
      ws()
      infixOp(minBp) match {
        case Some((op, bp)) =>
          if (op == "..") {
            // range: rhs optional (`1..`), '=' inclusive (`..=5`)
            val hiIncl = sym("=")
            val hi = if (startsExpr()) Some((exprAtLevel(bp + 1), hiIncl)) else scala.None
            lhs = RangeLit(Some((lhs, true)), hi)
          } else if (op == ">..") {
            val hiIncl = sym("=")
            val hi = if (startsExpr()) Some((exprAtLevel(bp + 1), hiIncl)) else scala.None
            lhs = RangeLit(Some((lhs, false)), hi)
          } else {
            val rhs = exprAtLevel(bp + 1)
            lhs = Binary(op, lhs, rhs)
          }
        case scala.None => go = false
      }
    }
    lhs
  }

  /** Returns (canonical op, binding power) and consumes the operator. */
  private def infixOp(minBp: Int): Option[(String, Int)] = {
    ws()
    def take(tok: String, op: String, bp: Int): Option[(String, Int)] =
      if (bp < minBp) scala.None
      else if (sym(tok)) Some((op, bp)) else scala.None
    val save = pos

    // multi-char first
    if (peekSym("**")) return take("**", "**", BpPower)
    if (peekSym("??")) return take("??", "??", BpNullish)
    if (peekSym("?:")) return take("?:", "?:", BpNullish)
    if (peekSym("||")) return take("||", "||", BpOr)
    if (peekSym("&&")) return take("&&", "&&", BpAnd)
    if (peekSym("==")) return take("==", "==", BpEquality)
    if (peekSym("!=")) return take("!=", "!=", BpEquality)
    if (peekSym("*=")) return take("*=", "*=", BpEquality)
    if (peekSym("?=")) return take("?=", "?=", BpEquality)
    if (peekSym("<=")) return take("<=", "<=", BpRelation)
    if (peekSym(">=")) return take(">=", ">=", BpRelation)
    if (peekSym(">..")) return take(">..", ">..", BpRange)
    if (peekSym("..")) return take("..", "..", BpRange)
    if (peekSym("<")) {
      // not a comparison if followed by - ~ (graph/cast territory);
      // `<|` is the KNN operator (handled below)
      val n = peekAt(1)
      if (n == '-' || n == '~') return scala.None
      if (n == '|') {
        val m = Parser.KnnOpRe.findPrefixMatchOf(src.subSequence(pos, src.length))
        m match {
          case Some(mm) if BpEquality >= minBp =>
            pos += mm.end
            val arg = Option(mm.group(2)).getOrElse("")
            return Some((s"KNN:${mm.group(1)}:$arg", BpEquality))
          case _ => return scala.None
        }
      }
      return take("<", "<", BpRelation)
    }
    if (peekSym(">")) {
      val n = peekAt(1)
      if (n == '.' && peekAt(2) == '.') return scala.None // handled by >.. above
      return take(">", ">", BpRelation)
    }
    if (peekSym("+=") || peekSym("-=")) return scala.None
    if (peekSym("+")) return take("+", "+", BpAddSub)
    if (peekSym("->")) return scala.None
    if (peekSym("-")) return take("-", "-", BpAddSub)
    if (peekSym("×")) return take("×", "*", BpMulDiv)
    if (peekSym("÷")) return take("÷", "/", BpMulDiv)
    if (peekSym("*")) return take("*", "*", BpMulDiv)
    if (peekSym("/")) return take("/", "/", BpMulDiv)
    if (peekSym("%")) return take("%", "%", BpMulDiv)
    if (peekSym("=")) return take("=", "=", BpEquality)
    if (peekSym("∋")) return take("∋", "CONTAINS", BpRelation)
    if (peekSym("∌")) return take("∌", "CONTAINSNOT", BpRelation)
    if (peekSym("∈")) return take("∈", "INSIDE", BpRelation)
    if (peekSym("∉")) return take("∉", "NOTINSIDE", BpRelation)
    if (peekSym("⊇")) return take("⊇", "CONTAINSALL", BpRelation)
    if (peekSym("⊃")) return take("⊃", "CONTAINSANY", BpRelation)
    if (peekSym("⊅")) return take("⊅", "CONTAINSNONE", BpRelation)
    if (peekSym("⊆")) return take("⊆", "ALLINSIDE", BpRelation)
    if (peekSym("⊂")) return take("⊂", "ANYINSIDE", BpRelation)
    if (peekSym("⊄")) return take("⊄", "NONEINSIDE", BpRelation)
    if (peekSym("@@")) return take("@@", "MATCHES", BpEquality)
    // match-ref forms: @1@, @AND@, @OR@, @1,AND@ (expr/operator.rs Matches)
    if (peekc == '@' && BpEquality >= minBp) {
      val m = Parser.MatchOpRe.findPrefixMatchOf(src.subSequence(pos, src.length))
      m match {
        case Some(mm) =>
          pos += mm.end
          val ref = Option(mm.group(1)).getOrElse("")
          val bop = Option(mm.group(2)).getOrElse("")
          return Some((s"MATCHES:$ref:$bop", BpEquality))
        case scala.None => ()
      }
    }
    // KNN operator <|k|>, <|k,ef|>, <|k,METRIC|> (expr/operator.rs Knn)
    if (peekc == '<' && peekAt(1) == '|' && BpEquality >= minBp) {
      val m = Parser.KnnOpRe.findPrefixMatchOf(src.subSequence(pos, src.length))
      m match {
        case Some(mm) =>
          pos += mm.end
          val arg = Option(mm.group(2)).getOrElse("")
          return Some((s"KNN:${mm.group(1)}:$arg", BpEquality))
        case scala.None => ()
      }
    }

    // keyword operators
    if (BpOr >= minBp && kw("OR")) return Some(("||", BpOr))
    if (BpAnd >= minBp && kw("AND")) return Some(("&&", BpAnd))
    if (BpEquality >= minBp && kw("IS")) {
      if (kw("NOT")) return Some(("!=", BpEquality))
      return Some(("=", BpEquality))
    }
    if (BpRelation >= minBp) {
      if (kw("CONTAINSALL")) return Some(("CONTAINSALL", BpRelation))
      if (kw("CONTAINSANY")) return Some(("CONTAINSANY", BpRelation))
      if (kw("CONTAINSNONE")) return Some(("CONTAINSNONE", BpRelation))
      if (kw("CONTAINSNOT")) return Some(("CONTAINSNOT", BpRelation))
      if (kw("CONTAINS")) return Some(("CONTAINS", BpRelation))
      if (kw("ALLINSIDE")) return Some(("ALLINSIDE", BpRelation))
      if (kw("ANYINSIDE")) return Some(("ANYINSIDE", BpRelation))
      if (kw("NONEINSIDE")) return Some(("NONEINSIDE", BpRelation))
      if (kw("NOTINSIDE")) return Some(("NOTINSIDE", BpRelation))
      if (kw("INSIDE")) return Some(("INSIDE", BpRelation))
      if (kw("OUTSIDE")) return Some(("OUTSIDE", BpRelation))
      if (kw("INTERSECTS")) return Some(("INTERSECTS", BpRelation))
      if (kw("NOT")) {
        if (kw("INSIDE")) return Some(("NOTINSIDE", BpRelation))
        if (kw("IN")) return Some(("NOTINSIDE", BpRelation))
        pos = save; return scala.None
      }
      if (kw("IN")) return Some(("INSIDE", BpRelation))
    }
    pos = save
    scala.None
  }

  /** Does the upcoming input start an expression? (for open-ended ranges) */
  private val clauseKws = Seq("ORDER", "LIMIT", "START", "GROUP", "SPLIT",
    "FETCH", "WHERE", "WITH", "TIMEOUT", "PARALLEL", "EXPLAIN", "VERSION", "OMIT",
    "FIELD", "FIELDS")
  private def peekClauseKw(): Boolean = clauseKws.exists(peekKw)

  private def startsExpr(): Boolean = {
    ws()
    if (eof) return false
    val c = peekc
    c.isDigit || isIdentStart(c) || c == '$' || c == '\'' || c == '"' || c == '(' ||
      c == '[' || c == '{' || c == '-' || c == '+' || c == '!' || c == '`' || c == '⟨'
  }

  // ---- prefix / primary ----------------------------------------------

  private def prefix(): Expr = {
    ws()
    if (eof) fail("unexpected end of input")
    val c = peekc
    if (peekKw("FUNCTION") && { val save = pos; kw("FUNCTION"); ws(); val r = peekc == '('; pos = save; r }) {
      // embedded scripting function: function(args) { raw-js }
      kw("FUNCTION")
      expectSym("(")
      val args = ArrayBuffer[Expr]()
      ws()
      if (peekc != ')') { var g = true; while (g) { args += expr(); g = sym(",") } }
      expectSym(")")
      ws()
      if (peekc != '{') fail("expected scripting body")
      val b0 = pos
      var depth = 0
      do {
        val ch = peekc
        if (ch == '{') depth += 1
        if (ch == '}') depth -= 1
        if (ch == '"' || ch == '\'') {
          val q = ch; pos += 1
          while (!eof && peekc != q) { if (peekc == '\\') pos += 1; pos += 1 }
        }
        pos += 1
      } while (!eof && depth > 0)
      return JsExpr(args.toSeq, src.substring(b0 + 1, pos - 1).trim)
    }
    if (c == '!') { pos += 1; Prefix("!", exprAtLevel(BpPrefix)) }
    else if (c == '-' && !src.startsWith("->", pos)) {
      // fold a negative numeric literal so -9223372036854775808 parses as
      // i64::MIN (the positive literal alone would overflow)
      val save = pos
      pos += 1
      ws()
      if (!eof && peekc.isDigit) {
        val numStart = pos
        try {
          numberLike() match {
            case Lit(VInt(i)) =>
              val txt = src.substring(numStart, pos)
              if (!txt.contains('.') && !txt.toLowerCase.contains('e')) return idiomContinuation(Lit(VInt(-i)))
              pos = save; pos += 1
              Prefix("-", exprAtLevel(BpPrefix))
            case _ =>
              pos = save; pos += 1
              Prefix("-", exprAtLevel(BpPrefix))
          }
        } catch {
          case e: ParseError =>
            // digits may overflow Long only for i64::MIN
            pos = numStart
            val s0 = pos
            while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
            val digits = src.substring(s0, pos).replace("_", "")
            if (!eof && isIdentChar(peekc)) throw e
            val big = -BigInt(digits)
            if (big >= BigInt(Long.MinValue)) idiomContinuation(Lit(VInt(big.toLong)))
            else throw e
        }
      } else Prefix("-", exprAtLevel(BpPrefix))
    }
    else if (c == '+' && !src.startsWith("+=", pos)) { pos += 1; Prefix("+", exprAtLevel(BpPrefix)) }
    else if (src.startsWith("..", pos)) {
      pos += 2
      val incl = sym("=")
      val hi = if (startsExpr()) Some((exprAtLevel(BpRange + 1), incl)) else scala.None
      RangeLit(scala.None, hi)
    }
    else if (c == '<' && peekAt(1) != '-' && peekAt(1) != '~') castOrFuture()
    else primaryWithIdiom()
  }

  private def castOrFuture(): Expr = {
    expectSym("<")
    val k = kind()
    expectSym(">")
    var operand = exprAtLevel(BpPrefix)
    // `<array> 1..5` casts the RANGE; ranges glue into the cast operand
    if (peekSym(">..") || (peekSym("..") && !peekSym("..."))) {
      val exclLo = sym(">..")
      if (!exclLo) sym("..")
      val incl = sym("=")
      val hi = if (startsExpr()) Some((exprAtLevel(BpRange + 1), incl)) else scala.None
      operand = RangeLit(Some((operand, !exclLo)), hi)
    }
    Cast(k, operand)
  }

  private var kindNoUnionFlag = false
  def kindNoUnionEntry(): Kind = {
    kindNoUnionFlag = true
    try kind() finally kindNoUnionFlag = false
  }

  def kind(): Kind = {
    import Kind._
    def one(): Kind = {
      ws()
      if (peekc == '\'' || peekc == '"') return KLiteral(VStr(stringLit()._1))
      if (peekc.isDigit || peekc == '-') {
        val e = prefix()
        return KLiteral(Eval.evalConst(e))
      }
      if (peekc == '[') {
        // literal array kind: element-wise kinds, e.g. <[123, "abc"]>
        pos += 1
        val items = ArrayBuffer[Kind]()
        ws()
        if (peekc != ']') { var g = true; while (g) { items += kindUnion(); g = sym(",") } }
        expectSym("]")
        return KLiteralArr(items.toSeq)
      }
      if (peekc == '{') {
        // literal object kind: per-key kinds, e.g. <{ a: 1d | 2d }>
        pos += 1
        val fields = ArrayBuffer[(String, Kind)]()
        ws()
        if (peekc != '}') {
          var g = true
          while (g) {
            val key = if (peekc == '\'' || peekc == '"') stringLit()._1 else rawIdent()
            expectSym(":")
            fields += ((key, kindUnion()))
            g = sym(",")
          }
        }
        expectSym("}")
        return KLiteralObj(fields.toSeq)
      }
      val name = rawIdent().toLowerCase
      name match {
        case "any" => KAny
        case "none" => KNone
        case "null" => KNull
        case "bool" => KBool
        case "int" => KInt
        case "float" => KFloat
        case "decimal" => KDecimal
        case "number" => KNumber
        case "string" => KString
        case "duration" => KDuration
        case "datetime" => KDatetime
        case "uuid" => KUuid
        case "bytes" => KBytes
        case "object" => KObject
        case "regex" => KRegex
        case "range" => KRange
        case "function" => KFunction
        case "file" => KFile
        case "array" | "set" =>
          var inner: Option[Kind] = scala.None
          var max: Option[Long] = scala.None
          if (sym("<")) {
            inner = Some(kindUnion())
            if (sym(",")) { max = Some(intLit()) }
            expectSym(">")
          }
          if (name == "array") KArray(inner, max) else KSet(inner, max)
        case "record" =>
          val tables = ArrayBuffer[String]()
          if (sym("<")) {
            var g = true
            while (g) { tables += rawIdent(); g = sym("|") }
            expectSym(">")
          }
          KRecord(tables.toSeq)
        case "geometry" =>
          val kinds = ArrayBuffer[String]()
          if (sym("<")) {
            var g = true
            while (g) { kinds += rawIdent(); g = sym("|") }
            expectSym(">")
          }
          KGeometry(kinds.toSeq)
        case "option" =>
          expectSym("<"); val in = kindUnion(); expectSym(">")
          KOption(in)
        case "true" => KLiteral(VBool(true))
        case "false" => KLiteral(VBool(false))
        case "table" =>
          if (sym("<")) {
            val names = ArrayBuffer[String]()
            var g = true
            while (g) { names += rawIdent(); g = sym("|") }
            expectSym(">")
            KTable(names.toSeq)
          } else KTable(Nil)
        case "point" | "line" | "polygon" | "multipoint" | "multiline" | "multipolygon" | "collection" =>
          KGeometry(Seq(name))
        case other => KTable(Seq(other))
      }
    }
    if (kindNoUnionFlag) one() else kindUnionFrom(one())
  }

  /** A single kind without trailing-union continuation (closure params). */
  def kindNoUnion(): Kind = kindNoUnionEntry()

  private def kindUnion(): Kind = kindUnionFrom(kind())

  private def kindUnionFrom(first: Kind): Kind = {
    if (!peekSym("|")) return first
    val parts = ArrayBuffer[Kind](first)
    while ({ ws(); peekc == '|' && peekAt(1) != '|' }) { pos += 1; parts += kind() }
    if (parts.size == 1) first else Kind.KEither(parts.toSeq)
  }

  private def intLit(): Long = {
    ws()
    val start = pos
    while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
    src.substring(start, pos).replace("_", "").toLong
  }

  /** Primary expression plus any idiom continuation (paths, methods,
    * indexes, graph hops). */
  private def primaryWithIdiom(): Expr = {
    val prime = primary()
    idiomContinuation(prime)
  }

  private def idiomContinuation(prime: Expr): Expr = {
    val parts = ArrayBuffer[Part]()
    var go = true
    while (go) {
      // NOTE: no ws() before '.'/'[' — idiom parts bind tightly, but SurrealQL
      // tolerates whitespace; accept it.
      if (peekSym("...") || peekSym("…")) { if (!sym("...")) sym("…"); parts += PFlatten }
      else if (peekSym(".") && !peekSym("..")) {
        sym(".")
        ws()
        if (peekc == '*') { pos += 1; parts += PAll }
        else if (peekc == '@') { pos += 1; parts += PRepeatRecurse }
        else if (peekc == '?') { pos += 1; parts += POptional }
        else if (peekc == '{') { pos += 1; parts += curlyPart() }
        else {
          val name = rawIdent()
          ws()
          if (peekc == '(') {
            pos += 1
            val args = ArrayBuffer[Expr]()
            ws()
            if (peekc != ')') { var g = true; while (g) { ws(); if (peekc == ')') g = false else { args += expr(); g = sym(",") } } }
            expectSym(")")
            parts += PMethod(name, args.toSeq)
          } else parts += PField(name)
        }
      }
      else if (peekSym("[")) {
        sym("[")
        ws()
        if (peekc == '*') { pos += 1; expectSym("]"); parts += PAll }
        else if (peekc == '$' && peekAt(1) == ']') { pos += 2; parts += PLast }
        else if (kw("WHERE")) { val e = expr(); expectSym("]"); parts += PWhere(e) }
        else if (peekc == '?') { pos += 1; val e = expr(); expectSym("]"); parts += PWhere(e) }
        else { val e = expr(); expectSym("]"); parts += PIndex(e) }
      }
      else if (peekSym("(") && (prime.isInstanceOf[Closure] || parts.nonEmpty ||
               prime.isInstanceOf[Subquery] || prime.isInstanceOf[Param] ||
               prime.isInstanceOf[BlockExpr] || prime.isInstanceOf[Idiom])) {
        sym("(")
        val args = ArrayBuffer[Expr]()
        ws()
        if (peekc != ')') { var g = true; while (g) { ws(); if (peekc == ')') g = false else { args += expr(); g = sym(",") } } }
        expectSym(")")
        parts += PMethod("__call__", args.toSeq)
      }
      else if (!noGraphIdiom && peekSym("->") ) { sym("->"); parts += graphPart("out") }
      else if (!noGraphIdiom && peekSym("<->")) { sym("<->"); parts += graphPart("both") }
      else if (!noGraphIdiom && peekSym("<~") ) { sym("<~"); parts += graphPart("ref") }
      else if (!noGraphIdiom && peekSym("<-") ) { sym("<-"); parts += graphPart("in") }
      else if (peekSym("?") && !peekSym("??") && !peekSym("?:") && !peekSym("?=")) {
        sym("?"); parts += POptional
      }
      else go = false
    }
    if (parts.isEmpty) prime
    else prime match {
      case Idiom(ps) => Idiom(ps ++ parts)
      case other     => Idiom(PStart(other) +: parts.toSeq)
    }
  }

  /** After `.{` — recursion spec (digits / `..`) or destructure
    * (syn/parser/idiom.rs:297 parse_curly_part). */
  private def curlyPart(): Part = {
    ws()
    if (peekc.isDigit || src.startsWith("..", pos)) recursePart()
    else destructurePart()
  }

  /** `.{n}` / `.{min..max}` with optional `+path/+collect/+shortest=<t>`
    * instruction (+inclusive), then an optional `( nest )` idiom
    * (syn/parser/idiom.rs:351-473). The leading `.{` is consumed. */
  private def recursePart(): Part = {
    ws()
    val mn = if (peekc.isDigit) Some(intLit()) else scala.None
    val hasRange = sym("..")
    ws()
    val mx =
      if (hasRange && peekc.isDigit) Some(intLit())
      else if (hasRange) scala.None
      else mn
    var instr: RecurseInstr = RDefault
    ws()
    while (peekc == '+') {
      pos += 1
      rawIdent().toLowerCase match {
        case "inclusive" =>
          instr = instr match {
            case RPath(_)        => RPath(true)
            case RCollect(_)     => RCollect(true)
            case RShortest(t, _) => RShortest(t, true)
            case RDefault        => RDefault
          }
        case "path"    => instr = RPath(false)
        case "collect" => instr = RCollect(false)
        case "shortest" =>
          expectSym("=")
          ws()
          val target: Expr =
            if (peekc == '$') { pos += 1; Param(rawIdent()) }
            else { val tb = rawIdent(); expectSym(":"); recordIdTail(tb) }
          instr = RShortest(target, false)
        case other => fail(s"unexpected recursion instruction $other")
      }
      ws()
    }
    expectSym("}")
    val nest: Option[Seq[Part]] =
      if (peekSym("(")) {
        sym("(")
        val np = ArrayBuffer[Part]()
        remainingIdiomParts(np)
        expectSym(")")
        Some(np.toSeq)
      } else scala.None
    PRecurse(mn, mx, fixed = !hasRange, nest, instr)
  }

  /** Remaining-idiom parts (no leading primary): `.x`, `[..]`, `->edge->`,
    * `...` — used for recursion nests (syn parse_remaining_idiom with an
    * empty start). */
  private def remainingIdiomParts(parts: ArrayBuffer[Part]): Unit = {
    var go = true
    while (go) {
      if (peekSym("...") || peekSym("…")) { if (!sym("...")) sym("…"); parts += PFlatten }
      else if (peekSym(".") && !peekSym("..")) {
        sym(".")
        ws()
        if (peekc == '*') { pos += 1; parts += PAll }
        else if (peekc == '@') { pos += 1; parts += PRepeatRecurse }
        else if (peekc == '?') { pos += 1; parts += POptional }
        else if (peekc == '{') { pos += 1; parts += curlyPart() }
        else {
          val name = rawIdent()
          ws()
          if (peekc == '(') {
            pos += 1
            val args = ArrayBuffer[Expr]()
            ws()
            if (peekc != ')') { var g = true; while (g) { ws(); if (peekc == ')') g = false else { args += expr(); g = sym(",") } } }
            expectSym(")")
            parts += PMethod(name, args.toSeq)
          } else parts += PField(name)
        }
      }
      else if (peekSym("[")) {
        sym("[")
        ws()
        if (peekc == '*') { pos += 1; expectSym("]"); parts += PAll }
        else if (peekc == '$' && peekAt(1) == ']') { pos += 2; parts += PLast }
        else if (kw("WHERE")) { val e = expr(); expectSym("]"); parts += PWhere(e) }
        else if (peekc == '?') { pos += 1; val e = expr(); expectSym("]"); parts += PWhere(e) }
        else { val e = expr(); expectSym("]"); parts += PIndex(e) }
      }
      else if (!noGraphIdiom && peekSym("->") ) { sym("->"); parts += graphPart("out") }
      else if (!noGraphIdiom && peekSym("<->")) { sym("<->"); parts += graphPart("both") }
      else if (!noGraphIdiom && peekSym("<~") ) { sym("<~"); parts += graphPart("ref") }
      else if (!noGraphIdiom && peekSym("<-") ) { sym("<-"); parts += graphPart("in") }
      else go = false
    }
  }

  /** Destructure `.{ a, b.*, c: <expr>, d.{…} }` — the leading `.{` is
    * consumed (syn/parser/idiom.rs:304 parse_destructure_part). */
  private def destructurePart(): Part = {
    val fs = ArrayBuffer[(String, Option[Seq[Part]])]()
    var g = true
    while (g) {
      ws()
      if (peekc == '}') g = false
      else {
        val n = rawIdent()
        ws()
        if (peekc == ':' && peekAt(1) != ':') {
          pos += 1
          val sub: Seq[Part] = expr() match {
            case Idiom(ps) => ps
            case other     => Seq(PStart(other))
          }
          fs += ((n, Some(sub)))
        } else if (peekSym(".") && !peekSym("..")) {
          sym(".")
          ws()
          if (peekc == '*') { pos += 1; fs += ((n, Some(Seq(PField(n), PAll)))) }
          else if (peekc == '{') {
            pos += 1
            curlyPart() match {
              case d: PDestructure => fs += ((n, Some(Seq(PField(n), d))))
              case r: PRecurse     => fs += ((n, Some(Seq(PField(n), r))))
              case other           => fail(s"expected a `*` or a destructuring")
            }
          } else fail("expected a `*` or a destructuring")
        } else fs += ((n, scala.None))
        g = sym(",")
      }
    }
    expectSym("}")
    PDestructure(fs.toSeq)
  }

  /** One lookup subject: `edge`, `edge:1`, `edge:1..5`. */
  private def lookupSubject(): LookupSubject = {
    val t = rawIdent()
    if (peekc == ':' && peekAt(1) != ':') {
      pos += 1
      recordIdTail(t) match {
        case RidLit(tb, k) => LookupSubject(tb, Some(k))
        case _             => LookupSubject(t, scala.None)
      }
    } else LookupSubject(t, scala.None)
  }

  /** Full Lookup grammar (syn/parser/idiom.rs:652 parse_lookup): `->edge`,
    * `->?`, `->(subjects… WHERE … LIMIT … AS …)`,
    * `->(SELECT fields FROM [ONLY] subjects … ORDER … GROUP …)`. */
  private def graphPart(dir: String): Part = {
    ws()
    val what = ArrayBuffer[LookupSubject]()
    if (peekc == '(') {
      val rawStart = pos
      pos += 1
      ws()
      var fieldsOpt: Option[Seq[Field]] = scala.None
      var value = false
      var only = false
      if (kw("SELECT")) {
        val (fs, v) = fieldsClause()
        fieldsOpt = Some(fs); value = v
        expectKw("FROM")
        only = kw("ONLY")
      }
      ws()
      if (peekc == '?') pos += 1
      else { var g = true; while (g) { what += lookupSubject(); g = sym(",") } }
      val refFields = ArrayBuffer[String]()
      if (kw("FIELD") || kw("FIELDS")) {
        var g = true
        while (g) { refFields += idiomName(); g = sym(",") }
      }
      val cond = if (kw("WHERE")) Some(expr()) else scala.None
      val split = ArrayBuffer[String]()
      if (kw("SPLIT")) { kw("ON"); var g = true; while (g) { split += idiomName(); g = sym(",") } }
      var groupBy: Option[Seq[Expr]] = scala.None
      if (kw("GROUP")) {
        if (kw("ALL")) groupBy = Some(Nil)
        else { kw("BY"); val gs = ArrayBuffer[Expr](); var g = true; while (g) { gs += expr(); g = sym(",") }; groupBy = Some(gs.toSeq) }
      }
      val order = ArrayBuffer[OrderKey]()
      if (kw("ORDER")) {
        kw("BY")
        var g = true
        while (g) {
          val e = expr()
          val collate = kw("COLLATE")
          val numeric = kw("NUMERIC")
          val desc = if (kw("DESC")) true else { kw("ASC"); false }
          order += OrderKey(e, desc, collate, numeric)
          g = sym(",")
        }
      }
      var limit: Option[Expr] = scala.None
      var start: Option[Expr] = scala.None
      if (peekKw("START")) {
        start = { kw("START"); kw("AT"); Some(expr()) }
        if (kw("LIMIT")) { kw("BY"); limit = Some(expr()) }
      } else {
        if (kw("LIMIT")) { kw("BY"); limit = Some(expr()) }
        if (kw("START")) { kw("AT"); start = Some(expr()) }
      }
      val alias = if (kw("AS")) Some(idiomName()) else scala.None
      expectSym(")")
      PGraph(dir, what.toSeq, cond, alias, fieldsOpt, value, only,
        split.toSeq, groupBy, order.toSeq, limit, start,
        raw = Some(src.substring(rawStart, pos)), refFields = refFields.toSeq)
    } else if (peekc == '?') { pos += 1; PGraph(dir, Nil) }
    else { what += lookupSubject(); PGraph(dir, what.toSeq) }
  }

  private def primary(): Expr = {
    ws()
    // a bare SELECT in expression position is a subquery — the reference
    // parses statement keywords as expression starts (parse_expr_start;
    // reproductions/7129: `count(SELECT * FROM t)`)
    if (peekKw("SELECT")) return Subquery(statement())
    val c = peekc
    if (c == '(') {
      pos += 1
      ws()
      val inner: Expr =
        if (peekKw("SELECT") || peekKw("CREATE") || peekKw("UPDATE") || peekKw("UPSERT") ||
            peekKw("DELETE") || peekKw("RELATE") || peekKw("INSERT") || peekKw("DEFINE") ||
            peekKw("LET") || peekKw("RETURN") || peekKw("IF") || peekKw("FOR") ||
            peekKw("REMOVE") || peekKw("INFO") || peekKw("EXPLAIN") || peekKw("ANALYZE")) {
          Subquery(statement())
        } else {
          val first = expr()
          if (peekSym(",")) {
            // point literal (x, y) — geo tuple syntax
            sym(",")
            val second = expr()
            FnCall("__point__", Seq(first, second))
          } else first
        }
      expectSym(")")
      // parens BREAK idiom continuity: `(arr.a)[0]` indexes the grouped
      // result, it does not extend the inner path (idiom/continuity) —
      // re-rooting an inner Idiom keeps the boundary when parts follow
      inner match {
        case i: Idiom => Idiom(Seq(PStart(i)))
        case x => x
      }
    }
    else if (c == '[') {
      pos += 1
      val items = ArrayBuffer[Expr]()
      ws()
      if (peekc != ']') {
        var g = true
        while (g) { items += expr(); g = sym(","); ws(); if (peekc == ']') g = false }
      }
      expectSym("]")
      ArrLit(items.toSeq)
    }
    else if (c == '{') objectOrBlock()
    else if (c == '@') {
      // current-document idiom start (prime.rs:48); `@{..}` attaches a
      // curly part with no dot
      pos += 1
      ws()
      if (peekc == '{') { pos += 1; Idiom(Seq(PDoc, curlyPart())) }
      else Idiom(Seq(PDoc))
    }
    else if (c == '$') { pos += 1; Param(rawIdent()) }
    else if (c == '|') {
      // |person:100| mock source vs |$x| closure — lookahead for ident ':'
      val save = pos
      pos += 1
      ws()
      val isMock = (isIdentStart(peekc) || peekc == '`' || peekc == '⟨') && {
        val s2 = pos
        val r = try { rawIdent(); peekc == ':' } catch { case _: ParseError => false }
        pos = s2; r
      }
      pos = save
      if (isMock) mockLit() else closure()
    }
    else if (c == '/') regexLit()
    else if (c == '\'' || c == '"') {
      val (s, _) = stringLit()
      Lit(VStr(s))
    }
    else if (c.isDigit) numberLike()
    else if (isIdentStart(c) || c == '`' || c == '⟨') identLike()
    else if (src.startsWith("->", pos) || src.startsWith("<-", pos) ||
             src.startsWith("<->", pos) || src.startsWith("<~", pos)) {
      // leading graph/reference hop — idiom rooted at the current document
      val parts = ArrayBuffer[Part]()
      remainingIdiomParts(parts)
      if (parts.isEmpty) fail(s"unexpected character '$c'")
      Idiom(parts.toSeq)
    }
    else fail(s"unexpected character '$c'")
  }

  private def objectOrBlock(): Expr = {
    // lookahead after '{': '}' → empty object; ',' → empty set; a key
    // (ident/string/number) followed by ':' → object; else try set literal
    // `{a, b}` / `{v,}`, falling back to a block.
    val save = pos
    pos += 1
    ws()
    if (peekc == '}') { pos += 1; return ObjLit(Nil) }
    if (peekc == ',') { pos += 1; ws(); expectSym("}"); return FnCall("__set__", Nil) }
    val isObject = {
      val s2 = pos
      val r = try {
        if (peekc == '\'' || peekc == '"') { stringLit(); ws(); peekc == ':' && peekAt(1) != ':' }
        else if (isIdentStart(peekc) || peekc == '`' || peekc == '⟨') { rawIdent(); ws(); peekc == ':' && peekAt(1) != ':' }
        else if (peekc.isDigit) { while (peekc.isDigit) pos += 1; ws(); peekc == ':' && peekAt(1) != ':' }
        else false
      } catch { case _: ParseError => false }
      pos = s2
      r
    }
    if (isObject) {
      val fields = ArrayBuffer[(String, Expr)]()
      var g = true
      while (g) {
        ws()
        if (peekc == '}') g = false
        else {
          val key =
            if (peekc == '\'' || peekc == '"') stringLit()._1
            else if (peekc.isDigit) {
              val s0 = pos; while (peekc.isDigit) pos += 1
              val digits = src.substring(s0, pos)
              // numeric keys lex as i64 (primitive/object_numeric_keys)
              try { java.lang.Long.parseLong(digits); () }
              catch { case _: NumberFormatException =>
                fail("Failed to parse number: number cannot fit within a 64bit signed integer") }
              digits
            }
            else rawIdent()
          expectSym(":")
          fields += ((key, expr()))
          g = sym(",")
        }
      }
      expectSym("}")
      ObjLit(fields.toSeq)
    } else {
      // try set literal: expr (',' expr?)* '}' with ≥1 comma
      val setAttempt: Option[Expr] = try {
        val items = ArrayBuffer[Expr](expr())
        if (peekSym(",")) {
          var g = true
          while (g) {
            if (!sym(",")) g = false
            else { ws(); if (peekc == '}') g = false else items += expr() }
          }
          ws()
          if (peekc == '}') { pos += 1; Some(FnCall("__set__", items.toSeq)) }
          else scala.None
        } else scala.None
      } catch { case _: ParseError => scala.None }
      setAttempt match {
        case Some(e) => e
        case scala.None =>
          pos = save
          blockExpr()
      }
    }
  }

  private def closure(): Expr = {
    expectSym("|")
    val params = ArrayBuffer[(String, Option[Kind])]()
    ws()
    if (peekc != '|') {
      var g = true
      while (g) {
        expectSym("$")
        val n = rawIdent()
        // param kinds never cross the closing `|` (no bare unions here)
        val k = if (sym(":")) Some(kindNoUnion()) else scala.None
        params += ((n, k))
        g = sym(",")
      }
    }
    expectSym("|")
    ws()
    var ret: Option[Kind] = scala.None
    val body = if (sym("->")) { ret = Some(kind()); blockExpr() }
      else if (peekc == '{') objectOrBlock()
      else expr()
    Closure(params.toSeq, body, ret)
  }

  private def mockLit(): Expr = {
    expectSym("|")
    val tb = rawIdent()
    expectSym(":")
    ws()
    def signedInt(): Long = {
      val neg = sym("-")
      val v = BigInt(intLit())
      (if (neg) -v else v).toLong
    }
    val lo: Option[Long] =
      if (peekc == '.' || peekc == '>') scala.None else Some(signedInt())
    val exclLo = sym(">..")
    if (exclLo || sym("..")) {
      val inclHi = sym("=")
      ws()
      val hi: Option[Long] = if (peekc != '|') Some(signedInt()) else scala.None
      expectSym("|")
      // range mock: id range [lo, hi) with >../..= variants (mock.rs)
      FnCall("__mock_range__", Seq(Lit(VStr(tb)),
        Lit(VRng(lo.map(l => (VInt(l): V, !exclLo)), hi.map(h => (VInt(h): V, inclHi))))))
    } else {
      expectSym("|")
      FnCall("__mock__", Seq(Lit(VStr(tb)), Lit(VInt(lo.getOrElse(0L))), Lit(VNone)))
    }
  }

  private def regexLit(): Expr = {
    expectSym("/")
    val sb = new StringBuilder
    while (!eof && peekc != '/') {
      if (peekc == '\\') { sb.append(peekc); pos += 1; if (!eof) { sb.append(peekc); pos += 1 } }
      else { sb.append(peekc); pos += 1 }
    }
    expectSym("/")
    Lit(VRegex(sb.toString))
  }

  /** String literal; returns (content, quoteChar). */
  def stringLit(): (String, Char) = {
    ws()
    val q = peekc
    if (q != '\'' && q != '"') fail("expected string")
    pos += 1
    val sb = new StringBuilder
    while (!eof && peekc != q) {
      if (peekc == '\\') {
        pos += 1
        val e = peekc
        pos += 1
        e match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case '0' => sb.append('\u0000')
          case 'f' => sb.append('\u000C')
          case 'b' => sb.append('\u0008')
          case '\\' => sb.append('\\')
          case '\'' => sb.append('\'')
          case '"' => sb.append('"')
          case '/' => sb.append('/')
          case 'u' =>
            def hexChars(h: String): Unit = {
              if (h.isEmpty || !h.forall(c => c.isDigit || ('a' to 'f').contains(c.toLower)))
                fail(s"invalid unicode escape '\\u$h'")
              try sb.appendAll(Character.toChars(Integer.parseInt(h, 16)))
              catch { case _: Exception => fail(s"invalid unicode escape '\\u$h'") }
            }
            def hex4(): Int = {
              if (pos + 4 > src.length) fail("truncated unicode escape")
              val hex = src.substring(pos, pos + 4)
              if (!hex.forall(c => c.isDigit || ('a' to 'f').contains(c.toLower)))
                fail(s"invalid unicode escape '\\u$hex'")
              pos += 4
              Integer.parseInt(hex, 16)
            }
            if (peekc == '{') {
              pos += 1
              val st = pos
              while (!eof && peekc != '}' && peekc != '\'' && peekc != '"' && peekc != ';') pos += 1
              if (eof || peekc != '}') fail("missing closing brace for unicode escape")
              val hex = src.substring(st, pos)
              pos += 1
              // at most 6 hex chars (syn/lexer: "expected `}` after 6
              // characters"; parsing/strings/error)
              if (hex.length > 6) fail("unicode escape sequence expects at most 6 characters")
              hexChars(hex)
            } else {
              // `\uXXXX`: a high surrogate must pair with a following
              // `\uXXXX` low surrogate (parsing/strings/error/
              // missing_trailing_surrogate)
              val c1 = hex4()
              if (c1 >= 0xD800 && c1 <= 0xDBFF) {
                if (pos + 1 < src.length && src.charAt(pos) == '\\' && src.charAt(pos + 1) == 'u') {
                  pos += 2
                  val c2 = hex4()
                  if (c2 >= 0xDC00 && c2 <= 0xDFFF) { sb.append(c1.toChar); sb.append(c2.toChar) }
                  else fail("expected a trailing surrogate after a leading surrogate escape")
                } else fail("expected a trailing surrogate after a leading surrogate escape")
              } else if (c1 >= 0xDC00 && c1 <= 0xDFFF)
                fail("unexpected trailing surrogate without a leading surrogate")
              else sb.append(c1.toChar)
            }
          case other => fail(s"invalid escape character '$other'")
        }
      } else { sb.append(peekc); pos += 1 }
    }
    if (eof) fail("unterminated string")
    pos += 1
    (sb.toString, q)
  }

  // number, duration, or float/decimal
  private def numberLike(): Expr = {
    val start = pos
    while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
    // duration? (but `3dec` is a decimal literal, not 3d + "ec")
    if (!eof && isDurUnitStart() && !src.startsWith("dec", pos)) return durationLit(start)
    var isFloat = false
    if (!eof && peekc == '.' && peekAt(1).isDigit) {
      isFloat = true
      pos += 1
      while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
    }
    if (!eof && (peekc == 'e' || peekc == 'E') &&
        (peekAt(1).isDigit || ((peekAt(1) == '+' || peekAt(1) == '-') && peekAt(2).isDigit))) {
      isFloat = true
      pos += 1
      if (peekc == '+' || peekc == '-') pos += 1
      while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
    }
    val digits = src.substring(start, pos).replace("_", "")
    // suffixes — `dec` must be checked before duration units ('d' collides)
    if (src.startsWith("dec", pos) && !isIdentChar(peekAt(3))) {
      pos += 3
      return Lit(VDec(BigDecimal(new java.math.BigDecimal(digits))))
    }
    if (!eof && (peekc == 'f' || peekc == 'F') && !isIdentChar(peekAt(1))) {
      pos += 1
      return Lit(VFloat(digits.toDouble))
    }
    if (!eof && isDurUnitStart()) return durationLit(start)
    if (isFloat) Lit(VFloat(digits.toDouble))
    else {
      try Lit(VInt(digits.toLong))
      catch { case _: NumberFormatException => fail(s"integer literal too large: $digits") }
    }
  }

  private def isDurUnitStart(): Boolean = {
    val c = peekc
    c == 'y' || c == 'w' || c == 'd' || c == 'h' || c == 'm' || c == 's' || c == 'n' || c == 'u' || c == 'µ'
  }

  private def durationLit(startPos: Int): Expr = {
    pos = startPos
    var secs = BigInt(0)
    var nanos = BigInt(0)
    var go = true
    while (go) {
      ws()
      if (!eof && peekc.isDigit) {
        val s0 = pos
        while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
        val n = BigInt(src.substring(s0, pos).replace("_", ""))
        if (src.startsWith("ms", pos)) { pos += 2; nanos += n * 1000000L }
        else if (src.startsWith("us", pos)) { pos += 2; nanos += n * 1000L }
        else if (src.startsWith("µs", pos)) { pos += 2; nanos += n * 1000L }
        else if (src.startsWith("ns", pos)) { pos += 2; nanos += n }
        else if (peekc == 'y') { pos += 1; secs += n * 31536000L }
        else if (peekc == 'w') { pos += 1; secs += n * 604800L }
        else if (peekc == 'd') { pos += 1; secs += n * 86400L }
        else if (peekc == 'h') { pos += 1; secs += n * 3600L }
        else if (peekc == 'm') { pos += 1; secs += n * 60L }
        else if (peekc == 's') { pos += 1; secs += n }
        else fail("invalid duration unit")
      } else go = false
      if (go) { // continue only if another digit immediately follows
        if (eof || !peekc.isDigit) go = false
      }
    }
    secs += nanos / 1000000000L
    nanos = nanos % 1000000000L
    if (secs > BigInt(2).pow(64) - 1) fail("duration overflow")
    Lit(VDur(secs.toLong, nanos.toInt))
  }

  private def identLike(): Expr = {
    val save = pos
    val name = rawIdent()
    val lower = name.toLowerCase
    // keyword literals
    lower match {
      case "true"  => return Lit(VBool(true))
      case "false" => return Lit(VBool(false))
      case "null"  => return Lit(VNull)
      case "none"  => return Lit(VNone)
      case "if"    => return ifExprBody()
      case _ =>
    }
    // CASE-SENSITIVE float tokens (syn/lexer/ident.rs:154-157)
    if (name == "NaN") return Lit(VFloat(Double.NaN))
    if (name == "Infinity") return Lit(VFloat(Double.PositiveInfinity))
    // prefixed strings: d'..' u'..' s'..' r'..' b'..'
    if (name.length == 1 && (peekc == '\'' || peekc == '"')) {
      lower match {
        case "d" =>
          val (s, _) = stringLit()
          return Lit(try parseDatetime(s) catch { case e: SqlError => fail(e.msg) })
        case "u" => val (s, _) = stringLit(); return Lit(VUuid(strictUuid(s)))
        case "s" => val (s, _) = stringLit(); return Lit(VStr(s))
        case "b" => val (s, _) = stringLit(); return Lit(VBytes(hexToBytes(s)))
        case "r" =>
          val (s, _) = stringLit()
          val sub = new Parser(s)
          val e = sub.expr()
          // the content must BE a record id — a separator-less body is a
          // lex error (syn/lexer: record-id strings;
          // parsing/recordid_string/error/missing_seperator)
          e match {
            case _: RidLit => return e
            case Idiom(parts) if parts.exists {
              case PStart(_: RidLit) => true; case _ => false } => return e
            case _ => throw ParseError(
              "Unexpected end of record-id string, expected a `:` seperator", pos)
          }
        case "f" =>
          val (s, _) = stringLit()
          // bucket `:/ ` key, with restricted charsets
          // (syn/lexer/strings/mod.rs:528-585 lex_file)
          val idx = s.indexOf(':')
          if (idx < 0) throw ParseError(
            "Unexpected end of file string, missing bucket seperator `:/`", pos)
          val bucket = s.substring(0, idx)
          bucket.find(ch => !ch.isLetterOrDigit && ch != '_' && ch != '-' && ch != '.').foreach { ch =>
            throw ParseError(s"Unexpected character `$ch`, file strings buckets only " +
              "allow alpha numeric characters and `_`, `-`, and `.`", pos) }
          if (idx + 1 >= s.length) throw ParseError(
            "Unexpected end of file string, missing file string key.", pos)
          if (s.charAt(idx + 1) != '/') throw ParseError(
            s"Unexpected character `${s.charAt(idx + 1)}`, expected `/`", pos)
          val key = s.substring(idx + 1)
          key.find(ch => !ch.isLetterOrDigit && ch != '_' && ch != '-' && ch != '.' && ch != '/').foreach { ch =>
            throw ParseError(s"Unexpected character `$ch`, file strings key's only " +
              "allow alpha numeric characters and `_`, `-`, `.`, and `/`", pos) }
          return Lit(VFile(bucket, key.stripPrefix("/")))
        case _ =>
      }
    }
    // function path: ns::name(...) or constant ns::NAME
    if (src.startsWith("::", pos)) {
      val path = new StringBuilder(name)
      while (src.startsWith("::", pos)) {
        pos += 2
        // allow trailing wildcard-free segments
        path.append("::").append(rawIdent())
      }
      ws()
      // unknown paths in a builtin namespace are PARSE errors with a
      // nearest-name hint (syn/parser/builtin.rs; path_hints goldens);
      // custom fn:: and unchecked namespaces pass through
      val full = path.toString.toLowerCase
      val nsHead = full.split("::")(0)
      // ml::model<maj.min.patch>(args): version-tagged model invocation
      // (syn ml parsing; evaluation needs the ML capability)
      if (nsHead == "ml" && peekc == '<') {
        pos += 1
        while (!eof && peekc != '>') pos += 1
        expectSym(">")
      }
      // `mod::` module invocation is gated behind the experimental
      // `surrealism` capability, which is off by default (syn/parser:
      // functions/module/surrealism_disabled golden)
      if (nsHead == "mod")
        fail("Experimental capability `surrealism` is not enabled: use of `mod::` is still experimental")
      if (nsHead != "fn" && KnownFns.checkedNs(nsHead) && !KnownFns.names(full)) {
        val hint = KnownFns.names.filter(_.startsWith(nsHead + "::"))
          .minByOption(k => levenshteinish(k, full))
          .filter(k => levenshteinish(k, full) <= 3)
        fail("Invalid function/constant path" +
          hint.map(h => s", did you maybe mean `$h`").getOrElse(""))
      }
      if (peekc == '(') {
        pos += 1
        val args = ArrayBuffer[Expr]()
        ws()
        if (peekc != ')') { var g = true; while (g) { ws(); if (peekc == ')') g = false else { args += expr(); g = sym(",") } } }
        expectSym(")")
        return FnCall(full, args.toSeq)
      }
      return Constant(path.toString)
    }
    // plain function call: count(...), rand(), not(...)
    if (peekc == '(' && isPlainFn(lower)) {
      pos += 1
      val args = ArrayBuffer[Expr]()
      ws()
      if (peekc != ')') { var g = true; while (g) { ws(); if (peekc == ')') g = false else { args += expr(); g = sym(",") } } }
      expectSym(")")
      return FnCall(lower, args.toSeq)
    }
    // record id: ident ':' key with no whitespace
    if (peekc == ':' && peekAt(1) != ':') {
      pos += 1
      return recordIdTail(name)
    }
    // bare field idiom
    Idiom(Seq(PField(name)))
  }

  private def isPlainFn(name: String): Boolean =
    name == "count" || name == "rand" || name == "not" || name == "sleep" || name == "fn"

  /** Cheap edit distance for the unknown-path hint. */
  private def levenshteinish(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def recordIdTail(table: String): Expr = {
    ws()
    // open-from-below id range: `edge:..`, `edge:..=5`
    if (src.startsWith("..", pos) && !src.startsWith("...", pos)) {
      pos += 2
      val incl = sym("=")
      val hi =
        if (startsExpr() && !peekClauseKw()) Some((recordKeyExpr(), incl))
        else scala.None
      return RidLit(table, RangeLit(scala.None, hi))
    }
    val keyExpr: Expr = recordKeyExpr()
    // id range: person:1..5 — a trailing clause keyword is NOT an upper bound
    if (peekSym("..") || peekSym(">..")) {
      val exclLo = sym(">..")
      if (!exclLo) sym("..")
      val incl = sym("=")
      val hi =
        if (startsExpr() && !peekClauseKw()) Some((recordKeyExpr(), incl))
        else scala.None
      return RidLit(table, RangeLit(Some((keyExpr, !exclLo)), hi))
    }
    RidLit(table, keyExpr)
  }

  /** A record-id key: bare idents are string keys, digits int keys, plus
    * quoted/uuid/array/object/param forms (syn record id key grammar). */
  private def recordKeyExpr(): Expr = {
    ws()
    locally {
      val c = peekc
      if (c == 'u' && (peekAt(1) == '\'' || peekAt(1) == '"')) {
        // uuid record key: t:u"xxxxxxxx-…" (syn uuid key form)
        pos += 1
        Lit(VUuid(strictUuid(stringLit()._1)))
      }
      else if (c == '\'' || c == '"') Lit(VStr(stringLit()._1))
      else if (c == '`' || c == '⟨') Lit(VStr(rawIdent()))
      else if (c == '[') { primary() }
      else if (c == '{') { primary() }
      else if (c == '$') { pos += 1; Param(rawIdent()) }
      else if (c.isDigit || c == '-' || c == '+') {
        val neg = c == '-'
        if (c == '-' || c == '+') pos += 1
        val s0 = pos
        while (!eof && (peekc.isDigit || peekc == '_')) pos += 1
        val ds = src.substring(s0, pos).replace("_", "")
        // a purely numeric key is an int key; else it's a string ident key
        if (!eof && isIdentChar(peekc)) {
          val s1 = pos
          while (!eof && isIdentChar(peekc)) pos += 1
          Lit(VStr((if (neg) "-" else "") + ds + src.substring(s1, pos)))
        } else {
          val big = BigInt(ds)
          val signed = if (neg) -big else big
          if (signed >= BigInt(Long.MinValue) && signed <= BigInt(Long.MaxValue))
            Lit(VInt(signed.toLong))
          else Lit(VStr((if (neg) "-" else "") + ds))
        }
      }
      else if (isIdentStart(c)) {
        val id = rawIdent()
        // generated keys: person:ulid() / :uuid() / :rand()
        // (syn record-id key generators → rand::* functions)
        if (peekc == '(' && (id == "ulid" || id == "uuid" || id == "rand")) {
          pos += 1; ws(); expectSym(")")
          FnCall(if (id == "rand") "rand::guid" else "rand::" + id, Nil)
        } else Lit(VStr(id))
      }
      else fail(s"invalid record id key start '$c'")
    }
  }

  def parseDatetime(s: String): V = {
    // chrono accepts a space separator and lowercase t/z
    val n0 = s.trim
    val n = {
      val b = n0.toCharArray
      var i = 0
      while (i < b.length) {
        if (b(i) == 't' && i >= 8) b(i) = 'T'
        else if (b(i) == ' ' && i >= 8 && n0.indexOf(' ') == i) b(i) = 'T'
        else if (b(i) == 'z' && i == b.length - 1) b(i) = 'Z'
        i += 1
      }
      val t0 = new String(b)
      // java.time needs canonical year fields; chrono writes -000000/000000
      val YearRe = "^([+-]?)(\\d{4,6})(-.*)$".r
      t0 match {
        case YearRe(sign, digits, rest) =>
          val y = BigInt(digits) * (if (sign == "-") -1 else 1)
          val yTxt =
            if (y >= 0 && y <= 9999) f"${y.toInt}%04d"
            else if (y < 0 && y >= -9999) "-" + f"${-y.toInt}%04d"
            else if (y > 0) "+" + f"${y.toInt}%06d"
            else "-" + f"${-y.toInt}%06d"
          yTxt + rest
        case _ => t0
      }
    }
    // sub-nanosecond fractions ROUND on the 10th digit (syn/lexer/strings/
    // datetime.rs:124-130: `if d - b'0' >= 5 { number += 1 }`); java.time
    // rejects >9 digits outright, so strip and re-add the rounding nano
    var roundNano = 0L
    val n2 = "\\.(\\d{10,})".r.replaceAllIn(n, m => {
      val digs = m.group(1)
      if (digs.charAt(9) >= '5') roundNano = 1L
      "." + digs.take(9)
    })
    val t = try {
      if (n2.length == 10) java.time.LocalDate.parse(n2).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      else java.time.OffsetDateTime.parse(n2).toInstant
    } catch {
      case _: Exception => throw SqlError(s"Expected a datetime but cannot convert '$s' into a datetime")
    }
    VDt(t.plusNanos(roundNano))
  }

  /** b"…" literal body → bytes. Parse-time only: a stray or missing hex
    * digit is a PARSE error (reference: "expected a hexidecimal digit",
    * parsing/bytes/error). */
  private def hexToBytes(s: String): Vector[Byte] = {
    val clean = s.trim
    if (clean.length % 2 != 0)
      throw ParseError("Unexpected end of byte-string, expected a hexidecimal digit", 0)
    if (!clean.forall(ch => Character.digit(ch, 16) >= 0))
      throw ParseError("Unexpected character, expected a hexidecimal digit", 0)
    clean.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toVector
  }
}
