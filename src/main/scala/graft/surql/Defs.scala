package graft.surql

/** Typed catalog-definition records with canonical `to_sql` renders —
  * the INFO FOR ROOT/NS/DB/TABLE statements output these canonical strings
  * (reference: catalog/table.rs:126, catalog/schema/field.rs:147,
  * sql/statements/define/{table,field}.rs fmt_sql). Clause order matters:
  * the golden corpus compares the rendered text byte-for-byte. */
object Defs {

  def escIdent(s: String): String =
    if (s.nonEmpty && (s.head.isLetter || s.head == '_') &&
        s.forall(c => c.isLetterOrDigit || c == '_')) s
    else "`" + s + "`"

  /** Group actions with equal permission values into FOR clauses
    * (sql/permission.rs): all-NONE → NONE, all-FULL → FULL, else
    * `FOR select FULL, FOR create, update NONE`-style groups in first-
    * appearance order. */
  def renderPerms(actions: Seq[(String, String)], collapseNone: Boolean = true): String =
    if (collapseNone && actions.forall(_._2 == "NONE")) "PERMISSIONS NONE"
    else if (actions.forall(_._2 == "FULL")) "PERMISSIONS FULL"
    else {
      val groups = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[String]]()
      actions.foreach { case (a, v) => groups.getOrElseUpdate(v, scala.collection.mutable.ArrayBuffer()) += a }
      "PERMISSIONS " + groups.map { case (v, as) => s"FOR ${as.mkString(", ")} $v" }.mkString(", ")
    }

  val tablePermsDefault: Seq[(String, String)] =
    Seq("select" -> "NONE", "create" -> "NONE", "update" -> "NONE", "delete" -> "NONE")
  val fieldPermsDefault: Seq[(String, String)] =
    Seq("select" -> "FULL", "create" -> "FULL", "update" -> "FULL")

  final case class TableDef(
      name: String,
      drop: Boolean = false,
      full: Boolean = false,
      ttype: String = "ANY",
      relIn: Seq[String] = Nil,
      relOut: Seq[String] = Nil,
      enforced: Boolean = false,
      view: Option[String] = scala.None,          // raw `SELECT …` text
      viewStmt: Option[ast.SelectStmt] = scala.None,
      changefeed: Option[String] = scala.None,
      perms: Seq[(String, String)] = tablePermsDefault,
      comment: Option[String] = scala.None) {
    def render: String = {
      // reserved words backtick in the catalog render (`table`)
      val sb = new StringBuilder("DEFINE TABLE ").append(Explain.escKwIdent(name)).append(" TYPE ")
      ttype match {
        case "RELATION" =>
          sb.append("RELATION")
          if (relIn.nonEmpty) sb.append(" IN ").append(relIn.map(escIdent).mkString(" | "))
          if (relOut.nonEmpty) sb.append(" OUT ").append(relOut.map(escIdent).mkString(" | "))
          if (enforced) sb.append(" ENFORCED")
        case t => sb.append(t)
      }
      if (drop) sb.append(" DROP")
      sb.append(if (full) " SCHEMAFULL" else " SCHEMALESS")
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      view.foreach(v => sb.append(" AS ").append(v))
      changefeed.foreach(c => sb.append(" CHANGEFEED ").append(c))
      sb.append(" ").append(renderPerms(perms))
      sb.toString
    }
  }

  final case class FieldDef(
      name: String,
      table: String,
      flexible: Boolean = false,
      kindRaw: Option[String] = scala.None,
      defaultRaw: Option[String] = scala.None,
      defaultAlways: Boolean = false,
      readonly: Boolean = false,
      valueRaw: Option[String] = scala.None,
      assertRaw: Option[String] = scala.None,
      computedRaw: Option[String] = scala.None,
      referenceRaw: Option[String] = scala.None,
      comment: Option[String] = scala.None,
      perms: Seq[(String, String)] = fieldPermsDefault) {
    def render: String = {
      // keyword-position field segments are backticked (`value`, `all`);
      // in/out stay bare (reference could_be_reserved_keyword); EMPTY
      // segments render as `` (parsing/idents/empty_identifiers)
      val escName = name.split("\\.", -1).map { seg =>
        if (seg == "value" || seg == "all" || seg.isEmpty) "`" + seg + "`" else seg
      }.mkString(".")
      val sb = new StringBuilder("DEFINE FIELD ").append(escName)
        .append(" ON ").append(escIdent(table))
      kindRaw.foreach { k =>
        // `<any>` element types render collapsed (array<any> → array);
        // `option<T>` is sugar for the union and renders `none | T`
        // (3.x Kind has no Option variant; reproductions/6297)
        sb.append(" TYPE ").append(desugarOption(
          k.replace("array<any>", "array").replace("set<any>", "set")))
        if (flexible) sb.append(" FLEXIBLE")
      }
      defaultRaw.foreach { d =>
        sb.append(if (defaultAlways) " DEFAULT ALWAYS " else " DEFAULT ").append(normRaw(d))
      }
      if (readonly) sb.append(" READONLY")
      valueRaw.foreach(v => sb.append(" VALUE ").append(normRaw(v)))
      assertRaw.foreach(a => sb.append(" ASSERT ").append(normRaw(a)))
      computedRaw.foreach(c => sb.append(" COMPUTED ").append(normRaw(c)))
      referenceRaw.foreach(r => sb.append(" REFERENCE ").append(r))
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      // catalog fields don't track delete perms: all-NONE renders as a
      // FOR-group, never collapsed (sql/permission.rs fmt_sql delete skip)
      sb.append(" ").append(renderPerms(perms, collapseNone = false))
      sb.toString
    }
  }

  final case class IndexDef(
      name: String,
      table: String,
      fields: Seq[String] = Nil,
      tail: String = "",                           // "UNIQUE" | "FULLTEXT …" | "HNSW …" | "COUNT" | ""
      comment: Option[String] = scala.None,
      prepareRemove: Boolean = false) {
    def unique: Boolean = tail.startsWith("UNIQUE")
    def render: String = {
      val sb = new StringBuilder("DEFINE INDEX ").append(escIdent(name))
        .append(" ON ").append(escIdent(table))
      if (fields.nonEmpty) sb.append(" FIELDS ").append(fields.mkString(", "))
      val t = if (tail.toUpperCase.startsWith("HNSW")) canonHnsw(tail) else tail
      if (t.nonEmpty) sb.append(" ").append(t)
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.toString
    }
  }

  /** Canonical HNSW clause: absent params render with their parser defaults
    * — DIST EUCLIDEAN, TYPE F32, EFC 150, M 12, M0 = 2·M, LM = 1/ln(M)
    * (syn/parser/stmt/define.rs:1105-1171, fmt sql/index.rs:226). */
  private def canonHnsw(tail: String): String = {
    val toks = tail.trim.split("\\s+")
    def arg(key: String): Option[String] = {
      val i = toks.indexWhere(_.equalsIgnoreCase(key))
      if (i >= 0 && i + 1 < toks.length) Some(toks(i + 1)) else scala.None
    }
    def flag(key: String): Boolean = toks.exists(_.equalsIgnoreCase(key))
    val dim  = arg("DIMENSION").getOrElse("0")
    val dist = arg("DIST").map(_.toUpperCase).getOrElse("EUCLIDEAN")
    val typ  = arg("TYPE").map(_.toUpperCase).getOrElse("F32")
    val efc  = arg("EFC").getOrElse("150")
    val m    = arg("M").map(_.toInt).getOrElse(12)
    val m0   = arg("M0").map(_.toInt).getOrElse(m * 2)
    val lm   = arg("LM").map(_.toDouble).getOrElse(1.0 / math.log(m.toDouble))
    val sb = new StringBuilder(
      s"HNSW DIMENSION $dim DIST $dist TYPE $typ EFC $efc M $m M0 $m0 LM ${Render.sql(VFloat(lm))}")
    if (flag("EXTEND_CANDIDATES")) sb.append(" EXTEND_CANDIDATES")
    if (flag("KEEP_PRUNED_CONNECTIONS")) sb.append(" KEEP_PRUNED_CONNECTIONS")
    sb.toString
  }

  /** Canonical expression-text normalization: collapse whitespace, tighten
    * parens, backtick reserved-word idents (the reference re-renders from
    * its AST; we normalize the captured source instead). */
  def normRaw(s: String): String = {
    var t = stripLineComments(s).replaceAll("\\s+", " ").trim
    t = t.replace("( ", "(").replace(" )", ")")
    t = t.replaceAll("(?<![\\w$.:`])value(\\s*=[^=])", "`value`$1")
    t = t.replace("{ }", "{  }").replace("{}", "{  }")
    t = replaceBareWord(t, "IN", "INSIDE")
    // canonical operator spellings: || → OR, && → AND (sql/operator.rs fmt)
    t = replaceSymbol(t, "||", " OR ")
    t = replaceSymbol(t, "&&", " AND ")
    t = t.replaceAll("\\s+", " ").trim
    t = t.replace("{ }", "{  }").replace("{}", "{  }")
    t = requoteStrings(t)
    t
  }

  /** `option<T>` → `none | T` (recursively): 3.x desugars option at parse
    * time, so catalog kinds never render the option<> form. */
  def desugarOption(s: String): String = {
    val i = s.indexOf("option<")
    if (i < 0) s
    else {
      var depth = 1
      var j = i + 7
      while (j < s.length && depth > 0) {
        val c = s.charAt(j)
        if (c == '<') depth += 1 else if (c == '>') depth -= 1
        j += 1
      }
      val inner = s.substring(i + 7, j - 1)
      desugarOption(s.substring(0, i) + "none | " + inner + s.substring(j))
    }
  }

  /** Drop `//` line comments outside quoted strings/idents — the reference
    * parses raw bodies to an AST and re-renders, so comments never survive
    * into catalog output (upgrade/value/table: COMPUTED body comment). */
  private def stripLineComments(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val q = c
        sb.append(c); i += 1
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && q != '`') { sb.append(s.charAt(i)); i += 1 }
          if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
        }
        if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '/') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Replace a symbol token outside quoted strings/idents. */
  private def replaceSymbol(s: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val q = c
        sb.append(c); i += 1
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && q != '`') { sb.append(s.charAt(i)); i += 1 }
          if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
        }
        if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
      } else if (s.regionMatches(i, from, 0, from.length)) {
        sb.append(to); i += from.length
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Tokens after which a bare IN is the FOREACH keyword or a field named
    * `in`, never the binary operator (an operator needs a left operand;
    * foreach renders with IN — sql/statements/foreach.rs:16). */
  private val nonOperatorBefore = Set(
    "WHERE", "AND", "OR", "NOT", "SELECT", "RETURN", "THEN", "ELSE", "DO",
    "SET", "CONTENT", "MERGE", "REPLACE", "PATCH", "WHEN", "IF", "FROM",
    "GROUP", "SPLIT", "OMIT", "VALUE", "ON", "BY", "LET", "ALL", "ANY", "NONE")

  /** Replace a bare keyword token outside quoted strings/idents, in OPERATOR
    * position only (canonical operator spelling: IN → INSIDE,
    * sql/operator.rs). Operator position = the previous token ends an
    * expression (ident/literal/closing bracket) and is not itself a keyword
    * that starts a clause; `FOR $x IN …` keeps the foreach keyword. */
  private def replaceBareWord(s: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val q = c
        sb.append(c); i += 1
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && q != '`') { sb.append(s.charAt(i)); i += 1 }
          if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
        }
        if (i < s.length) { sb.append(s.charAt(i)); i += 1 }
      } else if (s.regionMatches(true, i, from, 0, from.length) &&
          (i == 0 || !s.charAt(i - 1).isLetterOrDigit && s.charAt(i - 1) != '_' && s.charAt(i - 1) != ':' && s.charAt(i - 1) != '$' && s.charAt(i - 1) != '`') &&
          (i + from.length >= s.length || !s.charAt(i + from.length).isLetterOrDigit && s.charAt(i + from.length) != '_') &&
          operatorPosition(s, i)) {
        sb.append(to); i += from.length
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** True when the token starting at `i` sits in binary-operator position:
    * the previous non-space char closes an expression and the previous word
    * is neither a clause keyword nor a foreach binding (`FOR $x`). */
  private def operatorPosition(s: String, i: Int): Boolean = {
    var j = i - 1
    while (j >= 0 && s.charAt(j) == ' ') j -= 1
    if (j < 0) return false
    val pc = s.charAt(j)
    val endsExpr = pc.isLetterOrDigit || pc == '_' || pc == ')' || pc == ']' ||
      pc == '}' || pc == '\'' || pc == '"' || pc == '`'
    if (!endsExpr) return false
    // extract the previous word (idents, params, keywords)
    var k = j
    while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k -= 1
    if (k >= 0 && s.charAt(k) == '$') {
      // a $param is an expression, not a keyword — operator position UNLESS
      // it is a foreach binding: `FOR $x IN` renders with IN (foreach.rs:16)
      var m = k - 1
      while (m >= 0 && s.charAt(m) == ' ') m -= 1
      val e = m
      while (m >= 0 && s.charAt(m).isLetter) m -= 1
      return !s.substring(m + 1, e + 1).equalsIgnoreCase("FOR")
    }
    val word = s.substring(k + 1, j + 1)
    if (word.nonEmpty && nonOperatorBefore.contains(word.toUpperCase)) return false
    true
  }

  /** Re-render simple double-quoted string literals with the reference's
    * single-quote preference (QuoteStr: `'` unless the text contains one).
    * Only rewrites literals free of quotes and escapes; skips content inside
    * single-quoted strings. */
  private def requoteStrings(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          val j = { var k = i + 1; while (k < s.length && s.charAt(k) != '\'') { if (s.charAt(k) == '\\') k += 1; k += 1 }; k }
          sb.append(s.substring(i, math.min(j + 1, s.length))); i = j + 1
        case '"' =>
          val j = { var k = i + 1; while (k < s.length && s.charAt(k) != '"') { if (s.charAt(k) == '\\') k += 1; k += 1 }; k }
          if (j < s.length) {
            val body = s.substring(i + 1, j)
            if (!body.contains('\'') && !body.contains('\\')) sb.append('\'').append(body).append('\'')
            else sb.append(s.substring(i, j + 1))
            i = j + 1
          } else { sb.append(s.charAt(i)); i += 1 }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  final case class EventDef(
      name: String,
      table: String,
      whenRaw: String,
      thenRaw: String,
      whenE: Option[ast.Expr],
      thenE: Seq[ast.Expr],
      async: Boolean = false,
      retry: Option[Long] = scala.None,
      maxDepth: Option[Long] = scala.None,
      comment: Option[String] = scala.None) {
    def render: String = {
      val thenN = normRaw(thenRaw).replace("; }", " }")
      val stmtStart = Seq("SELECT", "CREATE", "UPDATE", "UPSERT", "DELETE",
        "RELATE", "INSERT", "DEFINE", "REMOVE", "RETURN", "IF ", "FOR ", "LET ")
        .exists(k => thenN.toUpperCase.startsWith(k))
      val thenTxt =
        if (thenN.startsWith("(") || thenN.startsWith("{")) thenN
        else if (stmtStart) s"($thenN)"
        else thenN
      val sb = new StringBuilder("DEFINE EVENT ").append(escIdent(name))
        .append(" ON ").append(escIdent(table))
      if (async) {
        // ASYNC defaults render explicitly (RETRY 1 MAXDEPTH 3)
        sb.append(" ASYNC")
        sb.append(" RETRY ").append(retry.getOrElse(1L))
        sb.append(" MAXDEPTH ").append(maxDepth.getOrElse(3L))
      }
      sb.append(" WHEN ").append(normRaw(whenRaw)).append(" THEN ").append(thenTxt)
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.toString
    }
  }

  final case class UserDef(
      name: String,
      level: String,                                // ROOT | NAMESPACE | DATABASE
      passhash: String,
      roles: Seq[String] = Seq("VIEWER"),
      durToken: String = "1h",
      durSession: String = "NONE",
      comment: Option[String] = scala.None) {
    def render: String =
      s"DEFINE USER ${escIdent(name)} ON $level PASSHASH '$passhash' ROLES ${roles.mkString(", ")} " +
        s"DURATION FOR TOKEN $durToken, FOR SESSION $durSession" +
        comment.map(c => " COMMENT " + Render.sql(VStr(c))).getOrElse("")
  }

  final case class SequenceDef(
      name: String,
      batch: Long = 1000,
      start: Long = 0,
      timeout: Option[String] = scala.None) {
    def render: String = {
      val sb = new StringBuilder("DEFINE SEQUENCE ").append(escIdent(name))
        .append(" BATCH ").append(batch).append(" START ").append(start)
      timeout.foreach(t => sb.append(" TIMEOUT ").append(t))
      sb.toString
    }
  }

  /** Raw-render definitions (accesses, namespaces, databases) — canonical
    * text assembled at parse time. */
  final case class RawDef(name: String, rendered: String)

  /** DEFINE FUNCTION catalog entry (sql/statements/define/function.rs
    * fmt_sql: name(params) [-> ret] body [COMMENT c] PERMISSIONS p). */
  final case class FnDef(
      name: String,                                // full "fn::name"
      paramsRaw: String,                           // "($a: int, $b)"
      returnsRaw: Option[String] = scala.None,
      bodyRendered: String = "",
      comment: Option[String] = scala.None,
      perms: String = "FULL") {
    def render: String = {
      val sb = new StringBuilder("DEFINE FUNCTION ").append(name).append(paramsRaw)
      returnsRaw.foreach(r => sb.append(" -> ").append(r))
      sb.append(' ').append(bodyRendered)
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.append(" PERMISSIONS ").append(perms)
      sb.toString
    }
  }

  /** DEFINE PARAM catalog entry (sql/statements/define/param.rs). */
  final case class ParamDef(
      name: String,                                // without '$'
      valueRaw: String,
      comment: Option[String] = scala.None,
      perms: String = "FULL") {
    def render: String = {
      val sb = new StringBuilder("DEFINE PARAM $").append(name)
        .append(" VALUE ").append(valueRaw)
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.append(" PERMISSIONS ").append(perms)
      sb.toString
    }
  }

  /** DEFINE ANALYZER catalog entry (sql/statements/define/analyzer.rs
    * fmt_sql: FUNCTION, TOKENIZERS joined ",", FILTERS joined ", "). */
  final case class AnalyzerDef(
      name: String,
      function: Option[String] = scala.None,
      tokenizers: Option[Seq[String]] = scala.None,
      filters: Option[Seq[String]] = scala.None,
      comment: Option[String] = scala.None) {
    def render: String = {
      val sb = new StringBuilder("DEFINE ANALYZER ").append(escIdent(name))
      function.foreach(fn => sb.append(" FUNCTION ").append(fn))
      tokenizers.foreach(ts => sb.append(" TOKENIZERS ").append(ts.mkString(",")))
      filters.foreach(fs => sb.append(" FILTERS ").append(fs.mkString(", ")))
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.toString
    }
  }

  /** DEFINE ACCESS catalog entry (sql/statements/define/access.rs fmt_sql;
    * access_type.rs ToSql). `typeRendered` is the canonical `TYPE …` tail
    * with keys redacted; durations render with defaults always printed. */
  final case class AccessDef(
      name: String,
      level: String,                               // ROOT | NAMESPACE | DATABASE
      kind: String,                                // JWT | RECORD | BEARER
      typeRendered: String,                        // "JWT ALGORITHM HS256 KEY '[REDACTED]' …"
      bearerSubject: String = "",                  // USER | RECORD (bearer only)
      canIssueGrants: Boolean = false,
      canIssueTokens: Boolean = true,
      authenticateRaw: Option[String] = scala.None,
      durGrant: Option[String] = Some("4w2d"),     // None renders NONE
      durToken: Option[String] = Some("1h"),
      durSession: Option[String] = scala.None,
      comment: Option[String] = scala.None,
      signupRaw: Option[String] = scala.None,      // RECORD SIGNUP body (raw)
      signinRaw: Option[String] = scala.None) {    // RECORD SIGNIN body (raw)
    def render: String = {
      val sb = new StringBuilder("DEFINE ACCESS ").append(escIdent(name))
        .append(" ON ").append(level).append(" TYPE ").append(typeRendered)
      authenticateRaw.foreach(a => sb.append(" AUTHENTICATE ").append(a))
      sb.append(" DURATION")
      if (canIssueGrants) sb.append(" FOR GRANT ").append(durGrant.getOrElse("NONE")).append(',')
      if (canIssueTokens) sb.append(" FOR TOKEN ").append(durToken.getOrElse("NONE")).append(',')
      sb.append(" FOR SESSION ").append(durSession.getOrElse("NONE"))
      comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
      sb.toString
    }
  }
}
