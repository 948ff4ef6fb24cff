package graft.surql.ast

import graft.surql.V

/** Typed AST for the SurrealQL surface we execute — shaped after the
  * reference's `expr` tree (surrealdb: core/src/expr/, sql/ast.rs:39) but
  * only as deep as the analytics engine needs. */
sealed trait Expr

// ---- literals --------------------------------------------------------
final case class Lit(v: V) extends Expr
final case class ArrLit(items: Seq[Expr]) extends Expr
final case class ObjLit(fields: Seq[(String, Expr)]) extends Expr
/** Record id literal `person:1`, `person:foo`, `person:[1,'x']`; the key may
  * also be a range (`person:1..5`) for id-range scans. */
final case class RidLit(table: String, key: Expr) extends Expr
/** `|start..end|` mock / `|person:1000|` is out of scope; ranges are
  * first-class: `1..5`, `1>..=5`, `..5`. Bounds carry inclusivity. */
final case class RangeLit(lo: Option[(Expr, Boolean)], hi: Option[(Expr, Boolean)]) extends Expr

// ---- idioms ----------------------------------------------------------
/** Idiom path (expr/idiom/mod.rs:61, part.rs:21-38): a start plus parts. */
final case class Idiom(parts: Seq[Part]) extends Expr

sealed trait Part
final case class PStart(e: Expr) extends Part          // leading subexpr (param, subquery, literal)
final case class PField(name: String) extends Part     // .field  (or bare leading ident)
case object PAll extends Part                          // [*] / .*
case object PFlatten extends Part                      // … / ...
case object PLast extends Part                         // [$]
final case class PIndex(e: Expr) extends Part          // [expr]
final case class PWhere(e: Expr) extends Part          // [WHERE cond] / [? cond]
final case class PMethod(name: String, args: Seq[Expr]) extends Part // .method(args)
final case class PDestructure(fields: Seq[(String, Option[Seq[Part]])]) extends Part // .{a, b: c.d}
case object POptional extends Part                     // ?
/** One lookup subject: edge/reference table, optionally restricted to an id
  * (`->edge:1`) or id-range (`->edge:1..5`) (sql/lookup.rs LookupSubject). */
final case class LookupSubject(table: String, key: Option[Expr])

/** Graph hop `->edge->`/`<-edge<-`/`<->`/`<~` — a full Lookup
  * (expr/lookup.rs:20): optional SELECT-projection, WHERE, GROUP, ORDER,
  * LIMIT/START and alias all evaluate against the matched edge records. */
final case class PGraph(dir: String, what: Seq[LookupSubject],
    cond: Option[Expr] = scala.None,
    alias: Option[String] = scala.None,
    fields: Option[Seq[Field]] = scala.None,
    value: Boolean = false,
    only: Boolean = false,
    split: Seq[String] = Nil,
    groupBy: Option[Seq[Expr]] = scala.None,
    order: Seq[OrderKey] = Nil,
    limit: Option[Expr] = scala.None,
    start: Option[Expr] = scala.None,
    /** Source text of a parenthesized lookup — unaliased projections are
      * named by their written form (`"->(SELECT … FROM works_on …)"`). */
    raw: Option[String] = scala.None,
    /** `<~(table FIELD col)` — restrict reference scans to specific
      * referencing fields (sql/lookup.rs). */
    refFields: Seq[String] = Nil) extends Part
/** Current document `@` start (reference Part::Doc, syn/parser/prime.rs:48). */
case object PDoc extends Part
/** RepeatRecurse `.@` marker inside a recursion nest (part.rs RepeatRecurse). */
case object PRepeatRecurse extends Part

/** Recursion collection strategy (reference RecurseInstruction, expr/part.rs:505-520). */
sealed trait RecurseInstr
case object RDefault extends RecurseInstr
final case class RPath(inclusive: Boolean) extends RecurseInstr
final case class RCollect(inclusive: Boolean) extends RecurseInstr
final case class RShortest(target: Expr, inclusive: Boolean) extends RecurseInstr

/** Bounded recursion `.{n}` / `.{min..max}` (+instruction), optionally with a
  * parenthesized nest idiom carrying `.@` markers (expr/part.rs:462-520). */
final case class PRecurse(min: Option[Long], max: Option[Long], fixed: Boolean,
    nest: Option[Seq[Part]], instr: RecurseInstr) extends Part

// ---- operators -------------------------------------------------------
final case class Binary(op: String, l: Expr, r: Expr) extends Expr
final case class Prefix(op: String, e: Expr) extends Expr
final case class Cast(kind: Kind, e: Expr) extends Expr
final case class FnCall(name: String, args: Seq[Expr]) extends Expr
final case class Closure(params: Seq[(String, Option[Kind])], body: Expr,
    ret: Option[Kind] = scala.None) extends Expr
final case class Param(name: String) extends Expr
/** Parenthesized subquery or statement-expression: `(SELECT …)`, `(RETURN x)`. */
final case class Subquery(stmt: Statement) extends Expr
/** Block `{ stmt; stmt; … }` — evaluates to its last RETURN/value. */
final case class BlockExpr(stmts: Seq[Statement]) extends Expr
final case class IfExpr(branches: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Expr
/** Table reference in FROM position. */
final case class TableRef(name: String) extends Expr
final case class Constant(name: String) extends Expr    // math::PI, time::EPOCH …
/** Embedded `function() { … }` scripting body (raw JS text; only the
  * single-return-builtin shape is evaluable). */
final case class JsExpr(params: Seq[Expr], body: String) extends Expr

// ---- kinds (casts / DEFINE FIELD types) ------------------------------
sealed trait Kind
object Kind {
  case object KAny extends Kind
  case object KNone extends Kind
  case object KNull extends Kind
  case object KBool extends Kind
  case object KInt extends Kind
  case object KFloat extends Kind
  case object KDecimal extends Kind
  case object KNumber extends Kind
  case object KString extends Kind
  case object KDuration extends Kind
  case object KDatetime extends Kind
  case object KUuid extends Kind
  case object KBytes extends Kind
  case object KObject extends Kind
  case object KRegex extends Kind
  case object KRange extends Kind
  final case class KArray(inner: Option[Kind], max: Option[Long]) extends Kind
  final case class KSet(inner: Option[Kind], max: Option[Long]) extends Kind
  final case class KRecord(tables: Seq[String]) extends Kind
  final case class KGeometry(kinds: Seq[String]) extends Kind
  final case class KEither(kinds: Seq[Kind]) extends Kind
  final case class KOption(inner: Kind) extends Kind
  final case class KLiteral(v: V) extends Kind
  final case class KTable(names: Seq[String]) extends Kind
  final case class KLiteralArr(items: Seq[Kind]) extends Kind
  final case class KLiteralObj(fields: Seq[(String, Kind)]) extends Kind
  case object KFunction extends Kind
  case object KFile extends Kind
}

// ---- statements ------------------------------------------------------
sealed trait Statement

final case class ExprStmt(e: Expr) extends Statement
final case class LetStmt(name: String, kind: Option[Kind], what: Expr) extends Statement
final case class ReturnStmt(e: Expr) extends Statement
final case class IfStmt(branches: Seq[(Expr, Expr)], otherwise: Option[Expr]) extends Statement
final case class ForStmt(param: String, iterable: Expr, block: BlockExpr) extends Statement
final case class ThrowStmt(e: Expr) extends Statement
case object BreakStmt extends Statement
case object ContinueStmt extends Statement
final case class UseStmt(ns: Option[String], db: Option[String]) extends Statement
case object BeginStmt extends Statement
case object CommitStmt extends Statement
case object CancelStmt extends Statement
/** DEFINE/REMOVE/INFO/OPTION. DefineStmt remains the loose fallback for
  * kinds without dedicated semantics (ACCESS/BUCKET/CONFIG/API/…). */
final case class DefineStmt(what: String, name: String, clauses: Map[String, Expr],
    raw: String) extends Statement
/** mode: "" (error if exists) | "ifnotexists" | "overwrite"
  * (sql/statements/define DefineKind). */
final case class DefineTableStmt(d: graft.surql.Defs.TableDef, mode: String) extends Statement
final case class DefineEventStmt(d: graft.surql.Defs.EventDef, mode: String) extends Statement
final case class DefineUserStmt(d: graft.surql.Defs.UserDef, mode: String) extends Statement
final case class DefineSequenceStmt(d: graft.surql.Defs.SequenceDef, mode: String,
    batchE: Option[Expr] = scala.None, startE: Option[Expr] = scala.None,
    timeoutE: Option[Expr] = scala.None) extends Statement
/** DEFINE BUCKET (sql/statements/define/bucket.rs): an object-store
  * namespace for `file::*` / f"bucket:/key" values. */
final case class DefineBucketStmt(name: String, backend: Option[Expr],
    readonly: Boolean, perm: String, comment: Option[Expr],
    mode: String) extends Statement
/** NAMESPACE/DATABASE and other raw-rendered kinds. */
final case class DefineRawStmt(what: String, name: String, rendered: String,
    mode: String, value: Option[Expr] = scala.None,
    comment: Option[String] = scala.None) extends Statement
final case class DefineAnalyzerStmt(d: graft.surql.Defs.AnalyzerDef, mode: String) extends Statement
final case class DefineParamStmt(d: graft.surql.Defs.ParamDef, value: Option[Expr], mode: String) extends Statement
final case class DefineAccessStmt(d: graft.surql.Defs.AccessDef, mode: String,
    issuerKeyRaw: Option[String] = scala.None, keyRaw: Option[String] = scala.None,
    algorithm: Option[String] = scala.None,
    issuerAlgorithm: Option[String] = scala.None) extends Statement
final case class RemoveStmt(what: String, name: String, onTable: Option[String] = scala.None,
    ifExists: Boolean = false) extends Statement
final case class AlterTableStmt(name: String, ifExists: Boolean,
    drop: Option[Boolean], full: Option[Boolean], ttype: Option[(String, Seq[String], Seq[String], Boolean)],
    perms: Option[Seq[(String, String)]], comment: Option[Option[String]],
    changefeed: Option[Option[String]], compact: Boolean = false) extends Statement
/** ALTER family (sql/statements/alter/): each field is None = untouched,
  * Some(None) = DROP clause, Some(Some(v)) = SET clause. */
final case class AlterFunctionStmt(name: String, ifExists: Boolean,
    redefine: Option[DefineFunctionStmt],
    comment: Option[Option[String]], perms: Option[String]) extends Statement
final case class AlterEventStmt(name: String, table: String, ifExists: Boolean,
    when: Option[(Expr, String)], thenE: Option[(Seq[Expr], String)],
    comment: Option[Option[String]], async: Option[Boolean],
    retry: Option[Long], maxDepth: Option[Long]) extends Statement
final case class AlterFieldStmt(field: String, table: String, ifExists: Boolean,
    kind: Option[Option[(Kind, String)]], flexible: Option[Boolean],
    value: Option[Option[(Expr, String)]],
    default: Option[Option[(Expr, String, Boolean)]],
    assertC: Option[Option[(Expr, String)]], readonly: Option[Boolean],
    reference: Option[Option[String]], comment: Option[Option[String]],
    perms: Option[Seq[(String, String)]]) extends Statement
final case class AlterIndexStmt(name: String, table: String, ifExists: Boolean,
    comment: Option[Option[String]],
    prepareRemove: Option[Boolean] = scala.None) extends Statement
final case class AlterParamStmt(name: String, ifExists: Boolean,
    value: Option[(Expr, String)], comment: Option[Option[String]],
    perms: Option[String]) extends Statement
final case class AlterAnalyzerStmt(name: String, ifExists: Boolean,
    tokenizers: Option[Option[Seq[String]]], filters: Option[Option[Seq[String]]],
    comment: Option[Option[String]]) extends Statement
final case class AlterAccessStmt(name: String, level: String, ifExists: Boolean,
    authenticate: Option[Option[String]],
    durGrant: Option[Option[String]], durToken: Option[Option[String]],
    durSession: Option[Option[String]],
    comment: Option[Option[String]]) extends Statement
final case class AlterBucketStmt(name: String, ifExists: Boolean,
    readonly: Option[Boolean], comment: Option[Option[String]],
    perms: Option[String]) extends Statement
/** clauses: methods -> Some(action block) | None = DROP THEN. */
final case class AlterApiStmt(path: Expr, ifExists: Boolean,
    comment: Option[Option[String]],
    clauses: Seq[(Seq[String], Option[(Expr, String)])]) extends Statement
/** which: graphql | api | default; rendered: canonical clause tail. */
final case class AlterConfigStmt(which: String, ifExists: Boolean,
    rendered: String) extends Statement
final case class AlterSystemStmt(compact: Boolean,
    queryTimeout: Option[Option[(Long, Int)]]) extends Statement
/** ALTER NAMESPACE/DATABASE COMPACT. */
final case class AlterCompactStmt(level: String) extends Statement
/** ALTER SEQUENCE name TIMEOUT dur|NONE; timeout=None → clause absent. */
final case class AlterSequenceStmt(name: String, ifExists: Boolean,
    timeout: Option[Option[String]]) extends Statement
/** ACCESS … GRANT/SHOW/REVOKE/PURGE (sql/statements/access.rs). */
final case class AccessStmt(name: String, level: Option[String], op: String,
    subjectKind: String = "", subject: String = "",
    selector: String = "", selectorExpr: Option[Expr] = scala.None,
    purgeExpired: Boolean = false, purgeRevoked: Boolean = false,
    purgeFor: Option[String] = scala.None) extends Statement
final case class AlterUserStmt(name: String, level: String, ifExists: Boolean,
    passhash: Option[String], roles: Option[Seq[String]],
    durToken: Option[Option[String]], durSession: Option[Option[String]],
    comment: Option[Option[String]]) extends Statement
final case class DefineFunctionStmt(name: String, params: Seq[(String, Option[Kind])],
    body: Expr, paramsRaw: String = "", bodyRaw: String = "",
    mode: String = "", comment: Option[String] = scala.None,
    returnsRaw: Option[String] = scala.None,
    perms: String = "FULL") extends Statement
final case class DefineFieldStmt(field: String, table: String, kind: Option[Kind],
    flexible: Boolean, value: Option[Expr], default: Option[Expr], defaultAlways: Boolean,
    assert: Option[Expr], assertRaw: String, readonly: Boolean,
    meta: Option[graft.surql.Defs.FieldDef] = scala.None, mode: String = "",
    computed: Option[Expr] = scala.None) extends Statement
final case class DefineIndexStmt(name: String, table: String, fields: Seq[String],
    unique: Boolean, meta: Option[graft.surql.Defs.IndexDef] = scala.None,
    mode: String = "", concurrently: Boolean = false) extends Statement
final case class InfoStmt(level: String, target: String = "",
    structure: Boolean = false,
    version: Option[Expr] = scala.None) extends Statement
/** EXPLAIN [ANALYZE] [FORMAT JSON] <stmt> (exec/operators/explain.rs). */
final case class ExplainStmt(analyze: Boolean, json: Boolean,
    inner: Statement) extends Statement
final case class OptionStmt(name: String, value: Boolean) extends Statement
/** One `FOR <methods> [MIDDLEWARE …] [PERMISSIONS …] THEN <block>` clause of
  * DEFINE API (sql/statements/define/api.rs ApiAction; `FOR any` is the
  * fallback). Middleware entries: (full fn name, parsed args, canonical
  * rendered call). */
final case class ApiClause(methods: Seq[String],
    middleware: Seq[(String, Seq[Expr], String)],
    permsRaw: Option[String], action: Option[Expr], actionRaw: String)
final case class DefineApiStmt(path: Expr, clauses: Seq[ApiClause],
    comment: Option[String], mode: String) extends Statement
/** DEFINE CONFIG API — database-wide middleware + permissions
  * (sql/statements/define/config/api.rs). */
final case class DefineApiConfigStmt(middleware: Seq[(String, Seq[Expr], String)],
    permsRaw: Option[String], mode: String) extends Statement
/** Interpreter-native expression — carries a Scala function evaluated with
  * the caller's environment (API middleware `$next` plumbing; never parsed). */
final case class NativeExpr(f: graft.surql.Env => V) extends Expr
/** Planner-internal: an already-lowered Spark Column as an Expr leaf —
  * lets an inlined fn:: body bind its parameter to a higher-order-function
  * lambda variable (e.g. per-element FUNCTION-analyzer application).
  * Never produced by the parser; Subst passes it through untouched. */
final case class ColExpr(c: org.apache.spark.sql.Column) extends Expr

// SELECT (expr/statements/select.rs; planner exec/planner/select.rs:1213)
final case class Field(expr: Expr, alias: Option[String], isAll: Boolean = false)
final case class OrderKey(expr: Expr, desc: Boolean, collate: Boolean, numeric: Boolean)
final case class SelectStmt(
    fields: Seq[Field],
    value: Boolean,                 // SELECT VALUE expr
    omit: Seq[String],
    only: Boolean,
    what: Seq[Expr],
    where: Option[Expr],
    split: Seq[String],
    groupBy: Option[Seq[Expr]],     // Some(Nil) = GROUP ALL
    order: Seq[OrderKey],
    orderRand: Boolean,
    limit: Option[Expr],
    start: Option[Expr],
    /** FETCH items: plain idioms parse as `Lit(VStr(path))`; params and
      * `type::field(s)` calls stay as exprs resolved at execution time. */
    fetch: Seq[Expr],
    version: Option[Expr],
    timeout: Option[Expr],
    explain: Boolean,
    explainFull: Boolean = false,
    /** WITH INDEX hints: None = auto, Some(Nil) = NOINDEX, Some(names). */
    withIndex: Option[Seq[String]] = scala.None) extends Statement

// Mutations (expr/statements/{create,insert,update,upsert,delete,relate}.rs)
sealed trait Data
final case class SetData(sets: Seq[(Idiom, String, Expr)]) extends Data // op: = += -= etc.
final case class UnsetData(fields: Seq[Idiom]) extends Data
final case class ContentData(e: Expr) extends Data
final case class MergeData(e: Expr) extends Data
final case class ReplaceData(e: Expr) extends Data
final case class PatchData(e: Expr) extends Data

sealed trait Output
object Output {
  case object ONone extends Output
  case object ONull extends Output
  case object ODiff extends Output
  case object OBefore extends Output
  case object OAfter extends Output
  final case class OFields(fields: Seq[Field]) extends Output
  /** RETURN VALUE expr — bare value per record (expr/output.rs). */
  final case class OValue(e: Expr) extends Output
}

final case class CreateStmt(only: Boolean, what: Seq[Expr], data: Option[Data],
    output: Option[Output], timeout: Option[Expr] = scala.None) extends Statement
final case class InsertStmt(ignore: Boolean, into: Option[Expr], values: Expr,
    onDuplicate: Option[Seq[(Idiom, String, Expr)]], relation: Boolean,
    output: Option[Output]) extends Statement
final case class UpdateStmt(only: Boolean, what: Seq[Expr], data: Option[Data],
    where: Option[Expr], output: Option[Output],
    explain: Boolean = false, timeout: Option[Expr] = scala.None) extends Statement
final case class UpsertStmt(only: Boolean, what: Seq[Expr], data: Option[Data],
    where: Option[Expr], output: Option[Output],
    explain: Boolean = false, timeout: Option[Expr] = scala.None) extends Statement
final case class DeleteStmt(only: Boolean, what: Seq[Expr], where: Option[Expr],
    output: Option[Output], explain: Boolean = false,
    timeout: Option[Expr] = scala.None) extends Statement
/** LIVE SELECT … — register a realtime subscription, returns its uuid
  * (expr/statements/live.rs:23-30). */
final case class LiveStmt(fields: Seq[Field], value: Boolean, diff: Boolean,
    what: Expr, where: Option[Expr], fetch: Seq[String]) extends Statement
/** KILL ⟨uuid⟩ — drop a live subscription (expr/statements/kill.rs). */
final case class KillStmt(id: Expr) extends Statement
/** SHOW CHANGES FOR TABLE t | DATABASE SINCE ts|vs [LIMIT n]
  * (expr/statements/show.rs). */
final case class ShowChangesStmt(table: Option[String], since: Expr,
    limit: Option[Expr]) extends Statement

/** REBUILD INDEX [IF EXISTS] name ON table (sql/statements/rebuild.rs). */
final case class RebuildIndexStmt(name: String, table: String,
    ifExists: Boolean) extends Statement
final case class RelateStmt(only: Boolean, from: Expr, edge: Expr, to: Expr,
    data: Option[Data], output: Option[Output]) extends Statement

/** A parsed query: the statement list. */
final case class Ast(stmts: Seq[Statement])
