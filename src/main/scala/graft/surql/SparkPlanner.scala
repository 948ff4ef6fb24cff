package graft.surql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact
import graft.surql.ast._

/** SurrealQL → Spark planner: lowers a parsed SELECT (or RETURN) onto
  * DataFrame plans over the parquet catalog — the Spark twin of the
  * reference's `plan_select_statement` pipeline assembly (surrealdb:
  * exec/planner/select.rs:1213, pipeline select.rs:195: source → Filter →
  * Split → Aggregate → Sort → Limit → Project → Fetch).
  *
  * Catalyst owns what the reference hand-implements: predicate pushdown into
  * the scan (`scan_predicate`), column pruning (`needed_fields`), TopK
  * (`SortTopK` → TakeOrderedAndProject), limit pushdown. Subquery `INSIDE`
  * membership lowers to semi/anti joins (decorrelated, one shuffle — the
  * reference re-executes per row, exec/physical_expr/subquery.rs).
  *
  * Numeric semantics in this path are ANSI-mode Spark (the table engine),
  * not the scalar interpreter's checked SurrealQL arithmetic; float
  * aggregates route through [[Exact]] decimal so distributed order never
  * changes a hash-compared result. */
object SparkPlanner {

  def query(spark: SparkSession, dir: String, surql: String): DataFrame = {
    val ast = Parser.parse(surql)
    ast.stmts match {
      case Seq(s: SelectStmt) => planSelect(spark, dir, s)
      case Seq(ReturnStmt(ObjLit(fields))) =>
        // RETURN { … }: one-row plan (SourceExpr/ExprPlan analog)
        val dummy = spark.range(1)
        dummy.select(fields.map { case (name, e) =>
          toCol(e, new StructType(), spark, dir).as(name) }: _*)
      case other => throw SqlError(s"SparkPlanner: unsupported statement shape $other")
    }
  }

  def planSelect(spark: SparkSession, dir: String, s: SelectStmt): DataFrame = {
    // ---- source ------------------------------------------------------
    val only = s.only
    val src: DataFrame = s.what match {
      case Seq(Idiom(Seq(PField(name)))) => Tables(spark, dir, name)
      case Seq(TableRef(name))           => Tables(spark, dir, name)
      case other => throw SqlError(s"SparkPlanner: unsupported FROM $other")
    }
    val schema = src.schema
    def c(e: Expr): Column = toCol(e, schema, spark, dir)

    // ---- filter ------------------------------------------------------
    var df = src
    s.where.foreach {
      case Binary(op @ ("INSIDE" | "NOTINSIDE"), l, Subquery(sub: SelectStmt)) =>
        // membership against a subquery → semi/anti join (decorrelated)
        val subDf = planSelect(spark, dir, sub)
        val key = subDf.columns.head
        val joinType = if (op == "INSIDE") "left_semi" else "left_anti"
        df = df.join(subDf, c(l) === subDf(key), joinType)
      case cond => df = df.filter(c(cond))
    }

    // ---- split -------------------------------------------------------
    // SPLIT ON an array-valued projected field: project first, then explode
    val splitFields = s.split.toSet

    // ---- aggregate / project -----------------------------------------
    val out: DataFrame = s.groupBy match {
      case Some(Nil) =>
        df.agg(aggCol(s.fields.head, schema, spark, dir),
          s.fields.tail.map(aggCol(_, schema, spark, dir)): _*)
      case Some(keys) =>
        val keyCols = keys.map(c)
        val (aggFields, keyFields) = s.fields.partition(f => isAggregate(f.expr))
        if (aggFields.isEmpty) {
          // keys-only GROUP BY = DISTINCT over the keys
          df.select(keyFields.map(f => c(f.expr).as(fieldAlias(f))): _*).distinct()
        } else {
          df.groupBy(keyCols: _*)
            .agg(aggCol(aggFields.head, schema, spark, dir),
              aggFields.tail.map(aggCol(_, schema, spark, dir)): _*)
        }
      case scala.None =>
        val cols = s.fields.map { f =>
          if (f.isAll) col("*")
          else {
            val base = c(f.expr)
            val name = fieldAlias(f)
            if (splitFields.contains(name)) explode(base).as(name) else base.as(name)
          }
        }
        df.select(cols: _*)
    }
    df = out

    // ---- order / start / limit --------------------------------------
    if (s.order.nonEmpty) {
      val keys = s.order.map { k =>
        val kc = k.expr match {
          // order keys may reference output aliases
          case Idiom(Seq(PField(n))) if df.columns.contains(n) => col(n)
          case e => toCol(e, schema, spark, dir)
        }
        if (k.desc) kc.desc else kc.asc
      }
      df = df.orderBy(keys: _*)
    }
    s.start.foreach { e => df = df.offset(Eval.evalConst(e) match { case n: VNum => n.toDouble.toInt; case _ => 0 }) }
    s.limit.foreach { e => df = df.limit(Eval.evalConst(e) match { case n: VNum => n.toDouble.toInt; case _ => Int.MaxValue }) }

    if (only) {
      // UnwrapExactlyOne (exec/operators/unwrap_exactly_one.rs:30): guard on
      // an already-pruned point lookup — O(1) rows reach the driver
      val n = df.limit(2).count()
      require(n == 1, s"FROM ONLY expects exactly 1 row, got $n")
    }
    df
  }

  private def fieldAlias(f: Field): String =
    f.alias.getOrElse(Eval.fieldName(f.expr))

  private def isAggregate(e: Expr): Boolean = e match {
    case FnCall(name, _) =>
      name == "count" || aggFns.contains(name)
    case Binary(_, l, r) => isAggregate(l) || isAggregate(r)
    case _ => false
  }

  private val aggFns = Set("math::sum", "math::mean", "math::min", "math::max",
    "math::stddev", "time::min", "time::max", "count")

  /** Aggregate output column (map-side partial + exact decimal routing for
    * float sums/means — see [[Exact]]). */
  private def aggCol(f: Field, schema: StructType, spark: SparkSession, dir: String): Column = {
    val name = fieldAlias(f)
    aggExpr(f.expr, schema, spark, dir).as(name)
  }

  private def aggExpr(e: Expr, schema: StructType, spark: SparkSession, dir: String): Column = e match {
    case FnCall("count", Nil) => count(lit(1))
    case FnCall("count", Seq(inner)) =>
      sum(when(toCol(inner, schema, spark, dir), 1L).otherwise(0L)).cast("bigint")
    case FnCall("math::sum", Seq(inner)) =>
      val ic = toCol(inner, schema, spark, dir)
      if (isDoubleTyped(inner, schema)) Exact.dsum(ic) else sum(ic)
    case FnCall("math::mean", Seq(inner)) =>
      val ic = toCol(inner, schema, spark, dir)
      if (isDoubleTyped(inner, schema)) Exact.davg(ic) else avg(ic)
    case FnCall("math::min", Seq(inner)) => min(toCol(inner, schema, spark, dir))
    case FnCall("math::max", Seq(inner)) => max(toCol(inner, schema, spark, dir))
    case FnCall("time::min", Seq(inner)) => min(toCol(inner, schema, spark, dir)).cast("date")
    case FnCall("time::max", Seq(inner)) => max(toCol(inner, schema, spark, dir)).cast("date")
    case other => toCol(other, schema, spark, dir)
  }

  /** Static type sniffing against the scan schema — enough to decide float
    * vs integer arithmetic and concat-vs-add. */
  private def typeOf(e: Expr, schema: StructType): Option[DataType] = e match {
    case Idiom(Seq(PField(n))) => schema.fields.find(_.name == n).map(_.dataType)
    case Lit(VStr(_))   => Some(StringType)
    case Lit(VInt(_))   => Some(LongType)
    case Lit(VFloat(_)) => Some(DoubleType)
    case Lit(VBool(_))  => Some(BooleanType)
    case Binary(("+" | "-" | "*" | "/"), l, r) =>
      (typeOf(l, schema), typeOf(r, schema)) match {
        case (Some(StringType), _) | (_, Some(StringType)) => Some(StringType)
        case (Some(DoubleType), _) | (_, Some(DoubleType)) => Some(DoubleType)
        case (a, _) => a
      }
    case FnCall(n, _) if n.startsWith("string::") => Some(StringType)
    case _ => scala.None
  }

  private def isDoubleTyped(e: Expr, schema: StructType): Boolean =
    typeOf(e, schema).contains(DoubleType)

  def toCol(e: Expr, schema: StructType, spark: SparkSession, dir: String): Column = {
    def c(x: Expr): Column = toCol(x, schema, spark, dir)
    e match {
      case Lit(VInt(i))    => lit(i)
      case Lit(VFloat(d))  => lit(d)
      case Lit(VStr(s))    => lit(s)
      case Lit(VBool(b))   => lit(b)
      case Lit(VDec(d))    => lit(d.toDouble)
      case Lit(VNone) | Lit(VNull) => lit(null)
      case Idiom(Seq(PField(n))) => col(n)
      case Idiom(Seq(PField(a), PField(b))) => col(s"$a.$b")
      case Prefix("-", inner) => -c(inner)
      case Prefix("!", inner) => !c(inner)
      case Binary(op, l, r) => op match {
        case "+" =>
          if (typeOf(l, schema).contains(StringType) || typeOf(r, schema).contains(StringType))
            concat(c(l), c(r))
          else c(l) + c(r)
        case "-"  => c(l) - c(r)
        case "*"  => c(l) * c(r)
        case "/"  => c(l) / c(r)
        case "%"  => c(l) % c(r)
        case "="  => c(l) === c(r)
        case "==" => c(l) === c(r)
        case "!=" => c(l) =!= c(r)
        case "<"  => c(l) < c(r)
        case "<=" => c(l) <= c(r)
        case ">"  => c(l) > c(r)
        case ">=" => c(l) >= c(r)
        case "&&" => c(l) && c(r)
        case "||" => c(l) || c(r)
        case "INSIDE" => r match {
          case ArrLit(items) => c(l).isin(items.map(i => Eval.evalConst(i) match {
            case VStr(s) => s; case VInt(n) => n; case VFloat(d) => d; case v => v.renderRaw
          }): _*)
          case _ => throw SqlError(s"SparkPlanner: unsupported INSIDE rhs $r")
        }
        case "CONTAINS" => array_contains(c(l), c(r))
        case other => throw SqlError(s"SparkPlanner: unsupported operator $other")
      }
      case FnCall(name, args) => fnCol(name, args, schema, spark, dir)
      case Cast(k, inner) => k match {
        case Kind.KInt     => c(inner).cast("bigint")
        case Kind.KFloat   => c(inner).cast("double")
        case Kind.KString  => c(inner).cast("string")
        case Kind.KBool    => c(inner).cast("boolean")
        case Kind.KDecimal => c(inner).cast("decimal(38,10)")
        case Kind.KDatetime => c(inner).cast("timestamp")
        case other => throw SqlError(s"SparkPlanner: unsupported cast $other")
      }
      case IfExpr(Seq((cond, thenE)), Some(elseE)) =>
        when(c(cond), c(thenE)).otherwise(c(elseE))
      case other => throw SqlError(s"SparkPlanner: unsupported expression $other")
    }
  }

  /** Scalar function name → Column mapping — builtins only, codegen-friendly
    * (SURVEY §2.4: functions, not UDFs). */
  private def fnCol(name: String, raw: Seq[Expr], schema: StructType,
      spark: SparkSession, dir: String): Column = {
    lazy val cs: IndexedSeq[Column] = raw.map(toCol(_, schema, spark, dir)).toIndexedSeq
    name match {
    case "string::lowercase" => lower(cs(0))
    case "string::uppercase" => upper(cs(0))
    case "string::len"       => length(cs(0)).cast("bigint")
    case "string::concat"    => concat(cs: _*)
    case "string::replace"   => regexp_replace(cs(0), raw(1) match { case Lit(VStr(s)) => s; case _ => " " },
      raw(2) match { case Lit(VStr(s)) => s; case _ => "" })
    case "string::trim"      => trim(cs(0))
    case "string::reverse"   => reverse(cs(0))
    case "string::slice"     =>
      val from = raw(1) match { case Lit(VInt(i)) => i.toInt; case _ => 0 }
      val len = raw(2) match { case Lit(VInt(i)) => i.toInt; case _ => Int.MaxValue }
      substring(cs(0), from + 1, len) // SurrealQL slice is 0-based
    case "string::starts_with" => cs(0).startsWith(cs(1))
    case "string::ends_with"   => cs(0).endsWith(cs(1))
    case "string::split"       => split(cs(0), raw(1) match { case Lit(VStr(s)) => java.util.regex.Pattern.quote(s); case _ => " " })
    case "string::distance::levenshtein" => levenshtein(cs(0), cs(1)).cast("bigint")
    case "math::abs"   => abs(cs(0))
    case "math::ceil"  => ceil(cs(0)).cast("bigint")
    case "math::floor" => floor(cs(0)).cast("bigint")
    case "math::round" => round(cs(0))
    case "math::fixed" => round(cs(0), raw(1) match { case Lit(VInt(i)) => i.toInt; case _ => 0 })
    case "math::sqrt"  => sqrt(cs(0))
    case "math::sign"  => signum(cs(0))
    case "math::pow"   => pow(cs(0), cs(1))
    case "math::max"   => raw(0) match {
      case ArrLit(items) => greatest(items.map(toCol(_, schema, spark, dir)): _*)
      case _ => cs(0)
    }
    case "math::min"   => raw(0) match {
      case ArrLit(items) => least(items.map(toCol(_, schema, spark, dir)): _*)
      case _ => cs(0)
    }
    case "time::year"   => year(cs(0)).cast("bigint")
    case "time::month"  => month(cs(0)).cast("bigint")
    case "time::day"    => dayofmonth(cs(0)).cast("bigint")
    case "time::hour"   => hour(cs(0)).cast("bigint")
    case "time::minute" => minute(cs(0)).cast("bigint")
    case "time::second" => second(cs(0)).cast("bigint")
    case "time::unix"   => unix_timestamp(cs(0)).cast("bigint")
    case "time::group"  =>
      val unit = raw(1) match { case Lit(VStr(s)) => s; case _ => "day" }
      date_trunc(unit, cs(0)).cast("date")
    case "count" => count(lit(1))
    case other => throw SqlError(s"SparkPlanner: unsupported function $other")
    }
  }
}
