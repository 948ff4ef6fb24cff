package graft.surql

import graft.surql.ast._
import scala.collection.mutable

/** Aggregation analysis for GROUP BY queries — mirrors the reference's
  * catalog/aggregation.rs:991 `analyze_fields_groups`: pulls the known
  * aggregate function calls out of the select fields, dedups their argument
  * expressions (`expr0`, `expr1`, …), rewrites the fields to reference
  * `_aN`/`_gN` placeholder fields, and resolves group-aliased fields.
  * Drives the legacy EXPLAIN `Group` collector detail and the new-executor
  * `Aggregate` node attributes. */
object AggAnalysis {

  sealed trait Agg { def label: String }
  case object ACount extends Agg { val label = "Count" }
  final case class ACountValue(arg: Int) extends Agg { def label = s"CountValue(expr$arg)" }
  final case class ANumberMax(arg: Int) extends Agg { def label = s"NumberMax(expr$arg)" }
  final case class ANumberMin(arg: Int) extends Agg { def label = s"NumberMin(expr$arg)" }
  final case class ASum(arg: Int) extends Agg { def label = s"Sum(expr$arg)" }
  final case class AMean(arg: Int) extends Agg { def label = s"Mean(expr$arg)" }
  final case class AStdDev(arg: Int) extends Agg { def label = s"StdDev(expr$arg)" }
  final case class AVariance(arg: Int) extends Agg { def label = s"Variance(expr$arg)" }
  final case class ADatetimeMax(arg: Int) extends Agg { def label = s"DatetimeMax(expr$arg)" }
  final case class ADatetimeMin(arg: Int) extends Agg { def label = s"DatetimeMin(expr$arg)" }
  final case class AAccumulate(arg: Int) extends Agg { def label = s"Accumulate(expr$arg)" }

  final case class Analysis(
      aggregateArgs: Vector[Expr],
      aggregations: Vector[Agg],
      groupExprs: Vector[Expr],
      /** SELECT VALUE: Left(rewritten expr); fields: Right(name → rewritten). */
      fields: Either[Expr, Seq[(String, Expr)]])

  private val fnOf: Map[String, Int => Agg] = Map(
    "math::max" -> ANumberMax.apply, "math::min" -> ANumberMin.apply,
    "math::sum" -> ASum.apply, "math::mean" -> AMean.apply,
    "math::stddev" -> AStdDev.apply, "math::variance" -> AVariance.apply,
    "time::max" -> ADatetimeMax.apply, "time::min" -> ADatetimeMin.apply)

  def analyze(fields: Seq[Field], value: Boolean, groups: Seq[Expr]): Analysis = {
    val exprsMap = mutable.LinkedHashMap[Expr, Int]()
    val aggs = mutable.ArrayBuffer[Agg]()
    // group_expressions start as the GROUP BY idioms; a field whose ALIAS is
    // a group idiom replaces that slot with the field's expression
    val groupExprs = mutable.ArrayBuffer[Expr](groups: _*)
    def argIdx(e: Expr): Int = exprsMap.getOrElseUpdate(e, exprsMap.size)
    def aggRef(): Expr = Idiom(Seq(PField(s"_a${aggs.length - 1}")))

    def rewrite(e: Expr): Expr = e match {
      case FnCall("count", Nil) =>
        aggs += ACount; aggRef()
      case FnCall("count", Seq(a)) =>
        val i = argIdx(a); aggs += ACountValue(i); aggRef()
      case FnCall(n, Seq(a)) if fnOf.contains(n) =>
        val i = argIdx(a); aggs += fnOf(n)(i); aggRef()
      case id @ Idiom(parts) =>
        val gi = groups.indexOf(id)
        if (gi >= 0) Idiom(Seq(PField(s"_g$gi")))
        else parts.headOption match {
          case Some(PField(f)) =>
            // bare field: implicit Accumulate of the head field; remaining
            // idiom parts are applied to the accumulated array afterwards
            val i = argIdx(Idiom(Seq(PField(f))))
            aggs += AAccumulate(i)
            Idiom(PField(s"_a${aggs.length - 1}") +: parts.tail)
          case _ => id
        }
      case Binary(op, l, r) => Binary(op, rewrite(l), rewrite(r))
      case Prefix(op, i)    => Prefix(op, rewrite(i))
      case Cast(k, i)       => Cast(k, rewrite(i))
      case FnCall(n, as)    => FnCall(n, as.map(rewrite))
      case other            => other
    }

    val out: Either[Expr, Seq[(String, Expr)]] =
      if (value) Left(rewrite(fields.head.expr))
      else Right(fields.filterNot(_.isAll).map { f =>
        val aliasGroupIdx = f.alias.flatMap { a =>
          val idx = groups.indexOf(Idiom(Seq(PField(a))))
          if (idx >= 0) Some(idx) else scala.None
        }
        aliasGroupIdx match {
          case Some(gi) =>
            groupExprs(gi) = f.expr
            f.alias.get -> (Idiom(Seq(PField(s"_g$gi"))): Expr)
          case scala.None =>
            val name = f.alias.getOrElse(Eval.fieldName(f.expr))
            name -> rewrite(f.expr)
        }
      })

    Analysis(exprsMap.keys.toVector, aggs.toVector, groupExprs.toVector, out)
  }
}
