package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst kernels for float-vector math (SURVEY §2 vector::* and
  * the KNN/similarity operators; reference distance kernels:
  * idx/trees/vector.rs, fnc/vector.rs).
  *
  * The composable alternative — `aggregate(zip_with(a, b, …))` — is correct
  * but runs as interpreted lambda evaluation per element and materializes
  * the zipped array; it also blocks whole-stage codegen for the surrounding
  * operator. These expressions generate a tight primitive Java loop over
  * the two `ArrayData`s (no allocation, no boxing) via `doGenCode`, so a
  * brute-force KNN scan or an LSH rerank stays inside one codegen stage.
  * That is exactly the preference order the engine follows: built-in
  * functions where they fit, a native `Expression` where the built-ins
  * leave performance on the table, UDFs never.
  *
  * Accumulation is an IN-ORDER double fold — bit-identical to the HOF
  * lowering it replaces and to the DuckDB oracle's `list_sum(
  * list_transform(…))` replay, so hash-compared results are unchanged.
  * Element nulls are not expected (embedding vectors are dense); length
  * mismatch folds over the common prefix. */
abstract class VectorFoldF extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  /** Java ArrayData accessor for one side's element type (float vectors are
    * the stored form; query-side literals arrive as double arrays). */
  private def accessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }
  private def getD(arr: ArrayData, i: Int, e: Expression): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  /** Per-element term in the fold (scala-side interpreted fallback). */
  protected def combine(x: Double, y: Double): Double
  /** Per-element term as a Java expression over `x`/`y` double variables. */
  protected def combineJava(x: String, y: String): String
  /** Final transform of the accumulated sum. */
  protected def finish(s: Double): Double = s
  protected def finishJava(s: String): String = s

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combine(getD(a, i, left), getD(b, i, right))
      i += 1
    }
    finish(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.${accessor(left)}($i);
         |  double $y = (double) $b.${accessor(right)}($i);
         |  $s += ${combineJava(x, y)};
         |}
         |${ev.value} = ${finishJava(s)};
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the dot product. */
final case class DotF(left: Expression, right: Expression) extends VectorFoldF {
  override def prettyName: String = "graft_dot"
  protected def combine(x: Double, y: Double): Double = x * y
  protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** √Σ (aᵢ−bᵢ)² — Euclidean distance. */
final case class L2F(left: Expression, right: Expression) extends VectorFoldF {
  override def prettyName: String = "graft_l2"
  protected def combine(x: Double, y: Double): Double = { val d = x - y; d * d }
  protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def finish(s: Double): Double = math.sqrt(s)
  override protected def finishJava(s: String): String =
    s"java.lang.Math.sqrt($s)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ |aᵢ−bᵢ| — Manhattan distance. */
final case class L1F(left: Expression, right: Expression) extends VectorFoldF {
  override def prettyName: String = "graft_l1"
  protected def combine(x: Double, y: Double): Double = math.abs(x - y)
  protected def combineJava(x: String, y: String): String =
    s"java.lang.Math.abs($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {
  /** Register the kernels in `spark`'s function registry (idempotent) so
    * `call_function("graft_dot", …)` resolves — the classic-mode bridge
    * from Column expressions to custom Catalyst expressions. */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_l2",
      es => L2F(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_l1",
      es => L1F(es.head, es(1)), "built-in")
  }
}
