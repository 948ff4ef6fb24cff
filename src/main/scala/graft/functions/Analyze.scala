package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full analyzer-chain tokenization as a native expression: a static call
  * into the SAME tokenizer state machine + filter pipeline the interpreter
  * path runs ([[graft.surql.Search]] — reference idx/ft/analyzer/
  * tokenizer.rs, filter.rs), so Spark-side FTS postings and the
  * interpreter's `search::analyze` agree token-for-token for ANY supported
  * chain (blank/class/punct/camel tokenizers; lowercase/uppercase/ascii/
  * ngram/edgengram/snowball/mapper filters). The chain argument is the
  * canonical `DEFINE ANALYZER` render, a plan-time constant — the parsed
  * chain is cached per render string, executor-side. */
object Analyze {
  private val chains =
    new java.util.concurrent.ConcurrentHashMap[String, graft.surql.Search.AnalyzerDef]()

  def chain(render: String): graft.surql.Search.AnalyzerDef =
    chains.computeIfAbsent(render,
      r => graft.surql.Search.parseAnalyzer("__chain", r))

  /** Indexing-stage analysis (all filters, including ngram/edgengram). */
  def analyze(text: UTF8String, render: UTF8String): ArrayData = {
    val a = chain(render.toString)
    val toks = graft.surql.Search.applyFilters(
      graft.surql.Search.tokenize(a.tokenizers, text.toString),
      a.filters, querying = false)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t.term)).toArray[Any])
  }

  /** Query-stage analysis (FilteringStage::Querying — skips ngram/edgengram),
    * driver-side, for analyzing the `@@` right-hand side through the same
    * chain the postings were built with. */
  def analyzeQuery(render: String, text: String): Seq[String] = {
    val a = chain(render)
    graft.surql.Search.applyFilters(
      graft.surql.Search.tokenize(a.tokenizers, text),
      a.filters, querying = true).map(_.term)
  }
}

final case class AnalyzeF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_analyze"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    Analyze.analyze(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Analyze.analyze($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AnalyzeKernels {
  def ensure(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_analyze", es => AnalyzeF(es.head, es(1)), "built-in")
  }
}
