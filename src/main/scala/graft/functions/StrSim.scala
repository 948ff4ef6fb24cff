package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels (fnc/string.rs similarity::*, strsim crate
  * semantics — the same algorithm the interpreter path runs, so both
  * engines agree to the ulp). The expressions stay inside whole-stage
  * codegen by generating a static call into [[StrSim]] — one virtual-free
  * JVM call per row, no lambda interpretation. */
object StrSim {
  /** Jaro similarity (strsim jaro; standard match-window definition). */
  def jaro(xs: UTF8String, ys: UTF8String): Double = {
    val x = xs.toString
    val y = ys.toString
    if (x == y) return 1.0
    if (x.isEmpty || y.isEmpty) return 0.0
    val window = Math.max(x.length, y.length) / 2 - 1
    val xm = new Array[Boolean](x.length)
    val ym = new Array[Boolean](y.length)
    var matches = 0
    var i = 0
    while (i < x.length) {
      val lo = Math.max(0, i - window)
      val hi = Math.min(y.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!ym(j) && x(i) == y(j)) {
          xm(i) = true; ym(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < x.length) {
      if (xm(i)) {
        while (!ym(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / x.length + m / y.length + (m - t / 2.0) / m) / 3.0
  }

  /** Sørensen-Dice as strsim::sorensen_dice exactly (fnc/string.rs:597):
    * whitespace removed from the STRINGS first, then char-bigram multiset
    * intersection with denominator len(a)+len(b)-2 over the stripped
    * lengths; the ==, single-char, and <2 shortcuts mirror the crate.
    * Shared by BOTH engines (the interpreter calls this static too) so the
    * paths agree to the ulp. */
  def sorensenDice(xs: UTF8String, ys: UTF8String): Double = {
    val a = xs.toString.filterNot(_.isWhitespace)
    val b = ys.toString.filterNot(_.isWhitespace)
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    if (a.length < 2 || b.length < 2) return 0.0
    val counts = new java.util.HashMap[Int, Int]()
    var i = 0
    while (i < a.length - 1) {
      val key = a.charAt(i) << 16 | a.charAt(i + 1)
      counts.merge(key, 1, (x, y) => x + y)
      i += 1
    }
    var inter = 0
    i = 0
    while (i < b.length - 1) {
      val key = b.charAt(i) << 16 | b.charAt(i + 1)
      val c = counts.getOrDefault(key, 0)
      if (c > 0) { inter += 1; counts.put(key, c - 1) }
      i += 1
    }
    (2.0 * inter) / (a.length + b.length - 2)
  }

  /** array::sort_natural / sort_lexical / sort_natural_lexical over a
    * COLUMN string array — the SAME comparators the interpreter runs
    * (Functions.naturalCmp / ROOT Collator / naturalLexicalCmp; reference
    * lexicmp via fnc/array.rs), so the two paths order identically. Null
    * elements key as the interpreter's NONE render. */
  def sortArr(values: org.apache.spark.sql.catalyst.util.ArrayData,
      method: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = values.numElements()
    val items = (0 until n).map(i => Option(values.getUTF8String(i)).map(_.toString))
    def key(o: Option[String]): String = o.getOrElse("NONE")
    val cmp: (String, String) => Int = method.toString match {
      case "natural" => graft.surql.Functions.naturalCmp
      case "lexical" =>
        val coll = java.text.Collator.getInstance(java.util.Locale.ROOT)
        (a, b) => coll.compare(a, b)
      case _ => graft.surql.Functions.naturalLexicalCmp
    }
    val sorted = items.sortWith((a, b) => cmp(key(a), key(b)) < 0)
    new GenericArrayData(sorted.map(_.map(UTF8String.fromString).orNull).toArray[Any])
  }

  /** Jaro-Winkler as strsim 0.11's generic_jaro_winkler (the crate the
    * reference links): the common-prefix boost is UNBOUNDED (no classic
    * 4-char cap) and the result is clamped to 1.0. */
  def jaroWinkler(xs: UTF8String, ys: UTF8String): Double = {
    val j = jaro(xs, ys)
    val x = xs.toString
    val y = ys.toString
    val n = Math.min(x.length, y.length)
    var prefix = 0
    while (prefix < n && x(prefix) == y(prefix)) prefix += 1
    Math.min(1.0, j + prefix * 0.1 * (1 - j))
  }

  /** SkimMatcherV2 fuzzy score (fnc/string.rs:550,587) — see [[SkimV2]],
    * pinned to the reference's published test outputs. */
  def fuzzy(xs: UTF8String, ys: UTF8String): Long =
    SkimV2.fuzzyMatch(xs.toString, ys.toString)

  /** Full (unrestricted) Damerau-Levenshtein — the strsim crate's
    * `damerau_levenshtein` the reference links (fnc/string.rs), i.e. the
    * alphabet-indexed DP with true transpositions, not the restricted
    * OSA variant. Mirrors the interpreter's port exactly. */
  /** Optimal string alignment (strsim osa_distance): Damerau restricted to
    * non-overlapping adjacent transpositions, over Unicode scalar values. */
  def osa(xs: UTF8String, ys: UTF8String): Long = {
    val a = xs.toString.codePoints.toArray
    val b = ys.toString.codePoints.toArray
    val (la, lb) = (a.length, b.length)
    val d = Array.ofDim[Int](la + 1, lb + 1)
    var i = 0
    while (i <= la) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j) = j; j += 1 }
    i = 1
    while (i <= la) {
      j = 1
      while (j <= lb) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        d(i)(j) = Math.min(Math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
          d(i)(j) = Math.min(d(i)(j), d(i - 2)(j - 2) + 1)
        j += 1
      }
      i += 1
    }
    d(la)(lb).toLong
  }

  def damerauLevenshtein(xs: UTF8String, ys: UTF8String): Long = {
    val a = xs.toString; val b = ys.toString
    val (la, lb) = (a.length, b.length)
    val maxD = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxD
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxD; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxD; d(1)(j + 1) = j; j += 1 }
    val lastRow = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var lastMatchCol = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = lastRow.get(b(j - 1)); if (v == null) 0 else v }
        val l = lastMatchCol
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        if (cost == 0) lastMatchCol = j
        d(i + 1)(j + 1) = Math.min(
          Math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          Math.min(d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
        j += 1
      }
      lastRow.put(a(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1).toLong
  }

  /** Hamming distance; unequal lengths error like the reference
    * (strsim hamming returns Err → "Strings must be of equal length"). */
  def hamming(xs: UTF8String, ys: UTF8String): Long = {
    val a = xs.toString; val b = ys.toString
    if (a.length != b.length)
      throw new IllegalArgumentException(
        "Incorrect arguments for function string::distance::hamming(). " +
          "Strings must be of equal length")
    var n = 0L
    var i = 0
    while (i < a.length) { if (a(i) != b(i)) n += 1; i += 1 }
    n
  }

  /** UTF8String bridge for [[graft.surql.Snowball.stem]]. */
  def stem(term: UTF8String, lang: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.surql.Snowball.stem(lang.toString, term.toString))
}

final case class FuzzyF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_fuzzy"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.fuzzy(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.fuzzy($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class DamerauF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_damerau"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.damerauLevenshtein(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class OsaF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_osa"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.osa(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.osa($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class HammingF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.hamming(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.hamming($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

abstract class StrSimF extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  protected def method: String
  override def nullSafeEval(l: Any, r: Any): Any =
    method match {
      case "jaro" => StrSim.jaro(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
      case "sorensenDice" =>
        StrSim.sorensenDice(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
      case _      => StrSim.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.$method($a, $b)")
}

final case class JaroF(left: Expression, right: Expression) extends StrSimF {
  override def prettyName: String = "graft_jaro"
  protected def method: String = "jaro"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class JaroWinklerF(left: Expression, right: Expression) extends StrSimF {
  override def prettyName: String = "graft_jaro_winkler"
  protected def method: String = "jaroWinkler"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

final case class SorensenDiceF(left: Expression, right: Expression) extends StrSimF {
  override def prettyName: String = "graft_sorensen_dice"
  protected def method: String = "sorensenDice"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** lexicmp-family array sort kernel: (array<string>, method) → sorted
  * array<string>, `method` ∈ natural|lexical|natural_lexical. */
final case class SortArrF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_sort_arr"
  override def dataType: DataType = left.dataType
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _)
        if right.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, string)")
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.sortArr(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.sortArr($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Snowball stemmer as a native expression: a static call into
  * [[graft.surql.Snowball]] per row, inside whole-stage codegen — the same
  * stemmer the Interp analyzer chain runs, so the Spark FTS postings and
  * the interpreter's `search::analyze` agree token-for-token. The language
  * is a plan-time constant (right child must be a string literal). */
final case class StemF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_stem"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two strings")
  override def nullSafeEval(l: Any, r: Any): Any =
    StrSim.stem(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrSim.stem($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StrSimKernels {
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_jaro",
      es => JaroF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_jaro_winkler",
      es => JaroWinklerF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sorensen_dice",
      es => SorensenDiceF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sort_arr",
      es => SortArrF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_fuzzy",
      es => FuzzyF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_damerau",
      es => DamerauF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hamming",
      es => HammingF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_osa",
      es => OsaF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_stem",
      es => StemF(es.head, es(1)), "built-in")
  }
}
