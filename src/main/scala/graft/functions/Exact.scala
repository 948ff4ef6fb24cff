package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent ("exact") numeric aggregation helpers.
  *
  * Spark sums doubles in partition order, which varies run to run; DuckDB (the
  * driver's oracle) sums in its own order. IEEE addition is not associative,
  * so a plain `sum(double)` hash-compares flakily. Routing the sum through a
  * fixed-scale decimal (scale 4: the scaled int128 stays < 2^53, so the final decimal->double cast is exact on both engines — DuckDB computes that cast in double arithmetic and drifts 1 ulp beyond 2^53) makes it exact and order-independent on BOTH engines;
  * the final cast back to double is then deterministic and bit-identical.
  *
  * The reference's aggregates (surrealdb: exec/function/builtin/aggregates/
  * math.rs) are single-node streaming folds so it never faces this; a
  * distributed engine must, and decimal partial aggregation is the standard
  * fix (it also survives AQE re-partitioning at 100 TB).
  */
object Exact {
  private val D = DecimalType(38, 4)

  /** Exact sum of a double column: identical result on any partitioning. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact mean: exact decimal sum, then one double division. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** Exact sample variance via sum / sum-of-squares (both exact decimals):
    * var = (n*sumsq - sum^2) / (n*(n-1)), assembled in double at the end. */
  def dvarSamp(c: Column): Column = {
    val n  = count(lit(1)).cast("double")
    val s  = sum(c.cast(D)).cast("double")
    val s2 = sum((c * c).cast(D)).cast("double")
    (n * s2 - s * s) / (n * (n - lit(1.0)))
  }

  /** Exact sample stddev (sqrt is correctly rounded in IEEE — deterministic). */
  def dstddev(c: Column): Column = sqrt(dvarSamp(c))

  /** Matching DuckDB SQL fragments for the oracle side. */
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,4))) AS DOUBLE)"
  def sqlAvg(x: String): String =
    s"(CAST(SUM(CAST(($x) AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*))"
  def sqlVarSamp(x: String): String = {
    val n  = "CAST(COUNT(*) AS DOUBLE)"
    val s  = s"CAST(SUM(CAST(($x) AS DECIMAL(38,4))) AS DOUBLE)"
    val s2 = s"CAST(SUM(CAST((($x)*($x)) AS DECIMAL(38,4))) AS DOUBLE)"
    s"(($n * $s2 - $s * $s) / ($n * ($n - 1.0)))"
  }
  def sqlStddev(x: String): String = s"SQRT(${sqlVarSamp(x)})"
}
