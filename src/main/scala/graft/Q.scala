package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark-side plan builder plus (when SQL-expressible)
  * the equivalent DuckDB SQL the driver runs as correctness oracle.
  * `oracle = None` → driver records the weaker rows-only check (used for the
  * approximate operators — MinHash/SimHash/LSH — whose outputs have no exact
  * SQL equivalent). */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
