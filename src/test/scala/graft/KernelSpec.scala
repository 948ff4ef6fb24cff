package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The native codegen'd vector kernels (DotF/L2F/L1F) must be BIT-IDENTICAL
  * to the composable HOF folds they replaced — same in-order double
  * accumulation — or every hash-compared oracle row would silently drift.
  * Checked over seeded pseudo-random float vectors through real DataFrame
  * execution (codegen path), including length-mismatch and empty cases. */
class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("DotF equals the HOF fold bit-for-bit on random float vectors") {
    // seeded vectors of varying length, cast to float arrays
    val rows = spark.range(500).select(
      col("id"),
      transform(sequence(lit(1), (col("id") % 64 + 1).cast("int")),
        i => sin(i * (col("id") + 1)).cast("float")).as("a"),
      transform(sequence(lit(1), (col("id") % 64 + 1).cast("int")),
        i => cos(i * (col("id") + 2)).cast("float")).as("b"))
    val cmp = rows.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    val bad = cmp.filter(col("native") =!= col("hof")).count()
    assert(bad == 0L, s"$bad of 500 vectors disagree between kernel and HOF fold")
  }

  test("kernels handle empty and length-mismatched arrays") {
    val df = spark.sql(
      """SELECT CAST(array() AS array<float>) AS e,
                CAST(array(1.0, 2.0) AS array<float>) AS a,
                CAST(array(3.0) AS array<float>) AS b""")
    val r = df.select(
      Similarity.dot(col("e"), col("e")).as("ee"),
      Similarity.dot(col("a"), col("b")).as("ab"), // common prefix: 1*3
      Similarity.l1(col("a"), col("b")).as("l1"),
      Similarity.l2(col("a"), col("b")).as("l2")).head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 2.0)
  }

  test("StrCheck kernels register in a FRESH cloned session (per-session registry)") {
    // functionRegistry is per-SparkSession: a JVM-global ensure guard would
    // leave a second session without graft_is_* and fail analysis
    val s2 = spark.newSession()
    graft.functions.StrCheckKernels.ensure(s2)
    val r = s2.sql("SELECT 1 AS one").select(
      org.apache.spark.sql.functions.call_function(
        "graft_is_email", org.apache.spark.sql.functions.lit("a@b.co")).as("ok"),
      org.apache.spark.sql.functions.call_function(
        "graft_capitalize", org.apache.spark.sql.functions.lit("hi there")).as("cap")
    ).head
    assert(r.getBoolean(0))
    assert(r.getString(1) == "Hi There")
  }
}
