package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.surql.SparkPlanner

/** Spark-path scalar-function coverage ratchet: every expression here must
  * plan AND execute through SparkPlanner.query. The r15 sweep found ~30
  * function families that planned on the interpreter but threw
  * "unsupported function" on the Spark path; the constant-fold fallback
  * (fnCol) plus native lowerings closed them — this spec keeps them
  * closed. Values are pinned by DifferentialSpec/goldens; this suite pins
  * PLANNABILITY (a regression here is a user-visible API break, not a
  * wrong answer). */
class FnCoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private val exprs = Seq(
    // trig + constants fold through the interpreter's exact library
    "math::sin(1.0)", "math::cos(1.0)", "math::tan(1.0)", "math::asin(0.5)",
    "math::acos(0.5)", "math::atan(0.5)", "math::pi", "math::e", "math::tau",
    "math::inf", "math::ln_2", "math::lerpangle(10.0, 350.0, 0.5)",
    // type:: conversions over constants
    "type::is_number(1)", "type::number('4')", "type::bool('true')",
    "type::datetime('2024-01-01T00:00:00Z')", "type::duration('1h')",
    "type::decimal('1.5')", "type::array([1])", "type::set([1,1])",
    "type::uuid('018e3b8e-4b6e-7f2e-a3d4-111111111111')",
    // string family
    "string::capitalize('ab cd')", "string::is_email('a@b.co')",
    "string::is_url('https://x.io')", "string::is_uuid('018e3b8e-4b6e-7f2e-a3d4-111111111111')",
    "string::is_datetime('2024-01-01T00:00:00Z', '%Y-%m-%dT%H:%M:%SZ')",
    "string::similarity::smithwaterman('abc', 'abd')",
    "string::similarity::sorensen_dice('night', 'nacht')",
    "string::distance::osa('ca', 'abc')",
    "string::semver::inc::major('1.2.3')", "string::html::sanitize('<b>x</b>')",
    // time / duration
    "time::round(d'2024-03-05T12:31:00Z', 1h)", "time::nano(d'2024-03-05T12:31:00Z')",
    "time::from_unix(1700000000)", "time::from_nanos(1700000000000000000)",
    "time::epoch", "time::maximum", "time::minimum",
    "time::set_year(d'2024-03-05T12:31:00Z', 2020)",
    "duration::from_days(2)", "duration::from_nanos(100)", "duration::max",
    // crypto / encodings
    "crypto::blake3('x')", "crypto::joaat('x')",
    "encoding::json::encode({a:1})", "encoding::json::decode('{\"a\":1}')",
    // object algebra
    "object::extend({a:1}, {b:2})", "object::from_entries([['a',1]])",
    "object::remove({a:1,b:2}, 'b')",
    // record / meta / parse / geo
    "meta::id(orders:3)", "record::is_edge(orders:3)",
    "parse::url::domain('https://x.io/p')",
    "geo::is::valid((1.0, 2.0))", "geo::is_valid((1.0, 2.0))",
    // set:: delegation (HOFs included) and the array closures/folds
    "set::map([1,2], |$x| $x * 2)", "set::fold([1,2,3], 0, |$a,$x| $a + $x)",
    "set::max([1,2])", "set::join([1,2], ',')", "set::slice([3,1,2], 0, 2)",
    "array::reduce([1,2,3], |$a,$x| $a + $x)", "array::filter_index([1,5,1], 1)",
    "array::sequence(3)", "array::shuffle([1,2,3])",
    "array::sort_natural(['a10','a2'])", "array::sort_lexical(['B','a'])",
    // value algebra
    "value::diff({a:1},{a:2})", "value::patch({a:1}, [{op:'replace',path:'/a',value:2}])",
    // vector stats
    "vector::similarity::pearson([1.0,2.0,3.0],[1.0,2.0,3.1])",
    "bytes::len(<bytes>'abc')", "schema::table::exists('orders')")

  test("Spark path plans and executes the full scalar surface") {
    val failures = exprs.flatMap { e =>
      try { SparkPlanner.query(spark, sf, s"RETURN $e;").collect(); None }
      catch { case ex: Throwable =>
        Some(s"$e -> ${ex.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty, s"${failures.length} uncovered:\n${failures.mkString("\n")}")
  }
}
