package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.surql._

/** Embedded-JS engine unit coverage beyond the golden corpus: number
  * tagging, conversion edges, and the engine bridge. */
class JsSpec extends AnyFunSuite {

  private def run1(sql: String): QueryResult =
    new Interp().run(Parser.parse(sql)).last

  private def value(sql: String): String = run1(sql) match {
    case QOk(v)  => v.render
    case QErr(m) => fail(s"unexpected error: $m")
  }
  private def error(sql: String): String = run1(sql) match {
    case QErr(m) => m
    case QOk(v)  => fail(s"expected error, got ${v.render}")
  }

  test("number tagging: int literals stay Int, float arithmetic stays Float") {
    assert(value("RETURN function() { return 2 + 3 * 4; }") == "14")
    assert(value("RETURN function() { return 1.5 + 1.5; }") == "3f")
    assert(value("RETURN function() { return 10 / 4; }") == "2.5f")
    assert(value("RETURN function() { return 7 % 3; }") == "1")
    // BigInt: fits i64 → Int, beyond → Decimal
    assert(value("RETURN function() { return 12n * 3n; }") == "36")
  }

  test("engine values round-trip through the bridge as floats") {
    assert(value("RETURN function() { return await surrealdb.value(`1 + 1`); }") == "2f")
    assert(value(
      "RETURN function() { return (await surrealdb.query(`RETURN [1, 2]`)); }") == "[1f, 2f]")
  }

  test("template literals, arrow closures, and array methods") {
    assert(value("""RETURN function() {
        let xs = [1, 2, 3, 4].filter(x => x % 2 == 0).map(x => x * x);
        return `even squares: ${xs.join("+")}`;
      }""") == "'even squares: 4+16'")
  }

  test("control flow: for loops and early throw") {
    assert(value("""RETURN function() {
        let acc = 0;
        for (let i = 1; i <= 5; i++) { acc = acc + i; }
        return acc;
      }""") == "15")
    assert(error("RETURN function() { throw new Error(`nope ${40 + 2}`); }") ==
      "Problem with embedded script function. An exception occurred: nope 42")
  }

  test("typed constructors produce engine values") {
    assert(value("RETURN function() { return new Record('user', 'amy'); }") == "user:amy")
    assert(value("RETURN function() { return new Duration('90m'); }") == "1h30m")
  }

  test("scripting capability gate still rejects when denied") {
    val in = new Interp()
    in.capScripting = false
    in.run(Parser.parse("RETURN function() { return 1; };")).last match {
      case QErr(m) => assert(m.contains("not allowed"))
      case other   => fail(s"expected denial, got $other")
    }
  }
}
