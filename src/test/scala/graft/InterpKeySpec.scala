package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql._

/** Record-key lookup semantics after the r21 findKeyLoose rewrite (the
  * loose O(n) table scan per CREATE/UPDATE/INSERT/fetch became a hash
  * lookup for number-free, regex-free probes). Pins: cross-representation
  * numeric ids still collide loosely, string/array ids behave structurally,
  * regex ids are rejected at every insert boundary with the reference's
  * error (RecordIdKey has no regex variant), and a bulk FOR/CREATE loop is
  * no longer quadratic. */
class InterpKeySpec extends AnyFunSuite {

  private def run(sql: String): Seq[QueryResult] = {
    val i = new Interp()
    i.namespaces("test") = "DEFINE NAMESPACE test"
    i.databases("test") = "DEFINE DATABASE test"
    i.run(Parser.parse(sql))
  }
  private def errOf(r: QueryResult): String =
    r match { case QErr(m) => m; case QOk(v) => fail(s"expected error, got ${v.render}") }

  test("numeric ids collide across int/float representations (looseEq)") {
    val rs = run("CREATE a:1; CREATE a CONTENT {id: 1.0f};")
    assert(errOf(rs(1)).contains("already exists"))
  }

  test("array ids collide across element representations") {
    val rs = run("CREATE a:[1,2]; CREATE a CONTENT {id: [1.0f, 2]};")
    assert(errOf(rs(1)).contains("already exists"))
  }

  test("string ids collide structurally and update/delete find them") {
    val rs = run(
      """CREATE a:xyz SET v = 1;
         CREATE a SET id = 'xyz';
         UPDATE a:xyz SET v = 2;
         DELETE a:xyz;
         SELECT count() FROM a GROUP ALL;""")
    assert(errOf(rs(1)).contains("already exists"))
    assert(rs(2).isInstanceOf[QOk])
    assert(rs(4) match { case QOk(v) => v.render.contains("count: 0"); case _ => false },
      s"expected empty table after delete, got ${rs(4)}")
  }

  test("regex record ids are rejected at every insert boundary") {
    val stmts = Seq(
      "CREATE a SET id = /x/;",
      "CREATE a CONTENT {id: /x/};",
      "UPSERT a CONTENT {id: /x/};",
      "INSERT INTO a {id: /x/};",
      "CREATE a CONTENT {id: ['q', /x/]};")
    stmts.foreach { s =>
      val msg = errOf(run(s).head)
      assert(msg.contains("for the Record ID but this is not a valid id"), s"$s -> $msg")
    }
  }

  test("bulk FOR/CREATE with generated ids is not quadratic") {
    val t0 = System.nanoTime()
    val rs = run(
      """FOR $i IN 0..10000 { CREATE bulk CONTENT { something: $i }; };
         SELECT count() FROM bulk GROUP ALL;""")
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rs(1) match { case QOk(v) => v.render.contains("10000"); case _ => false })
    // was ~3 s (O(n²) loose scans: 5e7 looseEq calls); hash path runs well
    // under a second — the generous bound only guards quadratic relapse
    assert(secs < 2.5, f"bulk create took $secs%.2f s — loose scan is back?")
  }
}
