package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Export
import graft.surql.{Interp, Parser, QOk, VArr, VInt, VObj, VStr}

/** Export round-trip: the distributed SurrealQL rendering of a catalog
  * table must re-ingest through the golden-anchored interpreter and
  * reproduce every value — the engine's `surreal export` fidelity gate. */
class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("nation exports to CREATE statements the interpreter re-ingests exactly") {
    val df = Tables.nation(spark, sf)
    val script = Export.surqlLines(df, "nation", "n_nationkey")
      .collect().sorted.mkString("\n")
    assert(script.startsWith("CREATE nation:"),
      s"unexpected export shape: ${script.take(80)}")

    val in = new Interp
    in.run(Parser.parse(script))
    val got = in.run(Parser.parse(
      "SELECT n_name, n_regionkey FROM nation ORDER BY n_name;")).last match {
      case QOk(VArr(items)) => items.collect {
        case o: VObj => (o.fields("n_name").asInstanceOf[VStr].s,
          o.fields("n_regionkey").asInstanceOf[VInt].i)
      }
      case other => fail(s"unexpected interp result $other")
    }
    val want = df.collect()
      .map(r => (r.getString(1), r.getInt(2).toLong))
      .sortBy(_._1).toVector
    assert(got == want, s"round-trip mismatch: $got vs $want")
  }

  test("export omits NULL fields and renders arrays/strings in literal syntax") {
    import spark.implicits._
    val df = Seq((1L, Some("a'b"), Seq("x", "y")), (2L, None, Seq.empty[String]))
      .toDF("id", "s", "tags")
    val lines = Export.surqlLines(df, "t", "id").collect().sorted
    assert(lines(0).contains("CREATE t:1") && lines(0).contains("'a\\'b'")
      || lines(0).contains("\"a'b\""), s"string escaping wrong: ${lines(0)}")
    assert(!lines(1).contains(" s: "), s"NULL field leaked into export: ${lines(1)}")
  }
}
