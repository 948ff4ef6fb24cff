package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql._

/** rand::* invariants vs fnc/rand.rs (r19 sweep): inclusive swapped
  * bounds, length limits with the reference's error texts (typos
  * included), strict arities, int-or-datetime time bounds. Values are
  * random — the pins are ranges, alphabets, lengths, and errors. */
class RandSpec extends AnyFunSuite {
  private def call(n: String, args: V*): V = Functions.apply(n, args, Env())
  private def err(n: String, args: V*): String =
    intercept[SqlError](call(n, args: _*)).getMessage

  test("rand::id / rand::string lengths, alphabets, limits") {
    assert(call("rand::id").asInstanceOf[VStr].s.length == 20)
    assert(call("rand::string").asInstanceOf[VStr].s.length == 32)
    val id = call("rand::id", VInt(64)).asInstanceOf[VStr].s
    assert(id.length == 64 && id.forall("0123456789abcdefghijklmnopqrstuvwxyz".contains(_)))
    val st = call("rand::string", VInt(100)).asInstanceOf[VStr].s
    assert(st.length == 100 && st.forall(_.isLetterOrDigit))
    // ranged lengths are inclusive
    val lens = (1 to 50).map(_ =>
      call("rand::string", VInt(3), VInt(5)).asInstanceOf[VStr].s.length).toSet
    assert(lens.subsetOf(Set(3, 4, 5)) && lens.size > 1)
    assert(call("rand::id", VInt(0), VInt(0)) == VStr("")) // reference test_rand_id_len_0
    // limits and error texts (reference typo "less then" preserved)
    assert(err("rand::id", VInt(65)) ==
      "Incorrect arguments for function rand::id(). To generate a string of X characters in length, the argument must be a positive number and no higher than 64.")
    assert(err("rand::string", VInt(65537)).endsWith("no higher than 65536."))
    assert(err("rand::string", VInt(9), VInt(3)) ==
      "Incorrect arguments for function rand::string(). Lowerbound of number of characters must be less then the upperbound.")
  }

  test("rand::int / rand::float: 0-or-2 args, inclusive swapped bounds") {
    assert(err("rand::int", VInt(5)).endsWith("Expected 0 or 2 arguments"))
    assert(err("rand::float", VFloat(5)).endsWith("Expected 0 or 2 arguments"))
    val ints = (1 to 60).map(_ => call("rand::int", VInt(3), VInt(1))).collect {
      case VInt(i) => i }.toSet
    assert(ints.subsetOf(Set(1L, 2L, 3L)) && ints.size > 1) // swapped + inclusive
    val fs = (1 to 20).map(_ => call("rand::float", VFloat(2.0), VFloat(1.0)))
      .collect { case VFloat(d) => d }
    assert(fs.forall(d => d >= 1.0 && d <= 2.0))
  }

  test("rand::duration requires exactly two duration bounds") {
    assert(err("rand::duration").endsWith("Expected 2 arguments"))
    val d = call("rand::duration", VDur(10, 0), VDur(2, 0)) // swapped ok
    d match {
      case VDur(s, _) => assert(s >= 2 && s <= 10)
      case other => fail(s"$other")
    }
  }

  test("rand::time: int/datetime bounds only, validated, defaults to years 0-9999") {
    assert(err("rand::time", VFloat(1.5), VInt(10)) ==
      "Incorrect arguments for function rand::time(). Expected two arguments of type datetime or int")
    assert(err("rand::time", VInt(9999999999999999L), VInt(0)).contains(
      "the 2 arguments must be numbers between -8334601228800 and 8210266876799"))
    val t = call("rand::time", VInt(100), VInt(200))
    t match {
      case VDt(i) => assert(i.getEpochSecond >= 100 && i.getEpochSecond <= 200)
      case other => fail(s"$other")
    }
    call("rand::time") match {
      case VDt(i) =>
        assert(i.getEpochSecond >= -62167219200L && i.getEpochSecond <= 253402300799L)
      case other => fail(s"$other")
    }
  }

  test("rand::enum picks from an array arg, echoes a lone scalar, NONE on empty") {
    assert(call("rand::enum") == VNone)
    assert(call("rand::enum", VStr("only")) == VStr("only"))
    assert(call("rand::enum", VArr(Vector())) == VNone)
    val picks = (1 to 30).map(_ =>
      call("rand::enum", VArr(Vector(VInt(1), VInt(2))))).toSet
    assert(picks.subsetOf(Set[V](VInt(1), VInt(2))) && picks.size == 2)
  }
}
