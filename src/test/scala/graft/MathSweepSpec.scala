package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql._

/** math:: namespace vs fnc/math.rs + val/number.rs + fnc/util/math (r19
  * sweep): quadrant-correct acot, typed clamp/spread/mode/nearestrank,
  * decimal lerp/sqrt/mean, the lerpangle direction quirk, the
  * nearestrank truncation formula, and strict Vec<Number> coercion. */
class MathSweepSpec extends AnyFunSuite {
  private def call(n: String, args: V*): V = Functions.apply(n, args, Env())

  test("acot lands in (0, pi) — PI/2 - atan, not atan(1/x)") {
    assert(call("math::acot", VFloat(1.0)) == VFloat(Math.PI / 4))
    // negative input: upper quadrant, NOT the negative angle atan(1/x) gives
    assert(call("math::acot", VFloat(-1.0)) == VFloat(Math.PI / 2 + Math.PI / 4))
    assert(call("math::acot", VInt(0)) == VFloat(Math.PI / 2))
  }

  test("clamp: all-int stays int, mixed promotes to float, decimal self wins") {
    assert(call("math::clamp", VInt(5), VInt(1), VInt(3)) == VInt(3))
    // int self with float bounds promotes even IN RANGE (number.rs:480)
    assert(call("math::clamp", VInt(5), VFloat(1.0), VFloat(10.0)) == VFloat(5.0))
    assert(call("math::clamp", VDec(BigDecimal("5.5")), VInt(1), VInt(3)) ==
      VDec(BigDecimal(3)))
    val e = intercept[SqlError](call("math::clamp", VInt(1), VInt(9), VInt(2)))
    assert(e.getMessage.endsWith("Lowerbound for clamp must be smaller than the upperbound"))
  }

  test("lerpangle always walks counterclockwise (reference quirk)") {
    // from 10 toward 350: the short way is -20, but the reference's
    // unsigned dt walks +20 — full factor lands at 30, not 350
    assert(call("math::lerpangle", VInt(10), VInt(350), VFloat(1.0)) == VFloat(30.0))
    assert(call("math::lerpangle", VInt(350), VInt(10), VFloat(0.5)) == VFloat(360.0))
    assert(call("math::lerpangle", VInt(0), VInt(90), VFloat(0.5)) == VFloat(45.0))
  }

  test("decimal arms: lerp factor, sqrt, mean keep decimal") {
    assert(call("math::lerp", VInt(0), VInt(10), VDec(BigDecimal("0.5"))) ==
      VDec(BigDecimal(5)))
    assert(call("math::sqrt", VDec(BigDecimal(4))) == VDec(BigDecimal(2)))
    assert(call("math::sqrt", VFloat(-1.0)).asInstanceOf[VFloat].d.isNaN)
    assert(call("math::mean", VArr(Vector(VInt(1), VDec(BigDecimal(2))))) ==
      VDec(BigDecimal("1.5")))
    assert(call("math::mean", VArr(Vector(VInt(1), VInt(2)))) == VFloat(1.5))
  }

  test("mode/spread/nearestrank are TYPED; nearestrank truncates") {
    assert(call("math::mode", VArr(Vector(VInt(1), VInt(1), VInt(2)))) == VInt(1))
    // frequency tie picks the larger value
    assert(call("math::mode", VArr(Vector(VInt(1), VInt(2)))) == VInt(2))
    assert(call("math::spread", VArr(Vector(VInt(1), VInt(9)))) == VInt(8))
    // nearestrank.rs: idx = trunc(n*p/100) clamped — p=50 over 4 elements
    // picks element [2] (the THIRD), not the ceil-1 form's second
    assert(call("math::nearestrank",
      VArr(Vector(VInt(10), VInt(20), VInt(30), VInt(40))), VInt(50)) == VInt(30))
    assert(call("math::nearestrank",
      VArr(Vector(VInt(10), VInt(20), VInt(30), VInt(40))), VInt(100)) == VInt(40))
    call("math::nearestrank", VArr(Vector(VInt(1))), VInt(101)) match {
      case VFloat(d) => assert(d.isNaN)
      case other => fail(s"$other")
    }
  }

  test("sum/product error on non-number elements (Vec<Number> coercion)") {
    assert(call("math::sum", VArr(Vector(VInt(1), VInt(2)))) == VInt(3))
    intercept[SqlError](call("math::sum", VArr(Vector(VInt(1), VStr("x")))))
    intercept[SqlError](call("math::product", VArr(Vector(VBool(true)))))
    // empty max/min keep their infinity quirks
    assert(call("math::max", VArr(Vector())) == VFloat(Double.NegativeInfinity))
    assert(call("math::min", VArr(Vector())) == VFloat(Double.PositiveInfinity))
  }
}
