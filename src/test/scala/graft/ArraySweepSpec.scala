package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql._

/** array:: namespace vs fnc/array.rs (r19 sweep): the asymmetric
  * value-keeping logical trio, allocation limits at 1 MiB over 64-byte
  * Values (the reference's own check_size pin), unbounded-range errors,
  * and the range form of array::fill. */
class ArraySweepSpec extends AnyFunSuite {
  private def call(n: String, args: V*): V = Functions.apply(n, args, Env())
  private def va(vs: V*): VArr = VArr(vs.toVector)

  test("logical trio: asymmetric tails (fnc/array.rs:484-590)") {
    // logical_and: rh longer → tail ALL Null; lh longer → falsy kept
    assert(call("array::logical_and", va(), va(VBool(false), VInt(0))) ==
      va(VNull, VNull))
    assert(call("array::logical_and", va(VBool(false), VInt(0)), va()) ==
      va(VBool(false), VInt(0)))
    assert(call("array::logical_and", va(VInt(1), VInt(0)), va(VStr("x"), VStr("y"))) ==
      va(VStr("x"), VInt(0)))
    // logical_or: rh longer → tail kept VERBATIM; lh longer → falsy nulled
    assert(call("array::logical_or", va(), va(VBool(false), VInt(7))) ==
      va(VBool(false), VInt(7)))
    assert(call("array::logical_or", va(VBool(false), VInt(7)), va()) ==
      va(VNull, VInt(7)))
    // logical_xor overlap prefers the value carrying the xor truthiness
    assert(call("array::logical_xor", va(VInt(1), VInt(0)), va(VInt(0), VInt(2))) ==
      va(VInt(1), VInt(2)))
    assert(call("array::logical_xor", va(VInt(1)), va(VInt(2))) ==
      va(VBool(false)))
    // xor tails: lh longer kept verbatim, rh longer nulls falsy
    assert(call("array::logical_xor", va(VBool(false), VInt(0)), va()) ==
      va(VBool(false), VInt(0)))
    assert(call("array::logical_xor", va(), va(VBool(false), VInt(3))) ==
      va(VNull, VInt(3)))
  }

  test("allocation limits: 16384 elements (1 MiB / 64-byte Value)") {
    assert(call("array::range", VInt(0), VInt(16384)).asInstanceOf[VArr].items.length == 16384)
    val e = intercept[SqlError](call("array::range", VInt(0), VInt(16385)))
    assert(e.getMessage ==
      "Incorrect arguments for function array::range(). Output must not exceed 1048576 bytes.")
    intercept[SqlError](call("array::sequence", VInt(16385)))
    intercept[SqlError](call("array::repeat", VInt(1), VInt(16385)))
    intercept[SqlError](call("array::concat",
      call("array::sequence", VInt(16000)), call("array::sequence", VInt(16000))))
    // UNBOUNDED range bounds hit the limit error, not an empty array
    intercept[SqlError](call("array::range", VRng(Some((VInt(5), true)), scala.None)))
    intercept[SqlError](call("array::range", VRng(scala.None, Some((VInt(5), false)))))
    // bounded range value still works, inclusivity honoured
    assert(call("array::range", VRng(Some((VInt(1), true)), Some((VInt(3), true)))) ==
      va(VInt(1), VInt(2), VInt(3)))
  }

  test("fill: range-argument form and negative-bound rules") {
    val arr = va(VInt(1), VInt(2), VInt(3), VInt(4))
    assert(call("array::fill", arr, VInt(0), VRng(Some((VInt(1), true)), Some((VInt(3), false)))) ==
      va(VInt(1), VInt(0), VInt(0), VInt(4)))
    // inclusive-end range fills one more
    assert(call("array::fill", arr, VInt(0), VRng(Some((VInt(1), true)), Some((VInt(3), true)))) ==
      va(VInt(1), VInt(0), VInt(0), VInt(0)))
    // (start, end) int form and bare start unchanged from before
    assert(call("array::fill", arr, VInt(9), VInt(2)) ==
      va(VInt(1), VInt(2), VInt(9), VInt(9)))
    assert(call("array::fill", arr, VInt(9), VInt(-2), VInt(-1)) ==
      va(VInt(1), VInt(2), VInt(9), VInt(4)))
    // start past the end: unchanged
    assert(call("array::fill", arr, VInt(9), VInt(10)) == arr)
    assert(call("array::fill", arr, VInt(9)) == va(VInt(9), VInt(9), VInt(9), VInt(9)))
  }

  test("sequence saturates its end instead of overflowing") {
    val out = call("array::sequence", VInt(Long.MaxValue - 2), VInt(3))
    assert(out == va(VInt(Long.MaxValue - 2), VInt(Long.MaxValue - 1), VInt(Long.MaxValue)))
  }
}
