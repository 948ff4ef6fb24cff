package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.surql.{Interp, JsonPatch, Parser, SqlError, V, VArr, VInt, VNone, VObj, VStr}

/** value::diff / value::patch pinned against the reference's OWN unit
  * vectors (val/value/diff.rs, val/value/patch.rs tests) plus the r19
  * sweep's quirk set (operation.rs path parsing, inc-on-array adds,
  * field-parts-on-arrays mapping, parse-before-apply error texts). */
class JsonPatchSpec extends AnyFunSuite {

  private def v(s: String): V =
    graft.surql.Eval.evalConst(Parser.parseExpr(s))

  private def patched(doc: String, ops: String): V =
    JsonPatch.patch(v(doc), v(ops))

  // --- the reference's patch.rs test suite --------------------------------

  test("reference patch.rs vectors") {
    assert(patched("{ test: { other: null, something: 123 } }",
      "[{ op: 'add', path: '/temp', value: true }]") ==
      v("{ test: { other: null, something: 123 }, temp: true }"))
    assert(patched("{ test: { other: null, something: 123 }, temp: true }",
      "[{ op: 'remove', path: '/temp' }]") ==
      v("{ test: { other: null, something: 123 } }"))
    assert(patched("{ test: { other: null, something: 123 }, temp: true }",
      "[{ op: 'replace', path: '/temp', value: 'text' }]") ==
      v("{ test: { other: null, something: 123 }, temp: 'text' }"))
    assert(patched("{ test: 123, temp: true }",
      "[{ op: 'copy', path: '/temp', from: '/test' }]") ==
      v("{ test: 123, temp: 123 }"))
    assert(patched("{ temp: true, some: 123 }",
      "[{ op: 'move', path: '/other', from: '/temp' }]") ==
      v("{ other: true, some: 123 }"))
    assert(patched("{ test: { other: 'test', something: 123 }, temp: true }",
      "[{ op: 'remove', path: '/test/something' }, { op: 'test', path: '/temp', value: true }]") ==
      v("{ test: { other: 'test' }, temp: true }"))
    // add at a missing embedded path auto-vivifies objects
    assert(patched("{ test: { other: null, something: 123 } }",
      "[{ op: 'add', path: '/temp/test', value: true }]") ==
      v("{ test: { other: null, something: 123 }, temp: { test: true } }"))
    assert(patched("{ test: { other: null, something: 123 }, temp: true }",
      "[{ op: 'remove', path: '/test/other' }]") ==
      v("{ test: { something: 123 }, temp: true }"))
    // add array value then remove by index
    assert(patched("{ x: 1 }",
      "[{ op: 'add', path: '/list', value: ['Item here'] }, { op: 'remove', path: '/list/0' }]") ==
      v("{ x: 1, list: [] }"))
    assert(patched("{ test: { other: null }, temp: 123 }",
      "[{ op: 'copy', path: '/test/other', from: '/temp' }]") ==
      v("{ test: { other: 123 }, temp: 123 }"))
    assert(patched("{ test: { other: ':3', some: 123 }}",
      "[{ op: 'move', path: '/temp', from: '/test/other' }]") ==
      v("{ test: { some: 123 }, temp: ':3' }"))
  }

  test("reference patch.rs change vectors (dmp text)") {
    assert(patched("{ test: { other: null, something: 123 }, temp: 'test' }",
      "[{ op: 'change', path: '/temp', value: '@@ -1,4 +1,4 @@\\n te\\n-s\\n+x\\n t\\n' }]") ==
      v("{ test: { other: null, something: 123 }, temp: 'text' }"))
    // change with non-patch text errors (reference issue #2001)
    val e = intercept[SqlError] {
      patched("{ test: { other: 'test' } }",
        "[{ op: 'change', path: '/test/other', value: 'text' }]")
    }
    assert(e.getMessage.startsWith(
      "The JSON Patch contains invalid operations. Failed to parse JSON patch structure:"))
    // failed test op applies NOTHING (parse/test errors roll back)
    val e2 = intercept[SqlError] {
      patched("{ test: 1 }",
        "[{ op: 'replace', path: '/test', value: 2 }, { op: 'test', path: '/test', value: 99 }]")
    }
    assert(e2.getMessage.startsWith("Given test operation failed for JSON Patch. Expected `99`"))
  }

  // --- r19 sweep quirks ----------------------------------------------------

  test("paths split on '.' AND '/', keep empty segments, trim leading slashes") {
    // dot path addresses the same nested field as slash path
    assert(patched("{ a: { b: 1 } }", "[{ op: 'replace', path: 'a.b', value: 2 }]") ==
      v("{ a: { b: 2 } }"))
    // doubled leading slashes trim away entirely
    assert(patched("{ a: 1 }", "[{ op: 'replace', path: '//a', value: 2 }]") ==
      v("{ a: 2 }"))
    // empty path → single empty segment → field "" (the reference quirk)
    val out = patched("{ a: 1 }", "[{ op: 'add', path: '', value: 7 }]")
    assert(JsonPatch.pick(out, List(JsonPatch.Field(""))) == VInt(7))
  }

  test("add onto an existing array uses inc semantics (concat/push)") {
    // scalar pushes
    assert(patched("{ list: [1, 2] }", "[{ op: 'add', path: '/list', value: 3 }]") ==
      v("{ list: [1, 2, 3] }"))
    // array CONCATS (inc.rs array+array)
    assert(patched("{ list: [1] }", "[{ op: 'add', path: '/list', value: [2, 3] }]") ==
      v("{ list: [1, 2, 3] }"))
    // numeric terminal inserts in place
    assert(patched("{ list: ['a', 'c'] }", "[{ op: 'add', path: '/list/1', value: 'b' }]") ==
      v("{ list: ['a', 'b', 'c'] }"))
    // numeric terminal past the end appends
    assert(patched("{ list: ['a'] }", "[{ op: 'add', path: '/list/9', value: 'b' }]") ==
      v("{ list: ['a', 'b'] }"))
    // '-' appends
    assert(patched("{ list: [1] }", "[{ op: 'add', path: '/list/-', value: 2 }]") ==
      v("{ list: [1, 2] }"))
  }

  test("replace/test on arrays use FIELD parts: digits map over elements") {
    // replace /list/0 does NOT index — Field("0") maps over elements,
    // setting field "0" on each object element (put.rs fall-through)
    assert(patched("{ list: [{ x: 1 }, { x: 2 }] }",
      "[{ op: 'replace', path: '/list/0', value: 9 }]") ==
      v("{ list: [{ '0': 9, x: 1 }, { '0': 9, x: 2 }] }"))
    // but remove /list/0 DOES index (to_parts)
    assert(patched("{ list: ['a', 'b'] }", "[{ op: 'remove', path: '/list/0' }]") ==
      v("{ list: ['b'] }"))
    // move from an array index uses FIELD parts on both ends: the pick
    // maps Field("0") over the scalar elements (→ [NONE, NONE]) and the
    // cut no-ops on them — the source array survives intact
    assert(patched("{ list: ['a', 'b'] }",
      "[{ op: 'move', path: '/head', from: '/list/0' }]") ==
      VObj(scala.collection.immutable.TreeMap[String, V](
        "head" -> VArr(Vector(VNone, VNone)),
        "list" -> v("['a', 'b']"))))
  }

  test("patch operates on non-object roots") {
    assert(JsonPatch.patch(v("[1, 2]"),
      v("[{ op: 'add', path: '/2', value: 3 }]")) == v("[1, 2, 3]"))
    assert(JsonPatch.patch(v("[1, 2]"),
      v("[{ op: 'remove', path: '/0' }]")) == v("[2]"))
  }

  test("malformed operations error with the reference's texts, before applying") {
    def errOf(doc: String, ops: String): String =
      intercept[SqlError](patched(doc, ops)).getMessage
    val pre = "The JSON Patch contains invalid operations. Failed to parse JSON patch structure: "
    assert(errOf("{ a: 1 }", "{ op: 'add' }") ==
      pre + "Patch operations should be an array of objects")
    assert(errOf("{ a: 1 }", "[1]") ==
      pre + "Patch operations should be an array of objects")
    assert(errOf("{ a: 1 }", "[{ path: '/a' }]") == pre + "Key 'op' missing")
    assert(errOf("{ a: 1 }", "[{ op: 1, path: '/a' }]") == pre + "Key 'op' not a string")
    assert(errOf("{ a: 1 }", "[{ op: 'add' }]") == pre + "Key 'path' missing")
    // the reference's own misreport: a missing VALUE says 'from'
    assert(errOf("{ a: 1 }", "[{ op: 'add', path: '/b' }]") == pre + "Key 'from' missing")
    assert(errOf("{ a: 1 }", "[{ op: 'frob', path: '/a' }]") == pre + "Invalid operation 'frob'")
    // parse-before-apply: the bad op is SECOND, yet the valid first op
    // must not apply — an error leaves the caller's value untouched
    val e = intercept[SqlError](patched("{ a: 1 }",
      "[{ op: 'replace', path: '/a', value: 2 }, { op: 'frob', path: '/x' }]"))
    assert(e.getMessage == pre + "Invalid operation 'frob'")
  }

  test("diff/patch round-trip (reference diff.rs vectors)") {
    val pairs = Seq(
      ("{ test: true }", "{ test: true, other: 'test' }"),
      ("{ test: true, other: 'test' }", "{ test: true }"),
      ("{ test: [1,2,3] }", "{ test: [1,2,3,4] }"),
      ("{ test: { other: 'test' } }", "{ test: { other: false } }"),
      ("{ test: { other: 'test' } }", "{ test: { other: 'text' } }"))
    for ((a, b) <- pairs) {
      val ops = VArr(Interp.valueDiff(v(a), v(b)))
      assert(JsonPatch.patch(v(a), ops) == v(b), s"round-trip $a -> $b")
    }
    // diff.rs pins the exact op for the text change
    val ops = Interp.valueDiff(
      v("{ test: { other: 'test' } }"), v("{ test: { other: 'text' } }"))
    assert(ops == Vector(V.obj("op" -> VStr("change"),
      "path" -> VStr("/test/other"),
      "value" -> VStr("@@ -1,4 +1,4 @@\n te\n-s\n+x\n t\n"))))
  }
}
