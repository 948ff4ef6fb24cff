package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SkimV2

/** SkimMatcherV2 fuzzy scoring, pinned to the reference's own published
  * outputs (surrealdb/core/tests/function.rs:1313-1377 — the five
  * string::similarity::fuzzy / ::smithwaterman vectors) plus structural
  * properties of the fzf-v2 scoring family the matcher belongs to. */
class SkimV2Spec extends AnyFunSuite {

  test("reference-published vectors reproduce bit-exactly") {
    assert(SkimV2.fuzzyMatch("", "") == 0L)
    assert(SkimV2.fuzzyMatch("some", "text") == 0L)
    assert(SkimV2.fuzzyMatch("text", "TEXT") == 83L)
    assert(SkimV2.fuzzyMatch("TEXT", "TEXT") == 91L)
    assert(SkimV2.fuzzyMatch("this could be a tricky test", "this test") == 174L)
  }

  test("empty pattern scores 0 against anything") {
    assert(SkimV2.fuzzyMatch("anything", "") == 0L)
  }

  test("non-subsequence pattern scores 0 (reference unwrap_or(0))") {
    assert(SkimV2.fuzzyMatch("abc", "abcd") == 0L)
    assert(SkimV2.fuzzyMatch("hello", "x") == 0L)
  }

  test("matching is case-insensitive with a per-char case penalty") {
    val same = SkimV2.fuzzyMatch("hello", "hello")
    val mixed = SkimV2.fuzzyMatch("hello", "HELLO")
    assert(mixed > 0L && mixed == same - 2L * 5) // penalty −2 per mismatched char
  }

  test("word-boundary matches outrank mid-word matches") {
    // 'g' at a word head ("to-go") vs buried mid-word ("ongoing")
    assert(SkimV2.fuzzyMatch("to-go", "g") > SkimV2.fuzzyMatch("ongoing", "g"))
    // the first pattern char at a special position is worth extra
    // (the crate's bonus_first_char_multiplier rationale: "to-go" vs
    // "ongoing" on "og" — string-head 'o' wins)
    assert(SkimV2.fuzzyMatch("ongoing", "og") > SkimV2.fuzzyMatch("to-go", "og"))
  }

  test("camelCase edges earn a bonus over flat runs") {
    assert(SkimV2.fuzzyMatch("fooBar", "b") > SkimV2.fuzzyMatch("foobar", "b"))
  }

  test("consecutive matches outrank gapped matches of the same chars") {
    assert(SkimV2.fuzzyMatch("abcdef", "abc") > SkimV2.fuzzyMatch("axbxcx", "abc"))
  }

  test("gap length monotonically reduces the score") {
    val tight = SkimV2.fuzzyMatch("ab", "ab")
    val one = SkimV2.fuzzyMatch("axb", "ab")
    val two = SkimV2.fuzzyMatch("axxb", "ab")
    assert(tight > one && one > two)
  }

  test("both engine paths share the kernel") {
    val pairs = Seq(("text", "TEXT"), ("this could be a tricky test", "this test"),
      ("fooBar baz", "fbb"), ("hello_world", "hw"))
    pairs.foreach { case (c, p) =>
      val viaStrSim = graft.functions.StrSim.fuzzy(
        org.apache.spark.unsafe.types.UTF8String.fromString(c),
        org.apache.spark.unsafe.types.UTF8String.fromString(p))
      assert(viaStrSim == SkimV2.fuzzyMatch(c, p))
    }
  }
}
