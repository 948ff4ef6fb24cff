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

  test("randomized scoring-model invariants hold across seeds") {
    // the documented fzf-v2 invariants, exercised over generated inputs:
    // a contiguous embedding always outranks a gap-split one, every extra
    // gap char strictly lowers the score, lowercase-exact outranks
    // case-mismatched, and any true subsequence scores positive
    val r = new scala.util.Random(0x5eed)
    val alpha = "abcdefghijklmnop"
    (1 to 200).foreach { _ =>
      val pat = Seq.fill(r.nextInt(4) + 2)(alpha(r.nextInt(alpha.length))).mkString
      val noise = Seq.fill(3)("qrstuvw"(r.nextInt(7))).mkString
      val contiguous = noise + pat + noise
      val split = noise + pat.map(c => s"$c${"qrstuvw"(r.nextInt(7))}").mkString + noise
      assert(SkimV2.fuzzyMatch(contiguous, pat) > SkimV2.fuzzyMatch(split, pat),
        s"contiguous dominance failed: '$contiguous' vs '$split' on '$pat'")
      assert(SkimV2.fuzzyMatch(split, pat) > 0L,
        s"true subsequence scored 0: '$split' on '$pat'")
      assert(SkimV2.fuzzyMatch(contiguous, pat) >=
        SkimV2.fuzzyMatch(contiguous, pat.init.toUpperCase + pat.last) ||
        pat.init == pat.init.toUpperCase,
        s"case penalty ordering failed on '$pat'")
      val g1 = noise + pat.head + "q" + pat.tail
      val g2 = noise + pat.head + "qq" + pat.tail
      assert(SkimV2.fuzzyMatch(g1, pat) > SkimV2.fuzzyMatch(g2, pat),
        s"gap monotonicity failed on '$pat'")
    }
    // the verdict's canonical boundary example
    assert(SkimV2.fuzzyMatch("axbycz", "abc") < SkimV2.fuzzyMatch("abcxyz", "abc"))
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
