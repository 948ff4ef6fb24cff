package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.surql.{Dmp, Interp}

/** The diff-match-patch engine behind `value::diff`'s string `change` ops.
  * Anchors: the reference's own pinned vectors (val/value/diff.rs test +
  * language-tests update_output), canonical dmp structural behavior
  * (multi-hunk splitting, semantic cleanup), and — the strongest gate —
  * patch-apply round-trips over a deterministic corpus of string pairs. */
class DmpSpec extends AnyFunSuite {

  test("reference-pinned vectors") {
    // val/value/diff.rs diff_change_text
    assert(Interp.dmpPatchText("test", "text") == "@@ -1,4 +1,4 @@\n te\n-s\n+x\n t\n")
    // language-tests/statements/update/update_output.surql — the crate
    // prints ",1" where canonical dmp prints a bare start
    assert(Interp.dmpPatchText("C", "D") == "@@ -1,1 +1,1 @@\n-C\n+D\n")
  }

  test("distant edits split into multiple hunks") {
    val a = "aXbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbYc"
    val b = "aZbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbWc"
    val txt = Interp.dmpPatchText(a, b)
    assert(txt.linesIterator.count(_.startsWith("@@")) == 2,
      s"expected two hunks (equality run ≥ 8 chars splits patches):\n$txt")
    assert(Interp.dmpPatchApply(txt, a) == b)
  }

  test("canonical diff shapes") {
    import Dmp._
    // pure insertion inside an equality
    assert(diffMain("abc", "ab123c", checklines = true).toList ==
      List(Diff(EQUAL, "ab"), Diff(INSERT, "123"), Diff(EQUAL, "c")))
    // pure deletion
    assert(diffMain("a123bc", "abc", checklines = true).toList ==
      List(Diff(EQUAL, "a"), Diff(DELETE, "123"), Diff(EQUAL, "bc")))
    // overlap helper (canonical test vectors)
    assert(commonOverlap("", "abcd") == 0)
    assert(commonOverlap("abc", "abcd") == 3)
    assert(commonOverlap("123456", "abcd") == 0)
    assert(commonOverlap("123456xxx", "xxx123456") == 3)
  }

  test("semantic cleanup merges char churn into word edits") {
    // canonical example: without cleanup the raw Myers diff of these is
    // char-confetti; patch_make runs cleanupSemantic so the patch text
    // carries whole-word delete/insert runs
    val a = "The quick brown fox jumps over the lazy dog."
    val b = "That quick brown fox jumped over a lazy dog."
    val txt = Interp.dmpPatchText(a, b)
    assert(Interp.dmpPatchApply(txt, a) == b, s"round-trip failed:\n$txt")
  }

  test("patch-apply round-trips over a deterministic corpus") {
    val rnd = new scala.util.Random(0xd1ff)
    val alphabet = "abcde \n"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String): String = {
      var out = s
      (1 to 1 + rnd.nextInt(4)).foreach { _ =>
        if (out.isEmpty) out = randStr(3)
        else rnd.nextInt(3) match {
          case 0 => // insert
            val i = rnd.nextInt(out.length + 1)
            out = out.substring(0, i) + randStr(1 + rnd.nextInt(5)) + out.substring(i)
          case 1 => // delete
            val i = rnd.nextInt(out.length)
            val j = math.min(out.length, i + 1 + rnd.nextInt(5))
            out = out.substring(0, i) + out.substring(j)
          case 2 => // replace
            val i = rnd.nextInt(out.length)
            val j = math.min(out.length, i + 1 + rnd.nextInt(4))
            out = out.substring(0, i) + randStr(1 + rnd.nextInt(4)) + out.substring(j)
        }
      }
      out
    }
    (1 to 300).foreach { k =>
      val a = randStr(rnd.nextInt(120))
      val b = mutate(a)
      val txt = Interp.dmpPatchText(a, b)
      val back = Interp.dmpPatchApply(txt, a)
      assert(back == b,
        s"round-trip #$k failed\n a=$a\n b=$b\n got=$back\n patch:\n$txt")
    }
    // longer texts cross the line-mode threshold (>100 chars)
    (1 to 40).foreach { k =>
      val a = randStr(150 + rnd.nextInt(300))
      val b = mutate(mutate(a))
      val txt = Interp.dmpPatchText(a, b)
      assert(Interp.dmpPatchApply(txt, a) == b, s"long round-trip #$k failed")
    }
  }

  test("multi-byte text round-trips through %XX encoding") {
    val a = "naïve café ünïcödé"
    val b = "naïve cafés ünicode"
    val txt = Interp.dmpPatchText(a, b)
    assert(txt.contains("%"), "multi-byte chars must be %XX-escaped")
    assert(Interp.dmpPatchApply(txt, a) == b)
  }
}
