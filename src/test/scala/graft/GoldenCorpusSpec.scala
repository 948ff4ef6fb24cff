package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.surql.Golden

/** Regression guard for sweep rounds: the reference's ENTIRE golden corpus
  * (language-tests, 9330 cases as of r19) must stay fully green inside
  * `sbt test`, so a sweep fix can't trade a golden regression for an oracle
  * win silently — the r19 math sweep caught exactly one such context nuance
  * (sum/product per-value coercion) only because the corpus was re-run by
  * hand. The full run costs ~12 s, cheap enough to gate every build.
  *
  * Skips (rather than fails) when the reference checkout is absent, so the
  * suite still runs on a bare clone of this repo. */
class GoldenCorpusSpec extends AnyFunSuite {
  test("reference golden corpus passes in full") {
    val root = Paths.get("/root/reference/language-tests/tests")
    assume(Files.isDirectory(root), "reference corpus not present")
    val out = Golden.runPaths(root, root)
    val passed = out.map(_.passed).sum
    val total = out.map(_.total).sum
    val failing = out.filter(o => o.passed < o.total).flatMap { o =>
      val rel = root.relativize(o.path)
      o.failures.take(2).map(f => s"$rel: ${f.take(400)}")
    }
    assert(passed == total,
      s"golden corpus regressed: $passed/$total\n" + failing.take(20).mkString("\n"))
  }
}
