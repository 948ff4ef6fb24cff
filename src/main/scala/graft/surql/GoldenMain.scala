package graft.surql

import java.nio.file.Paths

/** CLI: run the reference golden corpus (or a filtered subset) and print a
  * per-file pass/fail summary. Usage: GoldenMain [pathFilter] [-v] */
object GoldenMain {
  def main(args: Array[String]): Unit = {
    val filter = args.filterNot(_.startsWith("-")).headOption.getOrElse("")
    val verbose = args.contains("-v")
    val testsRoot = Paths.get("/root/reference/language-tests/tests")
    val outcomes = Golden.runPaths(testsRoot, testsRoot, p => p.contains(filter))
    var okFiles = 0
    var totalAsserts = 0
    var passedAsserts = 0
    outcomes.foreach { o =>
      totalAsserts += o.total
      passedAsserts += o.passed
      if (o.ok) okFiles += 1
      else if (verbose) {
        println(s"FAIL ${o.path} (${o.passed}/${o.total})")
        o.failures.take(3).foreach(f => println(s"  $f"))
      }
    }
    println(s"files: $okFiles/${outcomes.length} fully passing; " +
      s"assertions: $passedAsserts/$totalAsserts")
  }
}
