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
    // category = path relative to tests root, first two segments (e.g. language/graph)
    val byCat = scala.collection.mutable.LinkedHashMap[String, (Int, Int, Int, Int)]()
    outcomes.foreach { o =>
      totalAsserts += o.total
      passedAsserts += o.passed
      val rel = testsRoot.relativize(o.path).toString
      val cat = rel.split('/').take(2).mkString("/")
      val (f, ft, a, at) = byCat.getOrElse(cat, (0, 0, 0, 0))
      byCat(cat) = (f + (if (o.ok) 1 else 0), ft + 1, a + o.passed, at + o.total)
      if (o.ok) okFiles += 1
      else if (verbose) {
        println(s"FAIL ${o.path} (${o.passed}/${o.total})")
        o.failures.take(3).foreach(f => println(s"  $f"))
      }
    }
    byCat.toSeq.sortBy { case (_, (f, ft, _, _)) => f - ft }.foreach {
      case (cat, (f, ft, a, at)) =>
        println(f"$cat%-40s files $f%4d/$ft%-4d asserts $a%5d/$at%-5d")
    }
    println(s"files: $okFiles/${outcomes.length} fully passing; " +
      s"assertions: $passedAsserts/$totalAsserts")
  }
}
