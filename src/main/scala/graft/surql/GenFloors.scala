package graft.surql
import java.nio.file.{Files, Paths}
object GenFloors {
  def main(args: Array[String]): Unit = {
    val root = Paths.get("/root/reference/language-tests/tests")
    val outcomes = Golden.runPaths(root, root, _ => true)
    val byCat = scala.collection.mutable.LinkedHashMap[String, Long]()
    outcomes.foreach { o =>
      val rel = root.relativize(o.path).toString
      val cat = rel.split('/').take(2).mkString("/")
      byCat(cat) = byCat.getOrElse(cat, 0L) + o.passed
    }
    // flake guard: large pools get a small slack so a single
    // nondeterministic assert can't flip the correctness gate
    val out = byCat.toSeq.sortBy(_._1).map { case (c, n) =>
      // ≥100 asserts: proportional slack; 20–99: one-assert slack (a single
      // load-flaky TIMEOUT statement must not flip the gate); <20: exact.
      val slack = if (n >= 100) math.max(2L, n / 1000) else if (n >= 20) 1L else 0L
      s"$c\t${n - slack}"
    }.mkString("\n") + "\n"
    Files.writeString(Paths.get("src/main/resources/golden_floors.txt"), out)
    println("wrote " + byCat.size + " categories; total=" + byCat.values.sum)
  }
}
