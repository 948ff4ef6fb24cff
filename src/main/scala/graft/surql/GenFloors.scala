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
    // floors == passes: the corpus is at 100% and the gate itself was
    // de-flaked (51eb7ff pinned the load-flaky TIMEOUT statements), so any
    // regression of a single expectation must fail the suite
    val out = byCat.toSeq.sortBy(_._1).map { case (c, n) => s"$c\t$n" }
      .mkString("\n") + "\n"
    Files.writeString(Paths.get("src/main/resources/golden_floors.txt"), out)
    println("wrote " + byCat.size + " categories; total=" + byCat.values.sum)
  }
}
