package graft
import java.nio.file.Paths
import graft.surql.Golden
object GoldenStab {
  def main(args: Array[String]): Unit = {
    val root = Paths.get("/root/reference/language-tests/tests")
    sys.env.get("GOLDEN_FILTER") match {
      case Some(f) =>
        val out = Golden.runPaths(root, root, p => p.contains(f))
        out.filter(o => o.passed < o.total).foreach { o =>
          println(s"== ${root.relativize(o.path)} ${o.passed}/${o.total}")
          o.failures.foreach(x => println("   " + x.take(3000)))
        }
        println(s"TOTAL ${out.map(_.passed).sum}/${out.map(_.total).sum}")
      case None =>
        val out = Golden.runPaths(root, root)
        val byCat = scala.collection.mutable.TreeMap[String, (Long, Long)]()
        out.foreach { o =>
          val cat = root.relativize(o.path).toString.split('/').take(2).mkString("/")
          val (p, t) = byCat.getOrElse(cat, (0L, 0L))
          byCat(cat) = (p + o.passed, t + o.total)
        }
        println(s"TOTAL ${out.map(_.passed).sum}/${out.map(_.total).sum}")
        byCat.filter { case (_, (p, t)) => p < t }
          .foreach { case (c, (p, t)) => println(s"  below: $c $p/$t") }
    }
  }
}
