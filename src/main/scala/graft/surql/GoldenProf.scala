package graft.surql

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Profile the golden-corpus run (optimization evidence tool, like
  * PlanDump): per-phase CPU-time breakdown — TOML/config parse, SurQL
  * parse, interpret+compare — summed single-threaded over the corpus, so
  * the surql_golden floor can be attributed before optimizing it. */
object GoldenProf {
  def main(args: Array[String]): Unit = {
    val root = Paths.get("/root/reference/language-tests/tests")
    val files = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".surql")).toSeq.sortBy(_.toString)
    var tToml = 0L; var tParse = 0L; var tRun = 0L
    var nFiles = 0; var nRun = 0; var parseChars = 0L
    val tfs = files.flatMap { p =>
      val t0 = System.nanoTime()
      val tf = try Some(Golden.parseFile(p)) catch { case _: Exception => None }
      tToml += System.nanoTime() - t0
      nFiles += 1
      tf.filter(f => f.run && !f.wip)
    }
    val perFile = tfs.map { tf =>
      if (!tf.expectParseError) {
        val t1 = System.nanoTime()
        try Parser.parse(tf.sql) catch { case _: Exception => () }
        tParse += System.nanoTime() - t1
        parseChars += tf.sql.length
      }
      val t2 = System.nanoTime()
      try Golden.runFileWithTimeout(tf, root) catch { case _: Exception => () }
      val dt = System.nanoTime() - t2
      tRun += dt
      nRun += 1
      (tf.path.toString, dt / 1e9)
    }
    println(f"files walked+toml-parsed: $nFiles, runnable: $nRun")
    println(f"toml/config parse total: ${tToml / 1e9}%.2f s")
    println(f"surql parse total:       ${tParse / 1e9}%.2f s  (${parseChars} chars)")
    println(f"run (parse+interp+cmp):  ${tRun / 1e9}%.2f s")
    val sorted = perFile.sortBy(-_._2)
    println("slowest 25 files:")
    sorted.take(25).foreach { case (p, t) => println(f"  $t%7.3f s  $p") }
    val cum = sorted.map(_._2)
    println(f"top-10 share: ${cum.take(10).sum / cum.sum * 100}%.1f%%, " +
      f"top-50 share: ${cum.take(50).sum / cum.sum * 100}%.1f%%")
  }
}
