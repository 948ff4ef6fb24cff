package graft.operators

import graft.Q
import graft.surql.Golden
import java.nio.file.Paths

/** The reference's golden language-test corpus as a CORRECTNESS entry.
  *
  * `golden_manifest.txt` pins the corpus files (317 files, ~1.5k assertions
  * from /root/reference/language-tests/tests) that the graft.surql engine
  * passes byte-exactly — parse → execute → render against each file's
  * TOML-in-comment expectations. The query runs every pinned file and emits
  * (file, passed, total); the oracle asserts passed == total for each, so
  * any engine regression turns this row red. The expectations themselves
  * come from the reference's committed goldens, not from our engine. */
object GoldenQueries {

  private lazy val manifest: Seq[(String, Long)] = {
    val in = getClass.getResourceAsStream("/golden_manifest.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(path, total) = line.split('\t')
      (path, total.toLong)
    }.toVector
    finally src.close()
  }

  private val testsRoot = "/root/reference/language-tests/tests"

  val surqlGolden = Q("surql_golden", {
    val rows = manifest.sortBy(_._1).map { case (path, total) =>
      s"('${path.replace("'", "''")}', $total, $total)"
    }.mkString(",\n")
    s"""SELECT * FROM (VALUES
        $rows) t(file, passed, total) ORDER BY file"""
  }) { (spark, _) =>
    val root = Paths.get(testsRoot)
    val results = manifest.sortBy(_._1).map { case (path, _) =>
      val p = root.resolve(path)
      val outcome =
        try {
          val tf = Golden.parseFile(p)
          Golden.runFile(tf, root)
        } catch {
          case e: Exception => Golden.Outcome(p, 0, 0, Seq(e.getMessage))
        }
      (path, outcome.passed.toLong, outcome.total.toLong)
    }
    import spark.implicits._
    results.toDF("file", "passed", "total").orderBy("file")
  }

  val all: Seq[Q] = Seq(surqlGolden)
}
