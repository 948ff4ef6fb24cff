package graft.operators

/** Scratch: score graft.surql.Snowball.tamil against an oracle TSV of
  * (word, expected-stem) pairs generated from a local snowball-tamil
  * oracle (PostgreSQL's ts_lexize('tamil_stem', …) — the same upstream
  * snowball algorithm rust_stemmers embeds).
  * sbt "Test/runMain graft.operators.TamilDev /tmp/ta_all.tsv [dump]" */
object TamilDev {
  def main(args: Array[String]): Unit = {
    val pairs = scala.io.Source.fromFile(args(0), "UTF-8").getLines()
      .filter(_.contains('\t')).map { l =>
        val Array(w, s) = l.split('\t'); (w, s)
      }.toVector
    var ok = 0
    val miss = Vector.newBuilder[(String, String, String)]
    pairs.foreach { case (w, want) =>
      val got = graft.surql.Snowball.stem("tamil", w)
      if (got == want) ok += 1 else miss += ((w, want, got))
    }
    val m = miss.result()
    println(s"${ok}/${pairs.size} exact (${m.size} miss)")
    if (args.length > 1) {
      val out = new java.io.PrintWriter(args(1), "UTF-8")
      m.foreach { case (w, want, got) => out.println(s"$w\t$want\t$got") }
      out.close()
    }
  }
}
