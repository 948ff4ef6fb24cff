package graft.operators

/** Scratch: score any Snowball language against an oracle TSV of
  * (word, expected-stem) pairs generated from PostgreSQL's snowball
  * dictionaries (the same upstream algorithms rust_stemmers embeds).
  * sbt "Test/runMain graft.operators.StemDev <lang> <tsv> [missOut]" */
object StemDev {
  def main(args: Array[String]): Unit = {
    val lang = args(0)
    val pairs = scala.io.Source.fromFile(args(1), "UTF-8").getLines()
      .filter(_.contains('\t')).map { l =>
        val Array(w, s) = l.split('\t'); (w, s)
      }.toVector
    var ok = 0
    val miss = Vector.newBuilder[(String, String, String)]
    pairs.foreach { case (w, want) =>
      val got = graft.surql.Snowball.stem(lang, w)
      if (got == want) ok += 1 else miss += ((w, want, got))
    }
    val m = miss.result()
    println(s"$lang: ${ok}/${pairs.size} exact (${m.size} miss)")
    if (args.length > 2) {
      val out = new java.io.PrintWriter(args(2), "UTF-8")
      m.foreach { case (w, want, got) => out.println(s"$w\t$want\t$got") }
      out.close()
    }
  }
}
