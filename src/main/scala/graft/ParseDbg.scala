import graft.surql._
object ParseDbg {
  def main(args: Array[String]): Unit = {
    for (sql <- Seq(
      "RETURN embedding <|2|> $qvec;",
      "SELECT id FROM test WHERE embedding <|2|> $q;",
      "SELECT id FROM test WHERE (embedding <|2|> $q);"
    )) {
      try { Parser.parse(sql); println("OK   " + sql.take(70)) }
      catch { case e: Exception => println("FAIL " + sql.take(70) + " => " + e.getMessage.take(80)) }
    }
  }
}
