import graft.surql._
object ParseDbg {
  def main(args: Array[String]): Unit = {
    for (sql <- Seq(
      "UPSERT person:test SET sport +?= 'football' RETURN sport;",
      "IF $x THEN (UPSERT person:test SET sport +?= 'football' RETURN sport) ELSE (RETURN 1) END;",
      "LET $r = (UPSERT person:test SET sport +?= 'x' RETURN sport);"
    )) {
      try { Parser.parse(sql); println("OK   " + sql.take(70)) }
      catch { case e: Exception => println("FAIL " + sql.take(70) + " => " + e.getMessage.take(70)) }
    }
  }
}
