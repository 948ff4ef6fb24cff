import graft.surql._
object ParseDbg {
  def main(args: Array[String]): Unit = {
    for (sql <- Seq(
      "SELECT * FROM image:['apple', u'11111111-2222-3333-4444-555555555555'].. ORDER BY id;",
      "SELECT * FROM image:..['apple'] ORDER BY id;",
      "SELECT * FROM image:['a']..['b'];"
    )) {
      try { Parser.parse(sql); println("OK   " + sql.take(70)) }
      catch { case e: Exception => println("FAIL " + sql.take(70) + " => " + e.getMessage.take(60)) }
    }
  }
}
