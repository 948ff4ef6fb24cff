package graft.surql
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sql = """DEFINE TABLE likes TYPE RELATION FROM person TO person | thing SCHEMAFUL;
LET $first_p = CREATE person SET name = 'first person';
LET $thing = CREATE thing SET name = 'rust';
RELATE $first_p->likes->$thing;"""
    val in = new Interp()
    in.namespaces("test") = "x"; in.databases("test") = "x"
    val rs = in.run(Parser.parse(sql))
    rs.foreach { r => println(r) }
    println("tableDef: " + in.tableDefs.get("likes"))
  }
}
