package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch: dump the formatted plan of one SparkEntry query.
  * sbt "Test/runMain graft.operators.PlanDump <name> <sfDir>" */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(s, args(1))
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    s.stop()
  }
}
