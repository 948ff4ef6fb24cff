package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev tool: print per-query construction-phase job counts (see
  * RecursionJobsSpec). Usage: sbt "Test/runMain graft.operators.JobProbe q1,q2". */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.session
    val sf = "/root/testdata/sf0.001"
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq(
      "recursion_chain", "recursion_surql", "recursion_collect",
      "recursion_path", "recursion_shortest"))
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sf)
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          n.incrementAndGet()
          descs.add(Option(js.properties)
            .map(_.getProperty("spark.job.description", "?")).getOrElse("?") +
            " stages=" + js.stageInfos.map(_.name).mkString("|"))
        }
      }
      spark.sparkContext.addSparkListener(l)
      graft.SparkEntry.queries(name)(spark, sf)
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val cur = n.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      spark.sparkContext.removeSparkListener(l)
      // broadcast-exchange builds run as futures (withThreadLocalCaptured
      // stages) — size-threshold artifacts of sf0.001, not loop structure
      var core = 0
      descs.forEach(d => if (d.contains("count at") || d.contains("isEmpty at")
        || d.contains("runJob at") || d.contains("checkpoint at")
        || d.contains("head at") || d.contains("collect at")) core += 1)
      println(s"== $name: $last jobs, core=$core")
      descs.forEach(d => println(s"   $d"))
    }
    spark.stop()
  }
}
