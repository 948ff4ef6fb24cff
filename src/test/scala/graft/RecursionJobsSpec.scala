package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side job-count gates for the recursion loops (r21).
  *
  * The frontier loops used to run an EAGER localCheckpoint per depth (one
  * job whose internal count is discarded) plus a separate, gated isEmpty
  * probe job per probed depth. r21 marks the checkpoint lazily and counts
  * the internal RDD itself — the same materialization job, with the row
  * count kept — so the empty-frontier break is free and the probe jobs are
  * gone. These tests pin the per-query job budget of the CONSTRUCTION phase
  * (the driver-side loop); a regression here means a probe job crept back
  * in, which is invisible to result checks and plan dumps. */
class RecursionJobsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  /** Count Spark jobs submitted while `body` runs. The listener bus is
    * asynchronous — poll until the count is stable. */
  private def jobsDuring(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var last = -1
      var stable = 0
      while (stable < 3) { // 3 consecutive 100ms polls with no new jobs
        Thread.sleep(100)
        val cur = n.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      last
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** Jobs of the query's construction phase (the driver-side recursion
    * loop), measured on a SECOND invocation so one-time fixture probes and
    * table warms are already memoized. */
  private def constructionJobs(name: String): Int = {
    SparkEntry.queries(name)(spark, sf) // warm memos/persists
    jobsDuring { SparkEntry.queries(name)(spark, sf); () }
  }

  // Budgets are TOTAL submitted jobs at sf0.001/local[8]: one
  // materialize+count job per loop depth, plus the broadcast-exchange
  // builds the per-depth joins submit at this data size (size-threshold
  // artifacts, identical in both shapes). Measured r21 vs r20 (old shape,
  // probe jobs included): chain 7 vs 8, surql 8 vs 9, collect 10 vs 12,
  // path 10 vs 12, shortest 22 vs 22 (its gated probes ARE its early exit
  // and stay). A count above budget means a probe job crept back in.
  test("recursion_chain runs its 3-depth loop with no probe jobs") {
    assert(constructionJobs("recursion_chain") <= 7)
  }

  test("recursion_surql runs its 3-depth loop with no probe jobs") {
    assert(constructionJobs("recursion_surql") <= 8)
  }

  test("recursion_collect runs its 4-depth loop with no probe jobs") {
    assert(constructionJobs("recursion_collect") <= 10)
  }

  test("recursion_path runs its 4-depth loop with no probe jobs") {
    assert(constructionJobs("recursion_path") <= 10)
  }

  test("recursion_shortest stops at first contact (BFS early exit)") {
    // minD=1, maxD=6, target hit at depth 3: 3 materialize+count jobs,
    // 3 gated probes, and the joins' broadcast builds — the full 6-depth
    // loop (no early exit) would far exceed this.
    assert(constructionJobs("recursion_shortest") <= 22)
  }
}
