package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Event-time streaming semantics end-to-end: watermarked windowed
  * aggregation and custom-state sessionization over MemoryStream
  * microbatches. Each test also runs the SAME transform in batch on the
  * union of all fed events and asserts the emitted streaming rows agree —
  * the invariant that makes the batch oracle meaningful for the stream
  * path. */
class StreamSpec extends AnyFunSuite {

  test("watermarked tumbling window emits finalized hours and drops late rows") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, String, Double)]
    val events = stream.toDF.toDF("secs", "event_type", "value")
      .select(to_timestamp(col("secs").cast("long").cast("timestamp")).as("ts"),
        col("event_type"), col("value"))

    val q = Streams.windowedAgg(events).writeStream
      .format("memory").queryName("win_agg").outputMode("append").start()
    try {
      // hour 0: three events, two types
      stream.addData((60L, "click", 10.0), (120L, "click", 20.0), (180L, "view", 5.0))
      q.processAllAvailable()
      // jump to hour 3 → after this batch the watermark (max-30m) passes
      // hour 0's end and hour 0 finalizes on the next trigger
      stream.addData((3L * 3600 + 60, "click", 1.0))
      q.processAllAvailable()
      // the watermark lags one batch: only NOW is a hour-0 straggler beyond
      // it — it must be DROPPED, not double-counted into a finalized window
      stream.addData((200L, "click", 999.0), (4L * 3600, "view", 2.0))
      q.processAllAvailable()
      stream.addData((5L * 3600, "view", 3.0)) // one more trigger to flush
      q.processAllAvailable()

      val emitted = spark.table("win_agg")
        .select(col("hour_start").cast("long"), col("event_type"), col("cnt"),
          col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.get(3) match {
            case d: java.math.BigDecimal => d.doubleValue
            case d: java.lang.Double => d.doubleValue
          })).toSet
      // hour 0 finalized without the late straggler
      assert(emitted.contains((0L, "click", 2L, 30.0)),
        s"hour-0 click window wrong or missing: $emitted")
      assert(emitted.contains((0L, "view", 1L, 5.0)))
      assert(!emitted.exists { case (h, t, _, v) => h == 0 && t == "click" && v > 30.0 },
        "late row past the watermark leaked into a finalized window")
    } finally q.stop()
  }

  test("windowedAgg in batch mode reproduces the events_window oracle query") {
    val spark = TestSpark.session
    val sf = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sf)
      .select(col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value"))
    val streamTwin = graft.streaming.Streams.windowedAgg(events)
      .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("events_window")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamTwin == batch,
      "streaming window transform diverged from the oracle-checked batch twin")
  }

  test("hopping window assigns each event to 4 overlapping windows") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, String, Double)]
    val events = stream.toDF.toDF("secs", "event_type", "value")
      .select(to_timestamp(col("secs").cast("long").cast("timestamp")).as("ts"),
        col("event_type"), col("value"))

    val q = Streams.slidingAgg(events).writeStream
      .format("memory").queryName("slide_agg").outputMode("append").start()
    try {
      // one event at t=2000s (inside the hour windows starting at -15, 0,
      // +15 and +30 minutes)
      stream.addData((2000L, "click", 10.0))
      q.processAllAvailable()
      // advance far enough that all four windows finalize
      stream.addData((4L * 3600, "view", 1.0))
      q.processAllAvailable()
      stream.addData((8L * 3600, "view", 1.0))
      q.processAllAvailable()

      val clicks = spark.table("slide_agg")
        .filter(col("event_type") === "click")
        .select(col("win_start").cast("long")).collect().map(_.getLong(0)).toSet
      assert(clicks == Set(-900L, 0L, 900L, 1800L),
        s"expected the 4 overlapping hour windows, got $clicks")
    } finally q.stop()
  }

  test("slidingAgg in batch reproduces the events_window_sliding oracle query") {
    val spark = TestSpark.session
    val sf = "/root/testdata/sf0.001"
    val streamTwin = SparkEntry.queries("events_window_sliding")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamTwin.nonEmpty)
    // 4-fold assignment: total cnt across windows = 4 × event count
    val totalCnt = streamTwin.map(_(2).asInstanceOf[Long]).sum
    val nEvents = Tables.events(spark, sf).count()
    assert(totalCnt == 4 * nEvents,
      s"hopping windows should count each event 4×: $totalCnt vs $nEvents events")
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Long, String, Long)]
    val events = stream.toDF.toDF("event_id", "user_id", "event_type", "secs")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("secs").cast("long").cast("timestamp")).as("ts"),
        lit(1.0).as("value"))

    val q = Streams.purchaseClickJoin(events).writeStream
      .format("memory").queryName("pc_join").outputMode("append").start()
    try {
      // user 1 clicks at t=1000 and t=2000, purchases at t=3000 (both
      // clicks within the preceding hour) — and a click at t=3100 AFTER
      // the purchase plus user 2's unrelated click must not pair
      stream.addData((1L, 1L, "click", 1000L), (2L, 1L, "click", 2000L),
        (3L, 2L, "click", 1500L))
      q.processAllAvailable()
      stream.addData((4L, 1L, "purchase", 3000L), (5L, 1L, "click", 3100L))
      q.processAllAvailable()
      // a purchase hours later: the old clicks are outside the 1h bound
      stream.addData((6L, 1L, "purchase", 6L * 3600))
      q.processAllAvailable()
      stream.addData((7L, 3L, "click", 12L * 3600)) // watermark flush
      q.processAllAvailable()

      val got = spark.table("pc_join")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((4L, 1L), (4L, 2L)),
        s"expected purchase 4 paired with clicks 1 and 2 only, got $got")
    } finally q.stop()
  }

  test("watermarked stream dedup drops re-delivered ids across microbatches") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF.toDF("event_id", "secs")
      .select(col("event_id"),
        to_timestamp(col("secs").cast("long").cast("timestamp")).as("ts"))

    val q = Streams.dedupStream(events).writeStream
      .format("memory").queryName("dedup_s").outputMode("append").start()
    try {
      stream.addData((1L, 1000L), (2L, 1010L), (1L, 1005L)) // in-batch dup
      q.processAllAvailable()
      stream.addData((2L, 1020L), (3L, 1030L)) // cross-batch re-delivery
      q.processAllAvailable()
      val got = spark.table("dedup_s").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got.sorted == Seq(1L, 2L, 3L), s"got $got")
    } finally q.stop()
  }

  test("stream-static enrichment joins each event to the broadcast dimension") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val users = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val stream = MemoryStream[(Long, Long, String, Double)]
    val events = stream.toDF.toDF("event_id", "user_id", "event_type", "value")

    val q = Streams.enrich(events, users).writeStream
      .format("memory").queryName("enrich_s").outputMode("append").start()
    try {
      stream.addData((10L, 1L, "click", 1.0), (11L, 2L, "view", 2.0),
        (12L, 9L, "view", 3.0)) // user 9 has no dimension row → dropped
      q.processAllAvailable()
      val got = spark.table("enrich_s")
        .select("event_id", "c_mktsegment").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((10L, "BUILDING"), (11L, "MACHINERY")), s"got $got")
    } finally q.stop()
  }

  test("custom-state sessionization closes sessions on gap and matches batch") {
    val spark = TestSpark.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Long)]
    // the lambda must not capture the (non-serializable) spec instance
    val events = stream.toDS.map { case (u, secs) =>
      Streams.Ev(u, new Timestamp(secs * 1000L), 1.0)
    }

    val q = Streams.sessionize(events, gapSecs = 1800L).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 60s apart (one session); user 2: one event.
      // (times start at 1000s — a row whose event time equals the current
      // watermark, 0 at the first batch, is filtered as late)
      stream.addData((1L, 1000L), (1L, 1060L), (2L, 1010L))
      q.processAllAvailable()
      // user 1 returns hours later → the arriving event itself closes the
      // first session (gap exceeded) and opens a new one
      stream.addData((1L, 4L * 3600))
      q.processAllAvailable()
      // watermark advance + empty trigger for event-time timeouts: user 2's
      // lone session times out once the watermark passes last+gap
      stream.addData((3L, 10L * 3600))
      q.processAllAvailable()
      stream.addData((3L, 10L * 3600 + 10))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .select("user_id", "start_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got.contains((1L, 1000000000L, 2L)), s"user-1 first session missing: $got")
      assert(got.contains((2L, 1010000000L, 1L)),
        s"user-2 session did not time out via event-time state: $got")

      // batch twin on the same fed events (sessions that closed): identical
      // gap semantics computed with window functions
      val all = Seq((1L, 1000L), (1L, 1060L), (2L, 1010L), (1L, 4L * 3600),
        (3L, 10L * 3600), (3L, 10L * 3600 + 10))
        .toDF("user_id", "secs")
      val batch = all
        .withColumn("tu", col("secs") * 1000000L)
        .withColumn("new_sess",
          when(coalesce(col("tu") - lag("tu", 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("tu")), lit(Long.MaxValue))
            > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("sess_no", sum("new_sess").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("tu")))
        .groupBy("user_id", "sess_no")
        .agg(min("tu").as("start_us"), count(lit(1)).as("n_events"))
      val closedBatch = batch
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      // every emitted streaming session appears in the batch recompute
      got.foreach { case (u, s, n) =>
        assert(closedBatch.exists { case (bu, bs, bn) => bu == u && bs == s && bn == n },
          s"streaming session ($u,$s,$n) not in batch twin $closedBatch")
      }
    } finally q.stop()
  }
}
