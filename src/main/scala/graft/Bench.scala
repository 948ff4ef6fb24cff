package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/classloader + FS-cache warmup: without it the first timed
    // query is billed several seconds of one-time JVM setup, making totals
    // depend on map iteration order instead of query cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables(spark, sfDir, t).count())
    // Shared persisted indexes (FTS postings, shingle table, ANN signature
    // buckets) are built ONCE per corpus — at 100 TB these are offline index
    // jobs, not query cost. Build them here and bill the wall-time to a
    // dedicated "index_build" line so each query's number is steady-state
    // (the reference likewise separates index build from query latency).
    val tIdx = System.nanoTime()
    val warms: Seq[(String, () => Any)] = Seq(
      ("fts", () => graft.operators.FullText.index(spark, sfDir)),
      ("fts_stem", () => graft.operators.FullText.stemmedIndex(spark, sfDir)),
      ("shingles", () => graft.operators.Dedup.shingleTable(spark, sfDir)),
      ("ann", () => graft.operators.Similarity.warmIndex(spark, sfDir)),
      ("ivf", () => graft.operators.Similarity.warmIvf(spark, sfDir)),
      ("hnsw", () => graft.operators.Hnsw.warm(spark, sfDir)),
      ("edges", () => graft.operators.GraphOps.warmEdges(spark, sfDir)),
      ("counts", () => graft.operators.CountIndex.warm(spark, sfDir)),
      ("buckets", () => graft.operators.Buckets.warm(spark, sfDir)),
      ("sources", () => graft.sources.Sources.warm(spark, sfDir)))
    // The ten builds are INDEPENDENT index jobs (distinct CacheDir keys, no
    // shared state beyond the session) — run them from a small thread pool so
    // each job's straggler tail back-fills with the next build's tasks
    // (optimization guide §2.6: overlap independent jobs; Spark schedules
    // concurrent jobs FIFO, which is exactly the back-fill behavior wanted).
    // Cold-cache wall measured on this box (OPTIMIZATION_r20.md §1):
    // 41.4 s sequential → 12.5 s at pool 6 → 9.5 s at pool 10. Pool size =
    // warm count: every build starts at once and the wall collapses to the
    // slowest single build (the per-build cost is mostly driver-side
    // planning + small jobs, so they don't fight for executor cores; also
    // measured safe at SPARK_GRAFT_CPUS=8: 8.2 s).
    val warmPool = java.util.concurrent.Executors.newFixedThreadPool(10)
    implicit val warmEc: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(warmPool)
    val warmFutures = warms.map { case (name, f) =>
      scala.concurrent.Future {
        val t0 = System.nanoTime()
        f()
        // per-warm attribution to stderr (stdout stays the one JSON line);
        // concurrent builds overlap, so these sum to MORE than the wall
        // time billed to index_build.
        System.err.println(
          f"[bench] warm $name%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(warmFutures),
      scala.concurrent.duration.Duration.Inf)
    warmPool.shutdown()
    val idxBuild = ("index_build", (System.nanoTime() - tIdx) / 1e9,
      None: Option[String], Seq((System.nanoTime() - tIdx) / 1e9))
    // Single-run timings proved indistinguishable from sandbox noise (a
    // 4× swing on untouched code between rounds): run each query REPS times
    // and report the per-query MEDIAN, which survives one bad GC pause or
    // page-cache miss. The full per-rep series is ALSO emitted ("reps"), so
    // a recorded median inflated by co-tenant contention is visible as
    // spread in the artifact rather than reading as a regression.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // local-iteration filter (mirrors Verify's SPARK_GRAFT_ONLY)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = idxBuild +: SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1).map { case (name, fn) =>
      // Consume EVERY output column via a hash-reduce — a bare count() would
      // let Catalyst dead-code the projection work and time only the scan.
      // bit_xor, not sum: a Long sum of hashes overflows under ANSI mode.
      def once(): Either[String, Double] =
        try {
          val t0 = System.nanoTime()
          val out = fn(spark, sfDir)
          out.select(xxhash64(out.columns.map(col).toIndexedSeq: _*).as("h"))
            .agg(expr("bit_xor(h)")).collect()
          Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Left(name)
        }
      val runs = (1 to reps).map(_ => once())
      val failure = runs.collectFirst { case Left(n) => n }
      val raw = runs.collect { case Right(t) => t }
      val times = raw.sorted
      val median = if (times.isEmpty) 0.0 else times(times.size / 2)
      (name, median, failure, raw)
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val repJson = results.map { case (k, _, _, raw) =>
      s"\"" + k + "\":" + raw.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failures = results.flatMap(_._3)
    val failuresJson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // a query that died mid-run must not post a plausible wall-time and keep
    // the bench green — failures are first-class in the emitted record
    val record = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repJson,"failed":$failuresJson,"sf":"$sfDir"}"""
    println(record)
    // The driver's stdout capture truncates the tail of long lines
    // ("parsed": null in BENCH_r1x artifacts) — persist the full record to
    // a file in the repo so the per-query rep series survive verbatim.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LOCAL_FULL.json"),
      (record + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_LOCAL_FULL.json: $e") }
    // The driver's artifact capture keeps only the TAIL of stdout; emitting
    // a compact top-20 summary AFTER the full record means the headline
    // numbers survive any truncation of the (long) per-query JSON line.
    val top = results.sortBy(-_._2).take(20)
      .map { case (k, v, _, _) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"summary":true,"total":${f"$total%.3f"},"n_queries":${results.size},"n_failed":${failures.size},"slowest":$top}""")
    if (failures.nonEmpty) {
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
