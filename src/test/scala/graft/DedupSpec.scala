package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MinHash/SimHash quality: the LSH candidates must cover the pairs the
  * exact n-gram Jaccard verifier finds (the testdata plants ~25 near-dup
  * pairs at J≈0.98 per 500 docs). */
class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash recall: every exact-Jaccard>=0.5 pair is an LSH candidate") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = graft.operators.Dedup.minhashEstimates(spark, sf)
      .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${exact.size} true pairs: $missed")
  }

  test("simhash ranks the true near-dup pairs first") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = graft.operators.Dedup.simhashPairs(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("hamming").asc)
      .limit(50).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    // every true pair that simhash surfaced should have small hamming distance
    val surfaced = sim.filter { case (p, _) => exact(p) }
    assert(surfaced.nonEmpty)
    assert(surfaced.forall(_._2 <= 8), s"near-dup pairs should be hamming-close: ${surfaced.toSeq}")
  }

  test("exact dedup groups each unique text once") {
    val df = SparkEntry.queries("dedup_exact")(spark, sf)
    val total = df.collect().map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("gated dedup rows: minhash/simhash quality gates pass at sf0.001") {
    for (name <- Seq("dedup_minhash", "dedup_simhash")) {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      assert(rows.length == 2, s"$name should emit 2 gate rows")
      rows.foreach(r => assert(r.getBoolean(2),
        s"$name gate failed: ${r.getString(0)} thr=${r.getDouble(1)}"))
    }
  }
}
