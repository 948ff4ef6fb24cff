package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN vs brute-force: the LSH-bucketed path is approximate but its hits
  * must be a subset of the true ranking universe and the probe must keep
  * reasonable recall on the top-10. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  test("knn_brute returns 10 ordered neighbors") {
    val rows = SparkEntry.queries("knn_brute")(spark, sf).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("ann_lsh recall against brute-force top-10") {
    val brute = SparkEntry.queries("knn_brute")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val ann = graft.operators.Similarity.annLshTop10(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val universe = Tables.embeddings(spark, sf).collect().map(_.getLong(0)).toSet
    assert(ann.subsetOf(universe - 0L), "ANN ids must be real vec_ids, never the query")
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"ANN recall too low: $recall (ann=$ann brute=$brute)")
  }

  test("embed_top_pairs (LSH candidates) is symmetric-free, ordered, and " +
    "every LSH pair score matches the brute-force score for that pair") {
    val rows = SparkEntry.queries("embed_top_pairs")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("embed_top_pairs_exact returns the true all-pairs top of its sample") {
    val rows = SparkEntry.queries("embed_top_pairs_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < 500 && r.getLong(1) < 500))
    val sims = rows.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("ann_ivf: probe returns 10 ordered real neighbors whose scores match " +
    "the brute-force score for the same ids") {
    val ivf = graft.operators.Similarity.annIvfTop10(spark, sf).collect()
    assert(ivf.length == 10)
    val sims = ivf.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    // every (id, score) the IVF probe emits must agree with the exact
    // full-scan score — the probe prunes candidates, never rescores them
    val bruteAll = Tables.embeddings(spark, sf).count()
    assert(ivf.forall(r => r.getLong(0) != 0L && r.getLong(0) < bruteAll))
    val ids = ivf.map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddingsWide(spark, sf)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id").isin(ids.toSeq: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.operators.Similarity.cosine(col("embedding"), col("qe")), 6)
          .as("cos_sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(math.abs(exact(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("knn_ann_filtered fills the full k under a selective predicate " +
    "(adaptive over-fetch: the fixed slack alone cannot)") {
    val vec = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
      .map(v => v.toDouble.toString).mkString("[", ", ", "]")
    val rows = graft.surql.SparkPlanner.query(spark, sf,
      s"""SELECT vec_id, math::fixed(1.0 - vector::distance::knn(), 6) AS cos_sim
          FROM embeddings WHERE vec_id >= 400 AND embedding <|10,80|> $vec
          ORDER BY cos_sim DESC, vec_id""").collect()
    assert(rows.length == 10, s"expected exactly k=10 rows, got ${rows.length}")
    // every survivor honors the predicate
    assert(rows.forall(_.getLong(0) >= 400L))
    // ordered by similarity descending
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("gated ANN rows: every quality gate passes at sf0.001") {
    for (name <- Seq("knn_ann_lsh", "knn_ann_ivf", "knn_ann_filtered",
        "knn_ann_from_text")) {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      // knn_ann_lsh gained the scan-fraction cost gate in r18
      val want = if (name == "knn_ann_lsh") 3 else 2
      assert(rows.length == want, s"$name should emit $want gate rows")
      rows.foreach(r => assert(r.getBoolean(2),
        s"$name gate failed: ${r.getString(0)} thr=${r.getDouble(1)}"))
    }
  }
}
