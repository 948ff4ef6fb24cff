package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hnsw

/** Sharded HNSW: graph invariants, search recall against exact brute
  * force, determinism, and the `<|k,ef|>` SurrealQL routing. */
class HnswSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  /** Deterministic pseudo-random unit-ish vectors (seeded). */
  private def vecs(n: Int, dim: Int = 16): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
  }

  private def bruteTopK(all: Seq[(Long, Array[Float])], q: Array[Float], k: Int): Seq[Long] = {
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    all.map { case (id, v) => (dist(q, v), id) }.sorted.take(k).map(_._2)
  }

  test("graph build respects degree bounds and level assignment") {
    val data = vecs(300)
    val g = Hnsw.buildGraph(data)
    assert(g.vecs.size == 300)
    g.links.foreach { case (id, ls) =>
      assert(ls.length - 1 == Hnsw.levelOf(id), s"node $id level mismatch")
      ls.zipWithIndex.foreach { case (nbrs, lvl) =>
        val cap = if (lvl == 0) Hnsw.M0 else Hnsw.M
        assert(nbrs.length <= cap, s"node $id level $lvl degree ${nbrs.length} > $cap")
        assert(!nbrs.contains(id), s"node $id self-link")
        // links point at nodes that exist at that level
        nbrs.foreach(n => assert(g.links(n).length > lvl))
      }
    }
    // entry is a max-level node
    assert(g.entryLevel == g.links.values.map(_.length - 1).max)
  }

  test("ef-beam search recall >= 0.9 vs exact brute on 300 vectors") {
    val data = vecs(300)
    val g = Hnsw.buildGraph(data)
    var hits = 0; var total = 0
    (0 until 20).foreach { qi =>
      val q = data(qi * 7)._2
      val got = g.search(q, 10, 80).map(_._1).toSet
      val want = bruteTopK(data, q, 10).toSet
      hits += (got & want).size; total += want.size
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.9, s"HNSW recall too low: $recall")
  }

  test("graph build is deterministic") {
    val data = vecs(150)
    val g1 = Hnsw.buildGraph(data)
    val g2 = Hnsw.buildGraph(data)
    assert(g1.entry == g2.entry && g1.entryLevel == g2.entryLevel)
    g1.links.foreach { case (id, ls) =>
      val ls2 = g2.links(id)
      assert(ls.length == ls2.length)
      ls.zip(ls2).foreach { case (a, b) => assert(a.sorted == b.sorted) }
    }
  }

  test("knn_ann_hnsw probe: 10 ordered real neighbors, exact scores, recall vs brute") {
    val rows = graft.operators.Hnsw.annHnswTop10(spark, sf).collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(rows.forall(_.getLong(0) != 0L))
    // scores must be the exact cosine for those ids (HNSW prunes candidates,
    // never rescores)
    import org.apache.spark.sql.functions._
    val ids = rows.map(_.getLong(0)).toSet
    val emb = Tables.embeddingsWide(spark, sf)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id").isin(ids.toSeq: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.operators.Similarity.cosine(col("embedding"), col("qe")), 6)
          .as("cos_sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(math.abs(exact(r.getLong(0)) - r.getDouble(1)) < 1e-9))
    val brute = SparkEntry.queries("knn_brute")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val recall = (ids & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"sharded-HNSW recall too low: $recall")
  }

  test("<|k,ef|> SurrealQL text routes through the HNSW probe") {
    import org.apache.spark.sql.functions._
    val vec = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
      .map(v => v.toDouble.toString).mkString("[", ", ", "]")
    val df = graft.surql.SparkPlanner.query(spark, sf,
      s"""SELECT vec_id, math::fixed(1.0 - vector::distance::knn(), 6) AS cos_sim
          FROM embeddings WHERE vec_id != 0 AND embedding <|10,80|> $vec
          ORDER BY cos_sim DESC, vec_id""")
    val rows = df.collect()
    assert(rows.length == 10)
    val brute = SparkEntry.queries("knn_brute")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val ids = rows.map(_.getLong(0)).toSet
    assert((ids & brute).size.toDouble / brute.size >= 0.8)
  }
}
