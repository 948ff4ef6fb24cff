package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Vector similarity search over an embedding column (Array[Float], dim 64).
  *
  * Reference cousins: `KnnTopK` brute-force (surrealdb:
  * exec/operators/knn_topk.rs:81 — min-heap of k by distance) and `KnnScan`
  * over the HNSW index (exec/operators/scan/knn.rs:37). A graph index like
  * HNSW doesn't distribute, so the Spark scale path is LSH bucketing
  * (random-hyperplane signatures → bucket join), with brute-force top-k as
  * the exact baseline — per SURVEY §2.1 KnnScan mapping.
  *
  * All dot products run in double precision via codegen'd higher-order
  * functions (`zip_with` + in-order `aggregate` fold) — deterministic, no
  * UDFs, no data leaves the executors until the final top-k. */
object Similarity {

  /** In-order fold dot product of two float arrays, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** SQL twin of [[cosine]]: same in-order double fold, for the DuckDB
    * oracle (1-based list indexing; range(1,65) = dims 1..64). */
  def sqlCosine(a: String, b: String): String = {
    def dotS(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"(${dotS(a, b)} / (sqrt(${dotS(a, a)}) * sqrt(${dotS(b, b)})))"
  }

  /** `KnnTopK` brute-force: exact top-10 cosine neighbors of vec_id=0.
    * The 1-row query side is broadcast; scoring is an embarrassingly
    * parallel scan + TakeOrderedAndProject — the right plan at any scale. */
  val knnBrute = Q("knn_brute",
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, round(${sqlCosine("e.embedding", "q.qe")}, 6) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id LIMIT 10""") {
    (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
      emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
  }

  /** Embedding near-duplicate / similarity join: exact top-20 most-similar
    * pairs. Brute all-pairs is the oracle-checked baseline (the testdata has
    * no >0.95 pairs, so output is top-k not a thresholded set); the LSH
    * variant below is the 100 TB path. */
  val embedTopPairs = Q("embed_top_pairs",
    s"""SELECT a.vec_id AS a, b.vec_id AS b,
               round(${sqlCosine("a.embedding", "b.embedding")}, 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        ORDER BY cos_sim DESC, a, b LIMIT 20""") {
    (s, d) =>
      val emb = Tables.embeddings(s, d)
      val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
      a.join(b, col("a") < col("b"))
        .select(col("a"), col("b"),
          round(cosine(col("ea"), col("eb")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("a"), col("b"))
        .limit(20)
  }

  // --- LSH-bucketed ANN (the scale path) -------------------------------

  private val NumPlanes = 16
  /** Deterministic ±1 random hyperplanes (seeded, no runtime randomness). */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPlanes, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** 16-bit random-hyperplane signature of an embedding column. */
  def lshSignature(emb: Column): Column =
    (0 until NumPlanes).map { j =>
      val plane = array(planes(j).map(lit): _*)
      when(dot(emb, plane) > 0.0, shiftleft(lit(1), j)).otherwise(0)
    }.reduce(_ + _)

  /** `KnnScan` ANN analog: probe buckets within Hamming distance 2 of the
    * query signature, rerank the survivors exactly, top-10. Scans only the
    * candidate fraction (signature filter is a cheap codegen'd predicate; at
    * scale the table would be bucketed BY the signature so probing prunes
    * partitions instead of scanning). Rows-only: approximate by design. */
  val knnAnnLsh = Q.rowsOnly("knn_ann_lsh") { (s, d) =>
    val emb = Tables.embeddings(s, d).withColumn("sig", lshSignature(col("embedding")))
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qe"), col("sig").as("qsig"))
    emb.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= 5)
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(knnBrute, embedTopPairs, knnAnnLsh)
}
