package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.operators.Similarity

/** vector::* namespace (surrealdb: fnc/vector.rs, dispatch fnc/mod.rs:517-538):
  * add/subtract/scale/dot/magnitude/normalize, distance::{euclidean,manhattan,
  * chebyshev}, similarity::cosine — the workhorse functions of an embedding
  * pipeline. All are per-row, in-order folds over the array in double
  * precision (codegen'd HOFs: zip_with/aggregate/transform) — deterministic
  * and embarrassingly parallel; nothing here shuffles. */
object VectorQueries {

  private def toD(a: Column): Column = transform(a, x => x.cast("double"))
  private def fold(a: Column): Column = aggregate(a, lit(0.0), (acc, v) => acc + v)

  /** SQL helpers: same in-order double folds over 64-dim lists. */
  private def sqlToD(x: String) = s"list_transform($x, v -> CAST(v AS DOUBLE))"
  private def sqlDot(x: String, y: String) =
    s"list_sum(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  val vectorOps = Q("vector_ops",
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1)
        SELECT e.vec_id,
               round(${sqlDot("e.embedding", "q.qe")}, 6) AS dot,
               round(sqrt(${sqlDot("e.embedding", "e.embedding")}), 6) AS magnitude,
               round(sqrt(list_sum(list_transform(range(1, 65),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
                      * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))))), 6)
                 AS euclidean,
               round(list_sum(list_transform(range(1, 65),
                 i -> abs(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE)))), 6)
                 AS manhattan,
               round(list_max(list_transform(range(1, 65),
                 i -> abs(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE)))), 6)
                 AS chebyshev,
               round(CAST(e.embedding[1] AS DOUBLE) + CAST(q.qe[1] AS DOUBLE), 6) AS add0,
               round(CAST(e.embedding[1] AS DOUBLE) * CAST(2.0 AS DOUBLE), 6) AS scale0,
               round(CAST(e.embedding[1] AS DOUBLE)
                     / sqrt(${sqlDot("e.embedding", "e.embedding")}), 6) AS norm0
        FROM embeddings e, q
        WHERE e.vec_id < 50
        ORDER BY e.vec_id""") {
    (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 1L).select(col("embedding").as("qe"))
      val e = col("embedding"); val qe = col("qe")
      val diff = zip_with(e, qe, (x, y) => x.cast("double") - y.cast("double"))
      emb.filter(col("vec_id") < 50L)
        .crossJoin(broadcast(q))
        .select(
          col("vec_id"),
          round(Similarity.dot(e, qe), 6).as("dot"),
          round(Similarity.norm(e), 6).as("magnitude"),
          round(sqrt(fold(transform(diff, x => x * x))), 6).as("euclidean"),
          round(fold(transform(diff, x => abs(x))), 6).as("manhattan"),
          round(array_max(transform(diff, x => abs(x))), 6).as("chebyshev"),
          round(element_at(e, 1).cast("double") + element_at(qe, 1).cast("double"), 6).as("add0"),
          round(element_at(e, 1).cast("double") * lit(2.0), 6).as("scale0"),
          round(element_at(e, 1).cast("double") / Similarity.norm(e), 6).as("norm0"))
        .orderBy("vec_id")
  }

  val all: Seq[Q] = Seq(vectorOps)
}
