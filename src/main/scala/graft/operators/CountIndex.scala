package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** IndexCountScan (surrealdb: exec/operators/scan/index_count.rs:55): a
  * `SELECT count() FROM t GROUP ALL` with no predicate is served by the
  * table's COUNT index — a maintained single-value count, not a scan.
  *
  * Spark analog: the count is computed ONCE per (dir, table) at index-build
  * time (one distributed metadata-cheap job, alongside the FTS/ANN/edge
  * index builds) and cached; the planner answers unpredicated GROUP ALL
  * counts from the cache. At 100 TB this is the stored count a mutation
  * pipeline maintains transactionally in the reference (doc counting on the
  * index write path) — an ingest job would persist it next to the data. */
object CountIndex {
  private val cache =
    scala.collection.concurrent.TrieMap[(String, String), Long]()

  def of(s: SparkSession, dir: String, table: String): Long =
    cache.getOrElseUpdate((dir, table), Tables(s, dir, table).count())

  /** Bench attributes the builds to index_build, like the other indexes.
    * The counts persist as a marker-gated sidecar so a later JVM prefills
    * the cache without touching the data. */
  def warm(s: SparkSession, dir: String): Unit = {
    val base = graft.CacheDir.ensure(graft.CacheDir.path("counts-v1", dir)) { p =>
      new java.io.File(p).mkdirs()
      graft.CacheDir.writeSidecar(p, "counts.tsv",
        Tables.all.map(t => s"$t\t${Tables(s, dir, t).count()}").mkString("\n"))
    }
    graft.CacheDir.readSidecar(base, "counts.tsv").linesIterator
      .filter(_.nonEmpty).foreach { line =>
        val Array(t, n) = line.split("\t", 2)
        cache.putIfAbsent((dir, t), n.toLong)
      }
  }
}
