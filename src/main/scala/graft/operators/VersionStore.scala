package graft.operators

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Versioned snapshot convention for `SELECT … VERSION d'…'` on the Spark
  * path (surrealdb: exec/operators/version_scope.rs:25 scopes the scan to a
  * point-in-time view of the KV store).
  *
  * A parquet catalog has no MVCC, so time travel is a SNAPSHOT convention —
  * the same shape lakehouse table formats use (Delta/Iceberg `versionAsOf`):
  * next to the live table `<table>.parquet` live immutable snapshots
  * `<table>@<ISO-instant>.parquet`, and `VERSION d'ts'` resolves the scan to
  * the latest snapshot with snapshot-ts <= ts, falling back to the live
  * table when none qualifies. Resolution is pure path selection at PLAN
  * time: the chosen snapshot is still one static parquet relation, so
  * Catalyst keeps full pushdown/pruning and nothing changes at 100 TB
  * (snapshots are what an ingest pipeline would already be writing).
  *
  * Snapshots live under a writable root (the testdata dir is read-only);
  * [[ensureSnapshot]] materializes a fixture idempotently. */
object VersionStore {

  /** Writable snapshot root for a given catalog dir. */
  def snapshotRoot(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"${sys.props("java.io.tmpdir")}/graft_versions/$tag"
  }

  private def parseTs(s: String): Option[Instant] =
    try Some(Instant.parse(s)) catch { case _: Exception => scala.None }

  /** Latest snapshot of `table` with ts <= asOf, else the live table. */
  def tableAt(spark: SparkSession, dir: String, table: String,
      asOf: Instant): DataFrame = {
    val root = new java.io.File(snapshotRoot(dir))
    val candidates = Option(root.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith(table + "@") && n.endsWith(".parquet"))
          parseTs(n.stripPrefix(table + "@").stripSuffix(".parquet"))
            .filter(!_.isAfter(asOf)).map(ts => (ts, f.getAbsolutePath))
        else scala.None
      }
    candidates.sortBy(_._1).lastOption match {
      case Some((_, path)) => spark.read.parquet(path)
      case scala.None      => Tables(spark, dir, table)
    }
  }

  /** Idempotently materialize a snapshot fixture (skips if present). */
  def ensureSnapshot(spark: SparkSession, dir: String, table: String,
      ts: String)(build: DataFrame => DataFrame): Unit = {
    val path = s"${snapshotRoot(dir)}/$table@$ts.parquet"
    if (!new java.io.File(path, "_SUCCESS").exists())
      build(Tables(spark, dir, table)).write.mode("overwrite").parquet(path)
  }
}
