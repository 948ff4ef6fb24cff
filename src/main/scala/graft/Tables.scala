package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver testdata (TESTDATA.md).
  *
  * Mirrors the reference's table resolution (surrealdb: catalog/table.rs:45-66,
  * exec/operators/scan/table.rs:39 `TableScan`): a table name resolves to a
  * scan source. Here a scan is `spark.read.parquet`, so Catalyst owns
  * predicate pushdown, column pruning and partition pruning natively — the
  * reference implements these by hand (`needed_fields`, `scan_predicate`,
  * exec/planner/select.rs:80-115); we get them from the declarative plan.
  *
  * Scale note (100 TB): nothing here collects to the driver. Each table is a
  * distributed parquet scan; small dimensions (region/nation) are flagged so
  * join builders can `broadcast()` them.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimensions small enough to broadcast at any scale factor (region=5,
    * nation=25 rows — fixed-size dims in the TPC-H-ish schema). */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Uncommitted-write overlay for multi-statement scripts (SparkPlanner
    * .script): inside `withOverlay`, a table name resolves to its pending
    * post-mutation plan instead of the base parquet scan. The overlay holds
    * lazy DataFrames — nothing materializes until the script's final result
    * executes, so a whole transaction composes into ONE Catalyst plan. */
  private val overlay =
    new scala.util.DynamicVariable[Map[String, DataFrame]](Map.empty)
  def withOverlay[T](m: Map[String, DataFrame])(f: => T): T =
    overlay.withValue(m)(f)

  /** The ambient overlay (empty outside `withOverlay`) — script executors
    * seed from it so nested/externally-injected overlays compose. */
  def currentOverlay: Map[String, DataFrame] = overlay.value

  /** True when `name` currently resolves to uncommitted script writes —
    * index-backed fast paths (e.g. the COUNT index) must not serve stale
    * base-table answers for an overridden table. */
  def overridden(name: String): Boolean = overlay.value.contains(name)

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    overlay.value.getOrElse(name, {
      if (name == "events")
        // events.ts is TIMESTAMP(NANOS) parquet, which vanilla Spark rejects;
        // read it as a long (ns since epoch) — convert with nsToTimestamp below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Convert an ns-since-epoch long (see events.ts) to a microsecond
    * TimestampType column. */
  def nsToTimestamp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros((c / 1000L).cast("long"))

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** The testdata ships each table as ONE single-row-group parquet file, so a
    * raw scan is one task. Pipelines that do heavy per-row work right after
    * the scan (shingling, tokenization, signature computation) read through
    * these: the table bytes are small, the repartition shuffle is trivial,
    * and the downstream explode/hash work fans out across all cores. On a
    * real cluster the source is many files and this is a no-op decision. */
  def documentsWide(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddingsWide(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
}
