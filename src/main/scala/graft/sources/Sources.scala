package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Ingest-format breadth beyond the parquet catalog: JSONL and CSV readers
  * with EXPLICIT schemas (an ingest pipeline at 100 TB never runs schema
  * inference — that is a second full scan) plus the import surface the
  * reference exposes (`surreal import` accepts JSON/JSONL; csv via tooling).
  *
  * Each reader round-trips real catalog data: the conversion job writes the
  * format ONCE per corpus into a /tmp cache (an offline layout job, like the
  * persisted FTS/ANN indexes), and the oracle-gated query reads it back and
  * must match the parquet-backed oracle row-for-row. Splittable formats +
  * per-file parallelism mean the read scales exactly like the parquet scan:
  * no driver-side parsing, no collect. */
object Sources {

  private val converted =
    scala.collection.concurrent.TrieMap[(String, String), String]()

  /** documents as JSONL — written once per corpus (offline conversion;
    * completion-marked so a crashed partial write is never read back). */
  private def documentsJsonlPath(s: SparkSession, dir: String): String =
    converted.getOrElseUpdate((dir, "documents_jsonl"),
      graft.CacheDir.ensure(graft.CacheDir.path("src-jsonl-v1", dir)) { p =>
        Tables.documents(s, dir).write.mode("overwrite").json(p)
      })

  /** nation as headered CSV — written once per corpus. */
  private def nationCsvPath(s: SparkSession, dir: String): String =
    converted.getOrElseUpdate((dir, "nation_csv"),
      graft.CacheDir.ensure(graft.CacheDir.path("src-csv-v1", dir)) { p =>
        Tables.nation(s, dir).write.mode("overwrite")
          .option("header", "true").csv(p)
      })

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** JSONL scan with a declared schema — splittable, parallel, no
    * inference pass. */
  def documentsJsonl(s: SparkSession, dir: String): DataFrame =
    s.read.schema(documentsSchema).json(documentsJsonlPath(s, dir))

  /** CSV scan with a declared schema + header skip. */
  def nationCsv(s: SparkSession, dir: String): DataFrame =
    s.read.schema(nationSchema).option("header", "true")
      .csv(nationCsvPath(s, dir))

  /** Warm the conversions (bench attributes them to index_build — they are
    * one-time layout jobs, not query cost). */
  def warm(s: SparkSession, dir: String): Unit = {
    documentsJsonlPath(s, dir)
    nationCsvPath(s, dir)
    eventsPartitionedPath(s, dir)
  }

  /** JSONL round-trip: the format scan must reproduce the parquet-backed
    * oracle bit-for-bit, with the filter running over the JSON scan. */
  val sourceJsonl = Q("source_jsonl",
    """SELECT doc_id, lang, source, n_chars FROM documents
       WHERE n_chars > 200 ORDER BY doc_id""") { (s, d) =>
    documentsJsonl(s, d)
      .filter(col("n_chars") > 200)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** CSV round-trip incl. a join back onto the parquet catalog (mixed-format
    * plans are the ingest norm: raw CSV dim × columnar fact). */
  val sourceCsv = Q("source_csv",
    """SELECT n.n_nationkey, n.n_name, COUNT(*) AS n_cust
       FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_nationkey, n.n_name ORDER BY n.n_nationkey""") { (s, d) =>
    val n = nationCsv(s, d)
    val c = Tables.customer(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_nationkey"), n("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("n_nationkey")
  }

  /** events re-laid-out as parquet PARTITIONED BY event_type — the sink
    * side: one layout job per corpus, directory-level pruning thereafter. */
  private def eventsPartitionedPath(s: SparkSession, dir: String): String =
    converted.getOrElseUpdate((dir, "events_part"),
      graft.CacheDir.ensure(graft.CacheDir.path("src-events-part-v1", dir)) { p =>
        Tables.events(s, dir).write.mode("overwrite")
          .partitionBy("event_type").parquet(p)
      })

  def eventsPartitioned(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(eventsPartitionedPath(s, dir))

  /** Partitioned-sink round-trip: the event_type predicate prunes at the
    * DIRECTORY level (PartitionFilters, zero data files of other types
    * touched) — the layout a 100 TB event store would use. PlanSpec pins
    * the pruning. */
  val sinkPartitioned = Q("sink_partitioned",
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'purchase' ORDER BY event_id""") { (s, d) =>
    eventsPartitioned(s, d)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(sourceJsonl, sourceCsv, sinkPartitioned)
}
