package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Graph traversal as joins.
  *
  * In the reference, edges are rows in relation tables with `in`/`out`
  * record-id fields (surrealdb: catalog/table.rs:151-156) and a hop
  * `->edge->target` is `GraphEdgeScan` (exec/operators/scan/graph.rs:64) — an
  * id-equijoin from a batch of source ids into the edge table. That is
  * exactly a distributed hash join, so the Spark lowering is `edges.join`:
  * shuffle on the id, AQE/broadcast when one side is small, and Catalyst
  * plans a semi join when only target ids are needed
  * (`GraphScanOutput::TargetId`, scan/graph.rs:30-36).
  *
  * On the TPC-H-ish testdata the natural edge tables are
  * `orders (customer -> order)` and `lineitem (order -> part/supplier)`.
  *
  * Bounded recursion `@{1..n}` (exec/operators/recursion.rs:81) is a
  * driver-side loop over frontier DataFrames — each hop is one distributed
  * join; the loop only controls depth, never touches row data.
  */
object GraphOps {

  /** Relation-table topology: edge table name → (inTable, outTable). The
    * `supplies` edges are the `mut_relate` output (one edge per distinct
    * supplier→part shipment pair with aggregate props) — the Spark analog of
    * a RELATE-populated relation table (catalog/table.rs:151-156). The
    * SurrealQL planner lowers `->supplies->part` onto these. */
  val edgeDefsBase: Map[String, (String, String)] = Map(
    "supplies" -> ("supplier", "part"),
    // each customer's orders by date form a linked list — the time-series
    // idiom of SURVEY §1.1; self-referencing, so `@{n..m}` recursion from
    // SurrealQL text has a real chain to walk (exec/operators/recursion.rs)
    "next_order" -> ("orders", "orders"))

  /** Extra relation tables registered at runtime (tests / user RELATE
    * targets beyond the built-in catalog); the edge rows themselves come
    * from the table catalog (overlay or parquet), schema (id, in, out, …). */
  val extraEdgeDefs =
    scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** The effective relation catalog (base + runtime registrations). */
  object edgeDefs {
    def get(name: String): Option[(String, String)] =
      edgeDefsBase.get(name).orElse(extraEdgeDefs.get(name))
    def getOrElse(name: String, default: => (String, String)): (String, String) =
      get(name).getOrElse(default)
    def contains(name: String): Boolean = get(name).isDefined
    def keys: Iterable[String] = edgeDefsBase.keys
    def all: Map[String, (String, String)] = edgeDefsBase ++ extraEdgeDefs
  }

  /** Session-cached edge tables per corpus dir, schema (id, in, out, props…).
    * Built ONCE and persisted — at 100 TB this is the stored relation table
    * the RELATE job wrote, bucketed by `in` (and mirrored by `out` for
    * reverse hops), not per-query work. */
  private val edgeCache =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  /** Force edge-table builds (bench attributes them to index_build). */
  def warmEdges(s: SparkSession, d: String): Unit =
    edgeDefs.keys.foreach(edgeTable(s, d, _))

  def edgeTable(s: SparkSession, dir: String, name: String): DataFrame =
    if (extraEdgeDefs.contains(name)) Tables(s, dir, name) // overlay-backed, never cached
    else edgeCache.getOrElseUpdate((dir, name), {
      // the stored relation persists on disk with a completion marker, so a
      // later JVM re-reads the written edges instead of re-deriving them
      val base = graft.CacheDir.ensure(
        graft.CacheDir.path(s"edge-$name-v1", dir)) { p =>
        buildEdge(s, dir, name).write.parquet(p)
      }
      val e = s.read.parquet(base).persist()
      // lazily pinned: the first reader materializes the cached copy
      e
    })

  private def buildEdge(s: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "supplies" =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_suppkey").as("in"), col("l_partkey").as("out"))
          .agg(count(lit(1)).as("n_shipments"),
            graft.functions.Exact.dsum(col("l_quantity")).as("total_qty"))
          .select(
            concat(lit("supplies:"), col("in").cast("string"), lit(":"),
              col("out").cast("string")).as("id"),
            col("in"), col("out"), col("n_shipments"), col("total_qty"))
      case "next_order" =>
        // one window shuffle builds the whole chain; stored-relation shape
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(
            concat(lit("next_order:"), col("o_orderkey").cast("string"), lit(":"),
              col("nxt").cast("string")).as("id"),
            col("o_orderkey").as("in"), col("nxt").as("out"))
      case other => throw new IllegalArgumentException(s"unknown edge table $other")
    }

  /** One `->edge->` hop: from a set of source ids through an edge table.
    * `outCols` picks what survives (TargetId vs FullEdge output modes). */
  def hop(src: DataFrame, edges: DataFrame, srcKey: Column, edgeIn: Column,
          outCols: Seq[Column]): DataFrame =
    src.join(edges, srcKey === edgeIn).select(outCols: _*)

  /** Bounded recursive traversal: frontier-join loop with depth counter.
    * Returns (start, node, depth) for depth in 1..maxDepth. Each iteration is
    * one shuffle join on `src`. The edge set and every frontier are persisted
    * so the upstream lineage (often a window/join pipeline) is computed once,
    * not once per hop and once more for the final union; for unbounded-depth
    * recursion a periodic `localCheckpoint` would also truncate lineage. */
  def recurse(start: DataFrame, edges: DataFrame, maxDepth: Int): DataFrame = {
    // start: (start, node); edges: (src, dst). Each hop's frontier is
    // localCheckpoint'ed (eager): hop N+1 and the final union read the
    // materialized blocks instead of replaying the whole upstream lineage
    // once per hop — the loop runs maxDepth small sequential jobs.
    val e = edges.persist().alias("e")
    var frontier = start
    var acc: DataFrame = null
    var depth = 1
    var live = true
    while (depth <= maxDepth && live) {
      val f = frontier.alias("f")
      // LAZY checkpoint + internal-RDD count: an EAGER localCheckpoint
      // already runs an internal rdd.count() to materialize the blocks and
      // throws the number away — marking lazily and counting the internal
      // RDD ourselves runs the SAME single job but KEEPS the count, so the
      // empty-frontier break is free at every depth (the old shape paid a
      // gated second isEmpty job per probed depth). A plain RDD count, not
      // Dataset.count(): no per-iteration aggregate planning or codegen.
      frontier = f.join(e, col("f.node") === col("e.src"))
        .select(col("f.start").as("start"), col("e.dst").as("node"))
        .localCheckpoint(eager = false)
      val n = frontier.queryExecution.toRdd.count() // materializes, one job
      val labeled = frontier.withColumn("depth", lit(depth.toLong))
      acc = if (acc == null) labeled else acc.unionByName(labeled)
      // empty frontier ⇒ every deeper frontier is empty too; stop instead of
      // joining emptiness maxDepth times
      if (n == 0L) live = false
      depth += 1
    }
    acc
  }

  /** 1-hop: BUILDING-segment customers `->placed->order`, ids only
    * (semi-join shape — Catalyst prunes the customer payload columns). */
  val graphOneHop = Q("graph_one_hop",
    """SELECT o.o_orderkey FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment = 'BUILDING'
       ORDER BY o.o_orderkey""") {
    (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      hop(c, o, c("c_custkey"), o("o_custkey"), Seq(o("o_orderkey")))
        .orderBy("o_orderkey")
  }

  /** 2-hop: AUTOMOBILE customers `->order->lineitem->part` — distinct part
    * ids reached. Two shuffle joins; the filter is pushed below both. */
  val graphTwoHop = Q("graph_two_hop",
    """SELECT DISTINCT l.l_partkey FROM customer c
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'AUTOMOBILE'
       ORDER BY l_partkey""") {
    (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val firstHop = hop(c, o, c("c_custkey"), o("o_custkey"), Seq(o("o_orderkey")))
      firstHop.join(l, firstHop("o_orderkey") === l("l_orderkey"))
        .select(l("l_partkey")).distinct()
        .orderBy("l_partkey")
  }

  /** `ReferenceScan` (exec/operators/scan/reference.rs:48): reverse lookup
    * `<~lineitem` — which rows reference these parts. Join direction swapped;
    * same equi-join machinery. */
  val referenceScan = Q("reference_scan",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_partkey FROM part p
       JOIN lineitem l ON l.l_partkey = p.p_partkey
       WHERE p.p_size = 50
       ORDER BY p_partkey, l_orderkey, l_linenumber""") {
    (s, d) =>
      val p = Tables.part(s, d).filter(col("p_size") === 50)
      val l = Tables.lineitem(s, d)
      p.join(l, l("l_partkey") === p("p_partkey"))
        .select(l("l_orderkey"), l("l_linenumber"), p("p_partkey"))
        .orderBy("p_partkey", "l_orderkey", "l_linenumber")
  }

  /** `Recursion` (exec/operators/recursion.rs:81): bounded traversal
    * `@{1..3}` over a next-order chain (each customer's orders by date form a
    * linked list — the time-series idiom of SURVEY §1.1). Oracle is a
    * recursive CTE. */
  val recursionChain = Q("recursion_chain",
    """WITH RECURSIVE seq AS (
         SELECT o_custkey, o_orderkey,
                lead(o_orderkey) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS nxt,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders),
       edges AS (SELECT o_orderkey AS src, nxt AS dst FROM seq WHERE nxt IS NOT NULL),
       starts AS (SELECT o_orderkey AS start FROM seq WHERE rn = 1),
       walk AS (
         SELECT start, start AS node, CAST(0 AS BIGINT) AS depth FROM starts
         UNION ALL
         SELECT w.start, e.dst, w.depth + 1 FROM walk w
         JOIN edges e ON w.node = e.src WHERE w.depth < 3)
       SELECT start, node, depth FROM walk WHERE depth >= 1
       ORDER BY start, depth, node""") {
    (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // persisted: edges AND starts derive from this window pipeline — the
      // sort shuffle runs once, not once per derived branch
      val seq = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
        .withColumn("rn", row_number().over(w))
        .persist()
      val edges = seq.filter(col("nxt").isNotNull)
        .select(col("o_orderkey").as("src"), col("nxt").as("dst"))
      val starts = seq.filter(col("rn") === 1)
        .select(col("o_orderkey").as("start"), col("o_orderkey").as("node"))
      recurse(starts, edges, maxDepth = 3)
        .select(col("start"), col("node"), col("depth"))
        .orderBy("start", "depth", "node")
  }

  val all: Seq[Q] = Seq(graphOneHop, graphTwoHop, referenceScan, recursionChain)
}
