package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the 100 TB gates. Each test pins a plan
  * property that keeps a query scalable — filter pushdown reaching the
  * parquet scan, column pruning, TakeOrderedAndProject for top-k, broadcast
  * joins for dims, no cartesian products on the hot paths, whole-stage
  * codegen coverage. A regression here is a scale regression even when the
  * answers stay right. */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("filter_where pushes its predicate into the parquet scan") {
    val p = planOf("filter_where")
    assert(p.contains("PushedFilters: ["), "no pushed filters on the scan")
    assert(!p.contains("PushedFilters: []"), "pushed-filter list is empty")
  }

  test("perm_scan pushes the permission predicate into the parquet scan") {
    val p = planOf("perm_scan")
    // the session's SELECT permission (o_custkey = $auth, bound to 42)
    // must reach the reader as a pushed filter, alongside the user WHERE
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "no pushed filters on the permission-scoped scan")
    assert(p.contains("o_custkey"),
      "permission predicate column absent from the physical plan")
  }

  test("point_lookup pushes the key equality down") {
    val p = planOf("point_lookup")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"))
  }

  test("project_expr prunes the scan to referenced columns only") {
    val p = planOf("project_expr")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined, "no ReadSchema in plan")
    // lineitem has 16 columns; the projection touches a strict subset
    assert(read.get.split(",").length < 16, s"scan reads all columns: ${read.get}")
  }

  test("topk plans TakeOrderedAndProject, not a global sort") {
    val p = planOf("topk")
    assert(p.contains("TakeOrderedAndProject"), "ORDER BY + LIMIT did not fuse")
  }

  test("fetch_join broadcasts the dimension side") {
    val p = planOf("fetch_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"),
      "fetch did not broadcast the dim table")
  }

  test("graph_arrow stays an equi-join (no cartesian/BNLJ)") {
    val p = planOf("graph_arrow")
    assert(!p.contains("CartesianProduct"), "graph hop degenerated to a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "graph hop degenerated to a BNLJ")
  }

  test("agg_group runs inside whole-stage codegen with partial aggregation") {
    val df = SparkEntry.queries("agg_group")(spark, sf)
    // AQE only finalizes codegen stages at execution time
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker in the final AQE plan
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "aggregate fell out of codegen")
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("r20 kernels stay inside whole-stage codegen") {
    // the r20 sweep kernels (WHATWG url, ammonia sanitize, strict numeric
    // casts, slug) are codegen'd static calls, never UDFs — the hot path
    // must keep them inside a `*(n)` codegen stage
    val df = graft.surql.SparkPlanner.query(spark, sf,
      """SELECT o_orderkey,
           parse::url::host(string::concat('http://H', o_orderkey, '.com/x')) AS h,
           string::html::sanitize(string::concat('<div>', o_orderkey, '</div>')) AS s,
           <int>(o_totalprice * 0 + 2.0) AS i,
           string::slug(string::concat('A_', o_orderkey)) AS sl
         FROM orders ORDER BY o_orderkey LIMIT 3;""")
    val rows = df.collect()
    assert(rows.length == 3 && rows(1).getString(1) == "h1.com" &&
      rows(1).getString(2) == "<div>1</div>" && rows(1).getLong(3) == 2L &&
      rows(1).getString(4) == "a_1")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("),
      "r20 kernels fell out of codegen")
    Seq("graft_url_part", "graft_html_sanitize", "graft_strict_cast", "graft_slug")
      .foreach(k => assert(p.contains(k), s"$k missing from the plan"))
  }

  test("subquery_parent decorrelates to aggregate equi-joins, not per-row loops") {
    val p = planOf("subquery_parent")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "correlated subquery did not decorrelate")
    assert(p.contains("collect_list") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate") || p.contains("HashAggregate"),
      "no grouped aggregate for the subquery side")
    // the two structurally-identical subqueries must share ONE join
    val joins = "Join LeftOuter".r.findAllIn(p).length
    assert(joins <= 2, s"structural dedup failed: $joins outer joins for 2 distinct subqueries")
  }

  test("script transactions keep scan pushdown through the write overlay") {
    val p = planOf("script_txn")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "the final SELECT's filter did not reach the parquet scan through the overlay")
    assert(!p.contains("CartesianProduct"),
      "overlay composition degenerated to a cross product")
    // (a BroadcastNestedLoopJoin IS expected here: CREATE's duplicate-id
    // guard anti-joins a one-row literal frame, so Catalyst folds the key
    // to a constant and pushes `o_orderkey = <id>` into the base scan —
    // a 1×1 probe, the optimal shape)
  }

  test("script_schema keeps scan pushdown despite the field-pipeline guards") {
    // DEFAULT/VALUE/TYPE/ASSERT wrap the written columns in conditionals and
    // raise_error guards — none of that may block the final SELECT's key
    // filter from reaching the parquet scan
    val p = planOf("script_schema")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "field-pipeline enforcement blocked scan pushdown")
    assert(!p.contains("CartesianProduct"),
      "schema enforcement degenerated to a cross product")
  }

  test("events_window_sliding keeps map-side partial aggregation") {
    // the 4-fold hopping-window expansion happens map-side (explode of the
    // window assignment), then partial agg before the single shuffle
    val p = planOf("events_window_sliding")
    assert(p.contains("partial_"),
      s"no partial aggregation before the window-group shuffle:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"hopping window should shuffle once for the agg (+1 for sort), got $exchanges")
  }

  test("events_stream_join is an equi-join on user with a range residual") {
    val p = planOf("events_stream_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join lost its user_id equi-key:\n$p")
  }

  test("sink_partitioned prunes at the partition-directory level") {
    val p = planOf("sink_partitioned")
    assert(p.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[\\]".r.findFirstIn(p).isEmpty,
      s"event_type filter did not become a partition filter:\n$p")
  }

  test("bucket_join runs join AND aggregation with zero shuffle exchanges") {
    // at sf0.001 AQE would broadcast the small side, which hides the
    // co-location property this test pins; force the at-scale join shape
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("bucket_join")(spark, sf)
      df.collect() // AQE finalizes the plan at execution
      val p = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).length
      assert(exchanges == 0,
        s"bucketed co-located join still shuffles ($exchanges exchanges):\n$p")
      assert(p.contains("SortMergeJoin"), "expected a merge join over sorted buckets")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("gql_query inherits the same pushdown as native SurrealQL") {
    val p = planOf("gql_query")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "GraphQL-translated filter did not reach the scan")
    assert(p.contains("TakeOrderedAndProject"), "GraphQL order+limit did not fuse")
  }

  test("bare INSERT keeps the plain anti-join: no window in the final plan") {
    // the intra-batch duplicate probe proves key uniqueness up front, so
    // the shipped plan must not pay a key-partitioned window for it
    val df = graft.surql.SparkPlanner.script(spark, sf,
      """BEGIN;
         INSERT INTO orders (SELECT o_orderkey + 900000 AS o_orderkey, o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey < 10);
         SELECT o_orderkey FROM orders WHERE o_orderkey >= 900000 ORDER BY o_orderkey;
         COMMIT;""")
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("window"),
      s"bare INSERT final plan contains a window:\n${p.take(800)}")
    val srcN = Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") < 10).count()
    assert(df.count() == srcN && srcN > 0)
  }

  test("keyless INSERT generates LITERAL ids: no window, no nondeterministic expr") {
    // generated ids must be plan-stable (a rand()/uuid() id would mint a
    // different id on every action over the lazy overlay) and the
    // generated-key batch must stay window-free like the bare form
    val df = graft.surql.SparkPlanner.script(spark, sf,
      """BEGIN;
         INSERT INTO orders [{ o_custkey: 1, o_orderstatus: 'O', o_totalprice: 1.5 },
                             { o_custkey: 2, o_orderstatus: 'O', o_totalprice: 2.5 }];
         SELECT o_custkey, o_totalprice FROM orders
           WHERE o_totalprice < 3.0 AND o_orderkey != NONE ORDER BY o_custkey;
         COMMIT;""")
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("window"),
      s"keyless INSERT plan contains a window:\n${p.take(800)}")
    assert(!p.contains("uuid()") && !p.toLowerCase.contains("rand("),
      s"keyless INSERT id is nondeterministic in-plan:\n${p.take(800)}")
    assert(df.count() == 2)
  }

  test("DELETE edge purge is an anti-join, never a cartesian product") {
    graft.operators.GraphOps.extraEdgeDefs.put("plikes", ("orders", "orders"))
    graft.surql.SparkPlanner.extraRecordKeys.put("plikes", "id")
    import spark.implicits._
    val edges = Seq(("e1", 1L, 2L), ("e2", 2L, 3L), ("e3", 7L, 8L))
      .toDF("id", "in", "out")
    val df = Tables.withOverlay(Map("plikes" -> edges)) {
      graft.surql.SparkPlanner.script(spark, sf,
        """DELETE orders:2;
           SELECT id FROM plikes ORDER BY id;""")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"edge purge fell off the equi-join path:\n${p.take(800)}")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("e3"),
      "purge kept an edge touching the deleted record")
  }

  test("mixed imperative+declarative aggs plan as ONE aggregation pass") {
    // r16 split median/top/bottom into their own aggregation joined back on
    // the keys to keep codegen on the declarative side. r18 re-measured
    // (AggShape harness, sf0.1, local[32]) and REMOVED the split:
    //   split  fresh-plan/rep: 1.39-1.72 s   recollect 0.06-0.11 s
    //   single fresh-plan/rep: 1.00-1.20 s   recollect 0.06-0.07 s
    // The single ObjectHashAggregate pass is one scan + one shuffle (no
    // join); at 100 TB the split's SECOND scan of the fact table dwarfs any
    // interpreted-vs-codegen per-row delta, and TypedImperativeAggregate
    // still does map-side partials. These pins assert the one-pass shape:
    // exactly one aggregation subtree, no join, no second scan.
    for (q <- Seq("fn_top_bottom", "fn_agg_stats")) {
      val p = planOf(q)
      assert(p.contains("ObjectHashAggregate"),
        s"$q: imperative agg side missing (no ObjectHashAggregate)")
      assert(!p.contains("Join") && !p.contains("CartesianProduct"),
        s"$q: the removed median-split join is back:\n${p.take(600)}")
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 1, s"$q: expected ONE fact-table scan, saw $scans")
    }
  }
}
