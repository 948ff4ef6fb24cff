package graft.operators

import graft.{Q, Tables}
import graft.functions.Exact
import graft.surql.SparkPlanner

/** The engine path: these queries are REAL SurrealQL text, parsed by
  * graft.surql.Parser and lowered to DataFrame plans by [[SparkPlanner]] —
  * no hand-built closures. They carry the same names and DuckDB oracles as
  * the round-1 catalog entries they replace, so the correctness gate now
  * verifies parse → plan → execute end-to-end (SURVEY §7 steps 2-3).
  *
  * Scale shape is unchanged: the lowering lands on exactly the plans the
  * hand-built versions produced (pushed-down scans, TakeOrderedAndProject,
  * semi/anti joins), which Catalyst then owns. */
object SurqlQueries {

  private def sq(name: String, oracle: String)(surql: String): Q =
    Q(name, oracle) { (s, d) => SparkPlanner.query(s, d, surql) }

  val tableScan = sq("table_scan",
    "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey")(
    "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey")

  val pointLookup = sq("point_lookup",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 1")(
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 1")

  val rangeScan = sq("range_scan",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey >= 100 AND o_orderkey < 200 ORDER BY o_orderkey""")(
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200 ORDER BY o_orderkey")

  val countAll = sq("count_all",
    "SELECT COUNT(*) AS cnt FROM lineitem")(
    "SELECT count() AS cnt FROM lineitem GROUP ALL")

  val exprScalar = sq("expr_scalar",
    """SELECT CAST(3 AS BIGINT) AS a, 'sur' || 'real' AS s,
              CAST(2.0 AS DOUBLE) * CAST(3.5 AS DOUBLE) AS d, TRUE AS b""")(
    "RETURN { a: 3, s: 'sur' + 'real', d: 2.0 * 3.5, b: true }")

  val filterWhere = sq("filter_where",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
       WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_discount <= 0.07
         AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""")(
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
       WHERE l_quantity > 45 AND l_discount >= 0.05 AND l_discount <= 0.07
         AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""")

  val projectExpr = sq("project_expr",
    """SELECT o_orderkey,
              o_totalprice * CAST(0.9 AS DOUBLE) AS discounted,
              UPPER(o_orderpriority) AS prio,
              o_orderstatus || '-' || o_orderpriority AS tag
       FROM orders ORDER BY o_orderkey""")(
    """SELECT o_orderkey,
              o_totalprice * 0.9 AS discounted,
              string::uppercase(o_orderpriority) AS prio,
              string::concat(o_orderstatus, '-', o_orderpriority) AS tag
       FROM orders ORDER BY o_orderkey""")

  val projectValue = sq("project_value",
    "SELECT c_name AS value FROM customer ORDER BY value")(
    "SELECT c_name AS value FROM customer ORDER BY value")

  val unionOrFilter = sq("union_or_filter",
    """SELECT p_partkey, p_brand, p_size FROM part
       WHERE p_size = 1 OR p_brand = 'Brand#33' ORDER BY p_partkey""")(
    """SELECT p_partkey, p_brand, p_size FROM part
       WHERE p_size = 1 OR p_brand = 'Brand#33' ORDER BY p_partkey""")

  val splitExplode = sq("split_explode",
    """SELECT p_partkey, UNNEST(string_split(p_type, ' ')) AS word
       FROM part ORDER BY p_partkey, word""")(
    """SELECT p_partkey, string::split(p_type, ' ') AS word
       FROM part SPLIT word ORDER BY p_partkey, word""")

  val sortMulti = sq("sort_multi",
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
       ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC LIMIT 100""")(
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
       ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC LIMIT 100""")

  val topK = sq("topk",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""")(
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""")

  val limitStart = sq("limit_start",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_orderkey LIMIT 20 OFFSET 10""")(
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 START 10")

  val onlyOne = sq("only_one",
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey = 7")(
    "SELECT c_custkey, c_name FROM ONLY customer WHERE c_custkey = 7")

  val aggGroup = sq("agg_group",
    s"""SELECT l_returnflag, l_linestatus,
               ${Exact.sqlSum("l_quantity")} AS sum_qty,
               ${Exact.sqlSum("l_extendedprice")} AS sum_base,
               ${Exact.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc,
               ${Exact.sqlAvg("l_quantity")} AS avg_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")(
    """SELECT l_returnflag, l_linestatus,
              math::sum(l_quantity) AS sum_qty,
              math::sum(l_extendedprice) AS sum_base,
              math::sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc,
              math::mean(l_quantity) AS avg_qty,
              count() AS cnt
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""")

  val aggGlobal = sq("agg_global",
    s"""SELECT COUNT(*) AS cnt,
               ${Exact.sqlSum("l_quantity")} AS sum_qty,
               ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
               CAST(MIN(l_shipdate) AS DATE) AS min_ship,
               CAST(MAX(l_shipdate) AS DATE) AS max_ship
        FROM lineitem""")(
    """SELECT count() AS cnt,
              math::sum(l_quantity) AS sum_qty,
              math::mean(l_extendedprice) AS avg_price,
              time::min(l_shipdate) AS min_ship,
              time::max(l_shipdate) AS max_ship
       FROM lineitem GROUP ALL""")

  val distinctScan = sq("distinct_scan",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
       ORDER BY l_returnflag, l_linestatus""")(
    """SELECT l_returnflag, l_linestatus FROM lineitem
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""")

  val subqueryIn = sq("subquery_in",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
       ORDER BY c_custkey""")(
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey INSIDE (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
       ORDER BY c_custkey""")

  val subqueryNotIn = sq("subquery_not_in",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
       ORDER BY c_custkey""")(
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT INSIDE (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
       ORDER BY c_custkey""")

  val fnMath = sq("fn_math",
    """SELECT c_custkey,
              abs(c_acctbal) AS ab,
              CAST(ceil(c_acctbal) AS BIGINT) AS ce,
              CAST(floor(c_acctbal) AS BIGINT) AS fl,
              round(c_acctbal, 2) AS rnd,
              sqrt(abs(c_acctbal)) AS sq,
              CAST(sign(c_acctbal) AS DOUBLE) AS sg,
              greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS hi,
              least(c_acctbal, CAST(1000.0 AS DOUBLE)) AS lo,
              c_acctbal * c_acctbal AS sqr,
              CAST(c_custkey % 7 AS BIGINT) AS md
       FROM customer ORDER BY c_custkey""")(
    """SELECT c_custkey,
              math::abs(c_acctbal) AS ab,
              math::ceil(c_acctbal) AS ce,
              math::floor(c_acctbal) AS fl,
              math::fixed(c_acctbal, 2) AS rnd,
              math::sqrt(math::abs(c_acctbal)) AS sq,
              math::sign(c_acctbal) * 1.0 AS sg,
              math::max([c_acctbal, 0.0]) AS hi,
              math::min([c_acctbal, 1000.0]) AS lo,
              c_acctbal * c_acctbal AS sqr,
              c_custkey % 7 AS md
       FROM customer ORDER BY c_custkey""")

  val fnTime = sq("fn_time",
    """SELECT o_orderkey,
              CAST(year(o_orderdate) AS BIGINT) AS y,
              CAST(month(o_orderdate) AS BIGINT) AS m,
              CAST(day(o_orderdate) AS BIGINT) AS dd,
              CAST(quarter(o_orderdate) AS BIGINT) AS q,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              CAST(epoch(o_orderdate) AS BIGINT) AS unix_s
       FROM orders ORDER BY o_orderkey""")(
    """SELECT o_orderkey,
              time::year(o_orderdate) AS y,
              time::month(o_orderdate) AS m,
              time::day(o_orderdate) AS dd,
              <int>((time::month(o_orderdate) + 2) / 3) AS q,
              time::group(o_orderdate, 'month') AS mon,
              time::unix(o_orderdate) AS unix_s
       FROM orders ORDER BY o_orderkey""")

  /** Names the planner path overrides — the hand-built closures with these
    * names are replaced in SparkEntry's registry. */
  val all: Seq[Q] = Seq(
    tableScan, pointLookup, rangeScan, countAll, exprScalar, filterWhere,
    projectExpr, projectValue, unionOrFilter, splitExplode, sortMulti, topK,
    limitStart, onlyOne, aggGroup, aggGlobal, distinctScan, subqueryIn,
    subqueryNotIn, fnMath, fnTime)
}
