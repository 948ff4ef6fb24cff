package graft.functions

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Scalar-function surface (surrealdb: fnc/mod.rs:148-660 dispatch —
  * string::*, math::*, time::*, array::*, type::* namespaces), exercised as
  * whole-column queries so every function stays inside whole-stage codegen
  * (SURVEY §2.4 mapping: builtins over UDFs, UDFs only for gaps).
  *
  * Determinism notes for oracle parity: only IEEE-correctly-rounded math
  * (sqrt, abs, round, floor/ceil) appears in hash-compared outputs; libm-
  * dependent fns (ln/exp) are avoided in oracle-checked queries because the
  * JVM and DuckDB may differ in the last ulp. */
object ScalarQueries {

  /** string::* — lowercase/uppercase/len/slice/replace/trim/reverse/concat,
    * starts_with/ends_with, distance::levenshtein (fnc/mod.rs:369-431). */
  val fnString = Q("fn_string",
    """SELECT p_partkey,
              lower(p_name) AS lo, upper(p_brand) AS up,
              CAST(length(p_name) AS BIGINT) AS len,
              substring(p_type, 1, 5) AS head,
              replace(p_type, ' ', '_') AS repl,
              trim(p_name) AS trimmed,
              reverse(p_brand) AS rev,
              p_brand || '/' || p_type AS joined,
              CAST(levenshtein(p_brand, 'Brand#13') AS BIGINT) AS lev,
              starts_with(p_type, 'STANDARD') AS sw,
              CAST(strpos(p_name, 'o') AS BIGINT) AS pos
       FROM part ORDER BY p_partkey""") {
    (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"), upper(col("p_brand")).as("up"),
        length(col("p_name")).cast("bigint").as("len"),
        substring(col("p_type"), 1, 5).as("head"),
        regexp_replace(col("p_type"), " ", "_").as("repl"),
        trim(col("p_name")).as("trimmed"),
        reverse(col("p_brand")).as("rev"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("joined"),
        levenshtein(col("p_brand"), lit("Brand#13")).cast("bigint").as("lev"),
        col("p_type").startsWith("STANDARD").as("sw"),
        instr(col("p_name"), "o").cast("bigint").as("pos"))
        .orderBy("p_partkey")
  }

  /** math::* — abs/ceil/floor/round/sqrt/sign/clamp(greatest,least)/pow
    * (fnc/mod.rs:257-298). x*x instead of pow (exact); sqrt is IEEE-exact. */
  val fnMath = Q("fn_math",
    """SELECT c_custkey,
              abs(c_acctbal) AS ab,
              CAST(ceil(c_acctbal) AS BIGINT) AS ce,
              CAST(floor(c_acctbal) AS BIGINT) AS fl,
              round(c_acctbal, 2) AS rnd,
              sqrt(abs(c_acctbal)) AS sq,
              CAST(CASE WHEN signbit(c_acctbal) THEN -1.0 ELSE 1.0 END AS DOUBLE) AS sg,
              greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS hi,
              least(c_acctbal, CAST(1000.0 AS DOUBLE)) AS lo,
              c_acctbal * c_acctbal AS sqr,
              CAST(c_custkey % 7 AS BIGINT) AS md
       FROM customer ORDER BY c_custkey""") {
    (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("ab"),
        ceil(col("c_acctbal")).cast("bigint").as("ce"),
        floor(col("c_acctbal")).cast("bigint").as("fl"),
        round(col("c_acctbal"), 2).as("rnd"),
        sqrt(abs(col("c_acctbal"))).as("sq"),
        when(col("c_acctbal") < 0, -1.0).otherwise(1.0).as("sg"),
        greatest(col("c_acctbal"), lit(0.0)).as("hi"),
        least(col("c_acctbal"), lit(1000.0)).as("lo"),
        (col("c_acctbal") * col("c_acctbal")).as("sqr"),
        (col("c_custkey") % 7).cast("bigint").as("md"))
        .orderBy("c_custkey")
  }

  /** time::* — year/month/day/quarter extraction, time::group (date_trunc),
    * time::unix (fnc/mod.rs:433-469). */
  val fnTime = Q("fn_time",
    """SELECT o_orderkey,
              CAST(year(o_orderdate) AS BIGINT) AS y,
              CAST(month(o_orderdate) AS BIGINT) AS m,
              CAST(day(o_orderdate) AS BIGINT) AS dd,
              CAST(quarter(o_orderdate) AS BIGINT) AS q,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
              CAST(epoch(o_orderdate) AS BIGINT) AS unix_s
       FROM orders ORDER BY o_orderkey""") {
    (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("y"),
        month(col("o_orderdate")).cast("bigint").as("m"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("dd"),
        quarter(col("o_orderdate")).cast("bigint").as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
        unix_timestamp(col("o_orderdate")).cast("bigint").as("unix_s"))
        .orderBy("o_orderkey")
  }

  /** array::* — len/sort/distinct/contains/at/join/slice over a per-row array
    * (fnc/mod.rs:160-208). Built via split; all higher-order ops stay in
    * codegen (no UDFs). */
  val fnArray = Q("fn_array",
    """SELECT p_partkey,
              CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n,
              array_to_string(list_sort(string_split(p_type, ' ')), '|') AS sorted,
              array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS uniq,
              list_contains(string_split(p_type, ' '), 'BRUSHED') AS has,
              list_sort(string_split(p_type, ' '))[1] AS first_w,
              array_to_string(list_sort(string_split(p_type, ' ')), '-') AS joined,
              array_to_string(list_sort(string_split(p_type, ' '))[1:2], '|') AS sliced
       FROM part ORDER BY p_partkey""") {
    (s, d) =>
      // Array outputs serialized to '|'-joined strings for the oracle compare
      // (driver comparator cannot hash list columns); the array ops themselves
      // (sort/distinct/slice) still run as codegen'd array expressions.
      val arr = split(col("p_type"), " ")
      Tables.part(s, d).select(
        col("p_partkey"),
        size(arr).cast("bigint").as("n"),
        concat_ws("|", sort_array(arr)).as("sorted"),
        concat_ws("|", sort_array(array_distinct(split(col("p_name"), " ")))).as("uniq"),
        array_contains(arr, "BRUSHED").as("has"),
        element_at(sort_array(arr), 1).as("first_w"),
        concat_ws("-", sort_array(arr)).as("joined"),
        concat_ws("|", slice(sort_array(arr), 1, 2)).as("sliced"))
        .orderBy("p_partkey")
  }

  /** type::* casts (fnc/mod.rs:471-515): string→int parse, int→string,
    * TRY_CAST of non-numeric → NULL, bool from comparison. Truncating
    * double→int casts are avoided (Spark truncates, DuckDB rounds) — the
    * explicit floor/ceil form is used instead, matching SurrealQL's
    * documented cast behavior. */
  val fnCast = Q("fn_cast",
    """SELECT c_custkey,
              CAST(substring(c_name, 10, 9) AS BIGINT) AS parsed,
              CAST(c_custkey AS VARCHAR) AS as_str,
              TRY_CAST(c_mktsegment AS BIGINT) AS bad,
              CAST(c_acctbal AS VARCHAR) IS NOT NULL AS ok,
              CAST(floor(c_acctbal) AS BIGINT) AS fl
       FROM customer ORDER BY c_custkey""") {
    (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        substring(col("c_name"), 10, 9).cast("bigint").as("parsed"),
        col("c_custkey").cast("string").as("as_str"),
        expr("try_cast(c_mktsegment AS bigint)").as("bad"),
        col("c_acctbal").cast("string").isNotNull.as("ok"),
        floor(col("c_acctbal")).cast("bigint").as("fl"))
        .orderBy("c_custkey")
  }

  /** Aggregate stats — math::stddev/variance/median (aggregates/math.rs),
    * exact & order-independent (see [[Exact]]); median over per-group values
    * (l_quantity is integral-valued so interpolation is exact). */
  val fnAggStats = Q("fn_agg_stats",
    s"""SELECT l_returnflag,
               ${Exact.sqlStddev("l_quantity")} AS sd,
               ${Exact.sqlVarSamp("l_quantity")} AS vr,
               median(l_quantity) AS med,
               ${Exact.sqlAvg("l_quantity")} AS mean,
               MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") {
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          Exact.dstddev(col("l_quantity")).as("sd"),
          Exact.dvarSamp(col("l_quantity")).as("vr"),
          median(col("l_quantity")).as("med"),
          Exact.davg(col("l_quantity")).as("mean"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
        .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(fnString, fnMath, fnTime, fnArray, fnCast, fnAggStats)
}
