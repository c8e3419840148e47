package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Scan / projection / filter / predicate / subquery / sampling / limit
  * surface (SURVEY.md §2.A, §2.B, §2.F).
  *
  * Hive lineage: TableScanOperator + SelectOperator + FilterOperator
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/TableScanOperator.java,
  * SelectOperator.java, FilterOperator.java], subquery decorrelation via
  * Calcite [hive: ql/.../parse/CalcitePlanner.java], TABLESAMPLE
  * [hive: ql/.../parse/SplitSample.java].
  *
  * Scale design: filters and projections here are plain Catalyst
  * expressions, so they reach the parquet reader as PushedFilters +
  * ReadSchema pruning — at 100 TB the scan reads only the referenced
  * columns and row groups, verified in RelationalSpec via the explain text.
  */
object Relational {

  /** Projection + filter that must push down to the parquet scan. */
  val qScanFilter: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate").between(
        ts("1997-01-01 00:00:00"), ts("1997-03-31 00:00:00")) &&
        col("l_extendedprice") > 90000)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Predicate zoo: IN-list, LIKE, RLIKE, BETWEEN, boolean composition. */
  val qPredicates: Q = (s, dir) => {
    Tables(s, dir, "part")
      .filter(col("p_size").isin(5, 10, 15, 20) &&
        col("p_name").like("%red%") &&
        col("p_type").rlike("^(ECONOMY|PROMO)") &&
        col("p_retailprice").between(100, 1500))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  /** Null-safe equality `<=>` (Hive GenericUDFOPEqualNS) over derived
    * nullable columns; DuckDB spells it IS NOT DISTINCT FROM. */
  val qNullSafeEq: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .select(nullif(col("l_returnflag"), lit("N")).as("a"),
        nullif(col("l_linestatus"), lit("O")).as("b"))
      .select(col("a") <=> col("b") as "nse")
      .groupBy(col("nse"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("nse"))
  }

  /** Uncorrelated IN subquery (SQL front-end → RewritePredicateSubquery). */
  val qSubqueryIn: Q = (s, dir) => {
    Tables.registerViews(s, dir, "orders", "customer")
    s.sql("""
      SELECT o_orderstatus, count(1) AS cnt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'AUTOMOBILE')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** Correlated EXISTS subquery with an inner predicate. */
  val qSubqueryExists: Q = (s, dir) => {
    Tables.registerViews(s, dir, "customer", "orders")
    s.sql("""
      SELECT c_mktsegment, count(1) AS cnt
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** Scalar subquery: customers above the global mean balance (mean
    * computed order-independently via exact decimal sum / count). */
  val qSubqueryScalar: Q = (s, dir) => {
    Tables.registerViews(s, dir, "customer")
    s.sql("""
      SELECT c_nationkey, count(1) AS cnt
      FROM customer
      WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                / count(1) FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  /** Deterministic bucket-sample analogue of TABLESAMPLE(BUCKET 1 OUT OF 7):
    * key-mod filter, so both engines pick the identical subset. */
  val qSampleBucket: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(7)) === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** ORDER BY + LIMIT + OFFSET (OFFSET is Hive 4 / Spark 3.4+). */
  val qLimitOffset: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .orderBy(col("o_orderkey"))
      .offset(100)
      .limit(50)
      .select(col("o_orderkey"), col("o_orderstatus"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
  }

  /** DISTRIBUTE BY + SORT BY (Hive CLUSTER BY): repartition on the key and
    * sort within partitions — the shuffle-free preamble to SMB-style work.
    * A final global ORDER BY makes the declared result deterministic; the
    * partition-local layout itself is asserted in RelationalSpec. */
  val qClusterBy: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .repartition(col("o_orderstatus"))
      .sortWithinPartitions(col("o_orderstatus"), col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** Top-k pushdown: ORDER BY ... LIMIT lowers to TakeOrderedAndProject
    * (no global sort) — Hive's ReduceSink top-N heap equivalent. */
  val qTopK: Q = (s, dir) => {
    Tables(s, dir, "customer")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(25)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  /** Recursive CTE (Spark 4 WITH RECURSIVE): a month ladder spanning the
    * order-date range, LEFT-joined back to orders — the revenue-calendar
    * idiom where empty months must still appear. Recursion depth ~80,
    * under Spark's default 100 recursion-level limit; DuckDB runs the
    * identical SQL shape. */
  val qRecursiveCte: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      WITH RECURSIVE months(m) AS (
        SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < date_trunc('month', (SELECT max(o_orderdate) FROM orders))
      )
      SELECT date_format(m, 'yyyy-MM') AS month,
             count(o_orderkey) AS n_orders
      FROM months LEFT JOIN orders
        ON date_trunc('month', o_orderdate) = m
      GROUP BY m ORDER BY month""")
  }

  /** PIVOT: long -> wide reshaping with an EXPLICIT value list (the
    * open-ended form needs a values scan first; pinning the list keeps
    * the plan one pass and the output schema static — the only shape
    * that makes sense at 100 TB). Counts + exact decimal sums per cell. */
  val qPivot: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))
  }

  /** UNPIVOT (melt): wide -> long via the native unpivot operator
    * (Hive users spell this stack(); q_stack covers that form), then
    * an exact-decimal rollup per measure. */
  val qUnpivot: Q = (s, dir) => {
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "val")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(dsum(col("val")).as("sum_val"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** Correlated LATERAL derived table (SQL:1999 LATERAL, Spark 3.2+):
    * top-2 customers per nation via a correlated ordered-limit
    * subquery — the "for each row, run this parameterized query"
    * surface. Catalyst decorrelates it into a ranked join (same
    * machinery the QUALIFY/top-k rewrite rides), so it scales as a
    * grouped top-k, not a per-row re-execution. */
  val qLateralSubquery: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("lat_nation")
    Tables(s, dir, "customer").createOrReplaceTempView("lat_customer")
    s.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM lat_nation n,
      LATERAL (
        SELECT c_name, c_acctbal FROM lat_customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
  }

  /** Explicit NULLS FIRST / NULLS LAST ordering — a classic migration
    * gotcha (Spark defaults to NULLS FIRST ascending, DuckDB to NULLS
    * LAST); pinning the placement explicitly makes the same query
    * hash-identical on both engines. Nulls are injected via nullif()
    * since the fixtures are null-free. */
  val qOrderNulls: Q = (s, dir) => {
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("st"))
      .orderBy(col("st").asc_nulls_first, col("o_orderkey").desc)
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    "q_lateral_subquery" -> qLateralSubquery,
    "q_order_nulls" -> qOrderNulls,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_recursive_cte" -> qRecursiveCte,
    "q_scan_filter" -> qScanFilter,
    "q_predicates" -> qPredicates,
    "q_null_safe_eq" -> qNullSafeEq,
    "q_subquery_in" -> qSubqueryIn,
    "q_subquery_exists" -> qSubqueryExists,
    "q_subquery_scalar" -> qSubqueryScalar,
    "q_sample_bucket" -> qSampleBucket,
    "q_limit_offset" -> qLimitOffset,
    "q_cluster_by" -> qClusterBy,
    "q_topk" -> qTopK)

  val oracle: Map[String, String] = Map(
    "q_lateral_subquery" -> """
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n,
      LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",
    "q_order_nulls" -> """
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
      FROM orders WHERE o_orderkey < 200
      ORDER BY st ASC NULLS FIRST, o_orderkey DESC LIMIT 50""",
    "q_pivot" -> """
      SELECT o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_unpivot" -> """
      SELECT l_returnflag, metric,
        CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS sum_val,
        count(*) AS cnt
      FROM (
        SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric""",
    "q_recursive_cte" -> """
      WITH RECURSIVE months(m) AS (
        SELECT date_trunc('month', (SELECT min(o_orderdate) FROM orders))
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < date_trunc('month', (SELECT max(o_orderdate) FROM orders))
      )
      SELECT strftime(m, '%Y-%m') AS month,
             count(o_orderkey) AS n_orders
      FROM months LEFT JOIN orders
        ON date_trunc('month', o_orderdate) = m
      GROUP BY m ORDER BY month""",
    "q_scan_filter" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             strftime(l_shipdate, '%Y-%m-%d') AS ship
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                           AND TIMESTAMP '1997-03-31 00:00:00'
        AND l_extendedprice > 90000
      ORDER BY l_orderkey, l_linenumber""",
    "q_predicates" -> """
      SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      FROM part
      WHERE p_size IN (5, 10, 15, 20)
        AND p_name LIKE '%red%'
        AND regexp_matches(p_type, '^(ECONOMY|PROMO)')
        AND p_retailprice BETWEEN 100 AND 1500
      ORDER BY p_partkey""",
    "q_null_safe_eq" -> """
      SELECT (nullif(l_returnflag, 'N') IS NOT DISTINCT FROM
              nullif(l_linestatus, 'O')) AS nse, count(*) AS cnt
      FROM lineitem GROUP BY nse ORDER BY nse""",
    "q_subquery_in" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'AUTOMOBILE')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_subquery_exists" -> """
      SELECT c_mktsegment, count(*) AS cnt
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_subquery_scalar" -> """
      SELECT c_nationkey, count(*) AS cnt
      FROM customer
      WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                / count(*) FROM customer)
      GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_sample_bucket" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM lineitem WHERE l_orderkey % 7 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_limit_offset" -> """
      SELECT o_orderkey, o_orderstatus,
             strftime(o_orderdate, '%Y-%m-%d') AS odate
      FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "q_cluster_by" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_topk" -> """
      SELECT c_custkey, c_name, c_acctbal
      FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 25""")
}
