package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Dialect-parity operators, r10 wave 21 (SURVEY.md §2.B): quantified
  * comparison subqueries and the NOT IN three-valued-logic edge —
  * the two classic subquery semantics traps, pinned as DATA.
  */
object CorpusOps35 {

  /** Quantified comparisons (`> ALL` / `> ANY` — SQL-92 8.7): Spark
    * has no quantified-subquery syntax, so the engine delivers the
    * semantics through the standard equivalences
    * `x > ALL(S) ⟺ x > max(S)` and `x > ANY(S) ⟺ x > min(S)`
    * (valid here: S is non-empty and null-free by construction) —
    * while the ORACLE runs DuckDB's REAL `> ALL` / `> ANY` syntax, so
    * the rewrite is value-proven, not assumed. Per nation: customers
    * out-balancing ALL suppliers vs ANY supplier.
    *
    * Scale: the per-nation supplier extrema collapse to a broadcast
    * dimension; one fact scan. */
  val qSubqueryQuantified: Q = (s, dir) => {
    val sup = Tables(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(max(col("s_acctbal")).as("mx"), min(col("s_acctbal")).as("mn"))
    Tables(s, dir, "customer")
      .join(broadcast(sup), col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(when(col("c_acctbal") > col("mx"), 1L).otherwise(0L))
          .as("beats_all"),
        sum(when(col("c_acctbal") > col("mn"), 1L).otherwise(0L))
          .as("beats_any"))
      .orderBy(col("c_nationkey"))
  }

  /** The NOT IN null trap (three-valued logic): a NULL in the
    * subquery list makes `x NOT IN (...)` UNKNOWN for every
    * unmatched x — so the raw count is ZERO, the null-stripped count
    * is the real complement, and NOT EXISTS (null-safe by
    * construction) agrees with the stripped form. One row, three
    * counts — the regression data that catches an engine silently
    * compiling NOT IN to a plain anti join.
    *
    * Scale: both anti joins build on the broadcastable customer side. */
  val qSubqueryNotInNull: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders_nin")
    Tables(s, dir, "customer").createOrReplaceTempView("v_customer_nin")
    s.sql("""
      WITH list AS (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                                ELSE c_custkey END AS k
                    FROM v_customer_nin)
      SELECT
        (SELECT count(*) FROM v_orders_nin
         WHERE o_custkey NOT IN (SELECT k FROM list)) AS cnt_raw,
        (SELECT count(*) FROM v_orders_nin
         WHERE o_custkey NOT IN (SELECT k FROM list WHERE k IS NOT NULL))
          AS cnt_stripped,
        (SELECT count(*) FROM v_orders_nin o
         WHERE NOT EXISTS (SELECT 1 FROM list WHERE list.k = o.o_custkey))
          AS cnt_not_exists""")
  }

  val queries: Map[String, Q] = Map(
    "q_subquery_quantified" -> qSubqueryQuantified,
    "q_subquery_not_in_null" -> qSubqueryNotInNull)

  val oracle: Map[String, String] = Map(
    "q_subquery_quantified" -> """
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        CAST(sum(CASE WHEN c_acctbal > ALL
          (SELECT s_acctbal FROM supplier
           WHERE s_nationkey = c.c_nationkey) THEN 1 ELSE 0 END)
          AS BIGINT) AS beats_all,
        CAST(sum(CASE WHEN c_acctbal > ANY
          (SELECT s_acctbal FROM supplier
           WHERE s_nationkey = c.c_nationkey) THEN 1 ELSE 0 END)
          AS BIGINT) AS beats_any
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM supplier
                    WHERE s_nationkey = c.c_nationkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_subquery_not_in_null" -> """
      WITH list AS (SELECT CASE WHEN c_custkey % 100 = 0 THEN NULL
                                ELSE c_custkey END AS k
                    FROM customer)
      SELECT
        (SELECT count(*) FROM orders
         WHERE o_custkey NOT IN (SELECT k FROM list)) AS cnt_raw,
        (SELECT count(*) FROM orders
         WHERE o_custkey NOT IN (SELECT k FROM list WHERE k IS NOT NULL))
          AS cnt_stripped,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM list WHERE list.k = o.o_custkey))
          AS cnt_not_exists""")
}
