package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations (SURVEY.md §2.G): UNION ALL / UNION DISTINCT /
  * INTERSECT [ALL] / EXCEPT [ALL].
  *
  * Hive lineage: UnionOperator [hive: ql/src/java/org/apache/hadoop/hive/
  * ql/exec/UnionOperator.java]; INTERSECT/EXCEPT rewritten to group-by
  * counts by Calcite [hive: ql/.../parse/CalcitePlanner.java]. Spark has
  * them as first-class Dataset combinators lowering to UnionExec and
  * aggregate-based rewrites — same plan shape Hive synthesizes by hand.
  */
object SetOps {

  private def cust(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_nationkey").cast("int").as("nk"))

  private def supp(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))

  val qUnionAll: Q = (s, dir) =>
    cust(s, dir).union(supp(s, dir))
      .groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("nk"))

  val qUnionDistinct: Q = (s, dir) =>
    cust(s, dir).union(supp(s, dir)).distinct().orderBy(col("nk"))

  val qIntersect: Q = (s, dir) =>
    cust(s, dir).intersect(supp(s, dir)).orderBy(col("nk"))

  val qIntersectAll: Q = (s, dir) =>
    cust(s, dir).intersectAll(supp(s, dir))
      .groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("nk"))

  // EXCEPT needs asymmetric sets to be non-vacuous at EVERY fixture sf:
  // customers with a pending order but no finalized order (5 / 67 / 491
  // rows at sf0.001 / 0.01 / 0.1 — verified against the fixtures).
  private def statusCust(s: org.apache.spark.sql.SparkSession, dir: String,
      status: String) =
    Tables(s, dir, "orders").filter(col("o_orderstatus") === status)
      .select(col("o_custkey").as("k")).distinct()

  val qExcept: Q = (s, dir) =>
    statusCust(s, dir, "P").except(statusCust(s, dir, "F")).orderBy(col("k"))

  /** EXCEPT ALL over genuine multisets (order rows repeat custkeys). */
  val qExceptAll: Q = (s, dir) => {
    val a = Tables(s, dir, "orders")
      .filter(col("o_totalprice").between(100000, 300000))
      .select(col("o_custkey").as("k"))
    val b = Tables(s, dir, "orders").filter(col("o_totalprice") > 250000)
      .select(col("o_custkey").as("k"))
    a.exceptAll(b)
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("k"))
  }

  val queries: Map[String, Q] = Map(
    "q_union_all" -> qUnionAll,
    "q_union_distinct" -> qUnionDistinct,
    "q_intersect" -> qIntersect,
    "q_intersect_all" -> qIntersectAll,
    "q_except" -> qExcept,
    "q_except_all" -> qExceptAll)

  private val custSql =
    "SELECT CAST(c_nationkey AS INT) AS nk FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val suppSql =
    "SELECT CAST(s_nationkey AS INT) AS nk FROM supplier"

  val oracle: Map[String, String] = Map(
    "q_union_all" -> s"""
      SELECT nk, count(*) AS cnt FROM ($custSql UNION ALL $suppSql)
      GROUP BY nk ORDER BY nk""",
    "q_union_distinct" -> s"SELECT nk FROM ($custSql UNION $suppSql) ORDER BY nk",
    "q_intersect" -> s"SELECT nk FROM ($custSql INTERSECT $suppSql) ORDER BY nk",
    "q_intersect_all" -> s"""
      SELECT nk, count(*) AS cnt FROM ($custSql INTERSECT ALL $suppSql)
      GROUP BY nk ORDER BY nk""",
    "q_except" -> """
      SELECT k FROM (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
        EXCEPT
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      ORDER BY k""",
    "q_except_all" -> """
      SELECT k, count(*) AS cnt FROM (
        SELECT o_custkey AS k FROM orders
        WHERE o_totalprice BETWEEN 100000 AND 300000
        EXCEPT ALL
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000)
      GROUP BY k ORDER BY k""")
}
