package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge
import graft.Tables
import graft.plans.{GroupedTopKNode, GroupedTopKStrategy}

/** Queries backed by the engine's custom plan nodes (SURVEY.md §2.F /
  * §7.3 tier (c): LogicalPlan + SparkStrategy + SparkPlan). */
object PlansOps {

  /** Top-3 line items per supplier via the GroupedTopK operator — same
    * semantics as q_window_topk_group (the oracle is that formulation)
    * but executed with bounded per-partition heaps + candidate-only
    * shuffle instead of a full shuffle + sort. */
  val qTopKGrouped: Q = (s, dir) => {
    if (!s.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val li = Tables(s, dir, "lineitem")
    val child = li.queryExecution.analyzed
    def attr(n: String) = child.output.find(_.name == n).get
    val node = GroupedTopKNode(
      grouping = Seq(attr("l_suppkey")),
      ordering = Seq(
        SortOrder(attr("l_extendedprice"), Descending),
        SortOrder(attr("l_orderkey"), Ascending),
        SortOrder(attr("l_linenumber"), Ascending)),
      k = 3,
      child = child)
    PlanBridge.ofRows(s, node)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  /** Results-cache hit path as a declared query (VERDICT r7 item 3):
    * the same aggregate runs twice through
    * [[graft.plans.ResultsCache]]; the returned frame is the SECOND
    * run, served from the materialized parquet (require()-pinned), so
    * the driver's oracle compare covers the cache-serve path — values
    * must survive the round trip bit-exact — not just the spec. */
  val qResultsCacheHit: Q = (s, dir) => {
    import graft.plans.ResultsCache
    def q = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Tables.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    ResultsCache.run(q) // fill (or hit, if a prior run already filled)
    val served = ResultsCache.run(q)
    require(ResultsCache.lastHit, "results cache must serve the rerun")
    served.orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, Q] = Map(
    "q_topk_grouped_custom" -> qTopKGrouped,
    "q_results_cache_hit" -> qResultsCacheHit)

  val oracle: Map[String, String] = Map(
    "q_topk_grouped_custom" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
      FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
              row_number() OVER (PARTITION BY l_suppkey
                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
                AS rn
            FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""",
    "q_results_cache_hit" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
}
