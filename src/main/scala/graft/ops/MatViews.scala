package graft.ops

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.MaterializedViewRewrite

/** Materialized-view maintenance + automatic rewrite (SURVEY.md §1.1
  * "Materialized view", the last query-capability non-goal converted):
  * build a partial-aggregate MV over the lineitem fact, register it with
  * [[graft.plans.MaterializedViewRewrite]], and run a coarser aggregate
  * over the FACT — the optimizer transparently answers it from the MV
  * (PlanSpec pins that the executed plan scans the MV, not the fact).
  *
  * The driver oracle computes the same aggregate directly from the fact
  * in DuckDB, proving the rewrite is value-preserving end to end.
  */
object MatViews {

  /** sf-dir -> materialized MV path. One temp copy + one shutdown hook
    * per fact table for the life of the JVM — NOT one per invocation
    * (a long driver run calls each query builder many times). */
  private val mvCache = new ConcurrentHashMap[String, String]()

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(d)
    }))
    new java.io.File(d, "table").getAbsolutePath
  }

  /** Coarser-group aggregate over the fact, answered from the MV by the
    * optimizer rule. All partials use the exact-decimal discipline, so
    * the rollup is bit-identical to the direct computation (which is what
    * the DuckDB oracle runs). */
  val qMvRewrite: Q = (s, dir) => {
    val factPath = s"$dir/lineitem.parquet"
    val fact = s.read.parquet(factPath)
    // the MV: finer grouping (returnflag x linestatus), rollup-able
    // partials — exact-decimal sum, count, exact-decimal max
    val definition = fact
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).as("mv_sum_qty"),
        count(lit(1)).as("mv_cnt"),
        max(dec(col("l_extendedprice"))).as("mv_max_price"))
    val mvPath = mvCache.computeIfAbsent(dir, _ => {
      val p = tmp("graft_mv")
      definition.write.mode("overwrite").parquet(p)
      p
    })
    // registration survives a test-side clear(): re-arm if absent, from
    // the already-materialized table (no re-write, no new hook)
    if (!MaterializedViewRewrite.isRegistered(factPath))
      MaterializedViewRewrite.register(factPath, definition,
        s.read.parquet(mvPath))
    // arm the rule only when the session was NOT built with
    // GraftExtensions (which injects it) — never apply it twice
    val injected = s.sessionState.optimizer
      .extendedOperatorOptimizationRules.contains(MaterializedViewRewrite)
    if (!injected &&
        !s.experimental.extraOptimizations.contains(MaterializedViewRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ MaterializedViewRewrite
    // the user query: written against the FACT, answered from the MV
    fact.groupBy(col("l_returnflag"))
      .agg(sum(dec(col("l_quantity"))).as("sq"),
        count(lit(1)).as("cnt"),
        max(dec(col("l_extendedprice"))).as("mp"))
      .select(col("l_returnflag"),
        col("sq").cast("double").as("sum_qty"),
        col("cnt"),
        col("mp").cast("double").as("max_price"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "q_mv_rewrite" -> qMvRewrite)

  val oracle: Map[String, String] = Map(
    "q_mv_rewrite" -> """
      SELECT l_returnflag,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        count(*) AS cnt,
        CAST(max(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
          AS max_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
