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

  /** base temp dir of the incremental-refresh fixture, one per sf dir. */
  private val refreshCache = new ConcurrentHashMap[String, String]()

  /** Incremental (partition-level) MV maintenance — the analogue of
    * Hive's `ALTER MATERIALIZED VIEW ... REBUILD` incremental path
    * [hive: ql/.../parse/MaterializedViewRebuildAnalyzer.java]: after a
    * write lands in ONE fact partition, the MV is refreshed by
    * recomputing ONLY that partition — the refresh scan is partition-
    * pruned to the changed key and dynamic partition overwrite replaces
    * just the matching MV partition. At 100 TB this is the difference
    * between an O(fact) rebuild and O(one day's data): the standard
    * nightly-warehouse maintenance shape.
    *
    * Fixture (deterministic per sf dir): fact v1 = lineitem rows with
    * l_orderkey % 7 != 0, partitioned by returnflag; the "change"
    * appends the held-out rows of partition 'N'; the incremental
    * refresh recomputes partition 'N' alone. The query reads the
    * refreshed MV; the oracle replays the same final fact state
    * directly — equality proves the partial refresh converged to the
    * full rebuild. MatViewSpec pins the pruned scan. */
  val qMvRefresh: Q = (s, dir) => {
    val root = refreshCache.computeIfAbsent(dir, _ => {
      val base = Files.createTempDirectory("graft_mvr").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
          f.delete(): Unit
        }
        rm(base)
      }))
      val fact = new java.io.File(base, "fact").getAbsolutePath
      val mv = new java.io.File(base, "mv").getAbsolutePath
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          dec(col("l_quantity")).as("qty"), col("l_orderkey"))
      li.filter(col("l_orderkey") % 7 =!= 0)
        .write.partitionBy("rf").mode("overwrite").parquet(fact)
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("rf"), col("ls"))
        .agg(sum(col("qty")).as("mv_sum_qty"), count(lit(1)).as("mv_cnt"))
      partials(s.read.parquet(fact))
        .write.partitionBy("rf").mode("overwrite").parquet(mv)
      // the change: new rows land only in fact partition rf='N'
      li.filter(col("l_orderkey") % 7 === 0 && col("rf") === "N")
        .write.partitionBy("rf").mode("append").parquet(fact)
      // incremental refresh: partition-pruned scan, dynamic overwrite of
      // the single matching MV partition (per-write option — never the
      // session conf, ADVICE r4)
      partials(s.read.parquet(fact).filter(col("rf") === "N"))
        .write.partitionBy("rf").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(mv)
      base.getAbsolutePath
    })
    s.read.parquet(s"$root/mv")
      .groupBy(col("rf"))
      .agg(sum(col("mv_sum_qty")).cast("double").as("sum_qty"),
        sum(col("mv_cnt")).as("cnt"))
      .orderBy(col("rf"))
  }

  val queries: Map[String, Q] = Map(
    "q_mv_rewrite" -> qMvRewrite,
    "q_mv_refresh" -> qMvRefresh)

  val oracle: Map[String, String] = Map(
    "q_mv_refresh" -> """
      SELECT l_returnflag AS rf,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        count(*) AS cnt
      FROM lineitem
      WHERE l_orderkey % 7 <> 0 OR l_returnflag = 'N'
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_mv_rewrite" -> """
      SELECT l_returnflag,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        count(*) AS cnt,
        CAST(max(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
          AS max_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
