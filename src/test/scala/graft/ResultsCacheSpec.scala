package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ResultsCache

/** Hive-3 query-results-cache analogue (plans/ResultsCache.scala):
  * identical queries hit, semantic changes miss, mutated sources
  * invalidate, non-deterministic plans are never cached. */
class ResultsCacheSpec extends AnyFunSuite {
  import TestSpark._

  private def agg(dir: String) =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), max(col("l_quantity")).as("mx"))
      .orderBy(col("l_returnflag"))

  test("second identical query is answered from the cache, not the fact") {
    ResultsCache.clear()
    val first = ResultsCache.run(agg(sf))
    val direct = first.collect().toSeq
    assert(!ResultsCache.lastHit)
    val second = ResultsCache.run(agg(sf))
    assert(ResultsCache.lastHit, "identical rerun should hit")
    assert(!second.queryExecution.executedPlan.toString
      .contains("lineitem.parquet"), "hit must not rescan the fact")
    assert(second.collect().toSeq == direct)
    // a semantically different query misses
    ResultsCache.run(agg(sf).filter(col("n") > 0))
    assert(!ResultsCache.lastHit, "different plan must miss")
  }

  test("mutating a source table invalidates its entries") {
    ResultsCache.clear()
    val dir = Files.createTempDirectory("qcache_src").toFile
    dir.deleteOnExit()
    Files.copy(Paths.get(s"$sf/lineitem.parquet"),
      Paths.get(s"${dir.getAbsolutePath}/lineitem.parquet"))
    val d = dir.getAbsolutePath
    val v1 = ResultsCache.run(agg(d)).collect().toSeq
    ResultsCache.run(agg(d))
    assert(ResultsCache.lastHit)
    // mutate: append-like rewrite (copy again -> new mtime/identity)
    Thread.sleep(1100)
    Files.copy(Paths.get(s"$sf/orders.parquet"),
      Paths.get(s"${dir.getAbsolutePath}/lineitem.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val after = ResultsCache.run(
      spark.read.parquet(s"$d/lineitem.parquet")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus")))
    assert(!ResultsCache.lastHit, "stale entry must not be served")
    assert(after.collect().nonEmpty && v1.nonEmpty)
  }

  test("non-deterministic plans bypass the cache") {
    ResultsCache.clear()
    val nd = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_quantity") + rand()).as("x"))
    ResultsCache.run(nd); ResultsCache.run(nd)
    assert(!ResultsCache.lastHit, "rand() plan must never hit")
  }

  test("context-dependent expression inside a subquery bypasses the cache") {
    ResultsCache.clear()
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("rc_li")
    // current_date lives ONLY in the scalar subquery; the outer plan is
    // clean — an outer-only eligibility walk misses it (ADVICE r7)
    val q = () => spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM rc_li
         WHERE l_shipdate <= (SELECT current_date())
         GROUP BY l_returnflag ORDER BY l_returnflag""")
    ResultsCache.run(q()); ResultsCache.run(q())
    assert(!ResultsCache.lastHit,
      "current_date() in a subquery must not be served a pinned time")
  }

  test("source referenced only in a subquery contributes to staleness") {
    ResultsCache.clear()
    val dir = Files.createTempDirectory("qcache_subq").toFile
    dir.deleteOnExit()
    Files.copy(Paths.get(s"$sf/orders.parquet"),
      Paths.get(s"${dir.getAbsolutePath}/orders.parquet"))
    val d = dir.getAbsolutePath
    spark.read.parquet(s"$sf/lineitem.parquet")
      .createOrReplaceTempView("rc_li2")
    val q = () => {
      spark.read.parquet(s"$d/orders.parquet")
        .createOrReplaceTempView("rc_ord")
      spark.sql(
        """SELECT l_returnflag, count(*) AS n FROM rc_li2
           WHERE l_orderkey IN (SELECT o_orderkey FROM rc_ord)
           GROUP BY l_returnflag ORDER BY l_returnflag""")
    }
    ResultsCache.run(q())
    ResultsCache.run(q())
    assert(ResultsCache.lastHit)
    Thread.sleep(1100)
    Files.copy(Paths.get(s"$sf/orders.parquet"),
      Paths.get(s"${dir.getAbsolutePath}/orders.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    ResultsCache.run(q())
    assert(!ResultsCache.lastHit,
      "mutating a subquery-only source must invalidate (ADVICE r7)")
  }

  test("cache is LRU-bounded by spark.graft.resultsCache.maxEntries") {
    ResultsCache.clear()
    spark.conf.set(ResultsCache.MaxEntriesConf, "2")
    try {
      val byFlag = agg(sf)
      val byStatus = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_linestatus"))
      val byMode = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy(col("l_linenumber")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_linenumber"))
      ResultsCache.run(byFlag)   // fills slot 1
      ResultsCache.run(byStatus) // fills slot 2
      ResultsCache.run(byMode)   // evicts byFlag (LRU)
      ResultsCache.run(byStatus)
      assert(ResultsCache.lastHit, "recently used entry must survive")
      ResultsCache.run(byFlag)
      assert(!ResultsCache.lastHit, "LRU entry past the bound is evicted")
    } finally spark.conf.unset(ResultsCache.MaxEntriesConf)
  }
}
