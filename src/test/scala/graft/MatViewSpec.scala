package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaterializedViewRewrite

/** Hardening of the materialized-view rewrite (ADVICE r5): rollup
  * whitelist, staleness invalidation, NULL-safe count, and per-site
  * exprId freshness. */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def armRule(): Unit =
    if (!spark.experimental.extraOptimizations
          .contains(MaterializedViewRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MaterializedViewRewrite

  /** A throwaway copy of the nation table to use as a mutable fact. */
  private def tempFact(): (String, DataFrame) = {
    val dir = Files.createTempDirectory("mv_fact").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "fact.parquet").getAbsolutePath
    spark.read.parquet(s"$sf/nation.parquet").write
      .mode("overwrite").parquet(path)
    (path, spark.read.parquet(path))
  }

  test("register rejects aggregates outside the sum/count/min/max whitelist") {
    val (path, fact) = tempFact()
    // avg of per-group averages is NOT the group avg — must throw, not
    // silently roll up as SUM (ADVICE r5 medium #1)
    val bad = fact.groupBy(col("n_regionkey"))
      .agg(avg(col("n_nationkey")).as("mv_avg"))
    val e = intercept[IllegalArgumentException] {
      MaterializedViewRewrite.register(path, bad, bad)
    }
    assert(e.getMessage.contains("whitelist"), e.getMessage)
    // DISTINCT partials do not decompose either
    val badDistinct = fact.groupBy(col("n_regionkey"))
      .agg(countDistinct(col("n_name")).as("mv_cd"))
    intercept[IllegalArgumentException] {
      MaterializedViewRewrite.register(path, badDistinct, badDistinct)
    }
  }

  test("rewrite stands down when the fact is rewritten after registration") {
    MaterializedViewRewrite.clear()
    armRule()
    try {
      val (path, fact) = tempFact()
      val definition = fact.groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("mv_cnt"))
      val mvDir = Files.createTempDirectory("mv_tbl").toFile
      mvDir.deleteOnExit()
      val mvPath = new java.io.File(mvDir, "mv.parquet").getAbsolutePath
      definition.write.mode("overwrite").parquet(mvPath)
      MaterializedViewRewrite.register(path, definition,
        spark.read.parquet(mvPath))

      def query() = spark.read.parquet(path)
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))

      val before = query()
      val beforeRows = before.collect().map(r => r.getInt(0) -> r.getLong(1))
      assert(before.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "fresh registration should rewrite onto the MV")

      // COW-style rewrite of the fact: drop a region entirely
      val shrunk = fact.filter(col("n_regionkey") =!= 0).collect()
      val schema = fact.schema
      spark.createDataFrame(
        spark.sparkContext.parallelize(shrunk.toIndexedSeq), schema)
        .write.mode("overwrite").parquet(path)
      spark.catalog.refreshByPath(path)

      val after = query()
      val afterPlan = after.queryExecution.executedPlan.toString
      assert(!afterPlan.contains("mv.parquet"),
        s"stale MV still answered the query:\n$afterPlan")
      // and the values reflect the NEW fact, not the stale MV
      assert(!after.collect().map(_.getInt(0)).contains(0))
      assert(beforeRows.map(_._1).contains(0))
    } finally MaterializedViewRewrite.clear()
  }

  test("two rewritable aggregates in one plan get distinct MV instances") {
    MaterializedViewRewrite.clear()
    armRule()
    try {
      val (path, fact) = tempFact()
      val definition = fact.groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("mv_cnt"))
      val mvDir = Files.createTempDirectory("mv_tbl2").toFile
      mvDir.deleteOnExit()
      val mvPath = new java.io.File(mvDir, "mv.parquet").getAbsolutePath
      definition.write.mode("overwrite").parquet(mvPath)
      MaterializedViewRewrite.register(path, definition,
        spark.read.parquet(mvPath))

      def agg() = spark.read.parquet(path)
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("cnt"))
      // union of two rewritten branches — duplicate exprIds across
      // branches would be an analysis/execution hazard (ADVICE r5 low #3)
      val u = agg().union(agg())
      val plan = u.queryExecution.executedPlan.toString
      assert(plan.contains("mv.parquet"), plan)
      val rows = u.collect()
      assert(rows.length == 10) // 5 regions x 2 branches
      assert(rows.map(_.getLong(1)).sum == 50) // 25 nations x 2
    } finally MaterializedViewRewrite.clear()
  }

  test("incremental MV refresh scans only the changed partition") {
    // mini version of q_mv_refresh on documents partitioned by lang:
    // the refresh scan must carry PartitionFilters on the changed key
    // (an O(one partition) read, not O(fact)), and the partially
    // refreshed MV must equal a full rebuild.
    val base = Files.createTempDirectory("mvr_spec").toFile
    base.deleteOnExit()
    val fact = new java.io.File(base, "fact").getAbsolutePath
    val mv = new java.io.File(base, "mv").getAbsolutePath
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"))
    docs.filter(col("doc_id") % 5 =!= 0)
      .write.partitionBy("lang").mode("overwrite").parquet(fact)
    def partials(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("mv_cnt"))
    partials(spark.read.parquet(fact))
      .write.partitionBy("lang").mode("overwrite").parquet(mv)
    // the change lands in partition lang='en' only
    docs.filter(col("doc_id") % 5 === 0 && col("lang") === "en")
      .write.partitionBy("lang").mode("append").parquet(fact)
    // refresh: pruned scan + dynamic overwrite of the one MV partition
    val refreshScan = spark.read.parquet(fact).filter(col("lang") === "en")
    val refreshed = partials(refreshScan)
    refreshed.collect() // materialize to get the executed plan
    val p = refreshed.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"), p)
    assert(p.contains("= en") || p.contains("equals(lang"), p)
    refreshed.write.partitionBy("lang").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(mv)
    // partial refresh == full rebuild
    val cols = Seq(col("lang"), col("source"), col("mv_cnt"))
    val got = spark.read.parquet(mv).select(cols: _*)
      .orderBy(col("lang"), col("source")).collect().toSeq
    val want = partials(spark.read.parquet(fact)).select(cols: _*)
      .orderBy(col("lang"), col("source")).collect().toSeq
    assert(got == want)
  }

  test("count rollup over an empty fact yields 0, not NULL") {
    MaterializedViewRewrite.clear()
    armRule()
    try {
      val (path, fact) = tempFact()
      val empty = fact.filter(lit(false))
      val emptyDir = Files.createTempDirectory("mv_empty").toFile
      emptyDir.deleteOnExit()
      val factPath = new java.io.File(emptyDir, "fact.parquet").getAbsolutePath
      empty.write.mode("overwrite").parquet(factPath)
      val emptyFact = spark.read.parquet(factPath)
      val definition = emptyFact.groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("mv_cnt"))
      val mvPath = new java.io.File(emptyDir, "mv.parquet").getAbsolutePath
      definition.write.mode("overwrite").parquet(mvPath)
      MaterializedViewRewrite.register(factPath, definition,
        spark.read.parquet(mvPath))
      // global count (no GROUP BY) — un-rewritten Spark returns one row 0;
      // SUM(partial) alone would return NULL (ADVICE r5 low #3)
      val c = spark.read.parquet(factPath).agg(count(lit(1)).as("cnt"))
      assert(c.queryExecution.executedPlan.toString.contains("mv.parquet"),
        "global count should rewrite onto the MV")
      assert(c.collect().head.getLong(0) == 0L)
    } finally MaterializedViewRewrite.clear()
  }
}
