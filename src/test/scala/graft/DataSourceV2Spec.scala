package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom DataSource V2 (SyntheticDocsSource): pushdown reaches the
  * source, column pruning skips generation, parallelism follows the
  * partitions option — the storage-handler extension tier proven on the
  * physical plan, not just on row counts. */
class DataSourceV2Spec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: Int = 2000, parts: Int = 8) =
    spark.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", rows.toString).option("partitions", parts.toString)
      .load()

  private def scanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("; ")

  test("doc_id range filters are absorbed by the source (real pushdown)") {
    val df = docs().filter(col("doc_id") >= 100 && col("doc_id") < 300)
    assert(scanDesc(df).contains("range=[100,300)"), scanDesc(df))
    assert(df.count() == 200)
  }

  test("column pruning reaches the source") {
    val df = docs().select(col("doc_id"))
    assert(scanDesc(df).contains("cols=doc_id"), scanDesc(df))
    val full = docs()
    assert(scanDesc(full).contains("text"), scanDesc(full))
  }

  test("filters the source cannot absorb are re-applied by Spark") {
    // a text predicate is rejected by pushFilters — Spark must keep a
    // Filter node above the scan and results must still be correct
    val df = docs(rows = 64, parts = 2)
      .filter(col("text").startsWith("bravo") && col("doc_id") < 32)
    assert(scanDesc(df).contains("range=[0,32)"), scanDesc(df))
    val got = df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val want = (0L until 32L)
      .filter(id => graft.sources.SyntheticDocs.text(id).startsWith("bravo"))
      .toSet
    assert(got == want && want.nonEmpty)
  }

  test("partitions option controls scan parallelism") {
    assert(docs(rows = 1000, parts = 5).rdd.getNumPartitions == 5)
  }

  test("generation is deterministic and matches the documented arithmetic") {
    val r = docs(rows = 16, parts = 2).orderBy(col("doc_id")).collect()
    assert(r.length == 16)
    r.foreach { row =>
      val id = row.getLong(0)
      assert(row.getInt(1) == (id % 10).toInt)
      assert(row.getString(2) == graft.sources.SyntheticDocs.text(id))
    }
  }
}
