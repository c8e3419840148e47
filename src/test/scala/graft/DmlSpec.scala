package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AcidDml

/** Scale contracts of the copy-on-write DML path (SURVEY.md §2.L):
  * value-correctness is the driver oracle's job; these tests pin the
  * properties that make the pattern survive a 100 TB table. */
class DmlSpec extends AnyFunSuite {
  import TestSpark._

  private def dataFiles(dir: File): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("partition-pruned DELETE rewrites only the affected partition") {
    val table = new File(
      java.nio.file.Files.createTempDirectory("graft_dmlspec").toFile,
      "table")
    Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(table.getAbsolutePath)
    val before = dataFiles(new File(table, "o_orderstatus=O"))
    assert(before.nonEmpty)
    spark.read.parquet(table.getAbsolutePath)
      .filter(col("o_orderstatus") === "F")
      .filter(col("o_totalprice") >= 50000)
      .localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic") // scoped to this write
      .partitionBy("o_orderstatus").parquet(table.getAbsolutePath)
    // untouched partition: byte-identical file set, same mtimes
    assert(dataFiles(new File(table, "o_orderstatus=O")) == before)
    // affected partition: rows actually gone
    val f = spark.read.parquet(table.getAbsolutePath)
      .filter(col("o_orderstatus") === "F")
    assert(f.filter(col("o_totalprice") < 50000).count() == 0)
    assert(f.count() > 0)
  }

  test("DELETE scan prunes untouched partitions at file-listing time") {
    val table = new File(
      java.nio.file.Files.createTempDirectory("graft_dmlspec2").toFile,
      "table")
    Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(table.getAbsolutePath)
    val plan = spark.read.parquet(table.getAbsolutePath)
      .filter(col("o_orderstatus") === "F")
      .filter(col("o_totalprice") >= 50000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), plan)
  }

  test("MERGE lowers to one shuffle join, never a nested-loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val target = orders.filter(col("o_orderkey") % 3 === 0)
      val source = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), lit("U").as("s_status"))
      val merged = target.join(source, Seq("o_orderkey"), "full_outer")
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("DML aggregates run non-empty at the smoke scale factor") {
    Seq(AcidDml.qDmlDelete, AcidDml.qDmlUpdate, AcidDml.qDmlMerge,
      AcidDml.qDmlTimeTravel)
      .foreach { q => assert(q(spark, sf).count() > 0) }
  }

  test("compaction rewrites many small files into few, data unchanged") {
    // the Hive-ACID compactor analogue for delta-style layouts (the
    // streaming MV test appends one delta file per micro-batch; at 100 TB
    // small-file pressure kills scan throughput): write-new + atomic-swap
    // into a compacted dir, assert byte-identical content and a real
    // file-count drop.
    val base = java.nio.file.Files.createTempDirectory("compact").toFile
    base.deleteOnExit()
    val hot = new java.io.File(base, "hot").getAbsolutePath
    val compacted = new java.io.File(base, "compacted").getAbsolutePath
    Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .repartition(16) // 16 small "delta" files
      .write.mode("overwrite").parquet(hot)
    def parquetFiles(p: String) =
      Option(new java.io.File(p).listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(hot) == 16)
    spark.read.parquet(hot).repartition(2)
      .write.mode("overwrite").parquet(compacted)
    assert(parquetFiles(compacted) == 2)
    val before = spark.read.parquet(hot)
      .orderBy(col("o_orderkey")).collect().toSeq
    val after = spark.read.parquet(compacted)
      .orderBy(col("o_orderkey")).collect().toSeq
    assert(before == after)
  }
}
