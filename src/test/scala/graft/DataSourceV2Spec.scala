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

  // aggregate plans carry an exchange, so AQE wraps them — read the
  // scan out of the pre-adaptive sparkPlan instead of executedPlan
  private def aggScanDesc(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.collectLeaves().collect {
      case b: BatchScanExec => b.scan.description()
    }.mkString("; ")

  test("complete aggregate pushdown: no HashAggregate, closed-form answer") {
    val df = docs(100000).filter(col("doc_id") >= 1000 &&
        col("doc_id") < 90000)
      .groupBy(col("bucket"))
      .agg(org.apache.spark.sql.functions.expr("count(*)").as("cnt"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    val plan = df.queryExecution.sparkPlan.toString
    assert(aggScanDesc(df).contains("SyntheticDocsAgg"), aggScanDesc(df))
    assert(aggScanDesc(df).contains("range=[1000,90000)"), aggScanDesc(df))
    assert(!plan.contains("HashAggregate"), plan)
    // closed form: bucket 0 ids are 1000..89990 step 10
    val r0 = df.filter(col("bucket") === 0).collect().head
    assert(r0.getAs[Long]("cnt") == 8900L)
    assert(r0.getAs[Long]("min_id") == 1000L)
    assert(r0.getAs[Long]("max_id") == 89990L)
  }

  test("aggregates the source cannot answer fall back to Spark's agg") {
    // sum(length(text)) is not in the pushdown surface: the source
    // must refuse and Spark must aggregate rows as usual
    val df = docs().groupBy(col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("text"))).as("s"))
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!aggScanDesc(df).contains("SyntheticDocsAgg"), aggScanDesc(df))
    assert(df.count() == 10)
  }

  test("limit pushdown shrinks the generated range, no rows discarded") {
    val df = docs(100000).filter(col("doc_id") >= 500).limit(20)
    // limit absorbed: range narrows to exactly 20 ids
    assert(scanDesc(df).contains("range=[500,520)"), scanDesc(df))
    assert(df.collect().map(_.getAs[Long]("doc_id")).toSeq ==
      (500L until 520L))
  }

  test("descending top-N pushes: high end of range, no Sort in plan") {
    val df = docs(100000).orderBy(col("doc_id").desc).limit(5)
    val plan = df.queryExecution.sparkPlan.toString
    assert(aggScanDesc(df).contains("range=[99995,100000) desc"),
      aggScanDesc(df))
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      plan)
    assert(df.collect().map(_.getAs[Long]("doc_id")).toSeq ==
      Seq(99999L, 99998L, 99997L, 99996L, 99995L))
  }

  test("LIMIT over a pushed aggregate does NOT shrink the input range") {
    // Spark pushes limits AFTER aggregates; a limit arriving then
    // applies to aggregate OUTPUT rows. The source must refuse it, or
    // groupBy(bucket).count().limit(3) would shrink [lo,hi) and return
    // cnt=1 per bucket instead of the true per-bucket count.
    val df = docs(100000).filter(col("doc_id") >= 1000 &&
        col("doc_id") < 90000)
      .groupBy(col("bucket")).agg(expr("count(*)").as("cnt"))
      .limit(3)
    // aggregate is still pushed over the FULL filtered range
    assert(aggScanDesc(df).contains("SyntheticDocsAgg"), aggScanDesc(df))
    assert(aggScanDesc(df).contains("range=[1000,90000)"), aggScanDesc(df))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("cnt") == 8900L),
      rows.map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("cnt")).toSeq)
    // and the top-N variant of the same trap
    val tn = docs(100000)
      .groupBy(col("bucket")).agg(expr("count(*)").as("cnt"))
      .orderBy(col("bucket")).limit(2)
    assert(tn.collect().map(_.getAs[Long]("cnt")).toSeq == Seq(10000L, 10000L))
  }

  test("source reports exact range statistics to the planner") {
    val df = docs(100000).filter(col("doc_id") < 64)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(64)), stats)
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

  // ---- the WRITE half: AtomicTextSink commit protocol -------------------

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    d.deleteOnExit(); d
  }

  test("sink commit publishes exactly the task files plus a manifest") {
    import spark.implicits._
    val dir = new java.io.File(tmpDir(), "out")
    val df = (0L until 1000L).map(i => (i, s"doc$i", i * 0.5))
      .toDF("id", "name", "score").repartition(4)
    df.write.format("graft.sources.AtomicTextSink")
      .option("path", dir.getAbsolutePath).mode("append").save()
    val manifest = new String(java.nio.file.Files.readAllBytes(
      dir.toPath.resolve("_SUCCESS")), "UTF-8")
    val entries = manifest.split("\n").map(_.split("\t"))
    assert(entries.map(_(1).toLong).sum == 1000L, manifest)
    // every manifest file exists; no staging residue; nothing EXTRA
    val files = dir.listFiles().map(_.getName).toSet
    entries.foreach(e => assert(files.contains(e(0)), e(0)))
    assert(!files.exists(_.contains("staging")), files)
    assert(files == entries.map(_(0)).toSet + "_SUCCESS", files)
    // the committed TSV round-trips through a plain reader
    val back = spark.read.option("sep", "\t")
      .schema("id LONG, name STRING, score DOUBLE")
      .csv(dir.getAbsolutePath + "/part-*")
    assert(back.count() == 1000L)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 499500L)
  }

  test("a failed job publishes NOTHING: no files, no manifest, staging gone") {
    import spark.implicits._
    val dir = new java.io.File(tmpDir(), "out")
    val df = (0L until 100L).toDF("id").repartition(2)
      .select(when(col("id") === 99L,
        expr("raise_error('induced failure')").cast("long"))
        .otherwise(col("id")).as("id"))
    intercept[Exception] {
      df.write.format("graft.sources.AtomicTextSink")
        .option("path", dir.getAbsolutePath).mode("append").save()
    }
    // abort ran: the target holds no committed file and no manifest —
    // even though the OTHER task may have staged its rows successfully
    val files = Option(dir.listFiles()).map(_.map(_.getName).toSet)
      .getOrElse(Set.empty[String])
    assert(!files.contains("_SUCCESS"), files)
    assert(!files.exists(_.startsWith("part-")), files)
    assert(!files.contains("_staging"), files)
  }

  test("commit scopes staging cleanup to its own job (concurrent-writer safe)") {
    import spark.implicits._
    val dir = new java.io.File(tmpDir(), "out")
    // simulate ANOTHER job's in-flight attempt under the shared
    // _staging parent; this job's commit must leave it untouched
    // (ADVICE r9: the old cleanup cleared the whole _staging dir)
    val foreign = new java.io.File(dir, "_staging/other-query-id")
    foreign.mkdirs()
    val inflight = new java.io.File(foreign, "attempt-0-7.tsv")
    java.nio.file.Files.writeString(inflight.toPath, "9\tω\t1.0\n")
    (0L until 10L).map(i => (i, s"ω$i", i * 0.5))
      .toDF("id", "name", "score").repartition(2)
      .write.format("graft.sources.AtomicTextSink")
      .option("path", dir.getAbsolutePath).mode("append").save()
    assert(inflight.exists(), "foreign in-flight attempt was deleted")
    // and non-ASCII strings round-trip byte-exact (UTF-8 writer)
    val back = spark.read.option("sep", "\t")
      .schema("id LONG, name STRING, score DOUBLE")
      .csv(dir.getAbsolutePath + "/part-*")
    assert(back.filter(col("name") === "ω3").count() == 1L)
  }

  test("runtime filtering: join build side prunes the generated scan") {
    // DSv2 dynamic pruning (SupportsRuntimeFiltering): the dim side's
    // filter keys flow into the scan at runtime, which then skips the
    // non-matching generated ids entirely. Force the benefit heuristic
    // on (the synthetic side reports exact stats, which the ratio
    // check would otherwise weigh against a tiny build side).
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
        -> "10.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val total = 20000
      val dim = spark.range(0, 2000)
        .select(col("id").as("k"), (col("id") % 37).as("flag"))
        .filter(col("flag") === 3) // ~54 live keys, known only at runtime
      val joined = docs(total, 8).join(dim, col("doc_id") === col("k"))
        .select(col("doc_id"), col("text"))
      graft.sources.SyntheticDocs.rowsEmitted.reset()
      val rows = joined.collect()
      val emitted = graft.sources.SyntheticDocs.rowsEmitted.sum()
      assert(rows.length == 54, s"join result ${rows.length}")
      assert(rows.forall(_.getLong(0) % 37 == 3))
      // without runtime filtering the scan generates all 20000 rows;
      // with it, only the live keys (plus nothing else) materialize
      assert(emitted <= 200,
        s"runtime filter did not prune the scan: emitted $emitted")
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning") ||
        planStr.contains("RuntimeFilters"), planStr.take(800))
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
