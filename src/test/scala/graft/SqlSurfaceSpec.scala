package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-backed surface (SURVEY.md §2.A bucketing, §2.C SMB join,
  * §2.L DDL/stats): bucketed writes, shuffle-free sort-merge-bucket
  * joins, databases/views/DESCRIBE/ANALYZE, partition recovery. */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without a shuffle (Hive SMB join)") {
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the bare join must be exchange-free: bucket layout satisfies the
      // join's distribution requirement on both sides
      val bare = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val bp = bare.queryExecution.executedPlan.toString
      assert(bp.contains("SortMergeJoin"), bp)
      assert(!bp.contains("Exchange"), bp)
      assert(bp.contains("Bucketed: true"), bp)
      // same result as the plain parquet join
      val j = bare.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      val direct = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus")).collect().toSeq
      assert(j.orderBy(col("o_orderstatus")).collect().toSeq == direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("database / view / describe DDL round trip") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_db")
    Tables(spark, sf, "region")
      .write.mode("overwrite").saveAsTable("graft_db.t_region")
    spark.sql("""CREATE OR REPLACE VIEW graft_db.v_region AS
                 SELECT r_name FROM graft_db.t_region WHERE r_regionkey > 1""")
    val shown = spark.sql("SHOW TABLES IN graft_db").collect()
      .map(_.getString(1)).toSet
    assert(Set("t_region", "v_region").subsetOf(shown), shown)
    assert(spark.sql("SELECT count(*) FROM graft_db.v_region")
      .collect().head.getLong(0) == 3)
    val cols = spark.sql("DESCRIBE graft_db.t_region")
      .collect().map(_.getString(0)).toSet
    assert(cols.contains("r_regionkey") && cols.contains("r_name"))
  }

  test("ANALYZE TABLE feeds the optimizer row-count statistics") {
    Tables(spark, sf, "nation")
      .write.mode("overwrite").saveAsTable("t_nation_stats")
    spark.sql("ANALYZE TABLE t_nation_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    // row counts feed plans only under CBO
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("t_nation_stats")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_.toLong == 25L), stats)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("virtual/metadata columns: input_file_name + _metadata (Hive INPUT__FILE__NAME / BLOCK__OFFSET)") {
    val f = Tables(spark, sf, "region")
      .select(input_file_name().as("f"),
        col("_metadata.file_name").as("mf"))
      .distinct().collect()
    assert(f.length == 1)
    assert(f.head.getString(0).endsWith("region.parquet"))
    assert(f.head.getString(1) == "region.parquet")
  }

  test("monotonically_increasing_id is unique and ordered within a partition") {
    val ids = Tables(spark, sf, "customer").coalesce(1)
      .select(monotonically_increasing_id().as("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.distinct.size == ids.size)
  }

  test("AQE splits skewed join partitions at runtime (Hive skew join)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 holds half of 200k fact rows; dim is uniform
      val fact = spark.range(200000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
          $"id".as("v"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val j = fact.join(dim, "k")
      // materialize THIS QueryExecution so its adaptive plan finalizes
      // (count() would spawn a separate execution)
      // k=0: 100k fact rows x 1 dim row; odd k < 1000: 500 matches
      assert(j.collect().length == 100500)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // the 100 TB star-join pattern: fact partitioned on the join key, a
    // selective dim filter — DPP must inject a runtime subquery into the
    // fact scan's PartitionFilters so unneeded partitions are never read
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toFile
    dir.deleteOnExit()
    Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_suppkey"))
      .join(Tables(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(dir.getAbsolutePath)
    val fact = spark.read.parquet(dir.getAbsolutePath)
    import spark.implicits._
    // dim must be file-backed so the selective predicate survives as a
    // Filter node (a LocalRelation constant-folds it away and DPP's
    // hasSelectivePredicate check cannot see it)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toFile
    dimDir.deleteOnExit()
    Seq(("F", "keep"), ("O", "drop"), ("P", "drop")).toDF("st", "tag")
      .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
    val dim = spark.read.parquet(dimDir.getAbsolutePath)
      .filter(col("tag") === "keep")
    val j = fact.join(dim, col("o_orderstatus") === col("st"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // and it actually returns only the F-partition rows
    val expect = fact.filter(col("o_orderstatus") === "F").count()
    assert(j.count() == expect && expect > 0)
  }

  test("runtime bloom filter: selective dim side injects a bloom probe into the fact scan") {
    // the non-partitioned sibling of DPP: when the fact is NOT
    // partitioned on the join key, Spark's runtime-filter rule can
    // still build a bloom filter from the selective creation side and
    // push a might_contain probe below the fact's shuffle — at 100 TB
    // this is the difference between shuffling the whole fact and
    // shuffling the matching slice. Thresholds are lowered only inside
    // this test (fixture sizes are far below the prod defaults).
    def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
      val olds = pairs.map(p => (p._1, spark.conf.getOption(p._1)))
      pairs.foreach(p => spark.conf.set(p._1, p._2))
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = Tables(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_totalprice") > 400000)
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"), optimized)
      // and values are unchanged vs the filter-less plan
      val expect = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders")
          .filter(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expect && expect > 0)
    }
  }

  test("partition recovery (MSCK REPAIR analogue) on an external table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ext").toFile
    dir.deleteOnExit()
    Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(dir.getAbsolutePath)
    spark.sql(s"""CREATE TABLE ext_orders (o_orderkey BIGINT)
                  USING parquet PARTITIONED BY (o_orderstatus STRING)
                  LOCATION '${dir.getAbsolutePath}'""")
    assert(spark.sql("SHOW PARTITIONS ext_orders").count() == 0)
    spark.sql("MSCK REPAIR TABLE ext_orders")
    assert(spark.sql("SHOW PARTITIONS ext_orders").count() == 3)
    assert(spark.table("ext_orders").count() ==
      Tables(spark, sf, "orders").count())
    spark.sql("DROP TABLE ext_orders")
  }
}
