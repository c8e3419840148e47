package graft

import org.apache.spark.sql.SparkSession

/** Fixture-schema canary (VERDICT r8 item 3).
  *
  * The driver regenerates `/root/testdata` between rounds, and a silent
  * physical-type change (r8: `events.ts` flipped from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS)) otherwise surfaces as dozens of opaque per-query
  * analysis errors. This check turns that into one readable line per
  * drifted column: "events.ts changed from {bigint,timestamp} to date".
  *
  * Each column lists the ACCEPTED Spark-visible types — every fixture
  * generation the engine knows how to normalize (see
  * [[Tables.normalizeEventsTs]]). A type outside the set means new,
  * unhandled drift and should fail loudly before any query runs.
  */
object FixtureCheck {
  // Timestamp columns accept all three generations the driver has shipped:
  // int64-nanos (read as bigint under nanosAsLong), micros-NTZ, micros-LTZ.
  private val tsGen = Set("bigint", "timestamp", "timestamp_ntz")

  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsGen, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsGen),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> tsGen,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Expected fixture row counts per scale factor (measured from the
    * driver's generation, TESTDATA.md). The volume canary (VERDICT r9
    * item 5) warns when a table reads 0 rows or drifts >4x in either
    * direction — the "silently truncated / silently exploded fixture"
    * failure mode that schema checks cannot see. Dirs whose basename is
    * not a known sf (scale-stress corpora, ad-hoc tests) skip the
    * volume check. */
  val expectedRows: Map[String, Map[String, Long]] = Map(
    "sf0.001" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L,
      "supplier" -> 10L, "part" -> 200L, "orders" -> 1500L,
      "lineitem" -> 6000L, "events" -> 1000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.01" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 1500L,
      "supplier" -> 100L, "part" -> 2000L, "orders" -> 15000L,
      "lineitem" -> 60000L, "events" -> 10000L, "documents" -> 500L,
      "embeddings" -> 500L),
    "sf0.1" -> Map("region" -> 5L, "nation" -> 25L, "customer" -> 15000L,
      "supplier" -> 1000L, "part" -> 20000L, "orders" -> 150000L,
      "lineitem" -> 600000L, "events" -> 100000L, "documents" -> 5000L,
      "embeddings" -> 2000L))

  /** Row count from parquet FOOTERS only (no data scan): a fixture is a
    * single file today, but a directory of part files also sums. */
  private def footerRows(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      else Array(p)
    files.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Human-readable drift lines ("table.col changed from {a,b} to c",
    * "table: row count N is >4x off expected E"); empty = every fixture
    * column reads as an accepted type at a sane volume. Reads footers
    * only (schema-only `spark.read.parquet`), so it is O(tables), not
    * O(data) — safe to run at the top of every Verify/Bench invocation. */
  def diff(spark: SparkSession, dir: String): Seq[String] = {
    val sfRows = expectedRows.get(
      new java.io.File(dir).getName.stripSuffix("/"))
    // events may need the nanos conf before its schema is even readable
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      if (!new java.io.File(path).exists) Seq(s"$table: fixture file missing at $path")
      else {
        val actual = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        val missing = cols.collect { case (c, _) if !actual.contains(c) =>
          s"$table.$c: column missing (actual columns: ${actual.keys.toSeq.sorted.mkString(", ")})" }
        val drifted = cols.collect { case (c, ok) if actual.get(c).exists(!ok(_)) =>
          s"$table.$c changed from {${ok.toSeq.sorted.mkString(",")}} to ${actual(c)}" }
        val volume = sfRows.flatMap(_.get(table)).toSeq.flatMap { exp =>
          val n = footerRows(spark, path)
          if (n == 0L)
            Seq(s"$table: fixture reads 0 rows (expected ~$exp)")
          else if (n > 4L * exp || 4L * n < exp)
            Seq(s"$table: row count $n is >4x off the ~$exp expected " +
              s"for ${new java.io.File(dir).getName} (truncated or " +
              "exploded fixture generation)")
          else Nil
        }
        missing ++ drifted ++ volume
      }
    }
  }

  /** Print drift to stderr (driver logs) and return whether fixtures are OK. */
  def warn(spark: SparkSession, dir: String): Boolean = {
    val d = diff(spark, dir)
    d.foreach(l => System.err.println(s"[fixture-canary] $l"))
    d.isEmpty
  }
}
