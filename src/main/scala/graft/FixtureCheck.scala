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

  /** Human-readable drift lines ("table.col changed from {a,b} to c");
    * empty = every fixture column reads as an accepted type. Reads footers
    * only (schema-only `spark.read.parquet`), so it is O(tables), not
    * O(data) — safe to run at the top of every Verify/Bench invocation. */
  def diff(spark: SparkSession, dir: String): Seq[String] = {
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
        missing ++ drifted
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
