package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Source / sink surface (SURVEY.md §2.A): delimited text (Hive
  * LazySimpleSerDe), quoted CSV (OpenCSVSerde), JSON-per-line (JsonSerDe),
  * ORC (Hive's native format), dynamic-partitioned writes
  * (FileSinkOperator), and multi-insert (one scan, N sinks).
  *
  * Each query round-trips fixture data through the format into a temp dir
  * and aggregates the re-read rows; the DuckDB oracle computes the same
  * aggregate from the original parquet — proving the round trip is
  * lossless, not just runnable. Numeric columns ride as exact decimals
  * through text formats so serialization cannot perturb doubles.
  */
object SourcesSinks {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getAbsolutePath
  }

  /** CSV round trip (header, explicit schema on re-read). */
  val qSrcCsv: Q = (s, dir) => {
    val path = tmp("graft_csv")
    Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_size"), dec(col("p_retailprice")).as("price"))
      .write.mode("overwrite").option("header", "true").csv(path)
    s.read.option("header", "true")
      .schema("p_partkey BIGINT, p_name STRING, p_brand STRING, " +
        "p_size INT, price DECIMAL(18,4)")
      .csv(path)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), sum(col("price")).cast("double")
        .as("sum_price"), max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand"))
  }

  /** JSON-per-line round trip. */
  val qSrcJson: Q = (s, dir) => {
    val path = tmp("graft_json")
    Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        dec(col("c_acctbal")).as("bal"))
      .write.mode("overwrite").json(path)
    s.read
      .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING, " +
        "bal DECIMAL(18,4)")
      .json(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("bal")).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** ORC round trip (Hive's native columnar format, vectorized both ways). */
  val qSrcOrc: Q = (s, dir) => {
    val path = tmp("graft_orc")
    Tables(s, dir, "supplier")
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .groupBy(col("s_nationkey").cast("int").as("nk"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("s_acctbal")).as("sum_bal"))
      .orderBy(col("nk"))
  }

  /** Dynamic-partitioned write (Hive dynamic partition INSERT): rows land
    * in status=X/ subdirs; partition pruning serves the re-read. */
  val qSinkPartitioned: Q = (s, dir) => {
    val path = tmp("graft_part")
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        dec(col("o_totalprice")).as("price"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderstatus").isin("F", "P")) // partition pruning
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("price")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Multi-insert (Hive: FROM t INSERT OVERWRITE t1 ... INSERT OVERWRITE
    * t2 ...): one cached scan feeds two sinks; the declared result reads
    * both sinks back and unions them — values still pinned by the oracle. */
  val qMultiInsert: Q = (s, dir) => {
    val p1 = tmp("graft_mi1")
    val p2 = tmp("graft_mi2")
    val src = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        dec(col("l_quantity")).as("qty"))
      .persist()
    try {
      src.filter(col("l_returnflag") === "R")
        .write.mode("overwrite").parquet(p1)
      src.filter(col("l_returnflag") === "A")
        .write.mode("overwrite").parquet(p2)
      val r1 = s.read.parquet(p1)
      val r2 = s.read.parquet(p2)
      r1.union(r2)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("qty")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    } finally src.unpersist()
  }

  val queries: Map[String, Q] = Map(
    "q_src_csv" -> qSrcCsv,
    "q_src_json" -> qSrcJson,
    "q_src_orc" -> qSrcOrc,
    "q_sink_partitioned" -> qSinkPartitioned,
    "q_multi_insert" -> qMultiInsert)

  val oracle: Map[String, String] = Map(
    "q_src_csv" -> """
      SELECT p_brand, count(*) AS cnt,
        CAST(sum(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_price,
        max(p_size) AS max_size
      FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q_src_json" -> """
      SELECT c_mktsegment, count(*) AS cnt,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_src_orc" -> """
      SELECT CAST(s_nationkey AS INT) AS nk, count(*) AS cnt,
        CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
      FROM supplier GROUP BY nk ORDER BY nk""",
    "q_sink_partitioned" -> """
      SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_price
      FROM orders WHERE o_orderstatus IN ('F', 'P')
      GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_multi_insert" -> """
      SELECT l_returnflag, count(*) AS cnt,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
      GROUP BY l_returnflag ORDER BY l_returnflag""")
}
