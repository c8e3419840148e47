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

  /** DSv2 atomic sink round trip (the WRITE half of the storage-handler
    * tier — `sources/AtomicTextSink.scala`; `DataSourceV2Spec` pins the
    * commit protocol itself: staging, manifest publish, abort): write
    * per-status order rollups through the custom `BatchWrite`, read the
    * COMMITTED files back via the `_SUCCESS` manifest contract, and
    * re-aggregate — values pinned by the oracle on the base table. */
  val qSinkDsv2Atomic: Q = (s, dir) => {
    val path = tmp("graft_dsv2sink")
    Tables(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .write.format("graft.sources.AtomicTextSink")
      .option("path", path).mode("append").save()
    val committed = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path, "_SUCCESS")), "UTF-8")
      .split("\n").filter(_.nonEmpty).map(l => s"$path/${l.split("\t")(0)}")
    s.read.option("sep", "\t")
      .schema("o_orderstatus STRING, cnt LONG, cents LONG")
      .csv(committed: _*)
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

  /** LOAD DATA analogue (Hive: LOAD DATA INPATH '...' INTO TABLE t
    * PARTITION (...) [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/
    * MoveTask.java]): Hive's LOAD DATA is a pure FILE MOVE into the
    * partition directory plus metastore registration — no row rewrite.
    * Reproduced faithfully: parquet files are staged, MOVED (not
    * rewritten) under <table>/o_orderstatus=X/, registered via MSCK
    * REPAIR (partition discovery), and the result reads through the
    * catalog table — so partition pruning serves later queries. */
  val qLoadData: Q = (s, dir) => {
    val table = "graft_load_target"
    val root = Files.createTempDirectory("graft_load").toFile
    root.deleteOnExit()
    val stage = Files.createTempDirectory("graft_load_stage").toFile
    stage.deleteOnExit()
    val statuses = Seq("F", "O", "P")
    val src = Tables(s, dir, "orders")
    statuses.foreach { st =>
      src.filter(col("o_orderstatus") === st)
        .select(col("o_orderkey"), col("o_custkey"),
          dec(col("o_totalprice")).as("price"))
        .write.mode("overwrite").parquet(s"$stage/st=$st")
    }
    s.sql(s"DROP TABLE IF EXISTS $table")
    s.sql(s"""CREATE TABLE $table (o_orderkey BIGINT, o_custkey BIGINT,
              price DECIMAL(18,4)) USING parquet
              PARTITIONED BY (o_orderstatus STRING)
              LOCATION '${root.getAbsolutePath}'""")
    statuses.foreach { st =>
      val pdir = new java.io.File(root, s"o_orderstatus=$st")
      pdir.mkdirs()
      new java.io.File(s"$stage/st=$st").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(pdir, f.getName).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    }
    s.sql(s"MSCK REPAIR TABLE $table")
    s.table(table)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("price")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** DECIMAL money end-to-end (Hive's money type) with NO double-cast
    * scaffolding: lineitem re-written with a stored DECIMAL(12,2) schema,
    * scanned back, aggregated in exact decimal, the aggregate written to
    * a parquet sink and re-read — types stay DECIMAL through
    * scan -> agg -> sink -> scan, and the driver compares decimals. */
  val qDecimalE2e: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val path = tmp("graft_decstore")
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("price"),
        col("l_discount").cast(DecimalType(12, 2)).as("disc"))
      .write.mode("overwrite").parquet(path)
    val agg = s.read.parquet(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("qty")).cast(DecimalType(18, 2)).as("sum_qty"),
        sum(col("price")).cast(DecimalType(18, 2)).as("sum_price"),
        max(col("disc")).as("max_disc"))
    val sink = tmp("graft_decsink")
    agg.write.mode("overwrite").parquet(sink)
    // The pipeline stays DECIMAL through scan -> agg -> sink -> scan; the
    // final cast to string is comparison formatting only (fixed-scale
    // decimal -> string is exact on both engines, while the driver's
    // pandas compare renders parquet decimals and DuckDB decimals
    // differently: Decimal('990.00') vs float 990.0).
    s.read.parquet(sink)
      .select(col("l_returnflag"), col("cnt"),
        col("sum_qty").cast("string").as("sum_qty"),
        col("sum_price").cast("string").as("sum_price"),
        col("max_disc").cast("string").as("max_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** The custom DataSource V2 exemplar (graft.sources.SyntheticDocsSource)
    * read through a pushed doc_id range + aggregation; generation is pure
    * int64 arithmetic, so DuckDB replays it from range() and this custom
    * source is value-oracled like any table. */
  val qSrcDsv2: Q = (s, _) => {
    s.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", "2000").option("partitions", "8").load()
      .filter(col("doc_id") >= 500 && col("doc_id") < 1500)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(length(col("text"))).as("sum_len"),
        min(col("text")).as("min_text"))
      .orderBy(col("bucket"))
  }

  /** DSv2 COMPLETE aggregate pushdown (SupportsPushDownAggregates —
    * the `PushedAggregates` tier JDBC storage handlers ride):
    * COUNT(*) / MIN / MAX grouped by bucket over a filtered id range
    * are answered by the source from closed-form range arithmetic —
    * zero rows materialized, no exchange, no HashAggregate in the
    * plan (pinned in DataSourceV2Spec). The 100 TB reading: an
    * aggregate a storage handler can answer never ships rows. */
  val qSrcDsv2Agg: Q = (s, _) => {
    s.read.format("graft.sources.SyntheticDocsSource")
      .option("rows", "100000").option("partitions", "8").load()
      .filter(col("doc_id") >= 1000 && col("doc_id") < 90000)
      .groupBy(col("bucket"))
      .agg(expr("count(*)").as("cnt"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("bucket"))
  }

  /** SequenceFile round trip [hive: ql/src/java/org/apache/hadoop/hive/ql/
    * io/HiveSequenceFileOutputFormat.java]: Hadoop's KV container, written
    * and re-read through Spark core's native SequenceFile support
    * (Text/Text via the RDD API — the one genuinely record-imperative IO
    * path in this engine; everything downstream returns to DataFrames).
    * Splittable at scale like any Hadoop input format. */
  val qSrcSeqFile: Q = (s, dir) => {
    val path = tmp("graft_seq")
    Tables(s, dir, "part")
      .select(col("p_partkey").cast("string"),
        concat_ws("|", col("p_name"), col("p_brand")))
      .rdd.map(r => (r.getString(0), r.getString(1)))
      .saveAsSequenceFile(path)
    val back = s.sparkContext.sequenceFile[String, String](path)
    s.createDataFrame(back.map(kv => (kv._1.toLong, kv._2)))
      .toDF("p_partkey", "v")
      .select(col("p_partkey"),
        split(col("v"), "\\|").getItem(0).as("p_name"),
        split(col("v"), "\\|").getItem(1).as("p_brand"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"),
        sum(length(col("p_name"))).as("sum_len"),
        min(col("p_partkey")).as("min_key"))
      .orderBy(col("p_brand"))
  }

  /** RegexSerDe analogue [hive: contrib/.../serde2/RegexSerDe.java]: raw
    * log lines parsed into typed columns with a capture-group regex —
    * Hive's standard answer to "the data is a web log, not a table".
    * Spark-first form: `spark.read.text` + `regexp_extract` projections,
    * which stay inside whole-stage codegen (no SerDe reflection per
    * row); the parse is a scan-side map, so it pushes through to any
    * downstream aggregation untouched at 100 TB. The fixture writes the
    * lines from `events` and the oracle aggregates the same rows from
    * parquet — equality proves the round trip is lossless. */
  val qSrcRegex: Q = (s, dir) => {
    val path = tmp("graft_regex")
    Tables(s, dir, "events")
      .select(format_string("evt id=%d user=%d type=[%s]",
        col("event_id"), col("user_id"), col("event_type")).as("value"))
      .write.mode("overwrite").text(path)
    val re = "^evt id=(\\d+) user=(\\d+) type=\\[(\\w+)\\]$"
    s.read.text(path)
      .select(
        regexp_extract(col("value"), re, 1).cast("long").as("event_id"),
        regexp_extract(col("value"), re, 2).cast("long").as("user_id"),
        regexp_extract(col("value"), re, 3).as("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(col("user_id")).as("sum_users"))
      .orderBy(col("event_type"))
  }

  /** Schema evolution (Hive ALTER TABLE ADD COLUMNS + schema-on-read):
    * generation 1 files carry (key, name), generation 2 adds
    * n_regionkey; a mergeSchema read unifies them and the old files'
    * missing column reads as NULL — exactly how a Hive table serves
    * old partitions after a column add.
    *
    * Scale: mergeSchema's footer reconciliation is per-file metadata
    * work at planning time; the data path stays the vectorized reader
    * with nulls materialized for absent columns — no rewrite of old
    * partitions, which is the entire point at 100 TB. */
  val qSrcSchemaMerge: Q = (s, dir) => {
    val v1 = tmp("graft_ev_v1")
    val v2 = tmp("graft_ev_v2")
    val nation = Tables(s, dir, "nation")
    nation.select(col("n_nationkey"), col("n_name"), lit(1L).as("gen"))
      .write.mode("overwrite").parquet(v1)
    nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"), lit(2L).as("gen"))
      .write.mode("overwrite").parquet(v2)
    s.read.option("mergeSchema", "true").parquet(v1, v2)
      .select(col("gen"), col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      .orderBy(col("gen"), col("n_nationkey"))
  }

  /** Avro container round trip [hive: serde2/avro/AvroSerDe.java]
    * through [[graft.sources.AvroIO]] — built on the avro +
    * avro-mapred jars this distribution ships (no spark-avro module,
    * deps frozen). Events write with their TIMESTAMP column (logical
    * timestamp-micros), read back in parallel container-file tasks,
    * and aggregate; the formatted min(ts) proves the logical-type
    * round trip to the microsecond against the parquet-sourced
    * oracle. */
  val qSrcAvro: Q = (s, dir) => {
    val path = tmp("graft_avro")
    graft.sources.AvroIO.write(
      Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        col("event_type"), col("ts")), path)
    graft.sources.AvroIO.read(s, path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(col("user_id")).as("sum_users"),
        Tables.fmtTsUs(min(col("ts"))).as("first_ts"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q_src_avro" -> qSrcAvro,
    "q_src_schema_merge" -> qSrcSchemaMerge,
    "q_src_regex" -> qSrcRegex,
    "q_src_seqfile" -> qSrcSeqFile,
    "q_src_dsv2" -> qSrcDsv2,
    "q_src_dsv2_agg" -> qSrcDsv2Agg,
    "q_src_csv" -> qSrcCsv,
    "q_src_json" -> qSrcJson,
    "q_src_orc" -> qSrcOrc,
    "q_sink_partitioned" -> qSinkPartitioned,
    "q_sink_dsv2_atomic" -> qSinkDsv2Atomic,
    "q_multi_insert" -> qMultiInsert,
    "q_load_data" -> qLoadData,
    "q_decimal_e2e" -> qDecimalE2e)

  val oracle: Map[String, String] = Map(
    "q_src_schema_merge" -> """
      SELECT gen, n_nationkey, n_name, n_regionkey FROM (
        SELECT CAST(1 AS BIGINT) AS gen, n_nationkey, n_name,
          CAST(NULL AS BIGINT) AS n_regionkey
        FROM nation
        UNION ALL
        SELECT CAST(2 AS BIGINT) AS gen, n_nationkey, n_name, n_regionkey
        FROM nation)
      ORDER BY gen, n_nationkey""",
    "q_src_regex" -> """
      SELECT event_type, count(*) AS cnt, min(event_id) AS min_id,
        max(event_id) AS max_id,
        CAST(sum(user_id) AS BIGINT) AS sum_users
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_src_avro" -> """
      SELECT event_type, count(*) AS cnt, min(event_id) AS min_id,
        max(event_id) AS max_id,
        CAST(sum(user_id) AS BIGINT) AS sum_users,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_src_seqfile" -> """
      SELECT p_brand, count(*) AS cnt,
        CAST(sum(length(p_name)) AS BIGINT) AS sum_len,
        min(p_partkey) AS min_key
      FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q_src_dsv2_agg" -> """
      SELECT CAST(range % 10 AS INT) AS bucket,
        count(*) AS cnt, min(range) AS min_id, max(range) AS max_id
      FROM range(1000, 90000) GROUP BY 1 ORDER BY 1""",
    "q_src_dsv2" -> """
      WITH t AS (
        SELECT range AS id, CAST(range % 10 AS INT) AS bucket,
          ['alpha','bravo','charlie','delta','echo','foxtrot','golf',
           'hotel','india','juliet','kilo','lima','mike','november',
           'oscar','papa'][CAST((range * 7 + 1) % 16 AS INT) + 1]
          || ' ' ||
          ['alpha','bravo','charlie','delta','echo','foxtrot','golf',
           'hotel','india','juliet','kilo','lima','mike','november',
           'oscar','papa'][CAST((range * 13 + 3) % 16 AS INT) + 1]
          || ' ' ||
          ['alpha','bravo','charlie','delta','echo','foxtrot','golf',
           'hotel','india','juliet','kilo','lima','mike','november',
           'oscar','papa'][CAST((range * 31 + 5) % 16 AS INT) + 1]
          AS text
        FROM range(500, 1500))
      SELECT bucket, count(*) AS cnt,
        CAST(sum(length(text)) AS BIGINT) AS sum_len,
        min(text) AS min_text
      FROM t GROUP BY bucket ORDER BY bucket""",
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
    "q_sink_dsv2_atomic" -> """
      SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS cents
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
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
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_load_data" -> """
      SELECT o_orderstatus, count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_decimal_e2e" -> """
      SELECT l_returnflag, count(*) AS cnt,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS VARCHAR) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
          AS DECIMAL(18,2)) AS VARCHAR) AS sum_price,
        CAST(max(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS max_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
