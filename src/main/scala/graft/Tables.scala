package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Fixture-table access + hash-stability helpers shared by every query.
  *
  * Table layout follows the driver contract (`/root/repo/TESTDATA.md`,
  * `/root/repo/FIXTURES.md`): one parquet file per table under the
  * scale-factor directory. This mirrors Hive's table-as-directory model
  * ([hive: ql/src/java/org/apache/hadoop/hive/ql/exec/TableScanOperator.java])
  * expressed Spark-first as a vectorized parquet `FileSourceScanExec`.
  *
  * Scale note: reads go through `spark.read.parquet`, so Catalyst predicate
  * pushdown / column pruning / partition pruning all apply unchanged when the
  * path is a 100 TB partitioned directory instead of a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read
    // natively; read the raw int64 and truncate to microseconds — exactly
    // what DuckDB's nanos->micros conversion does, so both engines see
    // identical values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql queries). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  // ---- hash-stability helpers (SURVEY.md §5.4) -----------------------------
  // Money columns in the fixtures are doubles; raw sum(double) is
  // partition-order dependent, so aggregate in exact decimal and only cast
  // to double at the very end.

  /** Exact-decimal view of a double column for order-independent sums. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Narrower decimal for products: Spark's multiply rule is
    * (p1,s1)*(p2,s2) -> (p1+p2+1, s1+s2), so (10,4)-width operands keep a
    * two-term product chain (price * (1-disc) * (1+tax)) inside the 38-digit
    * cap with no precision loss: (10,4)*(11,4)->(22,8); (22,8)*(11,4)->(34,12).
    */
  def dec10(c: Column): Column = c.cast(DecimalType(10, 4))

  /** sum(x) as exact decimal, emitted as double — same bits both engines. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Sum a column that is ALREADY decimal (e.g. discPrice output) without
    * re-casting (re-casting would round each row — ADVICE.md r01).
    * The exact sum is rounded to scale 4 BEFORE the double cast: a
    * high-scale decimal (scale 8/12) scaled past 2^53 is not correctly
    * rounded by DuckDB's int128/10^s double conversion, producing
    * adjacent-double mismatches (caught by the r02 sf0.001 probe). At
    * scale 4 the numerator is exact in double and one IEEE division is
    * correctly rounded on both engines. */
  def dsumExact(c: Column): Column = round(sum(c), 4).cast("double")

  /** Deterministic average mirroring SQL AVG null semantics: exact-decimal
    * sum divided by count(col) (nulls excluded — ADVICE.md r01), in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** Exact extended price net of discount: price * (1 - discount).
    * The (1-d) factor is computed in double and cast to DECIMAL(5,4) —
    * identical on both engines — keeping the product at (16,8) so that
    * Spark's sum (which adds +10 precision) stays within the 38-digit cap
    * with NO precision loss. A wider operand chain silently truncates the
    * sum's scale via allowPrecisionLoss (caught by the r02 sf0.001 probe).
    * Sum with [[dsumExact]]. */
  def discPrice(price: Column, discount: Column): Column =
    dec10(price) * (lit(1.0) - discount).cast(DecimalType(5, 4))

  /** TPC-H Q1 "charge": price * (1-disc) * (1+tax), exact Decimal(22,12);
    * sum precision 32 <= 38, so the sum is exact. Sum with [[dsumExact]]. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1.0) + tax).cast(DecimalType(5, 4))

  /** Timestamp literal parsed in the (UTC-pinned) session time zone; matches
    * a naive DuckDB TIMESTAMP literal of the same wall-clock text. */
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** Render a timestamp column as 'yyyy-MM-dd HH:mm:ss' text so the driver
    * hash-compares strings, not engine-dependent timestamp encodings. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Same, with microseconds (events.ts carries sub-second precision). */
  def fmtTsUs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
}
