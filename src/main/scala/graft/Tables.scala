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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---- hash-stability helpers (SURVEY.md §5.4) -----------------------------
  // Money columns in the fixtures are doubles; raw sum(double) is
  // partition-order dependent, so aggregate in exact decimal and only cast
  // to double at the very end. Precision 18 keeps DuckDB's 38-width cap safe
  // through one multiplication (18+18=36 <= 38).

  /** Exact-decimal view of a double column for order-independent sums. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** sum(x) as exact decimal, emitted as double — same bits both engines. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact-decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Exact extended price net of discount: price * (1 - discount). */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(DecimalType(18, 4)) - dec(discount))
}
