package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for GLOBAL (unpartitioned) window functions.
  *
  * Spark executes an unpartitioned window by moving every row to one
  * partition (`WindowExec: No Partition Defined` warning) — the classic
  * 100 TB scale-killer. The decomposition here is the q_budget_select /
  * q_pack_sequences bucket-offset discipline generalized to ntile:
  *
  *   1. bucket each row by a coarse monotone function of the leading
  *      sort key (so bucket order == global sort order between buckets);
  *   2. per-bucket row counts (one partial-aggregated shuffle to
  *      bucket-many rows);
  *   3. cumulative "rows before this bucket" offsets via a broadcast
  *      triangular join over the bucket-count table — NOT a global
  *      window, so the final plan contains no unpartitioned Window node
  *      at all (the r9 verdict's done-criterion);
  *   4. global rank = bucket offset + per-bucket row_number (the only
  *      Window, partitioned by bucket);
  *   5. ntile from the rank with the SQL-standard fill rule, exact
  *      integer arithmetic.
  *
  * Equality with the naive `ntile(k) OVER (ORDER BY ...)` is EXACT (the
  * DuckDB oracles keep running the naive form — the hash match is the
  * proof), provided the bucket expression is a monotone function of the
  * leading order key in the same direction. Tie-break columns are safe
  * automatically: rows tied on the leading key land in the same bucket.
  */
object ScaleWindows {

  /** Append column `out` = global `ntile(k)` under `order`, computed via
    * the bucket-offset decomposition above.
    *
    * @param bucket     coarse monotone function of the LEADING order key
    *                   (e.g. `expr("v div 64")` for an ascending long
    *                   key). Bucket count should be "bounded but > core
    *                   count": the offset join is quadratic in buckets
    *                   (broadcast, trivial up to ~10k buckets) and the
    *                   per-bucket window's parallelism equals the bucket
    *                   count.
    * @param bucketDesc true when `order` leads DESCENDING (buckets are
    *                   then accumulated from the high end).
    * @param order      the full global sort, including tie-breaks.
    *
    * Output type is LongType; callers cast to match their oracle schema.
    * Internal column names are `__sw_`-prefixed; the input must not use
    * that prefix. */
  def bucketedNtile(df: DataFrame, k: Int, bucket: Column,
                    bucketDesc: Boolean, order: Seq[Column],
                    out: String): DataFrame = {
    require(k > 0, s"ntile k must be positive, got $k")
    ranked(df, bucket, bucketDesc, order)
      .withColumn(out, ntileFromRank(k))
      .drop("__sw_b", "__sw_off", "__sw_n", "__sw_rn")
  }

  /** Append column `out` = the global 1-based `row_number()` under
    * `order` (LongType), via the same decomposition — the building
    * block for exact global ranks (Spearman, rank statistics) without
    * a single-partition sort. Bucket contract as [[bucketedNtile]]. */
  def bucketedRowNumber(df: DataFrame, bucket: Column,
                        bucketDesc: Boolean, order: Seq[Column],
                        out: String): DataFrame =
    ranked(df, bucket, bucketDesc, order)
      .withColumn(out, col("__sw_rn"))
      .drop("__sw_b", "__sw_off", "__sw_n", "__sw_rn")

  /** Steps 1-4 of the decomposition: emits `__sw_rn` (global rank) and
    * `__sw_n` (total count) alongside the input columns. */
  private def ranked(df: DataFrame, bucket: Column, bucketDesc: Boolean,
                     order: Seq[Column]): DataFrame = {
    val b = df.withColumn("__sw_b", bucket)
    val counts = b.groupBy(col("__sw_b")).agg(count(lit(1)).as("__sw_c"))
    val ca = counts.select(col("__sw_b").as("__sw_ba"),
      col("__sw_c").as("__sw_cnt"))
    val cb = counts.select(col("__sw_b").as("__sw_bb"),
      col("__sw_c").as("__sw_cb"))
    // rows strictly before bucket `a` in the global order, with null
    // buckets placed exactly where the naive global window would put
    // them (Spark defaults: NULLS FIRST ascending, NULLS LAST
    // descending) — so rows with a null bucket expression are ranked,
    // not dropped, and non-null buckets count them correctly
    val before =
      if (bucketDesc)
        (col("__sw_ba").isNull && col("__sw_bb").isNotNull) ||
          col("__sw_bb") > col("__sw_ba")
      else
        (col("__sw_bb").isNull && col("__sw_ba").isNotNull) ||
          col("__sw_bb") < col("__sw_ba")
    val offsets = ca.join(broadcast(cb), before, "left")
      .groupBy(col("__sw_ba"))
      .agg(coalesce(sum(col("__sw_cb")), lit(0L)).as("__sw_off"))
      .select(col("__sw_ba").as("__sw_b2"), col("__sw_off"))
    val n = counts.agg(sum(col("__sw_c")).as("__sw_n"))
    val w = Window.partitionBy(col("__sw_b")).orderBy(order: _*)
    b.join(broadcast(offsets), col("__sw_b") <=> col("__sw_b2"))
      .drop("__sw_b2")
      .crossJoin(broadcast(n))
      .withColumn("__sw_rn",
        col("__sw_off") + row_number().over(w).cast("long"))
  }

  /** SQL-standard ntile fill rule from a 1-based global rank `__sw_rn`
    * and total count `__sw_n`: with q = n div k and r = n mod k, the
    * first r tiles hold q+1 rows, the rest q. Exact long arithmetic;
    * when n < k the WHEN branch covers every row (rn <= r·1 = n), so
    * the ELSE's div-by-zero is never evaluated. */
  private def ntileFromRank(k: Int): Column = expr(
    s"""CASE WHEN __sw_rn <= (__sw_n % $k) * (__sw_n div $k + 1)
             THEN (__sw_rn - 1) div (__sw_n div $k + 1) + 1
             ELSE (__sw_n % $k)
                  + (__sw_rn - (__sw_n % $k) * (__sw_n div $k + 1) - 1)
                    div (__sw_n div $k) + 1
        END""")
}
