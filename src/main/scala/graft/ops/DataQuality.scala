package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality constraints (SURVEY.md §2.M) — the guardrail
  * layer every production pipeline runs before publishing a table
  * (Deequ-style checks / dbt tests; Hive's analogue is enforced-or-
  * audited constraints, [hive: ql/.../ddl/table/constraint]): primary-key
  * uniqueness, referential integrity, range bounds, and null-rate, each
  * reported as one row with its violation count and verdict.
  *
  * Scale: every check is either a partial-aggregable count (range,
  * null-rate), a two-stage count-distinct-violations aggregate (PK), or
  * a broadcast/shuffle anti-join (FK) — nothing quadratic, nothing
  * driver-side; at 100 TB the whole suite is one pass per table plus one
  * join, exactly what a publish gate can afford to run every cycle.
  */
object DataQuality {

  val qDqChecks: Q = (s, dir) => {
    val orders = Tables(s, dir, "orders")
    val lineitem = Tables(s, dir, "lineitem")
    val customer = Tables(s, dir, "customer")
    def row(name: String, violations: org.apache.spark.sql.DataFrame) =
      violations.select(lit(name).as("check"),
        col("violations"),
        (col("violations") === 0L).as("pass"))
    val pkUnique = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(count(lit(1)).as("violations"))
    val fkOrders = lineitem
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val qtyRange = lineitem
      .filter(!col("l_quantity").between(1, 50))
      .agg(count(lit(1)).as("violations"))
    val nameNotNull = customer.filter(col("c_name").isNull)
      .agg(count(lit(1)).as("violations"))
    row("orders_pk_unique", pkUnique)
      .union(row("lineitem_fk_orders", fkOrders))
      .union(row("lineitem_qty_range", qtyRange))
      .union(row("customer_name_not_null", nameNotNull))
      .orderBy(col("check"))
  }

  /** Statistical anomaly gate (Deequ anomaly-detection analogue): flag
    * events whose value sits more than 3 population-sigma from their
    * event_type's mean. The moments come from exact-decimal sums
    * (partition-order invariant); mean/std/z are then plain IEEE
    * arithmetic on identical doubles in both engines, so the >3σ cut
    * is bit-stable without any rounding of the comparison itself.
    *
    * Scale: one partial-aggregable stats pass (per-type sum/sumsq/n —
    * 20 rows out however many events in), broadcast back into a
    * map-side scoring scan: two passes over the stream, zero shuffles
    * of the event stream itself — the shape a publish gate can run
    * every cycle at 100 TB. */
  val qDqAnomaly: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val stats = ev.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"),
        Tables.dsum(col("value")).as("sv"),
        round(sum(Tables.dec10(col("value")) * Tables.dec10(col("value"))), 4)
          .cast("double").as("sq"))
      .withColumn("mean", col("sv") / col("n"))
      // floor the variance at 0: sumsq rounding can push a (near-)
      // constant type microscopically negative, where Spark's sqrt
      // yields NaN but DuckDB errors — and guard sd > 0 so a
      // zero-variance type drops identically in both engines instead
      // of Spark emitting z = +-Infinity where DuckDB's x/0.0 is NULL
      .withColumn("sd", sqrt(greatest(
        col("sq") / col("n") - col("mean") * col("mean"), lit(0.0))))
    ev.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean")) / col("sd"))
      .filter(col("sd") > 0 && abs(col("z")) > 3)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 4).as("z"),
        round(col("mean"), 4).as("type_mean"),
        round(col("sd"), 4).as("type_sd"))
      .orderBy(col("event_id"))
  }

  /** Column-statistics profiler — the `ANALYZE TABLE ... COMPUTE
    * STATISTICS FOR COLUMNS` surface (Hive 0.10+, HIVE-1362) as a
    * query: per-column row/null/NDV counts and min/max over the
    * lineitem measures, one row per column.
    *
    * Scale: a single scan computes every per-column aggregate; the
    * multi-DISTINCT expansion (one expand branch per NDV column) is
    * exactly Hive's compute_stats shape with exact NDV. At 100 TB the
    * NDVs swap to approx_count_distinct (HLL, one pass, no expand —
    * `q_agg_approx` demonstrates it); min/max/counts are unchanged.
    * Min/max are value PICKS (no float arithmetic), so doubles pass
    * the cross-engine hash exactly. */
  val qProfileColumns: Q = (s, dir) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables(s, dir, "lineitem")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    }
    val stacked = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__ndv, ${c}__min, ${c}__max")
      .mkString(", ")
    li.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stacked)")
        .as(Seq("col_name", "n", "n_nulls", "ndv", "min_v", "max_v")))
      .orderBy(col("col_name"))
  }

  /** Shuffle-skew diagnostic over a join/grouping key (here
    * l_partkey): key count, mean / p99 / max per-key cardinality, the
    * max-over-mean skew ratio in exact permille, and the top-5 hot
    * keys — the report that decides WHETHER a join needs salting or
    * an AQE skew split before anyone pays for a failed 100 TB shuffle
    * (the diagnostic twin of q_join_salted / q_agg_salted, which are
    * the cures).
    *
    * Exactness: p99 is the rank-based value at ceil(0.99 K) (an
    * actual count, the q_robust_stats discipline); mean and the skew
    * ratio are non-negative integer divisions.
    *
    * Scale: the per-key count partial-aggregates to |keys| rows; the
    * ranking window sorts keys, not fact rows; the hot-key top-5
    * lowers to a take-ordered. */
  val qSkewDiagnose: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c"), col("l_partkey"))))
      .withColumn("k", count(lit(1)).over(Window.partitionBy(lit(1))))
    val stats = ranked.agg(
      max(col("k")).cast("long").as("keys"),
      sum(col("c")).as("total"),
      max(col("c")).as("mx"),
      max(when(expr("rn = (99 * k + 99) div 100"), col("c"))).as("p99"))
    val summary = stats.select(explode(array(
      struct(lit("n_keys").as("metric"), lit(-1L).as("key"),
        col("keys").as("val")),
      struct(lit("mean").as("metric"), lit(-1L).as("key"),
        expr("total div keys").as("val")),
      struct(lit("p99").as("metric"), lit(-1L).as("key"),
        col("p99").as("val")),
      struct(lit("max").as("metric"), lit(-1L).as("key"),
        col("mx").as("val")),
      struct(lit("skew_permille").as("metric"), lit(-1L).as("key"),
        expr("mx * 1000 div (total div keys)").as("val")))).as("r"))
      .select(col("r.metric"), col("r.key"), col("r.val"))
    val hot = counts.orderBy(col("c").desc, col("l_partkey")).limit(5)
      .select(lit("hot").as("metric"), col("l_partkey").as("key"),
        col("c").as("val"))
    summary.union(hot)
      .orderBy(col("metric"), col("val").desc, col("key"))
  }

  val queries: Map[String, Q] = Map(
    "q_dq_checks" -> qDqChecks,
    "q_dq_anomaly" -> qDqAnomaly,
    "q_skew_diagnose" -> qSkewDiagnose,
    "q_profile_columns" -> qProfileColumns)

  val oracle: Map[String, String] = Map(
    "q_profile_columns" -> (Seq(
      "l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c => s"""
      SELECT '$c' AS col_name, count($c) AS n,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nulls,
        count(DISTINCT $c) AS ndv, min($c) AS min_v, max($c) AS max_v
      FROM lineitem""").mkString(" UNION ALL ") +
      " ORDER BY col_name"),
    "q_dq_anomaly" -> """
      WITH s AS (
        SELECT event_type, count(value) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
          CAST(round(sum(CAST(value AS DECIMAL(10,4)) *
                         CAST(value AS DECIMAL(10,4))), 4) AS DOUBLE) AS sq
        FROM events GROUP BY 1),
      m AS (SELECT event_type, n, sv / n AS mean,
              sqrt(greatest(sq / n - (sv / n) * (sv / n), 0.0)) AS sd
            FROM s)
      SELECT event_id, e.event_type, value,
        round((value - mean) / sd, 4) AS z,
        round(mean, 4) AS type_mean, round(sd, 4) AS type_sd
      FROM events e JOIN m ON e.event_type = m.event_type
      WHERE sd > 0 AND abs((value - mean) / sd) > 3
      ORDER BY event_id""",
    "q_skew_diagnose" -> """
      WITH counts AS (SELECT l_partkey, count(*) AS c FROM lineitem
                      GROUP BY 1),
      rk AS (SELECT *,
               CAST(row_number() OVER (ORDER BY c, l_partkey) AS BIGINT)
                 AS rn,
               CAST(count(*) OVER () AS BIGINT) AS k
             FROM counts),
      st AS (SELECT max(k) AS keys, CAST(sum(c) AS BIGINT) AS total,
               max(c) AS mx,
               max(CASE WHEN rn = (99 * k + 99) // 100 THEN c END) AS p99
             FROM rk),
      summary AS (
        SELECT 'n_keys' AS metric, CAST(-1 AS BIGINT) AS key,
               keys AS val FROM st
        UNION ALL SELECT 'mean', -1, total // keys FROM st
        UNION ALL SELECT 'p99', -1, p99 FROM st
        UNION ALL SELECT 'max', -1, mx FROM st
        UNION ALL SELECT 'skew_permille', -1,
          mx * 1000 // (total // keys) FROM st),
      hot AS (SELECT 'hot' AS metric, l_partkey AS key, c AS val
              FROM counts ORDER BY c DESC, l_partkey LIMIT 5)
      SELECT metric, key, val FROM summary
      UNION ALL SELECT metric, key, val FROM hot
      ORDER BY metric, val DESC, key""",
    "q_dq_checks" -> """
      WITH pk AS (
        SELECT count(*) AS v FROM (
          SELECT o_orderkey FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1)),
      fk AS (
        SELECT count(*) AS v FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
      rng AS (
        SELECT count(*) AS v FROM lineitem
        WHERE l_quantity NOT BETWEEN 1 AND 50),
      nn AS (
        SELECT count(*) AS v FROM customer WHERE c_name IS NULL)
      SELECT 'customer_name_not_null' AS check, v AS violations,
        v = 0 AS pass FROM nn
      UNION ALL
      SELECT 'lineitem_fk_orders', v, v = 0 FROM fk
      UNION ALL
      SELECT 'lineitem_qty_range', v, v = 0 FROM rng
      UNION ALL
      SELECT 'orders_pk_unique', v, v = 0 FROM pk
      ORDER BY "check"""")
}
