package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 29 (SURVEY.md §2.M):
  * time-decay attribution (completing the touch/position model
  * family) and Hilbert-curve clustering quality (the locality
  * upgrade over the Morton/z-order layout audit).
  *
  * Determinism contract as the other r10 waves: exact integers,
  * power-of-two decay weights, floor division only.
  */
object CorpusOps40 {

  /** Time-decay attribution (the third standard warehouse model after
    * first/last-touch and position-based): each user's FIRST purchase
    * credits every preceding click/view within 30 days, weighted by
    * the half-life-7-days decay 1000 div 2^(Δdays div 7) — exact
    * power-of-two permille weights (1000/500/250/125/62), no float
    * exponentials. Rolled up per touch type × decay bucket.
    *
    * Scale: the purchase side collapses to one row per user BEFORE
    * the touch join (same discipline as q_attr_position: never
    * purchase×touch quadratic), the join is a user-keyed equi-join
    * with a residual time predicate, and the rollup partial-
    * aggregates. */
  val qAttrTimedecay: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
      .select(col("user_id"), col("fp.ts").as("pts"),
        col("fp.event_id").as("pid"))
    ev.filter(col("event_type").isin("view", "click"))
      .join(firstBuy, Seq("user_id"))
      .filter(col("ts") < col("pts") ||
        (col("ts") === col("pts") && col("event_id") < col("pid")))
      .withColumn("age_days",
        datediff(to_date(col("pts")), to_date(col("ts"))).cast("long"))
      .filter(col("age_days") <= 30)
      .withColumn("k", expr("age_days div 7"))
      .withColumn("credit_permille", expr(
        """1000 div (CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
                            WHEN 3 THEN 8 ELSE 16 END)"""))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_permille")).as("credit_total"))
      .orderBy(col("event_type"), col("k"))
  }

  /** Hilbert-curve clustering quality — the locality audit of
    * q_zorder_cluster re-run on the Hilbert index (Hilbert 1891;
    * Faloutsos & Roseman, PODS 1989 for the database use): the
    * standard xy2d walk, 6 levels unrolled, each level adding
    * s²·quadrant and applying the flip+swap rotation. Hilbert beats
    * Morton exactly where zone maps care: every 64-cell curve
    * segment is a CONNECTED region, so per-bucket bounding boxes
    * shrink (the spec pins Hilbert's total bbox area strictly under
    * z-order's on the same data). Bucket size is 96 cells — 1.5 of
    * the 64-cell order-3 subsquares — deliberately NOT a power of 4:
    * at power-of-4-aligned sizes both curves degenerate to the same
    * aligned tiles (measured: both total 4096 at size 64), while at
    * 96 the curves' locality actually differs (Hilbert 4640 vs
    * Morton 8576 total bbox area on the filled 64x64 grid).
    *
    * Scale: the index is a per-row map-side expression chain; the
    * audit is one partial-aggregated rollup over 64 buckets. */
  val qHilbertCluster: Q = (s, dir) => {
    val base = Tables(s, dir, "lineitem")
      .select((col("l_partkey") % 64).cast("long").as("a"),
        (col("l_suppkey") % 64).cast("long").as("b"))
      .withColumn("x", col("a")).withColumn("y", col("b"))
      .withColumn("h", lit(0L))
    val walked = Seq(32L, 16L, 8L, 4L, 2L, 1L).foldLeft(base) { (df, sLvl) =>
      df.withColumn("rx", when((col("x").bitwiseAND(sLvl)) > 0, 1L)
          .otherwise(0L))
        .withColumn("ry", when((col("y").bitwiseAND(sLvl)) > 0, 1L)
          .otherwise(0L))
        .withColumn("h", col("h") + lit(sLvl * sLvl) *
          (when(col("rx") === 0 && col("ry") === 0, 0L)
            .when(col("rx") === 0, 1L)
            .when(col("ry") === 1, 2L)
            .otherwise(3L)))
        .withColumn("nx",
          when(col("ry") === 1, col("x"))
            .when(col("rx") === 1, lit(sLvl - 1) - col("y"))
            .otherwise(col("y")))
        .withColumn("ny",
          when(col("ry") === 1, col("y"))
            .when(col("rx") === 1, lit(sLvl - 1) - col("x"))
            .otherwise(col("x")))
        .withColumn("x", col("nx")).withColumn("y", col("ny"))
        .drop("rx", "ry", "nx", "ny")
    }
    walked
      .withColumn("bucket", expr("h div 96"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, Q] = Map(
    "q_attr_timedecay" -> qAttrTimedecay,
    "q_hilbert_cluster" -> qHilbertCluster)

  /** One xy2d level as SQL: (x, y, h) -> (x', y', h'). */
  private def lvlSql(sLvl: Long, prev: String, cur: String): String = s"""
      $cur AS (SELECT a, b,
        h + $sLvl * $sLvl * (CASE
          WHEN (x & $sLvl) = 0 AND (y & $sLvl) = 0 THEN 0
          WHEN (x & $sLvl) = 0 THEN 1
          WHEN (y & $sLvl) > 0 THEN 2 ELSE 3 END) AS h,
        CASE WHEN (y & $sLvl) > 0 THEN x
             WHEN (x & $sLvl) > 0 THEN ${sLvl - 1} - y ELSE y END AS x,
        CASE WHEN (y & $sLvl) > 0 THEN y
             WHEN (x & $sLvl) > 0 THEN ${sLvl - 1} - x ELSE x END AS y
      FROM $prev)"""

  val oracle: Map[String, String] = Map(
    "q_attr_timedecay" -> """
      WITH fb AS (SELECT user_id, min(ts) AS pts FROM events
                  WHERE event_type = 'purchase' GROUP BY 1),
      fp AS (SELECT e.user_id, e.ts AS pts, min(e.event_id) AS pid
             FROM events e JOIN fb ON e.user_id = fb.user_id
               AND e.ts = fb.pts AND e.event_type = 'purchase'
             GROUP BY 1, 2),
      t AS (SELECT e.event_type,
              CAST(date_diff('day', CAST(e.ts AS DATE),
                CAST(fp.pts AS DATE)) AS BIGINT) AS age_days
            FROM events e JOIN fp ON fp.user_id = e.user_id
            WHERE e.event_type IN ('view', 'click')
              AND (e.ts < fp.pts
                   OR (e.ts = fp.pts AND e.event_id < fp.pid))),
      k AS (SELECT event_type, age_days // 7 AS k FROM t
            WHERE age_days <= 30)
      SELECT event_type, k, CAST(count(*) AS BIGINT) AS n_touches,
        CAST(sum(1000 // (CASE k WHEN 0 THEN 1 WHEN 1 THEN 2
          WHEN 2 THEN 4 WHEN 3 THEN 8 ELSE 16 END)) AS BIGINT)
          AS credit_total
      FROM k GROUP BY 1, 2 ORDER BY event_type, k""",
    "q_hilbert_cluster" -> (s"""
      WITH l0 AS (
        SELECT CAST(l_partkey % 64 AS BIGINT) AS a,
               CAST(l_suppkey % 64 AS BIGINT) AS b,
               CAST(l_partkey % 64 AS BIGINT) AS x,
               CAST(l_suppkey % 64 AS BIGINT) AS y,
               CAST(0 AS BIGINT) AS h
        FROM lineitem),
      ${lvlSql(32, "l0", "l1")},
      ${lvlSql(16, "l1", "l2")},
      ${lvlSql(8, "l2", "l3")},
      ${lvlSql(4, "l3", "l4")},
      ${lvlSql(2, "l4", "l5")},
      ${lvlSql(1, "l5", "l6")}
      SELECT h // 96 AS bucket, count(*) AS cnt,
        min(a) AS min_a, max(a) AS max_a,
        min(b) AS min_b, max(b) AS max_b
      FROM l6 GROUP BY 1 ORDER BY bucket"""))
}
