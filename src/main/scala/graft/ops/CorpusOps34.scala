package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 20 (SURVEY.md §2.C/§2.M):
  * the small-files compaction plan and the FORWARD as-of join.
  *
  * Determinism contract as the other r10 waves.
  */
object CorpusOps34 {

  /** Small-files compaction plan — the lakehouse maintenance pass
    * every table format runs (Iceberg rewrite_data_files / Delta
    * OPTIMIZE): the simulated file manifest (one file per ship-month
    * per return flag, bytes = rows × 120) packs into ~512 KB
    * compaction bins by running-size assignment within each flag, and
    * the plan reports per-bin file counts, bytes and fill permille —
    * the table that decides whether compaction is worth the write
    * amplification.
    *
    * Scale: the manifest is metadata (months × flags rows, never the
    * fact table); the cumsum runs per flag over the bounded month
    * axis — the q_pack_sequences sharded-cumsum discipline. */
  val qLayoutCompaction: Q = (s, dir) => {
    val target = 512L * 1024L
    val manifest = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg((count(lit(1)) * 120L).as("bytes"),
        count(lit(1)).as("rows"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $target"))
      .groupBy(col("l_returnflag"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        sum(col("rows")).as("rows"),
        min(col("month")).cast("string").as("first_month"),
        max(col("month")).cast("string").as("last_month"))
      .withColumn("fill_permille", expr(s"bytes * 1000 div $target"))
      .orderBy(col("l_returnflag"), col("bin"))
  }

  /** FORWARD as-of join (pandas merge_asof direction='forward'): each
    * click matched to the EARLIEST purchase at-or-after it per user —
    * the other half of the as-of family (backward, nearest, tolerance
    * and point-in-time are already declared). Same tagged-union
    * single-window spelling, mirrored: purchases sort after clicks on
    * equal ts and a FOLLOWING-frame first-value carries the next
    * purchase backward.
    *
    * Scale: ONE shuffle on user_id, one window sort — identical cost
    * class to q_join_asof. */
  val qJoinAsofForward: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("pid", lit(null).cast("long"))
      .withColumn("is_r", lit(0))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("is_r", lit(1))
    val w = Window.partitionBy(col("user_id"))
      // purchases AFTER clicks at equal ts => inclusive (pts >= ts);
      // pid as the final key pins the LOWEST pid among purchases tied
      // on (user_id, ts) — the same tie rule the native forward
      // operator applies (nulls-first asc is a no-op for clicks)
      .orderBy(col("ts"), col("is_r"), col("pid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(buys)
      .withColumn("next_pid",
        first(col("pid"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("next_pid"))
      .orderBy(col("user_id"), col("click_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_layout_compaction" -> qLayoutCompaction,
    "q_join_asof_forward" -> qJoinAsofForward)

  val oracle: Map[String, String] = Map(
    "q_layout_compaction" -> """
      WITH manifest AS (
        SELECT l_returnflag,
          CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
          CAST(count(*) * 120 AS BIGINT) AS bytes,
          CAST(count(*) AS BIGINT) AS rows
        FROM lineitem GROUP BY 1, 2),
      c AS (SELECT *, CAST(sum(bytes) OVER (PARTITION BY l_returnflag
              ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS BIGINT) AS cum
            FROM manifest)
      SELECT l_returnflag, (cum - bytes) // 524288 AS bin,
        CAST(count(*) AS BIGINT) AS n_files,
        CAST(sum(bytes) AS BIGINT) AS bytes,
        CAST(sum(rows) AS BIGINT) AS rows,
        CAST(min(month) AS VARCHAR) AS first_month,
        CAST(max(month) AS VARCHAR) AS last_month,
        CAST(sum(bytes) AS BIGINT) * 1000 // 524288 AS fill_permille
      FROM c GROUP BY 1, 2 ORDER BY l_returnflag, bin""",
    "q_join_asof_forward" -> """
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS next_pid
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events
                      WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.ts >= c.ts
      ORDER BY c.user_id, click_id""")
}
