package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Streaming surface (SURVEY.md §2.J): tumbling / sliding / session
  * windows, watermark-style dedup — expressed as batch DataFrames over the
  * `events` fixture so the DuckDB oracle can check them; the SAME
  * transformations run under Structured Streaming (file-replay source) in
  * StreamingSpec, which asserts batch ≡ stream equivalence.
  *
  * Reference lineage: Hive has no continuous-query engine (its streaming
  * story is transactional ingest [hive: streaming/src/java/org/apache/hive/
  * streaming/HiveStreamingConnection.java]); Structured Streaming is the
  * strictly richer Spark-native equivalent per the driver north star.
  *
  * Scale design: tumbling/sliding windows are pure hash aggregations keyed
  * by (window, key) — map-side partials apply; session windows use Spark's
  * native session_window (state-store-backed under streaming, merge-sort
  * under batch). Event-time, not processing-time, throughout.
  */
object StreamingOps {

  /** Tumbling 1-hour windows: count + exact sum per (window, event_type). */
  val qStreamTumbling: Q = (s, dir) => {
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(fmtTs(col("w.start")).as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Sliding windows: 1 hour long, every 30 minutes (each event lands in
    * exactly 2 windows; both engines align windows to the epoch). */
  val qStreamSliding: Q = (s, dir) => {
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(fmtTs(col("w.start")).as("win_start"), col("cnt"),
        col("sum_value"))
      .orderBy(col("win_start"))
  }

  /** Session windows with a 30-minute inactivity gap, per user.
    * Spark session end = last event + gap; the oracle reproduces this with
    * a gaps-and-islands rewrite (lag + cumulative sum). */
  val qStreamSession: Q = (s, dir) => {
    Tables(s, dir, "events")
      .filter(col("user_id") < 60)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), fmtTsUs(col("w.start")).as("sess_start"),
        fmtTsUs(col("w.end")).as("sess_end"), col("cnt"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start"))
  }

  /** Deterministic dedup (streaming dropDuplicates analogue): keep the
    * earliest event per (user_id, event_type), ties broken by event_id. */
  val qStreamDedup: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        fmtTsUs(col("ts")).as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Late-data policy as a batch query: rows older than (max ts − 7 days)
    * are "late" — the watermark cutoff rule made inspectable. */
  val qStreamWatermarkCut: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val cutoff = ev.agg(max(col("ts")).as("mx"))
      .select((col("mx") - expr("INTERVAL 7 DAYS")).as("cut"))
    ev.crossJoin(broadcast(cutoff))
      .select(col("event_type"),
        when(col("ts") < col("cut"), "late").otherwise("ontime").as("status"))
      .groupBy(col("event_type"), col("status"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"), col("status"))
  }

  /** Stream-stream join semantics as a batch query: click -> purchase
    * attribution for the same user within 30 minutes. Under Structured
    * Streaming (StreamingSpec) both sides carry a watermark and the SAME
    * time-range condition, which is exactly what lets the join evict
    * state: a click older than (watermark - 30 min) can never match a
    * future purchase, so per-key state is bounded by the range width, not
    * the stream length — the property that makes this join viable on an
    * unbounded 100 TB/day stream. */
  val qStreamStreamJoin: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    clicks.join(buys,
        col("user_id") === col("b_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        fmtTsUs(col("click_ts")).as("click_ts"),
        fmtTsUs(col("purchase_ts")).as("purchase_ts"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_stream_stream_join" -> qStreamStreamJoin,
    "q_stream_tumbling" -> qStreamTumbling,
    "q_stream_sliding" -> qStreamSliding,
    "q_stream_session" -> qStreamSession,
    "q_stream_dedup" -> qStreamDedup,
    "q_stream_watermark_cut" -> qStreamWatermarkCut)

  val oracle: Map[String, String] = Map(
    "q_stream_stream_join" -> """
      SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
        strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
      ORDER BY a.user_id, click_id, purchase_id""",
    "q_stream_tumbling" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
             event_type, count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q_stream_sliding" -> """
      SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                      - k * INTERVAL '30 minutes',
                      '%Y-%m-%d %H:%M:%S') AS win_start,
             count(*) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events, (VALUES (0), (1)) o(k)
      GROUP BY 1 ORDER BY win_start""",
    "q_stream_session" -> """
      WITH marks AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
               THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE user_id < 60
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, value,
          sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM marks)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
        strftime(max(ts) + INTERVAL '30 minutes',
                 '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
        count(*) AS cnt,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""",
    "q_stream_dedup" -> """
      SELECT user_id, event_type, event_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
      FROM (SELECT user_id, event_type, event_id, ts,
              row_number() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_stream_watermark_cut" -> """
      WITH cut AS (SELECT max(ts) - INTERVAL 7 DAY AS c FROM events)
      SELECT event_type,
        CASE WHEN ts < (SELECT c FROM cut) THEN 'late' ELSE 'ontime' END
          AS status,
        count(*) AS cnt
      FROM events GROUP BY event_type, status
      ORDER BY event_type, status""")
}
