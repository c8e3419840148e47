package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Time-series operators over the events stream table (SURVEY.md §2.E/
  * §2.M adjacents): gap-based sessionization (the batch twin of
  * session_window that also ASSIGNS session ids, which the streaming
  * operator does not expose) and calendar-spine gap filling with
  * last-observation-carried-forward — the two shapes every
  * product-analytics warehouse runs daily.
  *
  * Both are exact: session math is integer microsecond arithmetic,
  * LOCF carries stored values without recomputation, so DuckDB
  * replays them bit-identically.
  */
object TimeSeriesOps {

  private val GapUs = 1800L * 1000000L // 30-minute session gap

  /** Gap-based sessionization: a new session starts at the first event
    * or after a >30 min silence; session_id is the running count of
    * session starts per user. One shuffle on user_id feeds both
    * windows AND the final aggregation (same partitioning) — at scale
    * the sort is per-user, never global. Ties on ts break by event_id
    * so the numbering is deterministic. */
  val qSessionize: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1)
          .otherwise(0))
      .withColumn("sess", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        fmtTsUs(min(col("ts"))).as("sess_start"),
        fmtTsUs(max(col("ts"))).as("sess_end"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("dur_us"))
      .orderBy(col("user_id"), col("sess"))
  }

  /** Calendar gap fill + LOCF downsample: hourly per-user aggregates on
    * an unbroken hour spine (sequence() from each user's first to last
    * active hour), missing hours filled with count 0 and the last
    * observed hourly value carried forward.
    *
    * Scale: the spine generates O(users x hours) rows with no shuffle
    * (explode over the per-user span aggregate); the LOCF window sorts
    * per user only. The first spine hour is an observed hour by
    * construction, so the carried value is never null. */
  val qGapfill: Q = (s, dir) => {
    val hourly = Tables(s, dir, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("v"))
    val spine = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), fmtTs(col("h")).as("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"), col("v_fill"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Linear-interpolation gap fill (the numeric companion to
    * [[qGapfill]]'s LOCF): hourly per-user mean values in exact micro
    * units on an unbroken hour spine; a missing hour gets the linear
    * interpolation between its nearest observed neighbors,
    * `(pv*(nh-t) + nv*(t-ph)) div (nh-ph)` — every operand
    * non-negative (values are positive, neighbor hours bracket t), so
    * both engines floor identically and the filled series is exact
    * int64. The resample a feature-engineering pipeline runs before
    * training on regularly-spaced series.
    *
    * Scale: spine generation is shuffle-free explode over per-user
    * span aggregates; the neighbor picks are two IGNORE NULLS window
    * passes per user partition — no self-join, no point-lookup
    * storm. The spine's ends are observed by construction, so
    * interpolation never extrapolates. */
  val qTsInterp: Q = (s, dir) => {
    val hourly = Tables(s, dir, "events")
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(expr("sum(cast(round(value * 1000000) as bigint)) div count(*)")
        .as("v"))
    val spine = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("hrs"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("hrs"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("hrs", expr("unix_micros(h) div 3600000000"))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("v").isNotNull, col("hrs")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(col("v").isNotNull, col("hrs")),
        ignoreNulls = true).over(wNext))
      .select(col("user_id"), fmtTs(col("h")).as("hour"),
        col("v").isNull.as("interpolated"),
        when(col("v").isNotNull, col("v")).otherwise(
          expr("(pv * (nh - hrs) + nv * (hrs - ph)) div (nh - ph)"))
          .as("v_micro"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Rolling 7-day distinct users per day (WAU-over-DAU): the classic
    * engagement metric. Distinct (day, user) pairs first (one map-side-
    * combinable distinct — at 100 TB this collapses the event stream to
    * days x users), then a bounded 7-row range self-join on the day
    * spine replaces a sliding-window COUNT DISTINCT (which no engine
    * can partial-aggregate). Exact integers, fully oracled. */
  val qRollingNdv: Q = (s, dir) => {
    val dayUsers = Tables(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val days = dayUsers.select(col("day").as("d")).distinct()
    days.join(dayUsers,
        col("day").between(date_sub(col("d"), 6), col("d")))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"),
        countDistinct(when(col("day") === col("d"), col("user_id")))
          .as("dau"))
      .select(fmtTs(col("d").cast("timestamp")).as("day"),
        col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** OHLC/VWAP time-bucket downsampling: per (event_type, hour) the
    * open/high/low/close of `value` plus an exact-decimal mean — the
    * feature-engineering resample every metrics store and quant
    * pipeline runs. Open/close pick the extreme event by a
    * deterministic (ts, event_id) order via min_by/max_by, so results
    * are partition-order invariant without a window sort.
    *
    * Scale: one shuffle on the (type, bucket) grouping key with
    * map-side partial min_by/max_by/min/max/sum state — constant per
    * group, no per-bucket sort, no window. At 100 TB the bucket count
    * (types x hours) is bounded by the calendar, not the row count. */
  val qDownsample: Q = (s, dir) => {
    Tables(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        davg(col("value")).as("mean_value"))
      .select(col("event_type"), fmtTs(col("h")).as("hour"),
        col("n_events"), col("open"), col("high"), col("low"),
        col("close"), col("mean_value"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** First/last-touch marketing attribution: every purchase is credited
    * to the first and the most recent engagement touch (click/view) in
    * the same user's preceding history — the standard warehouse
    * attribution model, expressed as IGNORE NULLS window picks over
    * the event stream (no self-join, no correlated subquery).
    *
    * Scale: one shuffle on user_id; both attribution columns and the
    * touch counter ride the same per-user sort. The purchase filter
    * happens AFTER the window (it must see non-purchase rows), so the
    * only post-shuffle cost is the windowed pass itself. Purchase
    * `value` is carried verbatim (no float arithmetic) — exact. */
  val qAttrTouch: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"),
        when(col("event_type").isin("click", "view"), col("event_id"))
          .as("touch_id"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"),
        first(col("touch_id"), ignoreNulls = true).over(w)
          .as("first_touch_id"),
        last(col("touch_id"), ignoreNulls = true).over(w)
          .as("last_touch_id"),
        count(col("touch_id")).over(w).as("n_touches"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"),
        col("first_touch_id"), col("last_touch_id"), col("n_touches"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** EWMA smoothing (alpha = 1/2) over each user's value stream — the
    * standard metric smoother, truncated to the 4 most recent lags so
    * the weights are exact powers of two: ewma = (16*v0 + 8*v1 + 4*v2
    * + 2*v3 + 1*v4) / (present-weight sum). Values are quantized to
    * integer micro-units first (round(value * 1e6), the EmbQuant
    * convention), so numerator, denominator and quotient are exact
    * int64 arithmetic — bit-identical in both engines (all values are
    * non-negative, so truncating div == flooring //). The 4-lag
    * truncation changes the estimate by < 1/31 of the oldest weight —
    * the price of exactness over a float recurrence that could never
    * hash-match cross-engine.
    *
    * Scale: one shuffle on user_id; all five lags ride a single
    * per-user sort (one Window physical operator), no self-join. */
  val qEwma: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def lagv(k: Int): Column = lag(col("vm"), k).over(w)
    val weights = Seq(16L, 8L, 4L, 2L, 1L)
    val lags = col("vm") +: (1 to 4).map(lagv)
    val num = weights.zip(lags)
      .map { case (wt, c) => coalesce(c, lit(0L)) * wt }
      .reduce(_ + _)
    val den = weights.zip(lags)
      .map { case (wt, c) => when(c.isNull, 0L).otherwise(wt) }
      .reduce(_ + _)
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value") * 1e6).cast("long").as("vm"))
      .withColumn("num", num).withColumn("den", den)
      .select(col("user_id"), col("event_id"), col("vm"),
        expr("num div den").as("ewma_micro"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Event-transition (Markov) matrix: counts and exact-permille
    * probabilities of each event_type → next event_type step within a
    * user's stream — the path-analysis primitive behind "what do users
    * do after X" product questions (and the matchpath/funnel family's
    * aggregate view).
    *
    * Scale: one shuffle on user_id for the lead() window, then a
    * partial-aggregated shuffle to the (from, to) matrix — type² rows,
    * calendar-bounded, never row-count-bounded. Probabilities are
    * integers: cnt * 1000 div row_total (both positive, so div and //
    * agree). */
  val qPathTransitions: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("row_total"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000 div row_total").as("p_permille"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val queries: Map[String, Q] = Map(
    "q_path_transitions" -> qPathTransitions,
    "q_ts_ewma" -> qEwma,
    "q_ts_sessionize" -> qSessionize,
    "q_ts_gapfill" -> qGapfill,
    "q_ts_interp" -> qTsInterp,
    "q_ts_downsample" -> qDownsample,
    "q_ts_rolling_ndv" -> qRollingNdv,
    "q_attr_touch" -> qAttrTouch)

  val oracle: Map[String, String] = Map(
    "q_path_transitions" -> """
      WITH p AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (SELECT from_type, to_type, count(*) AS cnt
            FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS row_total
            FROM c GROUP BY 1)
      SELECT c.from_type, c.to_type, c.cnt,
             c.cnt * 1000 // t.row_total AS p_permille
      FROM c JOIN t USING (from_type)
      ORDER BY from_type, to_type""",
    "q_ts_ewma" -> """
      WITH v AS (SELECT user_id, event_id, ts,
                   CAST(round(value * 1e6) AS BIGINT) AS vm
                 FROM events),
      l AS (SELECT user_id, event_id, vm,
              lag(vm, 1) OVER w AS v1, lag(vm, 2) OVER w AS v2,
              lag(vm, 3) OVER w AS v3, lag(vm, 4) OVER w AS v4
            FROM v
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT user_id, event_id, vm,
        (vm * 16 + coalesce(v1, 0) * 8 + coalesce(v2, 0) * 4
         + coalesce(v3, 0) * 2 + coalesce(v4, 0)) //
        (16 + CASE WHEN v1 IS NULL THEN 0 ELSE 8 END
            + CASE WHEN v2 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN v3 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN v4 IS NULL THEN 0 ELSE 1 END) AS ewma_micro
      FROM l ORDER BY user_id, event_id""",
    "q_attr_touch" -> """
      WITH t AS (
        SELECT user_id, event_id, ts, event_type, value,
          CASE WHEN event_type IN ('click', 'view') THEN event_id END
            AS touch_id
        FROM events),
      w AS (
        SELECT user_id, event_id, event_type, value,
          first_value(touch_id IGNORE NULLS) OVER win AS first_touch_id,
          last_value(touch_id IGNORE NULLS) OVER win AS last_touch_id,
          count(touch_id) OVER win AS n_touches
        FROM t
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id, value,
             first_touch_id, last_touch_id, n_touches
      FROM w WHERE event_type = 'purchase'
      ORDER BY user_id, event_id""",
    "q_ts_rolling_ndv" -> """
      WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      days AS (SELECT DISTINCT day AS d FROM du)
      SELECT strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS day,
        count(DISTINCT CASE WHEN du.day = d THEN user_id END) AS dau,
        count(DISTINCT user_id) AS wau
      FROM days JOIN du ON du.day BETWEEN d - 6 AND d
      GROUP BY d ORDER BY day""",
    "q_ts_sessionize" -> """
      WITH o AS (
        SELECT user_id, event_id, ts,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev
        FROM events),
      f AS (
        SELECT *, CASE WHEN prev IS NULL
            OR epoch_us(ts) - epoch_us(prev) > 1800000000
          THEN 1 ELSE 0 END AS ns
        FROM o),
      s AS (
        SELECT *, sum(ns) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        FROM f)
      SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
        strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
        epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM s GROUP BY user_id, sess ORDER BY user_id, sess""",
    "q_ts_downsample" -> """
      WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
        FROM events),
      oc AS (
        SELECT *,
          first_value(value) OVER w AS open,
          last_value(value) OVER w AS close
        FROM b
        WINDOW w AS (PARTITION BY event_type, h ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        count(*) AS n_events,
        min(open) AS open, max(value) AS high, min(value) AS low,
        min(close) AS close,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value)
          AS mean_value
      FROM oc GROUP BY event_type, h ORDER BY event_type, hour""",
    "q_ts_interp" -> """
      WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
          CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
            // count(*) AS v
        FROM events WHERE user_id < 10 GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
          unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        FROM hourly GROUP BY user_id),
      j AS (SELECT s.user_id, s.h, hourly.v,
              epoch_us(s.h) // 3600000000 AS hrs
            FROM spine s LEFT JOIN hourly
              ON s.user_id = hourly.user_id AND s.h = hourly.h),
      w AS (SELECT *,
              last_value(v IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY hrs
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              last_value(CASE WHEN v IS NOT NULL THEN hrs END
                IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY hrs
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
              first_value(v IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY hrs
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              first_value(CASE WHEN v IS NOT NULL THEN hrs END
                IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY hrs
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
            FROM j)
      SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        v IS NULL AS interpolated,
        CASE WHEN v IS NOT NULL THEN v
             ELSE (pv * (nh - hrs) + nv * (hrs - ph)) // (nh - ph)
        END AS v_micro
      FROM w ORDER BY user_id, hour""",
    "q_ts_gapfill" -> """
      WITH e AS (
        SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events WHERE user_id < 20 GROUP BY 1, 2),
      span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
               FROM e GROUP BY 1),
      spine AS (SELECT user_id,
                  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                FROM span),
      j AS (SELECT s.user_id, s.h, e.n, e.v
            FROM spine s LEFT JOIN e
              ON s.user_id = e.user_id AND s.h = e.h)
      SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        coalesce(n, 0) AS n_events,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY h ROWS UNBOUNDED PRECEDING) AS v_fill
      FROM j ORDER BY user_id, hour""")
}
