package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Window-function surface (SURVEY.md §2.E): ranking, analytic (lead/lag/
  * first/last), aggregates over frames (ROWS + RANGE), and the
  * top-k-per-group pattern.
  *
  * Hive lineage: PTFOperator + WindowingTableFunction
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/PTFOperator.java,
  * ql/.../udf/ptf/WindowingTableFunction.java]; ranking UDAFs
  * [hive: ql/.../udf/generic/GenericUDAFRank.java].
  *
  * Scale design: WindowExec shuffles once on partitionBy keys and sorts
  * within partitions — one exchange regardless of how many functions share
  * the window spec, so all functions per query share a single spec.
  * Determinism: every orderBy includes a unique key suffix (§5.4).
  */
object Windows {

  /** Full ranking family over one window spec. */
  val qWindowRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("tile4"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .filter(col("rn") <= 5)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** lead/lag with explicit defaults over an event timeline. */
  val qWindowLeadLag: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1, "none").over(w).as("prev_type"),
        lead(col("event_type"), 1, "none").over(w).as("next_type"),
        lag(col("event_id"), 2, -1L).over(w).as("prev2_id"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** first_value / last_value over the full partition frame. */
  val qWindowFirstLast: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      .orderBy(col("o_orderkey"))
  }

  /** ROWS frames (running + moving) and a numeric RANGE frame. */
  val qWindowFrames: Q = (s, dir) => {
    val wRows = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wRange = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_orderkey"))
    Tables(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 10)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"),
        sum(dec(col("l_quantity")))
          .over(wRows.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_qty"),
        sum(dec(col("l_quantity")))
          .over(wRows.rowsBetween(-3, Window.currentRow))
          .cast("double").as("mov4_qty"),
        count(lit(1))
          .over(wRange.rangeBetween(-100L, 0L)).as("cnt_range100"))
      .orderBy(col("l_suppkey"), col("l_shipdate"),
        col("l_orderkey"), col("l_linenumber"))
  }

  /** Top-3 line items per supplier — windowed top-k-per-group. */
  val qWindowTopKGroup: Q = (s, dir) => {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Windowed aggregates: share-of-partition via sum over partition. */
  val qWindowShare: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("status_total"),
        count(lit(1)).over(w).as("status_cnt"),
        (dec(col("o_totalprice")).cast("double") /
          sum(dec(col("o_totalprice"))).over(w).cast("double")).as("share"))
      .orderBy(col("o_orderkey"))
  }

  /** lead/lag-family with IGNORE NULLS (Hive first_value(c, true)):
    * last non-null event value carried forward per user. */
  val qWindowIgnoreNulls: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"),
        // value only present on purchases; carry the last one forward
        when(col("event_type") === "purchase", col("value")).as("pv"))
      .select(col("user_id"), col("event_id"),
        last(col("pv"), ignoreNulls = true).over(w).as("last_purchase"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** matchpath PTF analogue [hive: ql/src/java/org/apache/hadoop/hive/ql/
    * udf/ptf/MatchPath.java]: path-pattern `view.click+.purchase` over each
    * user's event stream, emitting one row per matched path with its
    * attributes — re-expressed Spark-first as gaps-and-islands windows
    * (no custom PTF operator needed):
    *  - `grp` numbers islands: each non-click row opens an island that
    *    carries its trailing clicks;
    *  - the island's opener type/position propagate to every click via
    *    first_value over (user, grp);
    *  - a purchase matches iff its predecessor is a click whose island was
    *    opened by a view; the click count falls out of the positions.
    * Scale: two hash exchanges — wOrd and wSeq share the user_id
    * partitioning (one exchange), wIsland adds one on (user_id, grp);
    * sorts only within partitions, never a global shuffle per spec. */
  val qMatchPath: Q = (s, dir) => {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("grp",
        count(when(col("event_type") =!= "click", 1)).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wIsland = Window.partitionBy(col("user_id"), col("grp"))
      .orderBy(col("rn"))
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    ev
      .withColumn("opener_type", first(col("event_type")).over(wIsland))
      .withColumn("opener_pos", first(col("rn")).over(wIsland))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wSeq))
      .withColumn("prev_opener_type", lag(col("opener_type"), 1).over(wSeq))
      .withColumn("prev_opener_pos", lag(col("opener_pos"), 1).over(wSeq))
      .filter(col("event_type") === "purchase" &&
        col("prev_type") === "click" && col("prev_opener_type") === "view")
      .select(col("user_id"), col("event_id").as("purchase_event"),
        (col("rn") - 1 - col("prev_opener_pos")).cast("int").as("n_clicks"))
      .orderBy(col("user_id"), col("purchase_event"))
  }

  /** Funnel analysis (behavioral analytics, the aggregate sibling of
    * matchpath): per user, the first time of each stage; the corpus-level
    * row counts users whose first click follows their first view and
    * whose first purchase completes the ordered chain — the min-ts
    * funnel, one partial-aggregable groupBy + a single-row rollup, no
    * window state, no per-user ordering shuffle beyond the hash agg. */
  val qFunnel: Q = (s, dir) => {
    val per = graft.Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
    per.agg(
      count(lit(1)).as("users"),
      count(col("t_view")).as("viewed"),
      sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L))
        .as("clicked_after_view"),
      sum(when(col("t_buy") > col("t_click") &&
        col("t_click") > col("t_view"), 1L).otherwise(0L)).as("converted"))
  }

  /** Cohort retention (the warehouse staple next to funnels): users are
    * cohorted by the ISO week of their first event; each (cohort week,
    * week offset) cell counts users still active that many weeks later.
    * Two partial-aggregable groupBys + one equi-join on user_id — the
    * retention triangle costs no window state and shuffles only
    * (user, week) pairs, not events. Week truncation is ISO-Monday in
    * both engines, so the cells are exact integers. */
  val qCohortRetention: Q = (s, dir) => {
    val weeks = graft.Tables(s, dir, "events")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val cohort = weeks.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_week"))
    weeks.join(cohort, "user_id")
      .select(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      // render the date as text: raw date cells hash differently across
      // the parquet/duckdb compare paths (driver-contract trap)
      .select(date_format(col("cohort_week"), "yyyy-MM-dd")
        .as("cohort_week"), col("week_offset"), col("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Moving median (7-row centered-trailing window): percentile over a
    * ROWS frame — the robust-smoothing twin of the q_window_frames
    * moving average. Interpolated median of doubles is (a+b)/2 of
    * exact stored values, bit-identical cross-engine; the frame is
    * bounded so state never grows with partition size. */
  val qWindowMedian: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-6, 0)
    Tables(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_orderstatus"), col("o_orderkey"),
        fmtTs(col("o_orderdate")).as("odate"),
        expr("percentile(o_totalprice, 0.5)")
          .over(w).as("moving_median"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  /** Time-range window frame (RANGE BETWEEN INTERVAL ... PRECEDING):
    * rolling 1-hour event count + exact value sum per user — the
    * event-time frame a streaming engine would express with a sliding
    * window, here as a batch RANGE frame over the timestamp ordering.
    * The frame bound is event-time, so row-count skew cannot widen
    * the state. */
  val qWindowTimeRange: Q = (s, dir) => {
    // interval RANGE bounds have no DataFrame-API spelling (the
    // Column overload of rangeBetween was removed in Spark 3) — the
    // SQL frame syntax is the canonical form
    Tables(s, dir, "events")
      .filter(col("user_id") < 15)
      .selectExpr("user_id", "event_id", "ts",
        """count(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS n_1h""",
        """CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS sum_1h""")
      .select(col("user_id"), col("event_id"),
        fmtTsUs(col("ts")).as("ets"), col("n_1h"), col("sum_1h"))
      .orderBy(col("user_id"), col("ets"), col("event_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_window_median" -> qWindowMedian,
    "q_window_time_range" -> qWindowTimeRange,
    "q_cohort_retention" -> qCohortRetention,
    "q_funnel" -> qFunnel,
    "q_matchpath" -> qMatchPath,
    "q_window_ignore_nulls" -> qWindowIgnoreNulls,
    "q_window_rank" -> qWindowRank,
    "q_window_leadlag" -> qWindowLeadLag,
    "q_window_firstlast" -> qWindowFirstLast,
    "q_window_frames" -> qWindowFrames,
    "q_window_topk_group" -> qWindowTopKGroup,
    "q_window_share" -> qWindowShare)

  val oracle: Map[String, String] = Map(
    "q_window_median" -> """
      SELECT o_orderstatus, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
        median(o_totalprice) OVER (PARTITION BY o_orderstatus
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS moving_median
      FROM orders WHERE o_custkey < 100
      ORDER BY o_orderstatus, o_orderkey""",
    "q_window_time_range" -> """
      SELECT user_id, event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ets,
        count(*) OVER w AS n_1h,
        CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      FROM events WHERE user_id < 15
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ets, event_id""",
    "q_cohort_retention" -> """
      WITH weeks AS (
        SELECT DISTINCT user_id,
          CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events),
      cohort AS (
        SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id)
      SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
        CAST(datediff('day', c.cohort_week, w.wk) // 7 AS INT)
          AS week_offset,
        count(*) AS n_users
      FROM weeks w JOIN cohort c ON w.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    "q_funnel" -> """
      WITH per AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
          min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
          min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id)
      SELECT count(*) AS users, count(t_view) AS viewed,
        CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
          AS BIGINT) AS clicked_after_view,
        CAST(sum(CASE WHEN t_buy > t_click AND t_click > t_view
          THEN 1 ELSE 0 END) AS BIGINT) AS converted
      FROM per""",
    "q_matchpath" -> """
      WITH e AS (
        SELECT user_id, event_id, ts, event_type,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS rn,
          count(CASE WHEN event_type <> 'click' THEN 1 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM events),
      i AS (
        SELECT *,
          first_value(event_type)
            OVER (PARTITION BY user_id, grp ORDER BY rn) AS opener_type,
          first_value(rn)
            OVER (PARTITION BY user_id, grp ORDER BY rn) AS opener_pos
        FROM e),
      l AS (
        SELECT *,
          lag(event_type)
            OVER (PARTITION BY user_id ORDER BY rn) AS prev_type,
          lag(opener_type)
            OVER (PARTITION BY user_id ORDER BY rn) AS prev_opener_type,
          lag(opener_pos)
            OVER (PARTITION BY user_id ORDER BY rn) AS prev_opener_pos
        FROM i)
      SELECT user_id, event_id AS purchase_event,
        CAST(rn - 1 - prev_opener_pos AS INT) AS n_clicks
      FROM l
      WHERE event_type = 'purchase' AND prev_type = 'click'
        AND prev_opener_type = 'view'
      ORDER BY user_id, purchase_event""",
    "q_window_ignore_nulls" -> """
      SELECT user_id, event_id,
        last_value(CASE WHEN event_type = 'purchase' THEN value END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS last_purchase
      FROM events WHERE user_id < 20
      ORDER BY user_id, event_id""",
    "q_window_rank" -> """
      SELECT * FROM (
        SELECT c_custkey, CAST(c_nationkey AS INT) AS c_nationkey, c_acctbal,
          rank() OVER w AS rnk,
          dense_rank() OVER w AS drnk,
          row_number() OVER w AS rn,
          ntile(4) OVER w AS tile4,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey))
      WHERE rn <= 5 ORDER BY c_nationkey, rn""",
    "q_window_leadlag" -> """
      SELECT user_id, event_id, event_type,
        lag(event_type, 1, 'none') OVER w AS prev_type,
        lead(event_type, 1, 'none') OVER w AS next_type,
        lag(event_id, 2, -1) OVER w AS prev2_id
      FROM events WHERE user_id < 40
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",
    "q_window_firstlast" -> """
      SELECT o_orderkey, o_orderstatus,
        first_value(o_orderkey) OVER w AS first_key,
        last_value(o_orderkey) OVER w AS last_key,
        nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders WHERE o_orderkey % 100 = 0
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderkey""",
    "q_window_frames" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
        strftime(l_shipdate, '%Y-%m-%d') AS ship,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov4_qty,
        count(*) OVER (
          PARTITION BY l_suppkey ORDER BY l_orderkey
          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS cnt_range100
      FROM lineitem WHERE l_suppkey <= 10
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""",
    "q_window_topk_group" -> """
      SELECT * FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
          row_number() OVER (PARTITION BY l_suppkey
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem)
      WHERE rn <= 3 ORDER BY l_suppkey, rn""",
    "q_window_share" -> """
      SELECT o_orderkey, o_orderstatus,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
          OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS status_total,
        count(*) OVER (PARTITION BY o_orderstatus) AS status_cnt,
        CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) /
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
               OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS share
      FROM orders WHERE o_orderkey % 50 = 0
      ORDER BY o_orderkey""")
}
