package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 21 (SURVEY.md §2.M):
  * non-parametric trend testing (Mann-Kendall + Theil-Sen), the
  * Pareto-frontier (skyline) query as a windowed linear rewrite of
  * the quadratic dominance join, and a seasonal-naive forecast
  * backtest with MAPE scoring.
  *
  * Determinism contract (CorpusOps5-13): exact int64 arithmetic up to
  * at most one final IEEE op chain; integer divisions only on
  * non-negative operands (Spark `div` truncates, DuckDB `//` floors —
  * they agree only above zero, so signed ratios stay double).
  */
object CorpusOps14 {

  /** Daily revenue series shared by the trend tests: exact cents per
    * order day. The day axis is calendar-bounded, so every downstream
    * O(days²) pair set is a dimension-sized fan-out, never fact-sized. */
  private[ops] def dailyRevenue(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  /** Mann-Kendall trend test (Mann 1945, Kendall 1975) on the daily
    * revenue series: S = Σ_{i<j} sgn(x_j − x_i), with the
    * tie-adjusted variance 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5).
    * S and the variance terms are exact integers (the pair set is the
    * bounded day axis squared); the z statistic applies the standard
    * ±1 continuity correction and is the ONE double computation.
    *
    * Scale: the pair generator is a self-join of the DAY table (≤ ~10⁴
    * rows at any corpus size) blocked by i<j; the fact collapses to
    * days first. */
  val qTsMannKendall: Q = (s, dir) => {
    val d = dailyRevenue(s, dir)
    val a = d.select(col("day").as("di"), col("cents").as("xi"))
    val b = d.select(col("day").as("dj"), col("cents").as("xj"))
    val sStat = a.join(b, col("di") < col("dj"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s"))
    val nRow = d.agg(count(lit(1)).as("n"))
    val ties = d.groupBy(col("cents")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .select(coalesce(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)),
        lit(0L)).as("tie_adj"))
    sStat.crossJoin(broadcast(nRow)).crossJoin(broadcast(ties))
      .select(col("n"), col("s"),
        (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_adj"))
          .as("var18"))
      .withColumn("z", when(col("s") > 0,
          (col("s") - 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
        .when(col("s") < 0,
          (col("s") + 1).cast("double") /
            sqrt(col("var18").cast("double") / 18.0))
        .otherwise(lit(0.0)))
  }

  /** Theil-Sen robust slope estimator (Theil 1950, Sen 1968) for the
    * same series: the median of all pairwise slopes
    * (x_j − x_i)/(t_j − t_i). Each slope is ONE IEEE division of
    * exact integers (bit-identical both engines); the median is
    * percentile_disc — it PICKS an actual slope, no interpolation
    * arithmetic. Signed ratios stay double (see the module contract).
    *
    * Scale: same bounded day×day pair set as Mann-Kendall. */
  val qTsTheilSen: Q = (s, dir) => {
    val d = dailyRevenue(s, dir)
    val a = d.select(col("day").as("di"), col("cents").as("xi"))
    val b = d.select(col("day").as("dj"), col("cents").as("xj"))
    a.join(b, col("di") < col("dj"))
      .select(((col("xj") - col("xi")).cast("double") /
        datediff(col("dj"), col("di")).cast("double")).as("slope"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY slope)")
          .as("median_slope_cents_per_day"),
        expr("percentile_disc(0.10) WITHIN GROUP (ORDER BY slope)")
          .as("p10_slope"),
        expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY slope)")
          .as("p90_slope"))
  }

  /** Pareto-frontier (skyline) query over parts on (retail price ↓,
    * size ↓) — Börzsönyi/Kossmann/Stocker, "The Skyline Operator"
    * (ICDE 2001). A part is dominated iff another part is ≤ on both
    * dimensions and < on at least one. The textbook spelling is a
    * quadratic NOT EXISTS self-join (the DuckDB oracle runs exactly
    * that); HERE it is rewritten to two linear window passes over the
    * (price, size, key) sort: min size among STRICTLY cheaper rows
    * (range frame excluding the current price) and min size among
    * equal-price rows — dominance falls out of two comparisons. Same
    * result set, O(n log n) instead of O(n²): the algebraic rewrite
    * IS the scale path.
    *
    * Exactness: price in exact cents; all comparisons integer. */
  val qSkylineFrontier: Q = (s, dir) => {
    val p = Tables(s, dir, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("size"))
    val wCheaper = Window.orderBy(col("price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSamePrice = Window.partitionBy(col("price_cents"))
    val flagged = p
      .withColumn("min_size_cheaper", min(col("size")).over(wCheaper))
      .withColumn("min_size_same", min(col("size")).over(wSamePrice))
      // dominated by a strictly cheaper part with size <= mine, or by
      // an equal-price part with size < mine
      .withColumn("dominated",
        (col("min_size_cheaper").isNotNull &&
          col("min_size_cheaper") <= col("size")) ||
        col("min_size_same") < col("size"))
    flagged.filter(!col("dominated"))
      .select(col("p_partkey"), col("price_cents"), col("size"))
      .orderBy(col("price_cents"), col("size"), col("p_partkey"))
  }

  /** Seasonal-naive forecast backtest with MAPE (the forecasting
    * baseline every model must beat — Hyndman & Athanasopoulos, FPP):
    * forecast(day) = actual(day − 7); scored over the last 28 days of
    * the series. APE per day = |actual − forecast|·1e6 div actual
    * (actual > 0 cents: order days have revenue), MAPE = the exact
    * integer mean of the daily APEs — all integer, zero IEEE ops.
    *
    * Scale: the lag is ONE day-axis window (calendar-bounded); the
    * fact collapses to days first; no self-join. */
  val qForecastBacktest: Q = (s, dir) => {
    val d = dailyRevenue(s, dir)
    val wLag = Window.orderBy(col("day"))
    val wAll = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    d.withColumn("forecast_cents", lag(col("cents"), 7).over(wLag))
      .withColumn("max_day", max(col("day")).over(wAll))
      .filter(col("forecast_cents").isNotNull &&
        col("day") > date_sub(col("max_day"), 28))
      .withColumn("ape_micro", expr(
        "abs(cents - forecast_cents) * 1000000 div cents"))
      .withColumn("mape_micro",
        expr("sum(ape_micro) OVER () div count(1) OVER ()"))
      .select(col("day").cast("string").as("day"), col("cents"),
        col("forecast_cents"), col("ape_micro"), col("mape_micro"))
      .orderBy(col("day"))
  }

  /** Autocorrelation function of the daily revenue series at lags
    * 1..14 (the Box-Jenkins identification tool; lag 7 exposes the
    * weekly cycle q_seasonality_index models). Kept exact by scaling
    * out the mean as in q_ts_changepoint: with N observations and
    * total S, the centered value is c_t = N·x_t − S (exact int64);
    * num_k = Σ c_t·c_{t+k} and den = Σ c_t² ride DECIMAL(38,0)
    * (c² ≈ 1e24), and acf_k = num_k/den is ONE double division.
    * Lags index the OBSERVATION order (row number over day), the
    * standard treatment for a series with calendar gaps.
    *
    * Scale: the fact collapses to the bounded day axis first; the
    * 14× fan-out and the (t+k)-equi-join are day-table-sized. */
  val qTsAcf: Q = (s, dir) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = dailyRevenue(s, dir)
    val tot = d.agg(count(lit(1)).as("n"), sum(col("cents")).as("stot"))
    val idx = d.crossJoin(broadcast(tot))
      .withColumn("t", row_number().over(Window.orderBy(col("day"))))
      .select(col("t"),
        (col("n") * col("cents") - col("stot")).cast(dec38).as("c"))
    val den = idx.agg(sum(col("c") * col("c")).as("den"))
    val fan = idx.select(col("t"), col("c").as("ca"),
        explode(expr("sequence(1, 14)")).as("k"))
      .select((col("t") + col("k")).as("t2"),
        col("k").cast("long").as("k"), col("ca"))
    fan.join(idx.select(col("t").as("t2"), col("c").as("cb")), Seq("t2"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ca") * col("cb")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("k"), col("n_pairs"),
        (col("num").cast("double") / col("den").cast("double")).as("acf"))
      .orderBy(col("k"))
  }

  /** Nearest-event join (the kdb `aj`/`wj` sibling Spark lacks): for
    * every error event, the temporally NEAREST purchase by the same
    * user in EITHER direction — backward candidate = last purchase at
    * or before in (ts, event_id) order, forward = first after; the
    * winner minimizes the exact microsecond distance, ties to the
    * backward side. Generalizes q_join_asof (backward-only) and is
    * built the same scale-safe way: ONE user-keyed sort of the tagged
    * union, two IGNORE-NULLS window walks, no join at all.
    *
    * Exactness: distances are exact int64 microseconds; every
    * tie-break is pinned by (ts, event_id). */
  val qJoinNearest: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        when(col("event_type") === "purchase",
          struct(col("ts").as("bts"), col("event_id").as("bid")))
          .as("buy"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val walked = ev
      .withColumn("bw", last(col("buy"), ignoreNulls = true)
        .over(ord.rowsBetween(Long.MinValue, 0)))
      .withColumn("fw", first(col("buy"), ignoreNulls = true)
        .over(ord.rowsBetween(0, Long.MaxValue)))
      .filter(col("event_type") === "error")
      .withColumn("bw_diff",
        unix_micros(col("ts")) - unix_micros(col("bw.bts")))
      .withColumn("fw_diff",
        unix_micros(col("fw.bts")) - unix_micros(col("ts")))
    walked
      .withColumn("pick", when(col("bw").isNull, col("fw"))
        .when(col("fw").isNull, col("bw"))
        .when(col("bw_diff") <= col("fw_diff"), col("bw"))
        .otherwise(col("fw")))
      .filter(col("pick").isNotNull)
      .select(col("user_id"), col("event_id").as("error_id"),
        Tables.fmtTsUs(col("ts")).as("error_ts"),
        col("pick.bid").as("nearest_purchase_id"),
        Tables.fmtTsUs(col("pick.bts")).as("purchase_ts"),
        abs(unix_micros(col("ts")) - unix_micros(col("pick.bts")))
          .as("distance_us"))
      .orderBy(col("user_id"), col("error_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_ts_mannkendall" -> qTsMannKendall,
    "q_ts_theilsen" -> qTsTheilSen,
    "q_skyline_frontier" -> qSkylineFrontier,
    "q_forecast_backtest" -> qForecastBacktest,
    "q_ts_acf" -> qTsAcf,
    "q_join_nearest" -> qJoinNearest)

  private val dailySql = """
    SELECT CAST(o_orderdate AS DATE) AS day,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        AS cents
    FROM orders GROUP BY 1"""

  val oracle: Map[String, String] = Map(
    "q_ts_mannkendall" -> s"""
      WITH d AS ($dailySql),
      pairs AS (SELECT CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                    WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
                FROM d a JOIN d b ON a.day < b.day),
      nn AS (SELECT count(*) AS n FROM d),
      ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                 AS BIGINT) AS tie_adj
               FROM (SELECT count(*) AS t FROM d GROUP BY cents
                     HAVING count(*) > 1))
      SELECT n, s,
        n * (n - 1) * (2 * n + 5) - tie_adj AS var18,
        CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) /
            sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS DOUBLE)
              / 18.0)
          WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) /
            sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS DOUBLE)
              / 18.0)
          ELSE 0.0 END AS z
      FROM pairs, nn, ties""",
    "q_ts_theilsen" -> s"""
      WITH d AS ($dailySql),
      slopes AS (SELECT CAST(b.cents - a.cents AS DOUBLE) /
                   CAST(date_diff('day', a.day, b.day) AS DOUBLE)
                   AS slope
                 FROM d a JOIN d b ON a.day < b.day)
      SELECT count(*) AS n_pairs,
        quantile_disc(slope, 0.50) AS median_slope_cents_per_day,
        quantile_disc(slope, 0.10) AS p10_slope,
        quantile_disc(slope, 0.90) AS p90_slope
      FROM slopes""",
    "q_skyline_frontier" -> """
      WITH p AS (SELECT p_partkey,
                   CAST(round(p_retailprice * 100) AS BIGINT)
                     AS price_cents,
                   CAST(p_size AS BIGINT) AS size
                 FROM part)
      SELECT p_partkey, price_cents, size
      FROM p a
      WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.price_cents <= a.price_cents AND b.size <= a.size
          AND (b.price_cents < a.price_cents OR b.size < a.size))
      ORDER BY price_cents, size, p_partkey""",
    "q_forecast_backtest" -> s"""
      WITH d AS ($dailySql),
      lagd AS (SELECT day, cents,
                 lag(cents, 7) OVER (ORDER BY day) AS forecast_cents,
                 max(day) OVER () AS max_day
               FROM d),
      bt AS (SELECT day, cents, forecast_cents,
               CAST(abs(cents - forecast_cents) * 1000000 // cents
                 AS BIGINT) AS ape_micro
             FROM lagd
             WHERE forecast_cents IS NOT NULL
               AND day > max_day - INTERVAL 28 DAY)
      SELECT CAST(day AS VARCHAR) AS day, cents, forecast_cents,
        ape_micro,
        CAST(sum(ape_micro) OVER () // count(*) OVER () AS BIGINT)
          AS mape_micro
      FROM bt ORDER BY day""",
    "q_ts_acf" -> s"""
      WITH d AS ($dailySql),
      tot AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS stot
              FROM d),
      idx AS (SELECT row_number() OVER (ORDER BY day) AS t,
                CAST(n * cents - stot AS HUGEINT) AS c
              FROM d CROSS JOIN tot),
      den AS (SELECT sum(c * c) AS den FROM idx),
      fan AS (SELECT t + k AS t2, CAST(k AS BIGINT) AS k, c AS ca
              FROM idx, unnest(generate_series(1, 14)) AS g(k)),
      agg AS (SELECT k, count(*) AS n_pairs,
                sum(fan.ca * idx.c) AS num
              FROM fan JOIN idx ON idx.t = fan.t2
              GROUP BY k)
      SELECT k, n_pairs,
        CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
      FROM agg CROSS JOIN den ORDER BY k""",
    "q_join_nearest" -> """
      WITH ev AS (SELECT user_id, ts, event_id, event_type,
          CASE WHEN event_type = 'purchase' THEN ts END AS bts,
          CASE WHEN event_type = 'purchase' THEN event_id END AS bid
        FROM events WHERE event_type IN ('error', 'purchase')),
      w AS (SELECT user_id, ts, event_id, event_type,
          last_value(bts IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bw_ts,
          last_value(bid IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bw_id,
          first_value(bts IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fw_ts,
          first_value(bid IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fw_id
        FROM ev),
      e AS (SELECT * FROM w WHERE event_type = 'error'),
      p AS (SELECT user_id, event_id AS error_id, ts,
              CASE WHEN bw_ts IS NULL THEN fw_id
                WHEN fw_ts IS NULL THEN bw_id
                WHEN date_diff('microsecond', bw_ts, ts) <=
                     date_diff('microsecond', ts, fw_ts) THEN bw_id
                ELSE fw_id END AS nearest_purchase_id,
              CASE WHEN bw_ts IS NULL THEN fw_ts
                WHEN fw_ts IS NULL THEN bw_ts
                WHEN date_diff('microsecond', bw_ts, ts) <=
                     date_diff('microsecond', ts, fw_ts) THEN bw_ts
                ELSE fw_ts END AS pts
            FROM e)
      SELECT user_id, error_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
        nearest_purchase_id,
        strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        CAST(abs(date_diff('microsecond', pts, ts)) AS BIGINT)
          AS distance_us
      FROM p WHERE nearest_purchase_id IS NOT NULL
      ORDER BY user_id, error_id""")
}
