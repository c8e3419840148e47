package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 18 (SURVEY.md §2.M):
  * Kaplan-Meier survival over customer lifetimes and SAX
  * symbolization of the daily event series.
  *
  * Determinism contract as the other r10 waves; the KM curve rides
  * the repo's exact micro-bit-log discipline (log2 of INTEGERS,
  * rounded to 1e-6 bits — the CorpusOps13 bridge) so the survival
  * product is an exact integer cumsum, never a float cumprod.
  */
object CorpusOps33 {

  private def lg(c: Column): Column =
    round(log2(c) * lit(1e6)).cast("long")

  /** Kaplan-Meier survival estimate (Kaplan & Meier, JASA 1958) of
    * customer lifetime — days between first and last order — with
    * right-censoring: a customer still ordering within 30 days of the
    * observation cutoff has not churned YET, and a naive "average
    * lifetime" would silently count them as dead (the bias KM
    * exists to remove). Per distinct lifetime t: the risk set, events,
    * censored exits, and the running log₂-survival
    * Σ [lg(n_t − d_t) − lg(n_t)] in exact micro-bits (S(t) =
    * 2^(s/1e6)); the terminal all-fail step emits NULL (S = 0 has no
    * finite log).
    *
    * Scale: one orders scan collapses to per-customer rows, then to
    * the lifetime axis (bounded by the date span); the cumsum windows
    * run over that bounded axis. */
  val qSurvKm: Q = (s, dir) => {
    val cust = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_o"),
        max(col("o_orderdate")).as("last_o"))
    val cutoff = cust.agg(max(col("last_o")).as("cutoff"))
    val lifetimes = cust.crossJoin(broadcast(cutoff))
      .select(datediff(col("last_o"), col("first_o")).cast("long")
          .as("t_days"),
        when(col("last_o") < date_sub(col("cutoff"), 30), 1L)
          .otherwise(0L).as("event"))
    val byT = lifetimes.groupBy(col("t_days"))
      .agg(sum(col("event")).as("d_events"),
        sum(lit(1L) - col("event")).as("c_censored"))
    val n = lifetimes.agg(count(lit(1)).as("n_total"))
    val w = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(n))
      .withColumn("n_risk", col("n_total") -
        coalesce(sum(col("d_events") + col("c_censored")).over(w), lit(0L)))
      .withColumn("contrib", when(col("d_events") === 0, 0L)
        .when(col("n_risk") > col("d_events"),
          lg(col("n_risk") - col("d_events")) - lg(col("n_risk")))
        .otherwise(lit(null).cast("long")))
      .withColumn("s_log2_micro",
        when(col("contrib").isNull, lit(null).cast("long"))
          .otherwise(sum(coalesce(col("contrib"), lit(0L))).over(wCum)))
      .select(col("t_days"), col("n_risk"), col("d_events"),
        col("c_censored"), col("s_log2_micro"))
      .orderBy(col("t_days"))
  }

  /** SAX symbolization (Lin, Keogh, Lonardi & Chiu, "A symbolic
    * representation of time series", DMKD 2003) of the daily event
    * count series, exact variant: the day axis splits into 8
    * contiguous PAA segments (sums, not means — integer-exact and
    * rank-equivalent when segments are equal length), and each
    * segment's symbol is its QUARTILE RANK among the 8 segment sums
    * (a–d) — the equi-depth binning that replaces the Gaussian
    * breakpoint table so the word is deterministic cross-engine.
    *
    * Scale: the series collapses to the calendar-bounded day table,
    * then to exactly 8 rows; every window runs on ≤8 rows. */
  val qTsSax: Q = (s, dir) => {
    val daily = Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val wDay = Window.orderBy(col("day"))
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    val seg = daily.crossJoin(broadcast(nDays))
      .withColumn("rn", row_number().over(wDay).cast("long"))
      .withColumn("segment", expr("(rn - 1) * 8 div n_days"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("days"), sum(col("y")).as("y_sum"))
    val wRank = Window.orderBy(col("y_sum"), col("segment"))
    seg
      .withColumn("qrank", row_number().over(wRank).cast("long"))
      .withColumn("symbol", expr(
        "chr(97 + CAST((qrank - 1) * 4 div 8 AS INT))"))
      .select(col("segment"), col("days"), col("y_sum"), col("symbol"))
      .orderBy(col("segment"))
  }

  val queries: Map[String, Q] = Map(
    "q_surv_km" -> qSurvKm,
    "q_ts_sax" -> qTsSax)

  val oracle: Map[String, String] = Map(
    "q_surv_km" -> """
      WITH cust AS (SELECT o_custkey, min(o_orderdate) AS first_o,
              max(o_orderdate) AS last_o
            FROM orders GROUP BY 1),
      cut AS (SELECT max(last_o) AS cutoff FROM cust),
      lt AS (SELECT CAST(date_diff('day', first_o, last_o) AS BIGINT)
               AS t_days,
              CASE WHEN last_o < cutoff - INTERVAL 30 DAY
                   THEN 1 ELSE 0 END AS event
            FROM cust CROSS JOIN cut),
      byt AS (SELECT t_days, CAST(sum(event) AS BIGINT) AS d_events,
                CAST(sum(1 - event) AS BIGINT) AS c_censored
              FROM lt GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lt),
      r AS (SELECT t_days, d_events, c_censored,
              CAST(n_total - coalesce(sum(d_events + c_censored) OVER
                (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
            FROM byt CROSS JOIN n),
      contrib AS (SELECT *,
              CASE WHEN d_events = 0 THEN 0
                   WHEN n_risk > d_events THEN
                     CAST(round(log2(n_risk - d_events) * 1000000)
                       AS BIGINT)
                     - CAST(round(log2(n_risk) * 1000000) AS BIGINT)
                   ELSE NULL END AS contrib
            FROM r)
      SELECT t_days, n_risk, d_events, c_censored,
        CASE WHEN contrib IS NULL THEN NULL
             ELSE CAST(sum(coalesce(contrib, 0)) OVER
               (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS BIGINT) END AS s_log2_micro
      FROM contrib ORDER BY t_days""",
    "q_ts_sax" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
      seg AS (SELECT (rn - 1) * 8 // n_days AS segment,
                CAST(count(*) AS BIGINT) AS days,
                CAST(sum(y) AS BIGINT) AS y_sum
              FROM (SELECT day, y, n_days,
                      CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                        AS rn
                    FROM daily CROSS JOIN nd)
              GROUP BY 1)
      SELECT segment, days, y_sum,
        chr(97 + CAST((row_number() OVER (ORDER BY y_sum, segment) - 1)
          * 4 // 8 AS INT)) AS symbol
      FROM seg ORDER BY segment""")
}
