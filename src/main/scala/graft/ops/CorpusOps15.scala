package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 23 (SURVEY.md §2.M):
  * trimmed/winsorized robust means, longest consecutive-day streaks
  * (gaps-and-islands on the calendar), and conditional next-event
  * entropy over the journey transition matrix.
  *
  * Determinism contract (CorpusOps5-14): exact int64/DECIMAL(38,0)
  * arithmetic up to at most one final IEEE division; integer
  * divisions only on non-negative operands.
  */
object CorpusOps15 {

  private def lg(c: org.apache.spark.sql.Column) =
    round(log2(c) * lit(1e6)).cast("long")

  /** Trimmed (drop the outer deciles) and winsorized (clamp to them)
    * means of line revenue per return flag — the robust-mean pair that
    * complements q_robust_stats' IQR fences (Tukey, EDA 1977). Rank
    * cutoffs are exact integer arithmetic on the per-group row_number;
    * the two means are exact micro-cents via DECIMAL(38,0) integral
    * division (sum·1e6 tops int64 at corpus scale).
    *
    * Scale: ONE per-group sort window (the same shuffle the exact
    * percentile family already pays), then a partial-aggregated
    * rollup; the decile boundary VALUES broadcast back via the
    * conditional-max trick, no second sort. */
  val qAggTrimmed: Q = (s, dir) => {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long").as("v"))
    val ranked = cents
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
      .withColumn("n", count(lit(1)).over(Window
        .partitionBy(col("l_returnflag"))))
      .withColumn("lo_rn", expr("n div 10"))
      .withColumn("hi_rn", expr("n - n div 10"))
    val bounds = ranked.groupBy(col("l_returnflag"))
      .agg(max(when(col("rn") === col("lo_rn") + 1, col("v"))).as("p10_v"),
        max(when(col("rn") === col("hi_rn"), col("v"))).as("p90_v"))
    ranked.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("n")).as("n"),
        sum(when(col("rn") > col("lo_rn") && col("rn") <= col("hi_rn"),
          col("v"))).cast(dec38).as("trim_sum"),
        sum(when(col("rn") > col("lo_rn") && col("rn") <= col("hi_rn"), 1L)
          .otherwise(0L)).as("trim_n"),
        sum(greatest(least(col("v"), col("p90_v")), col("p10_v")))
          .cast(dec38).as("win_sum"))
      .select(col("l_returnflag"), col("n"), col("trim_n"),
        expr("CAST(trim_sum * 1000000 div trim_n AS BIGINT)")
          .as("trimmed_mean_microcents"),
        expr("CAST(win_sum * 1000000 div n AS BIGINT)")
          .as("winsorized_mean_microcents"))
      .orderBy(col("l_returnflag"))
  }

  /** Longest consecutive-day ordering streak per customer — the
    * gaps-and-islands pattern on the CALENDAR (q_matchpath numbers
    * islands over event rows; this one subtracts the rank from the
    * day so every consecutive run shares one anchor date). The
    * engagement-streak metric every retention dashboard ships.
    *
    * Exactness: date − rank days is pure integer date arithmetic;
    * streak length is a count.
    *
    * Scale: distinct (customer, day) partial-aggregates on the fact;
    * the rank window partitions BY CUSTOMER (bounded rows each); the
    * rollups partial-aggregate. Only customers with a streak ≥ 2 days
    * emit (single-day customers carry no signal and would dominate
    * the output). */
  val qStreakLongest: Q = (s, dir) => {
    val days = Tables(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .distinct()
    val islands = days
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("o_custkey")).orderBy(col("day"))))
      .withColumn("anchor", expr("date_sub(day, rn)"))
      .groupBy(col("o_custkey"), col("anchor"))
      .agg(count(lit(1)).as("len"),
        min(col("day")).as("streak_start"))
    islands
      .withColumn("max_len", max(col("len")).over(Window
        .partitionBy(col("o_custkey"))))
      .groupBy(col("o_custkey"))
      .agg(max(col("len")).as("longest_streak_days"),
        count(lit(1)).as("n_streaks"),
        min(when(col("len") === col("max_len"), col("streak_start")))
          .as("first_longest_start"))
      .filter(col("longest_streak_days") >= 2)
      .select(col("o_custkey"), col("longest_streak_days"),
        col("n_streaks"),
        col("first_longest_start").cast("string").as("first_longest_start"))
      .orderBy(col("o_custkey"))
  }

  /** Conditional next-event entropy H(next | current) per event type —
    * the journey-predictability number on top of the Markov transition
    * matrix (q_path_transitions): for current type t with row total
    * c_t and successor counts c_tn, H = lg(c_t) − (Σ c_tn·lg(c_tn))/c_t
    * micro-bits. The integer decomposition H_num = c_t·lg(c_t) −
    * Σ c_tn·lg(c_tn) is exact (micro-bit logs of INTEGERS — the
    * q_mix_kl discipline); the ONE IEEE division by c_t lands the
    * per-type entropy. Low entropy = scripted path; high = exploratory.
    *
    * Scale: successor pairs are one per-user window pass (the same
    * shuffle the transition matrix pays), then all state collapses to
    * the |types|² matrix. */
  val qPathEntropy: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("c_tn"))
    val rows = trans.groupBy(col("cur"))
      .agg(sum(col("c_tn")).as("c_t"), count(lit(1)).as("n_successors"),
        sum(col("c_tn") * lg(col("c_tn"))).as("sum_cn_lg"))
    rows
      .select(col("cur"), col("c_t"), col("n_successors"),
        (col("c_t") * lg(col("c_t")) - col("sum_cn_lg")).as("h_num"))
      .withColumn("entropy_microbits",
        col("h_num").cast("double") / col("c_t").cast("double"))
      .orderBy(col("cur"))
  }

  val queries: Map[String, Q] = Map(
    "q_agg_trimmed" -> qAggTrimmed,
    "q_streak_longest" -> qStreakLongest,
    "q_path_entropy" -> qPathEntropy)

  val oracle: Map[String, String] = Map(
    "q_agg_trimmed" -> """
      WITH cents AS (SELECT l_returnflag,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                       l_orderkey, l_linenumber
                     FROM lineitem),
      ranked AS (SELECT l_returnflag, v,
                   CAST(row_number() OVER (PARTITION BY l_returnflag
                     ORDER BY v, l_orderkey, l_linenumber) AS BIGINT)
                     AS rn,
                   CAST(count(*) OVER (PARTITION BY l_returnflag)
                     AS BIGINT) AS n
                 FROM cents),
      cut AS (SELECT *, n // 10 AS lo_rn, n - n // 10 AS hi_rn
              FROM ranked),
      bounds AS (SELECT l_returnflag,
                   max(CASE WHEN rn = lo_rn + 1 THEN v END) AS p10_v,
                   max(CASE WHEN rn = hi_rn THEN v END) AS p90_v
                 FROM cut GROUP BY 1)
      SELECT c.l_returnflag, max(c.n) AS n,
        CAST(sum(CASE WHEN rn > lo_rn AND rn <= hi_rn THEN 1 ELSE 0
          END) AS BIGINT) AS trim_n,
        CAST(CAST(sum(CASE WHEN rn > lo_rn AND rn <= hi_rn THEN v END)
            AS HUGEINT) * 1000000
          // sum(CASE WHEN rn > lo_rn AND rn <= hi_rn THEN 1 ELSE 0
            END) AS BIGINT) AS trimmed_mean_microcents,
        CAST(CAST(sum(greatest(least(v, p90_v), p10_v)) AS HUGEINT)
          * 1000000 // max(c.n) AS BIGINT)
          AS winsorized_mean_microcents
      FROM cut c JOIN bounds b ON c.l_returnflag = b.l_returnflag
      GROUP BY c.l_returnflag ORDER BY c.l_returnflag""",
    "q_streak_longest" -> """
      WITH days AS (SELECT DISTINCT o_custkey,
                      CAST(o_orderdate AS DATE) AS day
                    FROM orders),
      islands AS (SELECT o_custkey,
                    day - CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY day) AS INT) AS anchor,
                    day
                  FROM days),
      st AS (SELECT o_custkey, anchor, count(*) AS len,
               min(day) AS streak_start
             FROM islands GROUP BY 1, 2),
      stm AS (SELECT *, max(len) OVER (PARTITION BY o_custkey)
                AS max_len
              FROM st),
      agg AS (SELECT o_custkey,
                CAST(max(len) AS BIGINT) AS longest_streak_days,
                count(*) AS n_streaks,
                min(CASE WHEN len = max_len THEN streak_start END)
                  AS first_longest_start
              FROM stm GROUP BY o_custkey)
      SELECT o_custkey, longest_streak_days, n_streaks,
        CAST(first_longest_start AS VARCHAR) AS first_longest_start
      FROM agg WHERE longest_streak_days >= 2
      ORDER BY o_custkey""",
    "q_path_entropy" -> """
      WITH seq AS (SELECT event_type AS cur,
                     lead(event_type, 1) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
                   FROM events),
      trans AS (SELECT cur, nxt, count(*) AS c_tn
                FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
      rows_ AS (SELECT cur, CAST(sum(c_tn) AS BIGINT) AS c_t,
                  count(*) AS n_successors,
                  CAST(sum(c_tn * CAST(round(log2(c_tn) * 1000000)
                    AS BIGINT)) AS BIGINT) AS sum_cn_lg
                FROM trans GROUP BY 1)
      SELECT cur, c_t, n_successors,
        c_t * CAST(round(log2(c_t) * 1000000) AS BIGINT) - sum_cn_lg
          AS h_num,
        CAST(c_t * CAST(round(log2(c_t) * 1000000) AS BIGINT)
          - sum_cn_lg AS DOUBLE) / CAST(c_t AS DOUBLE)
          AS entropy_microbits
      FROM rows_ ORDER BY cur""")
}
