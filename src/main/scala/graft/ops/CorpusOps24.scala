package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus + analytics operators, r10 wave 7 (SURVEY.md §2.M/§2.E):
  * MATCH_RECOGNIZE-style conversion MEASURES and an exact-integer
  * anomaly gate over the STL residuals.
  *
  * Determinism contract as the other r10 waves.
  */
object CorpusOps24 {

  /** Per-conversion MEASURES — the SQL:2016 MATCH_RECOGNIZE surface
    * beyond q_event_pattern's match COUNTS: for every purchase that
    * closes a view→purchase funnel (a prior view with no purchase in
    * between), emit the opening view's timestamp, the purchase
    * timestamp, the exact wait in microseconds, and how many events
    * happened in between — FIRST(A.ts)/LAST(B.ts)-style navigation
    * expressed as running per-user window picks:
    * last-view-so-far and last-purchase-so-far over a 1-PRECEDING
    * frame decide match boundaries without any self-join.
    *
    * Exactness: timestamps compare as micros (unix_micros ↔ epoch_us),
    * waits are integer micro differences, event gaps are row_number
    * differences.
    *
    * Scale: three window functions over ONE per-user sort (same
    * exchange); no joins at all. */
  val qEventConversions: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .withColumn("last_v_us", max(when(col("event_type") === "view",
        expr("unix_micros(ts)"))).over(wPrev))
      .withColumn("last_v_rn", max(when(col("event_type") === "view",
        col("rn"))).over(wPrev))
      .withColumn("prev_p_us", max(when(col("event_type") === "purchase",
        expr("unix_micros(ts)"))).over(wPrev))
    ev.filter(col("event_type") === "purchase" &&
        col("last_v_us").isNotNull &&
        (col("prev_p_us").isNull || col("last_v_us") > col("prev_p_us")))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("last_v_us").as("view_us"),
        expr("unix_micros(ts)").as("purchase_us"),
        (expr("unix_micros(ts)") - col("last_v_us")).as("wait_us"),
        (col("rn") - col("last_v_rn") - 1).cast("long")
          .as("events_between"))
      .orderBy(col("user_id"), col("purchase_us"), col("purchase_id"))
  }

  /** Anomaly gate over the seasonal decomposition
    * ([[CorpusOps23.qTsStlDecompose]]'s construction): a day is
    * anomalous when its deweekended deviation exceeds 2× the corpus
    * mean deviation. Kept EXACT by clearing the per-day-of-week mean's
    * denominator: dev_milli(day) = |detr7·cnt_dow − sum_dow| · 1000
    * div (cnt_dow) — integer permille-of-×7-units, comparable across
    * dows — and the 2× mean-deviation threshold is one more exact
    * integer division. The "was Tuesday actually unusual, or is that
    * just what Tuesdays look like" gate that raw z-scores on the
    * undecomposed series get wrong.
    *
    * Scale: the day axis is calendar-bounded; every aggregate after
    * the one events→days shuffle is day-table-sized. */
  val qTsAnomalyStl: Q = (s, dir) => {
    val daily = Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val detr = daily
      .withColumn("trend7",
        when(count(lit(1)).over(w7) === 7, sum(col("y")).over(w7)))
      .withColumn("dow", dayofweek(col("day")))
      .withColumn("detr7", col("y") * 7 - col("trend7"))
      .filter(col("detr7").isNotNull)
    val seas = detr.groupBy(col("dow"))
      .agg(sum(col("detr7")).as("sum_dow"), count(lit(1)).as("cnt_dow"))
    val dev = detr.join(broadcast(seas), Seq("dow"))
      .withColumn("dev_milli", expr(
        "abs(detr7 * cnt_dow - sum_dow) * 1000 div cnt_dow"))
    val thr = dev.agg(
      expr("(sum(dev_milli) * 2) div count(1)").as("thr2x"))
    dev.crossJoin(broadcast(thr))
      .select(col("day").cast("string").as("day"), col("y"),
        col("dow").cast("long").as("dow"), col("dev_milli"),
        col("thr2x"), (col("dev_milli") > col("thr2x")).as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Brier score of the decile-calibrated classifier (Brier 1950; the
    * proper scoring rule that complements q_calibration_bins'
    * reliability table with ONE number): each doc's predicted
    * probability is its decile bin's empirical positive rate in
    * permille, and brier_micro = Σ (p_permille − 1000·pos)² div n —
    * micro-units of probability², exact integers to the last division.
    * The uncertainty floor p̄(1000−p̄) div 1000 (Murphy decomposition's
    * irreducible term, same units) is emitted alongside: a useful
    * score sits well below it.
    *
    * Scale: bins come from the scale-safe bucketed ntile (no
    * unpartitioned window); everything else is one doc-level join
    * against the 10-row bin table + one aggregate. */
  val qEvalBrier: Q = (s, dir) => {
    val sc = graft.CacheScope.track(CorpusOps10.scored(s, dir).persist())
    val binned = graft.CacheScope.track(
      ScaleWindows.bucketedNtile(sc, 10, expr("score_milli div 64"), false,
        Seq(col("score_milli").asc, col("doc_id").asc), "bin").persist())
    val rates = binned.groupBy(col("bin"))
      .agg(expr("sum(pos) * 1000 div count(1)").as("p_permille"))
    binned.join(broadcast(rates), Seq("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pos")).as("n_pos"),
        expr("""sum((p_permille - 1000 * pos) * (p_permille - 1000 * pos))
                div count(1)""").as("brier_micro"))
      .withColumn("uncertainty_micro", expr(
        """(n_pos * 1000 div n_docs) * (1000 - n_pos * 1000 div n_docs)
           div 1000"""))
  }

  val queries: Map[String, Q] = Map(
    "q_event_conversions" -> qEventConversions,
    "q_eval_brier" -> qEvalBrier,
    "q_ts_anomaly_stl" -> qTsAnomalyStl)

  val oracle: Map[String, String] = Map(
    "q_event_conversions" -> """
      WITH numbered AS (SELECT user_id, ts, event_id, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS rn
        FROM events),
      ev AS (SELECT user_id, ts, event_id, event_type, rn,
          max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
            OVER wp AS last_v_us,
          max(CASE WHEN event_type = 'view' THEN rn END)
            OVER wp AS last_v_rn,
          max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
            OVER wp AS prev_p_us
        FROM numbered
        WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT user_id, event_id AS purchase_id,
        CAST(last_v_us AS BIGINT) AS view_us,
        CAST(epoch_us(ts) AS BIGINT) AS purchase_us,
        CAST(epoch_us(ts) - last_v_us AS BIGINT) AS wait_us,
        CAST(rn - last_v_rn - 1 AS BIGINT) AS events_between
      FROM ev
      WHERE event_type = 'purchase' AND last_v_us IS NOT NULL
        AND (prev_p_us IS NULL OR last_v_us > prev_p_us)
      ORDER BY user_id, purchase_us, purchase_id""",
    "q_eval_brier" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      binned AS (SELECT *, ntile(10) OVER (ORDER BY score_milli, doc_id)
                   AS bin FROM scored),
      rates AS (SELECT bin,
                  CAST(sum(pos) AS BIGINT) * 1000 // count(*)
                    AS p_permille
                FROM binned GROUP BY 1)
      SELECT count(*) AS n_docs,
        CAST(sum(pos) AS BIGINT) AS n_pos,
        CAST(sum((p_permille - 1000 * pos) * (p_permille - 1000 * pos))
          AS BIGINT) // count(*) AS brier_micro,
        (CAST(sum(pos) AS BIGINT) * 1000 // count(*))
          * (1000 - CAST(sum(pos) AS BIGINT) * 1000 // count(*)) // 1000
          AS uncertainty_micro
      FROM binned JOIN rates USING (bin)""",
    "q_ts_anomaly_stl" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS y
                     FROM events GROUP BY 1),
      t AS (SELECT day, y,
              CASE WHEN count(*) OVER w = 7
                   THEN CAST(sum(y) OVER w AS BIGINT) END AS trend7,
              CAST(dayofweek(day) AS BIGINT) + 1 AS dow
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
                         AND 3 FOLLOWING)),
      dt AS (SELECT day, y, dow, y * 7 - trend7 AS detr7 FROM t
             WHERE trend7 IS NOT NULL),
      seas AS (SELECT dow, CAST(sum(detr7) AS BIGINT) AS sum_dow,
                 CAST(count(*) AS BIGINT) AS cnt_dow
               FROM dt GROUP BY 1),
      dev AS (SELECT dt.day, dt.y, dt.dow,
                abs(dt.detr7 * seas.cnt_dow - seas.sum_dow) * 1000
                  // seas.cnt_dow AS dev_milli
              FROM dt JOIN seas USING (dow)),
      thr AS (SELECT CAST(sum(dev_milli) * 2 // count(*) AS BIGINT)
                AS thr2x FROM dev)
      SELECT CAST(day AS VARCHAR) AS day, y, dow, dev_milli,
        thr.thr2x, dev_milli > thr.thr2x AS is_anomaly
      FROM dev CROSS JOIN thr ORDER BY day""")
}
