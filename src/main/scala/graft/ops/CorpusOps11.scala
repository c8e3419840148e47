package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 18 (SURVEY.md §2.M):
  * latest-wins CDC log compaction, the DAU/WAU/MAU engagement rollup,
  * per-type daily-traffic trend (OLS slope), and a join-cardinality
  * estimator audit (the optimizer-statistics sanity check).
  *
  * Determinism contract (CorpusOps5-10): exact int64 arithmetic up to
  * at most one final IEEE division; every integer division has
  * non-negative operands so Spark `div` and DuckDB `//` agree.
  */
object CorpusOps11 {

  /** Latest-wins CDC log compaction (the Kafka log-compaction /
    * Debezium-snapshot semantics, and the table-format MERGE
    * pre-pass): treat events as a change log keyed by user_id —
    * 'error' rows are tombstones (DELETE), everything else an UPSERT —
    * versioned by (ts, event_id), and materialize the final state:
    * one row per key that survives (latest op not a tombstone),
    * carrying the last payload and a change count. Complements
    * q_dml_merge (one-batch MERGE) and q_dim_scd2 (history-keeping):
    * this is the compact-to-latest path a streaming ingest runs before
    * serving.
    *
    * Exactness: (ts, event_id) is a unique total order per key
    * (event_id is unique), so "latest" is deterministic; the payload
    * double is passed through untouched (no arithmetic).
    *
    * Scale: ONE key-partitioned window sort (the co-partitioned shape
    * Spark executes as a single shuffle on user_id); no self-join, no
    * global sort. Log-compaction state per key is one row. */
  val qCdcCompact: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("user_id"), col("n_changes"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"),
        Tables.fmtTsUs(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** DAU / WAU / MAU engagement rollup with the stickiness ratio
    * (DAU/MAU permille — the product-analytics headline number): per
    * observed activity day, distinct users that day, in the trailing
    * 7 days, and in the trailing 28 days. The trailing-distinct is
    * computed WITHOUT a range join: each distinct (user, day) pair
    * fans out to the ≤28 future bucket-days it is visible from, and a
    * conditional distinct-count per bucket collapses the three bands
    * in one aggregate — bounded 28× fan-out of USER-DAY pairs (already
    * deduped, far smaller than raw events), never events × days.
    *
    * Scale: user-day dedup is one partial-aggregated shuffle; the
    * fan-out is map-side; the distinct-count shuffle carries
    * (bucket_day, user) pairs. The observed-day semi-join keeps the
    * output to real activity days. */
  val qRollupDau: Q = (s, dir) => {
    val userDays = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val observed = userDays.select(col("d")).distinct()
    // per (bucket day, user): the NEAREST activity day's offset — then
    // min_k == 0 ⇔ active that day, < 7 ⇔ within the week. One plain
    // aggregate per band instead of a 3-way distinct expansion (the
    // multi-countDistinct Expand tripled the fan-out rows; this shape
    // benches 2.2 s → 1.3 s at sf0.1).
    userDays
      .select(col("user_id"), col("d"),
        explode(expr("sequence(0, 27)")).as("k"))
      .select(col("user_id"), col("k"),
        date_add(col("d"), col("k")).as("day"))
      .join(observed.withColumnRenamed("d", "day"), Seq("day"))
      .groupBy(col("day"), col("user_id"))
      .agg(min(col("k")).as("min_k"))
      .groupBy(col("day"))
      .agg(
        sum(when(col("min_k") === 0, 1L).otherwise(0L)).as("dau"),
        sum(when(col("min_k") < 7, 1L).otherwise(0L)).as("wau"),
        count(lit(1)).as("mau"))
      .select(col("day").cast("string").as("day"), col("dau"), col("wau"),
        col("mau"), expr("dau * 1000 div mau").as("stickiness_permille"))
      .orderBy(col("day"))
  }

  /** Per-event-type daily-traffic trend: OLS slope of daily counts on
    * the day index (days since the global min date) — the
    * capacity-planning companion of q_seasonality_index (is traffic
    * growing, and how fast per day?). Exact integer num/den + ONE
    * IEEE division (the q_text_zipf regression discipline; negative
    * numerators are why this is a ratio, not an integer div).
    *
    * Scale: daily cells are one partial-aggregated |types|×|days|
    * shuffle; the global min date is a broadcast 1-row scalar; the
    * regression collapses each type's day series to one row. */
  val qTsTrend: Q = (s, dir) => {
    val daily = Tables(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y"))
    val t0 = daily.agg(min(col("d")).as("d0"))
    daily.crossJoin(broadcast(t0))
      .select(col("event_type"), col("y"),
        datediff(col("d"), col("d0")).cast("long").as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
      .withColumn("slope_per_day", col("slope_num").cast("double") /
        col("slope_den").cast("double"))
      .orderBy(col("event_type"))
  }

  /** Join-cardinality estimator audit: for the lineitem self-join on
    * l_partkey, compare the uniform-NDV estimate the classic optimizer
    * formula gives — |R|·|S| / ndv(key) — against the true output size
    * Σ c(k)², plus the single hottest key's share. This is the CBO
    * statistics sanity check: err near 1000 permille = uniform stats
    * suffice; a large max_key_share is the "salt this join" signal
    * (q_skew_diagnose's decision input, quantified on the actual
    * join). Catalyst uses exactly this estimate in
    * `JoinEstimation.estimateInnerOuterJoin`.
    *
    * Exactness/scale: per-key counts are one partial-aggregated
    * shuffle; all three statistics fold in the same tiny aggregate;
    * nothing materializes the join itself — the audit is O(keys), the
    * join would be O(Σc²). */
  val qJoinCardAudit: Q = (s, dir) => {
    val perKey = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    perKey
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("ndv"),
        sum(col("c") * col("c")).as("actual_pairs"),
        max(col("c") * col("c")).as("max_key_pairs"))
      .select(col("n_rows"), col("ndv"),
        expr("n_rows * n_rows div ndv").as("est_pairs"),
        col("actual_pairs"),
        expr("(n_rows * n_rows div ndv) * 1000 div actual_pairs")
          .as("est_over_actual_permille"),
        expr("max_key_pairs * 1000 div actual_pairs")
          .as("max_key_share_permille"))
  }

  val queries: Map[String, Q] = Map(
    "q_cdc_compact" -> qCdcCompact,
    "q_rollup_dau" -> qRollupDau,
    "q_ts_trend" -> qTsTrend,
    "q_join_card_audit" -> qJoinCardAudit)

  val oracle: Map[String, String] = Map(
    "q_cdc_compact" -> """
      WITH log AS (SELECT user_id, ts, event_id, event_type, value,
          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn,
          count(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events)
      SELECT user_id, n_changes, event_type AS last_event_type,
        value AS last_value,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
      FROM log WHERE rn = 1 AND op = 'U'
      ORDER BY user_id""",
    "q_rollup_dau" -> """
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                  FROM events),
      obs AS (SELECT DISTINCT d FROM ud),
      fan AS (SELECT user_id, k, d + CAST(k AS INT) AS day
              FROM ud, unnest(generate_series(0, 27)) AS t(k)),
      vis AS (SELECT fan.* FROM fan JOIN obs ON fan.day = obs.d)
      SELECT CAST(day AS VARCHAR) AS day,
        count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS dau,
        count(DISTINCT CASE WHEN k < 7 THEN user_id END) AS wau,
        count(DISTINCT user_id) AS mau,
        count(DISTINCT CASE WHEN k = 0 THEN user_id END) * 1000
          // count(DISTINCT user_id) AS stickiness_permille
      FROM vis GROUP BY day ORDER BY day""",
    "q_ts_trend" -> """
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                       count(*) AS y
                     FROM events GROUP BY 1, 2),
      t0 AS (SELECT min(d) AS d0 FROM daily),
      xy AS (SELECT event_type, CAST(y AS BIGINT) AS y,
               CAST(d - d0 AS BIGINT) AS x
             FROM daily CROSS JOIN t0),
      agg AS (SELECT event_type, count(*) AS n_days,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM xy GROUP BY 1)
      SELECT event_type, n_days,
        n_days * sxy - sx * sy AS slope_num,
        n_days * sxx - sx * sx AS slope_den,
        CAST(n_days * sxy - sx * sy AS DOUBLE) /
          CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope_per_day
      FROM agg ORDER BY event_type""",
    "q_join_card_audit" -> """
      WITH pk AS (SELECT l_partkey, count(*) AS c
                  FROM lineitem GROUP BY 1),
      agg AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                count(*) AS ndv,
                CAST(sum(c * c) AS BIGINT) AS actual_pairs,
                CAST(max(c * c) AS BIGINT) AS max_key_pairs
              FROM pk)
      SELECT n_rows, ndv, n_rows * n_rows // ndv AS est_pairs,
        actual_pairs,
        (n_rows * n_rows // ndv) * 1000 // actual_pairs
          AS est_over_actual_permille,
        max_key_pairs * 1000 // actual_pairs AS max_key_share_permille
      FROM agg""")
}
