package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 15 (SURVEY.md §2.M): Heaps'-law
  * vocabulary growth, point-in-time-correct feature/label extraction,
  * and a hash-randomized A/B experiment readout. Same exact-int64
  * determinism contract as CorpusOps5-8.
  */
object CorpusOps9 {

  /** Heaps'-law vocabulary growth fit (Heaps 1978): sample the
    * (tokens seen, distinct vocabulary) curve at every 25th document
    * of the doc_id order, then OLS-fit log V = log K + beta * log N —
    * the corpus-health companion of q_text_zipf (natural text:
    * beta ~ 0.4-0.6; beta near 1 means unbounded junk vocabulary,
    * near 0 means template text). The cumulative-distinct curve is
    * computed WITHOUT a sequential scan: a word contributes exactly at
    * its FIRST document (min doc_id per word), so per-doc new-word
    * counts cumsum to V(t) on the SAME doc-order window that cumsums
    * tokens — no range join, no fan-out, no running distinct state.
    *
    * Exactness: the checkpoint curve is exact integers; the OLS runs
    * on milli-bit logs with the exact integer num/den and ONE IEEE
    * division (the q_text_zipf discipline).
    *
    * Scale: first-occurrence is one word-keyed partial-aggregated
    * shuffle that collapses to per-doc new-word counts; the one
    * ordered window runs over DOC rows (and decomposes per-bucket
    * like q_budget_select when even docs overflow a partition); the
    * regression reduces ~corpus/25 checkpoint rows to one. */
  val qVocabGrowth: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
    val newWords = toks
      .select(col("doc_id"), explode(col("a")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("nw"))
    val w = Window.orderBy(col("doc_id")).rowsBetween(Long.MinValue, 0)
    val curve = toks
      .select(col("doc_id"), size(col("a")).cast("long").as("ntok"))
      .join(newWords, col("doc_id") === col("first_doc"), "left")
      .withColumn("cum_tokens", sum(col("ntok")).over(w))
      .withColumn("vocab", sum(coalesce(col("nw"), lit(0L))).over(w))
      .filter(col("doc_id") % 25 === 0)
    def lgm(c: org.apache.spark.sql.Column) =
      round(log2(c) * lit(1e3)).cast("long")
    curve.select(lgm(col("cum_tokens")).as("x"), lgm(col("vocab")).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx"), col("sy"),
        expr("n * sxy - sx * sy").as("beta_num"),
        expr("n * sxx - sx * sx").as("beta_den"))
      .withColumn("heaps_beta",
        col("beta_num").cast("double") / col("beta_den").cast("double"))
  }

  /** Point-in-time-correct feature/label extraction: features computed
    * ONLY from events before the cutoff (the last quartile boundary of
    * event time), the label ONLY from events after it — the temporal
    * discipline that prevents target leakage in a churn/propensity
    * model (the ML-feature twin of q_split_leakage_safe's document
    * split and q_join_pit_scd2's dimension lookup). Cutoff = max ts
    * minus 25% of the observed span, exact in integer micros.
    *
    * Scale: the cutoff is a broadcast 1-row scalar; features and
    * labels are each one partial-aggregated shuffle over their slice;
    * the final join is user-keyed and co-partitioned. */
  val qFeatureLabelSplit: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val cut = ev.agg((max(col("us")) -
      expr("(max(us) - min(us)) div 4")).as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cut))
    val features = tagged.filter(col("us") < col("cut_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("f_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("f_purchases"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("f_clicks"),
        countDistinct(col("event_type")).as("f_types"),
        max(col("us")).as("f_last_us"))
    val labels = tagged.filter(col("us") >= col("cut_us"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("future_purchases"))
    features.join(labels, Seq("user_id"), "left")
      .select(col("user_id"), col("f_events"), col("f_purchases"),
        col("f_clicks"), col("f_types"),
        coalesce(col("future_purchases"), lit(0L)).as("future_purchases"),
        (coalesce(col("future_purchases"), lit(0L)) > 0)
          .as("label_converts"))
      .orderBy(col("user_id"))
  }

  /** A/B experiment readout with deterministic hash randomization:
    * users split into arms by md5 parity (the same unit-of-
    * randomization trick production experiment platforms use — stable,
    * uniform, assignment-independent of traffic), then per arm the
    * user count, purchase-conversion permille, and events per user —
    * plus the cross-multiplied exact conversion-rate comparison
    * (conv_a * n_b vs conv_b * n_a, an integer sign test that needs no
    * division at all).
    *
    * Scale: assignment is map-side; per-arm rollups partial-aggregate;
    * the 2-row comparison is a broadcast self-join. */
  val qAbAssign: Q = (s, dir) => {
    val users = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"))
      .withColumn("arm",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 8),
          16, 10).cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("events"),
        sum(when(col("purchases") > 0, 1L).otherwise(0L)).as("converted"))
      .select(col("arm"), col("n_users"), col("events"), col("converted"),
        expr("converted * 1000 div n_users").as("conv_permille"),
        expr("events * 1000 div n_users").as("events_per_user_permille"))
    val a = arms.filter(col("arm") === "A")
      .select(col("converted").as("ca"), col("n_users").as("na"))
    val b = arms.filter(col("arm") === "B")
      .select(col("converted").as("cb"), col("n_users").as("nb"))
    val lift = a.crossJoin(b)
      .select(lit("lift").as("arm"),
        (col("ca") * col("nb")).as("n_users"),
        (col("cb") * col("na")).as("events"),
        (col("ca") * col("nb") - col("cb") * col("na")).as("converted"),
        lit(0L).as("conv_permille"),
        lit(0L).as("events_per_user_permille"))
    arms.union(lift).orderBy(col("arm"))
  }

  /** User-journey trigram mining (the Sankey/flow-diagram feed, one
    * step beyond q_path_transitions' Markov pairs): within each user's
    * event-time order, every consecutive 3-step path, with counts and
    * distinct-user support, top-20. Lead-chain windows — no self-join,
    * state is 2 lagged values per partition row.
    *
    * Scale: one per-user window sort, partial-aggregated path counts,
    * TakeOrdered top-20. */
  val qPathTrigrams: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"),
        col("step3"))
      .limit(20)
  }

  /** Weekly seasonality index per event type: each day-of-week's
    * traffic as an exact permille of that type's uniform share
    * (1000 = flat; the ratio-to-average decomposition a capacity
    * planner runs). 0 = Sunday (DuckDB dayofweek convention, Spark
    * shifted down — the q_events_heatmap contract).
    *
    * Scale: map-side bucket extraction, one partial-aggregated shuffle
    * to |types| x 7 cells, per-type totals broadcast back. */
  val qSeasonalityIndex: Q = (s, dir) => {
    val cells = Tables(s, dir, "events")
      .groupBy(col("event_type"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("n")).as("total"))
    cells.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n"),
        expr("n * 7 * 1000 div total").as("index_permille"))
      .orderBy(col("event_type"), col("dow"))
  }

  val queries: Map[String, Q] = Map(
    "q_path_trigrams" -> qPathTrigrams,
    "q_seasonality_index" -> qSeasonalityIndex,
    "q_vocab_growth" -> qVocabGrowth,
    "q_feature_label_split" -> qFeatureLabelSplit,
    "q_ab_assign" -> qAbAssign)

  val oracle: Map[String, String] = Map(
    "q_path_trigrams" -> """
      WITH s AS (SELECT user_id, event_type,
                   lead(event_type, 1) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS e2,
                   lead(event_type, 2) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS e3
                 FROM events)
      SELECT event_type AS step1, e2 AS step2, e3 AS step3,
        count(*) AS n_paths, count(DISTINCT user_id) AS n_users
      FROM s WHERE e3 IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20""",
    "q_seasonality_index" -> """
      WITH cells AS (SELECT event_type,
                       CAST(dayofweek(ts) AS BIGINT) AS dow,
                       count(*) AS n
                     FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
            FROM cells GROUP BY 1)
      SELECT event_type, dow, n, n * 7 * 1000 // total AS index_permille
      FROM cells JOIN t USING (event_type)
      ORDER BY event_type, dow""",
    "q_vocab_growth" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents),
      fd AS (SELECT w, min(doc_id) AS first_doc
             FROM (SELECT doc_id, unnest(a) AS w FROM toks) GROUP BY w),
      nw AS (SELECT first_doc, count(*) AS nw FROM fd GROUP BY 1),
      c AS (SELECT t.doc_id,
              CAST(sum(len(t.a)) OVER (ORDER BY t.doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
              CAST(sum(coalesce(nw.nw, 0)) OVER (ORDER BY t.doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
            FROM toks t LEFT JOIN nw ON t.doc_id = nw.first_doc),
      curve AS (SELECT doc_id, cum_tokens, vocab FROM c
                WHERE doc_id % 25 = 0),
      xy AS (SELECT CAST(round(log2(cum_tokens) * 1e3) AS BIGINT) AS x,
                    CAST(round(log2(vocab) * 1e3) AS BIGINT) AS y
             FROM curve),
      agg AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM xy)
      SELECT n, sx, sy,
        n * sxy - sx * sy AS beta_num,
        n * sxx - sx * sx AS beta_den,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE) AS heaps_beta
      FROM agg""",
    "q_feature_label_split" -> """
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
                  FROM events),
      cut AS (SELECT max(us) - (max(us) - min(us)) // 4 AS cut_us
              FROM ev),
      f AS (SELECT user_id, count(*) AS f_events,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS f_purchases,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                END) AS BIGINT) AS f_clicks,
              count(DISTINCT event_type) AS f_types,
              max(us) AS f_last_us
            FROM ev CROSS JOIN cut WHERE us < cut_us GROUP BY 1),
      l AS (SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS future_purchases
            FROM ev CROSS JOIN cut WHERE us >= cut_us GROUP BY 1)
      SELECT f.user_id, f_events, f_purchases, f_clicks, f_types,
        coalesce(l.future_purchases, 0) AS future_purchases,
        coalesce(l.future_purchases, 0) > 0 AS label_converts
      FROM f LEFT JOIN l ON f.user_id = l.user_id
      ORDER BY f.user_id""",
    "q_ab_assign" -> """
      WITH u AS (SELECT user_id, count(*) AS n_events,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS BIGINT) AS purchases
                 FROM events GROUP BY 1),
      asg AS (SELECT *,
                CASE WHEN CAST('0x' ||
                    substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm
              FROM u),
      arms AS (SELECT arm, count(*) AS n_users,
                 CAST(sum(n_events) AS BIGINT) AS events,
                 CAST(sum(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS converted
               FROM asg GROUP BY 1),
      rates AS (SELECT arm, n_users, events, converted,
                  converted * 1000 // n_users AS conv_permille,
                  events * 1000 // n_users AS events_per_user_permille
                FROM arms),
      lift AS (SELECT 'lift' AS arm,
                 a.converted * b.n_users AS n_users,
                 b.converted * a.n_users AS events,
                 a.converted * b.n_users - b.converted * a.n_users
                   AS converted,
                 CAST(0 AS BIGINT) AS conv_permille,
                 CAST(0 AS BIGINT) AS events_per_user_permille
               FROM arms a, arms b
               WHERE a.arm = 'A' AND b.arm = 'B')
      SELECT arm, n_users, events, converted, conv_permille,
             events_per_user_permille
      FROM rates
      UNION ALL SELECT * FROM lift ORDER BY arm""")
}
