package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r9 wave 11 (SURVEY.md §2.M): the
  * per-source language-mix KL divergence (data-mixing drift
  * diagnostic) and cohort lifetime-value curves. Same exact-int64
  * determinism contract as CorpusOps5-7; the KL score follows the
  * q_text_zipf precedent — exact integer numerator, ONE final IEEE
  * division (bit-identical in both engines).
  */
object CorpusOps8 {

  /** round(log2(x) * 1e6) as int64 — the shared micro-bits log. */
  private def lg(c: Column): Column = round(log2(c) * lit(1e6)).cast("long")

  /** Per-source language-mix drift: KL(source ‖ corpus) over the
    * language distribution, in micro-bits — the mixing diagnostic that
    * flags a source whose language profile diverges from the corpus
    * mix (the domain/language reweighting input of DoReMi-style mixture
    * tuning). KL = Σ_l (n_sl/n_s) · log2((n_sl·N)/(n_s·n_l)),
    * assembled as the exact integer numerator
    * Σ_l n_sl · (lg(n_sl·N) − lg(n_s·n_l)) and ONE IEEE division by
    * n_s (the numerator can carry ±1 µbit rounding, so an integer div
    * would diverge between engines on the sign; a single double
    * division of identical integers is bit-deterministic).
    *
    * Scale: one partial-aggregated shuffle to (source, lang) cells;
    * the marginals re-aggregate those cells (sources·langs rows) and
    * broadcast back. */
  val qMixKl: Q = (s, dir) => {
    val sl = Tables(s, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n_sl"))
    val perSource = sl.groupBy(col("source")).agg(sum(col("n_sl")).as("n_s"))
    val perLang = sl.groupBy(col("lang")).agg(sum(col("n_sl")).as("n_l"))
    val total = sl.agg(sum(col("n_sl")).as("n_total"))
    sl.join(broadcast(perLang), Seq("lang"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("term",
        col("n_sl") * (lg(col("n_sl") * col("n_total")) -
          lg(col("n_s") * col("n_l"))))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(col("term")).as("kl_num_micro"))
      .withColumn("kl_microbits",
        col("kl_num_micro").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("source"))
  }

  /** Cohort lifetime-value curves: customers cohorted by first-order
    * month, then per (cohort, months-since-first-order) the period
    * revenue, the cumulative revenue and the cumulative LTV per
    * cohort member — all in exact integer cents (the revenue twin of
    * q_cohort_retention's user counts). Month arithmetic is integer
    * (year·12 + month), so offsets are exact in both engines.
    *
    * Scale: the first-order rollup and the (cohort, offset) revenue
    * rollup are partial-aggregated shuffles; the cumulative window
    * sorts offsets WITHIN a cohort (calendar-bounded rows); cohort
    * sizes broadcast back. */
  val qCohortLtv: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(s, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("ym"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("cym"))
    val sizes = first.groupBy(col("cym"))
      .agg(count(lit(1)).as("n_customers"))
    val rev = o.join(first, Seq("o_custkey"))
      .groupBy(col("cym"), (col("ym") - col("cym")).as("month_offset"))
      .agg(sum(col("cents")).as("period_cents"))
    rev
      .withColumn("cum_cents", sum(col("period_cents")).over(Window
        .partitionBy(col("cym")).orderBy(col("month_offset"))
        .rowsBetween(Long.MinValue, 0)))
      .join(broadcast(sizes), Seq("cym"))
      .select(
        concat(expr("cym div 12"), lit("-"),
          lpad((col("cym") % 12 + 1).cast("string"), 2, "0"))
          .as("cohort_month"),
        col("month_offset"), col("n_customers"), col("period_cents"),
        col("cum_cents"),
        expr("cum_cents div n_customers").as("ltv_per_user_cents"))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  /** Open-order backlog aging: non-finalized orders bucketed by age in
    * days against the corpus max order date (0-30 / 31-90 / 91-365 /
    * 365+), with counts and exact-cent value per (status, bucket) —
    * the operational aging report every fulfillment dashboard runs.
    *
    * Scale: map-side age computation against a broadcast 1-row max;
    * one partial-aggregated shuffle to the status x bucket grid. */
  val qOrderAging: Q = (s, dir) => {
    val o = Tables(s, dir, "orders")
    val mx = o.agg(max(to_date(col("o_orderdate"))).as("mx"))
    o.filter(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(mx))
      .withColumn("age_days",
        datediff(col("mx"), to_date(col("o_orderdate"))).cast("long"))
      .withColumn("age_bucket",
        when(col("age_days") <= 30, "a_0_30")
          .when(col("age_days") <= 90, "b_31_90")
          .when(col("age_days") <= 365, "c_91_365")
          .otherwise("d_over_365"))
      .groupBy(col("o_orderstatus"), col("age_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy(col("o_orderstatus"), col("age_bucket"))
  }

  /** Day-of-week x hour-of-day activity heatmap over the event stream
    * (0 = Sunday, matching DuckDB's dayofweek; Spark's 1-based
    * dayofweek is shifted down), with each cell's exact-permille share
    * of total traffic — the seasonality fingerprint behind load-aware
    * batch scheduling.
    *
    * Scale: map-side bucket extraction, one partial-aggregated shuffle
    * to at most 168 cells, total broadcast back. */
  val qEventsHeatmap: Q = (s, dir) => {
    val cells = Tables(s, dir, "events")
      .groupBy((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum(col("n")).as("total"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hr"), col("n"),
        expr("n * 1000 div total").as("share_permille"))
      .orderBy(col("dow"), col("hr"))
  }

  /** Embedding-drift monitor: per label, the cosine between the
    * centroid of the even-id half and the centroid of the odd-id half
    * of the corpus — the "did the embedding distribution move between
    * two snapshots" check an ML-ops pipeline alerts on (halves stand
    * in for two time windows; the math is identical). Centroid SUM
    * vectors stay exact int64: |v| <= 1e6 micro, so the norm terms are
    * bounded by 64 * (n_half * 1e6)^2 — safe to ~1e5 vectors per
    * (label, half); beyond that, pre-divide each dim sum by n
    * (deterministic integer div) before the dot. The cosine is
    * assembled like q_sim_topk — exact integer
    * dot and norms, then sqrt/divide in double (bit-identical both
    * engines).
    *
    * Scale: one partial-aggregated shuffle to |labels| x 2 centroid
    * rows (per-dim sums via map-side array aggregation); everything
    * after is label-count-sized. */
  val qEmbDrift: Q = (s, dir) => {
    val q = EmbQuant.quantized(s, dir)
      .withColumn("half", (col("vec_id") % 2).cast("int"))
    // per-dimension sums, NOT collect_list-then-fold: (label, half, i)
    // partials combine map-side, so centroid state is 64 longs per
    // group however many vectors stream through
    val comp = q.select(col("label"), col("half"),
        posexplode(col("q")).as(Seq("i", "v")))
      .groupBy(col("label"), col("half"), col("i"))
      .agg(sum(col("v")).as("cv"))
    val counts = q.groupBy(col("label"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_even"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_odd"))
    val a = comp.filter(col("half") === 0)
      .select(col("label"), col("i"), col("cv").as("ca"))
    val b = comp.filter(col("half") === 1)
      .select(col("label"), col("i"), col("cv").as("cb"))
    a.join(b, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(sum(col("ca") * col("cb")).as("dot"),
        sum(col("ca") * col("ca")).as("na2"),
        sum(col("cb") * col("cb")).as("nb2"))
      .join(broadcast(counts), Seq("label"))
      .select(col("label"), col("n_even"), col("n_odd"),
        (col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double")))).as("drift_cos"))
      .orderBy(col("label"))
  }

  val queries: Map[String, Q] = Map(
    "q_emb_drift" -> qEmbDrift,
    "q_mix_kl" -> qMixKl,
    "q_order_aging" -> qOrderAging,
    "q_events_heatmap" -> qEventsHeatmap,
    "q_cohort_ltv" -> qCohortLtv)

  val oracle: Map[String, String] = Map(
    "q_emb_drift" -> """
      WITH e AS (SELECT vec_id, label, CAST(vec_id % 2 AS INT) AS half,
                   r.i AS i,
                   CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                     AS BIGINT) AS v
                 FROM embeddings, range(1, 65) r(i)),
      comp AS (SELECT label, half, i, CAST(sum(v) AS BIGINT) AS cv
               FROM e GROUP BY 1, 2, 3),
      counts AS (SELECT label,
                   CAST(count(DISTINCT CASE WHEN vec_id % 2 = 0
                     THEN vec_id END) AS BIGINT) AS n_even,
                   CAST(count(DISTINCT CASE WHEN vec_id % 2 = 1
                     THEN vec_id END) AS BIGINT) AS n_odd
                 FROM embeddings GROUP BY 1),
      d AS (SELECT a.label,
              CAST(sum(a.cv * b.cv) AS BIGINT) AS dot,
              CAST(sum(a.cv * a.cv) AS BIGINT) AS na2,
              CAST(sum(b.cv * b.cv) AS BIGINT) AS nb2
            FROM comp a JOIN comp b
              ON a.label = b.label AND a.i = b.i
              AND a.half = 0 AND b.half = 1
            GROUP BY 1)
      SELECT label, n_even, n_odd,
        CAST(dot AS DOUBLE) /
          (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
          AS drift_cos
      FROM d JOIN counts USING (label) ORDER BY label""",
    "q_order_aging" -> """
      WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mx FROM orders),
      a AS (SELECT o_orderstatus,
              CAST(date_diff('day', CAST(o_orderdate AS DATE), mx)
                AS BIGINT) AS age_days,
              CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders CROSS JOIN mx
            WHERE o_orderstatus <> 'F'),
      b AS (SELECT o_orderstatus,
              CASE WHEN age_days <= 30 THEN 'a_0_30'
                   WHEN age_days <= 90 THEN 'b_31_90'
                   WHEN age_days <= 365 THEN 'c_91_365'
                   ELSE 'd_over_365' END AS age_bucket,
              cents
            FROM a)
      SELECT o_orderstatus, age_bucket, count(*) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM b GROUP BY 1, 2 ORDER BY o_orderstatus, age_bucket""",
    "q_events_heatmap" -> """
      WITH cells AS (SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                       CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
                     FROM events GROUP BY 1, 2),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
      SELECT dow, hr, n, n * 1000 // total AS share_permille
      FROM cells CROSS JOIN t ORDER BY dow, hr""",
    "q_mix_kl" -> """
      WITH sl AS (SELECT source, lang, count(*) AS n_sl FROM documents
                  GROUP BY 1, 2),
      ps AS (SELECT source, CAST(sum(n_sl) AS BIGINT) AS n_s FROM sl
             GROUP BY 1),
      pl AS (SELECT lang, CAST(sum(n_sl) AS BIGINT) AS n_l FROM sl
             GROUP BY 1),
      t AS (SELECT CAST(sum(n_sl) AS BIGINT) AS n_total FROM sl),
      terms AS (SELECT sl.source, ps.n_s,
                  n_sl * (CAST(round(log2(n_sl * n_total) * 1e6) AS BIGINT)
                    - CAST(round(log2(n_s * n_l) * 1e6) AS BIGINT)) AS term
                FROM sl JOIN pl USING (lang) JOIN ps USING (source)
                CROSS JOIN t)
      SELECT source, max(n_s) AS n_docs, count(*) AS n_langs,
        CAST(sum(term) AS BIGINT) AS kl_num_micro,
        CAST(sum(term) AS DOUBLE) / CAST(max(n_s) AS DOUBLE)
          AS kl_microbits
      FROM terms GROUP BY source ORDER BY source""",
    "q_cohort_ltv" -> """
      WITH o AS (SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                     AS BIGINT) AS ym,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      f AS (SELECT o_custkey, min(ym) AS cym FROM o GROUP BY 1),
      sz AS (SELECT cym, count(*) AS n_customers FROM f GROUP BY 1),
      rev AS (SELECT f.cym, o.ym - f.cym AS month_offset,
                CAST(sum(o.cents) AS BIGINT) AS period_cents
              FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
      cum AS (SELECT *,
                CAST(sum(period_cents) OVER (PARTITION BY cym
                  ORDER BY month_offset
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
              FROM rev)
      SELECT CAST(cym // 12 AS VARCHAR) || '-' ||
               lpad(CAST(cym % 12 + 1 AS VARCHAR), 2, '0')
               AS cohort_month,
             month_offset, n_customers, period_cents, cum_cents,
             cum_cents // n_customers AS ltv_per_user_cents
      FROM cum JOIN sz USING (cym)
      ORDER BY cohort_month, month_offset""")
}
