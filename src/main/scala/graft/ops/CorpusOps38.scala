package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 25 (SURVEY.md §2.M):
  * DSIR importance weighting for data selection, CUPED variance
  * reduction for the A/B family, and the Haldane-corrected Woolf
  * odds ratio over the labeler 2×2.
  *
  * Determinism contract as the other r10 waves: exact integer
  * moments, micro-bit logs of INTEGERS only (the CorpusOps13
  * bridge), DECIMAL(38,0)/HUGEINT promotion before any product that
  * can top int64, floor division only.
  */
object CorpusOps38 {

  private def lg(c: Column): Column =
    round(log2(c) * lit(1e6)).cast("long")

  /** DSIR importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023) over
    * hashed unigram features: target = the English slice, raw = the
    * whole corpus. Per feature bucket b the add-one-smoothed
    * log-ratio r_b = lg(T_b+1) − lg(N_T+256) − lg(S_b+1) + lg(N_S+256)
    * in exact micro-bits; a document's importance weight is its
    * feature-count-weighted sum Σ c_{d,b}·r_b — the log-likelihood
    * ratio that DSIR resamples by. Top-25 by (weight DESC, doc_id).
    *
    * Scale: the feature space is CLOSED (256 hash buckets — DSIR's
    * own trick for corpus-size-independent state), so the ratio
    * table is a 256-row broadcast; the per-doc sum partial-aggregates
    * the (doc, bucket, count) stream. Top-25 lowers to
    * TakeOrderedAndProject. */
  val qMixDsir: Q = (s, dir) => {
    val toks = graft.CacheScope.track(Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long") % 256)
          .as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .persist())
    val src = toks.groupBy(col("bucket")).agg(sum(col("c")).as("s_b"))
    val tgt = toks.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(sum(col("c")).as("t_b"))
    val totals = src.agg(sum(col("s_b")).as("n_s"))
      .crossJoin(tgt.agg(sum(col("t_b")).as("n_t")))
    val ratios = src.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("t_b"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (lg(col("t_b") + 1) - lg(col("n_t") + 256) -
          lg(col("s_b") + 1) + lg(col("n_s") + 256)).as("r_micro"))
    toks.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        sum(col("c") * col("r_micro")).as("w_micro"))
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(25)
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * on the events A/B split: the pre-period per-user event count is
    * the covariate X, the post-period count the metric Y, θ =
    * cov(X,Y)/var(X) pooled across arms, and each arm's adjusted mean
    * is mean(Y) − θ·(mean(X) − mean(X)_pooled). The variance-
    * reduction ratio var(Y−θX)/var(Y) = 1 − ρ² is the headline —
    * how much experiment runtime CUPED buys. All moments are exact
    * int64 sums; θ and the means live in micro units with
    * DECIMAL(38,0) promotion before every cross product (n·Sxy and
    * friends top int64 at corpus scale).
    *
    * Scale: one events scan collapses to per-user (x, y) rows
    * (map-side conditional sums), then to ONE moment row — the
    * entire statistic pipeline after the first aggregate is
    * constant-size. The pre/post midpoint derives from the global
    * date span (a broadcast 1-row frame). */
  val qAbCuped: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val span = ev.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
      .select(col("dmin"), expr(
        "date_add(dmin, CAST(datediff(dmax, dmin) div 2 AS INT))")
        .as("mid"))
    val perUser = ev.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("y"))
      .withColumn("a",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 8),
          16, 10).cast("long") % 2 === 0, 1L).otherwise(0L))
    val m = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("a")).as("na"),
      sum(col("a") * col("x")).as("sxa"),
      sum(col("a") * col("y")).as("sya"))
    m.select(col("n"), col("na"), (col("n") - col("na")).as("nb"),
        col("sx"), col("sy"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS
          DECIMAL(38,0)) * sy AS DECIMAL(38,0)) * 1000000
          div nullif(CAST(n AS DECIMAL(38,0)) * sxx
            - CAST(sx AS DECIMAL(38,0)) * sx, 0)""").as("theta_micro"),
        col("sxa"), col("sya"),
        (col("sx") - col("sxa")).as("sxb"),
        (col("sy") - col("sya")).as("syb"),
        col("sxx"), col("sxy"), col("syy"))
      .select(col("n"), col("na"), col("nb"), col("theta_micro"),
        expr("sya * 1000000 div na").as("y_mean_a_micro"),
        expr("syb * 1000000 div nb").as("y_mean_b_micro"),
        expr("""sya * 1000000 div na - CAST(theta_micro AS
          DECIMAL(38,0)) * (sxa * 1000000 div na - sx * 1000000 div n)
          div 1000000""").as("adj_mean_a_micro"),
        expr("""syb * 1000000 div nb - CAST(theta_micro AS
          DECIMAL(38,0)) * (sxb * 1000000 div nb - sx * 1000000 div n)
          div 1000000""").as("adj_mean_b_micro"),
        expr("""1000 * (CAST(CAST(n AS DECIMAL(38,0)) * syy
            - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
            * 1000000000000
          - CAST(2 AS DECIMAL(38,0)) * theta_micro
            * (CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
          + CAST(theta_micro AS DECIMAL(38,0)) * theta_micro
            * (CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx))
          div nullif(CAST(CAST(n AS DECIMAL(38,0)) * syy
            - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
            * 1000000000000, 0)""").as("vr_permille"))
  }

  /** Woolf odds ratio with the Haldane-Anscombe correction over the
    * labeler 2×2 of q_agreement_kappa (length gate × stopword gate):
    * OR = (a+½)(d+½) / ((b+½)(c+½)) — exactly
    * (2a+1)(2d+1)/((2b+1)(2c+1)), so the log-odds are micro-bit logs
    * of INTEGERS — and Woolf's se² = Σ 1/(cell+½) = Σ 2/(2·cell+1)
    * in exact micro units. The correction makes every cell positive,
    * so no zero guards.
    *
    * Scale: the 2×2 confusion is one partial-aggregated 4-value row;
    * everything after is constant-size. */
  val qStatsOddsRatio: Q = (s, dir) => {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val labeled = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select((size(col("a")) >= 50 && size(col("a")) <= 100000)
          .as("label_a"),
        (size(filter(col("a"),
          w => w.isin(stop.map(lit(_)): _*))) >= 2).as("label_b"))
    labeled.agg(
        sum(when(col("label_a") && col("label_b"), 1L).otherwise(0L))
          .as("yy"),
        sum(when(col("label_a") && !col("label_b"), 1L).otherwise(0L))
          .as("yn"),
        sum(when(!col("label_a") && col("label_b"), 1L).otherwise(0L))
          .as("ny"),
        sum(when(!col("label_a") && !col("label_b"), 1L).otherwise(0L))
          .as("nn"))
      .select(col("yy"), col("yn"), col("ny"), col("nn"),
        (lg(col("yy") * 2 + 1) + lg(col("nn") * 2 + 1) -
          lg(col("yn") * 2 + 1) - lg(col("ny") * 2 + 1))
          .as("or_log2_micro"),
        (expr("2000000 div (yy * 2 + 1)") +
          expr("2000000 div (yn * 2 + 1)") +
          expr("2000000 div (ny * 2 + 1)") +
          expr("2000000 div (nn * 2 + 1)")).as("se2_micro"))
  }

  val queries: Map[String, Q] = Map(
    "q_mix_dsir" -> qMixDsir,
    "q_ab_cuped" -> qAbCuped,
    "q_stats_odds_ratio" -> qStatsOddsRatio)

  val oracle: Map[String, String] = Map(
    "q_mix_dsir" -> """
      WITH toks AS (
        SELECT doc_id, lang,
          CAST('0x' || substr(md5(w), 1, 4) AS BIGINT) % 256 AS bucket,
          CAST(count(*) AS BIGINT) AS c
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS a
              FROM documents), unnest(a) AS t(w)
        GROUP BY 1, 2, 3),
      src AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS s_b
              FROM toks GROUP BY 1),
      tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS t_b
              FROM toks WHERE lang = 'en' GROUP BY 1),
      tot AS (SELECT (SELECT CAST(sum(s_b) AS BIGINT) FROM src) AS n_s,
                     (SELECT CAST(sum(t_b) AS BIGINT) FROM tgt) AS n_t),
      ratios AS (
        SELECT src.bucket,
          CAST(round(log2(coalesce(tgt.t_b, 0) + 1) * 1000000) AS BIGINT)
          - CAST(round(log2(tot.n_t + 256) * 1000000) AS BIGINT)
          - CAST(round(log2(src.s_b + 1) * 1000000) AS BIGINT)
          + CAST(round(log2(tot.n_s + 256) * 1000000) AS BIGINT)
            AS r_micro
        FROM src LEFT JOIN tgt ON tgt.bucket = src.bucket
        CROSS JOIN tot)
      SELECT toks.doc_id, any_value(toks.lang) AS lang,
        CAST(sum(toks.c * ratios.r_micro) AS BIGINT) AS w_micro
      FROM toks JOIN ratios ON ratios.bucket = toks.bucket
      GROUP BY 1 ORDER BY w_micro DESC, doc_id LIMIT 25""",
    "q_ab_cuped" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      span AS (SELECT min(day) AS dmin,
                 CAST(min(day) + (date_diff('day', min(day), max(day))
                   // 2) * INTERVAL 1 DAY AS DATE) AS mid
               FROM ev),
      per_user AS (
        SELECT user_id,
          CAST(sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS BIGINT)
            AS x,
          CAST(sum(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS BIGINT)
            AS y,
          CASE WHEN CAST('0x' ||
              substr(md5(CAST(any_value(user_id) AS VARCHAR)), 1, 8)
              AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM ev CROSS JOIN span GROUP BY user_id),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * x) AS BIGINT) AS sxx,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(y * y) AS BIGINT) AS syy,
              CAST(sum(a) AS BIGINT) AS na,
              CAST(sum(a * x) AS BIGINT) AS sxa,
              CAST(sum(a * y) AS BIGINT) AS sya
            FROM per_user),
      t AS (SELECT *, n - na AS nb, sx - sxa AS sxb, sy - sya AS syb,
              CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                * 1000000
                // nullif(CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx, 0) AS BIGINT)
                AS theta_micro
            FROM m)
      SELECT n, na, nb, theta_micro,
        sya * 1000000 // na AS y_mean_a_micro,
        syb * 1000000 // nb AS y_mean_b_micro,
        CAST(sya * 1000000 // na - CAST(theta_micro AS HUGEINT)
          * (sxa * 1000000 // na - sx * 1000000 // n) // 1000000
          AS BIGINT) AS adj_mean_a_micro,
        CAST(syb * 1000000 // nb - CAST(theta_micro AS HUGEINT)
          * (sxb * 1000000 // nb - sx * 1000000 // n) // 1000000
          AS BIGINT) AS adj_mean_b_micro,
        CAST(1000 * (CAST(CAST(n AS HUGEINT) * syy
            - CAST(sy AS HUGEINT) * sy AS HUGEINT) * 1000000000000
          - CAST(2 AS HUGEINT) * theta_micro
            * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
            * 1000000
          + CAST(theta_micro AS HUGEINT) * theta_micro
            * (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx))
          // nullif(CAST(CAST(n AS HUGEINT) * syy
            - CAST(sy AS HUGEINT) * sy AS HUGEINT) * 1000000000000, 0)
          AS BIGINT) AS vr_permille
      FROM t""",
    "q_stats_odds_ratio" -> """
      WITH labeled AS (
        SELECT len(a) BETWEEN 50 AND 100000 AS label_a,
          len(list_filter(a, w -> w IN ('the','be','to','of','and',
            'that','have','with'))) >= 2 AS label_b
        FROM (SELECT string_split(text, ' ') AS a FROM documents)),
      conf AS (SELECT
        CAST(sum(CASE WHEN label_a AND label_b THEN 1 ELSE 0 END)
          AS BIGINT) AS yy,
        CAST(sum(CASE WHEN label_a AND NOT label_b THEN 1 ELSE 0 END)
          AS BIGINT) AS yn,
        CAST(sum(CASE WHEN NOT label_a AND label_b THEN 1 ELSE 0 END)
          AS BIGINT) AS ny,
        CAST(sum(CASE WHEN NOT label_a AND NOT label_b THEN 1 ELSE 0 END)
          AS BIGINT) AS nn
        FROM labeled)
      SELECT yy, yn, ny, nn,
        CAST(round(log2(yy * 2 + 1) * 1000000) AS BIGINT)
        + CAST(round(log2(nn * 2 + 1) * 1000000) AS BIGINT)
        - CAST(round(log2(yn * 2 + 1) * 1000000) AS BIGINT)
        - CAST(round(log2(ny * 2 + 1) * 1000000) AS BIGINT)
          AS or_log2_micro,
        2000000 // (yy * 2 + 1) + 2000000 // (yn * 2 + 1)
        + 2000000 // (ny * 2 + 1) + 2000000 // (nn * 2 + 1)
          AS se2_micro
      FROM conf""")
}
