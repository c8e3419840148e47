package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 11 (SURVEY.md §2.M): the
  * filter-combination (Venn) attrition audit and a deterministic
  * m-out-of-n bootstrap confidence interval.
  *
  * Determinism contract as the other r10 waves.
  */
object CorpusOps28 {

  /** Filter-combination attrition audit — the Venn table corpus
    * pipelines publish alongside the sequential funnel (the RefinedWeb
    * / Dolma-style "what does each gate UNIQUELY remove" question the
    * q_pipeline_funnel ordering hides): four independent quality gates
    * (length band, language, classifier score, type-token ratio), one
    * row per pass/fail combination with doc and token mass. A doc
    * counted under mask 7 passes len+lang+score but fails ttr — so
    * "ttr uniquely removes" is exactly the mask-7 row, with no
    * order-of-application ambiguity.
    *
    * Scale: one classifier scan (the only per-doc stage) + per-doc
    * arithmetic; the rollup shuffles to at most 16 mask rows with
    * partial aggregation. */
  val qFilterVenn: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("nuniq"))
    val scored = CorpusOps10.scored(s, dir)
      .select(col("doc_id"), col("score_milli"))
    docs.join(scored, Seq("doc_id"))
      .select(col("ntok"),
        (col("ntok") >= 20 && col("ntok") <= 80).as("f_len"),
        (col("lang") === "en").as("f_lang"),
        (col("score_milli") >= 1100000L).as("f_score"),
        (expr("nuniq * 1000 div ntok") >= 450L).as("f_ttr"))
      .withColumn("mask",
        when(col("f_len"), 1L).otherwise(0L) +
        when(col("f_lang"), 2L).otherwise(0L) +
        when(col("f_score"), 4L).otherwise(0L) +
        when(col("f_ttr"), 8L).otherwise(0L))
      .groupBy(col("mask"), col("f_len"), col("f_lang"), col("f_score"),
        col("f_ttr"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
      .orderBy(col("mask"))
  }

  /** Deterministic m-out-of-n bootstrap (Bickel, Götze & van Zwet
    * 1997) CI for the mean quality score: B = 100 replicates each
    * resample m = 1000 doc indices via md5(b, j) mod n (both engines
    * replay the identical pseudo-resampling — the reproducibility a
    * seeded RNG can't give across engines), and the replicate-mean
    * distribution yields the [5th, 96th]-of-100 percentile interval
    * around the observed mean.
    *
    * Scale: the resample INDEX grid is a constant B·m = 100k rows
    * whatever the corpus size — it broadcasts onto one equi-join
    * against the per-doc score table (doc_ids are dense by fixture
    * contract, asserted in the spec); replicate means partial-
    * aggregate on b; the final ranking sorts exactly B = 100 rows. */
  val qStatsBootstrap: Q = (s, dir) => {
    val scored = graft.CacheScope.track(
      CorpusOps10.scored(s, dir).select(col("doc_id"), col("score_milli"))
        .persist())
    val nRow = scored.agg(count(lit(1)).as("n"))
    val grid = s.range(0, 100).select(col("id").as("b"))
      .crossJoin(s.range(0, 1000).select(col("id").as("j")))
      .crossJoin(broadcast(nRow))
      .select(col("b"),
        (conv(substring(md5(concat(col("b"), lit("_"), col("j"))), 1, 8),
          16, 10).cast("long") % col("n")).as("doc_id"))
    val reps = scored.join(broadcast(grid), Seq("doc_id"))
      .groupBy(col("b"))
      .agg(expr("sum(score_milli) div 1000").as("rep_mean_milli"))
    val ranked = reps
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rep_mean_milli"), col("b"))))
    val obs = scored.agg(count(lit(1)).as("n_docs"),
      expr("sum(score_milli) div count(1)").as("obs_mean_milli"))
    val boot = ranked.agg(
      expr("sum(rep_mean_milli) div count(1)").as("boot_mean_milli"),
      max(when(col("rk") === 5, col("rep_mean_milli"))).as("ci_lo_milli"),
      max(when(col("rk") === 96, col("rep_mean_milli"))).as("ci_hi_milli"))
    obs.crossJoin(boot)
      .select(col("n_docs"), col("obs_mean_milli"), col("boot_mean_milli"),
        col("ci_lo_milli"), col("ci_hi_milli"))
  }

  val queries: Map[String, Q] = Map(
    "q_filter_venn" -> qFilterVenn,
    "q_stats_bootstrap" -> qStatsBootstrap)

  val oracle: Map[String, String] = Map(
    "q_filter_venn" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      d AS (SELECT doc.doc_id, doc.lang,
              CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS ntok,
              CAST(len(list_distinct(string_split(doc.text, ' ')))
                AS BIGINT) AS nuniq,
              s.score_milli
            FROM documents doc JOIN scored s USING (doc_id)),
      f AS (SELECT ntok,
              ntok >= 20 AND ntok <= 80 AS f_len,
              lang = 'en' AS f_lang,
              score_milli >= 1100000 AS f_score,
              nuniq * 1000 // ntok >= 450 AS f_ttr
            FROM d)
      SELECT (CASE WHEN f_len THEN 1 ELSE 0 END
            + CASE WHEN f_lang THEN 2 ELSE 0 END
            + CASE WHEN f_score THEN 4 ELSE 0 END
            + CASE WHEN f_ttr THEN 8 ELSE 0 END) AS mask,
        f_len, f_lang, f_score, f_ttr,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(ntok) AS BIGINT) AS tokens
      FROM f GROUP BY 1, 2, 3, 4, 5 ORDER BY mask""",
    "q_stats_bootstrap" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
      grid AS (SELECT rb.b, CAST('0x' ||
                 substr(md5(rb.b || '_' || rj.j), 1, 8) AS BIGINT)
                 % nn.n AS doc_id
               FROM range(0, 100) rb(b), range(0, 1000) rj(j)
               CROSS JOIN nn),
      reps AS (SELECT b, CAST(sum(score_milli) AS BIGINT) // 1000
                 AS rep_mean_milli
               FROM grid JOIN scored USING (doc_id) GROUP BY b),
      ranked AS (SELECT rep_mean_milli,
                   row_number() OVER (ORDER BY rep_mean_milli, b) AS rk
                 FROM reps),
      obs AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(score_milli) AS BIGINT) // count(*)
                  AS obs_mean_milli
              FROM scored),
      boot AS (SELECT CAST(sum(rep_mean_milli) AS BIGINT) // count(*)
                 AS boot_mean_milli,
                max(CASE WHEN rk = 5 THEN rep_mean_milli END)
                  AS ci_lo_milli,
                max(CASE WHEN rk = 96 THEN rep_mean_milli END)
                  AS ci_hi_milli
               FROM ranked)
      SELECT n_docs, obs_mean_milli, boot_mean_milli, ci_lo_milli,
        ci_hi_milli
      FROM obs CROSS JOIN boot""")
}
