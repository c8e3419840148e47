package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 22 (SURVEY.md §2.L/§2.M):
  * t-closeness (completing the k-anonymity / l-diversity privacy
  * triad) and a permutation-test p-value for the CUSUM changepoint.
  *
  * Determinism contract as the other r10 waves.
  */
object CorpusOps36 {

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) over
    * the q_privacy_kanon QI groups with `lang` as the sensitive
    * attribute: for categorical values the earth-mover distance
    * collapses to half the L1 gap between the group's language
    * distribution and the corpus-wide one — so a group can be
    * k-anonymous AND l-diverse yet still leak (its distribution
    * skews far from the base rate). Exact integers: t_permille =
    * 1000·Σ|cnt_gl·N − glob_l·n_g| / (2·n_g·N), every term computed
    * on the full group×language grid (absent languages contribute
    * their full base-rate mass).
    *
    * Scale: the corpus collapses to (QI, lang) counts in one
    * partial-aggregated scan; the grid is |groups|×|langs| rows, both
    * bounded, with the global distribution broadcast. */
  val qPrivacyTcloseness: Q = (s, dir) => {
    val g = graft.CacheScope.track(Tables(s, dir, "documents")
      .select(col("source"), expr("n_chars div 100").as("len_bucket"),
        col("lang"))
      .groupBy(col("source"), col("len_bucket"), col("lang"))
      .agg(count(lit(1)).as("cnt")).persist())
    val groups = g.groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("cnt")).as("n_g"))
    val glob = g.groupBy(col("lang")).agg(sum(col("cnt")).as("glob"))
    val n = g.agg(sum(col("cnt")).as("n_total"))
    groups
      .crossJoin(broadcast(glob))
      .join(g, Seq("source", "len_bucket", "lang"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(n))
      .groupBy(col("source"), col("len_bucket"))
      .agg(first(col("n_g")).as("n_docs"),
        expr("""sum(abs(cnt * n_total - glob * n_g)) * 1000
                div (2 * first(n_g) * first(n_total))""")
          .as("t_permille"))
      .withColumn("is_close", col("t_permille") <= 300L)
      .orderBy(col("source"), col("len_bucket"))
  }

  /** Permutation-test significance for the CUSUM changepoint
    * (Fisher-style randomization; the standard binary-segmentation
    * significance gate): 50 md5-derived permutations of the daily
    * counts re-run the exact integer CUSUM, and the p-value is the
    * add-one fraction of permutations whose peak |CUSUM| reaches the
    * observed peak — under no-change the statistic is exchangeable,
    * so a small p means the level shift is real. Both engines replay
    * the identical permutations (rank-by-hash pairing), so every
    * number is exact.
    *
    * Scale: the day axis is calendar-bounded; the permutation grid is
    * B×days rows with per-permutation windows — constant in corpus
    * size after the one events→days shuffle. */
  val qTsChangepointPvalue: Q = (s, dir) => {
    val daily = graft.CacheScope.track(Tables(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("pos", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
      .persist())
    val tot = daily.agg(count(lit(1)).as("n_days"), sum(col("y")).as("s"))
    def peakOf(df: org.apache.spark.sql.DataFrame, part: Seq[String])
        : org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy(part.map(col): _*).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cusum",
          col("n_days") * sum(col("y")).over(w) - col("pos") * col("s"))
        .groupBy(part.map(col): _*)
        .agg(max(abs(col("cusum"))).as("peak"))
    }
    val obs = peakOf(daily.crossJoin(broadcast(tot)), Seq("n_days"))
      .select(col("n_days"), col("peak").as("peak_obs"))
    val perms = s.range(1, 51).select(col("id").as("b"))
      .crossJoin(daily.select(col("day"), col("y")))
      .withColumn("hrank", row_number().over(Window.partitionBy(col("b"))
        .orderBy(md5(concat(col("b"), lit("_"), col("day").cast("string"))),
          col("day"))).cast("long"))
      .select(col("b"), col("hrank").as("pos"), col("y"))
    val permPeaks = peakOf(perms.crossJoin(broadcast(tot)), Seq("b"))
    permPeaks.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(col("peak") >= col("peak_obs"), 1L).otherwise(0L))
          .as("n_ge"))
      .crossJoin(broadcast(obs))
      .select(col("n_days"), col("peak_obs"), col("n_perms"), col("n_ge"),
        expr("(n_ge + 1) * 1000 div (n_perms + 1)").as("p_permille"))
  }

  val queries: Map[String, Q] = Map(
    "q_privacy_tcloseness" -> qPrivacyTcloseness,
    "q_ts_changepoint_pvalue" -> qTsChangepointPvalue)

  val oracle: Map[String, String] = Map(
    "q_privacy_tcloseness" -> """
      WITH g AS (SELECT source, n_chars // 100 AS len_bucket, lang,
                   CAST(count(*) AS BIGINT) AS cnt
                 FROM documents GROUP BY 1, 2, 3),
      groups AS (SELECT source, len_bucket, CAST(sum(cnt) AS BIGINT)
                   AS n_g FROM g GROUP BY 1, 2),
      gl AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS g_cnt
              FROM g GROUP BY 1),
      n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM g),
      grid AS (SELECT groups.source, groups.len_bucket, groups.n_g,
                 gl.lang, gl.g_cnt, coalesce(g.cnt, 0) AS cnt
               FROM groups CROSS JOIN gl
               LEFT JOIN g ON g.source = groups.source
                 AND g.len_bucket = groups.len_bucket
                 AND g.lang = gl.lang)
      SELECT source, len_bucket, any_value(n_g) AS n_docs,
        CAST(sum(abs(cnt * n.n_total - g_cnt * n_g)) * 1000
             // (2 * any_value(n_g) * any_value(n.n_total)) AS BIGINT)
          AS t_permille,
        CAST(sum(abs(cnt * n.n_total - g_cnt * n_g)) * 1000
             // (2 * any_value(n_g) * any_value(n.n_total)) AS BIGINT)
          <= 300 AS is_close
      FROM grid CROSS JOIN n
      GROUP BY source, len_bucket ORDER BY source, len_bucket""",
    "q_ts_changepoint_pvalue" -> """
      WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS y,
              CAST(row_number() OVER (ORDER BY CAST(ts AS DATE))
                AS BIGINT) AS pos
            FROM events GROUP BY CAST(ts AS DATE)),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(y) AS BIGINT) AS s FROM daily),
      obs AS (SELECT n_days, max(abs(cusum)) AS peak_obs FROM (
                SELECT n_days,
                  n_days * CAST(sum(y) OVER (ORDER BY pos ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  - pos * s AS cusum
                FROM daily CROSS JOIN tot) GROUP BY n_days),
      perms AS (SELECT b.b,
                  CAST(row_number() OVER (PARTITION BY b.b
                    ORDER BY md5(b.b || '_' || CAST(day AS VARCHAR)),
                      day) AS BIGINT) AS pos,
                  y
                FROM range(1, 51) b(b) CROSS JOIN daily),
      pp AS (SELECT b, max(abs(cusum)) AS peak FROM (
               SELECT b, n_days * CAST(sum(y) OVER (PARTITION BY b
                   ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) AS BIGINT) - pos * s AS cusum
               FROM perms CROSS JOIN tot) GROUP BY b)
      SELECT obs.n_days, obs.peak_obs,
        CAST(count(*) AS BIGINT) AS n_perms,
        CAST(sum(CASE WHEN pp.peak >= obs.peak_obs THEN 1 ELSE 0 END)
          AS BIGINT) AS n_ge,
        (CAST(sum(CASE WHEN pp.peak >= obs.peak_obs THEN 1 ELSE 0 END)
          AS BIGINT) + 1) * 1000 // (CAST(count(*) AS BIGINT) + 1)
          AS p_permille
      FROM pp CROSS JOIN obs GROUP BY obs.n_days, obs.peak_obs""")
}
