package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 82 (SURVEY.md §2.M): cost-sensitive
  * THRESHOLD PICK over the NB filter's calibration bands — the
  * decision layer the filter-trust quartet (confusion / kappa /
  * calibration / AUC) exists to feed: "given that keeping a bad doc
  * costs λ× the value of keeping a good one, WHERE do I put the
  * margin cut?" For each cost ratio λ ∈ {1, 2, 5} and each candidate
  * cut t ∈ {0..16} (keep docs in calibration band ≥ t — the band
  * boundaries ARE the candidate thresholds, one per bit of margin):
  *
  *   utility(λ, t) = tp(t) − λ·fp(t)
  *
  * over the held-out population, in exact document units (no
  * division anywhere); `is_best` marks each λ's argmax (ties →
  * LOWEST cut, i.e. keep more — deterministic in both engines).
  * Reading the three λ rows side-by-side shows how fast the optimal
  * cut climbs as false positives get expensive — the table a
  * pipeline owner actually wants from a calibrated filter.
  *
  * Scale: consumes the ≤ 17-row calibration table (which rides the
  * shared one-scan LM-gated scored stream); everything here is
  * 17×17-row arithmetic. 100 TB costs the calibration scan.
  */
object CorpusOps78 {

  val qQualityNbThreshold: Q = (s, dir) =>
    nbThresholdFrom(
      CorpusOps58.nbCalibrationFrom(CorpusOps50.nbFlags(s, dir)))

  /** The sweep behind [[qQualityNbThreshold]] and
    * `Graft.nbThresholdPick`: `cal` = the calibration table
    * (bucket, n_docs, n_pos, ...). */
  private[graft] def nbThresholdFrom(cal0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = cal0.sparkSession
    val cal = cal0.select(col("bucket"), col("n_docs"), col("n_pos"))
    val grid = s.range(0, 17).select(col("id").as("threshold"))
    val cum = grid
      .join(cal, cal("bucket") >= grid("threshold"), "left")
      .groupBy(col("threshold"))
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("kept"),
        coalesce(sum(col("n_pos")), lit(0L)).as("tp"))
    val lam = s.range(0, 3).select(
      expr("element_at(array(1, 2, 5), CAST(id + 1 AS INT))")
        .cast("long").as("cost_ratio"))
    val u = cum.crossJoin(broadcast(lam))
      .withColumn("fp", col("kept") - col("tp"))
      .withColumn("utility",
        col("tp") - col("cost_ratio") * col("fp"))
    val w = Window.partitionBy(col("cost_ratio"))
      .orderBy(col("utility").desc, col("threshold"))
    u.withColumn("is_best",
        when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select(col("cost_ratio"), col("threshold"), col("kept"),
        col("tp"), col("fp"), col("utility"), col("is_best"))
      .orderBy(col("cost_ratio"), col("threshold"))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_nb_threshold" -> qQualityNbThreshold)

  val oracle: Map[String, String] = Map(
    "q_quality_nb_threshold" -> s"""
      WITH ${CorpusOps50.nbConfusionSql},
      cal AS (SELECT sc.label,
          least(8499999, greatest(-8000000,
            ssum + ${CorpusOps50.lgSql("pri.dp + 1")}
                 - ${CorpusOps50.lgSql("pri.dn + 1")})) AS m2
        FROM sc CROSS JOIN pri),
      b AS (SELECT (m2 + 8000000) // 1000000 AS bucket, label FROM cal),
      bk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(label) AS BIGINT) AS p
             FROM b GROUP BY bucket),
      grid AS (SELECT unnest(range(0, 17)) AS threshold),
      cum AS (SELECT g.threshold,
                CAST(coalesce(sum(bk.n), 0) AS BIGINT) AS kept,
                CAST(coalesce(sum(bk.p), 0) AS BIGINT) AS tp
              FROM grid g LEFT JOIN bk ON bk.bucket >= g.threshold
              GROUP BY g.threshold),
      lam AS (SELECT CAST(unnest([1, 2, 5]) AS BIGINT) AS cost_ratio),
      u AS (SELECT cost_ratio, threshold, kept, tp, kept - tp AS fp,
              tp - cost_ratio * (kept - tp) AS utility
            FROM cum CROSS JOIN lam)
      SELECT cost_ratio, CAST(threshold AS BIGINT) AS threshold,
        kept, tp, CAST(fp AS BIGINT) AS fp,
        CAST(utility AS BIGINT) AS utility,
        CASE WHEN row_number() OVER (PARTITION BY cost_ratio
            ORDER BY utility DESC, threshold) = 1
          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        END AS is_best
      FROM u ORDER BY cost_ratio, threshold""")
}
