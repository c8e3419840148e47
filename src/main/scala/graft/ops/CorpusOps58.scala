package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 56 (SURVEY.md §2.M): the NB quality
  * filter's CALIBRATION / reliability table — "can I trust the
  * filter's scores as more than a sign bit" (the reliability-diagram
  * reading; cf. Niculescu-Mizil & Caruana, ICML 2005, on NB scores
  * being systematically over-confident). The trainer
  * (q_quality_nb_train) answers "is the decision accurate"; kappa
  * answers "is it better than chance"; THIS answers whether the
  * margin's MAGNITUDE ranks documents — a pipeline that thresholds
  * at anything other than 0 (e.g. keep only high-confidence
  * positives) must read this table first.
  *
  * Buckets are exact and engine-identical: the held-out decision
  * margin (integer micro-bits, the shared nbScoredFrom stream) is
  * clamped to [−8e6, 8 499 999] and divided AFTER an +8e6 shift, so
  * the integer division never sees a negative operand — bucket
  * boundaries around zero behave like floor division regardless of
  * either engine's negative-division convention (both Spark `div`
  * and DuckDB integer `//` truncate toward zero, measured − 3/2 =
  * −1 in both; the shift removes the question entirely AND makes a
  * truncating split at −0.x land in the band below zero, which is
  * the reliability-diagram reading one wants). 17 buckets:
  * 0 = margin ≤ −8 bits … 8 = [0, 1) … 16 = ≥ +8 bits; the empirical
  * positive rate per bucket in exact permille.
  *
  * Scale: rides the shared NB scored stream (one token scan, the
  * vocab-bounded λ table behind the measured-cardinality LM gate);
  * the rollup is ≤ 17 rows.
  */
object CorpusOps58 {

  val qQualityNbCalibration: Q = (s, dir) =>
    nbCalibrationFrom(CorpusOps50.nbFlags(s, dir))

  /** The table behind [[qQualityNbCalibration]] and
    * `Graft.nbQualityCalibration`: `flags` = (doc_id, source, text,
    * label 0/1, train boolean). */
  private[graft] def nbCalibrationFrom(flags: DataFrame): DataFrame =
    CorpusOps50.nbScoredFrom(flags)
      .withColumn("m2",
        greatest(lit(-8000000L), least(lit(8499999L), col("margin"))))
      .withColumn("bucket", expr("(m2 + 8000000) div 1000000"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("label")).as("n_pos"))
      .select(col("bucket"), col("n_docs"), col("n_pos"),
        expr("n_pos * 1000 div n_docs").as("pos_rate_permille"))
      .orderBy(col("bucket"))

  // ---------------------------------------------------------------
  // q_quality_nb_auc — threshold-free discrimination (Mann-Whitney)
  // ---------------------------------------------------------------

  /** ROC-AUC of the NB margin via the Mann–Whitney identity
    * (Hanley & McNeil, Radiology 1982): AUC = P(margin⁺ > margin⁻) +
    * ½·P(=), computed EXACTLY over the value-granular margin
    * histogram — for each distinct margin m with p_m positives and
    * n_m negatives, the DOUBLED U statistic accumulates
    * p_m · (2·N⁻_below(m) + n_m), so ties contribute their exact ½
    * without any fractional arithmetic; AUC‰ = U2 · 1000 div
    * (2·P·N). The threshold-free third leg of the filter-trust set:
    * confusion = the decision, kappa = vs chance, calibration = the
    * magnitude, THIS = the ranking.
    *
    * Scale: rides the shared nbScoredFrom stream; docs collapse to
    * the value-granular histogram in one aggregation and the cumsum
    * window runs over distinct margins only (the ksDrift
    * discipline). */
  val qQualityNbAuc: Q = (s, dir) =>
    nbAucFrom(CorpusOps50.nbFlags(s, dir))

  /** The AUC behind [[qQualityNbAuc]] and `Graft.nbQualityAuc`. */
  private[graft] def nbAucFrom(flags: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = CorpusOps50.nbScoredFrom(flags)
      .groupBy(col("margin"))
      .agg(sum(col("label")).as("p_m"),
        sum(lit(1L) - col("label")).as("n_m"))
    val w = Window.orderBy(col("margin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n_below",
        sum(col("n_m")).over(w) - col("n_m"))
      .agg(sum(col("p_m")).as("n_pos"), sum(col("n_m")).as("n_neg"),
        sum(col("p_m") * (lit(2L) * col("n_below") + col("n_m")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(0L))
          .otherwise(expr("u2 * 1000 div (2 * n_pos * n_neg)"))
          .as("auc_permille"))
      .orderBy(col("n_pos"))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_nb_calibration" -> qQualityNbCalibration,
    "q_quality_nb_auc" -> qQualityNbAuc)

  val oracle: Map[String, String] = Map(
    "q_quality_nb_calibration" -> s"""
      WITH ${CorpusOps50.nbConfusionSql},
      cal AS (SELECT sc.label,
          least(8499999, greatest(-8000000,
            ssum + ${CorpusOps50.lgSql("pri.dp + 1")}
                 - ${CorpusOps50.lgSql("pri.dn + 1")})) AS m2
        FROM sc CROSS JOIN pri),
      b AS (SELECT (m2 + 8000000) // 1000000 AS bucket, label FROM cal)
      SELECT CAST(bucket AS BIGINT) AS bucket,
        count(*) AS n_docs,
        CAST(sum(label) AS BIGINT) AS n_pos,
        CAST(sum(label) * 1000 // count(*) AS BIGINT)
          AS pos_rate_permille
      FROM b GROUP BY bucket ORDER BY bucket""",
    "q_quality_nb_auc" -> s"""
      WITH ${CorpusOps50.nbConfusionSql},
      mg AS (SELECT sc.label,
          ssum + ${CorpusOps50.lgSql("pri.dp + 1")}
               - ${CorpusOps50.lgSql("pri.dn + 1")} AS margin
        FROM sc CROSS JOIN pri),
      hist AS (SELECT margin, CAST(sum(label) AS BIGINT) AS p_m,
          CAST(sum(1 - label) AS BIGINT) AS n_m
        FROM mg GROUP BY margin),
      cum AS (SELECT *,
          CAST(sum(n_m) OVER (ORDER BY margin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_m AS BIGINT) AS n_below
        FROM hist),
      agg AS (SELECT CAST(sum(p_m) AS BIGINT) AS n_pos,
          CAST(sum(n_m) AS BIGINT) AS n_neg,
          CAST(sum(p_m * (2 * n_below + n_m)) AS BIGINT) AS u2
        FROM cum)
      SELECT n_pos, n_neg, u2,
        CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0
             ELSE u2 * 1000 // (2 * n_pos * n_neg) END AS BIGINT)
          AS auc_permille
      FROM agg ORDER BY n_pos""")
}
