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

  val queries: Map[String, Q] = Map(
    "q_quality_nb_calibration" -> qQualityNbCalibration)

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
      FROM b GROUP BY bucket ORDER BY bucket""")
}
