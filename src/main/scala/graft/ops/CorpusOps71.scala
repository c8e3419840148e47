package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 74 (SURVEY.md §2.M): the S-CURVE
  * ACTUAL-detection audit — the empirical complement of
  * q_dedup_lsh_expected: per true-Jaccard decile, how many pairs did
  * the DEPLOYED MinHash detector (16×2 banding + the est_jacc ≥ 0.2
  * agreement cut, q_dedup_minhash) actually flag? Reading the two
  * tables side by side closes the theory-vs-practice loop: the
  * analytic curve says what 16×2 banding CAN see at each similarity
  * level; this says what the whole deployed detector (banding PLUS
  * the signature-agreement threshold) DID see on this corpus —
  * including the low-decile suppression the est_jacc cut adds on
  * purpose.
  *
  * Scale: the exact pair stream and the banded candidate stream are
  * both shipped cores (df-capped, never all-pairs); the decile join
  * is audit-table-sized. */
object CorpusOps71 {

  val qDedupScurveActual: Q = (s, dir) =>
    scurveActualOf(s,
      Dedup.jaccardPairStream(s, dir),
      Dedup.qDedupMinhash(s, dir).select(col("da"), col("db")))

  /** The audit behind [[qDedupScurveActual]]: `pairs` = the exact
    * (da, db, i, na, nb) stream, `detected` = the deployed
    * detector's (da, db) pairs. Emits the fixed 10-row decile grid
    * (decile, n_pairs, detected, detected_permille), empty deciles
    * coalesced to 0; detection is counted over TRUE pairs only (the
    * detector's false-positive accounting lives in
    * q_dedup_minhash_recall). */
  private[graft] def scurveActualOf(s: org.apache.spark.sql.SparkSession,
      pairs: DataFrame, detected: DataFrame): DataFrame = {
    val binned = pairs
      .select(col("da"), col("db"),
        least(lit(9L), expr("10 * i div (na + nb - i)")).as("decile"))
      .join(detected.withColumn("hit", lit(1L)), Seq("da", "db"), "left")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("detected"))
    s.range(0, 10).select(col("id").as("decile"))
      .join(binned, Seq("decile"), "left")
      .select(col("decile"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("detected"), lit(0L)).as("detected"))
      .withColumn("detected_permille",
        expr("""CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
            ELSE detected * 1000 div n_pairs END"""))
      .orderBy(col("decile"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_scurve_actual" -> qDedupScurveActual)

  val oracle: Map[String, String] = Map(
    "q_dedup_scurve_actual" -> s"""
      WITH ps AS MATERIALIZED (${Dedup.jaccardStreamSql}),
      mh AS MATERIALIZED (${Dedup.minhashOracleSql}),
      binned AS (SELECT least(9, 10 * i // (na + nb - i)) AS decile,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(CASE WHEN mh.da IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS detected
                 FROM ps LEFT JOIN mh
                   ON ps.da = mh.da AND ps.db = mh.db
                 GROUP BY 1),
      grid AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS decile)
      SELECT decile, coalesce(n_pairs, 0) AS n_pairs,
        coalesce(detected, 0) AS detected,
        CASE WHEN coalesce(n_pairs, 0) = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(coalesce(detected, 0) * 1000 // n_pairs AS BIGINT)
        END AS detected_permille
      FROM grid LEFT JOIN binned USING (decile)
      ORDER BY decile""")
}
