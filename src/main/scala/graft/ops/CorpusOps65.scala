package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 68 (SURVEY.md §2.M): the LSH S-CURVE
  * EXPECTATION AUDIT — where does THIS corpus's duplicate mass sit
  * on the analytic detection curve of each shipped MinHash banding
  * point? For banding (b bands × r rows), a pair with true Jaccard s
  * is detected with probability 1 − (1 − s^r)^b (Leskovec/Rajaraman/
  * Ullman, MMDS ch. 3). The audit bins the EXACT Jaccard pair stream
  * (the shared truth behind the threshold sweep / blocking audit)
  * into deciles and joins it against the analytic curve at each
  * decile's lower bound — per (b, r, decile): true-pair count, the
  * detection probability, and the implied expected detections. Read
  * beside q_dedup_minhash_recall (the EMPIRICAL recall): theory says
  * which deciles the deployed banding can even see; the corpus says
  * how many pairs live there.
  *
  * Exactness: with s = k/10 the curve is rational — detect‰ =
  * 1000·(10^rb − (10^r − k^r)^b) div 10^rb — and every shipped point
  * has r·b = 32, so the arithmetic tops out at 10^32 (inside BigInt
  * trivially). The 30 curve values are computed ONCE here in BigInt
  * and embedded as LITERALS in both engines (the dcgW discipline —
  * no runtime pow anywhere). The decile of a pair is
  * least(9, 10·i div (na + nb − i)) — exact integer floor off the
  * exact intersection/union counts.
  *
  * Scale: the pair stream is the df-capped shingle self-join every
  * dedup-audit query shares (never all-pairs); the curve grid is 30
  * literal rows, broadcast. */
object CorpusOps65 {

  /** The shipped banding points — every (b, r) with b·r = 32 that
    * the MinHash family deploys (the `32 % (b·r) == 0` contract). */
  private[graft] val lshPoints: Seq[(Int, Int)] =
    Seq((16, 2), (8, 4), (4, 8))

  /** detect‰ at s = k/10 for banding (b, r): exact rational
    * 1000·(10^rb − (10^r − k^r)^b) div 10^rb, BigInt — the analytic
    * S-curve as integer literals. */
  private[graft] def detectPermille(b: Int, r: Int, k: Int): Long = {
    val tenR = BigInt(10).pow(r)
    val tenRb = BigInt(10).pow(r * b)
    ((BigInt(1000) * (tenRb - (tenR - BigInt(k).pow(r)).pow(b)))
      / tenRb).toLong
  }

  /** The full 30-row (b, r, decile, detect_permille) literal grid. */
  private[graft] def curveRows: Seq[(Int, Int, Int, Long)] =
    for ((b, r) <- lshPoints; k <- 0 to 9)
      yield (b, r, k, detectPermille(b, r, k))

  val qDedupLshExpected: Q = (s, dir) =>
    lshExpectedOf(s, Dedup.jaccardPairStream(s, dir))

  /** The audit behind [[qDedupLshExpected]] and
    * `Graft.lshExpectedDetection`: `pairs` = the exact (da, db, i,
    * na, nb) Jaccard pair stream. Emits the fixed 3×10 grid
    * (b, r, decile, n_pairs, detect_permille, expected_detected)
    * with empty deciles coalesced to 0 — expected_detected =
    * n_pairs · detect‰ div 1000, the decile-LOWER-bound conservative
    * expectation (declared). */
  private[graft] def lshExpectedOf(s: SparkSession, pairs: DataFrame)
      : DataFrame = {
    import s.implicits._
    val grid = broadcast(
      curveRows.toDF("b", "r", "decile", "detect_permille"))
    val binned = pairs
      .select(least(lit(9L),
        expr("10 * i div (na + nb - i)")).as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"))
    grid.join(binned, Seq("decile"), "left")
      .select(col("b").cast("long").as("b"),
        col("r").cast("long").as("r"),
        col("decile").cast("long").as("decile"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("detect_permille"))
      .withColumn("expected_detected",
        expr("n_pairs * detect_permille div 1000"))
      .orderBy(col("b").desc, col("decile"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_lsh_expected" -> qDedupLshExpected)

  private def curveValuesSql: String = curveRows.map {
    case (b, r, k, d) => s"($b, $r, $k, $d)"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_dedup_lsh_expected" -> s"""
      WITH ps AS MATERIALIZED (${Dedup.jaccardStreamSql}),
      binned AS (SELECT least(9, 10 * i // (na + nb - i)) AS decile,
                   CAST(count(*) AS BIGINT) AS n_pairs
                 FROM ps GROUP BY 1),
      grid(b, r, decile, detect_permille) AS (
        SELECT * FROM (VALUES $curveValuesSql)),
      j AS (SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
              CAST(g.decile AS BIGINT) AS decile,
              coalesce(n_pairs, 0) AS n_pairs,
              CAST(detect_permille AS BIGINT) AS detect_permille
            FROM grid g LEFT JOIN binned ON g.decile = binned.decile)
      SELECT b, r, decile, CAST(n_pairs AS BIGINT) AS n_pairs,
        detect_permille,
        CAST(n_pairs * detect_permille // 1000 AS BIGINT)
          AS expected_detected
      FROM j ORDER BY b DESC, decile""")
}
