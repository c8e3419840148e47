package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 81 (SURVEY.md §2.M): MinHash
  * ESTIMATION-ERROR calibration — the third leg of trusting the
  * deployed sketch (q_dedup_minhash_recall = does banding FIND the
  * pairs, q_dedup_scurve_actual = detection per similarity level,
  * THIS = how far the signature's `est_jacc` is from the exact
  * Jaccard it stands in for, per similarity decile). Every deployed
  * threshold on est_jacc (the ≥ 0.2 agreement cut, the tuned-deploy
  * pick) implicitly assumes the 32-perm estimate sits close to the
  * truth; the theory says sd ≈ √(J(1−J)/32) ≈ 0.09 at J = 0.5 —
  * this table is that error MEASURED on this corpus.
  *
  * Per exact-Jaccard decile over the df-capped exact pair stream:
  * n_pairs, mean/max absolute error and mean signed BIAS, all in
  * exact micro units: with u = |A∪B| = na + nb − i and agree =
  * matching signature slots (0..32),
  *
  *   err_micro = |agree·u − 32·i| · 31250 div u
  *
  * (31250 = 1e6/32; per-pair integers BEFORE any sum — the
  * anisotropy shuffle-order-invariance discipline; both engines
  * truncate signed division toward zero, measured r17 w56).
  *
  * Scale: the pair stream and the signature frame are shipped cores
  * (df-capped / one 32-slot sketch per doc); the audit join is
  * pair-stream-sized and the rollup 10 rows. The oracle replays
  * signature agreement from the SAME dumped signature artifact the
  * minhash oracle reads — engine-specific hashing stays out of the
  * value gate.
  */
object CorpusOps77 {

  val qDedupMinhashEstError: Q = (s, dir) =>
    estErrorOf(Dedup.jaccardPairStream(s, dir), Dedup.sigFrame(s, dir))

  /** The audit behind [[qDedupMinhashEstError]] and
    * `Graft.minhashEstError`: `ps` = the exact pair stream
    * (da, db, i, na, nb), `sigs` = (doc_id, sig) 32-perm frame. */
  private[graft] def estErrorOf(ps: DataFrame, sigs: DataFrame)
      : DataFrame = {
    val j = ps
      .join(sigs.select(col("doc_id").as("da"), col("sig").as("sa")),
        "da")
      .join(sigs.select(col("doc_id").as("db"), col("sig").as("sb")),
        "db")
      .select(col("i"), (col("na") + col("nb") - col("i")).as("u"),
        expr("""aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)),
            0, (acc, x) -> acc + x)""").cast("long").as("agree"))
    val e = j.select(
      least(lit(9L), expr("10 * i div u")).as("decile"),
      expr("abs(agree * u - 32 * i) * 31250 div u").as("err"),
      expr("(agree * u - 32 * i) * 31250 div u").as("serr"))
    val binned = e.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("err")).as("se"),
        max(col("err")).as("mx"), sum(col("serr")).as("ss"))
    ps.sparkSession.range(0, 10).select(col("id").as("decile"))
      .join(binned, Seq("decile"), "left")
      .select(col("decile"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        expr("""CASE WHEN n_pairs IS NULL THEN CAST(0 AS BIGINT)
            ELSE se div n_pairs END""").as("mean_err_micro"),
        coalesce(col("mx"), lit(0L)).as("max_err_micro"),
        expr("""CASE WHEN n_pairs IS NULL THEN CAST(0 AS BIGINT)
            ELSE ss div n_pairs END""").as("bias_micro"))
      .orderBy(col("decile"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_minhash_est_error" -> qDedupMinhashEstError)

  val oracle: Map[String, String] = Map(
    "q_dedup_minhash_est_error" -> s"""
      WITH ps AS MATERIALIZED (${Dedup.jaccardStreamSql}),
      s AS MATERIALIZED (${Dedup.sigDumpSql}),
      j AS (SELECT ps.i, ps.na + ps.nb - ps.i AS u,
              CAST(list_sum(list_transform(range(1, 33),
                ii -> CASE WHEN a.sig[ii] = b.sig[ii]
                      THEN 1 ELSE 0 END)) AS BIGINT) AS agree
            FROM ps JOIN s a ON ps.da = a.doc_id
                    JOIN s b ON ps.db = b.doc_id),
      e AS (SELECT least(9, 10 * i // u) AS decile,
              abs(agree * u - 32 * i) * 31250 // u AS err,
              (agree * u - 32 * i) * 31250 // u AS serr
            FROM j),
      binned AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(err) AS BIGINT) AS se,
                   CAST(max(err) AS BIGINT) AS mx,
                   CAST(sum(serr) AS BIGINT) AS ss
                 FROM e GROUP BY decile)
      SELECT g.decile, coalesce(n_pairs, 0) AS n_pairs,
        CASE WHEN n_pairs IS NULL THEN CAST(0 AS BIGINT)
          ELSE CAST(se // n_pairs AS BIGINT) END AS mean_err_micro,
        coalesce(mx, 0) AS max_err_micro,
        CASE WHEN n_pairs IS NULL THEN CAST(0 AS BIGINT)
          ELSE CAST(ss // n_pairs AS BIGINT) END AS bias_micro
      FROM (SELECT unnest(range(0, 10)) AS decile) g
      LEFT JOIN binned ON g.decile = binned.decile
      ORDER BY g.decile""")
}
