package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 67 (SURVEY.md §2.M): the LABEL SCATTER
  * audit — per-label within-class variance, centroid separation from
  * the global mean, and their Fisher-style ratio (the
  * Calinski–Harabasz 1974 ingredients, per label) over the quantized
  * embedding table. The "is this embedding model's label structure
  * even there?" readout a pipeline owner checks BEFORE trusting
  * q_emb_classify's centroid classifier or mining hard negatives:
  * a label whose fisher_permille ~ 0 has its centroid buried inside
  * the within-class noise.
  *
  * Exactness: everything derives from three exact integer sums over
  * the 1e6-quantized vectors — ssq = Σ‖q‖², the per-dim class sums
  * s_c, and their self/cross dots — widened to DECIMAL(38,0) (oracle:
  * HUGEINT) BEFORE any product (‖s_c‖² alone overflows int64 at the
  * fixture's own sf0.1). Identities used, all with exact common
  * denominators:
  *   within-class variance = (n_c·ssq_c − ‖s_c‖²) / n_c²,
  *   ‖μ_c − μ‖² = (n²·‖s_c‖² − 2·n_c·n·(s_c·S) + n_c²·‖S‖²)
  *                / (n_c²·n²),
  * each read out in real-scale MICRO units (the 1e12 quantization
  * factor and 1e6 micro factor collapse to one div 1e6), and
  * fisher_permille = sep·1000 div within computed FROM the emitted
  * micro columns (declared: the ratio of the two readouts, not of
  * the unrounded rationals).
  *
  * Scale: one posexplode scan partial-aggregates to |labels|×64
  * per-dim sums; everything after is dictionary-sized. No joins on
  * anything data-scaling. */
object CorpusOps64 {

  val qEmbScatter: Q = (s, dir) =>
    embScatterFrom(EmbQuant.quantized(s, dir))

  /** The audit behind [[qEmbScatter]] and `Graft.embScatter`:
    * `emb` = (vec_id, label, q: array<bigint>). */
  private[graft] def embScatterFrom(emb: DataFrame): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dims = graft.CacheScope.track(emb
      .select(col("label").cast("long").as("label"),
        posexplode(col("q")).as(Seq("i", "v")))
      .select(col("label"), col("i"),
        col("v").cast("decimal(38,0)").as("v"))
      .groupBy(col("label"), col("i"))
      .agg(count(lit(1)).as("nrows"), sum(col("v")).as("sd"),
        sum(col("v") * col("v")).as("sq"))
      .persist(mad))
    val perLabel = dims.groupBy(col("label"))
      .agg((max(col("nrows"))).as("nc"),
        sum(col("sq")).as("ssq"),
        sum(col("sd") * col("sd")).as("snorm2"))
    val globalDim = dims.groupBy(col("i"))
      .agg(sum(col("sd")).as("gd"))
    val glob = globalDim
      .agg(sum(col("gd") * col("gd")).as("gnorm2"))
      .crossJoin(broadcast(
        emb.agg(count(lit(1)).cast("decimal(38,0)").as("n"))))
    val cross = dims
      .join(globalDim, Seq("i"))
      .groupBy(col("label"))
      .agg(sum(col("sd") * col("gd")).as("crossg"))
    perLabel.join(cross, Seq("label"))
      .crossJoin(broadcast(glob))
      .select(col("label"),
        col("nc").cast("long").as("n_vecs"),
        expr("CAST(ssq div (nc * 1000000) AS BIGINT)")
          .as("mean_norm2_micro"),
        expr("""CAST((nc * ssq - snorm2) div (nc * nc * 1000000)
            AS BIGINT)""").as("within_var_micro"),
        expr("""CAST((n * n * snorm2 - 2 * nc * n * crossg
              + nc * nc * gnorm2)
            div (nc * nc * n * n * 1000000) AS BIGINT)""")
          .as("centroid_sep_micro"))
      .withColumn("fisher_permille",
        expr("""CASE WHEN within_var_micro = 0 THEN CAST(0 AS BIGINT)
            ELSE centroid_sep_micro * 1000 div within_var_micro
            END"""))
      .orderBy(col("label"))
  }

  val queries: Map[String, Q] = Map("q_emb_scatter" -> qEmbScatter)

  val oracle: Map[String, String] = Map(
    "q_emb_scatter" -> """
      WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(label AS BIGINT) AS label, r.i AS i,
          CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000)
            AS BIGINT) AS v
        FROM embeddings, range(1, 65) r(i)),
      dims AS MATERIALIZED (
        SELECT label, i, CAST(count(*) AS HUGEINT) AS nrows,
          CAST(sum(v) AS HUGEINT) AS sd,
          CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sq
        FROM e GROUP BY 1, 2),
      pl AS (SELECT label, max(nrows) AS nc,
               CAST(sum(sq) AS HUGEINT) AS ssq,
               CAST(sum(sd * sd) AS HUGEINT) AS snorm2
             FROM dims GROUP BY label),
      gd AS (SELECT i, CAST(sum(sd) AS HUGEINT) AS gd
             FROM dims GROUP BY i),
      g AS (SELECT CAST(sum(gd * gd) AS HUGEINT) AS gnorm2,
              (SELECT CAST(count(*) AS HUGEINT) FROM embeddings) AS n
            FROM gd),
      cr AS (SELECT label, CAST(sum(sd * gd.gd) AS HUGEINT) AS crossg
             FROM dims JOIN gd USING (i) GROUP BY label),
      b AS (SELECT label, CAST(nc AS BIGINT) AS n_vecs,
              CAST(ssq // (nc * 1000000) AS BIGINT)
                AS mean_norm2_micro,
              CAST((nc * ssq - snorm2) // (nc * nc * 1000000)
                AS BIGINT) AS within_var_micro,
              CAST((n * n * snorm2 - 2 * nc * n * crossg
                  + nc * nc * gnorm2)
                // (nc * nc * n * n * 1000000) AS BIGINT)
                AS centroid_sep_micro
            FROM pl JOIN cr USING (label) CROSS JOIN g)
      SELECT label, n_vecs, mean_norm2_micro, within_var_micro,
        centroid_sep_micro,
        CASE WHEN within_var_micro = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(centroid_sep_micro * 1000 // within_var_micro
            AS BIGINT)
        END AS fisher_permille
      FROM b ORDER BY label""")
}
