package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 79 (SURVEY.md §2.M): embedding-space
  * CELL-HISTOGRAM drift — the multivariate sibling of the
  * q_drift_length KS tripwire (and the quantize-then-compare shape
  * MAUVE made standard for distribution gaps): two snapshots of an
  * embedding corpus are quantized onto the SAME 16-cell coarse
  * quantizer (argmax cosine to the 16 lowest-id vectors — the
  * q_sim_ivf assignment, id tie-breaks), and their per-cell
  * occupancy histograms are compared by exact total-variation
  * distance:
  *
  *   TV‰ = Σ_c |a_c·B − b_c·A| · 1000 div (2·A·B)
  *
  * — integer cross-multiplication throughout (the KS discipline;
  * products DECIMAL(38,0)-widened: a_c·B ~ n² overflows int64 near
  * ~3e9 vectors per snapshot). Per-cell rows carry the occupancy
  * counts and `dev_micro` = |a_c·B − b_c·A|·1e6 div (A·B) — the
  * where-did-the-mass-move readout (Σ dev_micro ≈ 2000·TV‰ up to
  * per-cell integer floors) — with
  * the scalar TV on every row (the cand_len convention). A snapshot
  * entirely absent reads the declared maximal TV = 1000.
  *
  * Split (declared): md5 PARITY of vec_id (the q_drift_length
  * lesson — raw id parity can correlate with the thing being
  * measured); the facade takes an arbitrary snapshot predicate.
  *
  * Scale: one broadcast-centroid scored scan (16-row build side)
  * → a 16-row histogram; nothing after the scan is data-sized.
  * Drift localized to a cell says WHICH region of embedding space
  * changed — the readout before re-running the full dedup/retrain
  * stack on an ingest.
  */
object CorpusOps75 {

  val qEmbCellDrift: Q = (s, dir) =>
    cellDriftFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")),
      expr("""pmod(CAST(conv(substring(md5(CAST(vec_id AS STRING)),
          1, 15), 16, 10) AS BIGINT), 2)""") === 0)

  /** The drift table behind [[qEmbCellDrift]] and
    * `Graft.embCellDrift`: `emb0` = (vec_id, q 1e6-quantized),
    * `inA` = the snapshot-A predicate, `bound` = the quantizer seed
    * bound (declared literal; facades ride BoundedIds). */
  private[graft] def cellDriftFrom(emb0: DataFrame, inA: Column,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val emb = prepared(emb0, inA)
    val cents = emb.filter(bound(16))
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    cellDriftReadout(cellPartials(emb, cents), cents)
  }

  /** (vec_id, q, n2, par) from (vec_id, q) + the snapshot predicate
    * — shared with the streaming ingest twin's per-batch prep. */
  private[graft] def prepared(emb0: DataFrame, inA: Column): DataFrame =
    emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .withColumn("par", when(inA, 0L).otherwise(1L))

  /** Per-cell occupancy PARTIALS (cid, ha, hb) for a vector slice
    * against the frozen quantizer `cents` — additive across slices,
    * which is what makes the streaming ingest twin an append-only
    * artifact: micro-batches append these and rollup-on-read
    * reproduces the batch histogram exactly. */
  private[graft] def cellPartials(emb: DataFrame, cents: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("par"), col("cid"),
        (EmbQuant.dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) *
            sqrt(col("cn2").cast("double")))).as("ccos"))
      .withColumn("rk", row_number().over(wv)).filter(col("rk") === 1)
      .groupBy(col("cid"))
      .agg(sum(when(col("par") === 0L, 1L).otherwise(0L)).as("ha"),
        sum(when(col("par") === 1L, 1L).otherwise(0L)).as("hb"))
  }

  /** The TV readout over (possibly rolled-up) per-cell occupancy
    * counts; `hist` = (cid, ha, hb). */
  private[graft] def cellDriftReadout(hist0: DataFrame,
      cents: DataFrame): DataFrame = {
    val hist = hist0.groupBy(col("cid"))
      .agg(sum(col("ha")).as("ha"), sum(col("hb")).as("hb"))
    val grid = cents.select(col("cid").as("cell"))
      .join(hist.withColumnRenamed("cid", "cell"), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("ha"), lit(0L)).as("n_a"),
        coalesce(col("hb"), lit(0L)).as("n_b"))
    grid.crossJoin(broadcast(
        grid.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))))
      .withColumn("dev", abs(expr(
        "cast(n_a as decimal(38, 0)) * tb - cast(n_b as decimal(38, 0)) * ta")))
      .withColumn("dev_micro",
        expr("""CASE WHEN ta * tb = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(dev * 1000000 div
              (cast(ta as decimal(38, 0)) * tb) AS BIGINT) END"""))
      .withColumn("tv_permille", expr(
        """CASE WHEN ta * tb = 0 THEN CAST(1000 AS BIGINT)
           ELSE CAST(sum(dev) OVER () * 1000 div
             (2 * cast(ta as decimal(38, 0)) * tb) AS BIGINT) END"""))
      .select(col("cell"), col("n_a"), col("n_b"), col("dev_micro"),
        col("tv_permille"))
      .orderBy(col("cell"))
  }

  val queries: Map[String, Q] = Map(
    "q_emb_cell_drift" -> qEmbCellDrift)

  val oracle: Map[String, String] = Map(
    "q_emb_cell_drift" -> s"""
      WITH e AS MATERIALIZED (${Similarity.quantSql}),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      par AS (SELECT vec_id,
                CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
                  1, 15) AS BIGINT) % 2 AS par
              FROM (SELECT DISTINCT vec_id FROM e)),
      h AS (SELECT cid,
              CAST(sum(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ha,
              CAST(sum(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS hb
            FROM assigned JOIN par USING (vec_id) GROUP BY cid),
      grid AS (SELECT DISTINCT vec_id AS cell FROM e
               WHERE vec_id < 16),
      g AS (SELECT cell, coalesce(ha, 0) AS n_a, coalesce(hb, 0) AS n_b
            FROM grid LEFT JOIN h ON grid.cell = h.cid),
      tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
                CAST(sum(n_b) AS BIGINT) AS tb
              FROM g),
      d AS (SELECT cell, n_a, n_b, ta, tb,
              abs(CAST(n_a AS HUGEINT) * tb
                - CAST(n_b AS HUGEINT) * ta) AS dev
            FROM g CROSS JOIN tot)
      SELECT cell, n_a, n_b,
        CASE WHEN ta * tb = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(dev * 1000000 // (CAST(ta AS HUGEINT) * tb)
            AS BIGINT)
        END AS dev_micro,
        CASE WHEN ta * tb = 0 THEN CAST(1000 AS BIGINT)
          ELSE CAST(sum(dev) OVER () * 1000
            // (2 * CAST(ta AS HUGEINT) * tb) AS BIGINT)
        END AS tv_permille
      FROM d ORDER BY cell""")
}
