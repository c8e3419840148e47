package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 72 (SURVEY.md §2.M): the PQ DISTORTION
  * frontier — reconstruction error of the product-quantization
  * codebook at m ∈ {2, 4, 8} subspaces (Jégou et al., TPAMI 2011
  * §II: quantization MSE is the quantity PQ minimizes; recall loss
  * is its symptom). The recall sweep (q_sim_recall_sweep) measures
  * the SYMPTOM per operating point; this table measures the CAUSE —
  * per m: the mean and worst per-vector reconstruction error under
  * the deployed 16-codeword raw-mode codebook (seeds vec_id 0..15,
  * the q_sim_ivfpq layout). More subspaces = shorter subvectors =
  * finer codes = lower distortion, bought with m× the code bytes:
  * THE build dial, read as data.
  *
  * Exactness: d² sums of 1e6-quantized ints; per-vector totals fit
  * int64 but the corpus rollup is DECIMAL(38,0)/HUGEINT-widened
  * (≈8e17 at sf0.1 ×10 sits against the int64 edge); readouts in
  * real-scale micro units (the q_emb_scatter convention). The
  * distortion needs only min(d²) per (vector, subspace) — no
  * argmin tie-break enters the result.
  *
  * Scale: per m one broadcast-codebook join over the subspace
  * stream (16·m rows broadcast), partial-aggregated min/sum — the
  * encode pass every PQ build already pays, with no coarse
  * quantizer or probe stage attached. */
object CorpusOps69 {

  val qSimPqDistortion: Q = (s, dir) =>
    pqDistortionFrom(EmbQuant.quantized(s, dir)
      .select(col("vec_id"), col("q")))

  /** The frontier behind [[qSimPqDistortion]] and
    * `Graft.pqDistortion`: `emb` = (vec_id, q). */
  private[graft] def pqDistortionFrom(emb: DataFrame): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = graft.CacheScope.track(emb.persist(mad))
    val sqd = expr(
      """aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)),
         CAST(0 AS BIGINT), (acc, v) -> acc + v)""")
    def rowAt(m: Int): DataFrame = {
      val d = 64 / m
      val subs = cached.select(col("vec_id"), explode(expr(
          s"""transform(sequence(0, ${m - 1}),
             m -> struct(m AS ms, slice(q, m * $d + 1, $d) AS sub))"""))
          .as("e"))
        .select(col("vec_id"), col("e.ms").as("ms"), col("e.sub").as("sub"))
      val codebook = subs.filter(col("vec_id") < 16)
        .select(col("ms"), col("vec_id").as("code"),
          col("sub").as("csub"))
      subs.join(broadcast(codebook), Seq("ms"))
        .withColumn("d2", sqd)
        .groupBy(col("vec_id"), col("ms"))
        .agg(min(col("d2")).as("d2"))
        .groupBy(col("vec_id"))
        .agg(sum(col("d2")).as("recon"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("recon").cast("decimal(38,0)")).as("tot"),
          max(col("recon")).as("worst"))
        .select(lit(m.toLong).as("m"), col("n_vecs"),
          expr("CAST(tot div (n_vecs * 1000000) AS BIGINT)")
            .as("mean_d2_micro"),
          expr("worst div 1000000").as("max_d2_micro"))
    }
    rowAt(2).unionByName(rowAt(4)).unionByName(rowAt(8))
      .orderBy(col("m"))
  }

  val queries: Map[String, Q] = Map(
    "q_sim_pq_distortion" -> qSimPqDistortion)

  private def rowSql(m: Int): String = {
    val d = 64 / m
    s"""
      sub$m AS (SELECT vec_id, (i - 1) // $d AS ms, i, v FROM e),
      enc$m AS (SELECT s.vec_id, s.ms, c.vec_id AS code,
                  CAST(sum((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
                FROM sub$m s JOIN sub$m c
                  ON c.vec_id < 16 AND c.ms = s.ms AND c.i = s.i
                GROUP BY 1, 2, 3),
      best$m AS (SELECT vec_id, ms, min(d2) AS d2
                 FROM enc$m GROUP BY 1, 2),
      rec$m AS (SELECT vec_id, CAST(sum(d2) AS BIGINT) AS recon
                FROM best$m GROUP BY vec_id),
      row$m AS (SELECT CAST($m AS BIGINT) AS m,
                  CAST(count(*) AS BIGINT) AS n_vecs,
                  CAST(CAST(sum(CAST(recon AS HUGEINT)) AS HUGEINT)
                    // (count(*) * 1000000) AS BIGINT) AS mean_d2_micro,
                  CAST(max(recon) // 1000000 AS BIGINT) AS max_d2_micro
                FROM rec$m)"""
  }

  val oracle: Map[String, String] = Map(
    "q_sim_pq_distortion" -> s"""
      WITH e AS MATERIALIZED (${Similarity.quantSql}),
      ${Seq(2, 4, 8).map(rowSql).mkString(",")}
      SELECT m, n_vecs, mean_d2_micro, max_d2_micro FROM (
        SELECT * FROM row2 UNION ALL SELECT * FROM row4
        UNION ALL SELECT * FROM row8)
      ORDER BY m""")
}
