package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 69 (SURVEY.md §2.M): RANK-BIASED
  * OVERLAP between the IVF index's top-5 and the exact brute-force
  * top-5 (Webber, Moffat & Zobel, TOIS 2010) — the ORDER-sensitive
  * index-quality audit beside q_sim_recall_audit's set-level recall:
  * recall says the right neighbors are in the list; RBO says they
  * are in the right ORDER, weighting the top of the list most (an
  * index that nails rank 1 but shuffles ranks 4-5 scores far higher
  * than one that inverts the head).
  *
  * Exactness (the dcgW discipline): truncated prefix-overlap RBO at
  * depth 5 with p = 9/10 is Σ_d (1−p)p^(d−1)·o_d/d, which regroups
  * per COMMON neighbor as one suffix weight U(max(ra, rb)) — the
  * five U values are exact integer numerators over the common
  * denominator 6e6 (10^5·60; 60 = lcm(1..5)), computed once here
  * and embedded as literals in BOTH engines; per label the readout
  * normalizes by the depth-5 maximum mass Σ_r U(r) = 2,457,060
  * (= (1−p^5)·6e6 exactly), so identical rankings read 1000‰.
  *
  * Scale: both ranked lists are ≤ 5 rows/query audit tables; the
  * overlap join and rollup cost nothing beyond the two shipped
  * pipelines. */
object CorpusOps66 {

  /** Suffix weights U(m) = Σ_{d=m..5} 9^(d−1)·10^(5−d)·(60/d) — the
    * per-common-neighbor RBO contribution in 1/6e6 units, exact. */
  private[graft] val rboU: Seq[Long] = {
    val terms = (1 to 5).map(d =>
      math.pow(9, d - 1).toLong * math.pow(10, 5 - d).toLong * (60 / d))
    (1 to 5).map(m => terms.drop(m - 1).sum)
  }

  /** The depth-5 maximum mass Σ_{r=1..5} U(r) = (1 − p^5)·6e6. */
  private[graft] val rboFull: Long = rboU.sum

  val qSimRankAgreement: Q = (s, dir) => {
    val ex = Similarity.qSimTopK(s, dir)
      .select(col("qid"), col("neighbor"), col("rnk").as("ra"))
    val iv = Similarity.qSimIvf(s, dir)
      .select(col("qid"), col("neighbor"), col("rnk").as("rb"))
    val uArr = rboU.mkString("array(CAST(", " AS BIGINT), CAST(",
      " AS BIGINT))")
    val perQuery = ex.join(iv, Seq("qid", "neighbor"))
      .select(col("qid"),
        expr(s"element_at($uArr, CAST(greatest(ra, rb) AS INT))")
          .as("u"))
      .groupBy(col("qid")).agg(sum(col("u")).as("u"))
    EmbQuant.quantized(s, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        col("label").cast("long").as("label"))
      .join(perQuery, Seq("qid"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(coalesce(col("u"), lit(0L))).as("u_sum"))
      .select(col("label"), col("n_queries"), col("u_sum"),
        expr(s"u_sum * 1000 div (CAST($rboFull AS BIGINT) * n_queries)")
          .as("rbo_permille"))
      .orderBy(col("label"))
  }

  /** Generic per-query RBO core behind `Graft.rboAgreement`: `a` and
    * `b` are (qid, item, rank) frames (ranks 1-based, ≤ `depth`);
    * suffix weights recomputed exactly for any depth ≤ 10 over the
    * lcm(1..10) = 2520 denominator. Returns (qid, u_sum, u_max,
    * rbo_permille) for every qid present in EITHER frame (absent
    * overlap reads 0). */
  /** Suffix weights + max mass for any depth ≤ 10 in lcm(1..10) =
    * 2520 units — ONE formula for [[rboFrom]] and the token-rank
    * drift monitor (CorpusOps68). */
  private[graft] def rboWeights(depth: Int): (Seq[Long], Long) = {
    require(depth >= 1 && depth <= 10, s"depth out of range: $depth")
    val terms = (1 to depth).map(d =>
      math.pow(9, d - 1).toLong * math.pow(10, depth - d).toLong *
        (2520 / d))
    val u = (1 to depth).map(m => terms.drop(m - 1).sum)
    (u, u.sum)
  }

  private[graft] def rboFrom(a: DataFrame, b: DataFrame, depth: Int)
      : DataFrame = {
    val (u, uMax) = rboWeights(depth)
    val uArr = u.mkString("array(CAST(", " AS BIGINT), CAST(",
      " AS BIGINT))")
    val qids = a.select(col("qid")).unionByName(b.select(col("qid")))
      .distinct()
    val common = a.select(col("qid"), col("item"), col("rank").as("ra"))
      .join(b.select(col("qid"), col("item"), col("rank").as("rb")),
        Seq("qid", "item"))
      .select(col("qid"),
        expr(s"element_at($uArr, CAST(greatest(ra, rb) AS INT))")
          .as("u"))
      .groupBy(col("qid")).agg(sum(col("u")).as("u"))
    qids.join(common, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("u"), lit(0L)).as("u_sum"),
        lit(uMax).as("u_max"))
      .withColumn("rbo_permille", expr("u_sum * 1000 div u_max"))
      .orderBy(col("qid"))
  }

  val queries: Map[String, Q] = Map(
    "q_sim_rank_agreement" -> qSimRankAgreement)

  val oracle: Map[String, String] = {
    val uCase = rboU.zipWithIndex.map { case (u, i) =>
      s"WHEN ${i + 1} THEN $u"
    }.mkString(" ")
    Map("q_sim_rank_agreement" -> s"""
      WITH e AS MATERIALIZED (${Similarity.quantSql}),
      n AS MATERIALIZED (
        SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
        FROM e GROUP BY vec_id),
      exd AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
                CAST(sum(a.v * b.v) AS BIGINT) AS dot
              FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
                AND b.vec_id <> a.vec_id
              GROUP BY 1, 2),
      ex AS (SELECT qid, neighbor,
               row_number() OVER (PARTITION BY qid ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) *
                   sqrt(CAST(nn.n2 AS DOUBLE))) DESC, neighbor) AS ra
             FROM exd JOIN n nq ON qid = nq.vec_id
                      JOIN n nn ON neighbor = nn.vec_id
             QUALIFY ra <= 5),
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
      probes AS (SELECT vec_id AS qid, cid FROM ccos WHERE vec_id < 10
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) <= 4),
      cand AS (SELECT p.qid, a.vec_id AS neighbor
               FROM probes p JOIN assigned a USING (cid)
               WHERE a.vec_id <> p.qid),
      ivd AS (SELECT c.qid, c.neighbor,
                CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
              FROM cand c JOIN e ea ON ea.vec_id = c.qid
                JOIN e eb ON eb.vec_id = c.neighbor AND ea.i = eb.i
              GROUP BY 1, 2),
      iv AS (SELECT qid, neighbor,
               row_number() OVER (PARTITION BY qid ORDER BY
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) *
                   sqrt(CAST(nn.n2 AS DOUBLE))) DESC, neighbor) AS rb
             FROM ivd JOIN n nq ON qid = nq.vec_id
                      JOIN n nn ON neighbor = nn.vec_id
             QUALIFY rb <= 5),
      u AS (SELECT ex.qid,
              CAST(sum(CASE greatest(ra, rb) $uCase END) AS BIGINT)
                AS u
            FROM ex JOIN iv ON ex.qid = iv.qid
              AND ex.neighbor = iv.neighbor
            GROUP BY 1),
      q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS label
            FROM embeddings WHERE vec_id < 10)
      SELECT label, CAST(count(*) AS BIGINT) AS n_queries,
        CAST(sum(coalesce(u, 0)) AS BIGINT) AS u_sum,
        CAST(sum(coalesce(u, 0)) * 1000
          // ($rboFull * count(*)) AS BIGINT) AS rbo_permille
      FROM q LEFT JOIN u USING (qid)
      GROUP BY label ORDER BY label""")
  }
}
