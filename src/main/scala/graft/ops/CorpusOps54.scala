package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 48 (SURVEY.md §2.M): the retrain RECALL
  * audit — the third and final table of the IVF tuning trilogy. The
  * cells frontier (q_sim_ivf_cells_sweep) prices the BUILD dial, the
  * nprobe frontier (q_sim_ivf_nprobe_sweep) the QUERY dial; this one
  * prices the MAINTENANCE dial: at the fixed K = 16 / nprobe = 4
  * operating point, recall@10 and candidates scanned under the
  * lowest-id SEED quantizer vs the 3-round-Lloyd-TRAINED one — the
  * "is a retrain worth the pipeline run" number that complements
  * q_sim_ivf_retrain_audit's balance spread with the metric a user
  * actually feels.
  */
object CorpusOps54 {

  /** Seed-vs-trained quantizer recall@10 at nprobe = 4 over the 50
    * lowest-id queries, brute-force truth shared with the frontier
    * sweeps. Trained centroids are the Lloyd loop's floored means
    * (bit-identical to q_sim_kmeans_train's round-3 state, collected
    * as the K-bounded artifact); each quantizer's assignments and
    * probes are ONE centroid-broadcast scan + a co-partitioned
    * posting join — never all-pairs. */
  val qSimRetrainRecall: Q = (s, dir) =>
    retrainRecallFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")))

  /** The audit behind [[qSimRetrainRecall]] and
    * `Graft.retrainRecallAudit`: `emb0` = (vec_id, q), q
    * micro-quantized int64; `bound` maps a set size to its id
    * predicate (declared = the literal `vec_id < k` the oracle
    * replays; the facade = [[BoundedIds.cutoffs]] so the seed
    * quantizer and query set stay full on non-dense ids — ADVICE
    * r16: the `vec_id < 16` seed turned a shifted-id frame into an
    * empty quantizer and a div-by-zero recall row). The trained row's
    * kmeansCentroids already seeds by TakeOrdered k-lowest. */
  private[graft] def retrainRecallFrom(emb0: DataFrame,
      bound: Int => org.apache.spark.sql.Column =
        BoundedIds.literal("vec_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = emb0.sparkSession
    import s.implicits._
    val emb = graft.CacheScope.track(emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val true10 = graft.CacheScope.track(CorpusOps46.topkFrom(emb, bound)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val seedCents = emb.filter(bound(16))
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val trained = CorpusOps47.kmeansCentroids(
      emb.select(col("vec_id"), col("q")), k = 16, rounds = 3)
    val trainedCents = trained.toDF("cid", "cq")
      .withColumn("cn2", EmbQuant.dotq(col("cq"), col("cq")))
    def row(name: String, cents: DataFrame): DataFrame = {
      def scored(vecs: DataFrame) = vecs
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (EmbQuant.dotq(col("q"), col("cq")).cast("double") /
            (sqrt(col("n2").cast("double")) *
              sqrt(col("cn2").cast("double")))).as("ccos"))
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val asg = scored(emb)
        .withColumn("rk", row_number().over(wv)).filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"))
      val probes = scored(emb.filter(bound(50)))
        .withColumn("rk", row_number().over(wv)).filter(col("rk") <= 4)
        .select(col("vec_id").as("qid"), col("cid"))
      // ONE pass per quantizer row (optimization r17): the r16 shape
      // consumed the UNPERSISTED candidate join twice (stats agg +
      // truth join), so the full assignment scan + window behind it
      // ran twice per row. true10 is unique on (qid, cid), so the
      // LEFT join cannot duplicate a candidate row — value-identical.
      probes.join(asg, Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid2"))
        .join(true10.select(col("qid"), col("cid").as("cid2"),
          lit(1L).as("tf")), Seq("qid", "cid2"), "left")
        .agg(countDistinct(col("qid")).as("n_queries"),
          count(lit(1)).as("candidates"),
          count(col("tf")).as("hits"))
        .select(lit(name).as("quantizer"), col("n_queries"),
          col("candidates"),
          // guarded: a degenerate frame (no candidates → n_queries=0)
          // reports recall 0, not a null/ANSI div-by-zero (ADVICE r16)
          when(col("n_queries") === 0, lit(0L))
            .otherwise(expr("hits * 1000 div (10 * n_queries)"))
            .as("recall_at10_permille"))
    }
    row("seed", seedCents).unionAll(row("trained", trainedCents))
      .orderBy(col("quantizer"))
  }

  val queries: Map[String, Q] = Map(
    "q_sim_retrain_recall" -> qSimRetrainRecall)

  /** One quantizer's recall row off the c{r}/cn{r}/a{r} CTEs of the
    * shared Lloyd chain. */
  private def recallRowSql(name: String, r: Int): String = s"""
    ranked$r AS MATERIALIZED (
      SELECT a.vec_id, c.cid,
        row_number() OVER (PARTITION BY a.vec_id ORDER BY
          CAST(sum(a.v * c.cv) AS BIGINT) /
            (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
          DESC, c.cid) AS rk
      FROM e a JOIN c$r c ON a.i = c.i
      JOIN n ON a.vec_id = n.vec_id JOIN cn$r cn ON c.cid = cn.cid
      GROUP BY a.vec_id, c.cid, n.n2, cn.cn2),
    cand$r AS (SELECT p.vec_id AS qid, a.vec_id AS cid2
               FROM ranked$r p JOIN a$r a ON a.cid = p.cid
               WHERE p.vec_id < 50 AND p.rk <= 4
                 AND a.vec_id <> p.vec_id),
    row$r AS (SELECT '$name' AS quantizer,
        CAST((SELECT count(DISTINCT qid) FROM cand$r) AS BIGINT)
          AS n_queries,
        CAST((SELECT count(*) FROM cand$r) AS BIGINT) AS candidates,
        CAST((SELECT count(*) FROM true10 t JOIN cand$r c
               ON t.qid = c.qid AND t.cid = c.cid2) * 1000 //
          (10 * (SELECT count(DISTINCT qid) FROM cand$r)) AS BIGINT)
          AS recall_at10_permille)"""

  val oracle: Map[String, String] = Map(
    "q_sim_retrain_recall" -> s"""
      WITH e AS MATERIALIZED (${Similarity.quantSql}),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
                         FROM e GROUP BY vec_id),
      dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < 50
                 AND b.vec_id <> a.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      true10 AS MATERIALIZED (SELECT qid, cid FROM (
          SELECT d.qid, d.cid,
            row_number() OVER (PARTITION BY d.qid
              ORDER BY CAST(d.dot AS DOUBLE) /
                (sqrt(CAST(nc.n2 AS DOUBLE)) *
                 sqrt(CAST(nq.n2 AS DOUBLE))) DESC, d.cid) AS rk
          FROM dots d
          JOIN n nq ON d.qid = nq.vec_id
          JOIN n nc ON d.cid = nc.vec_id) WHERE rk <= 10),
      ${(0 to 3).map(CorpusOps47.kmRoundSql).mkString(",\n")},
      ${recallRowSql("seed", 0)},
      ${recallRowSql("trained", 3)}
      SELECT * FROM row0 UNION ALL SELECT * FROM row3
      ORDER BY quantizer""")
}
