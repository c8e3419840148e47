package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r11 wave 1 (SURVEY.md §2.M): the
  * DoReMi-style iterative domain-reweighting step — the mixing
  * family's missing ITERATIVE member beside the closed-form
  * temperature / KL / PSI / DSIR / curriculum operators.
  *
  * Determinism contract as every wave: exact integer arithmetic with
  * floor division only, so DuckDB replays the identical trajectory.
  */
object CorpusOps42 {

  /** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * arXiv:2305.10429): per-domain mixture weights updated
    * multiplicatively from per-domain EXCESS LOSS, 3 unrolled steps.
    * The proxy-loss stand-in is the hashed-classifier quality score
    * (CorpusOps10.scored — the repo's one shared scoring scan):
    * excess_i = max(corpus_mean − domain_mean, 0) in milli units, so
    * below-average domains (higher "loss") gain weight. DoReMi's
    * exp(η·excess) update is linearized to the integer ring —
    * w ← w·(10⁶ + 100·excess_milli) div 10⁶, the first-order Hedge /
    * multiplicative-weights form (Freund & Schapire 1997) — and
    * renormalized to mean 10⁶ after every step (the Bradley-Terry
    * canonical-representative discipline), keeping both engines
    * bit-identical with floor division only.
    *
    * Scale: one corpus scoring scan collapses to |sources| rows; the
    * 3 update steps run as higher-order-function expressions over ONE
    * packed row (the q_eval_bradley_terry pattern) — zero extra jobs,
    * zero iteration checkpoints, constant plan depth. */
  val qMixDoremi: Q = (s, dir) => {
    val bySrc = CorpusOps10.scored(s, dir)
      .join(Tables(s, dir, "documents").select(col("doc_id"),
        col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score_milli")).as("ssum"))
    var one = bySrc
      .agg(sort_array(collect_list(
        struct(col("source"), col("n_docs"), col("ssum")))).as("m"))
      .withColumn("gmean", expr(
        """aggregate(m, CAST(0 AS BIGINT), (a, r) -> a + r.ssum)
           div aggregate(m, CAST(0 AS BIGINT), (a, r) -> a + r.n_docs)"""))
      .withColumn("excess", expr(
        """transform(m, r ->
             greatest(gmean - r.ssum div r.n_docs, CAST(0 AS BIGINT)))"""))
      .withColumn("w", expr(
        "transform(m, r -> CAST(1000000 AS BIGINT))"))
    for (_ <- 1 to 3) {
      one = one
        .withColumn("w0", expr(
          """transform(sequence(0, size(m) - 1), i ->
               element_at(w, i + 1)
                 * (1000000 + 100 * element_at(excess, i + 1))
                 div 1000000)"""))
        .withColumn("tot",
          expr("aggregate(w0, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("w", expr(
          """transform(w0, x ->
               x * (size(m) * CAST(1000000 AS BIGINT))
                 div nullif(tot, 0))"""))
        .drop("w0", "tot")
    }
    one.select(posexplode(col("m")).as(Seq("i", "r")),
        col("excess"), col("w"), col("gmean"))
      .select(col("r.source").as("source"), col("r.n_docs").as("n_docs"),
        expr("r.ssum div r.n_docs").as("mean_score_milli"),
        col("gmean").as("corpus_mean_milli"),
        expr("element_at(excess, i + 1)").as("excess_milli"),
        expr("element_at(w, i + 1)").as("weight_micro"))
      .orderBy(col("weight_micro").desc, col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_mix_doremi" -> qMixDoremi)

  val oracle: Map[String, String] = Map(
    "q_mix_doremi" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      by_src AS (
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(s.score_milli) AS BIGINT) AS ssum
        FROM scored s JOIN documents d USING (doc_id)
        GROUP BY d.source),
      g AS (SELECT CAST(sum(ssum) AS BIGINT)
                     // CAST(sum(n_docs) AS BIGINT) AS gmean,
                   CAST(count(*) AS BIGINT) AS k
            FROM by_src),
      e AS (SELECT source, n_docs, ssum,
              ssum // n_docs AS mean_milli,
              greatest(gmean - ssum // n_docs, 0) AS excess, gmean, k
            FROM by_src, g),
      s1 AS (SELECT *, CAST(1000000 * (1000000 + 100 * excess)
               // 1000000 AS BIGINT) AS w0 FROM e),
      s1n AS (SELECT *, CAST(w0 * (k * 1000000)
                // CAST((SELECT sum(w0) FROM s1) AS BIGINT) AS BIGINT)
                AS w FROM s1),
      s2 AS (SELECT * EXCLUDE (w0, w),
               CAST(w * (1000000 + 100 * excess) // 1000000 AS BIGINT)
                 AS w0 FROM s1n),
      s2n AS (SELECT *, CAST(w0 * (k * 1000000)
                // CAST((SELECT sum(w0) FROM s2) AS BIGINT) AS BIGINT)
                AS w FROM s2),
      s3 AS (SELECT * EXCLUDE (w0, w),
               CAST(w * (1000000 + 100 * excess) // 1000000 AS BIGINT)
                 AS w0 FROM s2n),
      s3n AS (SELECT *, CAST(w0 * (k * 1000000)
                // CAST((SELECT sum(w0) FROM s3) AS BIGINT) AS BIGINT)
                AS w FROM s3)
      SELECT source, n_docs, mean_milli AS mean_score_milli,
        gmean AS corpus_mean_milli, excess AS excess_milli,
        w AS weight_micro
      FROM s3n ORDER BY weight_micro DESC, source""")
}
