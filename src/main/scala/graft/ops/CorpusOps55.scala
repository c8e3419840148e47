package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 49 (SURVEY.md §2.M): the LM coverage
  * audit — before trusting any of this library's perplexity-based
  * filters (q_text_perplexity, Kneser-Ney, the CCNet cut), measure
  * how much of each source the reference LM has actually SEEN. A
  * document scored mostly through the unseen-event backoff is not
  * really scored: its "perplexity" is an artifact of smoothing, and
  * thresholding on it silently filters by vocabulary overlap instead
  * of quality (the known domain-shift failure of LM filtering).
  */
object CorpusOps55 {

  /** Per source: bigram OOV rate (bigram type never seen in the
    * trusted slice), unseen-CONTEXT rate (w1 itself unknown — the
    * full-backoff case where even the context count is smoothing),
    * and unknown-token rate, all exact permille. High OOV + low
    * perplexity-trust go together; the table that decides whether a
    * perplexity threshold is meaningful per source before the cut is
    * applied.
    *
    * Scale: the same shape as the perplexity scorers — one bigram
    * scan, LM joins behind the `spark.graft.lm.broadcastTypeLimit`
    * measured-cardinality gate, |sources| output rows. */
  val qTextLmCoverage: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    val bg = docs
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("source"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                  i -> struct(element_at(t, i) as w1,
                              element_at(t, i + 1) as w2))"""))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("source"), col("b.w1"), col("b.w2"))
    val c12 = graft.CacheScope.track(
      bg.filter(col("source") === "src0")
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lmLimit = AutoBroadcast.limit(
      s, "spark.graft.lm.broadcastTypeLimit", 2000000L)
    val nTypes = c12.count()
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = c12.select(col("w2").as("w"))
      .unionAll(c12.select(col("w1").as("w"))).distinct()
      .withColumn("known", lit(1L))
    bg.filter(col("source") =!= "src0")
      .join(AutoBroadcast.gate(c12, nTypes, lmLimit),
        Seq("w1", "w2"), "left")
      .join(AutoBroadcast.gate(c1, nTypes, lmLimit), Seq("w1"), "left")
      .join(AutoBroadcast.gate(
        vocab.withColumnRenamed("w", "w2"), nTypes, lmLimit),
        Seq("w2"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        sum(when(col("c1").isNull, 1L).otherwise(0L))
          .as("unseen_contexts"),
        sum(when(col("known").isNull, 1L).otherwise(0L))
          .as("unknown_tokens"))
      .select(col("source"), col("n_bigrams"),
        expr("oov_bigrams * 1000 div n_bigrams").as("oov_permille"),
        expr("unseen_contexts * 1000 div n_bigrams")
          .as("unseen_context_permille"),
        expr("unknown_tokens * 1000 div n_bigrams")
          .as("unknown_token_permille"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_text_lm_coverage" -> qTextLmCoverage)

  val oracle: Map[String, String] = Map(
    "q_text_lm_coverage" -> """
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
      bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
             FROM (SELECT *, unnest(range(1, len(t))) AS i FROM toks)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
              WHERE source = 'src0' GROUP BY 1, 2),
      c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      vocab AS (SELECT DISTINCT w, 1 AS known FROM (
          SELECT w1 AS w FROM c12 UNION ALL SELECT w2 FROM c12) u)
      SELECT source, count(*) AS n_bigrams,
        CAST(sum(CASE WHEN c12.c12 IS NULL THEN 1 ELSE 0 END) * 1000
          // count(*) AS BIGINT) AS oov_permille,
        CAST(sum(CASE WHEN c1.c1 IS NULL THEN 1 ELSE 0 END) * 1000
          // count(*) AS BIGINT) AS unseen_context_permille,
        CAST(sum(CASE WHEN v.known IS NULL THEN 1 ELSE 0 END) * 1000
          // count(*) AS BIGINT) AS unknown_token_permille
      FROM bg LEFT JOIN c12 USING (w1, w2)
              LEFT JOIN c1 USING (w1)
              LEFT JOIN vocab v ON bg.w2 = v.w
      WHERE source <> 'src0'
      GROUP BY source ORDER BY source""")
}
