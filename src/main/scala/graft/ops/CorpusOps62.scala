package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 63 (SURVEY.md §2.M): a TRAINED
  * multi-class language identifier — add-one-smoothed multinomial
  * Naive Bayes over tokens with `lang` labels (the McCallum & Nigam
  * 1998 event model; the same classifier family fastText's langid
  * baseline reduces to for bag-of-features) — read out as the
  * held-out (true lang × predicted lang) CONFUSION MATRIX. The
  * heuristic q_text_langid ships fixed stopword lists; this is the
  * train-your-own upgrade, and the confusion matrix is the table a
  * pipeline owner reads before routing documents by predicted
  * language (which off-diagonal cells are safe to ignore, which
  * language pair the model confuses).
  *
  * Determinism (the q_quality_nb_train discipline, generalized to
  * K classes): per-term integer micro-bits — score(d, c) =
  * Σ_tok [lg(c_tc + 1) − lg(N_c + V)] + lg(d_c + 1), lg(x) =
  * round(log2(x)·1e6) — exact int64 sums; predict = argmax with
  * lang-ascending tie-break via one row_number window. Training on
  * the doc_id-even half, evaluation on the odd half (the shared NB
  * split).
  *
  * Scale: the (token, lang) count table is vocab × |langs| bounded
  * and rides the `spark.graft.lm.broadcastTypeLimit`
  * measured-cardinality gate from birth (the perplexity-class LM
  * join); the eval stream fans out × |langs| (a dictionary-sized
  * constant), everything else is one scan + a per-doc window. */
object CorpusOps62 {

  private def lg(c: Column): Column =
    round(log2(c) * lit(1e6)).cast("long")

  val qLangNbConfusion: Q = (s, dir) =>
    langNbConfusionFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("train", col("doc_id") % 2 === 0))

  /** The confusion table behind [[qLangNbConfusion]] and
    * `Graft.langNbConfusion`: the top-1 rollup of
    * [[langNbScoredFrom]]. */
  private[graft] def langNbConfusionFrom(docs: DataFrame): DataFrame =
    langNbScoredFrom(docs)
      .filter(col("rk") === 1)
      .groupBy(col("lang"), col("cls").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))

  /** The scored eval stream shared by the confusion table and the
    * r17 margin-calibration readout: per held-out (doc, class), the
    * exact micro-bit score and its per-doc rank (score desc, class
    * asc) — rk = 1 is the prediction, rk = 2 the runner-up. `docs` =
    * (doc_id, lang, text, train); classes = the train half's langs
    * (declared: an eval lang unseen in training can never be
    * predicted — it shows up as off-diagonal mass). */
  private[graft] def langNbScoredFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val toks = docs.select(col("doc_id"), col("lang"), col("train"),
      explode(split(col("text"), " ")).as("tok"))
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // (token, class) counts over the train half — vocab × |langs|
    // bounded, the LM-gate candidate
    val tc = graft.CacheScope.track(toks.filter(col("train"))
      .groupBy(col("tok"), col("lang").as("cls"))
      .agg(count(lit(1)).as("ctc"))
      .persist(mad))
    val lmLimit = AutoBroadcast.limit(
      s, "spark.graft.lm.broadcastTypeLimit", 2000000L)
    val nPairs = tc.count()
    // per-class token totals + doc priors (|langs| rows) and the
    // train vocabulary size V (one scalar) — broadcast by size
    val cls = toks.filter(col("train"))
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nc"))
      .join(docs.filter(col("train"))
        .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("dc")),
        Seq("cls"))
    val v = tc.select(countDistinct(col("tok")).as("v"))
    val scored = toks.filter(!col("train"))
      .crossJoin(broadcast(cls))
      .join(AutoBroadcast.gate(tc, nPairs, lmLimit),
        Seq("tok", "cls"), "left")
      .crossJoin(broadcast(v))
      .withColumn("lam",
        lg(coalesce(col("ctc"), lit(0L)) + 1) - lg(col("nc") + col("v")))
      .groupBy(col("doc_id"), col("lang"), col("cls"), col("dc"))
      .agg(sum(col("lam")).as("ssum"))
      .withColumn("score", col("ssum") + lg(col("dc") + 1))
    scored.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))))
  }

  val qLangNbMargin: Q = (s, dir) =>
    langNbMarginFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("train", col("doc_id") % 2 === 0))

  /** Margin-calibration readout for the language identifier (r17
    * wave 75; the multi-class sibling of q_quality_nb_calibration):
    * the held-out decision margin — top-1 minus runner-up score in
    * exact micro-bits — clamped into 17 one-bit bands, with the
    * empirical accuracy per band in exact permille. THE routing
    * table: a pipeline that trusts langid only above a margin
    * threshold reads this first (NB margins are over-confident;
    * Niculescu-Mizil & Caruana 2005). Single-class degenerate docs
    * (no runner-up) land in the top band, declared. */
  private[graft] def langNbMarginFrom(docs: DataFrame): DataFrame =
    langNbScoredFrom(docs)
      .filter(col("rk") <= 2)
      .groupBy(col("doc_id"), col("lang"))
      .agg(max(when(col("rk") === 1, col("cls"))).as("pred"),
        coalesce(
          max(when(col("rk") === 1, col("score")))
            - max(when(col("rk") === 2, col("score"))),
          lit(16000000L)).as("margin"))
      .select(col("lang"), col("pred"),
        expr("least(CAST(16 AS BIGINT), margin div 1000000)")
          .as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("lang") === col("pred")).cast("long")).as("correct"))
      .withColumn("accuracy_permille",
        expr("correct * 1000 div n_docs"))
      .orderBy(col("band"))

  val queries: Map[String, Q] = Map(
    "q_lang_nb_confusion" -> qLangNbConfusion,
    "q_lang_nb_margin" -> qLangNbMargin)

  val oracle: Map[String, String] = Map(
    "q_lang_nb_confusion" -> """
      WITH d AS MATERIALIZED (
        SELECT doc_id, lang, text, doc_id % 2 = 0 AS train
        FROM documents),
      toks AS (SELECT doc_id, lang, train,
                 unnest(string_split(text, ' ')) AS tok
               FROM d),
      tc AS MATERIALIZED (
        SELECT tok, lang AS cls, CAST(count(*) AS BIGINT) AS ctc
        FROM toks WHERE train GROUP BY 1, 2),
      cls AS (SELECT t.cls, t.nc, dd.dc FROM
          (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nc
           FROM toks WHERE train GROUP BY 1) t
        JOIN (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS dc
              FROM d WHERE train GROUP BY 1) dd USING (cls)),
      v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
            FROM toks WHERE train),
      sc AS (SELECT t.doc_id, t.lang, c.cls, c.dc,
               CAST(sum(
                 CAST(round(log2(coalesce(tc.ctc, 0) + 1) * 1e6)
                   AS BIGINT) -
                 CAST(round(log2(c.nc + v.v) * 1e6) AS BIGINT))
                 AS BIGINT) AS ssum
             FROM toks t
             CROSS JOIN cls c
             LEFT JOIN tc ON tc.tok = t.tok AND tc.cls = c.cls
             CROSS JOIN v
             WHERE NOT t.train
             GROUP BY 1, 2, 3, 4),
      pred AS (SELECT doc_id, lang, cls AS pred_lang FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY ssum +
                     CAST(round(log2(dc + 1) * 1e6) AS BIGINT) DESC,
                     cls) AS rk
                 FROM sc) WHERE rk = 1)
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM pred GROUP BY 1, 2 ORDER BY lang, pred_lang""",
    "q_lang_nb_margin" -> """
      WITH d AS MATERIALIZED (
        SELECT doc_id, lang, text, doc_id % 2 = 0 AS train
        FROM documents),
      toks AS (SELECT doc_id, lang, train,
                 unnest(string_split(text, ' ')) AS tok
               FROM d),
      tc AS MATERIALIZED (
        SELECT tok, lang AS cls, CAST(count(*) AS BIGINT) AS ctc
        FROM toks WHERE train GROUP BY 1, 2),
      cls AS (SELECT t.cls, t.nc, dd.dc FROM
          (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nc
           FROM toks WHERE train GROUP BY 1) t
        JOIN (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS dc
              FROM d WHERE train GROUP BY 1) dd USING (cls)),
      v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
            FROM toks WHERE train),
      sc AS (SELECT t.doc_id, t.lang, c.cls,
               CAST(sum(
                 CAST(round(log2(coalesce(tc.ctc, 0) + 1) * 1e6)
                   AS BIGINT) -
                 CAST(round(log2(c.nc + v.v) * 1e6) AS BIGINT))
                 AS BIGINT) +
                 CAST(round(log2(c.dc + 1) * 1e6) AS BIGINT) AS score
             FROM toks t
             CROSS JOIN cls c
             LEFT JOIN tc ON tc.tok = t.tok AND tc.cls = c.cls
             CROSS JOIN v
             WHERE NOT t.train
             GROUP BY t.doc_id, t.lang, c.cls, c.dc),
      rk2 AS (SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, cls) AS rk
                FROM sc) WHERE rk <= 2),
      m AS (SELECT doc_id, lang,
              max(CASE WHEN rk = 1 THEN cls END) AS pred,
              coalesce(
                max(CASE WHEN rk = 1 THEN score END) -
                max(CASE WHEN rk = 2 THEN score END),
                16000000) AS margin
            FROM rk2 GROUP BY 1, 2)
      SELECT least(16, margin // 1000000) AS band,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
          AS correct,
        CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) * 1000
          // count(*) AS BIGINT) AS accuracy_permille
      FROM m GROUP BY 1 ORDER BY band""")
}
