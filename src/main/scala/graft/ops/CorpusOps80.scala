package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 waves 85 + 86 (SURVEY.md §2.M).
  *
  * q_lang_nb_prf — per-class precision/recall/F1 over the trained
  * langid's held-out confusion (the readout layer of
  * q_lang_nb_confusion, the same way the threshold pick reads the
  * calibration bands): per class c — tp (diagonal), fp (column minus
  * diagonal), fn (row minus diagonal) and exact-permille P/R/F1
  * (F1 = 2tp·1000 div (2tp+fp+fn), the integer harmonic identity).
  * Classes = the union of true and predicted labels, so a language
  * the model can never predict (absent from training) still gets its
  * recall-0 row. Macro averages are the plain mean of the visible
  * columns — left to the reader so the table stays exact.
  *
  * q_text_length_tail — Hill tail-index ingredients for the
  * document-length distribution (Hill, Ann. Stat. 1975): per source,
  * the k = 20 largest token counts (top-k by value — the multiset is
  * tiebreak-invariant) and
  *
  *   hill_log2_micro = (Σᵢ lg xᵢ − k·lg x_k) div (k − 1)
  *
  * with lg = round(log2 · 1e6) of exact integers (the perplexity
  * micro-bits convention; the i = k term is 0). The tail index is
  * α = log2(e)/hill — transcendental, left to the reader. Heavy
  * tails (small α) are the partition-skew warning: a source whose
  * lengths are power-law needs salting/AQE on any length-correlated
  * work, and this row says so BEFORE the straggler does.
  *
  * Scale: the P/R/F1 layer is confusion-table-sized; the tail scan
  * projects (source, len) thin and the per-group top-20 rides the
  * row_number window the RowNumberTopKRewrite rule collapses to the
  * custom GroupedTopK plan — never a full per-group sort.
  */
object CorpusOps80 {

  val qLangNbPrf: Q = (s, dir) =>
    prfFrom(CorpusOps62.langNbConfusionFrom(
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          (col("doc_id") % 2 === 0).as("train"))))

  /** The per-class readout behind [[qLangNbPrf]] and
    * `Graft.confusionPrf`: `conf` = (lang, pred_lang, n_docs). */
  private[graft] def prfFrom(conf0: DataFrame): DataFrame = {
    val conf = graft.CacheScope.track(conf0.persist())
    val classes = conf.select(col("lang").as("c"))
      .union(conf.select(col("pred_lang").as("c"))).distinct()
    val rowt = conf.groupBy(col("lang").as("c"))
      .agg(sum(col("n_docs")).as("rt"))
    val colt = conf.groupBy(col("pred_lang").as("c"))
      .agg(sum(col("n_docs")).as("ct"))
    val diag = conf.filter(col("lang") === col("pred_lang"))
      .groupBy(col("lang").as("c"))
      .agg(sum(col("n_docs")).as("tp"))
    classes
      .join(diag, Seq("c"), "left")
      .join(rowt, Seq("c"), "left")
      .join(colt, Seq("c"), "left")
      .select(col("c").as("lang"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("ct"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("rt"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"))
      .withColumn("precision_permille",
        expr("""CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
            ELSE tp * 1000 div (tp + fp) END"""))
      .withColumn("recall_permille",
        expr("""CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
            ELSE tp * 1000 div (tp + fn) END"""))
      .withColumn("f1_permille",
        expr("""CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
            ELSE 2 * tp * 1000 div (2 * tp + fp + fn) END"""))
      .orderBy(col("lang"))
  }

  val qTextLengthTail: Q = (s, dir) =>
    lengthTailFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text")),
      "grp")
      .withColumnRenamed("grp", "source")

  /** The tail table behind [[qTextLengthTail]] and
    * `Graft.lengthTail`: `docs` = (grp, doc_id, text). */
  private[graft] def lengthTailFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col(grp), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val w = Window.partitionBy(col(grp))
      .orderBy(col("len").desc, col("doc_id"))
    lens
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 20)
      .groupBy(col(grp))
      .agg(count(lit(1)).as("k"), min(col("len")).as("xk"),
        sum(expr("CAST(round(log2(len) * 1e6) AS BIGINT)")).as("slg"))
      .select(col(grp), col("k"), col("xk"),
        (col("slg") -
          col("k") * expr("CAST(round(log2(xk) * 1e6) AS BIGINT)"))
          .as("sum_lg_diff_micro"))
      .withColumn("hill_log2_micro",
        expr("""CASE WHEN k <= 1 THEN CAST(0 AS BIGINT)
            ELSE sum_lg_diff_micro div (k - 1) END"""))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_lang_nb_prf" -> qLangNbPrf,
    "q_text_length_tail" -> qTextLengthTail)

  val oracle: Map[String, String] = Map(
    "q_lang_nb_prf" -> """
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
                 FROM sc) WHERE rk = 1),
      conf AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
               FROM pred GROUP BY 1, 2),
      classes AS (SELECT lang AS c FROM conf
                  UNION SELECT pred_lang FROM conf),
      rowt AS (SELECT lang AS c, CAST(sum(n) AS BIGINT) AS rt
               FROM conf GROUP BY 1),
      colt AS (SELECT pred_lang AS c, CAST(sum(n) AS BIGINT) AS ct
               FROM conf GROUP BY 1),
      diag AS (SELECT lang AS c, CAST(sum(n) AS BIGINT) AS tp
               FROM conf WHERE lang = pred_lang GROUP BY 1),
      per AS (SELECT classes.c,
                coalesce(tp, 0) AS tp,
                coalesce(ct, 0) - coalesce(tp, 0) AS fp,
                coalesce(rt, 0) - coalesce(tp, 0) AS fn
              FROM classes
              LEFT JOIN diag USING (c)
              LEFT JOIN rowt USING (c)
              LEFT JOIN colt USING (c))
      SELECT c AS lang, tp, fp, fn,
        CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(tp * 1000 // (tp + fp) AS BIGINT)
        END AS precision_permille,
        CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(tp * 1000 // (tp + fn) AS BIGINT)
        END AS recall_permille,
        CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(2 * tp * 1000 // (2 * tp + fp + fn) AS BIGINT)
        END AS f1_permille
      FROM per ORDER BY lang""",
    "q_text_length_tail" -> """
      WITH l AS (SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                 FROM documents),
      top AS (SELECT source, len FROM (
                SELECT *, row_number() OVER (PARTITION BY source
                  ORDER BY len DESC, doc_id) AS rk
                FROM l) WHERE rk <= 20),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS k,
              CAST(min(len) AS BIGINT) AS xk,
              CAST(sum(CAST(round(log2(len) * 1e6) AS BIGINT))
                AS BIGINT) AS slg
            FROM top GROUP BY source)
      SELECT source, k, xk,
        slg - k * CAST(round(log2(xk) * 1e6) AS BIGINT)
          AS sum_lg_diff_micro,
        CASE WHEN k <= 1 THEN CAST(0 AS BIGINT)
          ELSE CAST((slg - k * CAST(round(log2(xk) * 1e6) AS BIGINT))
            // (k - 1) AS BIGINT)
        END AS hill_log2_micro
      FROM a ORDER BY source""")
}
