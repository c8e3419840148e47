package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 45 (SURVEY.md §2.M): the embedding
  * anisotropy audit (Ethayarajh, "How Contextual are Contextualized
  * Word Representations?", EMNLP 2019 — the mean-pairwise-cosine
  * health check run before trusting cosine retrieval), the
  * Heaps-law vocabulary growth curve (Heaps 1978 — the type-vs-token
  * measurement that motivates every vocab-bounded broadcast gate in
  * this library), per-source byte-fallback rate against a trusted
  * alphabet (the SentencePiece character_coverage dial), and Cohen's
  * kappa over the Naive-Bayes filter's held-out confusion (Cohen
  * 1960 — the chance-corrected twin of q_quality_nb_train's raw
  * accuracy).
  *
  * Determinism contract: cosines are identical IEEE expression trees
  * over exact int64 dots, rounded to per-pair integer micro BEFORE
  * any cross-row sum (shuffle-order invariance); everything else is
  * exact integer arithmetic.
  */
object CorpusOps51 {

  // ---------------------------------------------------------------
  // q_emb_anisotropy — mean pairwise cosine audit
  // ---------------------------------------------------------------

  /** Embedding anisotropy audit (Ethayarajh 2019): over all pairs of
    * the 50 lowest-id vectors, the mean / mean-absolute / min / max
    * cosine — overall and split within-label vs cross-label. An
    * isotropic space averages ≈ 0; a high positive mean is the
    * anisotropy cone that makes raw cosine thresholds meaningless,
    * and a within-vs-cross gap is the label-separation signal a
    * contrastive-training run watches. Per-pair cosines round to
    * integer micro BEFORE summing (order-invariant); the audit
    * touches only the bounded query set (1225 pairs, broadcast). */
  val qEmbAnisotropy: Q = (s, dir) =>
    anisotropyFrom(EmbQuant.quantized(s, dir)
      .select(col("vec_id"), col("label"), col("q"))
      .filter(col("vec_id") < 50))

  /** The audit behind [[qEmbAnisotropy]] and `Graft.anisotropyAudit`:
    * `emb0` = a BOUNDED (vec_id, label, q) query set, q
    * micro-quantized int64. */
  private[graft] def anisotropyFrom(emb0: DataFrame): DataFrame = {
    val emb = emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
    val a = emb.select(col("vec_id").as("ida"), col("label").as("la"),
      col("q").as("qa"), col("n2").as("n2a"))
    val b = emb.select(col("vec_id").as("idb"), col("label").as("lb"),
      col("q").as("qb"), col("n2").as("n2b"))
    val pairs = a.join(broadcast(b), col("ida") < col("idb"))
      .select(
        when(col("la") === col("lb"), "within").otherwise("cross")
          .as("segment"),
        round((EmbQuant.dotq(col("qa"), col("qb")).cast("double") /
          (sqrt(col("n2a").cast("double")) *
            sqrt(col("n2b").cast("double")))) * lit(1e6)).cast("long")
          .as("cos_micro"))
    val all = pairs.withColumn("segment", lit("all"))
    all.unionAll(pairs)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(cos_micro) div count(1)").as("mean_cos_micro"),
        expr("sum(abs(cos_micro)) div count(1)").as("mean_abs_cos_micro"),
        min(col("cos_micro")).as("min_cos_micro"),
        max(col("cos_micro")).as("max_cos_micro"))
      .orderBy(col("segment"))
  }

  // ---------------------------------------------------------------
  // q_text_heaps — vocabulary growth curve
  // ---------------------------------------------------------------

  /** Heaps-law vocabulary growth (Heaps 1978): cumulative distinct
    * token TYPES at the 25/50/75/100% corpus-prefix checkpoints
    * (prefix = doc_id order — the ingest order), with cumulative
    * docs, tokens, and the type-token ratio in micro. The curve's
    * sublinear bend (V ∝ N^β) is the measurement behind every
    * vocab-grows-with-corpus broadcast gate in this library.
    *
    * Scale: ONE token scan — each type carries its FIRST-APPEARANCE
    * quarter (min bucket), so types-at-checkpoint is a vocab-sized
    * rollup, never four corpus passes; docs/tokens accumulate from
    * 4-row per-bucket counts. */
  val qTextHeaps: Q = (s, dir) =>
    heapsFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")))

  /** The curve behind [[qTextHeaps]] and `Graft.heapsCurve`:
    * `docs` = (doc_id, text); buckets = id-prefix quarters. */
  private[graft] def heapsFrom(docs: DataFrame): DataFrame = {
    val mx = docs.agg((max(col("doc_id")) + 1).as("mx"))
    val bucketed = docs.crossJoin(broadcast(mx))
      .withColumn("b", least(expr("doc_id * 4 div mx") + 1, lit(4L)))
    val dCnt = bucketed.groupBy(col("b")).agg(count(lit(1)).as("nd"))
    val toks = bucketed
      .select(col("b"), explode(split(col("text"), " ")).as("tok"))
    val tCnt = toks.groupBy(col("b")).agg(count(lit(1)).as("nt"))
    val first = toks.groupBy(col("tok")).agg(min(col("b")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("nv"))
    val cps = docs.sparkSession.range(1, 5)
      .select(col("id").as("quarter"))
    def cum(df: DataFrame, key: String, v: String, out: String) =
      cps.join(df, col(key) <= col("quarter"), "left")
        .groupBy(col("quarter"))
        .agg(coalesce(sum(col(v)), lit(0L)).as(out))
    cum(dCnt, "b", "nd", "n_docs")
      .join(cum(tCnt, "b", "nt", "n_tokens"), "quarter")
      .join(cum(first, "fb", "nv", "n_types"), "quarter")
      .withColumn("ttr_micro", expr("n_types * 1000000 div n_tokens"))
      .orderBy(col("quarter"))
  }

  // ---------------------------------------------------------------
  // q_tok_byte_fallback — character coverage vs a trusted alphabet
  // ---------------------------------------------------------------

  /** Byte-fallback rate (the SentencePiece character_coverage dial):
    * the alphabet is the distinct characters of the TRUSTED slice's
    * tokens (source = 'src0' — the slice a tokenizer trains on); per
    * source, the permille of token occurrences containing any
    * character OUTSIDE that alphabet — the tokens a deployed
    * tokenizer would byte-fallback on. The alphabet is script-sized
    * (bounded), so the check is a map-side HOF against a collected
    * literal; the oracle recomputes the alphabet relationally —
    * same set, one value gate. */
  val qTokByteFallback: Q = (s, dir) =>
    byteFallbackFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text"),
        (col("source") === "src0").as("trusted")), "grp")
      .withColumnRenamed("grp", "source")

  /** The coverage table behind [[qTokByteFallback]] and
    * `Graft.byteFallback`: `docs` = (grp, text, trusted). */
  private[graft] def byteFallbackFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val alphabet: Seq[String] = docs.filter(col("trusted"))
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(explode(expr(
        "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"))
        .as("ch"))
      .distinct().orderBy(col("ch"))
      .collect().map(_.getString(0)).toSeq
    docs.select(col(grp),
        explode(split(col("text"), " ")).as("tok"))
      .withColumn("alpha", typedLit(alphabet))
      .withColumn("fb", (size(expr(
        "array_except(transform(sequence(1, length(tok)), " +
          "i -> substring(tok, i, 1)), alpha)")) > 0).cast("long"))
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_tokens"), sum(col("fb"))
        .as("fallback_tokens"))
      .withColumn("fallback_permille",
        expr("fallback_tokens * 1000 div n_tokens"))
      .orderBy(col(grp))
  }

  // ---------------------------------------------------------------
  // q_quality_nb_kappa — chance-corrected filter agreement
  // ---------------------------------------------------------------

  /** Cohen's kappa for the Naive-Bayes quality filter vs the Gopher
    * labels on the held-out half (Cohen 1960): κ = (p_o − p_e) /
    * (1 − p_e) with the chance term from the marginals — the
    * accuracy readout that cannot be gamed by predicting the
    * majority class. Exact rational permille:
    * κ‰ = ((tp+tn)·n − pe_num)·1000 div (n² − pe_num) with
    * pe_num = (tp+fp)(tp+fn) + (fn+tn)(fp+tn). Shares the full
    * confusion pipeline with q_quality_nb_train. */
  val qQualityNbKappa: Q = (s, dir) =>
    CorpusOps50.nbConfusion(s, dir)
      .withColumn("pe_num",
        expr("(tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)"))
      .select(col("source"), col("n_eval"),
        expr("(tp + tn) * 1000 div n_eval").as("po_permille"),
        expr("pe_num * 1000 div (n_eval * n_eval)").as("pe_permille"),
        expr("""CASE WHEN n_eval * n_eval - pe_num > 0
                THEN ((tp + tn) * n_eval - pe_num) * 1000
                     div (n_eval * n_eval - pe_num)
                ELSE 0 END""").as("kappa_permille"))
      .orderBy(col("source"))

  val queries: Map[String, Q] = Map(
    "q_emb_anisotropy" -> qEmbAnisotropy,
    "q_text_heaps" -> qTextHeaps,
    "q_tok_byte_fallback" -> qTokByteFallback,
    "q_quality_nb_kappa" -> qQualityNbKappa)

  val oracle: Map[String, String] = Map(
    "q_emb_anisotropy" -> s"""
      WITH e AS MATERIALIZED (
        SELECT vec_id, r.i AS i,
          CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000) AS BIGINT)
            AS v
        FROM embeddings, range(1, 65) r(i) WHERE vec_id < 50),
      lab AS (SELECT vec_id, label FROM embeddings WHERE vec_id < 50),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      dots AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      pr AS (SELECT
               CASE WHEN la.label = lb.label THEN 'within'
                    ELSE 'cross' END AS segment,
               CAST(round(CAST(dot AS DOUBLE) /
                 (sqrt(CAST(na.n2 AS DOUBLE)) *
                  sqrt(CAST(nb.n2 AS DOUBLE))) * 1e6) AS BIGINT)
                 AS cos_micro
             FROM dots JOIN n na ON ida = na.vec_id
                       JOIN n nb ON idb = nb.vec_id
                       JOIN lab la ON ida = la.vec_id
                       JOIN lab lb ON idb = lb.vec_id),
      seg AS (SELECT segment, cos_micro FROM pr
              UNION ALL SELECT 'all', cos_micro FROM pr)
      SELECT segment, count(*) AS n_pairs,
        CAST(sum(cos_micro) // count(*) AS BIGINT) AS mean_cos_micro,
        CAST(sum(abs(cos_micro)) // count(*) AS BIGINT)
          AS mean_abs_cos_micro,
        CAST(min(cos_micro) AS BIGINT) AS min_cos_micro,
        CAST(max(cos_micro) AS BIGINT) AS max_cos_micro
      FROM seg GROUP BY segment ORDER BY segment""",
    "q_text_heaps" -> """
      WITH mx AS (SELECT max(doc_id) + 1 AS mx FROM documents),
      d AS (SELECT doc_id, text,
              least(doc_id * 4 // mx + 1, 4) AS b
            FROM documents CROSS JOIN mx),
      dc AS (SELECT b, count(*) AS nd FROM d GROUP BY b),
      toks AS (SELECT b, unnest(string_split(text, ' ')) AS tok FROM d),
      tc AS (SELECT b, count(*) AS nt FROM toks GROUP BY b),
      fv AS (SELECT fb, count(*) AS nv FROM (
               SELECT tok, min(b) AS fb FROM toks GROUP BY tok) f
             GROUP BY fb),
      q AS (SELECT unnest(range(1, 5)) AS quarter)
      SELECT CAST(q.quarter AS BIGINT) AS quarter,
        CAST((SELECT coalesce(sum(nd), 0) FROM dc
              WHERE dc.b <= q.quarter) AS BIGINT) AS n_docs,
        CAST((SELECT coalesce(sum(nt), 0) FROM tc
              WHERE tc.b <= q.quarter) AS BIGINT) AS n_tokens,
        CAST((SELECT coalesce(sum(nv), 0) FROM fv
              WHERE fv.fb <= q.quarter) AS BIGINT) AS n_types,
        CAST((SELECT coalesce(sum(nv), 0) FROM fv
              WHERE fv.fb <= q.quarter) * 1000000 //
          (SELECT sum(nt) FROM tc WHERE tc.b <= q.quarter) AS BIGINT)
          AS ttr_micro
      FROM q ORDER BY quarter""",
    "q_tok_byte_fallback" -> """
      WITH occ AS (SELECT source,
              unnest(string_split(text, ' ')) AS tok
            FROM documents),
      alpha AS (SELECT DISTINCT ch FROM (
          SELECT unnest(string_split_regex(tok, '')) AS ch
          FROM occ WHERE source = 'src0') a
        WHERE ch <> ''),
      oc AS (SELECT source, tok,
               CASE WHEN EXISTS (
                 SELECT 1 FROM (
                   SELECT unnest(string_split_regex(oc0.tok, '')) AS ch) c
                 WHERE c.ch <> ''
                   AND c.ch NOT IN (SELECT ch FROM alpha))
                 THEN 1 ELSE 0 END AS fb
             FROM occ oc0)
      SELECT source, count(*) AS n_tokens,
        CAST(sum(fb) AS BIGINT) AS fallback_tokens,
        CAST(sum(fb) * 1000 // count(*) AS BIGINT) AS fallback_permille
      FROM oc GROUP BY source ORDER BY source""",
    "q_quality_nb_kappa" -> s"""
      WITH ${CorpusOps50.nbConfusionSql},
      k AS (SELECT source, n_eval, tp, fp, fn, tn,
              (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS pe_num
            FROM cm)
      SELECT source, n_eval,
        CAST((tp + tn) * 1000 // n_eval AS BIGINT) AS po_permille,
        CAST(pe_num * 1000 // (n_eval * n_eval) AS BIGINT)
          AS pe_permille,
        CAST(CASE WHEN n_eval * n_eval - pe_num > 0
             THEN ((tp + tn) * n_eval - pe_num) * 1000
                  // (n_eval * n_eval - pe_num)
             ELSE 0 END AS BIGINT) AS kappa_permille
      FROM k ORDER BY source""")
}
