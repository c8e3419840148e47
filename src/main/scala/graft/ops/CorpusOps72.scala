package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 76 (SURVEY.md §2.M): BLEU ingredients
  * (Papineni et al., ACL 2002) — the PRECISION-side member completing
  * the text-overlap eval trio this library ships (q_eval_rouge =
  * word-gram recall/F1, q_eval_chrf = char-gram F2, THIS = the
  * clipped word-gram precisions 1..4 plus the brevity-penalty
  * ingredients). Corpus-level micro convention on the SAME
  * [[CorpusOps61.clipPipeline]]: per (grp, n ∈ 1..4) the clipped
  * overlap, candidate and reference gram totals, and
  * `bleu_p_permille` = overlap·1000 div cand_ngrams — the exact
  * modified n-gram precision p_n. The brevity penalty's ingredients
  * ride every row: `cand_len` / `ref_len` are the n = 1 totals
  * (corpus candidate length c and effective reference length r) and
  * `len_ratio_permille` = c·1000 div r; BP = exp(1 − r/c) and the
  * geometric mean are transcendental, so they are left to the
  * reader and the table stays exact — the chrF "the rows ARE the
  * ingredients" discipline.
  *
  * Pairing (declared): per source the reference is the LOWEST doc_id
  * and every other doc is a candidate, the rouge/chrF convention, so
  * the three metrics read side-by-side over the same pair census
  * (the n = 1 row is pinned value-for-value ≡ q_eval_rouge's).
  *
  * Scale: identical to rouge — one corpus scan to (grp, n, gram)
  * partials, the clip join co-partitioned on that key, never a
  * data-scaling broadcast; the length join is |sources|-row.
  */
object CorpusOps72 {

  val qEvalBleu: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text"))
    bleuFrom(docs, "grp").withColumnRenamed("grp", "source")
  }

  /** The per-doc word-gram stream (grp, doc_id, n ∈ 1..4, gram) —
    * one scan; grams are space-joined word windows (the rouge
    * unigram/bigram stream generalized to BLEU's four orders). */
  private[graft] def bleuGrams(docs: DataFrame, grp: String)
      : DataFrame =
    docs
      .select(col(grp), col("doc_id"),
        split(col("text"), " ").as("t"))
      .select(col(grp), col("doc_id"), explode(expr(
        """flatten(transform(sequence(1, 4), n ->
             CASE WHEN size(t) >= n THEN
               transform(sequence(1, size(t) - n + 1), i ->
                 named_struct('n', n,
                   'g', array_join(slice(t, i, n), ' ')))
             ELSE CAST(array() AS array<struct<n: int, g: string>>)
             END))""")).as("ng"))
      .select(col(grp), col("doc_id"), col("ng.n").cast("long").as("n"),
        col("ng.g").as("gram"))

  /** The BLEU table behind [[qEvalBleu]] and `Graft.bleuOverlap`:
    * `docs` = (grp, doc_id, text); reference = lowest doc_id per
    * grp. Emits per (grp, n ∈ 1..4) the clip ingredients, the exact
    * modified precision, and the brevity ingredients, div-guarded
    * to 0 on empty gram streams. */
  private[graft] def bleuFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val stats = CorpusOps61.clipPipeline(
      bleuGrams(docs, grp), docs, grp, 4)
    val lens = stats.filter(col("n") === 1L)
      .select(col(grp), col("cand_ngrams").as("cand_len"),
        col("ref_ngrams").as("ref_len"))
    stats.join(lens, Seq(grp))
      .select(col(grp), col("n"), col("n_pairs"), col("overlap"),
        col("cand_ngrams"), col("ref_ngrams"),
        expr("""CASE WHEN cand_ngrams = 0 THEN CAST(0 AS BIGINT)
            ELSE overlap * 1000 div cand_ngrams END""")
          .as("bleu_p_permille"),
        col("cand_len"), col("ref_len"),
        expr("""CASE WHEN ref_len = 0 THEN CAST(0 AS BIGINT)
            ELSE cand_len * 1000 div ref_len END""")
          .as("len_ratio_permille"))
      .orderBy(col(grp), col("n"))
  }

  val queries: Map[String, Q] = Map(
    "q_eval_bleu" -> qEvalBleu)

  val oracle: Map[String, String] = Map(
    "q_eval_bleu" -> """
      WITH d AS MATERIALIZED (
        SELECT source, doc_id, string_split(text, ' ') AS t
        FROM documents),
      refs AS (SELECT source, min(doc_id) AS ref_id
               FROM d GROUP BY source),
      g AS (SELECT source, doc_id, n,
              array_to_string(t[i:i + n - 1], ' ') AS gram
            FROM (SELECT *, unnest(range(1, len(t) - n + 2)) AS i
                  FROM (SELECT *, unnest([1, 2, 3, 4]) AS n
                        FROM d) t1) t2),
      c AS MATERIALIZED (
        SELECT source, doc_id, n, gram,
          CAST(count(*) AS BIGINT) AS c
        FROM g GROUP BY ALL),
      rc AS (SELECT c.source, n, gram, c AS cr
             FROM c JOIN refs ON c.source = refs.source
               AND c.doc_id = refs.ref_id),
      cc AS (SELECT c.* FROM c JOIN refs ON c.source = refs.source
               AND c.doc_id <> refs.ref_id),
      ovl AS (SELECT source, n,
                CAST(sum(least(c, cr)) AS BIGINT) AS overlap
              FROM cc JOIN rc USING (source, n, gram) GROUP BY 1, 2),
      ct AS (SELECT source, n, CAST(sum(c) AS BIGINT) AS cand_ngrams
             FROM cc GROUP BY 1, 2),
      rt AS (SELECT source, n, CAST(sum(cr) AS BIGINT) AS ref_tot
             FROM rc GROUP BY 1, 2),
      np AS (SELECT source, CAST(count(*) - 1 AS BIGINT) AS n_pairs
             FROM d GROUP BY source),
      grid AS (SELECT source, n_pairs, n
               FROM np, unnest([1, 2, 3, 4]) t(n)),
      j AS (SELECT g.source, g.n, g.n_pairs,
              coalesce(ovl.overlap, 0) AS overlap,
              coalesce(ct.cand_ngrams, 0) AS cand_ngrams,
              coalesce(rt.ref_tot, 0) * g.n_pairs AS ref_ngrams
            FROM grid g
            LEFT JOIN ct USING (source, n)
            LEFT JOIN ovl USING (source, n)
            LEFT JOIN rt USING (source, n)),
      lens AS (SELECT source, cand_ngrams AS cand_len,
                 ref_ngrams AS ref_len
               FROM j WHERE n = 1)
      SELECT j.source, CAST(n AS BIGINT) AS n, n_pairs,
        CAST(overlap AS BIGINT) AS overlap,
        CAST(cand_ngrams AS BIGINT) AS cand_ngrams,
        CAST(ref_ngrams AS BIGINT) AS ref_ngrams,
        CASE WHEN cand_ngrams = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(overlap * 1000 // cand_ngrams AS BIGINT)
        END AS bleu_p_permille,
        CAST(cand_len AS BIGINT) AS cand_len,
        CAST(ref_len AS BIGINT) AS ref_len,
        CASE WHEN ref_len = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(cand_len * 1000 // ref_len AS BIGINT)
        END AS len_ratio_permille
      FROM j JOIN lens ON j.source = lens.source
      ORDER BY j.source, n""")
}
