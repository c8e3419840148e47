package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 waves 62 + 66 (SURVEY.md §2.M): ROUGE-N
  * overlap (Lin, ACL 2004 workshop) and chrF2 (Popović, WMT 2015) —
  * the text-overlap eval family the engine lacked beside its
  * retrieval (recall/MRR/nDCG) and preference (BT/Elo/winrate)
  * metrics, at BOTH granularities (word grams / char grams — chrF
  * is the tokenization-robust twin). ROUGE-1/ROUGE-2 with CLIPPED
  * n-gram counts: per (candidate, reference) pair and gram g the
  * overlap contribution is min(count_cand(g), count_ref(g)); micro
  * precision = Σclip / Σ candidate grams, micro recall = Σclip /
  * Σ reference grams (the reference counted once per pair), and
  * F1 = 2·Σclip / (cand + ref) — the 2PR/(P+R) identity in pure
  * integers, so every permille is exact. chrF2's β = 2 weighting
  * collapses the same way: F2 = 5·Σclip / (4·ref + cand).
  *
  * Pairing (declared): per source, the reference is the LOWEST
  * doc_id and every other doc in the source is a candidate — the
  * "compare the feed against its exemplar" reading; the facade takes
  * an arbitrary (reference, candidate) pair frame.
  *
  * Scale: gram counts are one corpus scan partial-aggregated on
  * (source, n, gram); the clip join is co-partitioned on the SAME
  * key (never broadcast — a reference document is bounded but the
  * per-source reference SET scales with |sources|); the |sources|-row
  * ref-id table broadcasts. No all-pairs anything: each candidate
  * joins one reference.
  */
object CorpusOps61 {

  val qEvalRouge: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text"))
    rougeFrom(docs, "grp").withColumnRenamed("grp", "source")
  }

  /** The generic clipped-overlap pipeline shared by ROUGE (word
    * grams) and chrF (char grams): `grams` = the exploded per-doc
    * (grp, doc_id, n, gram) stream, `docs` = (grp, doc_id, ...) for
    * the ref pick + pair census, `nMax` = the gram orders 1..nMax.
    * Emits per (grp, n): n_pairs, overlap (Σ min(count_cand,
    * count_ref)), cand_ngrams, ref_ngrams (reference grams ×
    * n_pairs — the reference is scored once per pair, the micro
    * convention), with empty gram streams coalesced to 0. */
  private[graft] def clipPipeline(grams: DataFrame, docs: DataFrame,
      grp: String, nMax: Int): DataFrame =
    clipStats(grams
      .groupBy(col(grp), col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c")), docs, grp, nMax)

  /** [[clipPipeline]] from pre-aggregated per-doc gram counts
    * (grp, doc_id, n, gram, c) — the entry the streaming ingest twin
    * rolls its appended partials into. */
  private[graft] def clipStats(counts0: DataFrame, docs: DataFrame,
      grp: String, nMax: Int): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val refs = docs.groupBy(col(grp))
      .agg(min(col("doc_id")).as("ref_id"))
    val counts = graft.CacheScope.track(counts0
      .join(broadcast(refs), Seq(grp))
      .persist(mad))
    val refCounts = counts.filter(col("doc_id") === col("ref_id"))
      .select(col(grp), col("n"), col("gram"), col("c").as("cr"))
    val candCounts = counts.filter(col("doc_id") =!= col("ref_id"))
    val ovl = candCounts
      .join(refCounts, Seq(grp, "n", "gram"))
      .groupBy(col(grp), col("n"))
      .agg(sum(least(col("c"), col("cr"))).as("overlap"))
    val candTot = candCounts.groupBy(col(grp), col("n"))
      .agg(sum(col("c")).as("cand_ngrams"))
    val refTot = refCounts.groupBy(col(grp), col("n"))
      .agg(sum(col("cr")).as("ref_tot"))
    val grid = docs.groupBy(col(grp))
      .agg((count(lit(1)) - 1L).as("n_pairs"))
      .crossJoin(broadcast(docs.sparkSession
        .range(1, nMax + 1L).select(col("id").as("n"))))
    grid
      .join(candTot, Seq(grp, "n"), "left")
      .join(ovl, Seq(grp, "n"), "left")
      .join(refTot, Seq(grp, "n"), "left")
      .select(col(grp), col("n"), col("n_pairs"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("cand_ngrams"), lit(0L)).as("cand_ngrams"),
        (coalesce(col("ref_tot"), lit(0L)) * col("n_pairs"))
          .as("ref_ngrams"))
  }

  /** The ROUGE table behind [[qEvalRouge]] and `Graft.rougeOverlap`:
    * `docs` = (grp, doc_id, text); reference = lowest doc_id per grp.
    * Emits per (grp, n ∈ {1, 2}): the [[clipPipeline]] ingredients
    * plus exact-permille P/R/F1, div-guarded to 0 on empty gram
    * streams. */
  private[graft] def rougeFrom(docs: DataFrame, grp: String)
      : DataFrame =
    rougeReadout(clipPipeline(wordGrams(docs, grp), docs, grp, 2), grp)

  /** The per-doc word-gram stream (grp, doc_id, n ∈ {1, 2}, gram) —
    * one scan: unigrams are the token list, bigrams the space-joined
    * adjacent pairs. Shared with the streaming ingest twin. */
  private[graft] def wordGrams(docs: DataFrame, grp: String)
      : DataFrame =
    docs
      .select(col(grp), col("doc_id"),
        split(col("text"), " ").as("t"))
      .select(col(grp), col("doc_id"), explode(expr(
        """concat(
             transform(t, w -> named_struct('n', 1, 'g', w)),
             CASE WHEN size(t) >= 2 THEN
               transform(sequence(1, size(t) - 1), i ->
                 named_struct('n', 2, 'g', concat(element_at(t, i),
                   ' ', element_at(t, i + 1))))
             ELSE CAST(array() AS array<struct<n: int, g: string>>)
             END)""")).as("ng"))
      .select(col(grp), col("doc_id"), col("ng.n").cast("long").as("n"),
        col("ng.g").as("gram"))

  /** The exact-permille P/R/F1 readout over [[clipStats]] output —
    * shared by [[rougeFrom]] and the streaming twin's rollup. */
  private[graft] def rougeReadout(stats: DataFrame, grp: String)
      : DataFrame =
    stats
      .select(col(grp), col("n"), col("n_pairs"), col("overlap"),
        col("cand_ngrams"), col("ref_ngrams"),
        expr("""CASE WHEN cand_ngrams = 0 THEN CAST(0 AS BIGINT)
            ELSE overlap * 1000 div cand_ngrams END""")
          .as("rouge_p_permille"),
        expr("""CASE WHEN ref_ngrams = 0 THEN CAST(0 AS BIGINT)
            ELSE overlap * 1000 div ref_ngrams END""")
          .as("rouge_r_permille"),
        expr("""CASE WHEN cand_ngrams + ref_ngrams = 0
            THEN CAST(0 AS BIGINT)
            ELSE overlap * 2000 div (cand_ngrams + ref_ngrams) END""")
          .as("rouge_f_permille"))
      .orderBy(col(grp), col("n"))

  val qEvalChrf: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text"))
    chrfFrom(docs, "grp").withColumnRenamed("grp", "source")
  }

  /** chrF2 ingredients (Popović, WMT 2015) behind [[qEvalChrf]] and
    * `Graft.chrfOverlap` — the CHARACTER-level sibling of
    * [[rougeFrom]], robust to tokenization: per (grp, n ∈ 1..6)
    * clipped char-n-gram overlap on the whitespace-stripped text
    * (the sacrebleu convention), same pairing, same micro
    * convention. chrF's β = 2 recall weighting collapses to pure
    * integers: F2 = 5PR/(4P + R) = 5·overlap / (4·ref + cand), so
    * `chrf2_permille` = 5000·overlap div (4·ref_ngrams +
    * cand_ngrams), div-guarded. The six per-n rows ARE the metric's
    * ingredients — the standard score is their plain average, left
    * to the reader so the table stays exact. */
  private[graft] def chrfFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val grams = docs
      .select(col(grp), col("doc_id"),
        regexp_replace(col("text"), " ", "").as("ch"))
      .select(col(grp), col("doc_id"), explode(expr(
        """flatten(transform(sequence(1, 6), n ->
             CASE WHEN length(ch) >= n THEN
               transform(sequence(1, length(ch) - n + 1), i ->
                 named_struct('n', n, 'g', substring(ch, i, n)))
             ELSE CAST(array() AS array<struct<n: int, g: string>>)
             END))""")).as("ng"))
      .select(col(grp), col("doc_id"), col("ng.n").cast("long").as("n"),
        col("ng.g").as("gram"))
    clipPipeline(grams, docs, grp, 6)
      .select(col(grp), col("n"), col("n_pairs"), col("overlap"),
        col("cand_ngrams"), col("ref_ngrams"),
        expr("""CASE WHEN 4 * ref_ngrams + cand_ngrams = 0
            THEN CAST(0 AS BIGINT)
            ELSE overlap * 5000 div (4 * ref_ngrams + cand_ngrams)
            END""").as("chrf2_permille"))
      .orderBy(col(grp), col("n"))
  }

  val queries: Map[String, Q] = Map(
    "q_eval_rouge" -> qEvalRouge,
    "q_eval_chrf" -> qEvalChrf)

  val oracle: Map[String, String] = Map(
    "q_eval_chrf" -> """
      WITH d AS MATERIALIZED (
        SELECT source, doc_id, replace(text, ' ', '') AS ch
        FROM documents),
      refs AS (SELECT source, min(doc_id) AS ref_id
               FROM d GROUP BY source),
      g AS (SELECT source, doc_id, n, substring(ch, i, n) AS gram
            FROM (SELECT *, unnest(range(1, length(ch) - n + 2)) AS i
                  FROM (SELECT *, unnest([1, 2, 3, 4, 5, 6]) AS n
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
               FROM np, unnest([1, 2, 3, 4, 5, 6]) t(n)),
      j AS (SELECT g.source, g.n, g.n_pairs,
              coalesce(ovl.overlap, 0) AS overlap,
              coalesce(ct.cand_ngrams, 0) AS cand_ngrams,
              coalesce(rt.ref_tot, 0) * g.n_pairs AS ref_ngrams
            FROM grid g
            LEFT JOIN ct USING (source, n)
            LEFT JOIN ovl USING (source, n)
            LEFT JOIN rt USING (source, n))
      SELECT source, CAST(n AS BIGINT) AS n, n_pairs,
        CAST(overlap AS BIGINT) AS overlap,
        CAST(cand_ngrams AS BIGINT) AS cand_ngrams,
        CAST(ref_ngrams AS BIGINT) AS ref_ngrams,
        CASE WHEN 4 * ref_ngrams + cand_ngrams = 0
          THEN CAST(0 AS BIGINT)
          ELSE CAST(overlap * 5000 // (4 * ref_ngrams + cand_ngrams)
            AS BIGINT)
        END AS chrf2_permille
      FROM j ORDER BY source, n""",
    "q_eval_rouge" -> """
      WITH d AS MATERIALIZED (
        SELECT source, doc_id, string_split(text, ' ') AS t
        FROM documents),
      refs AS (SELECT source, min(doc_id) AS ref_id
               FROM d GROUP BY source),
      g AS (SELECT source, doc_id, 1 AS n, unnest(t) AS gram FROM d
            UNION ALL
            SELECT source, doc_id, 2 AS n, t[i] || ' ' || t[i + 1]
            FROM (SELECT *, unnest(range(1, len(t))) AS i FROM d)),
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
               FROM np, (SELECT 1 AS n UNION ALL SELECT 2) nn),
      j AS (SELECT g.source, g.n, g.n_pairs,
              coalesce(ovl.overlap, 0) AS overlap,
              coalesce(ct.cand_ngrams, 0) AS cand_ngrams,
              coalesce(rt.ref_tot, 0) * g.n_pairs AS ref_ngrams
            FROM grid g
            LEFT JOIN ct USING (source, n)
            LEFT JOIN ovl USING (source, n)
            LEFT JOIN rt USING (source, n))
      SELECT source, CAST(n AS BIGINT) AS n, n_pairs,
        CAST(overlap AS BIGINT) AS overlap,
        CAST(cand_ngrams AS BIGINT) AS cand_ngrams,
        CAST(ref_ngrams AS BIGINT) AS ref_ngrams,
        CASE WHEN cand_ngrams = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(overlap * 1000 // cand_ngrams AS BIGINT)
        END AS rouge_p_permille,
        CASE WHEN ref_ngrams = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(overlap * 1000 // ref_ngrams AS BIGINT)
        END AS rouge_r_permille,
        CASE WHEN cand_ngrams + ref_ngrams = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(overlap * 2000 // (cand_ngrams + ref_ngrams)
            AS BIGINT)
        END AS rouge_f_permille
      FROM j ORDER BY source, n""")
}
