package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 47 (SURVEY.md §2.M): the BPE-vs-unigram
  * learned-vocabulary overlap (the tokenizer-choice table joining the
  * two trainers this library ships), the perplexity-vs-length bias
  * curve (the known LM-filter pitfall — perplexity scores penalize
  * short documents, so a flat threshold silently length-filters), and
  * McNemar's paired disagreement test between the Gopher and C4 rule
  * batteries (Cohen/McNemar 1947 — "are the two filters
  * interchangeable" answered with counts, not vibes).
  *
  * Determinism contract: exact integer arithmetic; log micro-bits
  * from the shared per-term bridge; power-of-two length buckets via
  * the binary-string-length trick (no floating log near a boundary).
  */
object CorpusOps53 {

  // ---------------------------------------------------------------
  // q_tok_algo_overlap — BPE vs unigram learned vocabularies
  // ---------------------------------------------------------------

  /** Learned-vocabulary overlap between the two shipped tokenizer
    * trainers at their declared operating points (BPE after 6 merges;
    * the unigram trainer's final piece table): BPE symbols normalize
    * by stripping the `</w>` end-marker (the pure marker row drops),
    * then one full-outer set comparison — sizes, intersection, and
    * Jaccard permille. High overlap = the algorithms agree on this
    * corpus and the cheaper one wins; low overlap = segment-quality
    * eval (fertility tables) should decide. Both vocabularies are
    * dictionary-bounded; the comparison is tiny. */
  val qTokAlgoOverlap: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents").select(col("text"))
    val dict0 = graft.CacheScope.track(
      TextAnalysis.symbolizedDocs(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val merges = TextAnalysis.bpeMerges(dict0, 6)
      .orderBy(col("round")).collect().map(_.getString(1)).toSeq
    val bpe = TextAnalysis.applyMerges(dict0, merges)
      .select(explode(split(col("sym"), " ")).as("sm"))
      .select(regexp_replace(col("sm"), "</w>$", "").as("piece"))
      .filter(col("piece") =!= "").distinct()
      .withColumn("in_bpe", lit(1L))
    val uni = CorpusOps49.unigramCore(docs)._1
      .select(col("piece")).withColumn("in_uni", lit(1L))
    bpe.join(uni, Seq("piece"), "full_outer")
      .agg(sum(coalesce(col("in_bpe"), lit(0L))).as("n_bpe"),
        sum(coalesce(col("in_uni"), lit(0L))).as("n_unigram"),
        sum(coalesce(col("in_bpe"), lit(0L)) *
          coalesce(col("in_uni"), lit(0L))).as("n_common"))
      .select(col("n_bpe"), col("n_unigram"), col("n_common"),
        expr("""n_common * 1000
                div (n_bpe + n_unigram - n_common)""")
          .as("jaccard_permille"))
  }

  // ---------------------------------------------------------------
  // q_text_ppl_length_bias — perplexity vs length curve
  // ---------------------------------------------------------------

  /** Perplexity-vs-length bias curve (the documented pitfall of
    * LM-based quality filtering — e.g. CCNet-style filters penalize
    * short documents): per power-of-two bigram-count bucket, the
    * mean / min / max per-bigram rate (nano-bits) under the same
    * add-one bigram LM as q_text_perplexity (trained on src0,
    * scoring the rest). A falling mean across buckets is the length
    * bias a threshold-setter must correct for (bucket-conditional
    * cuts — exactly what q_text_ccnet_cut's terciles do per
    * language). Buckets via binary-string length (exact at the
    * boundary); LM joins ride the measured-cardinality gate. */
  val qTextPplLengthBias: Q = (s, dir) => {
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
    val v = docs.filter(col("source") === "src0")
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bg.filter(col("source") =!= "src0")
      .join(AutoBroadcast.gate(c12, nTypes, lmLimit),
        Seq("w1", "w2"), "left")
      .join(AutoBroadcast.gate(c1, nTypes, lmLimit), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("bits_micro", expr(
        """cast(round(log2(coalesce(c1, 0) + v) * 1e6) as bigint)
           - cast(round(log2(coalesce(c12, 0) + 1) * 1e6) as bigint)"""))
      .groupBy(col("doc_id"))
      .agg(sum(col("bits_micro")).as("nll_micro"),
        count(lit(1)).as("nb"))
      .withColumn("rate_nbits", expr("nll_micro * 1000 div nb"))
      .withColumn("len_bucket",
        (length(expr("conv(cast(nb as string), 10, 2)")) - 1)
          .cast("long"))
      .groupBy(col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("nb")).as("min_bigrams"), max(col("nb")).as("max_bigrams"),
        expr("sum(rate_nbits) div count(1)").as("mean_rate_nbits"),
        min(col("rate_nbits")).as("min_rate_nbits"),
        max(col("rate_nbits")).as("max_rate_nbits"))
      .orderBy(col("len_bucket"))
  }

  // ---------------------------------------------------------------
  // q_eval_mcnemar — paired battery disagreement
  // ---------------------------------------------------------------

  /** McNemar's paired test between the Gopher A1.1 and C4 batteries
    * (McNemar 1947): per source, the 2×2 agreement counts (both
    * pass / gopher-only b / c4-only c / neither) and the McNemar
    * statistic (b − c)²·1000 div (b + c) in milli (0 when b = c = 0).
    * A large statistic = the batteries disagree SYSTEMATICALLY (one
    * is strictly harsher), so they are not interchangeable — the
    * filter-consolidation question answered with counts. ONE scan
    * evaluates both batteries per document (the Gopher flags via the
    * shared gopherFlagged code, the C4 conjunction inline). */
  val qEvalMcnemar: Q = (s, dir) => {
    val flagged = CorpusOps46.gopherFlagged(
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")),
      Seq("doc_id", "source", "text"))
      // the SHARED C4 flag code (CorpusOps50.c4DocFlag) — the McNemar
      // cells are only meaningful if this battery IS q_text_c4_rules
      .withColumn("c4", CorpusOps50.c4DocFlag)
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_all") * col("c4")).as("both_pass"),
        sum(col("r_all") * (lit(1L) - col("c4"))).as("gopher_only"),
        sum((lit(1L) - col("r_all")) * col("c4")).as("c4_only"),
        sum((lit(1L) - col("r_all")) * (lit(1L) - col("c4")))
          .as("neither"))
      .withColumn("mcnemar_milli", expr(
        """CASE WHEN gopher_only + c4_only > 0
           THEN (gopher_only - c4_only) * (gopher_only - c4_only)
                * 1000 div (gopher_only + c4_only)
           ELSE 0 END"""))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_tok_algo_overlap" -> qTokAlgoOverlap,
    "q_text_ppl_length_bias" -> qTextPplLengthBias,
    "q_eval_mcnemar" -> qEvalMcnemar)

  val oracle: Map[String, String] = Map(
    "q_tok_algo_overlap" -> s"""
      WITH ${TextAnalysis.bpeChainSql},
      bpe AS (SELECT DISTINCT regexp_replace(sm, '</w>$$', '') AS piece
              FROM (SELECT unnest(string_split(sym, ' ')) AS sm
                    FROM d6) u
              WHERE regexp_replace(sm, '</w>$$', '') <> ''),
      ${CorpusOps49.coreSql},
      uni AS (SELECT piece FROM cnt1),
      j AS (SELECT coalesce(b.piece, u2.piece) AS piece,
              CASE WHEN b.piece IS NULL THEN 0 ELSE 1 END AS in_bpe,
              CASE WHEN u2.piece IS NULL THEN 0 ELSE 1 END AS in_uni
            FROM bpe b FULL OUTER JOIN uni u2 ON b.piece = u2.piece)
      SELECT CAST(sum(in_bpe) AS BIGINT) AS n_bpe,
        CAST(sum(in_uni) AS BIGINT) AS n_unigram,
        CAST(sum(in_bpe * in_uni) AS BIGINT) AS n_common,
        CAST(sum(in_bpe * in_uni) * 1000 //
          (sum(in_bpe) + sum(in_uni) - sum(in_bpe * in_uni)) AS BIGINT)
          AS jaccard_permille
      FROM j""",
    "q_text_ppl_length_bias" -> """
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                    FROM documents),
      bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
             FROM (SELECT *, unnest(range(1, len(t))) AS i FROM toks)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
              WHERE source = 'src0' GROUP BY 1, 2),
      c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
      v AS (SELECT count(DISTINCT u.tok) AS v
            FROM (SELECT unnest(t) AS tok FROM toks
                  WHERE source = 'src0') u),
      sc AS (SELECT doc_id,
               CAST(sum(
                 CAST(round(log2(coalesce(c1, 0) + v) * 1e6) AS BIGINT)
                 - CAST(round(log2(coalesce(c12, 0) + 1) * 1e6)
                     AS BIGINT)) AS BIGINT) AS nll_micro,
               count(*) AS nb
             FROM bg LEFT JOIN c12 USING (w1, w2)
                     LEFT JOIN c1 USING (w1)
                     CROSS JOIN v
             WHERE source <> 'src0' GROUP BY doc_id),
      r AS (SELECT nb, nll_micro * 1000 // nb AS rate_nbits,
              CAST(length(bin(nb)) - 1 AS BIGINT) AS len_bucket
            FROM sc)
      SELECT len_bucket, count(*) AS n_docs,
        CAST(min(nb) AS BIGINT) AS min_bigrams,
        CAST(max(nb) AS BIGINT) AS max_bigrams,
        CAST(sum(rate_nbits) // count(*) AS BIGINT) AS mean_rate_nbits,
        CAST(min(rate_nbits) AS BIGINT) AS min_rate_nbits,
        CAST(max(rate_nbits) AS BIGINT) AS max_rate_nbits
      FROM r GROUP BY len_bucket ORDER BY len_bucket""",
    "q_eval_mcnemar" -> s"""
      WITH f AS (SELECT doc_id, source,
          (CASE WHEN len(a) >= 50 THEN 1 ELSE 0 END) *
          (CASE WHEN list_sum(list_transform(a, w -> length(w)))
                     >= len(a) * 3
                 AND list_sum(list_transform(a, w -> length(w)))
                     <= len(a) * 10
                THEN 1 ELSE 0 END) *
          (CASE WHEN len(list_filter(a, w -> w IN ('the','a','and','of',
              'to','in','is','le','la','et','de','les','un','der','die',
              'und','das','ein','ist','el','los','y','que','en'))) >= 2
                THEN 1 ELSE 0 END) *
          (CASE WHEN len(list_filter(a, w ->
              regexp_matches(w, '[a-zA-Z]'))) * 1000 >= len(a) * 800
                THEN 1 ELSE 0 END) AS gopher,
          ${CorpusOps50.c4DocFlagSql} AS c4
        FROM (SELECT doc_id, source, text,
                string_split(text, ' ') AS a
              FROM documents) x)
      SELECT source, count(*) AS n_docs,
        CAST(sum(gopher * c4) AS BIGINT) AS both_pass,
        CAST(sum(gopher * (1 - c4)) AS BIGINT) AS gopher_only,
        CAST(sum((1 - gopher) * c4) AS BIGINT) AS c4_only,
        CAST(sum((1 - gopher) * (1 - c4)) AS BIGINT) AS neither,
        CAST(CASE WHEN sum(gopher * (1 - c4)) + sum((1 - gopher) * c4) > 0
             THEN (sum(gopher * (1 - c4)) - sum((1 - gopher) * c4)) *
                  (sum(gopher * (1 - c4)) - sum((1 - gopher) * c4)) *
                  1000 // (sum(gopher * (1 - c4)) + sum((1 - gopher) * c4))
             ELSE 0 END AS BIGINT) AS mcnemar_milli
      FROM f GROUP BY source ORDER BY source""")
}
