package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 44 (SURVEY.md §2.M): the C4
  * cleaning-rule battery (Raffel et al. JMLR 2020 §2.2 — the named
  * web-filter sibling of the Gopher A1.1 battery), UniMax
  * epoch-capped uniform mixture allocation (Chung et al. 2023 — the
  * waterfilling that replaced temperature sampling for multilingual
  * mixtures), and a Naive-Bayes quality-classifier TRAINER over the
  * Gopher labels (the train-your-own-filter step of a FineWeb-Edu
  * style pipeline, with its held-out confusion readout).
  *
  * Determinism contract: exact int64 arithmetic; log-probabilities
  * as per-term integer micro-bits (round(log2(int)·1e6), identical
  * in both engines); sequential allocations folded over BOUNDED
  * packed arrays with declared tie-breaks.
  */
object CorpusOps50 {

  private def lg(c: Column): Column = round(log2(c) * lit(1e6)).cast("long")
  private[graft] def lgSql(x: String): String =
    s"CAST(round(log2($x) * 1e6) AS BIGINT)"

  // ---------------------------------------------------------------
  // q_text_c4_rules — the named C4 cleaning battery
  // ---------------------------------------------------------------

  /** C4 cleaning-rule battery (Raffel et al. 2020 §2.2, the named
    * subset a text-only engine can state exactly): per document —
    * ≥ 3 terminal-punctuation marks (the ≥-3-sentences proxy), ends
    * in terminal punctuation, no curly brace (the code-page filter),
    * no "lorem ipsum", ≥ 5 words. Reports per group the pass count
    * of each rule and their conjunction — the same filter-attrition
    * shape as q_text_gopher_rules, for the OTHER canonical web
    * battery. One scan, per-doc scalar predicates, |groups| rows. */
  val qTextC4Rules: Q = (s, dir) =>
    c4RulesFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The five per-doc C4 rule flags over a `text` column — the ONE
    * flag-code site shared by [[c4RulesFrom]], the McNemar agreement
    * query (CorpusOps53) and the r17 end-to-end pipeline
    * (CorpusOps56). r_term is newline-proof: Java regex '$' also
    * matches before a final line terminator while the oracle's RE2
    * '$' does not (ADVICE r16) — both engines compare the literal
    * last character. */
  private[graft] def c4RuleFlags: Seq[(String, Column)] = Seq(
    "r_sent" -> ((length(col("text")) -
      length(regexp_replace(col("text"), "[.!?]", ""))) >= 3)
      .cast("long"),
    "r_term" -> expr(
      "substring(text, length(text), 1) IN ('.', '!', '?')")
      .cast("long"),
    "r_brace" -> (!col("text").contains("{")).cast("long"),
    "r_lorem" -> (!lower(col("text")).contains("lorem ipsum"))
      .cast("long"),
    "r_words" -> (size(split(col("text"), " ")) >= 5).cast("long"))

  /** The C4 conjunction as one 0/1 column. */
  private[graft] def c4DocFlag: Column =
    c4RuleFlags.map(_._2).reduce(_ * _)

  /** The punctuation-free C4 subset (no curly brace, no lorem ipsum,
    * ≥ 5 words) — the rules a corpus WITHOUT sentence punctuation can
    * discriminate. The r17 e2e pipeline gates on Gopher ∧ THIS: the
    * full C4 conjunction keeps zero fixture docs (the synthetic texts
    * carry no terminal punctuation), and a datacard over an empty
    * corpus is vacuous. Built from the same [[c4RuleFlags]] entries
    * as the full battery. */
  private[graft] def c4StructFlag: Column =
    c4RuleFlags.collect {
      case (n, c) if Set("r_brace", "r_lorem", "r_words")(n) => c
    }.reduce(_ * _)

  /** DuckDB mirror of [[c4StructFlag]]. */
  private[graft] val c4StructFlagSql: String = """
    (CASE WHEN contains(text, '{') THEN 0 ELSE 1 END) *
    (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 0 ELSE 1 END) *
    (CASE WHEN len(string_split(text, ' ')) >= 5 THEN 1 ELSE 0 END)"""

  /** DuckDB mirror of [[c4DocFlag]] (a 0/1 scalar over `text`). */
  private[graft] val c4DocFlagSql: String = """
    (CASE WHEN length(text) - length(regexp_replace(text,
       '[.!?]', '', 'g')) >= 3 THEN 1 ELSE 0 END) *
    (CASE WHEN substring(text, length(text), 1) IN ('.', '!', '?')
          THEN 1 ELSE 0 END) *
    (CASE WHEN contains(text, '{') THEN 0 ELSE 1 END) *
    (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 0 ELSE 1 END) *
    (CASE WHEN len(string_split(text, ' ')) >= 5 THEN 1 ELSE 0 END)"""

  /** The battery behind [[qTextC4Rules]] and `Graft.c4Rules`:
    * `docs` = (grp, text). */
  private[graft] def c4RulesFrom(docs: DataFrame, grp: String)
      : DataFrame =
    docs
      .select(col(grp) +:
        c4RuleFlags.map { case (n, c) => c.as(n) }: _*)
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r_sent")).as("pass_sentences"),
        sum(col("r_term")).as("pass_terminal"),
        sum(col("r_brace")).as("pass_no_brace"),
        sum(col("r_lorem")).as("pass_no_lorem"),
        sum(col("r_words")).as("pass_min_words"),
        sum(col("r_sent") * col("r_term") * col("r_brace") *
          col("r_lorem") * col("r_words")).as("pass_all"))
      .orderBy(col(grp))

  // ---------------------------------------------------------------
  // q_mix_unimax — epoch-capped uniform allocation (waterfilling)
  // ---------------------------------------------------------------

  /** UniMax mixture allocation (Chung et al., "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): split a token budget as UNIFORMLY as
    * possible across groups subject to a per-group repetition cap —
    * visit groups by ASCENDING capacity (cap = 2 epochs × raw
    * tokens; ties on group id) and give each
    * min(cap, remaining div remaining_groups); small groups saturate
    * their cap, large groups share the rest evenly. Budget =
    * total_tokens div 2 (declared). Emits (group, raw_tokens,
    * cap_tokens, alloc_tokens, capped).
    *
    * Scale: one corpus scan to |groups| rows; the sequential
    * waterfill folds over ONE packed bounded array (the
    * q_pack_bestfit HOF discipline — group axes are dictionary-sized
    * by definition); the oracle replays it as a single-frontier
    * recursive CTE. Exact integer floor division throughout. */
  val qMixUnimax: Q = (s, dir) =>
    unimaxFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"),
        size(split(col("text"), " ")).cast("long").as("ntok")), "grp")
      .withColumnRenamed("grp", "source")

  /** The waterfill behind [[qMixUnimax]] and `Graft.unimaxAllocation`:
    * `obs` = (grp, ntok); `epochCapX2` and the budget divisor are
    * fixed by the declared query (cap = 2 × raw, budget = total/2). */
  private[graft] def unimaxFrom(obs: DataFrame, grp: String)
      : DataFrame = {
    val st = obs.groupBy(col(grp)).agg(sum(col("ntok")).as("raw_tokens"))
    // int64 floor division end-to-end (ADVICE r16: long '/' is double
    // division in Spark — exact only below 2^53 total tokens)
    val b = st.agg(expr("sum(raw_tokens) div 2").as("budget"))
    unimaxFold(st, b, grp, 2L)
  }

  /** The waterfill core: `st` = (grp, raw_tokens), `b` = a 1-row
    * (budget) frame, cap = `epochCap` × raw_tokens. Shared with
    * `Graft.unimaxAllocation` (explicit budget/cap). */
  private[graft] def unimaxFold(st0: DataFrame, b: DataFrame,
      grp: String, epochCap: Long): DataFrame = {
    val st = st0.withColumn("cap", col("raw_tokens") * epochCap)
    val packed = st
      .select(struct(col("cap"), col(grp).as("src"),
        col("raw_tokens")).as("e"))
      .agg(expr("array_sort(collect_list(e))").as("xs"))
      .crossJoin(broadcast(b))
    packed
      .select(explode(expr(
        """aggregate(xs,
             named_struct('rem', budget, 'k', CAST(size(xs) AS BIGINT),
               'out', CAST(array() AS
                 array<struct<src: string, raw: bigint, cap: bigint,
                              alloc: bigint>>)),
             (st, x) -> named_struct(
               'rem', st.rem - least(x.cap, st.rem div st.k),
               'k', st.k - 1,
               'out', concat(st.out, array(named_struct(
                 'src', x.src, 'raw', x.raw_tokens, 'cap', x.cap,
                 'alloc', least(x.cap, st.rem div st.k))))),
             st -> st.out)""")).as("o"))
      .select(col("o.src").as(grp), col("o.raw").as("raw_tokens"),
        col("o.cap").as("cap_tokens"), col("o.alloc").as("alloc_tokens"),
        (col("o.alloc") === col("o.cap")).cast("long").as("capped"))
      .orderBy(col(grp))
  }

  // ---------------------------------------------------------------
  // q_quality_nb_train — Naive-Bayes quality-filter trainer
  // ---------------------------------------------------------------

  /** Train-your-own quality filter: an add-one-smoothed multinomial
    * Naive Bayes classifier over tokens, labels = the Gopher A1.1
    * conjunction (shared flag code with q_text_gopher_rules), trained
    * on the doc_id-even half and read out as a held-out confusion
    * table per source — the FineWeb-Edu-style "train the filter,
    * then decide if you trust it" step. Per-token log-odds are exact
    * per-term integer micro-bits: λ(t) = [lg(c⁺+1) − lg(N⁺+V)] −
    * [lg(c⁻+1) − lg(N⁻+V)]; a doc's score is Σ λ over tokens plus
    * the class prior lg(d⁺+1) − lg(d⁻+1); predict positive iff
    * score > 0. Unseen tokens carry the smoothed default via the
    * left join's coalesce — identical in both engines.
    *
    * Scale: the λ table is VOCAB-bounded and rides the
    * `spark.graft.lm.broadcastTypeLimit` measured-cardinality gate
    * (Heaps' law — the q_text_perplexity discipline); everything
    * else is one scan + |sources| output rows. */
  val qQualityNbTrain: Q = (s, dir) =>
    nbConfusion(s, dir)
      .withColumn("accuracy_permille",
        expr("(tp + tn) * 1000 div n_eval"))
      .orderBy(col("source"))

  /** The held-out per-source confusion table behind
    * [[qQualityNbTrain]] and the r16 kappa readout (CorpusOps51):
    * (source, n_eval, tp, fp, fn, tn), unordered. */
  private[graft] def nbConfusion(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    nbConfusionFrom(nbFlags(s, dir))

  /** The declared NB task frame: Gopher-conjunction labels (shared
    * flag code), doc_id-even training split. Shared by the trainer,
    * the kappa readout, and the r17 calibration table. */
  private[graft] def nbFlags(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    CorpusOps46.gopherFlagged(
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")),
      Seq("doc_id", "source", "text"))
      .select(col("doc_id"), col("source"), col("text"),
        col("r_all").as("label"),
        (col("doc_id") % 2 === 0).as("train"))

  /** Frame-based NB train/score core behind [[nbConfusionFrom]] and
    * the r17 calibration table (CorpusOps58): `flags` = (doc_id,
    * source, text, label 0/1, train boolean); returns the held-out
    * per-doc (doc_id, source, label, ssum, margin) stream. */
  private[graft] def nbScoredFrom(flags: DataFrame): DataFrame = {
    val s = flags.sparkSession
    val toks = flags.select(col("doc_id"), col("source"), col("label"),
      col("train"),
      explode(split(col("text"), " ")).as("tok"))
    val tc = graft.CacheScope.track(toks.filter(col("train"))
      .groupBy(col("tok"))
      .agg(sum(col("label")).as("cp"),
        sum(lit(1L) - col("label")).as("cn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lmLimit = AutoBroadcast.limit(
      s, "spark.graft.lm.broadcastTypeLimit", 2000000L)
    val nTypes = tc.count()
    val gl = tc.agg(sum(col("cp")).as("np"), sum(col("cn")).as("nn"),
      count(lit(1)).as("v"))
    val prior = flags.filter(col("train"))
      .agg(sum(col("label")).as("dp"),
        sum(lit(1L) - col("label")).as("dn"))
    val scored = toks.filter(!col("train"))
      .join(AutoBroadcast.gate(tc, nTypes, lmLimit), Seq("tok"), "left")
      .crossJoin(broadcast(gl))
      .withColumn("lam",
        (lg(coalesce(col("cp"), lit(0L)) + 1) - lg(col("np") + col("v")))
          - (lg(coalesce(col("cn"), lit(0L)) + 1)
            - lg(col("nn") + col("v"))))
      .groupBy(col("doc_id"), col("source"), col("label"))
      .agg(sum(col("lam")).as("ssum"))
      .crossJoin(broadcast(prior))
      // the per-doc decision margin in exact micro-bits — the r17
      // calibration table buckets THIS (shared core: predict
      // positive iff margin > 0)
      .withColumn("margin",
        col("ssum") + lg(col("dp") + 1) - lg(col("dn") + 1))
    scored
  }

  /** Held-out per-source confusion off the shared scored stream. */
  private[graft] def nbConfusionFrom(flags: DataFrame): DataFrame =
    nbScoredFrom(flags)
      .withColumn("pred", (col("margin") > 0).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("label") * col("pred")).as("tp"),
        sum((lit(1L) - col("label")) * col("pred")).as("fp"),
        sum(col("label") * (lit(1L) - col("pred"))).as("fn"),
        sum((lit(1L) - col("label")) * (lit(1L) - col("pred"))).as("tn"))

  val queries: Map[String, Q] = Map(
    "q_text_c4_rules" -> qTextC4Rules,
    "q_mix_unimax" -> qMixUnimax,
    "q_quality_nb_train" -> qQualityNbTrain)

  val oracle: Map[String, String] = Map(
    "q_text_c4_rules" -> """
      WITH d AS (SELECT source,
          CAST(length(text) - length(regexp_replace(text,
            '[.!?]', '', 'g')) AS BIGINT) AS nterm,
          CASE WHEN substring(text, length(text), 1) IN ('.', '!', '?')
            THEN 1 ELSE 0 END AS r_term,
          CASE WHEN contains(text, '{') THEN 0 ELSE 1 END AS r_brace,
          CASE WHEN contains(lower(text), 'lorem ipsum') THEN 0
               ELSE 1 END AS r_lorem,
          CASE WHEN len(string_split(text, ' ')) >= 5 THEN 1 ELSE 0 END
            AS r_words
        FROM documents),
      r AS (SELECT *, CASE WHEN nterm >= 3 THEN 1 ELSE 0 END AS r_sent
            FROM d)
      SELECT source, count(*) AS n_docs,
        CAST(sum(r_sent) AS BIGINT) AS pass_sentences,
        CAST(sum(r_term) AS BIGINT) AS pass_terminal,
        CAST(sum(r_brace) AS BIGINT) AS pass_no_brace,
        CAST(sum(r_lorem) AS BIGINT) AS pass_no_lorem,
        CAST(sum(r_words) AS BIGINT) AS pass_min_words,
        CAST(sum(r_sent * r_term * r_brace * r_lorem * r_words)
          AS BIGINT) AS pass_all
      FROM r GROUP BY source ORDER BY source""",
    "q_mix_unimax" -> """
      WITH RECURSIVE st AS (SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
            AS raw_tokens
        FROM documents GROUP BY source),
      caps AS (SELECT source, raw_tokens, raw_tokens * 2 AS cap,
          row_number() OVER (ORDER BY raw_tokens * 2, source) AS rk,
          count(*) OVER () AS n
        FROM st),
      b AS (SELECT CAST(sum(raw_tokens) // 2 AS BIGINT) AS budget
            FROM st),
      rec AS (
        SELECT 0 AS rk, (SELECT budget FROM b) AS rem,
          CAST(NULL AS VARCHAR) AS source, CAST(0 AS BIGINT) AS alloc
        UNION ALL
        SELECT c.rk,
          r.rem - least(c.cap, r.rem // (c.n - c.rk + 1)),
          c.source,
          least(c.cap, r.rem // (c.n - c.rk + 1))
        FROM rec r JOIN caps c ON c.rk = r.rk + 1)
      SELECT c.source, c.raw_tokens, c.cap AS cap_tokens,
        rec.alloc AS alloc_tokens,
        CAST(CASE WHEN rec.alloc = c.cap THEN 1 ELSE 0 END AS BIGINT)
          AS capped
      FROM rec JOIN caps c ON rec.rk = c.rk AND rec.source = c.source
      ORDER BY c.source""",
    "q_quality_nb_train" -> s"""
      WITH $nbConfusionSql
      SELECT source, n_eval, tp, fp, fn, tn,
        CAST((tp + tn) * 1000 // n_eval AS BIGINT) AS accuracy_permille
      FROM cm ORDER BY source""")

  /** The shared confusion CTE chain for the NB oracles — everything
    * through the per-source (source, n_eval, tp, fp, fn, tn) table
    * `cm`. Reused by the r16 kappa readout (CorpusOps51). A `def`:
    * the oracle map above interpolates it at object init, before a
    * later `val` would be assigned. */
  private[graft] def nbConfusionSql: String = s"""
      f AS MATERIALIZED (
        SELECT doc_id, source, text,
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
                THEN 1 ELSE 0 END) AS label
        FROM (SELECT doc_id, source, text,
                string_split(text, ' ') AS a
              FROM documents) x),
      toks AS MATERIALIZED (
        SELECT doc_id, source, label, doc_id % 2 = 0 AS train,
          unnest(string_split(text, ' ')) AS tok
        FROM f),
      tc AS MATERIALIZED (
        SELECT tok, CAST(sum(label) AS BIGINT) AS cp,
          CAST(sum(1 - label) AS BIGINT) AS cn
        FROM toks WHERE train GROUP BY tok),
      gl AS (SELECT CAST(sum(cp) AS BIGINT) AS np,
               CAST(sum(cn) AS BIGINT) AS nn,
               count(*) AS v
             FROM tc),
      pri AS (SELECT CAST(sum(label) AS BIGINT) AS dp,
                CAST(sum(1 - label) AS BIGINT) AS dn
              FROM f WHERE doc_id % 2 = 0),
      sc AS (SELECT t.doc_id, t.source, t.label,
               CAST(sum(
                 (${lgSql("coalesce(tc.cp, 0) + 1")}
                  - ${lgSql("gl.np + gl.v")})
                 - (${lgSql("coalesce(tc.cn, 0) + 1")}
                    - ${lgSql("gl.nn + gl.v")})) AS BIGINT) AS ssum
             FROM toks t LEFT JOIN tc ON t.tok = tc.tok
             CROSS JOIN gl
             WHERE NOT t.train
             GROUP BY 1, 2, 3),
      pr AS (SELECT sc.*,
               CASE WHEN ssum + ${lgSql("pri.dp + 1")}
                          - ${lgSql("pri.dn + 1")} > 0
                    THEN 1 ELSE 0 END AS pred
             FROM sc CROSS JOIN pri),
      cm AS (SELECT source, count(*) AS n_eval,
               CAST(sum(label * pred) AS BIGINT) AS tp,
               CAST(sum((1 - label) * pred) AS BIGINT) AS fp,
               CAST(sum(label * (1 - pred)) AS BIGINT) AS fn,
               CAST(sum((1 - label) * (1 - pred)) AS BIGINT) AS tn
             FROM pr GROUP BY source)"""
}
