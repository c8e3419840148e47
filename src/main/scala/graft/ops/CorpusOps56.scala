package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 52 (SURVEY.md §2.M, VERDICT r16 item 4):
  * the END-TO-END datacard pipeline — raw corpus → Gopher ∧
  * structural-C4 quality gate → exact-duplicate keep-first cut →
  * soft-dedup reweight (the
  * keep-everything alternative, reported beside the cut) → BPE
  * tokenize (6-merge model trained on the KEPT corpus) → UniMax
  * allocation over the tokenized mass. One row per source with every
  * stage's census: the table a training-data datacard opens with,
  * composed from the SHIPPED cores (gopherFlagged, c4DocFlag,
  * softdedup arithmetic, bpeMerges/fertilityFrom, unimaxFold) — the
  * attrition waterfall (q_pipeline_attrition) is the 3-stage seed
  * this completes.
  *
  * Composition is where stage-contract mismatches hide: every number
  * here is produced by the same code path as its standalone query,
  * and the oracle chains the same CTE fragments (gopherFlagsSql,
  * c4DocFlagSql, the bpeRoundSql chain, the unimax recursive fold),
  * so a drift in any stage's contract breaks the hash gate.
  *
  * Scale: ONE corpus scan builds the persisted per-doc flags frame
  * (both batteries are map-side HOF arithmetic); the dedup stage
  * shuffles only gate survivors on the md5 fingerprint; the BPE
  * stage collapses the kept corpus to its word dictionary in one
  * scan (everything after is dictionary-sized); soft-dedup joins the
  * cluster-size table co-partitioned on fp (it grows with the
  * corpus — never broadcast); UniMax folds one |sources|-row packed
  * array. No stage re-reads raw text after the flags scan.
  */
object CorpusOps56 {

  val qPipelineE2e: Q = (s, dir) =>
    pipelineE2eFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source").as("grp"), col("text")),
      "grp")
      .withColumnRenamed("grp", "source")

  /** The pipeline behind [[qPipelineE2e]] and `Graft.pipelineE2e`:
    * `docs` = (doc_id, grp, text). Output per group: n_raw /
    * raw_tokens (whitespace), n_gate (passing BOTH batteries),
    * n_kept / kept_tokens (after exact keep-first dedup),
    * eff_tokens_milli (the soft-dedup reweighted mass of the GATED
    * stream — what reweighting would keep vs the hard cut's
    * kept_tokens), bpe_tokens (kept mass under the 6-merge BPE
    * model trained on the kept corpus), alloc_tokens (UniMax over
    * bpe_tokens, cap = 2 epochs, budget = total div 2). */
  private[graft] def pipelineE2eFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // stage 0/1: ONE persisted per-doc flags scan — the Gopher battery
    // (shared flag code, CorpusOps46) AND the C4 battery (shared flag
    // code, CorpusOps50) — feeding every later stage
    val flags = graft.CacheScope.track(
      CorpusOps46.gopherFlagged(docs, Seq("doc_id", grp, "text"))
        // the structural C4 subset (shared c4RuleFlags code): the
        // full conjunction's punctuation rules keep ZERO fixture docs
        // (no terminal punctuation in the synthetic texts), which
        // would make every later stage vacuous
        .withColumn("c4", CorpusOps50.c4StructFlag)
        .withColumn("fp", md5(col("text")))
        .persist(mad))
    val gate = flags.filter(col("r_all") === 1 && col("c4") === 1)
    // stage 2: exact-duplicate keep-first (min doc_id per fingerprint
    // cluster, the q_pipeline_attrition / q_dedup_exact contract)
    val kept = graft.CacheScope.track(gate
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .persist(mad))
    val s0 = flags.groupBy(col(grp))
      .agg(count(lit(1)).as("n_raw"), sum(col("nw")).as("raw_tokens"))
    val s1 = gate.groupBy(col(grp)).agg(count(lit(1)).as("n_gate"))
    // soft-dedup reweight of the GATED stream (q_mix_softdedup
    // arithmetic: weight = 1e6 div copies, DECIMAL-widened sum)
    val cl = gate.groupBy(col("fp")).agg(count(lit(1)).as("copies"))
    val soft = gate.join(cl, Seq("fp")) // co-partitioned: cl grows with corpus
      .withColumn("w_micro", expr("1000000 div copies"))
      .groupBy(col(grp))
      .agg(expr("""CAST(sum(CAST(nw * w_micro AS DECIMAL(38, 0)))
                   DIV 1000 AS BIGINT)""").as("eff_tokens_milli"))
    val s2 = kept.groupBy(col(grp))
      .agg(count(lit(1)).as("n_kept"), sum(col("nw")).as("kept_tokens"))
    // stage 3: tokenize — BPE trained ON the kept corpus (the real
    // pipeline order: clean, dedup, THEN fit the tokenizer), applied
    // via the dictionary-sized fertility rollup
    val ws = graft.CacheScope.track(kept
      .select(col(grp), explode(split(col("text"), " ")).as("word"))
      .groupBy(col(grp), col("word")).agg(count(lit(1)).as("freq_s"))
      .persist(mad))
    val dict0 = graft.CacheScope.track(ws
      .groupBy(col("word")).agg(sum(col("freq_s")).as("freq"))
      .withColumn("sym",
        concat(regexp_replace(col("word"), "(.)", "$1 "), lit("</w>")))
      .persist(mad))
    val merges = TextAnalysis.bpeMerges(dict0, 6)
      .orderBy(col("round")).collect().map(_.getString(1)).toSeq
    val bpe = TextAnalysis.fertilityFrom(ws, dict0, merges, grp)
      .select(col(grp), col("n_bpe_tokens").as("bpe_tokens"))
    // stage 4: UniMax allocation over the tokenized mass (cap = 2
    // epochs, budget = total div 2 — the q_mix_unimax contract)
    val st = bpe.select(col(grp), col("bpe_tokens").as("raw_tokens"))
    val b = st.agg(expr("sum(raw_tokens) div 2").as("budget"))
    val alloc = CorpusOps50.unimaxFold(st, b, grp, 2L)
      .select(col(grp), col("alloc_tokens"))
    s0.join(s1, Seq(grp), "left")
      .join(s2, Seq(grp), "left")
      .join(soft, Seq(grp), "left")
      .join(bpe, Seq(grp), "left")
      .join(alloc, Seq(grp), "left")
      .select(col(grp), col("n_raw"), col("raw_tokens"),
        coalesce(col("n_gate"), lit(0L)).as("n_gate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("eff_tokens_milli"), lit(0L))
          .as("eff_tokens_milli"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"),
        coalesce(col("alloc_tokens"), lit(0L)).as("alloc_tokens"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_pipeline_e2e" -> qPipelineE2e)

  val oracle: Map[String, String] = Map(
    "q_pipeline_e2e" -> s"""
      WITH RECURSIVE f AS MATERIALIZED (
        SELECT doc_id, source, text, nw, r_all,
          ${CorpusOps50.c4StructFlagSql} AS c4,
          md5(text) AS fp
        FROM (${CorpusOps47.gopherFlagsSql}) g),
      gate AS MATERIALIZED (SELECT * FROM f WHERE r_all = 1 AND c4 = 1),
      cl AS (SELECT fp, count(*) AS copies FROM gate GROUP BY fp),
      soft AS (SELECT source,
          CAST(sum(CAST(nw * (1000000 // copies) AS HUGEINT)) // 1000
            AS BIGINT) AS eff_tokens_milli
        FROM gate JOIN cl USING (fp) GROUP BY source),
      kept AS MATERIALIZED (SELECT * FROM gate
        QUALIFY row_number() OVER (PARTITION BY fp
          ORDER BY doc_id) = 1),
      d0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq,
          regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM kept) t
        GROUP BY word),
      ${(1 to 6).map(TextAnalysis.bpeRoundSql).mkString(",")},
      ws AS (SELECT source, word, CAST(count(*) AS BIGINT) AS freq_s
             FROM (SELECT source, unnest(string_split(text, ' '))
                     AS word FROM kept) u
             GROUP BY 1, 2),
      symlen AS (SELECT word,
          CAST(len(string_split(sym, ' ')) AS BIGINT) AS toks FROM d6),
      bpe AS MATERIALIZED (SELECT source,
          CAST(sum(freq_s * toks) AS BIGINT) AS bpe_tokens
        FROM ws JOIN symlen USING (word) GROUP BY source),
      caps AS (SELECT source, bpe_tokens, bpe_tokens * 2 AS cap,
          row_number() OVER (ORDER BY bpe_tokens * 2, source) AS rk,
          count(*) OVER () AS n
        FROM bpe),
      bd AS (SELECT CAST(sum(bpe_tokens) // 2 AS BIGINT) AS budget
             FROM bpe),
      rec AS (
        SELECT 0 AS rk, (SELECT budget FROM bd) AS rem,
          CAST(NULL AS VARCHAR) AS source, CAST(0 AS BIGINT) AS alloc
        UNION ALL
        SELECT c.rk,
          r.rem - least(c.cap, r.rem // (c.n - c.rk + 1)),
          c.source,
          least(c.cap, r.rem // (c.n - c.rk + 1))
        FROM rec r JOIN caps c ON c.rk = r.rk + 1),
      s0 AS (SELECT source, count(*) AS n_raw,
          CAST(sum(nw) AS BIGINT) AS raw_tokens FROM f GROUP BY source),
      s1 AS (SELECT source, count(*) AS n_gate FROM gate
             GROUP BY source),
      s2 AS (SELECT source, count(*) AS n_kept,
          CAST(sum(nw) AS BIGINT) AS kept_tokens FROM kept
        GROUP BY source)
      SELECT s0.source, s0.n_raw, s0.raw_tokens,
        CAST(coalesce(s1.n_gate, 0) AS BIGINT) AS n_gate,
        CAST(coalesce(s2.n_kept, 0) AS BIGINT) AS n_kept,
        CAST(coalesce(s2.kept_tokens, 0) AS BIGINT) AS kept_tokens,
        CAST(coalesce(soft.eff_tokens_milli, 0) AS BIGINT)
          AS eff_tokens_milli,
        CAST(coalesce(bpe.bpe_tokens, 0) AS BIGINT) AS bpe_tokens,
        CAST(coalesce(a.alloc, 0) AS BIGINT) AS alloc_tokens
      FROM s0
      LEFT JOIN s1 USING (source)
      LEFT JOIN s2 USING (source)
      LEFT JOIN soft USING (source)
      LEFT JOIN bpe USING (source)
      LEFT JOIN (SELECT source, alloc FROM rec WHERE rk > 0) a
        USING (source)
      ORDER BY source""")
}
