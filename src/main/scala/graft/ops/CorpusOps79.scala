package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 waves 83 + 84 (SURVEY.md §2.M).
  *
  * q_text_chao1 — UNSEEN-vocabulary estimators (Chao, Scand. J.
  * Stat. 1984, bias-corrected form; Good, Biometrika 1953): the
  * Heaps curve says how fast vocabulary HAS grown; this says how
  * much is still missing — the corpus-planning readout before
  * deciding whether more data buys new types or re-buys old ones.
  * Per source, from one token scan: tokens, types, f1 (hapaxes),
  * f2 (doubletons),
  *
  *   chao1_milli      = 1000·types + 1000·f1·(f1−1) div (2·(f2+1))
  *   gt_unseen_permille = 1000·f1 div tokens
  *
  * — the bias-corrected Chao1 (defined even at f2 = 0, unlike the
  * classic f1²/2f2 form) and the Good–Turing missing-mass estimate
  * (the probability the NEXT token is an unseen type). Exact integer
  * throughout; f1·(f1−1) widens to DECIMAL(38,0)/HUGEINT (hapax
  * counts ~ corpus-sized at the claimed scale).
  *
  * q_dedup_minhash_perm_curve — the estimation audit's BUILD dial
  * (the cells/nprobe-frontier discipline applied to the sketch
  * itself): the q_dedup_minhash_est_error gap re-measured at
  * permutation budgets p ∈ {8, 16, 32} (signature PREFIXES of the
  * one shipped 32-perm frame — no rebuild), over the SAME exact
  * pair stream. The theory says error ~ √(J(1−J)/p); the three rows
  * show what halving the sketch actually costs on THIS corpus —
  * read beside the est-error decile table when sizing signatures.
  *
  * Scale: chao1 is one token scan to (source, tok, c) partials then
  * a vocab-sized rollup; the perm curve joins the shipped pair
  * stream with the one-sketch-per-doc frame (pair-stream-sized,
  * 3 budget rows out).
  */
object CorpusOps79 {

  val qTextChao1: Q = (s, dir) =>
    chao1From(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The estimator table behind [[qTextChao1]] and `Graft.chao1`:
    * `docs` = (grp, text). */
  private[graft] def chao1From(docs: DataFrame, grp: String)
      : DataFrame =
    chao1Readout(chao1Counts(docs, grp), grp)

  /** The per-token count stage (grp, tok, c) — additive across
    * document slices, which is what makes the streaming ingest twin
    * an append-only artifact (micro-batches append these partials;
    * the readout re-sums per token before the f1/f2 census). */
  private[graft] def chao1Counts(docs: DataFrame, grp: String)
      : DataFrame =
    docs
      .select(col(grp), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col(grp), col("tok"))
      .agg(count(lit(1)).as("c"))

  /** The estimator readout over (possibly rolled-up) token counts. */
  private[graft] def chao1Readout(counts: DataFrame, grp: String)
      : DataFrame =
    counts
      .groupBy(col(grp), col("tok"))
      .agg(sum(col("c")).as("c"))
      .groupBy(col(grp))
      .agg(sum(col("c")).as("tokens"), count(lit(1)).as("types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col(grp), col("tokens"), col("types"), col("f1"),
        col("f2"),
        expr("""1000 * types + CAST(cast(f1 as decimal(38, 0))
            * (f1 - 1) * 1000 div (2 * (f2 + 1)) AS BIGINT)""")
          .as("chao1_milli"),
        expr("f1 * 1000 div tokens").as("gt_unseen_permille"))
      .orderBy(col(grp))

  val qDedupMinhashPermCurve: Q = (s, dir) =>
    permCurveOf(Dedup.jaccardPairStream(s, dir), Dedup.sigFrame(s, dir))

  /** The budget sweep behind [[qDedupMinhashPermCurve]] and
    * `Graft.minhashPermCurve`: `ps` = the exact pair stream, `sigs`
    * = the 32-perm signature frame; budgets are signature prefixes.
    */
  private[graft] def permCurveOf(ps: DataFrame, sigs: DataFrame)
      : DataFrame = {
    // the three budgets are PREFIX sums of one 32-slot comparison —
    // computed incrementally per pair (a8, then +slots 9..16, then
    // +17..32), so the pair stream is scanned once with NO row
    // fan-out and exactly 32 slot comparisons (the est-error cost);
    // only the 3-row aggregate stacks per budget at the end
    // one HOF pass over the 32 slots accumulates all three prefix
    // agreements at once (no slice allocations — the byte-fallback
    // packed-accumulator shape): a16 packs into the middle 20 bits,
    // a8 into the low 20, a32 in the high bits of one int64
    val packed =
      """aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, k) ->
           acc + IF(element_at(sa, k) = element_at(sb, k),
             CAST(1 AS BIGINT) * 1048576 * 1048576
               + IF(k <= 16, CAST(1048576 AS BIGINT), CAST(0 AS BIGINT))
               + IF(k <= 8, CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
             CAST(0 AS BIGINT)))"""
    val j = ps
      .join(sigs.select(col("doc_id").as("da"), col("sig").as("sa")),
        "da")
      .join(sigs.select(col("doc_id").as("db"), col("sig").as("sb")),
        "db")
      .select(col("i"), (col("na") + col("nb") - col("i")).as("u"),
        expr(packed).as("pk"))
      .select(col("i"), col("u"),
        expr("pk % 1048576").as("a8"),
        expr("(pk div 1048576) % 1048576").as("a16"),
        expr("pk div (CAST(1048576 AS BIGINT) * 1048576)").as("a32"))
    def err(p: Int, a: String) =
      expr(s"abs($a * u - $p * i) * ${1000000 / p} div u")
    def serr(p: Int, a: String) =
      expr(s"($a * u - $p * i) * ${1000000 / p} div u")
    val wide = j.agg(
      count(lit(1)).as("n_pairs"),
      Seq((8, "a8"), (16, "a16"), (32, "a32")).flatMap { case (p, a) =>
        Seq(sum(err(p, a)).as(s"se_$p"), max(err(p, a)).as(s"mx_$p"),
          sum(serr(p, a)).as(s"ss_$p"))
      }: _*)
    wide.select(col("n_pairs"), expr(
        """stack(3,
             CAST(8 AS BIGINT), se_8, mx_8, ss_8,
             CAST(16 AS BIGINT), se_16, mx_16, ss_16,
             CAST(32 AS BIGINT), se_32, mx_32, ss_32)
           AS (p, se, mx, ss)"""))
      .select(col("p"), col("n_pairs"),
        expr("""CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
            ELSE se div n_pairs END""").as("mean_err_micro"),
        coalesce(col("mx"), lit(0L)).as("max_err_micro"),
        expr("""CASE WHEN n_pairs = 0 THEN CAST(0 AS BIGINT)
            ELSE ss div n_pairs END""").as("bias_micro"))
      .orderBy(col("p"))
  }

  val queries: Map[String, Q] = Map(
    "q_text_chao1" -> qTextChao1,
    "q_dedup_minhash_perm_curve" -> qDedupMinhashPermCurve)

  val oracle: Map[String, String] = Map(
    "q_text_chao1" -> """
      WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
      c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM t GROUP BY source, tok),
      a AS (SELECT source, CAST(sum(c) AS BIGINT) AS tokens,
              CAST(count(*) AS BIGINT) AS types,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS f1,
              CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS f2
            FROM c GROUP BY source)
      SELECT source, tokens, types, f1, f2,
        1000 * types + CAST(CAST(f1 AS HUGEINT) * (f1 - 1) * 1000
          // (2 * (f2 + 1)) AS BIGINT) AS chao1_milli,
        CAST(f1 * 1000 // tokens AS BIGINT) AS gt_unseen_permille
      FROM a ORDER BY source""",
    "q_dedup_minhash_perm_curve" -> s"""
      WITH ps AS MATERIALIZED (${Dedup.jaccardStreamSql}),
      s AS MATERIALIZED (${Dedup.sigDumpSql}),
      pb AS (SELECT CAST(unnest([8, 16, 32]) AS BIGINT) AS p),
      j AS (SELECT pb.p, ps.i, ps.na + ps.nb - ps.i AS u,
              CAST(list_sum(list_transform(range(1, CAST(pb.p AS INT) + 1),
                ii -> CASE WHEN a.sig[ii] = b.sig[ii]
                      THEN 1 ELSE 0 END)) AS BIGINT) AS agree
            FROM ps JOIN s a ON ps.da = a.doc_id
                    JOIN s b ON ps.db = b.doc_id
            CROSS JOIN pb),
      e AS (SELECT p,
              abs(agree * u - p * i) * (1000000 // p) // u AS err,
              (agree * u - p * i) * (1000000 // p) // u AS serr
            FROM j),
      binned AS (SELECT p, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(err) AS BIGINT) AS se,
                   CAST(max(err) AS BIGINT) AS mx,
                   CAST(sum(serr) AS BIGINT) AS ss
                 FROM e GROUP BY p)
      SELECT pb.p, coalesce(n, 0) AS n_pairs,
        CASE WHEN n IS NULL OR n = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(se // n AS BIGINT) END AS mean_err_micro,
        coalesce(mx, 0) AS max_err_micro,
        CASE WHEN n IS NULL OR n = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(ss // n AS BIGINT) END AS bias_micro
      FROM pb LEFT JOIN binned ON pb.p = binned.p
      ORDER BY pb.p""")
}
