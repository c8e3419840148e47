package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 61 (SURVEY.md §2.M): per-rule
  * LEAVE-ONE-OUT attribution for the combined quality battery, and
  * Krippendorff's alpha over the Gopher gates — the two readouts
  * that tell a pipeline owner WHICH rules are doing the work and
  * whether the gates even agree with each other.
  *
  * q_quality_rule_attribution: the Gopher and C4 batteries report
  * per-rule PASS counts (q_text_gopher_rules / q_text_c4_rules), but
  * a pass count can't answer "what do I lose if I drop this rule?"
  * — a doc failing three rules is removed whether or not rule r
  * exists. The leave-one-out marginal of rule r = docs that pass
  * every OTHER rule but fail r = exactly the docs ONLY r removes
  * (`unique_fails`). Rules with unique_fails = 0 are fully shadowed
  * by the rest of the battery; rules with unique_fails ≈ fails are
  * doing independent work. The battery here is the 7-rule union the
  * r17 e2e pipeline gates on: the four Gopher A1.1 gates plus the
  * three STRUCTURAL C4 rules (brace / lorem / ≥5 words — the
  * punctuation rules keep zero fixture docs, so their attribution
  * readout would be the degenerate "r_term removes everything";
  * same reasoning as q_pipeline_e2e, documented there).
  *
  * q_agreement_krippendorff: Krippendorff's alpha (Krippendorff
  * 2004) over m = 4 "raters" = the four Gopher gates, nominal data,
  * no missing values. Generalizes q_agreement_kappa (2 raters) to
  * the full gate panel: alpha = 1 − Do/De with
  *   Do = Σ_u 2·n_u0·n_u1 / (n·m·(m−1)),
  *   De = 2·N0·N1 / (N·(N−1)),   N = n·m,
  * so alpha = 1 − do_pairs·(N−1) / (N0·N1·(m−1)) — EXACT integer
  * cross-multiplication (the kappa discipline); both engines
  * truncate integer division toward zero (measured, r17 w56), so a
  * negative alpha (systematic disagreement) hashes identically.
  *
  * Scale: both are ONE corpus scan of per-doc map-side flags
  * followed by a |sources|-row rollup — no joins, no data-scaling
  * shuffle; 100 TB costs exactly the flag scan.
  */
object CorpusOps60 {

  /** (rule name, 0/1 pass flag) for the 7-rule attribution battery,
    * evaluated on a frame carrying the gopherFlagged columns + text.
    * Sorted by rule name — the output ordering contract. */
  private[graft] def battery: Seq[(String, Column)] = {
    val c4 = CorpusOps50.c4RuleFlags.toMap
    Seq(
      "c4_brace" -> c4("r_brace"),
      "c4_lorem" -> c4("r_lorem"),
      "c4_words" -> c4("r_words"),
      "g_alpha" -> col("r_alpha"),
      "g_minwords" -> col("r_minwords"),
      "g_stopwords" -> col("r_stopwords"),
      "g_wordlen" -> col("r_wordlen"))
  }

  val qQualityRuleAttribution: Q = (s, dir) =>
    ruleAttributionFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The attribution table behind [[qQualityRuleAttribution]] and
    * `Graft.ruleAttribution`: `docs` = (grp, text). Emits per
    * (grp, rule): n_docs, fails (docs failing the rule at all) and
    * unique_fails (docs ONLY this rule removes — the leave-one-out
    * marginal; a doc fails uniquely iff its pass total is m−1 and
    * this rule is the 0). */
  private[graft] def ruleAttributionFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val flagged = CorpusOps46.gopherFlagged(docs, Seq(grp, "text"))
    val named = battery
    val tot = named.map(_._2).reduce(_ + _)
    val m = named.size
    val wide = flagged
      .select(col(grp) +: tot.as("tot") +:
        named.map { case (n, c) => c.as(n) }: _*)
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        named.flatMap { case (n, _) => Seq(
          sum(lit(1L) - col(n)).as(s"fails_$n"),
          sum(when(col(n) === 0L && col("tot") === (m - 1).toLong, 1L)
            .otherwise(0L)).as(s"uniq_$n"))
        }: _*)
    val stackArgs = named.map { case (n, _) =>
      s"'$n', fails_$n, uniq_$n"
    }.mkString(", ")
    wide.select(col(grp), col("n_docs"),
      expr(s"stack($m, $stackArgs) AS (rule, fails, unique_fails)"))
      .select(col(grp), col("rule"), col("n_docs"), col("fails"),
        col("unique_fails"))
      .orderBy(col(grp), col("rule"))
  }

  val qQualityRuleShapley: Q = (s, dir) =>
    ruleShapleyFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** EXACT Shapley attribution for the same 7-rule battery (r17
    * wave 64; Shapley 1953): the removal game v(S) = [some rule in S
    * fails the doc] is a symmetric OR-game per document, so the
    * Shapley value of rule r on a doc failing k rules is exactly
    * 1/k if r is one of them — multi-rule removals split EVENLY
    * where [[ruleAttributionFrom]]'s unique_fails credits only the
    * k = 1 slice. With k ≤ 7 every share is a multiple of 1/420
    * (420 = lcm(1..7)), so the whole attribution is exact int64:
    * `shapley_420ths` = Σ_docs 420 div k over docs where r fails.
    * Conservation: Σ_rules shapley_420ths = 420 · docs_removed, and
    * `share_permille` divides by that (div-guarded). One scan, the
    * attribution shape. */
  private[graft] def ruleShapleyFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val flagged = CorpusOps46.gopherFlagged(docs, Seq(grp, "text"))
    val named = battery
    val m = named.size
    val k = lit(m.toLong) - named.map(_._2).reduce(_ + _)
    val wide = flagged
      .select(col(grp) +: k.as("k") +:
        named.map { case (n, c) => c.as(n) }: _*)
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("k") > 0L, 1L).otherwise(0L)).as("docs_removed")
          +: named.map { case (n, _) =>
            sum(when(col(n) === 0L, expr("420 div k")).otherwise(0L))
              .as(s"sh_$n")
          }: _*)
    val stackArgs = named.map { case (n, _) => s"'$n', sh_$n" }
      .mkString(", ")
    wide.select(col(grp), col("n_docs"), col("docs_removed"),
      expr(s"stack($m, $stackArgs) AS (rule, shapley_420ths)"))
      .select(col(grp), col("rule"), col("n_docs"),
        col("docs_removed"), col("shapley_420ths"),
        expr("""CASE WHEN docs_removed = 0 THEN CAST(0 AS BIGINT)
            ELSE shapley_420ths * 1000 div (420 * docs_removed)
            END""").as("share_permille"))
      .orderBy(col(grp), col("rule"))
  }

  val qAgreementKrippendorff: Q = (s, dir) =>
    krippendorffFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The alpha table behind [[qAgreementKrippendorff]] and
    * `Graft.krippendorffAlpha`: `docs` = (grp, text); raters = the
    * four Gopher gates, values ∈ {0, 1}, complete data. Emits per
    * grp: n_units, n_raters, do_pairs (Σ_u n_u0·n_u1), n0, n1, and
    * alpha_permille = (den − num)·1000 div den with
    * num = do_pairs·(N−1), den = n0·n1·(m−1). den = 0 (every
    * judgment identical) degenerates to the perfect-agreement 1000,
    * documented. */
  private[graft] def krippendorffFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val m = 4
    CorpusOps46.gopherFlagged(docs, Seq(grp))
      .select(col(grp),
        (col("r_minwords") + col("r_wordlen") + col("r_stopwords") +
          col("r_alpha")).as("u1"))
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_units"),
        sum((lit(m.toLong) - col("u1")) * col("u1")).as("do_pairs"),
        sum(lit(m.toLong) - col("u1")).as("n0"),
        sum(col("u1")).as("n1"))
      .select(col(grp), col("n_units"), lit(m.toLong).as("n_raters"),
        col("do_pairs"), col("n0"), col("n1"),
        // num and den widen to DECIMAL(38,0) BEFORE any product (the
        // Neyman discipline: n0·n1 ~ 4n² overflows int64 near ~1.5e9
        // units per group — inside the claimed scale); the zero test
        // avoids the product entirely
        expr(s"""CASE WHEN n0 = 0 OR n1 = 0 THEN CAST(1000 AS BIGINT)
            ELSE CAST((cast(n0 as decimal(38, 0)) * n1 * ${m - 1} -
              cast(do_pairs as decimal(38, 0)) * (n_units * $m - 1))
              * 1000
              div (cast(n0 as decimal(38, 0)) * n1 * ${m - 1})
              AS BIGINT) END""").as("alpha_permille"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_rule_attribution" -> qQualityRuleAttribution,
    "q_quality_rule_shapley" -> qQualityRuleShapley,
    "q_agreement_krippendorff" -> qAgreementKrippendorff)

  /** The 7 per-doc flags + pass total as a DuckDB CTE body (mirrors
    * [[battery]] over gopherFlagged arithmetic). */
  private[graft] val flagsSql = """
    SELECT source, doc_id,
      CASE WHEN contains(text, '{') THEN 0 ELSE 1 END AS c4_brace,
      CASE WHEN contains(lower(text), 'lorem ipsum')
           THEN 0 ELSE 1 END AS c4_lorem,
      CASE WHEN len(a) >= 5 THEN 1 ELSE 0 END AS c4_words,
      CASE WHEN len(list_filter(a, w ->
          regexp_matches(w, '[a-zA-Z]'))) * 1000 >= len(a) * 800
           THEN 1 ELSE 0 END AS g_alpha,
      CASE WHEN len(a) >= 50 THEN 1 ELSE 0 END AS g_minwords,
      CASE WHEN len(list_filter(a, w -> w IN ('the','a','and','of',
          'to','in','is','le','la','et','de','les','un','der','die',
          'und','das','ein','ist','el','los','y','que','en'))) >= 2
           THEN 1 ELSE 0 END AS g_stopwords,
      CASE WHEN list_sum(list_transform(a, w -> length(w))) >= len(a) * 3
            AND list_sum(list_transform(a, w -> length(w))) <= len(a) * 10
           THEN 1 ELSE 0 END AS g_wordlen
    FROM (SELECT source, doc_id, text, string_split(text, ' ') AS a
          FROM documents)"""

  private[graft] val ruleNames = Seq("c4_brace", "c4_lorem", "c4_words",
    "g_alpha", "g_minwords", "g_stopwords", "g_wordlen")

  val oracle: Map[String, String] = Map(
    "q_quality_rule_attribution" -> s"""
      WITH f AS MATERIALIZED ($flagsSql),
      g AS (SELECT *, ${ruleNames.mkString(" + ")} AS tot FROM f),
      n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM g GROUP BY source),
      l AS (${ruleNames.map(r => s"""
        SELECT source, '$r' AS rule,
          CAST(sum(1 - $r) AS BIGINT) AS fails,
          CAST(sum(CASE WHEN $r = 0 AND tot = ${ruleNames.size - 1}
            THEN 1 ELSE 0 END) AS BIGINT) AS unique_fails
        FROM g GROUP BY source""").mkString(" UNION ALL ")})
      SELECT source, rule, n_docs, fails, unique_fails
      FROM l JOIN n USING (source)
      ORDER BY source, rule""",
    "q_quality_rule_shapley" -> s"""
      WITH f AS MATERIALIZED ($flagsSql),
      g AS (SELECT *,
              ${ruleNames.size} - (${ruleNames.mkString(" + ")}) AS k
            FROM f),
      n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_removed
            FROM g GROUP BY source),
      l AS (${ruleNames.map(r => s"""
        SELECT source, '$r' AS rule,
          CAST(sum(CASE WHEN $r = 0 THEN 420 // k ELSE 0 END)
            AS BIGINT) AS shapley_420ths
        FROM g GROUP BY source""").mkString(" UNION ALL ")})
      SELECT source, rule, n_docs, docs_removed, shapley_420ths,
        CASE WHEN docs_removed = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(shapley_420ths * 1000 // (420 * docs_removed)
            AS BIGINT)
        END AS share_permille
      FROM l JOIN n USING (source)
      ORDER BY source, rule""",
    "q_agreement_krippendorff" -> s"""
      WITH f AS MATERIALIZED ($flagsSql),
      u AS (SELECT source,
              g_minwords + g_wordlen + g_stopwords + g_alpha AS u1
            FROM f),
      a AS (SELECT source,
              CAST(count(*) AS BIGINT) AS n_units,
              CAST(sum((4 - u1) * u1) AS BIGINT) AS do_pairs,
              CAST(sum(4 - u1) AS BIGINT) AS n0,
              CAST(sum(u1) AS BIGINT) AS n1
            FROM u GROUP BY source)
      SELECT source, n_units, CAST(4 AS BIGINT) AS n_raters,
        do_pairs, n0, n1,
        CASE WHEN n0 = 0 OR n1 = 0 THEN CAST(1000 AS BIGINT) ELSE
          CAST((CAST(n0 AS HUGEINT) * n1 * 3 -
                CAST(do_pairs AS HUGEINT) * (n_units * 4 - 1)) * 1000
            // (CAST(n0 AS HUGEINT) * n1 * 3) AS BIGINT)
        END AS alpha_permille
      FROM a ORDER BY source""")
}
