package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 80 (SURVEY.md §2.M): Kendall's W
  * coefficient of concordance (Kendall & Babington Smith, Ann. Math.
  * Stat. 1939) — the m-RANKER member completing the agreement
  * family this library ships (q_agreement_kappa = 2 raters,
  * q_agreement_krippendorff = m raters nominal, q_quality_cochran_q
  * = m binary filters, THIS = m full RANKINGS): do the corpus
  * signals that each induce a source ordering actually agree on that
  * ordering? The declared panel ranks sources by three shipped
  * per-source signals (ties broken by source name, so every ranking
  * is a strict permutation and the tie-corrected variant is not
  * needed):
  *
  *   quality   = mean 7-rule pass total (milli; the battery code)
  *   length    = mean tokens per doc (milli)
  *   diversity = type-token ratio (types·1000 div tokens)
  *
  * With rank sums R_i over m = 3 rankings of n sources and
  * S4 = Σ_i (2R_i − m(n+1))² (= 4·Σ(R_i − mean)², so no halves):
  *
  *   W_milli = 3000·S4 div (m²·(n³ − n))   (= 12000·S div m²(n³−n))
  *
  * exact integer throughout (products DECIMAL(38,0)/HUGEINT-widened
  * — m²n³ leaves int64 near n ~ 10⁶ ranked groups); the companion
  * `rho_avg_milli` = (m·W_milli − 1000) div (m − 1) is the average
  * pairwise Spearman correlation W linearly encodes. Per-source rows
  * carry the three ranks and R_i — the WHO-disagrees readout — with
  * the scalars on every row (the cand_len convention). n = 1 (a
  * single ranked group, n³ − n = 0) degenerates to the declared
  * perfect 1000.
  *
  * Scale: one flag scan + one token scan collapse to |sources|-row
  * aggregates; the rankings and W run over that dictionary-sized
  * frame only. 100 TB costs the two scans.
  */
object CorpusOps76 {

  val qAgreementKendallW: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text"))
    val flagged = CorpusOps46.gopherFlagged(docs, Seq("grp", "text"))
    val passTot = CorpusOps60.battery.map(_._2).reduce(_ + _)
    val base = flagged
      .select(col("grp"), passTot.as("pt"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pt")).as("sum_pt"),
        sum(col("n_tok")).as("sum_tok"))
    val types = docs
      .select(col("grp"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("grp"))
      .agg(countDistinct(col("tok")).as("types"))
    val keyed = base.join(types, Seq("grp"))
      .select(col("grp"),
        expr("sum_pt * 1000 div n_docs").as("k_quality"),
        expr("sum_tok * 1000 div n_docs").as("k_length"),
        expr("types * 1000 div sum_tok").as("k_diversity"))
    kendallWFrom(keyed, "grp",
      Seq("k_quality", "k_length", "k_diversity"))
      .withColumnRenamed("grp", "source")
  }

  /** The concordance table behind [[qAgreementKendallW]] and
    * `Graft.kendallW`: `keyed` = one row per ranked item (`grp`)
    * with one integer ranking key per column of `keys`; each key
    * ranks DESCENDING, ties broken by `grp` ascending. */
  private[graft] def kendallWFrom(keyed: DataFrame, grp: String,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.size >= 2, "kendallW needs >= 2 ranking keys")
    val m = keys.size
    val ranked = keys.foldLeft(keyed) { (df, k) =>
      df.withColumn(s"rank_$k", row_number().over(
        Window.orderBy(col(k).desc, col(grp))))
    }
    val rsum = keys.map(k => col(s"rank_$k")).reduce(_ + _)
    val withR = ranked.withColumn("r_sum", rsum.cast("long"))
    // S4 needs n inside the per-row term; attach it by window first
    // so the aggregate stays free of window functions
    val withN = withR.withColumn("n_items",
      count(lit(1)).over(Window.partitionBy()))
    val stats = withN
      .select(col("n_items"),
        expr(s"""cast(2 * r_sum - $m * (n_items + 1)
            as decimal(38, 0)) *
            (2 * r_sum - $m * (n_items + 1))""").as("d2"))
      .groupBy(col("n_items"))
      .agg(sum(col("d2")).as("s4"))
      .select(col("n_items"), col("s4"),
        expr(s"""CASE WHEN n_items <= 1 THEN CAST(1000 AS BIGINT)
            ELSE CAST(s4 * 3000 div (${m * m} *
              (cast(n_items as decimal(38, 0)) * n_items * n_items
                - n_items)) AS BIGINT) END""").as("w_milli"))
      .withColumn("rho_avg_milli",
        expr(s"($m * w_milli - 1000) div ${m - 1}"))
      .select(col("w_milli"), col("rho_avg_milli"))
    withR
      .select(col(grp) +:
        keys.map(k => col(s"rank_$k").cast("long").as(s"rank_$k")) :+
        col("r_sum"): _*)
      .crossJoin(broadcast(stats))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_agreement_kendall_w" -> qAgreementKendallW)

  val oracle: Map[String, String] = Map(
    "q_agreement_kendall_w" -> s"""
      WITH f AS MATERIALIZED (${CorpusOps60.flagsSql}),
      d AS (SELECT source, doc_id,
              len(string_split(text, ' ')) AS n_tok
            FROM documents),
      base AS (SELECT f2.source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(${CorpusOps60.ruleNames.mkString(" + ")})
                   AS BIGINT) AS sum_pt
               FROM f f2 GROUP BY f2.source),
      toks AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS sum_tok
               FROM d GROUP BY source),
      ty AS (SELECT source,
               CAST(count(DISTINCT tok) AS BIGINT) AS types
             FROM (SELECT source, unnest(string_split(text, ' '))
                     AS tok FROM documents) GROUP BY source),
      keyed AS (SELECT base.source,
                  sum_pt * 1000 // n_docs AS k_quality,
                  sum_tok * 1000 // n_docs AS k_length,
                  types * 1000 // sum_tok AS k_diversity
                FROM base JOIN toks ON base.source = toks.source
                          JOIN ty ON base.source = ty.source),
      ranked AS (SELECT source,
                   CAST(row_number() OVER (ORDER BY k_quality DESC,
                     source) AS BIGINT) AS rank_k_quality,
                   CAST(row_number() OVER (ORDER BY k_length DESC,
                     source) AS BIGINT) AS rank_k_length,
                   CAST(row_number() OVER (ORDER BY k_diversity DESC,
                     source) AS BIGINT) AS rank_k_diversity
                 FROM keyed),
      r AS (SELECT *, rank_k_quality + rank_k_length +
              rank_k_diversity AS r_sum FROM ranked),
      st AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
               sum(CAST(2 * r_sum - 3 * ((SELECT count(*) FROM r) + 1)
                   AS HUGEINT) *
                 (2 * r_sum - 3 * ((SELECT count(*) FROM r) + 1)))
                 AS s4
             FROM r),
      w AS (SELECT CASE WHEN n_items <= 1 THEN CAST(1000 AS BIGINT)
              ELSE CAST(s4 * 3000 // (9 *
                (CAST(n_items AS HUGEINT) * n_items * n_items
                  - n_items)) AS BIGINT) END AS w_milli
            FROM st)
      SELECT source, rank_k_quality, rank_k_length, rank_k_diversity,
        CAST(r_sum AS BIGINT) AS r_sum, w_milli,
        CAST((3 * w_milli - 1000) // 2 AS BIGINT) AS rho_avg_milli
      FROM r CROSS JOIN w ORDER BY source""")
}
