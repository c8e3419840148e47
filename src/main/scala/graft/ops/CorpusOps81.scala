package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 87 (SURVEY.md §2.M): QUALITY-PROFILE
  * drift — the drift-family member that watches the FILTER's input
  * (q_drift_length watches lengths, q_emb_cell_drift watches
  * embedding space, THIS watches the 7-rule battery's per-doc pass
  * total): per source, the md5-parity A/B halves' histograms over
  * the pass-total bins 0..7 compared by exact total-variation
  * distance (the cell-drift arithmetic, re-keyed to quality bins):
  *
  *   tv_permille = Σ_b |a_b·B − b_b·A| · 1000 div (2·A·B)
  *
  * — integer cross-multiplication, DECIMAL(38,0)/HUGEINT-widened.
  * A moved profile means the gate's pass RATE is about to move for
  * data reasons, not rule reasons — the tripwire a standing quality
  * dashboard wants per source. One-sided groups read the declared
  * maximal 1000.
  *
  * Scale: ONE flag scan collapses to the (source, bin, half)
  * histogram (≤ |sources|×8×2 rows); everything after is
  * dictionary-sized. 100 TB costs the flag scan.
  */
object CorpusOps81 {

  val qDriftRuleProfile: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("doc_id"), col("text"))
    val flagged = CorpusOps46.gopherFlagged(docs,
      Seq("grp", "doc_id", "text"))
    val tot = CorpusOps60.battery.map(_._2).reduce(_ + _)
    ruleProfileDriftFrom(flagged
      .select(col("grp"), tot.as("bin"),
        (expr("""pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)),
            1, 15), 16, 10) AS BIGINT), 2)""") === 0)
          .cast("long").as("a")), "grp")
      .withColumnRenamed("grp", "source")
  }

  /** The drift table behind [[qDriftRuleProfile]] and
    * `Graft.ruleProfileDrift`: `obs` = (grp, bin, a) with a = 1 for
    * the A half; bins are whatever discrete profile is being
    * watched. Emits per grp: n_a, n_b, tv_permille. */
  private[graft] def ruleProfileDriftFrom(obs: DataFrame, grp: String)
      : DataFrame = {
    val h = obs.groupBy(col(grp), col("bin"))
      .agg(sum(col("a")).as("ha"),
        sum(lit(1L) - col("a")).as("hb"))
    val tot = h.groupBy(col(grp))
      .agg(sum(col("ha")).as("ta"), sum(col("hb")).as("tb"))
    h.join(tot, Seq(grp))
      .select(col(grp),
        abs(expr("""cast(ha as decimal(38, 0)) * tb -
            cast(hb as decimal(38, 0)) * ta""")).as("dev"),
        col("ta"), col("tb"))
      .groupBy(col(grp))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        sum(col("dev")).as("sdev"))
      .select(col(grp), col("n_a"), col("n_b"),
        expr("""CASE WHEN n_a * n_b = 0 THEN CAST(1000 AS BIGINT)
            ELSE CAST(sdev * 1000 div
              (2 * cast(n_a as decimal(38, 0)) * n_b) AS BIGINT)
            END""").as("tv_permille"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_drift_rule_profile" -> qDriftRuleProfile)

  val oracle: Map[String, String] = Map(
    "q_drift_rule_profile" -> s"""
      WITH fl AS MATERIALIZED (${CorpusOps60.flagsSql}),
      f AS (SELECT source,
              CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                1, 15) AS BIGINT) % 2 AS par,
              ${CorpusOps60.ruleNames.mkString(" + ")} AS bin
            FROM fl),
      h AS (SELECT source, bin,
              CAST(sum(CASE WHEN par = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS ha,
              CAST(sum(CASE WHEN par = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS hb
            FROM f GROUP BY source, bin),
      t AS (SELECT source, CAST(sum(ha) AS BIGINT) AS ta,
              CAST(sum(hb) AS BIGINT) AS tb
            FROM h GROUP BY source),
      d2 AS (SELECT h.source,
               abs(CAST(ha AS HUGEINT) * tb - CAST(hb AS HUGEINT) * ta)
                 AS dev, ta, tb
             FROM h JOIN t ON h.source = t.source)
      SELECT source, max(ta) AS n_a, max(tb) AS n_b,
        CASE WHEN max(ta) * max(tb) = 0 THEN CAST(1000 AS BIGINT)
          ELSE CAST(sum(dev) * 1000
            // (2 * CAST(max(ta) AS HUGEINT) * max(tb)) AS BIGINT)
        END AS tv_permille
      FROM d2 GROUP BY source ORDER BY source""")
}
