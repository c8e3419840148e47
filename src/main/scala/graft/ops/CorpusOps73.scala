package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 77 (SURVEY.md §2.M): Cochran's Q test
  * (Cochran, Biometrika 1950) over the 7-rule quality battery — the
  * m-treatment generalization of q_eval_mcnemar's paired 2×2: "do
  * these m binary filters remove the SAME documents, or do they
  * genuinely disagree?" answered with one statistic over the whole
  * gate panel (4 Gopher gates + the 3 structural C4 rules, the
  * q_quality_rule_attribution battery; judgment = the rule FAILS the
  * doc). With column totals C_j (per-rule fails), row totals R_i
  * (per-doc fail counts), N = ΣR_i:
  *
  *   Q = (m−1) · (m·ΣC_j² − N²) / (m·N − ΣR_i²)
  *
  * emitted as `q_milli` = num·1000 div den — fixed-point milli-units
  * of the χ²(m−1)-distributed statistic, the q_eval_mcnemar
  * convention (Q with m = 2 IS McNemar's (b−c)²/(b+c) exactly —
  * spec-pinned). The quadratic products widen to DECIMAL(38,0)
  * before multiplying (N² ~ 49n² overflows int64 near ~2e8 docs per
  * group — inside the claimed scale; the Krippendorff discipline);
  * den = 0 (every doc fails all rules or none — no discriminating
  * information) degenerates to the declared 0. Only LINEAR
  * ingredients (n_docs, total_fails, sum_ri2 ≤ m²·n) are emitted as
  * BIGINT columns; ΣC_j² stays internal and widened.
  *
  * Scale: ONE corpus scan of per-doc map-side flags to a
  * |sources|-row wide aggregate — no joins, no data-scaling shuffle;
  * 100 TB costs exactly the flag scan (the attribution/Shapley cost
  * class on the same shared flag code).
  */
object CorpusOps73 {

  val qQualityCochranQ: Q = (s, dir) => {
    val flagged = CorpusOps46.gopherFlagged(
      Tables(s, dir, "documents")
        .select(col("source").as("grp"), col("text")),
      Seq("grp", "text"))
    val judged = flagged.select(col("grp") +:
      CorpusOps60.battery.map { case (n, c) =>
        (lit(1L) - c).as(n)
      }: _*)
    cochranFrom(judged, "grp", CorpusOps60.battery.map(_._1))
      .withColumnRenamed("grp", "source")
  }

  /** The Q table behind [[qQualityCochranQ]] and `Graft.cochranQ`:
    * `judged` carries `grp` plus one 0/1 long column per treatment
    * (`cols`); one row per subject. Emits per grp: n_docs, m,
    * total_fails (N), sum_ri2 (ΣR_i²), q_milli. */
  private[graft] def cochranFrom(judged: DataFrame, grp: String,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"cochranQ needs >= 2 judgment columns")
    val m = cols.size
    val ri: Column = cols.map(col).reduce(_ + _)
    val wide = judged
      .select(col(grp) +: ri.as("ri") +: cols.map(col): _*)
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ri")).as("total_fails") +:
          sum(col("ri") * col("ri")).as("sum_ri2") +:
          cols.map(c => sum(col(c)).as(s"c_$c")): _*)
    val cj2 = cols.map(c =>
      s"cast(c_$c as decimal(38, 0)) * c_$c").mkString(" + ")
    wide.select(col(grp), col("n_docs"), lit(m.toLong).as("m"),
      col("total_fails"), col("sum_ri2"),
      expr(s"""CASE WHEN $m * total_fails - sum_ri2 = 0
          THEN CAST(0 AS BIGINT)
          ELSE CAST(${m - 1} * ($m * ($cj2) -
              cast(total_fails as decimal(38, 0)) * total_fails) * 1000
            div ($m * total_fails - sum_ri2) AS BIGINT)
          END""").as("q_milli"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_cochran_q" -> qQualityCochranQ)

  val oracle: Map[String, String] = Map(
    "q_quality_cochran_q" -> {
      val rn = CorpusOps60.ruleNames
      val m = rn.size
      s"""
      WITH f AS MATERIALIZED (${CorpusOps60.flagsSql}),
      g AS (SELECT source,
              ${rn.map(r => s"1 - $r AS f_$r").mkString(", ")},
              $m - (${rn.mkString(" + ")}) AS ri
            FROM f),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(ri) AS BIGINT) AS total_fails,
              CAST(sum(ri * ri) AS BIGINT) AS sum_ri2,
              ${rn.map(r => s"CAST(sum(f_$r) AS BIGINT) AS c_$r")
                .mkString(", ")}
            FROM g GROUP BY source)
      SELECT source, n_docs, CAST($m AS BIGINT) AS m, total_fails,
        sum_ri2,
        CASE WHEN $m * total_fails - sum_ri2 = 0
          THEN CAST(0 AS BIGINT)
          ELSE CAST(${m - 1} * ($m * (${rn.map(r =>
            s"CAST(c_$r AS HUGEINT) * c_$r").mkString(" + ")}) -
              CAST(total_fails AS HUGEINT) * total_fails) * 1000
            // ($m * total_fails - sum_ri2) AS BIGINT)
        END AS q_milli
      FROM a ORDER BY source"""
    })
}
