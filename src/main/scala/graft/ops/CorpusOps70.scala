package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 73 (SURVEY.md §2.M): the UNIMAX BUDGET
  * frontier — the epoch-capped waterfill (Chung et al., ICLR 2023;
  * q_mix_unimax is the deployed half-budget point) swept at budget ∈
  * {¼, ½, ¾} of the corpus's raw tokens, over ONE shared token
  * census. The allocation family's DIAL table: as the budget grows,
  * small sources saturate their 2-epoch caps one by one (`capped`
  * flips) and the uniform share concentrates on the large sources —
  * exactly the readout a pipeline owner needs to pick a token budget
  * BEFORE committing to a mixture. Per-group allocations are
  * provably monotone in the budget (x − min(cap, x div k) is
  * non-decreasing, so every fold step preserves the ordering —
  * spec-pinned), and the ½ row reproduces q_mix_unimax bit-for-bit.
  *
  * Scale: one corpus scan to the |sources| census; three
  * dictionary-sized packed folds; the oracle replays three
  * single-frontier recursive CTEs off one shared caps table. */
object CorpusOps70 {

  val qMixUnimaxSweep: Q = (s, dir) => {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val st = graft.CacheScope.track(Tables(s, dir, "documents")
      .select(col("source").as("grp"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy(col("grp")).agg(sum(col("ntok")).as("raw_tokens"))
      .persist(mad))
    val tot = st.agg(sum(col("raw_tokens")).as("t"))
    def at(f: Int): DataFrame =
      CorpusOps50.unimaxFold(st,
        tot.select(expr(s"t * $f div 4").as("budget")), "grp", 2L)
        .withColumn("budget_permille", lit(f * 250L))
    at(1).unionByName(at(2)).unionByName(at(3))
      .select(col("budget_permille"), col("grp").as("source"),
        col("raw_tokens"), col("cap_tokens"), col("alloc_tokens"),
        col("capped"))
      .orderBy(col("budget_permille"), col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q_mix_unimax_sweep" -> qMixUnimaxSweep)

  /** One recursive waterfill at budget = total·f/4 (the q_mix_unimax
    * oracle's frontier, prefix-parameterized like the NSW ef
    * sweep). */
  private def sweepArmSql(f: Int): String = s"""
      b$f AS (SELECT CAST(sum(raw_tokens) * $f // 4 AS BIGINT)
                AS budget
              FROM st),
      rec$f AS (
        SELECT 0 AS rk, (SELECT budget FROM b$f) AS rem,
          CAST(NULL AS VARCHAR) AS source, CAST(0 AS BIGINT) AS alloc
        UNION ALL
        SELECT c.rk,
          r.rem - least(c.cap, r.rem // (c.n - c.rk + 1)),
          c.source,
          least(c.cap, r.rem // (c.n - c.rk + 1))
        FROM rec$f r JOIN caps c ON c.rk = r.rk + 1),
      out$f AS (SELECT CAST(${f * 250} AS BIGINT) AS budget_permille,
          c.source, c.raw_tokens, c.cap AS cap_tokens,
          rec$f.alloc AS alloc_tokens,
          CAST(CASE WHEN rec$f.alloc = c.cap THEN 1 ELSE 0 END
            AS BIGINT) AS capped
        FROM caps c JOIN rec$f ON rec$f.rk = c.rk)"""

  val oracle: Map[String, String] = Map(
    "q_mix_unimax_sweep" -> s"""
      WITH RECURSIVE st AS (SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT)
            AS raw_tokens
        FROM documents GROUP BY source),
      caps AS (SELECT source, raw_tokens, raw_tokens * 2 AS cap,
          row_number() OVER (ORDER BY raw_tokens * 2, source) AS rk,
          count(*) OVER () AS n
        FROM st),
      ${Seq(1, 2, 3).map(sweepArmSql).mkString(",")}
      SELECT budget_permille, source, raw_tokens, cap_tokens,
        alloc_tokens, capped
      FROM (SELECT * FROM out1 UNION ALL SELECT * FROM out2
            UNION ALL SELECT * FROM out3)
      ORDER BY budget_permille, source""")
}
