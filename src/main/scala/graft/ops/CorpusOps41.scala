package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus + analytics operators, r10 wave 30 (SURVEY.md §2.L/§2.M):
  * join-view incremental maintenance with retractions (the delta
  * algebra the partition-refresh MV of MatViews.qMvRefresh does not
  * cover), and DPO-style preference-pair construction with the
  * length-bias audit (the RLHF data-prep stage downstream of the
  * Bradley-Terry tournament).
  *
  * Determinism contract as the other r10 waves: exact integer /
  * DECIMAL arithmetic; the single double division at the end of the
  * IVM query follows the Tables.davg one-division discipline.
  */
object CorpusOps41 {

  /** Join-view incremental maintenance with inserts AND retractions —
    * the Z-relation / delta-algebra shape (Green et al., PODS 2011;
    * DBSP, Budiu et al., VLDB 2023) behind every streaming MV engine:
    * V' = V ⊕ agg(Δ+ ⋈ dim) ⊖ agg(Δ- ⋈ dim). The materialized state
    * here is the (c_mktsegment, o_orderpriority) rollup of
    * orders ⋈ customer; the insert delta is the o_orderkey%10==7
    * batch, the retraction the %10==3 batch (present in the base).
    * Each side partial-aggregates INDEPENDENTLY, the merge is one
    * signed re-aggregation, and groups whose maintained count reaches
    * zero are dropped — the retraction edge a naive UNION would get
    * wrong. avg is maintained from the (sum, cnt) pair, the classic
    * non-distributive-measure lesson. The oracle computes the final
    * logical state (%10 <> 3) directly: equality proves the delta
    * algebra converged to the full rebuild.
    *
    * Scale: each delta branch is a fact-side filter + partial agg
    * before its (broadcastable) dim join; the merge shuffles only
    * |groups| rows per branch — at 100 TB the base branch is the
    * stored MV and only the two delta branches scan new data. */
  val qMvJoinIvm: Q = (s, dir) => {
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        Tables.dec(col("o_totalprice")).as("price"))
    def branch(pred: org.apache.spark.sql.Column, sign: Int): DataFrame =
      ord.filter(pred)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg((count(lit(1)) * lit(sign.toLong)).as("cnt_d"),
          (sum(col("price")) * lit(sign.toLong)).as("sum_d"))
    val base = branch(col("o_orderkey") % 10 =!= 7, 1)   // stored MV state
    val ins  = branch(col("o_orderkey") % 10 === 7, 1)   // Δ+
    val del  = branch(col("o_orderkey") % 10 === 3, -1)  // Δ- retraction
    base.unionByName(ins).unionByName(del)
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(sum(col("cnt_d")).as("cnt"), sum(col("sum_d")).as("sumd"))
      .filter(col("cnt") > 0) // retraction may empty a group entirely
      .select(col("c_mktsegment"), col("o_orderpriority"), col("cnt"),
        col("sumd").cast("double").as("sum_price"),
        (col("sumd").cast("double") / col("cnt")).as("avg_price"))
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))
  }

  /** DPO preference-pair construction + length-bias audit (Rafailov
    * 2023 for the objective; the pairing itself is the standard
    * practice of mining chosen/rejected pairs from a scalar reward):
    * within each (source, lang) prompt-group, docs rank by the
    * classifier score (CorpusOps10.scored — the corpus-trained
    * hashed-unigram reward), rank i of the top half pairs with rank
    * n+1-i of the bottom half (rank-symmetric pairing, so every
    * margin is >= 0 and each doc appears in at most one pair), and a
    * pair is KEPT only when the margin clears 50 milli — the
    * dead-zone filter that keeps near-tie noise out of the training
    * set. The audit reports, per group, how many kept pairs have the
    * chosen text LONGER than the rejected one — the length-bias
    * check, since length-correlated rewards are the best-known DPO
    * failure mode.
    *
    * Scale: one partitioned window per group (never global), then a
    * (source, lang, i) equi-join between the two half-frames — pair
    * count is n/2 per group, output is |groups| rows. */
  val qPrefPairs: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val ranked = CorpusOps10.scored(s, dir).select(col("doc_id"),
        col("score_milli"))
      .join(docs, Seq("doc_id"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("score_milli").desc, col("doc_id"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("source"), col("lang"))))
    val chosen = ranked.filter(expr("r <= n div 2"))
      .select(col("source"), col("lang"), col("r").as("i"),
        col("score_milli").as("sc_c"), col("n_chars").as("len_c"))
    val rejected = ranked.filter(expr("r > n - n div 2"))
      .select(col("source"), col("lang"),
        (col("n") + lit(1) - col("r")).as("i"),
        col("score_milli").as("sc_r"), col("n_chars").as("len_r"))
    chosen.join(rejected, Seq("source", "lang", "i"))
      .withColumn("margin", col("sc_c") - col("sc_r"))
      .withColumn("kept", (col("margin") >= 50).cast("long"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("pairs_total"),
        sum(col("kept")).as("pairs_kept"),
        sum(col("kept") * (col("len_c") > col("len_r")).cast("long"))
          .as("chosen_longer"),
        sum(col("kept") * col("margin")).as("margin_sum"))
      .orderBy(col("source"), col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "q_mv_join_ivm" -> qMvJoinIvm,
    "q_pref_pairs" -> qPrefPairs)

  val oracle: Map[String, String] = Map(
    "q_mv_join_ivm" -> """
      SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          AS sum_price,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          / count(*) AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderkey % 10 <> 3
      GROUP BY 1, 2 ORDER BY c_mktsegment, o_orderpriority""",
    "q_pref_pairs" -> s"""
      WITH scored AS (${CorpusOps10.scoredSql}),
      ranked AS (
        SELECT d.source, d.lang, d.n_chars, s.score_milli,
          row_number() OVER (PARTITION BY d.source, d.lang
            ORDER BY s.score_milli DESC, d.doc_id) AS r,
          count(*) OVER (PARTITION BY d.source, d.lang) AS n
        FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
      chosen AS (SELECT source, lang, r AS i, score_milli AS sc_c,
                   n_chars AS len_c
                 FROM ranked WHERE r <= n // 2),
      rejected AS (SELECT source, lang, n + 1 - r AS i,
                     score_milli AS sc_r, n_chars AS len_r
                   FROM ranked WHERE r > n - n // 2),
      pairs AS (
        SELECT c.source, c.lang, c.sc_c - j.sc_r AS margin,
          CASE WHEN c.sc_c - j.sc_r >= 50 THEN 1 ELSE 0 END AS kept,
          c.len_c, j.len_r
        FROM chosen c JOIN rejected j
          ON c.source = j.source AND c.lang = j.lang AND c.i = j.i)
      SELECT source, lang, count(*) AS pairs_total,
        CAST(sum(kept) AS BIGINT) AS pairs_kept,
        CAST(sum(kept * (CASE WHEN len_c > len_r THEN 1 ELSE 0 END))
          AS BIGINT) AS chosen_longer,
        CAST(sum(kept * margin) AS BIGINT) AS margin_sum
      FROM pairs GROUP BY 1, 2 ORDER BY source, lang""")
}
