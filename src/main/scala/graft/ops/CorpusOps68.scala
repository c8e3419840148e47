package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 71 (SURVEY.md §2.M): the TOKEN-RANK
  * DRIFT monitor — rank-biased overlap between the top-10 token
  * rankings of the two md5-parity corpus halves, per source. The
  * vocabulary-HEAD churn tripwire beside q_drift_length (length
  * shape) and q_corpus_diff (set-level token churn): two snapshots
  * can agree on every marginal histogram and still reorder the head
  * of the vocabulary — the thing a tokenizer, stopword list, or
  * boilerplate filter keyed on frequent tokens actually depends on.
  * RBO 1000‰ = both halves rank the head identically.
  *
  * Reuses the r17 w69 RBO machinery verbatim (CorpusOps66.rboWeights
  * — one formula): depth 10, p = 9/10, exact integer suffix weights
  * in lcm(1..10) = 2520 units embedded as literals in both engines.
  * The split is the declared md5-doc_id parity every drift monitor
  * shares.
  *
  * Scale: one token scan partial-aggregates to (source, half,
  * token) counts; the rankings are 10 rows per (source, half);
  * everything downstream is audit-table-sized. */
object CorpusOps68 {

  val qDriftTokenRank: Q = (s, dir) =>
    tokenRankDriftFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text"),
        (expr("""pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)),
           1, 15), 16, 10) AS BIGINT), 2)""") === 0).cast("long")
          .as("a")), "grp")
      .withColumnRenamed("grp", "source")

  /** The monitor behind [[qDriftTokenRank]] and
    * `Graft.tokenRankDrift`: `docs` = (grp, text, a = 1 for the A
    * half). Emits per grp: n_common (shared top-10 tokens), u_sum,
    * rbo_permille. */
  private[graft] def tokenRankDriftFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (u, uMax) = CorpusOps66.rboWeights(10)
    val uArr = u.mkString("array(CAST(", " AS BIGINT), CAST(",
      " AS BIGINT))")
    val ranked = docs
      .select(col(grp), col("a"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col(grp), col("a"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(grp), col("a"))
          .orderBy(col("c").desc, col("tok"))))
      .filter(col("rk") <= 10)
    val ra = ranked.filter(col("a") === 1L)
      .select(col(grp), col("tok"), col("rk").as("ra"))
    val rb = ranked.filter(col("a") === 0L)
      .select(col(grp), col("tok"), col("rk").as("rb"))
    val common = ra.join(rb, Seq(grp, "tok"))
      .select(col(grp),
        expr(s"element_at($uArr, CAST(greatest(ra, rb) AS INT))")
          .as("u"))
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_common"), sum(col("u")).as("u_sum"))
    docs.select(col(grp)).distinct()
      .join(common, Seq(grp), "left")
      .select(col(grp),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("u_sum"), lit(0L)).as("u_sum"),
        expr(s"coalesce(u_sum, CAST(0 AS BIGINT)) * 1000 div " +
          s"CAST($uMax AS BIGINT)").as("rbo_permille"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_drift_token_rank" -> qDriftTokenRank)

  val oracle: Map[String, String] = {
    val (u, uMax) = CorpusOps66.rboWeights(10)
    val uCase = u.zipWithIndex.map { case (w, i) =>
      s"WHEN ${i + 1} THEN $w"
    }.mkString(" ")
    Map("q_drift_token_rank" -> s"""
      WITH d AS (SELECT source, text,
          CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) % 2 AS par
        FROM documents),
      toks AS (SELECT source, par, unnest(string_split(text, ' '))
                 AS tok
               FROM d),
      ranked AS (SELECT source, par, tok,
                   row_number() OVER (PARTITION BY source, par
                     ORDER BY count(*) DESC, tok) AS rk
                 FROM toks GROUP BY source, par, tok
                 QUALIFY rk <= 10),
      ra AS (SELECT source, tok, rk AS ra FROM ranked WHERE par = 0),
      rb AS (SELECT source, tok, rk AS rb FROM ranked WHERE par = 1),
      c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_common,
              CAST(sum(CASE greatest(ra, rb) $uCase END) AS BIGINT)
                AS u_sum
            FROM ra JOIN rb USING (source, tok) GROUP BY source),
      s AS (SELECT DISTINCT source FROM documents)
      SELECT source, coalesce(n_common, 0) AS n_common,
        coalesce(u_sum, 0) AS u_sum,
        CAST(coalesce(u_sum, 0) * 1000 // $uMax AS BIGINT)
          AS rbo_permille
      FROM s LEFT JOIN c USING (source)
      ORDER BY source""")
  }
}
