package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 78 (SURVEY.md §2.M): PAIRED blocker
  * disagreement — the McNemar reading of the dedup blocking audit.
  * q_dedup_blocking_audit scores each candidate generator (shingle
  * inverted index / SimHash bands / winnowing fingerprints) against
  * the exact-Jaccard truth INDEPENDENTLY (precision/recall); this
  * table answers the question those marginals cannot: on the SAME
  * true pairs, do two blockers miss the SAME pairs (interchangeable
  * — keep the cheaper one) or DIFFERENT pairs (complementary — union
  * them)? Per unordered blocker pair: both / a_only / b_only /
  * neither over the truth set, plus
  * `mcnemar_milli` = (a_only − b_only)²·1000 div (a_only + b_only)
  * (McNemar 1947, the q_eval_mcnemar convention; 0 when the
  * discordant mass is empty). A large `both` with small discordant
  * cells says redundant; a_only ≈ b_only ≫ 0 says genuinely
  * complementary coverage.
  *
  * Scale: ONE pair-stream build serves the truth and the shingle
  * candidates (the blocking-audit discipline); each blocker is its
  * own shipped inverted-index pipeline (never all-pairs); the flag
  * join is truth-stream-sized and co-partitioned on the pair key.
  * The `spark.graft.audit.sampleShards` gate shards every stream on
  * the PAIR key, so the sampled populations stay consistent and the
  * four cells need no rescaling (Verify refuses the conf — declared
  * output is exact).
  */
object CorpusOps74 {

  val qDedupBlockerMcnemar: Q = (s, dir) =>
    blockerMcnemarFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")))

  /** The disagreement table behind [[qDedupBlockerMcnemar]] and
    * `Graft.blockerMcnemar`: `docs0` = (doc_id, text). */
  private[graft] def blockerMcnemarFrom(docs0: DataFrame): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = graft.CacheScope.track(docs0.persist(mad))
    val ps = graft.CacheScope.track(AuditSample.gate(
        Dedup.jaccardPairStreamOf(docs), col("da"), col("db"))
      .persist(mad))
    val truth = ps
      .filter(col("i") * 1000 >=
        lit(200) * (col("na") + col("nb") - col("i")))
      .select(col("da"), col("db"))
    def hits(cand: DataFrame, name: String): DataFrame =
      AuditSample.gate(cand.select(col("da"), col("db")),
        col("da"), col("db"))
        .distinct()
        .withColumn(name, lit(1L))
    val flags = truth
      .join(hits(ps, "h_sh"), Seq("da", "db"), "left")
      .join(hits(Dedup.simhashPairsOf(docs), "h_si"),
        Seq("da", "db"), "left")
      .join(hits(Dedup.winnowPairs(docs), "h_wi"),
        Seq("da", "db"), "left")
      .na.fill(0L, Seq("h_sh", "h_si", "h_wi"))
    val combos = Seq(
      ("shingle_vs_simhash", "h_sh", "h_si"),
      ("shingle_vs_winnow", "h_sh", "h_wi"),
      ("simhash_vs_winnow", "h_si", "h_wi"))
    val wide = flags.agg(
      count(lit(1)).as("tt"),
      combos.flatMap { case (nm, x, y) => Seq(
        sum(col(x) * col(y)).as(s"both_$nm"),
        sum(col(x) * (lit(1L) - col(y))).as(s"a_$nm"),
        sum((lit(1L) - col(x)) * col(y)).as(s"b_$nm"))
      }: _*)
    val stackArgs = combos.map { case (nm, _, _) =>
      s"'$nm', both_$nm, a_$nm, b_$nm"
    }.mkString(", ")
    wide.select(col("tt"),
      expr(s"stack(${combos.size}, $stackArgs)" +
        " AS (pair, both_hit, a_only, b_only)"))
      .select(col("pair"), col("tt").as("truth_total"),
        coalesce(col("both_hit"), lit(0L)).as("both_hit"),
        coalesce(col("a_only"), lit(0L)).as("a_only"),
        coalesce(col("b_only"), lit(0L)).as("b_only"))
      .withColumn("neither",
        col("truth_total") - col("both_hit") - col("a_only") - col("b_only"))
      .withColumn("mcnemar_milli",
        expr("""CASE WHEN a_only + b_only = 0 THEN CAST(0 AS BIGINT)
            ELSE (a_only - b_only) * (a_only - b_only) * 1000
              div (a_only + b_only) END"""))
      .orderBy(col("pair"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_blocker_mcnemar" -> qDedupBlockerMcnemar)

  val oracle: Map[String, String] = Map(
    "q_dedup_blocker_mcnemar" -> s"""
      WITH ps AS MATERIALIZED (${Dedup.jaccardStreamSql}),
      truth AS MATERIALIZED (
        SELECT da, db FROM ps WHERE i * 1000 >= 200 * (na + nb - i)),
      simp AS MATERIALIZED (${Dedup.simhashPairsOracleSql}),
      winp AS MATERIALIZED (${Dedup.winnowOracleSql}),
      f AS (SELECT t.da, t.db,
              CASE WHEN s.da IS NOT NULL THEN 1 ELSE 0 END AS h_sh,
              CASE WHEN m.da IS NOT NULL THEN 1 ELSE 0 END AS h_si,
              CASE WHEN w.da IS NOT NULL THEN 1 ELSE 0 END AS h_wi
            FROM truth t
            LEFT JOIN (SELECT DISTINCT da, db FROM ps) s
              ON t.da = s.da AND t.db = s.db
            LEFT JOIN (SELECT DISTINCT da, db FROM simp) m
              ON t.da = m.da AND t.db = m.db
            LEFT JOIN (SELECT DISTINCT da, db FROM winp) w
              ON t.da = w.da AND t.db = w.db),
      a AS (SELECT CAST(count(*) AS BIGINT) AS tt,
              CAST(coalesce(sum(h_sh * h_si), 0) AS BIGINT) AS both_1,
              CAST(coalesce(sum(h_sh * (1 - h_si)), 0) AS BIGINT) AS a_1,
              CAST(coalesce(sum((1 - h_sh) * h_si), 0) AS BIGINT) AS b_1,
              CAST(coalesce(sum(h_sh * h_wi), 0) AS BIGINT) AS both_2,
              CAST(coalesce(sum(h_sh * (1 - h_wi)), 0) AS BIGINT) AS a_2,
              CAST(coalesce(sum((1 - h_sh) * h_wi), 0) AS BIGINT) AS b_2,
              CAST(coalesce(sum(h_si * h_wi), 0) AS BIGINT) AS both_3,
              CAST(coalesce(sum(h_si * (1 - h_wi)), 0) AS BIGINT) AS a_3,
              CAST(coalesce(sum((1 - h_si) * h_wi), 0) AS BIGINT) AS b_3
            FROM f),
      rows_ AS (
        SELECT 'shingle_vs_simhash' AS pair, tt,
          both_1 AS both_hit, a_1 AS a_only, b_1 AS b_only FROM a
        UNION ALL
        SELECT 'shingle_vs_winnow', tt, both_2, a_2, b_2 FROM a
        UNION ALL
        SELECT 'simhash_vs_winnow', tt, both_3, a_3, b_3 FROM a)
      SELECT pair, tt AS truth_total,
        coalesce(both_hit, 0) AS both_hit, coalesce(a_only, 0) AS a_only,
        coalesce(b_only, 0) AS b_only,
        tt - coalesce(both_hit, 0) - coalesce(a_only, 0)
          - coalesce(b_only, 0) AS neither,
        CASE WHEN a_only + b_only = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST((a_only - b_only) * (a_only - b_only) * 1000
            // (a_only + b_only) AS BIGINT)
        END AS mcnemar_milli
      FROM rows_ ORDER BY pair""")
}
