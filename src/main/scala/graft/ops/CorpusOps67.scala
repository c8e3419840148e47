package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r17 wave 70 (SURVEY.md §2.M): the NORMALIZATION
  * UNLOCK audit — how many exact duplicates does canonical text
  * normalization (lowercase, strip non-alphanumerics, collapse
  * whitespace) reveal that byte-exact hashing misses? Every
  * production dedup pipeline normalizes before hashing (CCNet §3.1,
  * the Dolma/RefinedWeb recipes); THIS table is the measured case
  * for that stage: per source, the keep-first-removable doc counts
  * under the raw key and under the normalized key, and the UNLOCKED
  * delta (≥ 0 — normalization only merges groups, spec-pinned).
  *
  * Keep-first is GLOBAL (a doc is removable iff a lower-doc_id doc
  * shares its key anywhere in the corpus — the q_dedup_exact
  * convention), attributed to the removable doc's own source.
  *
  * Scale: two shuffles on the respective keys (window rank per
  * key), one scan each — the exact-dedup cost class, twice. */
object CorpusOps67 {

  /** The canonical normalization — ONE definition mirrored by
    * [[normSql]]: lowercase → strip [^a-z0-9 ] → collapse space
    * runs → trim. */
  private[graft] def normText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** DuckDB mirror of [[normText]]. */
  private[graft] def normSql(x: String): String =
    s"trim(regexp_replace(regexp_replace(lower($x), " +
      s"'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  val qDedupNormDelta: Q = (s, dir) =>
    normDeltaFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source").as("grp"), col("text")),
      "grp")
      .withColumnRenamed("grp", "source")

  /** The audit behind [[qDedupNormDelta]] and `Graft.normUnlock`:
    * `docs` = (doc_id, grp, text). Emits per grp: n_docs,
    * dup_raw / dup_norm (keep-first-removable under each key),
    * unlocked and its permille of the group. */
  private[graft] def normDeltaFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // key on md5(text), not the text itself: the keep-first window
    // shuffles the KEY, and a 32-char digest beats shipping whole
    // documents through the exchange at corpus scale (cross-engine
    // identical hex; collisions declared negligible)
    def removable(key: Column, name: String) =
      docs.select(col("doc_id"), col(grp), md5(key.cast("binary")).as("k"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("doc_id"))))
        .groupBy(col(grp))
        .agg(sum(when(col("rk") > 1, 1L).otherwise(0L)).as(name))
    docs.groupBy(col(grp)).agg(count(lit(1)).as("n_docs"))
      .join(removable(col("text"), "dup_raw"), Seq(grp))
      .join(removable(normText(col("text")), "dup_norm"), Seq(grp))
      .select(col(grp), col("n_docs"), col("dup_raw"), col("dup_norm"),
        (col("dup_norm") - col("dup_raw")).as("unlocked"))
      .withColumn("unlocked_permille",
        expr("unlocked * 1000 div n_docs"))
      .orderBy(col(grp))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_norm_delta" -> qDedupNormDelta)

  private def removableSql(key: String, name: String): String = s"""
    SELECT source, CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END)
      AS BIGINT) AS $name
    FROM (SELECT source, row_number() OVER (PARTITION BY md5($key)
            ORDER BY doc_id) AS rk
          FROM documents)
    GROUP BY source"""

  val oracle: Map[String, String] = Map(
    "q_dedup_norm_delta" -> s"""
      WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY source),
      r AS (${removableSql("text", "dup_raw")}),
      m AS (${removableSql(normSql("text"), "dup_norm")})
      SELECT source, n_docs, dup_raw, dup_norm,
        dup_norm - dup_raw AS unlocked,
        CAST((dup_norm - dup_raw) * 1000 // n_docs AS BIGINT)
          AS unlocked_permille
      FROM n JOIN r USING (source) JOIN m USING (source)
      ORDER BY source""")
}
