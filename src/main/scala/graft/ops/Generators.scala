package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Table-generating functions / LATERAL VIEW surface (SURVEY.md §2.H).
  *
  * Hive lineage: UDTFOperator + LateralViewJoinOperator
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/UDTFOperator.java,
  * LateralViewJoinOperator.java]; explode/posexplode/inline/stack/json_tuple
  * [hive: ql/.../udf/generic/GenericUDTFExplode.java etc.].
  *
  * Spark-first: all lower to GenerateExec inside whole-stage codegen; the
  * per-row fan-out happens pipeline-local (no shuffle), so token explosion
  * over a 100 TB corpus scales linearly with input splits.
  */
object Generators {

  /** explode(split(text)) — the canonical token fan-out + count. */
  val qExplodeTokens: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(50)
  }

  /** posexplode: element + 0-based position. */
  val qPosExplode: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "pos")
      .withColumnRenamed("col", "tok")
      .orderBy(col("doc_id"), col("pos"))
  }

  /** LATERAL VIEW OUTER explode via the SQL front-end: docs whose token
    * array is emptied by the filter still emit one NULL row. */
  val qExplodeOuter: Q = (s, dir) => {
    Tables.registerViews(s, dir, "documents")
    s.sql("""
      SELECT doc_id, tok
      FROM (SELECT doc_id,
              filter(split(text, ' '), x -> length(x) > 7) AS toks
            FROM documents WHERE doc_id < 50) t
      LATERAL VIEW OUTER explode(toks) ex AS tok
      ORDER BY doc_id, tok""")
  }

  /** stack(n, ...): literal rows → a join-able inline table. */
  val qStack: Q = (s, dir) => {
    Tables.registerViews(s, dir, "events")
    s.sql("""
      SELECT t.sev, t.code, count(e.event_id) AS cnt
      FROM (SELECT stack(3, 'low', 'view', 'mid', 'click', 'high', 'error')
              AS (sev, code)) t
      LEFT JOIN events e ON e.event_type = t.code
      GROUP BY t.sev, t.code ORDER BY t.sev, t.code""")
  }

  /** inline(array<struct>): struct rows → columns. */
  val qInline: Q = (s, dir) => {
    Tables.registerViews(s, dir, "part")
    s.sql("""
      SELECT b.band, b.lo, count(1) AS cnt
      FROM part
      LATERAL VIEW inline(array(
        named_struct('band', 'small', 'lo', 0),
        named_struct('band', 'large', 'lo', 25))) b AS band, lo
      WHERE p_size >= b.lo
      GROUP BY b.band, b.lo ORDER BY b.band""")
  }

  /** json_tuple over the events props JSON column. */
  val qJsonTuple: Q = (s, dir) => {
    Tables(s, dir, "events")
      .select(col("event_id"), json_tuple(col("props"), "k"))
      .select(col("c0").cast("int").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("k"))
  }

  val queries: Map[String, Q] = Map(
    "q_explode_tokens" -> qExplodeTokens,
    "q_posexplode" -> qPosExplode,
    "q_explode_outer" -> qExplodeOuter,
    "q_stack" -> qStack,
    "q_inline" -> qInline,
    "q_json_tuple" -> qJsonTuple)

  val oracle: Map[String, String] = Map(
    "q_explode_tokens" -> """
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50""",
    "q_posexplode" -> """
      SELECT doc_id, CAST(u.z[2] - 1 AS INT) AS pos, u.z[1] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id < 5) d,
      LATERAL (SELECT unnest(list_zip(t, range(1, len(t) + 1))) AS z) u
      ORDER BY doc_id, pos""",
    "q_explode_outer" -> """
      WITH t AS (SELECT doc_id,
                   list_filter(string_split(text, ' '),
                               x -> length(x) > 7) AS toks
                 FROM documents WHERE doc_id < 50)
      SELECT doc_id, u.tok
      FROM t LEFT JOIN
        (SELECT doc_id, unnest(toks) AS tok FROM t) u USING (doc_id)
      ORDER BY doc_id, tok NULLS FIRST""",
    "q_stack" -> """
      SELECT t.sev, t.code, count(e.event_id) AS cnt
      FROM (VALUES ('low', 'view'), ('mid', 'click'), ('high', 'error'))
        t(sev, code)
      LEFT JOIN events e ON e.event_type = t.code
      GROUP BY t.sev, t.code ORDER BY t.sev, t.code""",
    "q_inline" -> """
      SELECT b.band, b.lo, count(*) AS cnt
      FROM part JOIN (VALUES ('small', 0), ('large', 25)) b(band, lo)
        ON p_size >= b.lo
      GROUP BY b.band, b.lo ORDER BY b.band""",
    "q_json_tuple" -> """
      SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
             count(*) AS cnt
      FROM events GROUP BY k ORDER BY k""")
}
