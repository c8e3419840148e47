package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Corpus-preparation operators for LLM training-data pipelines (the
  * beyond-reference surface SURVEY.md §2.M): sequence packing, reproducible
  * stratified sampling, benchmark-contamination detection, and RAG
  * chunking. Everything is deterministic integer/string arithmetic so the
  * DuckDB oracle can replay it exactly — no RNG, no floats.
  */
object CorpusOps {

  /** Concat-and-chunk sequence packing (pretraining batch prep): docs are
    * concatenated in doc_id order and split at a fixed token budget, so a
    * doc's pack is floor(tokens-before-it / budget) — the standard
    * straddling-docs packing. Scale: packing is done independently per
    * shard (doc_id % 8) — the window cumsum never needs a global single
    * partition, so 100 TB packs with one shuffle on the shard key and
    * each shard's cumsum streams. */
  val qPackSequences: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val budget = 256
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div $budget"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Context-length packing-efficiency sweep — the capacity-planning
    * table behind "which context window wastes least": for each candidate
    * context size, report total tokens, block count, tail fill rate, and
    * how many documents straddle a block boundary under concat-and-chunk
    * packing (straddles are the re-attention cost of concat packing;
    * tail waste is the padding cost). One sharded cumsum (the
    * [[qPackSequences]] discipline — never a global single partition)
    * serves every context size; the sweep is a 3-value explode over the
    * cumsum stream with per-(ctx, shard) partial aggregation, so the
    * corpus is scanned once regardless of how many sizes are swept.
    *
    * Determinism: pure integer arithmetic; fill_rate is one IEEE
    * division + round. */
  val qPackEfficiency: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Tables(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
    val swept = cum.select(col("shard"), col("n_tok"), col("cum"),
      explode(array(lit(256), lit(512), lit(1024))).as("ctx"))
    val perShard = swept.groupBy(col("ctx"), col("shard"))
      .agg(max(col("cum")).as("tot"),
        sum(when(expr("(cum - n_tok) div ctx") =!= expr("(cum - 1) div ctx"),
          1L).otherwise(0L)).as("straddled"))
    perShard.groupBy(col("ctx"))
      .agg(sum(col("tot")).as("total_tok"),
        sum(expr("(tot + ctx - 1) div ctx")).as("n_blocks"),
        sum(col("straddled")).as("straddled_docs"))
      .withColumn("fill_rate",
        round(col("total_tok").cast("double") /
          (col("n_blocks") * col("ctx")).cast("double"), 4))
      .orderBy(col("ctx"))
  }

  /** Reproducible stratified (quota) sampling: Bernoulli-by-hash with a
    * per-stratum rate — downsample dominant languages, keep the tail.
    * The multiplicative hash on doc_id replaces seeded RNG (which is
    * neither cross-engine nor cross-run stable on a cluster); the filter
    * is a pushdown-friendly scan predicate, zero shuffles before the
    * final tiny aggregate.
    *
    * Overflow contract (VERDICT/ADVICE r4): doc_id is first reduced mod
    * 1e9+7, so the product is bounded by ~2.66e18 < 2^63 — Spark's
    * wrapping Int64 multiply and DuckDB's overflow-checked HUGEINT
    * promotion then agree EXACTLY for any non-negative doc_id, instead of
    * silently diverging (and dropping rows via negative remainders) once
    * doc_id exceeds ~3.5e9. */
  val qSampleStratified: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .withColumn("quota",
        when(col("lang") === "en", 100).otherwise(300))
      .filter((col("doc_id") % 1000000007L) * 2654435761L % 1000
        < col("quota"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Weighted sampling proportional-to-size, without replacement:
    * systematic (Madow 1949) PPS sampling of k=5 docs per source,
    * weighted by n_chars — the "sample training docs by length/quality
    * weight" pipeline step. Each source lays its docs on a cumulative
    * weight line and takes the docs covering the k midpoint strides
    * ((2m-1)·W/2k), so inclusion probability is proportional to weight
    * and the draw is exact-integer deterministic (the float-free
    * alternative to Efraimidis–Spirakis exponential keys, whose
    * ln/pow ordering is not bit-stable across engines).
    *
    * Scale: one window cumsum per source partition (same sharded
    * discipline as qPackSequences — never a global single partition),
    * the k sample points are a per-row predicate on the cumsum, and
    * nothing else shuffles. 100 TB = one shuffle on source. */
  val qSampleWeighted: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val k = 5
    val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cw", sum(col("n_chars")).over(wCum))
      .withColumn("tot", sum(col("n_chars")).over(wAll))
      .select(col("source"), col("doc_id"), col("n_chars"), col("cw"),
        col("tot"),
        explode(expr(s"sequence(1L, ${k}L)")).as("m"))
      .withColumn("p", expr(s"((2 * m - 1) * tot) div ${2 * k}"))
      .filter(col("cw") - col("n_chars") < col("p") &&
        col("p") <= col("cw"))
      .select(col("source"), col("m"), col("p"), col("doc_id"),
        col("n_chars"))
      .orderBy(col("source"), col("m"))
  }

  /** Benchmark-contamination detection: count distinct word 4-grams each
    * corpus doc shares with a held-out benchmark set (here: doc_id % 97
    * = 0). Scale: the benchmark gram set is tiny and broadcast, so the
    * corpus side is a map-side semi-join — no shuffle of the 100 TB
    * gram stream; the per-doc distinct count aggregates partially. */
  val qContamination: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 4) // sequence(0, n) descends for n < 0
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 4), i -> " +
          "array_join(slice(a, i + 1, 4), ' '))")).as("g"))
      .distinct()
    val bench = grams(docs.filter(col("doc_id") % 97 === 0))
      .select(col("g")).distinct()
    grams(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared"))
      .filter(col("n_shared") >= 1)
      .orderBy(col("doc_id"))
  }

  /** RAG chunking: split each doc into overlapping token windows
    * (size 64, stride 48) with positions — the retrieval-index prep
    * step. Pure per-doc generate/explode: shuffle-free at any scale. */
  val qChunkDocs: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("a"),
        explode(expr("sequence(0, size(a) - 1, 48)")).as("start"))
      .select(col("doc_id"), expr("start div 48").as("chunk_id"),
        expr("size(slice(a, start + 1, 64))").as("n_tok"),
        expr("element_at(a, start + 1)").as("head_tok"),
        expr("array_join(slice(a, start + 1, 64), ' ')").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_pack_sequences" -> qPackSequences,
    "q_pack_efficiency" -> qPackEfficiency,
    "q_sample_stratified" -> qSampleStratified,
    "q_sample_weighted" -> qSampleWeighted,
    "q_contamination" -> qContamination,
    "q_chunk_docs" -> qChunkDocs)

  val oracle: Map[String, String] = Map(
    "q_pack_sequences" -> """
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT *, sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT shard, CAST((cum - n_tok) // 256 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""",
    "q_pack_efficiency" -> """
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT *, sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t),
      x AS (SELECT shard, n_tok, cum, unnest([256, 512, 1024]) AS ctx
            FROM c),
      ps AS (SELECT ctx, shard, max(cum) AS tot,
               sum(CASE WHEN (cum - n_tok) // ctx <> (cum - 1) // ctx
                   THEN 1 ELSE 0 END) AS straddled
             FROM x GROUP BY 1, 2)
      SELECT ctx, CAST(sum(tot) AS BIGINT) AS total_tok,
        CAST(sum((tot + ctx - 1) // ctx) AS BIGINT) AS n_blocks,
        CAST(sum(straddled) AS BIGINT) AS straddled_docs,
        round(CAST(sum(tot) AS DOUBLE)
          / CAST(sum((tot + ctx - 1) // ctx) * ctx AS DOUBLE), 4)
          AS fill_rate
      FROM ps GROUP BY ctx ORDER BY ctx""",
    "q_sample_stratified" -> """
      SELECT lang, count(*) AS cnt,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      WHERE ((doc_id % 1000000007) * 2654435761) % 1000 <
            (CASE WHEN lang = 'en' THEN 100 ELSE 300 END)
      GROUP BY lang ORDER BY lang""",
    "q_sample_weighted" -> """
      WITH d AS (
        SELECT doc_id, source, n_chars,
          sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          sum(n_chars) OVER (PARTITION BY source) AS tot
        FROM documents),
      s AS (SELECT *, unnest(range(1, 6)) AS m FROM d),
      x AS (SELECT source, m, ((2 * m - 1) * tot) // 10 AS p,
                   doc_id, n_chars, cw
            FROM s)
      SELECT source, m, CAST(p AS BIGINT) AS p, doc_id, n_chars
      FROM x WHERE cw - n_chars < p AND p <= cw
      ORDER BY source, m""",
    "q_contamination" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      idx AS (
        SELECT doc_id, a, unnest(range(0, len(a) - 3)) AS i FROM toks),
      grams AS (
        SELECT DISTINCT doc_id,
          array_to_string(a[i + 1 : i + 4], ' ') AS g
        FROM idx),
      bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
      SELECT doc_id, count(DISTINCT g) AS n_shared
      FROM grams JOIN bench USING (g)
      WHERE doc_id % 97 <> 0
      GROUP BY doc_id HAVING count(DISTINCT g) >= 1
      ORDER BY doc_id""",
    "q_chunk_docs" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      starts AS (
        SELECT doc_id, a, unnest(range(0, len(a), 48)) AS start FROM toks)
      SELECT doc_id, start // 48 AS chunk_id,
        CAST(len(a[start + 1 : start + 64]) AS INT) AS n_tok,
        a[start + 1] AS head_tok,
        array_to_string(a[start + 1 : start + 64], ' ') AS chunk_text
      FROM starts ORDER BY doc_id, chunk_id""")
}
