package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of corpus-preparation operators (SURVEY.md §2.M, round 6):
  * repetition-based quality filtering, balanced domain mixing, span-level
  * exact dedup, and int8 scalar quantization for embedding search.
  *
  * Published grounding: repetition filters — Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher" (2021) §A1.1
  * (fraction of duplicate n-grams / words as quality signals); span/line
  * dedup — Raffel et al., "Exploring the Limits of Transfer Learning with
  * a Unified Text-to-Text Transformer" (C4, 2020) three-sentence dedup;
  * Lee et al., "Deduplicating Training Data Makes Language Models Better"
  * (2022); scalar quantization — Johnson/Douze/Jegou, "Billion-scale
  * similarity search with GPUs" (2017) SQ8 storage.
  *
  * Everything is deterministic integer/string arithmetic (the one float
  * step — quantization — is round()ed to integers before any comparison),
  * so the DuckDB oracle replays each query exactly.
  */
object CorpusOps2 {

  /** Gopher-style repetition scoring: per doc, the modal-bigram count vs
    * total bigrams and the duplicate-word count vs total words, plus the
    * filter verdict as exact integer comparisons (modal bigram >= 10% of
    * bigrams, or >= 50% of words are repeats). Integer stats only — no
    * float ratios to diverge cross-engine.
    *
    * Scale: two partial-aggregable per-doc aggregations (one keyed by
    * (doc, bigram), one by doc) joined on doc_id — every stage map-side
    * combines, nothing is quadratic, no global state. */
  val qTextRepetition: Q = (s, dir) => {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
    val words = toks.select(col("doc_id"), explode(col("a")).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("totw"), countDistinct(col("w")).as("distw"))
    val bigrams = toks.filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(a) - 1),
           i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1)))"""))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max2"), sum(col("c")).as("tot2"))
    words.join(bigrams, Seq("doc_id"))
      .select(col("doc_id"), col("max2"), col("tot2"), col("distw"),
        col("totw"),
        (col("max2") * 10 >= col("tot2") ||
          (col("totw") - col("distw")) * 2 >= col("totw")).as("flagged"))
      .orderBy(col("doc_id"))
  }

  /** Balanced domain mixing: keep (up to) a fixed quota of docs per
    * source, chosen deterministically by multiplicative hash — the
    * "flatten the domain distribution" resampling step of corpus mixing.
    *
    * Two-phase shape for 100 TB: phase 1 is a Bernoulli hash PRE-FILTER
    * with a per-source rate ~3x the quota (computed from broadcast
    * per-source counts — a scan predicate, no shuffle of the corpus);
    * phase 2 ranks only the ~3x-quota survivors per source. The exact
    * rank window therefore never sees a giant domain's full row set —
    * without the pre-filter a 1e9-doc domain funnels into one window
    * partition. Same overflow-safe hash contract as q_sample_stratified
    * (doc_id reduced mod 1e9+7 before the multiply). */
  val qMixDomains: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val quota = 10
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        ((col("doc_id") % 1000000007L) * 2654435761L % 1000000L).as("hkey"))
    val rates = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(col("source"),
        least(lit(1000000L), expr(s"${3 * quota * 1000000L} div n"))
          .as("cap"))
    val pre = docs.join(broadcast(rates), Seq("source"))
      .filter(col("hkey") < col("cap"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hkey"), col("doc_id"))
    pre.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("source"), col("doc_id"), col("hkey"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Span-level exact dedup (C4/Lee-et-al style): each doc's distinct
    * non-overlapping word-8-gram spans are attributed to their first
    * occurrence across the corpus (min doc_id); a doc's n_dup counts
    * spans already owned by an earlier doc. Downstream, dup-heavy docs
    * are dropped or span-trimmed.
    *
    * Scale: span table is O(tokens/8); ownership is one groupBy on the
    * span + an equi-join back — two shuffles, both partial-aggregable.
    * Spans join on the raw string (oracle-identical semantics); a
    * production corpus would join on xxhash64(span) for 8-byte shuffle
    * keys like qDedupJaccard. */
  val qDedupSpans: Q = (s, dir) => {
    val spans = Tables(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(a) div 8 - 1),
           i -> array_join(slice(a, i * 8 + 1, 8), ' '))""")).as("g"))
      .distinct()
    val owner = spans.groupBy(col("g")).agg(min(col("doc_id")).as("owner"))
    spans.join(owner, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L))
          .as("n_dup"))
      .filter(col("n_dup") >= 1)
      .orderBy(col("doc_id"))
  }

  /** Int8 scalar quantization (SQ8) + quantized top-k search: each vector
    * is stored as 64 signed bytes + one scale (max|x|/127) — 4x smaller
    * than float32, the standard storage tier for billion-vector indexes;
    * search scores with the exact INTEGER dot product of the quantized
    * codes, so ranking is bit-identical cross-engine. Queries broadcast,
    * candidates stream (same shape as q_sim_topk). */
  val qQuantInt8: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val qv = emb.select(col("vec_id"),
        expr("""aggregate(embedding, CAST(0.0 AS DOUBLE),
                (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))""").as("ma"),
        col("embedding"))
      .select(col("vec_id"), expr(
        """transform(embedding, x -> CAST(round(
           CAST(x AS DOUBLE) * 127.0 / greatest(ma, 1e-30)) AS BIGINT))""")
        .as("qv"))
    val queries = qv.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("qa"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("idot").desc, col("neighbor"))
    qv.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor"),
        expr("""aggregate(zip_with(qa, qv, (x, y) -> x * y),
                CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("idot"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("neighbor"), col("idot"))
      .orderBy(col("qid"), col("neighbor"))
  }

  val queries: Map[String, Q] = Map(
    "q_text_repetition" -> qTextRepetition,
    "q_mix_domains" -> qMixDomains,
    "q_dedup_spans" -> qDedupSpans,
    "q_quant_int8" -> qQuantInt8)

  val oracle: Map[String, String] = Map(
    "q_text_repetition" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      w AS (
        SELECT doc_id, count(*) AS totw, count(DISTINCT tok) AS distw
        FROM (SELECT doc_id, unnest(a) AS tok FROM toks) GROUP BY doc_id),
      bg AS (
        SELECT doc_id, a[i] || ' ' || a[i + 1] AS bg
        FROM (SELECT *, unnest(range(1, len(a))) AS i FROM toks)),
      bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
      b AS (SELECT doc_id, max(c) AS max2, CAST(sum(c) AS BIGINT) AS tot2
            FROM bc GROUP BY doc_id)
      SELECT w.doc_id, b.max2, b.tot2, w.distw, w.totw,
        (b.max2 * 10 >= b.tot2 OR (w.totw - w.distw) * 2 >= w.totw)
          AS flagged
      FROM w JOIN b ON w.doc_id = b.doc_id ORDER BY w.doc_id""",
    "q_mix_domains" -> """
      WITH d AS (
        SELECT doc_id, source,
          ((doc_id % 1000000007) * 2654435761) % 1000000 AS hkey
        FROM documents),
      r AS (
        SELECT source,
          least(1000000, 30000000 // count(*)) AS cap
        FROM d GROUP BY source),
      pre AS (SELECT d.* FROM d JOIN r USING (source) WHERE hkey < cap),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY hkey, doc_id) AS rn FROM pre)
      SELECT source, doc_id, CAST(hkey AS BIGINT) AS hkey
      FROM rk WHERE rn <= 10 ORDER BY source, doc_id""",
    "q_dedup_spans" -> """
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a FROM documents
        WHERE len(string_split(text, ' ')) >= 8),
      sp AS (
        SELECT DISTINCT doc_id,
          array_to_string(a[i * 8 + 1 : i * 8 + 8], ' ') AS g
        FROM toks, range(0, 1000) r(i)
        WHERE i <= len(a) // 8 - 1),
      own AS (SELECT g, min(doc_id) AS owner FROM sp GROUP BY g)
      SELECT sp.doc_id, count(*) AS n_spans,
        CAST(sum(CASE WHEN own.owner < sp.doc_id THEN 1 ELSE 0 END)
          AS BIGINT) AS n_dup
      FROM sp JOIN own USING (g)
      GROUP BY sp.doc_id
      HAVING sum(CASE WHEN own.owner < sp.doc_id THEN 1 ELSE 0 END) >= 1
      ORDER BY sp.doc_id""",
    "q_quant_int8" -> """
      WITH m AS (
        SELECT vec_id, greatest(list_max(
          list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30)
          AS ma
        FROM embeddings),
      e AS (
        SELECT emb.vec_id, r.i AS i,
          CAST(round(CAST(embedding[r.i] AS DOUBLE) * 127.0 / m.ma)
            AS BIGINT) AS v
        FROM embeddings emb JOIN m ON emb.vec_id = m.vec_id,
          range(1, 65) r(i)),
      d AS (
        SELECT b.vec_id AS qid, a.vec_id AS neighbor,
          CAST(sum(a.v * b.v) AS BIGINT) AS idot
        FROM e a JOIN e b ON a.i = b.i
        WHERE b.vec_id < 10 AND a.vec_id <> b.vec_id
        GROUP BY 1, 2),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY qid
          ORDER BY idot DESC, neighbor) AS rn FROM d)
      SELECT qid, neighbor, idot FROM rk WHERE rn <= 5
      ORDER BY qid, neighbor""")
}
