package graft.ops

import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables._

/** Corpus + analytics operators, r9 wave 9 (SURVEY.md §2.M): product
  * quantization for embeddings, Pareto/ABC revenue classification,
  * Flesch-Kincaid-style readability scoring, and a data-freshness
  * gate over the event stream. Same exact-int64 determinism contract
  * as CorpusOps5/6.
  */
object CorpusOps7 {

  /** Product quantization (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search") audit pass: 64-dim micro-quantized
    * embeddings split into M=4 subspaces of 16 dims; each subvector is
    * assigned to the nearest of K=16 codewords by exact int64 squared
    * L2 distance, and the output is the per-(subspace, codeword) usage
    * histogram + total quantization error — the codebook-balance report
    * an IVF-PQ index build emits. Codebook = the subvectors of vec_ids
    * 0..15 (the deterministic stand-in for a trained codebook; ids are
    * dense from 0 in this fixture at every SF).
    *
    * Exactness: distances are sums of squared differences of micro
    * ints (exact int64, max ~1e15 << 2^63); the argmin tie-breaks on
    * codeword id via a struct-min.
    *
    * Scale: the codebook (M*K = 64 rows) broadcasts; each vector meets
    * only K codewords per subspace, so the compare fan-out is
    * M*K per vector — linear in input, constant state, no all-pairs.
    * The assignment argmin partial-aggregates map-side (min of a
    * 12-byte struct), and the final histogram is M*K rows whatever
    * the corpus size. */
  val qEmbPq: Q = (s, dir) => {
    val q = EmbQuant.quantized(s, dir)
    val subs = q.select(col("vec_id"), explode(expr(
        """transform(sequence(0, 3),
           m -> struct(m AS m, slice(q, m * 16 + 1, 16) AS sub))"""))
        .as("e"))
      .select(col("vec_id"), col("e.m").as("m"), col("e.sub").as("sub"))
    val codebook = subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").cast("int").as("code"),
        col("sub").as("csub"))
    subs.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", expr(
        """aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)),
           CAST(0 AS BIGINT), (acc, v) -> acc + v)"""))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .groupBy(col("m"), col("best.code").as("code"))
      .agg(count(lit(1)).as("n_assigned"),
        sum(col("best.d2")).as("total_err"))
      .orderBy(col("m"), col("code"))
  }

  /** Pareto / ABC inventory classification: parts ranked by lifetime
    * revenue (exact cents); class A = parts inside the first 80% of
    * cumulative revenue, B = to 95%, C = the tail — the classic
    * 80/20 cut every ops/analytics stack ships. Emitted as the 3-row
    * class summary (part count, class revenue, exact permille share).
    *
    * Exactness: revenue in integer cents; the cumulative share is
    * `cum * 1000 div total` (non-negative); a part's class uses the
    * share INCLUSIVE of the part.
    *
    * Scale: the per-part rollup is one partial-aggregated shuffle.
    * The ranking window is global over the PART dimension (not the
    * fact) — at a scale where even parts overflow one partition, the
    * cumsum decomposes by revenue bucket exactly as q_budget_select's
    * two-level window does. */
  val qParetoAbc: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("cents"))
    val total = rev.agg(sum(col("cents")).as("total"))
    rev.crossJoin(broadcast(total))
      .withColumn("cum", sum(col("cents")).over(Window
        .orderBy(col("cents").desc, col("l_partkey"))
        .rowsBetween(Long.MinValue, 0)))
      .withColumn("share_pm", expr("cum * 1000 div total"))
      .withColumn("abc_class",
        when(col("share_pm") <= 800, "A")
          .when(col("share_pm") <= 950, "B").otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("class_cents"),
        max(col("total")).as("total_cents"))
      .select(col("abc_class"), col("n_parts"), col("class_cents"),
        expr("class_cents * 1000 div total_cents").as("class_share_pm"))
      .orderBy(col("abc_class"))
  }

  /** Flesch-Kincaid-style readability grade as an exact integer
    * proxy (Kincaid et al. 1975): syllables approximated by vowel
    * groups (the standard regex proxy), sentences by period count
    * (floored at 1), grade_milli = 390*(words/sentences) +
    * 11800*(syllables/words) - 15590 — each ratio an exact
    * non-negative integer division in milli units; the only negative
    * operation is the final subtraction. The readability gate a
    * kid-safe / difficulty-bucketed corpus split runs.
    *
    * Scale: pure map-side scoring — one scan, no shuffle before the
    * presentation sort. */
  val qTextReadability: Q = (s, dir) => {
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("words"),
        greatest(lit(1L),
          (length(col("text")) -
            length(regexp_replace(col("text"), "\\.", ""))).cast("long"))
          .as("sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("syllables"))
      .withColumn("grade_milli", expr(
        "390 * words * 1000 div (sentences * 1000) " +
          "+ 11800 * syllables * 1000 div (words * 1000) - 15590"))
      .withColumn("difficult", col("grade_milli") > 12000L)
      .orderBy(col("doc_id"))
  }

  /** Data-freshness gate over the event stream: per event type, the
    * last-seen event time, the lag behind the freshest type in whole
    * minutes, and a staleness flag at 60 minutes — the ingestion
    * liveness check a streaming pipeline alerts on (the DQ twin of
    * q_dq_anomaly's value gate).
    *
    * Exactness: lag is integer micros (unix_micros / epoch_us — the
    * same clock in both engines) floor-divided to minutes; operands
    * are non-negative by construction (global max >= per-type max).
    *
    * Scale: one partial-aggregated shuffle to |event types| rows; the
    * global max is a broadcast scalar. */
  val qDqFreshness: Q = (s, dir) => {
    val ev = Tables(s, dir, "events")
    val mx = ev.agg(max(unix_micros(col("ts"))).as("gmax"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts")).as("last_ts"),
        max(unix_micros(col("ts"))).as("tmax"))
      .crossJoin(broadcast(mx))
      .select(col("event_type"), col("n_events"),
        fmtTsUs(col("last_ts")).as("last_ts"),
        expr("(gmax - tmax) div 60000000").as("lag_minutes"))
      .withColumn("stale", col("lag_minutes") >= 60L)
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q_emb_pq" -> qEmbPq,
    "q_pareto_abc" -> qParetoAbc,
    "q_text_readability" -> qTextReadability,
    "q_dq_freshness" -> qDqFreshness)

  val oracle: Map[String, String] = Map(
    "q_emb_pq" -> """
      WITH q AS (SELECT vec_id, list_transform(embedding, x ->
                   CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                   AS q
                 FROM embeddings),
      subs AS (SELECT vec_id, m.m AS m,
                 q[m.m * 16 + 1 : m.m * 16 + 16] AS sub
               FROM q CROSS JOIN (SELECT unnest(range(0, 4)) AS m) m),
      cb AS (SELECT m, CAST(vec_id AS INT) AS code, sub AS csub
             FROM subs WHERE vec_id < 16),
      d AS (SELECT s.vec_id, s.m, cb.code,
              CAST(list_sum(list_transform(range(1, 17), i ->
                (s.sub[i] - cb.csub[i]) * (s.sub[i] - cb.csub[i])))
                AS BIGINT) AS d2
            FROM subs s JOIN cb ON s.m = cb.m),
      a AS (SELECT vec_id, m, code, d2,
              row_number() OVER (PARTITION BY vec_id, m
                ORDER BY d2, code) AS rn
            FROM d)
      SELECT m, code, count(*) AS n_assigned,
             CAST(sum(d2) AS BIGINT) AS total_err
      FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY m, code""",
    "q_pareto_abc" -> """
      WITH rev AS (SELECT l_partkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
                   FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
      c AS (SELECT l_partkey, cents, total,
              CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM rev CROSS JOIN t),
      k AS (SELECT *,
              CASE WHEN cum * 1000 // total <= 800 THEN 'A'
                   WHEN cum * 1000 // total <= 950 THEN 'B'
                   ELSE 'C' END AS abc_class
            FROM c)
      SELECT abc_class, count(*) AS n_parts,
        CAST(sum(cents) AS BIGINT) AS class_cents,
        CAST(sum(cents) AS BIGINT) * 1000 // max(total) AS class_share_pm
      FROM k GROUP BY 1 ORDER BY abc_class""",
    "q_text_readability" -> """
      WITH f AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
        greatest(CAST(1 AS BIGINT),
          CAST(length(text) - length(replace(text, '.', '')) AS BIGINT))
          AS sentences,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
          AS syllables
        FROM documents)
      SELECT doc_id, words, sentences, syllables,
        390 * words * 1000 // (sentences * 1000)
          + 11800 * syllables * 1000 // (words * 1000) - 15590
          AS grade_milli,
        (390 * words * 1000 // (sentences * 1000)
          + 11800 * syllables * 1000 // (words * 1000) - 15590) > 12000
          AS difficult
      FROM f ORDER BY doc_id""",
    "q_dq_freshness" -> """
      WITH mx AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
      p AS (SELECT event_type, count(*) AS n_events,
              max(ts) AS last_ts, max(epoch_us(ts)) AS tmax
            FROM events GROUP BY 1)
      SELECT event_type, n_events,
        strftime(last_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        (gmax - tmax) // 60000000 AS lag_minutes,
        (gmax - tmax) // 60000000 >= 60 AS stale
      FROM p CROSS JOIN mx ORDER BY event_type""")
}
