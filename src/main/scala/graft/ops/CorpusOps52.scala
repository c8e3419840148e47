package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus operators, r16 wave 46 (SURVEY.md §2.M): the
  * leave-one-source-out ablation plan (the "what would dropping this
  * source do to the mixture" table read before a data ablation run),
  * a DETERMINISTIC bootstrap confidence interval for per-source
  * quality means (Efron 1979, with md5-derived Poisson(1)-approximate
  * resample weights — eval infrastructure every metric report should
  * carry), and a two-snapshot Kolmogorov–Smirnov drift monitor on
  * the token-length distribution (the data-drift tripwire a standing
  * ingest pipeline alarms on).
  *
  * Determinism contract: exact int64 arithmetic throughout; the
  * bootstrap's resample weights come from the 60-bit md5 bridge
  * (identical integers both engines); KS uses cross-multiplied
  * integer CDFs — no division until the final permille.
  */
object CorpusOps52 {

  /** The q_select_threshold_sweep quality score (5/3/1/1 milli
    * weights) as one self-contained expression over `text` — shared
    * by the ablation and bootstrap tables below. Semantics identical
    * to CorpusOps47.thresholdSweepFrom's scorer. */
  private val scoreExpr = """
    (5 * (size(array_distinct(split(text, ' '))) * 1000
          div greatest(size(split(text, ' ')), 1))
     + 3 * (size(filter(split(text, ' '), w -> w IN ('the', 'a', 'and',
         'of', 'to', 'in', 'is', 'le', 'la', 'et', 'de', 'les', 'un',
         'der', 'die', 'und', 'das', 'ein', 'ist', 'el', 'los', 'y',
         'que', 'en'))) * 1000
         div greatest(size(split(text, ' ')), 1))
     + (1000 - (length(text) - length(regexp_replace(text,
          '[.,!?;:]', ''))) * 1000 div greatest(length(text), 1))
     + (1000 - (length(text) - length(regexp_replace(text,
          '[0-9]', ''))) * 1000 div greatest(length(text), 1))) div 10"""

  private def scoreSql(t: String): String = s"""
    (5 * (len(list_distinct(string_split($t, ' '))) * 1000
          // greatest(len(string_split($t, ' ')), 1))
     + 3 * (len(list_filter(string_split($t, ' '), w -> w IN ('the',
         'a', 'and', 'of', 'to', 'in', 'is', 'le', 'la', 'et', 'de',
         'les', 'un', 'der', 'die', 'und', 'das', 'ein', 'ist', 'el',
         'los', 'y', 'que', 'en'))) * 1000
         // greatest(len(string_split($t, ' ')), 1))
     + (1000 - (length($t) - length(regexp_replace($t,
          '[.,!?;:]', '', 'g'))) * 1000 // greatest(length($t), 1))
     + (1000 - (length($t) - length(regexp_replace($t,
          '[0-9]', '', 'g'))) * 1000 // greatest(length($t), 1))) // 10"""

  // ---------------------------------------------------------------
  // q_mix_ablation — leave-one-source-out plan
  // ---------------------------------------------------------------

  /** Leave-one-source-out ablation plan: per source, the corpus that
    * REMAINS if it is dropped — doc/token mass, its share, and the
    * quality-mean shift (mean score of the complement minus the full
    * corpus, micro units) — the table an ablation-run owner reads to
    * pick which source to test first (a big positive shift = the
    * source drags quality down; a big share = dropping it starves
    * tokens). Pure |sources|-row algebra on one scan's aggregates:
    * complement sums are total − own, never a second pass. */
  val qMixAblation: Q = (s, dir) =>
    ablationFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        expr(scoreExpr).as("sc")), "grp")
      .withColumnRenamed("grp", "source")

  /** The plan behind [[qMixAblation]] and `Graft.sourceAblation`:
    * `obs` = (grp, ntok, sc) per document. */
  private[graft] def ablationFrom(obs: DataFrame, grp: String)
      : DataFrame = {
    val st = obs
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        sum(col("sc")).as("ssum"))
    val tot = st.agg(sum(col("n_docs")).as("td"),
      sum(col("n_tokens")).as("tt"), sum(col("ssum")).as("ts"))
    st.crossJoin(broadcast(tot))
      .select(col(grp), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000 div tt").as("share_permille"),
        expr("ts * 1000 div td").as("mean_q_all_micro"),
        expr("""CASE WHEN td > n_docs
                THEN (ts - ssum) * 1000 div (td - n_docs)
                ELSE 0 END""").as("mean_q_without_micro"))
      .withColumn("delta_micro",
        col("mean_q_without_micro") - col("mean_q_all_micro"))
      .orderBy(col(grp))
  }

  // ---------------------------------------------------------------
  // q_eval_bootstrap — deterministic resample CI
  // ---------------------------------------------------------------

  /** Deterministic bootstrap CI for the per-source quality mean
    * (Efron 1979): B = 32 resamples; each document's weight in
    * replicate b is a Poisson(1) APPROXIMATION drawn from the 60-bit
    * md5 bridge (u = h mod 1000; w = 0/1/2/3 at the 368/736/920
    * cumulative cuts — the declared pmf); replicate mean =
    * Σ w·score div Σ w; the interval is the 2nd and 31st order
    * statistic of the 32 replicate means (the declared ~90% band).
    * Same hash → same resamples forever — CI deltas across runs are
    * real changes, not reseeding noise.
    *
    * Scale: docs collapse to (source, doc, score) once; the ×32
    * replicate fan-out is map-side partial-aggregated to
    * |sources|×32 rows before any shuffle; order stats run on the
    * 32-element per-source array. */
  val qEvalBootstrap: Q = (s, dir) =>
    bootstrapFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source").as("grp"),
        expr(scoreExpr).as("sc")), "grp")
      .withColumnRenamed("grp", "source")

  /** The CI behind [[qEvalBootstrap]] and `Graft.bootstrapCI`:
    * `d` = (doc_id, grp, sc) with integer scores. */
  private[graft] def bootstrapFrom(d0: DataFrame, grp: String)
      : DataFrame = {
    // persisted: the scored projection feeds BOTH the x32 replicate
    // fan-out and the point-estimate aggregate — unpersisted, a 100 TB
    // corpus would be scanned (and scored) twice
    val d = graft.CacheScope.track(d0.withColumnRenamed(grp, "source")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rep = d.select(col("doc_id"), col("source"), col("sc"),
        explode(expr("sequence(0, 31)")).as("b"))
      .withColumn("u", expr(
        """pmod(CAST(conv(substring(md5(concat(doc_id, '_', b)), 1, 15),
           16, 10) AS BIGINT), 1000)"""))
      .withColumn("w", expr(
        """CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
           WHEN u < 920 THEN 2 ELSE 3 END"""))
      .groupBy(col("source"), col("b"))
      .agg(sum(col("w") * col("sc")).as("ws"), sum(col("w")).as("wn"))
      .withColumn("m", expr(
        "CASE WHEN wn > 0 THEN ws * 1000 div wn ELSE 0 END"))
    val point = d.groupBy(col("source"))
      .agg(expr("sum(sc) * 1000 div count(1)").as("mean_micro"))
    rep.groupBy(col("source"))
      .agg(expr("array_sort(collect_list(m))").as("ms"))
      .select(col("source"),
        element_at(col("ms"), 2).as("lo_micro"),
        element_at(col("ms"), 31).as("hi_micro"))
      .join(point, "source")
      .select(col("source"), col("mean_micro"), col("lo_micro"),
        col("hi_micro"))
      .orderBy(col("source"))
      .withColumnRenamed("source", grp)
  }

  // ---------------------------------------------------------------
  // q_drift_length — two-snapshot KS drift monitor
  // ---------------------------------------------------------------

  /** Kolmogorov–Smirnov drift on the token-length distribution
    * between two corpus snapshots (the declared split is the md5
    * PARITY of the doc id — the 60-bit bridge, NOT raw id parity:
    * fixture ids correlate parity with source, leaving one half
    * empty; a content-hash split never does): per source, D = max
    * over lengths of |cdfA − cdfB| computed by integer
    * cross-multiplication (|cumA·nB − cumB·nA| over the
    * value-granular length histogram), reported in permille with the
    * argmax length (ties: lowest). A group missing one whole
    * snapshot reports the declared maximum D = 1000. A spiking D is
    * the data-changed-under-you tripwire.
    *
    * Scale: docs collapse to the (source, len, half) histogram in
    * one scan; the CDF windows run over that dictionary-sized frame
    * only. */
  val qDriftLength: Q = (s, dir) =>
    ksDriftFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"),
        size(split(col("text"), " ")).cast("long").as("len"),
        (expr("""pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)),
           1, 15), 16, 10) AS BIGINT), 2)""") === 0).cast("long")
          .as("a")), "grp")
      .withColumnRenamed("grp", "source")

  /** The monitor behind [[qDriftLength]] and `Graft.ksDrift`:
    * `obs` = (grp, len, a) — a = 1 for the A snapshot. */
  private[graft] def ksDriftFrom(obs: DataFrame, grp: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = obs.withColumnRenamed(grp, "source")
      .groupBy(col("source"), col("len"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val w = Window.partitionBy(col("source")).orderBy(col("len"))
    val tw = Window.partitionBy(col("source"))
    val cum = h
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(tw))
      .withColumn("nb", sum(col("cb")).over(tw))
      .withColumn("d", abs(col("cuma") * col("nb") -
        col("cumb") * col("na")))
    cum.withColumn("dmax", max(col("d")).over(tw))
      .groupBy(col("source"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("d")).as("dm"),
        min(when(col("d") === col("dmax"), col("len"))).as("at_len"))
      .select(col("source"), col("n_a"), col("n_b"),
        // a group with one snapshot entirely absent is maximally
        // drifted by declaration (sup|cdfA − cdfB| = 1)
        expr("""CASE WHEN n_a * n_b > 0
                THEN dm * 1000 div (n_a * n_b) ELSE 1000 END""")
          .as("d_permille"),
        col("at_len"))
      .orderBy(col("source"))
      .withColumnRenamed("source", grp)
  }

  val queries: Map[String, Q] = Map(
    "q_mix_ablation" -> qMixAblation,
    "q_eval_bootstrap" -> qEvalBootstrap,
    "q_drift_length" -> qDriftLength)

  val oracle: Map[String, String] = Map(
    "q_mix_ablation" -> s"""
      WITH st AS (SELECT source, count(*) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
          CAST(sum(${scoreSql("text")}) AS BIGINT) AS ssum
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                CAST(sum(n_tokens) AS BIGINT) AS tt,
                CAST(sum(ssum) AS BIGINT) AS ts
              FROM st)
      SELECT source, n_docs, n_tokens,
        CAST(n_tokens * 1000 // tt AS BIGINT) AS share_permille,
        CAST(ts * 1000 // td AS BIGINT) AS mean_q_all_micro,
        CAST(CASE WHEN td > n_docs
             THEN (ts - ssum) * 1000 // (td - n_docs)
             ELSE 0 END AS BIGINT) AS mean_q_without_micro,
        CAST(CASE WHEN td > n_docs
             THEN (ts - ssum) * 1000 // (td - n_docs)
             ELSE 0 END - ts * 1000 // td AS BIGINT) AS delta_micro
      FROM st CROSS JOIN tot ORDER BY source""",
    "q_eval_bootstrap" -> s"""
      WITH d AS MATERIALIZED (
        SELECT doc_id, source,
          CAST(${scoreSql("text")} AS BIGINT) AS sc
        FROM documents),
      rep AS (SELECT source, b,
          CAST(sum(w * sc) AS BIGINT) AS ws, CAST(sum(w) AS BIGINT) AS wn
        FROM (
          SELECT source, sc, b,
            CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
                 WHEN u < 920 THEN 2 ELSE 3 END AS w
          FROM (
            SELECT d.source, d.sc, t.b,
              CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)
                || '_' || CAST(t.b AS VARCHAR)), 1, 15) AS BIGINT)
                % 1000 AS u
            FROM d, unnest(range(0, 32)) t(b)) i) j
        GROUP BY source, b),
      ms AS (SELECT source,
               CASE WHEN wn > 0 THEN ws * 1000 // wn ELSE 0 END AS m,
               row_number() OVER (PARTITION BY source
                 ORDER BY CASE WHEN wn > 0 THEN ws * 1000 // wn
                          ELSE 0 END) AS rk
             FROM rep),
      pt AS (SELECT source,
               CAST(sum(sc) * 1000 // count(*) AS BIGINT) AS mean_micro
             FROM d GROUP BY source)
      SELECT pt.source, pt.mean_micro,
        CAST((SELECT m FROM ms WHERE ms.source = pt.source AND rk = 2)
          AS BIGINT) AS lo_micro,
        CAST((SELECT m FROM ms WHERE ms.source = pt.source AND rk = 31)
          AS BIGINT) AS hi_micro
      FROM pt ORDER BY pt.source""",
    "q_drift_length" -> """
      WITH hsplit AS (SELECT source, text,
          CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) % 2 AS par
        FROM documents),
      h AS (SELECT source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
          CAST(sum(CASE WHEN par = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN par = 0 THEN 0 ELSE 1 END)
            AS BIGINT) AS cb
        FROM hsplit GROUP BY 1, 2),
      cum AS (SELECT source, len,
          sum(ca) OVER (PARTITION BY source ORDER BY len) AS cuma,
          sum(cb) OVER (PARTITION BY source ORDER BY len) AS cumb,
          sum(ca) OVER (PARTITION BY source) AS na,
          sum(cb) OVER (PARTITION BY source) AS nb
        FROM h),
      dd AS (SELECT source, len, na, nb,
               abs(cuma * nb - cumb * na) AS d
             FROM cum),
      mx AS (SELECT source, max(d) AS dmax FROM dd GROUP BY source)
      SELECT dd.source, CAST(max(dd.na) AS BIGINT) AS n_a,
        CAST(max(dd.nb) AS BIGINT) AS n_b,
        CAST(CASE WHEN max(dd.na) * max(dd.nb) > 0
             THEN max(dd.d) * 1000 // (max(dd.na) * max(dd.nb))
             ELSE 1000 END AS BIGINT) AS d_permille,
        CAST(min(CASE WHEN dd.d = mx.dmax THEN dd.len END) AS BIGINT)
          AS at_len
      FROM dd JOIN mx ON dd.source = mx.source
      GROUP BY dd.source ORDER BY dd.source""")
}
