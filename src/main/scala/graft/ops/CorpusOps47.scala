package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus + similarity operators, r15 wave 36 (SURVEY.md §2.M):
  * the multi-round Lloyd k-means training loop (Lloyd 1982 — the
  * composition whose single iteration is `q_sim_kmeans_step`), the
  * CCNet per-language perplexity head/middle/tail cut (Wenzek et al.
  * LREC 2020), soft deduplication by inverse duplicate-cluster-size
  * reweighting (the SoftDeDup idea — down-weight instead of delete),
  * the staged filter→dedup attrition waterfall every datacard opens
  * with, a sign-matrix Johnson–Lindenstrauss random projection with
  * its distortion audit (Achlioptas 2003), a quality-threshold
  * attrition sweep (the FineWeb-Edu-style "pick the cut before you
  * commit" table), and the multi-width exact-substring duplication
  * spectrum (Lee et al. ACL 2022 at L ∈ {4, 8, 16}).
  *
  * Determinism contract: exact int64/DECIMAL(38,0) arithmetic with
  * positive-remainder floored division at declared points; IEEE
  * doubles only from identical expression trees in both engines
  * (cosines over exact integer dots) with rank-deterministic
  * tie-breaks.
  */
object CorpusOps47 {

  // ---------------------------------------------------------------
  // q_sim_kmeans_train — multi-round Lloyd loop
  // ---------------------------------------------------------------

  /** Full k-means (Lloyd) TRAINING loop — the composition whose single
    * iteration is `q_sim_kmeans_step`: seed centroids from the K
    * lowest vec_ids, then `rounds` rounds of assign-by-cosine →
    * recompute centroids, emitting per round the cluster census
    * (round, cid, n, moved, min_vec).
    *
    * Centroids are FLOORED ELEMENT-WISE MEANS, (sum − pmod(sum, n))
    * div n per component — unlike the single step's integer-sum
    * centroid (fine for one round), a multi-round loop must keep
    * centroid magnitudes corpus-invariant: sum-vectors grow with
    * cluster size, and by round 2 a centroid-norm dot would overflow
    * int64 past ~3e3 same-signed members. The floored mean stays in
    * the component range of the data forever, at any corpus size, and
    * the positive-remainder floor makes both engines compute the same
    * integer for negative sums (Spark `div` truncates, DuckDB `//`
    * floors — subtracting pmod first makes the division exact, so
    * truncation semantics never matter).
    *
    * Scale: each round is one corpus scan against a K-row broadcast
    * literal (no vector-table shuffle); the centroid update is a
    * posexplode + two-level partial agg to K×d rows, collected as a
    * K-bounded driver action (the rebalance's bounded-scalar
    * scheduler discipline — the plan stays LINEAR in rounds because
    * every round's assignment reads the persisted base + a literal,
    * never the previous round's plan). Zero-norm centroids retire
    * (cn2 > 0 guard, both engines). */
  // k pinned to 16 — the oracle's kmRoundSql replays the 16-lowest-id
  // seeding literally, so the declared query must NOT read the
  // `spark.graft.ivf.cells` conf (ADVICE r15: a non-default conf would
  // silently diverge from the oracle instead of being rejected). The
  // conf knob and the facade's auto-K serve the bench/production
  // paths only.
  val qSimKmeansTrain: Q = (s, dir) =>
    kmeansTrainFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")),
      k = 16, rounds = 3)

  /** The training loop behind [[qSimKmeansTrain]] and
    * `Graft.kmeansTrain`: `emb0` = (vec_id, q), q micro-quantized
    * int64. `k = 0` derives the cell count from the corpus size via
    * [[Similarity.resolveCells]] (the facade auto-K path — cell size
    * stays bounded as the corpus grows). */
  private[graft] def kmeansTrainFrom(emb0: DataFrame, k: Int,
      rounds: Int): DataFrame =
    kmeansLoop(emb0, k, rounds)._1

  /** The final trained centroids (cid, components) of the Lloyd loop —
    * the bounded artifact the r16 retrain-recall audit probes against
    * (CorpusOps54). */
  private[graft] def kmeansCentroids(emb0: DataFrame, k: Int,
      rounds: Int): Seq[(Long, Seq[Long])] =
    kmeansLoop(emb0, k, rounds)._2

  private def kmeansLoop(emb0: DataFrame, k: Int,
      rounds: Int): (DataFrame, Seq[(Long, Seq[Long])]) = {
    val s = emb0.sparkSession
    import s.implicits._
    val emb = graft.CacheScope.track(emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val kk = if (k == 0) Similarity.resolveCells(s, emb.count()) else k

    def centFrame(rows: Seq[(Long, Seq[Long])]): DataFrame =
      rows.toDF("cid", "cq")
        .withColumn("cn2", EmbQuant.dotq(col("cq"), col("cq")))
        .filter(col("cn2") > 0) // zero-norm centroids retire
    // K-bounded driver fetch: the seed centroids ARE the K lowest ids —
    // a TakeOrdered top-k, NOT a `vec_id < k` filter (ADVICE r15: ids
    // need not be dense from 0; a frame whose ids all exceed k would
    // otherwise seed nothing and return an empty census). On dense
    // 0-based ids (every fixture) the two are identical, so the
    // oracle's `WHERE vec_id < 16` seed stays value-equal.
    val seeds: Seq[(Long, Seq[Long])] = emb
      .select(col("vec_id"), col("q")).orderBy(col("vec_id")).limit(kk)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    require(seeds.nonEmpty, "kmeansTrain: no vectors to seed from")

    // assignments are NARROW (vec_id, cid) — the vector column never
    // rides the cached round state (a 100 TB corpus would otherwise
    // pin rounds × |corpus| × d of vector bytes); the centroid update
    // re-joins the one persisted vector frame instead
    def assignTo(cents: DataFrame): DataFrame =
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (EmbQuant.dotq(col("q"), col("cq")).cast("double") /
            (sqrt(col("n2").cast("double")) *
              sqrt(col("cn2").cast("double")))).as("ccos"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid")))
          .as("cid"))

    var cents = centFrame(seeds)
    var centRows: Seq[(Long, Seq[Long])] = seeds
    var prev: DataFrame = null
    val parts = Seq.newBuilder[DataFrame]
    for (r <- 0 to rounds) {
      val a = graft.CacheScope.track(assignTo(cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val base = if (r == 0) a else prev
      parts += a
        .join(base.select(col("vec_id"), col("cid").as("pcid")), "vec_id")
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cid") =!= col("pcid"), 1L).otherwise(0L))
            .as("moved"),
          min(col("vec_id")).as("min_vec"))
        .select(lit(r.toLong).as("round"), col("cid"), col("n"),
          col("moved"), col("min_vec"))
      if (r < rounds) {
        // floored-mean centroid update: join the narrow assignment
        // back to the ONE persisted vector frame, posexplode to K×d
        // partial-agg rows, then a K-bounded collect so the next
        // round's plan is base+literal
        val next = a.join(emb.select(col("vec_id"), col("q")), "vec_id")
          .select(col("cid"), posexplode(col("q")))
          .groupBy(col("cid"), col("pos"))
          .agg(sum(col("col")).as("sm"), count(lit(1)).as("cnt"))
          .withColumn("cv", expr("(sm - pmod(sm, cnt)) div cnt"))
          .groupBy(col("cid"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(pos, cv))), x -> x.cv)")
            .as("cq"))
          .collect().toSeq
          .map(row => (row.getLong(0), row.getSeq[Long](1)))
          .sortBy(_._1)
        cents = centFrame(next)
        centRows = next
      }
      prev = a
    }
    // returned centroid rows mirror centFrame's zero-norm retirement
    // (BigInt check — sign-equivalent to the int64 dotq filter)
    (parts.result().reduce(_ unionAll _)
      .orderBy(col("round"), col("cid")),
      centRows.filter(_._2.map(x => BigInt(x) * BigInt(x)).sum > 0))
  }

  /** One unrolled Lloyd round for the q_sim_kmeans_train oracle:
    * centroid CTE c{r} (floored means of a{r−1} for r ≥ 1), norm +
    * score + assignment a{r}. MATERIALIZED keeps DuckDB from
    * re-evaluating shared rounds per consumer. */
  private[ops] def kmRoundSql(r: Int): String = {
    val cent =
      if (r == 0)
        s"""c0 AS MATERIALIZED (SELECT vec_id AS cid, i, v AS cv
              FROM e WHERE vec_id < 16)"""
      else
        s"""c$r AS MATERIALIZED (
              SELECT a.cid, e.i,
                CAST((sum(e.v) -
                       (((sum(e.v) % count(*)) + count(*)) % count(*)))
                     // count(*) AS BIGINT) AS cv
              FROM a${r - 1} a JOIN e ON e.vec_id = a.vec_id
              GROUP BY 1, 2)"""
    s"""$cent,
      cn$r AS (SELECT cid, CAST(sum(cv * cv) AS BIGINT) AS cn2
               FROM c$r GROUP BY cid),
      d$r AS (SELECT e.vec_id, c.cid,
                CAST(sum(e.v * c.cv) AS BIGINT) AS dot
              FROM e JOIN c$r c ON e.i = c.i GROUP BY 1, 2),
      a$r AS MATERIALIZED (
        SELECT d.vec_id, d.cid FROM d$r d
        JOIN n nv ON d.vec_id = nv.vec_id
        JOIN cn$r nc ON d.cid = nc.cid
        WHERE nc.cn2 > 0
        QUALIFY row_number() OVER (PARTITION BY d.vec_id
          ORDER BY CAST(d.dot AS DOUBLE) /
            (sqrt(CAST(nv.n2 AS DOUBLE)) *
             sqrt(CAST(nc.cn2 AS DOUBLE))) DESC, d.cid) = 1)"""
  }

  private def kmSummarySql(r: Int): String = {
    val prev = if (r == 0) 0 else r - 1
    s"""SELECT CAST($r AS BIGINT) AS round, CAST(a.cid AS BIGINT) AS cid,
         count(*) AS n,
         CAST(sum(CASE WHEN a.cid <> p.cid THEN 1 ELSE 0 END) AS BIGINT)
           AS moved,
         CAST(min(a.vec_id) AS BIGINT) AS min_vec
       FROM a$r a JOIN a$prev p ON a.vec_id = p.vec_id
       GROUP BY a.cid"""
  }

  // ---------------------------------------------------------------
  // q_text_ccnet_cut — per-language perplexity tercile partition
  // ---------------------------------------------------------------

  /** CCNet head/middle/tail cut (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC
    * 2020): train a per-LANGUAGE add-one bigram LM on the trusted
    * slice (source = 'src0' — CCNet's Wikipedia), score every other
    * document of that language in exact integer micro-bits (the
    * q_text_perplexity discipline), and split each language into
    * head/middle/tail at the perplexity terciles. The cut here is
    * VALUE-GRANULAR: the tercile boundaries are the smallest
    * per-bigram rates (`rate_nbits` = nll_micro · 1000 div n_bigrams,
    * nano-bits per bigram) whose cumulative doc count reaches
    * 1/3 and 2/3, and equal rates always share a bucket — the
    * deterministic (and shuffle-order-free) variant of ntile's
    * arbitrary tie splitting.
    *
    * Scale: the LM joins ride the `spark.graft.lm.broadcastTypeLimit`
    * measured-cardinality gate exactly like q_text_perplexity (bigram
    * TYPES grow with the corpus — Heaps' law). The tercile cut needs
    * NO per-language global sort: rates are integers in a bounded
    * range, so the cut points come from a (lang, rate_nbits) HISTOGRAM —
    * |langs| × |distinct rates| rows, window over the tiny frame,
    * |langs|-row broadcast back. Languages absent from the trusted
    * slice have no LM and are unscorable (inner join, declared). */
  val qTextCcnetCut: Q = (s, dir) =>
    ccnetCutFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        (col("source") === "src0").as("trusted")))

  /** The cut behind [[qTextCcnetCut]] and `Graft.ccnetCut`: `docs` =
    * (doc_id, lang, text, trusted) — trusted rows train the
    * per-language LM, untrusted rows are scored and terciled. */
  private[graft] def ccnetCutFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val bg = docs
      .select(col("doc_id"), col("lang"), col("trusted"),
        split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"), col("trusted"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                  i -> struct(element_at(t, i) as w1,
                              element_at(t, i + 1) as w2))"""))
          .otherwise(array())).as("b"))
      .select(col("doc_id"), col("lang"), col("trusted"),
        col("b.w1"), col("b.w2"))
    val c12 = graft.CacheScope.track(
      bg.filter(col("trusted"))
        .groupBy(col("lang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lmLimit = AutoBroadcast.limit(
      s, "spark.graft.lm.broadcastTypeLimit", 2000000L)
    val nTypes = c12.count()
    val c1 = c12.groupBy(col("lang"), col("w1"))
      .agg(sum(col("c12")).as("c1"))
    val v = docs.filter(col("trusted"))
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang")).agg(countDistinct(col("tok")).as("v"))
    val sc = bg.filter(!col("trusted"))
      .join(AutoBroadcast.gate(c12, nTypes, lmLimit),
        Seq("lang", "w1", "w2"), "left")
      .join(AutoBroadcast.gate(c1, nTypes, lmLimit),
        Seq("lang", "w1"), "left")
      .join(broadcast(v), Seq("lang")) // no reference LM -> unscorable
      .withColumn("bits_micro", expr(
        """cast(round(log2(coalesce(c1, 0) + v) * 1e6) as bigint)
           - cast(round(log2(coalesce(c12, 0) + 1) * 1e6) as bigint)"""))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("bits_micro")).as("nll_micro"),
        count(lit(1)).as("nb"))
      .withColumn("rate_nbits", expr("nll_micro * 1000 div nb"))
    val scored = graft.CacheScope.track(sc
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // value-granular tercile cut points from the small rate histogram
    val hw = Window.partitionBy(col("lang")).orderBy(col("rate_nbits"))
    val hist = scored.groupBy(col("lang"), col("rate_nbits"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(hw))
      .withColumn("tot", sum(col("c")).over(Window.partitionBy(col("lang"))))
    val cuts = hist.groupBy(col("lang"))
      .agg(min(when(col("cum") * 3 >= col("tot"), col("rate_nbits")))
        .as("cut1"),
        min(when(col("cum") * 3 >= col("tot") * 2, col("rate_nbits")))
          .as("cut2"))
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("rate_nbits") <= col("cut1"), "head")
          .when(col("rate_nbits") <= col("cut2"), "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("n_bigrams"),
        min(col("rate_nbits")).as("min_rate_nbits"),
        max(col("rate_nbits")).as("max_rate_nbits"))
      .orderBy(col("lang"), col("bucket"))
  }

  // ---------------------------------------------------------------
  // q_mix_softdedup — inverse-cluster-size reweighting
  // ---------------------------------------------------------------

  /** Soft deduplication: instead of DELETING exact duplicates, keep
    * them all and down-weight each copy by 1/cluster-size (weight
    * in exact micro units, 1e6 div copies) — the "soft dedup" /
    * sampling-without-removal idea (cf. SoftDeDup; also the D4 /
    * SlimPajama practice of reweighting over hard-cutting). Reports
    * per source the raw vs effective token mass — the mixture table a
    * sampler consumes directly.
    *
    * Scale: one scan to (source, fp, ntok); the cluster-size table
    * GROWS with the corpus, so the join back is co-partitioned on the
    * md5 fingerprint — never broadcast. The effective mass is summed
    * in DECIMAL(38,0) (token_count × 1e6 exceeds int64 at ~9e12
    * corpus tokens — real at 100 TB) and floored to milli-tokens. */
  val qMixSoftdedup: Q = (s, dir) =>
    softdedupFrom(Tables(s, dir, "documents")
      .select(col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The reweighting behind [[qMixSoftdedup]] and
    * `Graft.softdedupWeights`: `docs` = (grp, text). */
  private[graft] def softdedupFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val d = docs.select(col(grp), md5(col("text")).as("fp"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val cl = d.groupBy(col("fp")).agg(count(lit(1)).as("copies"))
    d.join(cl, Seq("fp")) // co-partitioned: cluster table grows with corpus
      .withColumn("w_micro", expr("1000000 div copies"))
      .groupBy(col(grp))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("copies") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(col("ntok")).as("raw_tokens"),
        expr("""CAST(sum(CAST(ntok * w_micro AS DECIMAL(38, 0)))
                DIV 1000 AS BIGINT)""").as("eff_tokens_milli"))
      .orderBy(col(grp))
  }

  // ---------------------------------------------------------------
  // q_pipeline_attrition — staged filter→dedup waterfall
  // ---------------------------------------------------------------

  /** The attrition waterfall every datacard opens with: stage 0 = the
    * raw corpus, stage 1 = documents passing ALL four Gopher A1.1
    * rules (the same battery as q_text_gopher_rules — shared code,
    * not a re-statement), stage 2 = stage-1 survivors after
    * exact-duplicate removal keeping the lowest doc_id per md5
    * cluster. Reports (stage, source, n_docs, n_tokens) — the
    * how-much-survives-each-gate table an owner signs off on before
    * committing a pipeline run.
    *
    * Scale: ONE persisted per-doc flags scan feeds all three stages;
    * the dedup stage shuffles only the stage-1 survivors on the
    * fingerprint (keep-first = min-doc_id window, co-partitioned);
    * each stage aggregate is |sources| rows. */
  val qPipelineAttrition: Q = (s, dir) =>
    attritionFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("source").as("grp"), col("text")), "grp")
      .withColumnRenamed("grp", "source")

  /** The waterfall behind [[qPipelineAttrition]] and
    * `Graft.attritionWaterfall`: `docs` = (doc_id, grp, text). */
  private[graft] def attritionFrom(docs: DataFrame, grp: String)
      : DataFrame = {
    val flags = graft.CacheScope.track(
      CorpusOps46.gopherFlagged(docs, Seq("doc_id", grp, "text"))
        .select(col("doc_id"), col(grp), md5(col("text")).as("fp"),
          col("nw"), col("r_all"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def rollup(df: DataFrame, stage: Int): DataFrame =
      df.groupBy(col(grp))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"))
        .select(lit(stage.toLong).as("stage"), col(grp), col("n_docs"),
          col("n_tokens"))
    val pass = flags.filter(col("r_all") === 1)
    val kept = pass.withColumn("rk",
      row_number().over(Window.partitionBy(col("fp"))
        .orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    rollup(flags, 0).unionAll(rollup(pass, 1)).unionAll(rollup(kept, 2))
      .orderBy(col("stage"), col(grp))
  }

  // ---------------------------------------------------------------
  // q_emb_rp — JL sign random projection + distortion audit
  // ---------------------------------------------------------------

  /** The ±1 sign matrix for the Johnson–Lindenstrauss projection,
    * [target dim j][source dim i], derived once from MD5("i_j") at
    * class-init and embedded as LITERALS in both engines — the
    * projection is data-independent, so neither engine hashes at
    * runtime. */
  private[graft] val rpSigns: Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 8).map(j => (1 to 64).map { i =>
      if ((md.digest(s"${i}_$j".getBytes("UTF-8"))(0) & 1) == 0) 1L
      else -1L
    })
  }

  /** Johnson–Lindenstrauss random projection, database-friendly form
    * (Achlioptas, "Database-friendly random projections", JCSS 2003):
    * project the 64-d embeddings to 8 dimensions through a fixed ±1
    * sign matrix (y_j = Σ_i s_ij · x_i — exact int64 on the
    * micro-quantized components), then audit the distance distortion
    * the way JL promises it: for every pair among the 50 lowest-id
    * vectors, ratio = ‖ya − yb‖² · 1000 / (8 · ‖xa − xb‖²) in exact
    * DECIMAL(38,0) cross-multiplication (1000 ≈ no distortion),
    * histogrammed in 0.1-wide buckets. The output is the
    * concentration evidence a pipeline reads before swapping the full
    * vectors for the sketch in a coarse filter.
    *
    * Scale: the projection is a pure map-side transform of the corpus
    * (8 exact dots per row against literal sign vectors — Catalyst
    * prunes it to the audited rows here, but the same expression IS
    * the production projector); the audit touches only the bounded
    * query set (50 vectors, 1225 pairs, broadcast both sides).
    * Identical vectors (orig d² = 0, ratio undefined) are excluded,
    * declared. */
  val qEmbRp: Q = (s, dir) => {
    val emb = EmbQuant.quantized(s, dir)
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .withColumn("p", array(rpSigns.map(sj =>
        EmbQuant.dotq(col("q"), typedLit(sj))): _*))
      .filter(col("vec_id") < 50)
    val a = emb.select(col("vec_id").as("ida"), col("q").as("qa"),
      col("n2").as("n2a"), col("p").as("pa"))
    val b = emb.select(col("vec_id").as("idb"), col("q").as("qb"),
      col("n2").as("n2b"), col("p").as("pb"))
    a.join(broadcast(b), col("ida") < col("idb"))
      .withColumn("od2",
        col("n2a") + col("n2b") -
          lit(2L) * EmbQuant.dotq(col("qa"), col("qb")))
      .withColumn("pd2", expr(
        """aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)),
           CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .filter(col("od2") > 0)
      .withColumn("ratio_permille", expr(
        """CAST(CAST(pd2 AS DECIMAL(38, 0)) * 1000
           DIV (CAST(od2 AS DECIMAL(38, 0)) * 8) AS BIGINT)"""))
      .withColumn("bucket", least(expr("ratio_permille div 100"), lit(19L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ratio_permille")).as("min_ratio"),
        max(col("ratio_permille")).as("max_ratio"))
      .orderBy(col("bucket"))
  }

  /** The sign matrix as a 512-row VALUES list for the DuckDB oracle. */
  private def rpSignValuesSql: String =
    (0 until 8).flatMap(j => (1 to 64).map(i =>
      s"($i, $j, ${rpSigns(j)(i - 1)})")).mkString(", ")

  // ---------------------------------------------------------------
  // q_select_threshold_sweep — quality-threshold attrition sweep
  // ---------------------------------------------------------------

  /** Quality-threshold attrition sweep — the FineWeb-Edu-style "pick
    * the classifier cut before you commit" table: score every
    * document on the q_text_quality axes rendered as EXACT integer
    * milli-units (uniq-token, stopword, punctuation and digit
    * permilles, combined with the same 5/3/1/1 weights), then report
    * docs and tokens kept at thresholds 0, 100, …, 900.
    *
    * Scale: ONE corpus scan to a ≤10-row score-bucket histogram
    * (bucket = score div 100, capped at 9 — a score of exactly 1000
    * folds into the top bucket); the sweep is a literal 10-row
    * threshold frame joined against the tiny histogram — never a
    * 10× fan-out of the corpus. Monotone non-increasing in the
    * threshold by construction (spec-pinned). */
  val qSelectThresholdSweep: Q = (s, dir) =>
    thresholdSweepFrom(Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")))

  /** The sweep behind [[qSelectThresholdSweep]] and
    * `Graft.qualityThresholdSweep`: `docs` must carry `text`. */
  private[graft] def thresholdSweepFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val stopList = TextAnalysis.stopwords("en")
      .map(w => s"'$w'").mkString(", ")
    val scored = docs
      .select(length(col("text")).cast("long").as("nc"),
        split(col("text"), " ").as("t"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("long").as("punct"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("digits"))
      .select(col("nc"), col("punct"), col("digits"),
        size(col("t")).cast("long").as("ntok"),
        size(array_distinct(col("t"))).cast("long").as("uniq"),
        expr(s"size(filter(t, w -> w IN ($stopList)))").cast("long")
          .as("stop"))
      // greatest(_, 1) guards the degenerate empty-doc case the SAME
      // way in both engines (Spark div-by-zero nulls, DuckDB errors —
      // a silent cross-engine divergence otherwise); no fixture doc
      // is empty, so shipped values are unchanged
      .withColumn("score_milli", expr(
        """(5 * (uniq * 1000 div greatest(ntok, 1))
           + 3 * (stop * 1000 div greatest(ntok, 1))
           + (1000 - punct * 1000 div greatest(nc, 1))
           + (1000 - digits * 1000 div greatest(nc, 1))) div 10"""))
      .withColumn("b", least(expr("score_milli div 100"), lit(9L)))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("d"), sum(col("ntok")).as("tk"))
    val th = s.range(10).select((col("id") * 100L).as("threshold"))
    th.join(scored, col("b") * 100L >= col("threshold"), "left")
      .groupBy(col("threshold"))
      .agg(coalesce(sum(col("d")), lit(0L)).as("docs_kept"),
        coalesce(sum(col("tk")), lit(0L)).as("tokens_kept"))
      .orderBy(col("threshold"))
  }

  // ---------------------------------------------------------------
  // q_dedup_dup_spectrum — multi-width duplication spectrum
  // ---------------------------------------------------------------

  /** Exact-substring duplication SPECTRUM (Lee et al. ACL 2022 at
    * three window widths): the corpus-level rollup of
    * q_dedup_substring's per-doc profile at L ∈ {4, 8, 16} — how much
    * of the corpus is covered by a duplicated L-token window, per L.
    * Coverage is monotone NON-INCREASING in L (every position covered
    * by a duplicated 16-window lies inside one of its duplicated
    * 8-subwindows — substrings of a repeat repeat), pinned in
    * Wave36Spec; the spread between the L rows is the
    * boilerplate-vs-verbatim signal that picks the production window
    * width before the destructive cut.
    *
    * Scale: three passes of the q_dedup_substring shape (one gram per
    * token position per width, ≥2 filter + semi-join co-partitioned
    * on the gram hash, never broadcast); widths share no keys, so a
    * fused single-scan variant would move the same volume in one
    * 3×-fan-out stage — pass-per-width keeps peak shuffle flat. */
  val qDedupDupSpectrum: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    Seq(4, 8, 16).map { l =>
      CorpusOps46.substringProfileFrom(docs, l)
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("dup_tokens") > 0, 1L).otherwise(0L))
            .as("n_docs_hit"),
          sum(col("dup_tokens")).as("dup_tokens"),
          sum(col("n_tokens")).as("total_tokens"))
        .select(lit(l.toLong).as("win_l"), col("n_docs"),
          col("n_docs_hit"), col("dup_tokens"), col("total_tokens"),
          expr("dup_tokens * 1000 div total_tokens").as("dup_permille"))
    }.reduce(_ unionAll _).orderBy(col("win_l"))
  }

  /** One width's aggregated profile for the spectrum oracle —
    * parameterized twin of the q_dedup_substring SQL. */
  private def spectrumSql(l: Int): String = s"""
    SELECT CAST($l AS BIGINT) AS win_l,
      count(*) AS n_docs,
      CAST(sum(CASE WHEN dup_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_docs_hit,
      CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens,
      CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      CAST(sum(dup_tokens) * 1000 // sum(n_tokens) AS BIGINT)
        AS dup_permille
    FROM (
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a
                    FROM documents),
      g AS (SELECT doc_id, i AS pos,
              CAST('0x' || substring(md5(
                list_aggr(a[i:i+${l - 1}], 'string_agg', ' ')), 1, 15)
                AS BIGINT) AS h
            FROM (SELECT *, unnest(range(1, len(a) - ${l - 2})) AS i
                  FROM toks)
            WHERE len(a) >= $l),
      dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
      dp AS (SELECT doc_id, pos,
               lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
             FROM g WHERE h IN (SELECT h FROM dup)),
      cov AS (SELECT doc_id,
                CAST(sum(least($l, coalesce(nxt - pos, $l))) AS BIGINT)
                  AS dup
              FROM dp GROUP BY doc_id),
      n AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens FROM toks)
      SELECT n.doc_id, n.n_tokens, coalesce(cov.dup, 0) AS dup_tokens
      FROM n LEFT JOIN cov ON n.doc_id = cov.doc_id)"""

  // ---------------------------------------------------------------
  // registration
  // ---------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_sim_kmeans_train" -> qSimKmeansTrain,
    "q_text_ccnet_cut" -> qTextCcnetCut,
    "q_mix_softdedup" -> qMixSoftdedup,
    "q_pipeline_attrition" -> qPipelineAttrition,
    "q_emb_rp" -> qEmbRp,
    "q_select_threshold_sweep" -> qSelectThresholdSweep,
    "q_dedup_dup_spectrum" -> qDedupDupSpectrum)

  private[graft] val gopherFlagsSql = """
    SELECT doc_id, source, text,
      CAST(len(a) AS BIGINT) AS nw,
      (CASE WHEN len(a) >= 50 THEN 1 ELSE 0 END) *
      (CASE WHEN list_sum(list_transform(a, w -> length(w))) >= len(a) * 3
             AND list_sum(list_transform(a, w -> length(w))) <= len(a) * 10
            THEN 1 ELSE 0 END) *
      (CASE WHEN len(list_filter(a, w -> w IN ('the','a','and','of',
          'to','in','is','le','la','et','de','les','un','der','die',
          'und','das','ein','ist','el','los','y','que','en'))) >= 2
            THEN 1 ELSE 0 END) *
      (CASE WHEN len(list_filter(a, w ->
          regexp_matches(w, '[a-zA-Z]'))) * 1000 >= len(a) * 800
            THEN 1 ELSE 0 END) AS r_all
    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS a
          FROM documents)"""

  val oracle: Map[String, String] = Map(
    "q_sim_kmeans_train" -> s"""
      WITH e AS MATERIALIZED (${Similarity.quantSql}),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
                         FROM e GROUP BY vec_id),
      ${(0 to 3).map(kmRoundSql).mkString(",\n")}
      SELECT round, cid, n, moved, min_vec FROM (
        ${(0 to 3).map(kmSummarySql).mkString(" UNION ALL ")})
      ORDER BY round, cid""",
    "q_text_ccnet_cut" -> """
      WITH toks AS (SELECT doc_id, lang, source,
                      string_split(text, ' ') AS t
                    FROM documents),
      bg AS (SELECT doc_id, lang, source, t[i] AS w1, t[i + 1] AS w2
             FROM (SELECT *, unnest(range(1, len(t))) AS i FROM toks)),
      c12 AS (SELECT lang, w1, w2, count(*) AS c12 FROM bg
              WHERE source = 'src0' GROUP BY 1, 2, 3),
      c1 AS (SELECT lang, w1, sum(c12) AS c1 FROM c12 GROUP BY 1, 2),
      v AS (SELECT lang, count(DISTINCT u.tok) AS v
            FROM (SELECT lang, unnest(t) AS tok FROM toks
                  WHERE source = 'src0') u GROUP BY lang),
      sc AS MATERIALIZED (SELECT doc_id, bg.lang,
               CAST(sum(
                 CAST(round(log2(coalesce(c1, 0) + v) * 1e6) AS BIGINT)
                 - CAST(round(log2(coalesce(c12, 0) + 1) * 1e6)
                     AS BIGINT)) AS BIGINT) AS nll_micro,
               count(*) AS nb
             FROM bg LEFT JOIN c12 USING (lang, w1, w2)
                     LEFT JOIN c1 USING (lang, w1)
                     JOIN v ON bg.lang = v.lang
             WHERE source <> 'src0' GROUP BY 1, 2),
      r AS MATERIALIZED (SELECT *, nll_micro * 1000 // nb AS rate_nbits
                         FROM sc),
      hist AS (SELECT lang, rate_nbits, count(*) AS c FROM r GROUP BY 1, 2),
      cum AS (SELECT lang, rate_nbits,
                sum(c) OVER (PARTITION BY lang ORDER BY rate_nbits) AS cum,
                sum(c) OVER (PARTITION BY lang) AS tot
              FROM hist),
      cuts AS (SELECT lang,
                 min(CASE WHEN cum * 3 >= tot THEN rate_nbits END) AS cut1,
                 min(CASE WHEN cum * 3 >= tot * 2 THEN rate_nbits END) AS cut2
               FROM cum GROUP BY lang)
      SELECT r.lang AS lang,
        CASE WHEN rate_nbits <= cut1 THEN 'head'
             WHEN rate_nbits <= cut2 THEN 'middle'
             ELSE 'tail' END AS bucket,
        count(*) AS n_docs, CAST(sum(nb) AS BIGINT) AS n_bigrams,
        CAST(min(rate_nbits) AS BIGINT) AS min_rate_nbits,
        CAST(max(rate_nbits) AS BIGINT) AS max_rate_nbits
      FROM r JOIN cuts ON r.lang = cuts.lang
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_mix_softdedup" -> """
      WITH d AS (SELECT source, md5(text) AS fp,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
                 FROM documents),
      cl AS (SELECT fp, count(*) AS copies FROM d GROUP BY fp)
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS dup_docs,
        CAST(sum(ntok) AS BIGINT) AS raw_tokens,
        CAST(sum(CAST(ntok * (1000000 // copies) AS HUGEINT)) // 1000
          AS BIGINT) AS eff_tokens_milli
      FROM d JOIN cl USING (fp)
      GROUP BY source ORDER BY source""",
    "q_pipeline_attrition" -> s"""
      WITH f AS MATERIALIZED ($gopherFlagsSql),
      pass AS MATERIALIZED (SELECT *, md5(text) AS fp FROM f
                            WHERE r_all = 1),
      kept AS (SELECT * FROM pass
               QUALIFY row_number() OVER (PARTITION BY fp
                 ORDER BY doc_id) = 1)
      SELECT stage, source, n_docs, n_tokens FROM (
        SELECT CAST(0 AS BIGINT) AS stage, source, count(*) AS n_docs,
          CAST(sum(nw) AS BIGINT) AS n_tokens FROM f GROUP BY source
        UNION ALL
        SELECT CAST(1 AS BIGINT), source, count(*),
          CAST(sum(nw) AS BIGINT) FROM pass GROUP BY source
        UNION ALL
        SELECT CAST(2 AS BIGINT), source, count(*),
          CAST(sum(nw) AS BIGINT) FROM kept GROUP BY source)
      ORDER BY stage, source""",
    "q_emb_rp" -> s"""
      WITH e AS MATERIALIZED (
        SELECT vec_id, r.i AS i,
          CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000) AS BIGINT)
            AS v
        FROM embeddings, range(1, 65) r(i) WHERE vec_id < 50),
      sm AS (SELECT * FROM (VALUES $rpSignValuesSql) t(i, j, sgn)),
      p AS MATERIALIZED (SELECT e.vec_id, sm.j,
             CAST(sum(e.v * sm.sgn) AS BIGINT) AS p
           FROM e JOIN sm ON sm.i = e.i GROUP BY 1, 2),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      dots AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      od AS (SELECT ida, idb, na.n2 + nb.n2 - 2 * dot AS od2
             FROM dots JOIN n na ON ida = na.vec_id
                       JOIN n nb ON idb = nb.vec_id),
      pd AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
               CAST(sum((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS pd2
             FROM p a JOIN p b ON a.vec_id < b.vec_id AND a.j = b.j
             GROUP BY 1, 2),
      rt AS (SELECT od.ida, od.idb,
               CAST((CAST(pd2 AS HUGEINT) * 1000) //
                 (CAST(od2 AS HUGEINT) * 8) AS BIGINT) AS ratio_permille
             FROM od JOIN pd ON od.ida = pd.ida AND od.idb = pd.idb
             WHERE od2 > 0)
      SELECT CAST(least(ratio_permille // 100, 19) AS BIGINT) AS bucket,
        count(*) AS n_pairs,
        CAST(min(ratio_permille) AS BIGINT) AS min_ratio,
        CAST(max(ratio_permille) AS BIGINT) AS max_ratio
      FROM rt GROUP BY 1 ORDER BY bucket""",
    "q_select_threshold_sweep" -> s"""
      WITH d AS (SELECT
          CAST(length(text) AS BIGINT) AS nc,
          string_split(text, ' ') AS t,
          CAST(length(text) - length(regexp_replace(text,
            '[.,!?;:]', '', 'g')) AS BIGINT) AS punct,
          CAST(length(text) - length(regexp_replace(text,
            '[0-9]', '', 'g')) AS BIGINT) AS digits
        FROM documents),
      m AS (SELECT nc, punct, digits,
              CAST(len(t) AS BIGINT) AS ntok,
              CAST(len(list_distinct(t)) AS BIGINT) AS uniq,
              CAST(len(list_filter(t, w -> w IN (${TextAnalysis
                .stopwords("en").map(w => s"'$w'").mkString(", ")})))
                AS BIGINT) AS stop
            FROM d),
      sc AS (SELECT ntok,
               (5 * (uniq * 1000 // greatest(ntok, 1))
                + 3 * (stop * 1000 // greatest(ntok, 1))
                + (1000 - punct * 1000 // greatest(nc, 1))
                + (1000 - digits * 1000 // greatest(nc, 1))) // 10
                 AS score_milli
             FROM m),
      bk AS (SELECT least(score_milli // 100, 9) AS b,
               count(*) AS d, CAST(sum(ntok) AS BIGINT) AS tk
             FROM sc GROUP BY 1),
      th AS (SELECT unnest(range(0, 1000, 100)) AS threshold)
      SELECT CAST(threshold AS BIGINT) AS threshold,
        CAST(coalesce(sum(d), 0) AS BIGINT) AS docs_kept,
        CAST(coalesce(sum(tk), 0) AS BIGINT) AS tokens_kept
      FROM th LEFT JOIN bk ON bk.b * 100 >= th.threshold
      GROUP BY threshold ORDER BY threshold""",
    "q_dedup_dup_spectrum" -> s"""
      SELECT * FROM (
        ${Seq(4, 8, 16).map(spectrumSql).mkString(" UNION ALL ")})
      ORDER BY win_l""")
}
