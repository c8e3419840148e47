package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (north star /
  * SURVEY.md §2.M): brute-force cosine top-k as the exact baseline, a
  * threshold near-dup join, and a random-hyperplane LSH-bucketed ANN
  * variant as the 100 TB scale path.
  *
  * Published grounding: LSH for ANN — Indyk/Motwani, "Approximate nearest
  * neighbors: towards removing the curse of dimensionality" (STOC 1998);
  * random-hyperplane cosine sketches — Charikar (STOC 2002); multi-table
  * recall amplification per Gionis/Indyk/Motwani (VLDB 1999).
  *
  * Cross-engine float hazard: summing float products in double is
  * order-dependent at the last ulp, so both engines quantize each
  * component to round(x * 1e6) as int64 first — the dot product and
  * squared norms are then EXACT integer arithmetic (64 * (3e5)^2 ~ 6e12,
  * far under 2^63, and under 2^53 for the final double casts), and the
  * cosine double is bit-identical everywhere. This also halves the data
  * width vs float64 at scale.
  */
object Similarity {

  /** Per-JVM tag scoping stored index artifacts (see qSimIvfDelta):
    * concurrent verifies on one box never share a state path. */
  private val JvmTag: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Register a per-JVM scratch dir for deletion at JVM exit: the
    * UUID-tagged index paths are write-once-per-JVM, so without this
    * every verify/bench run would leave an orphan parquet dir under
    * java.io.tmpdir forever. One hook per distinct path. */
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def scratchDir(path: String): String = {
    if (scratchDirs.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rec(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rec))
          f.delete(): Unit
        }
        rec(new java.io.File(path))
      }))
    path
  }

  /** Quantized embedding: array<long> of round(x * 1e6) — the shared
    * contract lives in [[EmbQuant]] (ops package object). */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    EmbQuant.quantized(s, dir)

  private def dotq(a: Column, b: Column): Column = EmbQuant.dotq(a, b)

  /** IVF coarse-quantizer cell count — `spark.graft.ivf.cells`
    * (default 16, the fixed low-id seeding every DuckDB oracle
    * replays; the Verify harness refuses to run with this set). THE
    * production scale dial for the whole IVF family (VERDICT r14
    * item 2): cell-blocked costs — margin-mine's same-cell pair
    * stream, SemDeDup's blocks, the rebalance's hot-cell size — are
    * O(n²/K) in expectation, so K grows with the corpus (FAISS
    * guidance ~√n cells). Default 16 keeps every oracle hash stable;
    * StressBench measures the margin-mine pair stream flattening at
    * higher K on the 10× corpus. */
  private[graft] def ivfCells(s: SparkSession): Int = {
    val k = s.conf.getOption("spark.graft.ivf.cells")
      .map(_.toInt).getOrElse(16)
    require(k >= 2 && k <= 65536, s"spark.graft.ivf.cells=$k out of range")
    k
  }

  /** FACADE-layer cell-count resolution (VERDICT r15 item 1 — the
    * auto-derivation that finally TURNS the dial `ivfCells` only
    * exposes): an explicit `spark.graft.ivf.cells` always wins;
    * otherwise K = clamp(16, ceil(n / target), 65536) with `target` =
    * `spark.graft.ivf.targetCellSize` (default 256 vectors/cell).
    * Cell-blocked costs across the IVF family are O(Σ cell²) ≈ n²/K,
    * so holding CELL SIZE (not cell count) constant is what keeps the
    * pair streams linear-in-n at any corpus size — the FAISS ~√n
    * guidance lands in the same decade for the corpus sizes the bench
    * exercises. The 16 floor keeps every fixture SF (≤ 2000 vectors)
    * on the declared-query constant, so facade≡declared pins hold
    * bit-for-bit there; at the 10× stress corpus (20k vectors) this
    * derives K=79, reproducing the measured `+cells64` margin-mine win
    * (8.72× → 1.69× at 10×) without anyone setting a conf. Declared
    * `q_*` queries never call this — their oracles replay K=16
    * literally (`n` is by-name, so no count is spent when the explicit
    * conf short-circuits). */
  private[graft] def resolveCells(s: SparkSession, n: => Long,
      floor: Long = 16L, defaultTarget: Long = 256L): Int =
    s.conf.getOption("spark.graft.ivf.cells") match {
      case Some(v) =>
        val k = v.toInt
        require(k >= 2 && k <= 65536,
          s"spark.graft.ivf.cells=$k out of range")
        k
      case None =>
        val target = s.conf.getOption("spark.graft.ivf.targetCellSize")
          .map(_.toLong).getOrElse(defaultTarget)
        require(target >= 1L && target <= 100000000L,
          s"spark.graft.ivf.targetCellSize=$target out of range")
        math.min(65536L, math.max(floor, (n + target - 1L) / target))
          .toInt
    }

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("n2", dotq(col("q"), col("q")))

  /** Brute-force cosine top-5 neighbors for the first 10 query vectors.
    * The query side is broadcast; candidates stream — the shape that
    * scales to a 100 TB candidate set (one pass, no shuffle of
    * candidates; top-k via per-query window). */
  val qSimTopK: Q = (s, dir) => {
    val emb = withNorm(quantized(s, dir))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"), col("n2").as("qn2"))
    val scored = emb.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("neighbor"),
        (dotq(col("qv"), col("q")).cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** HARD-negative mining for embedding/retriever training (the
    * in-batch-negatives upgrade every dense-retrieval recipe ships —
    * Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020 §3.2):
    * for each query vector, the top-3 MOST similar candidates with a
    * DIFFERENT label — maximally confusable non-matches, the examples
    * a contrastive loss learns most from. Complements q_neg_sample
    * (hash-uniform RANDOM negatives): random negatives bound the
    * denominator, hard negatives sharpen the decision boundary.
    *
    * Scale: identical shape to [[qSimTopK]] — queries broadcast,
    * candidates stream map-side (one pass, no candidate shuffle), the
    * label filter rides the broadcast join condition, top-3 via the
    * per-query window. At 100 TB swap the brute-force scan for the
    * IVF probe set (qSimIvf) — same downstream shape. */
  val qSimHardNegatives: Q = (s, dir) => {
    val emb = withNorm(quantized(s, dir)) // carries label (EmbQuant)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"),
        col("n2").as("qn2"), col("label").as("qlabel"))
    val scored = emb.join(broadcast(queries),
        col("qid") =!= col("vec_id") && col("qlabel") =!= col("label"))
      .select(col("qid"), col("qlabel"), col("vec_id").as("neighbor"),
        col("label").as("neg_label"),
        (dotq(col("qv"), col("q")).cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Late-interaction MaxSim retrieval scoring (ColBERT — Khattab &
    * Zaharia, SIGIR 2020): score(q, d) = Σ_i max_j ⟨q_i, d_j⟩ over
    * the two sides' sub-vector sets — here the 8 contiguous 8-dim
    * slices of each 64-dim embedding (the multi-vector layout a
    * token-level late-interaction index stores). MaxSim rewards a
    * strong ALIGNED facet where the single full-vector dot averages
    * it away; the output carries both (maxsim, dot_full) so the rank
    * disagreement is visible, top-5 per query by (maxsim DESC,
    * neighbor).
    *
    * Exactness: sub-vector dots are exact int64 on the micro-quantized
    * components (8-dim dot ≤ 8·(2.5e5)² ≈ 5e11), max/sum are integer.
    *
    * Scale: same one-pass broadcast-query shape as [[qSimTopK]]; the
    * 64 sub-dot grid per (query, candidate) runs as a higher-order
    * expression inside the scan — no extra shuffle, no row blow-up. */
  val qSimMaxsim: Q = (s, dir) => {
    // sub-vector slices project BELOW the join — computed once per
    // ROW, not once per (query, candidate) pair (128 slice
    // allocations/pair in the first cut; this shape re-reads the
    // materialized arrays instead)
    val subsExpr =
      expr("transform(sequence(0, 7), i -> slice(q, i * 8 + 1, 8))")
    val emb = quantized(s, dir)
      .select(col("vec_id"), col("q"), subsExpr.as("subs"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qv"),
        col("subs").as("qsubs"))
    val scored = emb.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("neighbor"),
        expr("""aggregate(sequence(1, 8), CAST(0 AS BIGINT), (acc, i) ->
            acc + array_max(transform(sequence(1, 8), j ->
              dotq(element_at(qsubs, i), element_at(subs, j)))))""")
          .as("maxsim"),
        dotq(col("qv"), col("q")).as("dot_full"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("maxsim").desc, col("neighbor"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Binary sign quantization + Hamming ANN (Charikar's hyperplane
    * LSH, STOC 2002, in its identity-rotation form — the 1-bit/dim
    * "binary embedding" every billion-vector serving tier keeps hot):
    * each 64-dim vector compresses to TWO 32-bit sign words (64×
    * smaller than float32), candidate distance is
    * popcount(w0⊕w0') + popcount(w1⊕w1'), and the top-5 per query by
    * (hamming ASC, neighbor) is audited against the exact cosine
    * top-5 (`in_exact_top5`) so the compression's recall is measured,
    * not assumed. Two words instead of one keep every intermediate a
    * non-negative int64 — no sign-bit arithmetic traps across engines.
    *
    * Scale: the scan reads 16 bytes/vector instead of 256; same
    * broadcast-query one-pass shape as [[qSimTopK]]; XOR+popcount is
    * codegen-friendly integer work. */
  val qSimBinarySq: Q = (s, dir) => {
    val words = quantized(s, dir).select(col("vec_id"),
      expr("""aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) ->
          acc + IF(element_at(q, i) > 0, shiftleft(CAST(1 AS BIGINT), i - 1),
                   CAST(0 AS BIGINT)))""").as("w0"),
      expr("""aggregate(sequence(33, 64), CAST(0 AS BIGINT), (acc, i) ->
          acc + IF(element_at(q, i) > 0, shiftleft(CAST(1 AS BIGINT), i - 33),
                   CAST(0 AS BIGINT)))""").as("w1"))
    val wp = graft.CacheScope.track(words.persist())
    val queries = wp.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("w0").as("qw0"),
        col("w1").as("qw1"))
    val scored = wp.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("neighbor"),
        expr("bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1)")
          .cast("long").as("hamming"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming"), col("neighbor"))
    val top = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
    val exact = qSimTopK(s, dir)
      .select(col("qid"), col("neighbor"), lit(1L).as("in_exact_top5"))
    top.join(exact, Seq("qid", "neighbor"), "left")
      .na.fill(0L, Seq("in_exact_top5"))
      .select(col("qid"), col("neighbor"), col("hamming"), col("rnk"),
        col("in_exact_top5"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Cluster-balanced CORESET selection — the diversity-preserving
    * subsample a SemDeDup-style pipeline takes after dedup (Abbas et
    * al. 2023 keep-within-cluster discipline; √-allocation is the
    * classic stratified design): assign every vector to the K = 16
    * frozen coarse cells, keep ceil(√n) vectors per cell (the lowest
    * vec_ids — deterministic), so dense clusters are downsampled
    * hard while rare clusters survive intact. Output per cell: pool
    * size, kept count, an exact id-sum checksum of the kept set, and
    * the kept share in permille.
    *
    * Scale: the assignment scan is the only per-vector work; the
    * per-cell rank is a partitioned window (never global); output is
    * K rows. */
  val qSampleCoreset: Q = (s, dir) => {
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
    val withN = assigned
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("cid"))))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("cid")).orderBy(col("vec_id"))))
    val kept = withN
      .filter(col("rk") <= ceil(sqrt(col("n").cast("double"))))
    kept.groupBy(col("cid"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("kept"),
        sum(col("vec_id")).as("idsum_kept"))
      .select(col("cid"), col("n"), col("kept"), col("idsum_kept"),
        expr("kept * 1000 div n").as("kept_permille"))
      .orderBy(col("cid"))
  }

  /** Cosine near-dup pairs (cos >= 0.3) across all pairs — the exact
    * baseline the LSH variant is measured against. */
  val qSimNearDup: Q = (s, dir) => {
    val emb = withNorm(quantized(s, dir))
    val a = emb.select(col("vec_id").as("va"), col("q").as("qa"),
      col("n2").as("na"))
    val b = emb.select(col("vec_id").as("vb"), col("q").as("qb"),
      col("n2").as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (dotq(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy(col("va"), col("vb"))
  }

  /** ANN via multi-table random-hyperplane LSH with MULTI-PROBE: 8 tables
    * x 6 sign bits, and one side of the candidate join additionally probes
    * the 6 hamming-1 neighbors of its bucket (Lv et al., "Multi-probe LSH",
    * VLDB 2007) — a pair collides if its table buckets differ in <= 1 bit.
    * For worst-case pairs at cos = 0.3 (per-bit agreement p ~ 0.597) this
    * lifts per-table collision from p^6 ~ 0.046 to p^6 + 6 p^5 (1-p) ~ 0.23
    * and 8-table recall from ~0.31 to ~0.87, for 7x probe rows on ONE join
    * side instead of 2x+ more tables (at scale: probe the smaller side).
    * Hyperplane components are deterministic +-1 from the parity of an
    * md5-prefix of (table, plane, dim) — the cross-engine hash trick —
    * materialized as a 3072-row plane table both engines derive
    * identically, which makes the WHOLE query DuckDB-oracle-checkable
    * (r8; previously xxhash64 made it rows-only). Candidates come from
    * the (table, bucket) equi-join, then exact rerank. Candidate
    * generation stays an equi-join (shuffle O(n * tables * probes)),
    * never O(n^2); the plane table is constant-size and broadcasts, and
    * both bucket aggregations partial-aggregate map-side — an index
    * BUILD pass at 100 TB, run once per corpus snapshot. Recall >= 0.8
    * vs the exact q_sim_neardup stays asserted in DedupSimilaritySpec
    * (0.8, not 0.6 — the tight bound that catches a broken hash). */
  val qSimAnnLsh: Q = (s, dir) => {
    // three consumers (bucket build + both exact-rerank joins) — same
    // persist discipline as qDedupSemantic's identical frame
    val emb = graft.CacheScope.track(withNorm(quantized(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // 8 tables x 6 planes x 64 dims of deterministic +-1 components
    val planes = s.range(1)
      .select(explode(sequence(lit(0), lit(7))).as("t"))
      .select(col("t"), explode(sequence(lit(0), lit(5))).as("p"))
      .select(col("t"), col("p"), explode(sequence(lit(1), lit(64))).as("i"))
      .withColumn("sgn", expr(
        """if(cast(conv(substring(md5(concat_ws('_', t, p, i)), 1, 8),
                       16, 10) as bigint) % 2 = 0, 1L, -1L)"""))
    // one row per (vector, table): bucket = 6 sign bits of dot(v, plane);
    // persisted — both sides of the candidate join consume it
    val bucketed = graft.CacheScope.track(emb
      .select(col("vec_id"), posexplode(col("q")))
      .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").as("v"))
      .join(broadcast(planes), Seq("i"))
      .groupBy(col("vec_id"), col("t"), col("p"))
      .agg(sum(col("v") * col("sgn")).as("sdot"))
      .groupBy(col("vec_id"), col("t"))
      .agg(sum(when(col("sdot") > 0,
        expr("shiftleft(1L, cast(5 - p as int))")).otherwise(0L))
        .as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // probe side: own bucket + its 6 hamming-1 neighbors (bit flips)
    val a = bucketed
      .select(col("t"), col("vec_id").as("va"),
        explode(expr(
          """array(bucket, bucket ^ 1L, bucket ^ 2L, bucket ^ 4L,
                   bucket ^ 8L, bucket ^ 16L, bucket ^ 32L)"""))
          .as("bucket"))
    val b = bucketed.select(col("t"), col("bucket"), col("vec_id").as("vb"))
    val cand = a.join(b, Seq("t", "bucket"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb")).distinct()
    val qa = emb.select(col("vec_id").as("va"), col("q").as("qa"),
      col("n2").as("na"))
    val qb = emb.select(col("vec_id").as("vb"), col("q").as("qb"),
      col("n2").as("nb"))
    cand.join(qa, "va").join(qb, "vb")
      .select(col("va"), col("vb"),
        (dotq(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy(col("va"), col("vb"))
  }

  /** IVF (inverted-file) ANN — the second scale path named by the north
    * star alongside LSH. Coarse quantizer: the first K=16 vectors serve
    * as deterministic centroids (production would k-means; seeding with
    * data points is the standard init and keeps the oracle exact).
    * Every vector is assigned to its nearest centroid by exact cosine —
    * a broadcast join + map-side max_by aggregate, NO shuffle of the
    * vector table; each query probes its NPROBE=4 nearest centroid
    * lists, which turns candidate generation into an equi-join on cid
    * (the IVF posting-list lookup). All arithmetic is the exact
    * quantized-int64 dot/norm discipline, so unlike the LSH variant this
    * ANN is fully DuckDB-oracled (IVF per Sivic/Zisserman "Video Google"
    * ICCV 2003; IVF-flat as in FAISS, Johnson et al. 2017). */
  val qSimIvf: Q = (s, dir) => {
    val K = ivfCells(s)
    val nprobe = 4
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    // cosine of every vector against every centroid (n x K, broadcast)
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("n2"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
    // nearest centroid per vector: map-side-combinable max_by with a
    // deterministic (ccos, -cid) tie-break — no window/sort of the table
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("q")).as("q"), first(col("n2")).as("n2"))
    // each query probes its nprobe nearest centroid posting lists
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < 10)
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("vec_id").as("qid"), col("q").as("qv"),
        col("n2").as("qn2"), col("cid"))
    val cand = probes.join(assigned, "cid")
      .filter(col("vec_id") =!= col("qid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor"))
    cand
      .select(col("qid"), col("vec_id").as("neighbor"),
        (dotq(col("qv"), col("q")).cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** IVF index incremental maintenance — the vector-side twin of
    * q_index_delta: a delta batch of new vectors (vec_id % 10 == 0)
    * merges into the stored IVF cell state WITHOUT retraining
    * centroids or re-scanning base vectors. New vectors assign to the
    * EXISTING (frozen) centroids via the same broadcast map-side
    * max_by as qSimIvf; the merge is a cell-keyed full-outer join of
    * two bounded (≤K rows) aggregate states; the report is the table
    * an index operator reads before deciding to retrain: per-cell
    * base/delta/merged counts, an exact id-sum content checksum,
    * delta growth permille and post-merge imbalance permille (cell
    * share × K, 1000 = perfectly balanced).
    *
    * Scale: at 100 TB the base cell state is a stored artifact — this
    * query materializes it through a parquet round-trip so the merge
    * plan genuinely READS postings state (K rows) and never touches
    * base vectors (SimilaritySpec pins the plan); the delta pass is
    * batch-sized, one broadcast against K centroids, no shuffle
    * larger than the delta. */
  val qSimIvfDelta: Q = (s, dir) => {
    val K = ivfCells(s)
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    def assign(vecs: DataFrame): DataFrame = vecs
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
    def cellState(assigned: DataFrame): DataFrame = assigned
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("idsum"))
    // the stored index artifact: cell state only, base vectors gone.
    // Keyed by the md5 of the corpus dir (collision-free, unlike
    // hashCode) AND a per-JVM tag: two JVMs verifying the same SF dir
    // write disjoint paths, so neither overwrites state the other's
    // merge plan is reading.
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val basePath = scratchDir(new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_ivf_base_${dirKey}_$JvmTag").toString)
    cellState(assign(emb.filter(col("vec_id") % 10 =!= 0)))
      .write.mode("overwrite").parquet(basePath)
    val stored = s.read.parquet(basePath)
      .select(col("cid"), col("n").as("n_base"),
        col("idsum").as("idsum_base"))
    val delta = cellState(assign(emb.filter(col("vec_id") % 10 === 0)))
      .select(col("cid"), col("n").as("n_delta"),
        col("idsum").as("idsum_delta"))
    val merged = stored.join(delta, Seq("cid"), "full_outer")
      .select(col("cid"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L))
          + coalesce(col("n_delta"), lit(0L))).as("n_merged"),
        (coalesce(col("idsum_base"), lit(0L))
          + coalesce(col("idsum_delta"), lit(0L))).as("idsum_merged"))
    val tot = merged.agg(sum(col("n_merged")).as("tot_merged"))
    merged.crossJoin(broadcast(tot))
      .select(col("cid"), col("n_base"), col("n_delta"), col("n_merged"),
        col("idsum_merged"),
        expr("n_delta * 1000 div greatest(n_base, 1)")
          .as("growth_permille"),
        expr(s"n_merged * $K * 1000 div tot_merged")
          .as("imbalance_permille"))
      .orderBy(col("cid"))
  }

  /** IVF cell SPLIT — the maintenance step the [[qSimIvfDelta]]
    * report's imbalance column schedules (the index-lifecycle
    * completion: build → delta-merge → split, never a global
    * retrain): the HOTTEST cell (n DESC, cid — deterministic) is
    * split in two by re-assigning ONLY that cell's members to 2
    * sub-centroids seeded from its two lowest vec_ids (the same
    * lowest-id seeding discipline as the coarse quantizer), via an
    * EXACT int64 squared-distance argmin (d² = n2 + sn2 − 2·dot on
    * micro-quantized components, ties to the lower sub id). Output:
    * post-split cell state — unsplit cells ride through with
    * sub = 0, the hot cell emits sub ∈ {1, 2} — plus each cell's
    * post-split share (permille × (K+1) cells; 1000 = balanced) and
    * the pre-split trigger imbalance the scheduler acted on.
    * SimilaritySpec pins vector conservation (Σn unchanged) and that
    * the max cell size strictly decreases.
    *
    * Scale: the only work beyond the assignment scan every IVF op
    * shares is bounded by the ONE hot cell — a semi-join fetch of its
    * members, a 2-row broadcast of sub-centroids, and a cell-sized
    * argmin; no other cell's vectors are touched, no centroid
    * retrains. */
  val qSimIvfSplit: Q = (s, dir) => {
    val K = ivfCells(s)
    val emb = graft.CacheScope.track(withNorm(quantized(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val assigned = graft.CacheScope.track(emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val state = graft.CacheScope.track(assigned
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("idsum"))
      .persist())
    val tot = state.agg(sum(col("n")).as("tot"))
    val hot = state.orderBy(col("n").desc, col("cid")).limit(1)
      .select(col("cid").as("hot_cid"), col("n").as("hot_n"))
    // the one-cell fetch: members (with vectors) of the hot cell only
    val members = emb.join(
      assigned.join(broadcast(hot), col("cid") === col("hot_cid"))
        .select(col("vec_id")),
      Seq("vec_id"))
    // two lowest member ids via TakeOrderedAndProject (never a global
    // sort); sub labels from a min-agg, not a window
    val two = members.orderBy(col("vec_id")).limit(2)
    val seeds = two
      .crossJoin(broadcast(two.agg(min(col("vec_id")).as("mn"))))
      .select(when(col("vec_id") === col("mn"), 1L).otherwise(2L)
          .as("sub"),
        col("q").as("sq"), col("n2").as("sn2"))
    val reassigned = members.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sub"),
        (col("n2") + col("sn2") - lit(2L) * dotq(col("q"), col("sq")))
          .as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("sub"), struct(col("d2"), col("sub"))).as("sub"))
    val splitState = reassigned.groupBy(col("sub"))
      .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("idsum"))
      .crossJoin(broadcast(hot.select(col("hot_cid"))))
      .select(col("hot_cid").as("cid"), col("sub"), col("n"),
        col("idsum"))
    val unsplit = state
      .join(broadcast(hot), col("cid") === col("hot_cid"), "left_anti")
      .select(col("cid"), lit(0L).as("sub"), col("n"), col("idsum"))
    unsplit.unionByName(splitState)
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(hot.select(col("hot_n"))))
      .select(col("cid"), col("sub"), col("n"), col("idsum"),
        expr(s"n * ${K + 1} * 1000 div tot").as("share_permille"),
        expr(s"hot_n * $K * 1000 div tot")
          .as("trigger_imbalance_permille"))
      .orderBy(col("cid"), col("sub"))
  }

  /** IVF maintenance-loop COMPOSITION (r12 verdict item 6): the full
    * index lifecycle the delta/split parts only exercised singly —
    * delta-merge the batch into the frozen-centroid assignment, then
    * run the split scheduler until the index is balanced: up to 3
    * rounds, each splitting the hottest cell ONLY IF its share
    * exceeds the 1100-permille trigger (n·K·1000 > 1100·total — the
    * same K = 16 normalization the delta report's imbalance column
    * uses), re-assigning that one cell's members between its two
    * lowest-id seed vectors by exact int64 squared distance. Cells
    * are identified by (cid, path) with child paths 3·path + {1, 2} —
    * a sub-cell that is still the hottest can split again (the
    * sf0.01 fixture exercises exactly that). A round whose hottest
    * cell is already under the trigger is a pure-dataflow no-op (the
    * member fetch joins against an empty 1-row gate — no collect
    * decides the loop, so the 3-round plan is static and both
    * engines replay the conditional identically; the sf0.1 fixture
    * exercises the no-op round).
    *
    * Output: the final post-rebalance cell table — (cid, path, n,
    * idsum, share_permille) — the artifact the delta-merge of the
    * NEXT batch would read. DedupSimilaritySpec pins Σn/Σidsum
    * conservation and that the max cell share is non-increasing
    * round over round.
    *
    * Scale: per round, work beyond the bounded (≤cells) state
    * aggregate is ONE cell's members — a 1-row broadcast gate, a
    * 2-row seed broadcast, and a cell-sized argmin; the vec-level
    * frame re-persists per round (path column only changes), and no
    * round touches any other cell's vectors. */
  val qSimIvfRebalance: Q = (s, dir) => {
    val K = ivfCells(s)
    val av = rebalanceStates(s, dir).last
    val tot = av.agg(count(lit(1)).as("tot"))
    av.groupBy(col("cid"), col("path"))
      .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("idsum"))
      .crossJoin(broadcast(tot))
      .select(col("cid"), col("path"), col("n"), col("idsum"),
        expr(s"n * $K * 1000 div tot").as("share_permille"))
      .orderBy(col("cid"), col("path"))
  }

  /** The vec-level (vec_id, cid, path) assignment after the merge
    * (index 0) and after each of the 3 scheduler rounds — the loop
    * behind [[qSimIvfRebalance]], package-visible so the spec can pin
    * conservation and monotone max-cell decrease ROUND BY ROUND, not
    * just end-to-end.
    *
    * The scheduler decisions (hottest cell, its trigger, the 2 seed
    * vectors) are BOUNDED scalar actions collected at the driver —
    * the q_dedup_components discipline — and each round's rewrite is
    * then one size-gated member-join pass over the assignment (see
    * the memberLimit gate below), so the plan lineage grows LINEARLY
    * in rounds. The first cut expressed the
    * conditional split as pure dataflow (1-row broadcast gates); that
    * referenced `av` 3× per round, and because InMemoryRelation nodes
    * carry their cached child plan, the plan DESCRIPTION (which Spark
    * renders per execution) grew as 3^rounds — measured 21.7 s at
    * sf0.1, ~all of it driver-side tree printing, and an explain()
    * on the final frame allocated multi-GB strings. Execution was
    * never the problem; the plan object was. */
  private[graft] def rebalanceStates(s: SparkSession, dir: String)
      : Seq[DataFrame] = {
    val K = ivfCells(s)
    val emb = graft.CacheScope.track(withNorm(quantized(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // delta-merge first: the rebalance consumes the MERGED state —
    // base (vec_id % 10 != 0) and the delta batch assign separately
    // to the same frozen centroids and union (the qSimIvfDelta merge
    // at vector grain)
    val av0 =
      assignCells(emb.filter(col("vec_id") % 10 =!= 0), emb, K)
        .unionByName(assignCells(emb.filter(col("vec_id") % 10 === 0),
          emb, K))
        .withColumn("path", lit(0L))
    rebalanceRounds(s, emb, av0, K, rounds = 3, threshold = 1100L)
  }

  /** Frozen-centroid coarse assignment of `vecs` (vec_id, q, n2) to
    * the K lowest-id seed vectors of `emb` — the library's IVF
    * convention, shared by [[rebalanceStates]] and
    * `Graft.ivfRebalance`. Deterministic tie-break on (ccos, −cid). */
  private[graft] def assignCells(vecs: DataFrame, emb: DataFrame,
      K: Int): DataFrame = {
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    vecs
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
  }

  /** The scheduler loop shared by [[rebalanceStates]] and
    * `Graft.ivfRebalance`: `emb` = persisted (vec_id, q, n2), `av0` =
    * the initial (vec_id, cid, path) assignment. Returns the
    * assignment after the merge (index 0) and after each round. */
  private[graft] def rebalanceRounds(s: SparkSession, emb: DataFrame,
      av0: DataFrame, K: Int, rounds: Int, threshold: Long)
      : Seq[DataFrame] = {
    // the hot-cell member joins are size-GATED, not unconditionally
    // broadcast (VERDICT r14 item 1): a trigger-eligible hot cell is
    // ≥ tot·1100/(K·1000) ≈ 7% of the corpus at K = 16 — the exact
    // data-scaling-broadcast shape the graph family's edge gate
    // closed. The scalar `hn` the scheduler already collects drives
    // the flip to a co-partitioned shuffled-hash equi-join on vec_id
    // past `spark.graft.ivf.broadcastMemberLimit` (default 100k, the
    // broadcastEdgeLimit class; 0 forces shuffle, huge forces
    // broadcast). Both paths bit-identical (SimilaritySpec); no
    // data-scaling BroadcastExchange on the gated path (PlanSpec).
    val memberLimit = AutoBroadcast.limit(
      s, "spark.graft.ivf.broadcastMemberLimit", 100000L)
    var av = graft.CacheScope.track(av0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tot = av.count() // 1-row scalar; also materializes the cache
    val states = scala.collection.mutable.Buffer(av)
    for (_ <- 1 to rounds) {
      val hot = av.groupBy(col("cid"), col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("cid"), col("path")).limit(1)
        .collect()(0)
      val (hcid, hpath, hn) =
        (hot.getLong(0), hot.getLong(1), hot.getLong(2))
      // a cell of 1 cannot split; only reachable when tot < K·1000/thr
      val memberIds = av
        .filter(col("cid") === hcid && col("path") === hpath)
        .select(col("vec_id"))
      val memberSide = AutoBroadcast.gate(memberIds, hn, memberLimit)
      val seeds =
        if (hn * K * 1000 > threshold * tot && hn >= 2)
          emb.join(memberSide, Seq("vec_id"))
            .orderBy(col("vec_id")).limit(2)
            .select(col("vec_id"), col("q"), col("n2")).collect()
        else Array.empty[org.apache.spark.sql.Row]
      if (seeds.length == 2) {
        // exact int64 d² against each seed; ties to sub 1 (the lower
        // seed id — the min_by struct discipline of qSimIvfSplit)
        def d2(sr: org.apache.spark.sql.Row) =
          col("n2") + lit(sr.getLong(2)) -
            lit(2L) * dotq(col("q"), typedLit(sr.getSeq[Long](1)))
        val sub = when(d2(seeds(0)) <= d2(seeds(1)), 1L).otherwise(2L)
        val reassigned = emb
          .join(memberSide, Seq("vec_id"))
          .select(col("vec_id"), sub.as("sub"))
        av = graft.CacheScope.track(av
          .join(AutoBroadcast.gate(reassigned, hn, memberLimit),
            Seq("vec_id"), "left")
          .select(col("vec_id"), col("cid"),
            when(col("sub").isNotNull, col("path") * 3 + col("sub"))
              .otherwise(col("path")).as("path"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      }
      states += av
    }
    states.toSeq
  }

  /** Margin-criterion candidate-pair mining (Artetxe & Schwenk, ACL
    * 2019 — the LASER/CCMatrix bitext-mining score): a raw cosine
    * threshold over-selects in dense neighborhoods and under-selects
    * in sparse ones, so each candidate pair is scored RELATIVE to its
    * endpoints' own neighborhoods — margin(x, y) = 2·cos(x, y) /
    * (avgNN₄(x) + avgNN₄(y)), ratio mode — and a query keeps its
    * top-1 cross-label match above margin 1.05. Labels stand in for
    * the language axis: mining pairs across labels is exactly the
    * cross-lingual alignment harvest a parallel-corpus pipeline runs
    * at web scale.
    *
    * Determinism: dots and norms are exact int64 on the
    * micro-quantized components; cos/margin are IEEE doubles from
    * identical expression trees in both engines, with the 4-NN sum
    * parenthesized in rank order (((c1+c2)+c3)+c4) so the summation
    * order is pinned; ties break on the candidate id.
    *
    * Scale: candidates are blocked by the frozen-centroid IVF cell
    * (same-cell pairs only — the standard ANN-margin approximation;
    * the knn stats and the pair stream share ONE cell-keyed self-join,
    * never all-pairs), and the per-query top-1 is a bounded window. */
  val qSimMarginMine: Q = (s, dir) =>
    marginMineFrom(withNorm(quantized(s, dir)))

  /** The mining pipeline behind [[qSimMarginMine]] and
    * `Graft.marginMine`: `emb0` = (vec_id, label, q, n2) with q
    * micro-quantized int64 components. */
  private[graft] def marginMineFrom(emb0: org.apache.spark.sql.DataFrame,
      autoK: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = graft.CacheScope.track(emb0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // autoK = the facade path: derive K from the (persisted) corpus
    // count so cell size stays bounded as the corpus grows; declared
    // queries keep the conf-default 16 their oracles replay
    val K = if (autoK) resolveCells(emb0.sparkSession, emb.count())
      else ivfCells(emb0.sparkSession)
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val assigned = emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"))
    val side = assigned.join(emb, Seq("vec_id"))
    // ONE cell-keyed self-join feeds BOTH the knn stats and the
    // cross-label candidate stream (labels ride along — no second
    // label join against the source table)
    val pairs = graft.CacheScope.track(side.as("a")
      .join(side.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        col("a.label").as("label_x"), col("b.label").as("label_y"),
        (dotq(col("a.q"), col("b.q")).cast("double") /
          (sqrt(col("a.n2").cast("double")) *
            sqrt(col("b.n2").cast("double")))).as("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val w = Window.partitionBy(col("x"))
      .orderBy(col("cos").desc, col("y"))
    val knn = pairs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .groupBy(col("x"))
      .agg(max(when(col("rk") === 1, col("cos"))).as("c1"),
        max(when(col("rk") === 2, col("cos"))).as("c2"),
        max(when(col("rk") === 3, col("cos"))).as("c3"),
        max(when(col("rk") === 4, col("cos"))).as("c4"),
        count(lit(1)).as("m"))
      .select(col("x"),
        ((coalesce(col("c1"), lit(0.0)) + coalesce(col("c2"), lit(0.0)))
          + coalesce(col("c3"), lit(0.0)))
          .plus(coalesce(col("c4"), lit(0.0)))
          .divide(col("m").cast("double")).as("a"))
    val scored = pairs
      .filter(col("label_x") =!= col("label_y"))
      .join(knn.select(col("x"), col("a").as("ax")), Seq("x"))
      .join(knn.select(col("x").as("y"), col("a").as("ay")), Seq("y"))
      .select(col("x"), col("y"), col("label_x"), col("label_y"),
        (lit(2.0) * col("cos") / (col("ax") + col("ay"))).as("margin"))
    val wb = Window.partitionBy(col("x"))
      .orderBy(col("margin").desc, col("y"))
    scored.withColumn("rk", row_number().over(wb))
      .filter(col("rk") === 1 && col("margin") > 1.05)
      .select(col("x").as("vec_id"), col("y").as("match_id"),
        col("label_x"), col("label_y"),
        expr("CAST(round(margin * 1000000) AS BIGINT)")
          .as("margin_micro"))
      .orderBy(col("vec_id"))
  }

  /** IVF-PQ with ADC (asymmetric distance computation) — the two
    * quantizers of qSimIvf (coarse cells) and q_emb_pq (product codes)
    * COMPOSED into the index structure FAISS ships as IVFPQ (Jégou,
    * Douze, Schmid, "Product quantization for nearest neighbor
    * search", TPAMI 2011): vectors live in IVF posting lists as M=4
    * one-byte PQ codes; a query probes its nprobe=4 nearest cells and
    * scores candidates WITHOUT touching the raw vectors — per
    * subspace, the query-to-codeword distance table (M×K' = 64 exact
    * int64 entries) is precomputed once, and a candidate's ADC
    * distance is the sum of M table lookups on its codes.
    *
    * Exactness: both quantizer assignments tie-break deterministically
    * (coarse: max_by on (ccos, -cid); PQ: struct-min on (d2, code));
    * distance tables and ADC sums are exact int64 on the micro-
    * quantized components, so the ranking is bit-stable and fully
    * DuckDB-oracled.
    *
    * Scale: this is THE billion-vector layout — stored bytes per
    * vector drop from 64×8 to M + cell id; the codebook (M·16 subvecs)
    * and the per-query distance tables broadcast; candidate scoring
    * is an equi-join on (qid, m, code) with a partial-aggregated sum,
    * never a scan of raw vectors. Recall is bounded by the probed
    * cells exactly as qSimIvf (same coarse quantizer). */
  val qSimIvfPq: Q = simIvfPqAt(nprobe = 4, m = 4)

  /** Parameterized IVF-PQ (the tunable pair behind [[qSimIvfPq]] and
    * the [[qSimRecallSweep]] frontier): `nprobe` coarse cells probed
    * per query, `m` PQ subspaces of 64/m dims each (codebook stays 16
    * codewords per subspace, seeded from the first 16 vectors). Larger
    * nprobe widens the candidate set (recall ↑, scan cost ↑); larger m
    * refines the ADC distance (recall ↑, code bytes ↑) — exactly the
    * two dials a FAISS deployment sweeps before fixing an operating
    * point (Jégou 2011 §V). */
  private def simIvfPqAt(nprobe: Int, m: Int,
      residual: Boolean = false,
      rerank: Option[Int] = None): Q = (s, dir) => {
    require(64 % m == 0, s"m=$m must divide the 64-dim embedding")
    val K = ivfCells(s)
    val d = 64 / m
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("q")).as("q"))
    // residual mode (Jégou 2011 §III / FAISS IVFPQ default): PQ encodes
    // x − centroid(cell(x)) instead of x. Residuals concentrate around
    // the origin, so the same 16 codewords/subspace capture far more of
    // the remaining variance — the honest-recall lever the sweep shows.
    // Exact: centroid components are micro ints, so the residual is one
    // int64 subtraction per component.
    val encIn =
      if (!residual) assigned
      else assigned
        .join(broadcast(cents.select(col("cid"), col("cq"))), Seq("cid"))
        .select(col("vec_id"), col("cid"),
          expr("zip_with(q, cq, (x, y) -> x - y)").as("q"))
    def subspaced(df: DataFrame, keys: Column*): DataFrame =
      df.select(keys :+ explode(expr(
          s"""transform(sequence(0, ${m - 1}),
             m -> struct(m AS m, slice(q, m * $d + 1, $d) AS sub))"""))
          .as("e"): _*)
        .select(keys :+ col("e.m").as("m") :+ col("e.sub").as("sub"): _*)
    // m subspaces of 64/m dims; codebook = 16 seed subvectors. Raw
    // mode seeds from vec_id 0..15 (the deployed layout). Residual
    // mode MUST seed past the coarse centroids (K..K+15): vectors
    // 0..K−1 are the centroids, so their own residuals are all-zero —
    // 16 identical zero codewords, a degenerate codebook whose ADC is
    // constant per query (caught when the first sweep run returned
    // tie-break-rank recall at every residual point). K = 16 default
    // keeps the historical 16..31 window and the oracle hash.
    val cbLo = if (residual) K else 0
    val subs = subspaced(encIn, col("vec_id"), col("cid"))
    val codebook = subs
      .filter(col("vec_id") >= cbLo && col("vec_id") < cbLo + 16)
      .select(col("m"), (col("vec_id") - cbLo).cast("int").as("code"),
        col("sub").as("csub"))
    val sqd = expr(
      """aggregate(zip_with(sub, csub, (x, y) -> (x - y) * (x - y)),
         CAST(0 AS BIGINT), (acc, v) -> acc + v)""")
    // encode: each db vector's per-subspace argmin codeword
    val codes = subs.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", sqd)
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < 10)
      .withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid"))
    val cand = probes.join(assigned.select(col("vec_id"), col("cid")), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("cid"), col("vec_id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_d2"), col("neighbor"))
    // ADC distance tables for the 10 query vectors — raw mode: one
    // query-vs-codebook table (m·16 rows per query); residual mode: the
    // table is PER PROBED CELL (query residual depends on the cell), so
    // it keys on (qid, cid, m, code) — still ≤ 10·nprobe·m·16 rows,
    // broadcast. Candidates join through their OWN cell, which is by
    // construction the probed cell that produced them.
    val scoredAdc =
      if (!residual) {
        val dt = subs.filter(col("vec_id") < 10)
          .join(broadcast(codebook), Seq("m"))
          .withColumn("d2q", sqd)
          .select(col("vec_id").as("qid"), col("m"), col("code"), col("d2q"))
        cand.join(codes, Seq("vec_id"))
          .join(broadcast(dt), Seq("qid", "m", "code"))
      } else {
        val qres = probes
          .join(emb.select(col("vec_id").as("qid"), col("q")), Seq("qid"))
          .join(broadcast(cents.select(col("cid"), col("cq"))), Seq("cid"))
          .select(col("qid"), col("cid"),
            expr("zip_with(q, cq, (x, y) -> x - y)").as("q"))
        val dt = subspaced(qres, col("qid"), col("cid"))
          .join(broadcast(codebook), Seq("m"))
          .withColumn("d2q", sqd)
          .select(col("qid"), col("cid"), col("m"), col("code"), col("d2q"))
        cand.join(codes, Seq("vec_id"))
          .join(broadcast(dt), Seq("qid", "cid", "m", "code"))
      }
    val adcRanked = scoredAdc
      .groupBy(col("qid"), col("vec_id").as("neighbor"))
      .agg(sum(col("d2q")).as("adc_d2"))
      .withColumn("rnk", row_number().over(w))
    rerank match {
      case None =>
        adcRanked.filter(col("rnk") <= 5).orderBy(col("qid"), col("rnk"))
      case Some(l) =>
        // exact-rerank stage (the q_sim_rerank / FAISS serving recipe):
        // the ADC top-L shortlist is re-scored with the EXACT integer
        // dot product and only then cut to 5. Costs L exact dots per
        // query — candidate-volume-independent — and is what lifts
        // recall past the ADC quantization ceiling.
        val qa = emb.select(col("vec_id").as("qid"), col("q").as("qv"),
          col("n2").as("qn2"))
        val qb = emb.select(col("vec_id").as("neighbor"),
          col("q").as("nv"), col("n2").as("nn2"))
        val wf = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("neighbor"))
        adcRanked.filter(col("rnk") <= l)
          .select(col("qid"), col("neighbor"))
          .join(broadcast(qa), Seq("qid"))
          .join(qb, Seq("neighbor"))
          .select(col("qid"), col("neighbor"),
            (dotq(col("qv"), col("nv")).cast("double") /
              (sqrt(col("qn2").cast("double")) *
                sqrt(col("nn2").cast("double")))).as("cos"))
          .withColumn("rnk", row_number().over(wf))
          .filter(col("rnk") <= 5)
          .orderBy(col("qid"), col("rnk"))
    }
  }

  /** One k-means (Lloyd) iteration for the IVF coarse quantizer, as pure
    * relational algebra with EXACT integer math: assign to seed
    * centroids, aggregate each cluster's element-wise SUM vector
    * (cosine is scale-invariant, so the integer sum stands in for the
    * float mean — cos(v, mean) == cos(v, sum)), reassign against the
    * updated centroids, and report per-cluster size and movement.
    * Component sums stay under 2^63 and dot products under 2^53, so the
    * whole iteration is bit-reproducible and DuckDB-oracled — the
    * training loop a production IVF runs, one step of which is proven
    * exactly here. Shapes: broadcast centroid joins (no vector-table
    * shuffle for scoring), posexplode + two-level agg for the sums. */
  val qSimKmeansStep: Q = (s, dir) => {
    val K = ivfCells(s)
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    def best(scored: DataFrame, out: String): DataFrame =
      scored.groupBy(col("vec_id"))
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as(out),
          first(col("q")).as("q"), first(col("n2")).as("n2"))
    val a0 = best(
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("n2"), col("cid"),
          (dotq(col("q"), col("cq")).cast("double") /
            (sqrt(col("n2").cast("double")) *
              sqrt(col("cn2").cast("double")))).as("ccos")),
      "cid0")
    // element-wise integer sum per cluster (posexplode + 2-level agg)
    val csum = a0.select(col("cid0"), posexplode(col("q")))
      .groupBy(col("cid0"), col("pos")).agg(sum(col("col")).as("s"))
      .groupBy(col("cid0"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), x -> x.s)")
        .as("cq"))
      .select(col("cid0").as("cid"), col("cq"))
      .withColumn("cn2", dotq(col("cq"), col("cq")))
    val a1 = a0.join(
        best(
          a0.crossJoin(broadcast(csum))
            .select(col("vec_id"), col("q"), col("n2"), col("cid"),
              (dotq(col("q"), col("cq")).cast("double") /
                (sqrt(col("n2").cast("double")) *
                  sqrt(col("cn2").cast("double")))).as("ccos")),
          "cid1").select(col("vec_id"), col("cid1")),
        "vec_id")
    a1.groupBy(col("cid1"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cid1") =!= col("cid0"), 1).otherwise(0)).as("moved"),
        min(col("vec_id")).as("min_vec"))
      .orderBy(col("cid1"))
  }

  /** Cluster-balanced diversity sampling: assign every vector to its
    * nearest IVF centroid, then take a fixed per-cluster quota of the
    * most-central vectors — the standard "cover the embedding space,
    * don't oversample the dense head" selection step for curating a
    * training subset (cf. DeepCore / coreset selection literature;
    * same mechanics as k-center greedy's cluster-quota approximation).
    *
    * Scale: centroid scoring is a broadcast cross join (no vector
    * shuffle); the per-cluster quota is a grouped top-k — K partitions
    * of bounded size, never a global sort. Exact integer dot products
    * keep it fully DuckDB-oracled. */
  val qSampleDiverse: Q = (s, dir) => {
    val K = ivfCells(s)
    val quota = 5
    val emb = withNorm(quantized(s, dir))
    val cents = emb.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("ccos")),
        struct(col("ccos"), -col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("cid"), col("b.ccos").as("ccos"))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("ccos").desc, col("vec_id"))
    assigned
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= quota)
      .select(col("cid"), col("rnk"), col("vec_id"), col("ccos"))
      .orderBy(col("cid"), col("rnk"))
  }

  /** Semantic dedup (SemDeDup — Abbas et al. 2023, arXiv:2303.09540):
    * near-duplicate embedding pairs found within shared IVF cells, the
    * production-scale counterpart of the deliberately all-pairs
    * q_sim_neardup yardstick. Soft assignment: every vector probes its
    * NPROBE=6 nearest coarse cells (multi-probe, same recall device as
    * qSimIvf — hard single-cell assignment recalled only ~0.2 of
    * cos>=0.3 pairs on this fixture because moderate-similarity pairs
    * straddle cell boundaries), a pair is a candidate iff the probe
    * sets intersect, and the verify is the exact quantized-int64
    * cosine. Shuffle is O(n x nprobe) probe rows + candidates, never
    * O(n^2); dots run map-side on the cell-share-duplicated pair
    * stream and the pair dedup follows the ~1%-selective verify
    * (r18 — see the inline note). Fully DuckDB-oracled
    * (the oracle replays probing, pairing and the cosine in SQL).
    * Keep policy: va is the canonical survivor (va < vb). Blocking
    * recall vs the exact baseline is asserted in DedupSimilaritySpec
    * (measured 0.845 at sf0.01 for half the candidate volume of a
    * K=16 hard blocking — the K/nprobe pair is the recall-vs-cost
    * dial). */
  val qDedupSemantic: Q = (s, dir) =>
    semanticDedupImpl(withNorm(quantized(s, dir)), 0.3, 6)

  /** The SemDeDup pipeline behind [[qDedupSemantic]], parameterized
    * and shared with the public `graft.api.Graft.semanticDedup`
    * facade. `embIn` = (vec_id long, q array<bigint> micro-quantized,
    * n2 = q·q); `threshold` the cosine floor; `nprobe` probed cells
    * per vector. At (0.3, 6) on the fixture tables this is
    * bit-identical to the r10 declared query. */
  private[graft] def semanticDedupImpl(embIn: DataFrame,
      threshold: Double, nprobe: Int,
      bound: Long => org.apache.spark.sql.Column =
        k => col("vec_id") < k): DataFrame = {
    // The within-cell candidate join is quadratic per cell, so cell
    // POPULATION (~n/K × nprobe probe rows) is the scale knob and K
    // must GROW with the corpus: clamp(64, ceil(n/32), 65536) holds
    // cell size at ~32 however large n gets. The 64 floor keeps every
    // fixture SF (≤2000 vectors) on the old constant, so oracles
    // replay the same literal there via greatest(64, count(*)//32).
    // The r10 stress run
    // measured the fixed-K version at 163x wall for 10x data (20k
    // vectors, 10x cell population, 100x pairs) — THE quadratic
    // failure this parameterization removes; nprobe=6 holds recall.
    //
    // persisted: feeds centroid scoring AND both cosine re-joins;
    // (vec_id, q, n2) is 64 longs/row — the narrow frame discipline
    val emb = graft.CacheScope.track(embIn.persist())
    // 1-row scalar action on the persisted narrow frame (the
    // Dedup.scala:155 discipline) — K/S parameterize the plan the same
    // way AQE would a partition count. K rides the SHARED resolver
    // (VERDICT r16 item 3: one formula steers every cell-blocked
    // operator): floor 64 / target cell size 32 reproduce the
    // pre-r17 max(64, n/32) at every fixture SF (n ≤ 2048 → 64) AND
    // at the 10× stress corpus (20000/32 = 625 exactly), so every
    // oracle hash and cross-round stress factor is unchanged; an
    // explicit `spark.graft.ivf.cells` / `spark.graft.ivf.
    // targetCellSize` now steers SemDeDup too (both confs are
    // Verify-refused — they change declared output).
    val K = Similarity.resolveCells(emb.sparkSession, emb.count(),
      floor = 64L, defaultTarget = 32L).toLong
    // Two-level coarse quantizer (the inverted-multi-index idea,
    // Babenko & Lempitsky 2012; FAISS uses HNSW/IMI for exactly this):
    // a flat n×K assignment scan re-becomes quadratic once K ∝ n, so
    // vectors first score S = √(64·K) SUPER-cells (n×S rows), and only
    // the sub-centroids belonging to the vector's top-8 supers get
    // scored (expected 8·K/S more) — O(√n) per vector overall. At
    // every fixture SF K = S = 64 and each sub-centroid is its own
    // super (cos = 1.0 with itself), so top-8-supers ⊇ top-6-subs and
    // the hierarchy DEGENERATES EXACTLY to the flat top-6: oracle
    // hashes are unchanged there, while the r10 stress corpus (20k
    // vectors) drops from the flat-K 13.9x to near-linear.
    val S = math.max(64L, math.floor(math.sqrt(64.0 * K)).toLong)
    val sups = emb.filter(bound(S))
      .select(col("vec_id").as("sid"), col("q").as("sq"),
        col("n2").as("sn2"))
    val vsc = graft.CacheScope.track(emb.crossJoin(broadcast(sups))
      .select(col("vec_id"), col("sid"),
        (dotq(col("q"), col("sq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("sn2").cast("double"))))
          .as("scos"))
      .persist())
    val wS = Window.partitionBy(col("vec_id"))
      .orderBy(col("scos").desc, col("sid"))
    val vsup = vsc.withColumn("srnk", row_number().over(wS))
      .filter(col("srnk") <= 8)
      .select(col("vec_id"), col("sid"))
    // sub-centroid -> super assignment (reuses the vsc scores; max_by
    // tie-break matches the oracle's ORDER BY ccos DESC, sid rank 1)
    val scj = vsc.filter(bound(K))
      .groupBy(col("vec_id"))
      .agg(max_by(col("sid"), struct(col("scos"), -col("sid"))).as("sid"))
      .select(col("vec_id").as("cid"), col("sid"))
    val cents = emb.filter(bound(K))
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    // restricted sub scoring: only (vector, sub) pairs whose sub lives
    // in one of the vector's top-8 super-cells. The centroid table
    // broadcasts up to ~1e5 subs (~50 MB of quantized vectors); past
    // that this equi-join flips to a shuffle join — the next dial,
    // noted, not needed at the stress scale.
    val allowed = vsup.join(broadcast(scj), Seq("sid"))
      .select(col("vec_id"), col("cid"))
    val scored = allowed
      .join(broadcast(cents), Seq("cid"))
      .join(emb.select(col("vec_id"), col("q"), col("n2")), Seq("vec_id"))
      .select(col("vec_id"), col("cid"),
        (dotq(col("q"), col("cq")).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("cn2").cast("double"))))
          .as("ccos"))
    val wP = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = scored
      .withColumn("prnk", row_number().over(wP))
      .filter(col("prnk") <= nprobe)
      .select(col("vec_id"), col("cid"))
    // pair dedup AFTER the cosine verify (optimization r18, guide
    // §2.3 shuffle fewer bytes — the q_join_fuzzy restructure): the
    // verify is extremely selective (probed at sf0.1: 1.12M raw pair
    // rows, 891k distinct, 12.2k accepted — 1.4%), so deduping the
    // accepted stream replaces a full candidate-volume exchange with
    // a ~1% one, for +26% of map-side dot products on the
    // cell-share-duplicated rows (dots on broadcast-joined narrow
    // frames — cheap next to the exchange). Value-identical: cos is a
    // function of (va, vb), so filter∘distinct ≡ distinct∘filter.
    val cand = probes.as("a").join(probes.as("b"),
        col("a.cid") === col("b.cid") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    cand
      .join(emb.select(col("vec_id").as("va"), col("q").as("qa"),
        col("n2").as("na")), "va")
      .join(emb.select(col("vec_id").as("vb"), col("q").as("qb"),
        col("n2").as("nb")), "vb")
      .select(col("va"), col("vb"),
        (dotq(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos"))
      // the facade's dial, not a constant: the declared query passes
      // 0.3 (the oracle's literal); Graft.semanticDedup(threshold=x)
      // was silently ignored before r17
      .filter(col("cos") >= threshold)
      .distinct()
      .orderBy(col("va"), col("vb"))
  }

  /** Two-stage retrieval (the IVF-PQ serving shape: coarse shortlist,
    * exact rerank — Jégou et al. 2011 §IV): stage 1 scores every
    * candidate against the query with CHEAP int8 codes (per-vector
    * max-abs scaling, 127-step symmetric quantization — 8x less
    * memory traffic than the micro ints) and keeps the top-50 per
    * query; stage 2 reranks only those 50 with the exact micro-int
    * dot product and emits the top-10 with both ranks and a `moved`
    * flag — the rank-disagreement audit that tells you whether the
    * coarse codes are good enough to cut the shortlist.
    *
    * Exactness: both scores are integer dot products; the int8 code
    * `round(v * 127.0 / maxabs)` is one IEEE divide + multiply and a
    * half-away-from-zero round, identical in both engines.
    *
    * Scale: the 5-query side broadcasts into both stages; stage 1 is
    * one linear pass over candidates with constant per-row work;
    * stage 2 touches 50 rows per query whatever the corpus size. */
  val qSimRerank: Q = (s, dir) => {
    val emb = quantized(s, dir)
      .withColumn("ma", greatest(
        expr("array_max(transform(q, x -> abs(x)))"), lit(1L)))
      .withColumn("c8",
        expr("transform(q, x -> cast(round(x * 127.0 / ma) as bigint))"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qv"),
        col("c8").as("qc8"))
    val coarse = emb.join(broadcast(queries), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("neighbor"), col("q"),
        dotq(col("qc8"), col("c8")).as("cdot"))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("cdot").desc, col("neighbor"))
    val shortlist = coarse.withColumn("coarse_rank",
        row_number().over(wc).cast("int"))
      .filter(col("coarse_rank") <= 50)
    val wf = Window.partitionBy(col("qid"))
      .orderBy(col("dot_micro").desc, col("neighbor"))
    shortlist.join(broadcast(queries.select(col("qid"), col("qv"))),
        Seq("qid"))
      .withColumn("dot_micro", dotq(col("qv"), col("q")))
      .withColumn("fine_rank", row_number().over(wf).cast("int"))
      .filter(col("fine_rank") <= 10)
      .select(col("qid"), col("neighbor"), col("fine_rank"),
        col("coarse_rank"), col("dot_micro"),
        (col("fine_rank") =!= col("coarse_rank")).as("moved"))
      .orderBy(col("qid"), col("fine_rank"))
  }

  /** ANN recall audit — the evaluation harness every index deployment
    * runs before switching off brute force: recall@5 of the IVF and
    * IVF-PQ paths against the exact cosine top-5 (qSimTopK), per
    * method. Exact integer hit counts; recall in permille by integral
    * division. Putting the AUDIT itself on the oracle board means the
    * measured recall numbers are cross-engine-verified, not
    * self-reported.
    *
    * Scale: the three result sets are ≤ 5 rows per query each; the
    * overlap join and rollup are audit-table-sized. */
  val qSimRecallAudit: Q = (s, dir) => {
    val exact = qSimTopK(s, dir)
      .select(col("qid"), col("neighbor"))
    def hits(ann: org.apache.spark.sql.DataFrame, method: String) =
      ann.select(col("qid"), col("neighbor"))
        .join(exact, Seq("qid", "neighbor"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(method).as("method"), col("hits"))
    val total = exact.groupBy(col("qid")).count()
      .agg(count(lit(1)).as("nq"), sum(col("count")).as("n_exact"))
    hits(qSimIvf(s, dir), "ivf")
      .unionAll(hits(qSimIvfPq(s, dir), "ivfpq"))
      .crossJoin(broadcast(total))
      .select(col("method"), col("nq").as("n_queries"), col("n_exact"),
        col("hits"), expr("hits * 1000 div n_exact").as("recall_permille"))
      .orderBy(col("method"))
  }

  /** The IVF-PQ operating points swept by [[qSimRecallSweep]]:
    * (label, nprobe, m, residual, rerank-L).
    *
    *  - np4_m4: [[qSimIvfPq]]'s deployed ADC-only point (r9 audit:
    *    360 permille) — the honest baseline.
    *  - np8_m8_res: residual encoding (Jégou §III) at doubled dials.
    *    On THIS corpus it scores BELOW raw (≈280): the fixture's
    *    embeddings are uniform random unit vectors, so residuals are
    *    LARGER than the vectors (‖x−c‖² = 2−2·ccos > 1) and harder to
    *    code — the audit proves residual's win needs clustered data,
    *    which is exactly what a deployment must measure before
    *    enabling it.
    *  - np4_m4_rr50 / np8_m8_rr100: the same index families with an
    *    exact-rerank stage over the ADC top-L shortlist (the FAISS
    *    serving recipe; q_sim_rerank's shape) — the dial that lifts
    *    recall past the ADC quantization ceiling (≈800 / ≈900). */
  private val sweepPoints: Seq[(String, Int, Int, Boolean, Option[Int])] =
    Seq(("np4_m4", 4, 4, false, None),
      ("np8_m8_res", 8, 8, true, None),
      ("np4_m4_rr50", 4, 4, false, Some(50)),
      ("np8_m8_rr100", 8, 8, false, Some(100)))

  /** IVF-PQ recall FRONTIER (VERDICT r9 item 7): recall@5 vs the exact
    * cosine top-5 at three (nprobe, m) operating points. The deployed
    * np4_m4 point recalled 360 permille in the r9 audit — this query
    * shows what turning each dial buys, and the all-cells point
    * isolates quantization error from probe misses. Every number is
    * DuckDB-oracled (the oracle replays all three pipelines).
    *
    * Scale: each point's result set is ≤ 5 rows/query; the sweep costs
    * one extra candidate pass per point, all on the broadcast-codebook
    * ADC shapes — no raw-vector scan is added. */
  val qSimRecallSweep: Q = (s, dir) => {
    val exact = graft.CacheScope.track(
      qSimTopK(s, dir).select(col("qid"), col("neighbor")).persist())
    val total = exact.groupBy(col("qid")).count()
      .agg(count(lit(1)).as("nq"), sum(col("count")).as("n_exact"))
    sweepPoints.map { case (label, np, m, res, rr) =>
      simIvfPqAt(np, m, residual = res, rerank = rr)(s, dir)
        .select(col("qid"), col("neighbor"))
        .join(exact, Seq("qid", "neighbor"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(label).as("point"), col("hits"))
    }.reduce(_ unionAll _)
      .crossJoin(broadcast(total))
      .select(col("point"), col("nq").as("n_queries"), col("n_exact"),
        col("hits"), expr("hits * 1000 div n_exact").as("recall_permille"))
      .orderBy(col("point"))
  }

  /** Milli-bit log2 discount table for NDCG@5: round(log2(rank+1)·1000)
    * for ranks 1..5 — one IEEE log per SMALL integer, rounded
    * identically in both engines, then everything downstream is exact
    * integer division. */
  private val lg2m = "array(1000, 1585, 2000, 2322, 2585)"

  /** Ranking-quality evaluation of the deployed ANN point
    * (IVF-PQ np4_m4) against the exact cosine top-5: per query,
    * precision hits@5, reciprocal rank of the first true hit in
    * micro-units, and NDCG@5 in permille with graded relevance
    * rel = 6 − true_rank (Järvelin & Kekäläinen 2002). The rank-metric
    * complement of the recall sweep: recall says WHETHER truth was
    * retrieved, NDCG says how well it was ORDERED.
    *
    * Exactness: DCG terms are rel·1e9 div lg2m(rank+1) (milli-bit
    * discount table above); IDCG is the same sum over the ideal
    * (5,4,3,2,1) ordering — all integer divisions on non-negative
    * operands, zero IEEE ops at eval time.
    *
    * Scale: both inputs are ≤5 rows/query; the eval join and rollup
    * are audit-table-sized. */
  val qEvalRanking: Q = (s, dir) => {
    val truth = qSimTopK(s, dir)
      .select(col("qid"), col("neighbor"),
        (lit(6L) - col("rnk")).as("rel"))
    val sys = qSimIvfPq(s, dir)
      .select(col("qid"), col("neighbor"), col("rnk").cast("long")
        .as("rnk_sys"))
    val idcg = s"""(5000000000 div element_at($lg2m, 1)
      + 4000000000 div element_at($lg2m, 2)
      + 3000000000 div element_at($lg2m, 3)
      + 2000000000 div element_at($lg2m, 4)
      + 1000000000 div element_at($lg2m, 5))"""
    sys.join(truth, Seq("qid", "neighbor"), "left")
      .groupBy(col("qid"))
      .agg(count(col("rel")).as("hits_at_5"),
        coalesce(expr("1000000 div min(CASE WHEN rel IS NOT NULL " +
          "THEN rnk_sys END)"), lit(0L)).as("rr_micro"),
        sum(expr(s"coalesce(rel, 0) * 1000000000 " +
          s"div element_at($lg2m, cast(rnk_sys as int))")).as("dcg_nano"))
      .withColumn("ndcg_permille", expr(s"dcg_nano * 1000 div $idcg"))
      .orderBy(col("qid"))
  }

  val queries: Map[String, Q] = Map(
    "q_sim_recall_audit" -> qSimRecallAudit,
    "q_sim_recall_sweep" -> qSimRecallSweep,
    "q_eval_ranking" -> qEvalRanking,
    "q_sim_rerank" -> qSimRerank,
    "q_sim_diverse" -> qSampleDiverse,
    "q_sim_topk" -> qSimTopK,
    "q_sim_hard_negatives" -> qSimHardNegatives,
    "q_sim_maxsim" -> qSimMaxsim,
    "q_sim_binary_sq" -> qSimBinarySq,
    "q_sample_coreset" -> qSampleCoreset,
    "q_sim_neardup" -> qSimNearDup,
    "q_sim_ann_lsh" -> qSimAnnLsh,
    "q_sim_ivf" -> qSimIvf,
    "q_sim_ivf_delta" -> qSimIvfDelta,
    "q_sim_ivf_split" -> qSimIvfSplit,
    "q_sim_ivf_rebalance" -> qSimIvfRebalance,
    "q_sim_margin_mine" -> qSimMarginMine,
    "q_sim_ivfpq" -> qSimIvfPq,
    "q_sim_kmeans_step" -> qSimKmeansStep,
    "q_dedup_semantic" -> qDedupSemantic)

  private[ops] val quantSql =
    "SELECT vec_id, r.i AS i, CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000) AS BIGINT) AS v FROM embeddings, range(1, 65) r(i)"

  /** DuckDB replay of [[simIvfPqAt]] at one (nprobe, m, residual)
    * point — the template behind both the deployed q_sim_ivfpq oracle
    * (4, 4, raw) and the recall-sweep frontier. Subspace id =
    * (i-1) // (64/m); residual mode subtracts the assigned centroid
    * component-wise before encoding, and builds the per-probed-cell
    * query distance tables, mirroring the Spark side exactly. */
  /** One unrolled rebalance round for the q_sim_ivf_rebalance oracle:
    * reads av{r−1}, emits av{r}. The MATERIALIZED hints are
    * load-bearing — DuckDB otherwise INLINES the shared CTEs into
    * every downstream consumer and re-evaluates the whole upstream
    * tree per round (the r12 recursive-Elo lesson; unmaterialized the
    * 3-round chain does not finish at sf0.1). Mirrors the Spark
    * round: hottest (cid, path) splits only past the 1100-permille
    * trigger; conditional no-op via the boolean in the member join. */
  private def rebalanceRoundSql(r: Int): String = {
    val p = r - 1
    s"""
      st$r AS MATERIALIZED (SELECT cid, path,
                 CAST(count(*) AS BIGINT) AS n
               FROM av$p GROUP BY 1, 2),
      hot$r AS (SELECT cid AS hcid, path AS hpath,
                  (n * 16000 > 1100 * (SELECT tot FROM tot)
                   AND n >= 2) AS dosplit
                FROM st$r ORDER BY n DESC, cid, path LIMIT 1),
      mem$r AS (SELECT a.vec_id FROM av$p a
                JOIN hot$r ON a.cid = hcid AND a.path = hpath
                  AND dosplit),
      two$r AS (SELECT vec_id FROM mem$r ORDER BY vec_id LIMIT 2),
      seeds$r AS (SELECT vec_id AS svec,
                    CASE WHEN vec_id = (SELECT min(vec_id) FROM two$r)
                         THEN 1 ELSE 2 END AS sub
                  FROM two$r),
      dd$r AS (SELECT a.vec_id, s.sub,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN mem$r m ON a.vec_id = m.vec_id
                 JOIN seeds$r s ON true
                 JOIN e b ON b.vec_id = s.svec AND b.i = a.i
               GROUP BY 1, 2),
      re$r AS (SELECT dd$r.vec_id, dd$r.sub FROM dd$r
                 JOIN n nv ON dd$r.vec_id = nv.vec_id
                 JOIN seeds$r s ON dd$r.sub = s.sub
                 JOIN n ns ON s.svec = ns.vec_id
               QUALIFY row_number() OVER (PARTITION BY dd$r.vec_id
                 ORDER BY nv.n2 + ns.n2 - 2 * dd$r.dot, dd$r.sub) = 1),
      av$r AS MATERIALIZED (SELECT a.vec_id, a.cid,
                 CASE WHEN r.sub IS NOT NULL
                      THEN a.path * 3 + r.sub ELSE a.path END AS path
               FROM av$p a LEFT JOIN re$r r ON a.vec_id = r.vec_id)"""
  }

  private def ivfPqSqlAt(nprobe: Int, m: Int,
      residual: Boolean = false,
      rerank: Option[Int] = None): String = {
    val d = 64 / m
    // residual codebooks seed from 16..31 — 0..15 are the centroids,
    // whose residuals are zero (see simIvfPqAt)
    val cbLo = if (residual) 16 else 0
    val cbHi = cbLo + 16
    val encIn =
      if (!residual)
        """enc_in AS (SELECT a.vec_id, e.i, e.v
                  FROM assigned a JOIN e ON e.vec_id = a.vec_id)"""
      else
        """cent AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < 16),
      enc_in AS (SELECT a.vec_id, e.i, e.v - c.v AS v
                 FROM assigned a
                   JOIN e ON e.vec_id = a.vec_id
                   JOIN cent c ON c.cid = a.cid AND c.i = e.i)"""
    val dtDef =
      if (!residual)
        s"""dt AS (SELECT vec_id AS qid, m, CAST(code AS INT) AS code,
               d2 AS d2q
             FROM enc WHERE vec_id < 10)"""
      else
        s"""qres AS (SELECT p.qid, p.cid, e.i, e.v - c.v AS v
              FROM probes p
                JOIN e ON e.vec_id = p.qid
                JOIN cent c ON c.cid = p.cid AND c.i = e.i),
      qsub AS (SELECT qid, cid, CAST((i - 1) // $d AS INT) AS m, i, v
               FROM qres),
      dt AS (SELECT q.qid, q.cid, q.m,
               CAST(c.vec_id - $cbLo AS INT) AS code,
               CAST(sum((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2q
             FROM qsub q JOIN sub c
               ON c.vec_id >= $cbLo AND c.vec_id < $cbHi
                 AND c.m = q.m AND c.i = q.i
             GROUP BY 1, 2, 3, 4)"""
    val dtJoin =
      if (!residual) "dt.qid = c.qid AND dt.m = k.m AND dt.code = k.code"
      else "dt.qid = c.qid AND dt.cid = c.cid AND dt.m = k.m AND dt.code = k.code"
    s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      probes AS (SELECT vec_id AS qid, cid FROM ccos WHERE vec_id < 10
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) <= $nprobe),
      $encIn,
      sub AS (SELECT vec_id, CAST((i - 1) // $d AS INT) AS m, i, v
              FROM enc_in),
      enc AS (SELECT s.vec_id, s.m, c.vec_id - $cbLo AS code,
                CAST(sum((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
              FROM sub s JOIN sub c
                ON c.vec_id >= $cbLo AND c.vec_id < $cbHi
                  AND c.m = s.m AND c.i = s.i
              GROUP BY 1, 2, 3),
      codes AS (SELECT vec_id, m, CAST(code AS INT) AS code FROM enc
                QUALIFY row_number() OVER (PARTITION BY vec_id, m
                  ORDER BY d2, code) = 1),
      $dtDef,
      cand AS (SELECT p.qid, p.cid, a.vec_id AS neighbor
               FROM probes p JOIN assigned a USING (cid)
               WHERE a.vec_id <> p.qid),
      adc AS (SELECT c.qid, c.neighbor,
                CAST(sum(dt.d2q) AS BIGINT) AS adc_d2
              FROM cand c
                JOIN codes k ON k.vec_id = c.neighbor
                JOIN dt ON $dtJoin
              GROUP BY 1, 2)
      ${rerank match {
        case None => """SELECT qid, neighbor, adc_d2,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY adc_d2, neighbor) AS INT) AS rnk
      FROM adc QUALIFY rnk <= 5 ORDER BY qid, rnk"""
        case Some(l) => s""", short AS (SELECT qid, neighbor FROM adc
               QUALIFY row_number() OVER (PARTITION BY qid
                 ORDER BY adc_d2, neighbor) <= $l),
      rr AS (SELECT s.qid, s.neighbor,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM short s
               JOIN e a ON a.vec_id = s.qid
               JOIN e b ON b.vec_id = s.neighbor AND a.i = b.i
             GROUP BY 1, 2),
      fin AS (SELECT qid, neighbor,
                CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) *
                  sqrt(CAST(nn.n2 AS DOUBLE))) AS cos
              FROM rr JOIN n nq ON qid = nq.vec_id
                      JOIN n nn ON neighbor = nn.vec_id)
      SELECT qid, neighbor, cos,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY cos DESC, neighbor) AS INT) AS rnk
      FROM fin QUALIFY rnk <= 5 ORDER BY qid, rnk"""
      }}"""
  }

  private val baseOracle: Map[String, String] = Map(
    "q_sim_rerank" -> s"""
      WITH e AS ($quantSql),
      m AS (SELECT vec_id, greatest(max(abs(v)), 1) AS ma
            FROM e GROUP BY 1),
      c AS (SELECT e.vec_id, e.i, e.v,
              CAST(round(e.v * 127.0 / m.ma) AS BIGINT) AS c8
            FROM e JOIN m USING (vec_id)),
      coarse AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
                   CAST(sum(a.c8 * b.c8) AS BIGINT) AS cdot
                 FROM c a JOIN c b ON a.i = b.i AND a.vec_id < 5
                   AND b.vec_id <> a.vec_id
                 GROUP BY 1, 2),
      ck AS (SELECT qid, neighbor, cdot,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY cdot DESC, neighbor) AS INT) AS coarse_rank
             FROM coarse),
      cand AS (SELECT * FROM ck WHERE coarse_rank <= 50),
      fine AS (SELECT cand.qid, cand.neighbor, cand.coarse_rank,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot_micro
               FROM cand
                 JOIN e a ON a.vec_id = cand.qid
                 JOIN e b ON b.vec_id = cand.neighbor AND a.i = b.i
               GROUP BY 1, 2, 3),
      fk AS (SELECT *,
               CAST(row_number() OVER (PARTITION BY qid
                 ORDER BY dot_micro DESC, neighbor) AS INT) AS fine_rank
             FROM fine)
      SELECT qid, neighbor, fine_rank, coarse_rank, dot_micro,
             fine_rank <> coarse_rank AS moved
      FROM fk WHERE fine_rank <= 10 ORDER BY qid, fine_rank""",
    "q_sim_diverse" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid, ccos FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1)
      SELECT cid,
        CAST(row_number() OVER (PARTITION BY cid
          ORDER BY ccos DESC, vec_id) AS INT) AS rnk,
        vec_id, ccos
      FROM assigned QUALIFY rnk <= 5 ORDER BY cid, rnk""",
    "q_sim_topk" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      d AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
              CAST(sum(a.v * b.v) AS BIGINT) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
              AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      scored AS (SELECT qid, neighbor,
              CAST(dot AS DOUBLE) /
                (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE)))
                AS cos
            FROM d JOIN n nq ON qid = nq.vec_id
                   JOIN n nn ON neighbor = nn.vec_id)
      SELECT qid, neighbor, cos,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY cos DESC, neighbor) AS INT) AS rnk
      FROM scored QUALIFY rnk <= 5 ORDER BY qid, rnk""",
    "q_sim_hard_negatives" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      d AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
              CAST(sum(a.v * b.v) AS BIGINT) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
              AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      scored AS (SELECT qid, lq.label AS qlabel, neighbor,
              ln.label AS neg_label,
              CAST(dot AS DOUBLE) /
                (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE)))
                AS cos
            FROM d JOIN n nq ON qid = nq.vec_id
                   JOIN n nn ON neighbor = nn.vec_id
                   JOIN embeddings lq ON qid = lq.vec_id
                   JOIN embeddings ln ON neighbor = ln.vec_id
            WHERE lq.label <> ln.label)
      SELECT qid, qlabel, neighbor, neg_label, cos,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY cos DESC, neighbor) AS INT) AS rnk
      FROM scored QUALIFY rnk <= 3 ORDER BY qid, rnk""",
    "q_sim_maxsim" -> s"""
      WITH e AS ($quantSql),
      sub AS (SELECT vec_id, (i - 1) // 8 AS s, ((i - 1) % 8) + 1 AS d, v
              FROM e),
      dots AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
                 a.s AS si, b.s AS sj, CAST(sum(a.v * b.v) AS BIGINT) AS dt
               FROM sub a JOIN sub b
                 ON a.d = b.d AND a.vec_id < 10 AND b.vec_id <> a.vec_id
               GROUP BY 1, 2, 3, 4),
      mx AS (SELECT qid, neighbor, si, max(dt) AS m
             FROM dots GROUP BY 1, 2, 3),
      ms AS (SELECT qid, neighbor, CAST(sum(m) AS BIGINT) AS maxsim
             FROM mx GROUP BY 1, 2),
      df AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot_full
             FROM e a JOIN e b
               ON a.i = b.i AND a.vec_id < 10 AND b.vec_id <> a.vec_id
             GROUP BY 1, 2)
      SELECT qid, neighbor, maxsim, dot_full,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY maxsim DESC, neighbor) AS INT) AS rnk
      FROM ms JOIN df USING (qid, neighbor)
      QUALIFY rnk <= 5 ORDER BY qid, rnk""",
    "q_sample_coreset" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      ranked AS (SELECT vec_id, cid,
                   CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS n,
                   row_number() OVER (PARTITION BY cid
                     ORDER BY vec_id) AS rk
                 FROM assigned),
      kept AS (SELECT * FROM ranked
               WHERE rk <= ceil(sqrt(CAST(n AS DOUBLE))))
      SELECT cid, CAST(max(n) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS kept,
        CAST(sum(vec_id) AS BIGINT) AS idsum_kept,
        CAST(count(*) AS BIGINT) * 1000 // CAST(max(n) AS BIGINT)
          AS kept_permille
      FROM kept GROUP BY cid ORDER BY cid""",
    "q_sim_binary_sq" -> s"""
      WITH e AS ($quantSql),
      words AS (SELECT vec_id,
          CAST(sum(CASE WHEN v > 0 AND i <= 32
                   THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)
            AS BIGINT) AS w0,
          CAST(sum(CASE WHEN v > 0 AND i >= 33
                   THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END)
            AS BIGINT) AS w1
        FROM e GROUP BY vec_id),
      scored AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
          CAST(bit_count(xor(a.w0, b.w0))
            + bit_count(xor(a.w1, b.w1)) AS BIGINT) AS hamming
        FROM words a JOIN words b
          ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
      top AS (SELECT qid, neighbor, hamming,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY hamming, neighbor) AS INT) AS rnk
        FROM scored QUALIFY rnk <= 5),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      dd AS (SELECT a.vec_id AS qid, b.vec_id AS neighbor,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
               AND b.vec_id <> a.vec_id
             GROUP BY 1, 2),
      cs AS (SELECT qid, neighbor,
               CAST(dot AS DOUBLE) /
                 (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE)))
                 AS cos
             FROM dd JOIN n nq ON qid = nq.vec_id
                     JOIN n nn ON neighbor = nn.vec_id),
      etop AS (SELECT qid, neighbor FROM cs
               QUALIFY row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, neighbor) <= 5)
      SELECT t.qid, t.neighbor, t.hamming, t.rnk,
        CAST(CASE WHEN e5.neighbor IS NOT NULL THEN 1 ELSE 0 END
          AS BIGINT) AS in_exact_top5
      FROM top t LEFT JOIN etop e5 USING (qid, neighbor)
      ORDER BY qid, rnk""",
    "q_sim_neardup" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      d AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              CAST(sum(a.v * b.v) AS BIGINT) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
      SELECT va, vb,
        CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
      FROM d JOIN n na ON va = na.vec_id JOIN n nb ON vb = nb.vec_id
      WHERE CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.3
      ORDER BY va, vb""",
    "q_sim_ann_lsh" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      planes AS (
        SELECT t, p, i,
          CASE WHEN CAST('0x' ||
              substr(md5(t || '_' || p || '_' || i), 1, 8) AS BIGINT)
              % 2 = 0
            THEN 1 ELSE -1 END AS sgn
        FROM range(0, 8) rt(t), range(0, 6) rp(p), range(1, 65) ri(i)),
      sd AS (SELECT e.vec_id, pl.t, pl.p,
               CAST(sum(e.v * pl.sgn) AS BIGINT) AS sdot
             FROM e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
      bk AS (SELECT vec_id, t,
               CAST(sum(CASE WHEN sdot > 0
                 THEN (CAST(1 AS BIGINT) << CAST(5 - p AS INT))
                 ELSE 0 END) AS BIGINT) AS bucket
             FROM sd GROUP BY 1, 2),
      a AS (SELECT t, vec_id AS va,
              unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                      xor(bucket, 4), xor(bucket, 8), xor(bucket, 16),
                      xor(bucket, 32)]) AS bucket
            FROM bk),
      b AS (SELECT t, bucket, vec_id AS vb FROM bk),
      cand AS (SELECT DISTINCT va, vb
               FROM a JOIN b USING (t, bucket) WHERE va < vb),
      d AS (SELECT va, vb, CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
            FROM cand JOIN e ea ON ea.vec_id = va
                      JOIN e eb ON eb.vec_id = vb AND ea.i = eb.i
            GROUP BY 1, 2)
      SELECT va, vb,
        CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
      FROM d JOIN n na ON va = na.vec_id JOIN n nb ON vb = nb.vec_id
      WHERE CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.3
      ORDER BY va, vb""",
    "q_sim_ivf" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      probes AS (SELECT vec_id AS qid, cid FROM ccos WHERE vec_id < 10
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) <= 4),
      cand AS (SELECT p.qid, a.vec_id AS neighbor
               FROM probes p JOIN assigned a USING (cid)
               WHERE a.vec_id <> p.qid),
      d AS (SELECT c.qid, c.neighbor,
              CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
            FROM cand c JOIN e ea ON ea.vec_id = c.qid
                        JOIN e eb ON eb.vec_id = c.neighbor AND ea.i = eb.i
            GROUP BY 1, 2),
      scored AS (SELECT qid, neighbor,
              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) *
                sqrt(CAST(nn.n2 AS DOUBLE))) AS cos
            FROM d JOIN n nq ON qid = nq.vec_id
                   JOIN n nn ON neighbor = nn.vec_id)
      SELECT qid, neighbor, cos,
        CAST(row_number() OVER (PARTITION BY qid
          ORDER BY cos DESC, neighbor) AS INT) AS rnk
      FROM scored QUALIFY rnk <= 5 ORDER BY qid, rnk""",
    "q_sim_ivf_delta" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      base AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_base,
                 CAST(sum(vec_id) AS BIGINT) AS idsum_base
               FROM assigned WHERE vec_id % 10 <> 0 GROUP BY cid),
      delta AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_delta,
                  CAST(sum(vec_id) AS BIGINT) AS idsum_delta
                FROM assigned WHERE vec_id % 10 = 0 GROUP BY cid),
      merged AS (SELECT cid,
                   coalesce(n_base, 0) AS n_base,
                   coalesce(n_delta, 0) AS n_delta,
                   coalesce(n_base, 0) + coalesce(n_delta, 0) AS n_merged,
                   coalesce(idsum_base, 0) + coalesce(idsum_delta, 0)
                     AS idsum_merged
                 FROM base FULL OUTER JOIN delta USING (cid))
      SELECT cid, n_base, n_delta, n_merged, idsum_merged,
        CAST(n_delta * 1000 // greatest(n_base, 1) AS BIGINT)
          AS growth_permille,
        CAST(n_merged * 16 * 1000
          // CAST((SELECT sum(n_merged) FROM merged) AS BIGINT) AS BIGINT)
          AS imbalance_permille
      FROM merged ORDER BY cid""",
    "q_sim_ivf_split" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      state AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(vec_id) AS BIGINT) AS idsum
                FROM assigned GROUP BY cid),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM state),
      hot AS (SELECT cid AS hot_cid, n AS hot_n FROM state
              ORDER BY n DESC, cid LIMIT 1),
      members AS (SELECT a.vec_id FROM assigned a
                  JOIN hot ON a.cid = hot_cid),
      two AS (SELECT vec_id FROM members ORDER BY vec_id LIMIT 2),
      seeds AS (SELECT vec_id AS svec,
                  CASE WHEN vec_id = (SELECT min(vec_id) FROM two)
                       THEN 1 ELSE 2 END AS sub
                FROM two),
      dd AS (SELECT a.vec_id, s.sub,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN members m ON a.vec_id = m.vec_id
               JOIN seeds s ON true
               JOIN e b ON b.vec_id = s.svec AND b.i = a.i
             GROUP BY 1, 2),
      reass AS (SELECT dd.vec_id, dd.sub FROM dd
                  JOIN n nv ON dd.vec_id = nv.vec_id
                  JOIN seeds s ON dd.sub = s.sub
                  JOIN n ns ON s.svec = ns.vec_id
                QUALIFY row_number() OVER (PARTITION BY dd.vec_id
                  ORDER BY nv.n2 + ns.n2 - 2 * dd.dot, dd.sub) = 1),
      split_state AS (SELECT (SELECT hot_cid FROM hot) AS cid,
                        CAST(sub AS BIGINT) AS sub,
                        CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(vec_id) AS BIGINT) AS idsum
                      FROM reass GROUP BY sub),
      final AS (SELECT cid, CAST(0 AS BIGINT) AS sub, n, idsum
                FROM state WHERE cid <> (SELECT hot_cid FROM hot)
                UNION ALL SELECT cid, sub, n, idsum FROM split_state)
      SELECT cid, sub, n, idsum,
        n * 17 * 1000 // (SELECT tot FROM tot) AS share_permille,
        (SELECT hot_n FROM hot) * 16 * 1000 // (SELECT tot FROM tot)
          AS trigger_imbalance_permille
      FROM final ORDER BY cid, sub""",
    "q_sim_ivf_rebalance" -> s"""
      WITH e AS MATERIALIZED ($quantSql),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      assigned AS MATERIALIZED (SELECT vec_id, cid FROM ccos
                   QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY ccos DESC, cid) = 1),
      av0 AS MATERIALIZED (SELECT vec_id, cid, CAST(0 AS BIGINT) AS path
              FROM assigned),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM av0),
      ${(1 to 3).map(rebalanceRoundSql).mkString(",")}
      SELECT cid, path, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(vec_id) AS BIGINT) AS idsum,
        CAST(count(*) AS BIGINT) * 16 * 1000 // (SELECT tot FROM tot)
          AS share_permille
      FROM av3 GROUP BY cid, path ORDER BY cid, path""",
    "q_sim_margin_mine" -> s"""
      WITH e AS MATERIALIZED ($quantSql),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      lab AS (SELECT vec_id, label FROM embeddings),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
             GROUP BY 1, 2),
      assigned AS MATERIALIZED (
        SELECT vec_id, cid FROM (
          SELECT cd.vec_id, cid, CAST(dot AS DOUBLE) /
            (sqrt(CAST(nv.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
            AS ccos
          FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                  JOIN n nc ON cid = nc.vec_id)
        QUALIFY row_number() OVER (PARTITION BY vec_id
          ORDER BY ccos DESC, cid) = 1),
      pairs AS MATERIALIZED (
        SELECT dd.x, dd.y, CAST(dd.dot AS DOUBLE) /
          (sqrt(CAST(nx.n2 AS DOUBLE)) * sqrt(CAST(ny.n2 AS DOUBLE)))
          AS cos
        FROM (SELECT ea.vec_id AS x, ab.vec_id AS y,
                CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
              FROM e ea JOIN assigned aa ON ea.vec_id = aa.vec_id
                JOIN assigned ab ON ab.cid = aa.cid
                  AND ab.vec_id <> ea.vec_id
                JOIN e eb ON eb.vec_id = ab.vec_id AND eb.i = ea.i
              GROUP BY 1, 2) dd
        JOIN n nx ON nx.vec_id = dd.x JOIN n ny ON ny.vec_id = dd.y),
      knn AS MATERIALIZED (
        SELECT x, c1, coalesce(c2, 0.0) AS c2, coalesce(c3, 0.0) AS c3,
          coalesce(c4, 0.0) AS c4,
          CAST(1 + (c2 IS NOT NULL)::INT + (c3 IS NOT NULL)::INT +
            (c4 IS NOT NULL)::INT AS BIGINT) AS m
        FROM (
          SELECT x,
            max(CASE WHEN rk = 1 THEN cos END) AS c1,
            max(CASE WHEN rk = 2 THEN cos END) AS c2,
            max(CASE WHEN rk = 3 THEN cos END) AS c3,
            max(CASE WHEN rk = 4 THEN cos END) AS c4
          FROM (SELECT x, cos, row_number() OVER (PARTITION BY x
                  ORDER BY cos DESC, y) AS rk FROM pairs) r
          WHERE rk <= 4 GROUP BY x)
        WHERE c1 IS NOT NULL),
      scored AS (
        SELECT p.x, p.y, lx.label AS label_x, ly.label AS label_y,
          (2.0 * p.cos) /
            ((((kx.c1 + kx.c2) + kx.c3) + kx.c4) / CAST(kx.m AS DOUBLE)
             + (((ky.c1 + ky.c2) + ky.c3) + ky.c4) / CAST(ky.m AS DOUBLE))
            AS margin
        FROM pairs p
        JOIN lab lx ON lx.vec_id = p.x JOIN lab ly ON ly.vec_id = p.y
        JOIN knn kx ON kx.x = p.x JOIN knn ky ON ky.x = p.y
        WHERE lx.label <> ly.label),
      best AS (SELECT x, y, label_x, label_y, margin FROM scored
               QUALIFY row_number() OVER (PARTITION BY x
                 ORDER BY margin DESC, y) = 1)
      SELECT x AS vec_id, y AS match_id, label_x, label_y,
        CAST(round(margin * 1000000) AS BIGINT) AS margin_micro
      FROM best WHERE margin > 1.05 ORDER BY vec_id""",
    "q_sim_ivfpq" -> ivfPqSqlAt(nprobe = 4, m = 4),
    "q_sim_kmeans_step" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      cd0 AS (SELECT a.vec_id, b.vec_id AS cid,
                CAST(sum(a.v * b.v) AS BIGINT) AS dot
              FROM e a JOIN e b ON a.i = b.i AND b.vec_id < 16
              GROUP BY 1, 2),
      s0 AS (SELECT cd0.vec_id, cid,
               CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                 sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
             FROM cd0 JOIN n nv ON cd0.vec_id = nv.vec_id
                      JOIN n nc ON cid = nc.vec_id),
      a0 AS (SELECT vec_id, cid AS cid0 FROM s0
             QUALIFY row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, cid) = 1),
      csum AS (SELECT a0.cid0 AS cid, e.i, CAST(sum(e.v) AS BIGINT) AS s
               FROM a0 JOIN e ON e.vec_id = a0.vec_id GROUP BY 1, 2),
      cn2 AS (SELECT cid, CAST(sum(s * s) AS BIGINT) AS cn2
              FROM csum GROUP BY cid),
      cd1 AS (SELECT e.vec_id, csum.cid,
                CAST(sum(e.v * csum.s) AS BIGINT) AS dot
              FROM e JOIN csum ON e.i = csum.i GROUP BY 1, 2),
      s1 AS (SELECT cd1.vec_id, cd1.cid,
               CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                 sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
             FROM cd1 JOIN n nv ON cd1.vec_id = nv.vec_id
                      JOIN cn2 c ON cd1.cid = c.cid),
      a1 AS (SELECT vec_id, cid AS cid1 FROM s1
             QUALIFY row_number() OVER (PARTITION BY vec_id
               ORDER BY ccos DESC, cid) = 1)
      SELECT a1.cid1, count(*) AS n,
        CAST(sum(CASE WHEN a1.cid1 <> a0.cid0 THEN 1 ELSE 0 END)
          AS BIGINT) AS moved,
        min(a1.vec_id) AS min_vec
      FROM a1 JOIN a0 ON a1.vec_id = a0.vec_id
      GROUP BY a1.cid1 ORDER BY a1.cid1""",
    "q_dedup_semantic" -> s"""
      WITH e AS ($quantSql),
      n AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
            FROM e GROUP BY vec_id),
      k AS (SELECT greatest(64, count(*) // 32) AS k FROM embeddings),
      sdef AS (SELECT greatest(64,
                 CAST(floor(sqrt(64.0 * k)) AS BIGINT)) AS s FROM k),
      vs AS (SELECT a.vec_id, b.vec_id AS sid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i
               AND b.vec_id < (SELECT s FROM sdef)
             GROUP BY 1, 2),
      vsc AS (SELECT vs.vec_id, sid,
                CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                  sqrt(CAST(ns.n2 AS DOUBLE))) AS scos
              FROM vs JOIN n nv ON vs.vec_id = nv.vec_id
                      JOIN n ns ON sid = ns.vec_id),
      vsup AS (SELECT vec_id, sid FROM vsc
               QUALIFY row_number() OVER (PARTITION BY vec_id
                 ORDER BY scos DESC, sid) <= 8),
      sc AS (SELECT vec_id AS cid, sid FROM vsc
             WHERE vec_id < (SELECT k FROM k)
             QUALIFY row_number() OVER (PARTITION BY vec_id
               ORDER BY scos DESC, sid) = 1),
      cd AS (SELECT a.vec_id, b.vec_id AS cid,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
             FROM e a JOIN e b ON a.i = b.i
               AND b.vec_id < (SELECT k FROM k)
             GROUP BY 1, 2),
      ccos AS (SELECT cd.vec_id, cid,
                 CAST(dot AS DOUBLE) / (sqrt(CAST(nv.n2 AS DOUBLE)) *
                   sqrt(CAST(nc.n2 AS DOUBLE))) AS ccos
               FROM cd JOIN n nv ON cd.vec_id = nv.vec_id
                       JOIN n nc ON cid = nc.vec_id),
      restricted AS (SELECT ccos.vec_id, ccos.cid, ccos.ccos
                     FROM ccos
                       JOIN sc ON ccos.cid = sc.cid
                       JOIN vsup ON vsup.vec_id = ccos.vec_id
                         AND vsup.sid = sc.sid),
      probes AS (SELECT vec_id, cid FROM restricted
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) <= 6),
      cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
               FROM probes a JOIN probes b
                 ON a.cid = b.cid AND a.vec_id < b.vec_id),
      pd AS (SELECT va, vb, CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
             FROM cand
             JOIN e ea ON ea.vec_id = va
             JOIN e eb ON eb.vec_id = vb AND eb.i = ea.i
             GROUP BY 1, 2)
      SELECT * FROM (
        SELECT va, vb,
          CAST(pd.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) *
            sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
        FROM pd JOIN n na ON va = na.vec_id JOIN n nb ON vb = nb.vec_id)
      WHERE cos >= 0.3
      ORDER BY va, vb""")

  /** The audit oracle replays all three retrieval pipelines verbatim
    * (each base oracle nests as a subquery) and recomputes the
    * overlap — so the recall number itself is cross-engine-checked. */
  val oracle: Map[String, String] = baseOracle +
    ("q_sim_recall_audit" -> s"""
      WITH exact AS (SELECT qid, neighbor
                     FROM (${baseOracle("q_sim_topk")})),
      ivf AS (SELECT qid, neighbor FROM (${baseOracle("q_sim_ivf")})),
      pq AS (SELECT qid, neighbor FROM (${baseOracle("q_sim_ivfpq")})),
      tot AS (SELECT count(DISTINCT qid) AS nq,
                count(*) AS n_exact FROM exact),
      h AS (SELECT 'ivf' AS method, count(*) AS hits
              FROM ivf JOIN exact USING (qid, neighbor)
            UNION ALL
            SELECT 'ivfpq', count(*)
              FROM pq JOIN exact USING (qid, neighbor))
      SELECT method, nq AS n_queries, CAST(n_exact AS BIGINT) AS n_exact,
        CAST(hits AS BIGINT) AS hits,
        CAST(hits AS BIGINT) * 1000 // n_exact AS recall_permille
      FROM h CROSS JOIN tot ORDER BY method""") +
    ("q_sim_recall_sweep" -> {
      val pts = sweepPoints.map { case (label, np, m, res, rr) =>
        s"p_$label AS (SELECT qid, neighbor FROM (${
          ivfPqSqlAt(np, m, residual = res, rerank = rr)}))"
      }.mkString(",\n      ")
      val hits = sweepPoints.map { case (label, _, _, _, _) =>
        s"SELECT '$label' AS point, count(*) AS hits FROM p_$label JOIN exact USING (qid, neighbor)"
      }.mkString("\n            UNION ALL\n            ")
      s"""
      WITH exact AS (SELECT qid, neighbor
                     FROM (${baseOracle("q_sim_topk")})),
      $pts,
      tot AS (SELECT count(DISTINCT qid) AS nq,
                count(*) AS n_exact FROM exact),
      h AS ($hits)
      SELECT point, nq AS n_queries, CAST(n_exact AS BIGINT) AS n_exact,
        CAST(hits AS BIGINT) AS hits,
        CAST(hits AS BIGINT) * 1000 // n_exact AS recall_permille
      FROM h CROSS JOIN tot ORDER BY point"""
    }) +
    ("q_eval_ranking" -> s"""
      WITH truth AS (SELECT qid, neighbor, CAST(6 - rnk AS BIGINT) AS rel
                     FROM (${baseOracle("q_sim_topk")})),
      sys AS (SELECT qid, neighbor, CAST(rnk AS BIGINT) AS rnk_sys
              FROM (${baseOracle("q_sim_ivfpq")})),
      lg AS (SELECT [1000, 1585, 2000, 2322, 2585] AS t),
      idcg AS (SELECT 5000000000 // t[1] + 4000000000 // t[2]
                 + 3000000000 // t[3] + 2000000000 // t[4]
                 + 1000000000 // t[5] AS v FROM lg),
      j AS (SELECT s.qid, s.rnk_sys, truth.rel
            FROM sys s LEFT JOIN truth
              ON s.qid = truth.qid AND s.neighbor = truth.neighbor)
      SELECT qid, CAST(count(rel) AS BIGINT) AS hits_at_5,
        coalesce(1000000 // min(CASE WHEN rel IS NOT NULL
          THEN rnk_sys END), 0) AS rr_micro,
        CAST(sum(coalesce(rel, 0) * 1000000000
          // (SELECT t FROM lg)[CAST(rnk_sys AS INT)]) AS BIGINT)
          AS dcg_nano,
        CAST(sum(coalesce(rel, 0) * 1000000000
          // (SELECT t FROM lg)[CAST(rnk_sys AS INT)]) AS BIGINT)
          * 1000 // (SELECT v FROM idcg) AS ndcg_permille
      FROM j GROUP BY qid ORDER BY qid""")
}
