package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus operators, r17 wave 53 (SURVEY.md §2.M, VERDICT r16 item 5):
  * the SECOND production ANN index family beside IVF — a
  * deterministic graph-based index in the Navigable-Small-World shape
  * (Malkov et al., Information Systems 2014; the flat ancestor of
  * HNSW, Malkov & Yashunin, TPAMI 2018) with a fixed-beam greedy
  * search, plus the recall/cost audit row read beside the IVF
  * trilogy's.
  *
  * Everything is deterministic — no random level draws, no insertion
  * order: the bounded-degree neighbor graph (out-degree ≤ 8, ranked
  * cos desc / id asc) is built from the IVF-cell-blocked candidate
  * stream (top-1 cell of the 16 lowest-id centroids — the library's
  * coarse-quantizer convention) PLUS the navigability hub layer (the
  * K centroid nodes meshed with mutual top-8 edges — the HNSW upper
  * layer flattened; without it the cell-blocked graph is K
  * disconnected components and recall was a measured 84‰); the
  * search enters at the single lowest id, and each of the 4
  * expansion rounds keeps a fixed beam = 16 by exact int64-dot
  * cosine with id tie-breaks. Both build and search are therefore
  * oracle-expressible: the DuckDB replay unrolls the hops as v0→v4 /
  * b0→b3 CTEs (the Viterbi-DP discipline), and the hash gate proves
  * the two engines walk the SAME graph the SAME way. Measured at
  * sf0.01: recall@10 650‰ at 8,466 candidates — on the IVF nprobe
  * frontier (630‰ at 6,273 / 810‰ at 12,499), from a graph walk
  * instead of posting lists.
  *
  * Scale: the graph build is the SemDeDup cell-blocked shape (O(Σ
  * cell²) pair stream, never all-pairs — at production scale the
  * shared resolveCells dial grows K with the corpus via the facade);
  * the search touches ~|beam|·deg candidates per query per hop
  * against the 8n-row edge table (equi-join on the source node,
  * co-partitioned), with the bounded query set broadcast. A 100 TB
  * corpus pays n·(cell + deg) work to build and O(1) per query to
  * search — the same contract HNSW serves in production.
  */
object CorpusOps57 {

  private val DEG = 8
  private val EF = 16
  private val HOPS = 4

  /** Build + search: per query (the 50 lowest ids) the beam-search
    * top-10 as (qid, rk, cid). */
  val qSimNswSearch: Q = (s, dir) =>
    nswSearchFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")), 16)

  /** The recall/cost audit beside q_sim_retrain_recall: one row
    * (n_queries, candidates, recall_at10_permille) of the beam
    * search against the shared brute-force truth. */
  val qSimNswRecall: Q = (s, dir) =>
    nswRecallFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")), 16)

  private def cosc(qa: Column, na: Column, qb: Column,
      nb: Column): Column =
    EmbQuant.dotq(qa, qb).cast("double") /
      (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** The shared chain: persisted norms, the cell-blocked bounded-
    * degree graph, and the per-query visited set after HOPS beam
    * expansions at the deployed EF. Returns (emb, visited) —
    * visited = (qid, cid), query node included. */
  private def chain(emb0: DataFrame, cells: Int,
      bound: Int => Column): (DataFrame, DataFrame) = {
    val (emb, edges, queries) = graphParts(emb0, cells, bound)
    (emb, walk(emb, edges, queries, EF))
  }

  private def normed(emb0: DataFrame): DataFrame =
    graft.CacheScope.track(emb0
      .withColumn("n2", EmbQuant.dotq(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The coarse assignment + RANKED candidate pair streams shared by
    * the deployed graph, the degree sweep, and the delta audit:
    * asg = (vec_id, cid); cellRanked / hubRanked = (src, dst, rk)
    * with rk the per-src cos-desc/id-asc rank (UNfiltered — callers
    * cut at their degree). The hub mesh is the navigability layer
    * (the HNSW upper-layer idea flattened): without it the
    * cell-blocked graph is K disconnected components and a walk can
    * never leave the entry's cell (measured: recall 84‰). */
  private def rankedParts(emb: DataFrame, cells: Int,
      bound: Int => Column): (DataFrame, DataFrame, DataFrame) = {
    // coarse assignment: top-1 of the `cells` lowest-id centroids
    val cents = emb.filter(bound(cells))
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val asg = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cosc(col("q"), col("n2"), col("cq"), col("cn2")).as("ccos"))
      .withColumn("rk", row_number().over(wv)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid"))
    (asg, cellRankedOf(emb, asg), hubRankedOf(cents))
  }

  /** Cell-blocked ranked pair stream off a GIVEN membership — shared
    * by the build and the streaming ingest twin's rollup-on-read
    * (membership is the append-only state; edges are a deterministic
    * function of it). */
  private[graft] def cellRankedOf(emb: DataFrame,
      asg: DataFrame): DataFrame = {
    val m = emb.join(asg, Seq("vec_id"))
    val ma = m.select(col("cid"), col("vec_id").as("src"),
      col("q").as("qs"), col("n2").as("ns"))
    val mb = m.select(col("cid"), col("vec_id").as("dst"),
      col("q").as("qd"), col("n2").as("nd"))
    val wE = Window.partitionBy(col("src"))
      .orderBy(col("ecos").desc, col("dst"))
    ma.join(mb, Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        cosc(col("qs"), col("ns"), col("qd"), col("nd")).as("ecos"))
      .withColumn("rk", row_number().over(wE))
      .select(col("src"), col("dst"), col("rk"))
  }

  /** Hub-mesh ranked pair stream over a centroid frame
    * (cid, cq, cn2). */
  private[graft] def hubRankedOf(cents: DataFrame): DataFrame = {
    val ha = cents.select(col("cid").as("src"), col("cq").as("qs"),
      col("cn2").as("ns"))
    val hb = cents.select(col("cid").as("dst"), col("cq").as("qd"),
      col("cn2").as("nd"))
    val wE = Window.partitionBy(col("src"))
      .orderBy(col("ecos").desc, col("dst"))
    ha.crossJoin(hb)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        cosc(col("qs"), col("ns"), col("qd"), col("nd")).as("ecos"))
      .withColumn("rk", row_number().over(wE))
      .select(col("src"), col("dst"), col("rk"))
  }

  /** Per-cell edge census off a GIVEN membership — the streaming
    * ingest twin's rollup-on-read: the narrow (vec_id, cid)
    * assignment log is the append-only state (map-side vs the frozen
    * quantizer, so batch boundaries can't reorder it), and this
    * census over it equals q_sim_nsw_delta's bit-for-bit. */
  private[graft] def censusFromMembership(emb: DataFrame,
      asg: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val cents = emb.filter(bound(cells))
      .select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2"))
    val edges = edgesAt(cellRankedOf(emb, asg), hubRankedOf(cents), DEG)
    censusOf(edges, asg)
  }

  /** The (cid, n_nodes, n_edges, dst_sum) digest tail shared by the
    * delta audit and the rollup-on-read. */
  private def censusOf(edges: DataFrame, asg: DataFrame): DataFrame = {
    val ec = edges
      .join(asg.select(col("vec_id").as("src"), col("cid")), Seq("src"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_edges"), sum(col("dst")).as("dst_sum"))
    asg.groupBy(col("cid")).agg(count(lit(1)).as("n_nodes"))
      .join(ec, Seq("cid"), "left")
      .select(col("cid"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("dst_sum"), lit(0L)).as("dst_sum"))
      .orderBy(col("cid"))
  }

  /** Cut the ranked pair streams at out-degree `deg` and merge. */
  private def edgesAt(cellRanked: DataFrame, hubRanked: DataFrame,
      deg: Int): DataFrame =
    cellRanked.filter(col("rk") <= deg).select(col("src"), col("dst"))
      .unionByName(hubRanked.filter(col("rk") <= deg)
        .select(col("src"), col("dst")))
      .distinct()

  private def queriesOf(emb: DataFrame,
      bound: Int => Column): DataFrame =
    graft.CacheScope.track(emb.filter(bound(50))
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("n2").as("qn2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Build: persisted norms + the navigable bounded-degree graph +
    * the bounded query set. */
  private def graphParts(emb0: DataFrame, cells: Int,
      bound: Int => Column): (DataFrame, DataFrame, DataFrame) = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emb = normed(emb0)
    val (_, cellRanked, hubRanked) = rankedParts(emb, cells, bound)
    val edges = graft.CacheScope.track(
      edgesAt(cellRanked, hubRanked, DEG).persist(mad))
    (emb, edges, queriesOf(emb, bound))
  }

  /** The greedy beam walk at beam width `ef`: HOPS expansion rounds
    * from the lowest-id entry, per-query visited set returned. */
  private def walk(emb: DataFrame, edges: DataFrame,
      queries: DataFrame, ef: Int): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def scored(vis: DataFrame): DataFrame = vis
      .join(emb.select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2")), Seq("cid"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("cid"),
        cosc(col("cq"), col("cn2"), col("qq"), col("qn2")).as("cos"))
    val entry = emb.agg(min(col("vec_id")).as("cid"))
    val wQ = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    var visited = graft.CacheScope.track(queries.select(col("qid"))
      .crossJoin(broadcast(entry)).persist(mad))
    var beam = visited
    for (_ <- 1 to HOPS) {
      val expand = beam.withColumnRenamed("cid", "src")
        .join(edges, Seq("src"))
        .select(col("qid"), col("dst").as("cid"))
      visited = graft.CacheScope.track(
        visited.unionByName(expand).distinct().persist(mad))
      beam = scored(visited)
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= ef)
        .select(col("qid"), col("cid"))
    }
    visited
  }

  /** The beam-width frontier behind [[qSimNswEfSweep]] and
    * `Graft.nswEfFrontier` — the graph family's QUERY-TIME dial
    * (the nprobe-frontier sibling): ef ∈ {4, 8, 16} walks over ONE
    * shared graph and truth, per ef (ef, n_queries, candidates,
    * recall@10‰). */
  private[graft] def nswEfSweepFrom(emb0: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val (emb, edges, queries) = graphParts(emb0, cells, bound)
    val true10 = graft.CacheScope.track(
      CorpusOps46.topkFrom(emb, bound).persist(mad))
    Seq(4, 8, 16).map { ef =>
      val cand = walk(emb, edges, queries, ef)
        .filter(col("cid") =!= col("qid"))
      val hits = true10.join(cand, Seq("qid", "cid"))
        .agg(count(lit(1)).as("hits"))
      cand.agg(countDistinct(col("qid")).as("n_queries"),
          count(lit(1)).as("candidates"))
        .crossJoin(broadcast(hits))
        .select(lit(ef.toLong).as("ef"), col("n_queries"),
          col("candidates"),
          when(col("n_queries") === 0, lit(0L))
            .otherwise(expr("hits * 1000 div (10 * n_queries)"))
            .as("recall_at10_permille"))
    }.reduce(_ unionAll _).orderBy(col("ef"))
  }

  /** ef frontier over the fixed declared graph (K = 16, deg 8). */
  val qSimNswEfSweep: Q = (s, dir) =>
    nswEfSweepFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")), 16)

  /** The out-degree frontier behind [[qSimNswDegSweep]] and
    * `Graft.nswDegFrontier` — the graph family's BUILD dial (the
    * cells-frontier sibling): deg ∈ {4, 8, 16} graphs cut from ONE
    * ranked pair stream, each walked at the deployed EF; per deg
    * (deg, n_queries, candidates, recall@10‰). The NSW trilogy:
    * deg = build dial, ef = query dial, delta = maintenance dial. */
  private[graft] def nswDegSweepFrom(emb0: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emb = normed(emb0)
    val (_, cellRanked0, hubRanked0) = rankedParts(emb, cells, bound)
    // ONE ranked pair stream serves all three degree cuts
    val cellRanked = graft.CacheScope.track(cellRanked0.persist(mad))
    val hubRanked = graft.CacheScope.track(hubRanked0.persist(mad))
    val queries = queriesOf(emb, bound)
    val true10 = graft.CacheScope.track(
      CorpusOps46.topkFrom(emb, bound).persist(mad))
    Seq(4, 8, 16).map { deg =>
      val edges = graft.CacheScope.track(
        edgesAt(cellRanked, hubRanked, deg).persist(mad))
      val cand = walk(emb, edges, queries, EF)
        .filter(col("cid") =!= col("qid"))
      val hits = true10.join(cand, Seq("qid", "cid"))
        .agg(count(lit(1)).as("hits"))
      cand.agg(countDistinct(col("qid")).as("n_queries"),
          count(lit(1)).as("candidates"))
        .crossJoin(broadcast(hits))
        .select(lit(deg.toLong).as("deg"), col("n_queries"),
          col("candidates"),
          when(col("n_queries") === 0, lit(0L))
            .otherwise(expr("hits * 1000 div (10 * n_queries)"))
            .as("recall_at10_permille"))
    }.reduce(_ unionAll _).orderBy(col("deg"))
  }

  /** deg frontier over the fixed declared quantizer (K = 16). */
  val qSimNswDegSweep: Q = (s, dir) =>
    nswDegSweepFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")), 16)

  /** Incremental-insert audit behind [[qSimNswDelta]] and
    * `Graft.nswInsertAudit` — the graph family's MAINTENANCE dial
    * (the ivf_delta / cc_delta sibling): the 10 HIGHEST-id vectors
    * arrive as the delta batch against the pre-insert base graph.
    * Because edges depend ONLY on cell membership and inserting
    * high ids never moves a centroid (cells = the `cells` lowest
    * ids), the incremental step recomputes edges ONLY for the ≤ 10
    * cells that received a member (over their full membership) and
    * carries every other cell's edge list over unchanged — the
    * DuckDB oracle replays a FULL rebuild, so the hash gate IS the
    * incremental ≡ rebuild theorem. Output: per cell (cid, n_nodes,
    * n_edges, dst_sum) — the post-insert edge census digest.
    * `spark.graft.nsw.fullRebuild=true` flips to the rebuild plan
    * (bit-identical by the theorem — a plan-shape conf, Verify-legal,
    * StressBench-measured as the delta's cost twin). */
  private[graft] def nswDeltaFrom(emb0: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emb = normed(emb0)
    val deltaIds = emb.select(col("vec_id").cast("long"))
      .orderBy(col("vec_id").desc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    require(deltaIds.nonEmpty,
      "nswDelta: empty input — no vectors to insert")
    val isDelta = col("vec_id").isin(deltaIds: _*)
    val rebuild = emb.sparkSession.conf
      .getOption("spark.graft.nsw.fullRebuild").exists(_.toBoolean)
    val (asg0, cellRankedAll, hubRankedAll) =
      rankedParts(emb, cells, bound)
    val asg = graft.CacheScope.track(asg0.persist(mad))
    val edges =
      if (rebuild) edgesAt(cellRankedAll, hubRankedAll, DEG)
      else {
        // the pre-insert artifact: base-corpus cell edges (hub mesh
        // recomputed below — K² is always cheap)
        val base = emb.filter(!isDelta)
        val (_, cellRankedBase, _) = rankedParts(base, cells, bound)
        val baseEdges = cellRankedBase.filter(col("rk") <= DEG)
          .select(col("src"), col("dst"))
        // affected cells: those receiving a delta member (≤ |delta|,
        // a bounded driver fetch)
        val affected = asg.filter(isDelta).select(col("cid")).distinct()
          .collect().map(_.getLong(0)).toSeq
        // carry over unaffected cells; recompute ONLY affected cells
        // over their FULL membership — the pair stream is restricted
        // BEFORE the join, so the step costs Σ affected-cell², not
        // the full rebuild's Σ cell²
        val keep = baseEdges
          .join(asg.select(col("vec_id").as("src"), col("cid")),
            Seq("src"))
          .filter(!col("cid").isin(affected: _*))
          .select(col("src"), col("dst"))
        val mAff = emb.join(
          asg.filter(col("cid").isin(affected: _*)), Seq("vec_id"))
        val aa = mAff.select(col("cid"), col("vec_id").as("src"),
          col("q").as("qs"), col("n2").as("ns"))
        val ab = mAff.select(col("cid"), col("vec_id").as("dst"),
          col("q").as("qd"), col("n2").as("nd"))
        val wE = Window.partitionBy(col("src"))
          .orderBy(col("ecos").desc, col("dst"))
        val recomputed = aa.join(ab, Seq("cid"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"),
            cosc(col("qs"), col("ns"), col("qd"), col("nd"))
              .as("ecos"))
          .withColumn("rk", row_number().over(wE))
          .filter(col("rk") <= DEG)
          .select(col("src"), col("dst"))
        val hubs = hubRankedAll.filter(col("rk") <= DEG)
          .select(col("src"), col("dst"))
        keep.unionByName(recomputed).unionByName(hubs).distinct()
      }
    censusOf(edges, asg)
  }

  /** delta-insert audit over the fixed declared quantizer (K = 16). */
  val qSimNswDelta: Q = (s, dir) =>
    nswDeltaFrom(
      EmbQuant.quantized(s, dir).select(col("vec_id"), col("q")), 16)

  /** The search behind [[qSimNswSearch]] and `Graft.nswSearch`:
    * `emb0` = (vec_id, q); `bound` as everywhere (declared = the
    * literal `vec_id < k` the oracle replays). */
  private[graft] def nswSearchFrom(emb0: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val (emb, visited) = chain(emb0, cells, bound)
    val queries = emb.filter(bound(50))
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("n2").as("qn2"))
    val wQ = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    visited.filter(col("cid") =!= col("qid"))
      .join(emb.select(col("vec_id").as("cid"), col("q").as("cq"),
        col("n2").as("cn2")), Seq("cid"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("cid"),
        cosc(col("cq"), col("cn2"), col("qq"), col("qn2")).as("cos"))
      .withColumn("rk", row_number().over(wQ).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("rk"), col("cid"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The audit behind [[qSimNswRecall]] and `Graft.nswRecallAudit`:
    * recall@10 of the beam search vs the shared brute-force truth +
    * candidates actually scored. */
  private[graft] def nswRecallFrom(emb0: DataFrame, cells: Int,
      bound: Int => Column = BoundedIds.literal("vec_id")): DataFrame = {
    val (emb, visited) = chain(emb0, cells, bound)
    val true10 = CorpusOps46.topkFrom(emb, bound)
    val cand = visited.filter(col("cid") =!= col("qid"))
    val hits = true10.join(cand, Seq("qid", "cid"))
      .agg(count(lit(1)).as("hits"))
    cand.agg(countDistinct(col("qid")).as("n_queries"),
        count(lit(1)).as("candidates"))
      .crossJoin(broadcast(hits))
      .select(col("n_queries"), col("candidates"),
        when(col("n_queries") === 0, lit(0L))
          .otherwise(expr("hits * 1000 div (10 * n_queries)"))
          .as("recall_at10_permille"))
      .orderBy(col("n_queries"))
  }

  val queries: Map[String, Q] = Map(
    "q_sim_nsw_search" -> qSimNswSearch,
    "q_sim_nsw_recall" -> qSimNswRecall,
    "q_sim_nsw_ef_sweep" -> qSimNswEfSweep,
    "q_sim_nsw_deg_sweep" -> qSimNswDegSweep,
    "q_sim_nsw_delta" -> qSimNswDelta)

  // ----------------------------------------------------------------
  // DuckDB oracle: the same build + the hops unrolled as CTEs
  // ----------------------------------------------------------------

  /** cosine ORDER BY fragment over a dot/norm join. */
  private def cosSql(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * " +
      s"sqrt(CAST($nb AS DOUBLE)))"

  /** One unrolled beam hop (CTE names prefixed by `p`, beam width
    * `ef`): expand b{h-1} through the edges, union into v{h}, score,
    * keep the ef-beam b{h}. */
  private def hopSql(h: Int, p: String, ef: Int,
      edgesName: String = "edges"): String = s"""
      x$p$h AS (SELECT DISTINCT b.qid, ed.dst AS cid
              FROM b$p${h - 1} b JOIN $edgesName ed ON ed.src = b.cid),
      v$p$h AS MATERIALIZED (SELECT qid, cid FROM v$p${h - 1}
                           UNION SELECT qid, cid FROM x$p$h),
      s$p$h AS MATERIALIZED (
        SELECT v.qid, v.cid, CAST(sum(ea.v * eb.v) AS BIGINT) AS dot
        FROM v$p$h v JOIN e ea ON ea.vec_id = v.cid
                   JOIN e eb ON eb.vec_id = v.qid AND ea.i = eb.i
        GROUP BY 1, 2),
      b$p$h AS (SELECT qid, cid FROM (
          SELECT s.qid, s.cid, row_number() OVER (PARTITION BY s.qid
            ORDER BY ${cosSql("s.dot", "nc.n2", "nq.n2")} DESC, s.cid)
            AS rk
          FROM s$p$h s JOIN n nc ON s.cid = nc.vec_id
                     JOIN n nq ON s.qid = nq.vec_id) t
        WHERE rk <= $ef)"""

  /** One full walk (entry seed + HOPS hops) at beam width `ef`,
    * CTE names prefixed by `p` — `p` = "" reproduces the deployed
    * chain's v0…v$HOPS names byte-for-byte. */
  private def walkSql(p: String, ef: Int,
      edgesName: String = "edges"): String = s"""
      v${p}0 AS (SELECT qid, (SELECT cid FROM ent) AS cid FROM q),
      b${p}0 AS (SELECT qid, cid FROM v${p}0),
      ${(1 to HOPS).map(hopSql(_, p, ef, edgesName)).mkString(",")}"""

  /** The shared build + walk chain through v$HOPS / s$HOPS. */
  private def chainSql: String = s"$buildSql,\n${walkSql("", EF)}"

  /** The graph build: e/n, coarse assignment, cell edges + hub
    * edges, query set and entry point. */
  private def buildSql: String = s"""
      e AS MATERIALIZED (${Similarity.quantSql}),
      n AS MATERIALIZED (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
                         FROM e GROUP BY vec_id),
      cdots AS (SELECT a.vec_id, b.vec_id AS cid,
                  CAST(sum(a.v * b.v) AS BIGINT) AS dot
                FROM e a JOIN e b ON b.vec_id < 16 AND a.i = b.i
                GROUP BY 1, 2),
      asg AS MATERIALIZED (SELECT vec_id, cid FROM (
          SELECT d.vec_id, d.cid, row_number() OVER (
              PARTITION BY d.vec_id
              ORDER BY ${cosSql("d.dot", "nc.n2", "nv.n2")} DESC, d.cid)
            AS rk
          FROM cdots d JOIN n nv ON d.vec_id = nv.vec_id
                       JOIN n nc ON d.cid = nc.vec_id) t
        WHERE rk = 1),
      pdots AS (SELECT x.vec_id AS src, y.vec_id AS dst,
                  CAST(sum(ex.v * ey.v) AS BIGINT) AS dot
                FROM asg x JOIN asg y
                  ON x.cid = y.cid AND x.vec_id <> y.vec_id
                JOIN e ex ON ex.vec_id = x.vec_id
                JOIN e ey ON ey.vec_id = y.vec_id AND ex.i = ey.i
                GROUP BY 1, 2),
      cedges AS (SELECT src, dst FROM (
          SELECT p.src, p.dst, row_number() OVER (PARTITION BY p.src
              ORDER BY ${cosSql("p.dot", "ns.n2", "nd.n2")} DESC, p.dst)
            AS rk
          FROM pdots p JOIN n ns ON p.src = ns.vec_id
                       JOIN n nd ON p.dst = nd.vec_id) t
        WHERE rk <= $DEG),
      hdots AS (SELECT x.vec_id AS src, y.vec_id AS dst,
                  CAST(sum(x.v * y.v) AS BIGINT) AS dot
                FROM e x JOIN e y ON x.vec_id < 16 AND y.vec_id < 16
                  AND x.vec_id <> y.vec_id AND x.i = y.i
                GROUP BY 1, 2),
      hedges AS (SELECT src, dst FROM (
          SELECT h.src, h.dst, row_number() OVER (PARTITION BY h.src
              ORDER BY ${cosSql("h.dot", "ns.n2", "nd.n2")} DESC, h.dst)
            AS rk
          FROM hdots h JOIN n ns ON h.src = ns.vec_id
                       JOIN n nd ON h.dst = nd.vec_id) t
        WHERE rk <= $DEG),
      edges AS MATERIALIZED (SELECT src, dst FROM cedges
                             UNION SELECT src, dst FROM hedges),
      q AS (SELECT vec_id AS qid FROM e WHERE vec_id < 50
            GROUP BY vec_id),
      ent AS (SELECT min(vec_id) AS cid FROM e)"""

  /** The brute-force truth CTEs (dots + true10) shared by the recall
    * audit and the ef sweep. */
  private def truthSql: String = s"""
      dots AS (SELECT a.vec_id AS qid, b.vec_id AS cid,
                 CAST(sum(a.v * b.v) AS BIGINT) AS dot
               FROM e a JOIN e b ON a.vec_id < 50
                 AND b.vec_id <> a.vec_id AND a.i = b.i
               GROUP BY 1, 2),
      true10 AS (SELECT qid, cid FROM (
          SELECT d.qid, d.cid, row_number() OVER (PARTITION BY d.qid
              ORDER BY ${cosSql("d.dot", "nc.n2", "nq.n2")} DESC, d.cid)
            AS rk
          FROM dots d JOIN n nq ON d.qid = nq.vec_id
                      JOIN n nc ON d.cid = nc.vec_id) t WHERE rk <= 10)"""

  /** One frontier row off a finished walk's v$p$HOPS, labeled
    * `label` = `value` (ef for the beam sweep, deg for the degree
    * sweep). */
  private def frontierRowSql(p: String, label: String,
      value: Int): String = s"""
      cand$p AS (SELECT qid, cid FROM v$p$HOPS WHERE cid <> qid),
      row$p AS (SELECT CAST($value AS BIGINT) AS $label,
        CAST((SELECT count(DISTINCT qid) FROM cand$p) AS BIGINT)
          AS n_queries,
        CAST((SELECT count(*) FROM cand$p) AS BIGINT) AS candidates,
        CAST((SELECT count(*) FROM true10 t JOIN cand$p c
               ON t.qid = c.qid AND t.cid = c.cid) * 1000 //
          (10 * (SELECT count(DISTINCT qid) FROM cand$p)) AS BIGINT)
          AS recall_at10_permille)"""

  val oracle: Map[String, String] = Map(
    "q_sim_nsw_search" -> s"""
      WITH $chainSql
      SELECT qid, CAST(rk AS BIGINT) AS rk, cid FROM (
        SELECT s.qid, s.cid, row_number() OVER (PARTITION BY s.qid
            ORDER BY ${cosSql("s.dot", "nc.n2", "nq.n2")} DESC, s.cid)
          AS rk
        FROM s$HOPS s JOIN n nc ON s.cid = nc.vec_id
                      JOIN n nq ON s.qid = nq.vec_id
        WHERE s.cid <> s.qid) t
      WHERE rk <= 10 ORDER BY qid, rk""",
    "q_sim_nsw_recall" -> s"""
      WITH $chainSql,
      $truthSql,
      cand AS (SELECT qid, cid FROM v$HOPS WHERE cid <> qid)
      SELECT CAST((SELECT count(DISTINCT qid) FROM cand) AS BIGINT)
          AS n_queries,
        CAST((SELECT count(*) FROM cand) AS BIGINT) AS candidates,
        CAST((SELECT count(*) FROM true10 t JOIN cand c
               ON t.qid = c.qid AND t.cid = c.cid) * 1000 //
          (10 * (SELECT count(DISTINCT qid) FROM cand)) AS BIGINT)
          AS recall_at10_permille""",
    "q_sim_nsw_ef_sweep" -> s"""
      WITH $buildSql,
      ${walkSql("f4_", 4)},
      ${walkSql("f8_", 8)},
      ${walkSql("f16_", 16)},
      $truthSql,
      ${frontierRowSql("f4_", "ef", 4)},
      ${frontierRowSql("f8_", "ef", 8)},
      ${frontierRowSql("f16_", "ef", 16)}
      SELECT * FROM rowf4_ UNION ALL SELECT * FROM rowf8_
      UNION ALL SELECT * FROM rowf16_ ORDER BY ef""",
    "q_sim_nsw_deg_sweep" -> s"""
      WITH $buildSql,
      cranked AS MATERIALIZED (
        SELECT p.src, p.dst, row_number() OVER (PARTITION BY p.src
            ORDER BY ${cosSql("p.dot", "ns.n2", "nd.n2")} DESC, p.dst)
          AS rk
        FROM pdots p JOIN n ns ON p.src = ns.vec_id
                     JOIN n nd ON p.dst = nd.vec_id),
      hranked AS (
        SELECT h.src, h.dst, row_number() OVER (PARTITION BY h.src
            ORDER BY ${cosSql("h.dot", "ns.n2", "nd.n2")} DESC, h.dst)
          AS rk
        FROM hdots h JOIN n ns ON h.src = ns.vec_id
                     JOIN n nd ON h.dst = nd.vec_id),
      ${Seq(4, 8, 16).map(d => s"""
        edges$d AS MATERIALIZED (
          SELECT src, dst FROM cranked WHERE rk <= $d
          UNION SELECT src, dst FROM hranked WHERE rk <= $d)""")
        .mkString(",")},
      ${Seq(4, 8, 16).map(d => walkSql(s"g${d}_", EF, s"edges$d"))
        .mkString(",")},
      $truthSql,
      ${Seq(4, 8, 16).map(d => frontierRowSql(s"g${d}_", "deg", d))
        .mkString(",")}
      SELECT * FROM rowg4_ UNION ALL SELECT * FROM rowg8_
      UNION ALL SELECT * FROM rowg16_ ORDER BY deg""",
    "q_sim_nsw_delta" -> s"""
      WITH $buildSql,
      cnt AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_nodes
              FROM asg GROUP BY cid),
      ec AS (SELECT a.cid, CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(ed.dst) AS BIGINT) AS dst_sum
             FROM edges ed JOIN asg a ON a.vec_id = ed.src
             GROUP BY a.cid)
      SELECT c.cid, c.n_nodes,
        CAST(coalesce(e2.n_edges, 0) AS BIGINT) AS n_edges,
        CAST(coalesce(e2.dst_sum, 0) AS BIGINT) AS dst_sum
      FROM cnt c LEFT JOIN ec e2 USING (cid) ORDER BY cid""")
}
