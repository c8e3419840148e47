package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: key hygiene, smoke rows, determinism. */
class SparkEntrySpec extends AnyFunSuite {
  import TestSpark._

  test("module query keys are globally unique") {
    // Derived from SparkEntry.modules itself so a newly registered module
    // can never silently drift out of this check (the r9 lesson: a
    // hand-maintained copy of the module list pinned a stale count).
    val keys = SparkEntry.modules.flatMap(_._1.keys)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    assert(SparkEntry.queries.size == keys.size)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("representative queries are run-to-run deterministic") {
    for (name <- Seq("q1_pricing_summary", "q_window_rank", "q_sim_topk",
        "q_dedup_minhash", "q_stream_session", "q_agg_theta_sketch",
        "q_ts_sessionize",
        // r8 additions: the cache-serve path must round-trip values
        // bit-exact; semantic dedup's probe ranking must tie-break
        // deterministically
        "q_results_cache_hit", "q_dedup_semantic", "q_policy_view",
        // r8 wave 2: fixed-point LM sums and bloom bit probes must be
        // partition-order invariant
        "q_text_perplexity", "q_dedup_bloom",
        // r8 wave 3: centroid argmax tie-break + gram cell sums;
        // min_by/max_by open-close selection must be order-invariant
        "q_emb_classify", "q_emb_gram", "q_ts_downsample",
        // integer fixed-point trajectories must not drift across runs
        "q_graph_pagerank", "q_dq_anomaly", "q_src_schema_merge",
        // r8 wave 4: triangle census — degree-orientation ties must
        // break on node id, not partition order; k-core survivor sets
        // and basket lift ranks likewise
        "q_graph_triangles", "q_graph_kcore", "q_basket_pairs",
        // r9 wave: fixed-point log scores, collect_list posting order
        // (sorted), bottom-k cosine tie-breaks and lag-chain EWMA must
        // all be partition-order invariant
        "q_text_bm25", "q_text_entropy", "q_index_postings",
        "q_index_delta", "q_emb_outliers", "q_text_zipf", "q_ts_ewma")) {
      val a = SparkEntry.queries(name)(spark, sf).collect().toSeq
      val b = SparkEntry.queries(name)(spark, sf).collect().toSeq
      assert(a == b, s"$name not deterministic across runs")
    }
  }
}
