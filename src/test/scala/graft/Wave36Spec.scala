package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 wave 36: the Lloyd training loop, the CCNet per-language cut,
  * soft dedup, the attrition waterfall, the JL projection audit, the
  * quality-threshold sweep, and the duplication spectrum — property
  * pins the DuckDB value oracle can't express (monotonicity,
  * conservation, plan-size budgets). */
class Wave36Spec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String): Seq[org.apache.spark.sql.Row] =
    try ops.CorpusOps47.queries(q)(spark, sf).collect().toSeq
    finally CacheScope.release()

  test("kmeans_train conserves members and converges on the fixture") {
    val rows = run("q_sim_kmeans_train")
    val byRound = rows.groupBy(_.getLong(0))
    assert(byRound.keySet == Set(0L, 1L, 2L, 3L))
    val n0 = byRound(0L).map(_.getAs[Long]("n")).sum
    byRound.foreach { case (r, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == n0,
        s"round $r lost members")
    }
    assert(byRound(0L).forall(_.getAs[Long]("moved") == 0L))
    // Lloyd on this fixture settles monotonically (61 -> 31 -> 14 at
    // sf0.001); pin the direction, not the numbers
    val moved = (1 to 3).map(r =>
      byRound(r.toLong).map(_.getAs[Long]("moved")).sum)
    assert(moved.sliding(2).forall(p => p(1) <= p(0)), moved)
    // seed census: every round-0 cid is a seed id carrying itself
    assert(byRound(0L).forall(r =>
      r.getAs[Long]("min_vec") <= r.getAs[Long]("cid")))
  }

  test("kmeans_train plan stays linear in rounds (description budget)") {
    // the rebalance's pathology class: a loop that references the
    // previous round's PLAN (not a persisted frame + literal) makes
    // the description exponential in rounds. The census is a union of
    // per-round aggregates over persisted assignments — its executed
    // plan must stay small.
    val df = ops.CorpusOps47.queries("q_sim_kmeans_train")(spark, sf)
    try {
      df.collect()
      val len = df.queryExecution.executedPlan.toString.length
      assert(len < 1000000, s"plan description $len chars")
    } finally CacheScope.release()
  }

  test("ccnet cut: per-language buckets are ordered, disjoint ranges") {
    val rows = run("q_text_ccnet_cut")
    assert(rows.nonEmpty)
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val by = rs.sortBy(r => rank(r.getString(1)))
      // value-granular cut: bucket rate ranges never interleave
      by.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getAs[Long]("max_rate_nbits") <
            b.getAs[Long]("min_rate_nbits"),
            s"$lang: ${a.getString(1)} overlaps ${b.getString(1)}")
        case _ =>
      }
      // cut1 minimality gives head >= 1/3 of the scored docs
      val tot = rs.map(_.getAs[Long]("n_docs")).sum
      val head = by.head.getAs[Long]("n_docs")
      assert(by.head.getString(1) == "head" && head * 3 >= tot,
        s"$lang head $head of $tot")
    }
  }

  test("softdedup: effective mass <= raw, equal iff no duplicates") {
    val rows = run("q_mix_softdedup")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_tokens")
      val eff = r.getAs[Long]("eff_tokens_milli")
      assert(eff <= raw * 1000, r.toString)
      if (r.getAs[Long]("dup_docs") == 0L)
        assert(eff == raw * 1000, s"no dups but mass shrank: $r")
      else assert(eff < raw * 1000, s"dups but full mass kept: $r")
    }
  }

  test("attrition waterfall is monotone non-increasing per source") {
    val rows = run("q_pipeline_attrition")
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val by = rs.sortBy(_.getLong(0))
      assert(by.map(_.getLong(0)) == Seq(0L, 1L, 2L), s"$src stages")
      Seq("n_docs", "n_tokens").foreach { c =>
        val v = by.map(_.getAs[Long](c))
        assert(v(0) >= v(1) && v(1) >= v(2), s"$src $c $v")
      }
    }
  }

  test("JL projection: sign matrix is fixed ±1; audit covers all pairs") {
    val s = ops.CorpusOps47.rpSigns
    assert(s.size == 8 && s.forall(_.size == 64))
    assert(s.flatten.toSet == Set(1L, -1L)) // both signs occur
    // data-independent: recomputing from the same seeds is identical
    assert(s == ops.CorpusOps47.rpSigns)
    val rows = run("q_emb_rp")
    // sf0.001 has 50 vectors, none identical: all C(50,2) pairs audited
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == 1225L)
    // JL with P=8 is loose but centered: the modal mass sits around
    // ratio 1000 (buckets 5..14), not at the tails
    val mid = rows.filter(r => r.getLong(0) >= 5 && r.getLong(0) <= 14)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(mid * 2 > 1225, s"mid-mass $mid of 1225")
  }

  test("threshold sweep is monotone and anchored at the full corpus") {
    val rows = run("q_select_threshold_sweep")
    assert(rows.map(_.getLong(0)) == (0L to 900L by 100L).toSeq)
    val docs = rows.map(_.getAs[Long]("docs_kept"))
    val toks = rows.map(_.getAs[Long]("tokens_kept"))
    assert(docs.sliding(2).forall(p => p(1) <= p(0)), docs)
    assert(toks.sliding(2).forall(p => p(1) <= p(0)), toks)
    val total = Tables(spark, sf, "documents").count()
    assert(docs.head == total, s"threshold 0 kept ${docs.head}/$total")
  }

  test("duplication spectrum is monotone non-increasing in L") {
    val rows = run("q_dedup_dup_spectrum").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)) == Seq(4L, 8L, 16L))
    // every position covered by a duplicated 16-window lies inside a
    // duplicated 8-subwindow (substrings of a repeat repeat)
    Seq("n_docs_hit", "dup_tokens").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      assert(v(0) >= v(1) && v(1) >= v(2), s"$c $v")
    }
    assert(rows.map(_.getAs[Long]("total_tokens")).distinct.size == 1)
  }
}
