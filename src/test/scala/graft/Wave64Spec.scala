package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 78: paired blocker disagreement (McNemar cells). */
class Wave64Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("blocker mcnemar: cells reconcile with the blocking audit") {
    val cells = run(
      SparkEntry.queries("q_dedup_blocker_mcnemar")(spark, sf))
    val audit = run(
      SparkEntry.queries("q_dedup_blocking_audit")(spark, sf))
      .map(r => r.getString(0) -> r).toMap
    assert(cells.size == 3)
    val tt = audit("shingle_index").getAs[Long]("truth_total")
    cells.foreach { r =>
      val (b, a, c, n) = (r.getAs[Long]("both_hit"),
        r.getAs[Long]("a_only"), r.getAs[Long]("b_only"),
        r.getAs[Long]("neither"))
      assert(r.getAs[Long]("truth_total") == tt, s"$r")
      assert(b >= 0 && a >= 0 && c >= 0 && n >= 0, s"$r")
      assert(b + a + c + n == tt, s"$r")
      val mm = r.getAs[Long]("mcnemar_milli")
      assert(mm == (if (a + c == 0) 0L
        else (a - c) * (a - c) * 1000 / (a + c)), s"$r")
    }
    // each blocker's row marginal (both + own_only) equals its
    // n_true in the blocking audit — the two tables census the same
    // hit sets
    val byPair = cells.map(r => r.getString(0) -> r).toMap
    def marg(pair: String, first: Boolean): Long = {
      val r = byPair(pair)
      r.getAs[Long]("both_hit") +
        r.getAs[Long](if (first) "a_only" else "b_only")
    }
    assert(marg("shingle_vs_simhash", true) ==
      audit("shingle_index").getAs[Long]("n_true"))
    assert(marg("shingle_vs_simhash", false) ==
      audit("simhash_block").getAs[Long]("n_true"))
    assert(marg("simhash_vs_winnow", false) ==
      audit("winnow_fp").getAs[Long]("n_true"))
    // consistency across rows: the same blocker's marginal is
    // identical whichever pairing reports it
    assert(marg("shingle_vs_winnow", true) ==
      marg("shingle_vs_simhash", true))
    assert(marg("simhash_vs_winnow", true) ==
      marg("shingle_vs_simhash", false))
  }

  test("blocker mcnemar: facade == declared") {
    val declared = run(
      SparkEntry.queries("q_dedup_blocker_mcnemar")(spark, sf))
    val facade = run(api.Graft.blockerMcnemar(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
