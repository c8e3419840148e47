package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 68: the LSH S-curve expectation audit. */
class Wave55Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("s-curve literals: exact, monotone, shaped like the theory") {
    import ops.CorpusOps65.detectPermille
    for ((b, r) <- ops.CorpusOps65.lshPoints) {
      assert(detectPermille(b, r, 0) == 0L)
      // monotone in s, saturating at 1000
      val ds = (0 to 9).map(detectPermille(b, r, _))
      assert(ds == ds.sorted && ds.last <= 1000L, s"($b,$r): $ds")
      // agrees with the IEEE replay of 1 - (1 - s^r)^b to within the
      // floor's 1 permille
      (1 to 9).foreach { k =>
        val p = 1000.0 * (1 - math.pow(1 - math.pow(k / 10.0, r), b))
        assert(math.abs(ds(k) - math.floor(p)) <= 1, s"($b,$r,$k)")
      }
    }
    // more rows per band -> the curve shifts right: at s = 0.3 the
    // (16,2) banding sees far more than (4,8)
    assert(detectPermille(16, 2, 3) > detectPermille(4, 8, 3))
    // the canonical hand value: (16,2) at s=0.5 is 1-(0.75)^16 = .989
    assert(detectPermille(16, 2, 5) == 989L)
  }

  test("expectation audit: fixed grid, conserved pair mass, facade") {
    val declared = run(SparkEntry.queries("q_dedup_lsh_expected")(
      spark, sf))
    assert(declared.size == 30)
    val total = run(api.Graft.lshExpectedDetection(
      Tables(spark, sf, "documents"), "doc_id", "text"))
    assert(total.map(_.toSeq) == declared.map(_.toSeq))
    // every banding point sees the SAME decile histogram
    val byPoint = declared.groupBy(r => (r.getLong(0), r.getLong(1)))
    assert(byPoint.size == 3)
    val hists = byPoint.values.map(_.map(r =>
      r.getLong(2) -> r.getAs[Long]("n_pairs")).toMap).toSeq
    assert(hists.distinct.size == 1)
    assert(hists.head.values.sum > 0)
    declared.foreach { r =>
      val (np, d, e) = (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("detect_permille"),
        r.getAs[Long]("expected_detected"))
      assert(e == np * d / 1000 && e <= np, s"$r")
    }
  }
}
