package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 52: the end-to-end datacard pipeline (VERDICT r16 item 4)
  * — per-stage monotonicity, cross-checks against the standalone
  * stage queries, and the facade pin. */
class Wave47Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("pipeline e2e: per-stage monotonicity + allocation conservation") {
    val rows = run(SparkEntry.queries("q_pipeline_e2e")(spark, sf))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nRaw = r.getAs[Long]("n_raw")
      val nGate = r.getAs[Long]("n_gate")
      val nKept = r.getAs[Long]("n_kept")
      // each stage only removes documents
      assert(nGate <= nRaw && nKept <= nGate, s"$r")
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("raw_tokens"),
        s"$r")
      // soft-dedup reweighting never exceeds the gated raw mass
      assert(r.getAs[Long]("eff_tokens_milli") <=
        r.getAs[Long]("raw_tokens") * 1000L, s"$r")
      // BPE emits at least one piece per whitespace word
      if (nKept > 0)
        assert(r.getAs[Long]("bpe_tokens") >=
          r.getAs[Long]("kept_tokens"), s"$r")
      // UniMax never allocates past the 2-epoch cap
      assert(r.getAs[Long]("alloc_tokens") <=
        2L * r.getAs[Long]("bpe_tokens"), s"$r")
    }
    // the waterfill spends the whole budget (total div 2) exactly
    val totBpe = rows.map(_.getAs[Long]("bpe_tokens")).sum
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == totBpe / 2)
  }

  test("pipeline e2e: stage 0 == the attrition waterfall's stage 0") {
    val e2e = run(SparkEntry.queries("q_pipeline_e2e")(spark, sf))
      .map(r => (r.getString(0), r.getAs[Long]("n_raw"),
        r.getAs[Long]("raw_tokens")))
    val att = run(SparkEntry.queries("q_pipeline_attrition")(spark, sf))
      .filter(_.getAs[Long]("stage") == 0L)
      .map(r => (r.getString(1), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
    assert(e2e == att)
  }

  test("pipeline e2e facade == the declared query") {
    val declared = run(SparkEntry.queries("q_pipeline_e2e")(spark, sf))
    val facade = run(api.Graft.pipelineE2e(
      Tables(spark, sf, "documents"), "doc_id", "text", "source"))
    assert(facade.nonEmpty && facade == declared)
  }
}
