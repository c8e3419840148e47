package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 50: the k-lowest-ids discipline generalized to every
  * bounded-set facade (VERDICT r16 item 1 — a frame whose ids start
  * at 100 must draw the SAME bounded query/seed sets as a dense one,
  * not silently return empty), plus the r16 ADVICE fixes (newline-
  * proof C4 terminal punctuation, int64 unimax budget, non-string
  * unimax group columns). */
class Wave45Spec extends AnyFunSuite {
  import TestSpark._

  // The red-before shape: every id shifted by +100. Shifting is order-
  // preserving, so the k-lowest sets contain the SAME vectors and every
  // id-free output column must be bit-identical to the unshifted run.
  private def embs = Tables(spark, sf, "embeddings")
  private def shifted = embs.select(
    (col("vec_id") + 100).as("vec_id"), col("embedding"), col("label"))

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("retrieval facades survive non-dense ids (red before r17)") {
    assert(run(api.Graft.retrievalRecall(shifted, "vec_id",
        "embedding", "label")) ==
      run(api.Graft.retrievalRecall(embs, "vec_id", "embedding",
        "label")))
    assert(run(api.Graft.retrievalMrr(shifted, "vec_id", "embedding",
        "label")) ==
      run(api.Graft.retrievalMrr(embs, "vec_id", "embedding", "label")))
    assert(run(api.Graft.retrievalNdcg(shifted, "vec_id", "embedding",
        "label")) ==
      run(api.Graft.retrievalNdcg(embs, "vec_id", "embedding",
        "label")))
  }

  test("IVF frontier + retrain facades survive non-dense ids") {
    val cells = run(api.Graft.ivfCellsFrontier(shifted, "vec_id",
      "embedding"))
    assert(cells ==
      run(api.Graft.ivfCellsFrontier(embs, "vec_id", "embedding")))
    cells.foreach(r => assert(r.getAs[Long]("n_queries") > 0L))
    val np = run(api.Graft.ivfNprobeFrontier(shifted, "vec_id",
      "embedding"))
    assert(np ==
      run(api.Graft.ivfNprobeFrontier(embs, "vec_id", "embedding")))
    val rr = run(api.Graft.retrainRecallAudit(shifted, "vec_id",
      "embedding"))
    assert(rr ==
      run(api.Graft.retrainRecallAudit(embs, "vec_id", "embedding")))
    // the ADVICE failure: shifted ids made the seed quantizer empty →
    // n_queries = 0 and a null recall row; now both rows answer fully
    rr.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 50L, s"$r")
      assert(!r.isNullAt(r.fieldIndex("recall_at10_permille")), s"$r")
    }
  }

  test("bounded-set facades raise loudly on an empty frame") {
    val empty = embs.filter(col("vec_id") < 0)
    val e = intercept[IllegalArgumentException] {
      api.Graft.retrievalRecall(empty, "vec_id", "embedding", "label")
    }
    assert(e.getMessage.contains("empty"))
    intercept[IllegalArgumentException] {
      api.Graft.retrainRecallAudit(empty, "vec_id", "embedding")
    }
  }

  test("C4 terminal-punct rule is newline-proof (ADVICE r16)") {
    import spark.implicits._
    // Java regex '$' matches before a final '\n'; the RE2 oracle does
    // not — both engines now compare the literal last character
    val docs = Seq(
      ("a", "One two three. Four five! Six seven."),
      ("a", "One two three. Four five! Six seven.\n"),
      ("a", "One two three. Four five! Six seven")).toDF("src", "text")
    val r = run(api.Graft.c4Rules(docs, "text", "src"))
    assert(r.head.getAs[Long]("pass_terminal") == 1L)
  }

  test("unimax: non-string group column + int64 budget discipline") {
    import spark.implicits._
    val obs = Seq((1, 100L), (2, 1000L), (3, 10L))
      .toDF("grp_id", "ntok")
    val r = run(api.Graft.unimaxAllocation(obs, "ntok", "grp_id",
      budget = 555L))
    assert(r.map(_.getString(0)) == Seq("1", "2", "3"))
    assert(r.map(_.getAs[Long]("alloc_tokens")).sum == 555L)
    // small group saturates its 2-epoch cap, big group absorbs slack
    val byGrp = r.map(x => x.getString(0) ->
      x.getAs[Long]("alloc_tokens")).toMap
    assert(byGrp("3") == 20L && byGrp("1") == 200L && byGrp("2") == 335L)
  }
}
