package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 48: the retrain recall audit completing the IVF tuning
  * trilogy — consistency with the census audit + facade pin. */
class Wave44Spec extends AnyFunSuite {
  import TestSpark._

  test("lm coverage: rates nested (unknown <= context <= oov)") {
    val rows = try ops.CorpusOps55
        .queries("q_text_lm_coverage")(spark, sf).collect().toSeq
      finally CacheScope.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // an unknown token implies an unseen context implies an OOV
      // bigram, so the rates are nested by construction
      val oov = r.getAs[Long]("oov_permille")
      val ctx = r.getAs[Long]("unseen_context_permille")
      val unk = r.getAs[Long]("unknown_token_permille")
      assert(unk <= oov && ctx <= oov, s"$r")
      assert(oov >= 0 && oov <= 1000)
    }
  }

  test("retrain recall: both quantizers answer all 50 queries") {
    val rows = try ops.CorpusOps54
        .queries("q_sim_retrain_recall")(spark, sf).collect().toSeq
      finally CacheScope.release()
    assert(rows.map(_.getString(0)) == Seq("seed", "trained"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 50L)
      assert(r.getAs[Long]("candidates") > 0L)
      assert(r.getAs[Long]("recall_at10_permille") >= 0 &&
        r.getAs[Long]("recall_at10_permille") <= 1000)
    }
    // the trained quantizer's candidate total must match the census:
    // every vector is assigned exactly once under both quantizers, so
    // candidates = sum over probed cells of (cell size minus self hits)
    // — bounded above by nprobe * corpus
    val n = Tables(spark, sf, "embeddings").count()
    rows.foreach(r => assert(r.getAs[Long]("candidates") <= 4 * 50 * n))
    val f = try api.Graft.retrainRecallAudit(
        Tables(spark, sf, "embeddings"), "vec_id", "embedding")
        .collect().toSeq
      finally CacheScope.release()
    assert(f == rows)
  }
}
