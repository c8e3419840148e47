package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 47: tokenizer-vocab overlap, perplexity length bias,
  * Gopher-vs-C4 McNemar — cross-query consistency invariants. */
class Wave43Spec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String): Seq[org.apache.spark.sql.Row] =
    try ops.CorpusOps53.queries(q)(spark, sf).collect().toSeq
    finally CacheScope.release()

  test("tokenizer overlap: set algebra is consistent") {
    val rows = run("q_tok_algo_overlap")
    assert(rows.size == 1)
    val r = rows.head
    val (nb, nu, nc) = (r.getAs[Long]("n_bpe"),
      r.getAs[Long]("n_unigram"), r.getAs[Long]("n_common"))
    assert(nb > 0 && nu > 0)
    assert(nc <= math.min(nb, nu))
    assert(r.getAs[Long]("jaccard_permille") ==
      nc * 1000 / (nb + nu - nc))
  }

  test("ppl length bias: buckets are exact powers of two") {
    val rows = run("q_text_ppl_length_bias")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("len_bucket")
      assert(r.getAs[Long]("min_bigrams") >= (1L << b))
      assert(r.getAs[Long]("max_bigrams") < (1L << (b + 1)))
      assert(r.getAs[Long]("min_rate_nbits") <=
        r.getAs[Long]("mean_rate_nbits"))
      assert(r.getAs[Long]("mean_rate_nbits") <=
        r.getAs[Long]("max_rate_nbits"))
    }
  }

  test("nbQualityConfusion facade == the declared trainer's table") {
    val flagged = ops.CorpusOps46.gopherFlagged(
      Tables(spark, sf, "documents")
        .select(col("doc_id"), col("source"), col("text")),
      Seq("doc_id", "source", "text"))
    val f = try api.Graft.nbQualityConfusion(flagged, "doc_id", "text",
        "source", col("r_all"), col("doc_id") % 2 === 0)
        .collect().toSeq
      finally CacheScope.release()
    val declared = try ops.CorpusOps50
        .queries("q_quality_nb_train")(spark, sf).collect().toSeq
      finally CacheScope.release()
    // facade emits the raw confusion; declared adds accuracy — compare
    // the shared prefix columns
    val dPrefix = declared.map(r => (r.getString(0),
      r.getAs[Long]("n_eval"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")))
    val fAll = f.map(r => (r.getString(0),
      r.getAs[Long]("n_eval"), r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))).sortBy(_._1)
    assert(fAll.nonEmpty && fAll == dPrefix.sortBy(_._1))
  }

  test("mcnemar: cells partition docs and agree with both batteries") {
    val rows = run("q_eval_mcnemar")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("both_pass") + r.getAs[Long]("gopher_only") +
        r.getAs[Long]("c4_only") + r.getAs[Long]("neither") ==
        r.getAs[Long]("n_docs"))
    }
    // marginals must match the two rule batteries' own conjunctions
    val gopher = try ops.CorpusOps46
        .queries("q_text_gopher_rules")(spark, sf).collect().toSeq
      finally CacheScope.release()
    val gBy = gopher.map(r =>
      r.getString(0) -> r.getAs[Long]("pass_all")).toMap
    val c4 = try ops.CorpusOps50
        .queries("q_text_c4_rules")(spark, sf).collect().toSeq
      finally CacheScope.release()
    val cBy = c4.map(r =>
      r.getString(0) -> r.getAs[Long]("pass_all")).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("both_pass") + r.getAs[Long]("gopher_only")
        == gBy(src), s"$src gopher marginal")
      assert(r.getAs[Long]("both_pass") + r.getAs[Long]("c4_only")
        == cBy(src), s"$src c4 marginal")
    }
  }
}
