package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 76: BLEU ingredients. */
class Wave62Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("bleu: identical pair scores 1000 at every order; disjoint 0") {
    val docs = Seq(
      (0L, "a", "the cat sat on the mat"),
      (1L, "a", "the cat sat on the mat"),
      (2L, "b", "alpha beta gamma delta"),
      (3L, "b", "epsilon zeta eta theta iota")).toDF("id", "g", "text")
    val r = run(api.Graft.bleuOverlap(docs, "id", "text", "g"))
      .map(x => (x.getString(0), x.getAs[Long]("n")) -> x).toMap
    assert(r.size == 8)
    (1L to 4L).foreach { n =>
      val a = r(("a", n))
      assert(a.getAs[Long]("bleu_p_permille") == 1000L &&
        a.getAs[Long]("len_ratio_permille") == 1000L, s"$a")
      // an n-gram order has len - n + 1 grams per doc
      assert(a.getAs[Long]("cand_ngrams") == 7L - n &&
        a.getAs[Long]("overlap") == 7L - n, s"$a")
      val b = r(("b", n))
      assert(b.getAs[Long]("overlap") == 0L &&
        b.getAs[Long]("bleu_p_permille") == 0L, s"$b")
    }
    // brevity ingredients ride every row and are the n = 1 totals
    assert(r(("b", 3L)).getAs[Long]("cand_len") == 5L &&
      r(("b", 3L)).getAs[Long]("ref_len") == 4L &&
      r(("b", 3L)).getAs[Long]("len_ratio_permille") == 1250L)
  }

  test("bleu: clipping caps repeated grams at the reference count") {
    // the canonical BLEU pathology: a candidate of all "the" scores
    // clip("the") = ref count (2), not its own 7
    val docs = Seq(
      (0L, "a", "the cat sat on the mat"),
      (1L, "a", "the the the the the the the")).toDF("id", "g", "text")
    val r = run(api.Graft.bleuOverlap(docs, "id", "text", "g"))
      .map(x => x.getAs[Long]("n") -> x).toMap
    assert(r(1L).getAs[Long]("overlap") == 2L &&
      r(1L).getAs[Long]("cand_ngrams") == 7L &&
      r(1L).getAs[Long]("bleu_p_permille") == 285L, s"${r(1L)}")
    assert(r(2L).getAs[Long]("overlap") == 0L)
  }

  test("bleu: n = 1 row == rouge's n = 1 row; facade == declared") {
    val declared = run(SparkEntry.queries("q_eval_bleu")(spark, sf))
    val rouge = run(SparkEntry.queries("q_eval_rouge")(spark, sf))
      .filter(_.getAs[Long]("n") == 1L)
      .map(r => r.getString(0) -> r).toMap
    declared.foreach { r =>
      val (o, c, rf) = (r.getAs[Long]("overlap"),
        r.getAs[Long]("cand_ngrams"), r.getAs[Long]("ref_ngrams"))
      assert(o <= c && o <= rf, s"$r")
      // precisions are monotone non-increasing in n only per-pair;
      // at the corpus micro level we pin the shared-pipeline identity
      // instead: the n = 1 row is rouge's n = 1 row exactly
      if (r.getAs[Long]("n") == 1L) {
        val x = rouge(r.getString(0))
        assert(o == x.getAs[Long]("overlap") &&
          c == x.getAs[Long]("cand_ngrams") &&
          rf == x.getAs[Long]("ref_ngrams"), s"$r vs $x")
        assert(r.getAs[Long]("cand_len") == c &&
          r.getAs[Long]("ref_len") == rf, s"$r")
      }
    }
    // cand_len/ref_len are constant per source across the 4 orders
    declared.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(r => (r.getAs[Long]("cand_len"),
        r.getAs[Long]("ref_len"))).distinct.size == 1)
    }
    val facade = run(api.Graft.bleuOverlap(
      Tables(spark, sf, "documents"), "doc_id", "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
