package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 56: the NB calibration/reliability table — bucket
  * accounting consistency with the confusion table it shares its
  * scored stream with, plus the facade pin. */
class Wave50Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("nb calibration: buckets account for the whole held-out set") {
    val cal = run(SparkEntry.queries("q_quality_nb_calibration")(
      spark, sf))
    assert(cal.nonEmpty)
    cal.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 16, s"$r")
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"), s"$r")
      val rate = r.getAs[Long]("pos_rate_permille")
      assert(rate >= 0 && rate <= 1000, s"$r")
    }
    // the same held-out docs and labels as the confusion table (the
    // two queries share nbScoredFrom): Σ n_docs = Σ n_eval,
    // Σ n_pos = Σ (tp + fn)
    val cm = run(SparkEntry.queries("q_quality_nb_train")(spark, sf))
    assert(cal.map(_.getAs[Long]("n_docs")).sum ==
      cm.map(_.getAs[Long]("n_eval")).sum)
    assert(cal.map(_.getAs[Long]("n_pos")).sum ==
      cm.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum)
  }

  test("nb auc: exact Mann-Whitney accounting") {
    val auc = run(SparkEntry.queries("q_quality_nb_auc")(spark, sf))
    assert(auc.size == 1)
    val r = auc.head
    val (p, n, u2) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("u2"))
    // U2 is the doubled Mann-Whitney statistic: bounded by 2PN, and
    // the permille readout is its exact floor ratio
    assert(u2 >= 0 && u2 <= 2 * p * n)
    assert(r.getAs[Long]("auc_permille") == u2 * 1000 / (2 * p * n))
    // same held-out population as the confusion table
    val cm = run(SparkEntry.queries("q_quality_nb_train")(spark, sf))
    assert(p + n == cm.map(_.getAs[Long]("n_eval")).sum)
    assert(p == cm.map(x => x.getAs[Long]("tp") + x.getAs[Long]("fn")).sum)
    // driver-side recomputation from the raw margins (the brute
    // double-loop truth on the small fixture)
    val margins = run(graft.ops.CorpusOps50.nbScoredFrom(
        graft.ops.CorpusOps50.nbFlags(spark, sf))
        .select(col("label"), col("margin")))
      .map(x => (x.getAs[Long]("label"), x.getAs[Long]("margin")))
    val pos = margins.filter(_._1 == 1L).map(_._2)
    val neg = margins.filter(_._1 == 0L).map(_._2)
    val brute = (for (a <- pos; b <- neg)
      yield (if (a > b) 2L else if (a == b) 1L else 0L)).sum
    assert(brute == u2, s"brute $brute != u2 $u2")
  }

  test("nb calibration facade runs on a user task frame") {
    val docs = Tables(spark, sf, "documents")
    val f = run(api.Graft.nbQualityCalibration(docs, "doc_id", "text",
      label = length(col("text")) > 400,
      train = col("doc_id") % 2 === 0))
    assert(f.nonEmpty)
    assert(f.map(_.getAs[Long]("n_docs")).sum ==
      docs.filter(col("doc_id") % 2 =!= 0).count())
  }
}
