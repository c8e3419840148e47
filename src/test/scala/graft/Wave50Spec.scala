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
