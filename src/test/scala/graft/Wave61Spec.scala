package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 75: langid margin calibration. */
class Wave61Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("langid margin: census matches confusion; accuracy is exact") {
    val bands = run(SparkEntry.queries("q_lang_nb_margin")(spark, sf))
    val conf = run(SparkEntry.queries("q_lang_nb_confusion")(spark, sf))
    // both tables census the same held-out population
    assert(bands.map(_.getAs[Long]("n_docs")).sum ==
      conf.map(_.getAs[Long]("n_docs")).sum)
    // and agree on the total corrects (the confusion diagonal)
    assert(bands.map(_.getAs[Long]("correct")).sum ==
      conf.filter(r => r.getString(0) == r.getString(1))
        .map(_.getAs[Long]("n_docs")).sum)
    bands.foreach { r =>
      val (b, n, c, a) = (r.getLong(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("correct"), r.getAs[Long]("accuracy_permille"))
      assert(b >= 0 && b <= 16 && c <= n && a == c * 1000 / n, s"$r")
    }
  }

  test("langid margin: separable corpus fills the top band; facade") {
    // disjoint vocabularies -> every margin is large (the short docs
    // bound it around ~13 bits) and every prediction is right
    val docs = (0L to 19L).map { i =>
      if (i % 2 == 0) (i, if (i % 4 == 0) "xx" else "yy",
        if (i % 4 == 0) "foo bar baz foo foo bar" else "uno dos tres uno dos")
      else (i, if (i % 4 == 1) "xx" else "yy",
        if (i % 4 == 1) "foo baz bar foo" else "dos uno tres dos")
    }.toDF("id", "lab", "text")
    val cal = run(api.Graft.langNbCalibration(docs, "id", "text",
      "lab", col("id") % 2 === 0))
    assert(cal.size == 1 && cal.head.getLong(0) >= 10L &&
      cal.head.getAs[Long]("accuracy_permille") == 1000L, s"$cal")
    val declared = run(SparkEntry.queries("q_lang_nb_margin")(spark, sf))
    val facade = run(api.Graft.langNbCalibration(
      Tables(spark, sf, "documents"), "doc_id", "text", "lang",
      col("doc_id") % 2 === 0))
    assert(facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
