package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 85-86: confusion P/R/F1 + Hill length tail. */
class Wave69Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("prf: hand-computed cells on a constructed confusion") {
    // true x: 8 right, 2 -> y; true y: 3 right, 1 -> z. z never true.
    val conf = Seq(("x", "x", 8L), ("x", "y", 2L),
      ("y", "y", 3L), ("y", "z", 1L)).toDF("t", "p", "n")
    val r = run(api.Graft.confusionPrf(conf, "t", "p", "n"))
      .map(x => x.getString(0) -> x).toMap
    assert(r.size == 3)
    val x = r("x")
    assert(x.getAs[Long]("tp") == 8L && x.getAs[Long]("fp") == 0L &&
      x.getAs[Long]("fn") == 2L)
    assert(x.getAs[Long]("precision_permille") == 1000L &&
      x.getAs[Long]("recall_permille") == 800L &&
      x.getAs[Long]("f1_permille") == 888L, s"$x")
    val y = r("y")
    assert(y.getAs[Long]("tp") == 3L && y.getAs[Long]("fp") == 2L &&
      y.getAs[Long]("fn") == 1L)
    // z: predicted once, never true -> recall 0 row exists
    val z = r("z")
    assert(z.getAs[Long]("tp") == 0L && z.getAs[Long]("fp") == 1L &&
      z.getAs[Long]("fn") == 0L &&
      z.getAs[Long]("recall_permille") == 0L, s"$z")
  }

  test("prf: declared reconciles with the confusion census") {
    val declared = run(SparkEntry.queries("q_lang_nb_prf")(spark, sf))
    val conf = run(
      SparkEntry.queries("q_lang_nb_confusion")(spark, sf))
    assert(declared.nonEmpty)
    // total tp = the diagonal; total tp+fn = the held-out census
    assert(declared.map(_.getAs[Long]("tp")).sum ==
      conf.filter(r => r.getString(0) == r.getString(1))
        .map(_.getAs[Long]("n_docs")).sum)
    assert(declared.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn"))
      .sum == conf.map(_.getAs[Long]("n_docs")).sum)
    // fp mass == fn mass (every miss is someone's false positive)
    assert(declared.map(_.getAs[Long]("fp")).sum ==
      declared.map(_.getAs[Long]("fn")).sum)
  }

  test("length tail: hand-computed hill on a constructed corpus") {
    // lengths 16, 8, 4, 2: lg diffs vs xk=2 are 3e6, 2e6, 1e6, 0
    val docs = Seq((0L, "g", ("w " * 16).trim),
      (1L, "g", ("w " * 8).trim), (2L, "g", ("w " * 4).trim),
      (3L, "g", "w w")).toDF("id", "grp", "text")
    val r = run(api.Graft.lengthTail(docs, "id", "text", "grp")).head
    assert(r.getAs[Long]("k") == 4L && r.getAs[Long]("xk") == 2L)
    assert(r.getAs[Long]("sum_lg_diff_micro") == 6000000L, s"$r")
    assert(r.getAs[Long]("hill_log2_micro") == 2000000L, s"$r")
    // all-equal lengths: zero tail spread
    val eq = Seq((0L, "g", "a b"), (1L, "g", "c d")).toDF("id", "grp", "text")
    val re = run(api.Graft.lengthTail(eq, "id", "text", "grp")).head
    assert(re.getAs[Long]("hill_log2_micro") == 0L)
  }

  test("length tail: declared fixture invariants") {
    val declared = run(
      SparkEntry.queries("q_text_length_tail")(spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { r =>
      assert(r.getAs[Long]("k") >= 1L && r.getAs[Long]("k") <= 20L)
      assert(r.getAs[Long]("xk") >= 1L)
      assert(r.getAs[Long]("sum_lg_diff_micro") >= 0L)
      assert(r.getAs[Long]("hill_log2_micro") >= 0L)
    }
  }
}
