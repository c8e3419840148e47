package graft

import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 83-84: Chao1/Good-Turing + minhash permutation curve. */
class Wave68Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("chao1: hand-computed census on a constructed corpus") {
    // tokens: a a a b b c d  -> types 4, f1 = {c, d} = 2, f2 = {b} = 1
    val docs = Seq(("s", "a a a b b"), ("s", "c d"),
      ("t", "x x")).toDF("g", "text")
    val r = run(api.Graft.chao1(docs, "text", "g"))
      .map(x => x.getString(0) -> x).toMap
    val s = r("s")
    assert(s.getAs[Long]("tokens") == 7L && s.getAs[Long]("types") == 4L
      && s.getAs[Long]("f1") == 2L && s.getAs[Long]("f2") == 1L, s"$s")
    // chao1 = 1000*4 + 1000*2*1/(2*2) = 4500; gt = 2000/7 = 285
    assert(s.getAs[Long]("chao1_milli") == 4500L &&
      s.getAs[Long]("gt_unseen_permille") == 285L, s"$s")
    // a fully-duplicated vocabulary: f1 = 0 -> chao1 = types, gt = 0
    val t = r("t")
    assert(t.getAs[Long]("chao1_milli") == 1000L &&
      t.getAs[Long]("gt_unseen_permille") == 0L, s"$t")
  }

  test("chao1: declared invariants vs the Heaps census") {
    val declared = run(SparkEntry.queries("q_text_chao1")(spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { x =>
      val (tk, ty, f1, f2) = (x.getAs[Long]("tokens"),
        x.getAs[Long]("types"), x.getAs[Long]("f1"),
        x.getAs[Long]("f2"))
      assert(f1 + f2 <= ty && ty <= tk, s"$x")
      // the estimator never shrinks the observed richness
      assert(x.getAs[Long]("chao1_milli") >= 1000L * ty, s"$x")
      assert(x.getAs[Long]("gt_unseen_permille") <= 1000L)
    }
  }

  test("perm curve: identical pair is exact at every budget; census") {
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh"),
      (1L, "aa bb cc dd ee ff gg hh")).toDF("id", "text")
    val r = run(api.Graft.minhashPermCurve(docs, "id", "text"))
    assert(r.map(_.getLong(0)) == Seq(8L, 16L, 32L))
    r.foreach { x =>
      assert(x.getAs[Long]("n_pairs") == 1L &&
        x.getAs[Long]("mean_err_micro") == 0L &&
        x.getAs[Long]("bias_micro") == 0L, s"$x")
    }
  }

  test("perm curve: declared budgets census the same pair stream") {
    val declared = run(
      SparkEntry.queries("q_dedup_minhash_perm_curve")(spark, sf))
    assert(declared.map(_.getLong(0)) == Seq(8L, 16L, 32L))
    val est = run(
      SparkEntry.queries("q_dedup_minhash_est_error")(spark, sf))
    val tot = est.map(_.getAs[Long]("n_pairs")).sum
    declared.foreach { x =>
      assert(x.getAs[Long]("n_pairs") == tot, s"$x vs $tot")
      assert(x.getAs[Long]("mean_err_micro") >= 0 &&
        x.getAs[Long]("max_err_micro") <= 1000000L, s"$x")
    }
    // more permutations should not hurt on a real corpus: the full
    // sketch beats the 8-slot prefix on mean error
    val byP = declared.map(x => x.getLong(0) ->
      x.getAs[Long]("mean_err_micro")).toMap
    assert(byP(32L) <= byP(8L), s"$byP")
  }
}
