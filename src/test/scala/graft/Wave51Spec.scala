package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 59: the WordPiece trainer — likelihood-gain picks vs
  * BPE's count picks, on the shared dictionary machinery. */
class Wave51Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("wordpiece: likelihood-gain picks, not count picks") {
    val wp = run(SparkEntry.queries("q_tok_wordpiece_train")(spark, sf))
    assert(wp.map(_.getLong(0)) == (1L to 6L))
    wp.foreach { r =>
      // a pair can occur at most min(left, right) times
      val (c, l, rr) = (r.getAs[Long]("cnt"), r.getAs[Long]("left_cnt"),
        r.getAs[Long]("right_cnt"))
      assert(c >= 1 && c <= l && c <= rr, s"$r")
    }
    // the canonical WordPiece pick: 'q' is ALWAYS followed by 'u'
    // (cnt == left_cnt), so "q u" wins round 1 by likelihood gain
    // even though BPE's count pick is a different, far more frequent
    // pair — the two trainers genuinely differ on the same corpus
    val first = wp.head
    assert(first.getAs[String]("merge") == "q u" &&
      first.getAs[Long]("cnt") == first.getAs[Long]("left_cnt"), s"$first")
    val bpe = run(SparkEntry.queries("q_bpe_train")(spark, sf))
      .map(_.getString(1))
    assert(wp.map(_.getAs[String]("merge")) != bpe)
  }

  test("wordpiece fertility: the three-algorithm comparison is coherent") {
    val wp = run(SparkEntry.queries("q_tok_wordpiece_fertility")(
      spark, sf))
    val bpe = run(SparkEntry.queries("q_bpe_apply")(spark, sf))
    assert(wp.map(_.getString(0)) == bpe.map(_.getString(0)))
    wp.zip(bpe).foreach { case (w, b) =>
      // same corpus, same word counts; only the learned merges differ
      assert(w.getAs[Long]("n_words") == b.getAs[Long]("n_words"))
      // 6 merges can at best reach 1 piece/word; at worst </w>-split
      val m = w.getAs[Long]("bpe_per_word_milli")
      assert(m >= 1000, s"$w")
    }
    // both trainers apply exactly 6 merges, so corpus-total savings
    // are comparable; neither dominates by construction — just pin
    // that the two measurements genuinely differ on this corpus
    assert(wp.map(_.getAs[Long]("n_bpe_tokens")) !=
      bpe.map(_.getAs[Long]("n_bpe_tokens")))
  }

  test("wordpiece facade == declared") {
    val declared =
      run(SparkEntry.queries("q_tok_wordpiece_train")(spark, sf))
    val facade = run(api.Graft.wordpieceTrain(
      Tables(spark, sf, "documents"), "text"))
    assert(facade.nonEmpty && facade == declared)
    // fewer rounds = a strict prefix (the loop is deterministic)
    val three = run(api.Graft.wordpieceTrain(
      Tables(spark, sf, "documents"), "text", merges = 3))
    assert(three == declared.take(3))
  }
}
