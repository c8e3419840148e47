package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 64-65: exact Shapley rule attribution and the
  * three-algorithm tokenizer datacard. */
class Wave53Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("shapley: conservation + bounds vs the attribution table") {
    val sh = run(SparkEntry.queries("q_quality_rule_shapley")(spark, sf))
    val at = run(SparkEntry.queries("q_quality_rule_attribution")(
      spark, sf)).map(r => (r.getString(0), r.getString(1)) -> r).toMap
    sh.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val removed = rows.head.getAs[Long]("docs_removed")
      // Σ_rules shapley = 420 · docs_removed — the game is efficient
      assert(rows.map(_.getAs[Long]("shapley_420ths")).sum ==
        420L * removed, s"$src")
      rows.foreach { r =>
        val a = at((src, r.getString(1)))
        val (f, u) = (a.getAs[Long]("fails"), a.getAs[Long]("unique_fails"))
        val s420 = r.getAs[Long]("shapley_420ths")
        // each failing doc contributes between 420/7 and 420; unique
        // fails contribute exactly 420, the rest at most 420/2
        assert(s420 >= 60L * f && s420 <= 420L * f, s"$r vs $a")
        assert(s420 >= 420L * u + 60L * (f - u) &&
          s420 <= 420L * u + 210L * (f - u), s"$r vs $a")
      }
    }
  }

  test("shapley: a doc failing exactly two rules splits 210/210") {
    val good =
      Seq.fill(8)("the quick brown fox jumps over lazy dogs")
        .mkString(" ")
    // '{' fails c4_brace; 'lorem ipsum' fails c4_lorem; nothing else
    val docs = Seq(
      ("a", good),
      ("a", good + " { lorem ipsum")).toDF("grp", "text")
    val sh = run(api.Graft.ruleShapley(docs, "text", "grp"))
    val byRule = sh.map(r => r.getString(1) -> r).toMap
    assert(byRule("c4_brace").getAs[Long]("shapley_420ths") == 210L)
    assert(byRule("c4_lorem").getAs[Long]("shapley_420ths") == 210L)
    assert(byRule("c4_brace").getAs[Long]("docs_removed") == 1L)
    (byRule - "c4_brace" - "c4_lorem").values.foreach { r =>
      assert(r.getAs[Long]("shapley_420ths") == 0L, s"$r")
    }
  }

  test("shapley facade == declared") {
    val declared = run(SparkEntry.queries("q_quality_rule_shapley")(
      spark, sf))
    val facade = run(api.Graft.ruleShapley(
      Tables(spark, sf, "documents"), "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("tokenizer datacard rows == the three shipped per-algo legs") {
    val card = run(SparkEntry.queries("q_tok_algo_datacard")(spark, sf))
    val srcs = card.map(_.getString(1)).distinct
    assert(card.size == 3 * srcs.size)
    val byAlgo = card.groupBy(_.getString(0))
    // bpe leg == q_bpe_apply, wordpiece leg == its fertility query,
    // unigram leg == its fertility query — value-for-value
    def key(r: org.apache.spark.sql.Row, i0: Int) =
      (r.getString(i0), r.getLong(i0 + 1), r.getLong(i0 + 2),
        r.getLong(i0 + 3))
    val bpe = run(SparkEntry.queries("q_bpe_apply")(spark, sf))
    assert(byAlgo("bpe").map(key(_, 1)) == bpe.map(key(_, 0)))
    val wp = run(SparkEntry.queries("q_tok_wordpiece_fertility")(
      spark, sf))
    assert(byAlgo("wordpiece").map(key(_, 1)) == wp.map(key(_, 0)))
    val uni = run(SparkEntry.queries("q_tok_unigram_fertility")(
      spark, sf))
    assert(byAlgo("unigram").map(key(_, 1)) == uni.map(key(_, 0)))
    // the bounded-DP unigram word census can only shrink
    byAlgo("unigram").zip(byAlgo("bpe")).foreach { case (u, b) =>
      assert(u.getAs[Long]("n_words") <= b.getAs[Long]("n_words"))
    }
  }

  test("tokenizer datacard facade == declared") {
    val declared = run(SparkEntry.queries("q_tok_algo_datacard")(
      spark, sf))
    val facade = run(api.Graft.tokenizerDatacard(
      Tables(spark, sf, "documents"), "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
