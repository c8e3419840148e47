package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 61-63: rule attribution, Krippendorff's alpha, ROUGE-N,
  * and the multi-class NB language identifier. */
class Wave52Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("rule attribution: fails match the batteries; unique <= fails") {
    val at = run(SparkEntry.queries("q_quality_rule_attribution")(
      spark, sf))
    assert(at.size == 7 * at.map(_.getString(0)).distinct.size)
    at.foreach { r =>
      val (n, f, u) = (r.getAs[Long]("n_docs"), r.getAs[Long]("fails"),
        r.getAs[Long]("unique_fails"))
      assert(u >= 0 && u <= f && f <= n, s"$r")
    }
    // cross-check fails against the shipped batteries: fails_r =
    // n_docs − pass_r for every rule both tables name
    val gop = run(SparkEntry.queries("q_text_gopher_rules")(spark, sf))
      .map(r => r.getString(0) -> r).toMap
    val c4 = run(SparkEntry.queries("q_text_c4_rules")(spark, sf))
      .map(r => r.getString(0) -> r).toMap
    at.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val byRule = rows.map(r => r.getString(1) -> r).toMap
      val g = gop(src)
      val n = g.getAs[Long]("n_docs")
      assert(byRule("g_minwords").getAs[Long]("fails") ==
        n - g.getAs[Long]("pass_minwords"))
      assert(byRule("g_alpha").getAs[Long]("fails") ==
        n - g.getAs[Long]("pass_alpha"))
      val c = c4(src)
      assert(byRule("c4_brace").getAs[Long]("fails") ==
        n - c.getAs[Long]("pass_no_brace"))
      assert(byRule("c4_words").getAs[Long]("fails") ==
        n - c.getAs[Long]("pass_min_words"))
    }
  }

  test("rule attribution: a single-rule failure is that rule's unique fail") {
    // 64 words, avg ~4.1 chars, stopword-rich, all-alphabetic ->
    // passes all 7 rules; the '{' makes c4_brace (and ONLY
    // c4_brace) fail
    val good =
      Seq.fill(8)("the quick brown fox jumps over lazy dogs")
        .mkString(" ")
    val docs = Seq(
      ("a", good),
      ("a", good + " {")).toDF("grp", "text")
    val at = run(api.Graft.ruleAttribution(docs, "text", "grp"))
    val byRule = at.map(r => r.getString(1) -> r).toMap
    assert(byRule("c4_brace").getAs[Long]("fails") == 1L &&
      byRule("c4_brace").getAs[Long]("unique_fails") == 1L)
    (byRule - "c4_brace").values.foreach { r =>
      assert(r.getAs[Long]("fails") == 0L &&
        r.getAs[Long]("unique_fails") == 0L, s"$r")
    }
  }

  test("rule attribution facade == declared") {
    val declared = run(SparkEntry.queries("q_quality_rule_attribution")(
      spark, sf))
    val facade = run(api.Graft.ruleAttribution(
      Tables(spark, sf, "documents"), "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("krippendorff: degenerate agreement is 1000; mixed matches brute") {
    // every gate passes on both docs -> n0 = 0 -> declared 1000
    val good =
      Seq.fill(8)("the quick brown fox jumps over lazy dogs")
        .mkString(" ")
    val all = run(api.Graft.krippendorffAlpha(
      Seq(("a", good), ("a", good)).toDF("g", "text"), "text", "g"))
    assert(all.size == 1 &&
      all.head.getAs[Long]("alpha_permille") == 1000L)
    // fixture: alpha matches a driver-side brute replay of the
    // coincidence formula from the emitted ingredients
    val kf = run(SparkEntry.queries("q_agreement_krippendorff")(
      spark, sf))
    assert(kf.nonEmpty)
    kf.foreach { r =>
      val (n, dp, n0, n1) = (r.getAs[Long]("n_units"),
        r.getAs[Long]("do_pairs"), r.getAs[Long]("n0"),
        r.getAs[Long]("n1"))
      assert(n0 + n1 == 4 * n && r.getAs[Long]("n_raters") == 4L)
      val expect =
        if (n0 == 0 || n1 == 0) 1000L
        else (BigInt(n0) * n1 * 3 - BigInt(dp) * (4 * n - 1)) * 1000 /
          (BigInt(n0) * n1 * 3)
      assert(BigInt(r.getAs[Long]("alpha_permille")) == expect, s"$r")
    }
  }

  test("krippendorff facade == declared") {
    val declared = run(SparkEntry.queries("q_agreement_krippendorff")(
      spark, sf))
    val facade = run(api.Graft.krippendorffAlpha(
      Tables(spark, sf, "documents"), "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("rouge: identical pair scores 1000, disjoint scores 0") {
    val docs = Seq(
      (0L, "a", "the cat sat on the mat"),
      (1L, "a", "the cat sat on the mat"),
      (2L, "b", "alpha beta gamma"),
      (3L, "b", "delta epsilon zeta eta")).toDF("id", "g", "text")
    val r = run(api.Graft.rougeOverlap(docs, "id", "text", "g"))
      .map(x => (x.getString(0), x.getAs[Long]("n")) -> x).toMap
    Seq(1L, 2L).foreach { n =>
      val a = r(("a", n))
      assert(a.getAs[Long]("rouge_p_permille") == 1000L &&
        a.getAs[Long]("rouge_r_permille") == 1000L &&
        a.getAs[Long]("rouge_f_permille") == 1000L, s"$a")
      val b = r(("b", n))
      assert(b.getAs[Long]("overlap") == 0L &&
        b.getAs[Long]("rouge_f_permille") == 0L, s"$b")
    }
    // clipping: "the" appears twice in both ref and cand -> unigram
    // overlap counts it twice (6 = full length), not four times
    assert(r(("a", 1L)).getAs[Long]("overlap") == 6L)
  }

  test("rouge: fixture invariants + facade == declared") {
    val declared = run(SparkEntry.queries("q_eval_rouge")(spark, sf))
    declared.foreach { r =>
      val (o, c, rf) = (r.getAs[Long]("overlap"),
        r.getAs[Long]("cand_ngrams"), r.getAs[Long]("ref_ngrams"))
      assert(o <= c && o <= rf, s"$r")
      val (p, rr, f) = (r.getAs[Long]("rouge_p_permille"),
        r.getAs[Long]("rouge_r_permille"),
        r.getAs[Long]("rouge_f_permille"))
      // F1 is the harmonic mean: between min and max of P and R
      // (integer floors can nudge by 1)
      assert(f >= (p.min(rr) - 1) && f <= (p.max(rr) + 1), s"$r")
    }
    val facade = run(api.Graft.rougeOverlap(
      Tables(spark, sf, "documents"), "doc_id", "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("lang NB: separable corpus predicts the diagonal") {
    val docs = (0L to 19L).map { i =>
      if (i % 2 == 0) (i, if (i % 4 == 0) "xx" else "yy",
        if (i % 4 == 0) "foo bar baz foo" else "uno dos tres uno")
      else (i, if (i % 4 == 1) "xx" else "yy",
        if (i % 4 == 1) "foo baz bar" else "dos uno tres")
    }.toDF("id", "lab", "text")
    val cm = run(api.Graft.langNbConfusion(docs, "id", "text", "lab",
      col("id") % 2 === 0))
    assert(cm.size == 2)
    cm.foreach { r =>
      assert(r.getString(0) == r.getString(1) &&
        r.getAs[Long]("n_docs") == 5L, s"$r")
    }
  }

  test("lang NB: held-out census + facade == declared") {
    val declared = run(SparkEntry.queries("q_lang_nb_confusion")(
      spark, sf))
    // every odd-doc_id doc is scored exactly once
    val nOdd = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 2 =!= 0).count()
    assert(declared.map(_.getAs[Long]("n_docs")).sum == nOdd)
    val facade = run(api.Graft.langNbConfusion(
      Tables(spark, sf, "documents"), "doc_id", "text", "lang",
      col("doc_id") % 2 === 0))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
