package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 44: the C4 rule battery, UniMax waterfilling, and the
  * Naive-Bayes quality-filter trainer — invariants the value oracle
  * can't state (budget conservation, cap saturation, confusion-table
  * consistency) plus facade≡declared pins. */
class Wave40Spec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String): Seq[org.apache.spark.sql.Row] =
    try ops.CorpusOps50.queries(q)(spark, sf).collect().toSeq
    finally CacheScope.release()

  test("c4 battery: counts bounded by n_docs; facade == declared") {
    val rows = run("q_text_c4_rules")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      Seq("pass_sentences", "pass_terminal", "pass_no_brace",
        "pass_no_lorem", "pass_min_words", "pass_all").foreach { c =>
        assert(r.getAs[Long](c) >= 0 && r.getAs[Long](c) <= n, c)
      }
      // the conjunction can never beat any single rule
      assert(r.getAs[Long]("pass_all") <= r.getAs[Long]("pass_min_words"))
    }
    val f = try api.Graft.c4Rules(Tables(spark, sf, "documents"),
        "text", "source").collect().toSeq
      finally CacheScope.release()
    assert(f == rows)
  }

  test("unimax: caps saturate, budget conserved, facade == declared") {
    import spark.implicits._
    // ascending caps 20/200/2000 against budget 400: the small group
    // saturates its cap, the rest split the remainder evenly
    val obs = Seq(("a", 10L), ("b", 100L), ("c", 1000L))
      .toDF("grp", "v")
    val got = try api.Graft.unimaxAllocation(obs, "v", "grp", 400L)
        .collect().toSeq
      finally CacheScope.release()
    val by = got.map(r => r.getString(0) ->
      (r.getAs[Long]("alloc_tokens"), r.getAs[Long]("capped"))).toMap
    assert(by("a") == ((20L, 1L)), by)
    assert(by("b") == ((190L, 0L)), by)
    assert(by("c") == ((190L, 0L)), by)
    // declared query == facade at the declared budget (total div 2)
    val declared = run("q_mix_unimax")
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " "))
        .cast("long").as("v"))
    val budget = docs.agg((sum(col("v")) / 2).cast("long"))
      .collect()(0).getLong(0)
    val f = try api.Graft.unimaxAllocation(docs, "v", "source", budget)
        .collect().toSeq
      finally CacheScope.release()
    assert(f.nonEmpty && f == declared)
    declared.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("cap_tokens"))
    }
    assert(declared.map(_.getAs[Long]("alloc_tokens")).sum <= budget)
    // an uncapped largest group means the floor slack was absorbed
    if (declared.exists(_.getAs[Long]("capped") == 0L))
      assert(declared.map(_.getAs[Long]("alloc_tokens")).sum == budget)
  }

  test("nb trainer: confusion table is consistent and exhaustive") {
    val rows = run("q_quality_nb_train")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("fn") + r.getAs[Long]("tn") ==
        r.getAs[Long]("n_eval"))
      assert(r.getAs[Long]("accuracy_permille") >= 0 &&
        r.getAs[Long]("accuracy_permille") <= 1000)
    }
    // eval half only: n_eval across sources == odd-doc_id count
    val odd = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 2 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_eval")).sum == odd)
  }
}
