package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 66-67: chrF2 char-gram overlap and the per-label
  * embedding scatter audit, plus the langid LM-gate bit-identity. */
class Wave54Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("chrf: identical pair is 1000 at every n; clipping is char-level") {
    val docs = Seq(
      (0L, "a", "abc def"),
      (1L, "a", "abc def"),
      (2L, "b", "aaaa"),
      (3L, "b", "aabb")).toDF("id", "g", "text")
    val r = run(api.Graft.chrfOverlap(docs, "id", "text", "g"))
      .map(x => (x.getString(0), x.getAs[Long]("n")) -> x).toMap
    (1L to 6L).foreach { n =>
      assert(r(("a", n)).getAs[Long]("chrf2_permille") == 1000L,
        s"n=$n ${r(("a", n))}")
    }
    // whitespace stripped: "abc def" has 6 chars, 5 bigrams ("cd"
    // bridges the former space)
    assert(r(("a", 1L)).getAs[Long]("cand_ngrams") == 6L)
    assert(r(("a", 2L)).getAs[Long]("cand_ngrams") == 5L)
    // clip: cand "aabb" vs ref "aaaa" shares min(2,4)=2 'a' unigrams
    assert(r(("b", 1L)).getAs[Long]("overlap") == 2L)
    // and exactly one "aa" bigram (cand has 1, ref has 3)
    assert(r(("b", 2L)).getAs[Long]("overlap") == 1L)
  }

  test("chrf: fixture pair census matches rouge; facade == declared") {
    val declared = run(SparkEntry.queries("q_eval_chrf")(spark, sf))
    val rouge = run(SparkEntry.queries("q_eval_rouge")(spark, sf))
    val np = declared.map(r => r.getString(0) -> r.getAs[Long]("n_pairs"))
      .toMap
    rouge.foreach { r =>
      assert(np(r.getString(0)) == r.getAs[Long]("n_pairs"), s"$r")
    }
    declared.foreach { r =>
      val (o, c, rf) = (r.getAs[Long]("overlap"),
        r.getAs[Long]("cand_ngrams"), r.getAs[Long]("ref_ngrams"))
      assert(o <= c && o <= rf, s"$r")
    }
    val facade = run(api.Graft.chrfOverlap(
      Tables(spark, sf, "documents"), "doc_id", "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("emb scatter: constructed frame matches a BigInt brute replay") {
    // label 0: identical vectors (within = 0 -> guarded fisher 0);
    // label 1: two points straddling their centroid
    val vecs = Seq(
      (0L, 0, Array.fill(64)(0.5f)),
      (1L, 0, Array.fill(64)(0.5f)),
      (2L, 1, Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)),
      (3L, 1, Array.tabulate(64)(i => if (i < 32) -1.0f else 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = run(api.Graft.embScatter(vecs, "vec_id", "embedding",
      "label")).map(r => r.getLong(0) -> r).toMap
    val l0 = got(0L)
    assert(l0.getAs[Long]("within_var_micro") == 0L &&
      l0.getAs[Long]("fisher_permille") == 0L, s"$l0")
    // brute replay in exact BigInt for label 1: q = ±1e6 per dim
    val q = BigInt(1000000)
    // ssq = 2 vectors * 64 dims * q^2; s_1 = 0 per dim -> snorm2 = 0
    val ssq = 2 * 64 * q * q
    val within = (2 * ssq - 0) / (2 * 2) / BigInt(1000000)
    val l1 = got(1L)
    assert(BigInt(l1.getAs[Long]("within_var_micro")) == within, s"$l1")
    // global sum S = label0 sums (1e6 per half? no: label0 = 0.5e6
    // per dim x2 vecs = 1e6 per dim); label1 sums cancel -> S_d = 1e6
    // sep(label 1) = ||0 - S/4||^2 = 64 * (1e6/4)^2 / 1e12 * 1e6
    val sep = BigInt(64) * (q / 4) * (q / 4) * 1000000 /
      (BigInt(1000000) * 1000000)
    assert(BigInt(l1.getAs[Long]("centroid_sep_micro")) == sep, s"$l1")
  }

  test("emb scatter: fixture readout + facade == declared") {
    val declared = run(SparkEntry.queries("q_emb_scatter")(spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { r =>
      assert(r.getAs[Long]("within_var_micro") >= 0L &&
        r.getAs[Long]("centroid_sep_micro") >= 0L &&
        r.getAs[Long]("mean_norm2_micro") > 0L, s"$r")
    }
    val facade = run(api.Graft.embScatter(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding", "label"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("lang NB: forced-shuffle LM gate is bit-identical") {
    val declared = run(SparkEntry.queries("q_lang_nb_confusion")(
      spark, sf))
    spark.conf.set("spark.graft.lm.broadcastTypeLimit", "0")
    val shuffled = try
        run(SparkEntry.queries("q_lang_nb_confusion")(spark, sf))
      finally spark.conf.unset("spark.graft.lm.broadcastTypeLimit")
    assert(shuffled.map(_.toSeq) == declared.map(_.toSeq))
  }
}
