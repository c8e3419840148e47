package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 45: anisotropy audit, Heaps curve, byte-fallback
  * coverage, NB kappa — invariants + facade pins. */
class Wave41Spec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String): Seq[org.apache.spark.sql.Row] =
    try ops.CorpusOps51.queries(q)(spark, sf).collect().toSeq
    finally CacheScope.release()

  test("anisotropy: segments partition the 1225 pairs; facade pins") {
    val rows = run("q_emb_anisotropy")
    assert(rows.map(_.getString(0)) == Seq("all", "cross", "within"))
    val by = rows.map(r => r.getString(0) -> r).toMap
    assert(by("all").getAs[Long]("n_pairs") == 1225L)
    assert(by("within").getAs[Long]("n_pairs") +
      by("cross").getAs[Long]("n_pairs") == 1225L)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cos_micro") <=
        r.getAs[Long]("mean_cos_micro"))
      assert(r.getAs[Long]("mean_cos_micro") <=
        r.getAs[Long]("max_cos_micro"))
      assert(r.getAs[Long]("mean_abs_cos_micro") >= 0)
    }
    val f = try api.Graft.anisotropyAudit(
        Tables(spark, sf, "embeddings").filter(col("vec_id") < 50),
        "vec_id", "embedding", "label").collect().toSeq
      finally CacheScope.release()
    assert(f == rows)
  }

  test("heaps curve: cumulative monotone, quarter 4 is the corpus") {
    val rows = run("q_text_heaps").sortBy(_.getAs[Long]("quarter"))
    assert(rows.map(_.getAs[Long]("quarter")) == Seq(1L, 2L, 3L, 4L))
    Seq("n_docs", "n_tokens", "n_types").foreach { c =>
      val v = rows.map(_.getAs[Long](c))
      assert(v.sliding(2).forall { case Seq(a, b) => a <= b }, c)
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens")))
    val docs = Tables(spark, sf, "documents")
    assert(rows.last.getAs[Long]("n_docs") == docs.count())
    val types = docs.select(explode(split(col("text"), " ")))
      .distinct().count()
    assert(rows.last.getAs[Long]("n_types") == types)
    val f = try api.Graft.heapsCurve(docs, "doc_id", "text")
        .collect().toSeq
      finally CacheScope.release()
    assert(f == run("q_text_heaps"))
  }

  test("byte fallback: trusted slice covers itself; facade pins") {
    val rows = run("q_tok_byte_fallback")
    assert(rows.nonEmpty)
    val src0 = rows.find(_.getString(0) == "src0")
    assert(src0.exists(_.getAs[Long]("fallback_tokens") == 0L))
    rows.foreach(r => assert(r.getAs[Long]("fallback_permille") <= 1000))
    val f = try api.Graft.byteFallback(Tables(spark, sf, "documents"),
        "text", "source", col("source") === "src0").collect().toSeq
      finally CacheScope.release()
    assert(f == rows)
  }

  test("nb kappa: chance-corrected never beats raw accuracy") {
    val rows = run("q_quality_nb_kappa")
    val accRows = try ops.CorpusOps50
        .queries("q_quality_nb_train")(spark, sf).collect().toSeq
      finally CacheScope.release()
    val accBy = accRows.map(r =>
      r.getString(0) -> r.getAs[Long]("accuracy_permille")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("kappa_permille") >= -1000 &&
        r.getAs[Long]("kappa_permille") <= 1000)
      assert(r.getAs[Long]("po_permille") == accBy(r.getString(0)))
      assert(r.getAs[Long]("kappa_permille") <=
        r.getAs[Long]("po_permille"))
    }
  }
}
