package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 waves 70-71: the normalization-unlock dedup audit and the
  * token-rank drift monitor. */
class Wave57Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("norm unlock: monotone, and case/punct variants actually merge") {
    val docs = Seq(
      (0L, "a", "Hello, World!"),
      (1L, "a", "hello world"),
      (2L, "a", "hello   world"),
      (3L, "a", "something else"),
      (4L, "b", "unique one"),
      (5L, "b", "unique two")).toDF("id", "g", "text")
    val r = run(api.Graft.normUnlock(docs, "id", "text", "g"))
      .map(x => x.getString(0) -> x).toMap
    // raw: all distinct; norm: docs 1 and 2 merge into doc 0's group
    val a = r("a")
    assert(a.getAs[Long]("dup_raw") == 0L &&
      a.getAs[Long]("dup_norm") == 2L &&
      a.getAs[Long]("unlocked") == 2L, s"$a")
    val b = r("b")
    assert(b.getAs[Long]("dup_norm") == 0L, s"$b")
  }

  test("norm unlock: fixture monotone + facade == declared") {
    val declared = run(SparkEntry.queries("q_dedup_norm_delta")(
      spark, sf))
    declared.foreach { r =>
      assert(r.getAs[Long]("unlocked") >= 0L &&
        r.getAs[Long]("dup_norm") >= r.getAs[Long]("dup_raw") &&
        r.getAs[Long]("dup_norm") < r.getAs[Long]("n_docs"), s"$r")
    }
    val facade = run(api.Graft.normUnlock(
      Tables(spark, sf, "documents"), "doc_id", "text", "source"))
    assert(facade.nonEmpty &&
      facade.map(_.toSeq) == declared.map(_.toSeq))
  }

  test("token-rank drift: identical halves read 1000; facade == declared") {
    // same text either side of the split -> identical head rankings;
    // 12 distinct tokens with strictly decreasing counts, so both
    // top-10 lists are FULL (identical lists shorter than the depth
    // legitimately score < 1000 — prefix-overlap RBO counts the
    // missing tail against both)
    val text = (1 to 12).map(i =>
      Seq.fill(13 - i)(f"w$i%02d").mkString(" ")).mkString(" ")
    val docs = (0L to 19L).map(i => (i, "a", text)).toDF("id", "g", "text")
    val same = run(api.Graft.tokenRankDrift(docs, "text", "g",
      col("id") % 2 === 0))
    assert(same.size == 1 &&
      same.head.getAs[Long]("rbo_permille") == 1000L &&
      same.head.getAs[Long]("n_common") == 10L, s"$same")
    val declared = run(SparkEntry.queries("q_drift_token_rank")(
      spark, sf))
    assert(declared.nonEmpty)
    declared.foreach { r =>
      assert(r.getAs[Long]("n_common") <= 10L &&
        r.getAs[Long]("rbo_permille") <= 1000L, s"$r")
    }
    // the fixture's halves are statistically identical corpora — the
    // head should mostly agree (a weak floor, deterministic)
    assert(declared.map(_.getAs[Long]("rbo_permille")).max >= 500L)
    val facade = run(api.Graft.tokenRankDrift(
      Tables(spark, sf, "documents"), "text", "source",
      expr("""pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)),
         1, 15), 16, 10) AS BIGINT), 2)""") === 0))
    assert(facade.map(_.toSeq) == declared.map(_.toSeq))
  }
}
