package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 43: the unigram-LM tokenizer trainer — invariants the
  * value oracle can't state (character conservation, vocabulary
  * bounds, cost monotonicity, the one-word collapse). */
class Wave39Spec extends AnyFunSuite {
  import TestSpark._

  test("unigram train: char conservation + bounded vocabulary") {
    val rows = try ops.CorpusOps49
        .queries("q_tok_unigram_train")(spark, sf).collect().toSeq
      finally CacheScope.release()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("piece_len") >= 1 &&
      r.getAs[Long]("piece_len") <= 4))
    assert(rows.count(_.getAs[Long]("piece_len") >= 2) <= 40)
    // every char of every dictionary word occurrence is emitted by
    // exactly one piece: sum(used_count * piece_len) == corpus chars
    val pieceChars = rows
      .map(r => r.getAs[Long]("used_count") * r.getAs[Long]("piece_len"))
      .sum
    val dictChars = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, 16))
      .agg(sum(length(col("w"))).cast("long")).collect()(0).getLong(0)
    assert(pieceChars == dictChars, s"$pieceChars != $dictChars")
    // cost = lg(tot) - lg(cnt): a more-used piece is never costlier
    val byUse = rows.sortBy(r => (-r.getAs[Long]("used_count"),
      r.getString(0)))
    byUse.sliding(2).foreach {
      case Seq(a, b) =>
        if (a.getAs[Long]("used_count") > b.getAs[Long]("used_count"))
          assert(a.getAs[Long]("cost_micro") <= b.getAs[Long]("cost_micro"))
      case _ =>
    }
  }

  test("unigram collapses a one-word corpus to a single piece") {
    import spark.implicits._
    val docs = Seq.fill(5)("abcd abcd abcd").toDF("text")
    val (pieces, _) = ops.CorpusOps49.unigramCore(docs)
    val p = try pieces.collect().toSeq finally CacheScope.release()
    assert(p.map(_.getString(0)) == Seq("abcd"), p)
    assert(p.head.getAs[Long]("cost_micro") == 0L)
    val fert = try api.Graft.unigramFertility(
        Seq.fill(3)("abcd abcd").toDF("text").withColumn("g", lit("x")),
        "text", "g").collect().toSeq
      finally CacheScope.release()
    assert(fert.size == 1 &&
      fert.head.getAs[Long]("fertility_milli") == 1000L, fert)
  }

  test("unigram facades == the declared queries") {
    val docs = Tables(spark, sf, "documents")
    val t = try api.Graft.unigramTrain(docs, "text").collect().toSeq
      finally CacheScope.release()
    val td = try SparkEntry.queries("q_tok_unigram_train")(spark, sf)
        .collect().toSeq
      finally CacheScope.release()
    assert(t.nonEmpty && t == td)
    val f = try api.Graft.unigramFertility(docs, "text", "source")
        .collect().toSeq
      finally CacheScope.release()
    val fd = try SparkEntry.queries("q_tok_unigram_fertility")(spark, sf)
        .collect().toSeq
      finally CacheScope.release()
    assert(f.nonEmpty && f == fd)
  }
}
