package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 wave 34: BPE training loop (ops/TextAnalysis.scala) and
  * margin-criterion mining (ops/Similarity.scala). */
class Wave34Spec extends AnyFunSuite {
  import TestSpark._

  test("bpe train: round 1 reproduces the single merge step's pick") {
    val merges = try SparkEntry.queries("q_bpe_train")(spark, sf)
        .collect().toSeq
      finally CacheScope.release()
    assert(merges.size == 6)
    // the learned merges are pairwise distinct and counts never
    // increase round over round (a merge can only consume pair mass)
    assert(merges.map(_.getString(1)).distinct.size == 6)
    val counts = merges.sortBy(_.getLong(0)).map(_.getLong(2))
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a)
      case _ => () }
    val step = try SparkEntry.queries("q_bpe_merge_step")(spark, sf)
        .collect().toSeq
      finally CacheScope.release()
    assert(merges.find(_.getLong(0) == 1L).get.getString(1)
      == step.head.getString(0), "round-1 merge != the step query's pick")
  }

  test("margin mine: every mined pair is cross-label with margin > 1.05") {
    val rows = try SparkEntry.queries("q_sim_margin_mine")(spark, sf)
        .collect().toSeq
      finally CacheScope.release()
    assert(rows.nonEmpty)
    // one match per query, labels differ, margin above the floor
    assert(rows.map(_.getLong(0)).distinct.size == rows.size)
    rows.foreach { r =>
      assert(r.getInt(2) != r.getInt(3), s"same-label pair: $r")
      assert(r.getLong(4) > 1050000L, s"margin under floor: $r")
      assert(r.getLong(0) != r.getLong(1))
    }
  }
}
