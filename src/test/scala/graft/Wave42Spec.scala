package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r16 wave 46: source ablation, deterministic bootstrap CI, KS
  * length drift — invariants + facade pins. */
class Wave42Spec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String): Seq[org.apache.spark.sql.Row] =
    try ops.CorpusOps52.queries(q)(spark, sf).collect().toSeq
    finally CacheScope.release()

  test("ablation: shares partition the corpus; delta is consistent") {
    val rows = run("q_mix_ablation")
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Long]("share_permille")).sum
    // floor division loses at most 1 permille per source
    assert(shares <= 1000 && shares >= 1000 - rows.size, shares)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_micro") ==
        r.getAs[Long]("mean_q_without_micro") -
          r.getAs[Long]("mean_q_all_micro"))
    }
    // facade over explicit value/score columns == declared
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("v"),
        expr("""(5 * (size(array_distinct(split(text, ' '))) * 1000
            div greatest(size(split(text, ' ')), 1))
          + 3 * (size(filter(split(text, ' '), w -> w IN ('the', 'a',
              'and', 'of', 'to', 'in', 'is', 'le', 'la', 'et', 'de',
              'les', 'un', 'der', 'die', 'und', 'das', 'ein', 'ist',
              'el', 'los', 'y', 'que', 'en'))) * 1000
              div greatest(size(split(text, ' ')), 1))
          + (1000 - (length(text) - length(regexp_replace(text,
               '[.,!?;:]', ''))) * 1000 div greatest(length(text), 1))
          + (1000 - (length(text) - length(regexp_replace(text,
               '[0-9]', ''))) * 1000 div greatest(length(text), 1)))
          div 10""").as("q"))
    val f = try api.Graft.sourceAblation(docs, "v", "q", "source")
        .collect().toSeq
      finally CacheScope.release()
    assert(f == rows)
  }

  test("bootstrap CI: ordered, deterministic, facade pins") {
    val rows = run("q_eval_bootstrap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lo_micro") <= r.getAs[Long]("hi_micro"))
      assert(r.getAs[Long]("mean_micro") >= 0)
    }
    // determinism: a second run is bit-identical (hash-derived
    // resamples, no RNG state)
    assert(run("q_eval_bootstrap") == rows)
    // facade on a hand-made frame: constant values give a degenerate
    // CI equal to the constant
    import spark.implicits._
    val const = (1L to 200L).map(i => (i, "g", 7L))
      .toDF("id", "g", "v")
    val f = try api.Graft.bootstrapCI(const, "id", "v", "g")
        .collect().toSeq
      finally CacheScope.release()
    assert(f.size == 1)
    assert(f.head.getAs[Long]("mean_micro") == 7000L)
    assert(f.head.getAs[Long]("lo_micro") == 7000L)
    assert(f.head.getAs[Long]("hi_micro") == 7000L)
  }

  test("ks drift: bounded, exhaustive split, self-drift is zero") {
    val rows = run("q_drift_length")
    assert(rows.nonEmpty)
    val docs = Tables(spark, sf, "documents")
    rows.foreach { r =>
      assert(r.getAs[Long]("d_permille") >= 0 &&
        r.getAs[Long]("d_permille") <= 1000)
      assert(!r.isNullAt(r.fieldIndex("at_len")))
    }
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
      .sum == docs.count())
    // identical snapshots drift by exactly zero
    import spark.implicits._
    val same = Seq(("g", 5L, 1L), ("g", 5L, 0L), ("g", 9L, 1L),
      ("g", 9L, 0L)).toDF("g", "v", "a")
    val z = try api.Graft.ksDrift(same, "v", "g", col("a") === 1L)
        .collect().toSeq
      finally CacheScope.release()
    assert(z.head.getAs[Long]("d_permille") == 0L, z)
  }
}
