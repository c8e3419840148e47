package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 wave 51: SemDeDup's coarse quantizer unified onto the shared
  * resolveCells dial (VERDICT r16 item 3) — one K formula for every
  * cell-blocked operator, hash-stable at fixture scale — plus the
  * facade bugs found in the same pass (threshold silently ignored;
  * dense-id seed assumption). */
class Wave46Spec extends AnyFunSuite {
  import TestSpark._

  private def run(df: => org.apache.spark.sql.DataFrame) =
    try df.collect().toSeq finally CacheScope.release()

  test("resolveCells: one formula, steered by one pair of confs") {
    // SemDeDup's parameterization (floor 64, target 32) reproduces the
    // pre-r17 max(64, n/32) at fixture AND 10x-stress scales
    assert(ops.Similarity.resolveCells(spark, 500L, 64L, 32L) == 64)
    assert(ops.Similarity.resolveCells(spark, 2000L, 64L, 32L) == 64)
    assert(ops.Similarity.resolveCells(spark, 20000L, 64L, 32L) == 625)
    // and clamps at the 65536 ceiling
    assert(ops.Similarity.resolveCells(spark, 10000000L, 64L, 32L)
      == 65536)
    // explicit cells conf wins over everything
    spark.conf.set("spark.graft.ivf.cells", "128")
    try assert(ops.Similarity.resolveCells(spark, 500L, 64L, 32L) == 128)
    finally spark.conf.unset("spark.graft.ivf.cells")
    // the shared cell-size dial steers SemDeDup's K too
    spark.conf.set("spark.graft.ivf.targetCellSize", "4")
    try assert(ops.Similarity.resolveCells(spark, 500L, 64L, 32L) == 125)
    finally spark.conf.unset("spark.graft.ivf.targetCellSize")
  }

  test("semanticDedup: hash-stable under the unified K (facade == declared)") {
    val declared = run(SparkEntry.queries("q_dedup_semantic")(spark, sf))
    val facade = run(api.Graft.semanticDedup(
      Tables(spark, sf, "embeddings"), "vec_id", "embedding"))
    assert(declared.nonEmpty && facade == declared)
  }

  test("semanticDedup facade: non-dense ids, honored threshold, empty raise") {
    val embs = Tables(spark, sf, "embeddings")
    val base = run(api.Graft.semanticDedup(embs, "vec_id", "embedding"))
    // ids shifted by +100: same vectors seed the quantizer (k lowest,
    // not `id < k`), so the pair set is the same modulo the shift
    val shifted = embs.select((col("vec_id") + 100).as("vec_id"),
      col("embedding"))
    val sh = run(api.Graft.semanticDedup(shifted, "vec_id", "embedding"))
    assert(sh.map(r => (r.getLong(0) - 100, r.getLong(1) - 100,
        r.getDouble(2))) ==
      base.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    // threshold was silently ignored before r17 (pairs came back at
    // the declared query's 0.3 literal whatever the caller passed)
    val tight = run(api.Graft.semanticDedup(embs, "vec_id", "embedding",
      threshold = 0.9))
    assert(tight == base.filter(_.getDouble(2) >= 0.9))
    intercept[IllegalArgumentException] {
      api.Graft.semanticDedup(embs.filter(col("vec_id") < 0),
        "vec_id", "embedding")
    }
  }
}
