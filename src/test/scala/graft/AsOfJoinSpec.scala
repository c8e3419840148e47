package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom sort-merge AS-OF operator (plans/AsOfJoin.scala):
  * result equality against the window formulation, plan shape, and
  * the null/no-match edge. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("custom as-of join == tagged-union window formulation, row for row") {
    val custom = SparkEntry.queries("q_join_asof_custom")(spark, sf)
      .collect().toSeq
    val window = SparkEntry.queries("q_join_asof")(spark, sf)
      .collect().toSeq
    assert(custom.nonEmpty && custom == window,
      s"custom ${custom.size} rows != window ${window.size}")
  }

  test("plan: AsOfJoinExec with per-side sorts, no union, no window") {
    val p = SparkEntry.queries("q_join_asof_custom")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    // the whole point vs the composable spelling: no union-wide stream,
    // no window lattice — each side sorted independently
    assert(!p.contains("Union"), p)
    assert(!p.contains("Window"), p)
    assert("Sort ".r.findAllIn(p).size >= 2, p)
  }

  test("left rows with no at-or-before match emit null, not a dropped row") {
    // every click by a user whose FIRST purchase is later (or who never
    // purchases) must still appear with asof_pid null
    val ev = Tables(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click").count()
    val out = SparkEntry.queries("q_join_asof_custom")(spark, sf)
    assert(out.count() == clicks, "as-of join must preserve every left row")
    assert(out.filter(col("asof_pid").isNull).count() > 0,
      "fixture should contain clicks before any purchase")
  }
}
