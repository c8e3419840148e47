package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SecurityPolicies.secureView

/** Ranger-style row-filter + column-mask policies as optimizable views
  * (ops/SecurityPolicies.scala): semantics, schema preservation, and
  * the scale contract — the row filter must reach the parquet scan
  * THROUGH the policy view. */
class SecuritySpec extends AnyFunSuite {
  import TestSpark._

  private def policies = secureView(
    Tables(spark, sf, "customer"),
    rowFilter = col("c_mktsegment") =!= "BUILDING",
    masks = Map(
      "c_name" -> concat(lit("xxx"), substring(col("c_name"), -3, 3)),
      "c_acctbal" -> round(col("c_acctbal"), -2)))

  test("row filter hides rows; masks transform columns; schema unchanged") {
    val v = policies
    assert(v.columns.toSeq ==
      Tables(spark, sf, "customer").columns.toSeq)
    assert(v.filter(col("c_mktsegment") === "BUILDING").count() == 0)
    val masked = v.select(col("c_name")).head().getString(0)
    assert(masked.startsWith("xxx") && masked.length == 6, masked)
    // masked balances are all multiples of 100
    assert(v.filter(col("c_acctbal") % 100 =!= 0).count() == 0)
  }

  test("policy view stays optimizable: user predicate pushes to parquet") {
    val q = policies.filter(col("c_custkey") < 100)
      .select(col("c_custkey"), col("c_name"))
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("c_custkey") && pushed.contains("c_mktsegment"),
      s"policy + user filters must BOTH reach the scan: $pushed")
  }

  test("unknown mask column fails fast") {
    intercept[IllegalArgumentException] {
      secureView(Tables(spark, sf, "customer"), lit(true),
        Map("no_such_col" -> lit(0)))
    }
  }

  test("k-anonymity gate: every published row covers >= k docs, none lost") {
    val rows = SparkEntry.queries("q_privacy_kanon")(spark, sf).collect()
    // the residual suppression row is exempt from k (it identifies no
    // QI combination); every real row must meet the floor
    val k = 3
    val (residual, published) =
      rows.partition(r => r.getString(0) == "*" && r.getString(1) == "*")
    assert(published.forall(_.getLong(3) >= k),
      s"published group under k: ${published.minBy(_.getLong(3))}")
    assert(residual.size <= 1)
    // conservation: published + suppressed = corpus size
    val total = rows.map(_.getLong(3)).sum
    assert(total == Tables(spark, sf, "documents").count(), total)
  }
}
