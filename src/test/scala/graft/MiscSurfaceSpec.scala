package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining small surfaces from SURVEY §2 with no oracle-able shape:
  * fraction sampling, name-resolved union, reflect(). */
class MiscSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("TABLESAMPLE-style fraction sampling is seeded-deterministic and plausible") {
    val li = Tables(spark, sf, "lineitem")
    val n = li.count()
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a == b, "same seed must give the same sample")
    assert(a > n / 20 && a < n / 5, s"sampled $a of $n")
  }

  test("unionByName resolves by column name, not position") {
    import spark.implicits._
    val x = Seq((1, "a")).toDF("id", "s")
    val y = Seq(("b", 2)).toDF("s", "id")
    val u = x.unionByName(y).orderBy($"id").collect()
    assert(u.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    // positional union would have mangled types/values
    val z = Seq((3, "c"), (1, "a")).toDF("id", "s")
    assert(x.unionByName(z).distinct().count() == 2)
  }

  test("reflect()/java_method() calls a static Java method (Hive GenericUDFReflect)") {
    val r = spark.sql(
      """SELECT reflect('java.lang.Math', 'abs', -5) AS a,
                java_method('java.lang.Integer', 'toBinaryString', 10) AS b""")
      .collect().head
    assert(r.getString(0) == "5" && r.getString(1) == "1010")
  }
}
