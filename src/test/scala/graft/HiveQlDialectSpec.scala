package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HiveQL-dialect acceptance: the SQL a migrating Hive user types must
  * parse and run through spark.sql over the registered fixture views —
  * the text-level surface on top of the DataFrame coverage (SURVEY §2).
  * Values are asserted against DataFrame equivalents that the DuckDB
  * oracle already pins elsewhere. */
class HiveQlDialectSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val views: Unit = Tables.registerViews(spark, sf)

  test("LATERAL VIEW explode with alias (classic Hive spelling)") {
    views
    val n = spark.sql(
      """SELECT d.doc_id, t.tok FROM documents d
         LATERAL VIEW explode(split(d.text, ' ')) t AS tok""").count()
    val exp = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " "))).count()
    assert(n == exp)
  }

  test("DISTRIBUTE BY / SORT BY and CLUSTER BY parse and run") {
    views
    val a = spark.sql(
      """SELECT l_orderkey, l_quantity FROM lineitem
         DISTRIBUTE BY l_orderkey SORT BY l_orderkey, l_linenumber""")
    val b = spark.sql(
      "SELECT l_orderkey, l_quantity FROM lineitem CLUSTER BY l_orderkey")
    assert(a.count() == b.count())
  }

  test("GROUPING SETS / WITH CUBE / WITH ROLLUP Hive spellings") {
    views
    val gs = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""")
    assert(gs.count() > 0)
    val cube = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) FROM lineitem
         GROUP BY l_returnflag, l_linestatus WITH CUBE""")
    val rollup = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) FROM lineitem
         GROUP BY l_returnflag, l_linestatus WITH ROLLUP""")
    assert(cube.count() >= rollup.count())
  }

  test("TABLESAMPLE and LEFT SEMI JOIN spellings") {
    views
    val semi = spark.sql(
      """SELECT c.c_custkey FROM customer c
         LEFT SEMI JOIN orders o ON c.c_custkey = o.o_custkey""").count()
    val exp = Tables(spark, sf, "customer").join(
      Tables(spark, sf, "orders"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(semi == exp)
    val sampled = spark.sql(
      "SELECT * FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)")
    assert(sampled.count() > 0)
  }

  test("SELECT ... WHERE with Hive-style backtick identifiers and CTEs") {
    views
    val r = spark.sql(
      """WITH big AS (SELECT `o_orderkey`, `o_totalprice` FROM `orders`
                      WHERE `o_totalprice` > 100000)
         SELECT count(*) FROM big""").collect().head.getLong(0)
    val exp = Tables(spark, sf, "orders")
      .filter(col("o_totalprice") > 100000).count()
    assert(r == exp)
  }

  test("Hive MAPJOIN hint spelling lowers to a broadcast join") {
    views
    val df = spark.sql(
      """SELECT /*+ MAPJOIN(nation) */ n_name, count(*) AS n
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"MAPJOIN hint did not produce a broadcast join:\n$plan")
    assert(df.count() > 0)
  }

  test("SQL:2016 LISTAGG parses and matches concat_ws(collect)") {
    views
    val r = spark.sql(
      """SELECT o_orderpriority,
           listagg(DISTINCT o_orderstatus, ',')
             WITHIN GROUP (ORDER BY o_orderstatus) AS st
         FROM orders GROUP BY o_orderpriority""")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(r.nonEmpty)
    r.values.foreach { v =>
      val parts = v.split(",")
      assert(parts.sorted.sameElements(parts), s"not WITHIN-GROUP sorted: $v")
      assert(parts.toSet.subsetOf(Set("F", "O", "P")), s"unexpected: $v")
    }
    assert(r.values.exists(_.contains(",")))
  }

  test("GROUP BY ALL / ORDER BY ALL modern spellings") {
    views
    val all = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem GROUP BY ALL ORDER BY ALL""").collect().toSeq
    val explicit = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2, 3""").collect().toSeq
    assert(all == explicit && all.nonEmpty)
  }

  test("window-rank filter via a named window clause (WINDOW w AS ...)") {
    views
    val top = spark.sql(
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER w AS rnk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rnk = 1""")
    val custs = Tables(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(top.count() == custs)
  }

  test("INSERT OVERWRITE DIRECTORY-style write via CTAS table") {
    views
    spark.sql("DROP TABLE IF EXISTS hq_ctas")
    spark.sql(
      """CREATE TABLE hq_ctas USING parquet AS
         SELECT o_orderstatus, count(*) AS n FROM orders
         GROUP BY o_orderstatus""")
    assert(spark.table("hq_ctas").count() == 3)
    spark.sql("DROP TABLE hq_ctas")
  }
}
