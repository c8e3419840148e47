package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** Registration point for the engine's custom functions — the Spark
  * analogue of Hive's FunctionRegistry.registerUDF calls
  * [hive: ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java].
  * After `register(spark)`, the functions are usable from both the SQL
  * front-end and `expr(...)` in DataFrame code.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "field", exprs => FieldExpr(exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash32", exprs => MinHashAgg(exprs.head).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "parse_url_tuple", exprs => ParseUrlTuple(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("kmv", KmvAgg.builder, "built-in")
    reg.createOrReplaceTempFunction(
      "dotq", exprs => DotLongArrays(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "zorder64", exprs => ZOrder64(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "edit_dl", exprs => DamerauLevenshteinExpr(exprs(0), exprs(1)),
      "built-in")
    spark.udf.register("wavg", udaf(WeightedAvg))
  }
}
