package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Hive's `field(v, v1, v2, ...)` — 1-based index of the first vi equal to
  * v, else 0 — one of the few Hive scalar functions with no Spark builtin
  * (SURVEY.md §2.I gap; Hive impl [hive: ql/src/java/org/apache/hadoop/
  * hive/ql/udf/generic/GenericUDFField.java]).
  *
  * Implemented as a native Catalyst expression WITH codegen (not a Scala
  * UDF): the generated code is a flat chain of UTF8String.equals checks, so
  * it stays inside whole-stage codegen on the 100 TB hot path.
  * String-typed here, which is Hive's dominant use.
  */
case class FieldExpr(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("field() needs a target and at least one candidate")
    else if (!children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("field() arguments must all be STRING")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val target = children.head.eval(input)
    if (target == null) return 0
    var i = 1
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v != null && v == target) return i
      i += 1
    }
    0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val targetGen = children.head.genCode(ctx)
    val rest = children.tail.map(_.genCode(ctx))
    val checks = rest.zipWithIndex.map { case (g, idx) =>
      s"""
         |if (${ev.value} == 0) {
         |  ${g.code}
         |  if (!${g.isNull} && ${g.value}.equals(${targetGen.value})) {
         |    ${ev.value} = ${idx + 1};
         |  }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |${targetGen.code}
        |int ${ev.value} = 0;
        |if (!${targetGen.isNull}) {
        |  $checks
        |}""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}
