package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave of two 32-bit keys into one long — the
  * multi-dimensional clustering key used for data-skipping layouts
  * (Morton, "A computer oriented geodetic data base", IBM 1966; the same
  * curve behind Delta/Iceberg OPTIMIZE ZORDER BY). Sorting by the
  * interleaved key keeps rows close in BOTH dimensions close on disk, so
  * per-file min/max zone maps stay tight for predicates on either column
  * — at 100 TB that's the difference between pruning on one column and
  * pruning on all clustered columns.
  *
  * Codegen: the bit-spread runs as five shift/mask steps per operand
  * (the standard magic-number dilation), fully inside whole-stage
  * codegen — no per-row allocation, no UDF boundary.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 expects integral keys, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
  }

  // codegen needs no cast: Java widens int -> long at the call site
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder64.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object ZOrder64 {
  /** Dilate the low 32 bits of x so bit i lands at position 2i. */
  private def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code: a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
