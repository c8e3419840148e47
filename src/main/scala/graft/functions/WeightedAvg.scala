package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` exemplar (the user-facing UDAF surface, analogue of
  * Hive's GenericUDAFResolver2 [hive: ql/src/java/org/apache/hadoop/hive/
  * ql/udf/generic/GenericUDAFEvaluator.java]): exact weighted average.
  *
  * The running numerator is kept as an exact BigDecimal (value rounded to
  * scale 4, times the integer weight), so partial/merge order cannot
  * change the result — the same discipline as Tables.dsum, proven by the
  * DuckDB oracle on q_udaf_weighted_avg.
  */
case class WAIn(x: Double, w: Long)
case class WABuf(num: BigDecimal, den: Long)

object WeightedAvg extends Aggregator[WAIn, WABuf, Double] {
  override def zero: WABuf = WABuf(BigDecimal(0).setScale(4), 0L)

  override def reduce(b: WABuf, a: WAIn): WABuf =
    // BigDecimal(NaN/Infinity) throws NumberFormatException and would
    // abort the whole aggregation; SQL AVG semantics skip non-values the
    // way they skip NULLs (ADVICE r02)
    if (a.x.isNaN || a.x.isInfinite) b
    else WABuf(
      b.num + BigDecimal(a.x).setScale(4, BigDecimal.RoundingMode.HALF_UP) * a.w,
      b.den + a.w)

  override def merge(b1: WABuf, b2: WABuf): WABuf =
    WABuf(b1.num + b2.num, b1.den + b2.den)

  override def finish(b: WABuf): Double =
    if (b.den == 0) Double.NaN else b.num.doubleValue / b.den.toDouble

  override def bufferEncoder: Encoder[WABuf] = Encoders.product[WABuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
