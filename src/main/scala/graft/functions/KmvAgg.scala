package graft.functions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) theta-sketch aggregate — the Spark analogue of
  * Hive 4's DataSketches `theta` integration (Hive registers
  * sketch_union/sketch_intersect UDAFs over the same K-Minimum-Values
  * construction; public grounding: Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD 2007,
  * and the Apache DataSketches theta sketch).
  *
  * The buffer keeps the k smallest DISTINCT 63-bit hash values seen
  * (inputs are masked to non-negative so signed ordering == unsigned).
  * `eval` emits the ascending value array. Everything downstream is
  * declarative Spark SQL over that array:
  *   - NDV estimate: size(s) < k  -> size(s) (sketch is EXACT below cap)
  *                   otherwise    -> (k-1) / (s[k-1] / 2^63)
  *   - union        : k smallest of array_union(a, b)
  *   - intersection : theta-style — array_intersect below min(theta_a,
  *                    theta_b), scaled by 1/theta  (exact when both
  *                    sketches are below cap)
  * so one custom aggregate carries the whole sketch set algebra — no
  * bespoke union/intersect UDAFs needed, and `array_intersect` stays
  * inside whole-stage codegen.
  *
  * Merge is commutative/associative over bounded state (<= k longs), so
  * Spark runs it map-side: at 100 TB the shuffle carries one <= k-slot
  * array per (group, partition), never the value stream.
  */
case class KmvAgg(
    child: Expression,
    k: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv sketch size must be >= 2, got $k")

  /** The hash input must already be a 64-bit hash (the caller supplies
    * xxhash64(...) or similar); enforced at analysis so kmv over e.g. an
    * int column fails with a type error, not a runtime ClassCastException
    * in update() (ADVICE r6). */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv(hash, k) requires a BIGINT hash input " +
          s"(e.g. xxhash64(col)), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def add(buf: JTreeSet[java.lang.Long], h: Long): Unit = {
    val v = h & Long.MaxValue // 63-bit space: signed order == unsigned
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) { buf.remove(buf.last); () }
    }
  }

  override def update(buf: JTreeSet[java.lang.Long],
      input: InternalRow): JTreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: JTreeSet[java.lang.Long],
      b2: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new JTreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** SQL-registration builder shared by GraftFunctions and
    * GraftExtensions: validates arity and the foldability of k up front
    * (ADVICE r6 — kmv(h) previously threw IndexOutOfBoundsException and
    * a column-valued k could NPE inside eval). The child's LongType is
    * enforced by checkInputDataTypes once the analyzer resolves it. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) throw new IllegalArgumentException(
      s"kmv(hash, k) takes exactly 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable) throw new IllegalArgumentException(
      "kmv(hash, k): k must be a foldable integer literal, got " +
        exprs(1).sql)
    val k = exprs(1).eval(null) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"kmv(hash, k): k must be an integer literal, got $other")
    }
    KmvAgg(exprs.head, k).toAggregateExpression()
  }
}
