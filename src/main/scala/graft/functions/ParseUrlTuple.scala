package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Hive's `parse_url_tuple(url, ...)` UDTF [hive: ql/src/java/org/apache/
  * hadoop/hive/ql/udf/generic/GenericUDTFParseUrlTuple.java] — Spark has
  * only the scalar `parse_url`; this Generator emits all four common parts
  * in one pass, demonstrating the GenericUDTF → Catalyst `Generator`
  * extension mapping (SURVEY.md §2.K).
  *
  * Emits exactly one row (protocol, host, path, query) per non-null input;
  * null input generates no row (LATERAL VIEW OUTER restores it).
  */
case class ParseUrlTuple(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("protocol", StringType),
    StructField("host", StringType),
    StructField("path", StringType),
    StructField("query", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    try {
      val uri = new java.net.URI(v.toString)
      def u(s: String): UTF8String =
        if (s == null) null else UTF8String.fromString(s)
      Seq(new GenericInternalRow(Array[Any](
        u(uri.getScheme), u(uri.getHost), u(uri.getRawPath),
        u(uri.getRawQuery))))
    } catch {
      case _: java.net.URISyntaxException =>
        Seq(new GenericInternalRow(Array[Any](null, null, null, null)))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
