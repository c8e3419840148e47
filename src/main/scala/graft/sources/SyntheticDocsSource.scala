package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSource V2 exemplar (SURVEY §2.A storage-handler tier, the
  * Spark-first analogue of a Hive StorageHandler [hive: hbase-handler/
  * src/java/org/apache/hadoop/hive/hbase/HBaseStorageHandler.java]): a
  * deterministic synthetic document corpus generated from pure integer
  * arithmetic, with REAL pushdown — doc_id range filters narrow the
  * generated key space before any row is materialized, and column
  * pruning skips text generation entirely when only ids are read.
  *
  * Because generation is exact int64 arithmetic, DuckDB can replay it
  * from range() — making this the rare CUSTOM source whose output is
  * value-oracle-checked (q_src_dsv2), not just row-counted.
  *
  * Usage: spark.read.format("graft.sources.SyntheticDocsSource")
  *          .option("rows", n).option("partitions", p).load()
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SyntheticDocs {
  val schema: StructType = new StructType()
    .add("doc_id", LongType).add("bucket", IntegerType)
    .add("text", StringType)

  /** 16-word vocabulary; the row's text is 3 words picked by exact
    * modular arithmetic on doc_id — replayable in any engine. */
  val vocab: Array[String] = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa")

  def bucket(id: Long): Int = (id % 10).toInt
  def text(id: Long): String = {
    val w1 = vocab(((id * 7 + 1) % 16).toInt)
    val w2 = vocab(((id * 13 + 3) % 16).toInt)
    val w3 = vocab(((id * 31 + 5) % 16).toInt)
    s"$w1 $w2 $w3"
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions)
}

private class SyntheticDocsScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies only what the source did not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SyntheticDocsScan(lo, math.max(lo, hi), partitions, required)
}

private case class DocsRange(lo: Long, hi: Long) extends InputPartition

private class SyntheticDocsScan(lo: Long, hi: Long, partitions: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (lo until hi by per).map(s => DocsRange(s, math.min(hi, s + per))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required)
}

private class SyntheticDocsReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocsRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        val values = fields.map {
          case "doc_id" => id
          case "bucket" => SyntheticDocs.bucket(id)
          case "text" => UTF8String.fromString(SyntheticDocs.text(id))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
