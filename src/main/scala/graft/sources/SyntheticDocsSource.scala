package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
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

  /** Rows actually emitted by full scans since the last reset — the
    * observability counter the runtime-filtering spec reads to prove
    * pruning cut real scan volume (local-mode only: one JVM). Readers
    * accumulate locally and add once on close, so the hot loop never
    * touches shared state. */
  val rowsEmitted = new java.util.concurrent.atomic.LongAdder

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
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates with SupportsPushDownLimit
  with SupportsPushDownTopN {
  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SyntheticDocs.schema
  private var aggSpec: Option[(Boolean, Seq[String])] = None
  private var reverse = false

  /** LIMIT pushdown: generated ids are emitted in order, so LIMIT n
    * over the (filtered) range is exactly the first n ids — shrink hi.
    * Fully pushed (not partial): the range IS the result. */
  override def pushLimit(limit: Int): Boolean = {
    // A LIMIT arriving after an aggregate was pushed applies to the
    // AGGREGATE OUTPUT rows, not the input id range — shrinking [lo,hi)
    // there would silently corrupt the closed-form result. Decline so
    // Spark applies the limit above the scan.
    if (aggSpec.isDefined) return false
    hi = math.min(hi, lo + limit); true
  }
  override def isPartiallyPushed(): Boolean = false

  /** TOP-N pushdown (ORDER BY doc_id [DESC] LIMIT n): ascending keeps
    * the low end of the range, descending the high end with the scan
    * emitting ids in reverse — either way n rows, no Sort in the
    * plan. Only the natural doc_id ordering is answerable. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    orders match {
      case _ if aggSpec.isDefined => false // see pushLimit: range ≠ agg output
      case Array(o) if isRef(o.expression(), "doc_id") =>
        if (o.direction() == SortDirection.ASCENDING) {
          hi = math.min(hi, lo + limit)
        } else {
          lo = math.max(lo, hi - limit); reverse = true
        }
        true
      case _ => false
    }

  /** COMPLETE aggregate pushdown (the DSv2 tier JDBC sources use for
    * `PushedAggregates`): COUNT(*) / MIN(doc_id) / MAX(doc_id),
    * optionally grouped by `bucket`, are all CLOSED-FORM over the
    * pushed [lo, hi) id range — the scan answers the aggregate from
    * integer arithmetic without materializing a single row, the
    * whole point of pushing aggregation into a storage handler.
    * Parse result: (groupedByBucket, agg column tags in order). */
  private def isRef(e: org.apache.spark.sql.connector.expressions.Expression,
      name: String): Boolean = e match {
    case r: NamedReference => r.fieldNames().sameElements(Array(name))
    case _ => false
  }

  private def parse(agg: Aggregation): Option[(Boolean, Seq[String])] = {
    val grouped = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(r) if isRef(r, "bucket") => Some(true)
      case _ => None
    }
    val cols = agg.aggregateExpressions().foldLeft(
        Option(Seq.empty[String])) {
      case (Some(acc), _: CountStar) => Some(acc :+ "count")
      case (Some(acc), m: Min) if isRef(m.column(), "doc_id") =>
        Some(acc :+ "min")
      case (Some(acc), m: Max) if isRef(m.column(), "doc_id") =>
        Some(acc :+ "max")
      case _ => None
    }
    for (g <- grouped; c <- cols) yield (g, c)
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    parse(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    parse(agg) match {
      case s @ Some(_) => aggSpec = s; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      // generated columns are never null: absorbing IsNotNull keeps the
      // plan residual-free, which is what lets aggregate pushdown fire
      // (Spark only pushes an Aggregate that sits DIRECTLY on the scan)
      case IsNotNull("doc_id") | IsNotNull("bucket") | IsNotNull("text") =>
        true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies only what the source did not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = aggSpec match {
    case Some((grouped, cols)) =>
      new SyntheticDocsAggScan(lo, math.max(lo, hi), grouped, cols)
    case None =>
      new SyntheticDocsScan(lo, math.max(lo, hi), partitions, required,
        reverse)
  }
}

/** The aggregate-pushdown scan: ≤10 result rows from closed-form
  * range arithmetic, ONE partition (complete pushdown must emit each
  * group exactly once). Output columns: group key first (when
  * grouped), then the aggregates in pushed order — the layout
  * V2ScanRelationPushDown expects back. */
private class SyntheticDocsAggScan(lo: Long, hi: Long, grouped: Boolean,
    cols: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = {
    val base = if (grouped) new StructType().add("bucket", IntegerType)
               else new StructType()
    cols.foldLeft(base)((s, c) => s.add(c match {
      case "count" => "count(*)"
      case "min" => "min(doc_id)"
      case "max" => "max(doc_id)"
    }, LongType))
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocsAgg range=[$lo,$hi) grouped=$grouped aggs=${cols.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocsRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    SyntheticDocsAggReaderFactory(grouped, cols)
}

/** Standalone serializable factory (the task closure must not drag the
  * Scan along): computes the ≤10 closed-form result rows on the
  * executor from the partition's [lo, hi) range alone. */
private case class SyntheticDocsAggReaderFactory(grouped: Boolean,
    cols: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocsRange]
    val lo = r.lo; val hi = r.hi
    val rows: Seq[InternalRow] =
      if (hi <= lo) Seq.empty
      else if (!grouped) {
        Seq(InternalRow.fromSeq(cols.map {
          case "count" => hi - lo
          case "min" => lo
          case "max" => hi - 1
        }.toIndexedSeq))
      } else {
        (0 until 10).flatMap { b =>
          // smallest/largest id in [lo, hi) with id % 10 == b
          val mn = lo + (((b - lo) % 10 + 10) % 10)
          if (mn >= hi) None
          else {
            val mx = (hi - 1) - ((((hi - 1 - b) % 10) + 10) % 10)
            val cnt = (mx - mn) / 10 + 1
            Some(InternalRow.fromSeq((b +: cols.map {
              case "count" => cnt
              case "min" => mn
              case "max" => mx
            }).toIndexedSeq))
          }
        }
      }
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        val has = it.hasNext; if (has) cur = it.next(); has
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private case class DocsRange(lo: Long, hi: Long, reverse: Boolean = false,
    allowed: Array[Long] = null)
  extends InputPartition

private class SyntheticDocsScan(lo0: Long, hi0: Long, partitions: Int,
    required: StructType, reverse: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeFiltering {
  private var lo = lo0
  private var hi = hi0
  // runtime IN-set (null = none): ids outside it are skipped at read
  // time, on top of the [lo, hi) range narrowing it implies
  private var allowed: Array[Long] = null

  /** Runtime (dynamic-pruning) filtering on the generated key: Spark's
    * PartitionPruning rule treats these attributes as the source's
    * partition columns, plants the build-side subquery, and calls
    * [[filter]] with its values before input partitions are planned —
    * the DSv2 analogue of Hive's dynamic partition pruning, here
    * collapsing the generated id space to the join's live keys. */
  override def filterAttributes(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", vs) =>
      val ids = vs.collect { case l: Long => l }.sorted
      if (ids.nonEmpty) {
        lo = math.max(lo, ids.head)
        hi = math.min(hi, ids.last + 1)
        // the set only pays for itself while it is small; the range
        // bounds above are always safe
        if (ids.length <= 100000) allowed = ids
      } else { hi = lo }
    case EqualTo("doc_id", v: Long) =>
      lo = math.max(lo, v); hi = math.min(hi, v + 1)
    case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
    case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
    case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
    case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
    case _ => () // unknown runtime filters are advisory — ignore
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range=[$lo,$hi)${if (reverse) " desc" else ""} " +
      s"cols=${required.fieldNames.mkString(",")}"
  /** Exact statistics from the pushed range — what lets the planner
    * broadcast a narrowed synthetic side without guessing. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(0L, hi - lo))
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(0L, hi - lo) * 32L)
  }
  override def planInputPartitions(): Array[InputPartition] = {
    // a fully-pushed descending top-N must stream high-to-low from ONE
    // partition so row order survives without a Sort node
    if (hi <= lo) Array.empty
    else if (reverse) Array(DocsRange(lo, hi, reverse = true, allowed))
    else {
      val n = hi - lo
      val per = math.max(1L, (n + partitions - 1) / partitions)
      // the runtime IN-set rides the PARTITIONS, not the reader
      // factory: BatchScanExec builds the factory during planning
      // (supportsColumnar probing), BEFORE runtime filters arrive,
      // while input partitions are re-planned after filter()
      (lo until hi by per)
        .map(s => DocsRange(s, math.min(hi, s + per), false, allowed))
        .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required)
}

private class SyntheticDocsReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocsRange]
    new PartitionReader[InternalRow] {
      private val step = if (r.reverse) -1L else 1L
      private var id = if (r.reverse) r.hi else r.lo - 1
      private val fields = required.fieldNames
      private var emitted = 0L
      private val allowed = r.allowed
      private def inRange: Boolean =
        if (r.reverse) id >= r.lo else id < r.hi
      override def next(): Boolean = {
        id += step
        // runtime-filtered scan: hop over ids the join cannot match
        while (inRange && allowed != null &&
            java.util.Arrays.binarySearch(allowed, id) < 0) id += step
        inRange
      }
      override def get(): InternalRow = {
        emitted += 1
        val values = fields.map {
          case "doc_id" => id
          case "bucket" => SyntheticDocs.bucket(id)
          case "text" => UTF8String.fromString(SyntheticDocs.text(id))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = SyntheticDocs.rowsEmitted.add(emitted)
    }
  }
}
