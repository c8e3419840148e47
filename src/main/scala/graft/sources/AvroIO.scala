package graft.sources

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file IO [hive: AvroSerDe /
  * ql/io/avro/AvroContainerOutputFormat] built directly on the avro
  * core + avro-mapred jars this distribution DOES ship (the
  * `spark-avro` DataSource module is absent and dependencies are
  * frozen, so `spark.read.format("avro")` is unavailable — this
  * utility provides the same capability on the jars at hand).
  *
  * Distributed on both sides: `write` emits one Avro container file
  * per partition through the Hadoop FileSystem API (any FS scheme;
  * deflate-compressed, schema embedded per Avro spec), `read` lists
  * the container files and streams each through `DataFileStream` in
  * parallel tasks — Avro files carry their writer schema, so readers
  * need no side-channel. Supported Spark types (both directions):
  * BOOLEAN, INT, LONG, FLOAT, DOUBLE, STRING, BINARY, DATE
  * (logical date), TIMESTAMP (logical timestamp-micros),
  * DECIMAL(p,s) (logical decimal on bytes), ARRAY of the above;
  * nullable fields map to union(null, T).
  */
object AvroIO {

  // ---- schema conversion: Spark StructType <-> Avro record schema ----

  def toAvroSchema(st: StructType, name: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType)
      val sch = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType => LogicalTypes.decimal(d.precision, d.scale)
      .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(e, containsNull) =>
      val elem = toAvroType(e)
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), elem)) else elem)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support Spark type $other")
  }

  def toSparkSchema(avro: Schema): StructType = StructType(
    avro.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), toSparkType(t), nullable)
    }.toArray)

  /** union(null, T) -> (T, nullable = true); plain T -> (T, false) */
  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only union(null, T) is supported, got $s")
      (nonNull.head, nonNull.size < s.getTypes.size)
    } else (s, false)

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
        TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: LogicalTypes.Decimal =>
        DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY =>
      val (e, n) = unwrap(s.getElementType)
      ArrayType(toSparkType(e), n)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not support Avro type $other in $s")
  }

  // ---- value conversion ----

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
    case (i: java.time.Instant, TimestampType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (d: java.sql.Date, DateType) =>
      d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (dec: JBigDecimal, d: DecimalType) => ByteBuffer.wrap(
      dec.setScale(d.scale).unscaledValue().toByteArray)
    case (dec: scala.math.BigDecimal, d: DecimalType) => ByteBuffer.wrap(
      dec.underlying().setScale(d.scale).unscaledValue().toByteArray)
    case (seq: scala.collection.Seq[_], ArrayType(e, _)) =>
      seq.map(x => toAvroValue(x, e)).asJava
    case (other, _) => other
  }

  private def toSparkValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (bb: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case (bb: ByteBuffer, d: DecimalType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
      new JBigDecimal(new BigInteger(arr), d.scale)
    // GenericData.Array implements java.util.List, so one case covers
    // both the generic reader's and the specific reader's array shapes
    case (l: java.util.List[_], ArrayType(e, _)) =>
      l.asScala.map(x => toSparkValue(x, e)).toSeq
    case (other, _) => other
  }

  /** Hadoop `Configuration` is not `java.io.Serializable`; this
    * wrapper ships the DRIVER's configuration (credentials,
    * defaultFS, scheme impls) to tasks via its own write/readFields
    * marshalling — the standard pattern, re-stated here because
    * Spark's internal equivalent is `private[spark]`. */
  private class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  // ---- write: one Avro container file per partition ----

  /** Task-committed write: each task writes an ATTEMPT-UNIQUE hidden
    * temp file (`.part-P-attemptA.avro.tmp`) and renames it to the
    * final `part-P.avro` only on success — a retried or speculative
    * attempt can never interleave bytes with another attempt, and a
    * loser of the rename race deletes its own temp. An empty frame
    * still round-trips: the driver writes one schema-only container
    * when no partition produced a file. */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    val out = new Path(path)
    val driverConf = df.sparkSession.sparkContext.hadoopConfiguration
    val confBc = df.sparkSession.sparkContext
      .broadcast(new SerializableHadoopConf(driverConf))
    val fs = out.getFileSystem(driverConf)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)

    def writeContainer(fsys: FileSystem, file: Path, schema: Schema,
        rows: Iterator[Row]): Unit = {
      val writer = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](schema))
        .setCodec(CodecFactory.deflateCodec(6))
        .create(schema, fsys.create(file, true))
      try rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, toAvroValue(row.get(i), sparkSchema(i).dataType))
          i += 1
        }
        writer.append(rec)
      } finally writer.close() // closes the stream too
    }

    try df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(avroJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fsys = new Path(path).getFileSystem(confBc.value.value)
        val tmp = new Path(path,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.avro.tmp")
        val fin = new Path(path, f"part-$pid%05d.avro")
        writeContainer(fsys, tmp, schema, rows)
        // commit: first successful attempt renames into place; a
        // later attempt finds the final file and discards its temp
        if (fsys.exists(fin) || !fsys.rename(tmp, fin))
          fsys.delete(tmp, false)
      }
    } finally
      // the action is complete — release the broadcast's blocks on the
      // driver and every executor (a long-lived session writing many
      // Avro files would otherwise accumulate one broadcast per call)
      confBc.destroy()
    // empty-frame round trip: guarantee at least one (schema-only)
    // container so read() recovers the schema and returns 0 rows
    if (fs.globStatus(new Path(out, "*.avro")).isEmpty)
      writeContainer(fs, new Path(out, "part-00000.avro"),
        new Schema.Parser().parse(avroJson), Iterator.empty)
  }

  // ---- read: one task per container file ----

  /** One Hadoop-conf broadcast per SparkContext for the READ path:
    * the returned DataFrame is lazy, so a per-call broadcast could
    * never be destroyed safely — sharing one broadcast caps the
    * driver/executor block count at 1 regardless of how many Avro
    * reads a session performs. (Safe because the library treats the
    * Hadoop conf as immutable after session start.) The map entry is
    * evicted when the owning application ends, so a JVM that cycles
    * SparkSessions never strongly retains a stopped context or its
    * broadcast (ADVICE r13). */
  private val readConfBc = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext,
    org.apache.spark.broadcast.Broadcast[SerializableHadoopConf]]()

  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val confBc = readConfBc.computeIfAbsent(spark.sparkContext, sc => {
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler
              .SparkListenerApplicationEnd): Unit = {
          // destroy() is best-effort: the stopping context frees the
          // blocks itself — the point is releasing the map's strong
          // reference to the dead SparkContext
          Option(readConfBc.remove(sc)).foreach(b =>
            try b.destroy() catch { case _: Exception => () })
        }
      })
      sc.broadcast(new SerializableHadoopConf(sc.hadoopConfiguration))
    })
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = fs.globStatus(new Path(root, "*.avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    // the container carries its writer schema: read it once for planning
    val headIn = fs.open(new Path(files.head))
    val headStream = new DataFileStream(headIn,
      new GenericDatumReader[GenericRecord]())
    val avroJson = try headStream.getSchema.toString
      finally headStream.close()
    val sparkSchema = toSparkSchema(new Schema.Parser().parse(avroJson))
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { f =>
        val schema = new Schema.Parser().parse(avroJson)
        val in = new Path(f).getFileSystem(confBc.value.value).open(
          new Path(f))
        val stream = new DataFileStream(in,
          new GenericDatumReader[GenericRecord](schema))
        // close at task end even when the iterator is not drained
        // (limit / take stop mid-file) — not just on exhaustion
        org.apache.spark.TaskContext.get()
          .addTaskCompletionListener[Unit](_ => stream.close())
        new Iterator[Row] {
          def hasNext: Boolean = stream.hasNext
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(sparkSchema.fields.indices.map(i =>
              toSparkValue(rec.get(i), sparkSchema(i).dataType)))
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
