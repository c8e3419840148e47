package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Avro container IO (sources/AvroIO.scala): full supported-type
  * round trip including nulls, arrays, decimals and the date /
  * timestamp-micros logical types; schema fidelity; multi-partition
  * parallelism on both sides. */
class AvroIOSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_avro_spec")
      .toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getAbsolutePath
  }

  test("every supported type round-trips bit-exact, nulls included") {
    val schema = StructType(Seq(
      StructField("b", BooleanType, nullable = true),
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("dec", DecimalType(12, 2), nullable = true),
      StructField("arr", ArrayType(LongType, containsNull = false),
        nullable = true)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(true, 7, 1L, 1.5f, 2.5, "hello", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-02-29"), ts,
        new java.math.BigDecimal("12345.67"), Seq(1L, 2L, 3L)),
      Row(null, null, 2L, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path)
    assert(back.schema == schema, back.schema.treeString)
    val got = back.orderBy(col("l")).collect()
    val want = df.orderBy(col("l")).collect()
    assert(got.length == 2)
    // element-wise (Array[Byte] equality is reference-based in Row ==)
    got.zip(want).foreach { case (g, w) =>
      schema.fields.indices.foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(a.toSeq == b.toSeq, s"field $i")
          case (a, b) => assert(a == b, s"field $i: $a != $b")
        }
      }
    }
    // timestamp kept its microseconds
    assert(got.head.getAs[java.sql.Timestamp]("ts").getNanos == 123456000)
  }

  test("write emits one container per partition; read parallelizes") {
    val df = spark.range(1000).select(col("id"),
      concat(lit("v"), col("id")).as("v")).repartition(4)
    val path = tmp()
    AvroIO.write(df, path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 4, files.mkString(", "))
    val back = AvroIO.read(spark, path)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) == 499500L)
  }

  test("avro schema mapping: unions carry nullability both ways") {
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true),
      StructField("c", ArrayType(DoubleType, containsNull = true),
        nullable = false)))
    val avro = AvroIO.toAvroSchema(st)
    assert(avro.getField("a").schema().getType ==
      org.apache.avro.Schema.Type.LONG)
    assert(avro.getField("b").schema().getType ==
      org.apache.avro.Schema.Type.UNION)
    assert(AvroIO.toSparkSchema(avro) == st)
  }

  test("an empty frame round-trips: schema-only container, zero rows") {
    val df = spark.range(10).filter(col("id") < 0)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
    val path = tmp()
    AvroIO.write(df, path)
    val back = AvroIO.read(spark, path)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("partial consumption (limit) does not leak or fail: listener closes") {
    val df = spark.range(1000).select(col("id")).repartition(2)
    val path = tmp()
    AvroIO.write(df, path)
    // limit stops mid-file: the task-completion listener (not
    // iterator exhaustion) must close the container stream
    val few = AvroIO.read(spark, path).limit(3).collect()
    assert(few.length == 3)
  }

  test("committed writes: no temp files survive, one final per partition") {
    val df = spark.range(100).select(col("id")).repartition(3)
    val path = tmp()
    AvroIO.write(df, path)
    val names = new java.io.File(path).listFiles().map(_.getName).toSeq
    assert(names.count(_.endsWith(".avro")) == 3, names)
    assert(!names.exists(_.endsWith(".tmp")), s"uncommitted temps: $names")
  }

  test("unsupported types fail fast with a clear message") {
    val st = StructType(Seq(StructField("m",
      MapType(StringType, LongType), nullable = true)))
    val e = intercept[IllegalArgumentException](AvroIO.toAvroSchema(st))
    assert(e.getMessage.contains("does not support"))
  }
}
