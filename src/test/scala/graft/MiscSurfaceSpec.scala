package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining small surfaces from SURVEY §2 with no oracle-able shape:
  * fraction sampling, name-resolved union, reflect(). */
class MiscSurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("TABLESAMPLE-style fraction sampling is seeded-deterministic and plausible") {
    val li = Tables(spark, sf, "lineitem")
    val n = li.count()
    val a = li.sample(withReplacement = false, 0.1, seed = 42).count()
    val b = li.sample(withReplacement = false, 0.1, seed = 42).count()
    assert(a == b, "same seed must give the same sample")
    assert(a > n / 20 && a < n / 5, s"sampled $a of $n")
  }

  test("unionByName resolves by column name, not position") {
    import spark.implicits._
    val x = Seq((1, "a")).toDF("id", "s")
    val y = Seq(("b", 2)).toDF("s", "id")
    val u = x.unionByName(y).orderBy($"id").collect()
    assert(u.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    // positional union would have mangled types/values
    val z = Seq((3, "c"), (1, "a")).toDF("id", "s")
    assert(x.unionByName(z).distinct().count() == 2)
  }

  test("reflect()/java_method() calls a static Java method (Hive GenericUDFReflect)") {
    val r = spark.sql(
      """SELECT reflect('java.lang.Math', 'abs', -5) AS a,
                java_method('java.lang.Integer', 'toBinaryString', 10) AS b""")
      .collect().head
    assert(r.getString(0) == "5" && r.getString(1) == "1010")
  }

  test("crc32 matches the reference java.util.zip.CRC32 per row") {
    // crc32 has no DuckDB twin; the JDK implementation of the standard
    // CRC-32 polynomial is an independent in-process oracle.
    val rows = Tables(spark, sf, "part").filter(col("p_partkey") < 200)
      .select(col("p_name"), crc32(col("p_name").cast("binary")).as("crc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ref = new java.util.zip.CRC32()
      ref.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == ref.getValue, s"crc32('${r.getString(0)}')")
    }
  }

  test("hash()/xxhash64() are stable: pinned golden values + determinism") {
    // engine-internal Murmur3/xxHash64 (seed 42) — pin known values so a
    // seed or algorithm change cannot slip through silently
    val r = spark.sql(
      "SELECT hash('graft') AS h, xxhash64('graft') AS x").collect().head
    assert(r.getInt(0) == -1930494102, "Murmur3 hash('graft') drifted")
    assert(r.getLong(1) == -4815631219266125053L, "xxhash64('graft') drifted")
    val a = Tables(spark, sf, "part")
      .select(xxhash64(col("p_name")).as("x"), hash(col("p_name"), col("p_size")).as("h"))
      .orderBy(col("x")).collect().toSeq
    val b = Tables(spark, sf, "part")
      .select(xxhash64(col("p_name")).as("x"), hash(col("p_name"), col("p_size")).as("h"))
      .orderBy(col("x")).collect().toSeq
    assert(a == b)
  }

  test("parquet codec round trips: snappy, zstd, gzip all lossless") {
    // codec choice is a first-order knob at 100 TB; each must round-trip
    // losslessly and actually engage (file sizes differ across codecs)
    val src = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
    val n = src.count()
    val sizes = Seq("snappy", "zstd", "gzip").map { codec =>
      val d = java.nio.file.Files.createTempDirectory(s"codec_$codec").toFile
      d.deleteOnExit()
      src.write.mode("overwrite").option("compression", codec)
        .parquet(d.getAbsolutePath)
      assert(spark.read.parquet(d.getAbsolutePath).count() == n, codec)
      codec -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }.toMap
    assert(sizes.values.toSet.size > 1, s"codecs produced equal sizes: $sizes")
  }

  test("multimodal decode stub: entropy_ish is a real byte-histogram entropy") {
    import org.apache.spark.sql.functions.col
    val feats = ops.Multimodal.mmFeatures(spark, sf)
      .orderBy(col("doc_id")).collect()
    val texts = Tables(spark, sf, "documents")
      .orderBy(col("doc_id")).select(col("text")).collect()
    assert(feats.length == texts.length && feats.nonEmpty)
    feats.zip(texts).foreach { case (f, t) =>
      val bytes = t.getString(0).getBytes("UTF-8")
      val hist = bytes.groupBy(_ & 0xff).view.mapValues(_.length).toMap
      val ent = -hist.values.map { c =>
        val p = c.toDouble / bytes.length; p * math.log(p)
      }.sum
      assert(math.abs(f.entropy_ish - math.round(ent * 1e6) / 1e6) < 1e-9,
        s"doc ${f.doc_id}")
      assert(f.entropy_ish >= 0.0 && f.entropy_ish <= math.log(256.0))
    }
  }

  test("Avro source is environment-blocked: lookup fails cleanly, not silently") {
    // SURVEY §2.A declares Avro unimplementable here: /opt/spark/jars has
    // avro-core but NOT the spark-avro DataSource, and dependencies are
    // frozen. Pin that claim executably (VERDICT r4 #9): the format lookup
    // must fail with the standard missing-data-source error — if this test
    // ever fails because the read SUCCEEDS, the jar appeared and the Avro
    // source should be implemented.
    val e = intercept[Exception] {
      spark.read.format("avro").load("/tmp/nonexistent.avro").collect()
    }
    val msg = e.toString.toLowerCase
    assert(msg.contains("avro"), msg)
    assert(msg.contains("failed to find") || msg.contains("data source") ||
      msg.contains("classnotfound"), msg)
  }
}
