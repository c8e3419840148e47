package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary: fails with a readable per-column diff when the
  * driver regenerates `/root/testdata` with a physical type the engine does
  * not know how to normalize (the r8 events nanos→micros flip surfaced as 30
  * opaque query failures; this turns the next one into a single named red
  * test). */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fixture columns read as accepted types at sf0.001") {
    val drift = FixtureCheck.diff(spark, sf)
    assert(drift.isEmpty, "\n" + drift.mkString("\n"))
  }

  test("a truncated fixture produces one readable volume-drift line") {
    // Build a dir NAMED like a known sf holding a 3-row lineitem — the
    // "driver regeneration silently truncated a table" scenario the
    // schema canary cannot see (VERDICT r9 item 5).
    val root = java.nio.file.Files.createTempDirectory("graft_fixture").toFile
    root.deleteOnExit()
    val dir = new java.io.File(root, "sf0.01")
    spark.read.parquet(s"$sf/lineitem.parquet").limit(3)
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val drift = FixtureCheck.diff(spark, dir.getAbsolutePath)
    val volumeLines = drift.filter(_.contains(">4x off"))
    assert(volumeLines.size == 1, "\n" + drift.mkString("\n"))
    assert(volumeLines.head.startsWith("lineitem: row count 3"),
      volumeLines.head)
  }

  test("Tables() normalizes events.ts to session-TZ TimestampType") {
    // Whatever physical generation the fixture carries, downstream queries
    // and the driver's parquet-schema compare must see one stable type.
    val t = Tables(spark, sf, "events").schema("ts").dataType
    assert(t == TimestampType, s"events.ts normalized to $t, want timestamp")
  }
}
